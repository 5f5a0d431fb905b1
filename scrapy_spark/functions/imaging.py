"""Image payload ops (SURVEY §2.7 C12; ref: scrapy/pipelines/images.py
::ImagesPipeline.convert_image ≈L130, thumbs ≈L110).

The sandbox has no PIL (verified — FIXTURES.md §C), so the engine ships its
own deterministic numpy codec; the real-format path (png/jpeg via Pillow) is
gated behind an import-try and exercises the SAME public API, so on a real
cluster only ``_HAS_PIL`` flips. The Spark-side plumbing — binary columns,
Arrow batches, UDF signatures — is real and tested either way.

Formats:

- ``rawrgb``  : magic ``SRAW`` + u16 w,h + raw uint8 RGB — lossless; parity
  check is bit-exact.
- ``qrgb``    : magic ``SQRG`` + u16 w,h + 6-bit-quantized RGB — the
  deterministic stand-in for a lossy format; reconstruction PSNR ≈ 47 dB,
  exercising the input_hint's "PSNR ≥ 40 dB for lossy" gate for real.
- ``png``/``jpeg`` via Pillow when available.
"""

from __future__ import annotations

import struct

import numpy as np

try:  # pragma: no cover - absent in sandbox
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

_MAGIC_RAW = b"SRAW"
_MAGIC_Q = b"SQRG"
_QSHIFT = 2  # keep 6 of 8 bits → quantization step 4 → PSNR ≈ 47 dB

LOSSLESS_FORMATS = frozenset({"rawrgb", "png", "bmp"})


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """uint8 (h, w, 3) array → bytes in ``fmt``."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected uint8 (h, w, 3) RGB array")
    h, w = arr.shape[:2]
    if fmt == "rawrgb":
        return _MAGIC_RAW + struct.pack("<HH", w, h) + arr.tobytes()
    if fmt == "qrgb":
        q = (arr >> _QSHIFT).astype(np.uint8)
        return _MAGIC_Q + struct.pack("<HH", w, h) + q.tobytes()
    if _HAS_PIL and fmt in ("png", "jpeg", "bmp"):  # pragma: no cover
        import io

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format=fmt.upper())
        return buf.getvalue()
    raise NotImplementedError(
        f"format {fmt!r} needs Pillow, which is absent in this environment"
    )


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """bytes → (uint8 RGB array, fmt). Raises ValueError on junk."""
    if data[:4] == _MAGIC_RAW:
        w, h = struct.unpack("<HH", data[4:8])
        arr = np.frombuffer(data[8:], dtype=np.uint8)
        if arr.size != w * h * 3:
            raise ValueError("truncated rawrgb payload")
        return arr.reshape(h, w, 3).copy(), "rawrgb"
    if data[:4] == _MAGIC_Q:
        w, h = struct.unpack("<HH", data[4:8])
        q = np.frombuffer(data[8:], dtype=np.uint8)
        if q.size != w * h * 3:
            raise ValueError("truncated qrgb payload")
        # dequantize to bin centers
        arr = ((q.reshape(h, w, 3).astype(np.uint16) << _QSHIFT) + (1 << (_QSHIFT - 1))).clip(
            0, 255
        )
        return arr.astype(np.uint8), "qrgb"
    if _HAS_PIL:  # pragma: no cover
        import io

        img = Image.open(io.BytesIO(data)).convert("RGB")
        return np.asarray(img), (img.format or "unknown").lower()
    raise ValueError("unknown image magic (and Pillow unavailable)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: mean-pool grayscale to 8×8, threshold at the
    mean. Signed int64 (Spark/parquet-friendly)."""
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # pad to a multiple of 8 then mean-pool
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
    bh, bw = gray.shape[0] // 8, gray.shape[1] // 8
    pooled = gray.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (pooled > pooled.mean()).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= 1 << 63 else val


def synth_image(image_id: str, min_px: int = 8, max_px: int = 64) -> np.ndarray:
    """Deterministic synthetic RGB image for ``image_id`` (FIXTURES §A.1):
    a seeded-RNG coarse 8×8 color-block pattern + gradient + fine noise,
    side length in [min_px, max_px].

    The per-id coarse pattern matters: it makes ``phash64`` well-spread
    across ids (a shared gradient alone pools to the SAME 8×8 means for
    every image, collapsing all phashes to one value — useless for
    near-dup work), while small pixel perturbations still move pooled
    means only slightly, so jittered copies stay at low hamming distance.
    That mirrors real crawled images: distinct content → distant phash,
    re-encoded/resized copies → near phash."""
    # seed from a digest of the WHOLE id: a plain int.from_bytes(...) %
    # 2**32 keeps only the first four chars in little-endian, which made
    # every img00000000NN share one seed — and therefore one image
    import hashlib

    seed = int.from_bytes(
        hashlib.md5(image_id.encode("utf-8")).digest()[:4], "little"
    )
    rng = np.random.default_rng(seed)
    side = int(rng.integers(min_px, max_px + 1))
    # per-image random coarse structure (what phash pools over)
    coarse = rng.integers(16, 208, size=(8, 8, 3)).astype(np.float64)
    idx = (np.arange(side) * 8) // side
    base = coarse[idx][:, idx]
    # mild shared gradient for visual realism (sub-dominant to the blocks)
    yy, xx = np.mgrid[0:side, 0:side]
    grad = np.stack(
        [
            xx * 32 / max(side - 1, 1),
            yy * 32 / max(side - 1, 1),
            (xx + yy) * 16 / max(side - 1, 1),
        ],
        axis=-1,
    )
    noise = rng.integers(0, 16, size=(side, side, 3))
    return np.clip(base + grad + noise, 0, 255).astype(np.uint8)
