"""Audio/video payload codecs — the non-image half of the multimodal
column plumbing (SURVEY §2.7 C12 family; build contract: codec libs are
absent in this container, so decode runs against DETERMINISTIC FAKE
container formats, mirroring ``functions/imaging.py``'s rawrgb/qrgb —
the Spark-side plumbing (binary columns, Arrow batches, mapInPandas
signatures, parity oracles) is real and tested; on a real cluster the
same public API dispatches to soundfile/PyAV behind the import-try,
exactly like imaging's ``_HAS_PIL`` seam).

Formats:

- ``spcm``  : magic ``SPCM`` + u32 rate + u16 channels + u32 nsamples +
  i16 LE interleaved samples — lossless PCM stand-in; parity is
  bit-exact.
- ``svid``  : magic ``SVID`` + u16 w,h + u16 nframes + nframes raw RGB
  frames (w·h·3 bytes each) — uncompressed video stand-in; per-frame
  parity is bit-exact, frame sampling is pure offset math.

Synthesis (``synth_audio`` / ``synth_video``) derives every HEADER field
as a pure function of the integer id — which is what lets the DuckDB
oracles value-check decode output, not just pin flags — while sample/
pixel CONTENT is seeded-RNG noise checked executor-side by re-synthesis
(bit-exact, both containers lossless).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC_PCM = b"SPCM"
_MAGIC_VID = b"SVID"


def _rng_for(media_id: str) -> np.random.Generator:
    seed = int.from_bytes(
        hashlib.md5(media_id.encode("utf-8")).digest()[:4], "little"
    )
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- audio
def audio_params(raw_id: int) -> tuple[int, int, int]:
    """(rate, channels, nsamples) — pure formulas of the integer id,
    replicated verbatim in the DuckDB oracle."""
    rate = 16000 + (raw_id % 2) * 28100  # 16 kHz / 44.1 kHz
    channels = 1 + raw_id % 2
    nsamples = 256 + (raw_id % 50) * 64
    return rate, channels, nsamples


def synth_audio(media_id: str, raw_id: int) -> bytes:
    """Deterministic spcm payload: header by formula, samples seeded
    sine + noise."""
    rate, channels, nsamples = audio_params(raw_id)
    rng = _rng_for(media_id)
    t = np.arange(nsamples, dtype=np.float64)
    freq = 55.0 * (1 + raw_id % 12)
    wave = 0.5 * np.sin(2 * np.pi * freq * t / rate)
    sig = np.stack(
        [wave + rng.normal(0, 0.05, nsamples) for _ in range(channels)],
        axis=1,
    )
    samples = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    return (
        _MAGIC_PCM
        + struct.pack("<IHI", rate, channels, nsamples)
        + samples.tobytes()
    )


def decode_audio(data: bytes) -> tuple[np.ndarray, int, int]:
    """bytes → (samples (n, channels) int16, rate, channels). Raises
    ValueError on junk — same contract as ``imaging.decode_image``."""
    if data[:4] != _MAGIC_PCM:
        raise ValueError("unknown audio magic (codec libs unavailable)")
    rate, channels, nsamples = struct.unpack("<IHI", data[4:14])
    body = np.frombuffer(data[14:], dtype="<i2")
    if body.size != nsamples * channels:
        raise ValueError("truncated spcm payload")
    return body.reshape(nsamples, channels).copy(), rate, channels


# ---------------------------------------------------------------- video
def video_params(raw_id: int) -> tuple[int, int, int]:
    """(w, h, nframes) — pure formulas of the integer id."""
    return 4 + raw_id % 9, 4 + (raw_id * 3) % 9, 4 + raw_id % 13


def synth_video(media_id: str, raw_id: int) -> bytes:
    """Deterministic svid payload: header by formula, frame pixels
    seeded noise (per-frame distinct)."""
    w, h, nframes = video_params(raw_id)
    rng = _rng_for(media_id)
    frames = rng.integers(0, 256, size=(nframes, h, w, 3), dtype=np.uint8)
    return (
        _MAGIC_VID + struct.pack("<HHH", w, h, nframes) + frames.tobytes()
    )


def decode_video(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """bytes → (frames (n, h, w, 3) uint8, w, h, nframes)."""
    if data[:4] != _MAGIC_VID:
        raise ValueError("unknown video magic (codec libs unavailable)")
    w, h, nframes = struct.unpack("<HHH", data[4:10])
    body = np.frombuffer(data[10:], dtype=np.uint8)
    if body.size != nframes * h * w * 3:
        raise ValueError("truncated svid payload")
    return body.reshape(nframes, h, w, 3).copy(), w, h, nframes


def sample_frame_indices(nframes: int, every_k: int) -> list[int]:
    """Frame-sampling schedule: frames 0, k, 2k, … — pure offset math
    shared by the operator and its oracle (count = floor((n-1)/k)+1)."""
    return list(range(0, nframes, every_k))


__all__ = [
    "audio_params",
    "synth_audio",
    "decode_audio",
    "video_params",
    "synth_video",
    "decode_video",
    "sample_frame_indices",
]
