"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with typed metadata
columns next to them (never nested structs in hot paths — SURVEY §1.3).
The Spark-side plumbing here — schemas, mapInPandas batch shape, Arrow
batch sizing for wide binary rows — is real and tested; the actual
image decode uses the repo's deterministic codec
(``scrapy_spark.functions.imaging``) in-sandbox and Pillow on a real
cluster (same API, ``_HAS_PIL`` flips — imaging.py docstring).

Audio/video codec libraries are absent in this container, so those
modalities decode against DETERMINISTIC FAKE containers (spcm / svid,
``functions/media.py``) per the build contract — header fields are pure
id formulas (value-oracle-able), content parity is bit-exact
re-synthesis; a real cluster swaps in soundfile / PyAV behind the same
dispatch (``decode_media``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.imaging import (  # noqa: F401
    LOSSLESS_FORMATS,
    decode_image,
    phash64,
    psnr,
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("phash", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("tw", T.IntegerType()),
        T.StructField("th", T.IntegerType()),
    ]
)


def decode_image_meta(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes"
) -> DataFrame:
    """binary → typed metadata via mapInPandas (keeps batches small for
    wide binary rows; tune spark.sql.execution.arrow.maxRecordsPerBatch
    ~10k for image payloads — SURVEY §4.3.3)."""
    cols = [id_col, bytes_col]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    arr, fmt = decode_image(bytes(data))
                    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                    rows.append(
                        (
                            iid,
                            int(arr.shape[1]),
                            int(arr.shape[0]),
                            fmt,
                            True,
                            phash64(arr),
                            float(round(gray.mean(), 4)),
                        )
                    )
                except (ValueError, NotImplementedError):
                    rows.append((iid, None, None, None, False, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return df.select(*cols).mapInPandas(_decode, schema=IMAGE_META_SCHEMA)


def resize_thumbnails(
    df: DataFrame,
    max_side: int = 16,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Nearest-neighbor thumbnail (IMAGES_THUMBS analog, ref:
    scrapy/pipelines/images.py thumbs ≈L110): decode → subsample →
    re-encode rawrgb. Deterministic; numpy-only."""
    from ..functions.imaging import encode_image

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    arr, _ = decode_image(bytes(data))
                except (ValueError, NotImplementedError):
                    continue
                h, w = arr.shape[:2]
                scale = max(1, int(np.ceil(max(h, w) / max_side)))
                thumb = arr[::scale, ::scale]
                rows.append(
                    (
                        iid,
                        encode_image(np.ascontiguousarray(thumb), "rawrgb"),
                        int(thumb.shape[1]),
                        int(thumb.shape[0]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in THUMB_SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(_thumb, schema=THUMB_SCHEMA)


PARITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("dims_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("payload_ok", T.BooleanType()),
    ]
)


def payload_parity_meta(df: DataFrame, psnr_floor_db: float = 40.0) -> DataFrame:
    """Per-row payload-parity verdict vs re-synthesized ground truth
    (input_hint invariant: decoded-pixel allclose with PSNR ≥ 40 dB for
    lossy / bit-exact for lossless, caption equality; ref:
    pipelines/images.py ≈L130 convert_image round-trip checks).

    Input is input_hint-shaped (image_id, bytes, w, h, fmt, caption,
    phash). Each row is checked entirely executor-side: decode the
    payload, re-derive the reference image from ``image_id``
    (``synth_image`` — the deterministic generator any executor can
    replay), then flag
      dims_ok   — decoded (w, h) == stored metadata == reference shape
      phash_ok  — stored phash == phash64(reference pixels)
      pixels_ok — lossless: decoded == reference bit-exact;
                  lossy: PSNR(decoded, reference) ≥ psnr_floor_db
      payload_ok — all of the above.
    ``fmt`` is the DECODED container format (not the stored column), so
    a payload mis-encoded under the wrong magic fails the value check.
    Every flag is TRUE for an intact corpus, which makes the whole
    output replicable in pure SQL — the DuckDB oracle derives
    (image_id, fmt, caption) by formula and pins the flags."""
    from ..functions.imaging import synth_image

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, w, h, _fmt, caption, ph in zip(
                *(pdf[c] for c in cols)
            ):
                try:
                    arr, dfmt = decode_image(bytes(data))
                except (ValueError, NotImplementedError):
                    rows.append(
                        (iid, None, caption, False, False, False, False, False)
                    )
                    continue
                ref = synth_image(iid)
                dims_ok = (
                    arr.shape[1] == int(w)
                    and arr.shape[0] == int(h)
                    and ref.shape == arr.shape
                )
                phash_ok = int(ph) == phash64(ref)
                if ref.shape != arr.shape:
                    pixels_ok = False
                elif dfmt in LOSSLESS_FORMATS:
                    pixels_ok = bool((arr == ref).all())
                else:
                    pixels_ok = psnr(arr, ref) >= psnr_floor_db
                rows.append(
                    (
                        iid,
                        dfmt,
                        caption,
                        True,
                        dims_ok,
                        phash_ok,
                        pixels_ok,
                        dims_ok and phash_ok and pixels_ok,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PARITY_SCHEMA.fields]
            )

    return df.select(*cols).mapInPandas(_check, schema=PARITY_SCHEMA)


THUMB_PARITY_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("thumb_decodes", T.BooleanType()),
        T.StructField("dims_ok", T.BooleanType()),
        T.StructField("within_cap", T.BooleanType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("thumb_ok", T.BooleanType()),
    ]
)


def thumbs_parity_meta(df: DataFrame, max_side: int = 16) -> DataFrame:
    """Per-row thumbnail verdict (IMAGES_THUMBS semantics, ref:
    pipelines/images.py thumbs ≈L110): given (image_id, bytes, thumb,
    tw, th) — the original payload joined to ``resize_thumbnails``
    output — recompute the expected thumbnail from the ACTUAL decoded
    input (``arr[::scale, ::scale]`` with scale = ceil(long side /
    max_side)) and flag
      thumb_decodes — the thumb payload decodes (rawrgb container)
      dims_ok       — (tw, th) == expected subsample dims
      within_cap    — max(tw, th) ≤ max_side
      pixels_ok     — decoded thumb == expected subsample, bit-exact
      thumb_ok      — all of the above.
    Every flag is TRUE for a correct resize, so the output is pure-SQL
    replicable (image_id formula + pinned flags) — same oracle shape as
    ``payload_parity_meta``."""

    cols = ["image_id", "bytes", "thumb", "tw", "th"]

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, tb, tw, th in zip(*(pdf[c] for c in cols)):
                try:
                    src, _ = decode_image(bytes(data))
                    got, _ = decode_image(bytes(tb))
                except (ValueError, NotImplementedError):
                    rows.append((iid, False, False, False, False, False))
                    continue
                h, w = src.shape[:2]
                scale = max(1, int(np.ceil(max(h, w) / max_side)))
                exp = src[::scale, ::scale]
                dims_ok = (int(tw), int(th)) == (exp.shape[1], exp.shape[0])
                within = max(int(tw), int(th)) <= max_side
                pix_ok = got.shape == exp.shape and bool((got == exp).all())
                rows.append(
                    (iid, True, dims_ok, within, pix_ok,
                     dims_ok and within and pix_ok)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in THUMB_PARITY_SCHEMA.fields]
            )

    return df.select(*cols).mapInPandas(_check, schema=THUMB_PARITY_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("nsamples", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("samples_ok", T.BooleanType()),
    ]
)


def audio_decode_meta(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """binary → typed audio metadata + content parity (spcm fake codec,
    functions/media.py; real clusters swap in soundfile behind the same
    API). rate/channels/nsamples/duration come FROM THE DECODE, and the
    synthesis derives them from the id by formula — so the DuckDB oracle
    value-checks the decoded header, while ``samples_ok`` (decoded PCM
    bit-exact vs re-synthesis) is pinned TRUE."""
    from ..functions.media import decode_audio, synth_audio

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf["bytes"]):
                try:
                    samples, rate, channels = decode_audio(bytes(data))
                except (ValueError, NotImplementedError):
                    rows.append((mid, None, None, None, None, False, False))
                    continue
                n = samples.shape[0]
                ref = synth_audio(mid, int(mid[3:]))
                rows.append(
                    (
                        mid,
                        int(rate),
                        int(channels),
                        int(n),
                        round(n * 1000.0 / rate, 4),
                        True,
                        bytes(data) == ref,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return df.select(id_col, "bytes").mapInPandas(
        _decode, schema=AUDIO_META_SCHEMA
    )


VIDEO_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("nframes", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("frames_ok", T.BooleanType()),
    ]
)


def video_frame_sample(
    df: DataFrame, every_k: int = 3, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling pass (svid fake codec; PyAV on a real cluster):
    decode → take frames 0, k, 2k, … → per-row stats + parity. Header
    fields and the sampled count are id formulas (oracle value-checks
    them); ``frames_ok`` asserts each SAMPLED frame is bit-exact vs the
    re-synthesized source video — the operator only ever materializes
    the sampled frames, which is the point of frame sampling at scale."""
    from ..functions.media import (
        decode_video,
        sample_frame_indices,
        synth_video,
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf["bytes"]):
                try:
                    frames, w, h, n = decode_video(bytes(data))
                except (ValueError, NotImplementedError):
                    rows.append((mid, None, None, None, None, False, False))
                    continue
                idx = sample_frame_indices(n, every_k)
                ref_frames, *_ = decode_video(synth_video(mid, int(mid[3:])))
                ok = all(
                    (frames[i] == ref_frames[i]).all() for i in idx
                ) if ref_frames.shape == frames.shape else False
                rows.append(
                    (mid, int(w), int(h), int(n), len(idx), True, bool(ok))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_SAMPLE_SCHEMA.fields]
            )

    return df.select(id_col, "bytes").mapInPandas(
        _sample, schema=VIDEO_SAMPLE_SCHEMA
    )


def decode_media(df: DataFrame, modality: str, **kw) -> DataFrame:
    """Dispatch per modality. All three decode against deterministic
    codecs in-sandbox (imaging.py rawrgb/qrgb; media.py spcm/svid); on a
    real cluster the same API dispatches to Pillow/soundfile/PyAV behind
    the import-try seams."""
    if modality == "image":
        return decode_image_meta(df, **kw)
    if modality == "audio":
        return audio_decode_meta(df, **kw)
    if modality == "video":
        return video_frame_sample(df, **kw)
    raise NotImplementedError(f"unknown modality {modality!r}")


def min_size_filter(meta: DataFrame, min_w: int = 8, min_h: int = 8) -> DataFrame:
    """IMAGES_MIN_WIDTH/HEIGHT gate (ref: pipelines/images.py ≈L60)."""
    return meta.filter(
        F.col("decode_ok") & (F.col("w") >= min_w) & (F.col("h") >= min_h)
    )


__all__ = [
    "AUDIO_META_SCHEMA",
    "IMAGE_META_SCHEMA",
    "PARITY_SCHEMA",
    "THUMB_PARITY_SCHEMA",
    "THUMB_SCHEMA",
    "VIDEO_SAMPLE_SCHEMA",
    "audio_decode_meta",
    "decode_image_meta",
    "payload_parity_meta",
    "resize_thumbnails",
    "thumbs_parity_meta",
    "video_frame_sample",
    "decode_media",
    "min_size_filter",
]
