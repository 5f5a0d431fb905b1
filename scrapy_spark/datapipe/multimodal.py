"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with typed metadata
columns next to them (never nested structs in hot paths — SURVEY §1.3).
The Spark-side plumbing here — schemas, mapInPandas batch shape, Arrow
batch sizing for wide binary rows — is real and tested; the actual
image decode uses the repo's deterministic codec
(``scrapy_spark.functions.imaging``) in-sandbox and Pillow on a real
cluster (same API, ``_HAS_PIL`` flips — imaging.py docstring).

Audio/video decode is stubbed: ``decode_media`` raises
NotImplementedError for modalities whose codecs aren't in this
container, per the build contract.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.imaging import decode_image, phash64, psnr  # noqa: F401

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


def decode_media(df: DataFrame, modality: str, **kw) -> DataFrame:
    """Dispatch per modality. Image is real (deterministic codec / PIL);
    audio & video codecs are absent in this container — stubbed per the
    build contract, the Spark plumbing (binary col + mapInPandas) is
    identical when a codec lands."""
    if modality == "image":
        return decode_image_meta(df, **kw)
    raise NotImplementedError(
        f"{modality!r} decode requires codec libraries not present in this "
        "container; plumbing is identical to decode_image_meta"
    )


def min_size_filter(meta: DataFrame, min_w: int = 8, min_h: int = 8) -> DataFrame:
    """IMAGES_MIN_WIDTH/HEIGHT gate (ref: pipelines/images.py ≈L60)."""
    return meta.filter(
        F.col("decode_ok") & (F.col("w") >= min_w) & (F.col("h") >= min_h)
    )


__all__ = [
    "IMAGE_META_SCHEMA",
    "THUMB_SCHEMA",
    "decode_image_meta",
    "resize_thumbnails",
    "decode_media",
    "min_size_filter",
]
