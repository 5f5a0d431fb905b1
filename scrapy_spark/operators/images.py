"""Image pipeline operators + the J8 payload-parity harness (SURVEY §2.1
S10, §2.3 J8; ref: scrapy/pipelines/images.py::ImagesPipeline ≈L60,
convert_image ≈L130, thumbs ≈L110; parity bar from BASELINE.json
input_hint: decoded-pixel PSNR ≥ 40 dB for lossy formats, bit-exact for
lossless, exact caption equality).

Everything is Arrow-batched pandas UDFs over binary columns — numpy per
batch, no per-row Python at the Spark level.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.imaging import (
    LOSSLESS_FORMATS,
    decode_image,
    encode_image,
    psnr,
)

_VALIDATE_SCHEMA = T.StructType(
    [
        T.StructField("decoded_ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),  # inf → None-safe large
        T.StructField("bit_exact", T.BooleanType()),
    ]
)


@pandas_udf(_VALIDATE_SCHEMA)
def _validate_pair_udf(
    got: pd.Series, ref: pd.Series, fmt: pd.Series
) -> pd.DataFrame:
    rows = []
    for g, r, f in zip(got, ref, fmt):
        if g is None or r is None:
            rows.append((False, None, False))
            continue
        try:
            ga, _ = decode_image(bytes(g))
            ra, _ = decode_image(bytes(r))
        except (ValueError, NotImplementedError):
            rows.append((False, None, False))
            continue
        if ga.shape != ra.shape:
            rows.append((True, 0.0, False))
            continue
        p = psnr(ga, ra)
        rows.append((True, min(p, 999.0), bytes(g) == bytes(r)))
    return pd.DataFrame(rows, columns=["decoded_ok", "psnr_db", "bit_exact"])


def validate_payload(
    items: DataFrame, corpus: DataFrame, psnr_floor_db: float = 40.0
) -> DataFrame:
    """J8: crawled items ⋈ reference corpus ON image_id → per-row verdict.

    Adds ``decoded_ok, psnr_db, bit_exact, caption_ok, payload_ok``:
    lossless formats must be bit-exact, lossy must clear ``psnr_floor_db``
    after decode, captions must match exactly (input_hint contract)."""
    ref = corpus.select(
        "image_id",
        F.col("bytes").alias("ref_bytes"),
        F.col("caption").alias("ref_caption"),
        F.col("fmt").alias("ref_fmt"),
    )
    joined = items.join(ref, "image_id", "left")
    v = _validate_pair_udf(F.col("bytes"), F.col("ref_bytes"), F.col("ref_fmt"))
    lossless = F.col("ref_fmt").isin(*LOSSLESS_FORMATS)
    return (
        joined.withColumn("__v", v)
        .withColumn("decoded_ok", F.col("__v.decoded_ok"))
        .withColumn("psnr_db", F.col("__v.psnr_db"))
        .withColumn("bit_exact", F.col("__v.bit_exact"))
        .drop("__v")
        .withColumn("caption_ok", F.col("caption") == F.col("ref_caption"))
        .withColumn(
            "payload_ok",
            F.col("decoded_ok")
            & F.col("caption_ok")
            & F.when(lossless, F.col("bit_exact")).otherwise(
                F.col("psnr_db") >= psnr_floor_db
            ),
        )
        .drop("ref_bytes", "ref_caption")
    )


def min_size_filter(items: DataFrame, min_w: int = 0, min_h: int = 0) -> DataFrame:
    """IMAGES_MIN_WIDTH / IMAGES_MIN_HEIGHT gate (ref images.py ≈L90) —
    pure Column filter on the typed metadata columns."""
    return items.filter((F.col("w") >= min_w) & (F.col("h") >= min_h))


@pandas_udf(T.BinaryType())
def _thumb_udf(data: pd.Series, max_side: pd.Series) -> pd.Series:
    """Nearest-neighbor downscale re-encoded as rawrgb — the IMAGES_THUMBS
    semantics (ref images.py thumbs ≈L110) with the sandbox codec."""
    import numpy as np

    out = []
    for d, ms in zip(data, max_side):
        if d is None:
            out.append(None)
            continue
        try:
            arr, _ = decode_image(bytes(d))
        except (ValueError, NotImplementedError):
            out.append(None)
            continue
        h, w = arr.shape[:2]
        scale = max(h, w) / max(int(ms), 1)
        if scale > 1:
            ys = np.linspace(0, h - 1, max(1, round(h / scale))).astype(int)
            xs = np.linspace(0, w - 1, max(1, round(w / scale))).astype(int)
            arr = arr[ys][:, xs]
        out.append(encode_image(np.ascontiguousarray(arr), "rawrgb"))
    return pd.Series(out)


def with_thumbnails(items: DataFrame, sizes: dict[str, int]) -> DataFrame:
    """IMAGES_THUMBS: one binary column per named size."""
    out = items
    for name, max_side in sizes.items():
        out = out.withColumn(
            f"thumb_{name}", _thumb_udf(F.col("bytes"), F.lit(max_side))
        )
    return out
