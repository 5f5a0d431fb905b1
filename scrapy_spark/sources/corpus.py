"""Distributed synthetic corpus in the input_hint shape.

``synth_corpus_df`` maps an id column to deterministic image payloads in
the authoritative input schema (image_id, bytes, w, h, fmt, caption,
phash — BASELINE.json:input_hint) entirely executor-side via mapInPandas:
no driver materialization, so the same code synthesizes 10^10 rows on a
cluster (the id DataFrame is the only input and partitions freely).

Payload generation reuses the deterministic codec
(``functions.imaging``): rawrgb (lossless) / qrgb (lossy stand-in,
PSNR≈47 dB), seeded per image_id — any executor re-derives the identical
byte payload, which is what makes per-row parity checks meaningful.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.imaging import encode_image, phash64, synth_image
from ..plans import schemas

_WORDS = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibex", "jay"]


def synth_corpus_df(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → input_hint-shaped corpus rows, one per id, deterministic."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                iid = f"img{int(raw_id):010d}"
                arr = synth_image(iid)
                fmt = "rawrgb" if int(raw_id) % 5 < 3 else "qrgb"
                word = _WORDS[int(raw_id) % len(_WORDS)]
                rows.append(
                    (
                        iid,
                        encode_image(arr, fmt),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        fmt,
                        f"caption for {iid}: {word}",
                        phash64(arr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schemas.CORPUS.fields]
            )

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, schema=schemas.CORPUS
    )


MEDIA_SCHEMA = "media_id string, bytes binary"


def synth_media_df(
    ids: DataFrame, modality: str, id_col: str = "doc_id"
) -> DataFrame:
    """(id) → deterministic audio/video payload rows (media_id, bytes),
    executor-side like ``synth_corpus_df`` — header fields are pure
    formulas of the id (functions/media.py audio_params/video_params),
    so decode output is value-oracle-able."""
    from ..functions.media import synth_audio, synth_video

    gen = {"audio": synth_audio, "video": synth_video}[modality]
    prefix = {"audio": "aud", "video": "vid"}[modality]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (f"{prefix}{int(r):010d}", gen(f"{prefix}{int(r):010d}", int(r)))
                for r in pdf[id_col]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "bytes"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


__all__ = ["synth_corpus_df", "synth_media_df", "MEDIA_SCHEMA"]
