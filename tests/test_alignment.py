"""datapipe/alignment.py — CLIP-score-style image↔caption alignment
gating: cosine correctness on handcrafted vectors (parallel / orthogonal
/ anti-parallel / zero-norm), gate threshold semantics incl. the rounded
rim, histogram binning (negative bins included), and the exact
byte-level image dedup tier (datapipe/images.py exact_bytes_dedup_reps)."""

from __future__ import annotations

import math

from scrapy_spark.datapipe.alignment import (
    alignment_gate,
    alignment_histogram,
    alignment_scores,
)
from scrapy_spark.datapipe.images import exact_bytes_dedup_reps


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id long, img_emb array<float>, txt_emb array<float>"
    )


def test_alignment_scores_handcrafted(spark):
    df = _pairs_df(
        spark,
        [
            (1, [1.0, 0.0], [2.0, 0.0]),  # parallel → 1.0
            (2, [1.0, 0.0], [0.0, 3.0]),  # orthogonal → 0.0
            (3, [1.0, 0.0], [-1.0, 0.0]),  # anti-parallel → -1.0
            (4, [1.0, 1.0], [1.0, 0.0]),  # 45° → cos = 1/√2
            (5, [1.0, 0.0], [0.0, 0.0]),  # zero-norm → NULL
        ],
    )
    got = {r.pair_id: r.align_cos for r in alignment_scores(df).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.0
    assert got[3] == -1.0
    assert got[4] == round(1 / math.sqrt(2), 4)
    assert got[5] is None


def test_alignment_gate_threshold_and_null(spark):
    df = _pairs_df(
        spark,
        [
            (1, [1.0, 0.0], [1.0, 0.0]),  # 1.0 → kept
            # cos = 0.28 after rounding sits ON the rim → kept (>=)
            (2, [1.0, 0.0], [0.28, math.sqrt(1 - 0.28**2)]),
            (3, [1.0, 0.0], [0.2, math.sqrt(1 - 0.2**2)]),  # 0.2 → dropped
            (4, [1.0, 0.0], [0.0, 0.0]),  # NULL → dropped, not NULL
        ],
    )
    got = {r.pair_id: (r.align_cos, r.kept) for r in alignment_gate(df).collect()}
    assert got[1] == (1.0, True)
    assert got[2][1] is True and abs(got[2][0] - 0.28) < 1e-9
    assert got[3] == (0.2, False)
    assert got[4] == (None, False)  # coalesce: NULL score is an explicit drop


def test_alignment_histogram_bins(spark):
    df = _pairs_df(
        spark,
        [
            (1, [1.0, 0.0], [1.0, 0.0]),  # 1.0 → bin 1.0
            (2, [1.0, 0.0], [1.0, 0.001]),  # ≈1.0 → bin 0.95 or 1.0
            (3, [1.0, 0.0], [0.07, math.sqrt(1 - 0.07**2)]),  # → bin 0.05
            (4, [1.0, 0.0], [-1.0, 0.0]),  # -1.0 → bin -1.0
            (5, [1.0, 0.0], [0.0, 0.0]),  # NULL → excluded
        ],
    )
    got = {r.bin_lo: r.n for r in alignment_histogram(df).collect()}
    assert got[0.05] == 1
    assert got[-1.0] == 1
    assert sum(got.values()) == 4  # NULL row excluded


def test_exact_bytes_dedup_reps(spark):
    rows = [
        (10, bytearray(b"AAA")),
        (11, bytearray(b"AAA")),  # dup of 10
        (12, bytearray(b"BBB")),
        (13, bytearray(b"AAA")),  # dup of 10
        (14, bytearray(b"CCC")),
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    got = {
        r.image_id: r.rep_id for r in exact_bytes_dedup_reps(df).collect()
    }
    assert got == {10: 10, 11: 10, 12: 12, 13: 10, 14: 14}
    # digest column is the actual md5 hex of the payload
    row = (
        exact_bytes_dedup_reps(df)
        .filter("image_id = 12")
        .collect()[0]
    )
    import hashlib

    assert row.content_md5 == hashlib.md5(b"BBB").hexdigest()
