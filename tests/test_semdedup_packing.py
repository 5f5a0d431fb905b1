"""SemDeDup (datapipe/semdedup.py) and sequence packing
(datapipe/packing.py) — behavioral ground truth on hand-built corpora
plus the properties the contract oracles can't see: the trained-codebook
path, cell-restriction semantics, and parallelism-independence of the
distributed prefix sum."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ packing
def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_spans_ground_truth(spark):
    from scrapy_spark.datapipe.packing import pack_spans

    # token counts: 3, 5, 4, 0 (dropped), 2  → offsets 0, 3, 8, 12
    texts = ["a b c", "d e f g h", "i j k l", "!!!", "m n"]
    out = {
        r.doc_id: r
        for r in pack_spans(_docs(spark, texts), budget=4).collect()
    }
    assert set(out) == {0, 1, 2, 4}  # the all-punct doc has 0 tokens
    assert (out[0].tok_start, out[0].first_chunk, out[0].last_chunk) == (0, 0, 0)
    # doc 1: tokens 3..7 → chunks 0..1 (boundary at 4)
    assert (out[1].tok_start, out[1].first_chunk, out[1].last_chunk, out[1].n_chunks) == (3, 0, 1, 2)
    # doc 2: tokens 8..11 → exactly chunk 2
    assert (out[2].tok_start, out[2].first_chunk, out[2].last_chunk, out[2].n_chunks) == (8, 2, 2, 1)
    # doc 4: tokens 12..13 → chunk 3
    assert (out[4].tok_start, out[4].first_chunk, out[4].n_chunks) == (12, 3, 1)


def test_pack_spans_partition_invariance(spark):
    """The prefix sum must be EXACT regardless of input partitioning —
    the whole point of the range-partition + broadcast-offsets build."""
    from scrapy_spark.datapipe.packing import pack_spans

    texts = [" ".join("tok" for _ in range((i * 7) % 13 + 1)) for i in range(200)]
    base = _docs(spark, texts)
    a = sorted(map(tuple, pack_spans(base, budget=32).collect()))
    for nparts in (1, 3, 17):
        b = sorted(
            map(tuple, pack_spans(base.repartition(nparts), budget=32).collect())
        )
        assert a == b
    # contiguity: offsets tile the concatenated stream exactly
    rows = sorted(pack_spans(base, budget=32).collect(), key=lambda r: r.doc_id)
    acc = 0
    for r in rows:
        assert r.tok_start == acc
        acc += r.n_tok


def test_pack_summary(spark):
    from scrapy_spark.datapipe.packing import pack_summary

    texts = ["a b c", "d e f g h", "i j k l", "m n"]  # 14 tokens
    row = pack_summary(_docs(spark, texts), budget=4).collect()[0]
    assert row.total_tokens == 14
    assert row.n_full_chunks == 3
    assert row.tail_tokens == 2
    assert row.n_fragmented_docs == 1  # only doc 1 straddles a boundary


# ----------------------------------------------------------- semdedup
def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _planted_corpus(n=60, dim=16, seed=3):
    """Random unit-ish vectors + near-copies of the first 10 (cosine
    ≈0.999) — ids n..n+9 duplicate ids 0..9."""
    rng = np.random.RandomState(seed)
    base = rng.randn(n, dim)
    dups = base[:10] * 1.0
    dups[:, ::2] *= 1.02  # tiny anisotropic jitter
    return np.vstack([base, dups])


def test_semdedup_one_cell_equals_brute_force(spark):
    """With ncells=1 the cell restriction vanishes: pairs must equal the
    exact brute-force near-dup pairs — whole-pipeline exactness check
    (same property style as the IVF nprobe=ncells oracle)."""
    from scrapy_spark.datapipe.semdedup import semdedup_pairs
    from scrapy_spark.datapipe.similarity import cosine_pairs

    df = _emb(spark, _planted_corpus())
    sem = sorted(
        (r.id_a, r.id_b, r.cos_sim)
        for r in semdedup_pairs(df, ncells=1, threshold=0.99).collect()
    )
    bf = sorted(
        map(tuple, cosine_pairs(df, threshold=0.99).collect())
    )
    assert sem == bf and len(sem) >= 10


def test_semdedup_cell_restriction_is_subset(spark):
    """With k>1 cells, pairs are a SUBSET of brute force (the documented
    recall trade), and every emitted pair is cell-local."""
    from scrapy_spark.datapipe.semdedup import semdedup_pairs
    from scrapy_spark.datapipe.similarity import cosine_pairs

    df = _emb(spark, _planted_corpus())
    sem = semdedup_pairs(df, ncells=6, threshold=0.99).collect()
    bf = {(r.id_a, r.id_b) for r in cosine_pairs(df, threshold=0.99).collect()}
    assert {(r.id_a, r.id_b) for r in sem} <= bf
    assert len(sem) > 0


def test_semdedup_trained_codebook_finds_planted_dups(spark):
    """The k-means path (train_centroids + Arrow matmul assignment) must
    put each planted near-copy in its original's cell — near-identical
    vectors have near-identical centroid scores — so every planted pair
    survives the cell restriction."""
    from scrapy_spark.datapipe.semdedup import semdedup_reps

    df = _emb(spark, _planted_corpus())
    reps = {
        r.vec_id: r.rep_id
        for r in semdedup_reps(df, ncells=4, threshold=0.99, trained=True).collect()
    }
    for i in range(10):
        assert reps.get(60 + i) == i  # dup labeled by its original


def test_semdedup_exact_and_matmul_assignments_agree(spark):
    """On well-separated cells the JVM broadcast-join ranker and the
    numpy matmul assigner must pick the same cell per vector."""
    from scrapy_spark.datapipe.semdedup import (
        assign_cells, assign_cells_matmul, default_centroids,
    )

    vecs = _planted_corpus(n=40, dim=8, seed=11)
    df = _emb(spark, vecs)
    cent_df = default_centroids(df, ncells=5)
    cent_rows = sorted(cent_df.collect(), key=lambda r: r.cell)
    cb = np.array([r.cvec for r in cent_rows])
    a = {r.id: r.cell for r in assign_cells(df, cent_df).collect()}
    b = {r.id: r.cell for r in assign_cells_matmul(df, cb).collect()}
    assert a == b
