"""Similarity search over an embedding column (array<float>).

- Brute-force cosine (pairs / top-k): JVM-side zip_with + aggregate —
  exact, codegen-friendly, the correctness baseline. O(n·m) pairs: fine
  for a query set × corpus; use the LSH path for corpus × corpus at scale.
- Random-hyperplane LSH ANN: sign-bit bucket per vector (one numpy matmul
  per Arrow batch), candidates = bucket join (plus optional multi-probe),
  exact cosine re-rank inside buckets only. At 10^10 vectors the bucket
  key is uniform (hyperplanes are random), so the join doesn't skew; the
  brute-force path would shuffle n², the LSH path shuffles n.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (sequential left fold — matches
    the DuckDB oracle's list_dot_product evaluation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, brute force).
    Returns (id_a, id_b, cos_sim) with id_a < id_b, rounded to 4dp (the
    threshold applies to the rounded value so engines agree at the rim)."""
    # Per-row norm precompute: dot(v,v) is deterministic, so computing it
    # once per row instead of once per PAIR yields bit-identical cosines
    # (same operand values through the same formula) at 1/3 the array
    # traversals — the n² pair stage folds each 64-dim pair exactly once.
    e = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    a = e.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = e.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force): broadcast the query
    set (small side) against the corpus scan, window-rank per query.
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("vq")
    ).withColumn("nq", F.sqrt(dot(F.col("vq"), F.col("vq"))))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("vc")
    ).withColumn("nc", F.sqrt(dot(F.col("vc"), F.col("vc"))))
    sim = dot(F.col("vq"), F.col("vc")) / (F.col("nq") * F.col("nc"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, 4).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------------------------- LSH
def hyperplane_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 12,
    dim: int = 64,
    seed: int = 7,
    ntables: int = 1,
) -> DataFrame:
    """Random-hyperplane (SRP) LSH bucket ids per vector: ``ntables``
    independent tables of ``nbits`` sign bits each, packed as
    ``table_id * 2^nbits + bits`` so one explode+join covers all tables.
    One numpy matmul per Arrow batch for ALL tables at once.

    Recall math (SRP): a pair at angle θ collides in one table with
    p = (1 − θ/π)^nbits; across L tables recall = 1 − (1 − p)^L. More
    tables buy recall, more bits buy precision (smaller buckets)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(ntables * nbits, dim)).astype(np.float64)
    weights = (1 << np.arange(nbits, dtype=np.int64))
    table_base = (np.arange(ntables, dtype=np.int64) << nbits)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype="object")
        signs = (mat @ planes.T) > 0  # (batch, ntables*nbits)
        bits = (
            signs.reshape(len(mat), ntables, nbits).astype(np.int64) * weights
        ).sum(axis=2)  # (batch, ntables)
        return pd.Series(list(bits + table_base))

    return df.withColumn("buckets", _buckets(F.col(vec_col)))


def lsh_ann_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 8,
    dim: int = 64,
    seed: int = 7,
    ntables: int = 1,
) -> DataFrame:
    """Approximate per-vector top-k: candidates share an SRP bucket in ANY
    of ``ntables`` tables, exact cosine re-rank over the deduped candidate
    set. The shuffle key (table_id, bucket) is uniform by construction —
    no skew at 10^10 vectors. Candidate volume ≈ L·n²/2^nbits per table:
    tune (nbits up, ntables up) together to trade cost for recall.
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    b = hyperplane_buckets(df, id_col, vec_col, nbits, dim, seed, ntables)
    e = b.select(
        F.col(id_col),
        F.explode("buckets").alias("bucket"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a = e.select(
        F.col(id_col).alias("query_id"),
        "bucket",
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    c = e.select(
        F.col(id_col).alias("neighbor_id"),
        "bucket",
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cand = (
        a.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = cand.select(
        "query_id", "neighbor_id", F.round(sim, 4).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    nbits: int = 16,
    ntables: int = 12,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Corpus×corpus near-duplicate pairs with NO O(n²) stage — the
    production replacement for ``cosine_pairs`` (which stays as the exact
    small-sf oracle baseline).

    Candidates = pairs sharing an SRP bucket in any of ``ntables`` tables
    (16 bits ⇒ 65536 buckets/table: a random pair collides with
    p≈0.5^16, so candidate volume ≈ 12·n²/65536 ≈ n²/5500, shrinking
    further as vectors spread); every candidate is then EXACTLY verified
    with cosine ≥ threshold. At near-dup thresholds (θ small) per-table
    recall is high — e.g. cos 0.9987 ⇒ p₁=(1−θ/π)^16≈0.77, miss
    probability 0.23^12 ≈ 2·10⁻⁸ — so the output equals the brute-force
    result with overwhelming probability (the correctness gate checks
    exact equality against the crossJoin oracle).
    Returns (id_a, id_b, cos_sim) with id_a < id_b, rounded to 4dp."""
    b = hyperplane_buckets(df, id_col, vec_col, nbits, dim, seed, ntables)
    e = b.select(
        F.col(id_col),
        F.explode("buckets").alias("bucket"),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a = e.select(
        F.col(id_col).alias("id_a"),
        "bucket",
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    c = e.select(
        F.col(id_col).alias("id_b"),
        "bucket",
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cand = (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.select("id_a", "id_b", F.round(sim, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# ------------------------------------------------------------------- IVF
def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    ncells: int = 16,
    dim: int = 64,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Sampled k-means codebook for IVF: pull ≤``sample`` vectors to the
    driver (a few MB even at 10^10 rows — the SAMPLE is bounded, not the
    corpus), run a few Lloyd iterations in numpy, return (ncells, dim)
    L2-normalized centroids. Deterministic for a given seed."""
    rows = (
        df.select(as_double(F.col(vec_col)).alias("v"))
        .limit(sample)
        .collect()
    )
    mat = np.array([r.v for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(ncells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for ci in range(len(cent)):
            members = mat[assign == ci]
            if len(members):
                cent[ci] = members.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    ncells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    seed: int = 7,
    query_filter=None,
) -> DataFrame:
    """IVF approximate top-k — the recommended corpus×corpus scale path.

    Index: every vector is assigned to its nearest centroid cell (one
    broadcast numpy matmul per Arrow batch). Query: each vector probes its
    ``nprobe`` nearest cells; candidates = cell join; exact cosine re-rank
    inside. Cost ≈ nprobe/ncells of brute force with recall set by nprobe
    (measured on the synthetic corpus — tests/test_datapipe.py). The cell
    key is load-balanced by k-means itself; AQE handles residual
    cell-size skew. Returns (query_id, neighbor_id, cos_sim, rank)."""
    cent = train_centroids(df, vec_col, ncells, dim, seed=seed)

    def _assign_udf(n_top: int):
        @pandas_udf(T.ArrayType(T.IntegerType()))
        def _assign(vecs: pd.Series) -> pd.Series:
            mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            if len(mat) == 0:
                return pd.Series([], dtype="object")
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            scores = mat @ cent.T  # (batch, ncells)
            top = np.argsort(-scores, axis=1)[:, :n_top].astype(np.int32)
            return pd.Series(list(top))

        return _assign

    base = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    corpus = base.withColumn(
        "cell", F.explode(_assign_udf(1)(F.col("v")))
    ).select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # optional query-side restriction (Column predicate over df's columns):
    # index the FULL corpus, probe only the selected queries — the
    # query≪corpus shape every online ANN service runs
    qbase = base.filter(query_filter) if query_filter is not None else base
    probes = qbase.withColumn(
        "cell", F.explode(_assign_udf(nprobe)(F.col("v")))
    ).select(
        F.col(id_col).alias("query_id"),
        "cell",
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    cand = (
        probes.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = cand.select(
        "query_id", "neighbor_id", F.round(sim, 4).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------- IVF-PQ
def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 11,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the
    L2-normalized vector into ``m`` subspaces of ``dim/m`` dims and run
    an independent small k-means (``ksub`` centroids) in each. Trained
    like the IVF coarse codebook: a bounded ≤``sample``-vector driver
    sample (a few MB regardless of corpus size), numpy Lloyd
    iterations, deterministic per seed. Returns (m, ksub, dsub)."""
    assert dim % m == 0, "dim must split evenly into m subspaces"
    dsub = dim // m
    rows = (
        df.select(as_double(F.col(vec_col)).alias("v")).limit(sample).collect()
    )
    mat = np.array([r.v for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    books = np.zeros((m, ksub, dsub))
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=min(ksub, len(sub)), replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(len(cent)):
                members = sub[assign == ci]
                if len(members):
                    cent[ci] = members.mean(axis=0)
        books[j, : len(cent)] = cent
    return books


def ivfpq_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    ncells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    rerank: int = 32,
    seed: int = 7,
    query_filter=None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the MEMORY scale path for 10^10-vector
    corpora. IVF alone still shuffles and stores full vectors inside
    each probed cell; IVF-PQ's index row is (id, cell, m one-byte
    codes): a 64-dim float64 vector (512 B) compresses to ``m``=8 codes
    (8 B) — 64× — so the candidate join moves codes, never vectors.

    Stages (and where each runs):
    1. index — ONE Arrow pass over the corpus emits (cell, codes):
       nearest coarse centroid + per-subspace PQ code, both from
       broadcast numpy codebooks. No other corpus stage runs Python.
    2. probe — ONE Arrow pass over the (small) query side emits the
       ``nprobe`` nearest cells and the query's ADC lookup table
       LUT[j][c] = <q_sub_j, codebook[j][c]> (m × ksub doubles).
    3. ADC scoring — candidates = cell equijoin; the asymmetric
       distance Σ_j LUT[j][codes[j]] is pure JVM column algebra
       (zip_with + element_at + aggregate) over the compressed codes:
       the n-scale side of the join never touches Python and never
       carries a vector.
    4. re-rank — per query keep the top ``rerank`` ADC candidates
       (window), join those few ids back to the corpus vectors for
       exact cosine, emit the final top-``k``.

    PQ codes approximate the L2-NORMALIZED vector directly (no residual
    encoding — documented simplification; ADC scores then approximate
    cosine). Exactness property used by the contract oracle: at
    ``nprobe=ncells`` and ``rerank ≥ |corpus|`` the ADC prune keeps
    every candidate and the exact re-rank over all of them reproduces
    brute-force kNN value-for-value, regardless of codebook quality.
    Recall at realistic (nprobe, rerank) is measured in
    tests/test_datapipe.py. Returns (query_id, neighbor_id, cos_sim,
    rank)."""
    cent = train_centroids(df, vec_col, ncells, dim, seed=seed)
    books = train_pq_codebooks(df, vec_col, m=m, ksub=ksub, dim=dim, seed=seed + 4)
    dsub = dim // m

    @pandas_udf("struct<cell:int, codes:array<int>>")
    def _index(vecs: pd.Series) -> pd.DataFrame:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.DataFrame({"cell": [], "codes": []})
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cells = (mat @ cent.T).argmax(axis=1).astype("int32")
        codes = np.empty((len(mat), m), dtype="int32")
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.DataFrame({"cell": cells, "codes": list(codes)})

    @pandas_udf("struct<cells:array<int>, luts:array<array<double>>>")
    def _probe(vecs: pd.Series) -> pd.DataFrame:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.DataFrame({"cells": [], "luts": []})
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cells = np.argsort(-(mat @ cent.T), axis=1)[:, :nprobe].astype("int32")
        # LUT[j][c] = <q_sub_j, books[j][c]>  (m × ksub per query)
        luts = [
            [list(books[j] @ q[j * dsub:(j + 1) * dsub]) for j in range(m)]
            for q in mat
        ]
        return pd.DataFrame({"cells": list(cells), "luts": luts})

    base = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    corpus = base.withColumn("__ix", _index(F.col("v"))).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__ix.cell").alias("cell"),
        F.col("__ix.codes").alias("codes"),
    )
    qbase = base.filter(query_filter) if query_filter is not None else base
    probes = qbase.withColumn("__pr", _probe(F.col("v"))).select(
        F.col(id_col).alias("query_id"),
        F.explode(F.col("__pr.cells")).alias("cell"),
        F.col("__pr.luts").alias("luts"),
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("luts"),
            lambda c, lut: F.element_at(lut, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        probes.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", adc.alias("adc_score"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    pruned = (
        cand.withColumn("__r", F.row_number().over(w_adc))
        .filter(F.col("__r") <= rerank)
        .drop("__r", "adc_score")
    )
    # exact re-rank over the few surviving ids: queries broadcast (small
    # side), corpus vectors fetched by id equijoin
    norms = base.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    qv = norms.select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    if query_filter is not None:
        qv = norms.filter(query_filter).select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("va"), F.col("nrm").alias("na"),
        )
    nv = norms.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = (
        pruned.join(nv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", F.round(sim, 4).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


__all__ = [
    "as_double",
    "dot",
    "cosine",
    "cosine_pairs",
    "cosine_topk",
    "hyperplane_buckets",
    "lsh_ann_topk",
    "cosine_near_dup_lsh",
    "train_centroids",
    "ivf_topk",
    "train_pq_codebooks",
    "ivfpq_topk",
]
