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
]
