"""SemDeDup — semantic deduplication over embedding k-means cells.

Public method (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): cluster the
corpus embeddings with k-means, compute pairwise cosine similarity ONLY
within each cluster, and drop every member of a near-duplicate group but
one representative. The clustering bounds the pair stage: instead of
O(n²) the cost is Σ|cell|² ≈ n²/k for balanced cells, and each cell's
pair join is an equijoin on the cell id — the same
bucket-join-then-verify shape as the LSH near-dup path, with the buckets
chosen semantically instead of randomly.

Two assignment paths:

- ``assign_cells`` (exact, JVM): broadcast the (small) centroid table,
  score every vector against every centroid with the shared sequential
  ``dot`` fold, rank by (rounded cosine DESC, cell ASC). Pure Column
  algebra — whole-stage-codegen, no Python — and bit-reproducible against
  a SQL oracle because both engines fold the dot product left-to-right
  and rank the same rounded value. Right for k up to a few hundred.
- ``assign_cells_matmul`` (Arrow, numpy): one broadcast matmul per Arrow
  batch against a trained codebook — the scale path for k in the
  thousands (SemDeDup's paper setting), identical to the IVF assigner.

At 10^10 rows: assignment is map-only; the within-cell self-join
shuffles on the cell id (AQE handles residual cell-size skew — k-means
cells are roughly balanced by construction); the connected-components
representative pass reuses datapipe/cluster.py's filtering-CC machinery
(never all-pairs, never driver-bound).

Reference anchor: training-data-pipeline extension (SURVEY §2
"beyond-reference" family), not an upstream Scrapy operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .cluster import cluster_representatives
from .similarity import as_double, dot, train_centroids


def default_centroids(
    df: DataFrame, ncells: int = 8, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed codebook: the ``ncells`` lowest-id vectors,
    verbatim (no Lloyd iterations). Fully SQL-replayable — the oracle
    can reconstruct the exact same codebook from the table — which makes
    the whole SemDeDup pipeline value-checkable end-to-end. For quality
    clustering use ``train_centroids`` + ``assign_cells_matmul``.

    The id-order cut compiles to TakeOrderedAndProject (parallel partial
    top-k per partition, ncells-row merge on the driver) — never a
    single-partition global window; the rank over the surviving ncells
    rows is a window over a broadcast-sized frame."""
    low = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("cvec")
    ).orderBy(F.asc(id_col)).limit(ncells)
    w = Window.orderBy(F.asc(id_col))
    return low.select(
        (F.row_number().over(w) - 1).cast("int").alias("cell"),
        F.col(id_col).alias("centroid_id"),
        "cvec",
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, v, nrm, cell): nearest-centroid assignment by cosine,
    ties broken toward the lower cell id. Broadcast-join the k-row
    centroid table, then reduce the n·k scored rows with a map-side-
    combining ``max_by`` hash aggregate — each task collapses its local
    rows back to one per vector BEFORE the shuffle (a window rank here
    would shuffle all n·k rows). All-JVM; cosine is rounded to 4dp
    before the argmax so it is stable across engines (a half-ulp fold
    difference can't flip the winner unless two cells genuinely tie at
    4dp, and then the cell-id tiebreak decides identically everywhere)."""
    base = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    cent = centroids.select(
        "cell", F.col("cvec"),
        F.sqrt(dot(F.col("cvec"), F.col("cvec"))).alias("cnrm"),
    )
    scored = base.join(F.broadcast(cent)).withColumn(
        "__cos",
        F.round(
            dot(F.col("v"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm")), 4
        ),
    )
    best = F.max_by(
        F.struct("v", "nrm", "cell"),
        F.struct(F.col("__cos").alias("c"), (-F.col("cell")).alias("nc")),
    )
    return (
        scored.groupBy("id")
        .agg(best.alias("__best"))
        .select("id", "__best.v", "__best.nrm", "__best.cell")
    )


def assign_cells_matmul(
    df: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path assignment: one numpy matmul per Arrow batch against a
    broadcast (k, dim) codebook — use with ``train_centroids`` when k is
    too large for the broadcast-join ranker."""
    cent = np.asarray(codebook, dtype=np.float64)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    @pandas_udf(T.IntegerType())
    def _cell(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(x, dtype=np.float64) for x in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype="int32")
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ cent.T).argmax(axis=1).astype(np.int32))

    base = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    return base.withColumn("cell", _cell(F.col("v")))


def semdedup_pairs(
    df: DataFrame,
    centroids: DataFrame | None = None,
    ncells: int = 8,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """→ (id_a, id_b, cell, cos_sim): within-cell near-duplicate pairs at
    ``cosine ≥ threshold`` (rounded to 4dp before the threshold so engines
    agree at the rim). Pairs whose members fall in different cells are
    NOT emitted — that recall loss vs brute force is SemDeDup's documented
    trade for the n²/k cost bound."""
    if centroids is None:
        if trained:
            cb = train_centroids(
                df, vec_col=vec_col, ncells=ncells, dim=dim, seed=seed
            )
            cells = assign_cells_matmul(df, cb, id_col=id_col, vec_col=vec_col)
        else:
            cells = assign_cells(
                df,
                default_centroids(df, ncells, id_col=id_col, vec_col=vec_col),
                id_col=id_col,
                vec_col=vec_col,
            )
    else:
        cells = assign_cells(df, centroids, id_col=id_col, vec_col=vec_col)

    a = cells.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "cell",
    )
    b = cells.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cell", F.round(sim, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semdedup_reps(
    df: DataFrame,
    centroids: DataFrame | None = None,
    ncells: int = 8,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
) -> DataFrame:
    """→ (vec_id, rep_id) for every vector in a within-cell near-dup
    group: rep_id = the minimum id reachable through within-cell pairs
    (transitive, across cells if a vector chains two groups — the CC pass
    is global even though candidate edges are cell-local). Rows with
    vec_id != rep_id are SemDeDup's delete list."""
    pairs = semdedup_pairs(
        df, centroids=centroids, ncells=ncells, threshold=threshold,
        id_col=id_col, vec_col=vec_col, trained=trained,
    )
    return cluster_representatives(pairs).select(
        F.col("doc_id").alias(id_col), "rep_id"
    )


__all__ = [
    "default_centroids",
    "assign_cells",
    "assign_cells_matmul",
    "semdedup_pairs",
    "semdedup_reps",
]
