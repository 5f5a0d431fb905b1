"""Deterministic stratified sampling — training-data mixing needs exact
per-stratum quotas ("10k docs per (lang, source) cell"), reproducibly,
with no driver-side state.

``sample_stratified`` ranks every row inside its stratum by a
content-derived hash (md5 of the key column + seed) and keeps the first
n — a uniform-without-replacement sample that is (a) EXACT per stratum
(``df.sampleBy`` is Bernoulli: only approximate counts), (b) stable
across runs/cluster sizes/partitionings (hash order, not row order),
and (c) one window per stratum, no shuffle beyond the rank.

Scale note: a window rank over pathological mega-strata concentrates a
stratum on one task; the same two-phase trick as the frontier pop
(operators/pop.py) applies — per-partition local top-n, then re-rank
the ≤ P·n survivors. Implemented in ``sample_stratified`` behind
``two_phase=True`` for exactly that case; both phases keep the hash
order, so results are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_key(key_col: str, seed: str) -> F.Column:
    return F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(seed)))


def sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
    seed: str = "0",
    two_phase: bool = False,
) -> DataFrame:
    """Keep exactly min(n, |stratum|) rows per stratum, chosen by hash
    order of ``key_col`` salted with ``seed``. Returns the original
    columns plus ``sample_rank`` (1-based within stratum)."""
    key = _rank_key(key_col, seed)
    w = Window.partitionBy(*strata_cols).orderBy(key, F.col(key_col))
    if two_phase:
        # local pre-trim: each physical partition keeps its n best-ranked
        # rows per stratum (superset of the global winners), then the
        # global rank runs over the ≤ P·n survivors
        local = Window.partitionBy(
            F.spark_partition_id(), *strata_cols
        ).orderBy(key, F.col(key_col))
        df = df.withColumn("__lr", F.row_number().over(local)).filter(
            F.col("__lr") <= n_per_stratum
        ).drop("__lr")
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


__all__ = ["sample_stratified"]
