"""Fingerprint dedupe — the RFPDupeFilter as relational ops (SURVEY §2.2 F1,
§2.3 J1; ref: scrapy/dupefilters.py::request_seen ≈L55, consulted from
scheduler.enqueue_request ≈L230).

Three layers, cheapest first:

1. **within-epoch dedupe** — window rank per fp, keep first by
   ``(parent_seq, url_canon)`` (SEMANTICS 8d),
2. **bloom prefilter** — definitely-unseen candidates skip the join
   (operators/bloom.py); never drops,
3. **exact seen-set check** — the join-order trick that keeps url_seen
   un-shuffled: instead of ``candidates LEFT ANTI url_seen`` (which would
   build a hash table over the 10^10-row side), compute
   ``hits = url_seen LEFT SEMI broadcast(candidates)`` — a streaming scan of
   url_seen probing a tiny broadcast build — then
   ``candidates LEFT ANTI broadcast(hits)``. Both joins broadcast the small
   side; url_seen is never shuffled and its scan is pruned by a pushed
   ``bucket IN (...)`` predicate over the candidates' fp buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bloom import ShardedBloom

# url_seen storage bucket count: pmod(xxhash64(fp), BUCKETS) — pinned because
# it's part of the on-disk layout (manifest-compatible across restarts).
BUCKETS = 32


def with_bucket(df: DataFrame, fp_col: str = "fp") -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(fp_col)), F.lit(BUCKETS)))


def dedupe_within_epoch(candidates: DataFrame) -> DataFrame:
    """Keep one candidate per fp: first by (kind, parent_seq, url_canon,
    url) — SEMANTICS 8d; ``kind`` (redirect=1 < link=2) present only in
    the engine path."""
    order = (
        [F.asc("kind")] if "kind" in candidates.columns else []
    ) + [F.asc("parent_seq"), F.asc("url_canon"), F.asc("url")]
    w = Window.partitionBy("fp").orderBy(*order)
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# Above this many candidate rows the broadcast-inverted join stops paying:
# building a driver-side broadcast of the candidate fps is serial work that
# caps scaling, while a shuffle anti-join is fully parallel.
BROADCAST_CANDIDATE_MAX = 100_000


def anti_join_seen(
    candidates: DataFrame,
    url_seen: DataFrame | None,
    bloom: "ShardedBloom | ShardedCuckoo | None" = None,
    n_candidates: int | None = None,
) -> DataFrame:
    """Exact seen-set dedupe; returns the fresh candidates.

    ``bloom`` is any prefilter exposing ``n_added`` + ``probe_udf``
    (operators/bloom.py ShardedBloom or operators/cuckoo.py
    ShardedCuckoo — the north_rule's bloom/cuckoo pair).

    Two physical strategies, chosen by candidate-batch size
    (``n_candidates``, when the caller already knows it):

    - **small batch** (the common per-epoch case): candidates are the
      broadcast side of both joins — url_seen is never shuffled and its
      scan is pruned by the candidates' fp-bucket set.
    - **large batch**: plain shuffle LEFT ANTI on ``fp`` — both sides
      repartition by fp, fully parallel, no driver-side broadcast build.
      At cluster scale url_seen is Iceberg bucket-partitioned on fp, which
      turns this into a storage-partitioned join (candidates shuffle to the
      seen layout; the seen side is read in place, never shuffled).
    """
    if url_seen is None:
        return candidates

    if n_candidates is not None and n_candidates > BROADCAST_CANDIDATE_MAX:
        return candidates.join(url_seen.select("fp"), "fp", "left_anti")

    if bloom is not None and bloom.n_added > 0:
        # Executor-side prefilter: the probe runs as an Arrow-batched UDF
        # against a BROADCAST of the bloom bit-arrays — no fingerprint ever
        # reaches the driver (the r1 driver-side collect was a cluster-scale
        # bottleneck). Candidates that miss the bloom are definitely unseen
        # and skip the exact join; survivors ("maybe seen") proceed. The
        # final anti-join runs over ALL candidates against the (tiny) hits
        # set, so the clean/suspect split never needs a second UDF pass.
        #
        # Executor-RESIDENT filters (operators/diskfilter.py) don't
        # broadcast at all: probe input repartitions by the fp-derived
        # shard id so each task loads only ITS shard's file — per-task
        # memory filter_size/shards, the 10^10-key design point.
        probe_in = candidates.select("fp")
        if getattr(bloom, "prefers_shard_partitioning", False):
            probe_in = bloom.repartition_by_shard(probe_in)
        maybe_fps = probe_in.filter(
            bloom.probe_udf(candidates.sparkSession)(F.col("fp"))
        )
        suspects_fp = maybe_fps
    else:
        suspects_fp = candidates.select("fp")

    # bucket pruning: ≤BUCKETS ints to the driver (aggregate, not data)
    cand_buckets = [
        r.bucket
        for r in with_bucket(suspects_fp).select("bucket").distinct().collect()
    ]
    if not cand_buckets:
        return candidates  # every candidate definitely unseen — no join
    seen = with_bucket(url_seen, "fp") if "bucket" not in url_seen.columns else url_seen
    pruned = seen.filter(F.col("bucket").isin(cand_buckets))
    hits = pruned.join(F.broadcast(suspects_fp), "fp", "left_semi").select("fp")
    return candidates.join(F.broadcast(hits), "fp", "left_anti")
