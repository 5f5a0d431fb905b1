"""Window-ranked priority pop (SURVEY §2.5 W1/W2, §4.3.1; ref:
scrapy/pqueues.py::ScrapyPriorityQueue ≈L40 / DownloaderAwarePriorityQueue
≈L150).

The pop is the scheduling core: per-slot rank by (priority, seq), capacity
cut, then the downloader-aware global order — rank-major across slots, which
IS the reference's "pop from the slot with fewest active downloads" loop —
and the global budget top-k.

Skew note (north_rule): a window ``partitionBy("slot")`` hot-spots when one
domain holds 10^8 queued rows. ``salted_pretrim`` bounds that with a
**salted pre-cut**: rank within ``(slot, salt)`` where
``salt = pmod(xxhash64(seq), S)``, keep the per-salt-group top-``max_cap``.
Any row in a slot's true top-``cap`` is necessarily within its salt group's
top-``cap`` under the same ordering, so the pre-cut keeps a superset of the
exact answer while splitting a hot slot's 10^8 rows across S × shuffle
partitions; the exact window then sees ≤ S·cap rows per slot. Everything
stays JVM-side (window exec, no Python) — an earlier mapInPandas variant
shipped the full frontier through Arrow and was the scaling bottleneck.
The final budget cut is ``orderBy().limit(B)`` — Spark executes it as
TakeOrderedAndProject (a top-k, never a full sort of the frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig

# Salt fan-out for the pre-cut. Enough to split a hot domain across every
# core of a large executor fleet without inflating the survivor set
# (survivors ≤ SALT_BUCKETS × cap per slot).
SALT_BUCKETS = 16


def _seq_key(cfg: CrawlConfig):
    # LIFO memory queue (reference default) ⇒ newest first on ties
    return F.desc("seq") if cfg.queue_order == "lifo" else F.asc("seq")


def salted_pretrim(
    eligible: DataFrame, cfg: CrawlConfig, max_cap: int, salt_buckets: int = SALT_BUCKETS
) -> DataFrame:
    """Skew-breaking pre-cut: per-(slot, salt) top-``max_cap`` under the
    exact pop ordering — a strict superset of every slot's true top-cap."""
    salted = eligible.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("seq")), F.lit(salt_buckets))
    )
    w = Window.partitionBy("slot", "__salt").orderBy(F.desc("priority"), _seq_key(cfg))
    return (
        salted.withColumn("__prn", F.row_number().over(w))
        .filter(F.col("__prn") <= max_cap)
        .drop("__salt", "__prn")
    )


def global_seq(
    df: DataFrame, order_cols: list[str], start: int, out_col: str = "seq"
) -> DataFrame:
    """Deterministic dense 1-based global sequence over ``order_cols``,
    shifted by ``start`` — WITHOUT a single-partition global window.

    ``Window.orderBy(...)`` with no partitioning funnels every row through
    ONE task (Spark plans an Exchange SinglePartition); at millions of new
    links per epoch that task is the epoch's serial bottleneck. Instead:
    range-repartition on the order keys, rank within each partition, then
    add per-partition offsets via a prefix sum over the (≤ partitions)-row
    count table, broadcast back. Equal keys land in the same range
    partition (RangePartitioner is key-based), so concatenating partitions
    in pid order IS the global order, and the result is independent of
    parallelism/partition count as long as ``order_cols`` totally order
    the rows (ties only among fully identical rows — then seq values just
    permute among identical rows).

    Cost: one range shuffle + a tiny broadcast; every stage parallel.

    The ``(rows, __pid)`` frame is PINNED (eager ``localCheckpoint``)
    before the counts subplan and the probe side consume it. Without the
    pin each side re-instantiates the range exchange independently, and
    the two instantiations need not agree: the RangePartitioner's sample
    seeds derive from the child's runtime partition layout, which AQE
    re-plans per query from runtime stats — so the sampled bounds (and
    AQE's post-shuffle coalescing) can differ between the two plans.
    ``__pid`` then means different things on the two join sides and the
    inner join silently drops or mis-offsets rows (observed: ~95k of 177k
    epoch links lost at ``local[8]``, parallelism-dependent). The pin
    makes both sides read one materialization; it costs one batch-sized
    checkpoint, freed by the ContextCleaner when the plan is dropped.
    """
    keys = [F.asc(c) for c in order_cols]
    d = df.repartitionByRange(*[F.col(c) for c in order_cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    d = d.localCheckpoint(eager=True)
    w_local = Window.partitionBy("__pid").orderBy(*keys)
    d = d.withColumn("__rn", F.row_number().over(w_local))
    counts = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # prefix sum over ≤ shuffle-partition-count rows: trivially small
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        d.join(F.broadcast(offs), "__pid")
        .withColumn(
            out_col,
            (F.col("__rn") + F.col("__off") + F.lit(start - 1)).cast("long"),
        )
        .drop("__pid", "__rn", "__off")
    )


def rank_and_pop(
    eligible: DataFrame,
    cfg: CrawlConfig,
    budget: int,
    pretrim_cap: int | None = None,
) -> DataFrame:
    """``eligible`` must carry a ``concurrency`` column (per-slot capacity).

    ``pretrim_cap``: upper bound over all slots' concurrency — enables the
    salted skew-proof pre-cut; pass None to disable (exact window only).

    Returns popped rows with ``slot_rank`` (rank within slot) and ``rank``
    (global pop order within the epoch, 1-based).
    """
    seq_key = _seq_key(cfg)
    if pretrim_cap is not None:
        eligible = salted_pretrim(eligible, cfg, pretrim_cap)

    w_slot = Window.partitionBy("slot").orderBy(F.desc("priority"), seq_key)
    ranked = eligible.withColumn("slot_rank", F.row_number().over(w_slot)).filter(
        F.col("slot_rank") <= F.col("concurrency")
    )

    if cfg.downloader_aware:
        order = [F.asc("slot_rank"), F.desc("priority"), seq_key, F.asc("slot")]
    else:
        order = [F.desc("priority"), seq_key, F.asc("slot")]

    # top-k: TakeOrderedAndProject, not a global sort of the frontier
    popped = ranked.orderBy(*order).limit(budget)
    w_global = Window.orderBy(*order)
    return popped.withColumn("rank", F.row_number().over(w_global))
