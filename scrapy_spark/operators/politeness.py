"""Per-slot politeness state updates (SURVEY §2.5 W5, §2.4 A6; ref:
scrapy/core/downloader/__init__.py::Slot ≈L20, _process_queue ≈L150;
scrapy/extensions/throttle.py::AutoThrottle._adjust_delay ≈L55).

domain_state is the engine's streaming state: one row per slot.
``next_free_at`` is the politeness watermark (SEMANTICS 6):
after k pops in epoch e, the slot reopens at ``ts(e) + k × delay_ms``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig


def update_next_free(
    domain_state: DataFrame, pops_per_slot: DataFrame, epoch_ts: int
) -> DataFrame:
    """pops_per_slot: (slot, k). Slots not popped keep their watermark."""
    joined = domain_state.join(F.broadcast(pops_per_slot), "slot", "left")
    return joined.withColumn(
        "next_free_at",
        F.when(
            F.col("k").isNotNull(),
            (F.lit(epoch_ts) + F.col("k") * F.col("delay_ms")).cast("long"),
        ).otherwise(F.col("next_free_at")),
    ).drop("k")


def mark_robots_fetched(
    domain_state: DataFrame, new_domains: DataFrame, epoch: int
) -> DataFrame:
    """SEMANTICS 2: domains first seen eligible this epoch get
    robots_epoch = e (their rows become poppable from e+1)."""
    flagged = new_domains.select("slot").withColumn("__new", F.lit(True))
    joined = domain_state.join(F.broadcast(flagged), "slot", "left")
    return joined.withColumn(
        "robots_epoch",
        F.when(
            F.col("robots_epoch").isNull() & F.col("__new").isNotNull(), F.lit(epoch)
        ).otherwise(F.col("robots_epoch")),
    ).drop("__new")


def autothrottle(
    domain_state: DataFrame,
    latencies: DataFrame,
    cfg: CrawlConfig,
    target_concurrency: float = 1.0,
    max_delay_ms: int = 60_000,
) -> DataFrame:
    """Optional A6 (reference default OFF — parity runs keep it off):
    ``delay ← (delay + latency/target)/2`` clamped to
    [DOWNLOAD_DELAY, AUTOTHROTTLE_MAX_DELAY]; only non-error responses
    shrink the delay. ``latencies``: (slot, avg_latency_ms) over non-error
    responses this epoch."""
    joined = domain_state.join(F.broadcast(latencies), "slot", "left")
    proposed = (F.col("delay_ms") + F.col("avg_latency_ms") / target_concurrency) / 2
    new_delay = F.greatest(
        F.lit(cfg.download_delay_ms).cast("double"),
        F.least(F.lit(float(max_delay_ms)), proposed),
    )
    shrink_ok = F.col("avg_latency_ms").isNotNull() & (
        (new_delay >= F.col("delay_ms")) | (F.col("ok_count") > 0)
    )
    return (
        joined.withColumn(
            "delay_ms",
            F.when(shrink_ok, new_delay.cast("long")).otherwise(F.col("delay_ms")),
        )
        .withColumn(
            "latency_ema",
            F.when(
                F.col("avg_latency_ms").isNotNull(),
                F.coalesce(
                    (F.col("latency_ema") + F.col("avg_latency_ms")) / 2,
                    F.col("avg_latency_ms"),
                ),
            ).otherwise(F.col("latency_ema")),
        )
        .drop("avg_latency_ms", "ok_count")
    )
