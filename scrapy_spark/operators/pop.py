"""Window-ranked priority pop (SURVEY §2.5 W1/W2, §4.3.1; ref:
scrapy/pqueues.py::ScrapyPriorityQueue ≈L40 / DownloaderAwarePriorityQueue
≈L150).

The pop is the scheduling core: per-slot rank by (priority, seq), capacity
cut, then the downloader-aware global order — rank-major across slots, which
IS the reference's "pop from the slot with fewest active downloads" loop —
and the global budget top-k.

Skew note (north_rule): a window ``partitionBy("slot")`` hot-spots when one
domain holds 10^8 queued rows. ``local_pretrim`` bounds that: a per-Arrow-
batch top-(max cap) cut per slot, running partition-local with NO shuffle,
before the exact window. Because every partition holds a salted slice of
every hot domain, the pre-trim keeps a superset of any slot's true top-cap
(each batch keeps its own top-cap), so the exact window sees at most
``batches × cap`` rows per slot instead of 10^8. The final budget cut is
``orderBy().limit(B)`` — Spark executes it as TakeOrderedAndProject (a
top-k, never a full sort of the frontier).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig


def _seq_key(cfg: CrawlConfig):
    # LIFO memory queue (reference default) ⇒ newest first on ties
    return F.desc("seq") if cfg.queue_order == "lifo" else F.asc("seq")


def local_pretrim(eligible: DataFrame, max_cap: int) -> DataFrame:
    """Partition-local per-slot top-``max_cap`` pre-cut (no shuffle).

    Keeps, within each Arrow batch, the ``max_cap`` best rows per slot by
    (priority desc, seq asc) and (priority desc, seq desc) — both tie-break
    directions are retained so the same pre-trim is valid for FIFO and LIFO
    exact ranking downstream: the union of both heads is a superset of
    either head.
    """
    schema = eligible.schema

    def trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            g = pdf.sort_values(["priority", "seq"], ascending=[False, True]).groupby(
                "slot", sort=False
            )
            head = g.head(max_cap)
            tail = (
                pdf.sort_values(["priority", "seq"], ascending=[False, False])
                .groupby("slot", sort=False)
                .head(max_cap)
            )
            yield pd.concat([head, tail]).drop_duplicates(subset=["seq"])

    return eligible.mapInPandas(trim, schema=schema)


def rank_and_pop(
    eligible: DataFrame,
    cfg: CrawlConfig,
    budget: int,
    pretrim_cap: int | None = None,
) -> DataFrame:
    """``eligible`` must carry a ``concurrency`` column (per-slot capacity).

    ``pretrim_cap``: upper bound over all slots' concurrency — enables the
    shuffle-free local pre-cut; pass None to disable (exact window only).

    Returns popped rows with ``slot_rank`` (rank within slot) and ``rank``
    (global pop order within the epoch, 1-based).
    """
    seq_key = _seq_key(cfg)
    if pretrim_cap is not None:
        eligible = local_pretrim(eligible, pretrim_cap)

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
