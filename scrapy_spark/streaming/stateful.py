"""Custom stateful streaming operator: AutoThrottle as
``applyInPandasWithState`` (SURVEY §2.4 A6 / §2.9; ref:
scrapy/extensions/throttle.py::AutoThrottle._adjust_delay ≈L55).

The batch engine updates per-slot delay state with a groupBy+join each
epoch (operators/politeness.py::autothrottle). This module is the SAME
state machine expressed as a Structured Streaming stateful operator over
the fetch_log stream: state = (delay_ms, latency_ema) per slot, input =
fetch events, output = one row per (slot, epoch) with the post-epoch
state — demonstrating the engine's custom-stateful-operator surface on
Spark's native streaming state store (checkpointable, rescalable by the
slot grouping key).

Determinism: micro-batch boundaries are arbitrary, so the handler folds
events strictly in (epoch, fp) order and keeps ``last_epoch`` in state —
the emitted trajectory is identical no matter how the stream is chopped
(asserted against a driver-side fold in tests).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("delay_ms", T.DoubleType()),
        T.StructField("latency_ema", T.DoubleType()),
        T.StructField("last_epoch", T.IntegerType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("slot", T.StringType()),
        T.StructField("epoch", T.IntegerType()),
        T.StructField("delay_ms", T.DoubleType()),
        T.StructField("latency_ema", T.DoubleType()),
        T.StructField("n_events", T.IntegerType()),
    ]
)


def adjust_delay(
    delay: float, avg_latency: float, ok: bool, *, target: float, floor: float, cap: float
) -> float:
    """The reference formula: ``delay ← (delay + latency/target)/2``,
    clamped to [floor, cap]; only non-error epochs may shrink."""
    proposed = (delay + avg_latency / target) / 2.0
    proposed = max(floor, min(cap, proposed))
    if proposed < delay and not ok:
        return delay
    return proposed


def make_throttle_fn(
    initial_delay_ms: float,
    target_concurrency: float = 1.0,
    floor_ms: float = 0.0,
    cap_ms: float = 60_000.0,
):
    """Build the per-group handler (closure carries the config — state
    schema stays pure data)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (slot,) = key
        if state.exists:
            delay, ema, last_epoch = state.get
        else:
            delay, ema, last_epoch = float(initial_delay_ms), None, -1

        batch = pd.concat(list(pdfs), ignore_index=True)
        out = []
        # fold epoch-by-epoch in order — batch-boundary-invariant
        for epoch, g in batch.sort_values(["epoch", "fp"]).groupby("epoch", sort=True):
            avg = float(g["latency_ms"].mean())
            ok = bool((g["status"] == 200).any())
            delay = adjust_delay(
                delay, avg, ok,
                target=target_concurrency, floor=floor_ms, cap=cap_ms,
            )
            ema = avg if ema is None else (ema + avg) / 2.0
            last_epoch = int(epoch)
            out.append((slot, last_epoch, delay, ema, len(g)))
        state.update((delay, ema, last_epoch))
        yield pd.DataFrame(
            out, columns=["slot", "epoch", "delay_ms", "latency_ema", "n_events"]
        )

    return fn


def streaming_autothrottle(
    fetch_stream: DataFrame,
    initial_delay_ms: float,
    target_concurrency: float = 1.0,
    floor_ms: float = 0.0,
    cap_ms: float = 60_000.0,
) -> DataFrame:
    """fetch_log stream → per-(slot, epoch) delay/EMA trajectory, state
    maintained by Spark's streaming state store keyed on slot."""
    fn = make_throttle_fn(initial_delay_ms, target_concurrency, floor_ms, cap_ms)
    return (
        fetch_stream.select("slot", "epoch", "fp", "latency_ms", "status")
        .groupBy("slot")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
