"""Per-IP download slots (SURVEY §2.7 C4 IP branch + §2.3 J4; ref:
core/downloader/__init__.py::get_slot_key ≈L105 and the cached resolver
in resolver.py).

Upstream: when CONCURRENT_REQUESTS_PER_IP > 0 the download-slot key is
the resolved IP, so vhosts sharing one server share one politeness slot.
That needs a DNS cache (DNSCACHE_ENABLED, J4) — here an executor-local
memo inside the Arrow batch UDF, so each (executor, domain) resolves
once per batch stream, the same amortization the reference's per-reactor
cache gives. Real resolution uses ``socket.getaddrinfo``; tests inject a
deterministic resolver (the sandbox has no external DNS — documented in
SURVEY §0).

At 10^10 rows the UDF is map-only; the per-partition memo keeps syscalls
at O(distinct domains per partition); failed lookups fall back to the
domain key (upstream keeps the request fetchable and lets the connect
fail later).
"""

from __future__ import annotations

import socket
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def default_resolver(host: str) -> str | None:
    try:
        return socket.getaddrinfo(host, None)[0][4][0]
    except (socket.gaierror, IndexError, OSError):
        return None


def with_ip_slot(
    df: DataFrame,
    domain_col: str = "domain",
    resolver: Callable[[str], str | None] | None = None,
) -> DataFrame:
    """Rewrite ``slot`` to the resolved IP of ``domain`` (fallback: the
    domain itself when resolution fails). ``resolver`` is injectable for
    deterministic tests; None = real getaddrinfo.

    Upstream get_slot_key returns ``meta['download_slot']`` FIRST, before
    the IP branch (core/downloader/__init__.py ≈L100) — so when the frame
    carries a ``meta_slot`` column the explicit override wins over the
    resolved IP here too."""
    res = resolver or default_resolver

    @pandas_udf(T.StringType())
    def _ip_slot(domains: pd.Series) -> pd.Series:
        cache: dict[str, str | None] = {}
        out = []
        for d in domains:
            if d not in cache:
                cache[d] = res(d)
            out.append(cache[d] or d)
        return pd.Series(out)

    ip_slot = _ip_slot(F.col(domain_col))
    if "meta_slot" in df.columns:
        ip_slot = F.coalesce(F.col("meta_slot"), ip_slot)
    return df.withColumn("slot", ip_slot)


__all__ = ["with_ip_slot", "default_resolver"]
