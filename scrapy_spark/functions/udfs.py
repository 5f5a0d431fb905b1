"""Vectorized Spark bindings for the scalar layer (SURVEY §4.3.3).

Everything here is an Arrow-batched pandas UDF — no per-row Python UDFs
anywhere in the engine (input_hint mandate). hashlib/sha1 releases the GIL
and the URL functions are allocation-light, so a plain list-comprehension
over the batch is the right shape (~1M fingerprints/s/core).

On a cluster these ship via ``spark-submit --py-files scrapy_spark.zip``;
in local mode the package is importable from the shared filesystem.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .fingerprint import fingerprint, fingerprint_legacy
from .robots import RobotsRules
from .urlnorm import canonicalize_url, parse_domain


@pandas_udf(T.StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return pd.Series([canonicalize_url(u) if u else "" for u in urls])


@pandas_udf(T.StringType())
def domain_udf(urls: pd.Series) -> pd.Series:
    return pd.Series([parse_domain(u) if u else "" for u in urls])


@pandas_udf(T.BinaryType())
def fingerprint_udf(urls: pd.Series, methods: pd.Series) -> pd.Series:
    """Modern ('2.7') fingerprint over (url, method); body-less requests —
    the crawl frontier carries GET requests, matching the reference's
    frontier usage (bodies only matter for API parity, covered in tests)."""
    return pd.Series(
        [fingerprint(u, m or "GET") for u, m in zip(urls, methods)]
    )


@pandas_udf(T.BinaryType())
def fingerprint_legacy_udf(urls: pd.Series, methods: pd.Series) -> pd.Series:
    return pd.Series(
        [fingerprint_legacy(u, m or "GET") for u, m in zip(urls, methods)]
    )


def with_request_identity(df, url_col: str = "url", method: str = "GET", impl: str = "2.7"):
    """Enrich a raw-URL DataFrame with (url_canon, domain, slot, fp).

    One UDF pass per column; ``slot`` defaults to the domain (ref:
    get_slot_key ≈L105 — meta['download_slot'] override honored when a
    ``meta_slot`` column exists).
    """
    fp_udf = fingerprint_udf if impl == "2.7" else fingerprint_legacy_udf
    out = (
        df.withColumn("url_canon", canonicalize_url_udf(F.col(url_col)))
        .withColumn("domain", domain_udf(F.col(url_col)))
        .withColumn("fp", fp_udf(F.col(url_col), F.lit(method)))
    )
    if "meta_slot" in df.columns:
        out = out.withColumn("slot", F.coalesce(F.col("meta_slot"), F.col("domain")))
    else:
        out = out.withColumn("slot", F.col("domain"))
    return out


@pandas_udf(T.BooleanType())
def robots_allowed_udf(rules: pd.Series, urls: pd.Series, agents: pd.Series) -> pd.Series:
    """Vectorized robots gate with per-batch parser memoization: one
    RobotsRules parse per distinct rules text in the batch (domains repeat
    heavily within a batch — the reference memoizes per-netloc parsers the
    same way, robotstxt.py::_parsers ≈L55)."""
    cache: dict[str, RobotsRules] = {}
    out = []
    for text, url, agent in zip(rules, urls, agents):
        if not text:
            out.append(True)  # no/failed robots ⇒ allow-all
            continue
        parser = cache.get(text)
        if parser is None:
            parser = cache[text] = RobotsRules(text)
        out.append(parser.allowed(url, agent or "*"))
    return pd.Series(out)
