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

from .fingerprint import (
    fingerprint,
    fingerprint_legacy,
    fingerprint_legacy_of_canonical,
    fingerprint_of_canonical,
)
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


_IDENTITY_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("fp", T.BinaryType()),
    ]
)


def _identity_batch(urls: pd.Series, impl: str) -> pd.DataFrame:
    """One URL parse per row: canonicalize once, fingerprint FROM the
    canonical string (``fingerprint_of_canonical`` — bit-exact with
    ``fingerprint(raw)`` by construction), domain from the raw url
    (matches ``parse_domain`` exactly)."""
    fp_fn = fingerprint_of_canonical if impl == "2.7" else fingerprint_legacy_of_canonical
    canon = [canonicalize_url(u) if u else "" for u in urls]
    return pd.DataFrame(
        {
            "url_canon": canon,
            "domain": [parse_domain(u) if u else "" for u in urls],
            "fp": [fp_fn(c) for c in canon],
        }
    )


@pandas_udf(_IDENTITY_SCHEMA)
def request_identity_udf(urls: pd.Series) -> pd.DataFrame:
    return _identity_batch(urls, "2.7")


@pandas_udf(_IDENTITY_SCHEMA)
def request_identity_legacy_udf(urls: pd.Series) -> pd.DataFrame:
    return _identity_batch(urls, "2.6")


def with_request_identity(df, url_col: str = "url", method: str = "GET", impl: str = "2.7"):
    """Enrich a raw-URL DataFrame with (url_canon, domain, slot, fp).

    ONE fused UDF pass (struct-returning pandas UDF → single
    ArrowEvalPython node): the URL is parsed/canonicalized once per row and
    the fingerprint is computed from the canonical string, instead of three
    UDF passes each re-parsing the raw URL. ``slot`` defaults to the domain
    (ref: get_slot_key ≈L105 — meta['download_slot'] override honored when
    a ``meta_slot`` column exists).

    ``method`` other than GET falls back to the per-column UDFs (the fused
    path pins GET, the only method the crawl frontier carries).
    """
    if method != "GET":
        fp_udf = fingerprint_udf if impl == "2.7" else fingerprint_legacy_udf
        out = (
            df.withColumn("url_canon", canonicalize_url_udf(F.col(url_col)))
            .withColumn("domain", domain_udf(F.col(url_col)))
            .withColumn("fp", fp_udf(F.col(url_col), F.lit(method)))
        )
    else:
        ident_udf = request_identity_udf if impl == "2.7" else request_identity_legacy_udf
        out = (
            df.withColumn("__ident", ident_udf(F.col(url_col)))
            .withColumn("url_canon", F.col("__ident.url_canon"))
            .withColumn("domain", F.col("__ident.domain"))
            .withColumn("fp", F.col("__ident.fp"))
            .drop("__ident")
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
