"""Core table schemas (SURVEY §1.3 — fixed, explicit; dynamic dicts become
``meta_json`` escape hatches, never inferred schemas).

All hot-path columns are Spark primitive/binary types; no nested structs
(Arrow transfer of nested types is slower — SNIPPETS.md [2] caveat).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The authoritative input shape, verbatim from BASELINE.json:input_hint.
CORPUS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# One row = one Request (ref: scrapy/http/request/__init__.py::Request ≈L30).
FRONTIER = T.StructType(
    [
        T.StructField("fp", T.BinaryType(), False),  # 20-byte SHA1
        T.StructField("url", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("slot", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # enqueue order (tie-break)
        T.StructField("epoch_added", T.IntegerType(), False),
        T.StructField("parent_fp", T.BinaryType(), True),
        T.StructField("status", T.StringType(), False),  # QUEUED|DONE|FAILED
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("redirects", T.IntegerType(), False),  # hops so far (J7)
        T.StructField("dont_filter", T.BooleanType(), False),
        # Referer header value this request carries (U3, ref:
        # spidermiddlewares/referer.py — computed from the parent response
        # URL under CrawlConfig.referrer_policy; null = no header)
        T.StructField("referer", T.StringType(), True),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("fp", T.BinaryType(), False),
        T.StructField("epoch_added", T.IntegerType(), False),
    ]
)

DOMAIN_STATE = T.StructType(
    [
        T.StructField("slot", T.StringType(), False),
        T.StructField("next_free_at", T.LongType(), False),  # virtual ms
        T.StructField("delay_ms", T.LongType(), False),
        T.StructField("concurrency", T.IntegerType(), False),
        T.StructField("latency_ema", T.DoubleType(), True),
        T.StructField("robots_epoch", T.IntegerType(), True),  # null = unfetched
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("rules", T.StringType(), True),  # null = fetch error ⇒ allow
        T.StructField("fetched_epoch", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # OK|ERROR
    ]
)

FETCH_LOG = T.StructType(
    [
        T.StructField("fp", T.BinaryType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("slot", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("status", T.IntegerType(), False),  # HTTP-ish status
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("fetched_at", T.LongType(), False),  # virtual ms
        T.StructField("latency_ms", T.LongType(), False),
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),  # lineage
    ]
)

METRICS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),  # -1 = driver
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

ITEMS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("fp", T.BinaryType(), False),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)

TABLES = {
    "corpus": CORPUS,
    "frontier": FRONTIER,
    "url_seen": URL_SEEN,
    "domain_state": DOMAIN_STATE,
    "robots": ROBOTS,
    "fetch_log": FETCH_LOG,
    "metrics": METRICS,
    "items": ITEMS,
}
