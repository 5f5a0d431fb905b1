"""U3 referrer policies (W3C table, mirrors upstream
tests/test_spidermiddleware_referer.py vectors) and C4/J4 per-IP slots."""

import pytest
from pyspark.sql import functions as F

from scrapy_spark.functions.referer import POLICIES, referrer_value, with_referer
from scrapy_spark.operators.ipslots import with_ip_slot

HTTPS_P = "https://user:pw@example.com/parent?q=1#frag"
HTTP_P = "http://example.com/parent?q=1#frag"
HTTPS_T = "https://example.com/child"
HTTP_T = "http://example.com/child"
CROSS_T = "https://other.example/child"

STRIPPED_HTTPS = "https://example.com/parent?q=1"
STRIPPED_HTTP = "http://example.com/parent?q=1"
ORIGIN_HTTPS = "https://example.com/"


# (policy, referrer, target, expected) — the W3C policy truth table as
# upstream's test_spidermiddleware_referer.py exercises it
CASES = [
    ("no-referrer", HTTPS_P, HTTPS_T, None),
    ("unsafe-url", HTTPS_P, HTTP_T, STRIPPED_HTTPS),  # even on downgrade
    # no-referrer-when-downgrade: full unless https→http
    ("no-referrer-when-downgrade", HTTPS_P, HTTPS_T, STRIPPED_HTTPS),
    ("no-referrer-when-downgrade", HTTPS_P, HTTP_T, None),
    ("no-referrer-when-downgrade", HTTP_P, HTTPS_T, STRIPPED_HTTP),
    # same-origin
    ("same-origin", HTTPS_P, HTTPS_T, STRIPPED_HTTPS),
    ("same-origin", HTTPS_P, CROSS_T, None),
    ("same-origin", HTTPS_P, HTTP_T, None),  # scheme differs ⇒ cross-origin
    # origin / strict-origin
    ("origin", HTTPS_P, HTTP_T, ORIGIN_HTTPS),
    ("strict-origin", HTTPS_P, HTTPS_T, ORIGIN_HTTPS),
    ("strict-origin", HTTPS_P, HTTP_T, None),
    ("strict-origin", HTTP_P, HTTP_T, "http://example.com/"),
    # origin-when-cross-origin
    ("origin-when-cross-origin", HTTPS_P, HTTPS_T, STRIPPED_HTTPS),
    ("origin-when-cross-origin", HTTPS_P, CROSS_T, ORIGIN_HTTPS),
    # strict-origin-when-cross-origin
    ("strict-origin-when-cross-origin", HTTPS_P, HTTPS_T, STRIPPED_HTTPS),
    ("strict-origin-when-cross-origin", HTTPS_P, CROSS_T, ORIGIN_HTTPS),
    ("strict-origin-when-cross-origin", HTTPS_P, HTTP_T, None),
    # scrapy-default: no-referrer-when-downgrade + non-HTTP parents silent
    ("scrapy-default", HTTPS_P, HTTPS_T, STRIPPED_HTTPS),
    ("scrapy-default", HTTPS_P, HTTP_T, None),
    ("scrapy-default", "file:///tmp/x.html", HTTP_T, None),
    ("scrapy-default", "s3://bucket/k", HTTP_T, None),
]


@pytest.mark.parametrize("policy,ref,target,expected", CASES)
def test_referrer_value_table(policy, ref, target, expected):
    assert referrer_value(policy, ref, target) == expected


def test_referrer_edge_cases():
    assert referrer_value("scrapy-default", None, HTTP_T) is None
    with pytest.raises(ValueError):
        referrer_value("bogus-policy", HTTP_P, HTTP_T)
    assert set(CASES[0][0] for _ in [1]) <= set(POLICIES)


def test_with_referer_column(spark):
    df = spark.createDataFrame(
        [(HTTPS_P, HTTPS_T), (HTTPS_P, HTTP_T), (None, HTTP_T)],
        "parent_url string, url string",
    )
    out = {
        (r.parent_url, r.url): r.referer
        for r in with_referer(df, "scrapy-default").collect()
    }
    assert out[(HTTPS_P, HTTPS_T)] == STRIPPED_HTTPS
    assert out[(HTTPS_P, HTTP_T)] is None
    assert out[(None, HTTP_T)] is None


def test_with_ip_slot_injected_resolver(spark):
    table = {"a.example": "10.0.0.1", "b.example": "10.0.0.1", "c.example": "10.0.0.2"}
    df = spark.createDataFrame(
        [("a.example",), ("b.example",), ("c.example",), ("unresolvable.x",)],
        "domain string",
    )
    out = {r.domain: r.slot for r in with_ip_slot(df, resolver=table.get).collect()}
    # two vhosts on one server share a politeness slot (the point of
    # CONCURRENT_REQUESTS_PER_IP); failures fall back to the domain key
    assert out["a.example"] == out["b.example"] == "10.0.0.1"
    assert out["c.example"] == "10.0.0.2"
    assert out["unresolvable.x"] == "unresolvable.x"


def test_with_ip_slot_real_loopback(spark):
    df = spark.createDataFrame([("localhost",)], "domain string")
    slot = with_ip_slot(df).collect()[0].slot
    assert slot in ("127.0.0.1", "::1")


def test_apply_slot_mode_rederives_meta_slot_from_meta_json(spark):
    """Regression (r5 review): the candidates union selects only
    cand_cols, dropping the meta_slot column before _apply_slot_mode —
    so a redirect child carrying meta['download_slot'] was re-slotted
    to the resolved IP. The engine must re-derive meta_slot from
    meta_json so the explicit override wins (upstream get_slot_key
    checks meta FIRST, before the IP branch)."""
    from pyspark.sql import functions as F

    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    empty = spark.createDataFrame([], "url_canon string, image_id string")
    eng = CrawlEngine(
        spark,
        CrawlConfig(slot_key_mode="ip"),
        MemoryStore(spark),
        url_map=empty,
        graph=spark.createDataFrame([], "src_canon string, dst_url string"),
        robots=spark.createDataFrame([], "domain string, rules string"),
        resolver={"a.example": "10.0.0.1", "b.example": "10.0.0.1"}.get,
    )
    df = spark.createDataFrame(
        [
            ("a.example", '{"download_slot": "pinned-slot"}'),
            ("b.example", None),
        ],
        "domain string, meta_json string",
    ).withColumn("slot", F.col("domain"))
    out = eng._apply_slot_mode(df)
    slots = {r.domain: r.slot for r in out.collect()}
    assert slots["a.example"] == "pinned-slot"  # meta wins over the IP
    assert slots["b.example"] == "10.0.0.1"  # no meta → resolved IP
    assert "meta_slot" not in out.columns  # helper column cleaned up
