"""RFC2616 cache policy — freshness math (pure python, no Spark).

Ref: extensions/httpcache.py::RFC2616Policy ≈L120 — freshness lifetime
precedence is Cache-Control: max-age, then Expires, then the
Last-Modified heuristic (10% of age, capped at one day); no-store is
never cached, no-cache stores but always revalidates. Our fetch worker
precomputes (etag, last_modified, fetched_wall, fresh_until) per
response (operators/netfetch.py::cache_freshness) so the replay split
is pure JVM column math over two longs."""

from __future__ import annotations

import email.utils

from scrapy_spark.operators.netfetch import cache_freshness

NOW = 1_700_000_000.0


def _fmt(ts: float) -> str:
    return email.utils.formatdate(ts, usegmt=True)


def test_max_age_sets_lifetime():
    _, _, wall, until, explicit = cache_freshness(
        {"cache-control": "max-age=3600"}, NOW
    )
    assert (wall, until, explicit) == (int(NOW), int(NOW) + 3600, True)


def test_no_store_marks_never_cache():
    etag, _, _, until, explicit = cache_freshness(
        {"cache-control": "no-store", "etag": '"v1"'}, NOW
    )
    assert until == -1 and etag == '"v1"' and explicit


def test_no_cache_forces_revalidation():
    # stored, but stale immediately — every replay must revalidate
    _, _, _, until, explicit = cache_freshness(
        {"cache-control": "no-cache, max-age=3600"}, NOW
    )
    assert until == int(NOW) and explicit


def test_max_age_beats_expires():
    hdrs = {
        "cache-control": "max-age=60",
        "date": _fmt(NOW),
        "expires": _fmt(NOW + 9999),
    }
    assert cache_freshness(hdrs, NOW)[3] == int(NOW) + 60


def test_expires_relative_to_date_header():
    hdrs = {"date": _fmt(NOW), "expires": _fmt(NOW + 120)}
    assert cache_freshness(hdrs, NOW)[3] == int(NOW) + 120


def test_stale_expires_clamped_to_zero():
    hdrs = {"date": _fmt(NOW), "expires": _fmt(NOW - 120)}
    assert cache_freshness(hdrs, NOW)[3] == int(NOW)


def test_last_modified_heuristic_ten_percent():
    lm = NOW - 10_000  # age 10000s → lifetime 1000s
    hdrs = {"date": _fmt(NOW), "last-modified": _fmt(lm)}
    etag, last_mod, _, until, explicit = cache_freshness(hdrs, NOW)
    assert until == int(NOW) + 1000
    assert last_mod == _fmt(lm) and etag is None
    assert not explicit  # heuristic freshness is implicit (RFC 9111 4.2.2)


def test_last_modified_heuristic_capped_at_a_day():
    lm = NOW - 100 * 86_400  # 10% would be 10 days
    hdrs = {"date": _fmt(NOW), "last-modified": _fmt(lm)}
    assert cache_freshness(hdrs, NOW)[3] == int(NOW) + 86_400


def test_no_information_means_immediately_stale():
    etag, last_mod, wall, until, explicit = cache_freshness({}, NOW)
    assert (etag, last_mod) == (None, None)
    assert until == wall == int(NOW) and not explicit


def test_validators_pass_through():
    hdrs = {"etag": 'W/"abc"', "last-modified": _fmt(NOW - 50)}
    etag, last_mod, _, _, _ = cache_freshness(hdrs, NOW)
    assert etag == 'W/"abc"' and last_mod == _fmt(NOW - 50)
