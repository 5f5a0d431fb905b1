"""Referrer-Policy engine (SURVEY §2.9 U3; ref:
spidermiddlewares/referer.py ≈L250, which implements the W3C
Referrer-Policy spec the same way).

``referrer_value(policy, referrer_url, target_url)`` returns the Referer
header value a request to ``target_url`` yielded from ``referrer_url``
should carry (None = no header). Policies are the nine W3C names plus
``scrapy-default`` — upstream's DefaultReferrerPolicy: no-referrer-when-
downgrade, except nothing is sent when the parent used a non-HTTP(S)
scheme (file://, s3://, data:, …).

The column-level ``with_referer`` wrapper applies a policy over a link
batch (parent_url, url) as one Arrow-batched pass — the shape the engine
uses when candidates are built from parse output.
"""

from __future__ import annotations

from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .http import strip_url

POLICIES = (
    "scrapy-default",
    "no-referrer",
    "no-referrer-when-downgrade",
    "same-origin",
    "origin",
    "strict-origin",
    "origin-when-cross-origin",
    "strict-origin-when-cross-origin",
    "unsafe-url",
)

_HTTPS = ("https",)
_HTTP_SCHEMES = ("http", "https")


def _origin(url: str) -> str:
    return strip_url(url, origin_only=True)


def _stripped(url: str) -> str:
    """The 'stripped referrer': no credentials, no fragment (W3C §8.3)."""
    return strip_url(url, strip_credentials=True, strip_fragment=True)


def _same_origin(a, b) -> bool:
    # compare stripped-origin STRINGS (strip_url drops default ports), not
    # raw urlparse port tuples: upstream treats https://a.com:443 and
    # https://a.com as the same origin (w3lib strip_url semantics)
    return _origin(a) == _origin(b)


def _downgrade(referrer: str, target: str) -> bool:
    """TLS-protected referrer → non-TLS target (W3C 'downgrade')."""
    return urlparse(referrer).scheme in _HTTPS and urlparse(target).scheme not in _HTTPS


def referrer_value(policy: str, referrer_url: str | None, target_url: str) -> str | None:
    if not referrer_url:
        return None
    if policy not in POLICIES:
        raise ValueError(f"unknown referrer policy {policy!r}")
    scheme = urlparse(referrer_url).scheme
    if policy == "scrapy-default":
        # upstream DefaultReferrerPolicy: no-referrer-when-downgrade, but
        # only HTTP(S) parents ever send a referer
        if scheme not in _HTTP_SCHEMES:
            return None
        policy = "no-referrer-when-downgrade"
    if policy == "no-referrer":
        return None
    if policy == "no-referrer-when-downgrade":
        return None if _downgrade(referrer_url, target_url) else _stripped(referrer_url)
    if policy == "same-origin":
        return _stripped(referrer_url) if _same_origin(referrer_url, target_url) else None
    if policy == "origin":
        return _origin(referrer_url)
    if policy == "strict-origin":
        return None if _downgrade(referrer_url, target_url) else _origin(referrer_url)
    if policy == "origin-when-cross-origin":
        return (
            _stripped(referrer_url)
            if _same_origin(referrer_url, target_url)
            else _origin(referrer_url)
        )
    if policy == "strict-origin-when-cross-origin":
        if _same_origin(referrer_url, target_url):
            return _stripped(referrer_url)
        return None if _downgrade(referrer_url, target_url) else _origin(referrer_url)
    # unsafe-url
    return _stripped(referrer_url)


def with_referer(
    links: DataFrame,
    policy: str = "scrapy-default",
    parent_col: str = "parent_url",
    url_col: str = "url",
) -> DataFrame:
    """Append a ``referer`` column (nullable string) for each link row."""
    if policy not in POLICIES:
        raise ValueError(f"unknown referrer policy {policy!r}")

    @pandas_udf(T.StringType())
    def _ref(parents: pd.Series, targets: pd.Series) -> pd.Series:
        return pd.Series(
            [
                referrer_value(policy, p, t) if t else None
                for p, t in zip(parents, targets)
            ]
        )

    return links.withColumn("referer", _ref(F.col(parent_col), F.col(url_col)))


__all__ = ["POLICIES", "referrer_value", "with_referer"]
