"""Cookies middleware (ref: downloadermiddlewares/cookies.py ≈L30,
upstream tests/test_downloadermiddleware_cookies.py) — the round-2
verdict's inventory gap.

The reference keeps per-spider ``http.cookiejar`` state and folds it
into each request's Cookie header; responses' Set-Cookie headers update
the jar. Spark-first re-expression: the jar is a STATE TABLE of parsed
cookie rows appended per epoch (O(batch) commit, like every other state
table) and resolved latest-wins on read; the header fold is a
join + group aggregate, no Python in the per-request path beyond one
Arrow-batched parse UDF over the (small) set of responses that actually
set cookies.

Scoping model: one jar per politeness SLOT (the domain, or the resolved
IP under ``slot_key_mode="ip"``), matching the engine's state-keying
everywhere else. RFC 6265 path-match and Secure are honored; the
``Domain=`` attribute is intentionally NOT honored across slots (a slot
is this engine's isolation unit — noted divergence from cookiejar's
domain-suffix rules, which would let one slot set cookies for another).

Deletion: ``Max-Age<=0`` or an already-past ``Expires`` appends a
tombstone row (``deleted=true``) that latest-wins resolution applies —
the same merge-on-read idiom as the frontier's delete keys.
"""

from __future__ import annotations

import email.utils
import time
from http.cookies import SimpleCookie
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COOKIE_LOG = T.StructType(
    [
        T.StructField("slot", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("secure", T.BooleanType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("epoch", T.LongType()),
        T.StructField("src_url", T.StringType()),
    ]
)


def _default_path(url: str) -> str:
    """RFC 6265 §5.1.4 default-path from the request URI."""
    from urllib.parse import urlparse

    p = urlparse(url).path
    if not p.startswith("/") or p.count("/") == 1:
        return "/"
    return p[: p.rfind("/")]


def parse_set_cookies(fetched: DataFrame, epoch: int) -> DataFrame:
    """Responses carrying Set-Cookie headers → COOKIE_LOG rows.

    One mapInPandas over the pre-filtered responses (the filter keeps the
    Arrow transfer to the rows that actually set cookies — typically a
    tiny fraction of the batch). Parsing is stdlib ``SimpleCookie``; a
    Max-Age<=0 or past Expires becomes a tombstone row."""
    src = fetched.filter(
        F.col("set_cookie").isNotNull() & (F.size("set_cookie") > 0)
    ).select("slot", "url", "set_cookie")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        now = time.time()
        for pdf in batches:
            rows = []
            for slot, url, lines in zip(pdf.slot, pdf.url, pdf.set_cookie):
                for line in lines:
                    c = SimpleCookie()
                    try:
                        c.load(line)
                    except Exception:  # noqa: BLE001 — malformed: drop, as
                        continue  # cookiejar does with unparsable lines
                    for name, morsel in c.items():
                        deleted = False
                        max_age = morsel["max-age"]
                        if max_age != "":
                            try:
                                deleted = int(max_age) <= 0
                            except ValueError:
                                pass
                        elif morsel["expires"]:
                            try:
                                exp = email.utils.parsedate_to_datetime(
                                    morsel["expires"]
                                )
                                deleted = exp.timestamp() <= now
                            except (TypeError, ValueError):
                                pass
                        rows.append(
                            (
                                slot,
                                name,
                                morsel["path"] or _default_path(url),
                                morsel.value,
                                bool(morsel["secure"]),
                                deleted,
                                epoch,
                                url,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in COOKIE_LOG.fields]
            )

    return src.mapInPandas(_parse, schema=COOKIE_LOG)


def resolve_jar(log: DataFrame) -> DataFrame:
    """Latest-wins per (slot, name, path); tombstones drop the cookie.
    The order key (epoch, src_url) is deterministic — two responses in
    one epoch resolve by URL order, not partition scheduling."""
    latest = log.groupBy("slot", "name", "path").agg(
        F.max_by(
            F.struct("value", "secure", "deleted"),
            F.struct("epoch", "src_url"),
        ).alias("c")
    )
    return latest.select(
        "slot",
        "name",
        "path",
        F.col("c.value").alias("value"),
        F.col("c.secure").alias("secure"),
    ).filter(~F.col("c.deleted"))


def with_cookie_header(
    requests: DataFrame, log: DataFrame | None, key_col: str = "seq"
) -> DataFrame:
    """Fold the slot's live cookies into a ``cookie_header`` column.

    RFC 6265 §5.4: only path-matching (and, for http URLs, non-Secure)
    cookies are sent, longer paths first, name as the deterministic
    tie-break, joined with '; '. The jar is tiny relative to the batch
    (cookies ≈ slots × a handful), so it broadcasts; the request side
    never shuffles."""
    if log is None:
        return requests.withColumn("cookie_header", F.lit(None).cast("string"))
    jar = resolve_jar(log)
    raw_path = F.parse_url(F.col("url"), F.lit("PATH"))
    req_path = F.when(
        raw_path.isNull() | (F.length(raw_path) == 0), F.lit("/")
    ).otherwise(raw_path)
    c_path, p = F.col("path"), F.col("__req_path")
    path_ok = (
        (c_path == p)
        | (
            p.startswith(c_path)
            & (
                c_path.endswith("/")
                | (F.substring(p, F.length(c_path) + 1, 1) == "/")
            )
        )
    )
    secure_ok = ~F.col("secure") | F.col("url").startswith("https://")
    matched = (
        requests.select(F.col(key_col), "slot", "url")
        .withColumn("__req_path", req_path)
        .join(F.broadcast(jar), "slot")
        .filter(path_ok & secure_ok)
    )
    headers = matched.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.length("path")).alias("nlen"),
                            F.col("name").alias("name"),
                            F.concat_ws("=", "name", "value").alias("kv"),
                        )
                    )
                ),
                lambda s: s.kv,
            ),
            "; ",
        ).alias("cookie_header")
    )
    return requests.join(F.broadcast(headers), key_col, "left")


__all__ = [
    "COOKIE_LOG",
    "parse_set_cookies",
    "resolve_jar",
    "with_cookie_header",
]
