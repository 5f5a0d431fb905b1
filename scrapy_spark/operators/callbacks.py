"""Spider callbacks as registered vectorized handlers (SURVEY §2.9 U1/U5;
ref: scrapy/spiders/__init__.py::Spider.parse ≈L80, invoked via
scrapy/core/scraper.py::call_spider ≈L150).

In the reference, a callback is Python code attached to each Request;
code is not data in Spark, so a frontier row carries a ``callback:string``
column naming a handler registered here (the same move the reference
itself makes for disk-queued requests — request_to_dict serializes the
callback BY NAME, utils/request.py ≈L180).

A handler is a pandas function ``responses_batch -> parse output`` with
the fixed 1→N output schema (requests ∪ items as rows, discriminated by
``kind``) — the UDTF shape of Spider.parse. Dispatch runs one
``mapInPandas`` pass: the handler is resolved per batch from the
``callback`` column, so mixed-callback response sets need no per-name
filtering or union of N subplans.

``DUPEFILTER_CLASS``/``SCHEDULER``-style strategy selection (U5) is the
same registry pattern at the Python level: CrawlConfig fields select
implementations by name.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Fixed 1→N parse-output schema: one row per yielded Request or Item.
PARSE_OUTPUT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'request' | 'item'
        T.StructField("parent_seq", T.LongType(), True),
        T.StructField("parent_fp", T.BinaryType(), True),
        T.StructField("url", T.StringType(), True),  # requests only
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("item_json", T.StringType(), True),  # items only
    ]
)

Handler = Callable[[pd.DataFrame], pd.DataFrame]
_REGISTRY: dict[str, Handler] = {}


def callback(name: str) -> Callable[[Handler], Handler]:
    """Register a parse handler under ``name`` (ref: callback-by-name
    serialization, utils/request.py::request_to_dict ≈L180)."""

    def deco(fn: Handler) -> Handler:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_handler(name: str) -> Handler:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"no callback registered under {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def run_callbacks(
    responses: DataFrame, default: str = "extract_links"
) -> DataFrame:
    """responses (must carry seq, fp, and an optional ``callback`` column)
    → PARSE_OUTPUT rows. One Arrow pass; per-batch group-by callback name.
    """
    has_cb = "callback" in responses.columns
    # snapshot the registry INTO the closure: executors re-import this
    # module with an empty _REGISTRY, so driver-side registrations (user
    # callbacks) must travel by value with the serialized function
    registry = dict(_REGISTRY)

    def resolve(name: str) -> Handler:
        try:
            return registry[name]
        except KeyError:
            raise KeyError(
                f"no callback registered under {name!r}; known: {sorted(registry)}"
            ) from None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            names = (
                pdf["callback"].fillna(default)
                if has_cb
                else pd.Series([default] * len(pdf), index=pdf.index)
            )
            for name, group in pdf.groupby(names, sort=False):
                out = resolve(name)(group)
                if len(out):
                    yield out

    return responses.mapInPandas(run, schema=PARSE_OUTPUT)


# --- built-in handlers ------------------------------------------------------


@callback("extract_links")
def _extract_links(batch: pd.DataFrame) -> pd.DataFrame:
    """The default Spider.parse analogue: pull <a>/<area> hrefs from an
    ``html`` column and yield follow-up requests (C13 extractor)."""
    from ..functions.linkextract import extract_links_from_html

    rows = []
    for _, r in batch.iterrows():
        for u in extract_links_from_html(r.get("html") or "", r["url_canon"]):
            rows.append(("request", r["seq"], r["fp"], u, 0, None))
    return pd.DataFrame(rows, columns=[f.name for f in PARSE_OUTPUT.fields])


@callback("emit_item")
def _emit_item(batch: pd.DataFrame) -> pd.DataFrame:
    """Item-page callback: each response yields one item (json of the
    payload metadata columns present in the batch)."""
    import json

    meta_cols = [
        c for c in ("image_id", "status", "caption", "w", "h") if c in batch.columns
    ]
    rows = [
        (
            "item",
            r["seq"],
            r["fp"],
            None,
            None,
            json.dumps({c: r[c] for c in meta_cols}, default=str),
        )
        for _, r in batch.iterrows()
    ]
    return pd.DataFrame(rows, columns=[f.name for f in PARSE_OUTPUT.fields])
