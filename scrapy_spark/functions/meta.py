"""Request ``meta`` semantics over the ``meta_json`` escape-hatch column
(SURVEY §2.7 C11; ref: scrapy/http/request/__init__.py::Request.replace
≈L120 — ``replace()`` carries the meta dict onto the child request — and
scrapy/downloadermiddlewares/redirect.py ≈L50, which appends
``redirect_urls`` / ``redirect_reasons`` and bumps ``redirect_times`` on
every hop).

The engine's open-schema side channel is a flat JSON object of string
values (``meta_json``); list-valued keys (``redirect_urls``) store a JSON
array *as the string value*. Everything here is JVM-side Column algebra —
``from_json``/``map_concat``/``to_json`` — no Python UDF in the path, so
meta propagation rides whole-stage codegen like every other frontier
column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the open remainder of Request.meta: flat string→string JSON object
META_TYPE = "map<string,string>"


def meta_map(meta_json: Column) -> Column:
    """``meta_json`` string → map<string,string> (null/absent → empty)."""
    return F.from_json(F.coalesce(meta_json, F.lit("{}")), META_TYPE)


def merge_meta(parent_json: Column, updates: Column) -> Column:
    """``Request.replace(meta={**parent, **updates})`` — updates win on
    key collision, parent keys otherwise survive. ``updates`` is a
    map<string,string> Column; returns the merged JSON string (null when
    both sides are empty, keeping untouched rows byte-identical)."""
    p = meta_map(parent_json)
    kept = F.map_filter(
        p, lambda k, _v: ~F.array_contains(F.map_keys(updates), k)
    )
    merged = F.map_concat(kept, updates)
    return F.when(F.size(merged) > 0, F.to_json(merged))


def meta_get(meta_json: Column, key: str) -> Column:
    """Scalar read: ``meta.get(key)`` (null when absent)."""
    return F.element_at(meta_map(meta_json), key)


def meta_get_list(meta_json: Column, key: str) -> Column:
    """List-valued read: the value is itself a JSON array of strings
    (``redirect_urls`` convention). Absent → empty array."""
    return F.coalesce(
        F.from_json(meta_get(meta_json, key), "array<string>"),
        F.array().cast("array<string>"),
    )


def redirect_child_meta(
    parent_meta_json: Column, request_url: Column, status: Column
) -> Column:
    """Meta for a redirect child request (ref: redirect.py ≈L50):
    ``redirect_urls`` += the URL that just redirected, ``redirect_reasons``
    += its status code, ``redirect_times`` = hop count — everything else
    carries over from the parent request unchanged."""
    urls = F.array_append(
        meta_get_list(parent_meta_json, "redirect_urls"), request_url
    )
    reasons = F.array_append(
        meta_get_list(parent_meta_json, "redirect_reasons"),
        status.cast("string"),
    )
    updates = F.create_map(
        F.lit("redirect_urls"),
        F.to_json(urls),
        F.lit("redirect_reasons"),
        F.to_json(reasons),
        F.lit("redirect_times"),
        F.size(urls).cast("string"),
    )
    return merge_meta(parent_meta_json, updates)


__all__ = [
    "META_TYPE",
    "meta_map",
    "merge_meta",
    "meta_get",
    "meta_get_list",
    "redirect_child_meta",
]
