"""Link-candidate filters (SURVEY §2.2 F4/F5/F6/F8).

All pure Column expressions — JVM-side, whole-stage-codegen'd, no Python.
The first-match ``drop_reason`` column reproduces the reference's per-
middleware stat counters in one pass (offsite.py ≈L30, depth.py ≈L20,
urllength.py ≈L15, linkextractors IGNORED_EXTENSIONS ≈L15).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig


def _offsite_expr(url: Column, allowed: tuple[str, ...]) -> Column:
    """True if the url host is NOT under any allowed domain — the compiled
    ``(^|.*\\.)domain$`` host regex of the reference, as a Column expr."""
    host = F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )
    ok = F.lit(False)
    for d in allowed:
        dl = d.lower()
        ok = ok | (host == dl) | host.endswith("." + dl)
    return ~ok


def _ext_expr(url: Column) -> Column:
    """Lowercased extension of the last path segment ('' if none) —
    mirrors the simulator's split('/')[-1].rsplit('.') logic."""
    path = F.regexp_extract(url, r"^[^?#]*", 0)
    return F.lower(F.regexp_extract(path, r"\.([^./?#]+)$", 1))


def _any_match(url: Column, patterns: tuple[str, ...]) -> Column:
    """any(re.search(p, url)) as a Column — ``rlike`` IS unanchored search,
    matching upstream's ``_matches`` (linkextractors/lxmlhtml.py ≈L40)."""
    hit = F.lit(False)
    for p in patterns:
        hit = hit | url.rlike(p)
    return hit


def with_drop_reason(links: DataFrame, cfg: CrawlConfig, url_col: str = "url") -> DataFrame:
    """Tag each candidate with its first-match drop reason (null = keep).

    Filter order is part of the SEMANTICS.md contract (step 8b):
    allow → deny → urllength → offsite → ext → depth. The allow/deny URL
    regexes reproduce LxmlLinkExtractor._link_allowed (F8): with allow
    patterns configured a URL must search-match one of them; any deny
    match drops; allow is evaluated first, as upstream does.
    """
    url = F.col(url_col)
    reason = F.when(F.lit(False), F.lit(""))  # seed the CASE chain
    if cfg.allow_url_patterns:
        reason = reason.when(
            ~_any_match(url, cfg.allow_url_patterns), F.lit("allow")
        )
    if cfg.deny_url_patterns:
        reason = reason.when(_any_match(url, cfg.deny_url_patterns), F.lit("deny"))
    reason = reason.when(F.length(url) > cfg.url_length_limit, F.lit("urllength"))
    if cfg.allowed_domains:
        reason = reason.when(_offsite_expr(url, cfg.allowed_domains), F.lit("offsite"))
    reason = reason.when(
        _ext_expr(url).isin(*[e.lower() for e in cfg.deny_extensions]), F.lit("ext")
    )
    if cfg.depth_limit:
        reason = reason.when(F.col("depth") > cfg.depth_limit, F.lit("depth"))
    return links.withColumn("drop_reason", reason)


def split_links(links: DataFrame, cfg: CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """→ (kept, drop_counts) where drop_counts = (drop_reason, n)."""
    tagged = with_drop_reason(links, cfg)
    kept = tagged.filter(F.col("drop_reason").isNull()).drop("drop_reason")
    drops = (
        tagged.filter(F.col("drop_reason").isNotNull())
        .groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return kept, drops
