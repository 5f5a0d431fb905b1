"""The parse stage: response → out-links ∪ items (SURVEY §2.9 U1; ref:
spider callbacks via scrapy/core/scraper.py::call_spider ≈L150, link
extraction linkextractors/lxmlhtml.py ≈L40).

At test scale the link graph is a fixture table, so "parsing" a page is a
broadcast join ``done ⋈ graph ON url_canon = src_canon`` — the 1→N UDTF
shape as a relational join (real HTML extraction would be a pandas UDF
``html → array<string>`` + ``explode``; same downstream dataflow).

Child-request columns follow SEMANTICS 8a: depth = parent+1, priority =
−depth × DEPTH_PRIORITY (ref: spidermiddlewares/depth.py ≈L35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig


def extract_links(done: DataFrame, graph: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """done: popped rows with status 200 (carries url_canon, depth, seq, fp).
    → raw link candidates (url, depth, priority, parent_seq, parent_fp)."""
    parents = done.select(
        F.col("url_canon").alias("src_canon"),
        F.col("url").alias("parent_url"),
        F.col("depth").alias("parent_depth"),
        F.col("seq").alias("parent_seq"),
        F.col("fp").alias("parent_fp"),
    )
    links = F.broadcast(parents).join(graph, "src_canon", "inner")
    depth = F.col("parent_depth") + 1
    return links.select(
        F.col("dst_url").alias("url"),
        depth.cast("int").alias("depth"),
        (-depth * F.lit(cfg.depth_priority)).cast("int").alias("priority"),
        F.col("parent_seq"),
        F.col("parent_fp"),
        F.col("parent_url"),
    )
