"""robots.txt gate (SURVEY §2.2 F2, §2.3 J2; ref:
scrapy/downloadermiddlewares/robotstxt.py::RobotsTxtMiddleware ≈L30).

Two-phase per epoch (SEMANTICS 2-3):
(a) domains first seen eligible get their robots "fetched" this epoch —
    their requests wait one epoch (the reference's Deferred-wait on the
    in-flight robots request),
(b) requests in robots-known domains are gated: a BROADCAST join of the
    eligible rows against the (small) robots rules table, then the
    vectorized ``protego``-equivalent parser UDF. Fetch-error domains
    (rules NULL) allow everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.udfs import robots_allowed_udf


def apply_robots_gate(
    poppable: DataFrame, robots: DataFrame, cfg: CrawlConfig
) -> tuple[DataFrame, DataFrame]:
    """→ (allowed, denied). ``poppable`` rows already satisfy
    robots_epoch < current epoch; ``robots`` is (domain, rules)."""
    joined = poppable.join(
        F.broadcast(robots.select("domain", "rules")), "domain", "left"
    )
    gated = joined.withColumn(
        "__allowed",
        F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
            robots_allowed_udf(
                F.col("rules"), F.col("url"), F.lit(cfg.robots_user_agent)
            )
        ),
    )
    allowed = gated.filter(F.col("__allowed")).drop("__allowed", "rules")
    denied = gated.filter(~F.col("__allowed")).drop("__allowed", "rules")
    return allowed, denied
