"""Cluster entrypoint for the crawl engine (north_rule: spark-submit
--py-files at N and 4N executors).

Runs the epoch loop against a persistent ParquetStore (an Iceberg-backed
store on a real cluster — the Store interface is the seam) with a
deterministic synthetic fixture by default; swap ``--seeds``/``--corpus``
for real seed/corpus tables.

    spark-submit --py-files dist/scrapy_spark.zip tools/submit_crawl.py \
        --store /shared/frontier-store --scale bench --epochs 50

The job is resumable: re-submitting with the same --store continues from
the last committed epoch manifest (SEMANTICS.md 'Resume').
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

# local runs resolve the in-repo package; on a cluster --py-files wins
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="store root (shared fs / s3a)")
    ap.add_argument("--scale", default="bench", help="fixture scale name")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--budget", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--backend",
        default="synthetic",
        choices=("synthetic", "http"),
        help="synthetic = deterministic fixture crawl; http = REAL network "
        "crawl (operators/netfetch.py) over --seeds-csv",
    )
    ap.add_argument(
        "--seeds-csv",
        default=None,
        help="http backend: CSV with url[,priority] columns (seed list)",
    )
    ap.add_argument(
        "--transport",
        default="h1",
        choices=("h1", "h2c"),
        help="http backend wire transport: h1 = HTTP/1.1 thread pool; "
        "h2c = one multiplexed HTTP/2 cleartext connection per authority",
    )
    ap.add_argument(
        "--allowed-domains",
        default="",
        help="http backend: comma-separated offsite allow-list "
        "(empty = no offsite filter)",
    )
    ap.add_argument(
        "--seen-filter",
        default="bloom",
        choices=("bloom", "cuckoo", "none"),
        help="url_seen prefilter structure; cuckoo supports per-key "
        "deletion (pairs with --seen-ttl-epochs)",
    )
    ap.add_argument(
        "--seen-ttl-epochs",
        type=int,
        default=0,
        help="recrawl policy: expire url_seen rows N epochs after "
        "insertion so URLs re-enter the frontier (0 = never)",
    )
    ap.add_argument(
        "--domain-page-budget",
        type=int,
        default=0,
        help="hot-host cap: drop a slot's remaining frontier rows once "
        "its cumulative pops reach this (0 = off)",
    )
    ap.add_argument(
        "--no-metarefresh",
        action="store_true",
        help="http backend: disable following <meta http-equiv=refresh> "
        "redirects (METAREFRESH_ENABLED=False)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("scrapy-spark-crawl")
        # a crawl driver runs for days; cap status-store retention so
        # dead execution/stage bookkeeping (each retained SQL execution
        # pins its full plan graph) can't grow the heap without bound
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.ui.retainedJobs", "128")
        .config("spark.ui.retainedStages", "256")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import ParquetStore
    from scrapy_spark.streaming.engine import CrawlEngine

    store = ParquetStore(spark, args.store)
    t0 = time.time()
    if args.backend == "http":
        # REAL network crawl: seeds from CSV, links from fetched HTML,
        # robots.txt fetched LIVE per first-seen domain during its
        # one-epoch robots wait (robots_source="http"), persisted in the
        # store's robots_http table so resumes never re-fetch
        import pandas as pd

        from scrapy_spark.functions.urlnorm import parse_domain

        cfg = CrawlConfig(
            fetch_backend="http",
            robots_source="http",
            transport=args.transport,
            epoch_budget=args.budget,
            max_epochs=args.epochs,
            allowed_domains=tuple(
                d for d in args.allowed_domains.split(",") if d
            ),
            depth_limit=6,
            depth_priority=1,
            queue_order="fifo",
            seen_filter=args.seen_filter,
            seen_ttl_epochs=args.seen_ttl_epochs,
            domain_page_budget=args.domain_page_budget,
            metarefresh_enabled=not args.no_metarefresh,
        )
        seeds = pd.read_csv(args.seeds_csv)
        if "priority" not in seeds.columns:
            seeds["priority"] = 0
        eng = CrawlEngine(
            spark, cfg, store,
            url_map=spark.createDataFrame([], "url_canon string, image_id string"),
            graph=spark.createDataFrame([], "src_canon string, dst_url string"),
            robots=spark.createDataFrame([], "domain string, rules string"),
        )
        if store.epoch < 0 and not store.scalars.get("bootstrapped"):
            politeness = pd.DataFrame(
                {
                    "slot": sorted({parse_domain(u) for u in seeds["url"]}),
                }
            ).assign(delay_ms=cfg.download_delay_ms, concurrency=cfg.concurrent_per_domain)
            eng.bootstrap(seeds[["url", "priority"]], politeness)
        else:
            eng._rebuild_bloom()
    else:
        cfg = CrawlConfig(
            epoch_budget=args.budget,
            max_epochs=args.epochs,
            allowed_domains=("example",),
            depth_limit=6,
            depth_priority=1,
            queue_order="fifo",
            seen_filter=args.seen_filter,
            seen_ttl_epochs=args.seen_ttl_epochs,
            domain_page_budget=args.domain_page_budget,
        )
        fix = gen_crawl_fixture(args.scale, seed=args.seed, with_payload=False)
        eng = CrawlEngine.from_fixture(spark, cfg, store, fix)
    stats = eng.run(max_epochs=args.epochs)
    elapsed = time.time() - t0
    popped = sum(s.popped for s in stats)
    fresh = sum(s.fresh for s in stats)
    print(
        json.dumps(
            {
                "epochs": len(stats),
                "last_epoch": store.epoch,
                "urls_popped": popped,
                "urls_fresh": fresh,
                "elapsed_sec": round(elapsed, 1),
                "urls_per_sec": round((popped + fresh) / elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
