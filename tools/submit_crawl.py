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
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="store root (shared fs / s3a)")
    ap.add_argument("--scale", default="bench", help="fixture scale name")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--budget", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("scrapy-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import ParquetStore
    from scrapy_spark.streaming.engine import CrawlEngine

    cfg = CrawlConfig(
        epoch_budget=args.budget,
        max_epochs=args.epochs,
        allowed_domains=("example",),
        depth_limit=6,
        depth_priority=1,
        queue_order="fifo",
    )
    fix = gen_crawl_fixture(args.scale, seed=args.seed, with_payload=False)
    store = ParquetStore(spark, args.store)
    t0 = time.time()
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
