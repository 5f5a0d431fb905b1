"""Crawl-dataflow operators, each a declarative DataFrame transform
(SURVEY §2's inventory, Spark-first)."""
