"""C11 meta semantics: JVM-side meta_json merge (Request.replace analog)
and its engine wiring — redirect children inherit + annotate meta
(redirect_urls/reasons/times, ref redirect.py ≈L50), retries carry meta
unchanged, and the meta['dont_redirect'] / meta['dont_retry'] escape
hatches gate outcome classification like upstream."""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scrapy_spark.config import CrawlConfig
from scrapy_spark.functions.meta import (
    merge_meta,
    meta_get,
    meta_get_list,
    redirect_child_meta,
)
from scrapy_spark.sources.fixtures import CrawlFixture
from scrapy_spark.sources.store import MemoryStore
from scrapy_spark.streaming.engine import CrawlEngine

DOM = "example.com"
ALIAS = f"https://{DOM}/r/1"
TARGET = f"https://{DOM}/page/1"


def _str_df(spark, **cols):
    pdf = pd.DataFrame(cols)
    return spark.createDataFrame(pdf)


def test_merge_meta_updates_win(spark):
    df = spark.createDataFrame(
        [('{"a":"1","b":"2"}',), (None,)], "meta_json string"
    )
    updates = F.create_map(F.lit("b"), F.lit("9"), F.lit("c"), F.lit("3"))
    out = [
        json.loads(r[0])
        for r in df.select(merge_meta(F.col("meta_json"), updates)).collect()
    ]
    assert out[0] == {"a": "1", "b": "9", "c": "3"}
    assert out[1] == {"b": "9", "c": "3"}


def test_meta_get_and_list_roundtrip(spark):
    meta = json.dumps({"k": "v", "lst": json.dumps(["x", "y"])})
    df = spark.createDataFrame([(meta,), (None,)], "meta_json string")
    rows = df.select(
        meta_get(F.col("meta_json"), "k").alias("k"),
        meta_get_list(F.col("meta_json"), "lst").alias("lst"),
    ).collect()
    assert rows[0]["k"] == "v" and rows[0]["lst"] == ["x", "y"]
    assert rows[1]["k"] is None and rows[1]["lst"] == []


def test_redirect_child_meta_accumulates_chain(spark):
    df = spark.createDataFrame([(None, "https://a/1", 301)],
                               "meta_json string, url string, status int")
    hop1 = df.select(
        redirect_child_meta(
            F.col("meta_json"), F.col("url"), F.col("status")
        ).alias("meta_json")
    )
    m1 = json.loads(hop1.collect()[0][0])
    assert json.loads(m1["redirect_urls"]) == ["https://a/1"]
    assert json.loads(m1["redirect_reasons"]) == ["301"]
    assert m1["redirect_times"] == "1"
    hop2 = hop1.select(
        redirect_child_meta(
            F.col("meta_json"), F.lit("https://a/2"), F.lit(302)
        ).alias("meta_json")
    )
    m2 = json.loads(hop2.collect()[0][0])
    assert json.loads(m2["redirect_urls"]) == ["https://a/1", "https://a/2"]
    assert json.loads(m2["redirect_reasons"]) == ["301", "302"]
    assert m2["redirect_times"] == "2"


# ----------------------------------------------------------- engine wiring
def _redirect_fixture():
    return CrawlFixture(
        seeds=pd.DataFrame({"url": [ALIAS], "priority": [0]}),
        graph=pd.DataFrame(  # inert row: src never fetched, schema inferable
            {"src_canon": ["https://unused.invalid/"],
             "dst_url": ["https://unused.invalid/x"]}
        ),
        url_map=pd.DataFrame({"url_canon": [TARGET], "image_id": ["img-1"]}),
        redirects=pd.DataFrame({"src_canon": [ALIAS], "dst_url": [TARGET]}),
        robots=pd.DataFrame(
            {"domain": [DOM], "rules": [""], "status": ["OK"]}
        ),
        politeness=pd.DataFrame(
            {"slot": [DOM], "delay_ms": [0], "concurrency": [8]}
        ),
        corpus=None,
        scale="unit",
        seed=0,
    )


_CFG = dict(
    robotstxt_obey=False,
    epoch_budget=16,
    queue_order="fifo",
    bloom_enabled=False,
)


def test_engine_redirect_child_carries_meta(spark):
    store = MemoryStore(spark)
    eng = CrawlEngine.from_fixture(
        spark, CrawlConfig(**_CFG), store, _redirect_fixture()
    )
    eng.run(max_epochs=1)
    frontier = store.read("frontier").toPandas()
    child = frontier[frontier.url == TARGET]
    assert len(child) == 1
    meta = json.loads(child.meta_json.iloc[0])
    assert json.loads(meta["redirect_urls"]) == [ALIAS]
    assert json.loads(meta["redirect_reasons"]) == ["301"]
    assert meta["redirect_times"] == "1"
    # the chain then completes: child fetched 200 on the next epoch
    eng.run(max_epochs=3)
    assert len(store.read("frontier").toPandas()) == 0


def test_engine_dont_redirect_meta_halts_chain(spark):
    # a pre-fetch hook (U2) plants meta['dont_redirect'] — the 301 must
    # then classify as a terminal failure, never enqueueing the child
    cfg = CrawlConfig(
        **_CFG,
        pre_fetch_hook=lambda df: df.withColumn(
            "meta_json", F.lit('{"dont_redirect":"true"}')
        ),
    )
    store = MemoryStore(spark)
    eng = CrawlEngine.from_fixture(spark, cfg, store, _redirect_fixture())
    eng.run(max_epochs=2)
    frontier = store.read("frontier").toPandas()
    assert len(frontier) == 0  # no redirect child was ever enqueued
