"""Spider-callback registry (SURVEY §2.9 U1/U5; ref: Spider.parse ≈L80 +
callback-by-name serialization, utils/request.py ≈L180)."""

import json

import pandas as pd
import pytest

from scrapy_spark.operators.callbacks import (
    PARSE_OUTPUT,
    callback,
    get_handler,
    run_callbacks,
)


@pytest.fixture()
def responses(spark):
    html = '<a href="/next1">n</a><a href="http://o.example/x">o</a>'
    rows = [
        (1, b"\x01" * 20, "http://a.example/p/1", html, "extract_links"),
        (2, b"\x02" * 20, "http://a.example/p/2", "<p>none</p>", "extract_links"),
        (3, b"\x03" * 20, "http://a.example/item/9", "", "emit_item"),
        (4, b"\x04" * 20, "http://a.example/p/4", html, None),  # → default
    ]
    return spark.createDataFrame(
        rows, "seq long, fp binary, url_canon string, html string, callback string"
    )


def test_mixed_callbacks_one_pass(responses):
    out = run_callbacks(responses).collect()
    by_parent = {}
    for r in out:
        by_parent.setdefault(r["parent_seq"], []).append(r)
    # extract_links yields 1→N requests, resolved against the page URL
    urls1 = {r["url"] for r in by_parent[1]}
    assert urls1 == {"http://a.example/next1", "http://o.example/x"}
    assert all(r["kind"] == "request" for r in by_parent[1])
    assert 2 not in by_parent  # no links → no rows
    # emit_item yields exactly one item row with json payload
    (item,) = by_parent[3]
    assert item["kind"] == "item"
    assert isinstance(json.loads(item["item_json"]), dict)
    # null callback falls back to the default handler
    assert {r["url"] for r in by_parent[4]} == urls1


def test_output_schema_is_fixed(responses):
    out = run_callbacks(responses)
    assert out.schema == PARSE_OUTPUT


def test_unknown_callback_raises(spark):
    df = spark.createDataFrame(
        [(1, b"\x01" * 20, "http://a/", "", "nope")],
        "seq long, fp binary, url_canon string, html string, callback string",
    )
    with pytest.raises(Exception, match="no callback registered"):
        run_callbacks(df).collect()


def test_user_registered_callback(spark):
    @callback("double")
    def _double(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            for i in range(2):
                rows.append(
                    ("request", r["seq"], r["fp"], f"{r['url_canon']}/{i}", i, None)
                )
        return pd.DataFrame(rows, columns=[f.name for f in PARSE_OUTPUT.fields])

    assert get_handler("double") is _double
    df = spark.createDataFrame(
        [(7, b"\x07" * 20, "http://a.example/x", "", "double")],
        "seq long, fp binary, url_canon string, html string, callback string",
    )
    got = sorted(r["url"] for r in run_callbacks(df).collect())
    assert got == ["http://a.example/x/0", "http://a.example/x/1"]
