"""Feed-export sinks (SURVEY §2.1 S7/S8; ref exporters.py semantics:
field projection/order, batch size, empty-field rendering, escaping)."""

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from scrapy_spark.sources.sinks import FeedConfig, export_all, export_items


@pytest.fixture()
def items_df(spark):
    rows = [
        ("img1", b"\x01\x02", 8, "a & b <ok>", 1.5),
        ("img2", None, 16, None, 2.0),
        ("img3", b"\xff", 32, "plain", 0.0),
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, caption string, score double"
    )


def _read_lines(path):
    out = []
    for p in sorted(pathlib.Path(path).glob("part-*")):
        out += [l for l in p.read_text().splitlines() if l]
    return out


def test_jsonlines_with_field_projection(items_df, tmp_path):
    dst = str(tmp_path / "j")
    export_items(
        items_df,
        FeedConfig(path=dst, format="jsonlines", fields=("image_id", "caption", "bytes")),
    )
    recs = {json.loads(l)["image_id"]: json.loads(l) for l in _read_lines(dst)}
    assert set(recs) == {"img1", "img2", "img3"}
    assert recs["img1"]["bytes"] == "0102"  # binary → hex for text formats
    assert "w" not in recs["img1"]  # FEED_EXPORT_FIELDS projection
    assert "caption" not in recs["img2"]  # spark json omits nulls


def test_csv_header_fields_and_empty(items_df, tmp_path):
    dst = str(tmp_path / "c")
    export_items(
        items_df,
        FeedConfig(path=dst, format="csv", fields=("image_id", "w", "caption")),
    )
    files = sorted(pathlib.Path(dst).glob("part-*"))
    header = files[0].read_text().splitlines()[0]
    assert header == "image_id,w,caption"  # field ORDER preserved
    body = [l for f in files for l in f.read_text().splitlines()[1:]]
    assert any(l.startswith("img2,16,") for l in body)  # null → empty field


def test_xml_escaping(items_df, tmp_path):
    dst = str(tmp_path / "x")
    export_items(
        items_df,
        FeedConfig(path=dst, format="xml", fields=("image_id", "caption")),
    )
    lines = _read_lines(dst)
    row1 = next(l for l in lines if "img1" in l)
    assert "<caption>a &amp; b &lt;ok&gt;</caption>" in row1
    assert row1.startswith("<item><image_id>img1</image_id>")


def test_batch_item_count_maps_to_max_records_per_file(items_df, tmp_path):
    dst = str(tmp_path / "b")
    big = items_df.union(items_df).union(items_df)  # 9 rows
    export_items(
        big.repartition(1),
        FeedConfig(path=dst, format="jsonlines", batch_item_count=4),
    )
    files = sorted(pathlib.Path(dst).glob("part-*"))
    sizes = [len([l for l in f.read_text().splitlines() if l]) for f in files]
    assert max(sizes) <= 4  # FEED_EXPORT_BATCH_ITEM_COUNT contract
    assert sum(sizes) == 9


def test_item_filter_and_multiple_feeds(items_df, tmp_path):
    feeds = [
        FeedConfig(path=str(tmp_path / "f1"), format="jsonlines", where="score > 1.0"),
        FeedConfig(path=str(tmp_path / "f2"), format="parquet"),
    ]
    export_all(items_df, feeds)
    assert len(_read_lines(str(tmp_path / "f1"))) == 2  # ItemFilter applied
    spark = items_df.sparkSession
    back = spark.read.parquet(str(tmp_path / "f2"))
    assert back.count() == 3
    got = {r["image_id"]: r["bytes"] for r in back.collect()}
    assert bytes(got["img1"]) == b"\x01\x02"  # parquet keeps native binary


def test_export_uri_routing(spark, tmp_path, monkeypatch):
    """S7 remote storages: Spark-native schemes route to the distributed
    writer; ftp:// writes locally then uploads file-by-file (FTPFeedStorage
    shape, verified against a recording FTP double); unknown schemes fail
    loudly."""
    import ftplib

    from scrapy_spark.sources.sinks import (
        FeedConfig,
        export_items_to_uri,
        storage_supported,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    # local path → native writer
    out = tmp_path / "feed_local"
    export_items_to_uri(df, FeedConfig(path=str(out), format="csv"))
    assert any(p.suffix == ".csv" for p in out.iterdir())

    assert storage_supported("s3a://bucket/key")
    assert storage_supported("ftp://h.example/feed")
    assert not storage_supported("gopher://x")
    with pytest.raises(ValueError):
        export_items_to_uri(df, FeedConfig(path="gopher://x/y"))

    stored: list[str] = []

    class FakeFTP:
        def connect(self, host, port):
            assert (host, port) == ("ftp.example", 2121)

        def login(self, user, pw):
            assert (user, pw) == ("u", "p")

        def mkd(self, path):
            raise ftplib.error_perm("550 exists")

        def storbinary(self, cmd, fh):
            assert fh.read(1)  # non-empty upload stream
            stored.append(cmd)

        def quit(self):
            pass

    monkeypatch.setattr(ftplib, "FTP", FakeFTP)
    export_items_to_uri(
        df, FeedConfig(path="ftp://u:p@ftp.example:2121/feeds", format="csv")
    )
    assert stored and all(c.startswith("STOR /feeds/") for c in stored)
    assert any(c.endswith(".csv") for c in stored)


def test_pickle_marshal_roundtrip(items_df, tmp_path):
    """S8 single-stream exporters (ref PickleItemExporter/
    MarshalItemExporter): sequential frames, native bytes, load-until-EOF
    round-trips every row."""
    import marshal
    import pickle

    from scrapy_spark.sources.sinks import export_single_stream

    for fmt, loader in (("pickle", pickle.load), ("marshal", marshal.load)):
        dst = tmp_path / f"feed.{fmt}"
        n = export_single_stream(
            items_df, FeedConfig(path=str(dst), format=fmt)
        )
        assert n == 3
        frames = []
        with open(dst, "rb") as fh:
            while True:
                try:
                    frames.append(loader(fh))
                except EOFError:
                    break
        by_id = {f["image_id"]: f for f in frames}
        assert set(by_id) == {"img1", "img2", "img3"}
        assert by_id["img1"]["bytes"] == b"\x01\x02"  # native bytes
        assert by_id["img2"]["caption"] is None


def test_pprint_literal_eval_and_batching(items_df, tmp_path):
    """PprintItemExporter analog: pformat frames are literal-evaluable;
    FEED_EXPORT_BATCH_ITEM_COUNT rolls path.<batch_id> files."""
    import ast

    from scrapy_spark.sources.sinks import export_single_stream

    dst = tmp_path / "feed.pprint"
    n = export_single_stream(
        items_df,
        FeedConfig(
            path=str(dst),
            format="pprint",
            fields=("image_id", "w"),
            batch_item_count=2,
        ),
    )
    assert n == 3
    files = sorted(tmp_path.glob("feed.pprint.*"))
    assert [f.name for f in files] == ["feed.pprint.0", "feed.pprint.1"]
    recs = []
    for f in files:
        recs += [ast.literal_eval(x) for x in f.read_text().splitlines() if x]
    assert {r["image_id"] for r in recs} == {"img1", "img2", "img3"}
    assert all(set(r) == {"image_id", "w"} for r in recs)  # projection


def test_export_all_routes_single_stream(items_df, tmp_path):
    import pickle

    dst = tmp_path / "all.pickle"
    export_all(items_df, [FeedConfig(path=str(dst), format="pickle")])
    with open(dst, "rb") as fh:
        first = pickle.load(fh)
    assert "image_id" in first


# ------------------------- feed post-processing (ref: postprocessing.py)


def test_gzip_postprocessing_distributed(items_df, tmp_path):
    """GzipPlugin parity, cluster-side: jsonlines + ('gzip',) must write
    .gz part files whose decompressed lines are the same records, and
    Spark must read the feed back transparently."""
    import gzip

    dst = str(tmp_path / "jz")
    export_items(
        items_df,
        FeedConfig(
            path=dst,
            format="jsonlines",
            fields=("image_id", "w"),
            postprocessing=("gzip",),
        ),
    )
    parts = sorted(pathlib.Path(dst).glob("part-*.gz"))
    assert parts, "expected gzip-compressed part files"
    recs = []
    for p in parts:
        with gzip.open(p, "rt") as fh:
            recs += [json.loads(l) for l in fh if l.strip()]
    assert {r["image_id"] for r in recs} == {"img1", "img2", "img3"}
    back = items_df.sparkSession.read.json(dst)
    assert back.count() == 3


def test_bz2_postprocessing_csv(items_df, tmp_path):
    import bz2

    dst = str(tmp_path / "cz")
    export_items(
        items_df,
        FeedConfig(
            path=dst,
            format="csv",
            fields=("image_id", "w"),
            postprocessing=("bz2",),
        ),
    )
    parts = sorted(pathlib.Path(dst).glob("part-*.bz2"))
    assert parts
    lines = []
    for p in parts:
        lines += bz2.open(p, "rt").read().splitlines()
    assert sum(1 for l in lines if l and not l.startswith("image_id")) == 3


def test_postprocessing_rejects_unsupported_distributed(items_df, tmp_path):
    with pytest.raises(ValueError, match="lzma"):
        export_items(
            items_df,
            FeedConfig(
                path=str(tmp_path / "x"),
                format="jsonlines",
                postprocessing=("lzma",),
            ),
        )
    with pytest.raises(ValueError, match="one compression plugin"):
        export_items(
            items_df,
            FeedConfig(
                path=str(tmp_path / "y"),
                format="csv",
                postprocessing=("gzip", "bz2"),
            ),
        )


def test_single_stream_plugin_chain_matches_reference_order(items_df, tmp_path):
    """PostProcessingManager semantics: plugins ('gzip','lzma') produce
    lzma(gzip(data)) on disk — decode outermost-in and unpickle."""
    import gzip
    import lzma
    import pickle

    from scrapy_spark.sources.sinks import export_single_stream

    dst = tmp_path / "feed.pickle"
    n = export_single_stream(
        items_df,
        FeedConfig(
            path=str(dst),
            format="pickle",
            fields=("image_id",),
            postprocessing=("gzip", "lzma"),
        ),
    )
    assert n == 3
    inner = gzip.decompress(lzma.decompress(dst.read_bytes()))
    import io

    buf, recs = io.BytesIO(inner), []
    while True:
        try:
            recs.append(pickle.load(buf))
        except EOFError:
            break
    assert {r["image_id"] for r in recs} == {"img1", "img2", "img3"}


def test_single_stream_lzma_pprint_text(items_df, tmp_path):
    import ast
    import lzma

    from scrapy_spark.sources.sinks import export_single_stream

    dst = tmp_path / "feed.pprint"
    export_single_stream(
        items_df,
        FeedConfig(
            path=str(dst),
            format="pprint",
            fields=("image_id", "w"),
            postprocessing=("lzma",),
        ),
    )
    recs = [
        ast.literal_eval(x)
        for x in lzma.open(dst, "rt").read().splitlines()
        if x
    ]
    assert {r["image_id"] for r in recs} == {"img1", "img2", "img3"}
