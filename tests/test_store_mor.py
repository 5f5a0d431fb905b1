"""ST3/ST6 store-level merge-on-read contract: delta commits (delete-keys
+ inserts) must resolve identically to a replace, across both stores,
through promotion (replace-table → MOR), chain reads, compaction (with
and without the caller's resolved hint), and manifest reload."""

import pytest

import scrapy_spark.sources.store as store_mod
from scrapy_spark.sources.store import MemoryStore, ParquetStore


def _rows(df):
    return sorted((r.seq, r.v) for r in df.collect())


def _run_protocol(spark, store, resolved_hint: bool):
    base = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "seq long, v string")
    store.commit(0, replace={"t": base}, append={}, scalars={"s": 0})

    state = {i: f"v{i}" for i in range(10)}
    for e in range(1, 6):
        dels = spark.createDataFrame([(e,), (e + 4,)], "seq long")
        ins = spark.createDataFrame([(100 + e, f"n{e}")], "seq long, v string")
        for k in (e, e + 4):
            state.pop(k, None)
        state[100 + e] = f"n{e}"
        resolved = None
        if resolved_hint:
            cur = store.read("t")
            nxt = cur.join(dels, "seq", "left_anti").unionByName(ins)
            resolved = {"t": nxt}
        store.commit(
            e,
            replace={},
            append={},
            scalars={"s": e},
            mutate={"t": ("seq", dels, ins)},
            resolved=resolved,
        )
        got = _rows(store.read("t"))
        assert got == sorted(state.items()), f"epoch {e} ({type(store).__name__})"
    return state


@pytest.mark.parametrize("resolved_hint", [False, True])
def test_memory_store_mor(spark, resolved_hint):
    _run_protocol(spark, MemoryStore(spark), resolved_hint)


def _part_bytes(dirs):
    import pathlib

    return {
        str(p): p.read_bytes()
        for d in dirs
        for p in pathlib.Path(d).rglob("*.parquet")
    }


def test_parquet_compaction_is_file_selective(spark, tmp_path, monkeypatch):
    """Positional-delete-style compaction: dirs whose rows are never
    deleted must survive compaction path-stable and byte-identical (no
    rewrite), while hit dirs are rewritten and dropped from the base."""
    monkeypatch.setattr(store_mod, "COMPACT_EVERY", 3)
    store = ParquetStore(spark, str(tmp_path / "sel"))
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "seq long, v string"
    )
    store.commit(0, replace={"t": base}, append={}, scalars={})
    base_dir = store._manifest["tables"]["t"][0]

    state = {i: f"v{i}" for i in range(10)}
    ins_dirs = []
    for e in range(1, 4):
        # deletes target ONLY base keys; each epoch's insert range is
        # never deleted → its dir must never be rewritten
        dels = spark.createDataFrame([(e,), (e + 4,)], "seq long")
        ins = spark.createDataFrame(
            [(100 * e + j, f"n{e}.{j}") for j in range(3)], "seq long, v string"
        )
        for k in (e, e + 4):
            state.pop(k, None)
        for j in range(3):
            state[100 * e + j] = f"n{e}.{j}"
        store.commit(
            e, replace={}, append={}, scalars={}, mutate={"t": ("seq", dels, ins)}
        )
        entry = store._manifest["tables"]["t"]
        if entry["ins"]:
            ins_dirs.append(entry["ins"][-1])
    snap_before = _part_bytes(ins_dirs)

    entry = store._manifest["tables"]["t"]
    assert entry["dels"] == [] and entry["ins"] == []  # compaction ran
    # untouched insert dirs: still referenced, same paths, same bytes
    for d in ins_dirs:
        assert d in entry["base"], f"untouched dir {d} was rewritten"
    assert _part_bytes(ins_dirs) == snap_before
    # the hit dir (the original base, which held every deleted key) is gone
    assert base_dir not in entry["base"]
    assert _rows(store.read("t")) == sorted(state.items())


def test_parquet_compaction_full_rewrite_fallback(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(store_mod, "COMPACT_EVERY", 3)
    monkeypatch.setattr(store_mod, "MAX_BASE_FILES", 2)  # force the fallback
    store = ParquetStore(spark, str(tmp_path / "fb"))
    state = _run_protocol(spark, store, resolved_hint=False)
    entry = store._manifest["tables"]["t"]
    assert len(entry["base"]) == 1  # fallback consolidated to one dir
    assert _rows(store.read("t")) == sorted(state.items())


@pytest.mark.parametrize("resolved_hint", [False, True])
def test_parquet_store_mor_with_compaction(spark, tmp_path, resolved_hint, monkeypatch):
    monkeypatch.setattr(store_mod, "COMPACT_EVERY", 3)  # force 1+ compactions
    store = ParquetStore(spark, str(tmp_path / f"s{resolved_hint}"))
    state = _run_protocol(spark, store, resolved_hint)
    entry = store._manifest["tables"]["t"]
    assert isinstance(entry, dict)
    assert len(entry["dels"]) < 3  # a compaction actually happened
    # a fresh store over the same root (new driver) reads the same rows
    reopened = ParquetStore(spark, str(tmp_path / f"s{resolved_hint}"))
    assert _rows(reopened.read("t")) == sorted(state.items())
    assert reopened.scalars == {"s": 5}


@pytest.mark.parametrize("store_kind", ["memory", "parquet"])
def test_append_after_mor_promotion(spark, tmp_path, store_kind):
    """An append committed AFTER a table was promoted to merge-on-read
    must surface in reads (it becomes a MOR insert) — the url_seen
    lifecycle under seen-TTL expiry: bootstrap replace → per-epoch
    appends → keyed-delete mutate → MORE appends."""
    store = (
        MemoryStore(spark)
        if store_kind == "memory"
        else ParquetStore(spark, str(tmp_path / "am"))
    )
    base = spark.createDataFrame([(i, f"v{i}") for i in range(4)], "seq long, v string")
    store.commit(0, replace={"t": base}, append={}, scalars={})
    ap1 = spark.createDataFrame([(10, "a1")], "seq long, v string")
    store.commit(1, replace={}, append={"t": ap1}, scalars={})
    # keyed delete promotes (base + appended delta) to MOR
    dels = spark.createDataFrame([(1,), (10,)], "seq long")
    empty = base.limit(0)
    store.commit(2, replace={}, append={}, scalars={}, mutate={"t": ("seq", dels, empty)})
    assert _rows(store.read("t")) == [(0, "v0"), (2, "v2"), (3, "v3")]
    # append AFTER promotion: must be readable, and deletable in turn
    ap2 = spark.createDataFrame([(20, "a2")], "seq long, v string")
    store.commit(3, replace={}, append={"t": ap2}, scalars={})
    assert _rows(store.read("t")) == [(0, "v0"), (2, "v2"), (3, "v3"), (20, "a2")]
    d2 = spark.createDataFrame([(20,)], "seq long")
    store.commit(4, replace={}, append={}, scalars={}, mutate={"t": ("seq", d2, empty)})
    assert _rows(store.read("t")) == [(0, "v0"), (2, "v2"), (3, "v3")]
    if store_kind == "parquet":
        reopened = ParquetStore(spark, str(tmp_path / "am"))
        assert _rows(reopened.read("t")) == [(0, "v0"), (2, "v2"), (3, "v3")]


@pytest.mark.parametrize("store_kind", ["memory", "parquet"])
def test_composite_key_reinsert_survives_stale_delete(
    spark, tmp_path, store_kind, monkeypatch
):
    """Generation-aware deletes (the url_seen TTL-expiry lifecycle): a key
    deleted on the composite (fp, gen) and later RE-inserted with a fresh
    gen must survive both merge-on-read resolution AND compaction — the
    stale delete delta may only match the generation it named. A bare-fp
    delete clobbered the re-insert (an expired-then-recrawled URL stayed
    'fresh' forever); this pins the fix."""
    monkeypatch.setattr(store_mod, "COMPACT_EVERY", 3)
    store = (
        MemoryStore(spark)
        if store_kind == "memory"
        else ParquetStore(spark, str(tmp_path / "gen"))
    )
    schema = "fp string, gen long"
    key = ["fp", "gen"]
    base = spark.createDataFrame([("X", 0), ("Y", 0)], schema)
    store.commit(0, replace={"t": base}, append={}, scalars={})
    empty = base.limit(0)

    def rows():
        return sorted((r.fp, r.gen) for r in store.read("t").collect())

    # expire X@0 — composite delete
    d1 = spark.createDataFrame([("X", 0)], schema)
    store.commit(1, replace={}, append={}, scalars={}, mutate={"t": (key, d1, empty)})
    assert rows() == [("Y", 0)]
    # X recrawled at gen 2: re-insert via the append path (the engine's
    # seen_append) — the stale ("X", 0) delete must NOT match it
    re_ins = spark.createDataFrame([("X", 2)], schema)
    store.commit(2, replace={}, append={"t": re_ins}, scalars={})
    assert rows() == [("X", 2), ("Y", 0)]
    # further mutate epochs drive past COMPACT_EVERY → compaction must
    # keep the re-inserted generation too (the old bug dropped it here
    # permanently)
    d2 = spark.createDataFrame([("Y", 0)], schema)
    store.commit(3, replace={}, append={}, scalars={}, mutate={"t": (key, d2, empty)})
    d3 = spark.createDataFrame([("Z", 9)], schema)  # no-op delete
    store.commit(4, replace={}, append={}, scalars={}, mutate={"t": (key, d3, empty)})
    assert rows() == [("X", 2)]
    if store_kind == "parquet":
        entry = store._manifest["tables"]["t"]
        assert entry["dels"] == []  # compaction actually ran
        reopened = ParquetStore(spark, str(tmp_path / "gen"))
        assert sorted(
            (r.fp, r.gen) for r in reopened.read("t").collect()
        ) == [("X", 2)]
