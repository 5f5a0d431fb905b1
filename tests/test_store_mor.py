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
