"""T5 resume parity (SURVEY §5.2-T5; SEMANTICS 'Resume'; north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

The ParquetStore commit protocol is: write all epoch data files, then
atomically swap ``manifest.json`` (os.replace). A kill at ANY point before
the swap must leave the previous epoch's state authoritative; a restart
from the surviving manifest must produce a final state identical to an
uninterrupted run (ref analogue: JOBDIR persistence — scheduler.py ≈L120,
dupefilters.py ≈L45, spiderstate.py).

The kill is simulated deterministically at the worst possible point:
AFTER the epoch's parquet files are fully written, BEFORE the manifest
swap (``DyingStore``). This is strictly harder than a between-epoch kill
and is exactly the window a SIGKILL race would hit.
"""

import pandas as pd
import pytest

from scrapy_spark.config import CrawlConfig
from scrapy_spark.sources.fixtures import gen_crawl_fixture
from scrapy_spark.sources.store import ParquetStore
from scrapy_spark.streaming.engine import CrawlEngine

TABLES = (
    "frontier",
    "url_seen",
    "domain_state",
    "pop_log",
    "fetch_log",
    "metrics",
    "items",
)


class Killed(RuntimeError):
    pass


class DyingStore(ParquetStore):
    """ParquetStore that dies mid-commit at ``kill_epoch``: data files are
    written (orphaned), the manifest swap never happens."""

    def __init__(self, spark, root, kill_epoch: int):
        super().__init__(spark, root)
        self.kill_epoch = kill_epoch

    def commit(self, epoch, replace, append, scalars, mutate=None, resolved=None) -> None:
        if epoch == self.kill_epoch:
            for name, df in {**replace, **append}.items():
                self._write(epoch, name, df)  # orphaned partial state
            for name, (_key, dels, ins) in (mutate or {}).items():
                self._write(epoch, f"{name}_del", dels)  # orphaned deltas
                self._write(epoch, f"{name}_ins", ins)
            raise Killed(f"simulated SIGKILL during commit of epoch {epoch}")
        super().commit(epoch, replace, append, scalars, mutate, resolved)


def relaxed_fixture():
    fix = gen_crawl_fixture("tiny", seed=42, with_payload=False)
    fix.politeness["concurrency"] = 8
    fix.politeness.loc[fix.politeness["delay_ms"] > 500, "delay_ms"] = 500
    return fix


CFG = dict(
    epoch_budget=256,
    max_epochs=100,
    allowed_domains=("example",),
    depth_limit=3,
    depth_priority=1,
    queue_order="fifo",
    epoch_quantum_ms=4000,
)


def table_frame(store, name) -> pd.DataFrame:
    df = store.read(name)
    if df is None:
        return pd.DataFrame()
    pdf = df.toPandas()
    for col in pdf.columns:
        if pdf[col].map(lambda v: isinstance(v, (bytes, bytearray))).any():
            pdf[col] = pdf[col].map(lambda v: None if v is None else bytes(v).hex())
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    fix = relaxed_fixture()
    cfg = CrawlConfig(**CFG)

    # --- uninterrupted run
    root_a = tmp_path_factory.mktemp("store_a")
    store_a = ParquetStore(spark, str(root_a))
    CrawlEngine.from_fixture(spark, cfg, store_a, fix).run()

    # --- killed-and-resumed run
    root_b = tmp_path_factory.mktemp("store_b")
    dying = DyingStore(spark, str(root_b), kill_epoch=3)
    with pytest.raises(Killed):
        CrawlEngine.from_fixture(spark, cfg, dying, fix).run()
    assert dying.epoch == 2  # manifest survived at the pre-kill epoch

    # restart: brand-new store + engine objects, as a new driver would
    store_b = ParquetStore(spark, str(root_b))
    assert store_b.epoch == 2
    eng_b = CrawlEngine.from_fixture(spark, cfg, store_b, fix)
    stats = eng_b.run()
    assert stats[0].epoch == 3  # continued exactly where the kill hit
    return store_a, store_b


@pytest.mark.parametrize("name", TABLES)
def test_resume_table_identical(runs, name):
    store_a, store_b = runs
    a, b = table_frame(store_a, name), table_frame(store_b, name)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_resume_scalars_identical(runs):
    store_a, store_b = runs
    assert store_a.scalars == store_b.scalars
    assert store_a.epoch == store_b.epoch


def test_repeated_restart_is_idempotent(spark, runs):
    """Restarting an already-terminated store runs zero new epochs of work
    and terminates immediately (frontier empty ⇒ first epoch is a no-op)."""
    _, store_b = runs
    before = store_b.epoch
    eng = CrawlEngine.from_fixture(
        spark, CrawlConfig(**CFG), store_b, relaxed_fixture()
    )
    eng.run(max_epochs=1)
    assert eng.stats_log[-1].popped == 0
    assert eng.stats_log[-1].queued_after == 0
    assert store_b.epoch == before + 1
