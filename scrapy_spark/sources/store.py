"""Frontier table store (SURVEY §1.3, §2.8 ST3/ST6).

On a real cluster the state tables are Iceberg (atomic multi-table commits,
hidden bucket partitioning on ``fp``). The sandbox's pyspark has no Iceberg
jars (verified — FIXTURES.md §C), so ``ParquetStore`` emulates the part the
engine depends on: **versioned table file-lists pinned by an atomically
swapped JSON manifest** — the moral equivalent of an Iceberg snapshot.
Killing the driver mid-epoch leaves the previous manifest intact; restart
resumes from it (SEMANTICS.md resume contract; the reference's JOBDIR
persistence, scheduler.py ≈L120 / dupefilters.py ≈L45, has the same role).

``MemoryStore`` is the volatile variant for benchmarks: identical interface,
state kept as localCheckpoint-ed cached DataFrames (lineage truncated per
commit so the epoch loop's plan doesn't grow unboundedly).
"""

from __future__ import annotations

import json
import os
import pathlib
import uuid

from pyspark.sql import DataFrame, SparkSession


class Store:
    """Interface: read current table versions, commit an epoch atomically."""

    def read(self, name: str) -> DataFrame | None:
        raise NotImplementedError

    def commit(
        self,
        epoch: int,
        replace: dict[str, DataFrame],
        append: dict[str, DataFrame],
        scalars: dict,
    ) -> None:
        raise NotImplementedError

    @property
    def epoch(self) -> int:
        """Last committed epoch, -1 if fresh."""
        raise NotImplementedError

    @property
    def scalars(self) -> dict:
        raise NotImplementedError


class ParquetStore(Store):
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = pathlib.Path(root)
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        self._manifest: dict = {"epoch": -1, "tables": {}, "scalars": {}}
        mpath = self.root / "manifest.json"
        if mpath.exists():
            self._manifest = json.loads(mpath.read_text())

    @property
    def epoch(self) -> int:
        return self._manifest["epoch"]

    @property
    def scalars(self) -> dict:
        return self._manifest["scalars"]

    def read(self, name: str) -> DataFrame | None:
        paths = self._manifest["tables"].get(name)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _write(self, epoch: int, name: str, df: DataFrame) -> str:
        out = self.root / "data" / name / f"e{epoch:06d}_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(str(out))
        return str(out)

    def commit(self, epoch, replace, append, scalars) -> None:
        tables = dict(self._manifest["tables"])
        for name, df in replace.items():
            tables[name] = [self._write(epoch, name, df)]
        for name, df in append.items():
            # caller guarantees df is non-empty (skip-empty handled upstream)
            tables.setdefault(name, [])
            tables[name] = tables[name] + [self._write(epoch, name, df)]
        manifest = {"epoch": epoch, "tables": tables, "scalars": scalars}
        tmp = self.root / f".manifest.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self.root / "manifest.json")  # the atomic swap
        self._manifest = manifest


class MemoryStore(Store):
    """Append tables are kept as LISTS of checkpointed per-epoch deltas,
    unioned lazily on read — committing epoch e materializes only e's
    delta, not the whole history (the eager union-then-checkpoint variant
    rewrote the full accumulated table every epoch: O(epochs²) work).
    Mirrors ParquetStore's file-list appends."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}  # replace-tables
        self._parts: dict[str, list[DataFrame]] = {}  # append-table deltas
        self._epoch = -1
        self._scalars: dict = {}

    @property
    def epoch(self) -> int:
        return self._epoch

    @property
    def scalars(self) -> dict:
        return self._scalars

    def read(self, name: str) -> DataFrame | None:
        # a table may have a replaced base (e.g. url_seen's bootstrap) AND
        # appended deltas — merge both
        pieces = []
        if name in self._tables:
            pieces.append(self._tables[name])
        pieces += self._parts.get(name, [])
        if not pieces:
            return None
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def commit(self, epoch, replace, append, scalars) -> None:
        for name, df in replace.items():
            self._tables[name] = df.localCheckpoint(eager=True)
            self._parts.pop(name, None)  # replace resets any deltas
        for name, df in append.items():
            self._parts.setdefault(name, []).append(df.localCheckpoint(eager=True))
        self._epoch = epoch
        self._scalars = scalars
