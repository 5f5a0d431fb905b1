"""Executor-resident sharded cuckoo filter (SURVEY §4.3.2; the
north_rule's "partitioned bloom-filter/cuckoo-filter structure" at its
actual design point).

The driver-resident ``ShardedCuckoo`` holds every shard's tag array in
driver memory and broadcasts the WHOLE filter each epoch — fine in the
sandbox, but at the 10^10-key design point that is ~2.5 GB of tags per
10^9 keys broadcast per epoch, and a driver-memory ceiling. This variant
removes both:

- **State lives on shared storage**, one ``.npy`` file per shard under
  ``<root>/seen_filter/``, pinned by an atomically swapped ``manifest``
  (same pattern as sources/store.py). The driver holds ONLY the manifest
  — sizing ints plus a shard→file map — never a tag array.
- **Probe** repartitions the candidate fps by the fp-derived shard id
  (``fp[:2] % shards`` — the same salted bucketing the url_seen table
  uses), so each task touches ~1 shard; the worker loads that shard's
  file once and caches it process-globally. Per-task memory =
  filter_size / shards, and what ships to an executor is the file paths,
  not the arrays.
- **Absorb / delete run shard-owner-side**: fps repartition to their
  shard's task, the owner loads its array, mutates a copy, writes a NEW
  content-addressed file; the driver collects only (shard, count, path)
  tuples and swaps the manifest. Untouched shards carry over
  path-stable, exactly like the MOR store's file-selective compaction.

On a cluster ``root`` is the job's shared filesystem (the same place the
Iceberg/Parquet state tables live); in local mode any directory works.
Bit-identical to ``ShardedCuckoo`` by construction: both build on the
shard-level ops in operators/cuckoo.py (derive_quads / shard_insert /
shard_delete) with the same sizing rule.

Versioned files + manifest swap give crash consistency (a killed job
leaves the previous manifest pointing at intact files); ``_gc`` prunes
unreferenced files but always RETAINS the immediately-previous
generation's file set: a probe captures the file map at UDF creation,
and the engine overlaps the absorb (which swaps the manifest) with the
stats action and the store commit, both of which may still schedule
tasks against plans holding the pre-absorb map (straggler tasks or a
lost cached partition re-compute). One generation of grace covers every
within-epoch overlap; files two generations old are pruned on the next
swap. A multi-writer deployment would widen the window.
"""

from __future__ import annotations

import json
import os
import pathlib
import uuid

import numpy as np
import pandas as pd

from .cuckoo import (
    SLOTS,
    cuckoo_nbuckets,
    derive_quads,
    shard_delete,
    shard_insert,
)

#: worker-process-global cache of shard arrays keyed by file path. Paths
#: are content-addressed (uuid per write), so a cached entry can never go
#: stale; the cap just bounds worker memory when many shards pass through
#: one long-lived worker.
_SHARD_CACHE: dict[str, np.ndarray] = {}
_SHARD_CACHE_MAX = 64


def _load_shard(path: str | None, nbuckets: int) -> np.ndarray:
    """Shard array from its file; missing/None = the all-empty shard."""
    if path is None:
        return np.zeros((nbuckets, SLOTS), dtype=np.uint16)
    arr = _SHARD_CACHE.get(path)
    if arr is None:
        arr = np.load(path)
        if len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
            _SHARD_CACHE.pop(next(iter(_SHARD_CACHE)))
        _SHARD_CACHE[path] = arr
    return arr


class DiskShardedCuckoo:
    """Duck-type-compatible with ShardedCuckoo where the engine cares:
    ``n_added`` / ``capacity`` / ``probe_udf`` / ``absorb_df`` /
    ``delete_df`` / ``maybe_contains``, plus ``prefers_shard_partitioning``
    so the dedupe path repartitions probe input by shard id first."""

    prefers_shard_partitioning = True

    def __init__(self, spark, root: str, capacity: int, shards: int = 32):
        self.spark = spark
        self.root = pathlib.Path(root) / "seen_filter"
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        mpath = self.root / "manifest.json"
        if mpath.exists():
            self._m = json.loads(mpath.read_text())
        else:
            self._m = {
                "capacity": capacity,
                "shards": shards,
                "nbuckets": cuckoo_nbuckets(capacity, shards),
                "n_added": 0,
                "files": {},  # shard id (str) → relative file path
            }
            self._swap_manifest()
        # previous-generation file set _gc must keep alive (see module
        # docstring); seeded from the loaded manifest so a resume never
        # prunes files a concurrently-resumed plan could still hold
        self._prev_files: set[str] = set(self._m["files"].values())

    # ------------------------------------------------------------ manifest
    @property
    def capacity(self) -> int:
        return self._m["capacity"]

    @property
    def shards(self) -> int:
        return self._m["shards"]

    @property
    def nbuckets(self) -> int:
        return self._m["nbuckets"]

    @property
    def n_added(self) -> int:
        return self._m["n_added"]

    def _swap_manifest(self) -> None:
        tmp = self.root / f".manifest.{uuid.uuid4().hex[:8]}.tmp"
        tmp.write_text(json.dumps(self._m, indent=1))
        os.replace(tmp, self.root / "manifest.json")

    def _abs_files(self) -> dict[int, str]:
        return {
            int(s): str(self.root / rel) for s, rel in self._m["files"].items()
        }

    def _gc(self) -> None:
        # spare current AND previous generation — in-flight plans from
        # this epoch captured the pre-mutation file map (see docstring)
        referenced = set(self._m["files"].values()) | self._prev_files
        for f in (self.root / "data").glob("*.npy"):
            if f"data/{f.name}" not in referenced:
                f.unlink(missing_ok=True)

    # ------------------------------------------------------- driver probe
    def maybe_contains(self, fps: list[bytes]) -> np.ndarray:
        """Driver-side convenience probe (tests / tiny batches): loads
        only the shards the fps actually hit, then drops them."""
        if not fps:
            return np.zeros(0, dtype=bool)
        mat = np.frombuffer(b"".join(fps), dtype=np.uint8).reshape(-1, 20)
        shard, tag, i1, i2 = derive_quads(mat, self.shards, self.nbuckets)
        files = self._abs_files()
        out = np.zeros(len(fps), dtype=bool)
        for s in np.unique(shard):
            t = _load_shard(files.get(int(s)), self.nbuckets)
            mask = shard == s
            b1, b2 = t[i1[mask]], t[i2[mask]]
            tg = tag[mask][:, None]
            out[mask] = ((b1 == tg) | (b2 == tg)).any(axis=1)
        return out

    # ----------------------------------------------------- executor probe
    def shard_col(self, fp_col):
        """The fp-derived shard id as a JVM Column — used to repartition
        probe/mutation input so each task owns whole shards."""
        from pyspark.sql import functions as F

        return (
            F.conv(F.substring(F.hex(fp_col), 1, 4), 16, 10).cast("long")
            % self.shards
        ).cast("int")

    def repartition_by_shard(self, df, fp_col: str = "fp"):
        from pyspark.sql import functions as F

        return df.repartition(
            self.shards, self.shard_col(F.col(fp_col))
        )

    def probe_udf(self, spark):
        """Arrow-batched maybe-seen probe. Ships the FILE MAP (≤shards
        path strings), never an array; the worker loads the shards its
        batch actually contains and caches them process-globally. Under
        ``repartition_by_shard`` each task touches ~1 shard, so per-task
        memory is filter_size/shards regardless of total filter size."""
        from pyspark.sql import functions as SF
        from pyspark.sql import types as ST

        files = self._abs_files()
        sizing = (self.shards, self.nbuckets)

        @SF.pandas_udf(ST.BooleanType())
        def _maybe_seen(fps: pd.Series) -> pd.Series:
            shards, nbuckets = sizing
            blobs = [bytes(v) for v in fps]
            if not blobs:
                return pd.Series(np.zeros(0, dtype=bool))
            mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, 20)
            shard, tag, i1, i2 = derive_quads(mat, shards, nbuckets)
            out = np.zeros(len(blobs), dtype=bool)
            for s in np.unique(shard):
                t = _load_shard(files.get(int(s)), nbuckets)
                mask = shard == s
                b1, b2 = t[i1[mask]], t[i2[mask]]
                tg = tag[mask][:, None]
                out[mask] = ((b1 == tg) | (b2 == tg)).any(axis=1)
            return pd.Series(out)

        return _maybe_seen

    # -------------------------------------------------- owner-side mutate
    def _mutate(self, df, fp_col: str, op: str) -> int:
        """Shared absorb/delete machinery: repartition fps to their shard
        owner, owner mutates a COPY of its shard array and writes a new
        content-addressed file; driver gets (shard, count, relpath)."""
        files = self._abs_files()
        sizing = (self.shards, self.nbuckets)
        data_dir = str(self.root / "data")

        def mutate_partition(rows):
            shards, nbuckets = sizing
            by_shard: dict[int, list[bytes]] = {}
            for r in rows:
                fp = bytes(r[0])
                s = int((fp[0] << 8 | fp[1]) % shards)
                by_shard.setdefault(s, []).append(fp)
            for s, fps in by_shard.items():
                t = _load_shard(files.get(s), nbuckets).copy()
                mat = np.frombuffer(b"".join(fps), dtype=np.uint8).reshape(
                    -1, 20
                )
                _, tag, i1, i2 = derive_quads(mat, shards, nbuckets)
                n = 0
                for tg, a, b in zip(tag.tolist(), i1.tolist(), i2.tolist()):
                    if op == "insert":
                        shard_insert(t, nbuckets, tg, a, b)
                        n += 1
                    else:
                        n += bool(shard_delete(t, tg, a, b))
                name = f"s{s:05d}_{uuid.uuid4().hex[:8]}.npy"
                np.save(os.path.join(data_dir, name), t)
                yield (s, n, f"data/{name}")

        parts = (
            self.repartition_by_shard(df.select(fp_col), fp_col)
            .rdd.mapPartitions(mutate_partition)
            .collect()
        )
        total = 0
        prev = set(self._m["files"].values())
        for s, n, rel in parts:
            self._m["files"][str(s)] = rel
            total += n
        if parts:
            self._prev_files = prev
            self._m["n_added"] += total if op == "insert" else -total
            self._swap_manifest()
            self._gc()
        return total

    def absorb_df(self, df, fp_col: str = "fp") -> int:
        """Insert every fp in ``df`` shard-owner-side; returns the count
        (doubles as the fresh-row count, like ShardedCuckoo.absorb_df).
        Raises RuntimeError when a shard exceeds capacity — the engine's
        recovery rebuilds at 2× (build_disk_cuckoo_from_df)."""
        return self._mutate(df, fp_col, "insert")

    def delete_df(self, df, fp_col: str = "fp") -> int:
        """Remove one stored copy per fp, shard-owner-side; no
        fingerprint and no tag array ever reaches the driver."""
        return self._mutate(df, fp_col, "delete")


def build_disk_cuckoo_from_df(
    spark,
    root: str,
    df,
    fp_col: str = "fp",
    capacity: int = 1_000_000,
    shards: int = 32,
) -> DiskShardedCuckoo:
    """Distributed build/rebuild: wipe the manifest to the new sizing and
    absorb everything shard-owner-side. Used for resume (rebuild from the
    committed url_seen) and saturation regrow (2× capacity)."""
    out = DiskShardedCuckoo(spark, root, capacity, shards)
    prev = set(out._m["files"].values())
    out._m = {
        "capacity": capacity,
        "shards": shards,
        "nbuckets": cuckoo_nbuckets(capacity, shards),
        "n_added": 0,
        "files": {},
    }
    out._prev_files = prev  # rebuild races the same in-flight plans
    out._swap_manifest()
    out._gc()
    out.absorb_df(df, fp_col)
    return out


__all__ = ["DiskShardedCuckoo", "build_disk_cuckoo_from_df"]
