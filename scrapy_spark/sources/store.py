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
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: delete-delta chain length that triggers a base rewrite (merge-on-read
#: compaction, the Iceberg RewriteDataFiles analog). Epoch commit cost is
#: O(batch); compaction cost is bounded by the files that actually
#: contain deleted rows (see ``ParquetStore._compact``).
COMPACT_EVERY = 8

#: above this many base+insert data dirs, compaction falls back to a full
#: rewrite instead of the file-selective path — bounds manifest growth and
#: per-read file fan-in on long-running crawls.
MAX_BASE_FILES = 64


def _commit_pool():
    """Thread pool for intra-commit materializations (parquet writes /
    eager checkpoints of INDEPENDENT tables). Spark's scheduler accepts
    concurrent job submissions from driver threads; overlapping them
    turns the commit's per-table fixed cost (job launch + small write)
    from a sum into a max — on a cluster this is the same win, since
    each table's job is tiny and the launches dominate."""
    from concurrent.futures import ThreadPoolExecutor

    return ThreadPoolExecutor(max_workers=8)


def _key_cols(key) -> list[str]:
    """Normalize a mutate-table key (str or list of column names) to a
    list — anti-joins, selects, and manifests all take the list form."""
    return [key] if isinstance(key, str) else list(key)


class Store:
    """Interface: read current table versions, commit an epoch atomically.

    ``mutate`` tables are keyed row stores committed as DELTAS — per-epoch
    (delete-keys, insert-rows) pairs resolved lazily on read as
    ``(base ∪ inserts) LEFT ANTI deletes`` — valid because keys are never
    re-inserted after deletion. The key may be COMPOSITE (a list of
    columns): callers whose logical key CAN be re-inserted (url_seen's
    ``fp`` after TTL expiry + recrawl) must delete on a generation-aware
    composite key — ``(fp, epoch_added)`` — so a stale delete delta can
    never match a row re-inserted later with a fresh generation
    (the Iceberg sequence-number-scoped equality-delete analog; a bare-fp
    delete would silently clobber every future re-insert of that fp).
    Frontier ``seq`` keys are globally unique so the single-column form
    stays valid there.
    This is what keeps a 10^10-row frontier commit O(popped + new_links)
    instead of a full-table rewrite per epoch (Iceberg MOR equality
    deletes; compaction every COMPACT_EVERY epochs bounds read fan-in).

    Compaction is FILE-SELECTIVE (the Iceberg positional-delete analog,
    RewriteDataFiles with delete-file scoping): accumulated delete keys
    are first localized to the data files that actually contain them — a
    key-column-only scan (column pruning makes this read one column plus
    file-path metadata, orders of magnitude cheaper than a rewrite) —
    then only the HIT files are rewritten; untouched files survive
    path-stable and byte-identical. This matters because frontier files
    have a lifecycle: pops drain high-priority (old/shallow) rows first,
    so most epochs' insert files are never touched by deletes and a
    hash-bucket rewrite (which every priority-ordered pop batch would
    smear across all buckets) degenerates to a full rewrite, while
    file-level scoping does not. Equality-delete full rewrite remains
    the fallback once file fan-in exceeds ``MAX_BASE_FILES``."""

    def read(self, name: str) -> DataFrame | None:
        raise NotImplementedError

    def commit(
        self,
        epoch: int,
        replace: dict[str, DataFrame],
        append: dict[str, DataFrame],
        scalars: dict,
        mutate: dict[str, tuple[str, DataFrame, DataFrame]] | None = None,
        resolved: dict[str, DataFrame] | None = None,
    ) -> None:
        """``mutate[name] = (key_col, delete_keys_df, insert_df)``.

        ``resolved[name]`` optionally carries the caller's already-computed
        post-mutation table (the engine builds frontier_next for its stats
        anyway). Stores MAY use it instead of re-resolving the delta chain
        — ParquetStore writes it at compaction time, MemoryStore (the
        volatile bench store) checkpoints it directly. It MUST equal
        resolve(base, deltas); the durability contract still rides on the
        deltas."""
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
        entry = self._manifest["tables"].get(name)
        if not entry:
            return None
        if isinstance(entry, list):  # plain replace/append table
            # mergeSchema: an append-evolved table (e.g. http_cache
            # gaining the RFC 9111 freshness columns) mixes file schemas
            # across epochs; the default single-footer inference would
            # silently DROP the new columns whenever an old file's
            # footer wins. Footer merging is per-file metadata only —
            # no data reads — and these tables are epoch-append-scale.
            return self.spark.read.option("mergeSchema", "true").parquet(*entry)
        return self._resolve(entry)

    def _resolve(self, entry: dict) -> DataFrame:
        """Merge-on-read for a mutate table: (base ∪ inserts) anti deletes."""
        df = self.spark.read.option("mergeSchema", "true").parquet(
            *(entry["base"] + entry.get("ins", []))
        )
        if entry.get("dels"):
            dels = self.spark.read.parquet(*entry["dels"])
            df = df.join(F.broadcast(dels), _key_cols(entry["key"]), "left_anti")
        return df

    def _write(self, epoch: int, name: str, df: DataFrame) -> str:
        out = self.root / "data" / name / f"e{epoch:06d}_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(str(out))
        return str(out)

    def _compact(self, epoch: int, name: str, entry: dict, src=None) -> dict:
        """File-selective merge-on-read compaction (Iceberg positional-
        delete analog; ref JOBDIR persistence has no equivalent — this is
        the scale structure the round-2 plan audit asked for).

        1. Localize the accumulated delete keys to the data dirs that
           contain them: a scan reading ONLY the key column + file-path
           metadata, joined (broadcast) with the delete keys.
        2. Rewrite ONLY the hit dirs (their survivors merge into one new
           dir); untouched dirs carry over path-stable — their part
           files are never re-read or re-written.
        3. Fallback: above MAX_BASE_FILES dirs, do the classic full
           rewrite (from the caller's resolved hint when given), which
           also bounds per-read file fan-in."""
        key = entry["key"]
        kcols = _key_cols(key)
        files = entry["base"] + entry["ins"]
        if not entry["dels"] or not files:
            return {"key": key, "base": files, "dels": [], "ins": []}
        if len(files) > MAX_BASE_FILES:
            if src is None:
                src = self._resolve(entry)
            return {"key": key, "base": [self._write(epoch, name, src)],
                    "dels": [], "ins": []}
        dels = self.spark.read.parquet(*entry["dels"]).select(*kcols).distinct()
        hit_parts = (
            self.spark.read.parquet(*files)
            .select(*kcols, F.input_file_name().alias("__part"))
            .join(F.broadcast(dels), kcols, "left_semi")
            .select("__part")
            .distinct()
            .collect()
        )
        by_resolved = {str(pathlib.Path(f).resolve()): f for f in files}
        hit_dirs = set()
        for row in hit_parts:
            part = urllib.parse.unquote(urllib.parse.urlparse(row[0]).path)
            d = str(pathlib.Path(part).parent.resolve())
            if d in by_resolved:
                hit_dirs.add(by_resolved[d])
        base = [f for f in files if f not in hit_dirs]
        if hit_dirs:
            survivors = self.spark.read.parquet(*sorted(hit_dirs)).join(
                F.broadcast(dels), kcols, "left_anti"
            )
            base.append(self._write(epoch, name, survivors))
        return {"key": key, "base": base, "dels": [], "ins": []}

    def commit(self, epoch, replace, append, scalars, mutate=None, resolved=None) -> None:
        # All per-table parquet writes are independent — run them
        # CONCURRENTLY so the commit's wall time is the slowest write, not
        # the sum (the serial loop was pure per-epoch Amdahl cost: each
        # write is a full Spark job and a commit touches 5–8 tables).
        # Atomicity is untouched: the manifest swap below remains the
        # single commit point; a failed write raises before the swap and
        # leaves only orphan dirs, exactly like the serial path.
        writes: dict[tuple, object] = {}
        with _commit_pool() as ex:
            for name, df in replace.items():
                writes[("r", name)] = ex.submit(self._write, epoch, name, df)
            for name, df in append.items():
                # MOR tables record appends as inserts (dir name cosmetic)
                is_mor = isinstance(
                    self._manifest["tables"].get(name), dict
                ) and name not in replace
                writes[("a", name)] = ex.submit(
                    self._write, epoch, name + ("_ins" if is_mor else ""), df
                )
            for name, (key, dels, ins) in (mutate or {}).items():
                writes[("d", name)] = ex.submit(
                    self._write, epoch, f"{name}_del", dels
                )
                writes[("i", name)] = ex.submit(
                    self._write, epoch, f"{name}_ins", ins
                )
            paths = {k: f.result() for k, f in writes.items()}
        tables = dict(self._manifest["tables"])
        for name, df in replace.items():
            tables[name] = [paths[("r", name)]]
        for name, df in append.items():
            # caller guarantees df is non-empty (skip-empty handled upstream)
            prev = tables.get(name)
            if isinstance(prev, dict):
                # table already merge-on-read (e.g. url_seen after an
                # expiry commit): appends are MOR inserts — list(prev)
                # here would have silently flattened the dict to its keys
                entry = {k: list(v) if isinstance(v, list) else v
                         for k, v in prev.items()}
                entry["ins"] = entry["ins"] + [paths[("a", name)]]
                tables[name] = entry
            else:
                tables[name] = list(prev or []) + [paths[("a", name)]]
        for name, (key, dels, ins) in (mutate or {}).items():
            prev = tables.get(name)
            if isinstance(prev, list):  # promote a replace-table to MOR
                entry = {"key": key, "base": prev, "dels": [], "ins": []}
            else:
                entry = {k: list(v) if isinstance(v, list) else v
                         for k, v in (prev or {"key": key, "base": [],
                                               "dels": [], "ins": []}).items()}
            entry["dels"].append(paths[("d", name)])
            entry["ins"].append(paths[("i", name)])
            if len(entry["dels"]) >= COMPACT_EVERY:
                entry = self._compact(epoch, name, entry, (resolved or {}).get(name))
            tables[name] = entry
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
        # mutate tables: name → (key_col, base, [delete dfs], [insert dfs])
        self._mor: dict[str, tuple[str, DataFrame, list, list]] = {}
        self._epoch = -1
        self._scalars: dict = {}

    @property
    def epoch(self) -> int:
        return self._epoch

    @property
    def scalars(self) -> dict:
        return self._scalars

    def read(self, name: str) -> DataFrame | None:
        if name in self._mor:
            return self._resolve_mor(*self._mor[name])
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

    @staticmethod
    def _resolve_mor(key, base, dels, ins) -> DataFrame:
        df = base
        for i in ins:
            df = df.unionByName(i)
        if dels:
            d = dels[0]
            for extra in dels[1:]:
                d = d.unionByName(extra)
            df = df.join(F.broadcast(d), _key_cols(key), "left_anti")
        return df

    def commit(self, epoch, replace, append, scalars, mutate=None, resolved=None) -> None:
        # materialize every table's checkpoint CONCURRENTLY (independent
        # jobs; see _commit_pool) — the serial loop paid one full job
        # launch per table per epoch
        ckpt: dict[tuple, object] = {}
        with _commit_pool() as ex:
            for name, df in replace.items():
                ckpt[("r", name)] = ex.submit(df.localCheckpoint, True)
            for name, df in append.items():
                ckpt[("a", name)] = ex.submit(df.localCheckpoint, True)
            for name, (key, dels, ins) in (mutate or {}).items():
                src = (resolved or {}).get(name)
                if src is not None:
                    ckpt[("s", name)] = ex.submit(src.localCheckpoint, True)
                else:
                    ckpt[("d", name)] = ex.submit(dels.localCheckpoint, True)
                    ckpt[("i", name)] = ex.submit(ins.localCheckpoint, True)
            done = {k: f.result() for k, f in ckpt.items()}
        for name, df in replace.items():
            self._tables[name] = done[("r", name)]
            self._parts.pop(name, None)  # replace resets any deltas
            self._mor.pop(name, None)
        for name, df in append.items():
            ck = done[("a", name)]
            if name in self._mor:
                # MOR tables absorb appends as inserts — reads of a MOR
                # table never consult _parts, so parking the delta there
                # would silently drop committed rows
                k, base, dl, il = self._mor[name]
                self._mor[name] = (k, base, dl, il + [ck])
            else:
                self._parts.setdefault(name, []).append(ck)
        for name, (key, dels, ins) in (mutate or {}).items():
            src = (resolved or {}).get(name)
            if src is not None:
                # volatile bench store: the caller's resolved table is
                # checkpointed directly — one materialization per epoch,
                # no delta chain to re-read (the MOR durability story is
                # ParquetStore's; this store measures the scheduling core)
                self._tables[name] = done[("s", name)]
                self._parts.pop(name, None)  # resolved subsumes deltas
                self._mor.pop(name, None)
                continue
            if name in self._mor:
                k, base, dl, il = self._mor[name]
            else:
                # promote to merge-on-read, folding BOTH the replace base
                # and any appended deltas (url_seen has a replaced
                # bootstrap base + per-epoch appends — dropping _parts
                # here would silently lose committed rows)
                pieces = []
                if name in self._tables:
                    pieces.append(self._tables.pop(name))
                pieces += self._parts.pop(name, [])
                base = pieces[0]
                for p in pieces[1:]:
                    base = base.unionByName(p)
                k, dl, il = key, [], []
            dl = dl + [done[("d", name)]]
            il = il + [done[("i", name)]]
            if len(dl) >= COMPACT_EVERY:
                base = self._resolve_mor(k, base, dl, il).localCheckpoint(eager=True)
                dl, il = [], []
            self._mor[name] = (k, base, dl, il)
        self._epoch = epoch
        self._scalars = scalars
