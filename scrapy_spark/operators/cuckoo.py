"""Sharded cuckoo filter: the url_seen probe structure with DELETION
(SURVEY §4.3.2; the north_rule's "partitioned bloom-filter/cuckoo-filter
structure" — this is the cuckoo half).

Why a second filter when the bloom works: a bloom cannot delete. Any
recrawl/expiry policy (drop a URL from the seen set so it re-enters the
frontier after its TTL) needs per-key removal, which cuckoo filters give
at comparable space (~2.1 B/key at 16-bit tags vs ~1.8 B/key for a
1e-3-FPR bloom) AND a lower false-positive rate (2·b·2^-16 ≈ 1.2e-4 at
b=4 slots). Algorithm is the public partial-key cuckoo hashing design
(Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter: Practically
Better than Bloom", CoNEXT'14).

Layout mirrors ``operators/bloom.py``: ``shards`` independent filters
indexed by ``fp[:2] % shards`` — the same salted-hash bucketing the
url_seen table uses, so on a cluster each executor holds only its own
shards. Within a shard: ``nbuckets`` (power of two) buckets × ``b=4``
uint16 tag slots, tag 0 = empty. For a 20-byte SHA1 request fingerprint
(already uniform — no rehash needed):

    shard = (fp[0] << 8 | fp[1]) % shards
    tag   = fp[2:4] as u16, forced nonzero
    i1    = fp[4:12] as u64  % nbuckets
    i2    = i1 XOR (tag * 0x5bd1e995) % nbuckets     (partial-key kick)

The i1/i2 pair is recoverable from (bucket, tag) alone — the property
that makes eviction (and the distributed build below) work without the
original key.

Distributed build: unlike bloom bit-arrays, two independently built
cuckoo filters canNOT be OR-merged (slot collisions). Instead
``build_cuckoo_from_df`` repartitions fps BY SHARD so each shard's
filter is built wholly inside one task, then merges by taking each
shard's single owner — conflict-free by construction, and exactly the
layout a cluster deployment wants (executor owns shard ⇒ build where
the data lands, ship only the small tag arrays). The driver never sees
a fingerprint, only (shards × nbuckets × 4) uint16 arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TAG_MUL = np.uint64(0x5BD1E995)  # public MurmurHash2 multiplier

SLOTS = 4
MAX_KICKS = 500


# --------------------------------------------------------- shard-level ops
# Pure functions over ONE shard's (nbuckets, SLOTS) uint16 tag array —
# shared by the driver-resident ShardedCuckoo and the executor-resident
# DiskShardedCuckoo (operators/diskfilter.py), which must be bit-identical.
def derive_quads(
    mat: np.ndarray, shards: int, nbuckets: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(n, 20) uint8 fp matrix → (shard, tag u16≠0, i1, i2) arrays."""
    nb = np.uint64(nbuckets)
    shard = (
        (mat[:, 0].astype(np.uint64) << np.uint64(8)) | mat[:, 1]
    ) % np.uint64(shards)
    tag = mat[:, 2:4].copy().view(np.uint16).reshape(-1)
    tag = np.where(tag == 0, np.uint16(1), tag)
    i1 = (mat[:, 4:12].copy().view(np.uint64).reshape(-1)) % nb
    i2 = i1 ^ ((tag.astype(np.uint64) * _TAG_MUL) % nb)
    return shard.astype(np.int64), tag, i1.astype(np.int64), i2.astype(np.int64)


def _alt_bucket(tag: int, idx: int, nbuckets: int) -> int:
    return int(
        np.uint64(idx) ^ ((np.uint64(tag) * _TAG_MUL) % np.uint64(nbuckets))
    )


def shard_insert(t: np.ndarray, nbuckets: int, tag: int, i1: int, i2: int) -> None:
    """Insert one tag into a shard array (partial-key kicks); raises
    RuntimeError when MAX_KICKS evictions fail to find a home."""
    for idx in (i1, i2):
        free = np.nonzero(t[idx] == 0)[0]
        if free.size:
            t[idx, free[0]] = tag
            return
    idx, cur = i1, tag
    for kick in range(MAX_KICKS):
        victim_slot = kick % SLOTS
        cur, t[idx, victim_slot] = int(t[idx, victim_slot]), cur
        idx = _alt_bucket(cur, idx, nbuckets)
        free = np.nonzero(t[idx] == 0)[0]
        if free.size:
            t[idx, free[0]] = cur
            return
    raise RuntimeError(
        f"cuckoo shard over capacity ({MAX_KICKS} kicks exhausted) — size "
        "the filter to the committed seen count before absorbing (engine "
        "regrow does this)"
    )


def shard_delete(t: np.ndarray, tag: int, i1: int, i2: int) -> bool:
    """Remove ONE stored copy of the tag from either home; True if hit."""
    for idx in (i1, i2):
        hit = np.nonzero(t[idx] == tag)[0]
        if hit.size:
            t[idx, hit[0]] = 0
            return True
    return False


def cuckoo_nbuckets(capacity: int, shards: int) -> int:
    """The sizing rule shared by every cuckoo variant: 95% load factor at
    b=4 slots, buckets rounded up to a power of two."""
    per = max(1024, capacity // shards)
    want = int(per / (SLOTS * 0.95))
    return 1 << max(8, (want - 1).bit_length())


class ShardedCuckoo:
    """Partitioned cuckoo filter over 20-byte request fingerprints.

    Duck-type-compatible with ``ShardedBloom`` where the dedupe path
    cares (``n_added``, ``capacity``, ``probe_udf``, ``absorb_df``,
    ``maybe_contains``) and adds ``delete_many`` / ``delete_df``.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, shards: int = 32):
        self.capacity = capacity
        self.shards = shards
        # 95% load factor is the b=4 cuckoo sweet spot; buckets a power
        # of two so i2 = i1 ^ h(tag) stays in range for free
        self.nbuckets = cuckoo_nbuckets(capacity, shards)
        self.tags = np.zeros(
            (shards, self.nbuckets, self.SLOTS), dtype=np.uint16
        )
        self.n_added = 0

    # ------------------------------------------------------------ hashing
    @staticmethod
    def _fp_matrix(fps: list[bytes]) -> np.ndarray:
        return np.frombuffer(b"".join(fps), dtype=np.uint8).reshape(-1, 20)

    def _derive(
        self, mat: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(n, 20) uint8 → (shard, tag u16≠0, i1, i2) arrays."""
        return derive_quads(mat, self.shards, self.nbuckets)

    def _alt(self, tag: np.ndarray, idx: np.ndarray) -> np.ndarray:
        nb = np.uint64(self.nbuckets)
        alt = idx.astype(np.uint64) ^ (
            (tag.astype(np.uint64) * _TAG_MUL) % nb
        )
        return alt.astype(np.int64)

    # ------------------------------------------------------------ mutation
    def _insert_one(self, shard: int, tag: int, i1: int, i2: int) -> bool:
        shard_insert(self.tags[shard], self.nbuckets, tag, i1, i2)
        return True

    def add_many(self, fps: list[bytes]) -> None:
        if not fps:
            return
        shard, tag, i1, i2 = self._derive(self._fp_matrix(fps))
        for s, tg, a, b in zip(
            shard.tolist(), tag.tolist(), i1.tolist(), i2.tolist()
        ):
            self._insert_one(s, tg, a, b)
        self.n_added += len(fps)

    def delete_many(self, fps: list[bytes]) -> int:
        """Remove ONE stored copy of each fp found; returns #removed.
        (The cuckoo-filter contract: only delete keys that were added,
        which the url_seen table guarantees — fps are unique there.)"""
        if not fps:
            return 0
        return self._delete_derived(*self._derive(self._fp_matrix(fps)))

    def _delete_derived(self, shard, tag, i1, i2) -> int:
        removed = 0
        for s, tg, a, b in zip(
            shard.tolist(), tag.tolist(), i1.tolist(), i2.tolist()
        ):
            if shard_delete(self.tags[s], tg, a, b):
                removed += 1
        self.n_added -= removed
        return removed

    # ------------------------------------------------------------- probing
    def maybe_contains(self, fps: list[bytes]) -> np.ndarray:
        """Vectorized membership: True = maybe seen (FPR ≈ 2·b·2^-16)."""
        if not fps:
            return np.zeros(0, dtype=bool)
        shard, tag, i1, i2 = self._derive(self._fp_matrix(fps))
        # gather both candidate buckets for every probe in one fancy-index
        b1 = self.tags[shard, i1]  # (n, SLOTS)
        b2 = self.tags[shard, i2]
        t = tag[:, None]
        return ((b1 == t) | (b2 == t)).any(axis=1)

    # ------------------------------------------------------- executor side
    def probe_udf(self, spark):
        """Arrow-batched maybe-seen probe on the executors against a
        broadcast of the tag arrays (same shape as the bloom probe: the
        epoch loop never collects a fingerprint to the driver)."""
        from pyspark.sql import functions as SF
        from pyspark.sql import types as ST

        bc = spark.sparkContext.broadcast(
            (self.tags, self.nbuckets, self.shards)
        )

        @SF.pandas_udf(ST.BooleanType())
        def _maybe_seen(fps: pd.Series) -> pd.Series:
            probe = ShardedCuckoo.__new__(ShardedCuckoo)
            probe.tags, probe.nbuckets, probe.shards = bc.value
            return pd.Series(probe.maybe_contains([bytes(v) for v in fps]))

        return _maybe_seen

    def absorb_df(self, df, fp_col: str = "fp") -> int:
        """Insert every fp in ``df`` without collecting fingerprints:
        build a same-layout filter distributed (each shard inside one
        task), then splice the newly built shards into this filter by
        re-inserting their tags — (bucket, tag) is enough to re-insert
        (partial-key property), so no fingerprint travels. Returns the
        number of fps absorbed."""
        built = build_cuckoo_from_df(
            df, fp_col=fp_col, capacity=self.capacity, shards=self.shards
        )
        if built.n_added == 0:
            return 0
        if self.n_added == 0 and built.nbuckets == self.nbuckets:
            self.tags = built.tags
            self.n_added = built.n_added
            return built.n_added
        self._splice(built)
        return built.n_added

    def _splice(self, built: "ShardedCuckoo") -> None:
        """Merge a same-layout filter's tags into this one in place."""
        if built.nbuckets != self.nbuckets:  # layout changed (regrow):
            raise RuntimeError(  # no home to reuse
                "absorb_df into a differently-sized cuckoo: rebuild "
                "via build_cuckoo_from_df instead"
            )
        for s in range(self.shards):
            # vectorized bucket merge: order within a bucket never matters
            # (lookup scans all 4 slots), so any bucket whose combined
            # occupancy fits in SLOTS packs in one numpy pass — the per-tag
            # kick loop runs only for the rare over-full buckets. The old
            # tag-at-a-time splice was a serial driver loop over every
            # fresh row, i.e. per-epoch Amdahl cost linear in batch size.
            mine, new = self.tags[s], built.tags[s]
            n_new = int(np.count_nonzero(new))
            if n_new == 0:
                continue
            fits = (
                np.count_nonzero(mine, axis=1) + np.count_nonzero(new, axis=1)
                <= self.SLOTS
            )
            merged = np.concatenate([mine, new], axis=1)  # (nb, 2*SLOTS)
            order = np.argsort(merged == 0, axis=1, kind="stable")
            packed = np.take_along_axis(merged, order, axis=1)
            mine[fits] = packed[fits, : self.SLOTS]
            for idx in np.nonzero(~fits)[0].tolist():
                row = new[idx]
                for tg in row[row != 0].tolist():
                    b = _alt_bucket(tg, idx, self.nbuckets)
                    self._insert_one(s, tg, idx, b)
        self.n_added += built.n_added

    def delete_df(self, df, fp_col: str = "fp") -> int:
        """Distributed delete: executors derive (shard, tag, i1, i2) per
        partition and only those int quads reach the driver (never a raw
        fingerprint), which then mutates its tag arrays in place —
        deletion is inherently an owner-side op; on a cluster each
        executor deletes from its own shards."""
        # capture ONLY the sizing ints — touching `self` inside the
        # closure would pickle the whole filter (shards × nbuckets × 4
        # uint16 tags) into every task, defeating the quads-only design
        sizing = (self.capacity, self.shards, self.nbuckets)

        def derive_quads(rows):
            local = ShardedCuckoo.__new__(ShardedCuckoo)
            local.capacity, local.shards, local.nbuckets = sizing
            fps = [bytes(r[0]) for r in rows]
            if fps:
                s, t, a, b = local._derive(local._fp_matrix(fps))
                yield (s, t, a, b)

        parts = df.select(fp_col).rdd.mapPartitions(derive_quads).collect()
        removed = 0
        for s, t, a, b in parts:
            removed += self._delete_derived(s, t, a, b)
        return removed


def build_cuckoo_from_df(
    df,
    fp_col: str = "fp",
    capacity: int = 1_000_000,
    shards: int = 32,
) -> ShardedCuckoo:
    """Distributed cuckoo construction: repartition fps by shard id so
    each shard's filter is built WHOLLY inside one task (cuckoo state
    can't be OR-merged the way bloom bits can), then take each shard
    from its single owner. Driver traffic = the tag arrays only."""
    from pyspark.sql import functions as F

    sizing = (capacity, shards)
    with_shard = df.select(fp_col).withColumn(
        "__shard",
        (
            F.conv(F.substring(F.hex(F.col(fp_col)), 1, 4), 16, 10).cast("long")
            % shards
        ).cast("int"),
    )

    def partition_build(rows):
        local = ShardedCuckoo(*sizing)
        fps = [bytes(r[0]) for r in rows]
        if fps:
            local.add_many(fps)
            touched = np.unique(local._derive(local._fp_matrix(fps))[0])
            yield (local.tags, touched, len(fps))

    def merge(a, b):
        tags, touched, n = a
        btags, btouched, bn = b
        tags[btouched] = btags[btouched]
        return (tags, np.concatenate([touched, btouched]), n + bn)

    out = ShardedCuckoo(*sizing)
    parts = (
        with_shard.repartition(shards, "__shard")
        .select(fp_col)
        .rdd.mapPartitions(partition_build)
    )
    try:
        tags, _, n = parts.treeReduce(merge)
    except ValueError:  # empty RDD
        return out
    out.tags = tags
    out.n_added = n
    return out


__all__ = [
    "ShardedCuckoo",
    "build_cuckoo_from_df",
    "derive_quads",
    "shard_insert",
    "shard_delete",
    "cuckoo_nbuckets",
]
