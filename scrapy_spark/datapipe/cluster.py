"""Near-duplicate CLUSTERING: connected components over dup pairs and
canonical-representative selection — the step a real training-data
pipeline runs after MinHash/SimHash pair generation (keep one document
per duplicate cluster, drop the rest).

Pair generators (dedup.py) emit edges (id_a, id_b); transitive closure
groups them into clusters: if A~B and B~C, all three are one cluster
even when (A, C) never met a band bucket together.

Algorithm — the "filtering" structure (Lattanzi et al., "Filtering: a
method for solving graph problems in MapReduce", SPAA'11 — public),
specialized for dup graphs, which are tiny relative to the corpus
(only docs that ever met a band bucket appear at all):

1. **Small edge set** (≤ ``small_graph_edges``, default 4M ≈ 64 MB of
   id pairs): ONE single-task union-find over the coalesced edges —
   exact, converges by construction, no iteration, no per-round
   shuffles. This is the path every realistic dup graph takes: even a
   10^10-row corpus with 1% near-dup rate yields ~10^8 edges, and one
   shrink pass (below) brings that under the threshold.
2. **Large edge set**: one distributed SHRINK pass — ``mapInPandas``
   union-find per partition replaces each partition's edges with
   (node, local-representative) star edges, an exact connectivity-
   preserving contraction bounded by the partition's node count. Dup
   graphs contract brutally here (band-bucket cliques collapse to
   stars). If the contracted edges fit, finish with path 1.
3. **Still large after shrink** (adversarial: every edge crosses
   partitions): fall back to min-label propagation with pointer
   jumping — each round every node takes min(own label, neighbors'
   labels, label-of-its-label); rounds = O(log diameter) (path
   doubling, same family as Kiveris et al., "Connected Components in
   MapReduce and Beyond" — public). Each round materializes once via
   eager localCheckpoint (cuts lineage, and the fixpoint count() reads
   computed rows). ``max_iter`` here is a CORRECTNESS bound: exhausting
   it with labels still changing raises instead of returning
   silently-unconverged (wrong) labels that would poison a
   dedup-delete list.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one union-find task handles this many edges comfortably (~16 B/edge
# in the arrays + dict overhead ⇒ well under 1 GB at 4M)
SMALL_GRAPH_EDGES = 1 << 22
# shrink-pass parallelism: aim for ~2M edges per local union-find task
EDGES_PER_PARTITION = 1 << 21


class _UnionFind:
    """Plain union-find with path compression + union by size; also
    tracks the MINIMUM member id per set so components get the same
    canonical label (min reachable id) the distributed loop produces.
    Id-type generic: works on any orderable ids (longs, string
    image_ids) — ``min`` on ASCII strings agrees with Spark's binary
    string ordering."""

    __slots__ = ("parent", "size", "mini")

    def __init__(self) -> None:
        self.parent: dict = {}
        self.size: dict = {}
        self.mini: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            self.mini[x] = x
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]
        self.mini[ra] = min(self.mini[ra], self.mini[rb])

    def absorb(self, pdf_iter: Iterator[pd.DataFrame]) -> None:
        for pdf in pdf_iter:
            # .tolist() yields native Python scalars (int/str) so union
            # keys stay hashable + orderable regardless of Arrow dtype
            for a, b in zip(pdf["a"].tolist(), pdf["b"].tolist()):
                self.union(a, b)

    def labels(self) -> pd.DataFrame:
        ids = list(self.parent)
        comps = [self.mini[self.find(x)] for x in ids]
        # object dtype: Arrow casts to the declared schema type (long or
        # string) and handles the empty-partition case uniformly
        return pd.DataFrame(
            {
                "id": pd.Series(ids, dtype="object"),
                "comp": pd.Series(comps, dtype="object"),
            }
        )


def _uf_finish(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Single-task exact CC: union-find over all edges → (id, comp)."""
    uf = _UnionFind()
    uf.absorb(pdf_iter)
    yield uf.labels()


def _uf_shrink(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Partition-local contraction: edges → (node, local-rep) star
    edges, dropping self-loops. Same connectivity, ≤ nodes−1 edges."""
    uf = _UnionFind()
    uf.absorb(pdf_iter)
    lab = uf.labels().rename(columns={"id": "a", "comp": "b"})
    yield lab[lab["a"] != lab["b"]]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """→ (id, comp): every node appearing in ``pairs``, labeled with the
    MINIMUM node id reachable from it (the canonical cluster id).

    Deterministic, order-independent, EXACT on every path (module
    docstring: single-task union-find / shrink-then-finish / pointer-
    jumping loop). Raises RuntimeError only on the adversarial loop
    path if ``max_iter`` rounds pass without convergence — unconverged
    labels are WRONG labels, never returned."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # id-type generic: the union-find schemas mirror the input id type
    id_t = pairs.schema[src].dataType.simpleString()
    edge_schema = f"a {id_t}, b {id_t}"
    cc_schema = f"id {id_t}, comp {id_t}"
    # the eager checkpoint makes this count read materialized rows
    n_edges = edges.count()
    if n_edges == 0:
        return edges.select(
            F.col("a").alias("id"), F.col("b").alias("comp")
        ).limit(0)

    if n_edges > small_graph_edges:
        # distributed shrink: per-partition union-find contraction
        n_parts = max(2, n_edges // EDGES_PER_PARTITION)
        edges = (
            edges.repartition(n_parts)
            .mapInPandas(_uf_shrink, schema=edge_schema)
            .localCheckpoint(eager=True)
        )
        n_edges = edges.count()

    if n_edges <= small_graph_edges:
        # exact single-task finish; node ids of the original graph all
        # survive contraction (every node appears in its star edge or
        # was already a representative reachable from one)
        return edges.coalesce(1).mapInPandas(_uf_finish, schema=cc_schema)

    return _label_propagation_cc(edges, max_iter)


def _label_propagation_cc(edges: DataFrame, max_iter: int) -> DataFrame:
    """Pointer-jumping min-label propagation — the huge-graph fallback
    (module docstring step 3). ``edges`` must be materialized."""
    edges = (
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    changed = -1
    for _ in range(max_iter):
        # min over neighbors' current labels
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("comp").alias("nmin"))
        )
        # min over label-of-label (pointer jump): comp values are node
        # ids, so self-join labels on comp == id to hop one level up
        hop = labels.select(
            F.col("id").alias("comp"), F.col("comp").alias("jmp")
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .join(hop, "comp", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"),
                    F.coalesce(F.col("nmin"), F.col("comp")),
                    F.coalesce(F.col("jmp"), F.col("comp")),
                ).alias("new_comp"),
                F.col("comp"),
            )
            # one materialization per round: cuts lineage AND lets the
            # fixpoint count reuse the computed rows
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_comp") != F.col("comp")).count()
        labels = updated.select("id", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — raise max_iter; returning "
            "unconverged labels would corrupt downstream dedup decisions"
        )
    return labels


def cluster_representatives(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """→ (doc_id, rep_id) for every document in any dup pair: rep_id is
    the minimum doc_id of its transitive cluster. Rows with
    doc_id == rep_id are the keepers; everything else is droppable —
    joining this back to the corpus with ``doc_id != rep_id`` is the
    dedup-delete list."""
    cc = connected_components(pairs, src=src, dst=dst)
    return cc.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("rep_id")
    )


__all__ = ["connected_components", "cluster_representatives"]
