"""Near-duplicate CLUSTERING: connected components over dup pairs and
canonical-representative selection — the step a real training-data
pipeline runs after MinHash/SimHash pair generation (keep one document
per duplicate cluster, drop the rest).

Pair generators (dedup.py) emit edges (id_a, id_b); transitive closure
groups them into clusters: if A~B and B~C, all three are one cluster
even when (A, C) never met a band bucket together.

Algorithm: iterative min-label propagation over the symmetrized edge
set — each round every node takes min(own label, neighbors' labels);
fixpoint when no label changes. Rounds = graph diameter. For near-dup
clusters this is small by construction (band-bucket co-membership makes
clusters dense, quasi-star-shaped), so the loop runs 2–4 rounds on real
corpora; each round is one shuffle join + one groupBy min. Lineage is
cut with localCheckpoint every few rounds so the plan doesn't grow with
iterations. For adversarial long-chain graphs the O(log n)-round
alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", public) drops into the
same loop shape; documented here as the escalation path rather than
default because per-round cost is higher and dup graphs don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_every: int = 4,
) -> DataFrame:
    """→ (id, comp): every node appearing in ``pairs``, labeled with the
    MINIMUM node id reachable from it (the canonical cluster id).

    Deterministic, order-independent; converges in diameter rounds with
    an exact fixpoint test (count of changed labels — one action per
    round, same discipline as the engine's batched stats)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    for i in range(max_iter):
        # min over self + neighbors' current labels
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("comp").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "new_comp"
                ),
                F.col("comp"),
            )
        )
        changed = updated.filter(F.col("new_comp") != F.col("comp")).count()
        labels = updated.select("id", F.col("new_comp").alias("comp"))
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    edges.unpersist()
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
