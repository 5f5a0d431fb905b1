"""Near-duplicate CLUSTERING: connected components over dup pairs and
canonical-representative selection — the step a real training-data
pipeline runs after MinHash/SimHash pair generation (keep one document
per duplicate cluster, drop the rest).

Pair generators (dedup.py) emit edges (id_a, id_b); transitive closure
groups them into clusters: if A~B and B~C, all three are one cluster
even when (A, C) never met a band bucket together.

Algorithm: min-label propagation WITH pointer jumping — each round every
node takes min(own label, neighbors' labels, label-of-its-label);
fixpoint when no label changes. The label-of-label hop halves the
remaining propagation depth each round (the classic pointer-jumping /
path-doubling trick, same convergence family as Kiveris et al.'s
large-star — "Connected Components in MapReduce and Beyond", public),
so rounds = O(log diameter), not diameter: a 1000-node chain converges
in ~10 rounds instead of ~1000. Near-dup graphs are quasi-star-shaped
anyway (band-bucket co-membership), so real corpora finish in 2–3
rounds; the log bound is the adversarial-chain guarantee.

Each round materializes once via an eager localCheckpoint — that both
cuts lineage (the plan would otherwise grow per iteration) and makes
the fixpoint count() read the already-computed rows instead of
recomputing the round's joins a second time.

``max_iter`` is a CORRECTNESS bound, not just a cost cap: exhausting it
with labels still changing means the returned components would be
wrong (they'd poison a dedup-delete list), so the loop raises instead
of returning silently-unconverged labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """→ (id, comp): every node appearing in ``pairs``, labeled with the
    MINIMUM node id reachable from it (the canonical cluster id).

    Deterministic, order-independent; converges in O(log diameter)
    rounds (pointer jumping, module docstring) with an exact fixpoint
    test (count of changed labels — one action per round, same
    discipline as the engine's batched stats). Raises RuntimeError if
    ``max_iter`` rounds pass without convergence — unconverged labels
    are WRONG labels, never returned."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
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
