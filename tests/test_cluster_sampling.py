"""datapipe/cluster.py + datapipe/sampling.py unit coverage: transitive
closure beyond direct pairs, fixpoint convergence, representative
selection; exact stratified quotas, determinism, two-phase ≡ one-phase."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_spark.datapipe.cluster import (
    cluster_representatives,
    connected_components,
)
from scrapy_spark.datapipe.sampling import sample_stratified


def test_connected_components_transitive_chain(spark):
    # chain 1-2-3-4 (never all pairwise-linked) + island {10, 11}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r.id: r.comp for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cluster_representatives_keep_drop_split(spark):
    pairs = spark.createDataFrame(
        [(5, 7), (7, 9), (2, 3)], "id_a long, id_b long"
    )
    reps = cluster_representatives(pairs).toPandas()
    by_doc = dict(zip(reps.doc_id, reps.rep_id))
    assert by_doc == {5: 5, 7: 5, 9: 5, 2: 2, 3: 2}
    keepers = {d for d, r in by_doc.items() if d == r}
    assert keepers == {5, 2}  # one survivor per cluster


def test_connected_components_long_chain_converges(spark):
    n = 40  # long chain: exercises the fixpoint loop
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = connected_components(pairs).toPandas()
    assert set(out.comp) == {0} and len(out) == n + 1


def test_connected_components_chain_beyond_max_iter_diameter(spark):
    # ADVICE r3: plain min-label propagation needs ~diameter rounds, so a
    # 120-node chain would silently exceed max_iter=50 and return WRONG
    # labels. Pointer jumping converges in O(log d) rounds — a small
    # max_iter must suffice, with exactly-correct labels.
    n = 120
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = connected_components(pairs, max_iter=15).toPandas()
    assert set(out.comp) == {0} and len(out) == n + 1


def test_connected_components_raises_instead_of_wrong_labels(spark):
    # exhausting max_iter with labels still moving must raise, never
    # return unconverged (incorrect) components. The guard lives on the
    # huge-graph label-propagation fallback (small graphs take the
    # always-converging union-find paths), so exercise it directly.
    import pytest

    from scrapy_spark.datapipe.cluster import _label_propagation_cc

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "a long, b long"
    ).localCheckpoint(eager=True)
    with pytest.raises(RuntimeError, match="did not converge"):
        _label_propagation_cc(edges, max_iter=2)


def test_connected_components_shrink_then_finish_path(spark):
    # force the distributed shrink pass (small_graph_edges=0 can't skip
    # it) on a graph spanning partitions: contracted star edges must
    # still close transitively to exact min-id components
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)] + [(500, 501), (501, 502)],
        "id_a long, id_b long",
    ).repartition(8)
    out = connected_components(pairs, small_graph_edges=4).toPandas()
    got = dict(zip(out.id, out.comp))
    assert {got[i] for i in range(n + 1)} == {0}
    assert got[500] == got[501] == got[502] == 500
    assert len(out) == n + 1 + 3


def test_sample_stratified_exact_quotas_and_determinism(spark):
    rows = [(i, f"s{i % 3}") for i in range(100)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    a = sample_stratified(df, ["stratum"], 7, key_col="doc_id", seed="x")
    pdf = a.toPandas()
    counts = pdf.groupby("stratum").size().to_dict()
    # exact quota where the stratum is big enough, whole stratum otherwise
    assert counts == {"s0": 7, "s1": 7, "s2": 7, "tiny": 1}
    # deterministic: identical selection on re-run and under repartition
    b = sample_stratified(
        df.repartition(13), ["stratum"], 7, key_col="doc_id", seed="x"
    ).toPandas()
    assert sorted(pdf.doc_id) == sorted(b.doc_id)
    # different seed → different sample (overwhelmingly likely)
    c = sample_stratified(df, ["stratum"], 7, key_col="doc_id", seed="y").toPandas()
    assert sorted(pdf.doc_id) != sorted(c.doc_id)


def test_sample_stratified_two_phase_equivalent(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(200)], "doc_id long, stratum string"
    ).repartition(8)
    one = sample_stratified(df, ["stratum"], 5, key_col="doc_id", seed="z")
    two = sample_stratified(
        df, ["stratum"], 5, key_col="doc_id", seed="z", two_phase=True
    )
    assert sorted(map(tuple, one.select("doc_id", "stratum", "sample_rank").collect())) == sorted(
        map(tuple, two.select("doc_id", "stratum", "sample_rank").collect())
    )


def test_repetition_stats_hand_computed(spark):
    from scrapy_spark.datapipe.quality import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 lines, one duplicated → dup 1 - 3/4; bigrams of
            # "buy now buy now buy": {"buy now":2, "now buy":2} → top 2/4
            (1, "buy now buy now buy\nunique line\nunique line\nother"),
            (2, "single line no repeats at all"),
            (3, ""),  # empty: no lines, no grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].n_lines == 4 and got[1].dup_line_frac == 0.25
    assert got[1].top_bigram_frac == 0.2222  # "buy now" 2 of 9 bigrams
    assert got[2].dup_line_frac == 0.0
    assert got[2].top_bigram_frac == round(1.0 / 5, 4)  # 5 unique bigrams
    assert got[3].n_lines == 0 and got[3].top_bigram_frac == 0.0


def test_contamination_flags_hand_built(spark):
    from scrapy_spark.datapipe.contamination import contamination_flags

    probe_sent = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"intro text then {probe_sent} and a long tail of words"),
            (2, "completely unrelated content with nothing shared here at all"),
            (3, f"{probe_sent}"),  # exact probe body
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, probe_sent)], "probe_id long, text string"
    )
    got = {
        (r.doc_id, r.probe_id): r.n_shared
        for r in contamination_flags(docs, probes, n=8).collect()
    }
    # probe has 10 tokens → 3 distinct 8-grams; docs 1 and 3 contain all
    assert got == {(1, 100): 3, (3, 100): 3}


def test_contamination_below_n_tokens_never_flags(spark):
    from scrapy_spark.datapipe.contamination import contamination_flags

    docs = spark.createDataFrame([(1, "short doc")], "doc_id long, text string")
    probes = spark.createDataFrame([(9, "short doc")], "probe_id long, text string")
    assert contamination_flags(docs, probes, n=8).count() == 0
