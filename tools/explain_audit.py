"""Physical-plan audit → EXPLAIN.md.

Captures ``explain('formatted')`` for the engine's load-bearing operators
and asserts the plan properties the 100 TB design depends on:

- parquet scans carry PushedFilters / pruned ReadSchema (no full-row reads)
- small sides broadcast (BroadcastHashJoin), big sides never build
- budget cut is TakeOrderedAndProject (top-k), not a global Sort
- the identity stage is ONE ArrowEvalPython node (one Python pass)
- no CartesianProduct / BroadcastNestedLoopJoin anywhere

Run:  python tools/explain_audit.py [sf_dir]   (default /root/testdata/sf0.01)
Exits non-zero if any assertion fails; writes EXPLAIN.md either way.
"""

from __future__ import annotations

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BAD_EVERYWHERE = ("CartesianProduct", "BroadcastNestedLoopJoin")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("explain-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    # (query, [must-contain substrings], [must-NOT-contain substrings])
    checks = [
        (
            "dupefilter_anti_join",
            ["PushedFilters"],
            list(BAD_EVERYWHERE),
        ),
        (
            "robots_broadcast_gate",
            ["BroadcastHashJoin"],
            list(BAD_EVERYWHERE),
        ),
        (
            "topk_orders",
            ["TakeOrderedAndProject"],
            list(BAD_EVERYWHERE) + ["Sort ["],  # top-k, never a global sort
        ),
        (
            "crawl_frontier_pop",
            ["ArrowEvalPython"],
            list(BAD_EVERYWHERE),
        ),
        (
            "politeness_eligibility",
            ["PushedFilters"],
            list(BAD_EVERYWHERE),
        ),
        (
            "frontier_pop_global",
            ["TakeOrderedAndProject"],  # limit-then-rank, never full sort
            list(BAD_EVERYWHERE),
        ),
        # datapipe queries: every sketch/LSH plan must be a key-equijoin
        # shape — CartesianProduct is forbidden except in the two
        # documented exact-baseline queries (embedding_near_dup_pairs,
        # knn_cosine_topk), which are small-sf oracles by design.
        ("dedup_minhash_lsh", ["ArrowEvalPython"], list(BAD_EVERYWHERE)),
        ("dedup_simhash", ["ArrowEvalPython"], list(BAD_EVERYWHERE)),
        ("dedup_exact", ["HashAggregate"], list(BAD_EVERYWHERE)),
        # incremental delta-vs-corpus dedup: md5 + shingle equijoins —
        # all-JVM (no Python eval), never a cross product
        (
            "dedup_incremental",
            [],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        ("embedding_near_dup_lsh", ["ArrowEvalPython"], list(BAD_EVERYWHERE)),
        ("ann_lsh_topk", ["ArrowEvalPython"], list(BAD_EVERYWHERE)),
        # IVF: cell-assignment is the only Python stage; the candidate
        # join must be a key-equijoin on cell, never a cross-product
        ("ann_ivf_topk", ["ArrowEvalPython"], list(BAD_EVERYWHERE)),
        # IVF-PQ: index (corpus) + probe/LUT (queries) are the only two
        # Python stages; ADC scoring over the compressed codes is pure
        # column algebra on the JVM side of the cell equijoin
        ("ann_ivfpq_topk", ["ArrowEvalPython"], list(BAD_EVERYWHERE)),
        ("text_token_stats", ["ReadSchema"], list(BAD_EVERYWHERE)),  # map-only: no filter to push; assert column pruning
        # html extraction: one codegen'd scan — regexp chains + array
        # lambdas, zero Python evals, no join at all
        (
            "html_extract_text",
            ["ReadSchema"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        ("doc_winnow_fingerprints", ["ArrowEvalPython"], list(BAD_EVERYWHERE)),
        # stratified sample never reads the text column (column pruning:
        # the scan must exclude text:string) and stays equijoin-free
        (
            "sample_stratified",
            ["ReadSchema"],
            list(BAD_EVERYWHERE) + ["text:string"],
        ),
        ("text_repetition_stats", ["ReadSchema"], list(BAD_EVERYWHERE)),
        # connected components: the per-round joins are key-equijoins; the
        # returned labels plan must carry no cross-product anywhere
        ("dedup_cluster_reps", [], list(BAD_EVERYWHERE)),
        # pHash image near-dup: pure JVM band equijoin — NO Python stage
        # at all (phash is a stored column), no cross-product, and the
        # scan reads only doc_id (never the text column)
        (
            "image_phash_neardup",
            ["ReadSchema"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "text:string"],
        ),
        ("image_phash_cluster_reps", [], list(BAD_EVERYWHERE) + ["ArrowEvalPython"]),
        # the 10^10-row block-combination variant: same constraints
        (
            "image_phash_neardup_mih",
            ["ReadSchema"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "text:string"],
        ),
        # caption star edges: one hash-agg + one equijoin, no Python, and
        # the scan never reads the text column (captions are synthesized
        # from doc_id); joint dedup additionally must stay cross-free
        (
            "image_caption_dup_pairs",
            ["HashAggregate"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "text:string"],
        ),
        ("image_joint_dedup_reps", [], list(BAD_EVERYWHERE)),
        # exact byte dedup: md5 scan + hash-agg + digest equi-join, no Python
        (
            "image_exact_dedup",
            ["HashAggregate"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython"],
        ),
        # payload/thumbnail parity verdicts: decode is inherently Python
        # (mapInPandas) — assert exactly that shape and nothing worse
        ("image_decode_meta", ["MapInPandas"], list(BAD_EVERYWHERE)),
        ("image_thumbs_parity", ["MapInPandas"], list(BAD_EVERYWHERE)),
        ("audio_decode_meta", ["MapInPandas"], list(BAD_EVERYWHERE)),
        ("video_frame_sample", ["MapInPandas"], list(BAD_EVERYWHERE)),
        # alignment gate/histogram: JVM zip_with+aggregate fold — the whole
        # cosine must stay codegen-side, zero Python evals
        (
            "image_text_alignment",
            [],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        (
            "image_align_histogram",
            ["HashAggregate"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        # aspect buckets: single scan + hash-agg, pure Column algebra
        (
            "image_aspect_buckets",
            ["HashAggregate"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "text:string"],
        ),
        # r5 pipeline ops: all pure JVM Column algebra — zero Python
        # evals anywhere (regexp/list ops codegen-side); top_terms' df
        # join must be a broadcast, never a cross-product
        (
            "pii_scrub",
            [],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        (
            "quality_heuristic_rules",
            [],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        (
            "dedup_span_stats",
            ["HashAggregate"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        # script_mix: map-only regexp counting — no shuffle before the
        # final project, zero Python evals
        (
            "script_mix",
            [],
            list(BAD_EVERYWHERE)
            + ["ArrowEvalPython", "BatchEvalPython", "Exchange hashpartitioning"],
        ),
        # span removal: same two-shuffle shape as the stats half, plus
        # per-doc JVM array algebra — still zero Python evals
        (
            "dedup_span_removal",
            ["HashAggregate"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        (
            "text_top_terms",
            ["BroadcastHashJoin"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        # corpus_mix: token count + two tiny aggs; integer-ppm math stays
        # pure Column algebra — zero Python evals
        (
            "corpus_mix",
            ["HashAggregate"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        # pack_sequences: the distributed prefix sum is a RANGE exchange
        # + per-partition windows + a broadcast offsets join. The range
        # exchange itself is no longer VISIBLE in the final plan: the
        # __pid pin (packing.py::running_offset) eagerly localCheckpoints
        # right after repartitionByRange so both consumers see identical
        # partition ids (the r5 row-conservation fix), and the checkpoint
        # truncates the lineage the explain shows. Assert what remains
        # downstream of the pin: per-__pid windows (never a global one)
        # and the broadcast offsets join.
        # (A SinglePartition exchange still appears — over the ≤nparts-row
        # per-partition COUNTS table, not the data; that's the intended
        # tiny prefix-sum, same as operators/pop.py::global_seq.)
        (
            "pack_sequences",
            ["Window", "BroadcastHashJoin"],
            list(BAD_EVERYWHERE) + ["ArrowEvalPython", "BatchEvalPython"],
        ),
        # semdedup: the k-row codebook broadcast-cross-joins the corpus
        # ON PURPOSE (n×8 scored rows, collapsed map-side by max_by), so
        # BroadcastNestedLoopJoin is the intended join here — forbid only
        # the non-broadcast cross product and any Python eval; the
        # within-cell pair stage must hash-join (SortMergeJoin/ShuffledHash
        # on the cell id). Audited at the PAIR stage: the registered
        # semdedup_reps query ends in connected_components, whose eager
        # localCheckpoint truncates the visible lineage.
        # (max_by over a struct plans as SortAggregate — partial before
        # the exchange either way, which is the property that matters)
        (
            "semdedup_pairs",
            ["BroadcastExchange", "Aggregate"],
            ["CartesianProduct", "ArrowEvalPython", "BatchEvalPython"],
        ),
    ]

    def _semdedup_pairs(spark, sf_dir):
        from scrapy_spark.datapipe.semdedup import semdedup_pairs
        from __spark_entry__ import _jittered_corpus, _t

        corpus = _jittered_corpus(_t(spark, sf_dir, "embeddings"))
        return semdedup_pairs(corpus, ncells=8, threshold=0.99)

    extra = {"semdedup_pairs": _semdedup_pairs}

    sections, failures = [], []
    for name, must, must_not in checks:
        df = (qs.get(name) or extra[name])(spark, sf_dir)
        plan = plan_of(df)
        for needle in must:
            if needle not in plan:
                failures.append(f"{name}: missing {needle!r}")
        for needle in must_not:
            if needle in plan:
                failures.append(f"{name}: contains forbidden {needle!r}")
        if name == "crawl_frontier_pop":
            # count operator-detail headers "(N) ArrowEvalPython", one per
            # physical node — the tree rendering repeats the name
            n_nodes = len(re.findall(r"^\(\d+\) ArrowEvalPython", plan, re.M))
            if n_nodes != 1:
                failures.append(
                    f"crawl_frontier_pop: identity UDF evaluated {n_nodes}×"
                )
        sections.append((name, must, must_not, plan))

    out = ["# EXPLAIN — physical-plan audit\n"]
    out.append(
        "Generated by `python tools/explain_audit.py` — asserts the plan\n"
        "properties the scale design depends on (SURVEY §4). "
        f"Status: **{'PASS' if not failures else 'FAIL'}**\n"
    )
    if failures:
        out.append("## Failures\n")
        out += [f"- {f}" for f in failures]
    for name, must, must_not, plan in sections:
        out.append(f"\n## {name}\n")
        out.append(f"requires: `{must}` · forbids: `{must_not}`\n")
        out.append("```\n" + plan.strip()[:4000] + "\n```")
    (REPO / "EXPLAIN.md").write_text("\n".join(out) + "\n")
    print(("PASS" if not failures else "FAIL"), "→ EXPLAIN.md")
    for f in failures:
        print(" -", f)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
