"""T6 scaling-efficiency bench (SURVEY §5.2-T6, §7-M5; north_rule: ≥0.8
throughput scaling efficiency from N to 4N executors).

No real cluster exists in the sandbox, so the two-cluster-size criterion is
evidenced by running THE SAME JOB on THE SAME INPUT at two parallelism
levels — ``local[8]`` vs ``local[32]`` (N and 4N cores), one fresh JVM per
level — and reporting throughput at both plus
``efficiency = (thr_4N / thr_N) / 4``.

The job is the scheduling core itself — the BASELINE.json headline metric
"URLs scheduled+deduped/sec" — run as one epoch-shaped batch over a
pre-generated parquet frontier:

    read frontier parquet
      → request identity (canonicalize + SHA1 fingerprint, pandas UDFs)
      → within-epoch fp dedupe (operators.dedupe.dedupe_within_epoch)
      → exact seen-set anti-join vs a parquet url_seen table
        (operators.dedupe.anti_join_seen — the join-order-inverted path)
      → skew-proof two-phase pop (operators.pop.rank_and_pop with pretrim)

Input generation (untimed, per-level but byte-deterministic): ~20%
within-batch duplicate URLs, Zipf-ish domain spread, 10% of distinct URLs
pre-seeded into url_seen — so every stage does real work.

Measurement discipline (the sandbox VM shows bursty background load /
hypervisor steal): the input is generated ONCE with a fixed partition
count (identical bytes for every level), then the levels are run
INTERLEAVED (N, 4N, N, 4N, …) in fresh JVMs and the per-level minimum is
taken — minima are robust to one-sided load bursts that would otherwise
bias the ratio.

Two jobs (``--job`` / SPARK_GRAFT_SCALE_JOB):

- ``core`` (default): the one-batch scheduling core above — the
  headline-metric job.
- ``epoch``: the FULL epoch loop — ``CrawlEngine.run`` over the 1M-URL
  Zipf fixture (robots gate, politeness watermark, priority pop,
  synthetic fetch, link parse, dedupe, store commits per epoch) — so the
  ≥0.8 claim covers the engine's actual per-epoch job chain, not just
  its hottest stage. Throughput = URLs through the scheduling core
  (popped + fresh + dup-filtered) per second, the same accounting
  bench.py reports.

Usage:
    python tools/scaling_bench.py                  # orchestrate, write BENCH/
    python tools/scaling_bench.py --job epoch      # full epoch loop
    python tools/scaling_bench.py --worker --cpus 8 --urls 4000000 --dir D

Env: SPARK_GRAFT_SCALE_URLS (default 4_000_000),
     SPARK_GRAFT_SCALE_LEVELS (default "8,32"),
     SPARK_GRAFT_SCALE_ROUNDS (default 3, interleaved, min taken),
     SPARK_GRAFT_SCALE_JOB (core|epoch),
     SPARK_GRAFT_SCALE_EPOCHS (default 4, epoch job only).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOMAINS = 1024
SEEN_FRAC = 10  # 1/10 of distinct urls pre-seen
DUP_KEEP = 0.8  # distinct fraction ⇒ 20% within-batch dups
SLOT_CAP = 8
BUDGET = 1 << 20


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # long-running driver: cap status-store retention (each retained
        # SQL execution pins its plan graph; epoch plans are deep)
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.ui.retainedJobs", "64")
        .config("spark.ui.retainedStages", "128")
        # tmpfs shuffle dir: the sandbox's /tmp sits on a slow virtio disk
        # whose fixed bandwidth flattens shuffle scaling; RAM-backed local
        # dirs restore the disk bandwidth a real cluster's executors have.
        .config("spark.local.dir", "/dev/shm/spark-graft-bench")
        .getOrCreate()
    )


def synthetic_urls(spark, n: int, parts: int):
    """Deterministic raw-URL frame, ~20% within-batch dups. Half the rows
    are already-canonical (the realistic common case — plain extracted
    links), half need real normalization work (unsorted query params + a
    lowercase escape); both halves of a duplicate pair canonicalize to the
    same string, so the dedupe actually collapses them."""
    from pyspark.sql import functions as F

    base = int(n * DUP_KEEP)
    k = F.col("id") % base
    dom = F.pmod(F.xxhash64(k), F.lit(N_DOMAINS))  # hash-spread domains
    head = F.concat(
        F.lit("http://d"),
        dom.cast("string"),
        F.lit(".example/p/"),
        (k / N_DOMAINS).cast("long").cast("string"),
    )
    m = (k % 97).cast("string")
    messy = F.concat(head, F.lit("/item%7e?zz=26&a=1&m="), m)
    canonical = F.concat(head, F.lit("/item~?a=1&m="), m, F.lit("&zz=26"))
    return (
        spark.range(0, n, 1, parts)
        .select(
            F.when(F.xxhash64(k, F.lit(1)) % 2 == 0, messy)
            .otherwise(canonical)
            .alias("url"),
            (F.col("id") % 10).cast("int").alias("priority"),
            F.col("id").cast("long").alias("seq"),
            F.col("id").cast("long").alias("parent_seq"),
        )
    )


def prepare_input(spark, n: int, parts: int, root: str) -> None:
    """Untimed setup: frontier parquet (n rows) + url_seen parquet
    (fps of the first 1/SEEN_FRAC distinct urls)."""
    from pyspark.sql import functions as F

    from scrapy_spark.functions.udfs import with_request_identity
    from scrapy_spark.operators.dedupe import with_bucket

    synthetic_urls(spark, n, parts).write.mode("overwrite").parquet(
        f"{root}/frontier"
    )
    base = int(n * DUP_KEEP)
    seen_src = synthetic_urls(spark, base // SEEN_FRAC, parts)
    seen = with_bucket(
        with_request_identity(seen_src).select("fp").dropDuplicates(["fp"])
    ).withColumn("epoch_added", F.lit(0))
    seen.write.mode("overwrite").parquet(f"{root}/url_seen")


def run_core_job(spark, root: str) -> int:
    """The timed job: identity → dedupe → anti-join seen → two-phase pop."""
    from pyspark.sql import functions as F

    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.functions.udfs import with_request_identity
    from scrapy_spark.operators.dedupe import anti_join_seen, dedupe_within_epoch
    from scrapy_spark.operators.pop import rank_and_pop

    cfg = CrawlConfig(queue_order="fifo", downloader_aware=True)
    frontier = spark.read.parquet(f"{root}/frontier")
    url_seen = spark.read.parquet(f"{root}/url_seen")

    candidates = with_request_identity(frontier).cache()
    try:
        uniq = dedupe_within_epoch(candidates)
        # epoch-scale batch ⇒ the size-adaptive shuffle anti-join path
        fresh = anti_join_seen(uniq, url_seen, bloom=None, n_candidates=1 << 30)
        eligible = fresh.withColumn("concurrency", F.lit(SLOT_CAP))
        popped = rank_and_pop(eligible, cfg, BUDGET, pretrim_cap=SLOT_CAP)
        return popped.count()
    finally:
        candidates.unpersist()


# Input partition count is FIXED so every level reads identical bytes.
INPUT_PARTS = 128


def run_epoch_job(spark, epochs: int, scale: str = "bench") -> dict:
    """The full-epoch-loop job: ``CrawlEngine.run`` over the 1M-URL Zipf
    fixture, WIDE configuration — politeness slots hot (delay 0,
    concurrency 64) and a 64k epoch budget, so each epoch schedules tens
    of thousands of URLs. That is the regime a multi-executor deployment
    actually runs (millions of URLs per epoch across the cluster); at
    the parity fixtures' ~2k-URL epochs the loop is orchestration-bound
    (dozens of fixed-cost Spark jobs per epoch) and measures the
    scheduler constant, not the operator chain — that overhead-dominated
    variant was measured first and is kept in
    BENCH/scaling_epoch_smallbatch.json for transparency."""
    import tempfile
    import time as _time

    from scrapy_spark.config import CrawlConfig
    from scrapy_spark.sources.fixtures import gen_crawl_fixture
    from scrapy_spark.sources.store import MemoryStore
    from scrapy_spark.streaming.engine import CrawlEngine

    fix = gen_crawl_fixture(scale, seed=42, with_payload=False)
    fix.politeness["delay_ms"] = 0
    fix.politeness["concurrency"] = 1024
    if scale == "bench":
        # seed a third of the universe, STRIDED across the Zipf domain
        # layout (a contiguous prefix is one hot domain → per-slot caps
        # throttle the whole epoch): ~160k scheduled URLs per epoch
        import pandas as pd

        fix.seeds = pd.DataFrame(
            {
                "url": fix.url_map["url_canon"].iloc[::3].tolist(),
                "priority": 0,
            }
        )
    cfg = CrawlConfig(
        epoch_budget=262144,
        max_epochs=epochs,
        allowed_domains=("example",),
        depth_limit=6,
        depth_priority=1,
        queue_order="fifo",
    )
    store = MemoryStore(spark)
    mat_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(prefix="scale_fix_", dir=mat_root) as td:
        eng = CrawlEngine.from_fixture(
            spark, cfg, store, fix, materialize_dir=td
        )
        t0 = _time.time()
        stats = eng.run(max_epochs=epochs)
        elapsed = _time.time() - t0
    popped = sum(s.popped for s in stats)
    fresh = sum(s.fresh for s in stats)
    metrics = store.read("metrics").toPandas()
    dupes = int(
        metrics.loc[metrics["key"] == "dupefilter/filtered", "value"].sum()
    )
    processed = popped + fresh + dupes
    return {
        "elapsed_sec": round(elapsed, 2),
        "epochs": len(stats),
        "urls_popped": popped,
        "urls_fresh": fresh,
        "urls_dup_filtered": dupes,
        "urls_per_sec": round(processed / elapsed, 1),
    }


def worker(
    cpus: int, n_urls: int, workdir: str, repeat: int, prepare: bool,
    job: str = "core", epochs: int = 4,
) -> None:
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if job == "epoch":
        # warmup at the small scale: JIT/codegen/UDF workers spin up
        # without paying a second 1M-row fixture generation
        run_epoch_job(spark, epochs=1, scale="small")
        best = None
        for _ in range(repeat):
            res = run_epoch_job(spark, epochs)
            if best is None or res["elapsed_sec"] < best["elapsed_sec"]:
                best = res
        processed = (
            best["urls_popped"] + best["urls_fresh"] + best["urls_dup_filtered"]
        )
        print(
            json.dumps(
                {
                    "cpus": cpus,
                    "job": "epoch",
                    "epochs": best["epochs"],
                    "processed": processed,
                    "elapsed_sec": best["elapsed_sec"],
                    "urls_per_sec": best["urls_per_sec"],
                }
            )
        )
        spark.stop()
        return
    if prepare:
        prepare_input(spark, n_urls, INPUT_PARTS, workdir)
    if repeat == 0:  # generation-only pass
        print(json.dumps({"cpus": cpus, "prepared": True}))
        spark.stop()
        return
    run_core_job(spark, workdir)  # warmup (JIT, codegen, UDF workers)
    best, popped = None, 0
    for _ in range(repeat):
        t0 = time.time()
        popped = run_core_job(spark, workdir)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "urls": n_urls,
                "popped": popped,
                "elapsed_sec": round(best, 3),
                "urls_per_sec": round(n_urls / best, 1),
            }
        )
    )
    spark.stop()


def _spawn_worker(
    cpus: int, n_urls: int, workdir: str, prepare: bool,
    job: str = "core", epochs: int = 4,
) -> dict:
    cmd = [
        sys.executable,
        __file__,
        "--worker",
        "--cpus",
        str(cpus),
        "--urls",
        str(n_urls),
        "--dir",
        workdir,
        "--repeat",
        "1",
        "--job",
        job,
        "--epochs",
        str(epochs),
    ]
    if prepare:
        cmd.append("--prepare")
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=str(REPO)
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    print(line)
    return json.loads(line)


def _assert_same_work(samples: list[dict], key: str) -> None:
    """A scaling ratio is only meaningful if every sample at every level
    did IDENTICAL work. The job is deterministic by design, so any spread
    in the work counter means parallelism-dependent row loss (this guard
    exists because the r5 global_seq pid-join bug silently dropped ~40%
    of epoch links at one level and the efficiency number looked fine)."""
    vals = {s[key] for s in samples}
    if len(vals) > 1:
        raise SystemExit(
            f"scaling bench invalid: '{key}' differs across samples "
            f"({sorted(vals)}) — the job is not deterministic across "
            f"parallelism levels; fix that before trusting any ratio"
        )


def orchestrate(job: str = "core") -> None:
    n_urls = int(os.environ.get("SPARK_GRAFT_SCALE_URLS", "4000000"))
    levels = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "8,32").split(",")
    ]
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    gen_cpus = int(os.environ.get("SPARK_GRAFT_SCALE_GEN_CPUS", "32"))
    epochs = int(os.environ.get("SPARK_GRAFT_SCALE_EPOCHS", "4"))
    if job == "epoch":
        best_e: dict[int, dict] = {}
        samples_e: list[dict] = []
        for _ in range(rounds):
            for cpus in levels:  # interleaved: N, 4N, N, 4N, …
                res = _spawn_worker(
                    cpus, n_urls, "", prepare=False, job="epoch",
                    epochs=epochs,
                )
                samples_e.append(dict(res))
                cur = best_e.get(cpus)
                if cur is None or res["elapsed_sec"] < cur["elapsed_sec"]:
                    best_e[cpus] = res
        results = [best_e[c] for c in sorted(best_e)]
        _assert_same_work(samples_e, "processed")
        lo, hi = results[0], results[-1]
        ratio = hi["urls_per_sec"] / lo["urls_per_sec"]
        core_factor = hi["cpus"] / lo["cpus"]
        eff = ratio / core_factor
        report = {
            "job": "full epoch loop: CrawlEngine.run over the 1M-URL Zipf "
                   "fixture (robots, politeness, pop, fetch, parse, dedupe, "
                   "store commits)",
            "epochs": epochs,
            "levels": results,
            "speedup": round(ratio, 3),
            "core_factor": core_factor,
            "scaling_efficiency": round(eff, 3),
            "criterion": "efficiency ≥ 0.8 (north_rule)",
            "pass": eff >= 0.8,
            "samples": samples_e,
        }
        bench_dir = REPO / "BENCH"
        bench_dir.mkdir(exist_ok=True)
        (bench_dir / "scaling_epoch.json").write_text(
            json.dumps(report, indent=2)
        )
        append_epoch_md(bench_dir / "BASELINE.md", report)
        print(json.dumps(report))
        return
    best: dict[int, dict] = {}
    with tempfile.TemporaryDirectory(
        prefix="scale_input_", dir="/dev/shm"
    ) as td:
        # generation pass at full width (untimed — input identical for all)
        subprocess.run(
            [
                sys.executable,
                __file__,
                "--worker",
                "--cpus",
                str(gen_cpus),
                "--urls",
                str(n_urls),
                "--dir",
                td,
                "--repeat",
                "0",
                "--prepare",
            ],
            capture_output=True,
            text=True,
            check=True,
            cwd=str(REPO),
        )
        samples: list[dict] = []
        for _ in range(rounds):
            for cpus in levels:  # interleaved: N, 4N, N, 4N, …
                res = _spawn_worker(cpus, n_urls, td, prepare=False)
                samples.append(dict(res))
                cur = best.get(cpus)
                if cur is None or res["elapsed_sec"] < cur["elapsed_sec"]:
                    best[cpus] = res
    results = [best[c] for c in sorted(best)]
    _assert_same_work(samples, "popped")
    for r in results:
        r["urls_per_sec"] = round(r["urls"] / r["elapsed_sec"], 1)

    lo, hi = results[0], results[-1]
    ratio = hi["urls_per_sec"] / lo["urls_per_sec"]
    core_factor = hi["cpus"] / lo["cpus"]
    eff = ratio / core_factor
    report = {
        "job": "scheduling core: identity → dedupe → seen anti-join → two-phase pop",
        "input_urls": n_urls,
        "levels": results,
        "speedup": round(ratio, 3),
        "core_factor": core_factor,
        "scaling_efficiency": round(eff, 3),
        "criterion": "efficiency ≥ 0.8 (north_rule)",
        "pass": eff >= 0.8,
        # every interleaved sample, for transparency: the sandbox host shows
        # bursty background load, so per-level minima are the estimator
        "samples": samples,
    }
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "scaling.json").write_text(json.dumps(report, indent=2))
    write_md(bench_dir / "BASELINE.md", report)
    print(json.dumps(report))


def append_epoch_md(path: pathlib.Path, rep: dict) -> None:
    """Replace-or-append the epoch-loop section in BASELINE.md (a '## '
    section, so core-job rewrites preserve it)."""
    header = "## Epoch-loop scaling (full engine per-epoch job chain)"
    lo, hi = rep["levels"][0], rep["levels"][-1]
    verdict = "**PASS**" if rep["pass"] else "**FAIL**"
    rows = "\n".join(
        f"| {i + 1} | {s['cpus']} | {s['elapsed_sec']} | {s['urls_per_sec']:,.0f} |"
        for i, s in enumerate(rep.get("samples", []))
    )
    section = f"""{header}

Same interleaved fresh-JVM / per-level-minimum discipline as the core
job, but the measured job is **`CrawlEngine.run` itself** — {rep['epochs']}
epochs over the deterministic 1M-URL Zipf fixture, store commits
included — so the ≥0.8 criterion covers the engine's actual per-epoch
job chain (VERDICT r4 next-step 9). Throughput counts URLs through the
scheduling core (popped + fresh + dup-filtered) per second.

| parallelism | elapsed (best-of) | throughput (URLs/s) |
|---|---|---|
| local[{lo['cpus']}]  (N)  | {lo['elapsed_sec']} s | {lo['urls_per_sec']:,.0f} |
| local[{hi['cpus']}] (4N) | {hi['elapsed_sec']} s | {hi['urls_per_sec']:,.0f} |

**Speedup {lo['cpus']}→{hi['cpus']}: {rep['speedup']}× of {rep['core_factor']:.0f}× ideal ⇒
efficiency = {rep['scaling_efficiency']} — {verdict} (≥ 0.8).** All samples, run order:

| run | cpus | elapsed (s) | URLs/s |
|---|---|---|---|
{rows}

Raw numbers: `BENCH/scaling_epoch.json`. Reproduce:
`python tools/scaling_bench.py --job epoch`.
"""
    existing = path.read_text() if path.exists() else ""
    if header in existing:
        start = existing.index(header)
        nxt = existing.find("\n## ", start + len(header))
        end = len(existing) if nxt == -1 else nxt + 1
        existing = existing[:start] + section + existing[end:]
    else:
        existing = existing.rstrip() + "\n\n" + section
    path.write_text(existing)


def write_md(path: pathlib.Path, rep: dict) -> None:
    lo, hi = rep["levels"][0], rep["levels"][-1]
    # preserve manually appended sections (round-context notes, the
    # executor-resident filter measurements, the epoch-loop table): the
    # generated template has no "## " headings, so everything from the
    # first one onward is appended material that must survive a re-run
    preserved = ""
    if path.exists():
        existing = path.read_text()
        cut = existing.find("\n## ")
        if cut != -1:
            preserved = existing[cut:]
    path.write_text(
        f"""# BENCH/BASELINE — measured scaling evidence (T6)

North_rule criterion: throughput scaling efficiency **≥ 0.8** from N to 4N
executors. No real cluster exists in the sandbox; per the driver
instruction this is evidenced by running the SAME job on the SAME input at
two parallelism levels in fresh JVMs (`local[{lo['cpus']}]` vs
`local[{hi['cpus']}]`) — the local-mode stand-in for N vs 4N executors.

**Job** (the BASELINE.json headline metric, URLs scheduled+deduped/sec):
one epoch-shaped batch of {rep['input_urls']:,} raw URLs (~20% within-batch
duplicates, 1024 hash-spread domains, 10% pre-seen) through the engine's
own operators — `with_request_identity` (canonicalize + SHA1 fingerprint,
pandas UDFs) → `dedupe_within_epoch` → `anti_join_seen` (join-order-
inverted exact check vs a parquet url_seen) → `rank_and_pop`
(skew-proof two-phase pop, per-slot cap {SLOT_CAP}).

| parallelism | elapsed (best-of) | throughput (URLs/s) |
|---|---|---|
| local[{lo['cpus']}]  (N)  | {lo['elapsed_sec']} s | {lo['urls_per_sec']:,.0f} |
| local[{hi['cpus']}] (4N) | {hi['elapsed_sec']} s | {hi['urls_per_sec']:,.0f} |

**Speedup {lo['cpus']}→{hi['cpus']} cores: {rep['speedup']}× of {rep['core_factor']:.0f}×
ideal ⇒ scaling efficiency = {rep['scaling_efficiency']} — {'**PASS**' if rep['pass'] else '**FAIL**'} (≥ 0.8).**

**Measurement discipline.** The sandbox VM shows bursty background load
(identical runs can swing well over 1.5×), so the levels run interleaved
in fresh JVMs and the per-level MINIMUM is the estimator — noise only
ever inflates a wall time, so the minimum converges on the clean run.
All samples, in run order:

| run | cpus | elapsed (s) | URLs/s |
|---|---|---|---|
{chr(10).join(f"| {i + 1} | {s['cpus']} | {s['elapsed_sec']} | {s['urls_per_sec']:,.0f} |" for i, s in enumerate(rep.get('samples', [])))}

Reproduce: `python tools/scaling_bench.py` (env:
`SPARK_GRAFT_SCALE_URLS`, `SPARK_GRAFT_SCALE_LEVELS`,
`SPARK_GRAFT_SCALE_ROUNDS`). Raw numbers: `BENCH/scaling.json`.
"""
        + preserved
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--urls", type=int, default=4_000_000)
    ap.add_argument("--dir", default=None)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument(
        "--job",
        choices=("core", "epoch"),
        default=os.environ.get("SPARK_GRAFT_SCALE_JOB", "core"),
    )
    ap.add_argument("--epochs", type=int, default=4)
    args = ap.parse_args()
    if args.worker:
        worker(
            args.cpus,
            args.urls,
            args.dir or tempfile.mkdtemp(),
            args.repeat,
            args.prepare or (args.dir is None and args.job == "core"),
            job=args.job,
            epochs=args.epochs,
        )
    else:
        orchestrate(args.job)


if __name__ == "__main__":
    main()
