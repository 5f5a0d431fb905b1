"""The crawl engine: watermarked batch-epoch loop (SURVEY §3.1 "Spark
lifecycle", §2.8; ref: scrapy/core/engine.py::ExecutionEngine ≈L220 — the
reactor tick becomes one epoch of Spark jobs).

Each epoch implements SEMANTICS.md steps 1-10 as declarative DataFrame
stages; the driver touches only aggregate counts and the commit manifest —
never rows (SURVEY §3.4). State lives in a ``Store`` (Iceberg-emulating
parquet+manifest, or in-memory for benchmarks); every epoch is an atomic
multi-table commit, so a SIGKILL between epochs resumes identically (ST6).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators import politeness as pol
from ..operators.dedupe import anti_join_seen, dedupe_within_epoch, with_bucket
from ..operators.fetch import attach_payload, synthetic_fetch
from ..operators.httpcache import split_cache_hits
from ..operators.filters import split_links
from ..functions.linkextract import explode_page_links
from ..operators.parse import extract_links
from ..operators.pop import rank_and_pop
from ..operators.robots_gate import apply_robots_gate
from ..operators.bloom import ShardedBloom
from ..operators.cuckoo import ShardedCuckoo
from ..plans import schemas
from ..sources.fixtures import CrawlFixture
from ..sources.store import Store
from ..functions.udfs import with_request_identity

FRONTIER_COLS = [f.name for f in schemas.FRONTIER.fields]

#: target rows per partition for per-epoch delta tables (~tens of MB for
#: fp-sized rows) — deltas are written once and re-read every epoch, so
#: partition count must track DATA size, not the session's shuffle
#: parallelism
_DELTA_ROWS_PER_PART = 500_000


def _local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local rows → a ONE-partition DataFrame. createDataFrame
    alone parallelizes into defaultParallelism slices (32 near-empty
    partitions per epoch for a handful of metrics rows), and
    coalesce(1) over a parallelized local collection is pathological in
    the local scheduler (~4 s per materialization, measured — the single
    merged task re-fetches every parent slice from the driver); a
    1-slice parallelize at creation is free."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _sized_delta(df: DataFrame, n_rows: int) -> DataFrame:
    """Right-size a per-epoch delta before it is committed.

    Every append/insert delta inherits the full shuffle parallelism (32+
    partitions) no matter how few rows it holds; the stores keep deltas
    as-is (checkpointed pieces / parquet file lists), so after E epochs a
    reader of url_seen or the frontier launches E × shuffle_partitions
    mostly-empty tasks — the classic small-files problem, and measurably
    the fastest-growing per-epoch cost in the bench trace. The row count
    is already known driver-side at commit time; coalesce (narrow, no
    shuffle) down to ceil(n/rows_per_part). Large deltas keep their
    parallelism: coalesce never increases partition count."""
    target = max(1, -(-max(n_rows, 1) // _DELTA_ROWS_PER_PART))
    return df.coalesce(target)


@dataclass
class EpochStats:
    epoch: int
    popped: int
    denied: int
    fetched_ok: int
    retried: int
    failed: int
    fresh: int
    queued_after: int
    # rows appended to the frontier this epoch (retries + fresh + redirect
    # re-entries) — lets run() enforce frontier row conservation
    enqueued: int = 0


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        store: Store,
        *,
        url_map: DataFrame,
        graph: DataFrame,
        robots: DataFrame,
        corpus: DataFrame | None = None,
        redirect_map: DataFrame | None = None,
        pretrim: bool = True,
        max_slot_concurrency: int | None = None,
        resolver=None,
        http_cache: DataFrame | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.store = store
        if cfg.robots_source == "http" and cfg.fetch_backend != "http":
            raise ValueError(
                "robots_source='http' (live robots.txt fetch) requires "
                "fetch_backend='http' — the synthetic backend's rules come "
                "from the robots fixture table (robots_source='table')"
            )
        # DNS resolver for slot_key_mode="ip" (operators/ipslots.py);
        # injectable for deterministic tests, None = socket.getaddrinfo
        self.resolver = resolver
        # optional cache carried over from a previous crawl's store
        # (S6/J6 persistent-cache analog); unioned with this store's own
        # http_cache table at replay time
        self.http_cache = http_cache
        self.url_map = url_map
        self.graph = graph
        self.robots = robots
        self.corpus = corpus
        self.redirect_map = redirect_map
        self.pretrim = pretrim
        # floor at concurrent_per_domain: slots with no domain_state row
        # fall back to that default at pop time, so a pretrim cap below
        # it would cut rows inside a slot's true top-cap (violating
        # pop.py's strict-superset invariant)
        self.max_cap = max(
            max_slot_concurrency or 0, cfg.concurrent_per_domain, 8
        )
        # seen-set prefilter: bloom (default) or cuckoo (deletable) —
        # both expose n_added/capacity/probe_udf/absorb_df, so every
        # consumer below is structure-agnostic
        sf_kind = cfg.seen_filter if cfg.bloom_enabled else "none"
        self.bloom: ShardedBloom | ShardedCuckoo | None
        if sf_kind == "cuckoo":
            self.bloom = ShardedCuckoo(capacity=1_000_000)
        elif sf_kind == "cuckoo-disk":
            # executor-resident variant (operators/diskfilter.py): shard
            # files on shared storage, probe/absorb/delete shard-owner-
            # side — the driver never holds a tag array. Root rides with
            # the persistent store when it has one (resume rebuild finds
            # the files there); MemoryStore engines get a scratch dir.
            import tempfile

            from ..operators.diskfilter import DiskShardedCuckoo

            root = getattr(store, "root", None) or tempfile.mkdtemp(
                prefix="seen_filter_"
            )
            self.bloom = DiskShardedCuckoo(
                spark, str(root), capacity=1_000_000
            )
        elif sf_kind == "bloom":
            self.bloom = ShardedBloom(capacity=1_000_000, fpr=cfg.bloom_fpr)
        else:
            self.bloom = None
        self.stats_log: list[EpochStats] = []

    # ------------------------------------------------------------------ init
    @classmethod
    def from_fixture(
        cls,
        spark: SparkSession,
        cfg: CrawlConfig,
        store: Store,
        fix: CrawlFixture,
        materialize_dir: str | None = None,
        **kw,
    ) -> "CrawlEngine":
        # localCheckpoint: createDataFrame embeds the pandas data as a
        # driver-local relation that is re-shipped to executors with EVERY
        # job — at bench scale (1M url_map, 2.5M graph rows) that cost
        # dominated each epoch. Checkpointing pins them cluster-side once.
        # For large fixtures, pass ``materialize_dir``: the driver→JVM
        # pandas conversion itself is slow at millions of rows, while a
        # pyarrow parquet write + distributed read is near-instant.
        if materialize_dir is not None:
            from ..sources.fixtures import materialize

            paths = materialize(fix, materialize_dir)
            url_map = spark.read.parquet(paths["url_map"])
            graph = spark.read.parquet(paths["graph"])
            robots = spark.read.parquet(paths["robots"])
            corpus = (
                spark.read.parquet(paths["corpus"]) if "corpus" in paths else None
            )
            if len(fix.redirects):
                redirect_map = spark.read.parquet(paths["redirects"])
            else:  # empty pandas → null-typed parquet; build typed empty
                redirect_map = spark.createDataFrame(
                    [], "src_canon string, dst_url string"
                )
        else:
            url_map = spark.createDataFrame(fix.url_map).localCheckpoint(eager=True)
            graph = spark.createDataFrame(fix.graph).localCheckpoint(eager=True)
            robots = spark.createDataFrame(fix.robots.copy()).localCheckpoint(
                eager=True
            )
            corpus = (
                spark.createDataFrame(
                    fix.corpus, schema=schemas.CORPUS
                ).localCheckpoint(eager=True)
                if fix.corpus is not None
                else None
            )
            redirect_map = spark.createDataFrame(
                fix.redirects, "src_canon string, dst_url string"
            ).localCheckpoint(eager=True)
        eng = cls(
            spark,
            cfg,
            store,
            url_map=url_map,
            graph=graph,
            robots=robots,
            corpus=corpus,
            redirect_map=redirect_map,
            max_slot_concurrency=int(fix.politeness["concurrency"].max()),
            **kw,
        )
        if store.epoch < 0 and not store.scalars.get("bootstrapped"):
            eng.bootstrap(fix.seeds, fix.politeness)
        elif not (
            getattr(eng.bloom, "prefers_shard_partitioning", False)
            and eng.bloom.n_added > 0
        ):
            # resume: rebuild the prefilter from committed url_seen. The
            # executor-resident variant skips this when its own manifest
            # survived next to the store — its shard files ARE the
            # durable state (a fresh rebuild would re-scan 10^10 rows).
            eng._rebuild_bloom()
        return eng

    def bootstrap(self, seeds: pd.DataFrame, politeness: pd.DataFrame) -> None:
        """Seed the frontier (SEMANTICS 'Seeds'): dont_filter=True, depth 0,
        seq = file order; seed fps are NOT recorded in url_seen. An
        optional ``meta_json`` column carries per-seed Request.meta —
        ``meta['download_slot']`` overrides the politeness slot (C4, ref
        get_slot_key ≈L105)."""
        from ..functions.meta import meta_get

        pdf = seeds.reset_index(drop=True).copy()
        pdf["seq"] = pdf.index.astype("int64")
        if "meta_json" not in pdf.columns:
            pdf["meta_json"] = None
        raw = self.spark.createDataFrame(
            pdf[["url", "priority", "seq", "meta_json"]],
            "url string, priority int, seq long, meta_json string",
        ).withColumn("meta_slot", meta_get(F.col("meta_json"), "download_slot"))
        frontier = (
            with_request_identity(raw, impl=self.cfg.fingerprint_impl)
            .withColumn("depth", F.lit(0))
            .withColumn("epoch_added", F.lit(-1))
            .withColumn("parent_fp", F.lit(None).cast("binary"))
            .withColumn("status", F.lit("QUEUED"))
            .withColumn("retries", F.lit(0))
            .withColumn("redirects", F.lit(0))
            .withColumn("dont_filter", F.lit(True))
            .withColumn("referer", F.lit(None).cast("string"))  # seeds: none
            .transform(self._apply_slot_mode)
            .select(*FRONTIER_COLS)
        )
        dom = self.spark.createDataFrame(
            politeness, "slot string, delay_ms long, concurrency int"
        ).select(
            "slot",
            F.lit(0).cast("long").alias("next_free_at"),
            "delay_ms",
            "concurrency",
            F.lit(None).cast("double").alias("latency_ema"),
            F.lit(None).cast("int").alias("robots_epoch"),
        )
        url_seen = self.spark.createDataFrame([], schemas.URL_SEEN).transform(
            lambda d: with_bucket(d)
        )
        self.store.commit(
            -1,
            replace={"frontier": frontier, "domain_state": dom, "url_seen": url_seen},
            append={},
            scalars={
                "bootstrapped": True,
                "next_seq": len(pdf),
                "pages": 0,
                "items": 0,
            },
        )

    def _apply_slot_mode(self, df: DataFrame) -> DataFrame:
        """J4/C4 IP branch: under ``slot_key_mode="ip"`` rewrite the
        politeness slot from the domain to its resolved IP (memoized per
        executor batch — operators/ipslots.py), so vhosts sharing a server
        share one slot, as upstream does with CONCURRENT_REQUESTS_PER_IP.

        meta['download_slot'] must win over the resolved IP (upstream
        get_slot_key checks meta FIRST). Callers that already dropped
        the ``meta_slot`` column (the candidates union selects only
        ``cand_cols``) get it re-derived from ``meta_json`` here —
        without this, a redirect child of a download_slot-carrying seed
        was silently re-slotted to the IP."""
        if self.cfg.slot_key_mode != "ip":
            return df
        from ..functions.meta import meta_get
        from ..operators.ipslots import with_ip_slot

        added = False
        if "meta_slot" not in df.columns and "meta_json" in df.columns:
            df = df.withColumn(
                "meta_slot", meta_get(F.col("meta_json"), "download_slot")
            )
            added = True
        out = with_ip_slot(df, resolver=self.resolver)
        return out.drop("meta_slot") if added else out

    def _rebuild_bloom(self) -> None:
        """Resume/regrow path: re-populate the bloom from the committed
        url_seen snapshot — built DISTRIBUTED (per-partition bit-arrays
        OR-merged via treeReduce, operators/bloom.py): the driver never
        collects a fingerprint, so the rebuild holds at 10^10-key url_seen
        scale. Capacity is sized from the ACTUAL seen-set count (2× for
        growth headroom), never a hardcoded constant — a saturated filter
        silently degrades to 'everything maybe-seen'."""
        if self.bloom is None:
            return
        seen = self.store.read("url_seen")
        if seen is not None:
            capacity = max(self.bloom.capacity, 2 * seen.count(), 1_000_000)
            if isinstance(self.bloom, ShardedCuckoo):
                from ..operators.cuckoo import build_cuckoo_from_df

                self.bloom = build_cuckoo_from_df(seen, capacity=capacity)
            elif getattr(self.bloom, "prefers_shard_partitioning", False):
                from ..operators.diskfilter import build_disk_cuckoo_from_df

                self.bloom = build_disk_cuckoo_from_df(
                    self.spark,
                    str(self.bloom.root.parent),
                    seen,
                    capacity=capacity,
                )
            else:
                from ..operators.bloom import build_bloom_from_df

                self.bloom = build_bloom_from_df(
                    seen, capacity=capacity, fpr=self.cfg.bloom_fpr
                )

    def expire_seen(self, before_epoch: int) -> int:
        """Recrawl/expiry maintenance — the op the cuckoo filter's
        deletion exists for: drop every url_seen row with
        ``epoch_added < before_epoch`` so those URLs dedupe as FRESH on
        their next sighting (upstream Scrapy has no TTL; this is the
        deltafetch-style recrawl policy a long-running frontier needs).

        url_seen shrinks via the store's keyed-delete path (MOR deltas,
        same machinery as frontier pops). The prefilter updates in place
        when it supports deletion (ShardedCuckoo.delete_df — executors
        derive (shard, tag, bucket) quads, no fingerprint reaches the
        driver); the bloom can't delete, so it rebuilds distributed from
        the retained snapshot. Returns the number of fps expired."""
        if before_epoch <= 0:
            # epoch_added is never negative (bootstrap commits at 0), so
            # the scan is guaranteed empty — skip it: paying a full
            # url_seen job every early epoch is exactly the per-epoch
            # fixed cost the batched-stats/concurrent-commit work removed
            return 0
        seen = self.store.read("url_seen")
        if seen is None:
            return 0
        expired = seen.filter(F.col("epoch_added") < before_epoch).cache()
        n = expired.count()
        if n:
            metrics_row = self.spark.createDataFrame(
                [(int(self.store.epoch), -1, "seen/expired", float(n))],
                schemas.METRICS,
            )
            self.store.commit(
                self.store.epoch,
                replace={},
                append={"metrics": metrics_row},
                scalars=self.store.scalars,
                # empty inserts in the TABLE'S OWN schema (stored url_seen
                # carries the derived bucket column on top of URL_SEEN).
                # Delete on the GENERATION-AWARE composite key — a fp
                # expired here may be recrawled and re-inserted later with
                # a fresh epoch_added; a bare-fp delete delta would keep
                # matching (and silently dropping) every such re-insert
                # until compaction, making the URL permanently "fresh".
                mutate={
                    "url_seen": (
                        ["fp", "epoch_added"],
                        expired.select("fp", "epoch_added"),
                        seen.limit(0),
                    )
                },
            )
            if hasattr(self.bloom, "delete_df"):  # cuckoo variants
                self.bloom.delete_df(expired.select("fp"))
            elif self.bloom is not None:  # bloom can't delete: rebuild
                self._rebuild_bloom()
        expired.unpersist()
        return n

    # ------------------------------------------------------------------ run
    def run(self, max_epochs: int | None = None) -> list[EpochStats]:
        cfg = self.cfg
        limit = max_epochs if max_epochs is not None else cfg.max_epochs
        start = self.store.epoch + 1
        prev_q = self.stats_log[-1].queued_after if self.stats_log else None
        for e in range(start, start + limit):
            stats = self.run_epoch(e)
            # Frontier row conservation: rows only leave by being popped or
            # robots-denied and only enter via enqueued (retries + fresh +
            # redirect re-entries). A mismatch means a frontier delta was
            # silently lost or duplicated between the stats action and the
            # commit (this invariant caught the global_seq pid-join row
            # loss); fail the crawl rather than diverge quietly.
            if prev_q is not None:
                expected = prev_q - stats.popped - stats.denied + stats.enqueued
                if stats.queued_after != expected:
                    raise RuntimeError(
                        f"frontier conservation violated at epoch {e}: "
                        f"queued_after={stats.queued_after} but "
                        f"{prev_q} - popped {stats.popped} - denied "
                        f"{stats.denied} + enqueued {stats.enqueued} "
                        f"= {expected}"
                    )
            prev_q = stats.queued_after
            self.stats_log.append(stats)
            if cfg.seen_ttl_epochs > 0:
                # rows added at epoch a expire once e - a >= ttl
                self.expire_seen(e - cfg.seen_ttl_epochs + 1)
            sc = self.store.scalars
            if stats.queued_after == 0:
                break
            if cfg.close_itemcount and sc["items"] >= cfg.close_itemcount:
                break
            if cfg.close_pagecount and sc["pages"] >= cfg.close_pagecount:
                break
            if (
                cfg.close_errorcount
                and sc.get("errors", 0) >= cfg.close_errorcount
            ):
                break
            # CLOSESPIDER_TIMEOUT on the virtual clock: epoch e spans
            # [e·q, (e+1)·q) ms of simulated time
            if (
                cfg.close_timeout_s
                and (e + 1) * cfg.epoch_quantum_ms
                >= cfg.close_timeout_s * 1000.0
            ):
                break
        return self.stats_log

    # ------------------------------------------------------------- one epoch
    def run_epoch(self, e: int) -> EpochStats:
        # SPARK_GRAFT_EPOCH_TRACE=1 prints per-phase wall times (each phase
        # boundary is a driver action = one Spark job chain)
        trace_on = os.environ.get("SPARK_GRAFT_EPOCH_TRACE") == "1"
        t_last = time.time()

        def trace(phase: str) -> None:
            nonlocal t_last
            if trace_on:
                now = time.time()
                print(f"    epoch {e} {phase}: {now - t_last:.2f}s", flush=True)
                t_last = now

        cfg, spark = self.cfg, self.spark
        ts = e * cfg.epoch_quantum_ms
        budget = cfg.epoch_budget or cfg.concurrent_requests
        # cache the MOR-resolved frontier for the epoch: the resolve
        # (base ∪ delta-inserts, anti delete-keys) would otherwise be
        # re-evaluated by every frontier-touching action this epoch
        frontier = self.store.read("frontier").cache()
        dom = self.store.read("domain_state")
        url_seen = self.store.read("url_seen")
        next_seq = int(self.store.scalars["next_seq"])

        # SEMANTICS 1: politeness eligibility (join with per-slot state)
        elig = frontier.join(F.broadcast(dom), "slot", "left").withColumn(
            "next_free_at", F.coalesce(F.col("next_free_at"), F.lit(0))
        )
        e0 = elig.filter(F.col("next_free_at") <= ts)

        # SEMANTICS 2: robots discovery (one-epoch wait for unknown domains)
        empty_sel = spark.createDataFrame([], "slot string")
        live_robots = cfg.robotstxt_obey and cfg.robots_source == "http"
        new_domain_urls = None
        if cfg.robotstxt_obey:
            waiting = e0.filter(F.col("robots_epoch").isNull())
            new_domains = waiting.select("slot").distinct()
            if live_robots:
                # one representative frontier URL per domain: the robots
                # URL derives from ITS authority (netfetch.fetch_robots),
                # fetched during the domain's one-epoch wait. min(url) for
                # determinism. In slot_key_mode="ip" several domains can
                # share one waiting slot — each still gets its own fetch.
                # Domains already covered by the STATIC robots table are
                # never live-fetched: their rules are authoritative, and
                # fetching them would put a second row for the domain
                # into the gate's left join (every frontier row would
                # pop twice and trip the conservation check).
                new_domain_urls = waiting.groupBy("domain").agg(
                    F.min("url").alias("url")
                ).join(self.robots.select("domain"), "domain", "left_anti")
            poppable = e0.filter(
                F.col("robots_epoch").isNotNull() & (F.col("robots_epoch") < e)
            )
        else:
            new_domains = empty_sel
            poppable = e0

        # SEMANTICS 3: robots gate (count deferred to the batched collect)
        if cfg.robotstxt_obey:
            robots_tbl = self.robots
            if live_robots:
                # live-fetched rules accumulated in the store. The gate's
                # left join requires ONE row per domain: static rules win
                # (their domains are never live-fetched, above), and the
                # live rows collapse latest-epoch-wins as a belt-and-
                # braces guard (a resumed run could have fetched a domain
                # under an older static table)
                fetched_rules = self.store.read("robots_http")
                if fetched_rules is not None:
                    live_rules = (
                        fetched_rules.groupBy("domain")
                        .agg(F.max_by("rules", "epoch").alias("rules"))
                        .join(
                            self.robots.select("domain"), "domain", "left_anti"
                        )
                    )
                    robots_tbl = robots_tbl.select("domain", "rules").unionByName(
                        live_rules
                    )
            allowed, denied = apply_robots_gate(poppable, robots_tbl, cfg)
            denied = denied.select("seq", "fp").cache()
        else:
            allowed, denied = poppable, None
        trace('robots_gate')

        # Per-domain page budget (beyond upstream; the Heritrix
        # maxDocsPerHost / Nutch generate.max.count analog — at 10^10-URL
        # scale a handful of mega-hosts would otherwise absorb the whole
        # politeness-bounded crawl). Slots whose CUMULATIVE pop count has
        # reached the budget get their remaining frontier rows dropped
        # like robots denials (deleted + counted), so the crawl still
        # terminates. Enforced at epoch granularity against committed
        # pop_log history: an epoch may overshoot by at most that slot's
        # per-epoch concurrency cap — the precise-counter alternative
        # would serialize pop on a per-slot running total.
        budget_dropped = None
        slot_pops_prev = None
        if cfg.domain_page_budget > 0:
            # cumulative per-slot pop counts ride a tiny replace-table
            # (one row per ever-popped slot, O(slots) per epoch) — an
            # earlier cut re-aggregated the whole pop_log delta chain
            # every epoch, O(total pops so far), quadratic over a crawl
            slot_pops_prev = self.store.read("slot_pops")
            if slot_pops_prev is not None:
                exhausted = slot_pops_prev.filter(
                    F.col("n_pops") >= cfg.domain_page_budget
                ).select("slot")
                budget_dropped = (
                    allowed.join(F.broadcast(exhausted), "slot", "left_semi")
                    .select("seq", "fp")
                    .cache()
                )
                allowed = allowed.join(
                    F.broadcast(exhausted), "slot", "left_anti"
                )

        # SEMANTICS 4: pop
        conc_default = F.lit(cfg.concurrent_per_domain)
        allowed = allowed.withColumn(
            "concurrency", F.coalesce(F.col("concurrency"), conc_default)
        )
        popped = rank_and_pop(
            allowed,
            cfg,
            budget,
            pretrim_cap=self.max_cap if self.pretrim else None,
        )
        popped = popped.select(*FRONTIER_COLS, "slot_rank", "rank").cache()
        trace('pop')

        # SEMANTICS 5: fetch (+ lineage partition id); optional cache
        # replay first (S6/J6, operators/httpcache.py — default off)
        n_cache_hits = 0
        to_fetch = popped
        hits = None
        reval_src = None  # rfc2616 policy: stale cached rows for merge_304
        if cfg.httpcache_enabled:
            if cfg.fetch_backend == "http":
                # full-response replay (ref HttpCacheMiddleware — the
                # cache exists precisely to short-circuit REAL fetches):
                # the store's own http_cache table plus any carried-over
                # cache from a previous run (Scrapy's persistent
                # .scrapy/httpcache analog)
                from ..operators.httpcache import (
                    split_http_cache_hits,
                    split_rfc2616_cache,
                )

                cache = self.store.read("http_cache")
                if self.http_cache is not None:
                    cache = (
                        cache.unionByName(
                            self.http_cache, allowMissingColumns=True
                        )
                        if cache is not None
                        else self.http_cache
                    )
                if cfg.httpcache_policy == "rfc2616":
                    # HTTPCACHE_POLICY=RFC2616Policy: freshness decides —
                    # fresh replays, stale-with-validators revalidates
                    # (conditional GET → merge_304 below), the rest miss
                    hits, to_fetch, reval_src = split_rfc2616_cache(
                        popped, cache, ts, int(time.time())
                    )
                else:
                    hits, to_fetch = split_http_cache_hits(popped, cache, ts)
            else:
                hits, to_fetch = split_cache_hits(
                    popped, self.store.read("fetch_log"), ts
                )
        if cfg.fetch_backend == "http":
            # real network fetch (operators/netfetch.py): same downstream
            # contract; bodies ride along for the html/items branches
            from ..operators.netfetch import engine_fetch

            if cfg.cookies_enabled:
                # cookies middleware request half: fold the slot jar into
                # a Cookie header (operators/cookies.py; ref
                # downloadermiddlewares/cookies.py process_request)
                from ..operators.cookies import with_cookie_header

                to_fetch = with_cookie_header(to_fetch, self.store.read("cookies"))
            if cfg.pre_fetch_hook is not None:  # U2 user slot (innermost)
                to_fetch = cfg.pre_fetch_hook(to_fetch)
            fetched = engine_fetch(to_fetch, cfg, ts)
            if cfg.post_fetch_hook is not None:
                fetched = cfg.post_fetch_hook(fetched)
            if reval_src is not None:
                # rfc2616: 304 Not Modified → serve the stored response,
                # refreshed (operators/httpcache.py::merge_304) — must
                # run before retry/redirect/httperror classification so
                # a revalidated row re-enters the chain as its cached 200
                from ..operators.httpcache import merge_304

                fetched = merge_304(fetched, reval_src)
            if cfg.httpcache_enabled:
                fetched = fetched.withColumn("from_cache", F.lit(False))
        else:
            if cfg.pre_fetch_hook is not None:
                to_fetch = cfg.pre_fetch_hook(to_fetch)
            fetched = synthetic_fetch(to_fetch, self.url_map, cfg, ts, self.redirect_map)
            if cfg.post_fetch_hook is not None:
                fetched = cfg.post_fetch_hook(fetched)
        if cfg.httpcache_enabled and hits is not None:
            if cfg.fetch_backend != "http":
                hits = hits.withColumn("redirect_to", F.lit(None).cast("string"))
                fetched = fetched.unionByName(hits.select(*fetched.columns))
            else:
                # replayed hits lack the live-fetch-only columns
                # (set_cookie, cookie_header) — filled as nulls; cached
                # responses do not re-run the cookies middleware
                fetched = fetched.unionByName(hits, allowMissingColumns=True)
            # count deferred to the batched stats action ("cachehit" tag)
        has_metarefresh = (
            cfg.fetch_backend == "http" and cfg.metarefresh_enabled
        )
        if has_metarefresh:
            # MetaRefreshMiddleware (redirect.py ≈L90): decode 200-HTML
            # bodies ONCE here, before the epoch cache — the decoded
            # ``html`` column is cached and reused by the link-extraction
            # stage (html_pages), so enabling meta-refresh adds zero
            # extra Arrow decode passes. ``mr_url`` is pure JVM regexp
            # over that column, resolved against the request URL exactly
            # like a Location header.
            from ..functions.linkextract import meta_refresh_target
            from ..operators.netfetch import _urljoin_udf, decode_text_udf

            # any-status HTML, like upstream's isinstance(HtmlResponse)
            # check. The inner when() masks the BYTES fed to the UDF —
            # Spark hoists Python UDFs out of conditionals, so without
            # the mask every non-HTML body (images!) would be decoded.
            is_html = F.col("content_type").startswith("text/html")
            fetched = fetched.withColumn(
                "html",
                F.when(
                    is_html,
                    decode_text_udf(
                        F.when(is_html, F.col("body")),
                        F.col("content_type"),
                        F.col("content_encoding"),
                    ),
                ),
            ).withColumn(
                "mr_url",
                _urljoin_udf(
                    F.col("url"),
                    meta_refresh_target(
                        F.col("html"),
                        cfg.metarefresh_maxdelay,
                        cfg.metarefresh_ignore_tags,
                    ),
                ),
            )
        fetched = fetched.withColumn("partition_id", F.spark_partition_id()).cache()
        # status 0 = network/transport error (http backend) — retryable,
        # like the reference's connection-error path (retry.py ≈L40);
        # the synthetic fetcher never emits 0, so parity is unaffected
        from ..functions.meta import meta_get, meta_get_list, redirect_child_meta

        # meta escape hatches honored like upstream: meta['dont_retry']
        # (retry.py ≈L55), meta['dont_redirect'] (redirect.py ≈L45), and
        # meta['handle_httpstatus_list'] / 'handle_httpstatus_all'.
        # Only RedirectMiddleware (redirect.py ≈L45) and HttpError
        # (httperror.py ≈L40) consult handle_httpstatus — RetryMiddleware
        # has NO such early-out, so a handled 503 still retries first and
        # the handled response is delivered only when retries exhaust
        # (matching the upstream middleware chain; use dont_retry to skip
        # retries outright)
        dont_retry = F.coalesce(
            meta_get(F.col("meta_json"), "dont_retry") == "true", F.lit(False)
        )
        dont_redirect = F.coalesce(
            meta_get(F.col("meta_json"), "dont_redirect") == "true", F.lit(False)
        )
        status_handled = F.coalesce(
            (meta_get(F.col("meta_json"), "handle_httpstatus_all") == "true")
            | F.array_contains(
                meta_get_list(F.col("meta_json"), "handle_httpstatus_list"),
                F.col("status").cast("string"),
            ),
            F.lit(False),
        )
        # dataloss: a maxsize-truncated body is a download failure when
        # DOWNLOAD_FAIL_ON_DATALOSS (upstream default) — retried like a
        # transport error; with the flag off the partial response passes
        # through. The synthetic fetcher has no truncated column.
        dataloss = (
            F.coalesce(F.col("truncated"), F.lit(False))
            & F.lit(cfg.download_fail_on_dataloss)
            if "truncated" in fetched.columns
            else F.lit(False)
        )
        retryable = (
            F.col("status").isin(list(cfg.retry_http_codes))
            | (F.col("status") == 0)
            | dataloss
        ) & ~dont_retry
        # all upstream redirect codes (redirect.py allowed_status: 301, 302,
        # 303, 307, 308), gated on an actual Location — a 30x without one
        # passes through as a terminal response, as upstream lets it
        is_redirect = (
            F.col("status").isin([301, 302, 303, 307, 308])
            & F.col("redirect_to").isNotNull()
            & ~dont_redirect
        )
        # handle_httpstatus never applies to status 0 (no response at all,
        # connection error) nor to dataloss failures (upstream raises
        # ResponseFailed in the downloader — no response reaches the
        # spider middlewares)
        handled = status_handled & (F.col("status") != 0) & ~dataloss
        # the redirect hop target, if any: Location (30x) first, then a
        # meta-refresh on any HTML response the 30x branch didn't take —
        # upstream's reverse-response-order chain (Redirect 600 →
        # MetaRefresh 580 → Retry 550), so meta-refresh outranks retry
        # and, unlike RedirectMiddleware, never consults handle_httpstatus
        # (redirect.py ≈L90: only dont_redirect gates it). dataloss rows
        # never reach the middlewares upstream, so they are excluded.
        hop = F.when(
            # redirect suppression is the one downloader-mw early-out
            # handle_httpstatus has (redirect.py ≈L45); dataloss excluded
            # on BOTH branches — upstream raises in the downloader before
            # any middleware, so a truncated 30x retries instead of
            # following its Location
            is_redirect & ~handled & ~dataloss,
            F.col("redirect_to"),
        )
        if has_metarefresh:
            hop = hop.when(
                F.col("mr_url").isNotNull() & ~dont_redirect & ~dataloss,
                F.col("mr_url"),
            )
        fetched = fetched.withColumn("hop_url", hop).withColumn(
            # redirect_reasons meta entry: the status code for Location
            # hops, the upstream literal "meta refresh" otherwise
            "hop_reason",
            F.when(
                is_redirect & ~handled, F.col("status").cast("string")
            ).otherwise(F.lit("meta refresh")),
        )
        outcome = (
            F.when(
                F.col("hop_url").isNotNull(),
                F.when(
                    F.col("redirects") < cfg.redirect_max_times, F.lit("redirect")
                ).otherwise(F.lit("failed")),
            )
            .when((F.col("status") == 200) & ~dataloss, F.lit("done"))
            # retry BEFORE handled-status delivery: RetryMiddleware has no
            # handle_httpstatus early-out upstream
            .when(retryable & (F.col("retries") < cfg.retry_times), F.lit("retry"))
            .when(handled, F.lit("done"))
            .otherwise(F.lit("failed"))
        )
        fetched = fetched.withColumn("outcome", outcome)
        trace('fetch+outcome')

        done = fetched.filter(F.col("outcome") == "done")

        # SEMANTICS 6: politeness watermark update — only requests that
        # reached the downloader consume delay (cache hits short-circuit
        # before the slot, ref HttpCacheMiddleware; to_fetch == popped
        # when the cache is off)
        pops_per_slot = to_fetch.groupBy("slot").agg(F.count(F.lit(1)).alias("k"))
        # Register slots discovered AFTER bootstrap: both state updates
        # below LEFT-join onto domain_state and preserve its row set, so
        # without this a post-bootstrap domain never gets a row —
        # mark_robots_fetched has nothing to stamp (its frontier rows
        # wait forever and live robots refetches every epoch) and
        # update_next_free drops its pop counts (no politeness delay).
        # Under the robots gate only WAITING slots can lack rows (a
        # poppable row implies robots_epoch was stamped, which implies
        # the row exists); with the gate off, popped slots can. Defaults
        # mirror the simulator's unknown-slot behavior (SEMANTICS 1):
        # cfg delay/concurrency, watermark 0, robots unfetched.
        fresh_slots = (
            new_domains if cfg.robotstxt_obey else pops_per_slot.select("slot")
        )
        missing_state = fresh_slots.join(
            dom.select("slot"), "slot", "left_anti"
        ).select(
            "slot",
            F.lit(0).cast("long").alias("next_free_at"),
            F.lit(cfg.download_delay_ms).cast("long").alias("delay_ms"),
            F.lit(cfg.concurrent_per_domain).cast("int").alias("concurrency"),
            F.lit(None).cast("double").alias("latency_ema"),
            F.lit(None).cast("int").alias("robots_epoch"),
        )
        dom_grown = dom.unionByName(missing_state)
        dom_next = pol.update_next_free(
            pol.mark_robots_fetched(dom_grown, new_domains, e)
            if cfg.robotstxt_obey
            else dom_grown,
            pops_per_slot,
            ts,
        )
        if cfg.autothrottle_enabled:  # A6, ref throttle.py ≈L55 (default off)
            # latency evidence = real downloader responses only: cache
            # replays (latency 0, never saw the network — upstream
            # AutoThrottle runs below HttpCacheMiddleware) and transport
            # errors (status 0, no response latency) are excluded
            lat_src = fetched.filter(F.col("status") > 0)
            if "from_cache" in fetched.columns:
                lat_src = lat_src.filter(~F.coalesce(F.col("from_cache"), F.lit(False)))
            latencies = lat_src.groupBy("slot").agg(
                F.avg("latency_ms").alias("avg_latency_ms"),
                F.sum(F.when(F.col("status") < 400, 1).otherwise(0)).alias("ok_count"),
            )
            dom_next = pol.autothrottle(
                dom_next,
                latencies,
                cfg,
                target_concurrency=cfg.autothrottle_target_concurrency,
                max_delay_ms=cfg.autothrottle_max_delay_ms,
            )

        # SEMANTICS 7-8: redirect children + links pipeline
        # candidate column set shared by redirect/link/retry rows
        cand_cols = [
            "kind",
            "parent_seq",
            "parent_fp",
            "fp",
            "url",
            "url_canon",
            "domain",
            "slot",
            "depth",
            "priority",
            "retries",
            "redirects",
            "dont_filter",
            "referer",
            "meta_json",
        ]
        # cached: the kept→identity branch and the drop-counts branch both
        # consume links_raw — without the cache each re-scans the source
        if cfg.fetch_backend == "http":
            # links from the FETCHED HTML bodies: decompress + charset-
            # detect (C6/C7) then extract (C13) — the real-crawl path
            from ..operators.netfetch import html_pages

            pages = html_pages(done).select(
                "url_canon",
                "html",
                F.col("url").alias("parent_url"),
                F.col("depth").alias("parent_depth"),
                F.col("seq").alias("parent_seq"),
                F.col("fp").alias("parent_fp"),
            )
            exploded = explode_page_links(
                pages,
                "html",
                "url_canon",
                restrict_css=tuple(cfg.restrict_css),
                restrict_xpaths=tuple(cfg.restrict_xpaths),
                extract_imgs=cfg.extract_img_links,
            )
            ldepth = F.col("parent_depth") + 1
            links_raw = exploded.select(
                F.col("dst_url").alias("url"),
                ldepth.cast("int").alias("depth"),
                (-ldepth * F.lit(cfg.depth_priority)).cast("int").alias("priority"),
                "parent_seq",
                "parent_fp",
                "parent_url",
                # the discovering page's alt/anchor text: rides into the
                # request's meta and becomes the fetched image's caption
                "link_caption",
            )
        else:
            links_raw = extract_links(done, self.graph, cfg)
        # S5 SitemapSpider analog (sitemap.py ≈L15): XML sitemap responses
        # feed the frontier — <urlset> locs ride the normal link-filter
        # chain, <sitemapindex> locs (+ robots.txt ``Sitemap:`` seeds in
        # live-robots mode) bypass it like upstream _parse_sitemap requests
        sm_xml = None
        sitemap_src = None
        if cfg.sitemap_follow and cfg.fetch_backend == "http":
            from ..operators.netfetch import decode_text_udf
            from ..functions.linkextract import (
                robots_sitemap_urls_udf,
                sitemap_parts_udf,
            )

            sm_depth = F.col("parent_depth") + 1
            sm_xml = (
                done.filter(F.col("content_type").rlike("(?i)xml"))
                .select(
                    F.col("url").alias("parent_url"),
                    F.col("depth").alias("parent_depth"),
                    F.col("seq").alias("parent_seq"),
                    F.col("fp").alias("parent_fp"),
                    decode_text_udf(
                        F.col("body"),
                        F.col("content_type"),
                        F.col("content_encoding"),
                    ).alias("xml"),
                )
                .withColumn("__sm", sitemap_parts_udf(F.col("xml")))
                .cache()  # pages + children branches share the decode
            )
            links_raw = links_raw.unionByName(
                sm_xml.select(
                    F.explode("__sm.pages").alias("url"),
                    sm_depth.cast("int").alias("depth"),
                    (-sm_depth * F.lit(cfg.depth_priority))
                    .cast("int")
                    .alias("priority"),
                    "parent_seq",
                    "parent_fp",
                    "parent_url",
                    F.lit(None).cast("string").alias("link_caption"),
                )
            )
            sitemap_src = sm_xml.select(
                F.explode("__sm.children").alias("url"),
                sm_depth.cast("int").alias("depth"),
                (-sm_depth * F.lit(cfg.depth_priority)).cast("int").alias("priority"),
                "parent_seq",
                "parent_fp",
            )
            if cfg.sitemap_follow_patterns:
                # upstream sitemap_follow regexes gate index children only
                follow = F.lit(False)
                for pat in cfg.sitemap_follow_patterns:
                    follow = follow | F.col("url").rlike(pat)
                sitemap_src = sitemap_src.filter(follow)
            if live_robots:
                # Sitemap: lines from robots rules fetched LAST epoch
                # (the fetch materialized in epoch e-1's commit)
                prev_rules = self.store.read("robots_http")
                if prev_rules is not None:
                    sitemap_src = sitemap_src.unionByName(
                        prev_rules.filter(
                            (F.col("epoch") == e - 1) & F.col("rules").isNotNull()
                        ).select(
                            F.explode(
                                robots_sitemap_urls_udf(F.col("rules"))
                            ).alias("url"),
                            F.lit(0).alias("depth"),
                            F.lit(0).alias("priority"),
                            F.lit(-1).cast("long").alias("parent_seq"),
                            F.lit(None).cast("binary").alias("parent_fp"),
                        )
                    )
            if cfg.depth_limit:
                # DepthMiddleware applies to sitemap requests upstream too
                sitemap_src = sitemap_src.filter(
                    F.col("depth") <= cfg.depth_limit
                )
        links_raw = links_raw.cache()
        kept, drop_counts_df = split_links(links_raw, cfg)  # counts batched below
        trace('links_split')
        # U3 referer: each link candidate's Referer value is computed from
        # its parent response URL under REFERRER_POLICY (W3C table,
        # functions/referer.py; ref spidermiddlewares/referer.py ≈L250)
        from ..functions.referer import with_referer

        link_cand = (
            with_request_identity(kept, impl=cfg.fingerprint_impl)
            .transform(
                lambda d: with_referer(
                    d, cfg.referrer_policy, parent_col="parent_url"
                )
                # the referer value is only ever CONSUMED by the http
                # fetcher's request headers — the synthetic parity path
                # carries a NULL column instead of paying an extra
                # Python pass per link candidate in the hot loop
                if cfg.fetch_backend == "http"
                and cfg.referrer_policy != "no-referrer"
                and "parent_url" in d.columns
                else d.withColumn("referer", F.lit(None).cast("string"))
            )
            .withColumn("kind", F.lit(2))
            .withColumn("retries", F.lit(0))
            .withColumn("redirects", F.lit(0))
            .withColumn("dont_filter", F.lit(False))
            # fresh meta — except the discovering page's alt/anchor text,
            # which rides as meta['caption'] so the fetched image persists
            # as an (image, caption) pair (to_json escapes arbitrary text)
            .transform(
                lambda d: d.withColumn(
                    "meta_json",
                    F.when(
                        F.col("link_caption").isNotNull(),
                        F.to_json(
                            F.struct(F.col("link_caption").alias("caption"))
                        ),
                    ),
                ).drop("link_caption")
                if "link_caption" in d.columns
                else d.withColumn("meta_json", F.lit(None).cast("string"))
            )
        )
        # redirect children (J7, ref redirect.py ≈L70): skip the 8b spider-
        # middleware filters, inherit dont_filter, depth unchanged
        redir_src = fetched.filter(F.col("outcome") == "redirect").select(
            F.col("hop_url").alias("url"),
            F.col("depth"),
            (F.col("priority") + cfg.redirect_priority_adjust)
            .cast("int")
            .alias("priority"),
            F.col("seq").alias("parent_seq"),
            F.col("fp").alias("parent_fp"),
            (F.col("redirects") + 1).cast("int").alias("redirects"),
            F.col("dont_filter"),
            # redirect child = request.replace(url=...) upstream — headers
            # (incl. Referer) carry over unchanged (redirect.py ≈L80)
            F.col("referer"),
            # meta carries over + redirect_urls/reasons/times bookkeeping
            # (C11; redirect.py ≈L50)
            redirect_child_meta(
                F.col("meta_json"), F.col("url"), F.col("hop_reason")
            ).alias("meta_json"),
        )
        redir_cand = (
            with_request_identity(
                # meta['download_slot'] survives the hop (C4: meta wins
                # over the hostname in get_slot_key)
                redir_src.withColumn(
                    "meta_slot", meta_get(F.col("meta_json"), "download_slot")
                ),
                impl=cfg.fingerprint_impl,
            )
            .withColumn("kind", F.lit(1))
            .withColumn("retries", F.lit(0))
        )
        candidates = redir_cand.select(*cand_cols).unionByName(
            link_cand.select(*cand_cols)
        )
        if sitemap_src is not None:
            # sitemap fetches (kind=3): skip the 8b LinkExtractor filters
            # like redirect children, but dupefilter/robots/depth apply
            sm_cand = (
                with_request_identity(sitemap_src, impl=cfg.fingerprint_impl)
                .withColumn("kind", F.lit(3))
                .withColumn("retries", F.lit(0))
                .withColumn("redirects", F.lit(0))
                .withColumn("dont_filter", F.lit(False))
                .withColumn("referer", F.lit(None).cast("string"))
                .withColumn("meta_json", F.lit(None).cast("string"))
            )
            candidates = candidates.unionByName(sm_cand.select(*cand_cols))
        candidates = candidates.transform(self._apply_slot_mode).cache()
        filterable = candidates.filter(~F.col("dont_filter"))
        bypass = candidates.filter(F.col("dont_filter"))
        # one action for both counts (materializes the cache too)
        df_counts = {
            bool(r["dont_filter"]): r["n"]
            for r in candidates.groupBy("dont_filter")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        trace('identity+cand_count')
        n_filterable = df_counts.get(False, 0)
        n_bypass = df_counts.get(True, 0)
        batch_unique = dedupe_within_epoch(filterable)
        fresh = anti_join_seen(
            batch_unique, url_seen, self.bloom, n_candidates=n_filterable
        ).cache()

        def _absorb_fresh() -> int:
            # runs CONCURRENTLY with the batched stats action below (the
            # two jobs touch independent driver state; racing to fill the
            # `fresh` cache is safe) — overlapping them removes one full
            # sequential job launch per epoch
            if self.bloom is None:
                return fresh.count()
            # one action: the executor-side bloom absorb's treeReduce
            # doubles as the fresh-row count (no fp ever hits the driver)
            try:
                return self.bloom.absorb_df(fresh.select("fp"))
            except Exception as absorb_err:  # noqa: BLE001
                # an epoch whose fresh batch exceeds the post-commit
                # regrow's ~10% headroom over-fills the cuckoo mid-absorb
                # (a hard error, unlike bloom's graceful FPR drift) —
                # recover by rebuilding at 2× over committed-seen ∪ this
                # batch instead of crashing the epoch. The partially
                # spliced filter is discarded wholesale, so no torn state
                # survives. Match the two recoverable MESSAGES (driver-
                # resident absorbs raise RuntimeError directly, executor-
                # resident ones surface wrapped in a Spark
                # PythonException) — a bare isinstance(RuntimeError)
                # check would also swallow unrelated failures and mask
                # them behind a full rebuild every epoch. A _splice
                # layout mismatch means foreign/stale filter state (e.g.
                # a checkpoint written by a different sizing) — the
                # rebuild below restores the canonical layout from the
                # committed seen set (the source of truth), so it cannot
                # recur next epoch; warn so the anomaly stays visible.
                msg = str(absorb_err)
                if "differently-sized cuckoo" in msg:
                    import warnings

                    warnings.warn(
                        "seen-filter layout mismatch during absorb; "
                        "rebuilding from committed url_seen: " + msg,
                        RuntimeWarning,
                        stacklevel=2,
                    )
                elif "over capacity" not in msg:
                    raise
                n_fresh = fresh.count()
                all_fps = fresh.select("fp")
                if url_seen is not None:
                    all_fps = url_seen.select("fp").unionByName(all_fps)
                capacity = max(2 * (self.bloom.n_added + n_fresh), 1_000_000)
                if isinstance(self.bloom, ShardedCuckoo):
                    from ..operators.cuckoo import build_cuckoo_from_df

                    self.bloom = build_cuckoo_from_df(
                        all_fps, capacity=capacity
                    )
                elif getattr(self.bloom, "prefers_shard_partitioning", False):
                    from ..operators.diskfilter import (
                        build_disk_cuckoo_from_df,
                    )

                    self.bloom = build_disk_cuckoo_from_df(
                        self.spark,
                        str(self.bloom.root.parent),
                        all_fps,
                        capacity=capacity,
                    )
                else:  # pragma: no cover - bloom absorbs never raise
                    raise
                return n_fresh

        # retries (SEMANTICS 7): dont_filter=True, priority adjusted
        retries = (
            fetched.filter(F.col("outcome") == "retry")
            .select(
                F.lit(0).alias("kind"),
                F.col("seq").alias("parent_seq"),
                F.col("parent_fp"),
                F.col("fp"),
                F.col("url"),
                F.col("url_canon"),
                F.col("domain"),
                F.col("slot"),
                F.col("depth"),
                (F.col("priority") + cfg.retry_priority_adjust).cast("int").alias("priority"),
                (F.col("retries") + 1).alias("retries"),
                F.col("redirects"),
                F.lit(True).alias("dont_filter"),
                F.col("referer"),  # retry = same request, headers unchanged
                F.col("meta_json"),  # retry = same request, meta unchanged
            )
        )
        fresh_links = fresh.select(*cand_cols).unionByName(bypass.select(*cand_cols))

        # SEMANTICS 8f: deterministic seq assignment — a DISTRIBUTED dense
        # rank (operators/pop.py global_seq): the old single-partition
        # Window.orderBy funneled every new link of the epoch through one
        # task, the epoch's serial bottleneck at cluster batch sizes
        from ..operators.pop import global_seq

        new_rows = (
            global_seq(
                retries.unionByName(fresh_links),
                ["kind", "parent_seq", "url_canon", "url"],
                start=next_seq,
            )
            .withColumn("epoch_added", F.lit(e))
            .withColumn("status", F.lit("QUEUED"))
            .select(*FRONTIER_COLS)
        )

        # frontier': remove popped + denied, add new
        frontier_next = frontier.join(
            F.broadcast(popped.select("seq")), "seq", "left_anti"
        )
        if denied is not None:
            frontier_next = frontier_next.join(
                F.broadcast(denied.select("seq")), "seq", "left_anti"
            )
        if budget_dropped is not None:
            frontier_next = frontier_next.join(
                F.broadcast(budget_dropped.select("seq")), "seq", "left_anti"
            )
        frontier_next = (
            frontier_next.select(*FRONTIER_COLS).unionByName(new_rows).cache()
        )

        # ---- ONE batched stats action (each driver action is a full Spark
        # job — epoch overhead is job count): popped/denied totals, per-
        # (partition, status, outcome) fetch stats, link drop reasons, and
        # the post-epoch queue depth, unioned as tagged aggregates.
        def _tag(df, tag, k1=F.lit(""), k2=F.lit("")):
            return df.select(
                F.lit(tag).alias("t"),
                k1.cast("string").alias("k1"),
                k2.cast("string").alias("k2"),
                F.col("n").cast("long").alias("n"),
            )

        stat_frames = [
            _tag(popped.agg(F.count(F.lit(1)).alias("n")), "popped"),
            _tag(
                fetched.groupBy("partition_id", "status", "outcome")
                .agg(F.count(F.lit(1)).alias("n"))
                .withColumnRenamed("partition_id", "pid"),
                "fetched",
                k1=F.col("pid"),
                k2=F.concat_ws(":", F.col("status"), F.col("outcome")),
            ),
            _tag(
                drop_counts_df.withColumnRenamed("drop_reason", "r"),
                "drop",
                k1=F.col("r"),
            ),
            _tag(frontier_next.agg(F.count(F.lit(1)).alias("n")), "queued"),
        ]
        if denied is not None:
            stat_frames.append(
                _tag(denied.agg(F.count(F.lit(1)).alias("n")), "denied")
            )
        if budget_dropped is not None:
            stat_frames.append(
                _tag(
                    budget_dropped.agg(F.count(F.lit(1)).alias("n")),
                    "budgetdrop",
                )
            )
        if new_domain_urls is not None:
            stat_frames.append(
                _tag(new_domain_urls.agg(F.count(F.lit(1)).alias("n")), "newdom")
            )
        if hits is not None:
            stat_frames.append(
                _tag(hits.agg(F.count(F.lit(1)).alias("n")), "cachehit")
            )
        new_cookies = None
        if cfg.cookies_enabled and cfg.fetch_backend == "http":
            # cookies middleware response half (Set-Cookie lines → jar
            # delta rows, operators/cookies.py); built HERE so its count
            # rides the single batched stats action instead of paying a
            # separate per-epoch job (same discipline as cachehit/reval)
            from ..operators.cookies import parse_set_cookies

            new_cookies = parse_set_cookies(fetched, e)
            stat_frames.append(
                _tag(new_cookies.agg(F.count(F.lit(1)).alias("n")), "cookies")
            )
        if "revalidated" in fetched.columns:
            stat_frames.append(
                _tag(
                    fetched.filter(F.col("revalidated")).agg(
                        F.count(F.lit(1)).alias("n")
                    ),
                    "reval",
                )
            )
        batched = stat_frames[0]
        for sf_ in stat_frames[1:]:
            batched = batched.unionByName(sf_)
        n_popped = n_denied = queued_after = n_newdom = n_reval = 0
        n_budget = 0
        n_setcookie = 0
        outcome_counts: dict[tuple[int, str], int] = {}
        part_counts: dict[int, int] = {}
        drop_counts: dict[str, int] = {}
        # the seen-filter absorb and the stats action are independent —
        # overlap them (one fewer sequential job launch per epoch)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as _pool:
            _absorb_fut = _pool.submit(_absorb_fresh)
            stat_rows = batched.collect()
            n_fresh = _absorb_fut.result()
        n_dupes = n_filterable - n_fresh
        trace('dedupe+seen')
        for r in stat_rows:
            t, n = r["t"], int(r["n"])
            if t == "popped":
                n_popped = n
            elif t == "budgetdrop":
                n_budget = n
            elif t == "denied":
                n_denied = n
            elif t == "queued":
                queued_after = n
            elif t == "newdom":
                n_newdom = n
            elif t == "cachehit":
                n_cache_hits = n
            elif t == "reval":
                n_reval = n
            elif t == "cookies":
                n_setcookie = n
            elif t == "drop":
                drop_counts[r["k1"]] = n
            elif t == "fetched":
                status_s, outcome_s = r["k2"].split(":", 1)
                key = (int(status_s), outcome_s)
                outcome_counts[key] = outcome_counts.get(key, 0) + n
                pid = int(r["k1"])
                part_counts[pid] = part_counts.get(pid, 0) + n
        n_ok = sum(v for (s, o), v in outcome_counts.items() if o == "done")
        n_retry = sum(v for (s, o), v in outcome_counts.items() if o == "retry")
        n_failed = sum(v for (s, o), v in outcome_counts.items() if o == "failed")
        n_redirect = sum(v for (s, o), v in outcome_counts.items() if o == "redirect")
        n_new = n_retry + n_fresh + n_bypass
        trace('batched_stats')

        # logs
        pop_log = popped.select(
            F.lit(e).alias("epoch"), "rank", "fp", "url_canon", "slot"
        )
        slot_pops_next = None
        if cfg.domain_page_budget > 0:
            epoch_counts = popped.groupBy("slot").agg(
                F.count(F.lit(1)).cast("long").alias("n_pops")
            )
            slot_pops_next = (
                slot_pops_prev.unionByName(epoch_counts)
                if slot_pops_prev is not None
                else epoch_counts
            ).groupBy("slot").agg(F.sum("n_pops").alias("n_pops"))
        fetch_log = fetched.select(
            "fp",
            "url_canon",
            "slot",
            "image_id",
            "status",
            F.lit(None).cast("binary").alias("bytes"),
            meta_get(F.col("meta_json"), "caption").alias("caption"),
            "fetched_at",
            "latency_ms",
            F.lit(e).alias("epoch"),
            "partition_id",
        )
        if cfg.fetch_backend == "http":
            # items = the actually-fetched image payloads, decoded for
            # typed metadata (ImagesPipeline persistence analog)
            from ..operators.netfetch import payload_items

            items = payload_items(done.filter(F.col("image_id").isNotNull()), e)
        else:
            items = attach_payload(
                done.select("image_id", "fp"), self.corpus
            ).withColumn("epoch", F.lit(e)).select(
                *[f.name for f in schemas.ITEMS.fields]
            )

        seen_append = with_bucket(
            fresh.select("fp", F.lit(e).alias("epoch_added"))
        )
        # (bloom insert already happened in the absorb_df action above)

        # metrics (driver-side aggregate rows + per-partition lineage,
        # derived from the single outcome/partition action above)
        part_rows = [
            (e, pid, "fetch/partition_rows", float(n))
            for pid, n in sorted(part_counts.items())
        ]
        mrows = [
            # cache hits never reach the downloader (ref HttpCacheMiddleware)
            (e, -1, "downloader/request_count", float(n_popped - n_cache_hits)),
            (e, -1, "scheduler/enqueued", float(n_new)),
            (e, -1, "dupefilter/filtered", float(n_dupes)),
            (e, -1, "robotstxt/forbidden", float(n_denied)),
            (e, -1, "domain_budget/dropped", float(n_budget)),
            (e, -1, "item_scraped_count", float(n_ok)),
            (e, -1, "retry/count", float(n_retry)),
            (e, -1, "redirect/count", float(n_redirect)),
            (e, -1, "httpcache/hit", float(n_cache_hits)),
            (e, -1, "httpcache/revalidated", float(n_reval)),
        ]
        for reason, n in drop_counts.items():
            mrows.append((e, -1, f"{reason}/filtered", float(n)))
        for (status, _o), n in outcome_counts.items():
            mrows.append(
                (e, -1, f"downloader/response_status_count/{status}", float(n))
            )
        robots_fetched_df = None
        if live_robots and n_newdom:
            # live robots.txt fetch (F2 × S2, ref robotstxt.py ≈L60): runs
            # executor-side when the commit materializes the append — the
            # network round-trips overlap the domain's one-epoch wait
            from ..operators.netfetch import fetch_robots

            robots_fetched_df = fetch_robots(new_domain_urls, cfg).withColumn(
                "epoch", F.lit(e)
            )
            mrows.append((e, -1, "robotstxt/request_count", float(n_newdom)))
        mrows += part_rows
        metrics_df = _local_df(
            self.spark, [r for r in mrows if r[3] > 0], schemas.METRICS
        )

        # SEMANTICS 10: atomic commit
        scalars = dict(self.store.scalars)
        scalars["next_seq"] = next_seq + n_new
        scalars["pages"] = scalars.get("pages", 0) + n_popped
        scalars["items"] = scalars.get("items", 0) + n_ok
        scalars["errors"] = scalars.get("errors", 0) + n_failed
        appends = {}
        if n_popped:
            appends["pop_log"] = _sized_delta(pop_log, n_popped)
            appends["fetch_log"] = _sized_delta(fetch_log, n_popped)
        if (
            cfg.httpcache_enabled
            and cfg.fetch_backend == "http"
            and n_popped > n_cache_hits  # some pops actually hit the network
        ):
            # persist the NEWLY fetched 200 bodies (replayed hits carry
            # from_cache=true and are already in the cache) plus the
            # RFC 9111 freshness metadata the rfc2616 policy reads;
            # read-side dedupe keeps the latest epoch per fp — which
            # also makes a re-appended 304-merged row the RFC's
            # "update the stored response" step. Under rfc2616,
            # no-store responses (fresh_until = -1) are never cached
            # (RFC2616Policy.should_cache_response).
            storable = (F.col("status") == 200) & ~F.col("from_cache")
            if cfg.httpcache_policy == "rfc2616":
                storable = storable & (F.col("fresh_until") != -1)
            appends["http_cache"] = fetched.filter(storable).select(
                "fp",
                "status",
                "body",
                "content_type",
                "content_encoding",
                "location",
                "etag",
                "last_modified",
                "fetched_wall",
                "fresh_until",
                F.lit(e).alias("epoch"),
            )
        if new_cookies is not None and n_setcookie:
            # count already collected in the batched stats action above
            appends["cookies"] = new_cookies
            mrows.append((e, -1, "cookies/received", float(n_setcookie)))
            # rebuilt so the appended metrics row is included below
            metrics_df = _local_df(
                self.spark, [r for r in mrows if r[3] > 0], schemas.METRICS
            )
        if robots_fetched_df is not None:
            appends["robots_http"] = robots_fetched_df
        if n_ok:
            # NOT row-count-sized: ITEMS rows carry raw payload bytes, so
            # 500k rows/partition would funnel GBs through one write task
            # (same reason http_cache above stays unsized)
            appends["items"] = items
        if n_fresh:
            appends["url_seen"] = _sized_delta(seen_append, n_fresh)
        if mrows:
            appends["metrics"] = metrics_df
        # Frontier goes in as a DELTA (delete popped/denied seqs + insert
        # the new batch), not a full-table replace: at a 10^10-row frontier
        # the per-epoch write is O(batch); the store compacts the
        # delete-chain every COMPACT_EVERY epochs (store.py MOR contract).
        delete_keys = popped.select("seq")
        if denied is not None:
            delete_keys = delete_keys.unionByName(denied.select("seq"))
        if budget_dropped is not None:
            delete_keys = delete_keys.unionByName(budget_dropped.select("seq"))
        self.store.commit(
            e,
            replace={
                "domain_state": dom_next,
                **(
                    {"slot_pops": slot_pops_next}
                    if slot_pops_next is not None
                    else {}
                ),
            },
            append=appends,
            scalars=scalars,
            mutate={"frontier": ("seq", delete_keys, _sized_delta(new_rows, n_new))},
            # frontier_next is computed for the queued_after stat anyway;
            # stores use it to skip re-resolving the delta chain (MOR
            # contract: it equals resolve(base, deltas) by construction).
            # Partition-capped: the union with the epoch's new_rows
            # otherwise grows the resolved table by shuffle_partitions
            # every epoch — but unlike a delta it is a FULL table whose
            # materialization must stay parallel, so the floor is the
            # session parallelism, not 1.
            resolved={
                "frontier": frontier_next.coalesce(
                    max(
                        spark.sparkContext.defaultParallelism,
                        -(-max(queued_after, 1) // _DELTA_ROWS_PER_PART),
                    )
                )
            },
        )
        trace('commit')
        if self.bloom is not None and (
            self.bloom.n_added > 0.9 * self.bloom.capacity
        ):
            # saturation regrow: rebuild at 2× the committed seen count.
            # 0.9 (not 1.0) so the regrow fires BEFORE a cuckoo shard can
            # exhaust its kicks mid-epoch (bloom just drifts in FPR, but
            # an over-full cuckoo insert is a hard error); per-epoch
            # deltas are ≪ capacity, so 10% headroom covers the gap
            self._rebuild_bloom()
        for df in (frontier, popped, fetched, links_raw, candidates, fresh, frontier_next):
            df.unpersist()
        if sm_xml is not None:
            sm_xml.unpersist()
        if denied is not None:
            denied.unpersist()
        if budget_dropped is not None:
            budget_dropped.unpersist()
        return EpochStats(
            epoch=e,
            popped=n_popped,
            # frontier rows removed without fetching (conservation:
            # robots denials + budget drops)
            denied=n_denied + n_budget,
            fetched_ok=n_ok,
            retried=n_retry,
            failed=n_failed,
            fresh=n_fresh,
            queued_after=queued_after,
            enqueued=n_new,
        )
