"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator family from SURVEY.md §2 (crawl
scheduling semantics re-expressed relationally over the driver's star
schema) or a training-data pipeline operator (dedup / similarity / text
analysis over documents+embeddings). ``oracle_sql()`` carries the DuckDB
equivalent for everything SQL-expressible — including the MinHash /
SimHash / winnowing sketches (DuckDB's md5_number_upper reproduces the
package's md5-derived 64-bit hashes bit-for-bit) and the SRP-LSH ANN
(hyperplane constants inlined, the whole bucket pipeline replayed in
SQL) and image_decode_meta (per-row payload-parity verdict whose
id/fmt/caption columns are pure doc_id formulas and whose flags an
intact corpus pins TRUE — decode is additionally verified against
synthesis ground truth in tests/test_datapipe.py). Every query is
value-oracled.

Column aliases match 1:1 between Spark and SQL (the driver sorts columns
by name before value-hashing). All float aggregates are rounded so both
engines agree at the last digit; thresholds apply to rounded values so
boundary rows agree too.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table loader with a small-input parallelism adapter: the sf
    fixtures are single parquet files (one row group → ONE input
    partition), which serializes every query's first stage on a wide
    session — shingling alone measured 6× slower on the 1-task scan.
    When the scan yields far fewer partitions than the session has
    cores, fan out once with a round-robin repartition (tiny shuffle at
    these sizes). At production scale inputs are many files/row groups,
    the condition is false, and this is a metadata-only no-op — no
    shuffle is ever added to a properly-partitioned source."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    cores = spark.sparkContext.defaultParallelism
    parts = df.rdd.getNumPartitions()
    if parts * 4 <= cores:
        df = df.repartition(cores)
    return df


def _order_priority(col):
    # '1-URGENT' → 5 ... '5-LOW' → 1: higher pops first (Request.priority)
    return (F.lit(6) - F.substring(col, 1, 1).cast("int")).alias("priority")


# =====================================================================
# Crawl-scheduling operators over the star schema (SURVEY §2.5/2.3/2.2)
# =====================================================================

def q_frontier_pop_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 ScrapyPriorityQueue: global top-100 by (priority desc, seq asc)
    = epoch pop (ref: scrapy/pqueues.py::ScrapyPriorityQueue ≈L40).

    Shape: orderBy().limit() FIRST (TakeOrderedAndProject — per-partition
    top-k then a 100-row merge on one reducer), THEN rank the 100
    survivors. A bare row_number over an unpartitioned window would drag
    the whole table through a single-partition sort — the engine's own
    rank_and_pop (operators/pop.py) uses this limit-then-rank shape."""
    orders = _t(spark, sf_dir, "orders")
    sel = orders.select("o_orderkey", _order_priority(F.col("o_orderpriority")))
    popped = sel.orderBy(F.desc("priority"), F.asc("o_orderkey")).limit(100)
    w = Window.orderBy(F.desc("priority"), F.asc("o_orderkey"))
    return popped.withColumn("pop_rank", F.row_number().over(w))


def q_frontier_pop_per_slot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 DownloaderAwarePriorityQueue: per-slot (customer≙domain) rank,
    capacity cap 3 (ref: scrapy/pqueues.py::DownloaderAwarePriorityQueue
    ≈L150; CONCURRENT_REQUESTS_PER_DOMAIN analog)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("priority"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_orderkey", "o_custkey", _order_priority(F.col("o_orderpriority"))
        )
        .withColumn("slot_rank", F.row_number().over(w))
        .filter(F.col("slot_rank") <= 3)
    )


def q_dupefilter_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/F1 RFPDupeFilter as LEFT ANTI hash join: candidates (customer)
    not in the seen-set (custkeys with a Finished order ≙ already-fetched
    fingerprints) (ref: scrapy/dupefilters.py ≈L55)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    seen = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(seen, "c_custkey", "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_robots_broadcast_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/F2 robots gate as broadcast dim join + disallow filter: customers
    joined through nation→region (robots table ≪ frontier), region 'ASIA'
    disallowed (ref: downloadermiddlewares/robotstxt.py ≈L30)."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dim = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
    )
    return (
        customer.join(dim, customer.c_nationkey == dim.n_nationkey)
        .filter(F.col("r_name") != "ASIA")
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # exact decimal sum (order-independent) instead of
            # round(avg(double)): float partial-agg order flips the last
            # rounded digit between engines/parallelism levels (the r4
            # latency_ema_inputs flake). sum+count carry the same info.
            # Scale 2 (the columns are 2-decimal money values): keeps the
            # sum's unscaled int below 2^53, where DuckDB's int128→double
            # is exact and its /10^scale correctly rounded — at scale 10
            # DuckDB lands one ulp off Spark/BigDecimal. Cross-engine
            # decimal RESCALING is also out: Spark rounds HALF_UP, DuckDB
            # truncates; scale-2 casts of ~X.XX±1e-9 doubles never round.
            F.sum(F.col("c_acctbal").cast("decimal(30,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


def q_depth_priority_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/W3/A3 DEPTH_PRIORITY + depth limit + histogram: depth ≙
    l_linenumber, DEPTH_LIMIT=4, DEPTH_PRIORITY=1 ⇒ eff_priority=-depth
    (ref: spidermiddlewares/depth.py ≈L20-L55)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("l_linenumber").alias("depth"))
        .filter(F.col("depth") <= 4)
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_requests"))
        .withColumn("eff_priority", -F.col("depth"))
    )


def q_politeness_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 politeness watermark: slot ≙ user_id, next_free_at = first event
    + (user_id mod 60) minutes download-delay; count eligible events per
    slot (ref: core/downloader/__init__.py::_process_queue ≈L155)."""
    ev = _t(spark, sf_dir, "events")
    nf = ev.groupBy("user_id").agg(
        F.expr("min(ts) + make_interval(0,0,0,0,0, cast(user_id % 60 as int),0)")
        .alias("next_free_at")
    )
    return (
        ev.join(nf, "user_id")
        .filter(F.col("ts") >= F.col("next_free_at"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_eligible"))
    )


def q_retry_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4/W4 retry semantics: error events per user ≙ retry count;
    ≤RETRY_TIMES(2) → RETRY else FAILED; retry priority adjust −1 per
    attempt (ref: downloadermiddlewares/retry.py ≈L60,L100)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .select(
            "user_id",
            "n_errors",
            F.when(F.col("n_errors") <= 2, F.lit("RETRY"))
            .otherwise(F.lit("FAILED"))
            .alias("final_status"),
            (-F.least(F.col("n_errors"), F.lit(3))).alias("priority_adjust"),
        )
    )


def q_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 stats counters as grouped agg (MemoryStatsCollector analog over
    returnflag/linestatus; ref: scrapy/statscollectors.py ≈L30)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            # exact decimal sums, not round(avg(double)) — see
            # q_robots_broadcast_gate for the order-dependence rationale
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(F.col("l_discount").cast("decimal(30,2)"))
            .cast("double")
            .alias("sum_disc"),
        )
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 epoch budget top-k (TakeOrderedAndProject, never a global sort
    of the frontier; ref: engine pulling while needs_backout ≈L240)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .withColumn("rk", F.row_number().over(w.orderBy(F.desc("totalprice"), F.asc("o_orderkey"))))
        .filter(F.col("rk") <= 50)
    )


def q_union_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 union of link batches + dedupe (unionByName + dropDuplicates;
    ref: engine.crawl per yielded request ≈L380)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    u = orders.select(F.col("o_custkey").alias("custkey")).unionByName(
        customer.select(F.col("c_custkey").alias("custkey"))
    )
    return u.dropDuplicates(["custkey"])


def q_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 epochs as tumbling windows: hourly event counts per type."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q_latency_ema_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 AutoThrottle per-slot latency aggregate (the sum/count pair
    feeding the delay update's mean latency; ref:
    extensions/throttle.py::_adjust_delay ≈L55). Emits the EXACT decimal
    sum (cast to double) rather than round(avg(double)): float summation
    is order-dependent, and the r4 contract run caught a half-ulp flip at
    a round(…,4) boundary between Spark's local[32] partial-agg order and
    DuckDB's — the decimal sum is the same exact value in both engines at
    any parallelism."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(30,2)"))
        .cast("double")
        .alias("sum_latency"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def q_offsite_urllength_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F6 offsite + URL-length gates: allowed-source regex + length cap
    (ref: spidermiddlewares/offsite.py ≈L30, urllength.py ≈L15)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        F.col("source").rlike("^src[0-3]$") & (F.col("n_chars") <= 300)
    ).select("doc_id", "source", "n_chars")


def q_httperror_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 HttpErrorMiddleware: only 'successful' responses reach the parse
    stage (ref: spidermiddlewares/httperror.py ≈L25)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") != "error") & F.col("value").between(10, 90))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_ok"))
    )


# =====================================================================
# Training-data pipeline operators (documents / embeddings)
# =====================================================================

def q_redirect_requeue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/W4 redirect re-entry (ref: downloadermiddlewares/redirect.py
    ≈L70): 'O'-status orders model 301 responses — each emits a requeued
    child with priority += REDIRECT_PRIORITY_ADJUST (+2), hop = hop+1,
    dropped at the REDIRECT_MAX_TIMES cap; hop count derived from
    o_shippriority-like line number modulo, keeping it SQL-expressible."""
    orders = _t(spark, sf_dir, "orders")
    src = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        _order_priority(F.col("o_orderpriority")),
        (F.col("o_orderkey") % 21).cast("int").alias("hops"),
    )
    return (
        src.filter(F.col("hops") < 20)  # REDIRECT_MAX_TIMES
        .select(
            "o_orderkey",
            (F.col("priority") + 2).alias("new_priority"),
            (F.col("hops") + 1).alias("new_hops"),
        )
    )


def q_logstats_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 LogStats rate derivation (ref: extensions/logstats.py ≈L25):
    per-interval deltas of a cumulative counter via a lag window — the
    pages/min / items/min numbers the reference logs every
    LOGSTATS_INTERVAL. Events bucketed into daily epochs per type;
    rate = count − lag(count) over epoch order."""
    ev = _t(spark, sf_dir, "events")
    per_epoch = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return per_epoch.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n",
        (F.col("n") - F.coalesce(F.lag("n").over(w), F.lit(0))).alias("rate_delta"),
    )


def q_httpcache_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/J6 HTTP-cache replay shape (ref: extensions/httpcache.py ≈L200):
    'popped batch' = distinct users with a view event; cache = latest
    purchase per user (row_number desc over the log) replayed via inner
    join; users without a purchase are the misses (anti-join → fetch)."""
    ev = _t(spark, sf_dir, "events")
    popped = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    cached = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("cached_event_id"))
    )
    hits = popped.join(cached, "user_id", "inner").select(
        "user_id", "cached_event_id", F.lit("hit").alias("outcome")
    )
    misses = popped.join(cached, "user_id", "left_anti").select(
        "user_id", F.lit(None).cast("long").alias("cached_event_id"),
        F.lit("miss").alias("outcome"),
    )
    return hits.unionByName(misses)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.dedup import exact_dup_groups

    return exact_dup_groups(_t(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.dedup import jaccard_pairs

    return jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, threshold=0.5)


def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.similarity import cosine_pairs

    return cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production near-dup path: SRP-LSH candidates → exact cosine verify,
    no O(n²) stage (datapipe/similarity.py::cosine_near_dup_lsh). The
    corpus is embeddings ∪ 100 deterministically jittered copies (even
    coordinates ×0.95, odd ×1.05 ⇒ cosine ≈0.9988 to the original) so
    the query has real near-dups to find; the oracle recomputes the same
    corpus and the FULL crossJoin in SQL — output equality means LSH
    recall was exactly 1.0 at the threshold."""
    from scrapy_spark.datapipe.similarity import cosine_near_dup_lsh

    corpus = _jittered_corpus(_t(spark, sf_dir, "embeddings"))
    return cosine_near_dup_lsh(corpus, threshold=0.99, nbits=16, ntables=12)


def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.text import token_stats

    return token_stats(_t(spark, sf_dir, "documents"))


def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.text import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.text import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-budget token counting: whitespace + BPE-ish subword regex
    (GPT-2 pattern minus lookahead so the DuckDB oracle runs the SAME
    expression) — the cheap pre-tokenizer cost model every data pipeline
    runs before spending real tokenizer cycles."""
    from scrapy_spark.datapipe.text import token_count_estimate

    return token_count_estimate(_t(spark, sf_dir, "documents"))


# ----- rows-only (hash sketches / UDF identity — not SQL-expressible) ----

def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.dedup import simhash_near_dups

    return simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)


def q_dedup_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: SimHash pairs → connected components →
    (doc_id, rep_id) canonical map (datapipe/cluster.py; the keep-one-
    per-cluster step after pair generation). Oracle: the same pairs via
    the inlined SimHash SQL, closed transitively with a recursive CTE."""
    from scrapy_spark.datapipe.cluster import cluster_representatives
    from scrapy_spark.datapipe.dedup import simhash_near_dups

    pairs = simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)
    return cluster_representatives(pairs)


def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules-style repetition signals (datapipe/quality.py):
    duplicate-line fraction + most-frequent-bigram mass per document."""
    from scrapy_spark.datapipe.quality import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def _docs_with_pii(docs: DataFrame) -> DataFrame:
    """Deterministically plant PII into a slice of the corpus (the
    fixture text is PII-free word salad, which would make the scrub
    oracle vacuous): every 10th doc gains an email, doc_id%7==3 an IPv4,
    doc_id%13==5 a phone — derived from doc_id so the DuckDB oracle
    replays the injection exactly."""
    did = F.col("doc_id")
    injected = (
        F.when(
            did % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            did % 7 == 3,
            F.concat(
                F.col("text"),
                F.lit(" host 10.0."),
                (did % 200).cast("string"),
                F.lit(".25 up"),
            ),
        )
        .when(
            did % 13 == 5,
            F.concat(
                F.col("text"),
                F.lit(" call +1415555"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
    )
    return docs.withColumn("text", injected)


#: the same injection, replayed by the DuckDB oracles
_PII_INJECT_CTE = """
  injected AS (
    SELECT doc_id,
           CASE
             WHEN doc_id % 10 = 0 THEN text || ' contact user'
                  || CAST(doc_id AS VARCHAR) || '@example.com now'
             WHEN doc_id % 7 = 3 THEN text || ' host 10.0.'
                  || CAST(doc_id % 200 AS VARCHAR) || '.25 up'
             WHEN doc_id % 13 = 5 THEN text || ' call +1415555'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE text
           END AS text
    FROM documents)
"""


def _pii_oracle_body() -> str:
    from scrapy_spark.datapipe.pii import pii_oracle_sql

    return pii_oracle_sql("injected")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (datapipe/pii.py): per-doc email /
    phone / IPv4 match counts plus the redacted text — JVM regexp only,
    patterns restricted to the Java-regex ∩ RE2 subset so the DuckDB
    oracle replays them verbatim. Runs over the PII-planted corpus
    (_docs_with_pii) so the match counts are non-trivial."""
    from scrapy_spark.datapipe.pii import pii_stats

    return pii_stats(_docs_with_pii(_t(spark, sf_dir, "documents")))


def q_quality_heuristic_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher heuristic filter rules (datapipe/quality.py): word
    bounds, mean word length, terminal-punctuation line fraction,
    symbol/word ratio, phrase blocklist, and the keep verdict. Every 3rd
    doc gains a terminal '.', every 17th a blocklist phrase, every 11th
    a '{{' symbol run — doc_id-derived, replayed by the oracle — so each
    rule actually fires both ways."""
    from scrapy_spark.datapipe.quality import heuristic_rules

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    txt = (
        F.when(did % 17 == 2, F.concat(F.col("text"), F.lit(" lorem ipsum")))
        .when(did % 11 == 4, F.concat(F.col("text"), F.lit(" {{{#|}}} x")))
        .when(did % 3 == 0, F.concat(F.col("text"), F.lit(".")))
        .otherwise(F.col("text"))
    )
    return heuristic_rules(docs.withColumn("text", txt))


def q_dedup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span mass per doc (datapipe/dedup.py dup_span_stats,
    the Lee-et-al span-dedup diagnostic): distinct token 8-grams that
    occur in ≥2 documents, counted per doc. Integer outputs only."""
    from scrapy_spark.datapipe.dedup import dup_span_stats

    return dup_span_stats(_t(spark, sf_dir, "documents"), n=8)


def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup REMOVAL (datapipe/dedup.py remove_dup_spans, the
    transform half of the Lee-et-al pair): tokens covered by any 8-gram
    occurring in >=2 documents are cut; survivors rejoin with single
    spaces. Exact strings + integers -> hash-safe oracle."""
    from scrapy_spark.datapipe.dedup import remove_dup_spans

    return remove_dup_spans(_t(spark, sf_dir, "documents"), n=8)


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Unicode-script composition (datapipe/text.py script_mix):
    per-script char counts over explicit codepoint ranges + dominant
    script. Integer counts + one string -> hash-safe; the ranges are
    \\x{..} classes that mean the same thing in Java regex and RE2."""
    from scrapy_spark.datapipe.text import script_mix

    return script_mix(_t(spark, sf_dir, "documents"))


def q_text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 characteristic terms (datapipe/text.py top_terms):
    TF-IDF-shaped ranking with the exact integer rarity surrogate
    tf × (N − df), ties by term — integer-deterministic across engines."""
    from scrapy_spark.datapipe.text import top_terms

    return top_terms(_t(spark, sf_dir, "documents"), k=3)


def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition report (datapipe/text.py corpus_mix): per
    source, doc/token counts, exact integer-ppm token share, and the
    cumulative-coverage rank table (dataset-card "top-N sources cover X%"
    view). Integer division only — bit-deterministic across engines."""
    from scrapy_spark.datapipe.text import corpus_mix

    return corpus_mix(_t(spark, sf_dir, "documents"), group_col="source")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (datapipe/packing.py pack_spans): the GPT-style
    concat-and-chunk packer — per document, its global token offset in
    the doc_id-ordered concatenated stream and the span of 512-token
    training chunks it occupies. The prefix sum is the distributed
    range-partition + broadcast-offsets construction (never a
    single-partition window); all-integer outputs, bit-deterministic
    across engines and parallelism levels."""
    from scrapy_spark.datapipe.packing import pack_spans

    return pack_spans(_t(spark, sf_dir, "documents"), budget=512)


def q_semdedup_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (datapipe/semdedup.py, Abbas et al. 2023): k-means-cell-
    restricted near-dup detection over the jitter-augmented embedding
    corpus — assignment to the deterministic lowest-id seed codebook
    (SQL-replayable, so the WHOLE pipeline is value-oracled: assignment
    argmax, within-cell pair join, transitive representative labels),
    within-cell cosine ≥ 0.99, connected-components reps. The trained-
    codebook path (train_centroids + one matmul per Arrow batch) is
    property-tested in tests/test_semdedup_packing.py."""
    from scrapy_spark.datapipe.semdedup import semdedup_reps

    corpus = _jittered_corpus(_t(spark, sf_dir, "embeddings"))
    return semdedup_reps(corpus, ncells=8, threshold=0.99)


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check (datapipe/contamination.py): every
    50th document plays the eval set; corpus docs sharing an 8-token
    n-gram with a probe are flagged with the distinct-shared-gram count.
    Probe grams broadcast; corpus grams stream — no corpus shuffle."""
    from scrapy_spark.datapipe.contamination import contamination_flags

    docs = _t(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    return contamination_flags(docs, probes, n=8)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (datapipe/sampling.py): exactly
    min(5, |stratum|) docs per (lang, source), chosen by salted-md5 hash
    order — reproducible across runs and partitionings, exact quotas
    (sampleBy is only Bernoulli-approximate)."""
    from scrapy_spark.datapipe.sampling import sample_stratified

    return sample_stratified(
        _t(spark, sf_dir, "documents"),
        ["lang", "source"],
        5,
        key_col="doc_id",
        seed="42",
    ).select("doc_id", "lang", "source", "sample_rank")


def _jittered_corpus(emb: DataFrame) -> DataFrame:
    """embeddings ∪ 100 deterministic near-copies (even coords ×0.95, odd
    ×1.05 → cosine ≈0.9988 to the original) — gives the similarity
    operators real neighbor structure to find; the base table's vectors
    are isotropic-random (top-5 cosine ≈0.4, barely above noise), on
    which ANY sublinear ANN provably degenerates to brute force."""
    factor = lambda i: F.lit(1.0) + F.lit(0.05) * ((i % 2) * 2 - 1)  # noqa: E731
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    jit = base.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x, i: x * factor(i)).alias("embedding"),
    )
    return base.unionByName(jit)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table SRP ANN at the economical near-neighbor operating
    point (16 bits × 8 tables: random pairs collide with p≈8/2¹⁶ ⇒ the
    bucket join prunes ~99.99% of pairs) over the jitter-augmented corpus,
    where each planted copy's true nearest neighbor must surface at
    rank 1 — asserted in tests/test_datapipe.py. (A config tuned to also
    recall the ≈0.4-cosine noise-level 'neighbors' of the random base
    corpus would need L·n²/2^b ≈ n² candidates — brute force in disguise;
    the brute-force operator cosine_topk IS the right tool there, and
    stays the oracle-checked baseline.)"""
    from scrapy_spark.datapipe.similarity import lsh_ann_topk

    corpus = _jittered_corpus(_t(spark, sf_dir, "embeddings"))
    return lsh_ann_topk(corpus, k=5, nbits=16, ntables=8)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (datapipe/similarity.py ivf_topk: sampled-k-means
    codebook, cell assignment via one broadcast matmul per Arrow batch,
    probe-cells candidate join, exact cosine re-rank) run at
    nprobe = ncells, where the ENTIRE pipeline must reproduce exact
    brute-force kNN value-for-value regardless of centroid quality —
    the strongest possible whole-pipeline oracle for an ANN index
    (recall at nprobe < ncells is covered in tests/test_datapipe.py).
    Queries restricted to vec_id < 10 (the query ≪ corpus shape); the
    full corpus is still indexed and probed."""
    from scrapy_spark.datapipe.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, k=5, ncells=16, nprobe=16,
        query_filter=F.col("vec_id") < 10,
    )


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (datapipe/similarity.py ivfpq_topk: product-quantized
    corpus index — (id, cell, m one-byte codes), 64× smaller than the
    vectors — probed by cell, ADC-scored JVM-side via per-query lookup
    tables, exact cosine re-rank over the ADC survivors) run at
    nprobe = ncells with rerank ≥ |corpus|, where the whole pipeline
    must reproduce exact brute-force kNN value-for-value regardless of
    codebook quality — same whole-pipeline exactness oracle as
    ann_ivf_topk, now also covering the PQ encode / LUT / ADC stages.
    Recall at realistic (nprobe, rerank) is measured in
    tests/test_datapipe.py. Queries restricted to vec_id < 10."""
    from scrapy_spark.datapipe.similarity import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, k=5, ncells=16, nprobe=16, rerank=1_000_000_000,
        query_filter=F.col("vec_id") < 10,
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-vs-corpus incremental dedup (datapipe/dedup.py::
    incremental_dedup — the daily-crawl-increment shape: exact tier =
    md5 equijoin, near tier = ASYMMETRIC PPJoin with the prefix filter
    on the delta side only, rarest-first by corpus shingle frequency).
    The delta is synthesized deterministically from documents: %10==0
    rows are byte-exact copies, %10==1 rows append three filler tokens
    (near-dup for long docs, 'new' when the doc is short enough that
    jaccard dips below 0.5 — both engines agree either way), %10==2
    rows are fresh text. The DuckDB oracle classifies the same delta
    with the direct (no-prefix) join — the prefix filter must not
    change a single verdict, match id, or jaccard value."""
    from scrapy_spark.datapipe.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    nid = (F.col("doc_id") + 100_000).alias("doc_id")
    delta = (
        docs.filter(F.col("doc_id") % 10 == 0).select(nid, "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).select(
                nid,
                F.concat(
                    F.col("text"), F.lit(" aardvark aardvark aardvark")
                ).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 2).select(
                nid,
                F.concat(
                    F.lit("zulu zebra quokka wombat numbat doc "),
                    F.col("doc_id").cast("string"),
                ).alias("text"),
            )
        )
    )
    return incremental_dedup(delta, docs)


def q_html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → main-content extraction (datapipe/htmltext.py): pure JVM
    regexp + per-line array-lambda pipeline — script/style removal,
    anchor-span link-density sentinels, block-boundary line splitting,
    entity decode, and the jusText-style boilerplate filter (min words
    + max link density). Pages are synthesized deterministically around
    each document's text (nav + footer chrome, script, entities); the
    DuckDB oracle rebuilds the SAME page and runs the SAME chain (all
    regexes constrained to the RE2 ∩ Java subset), so the extracted
    text must match byte-for-byte."""
    from scrapy_spark.datapipe.htmltext import extract_text, synth_page

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", synth_page(F.col("text"), F.col("doc_id")).alias("html")
    )
    return extract_text(pages, html_col="html")


def q_doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scrapy_spark.datapipe.text import winnow_fingerprints

    fps = winnow_fingerprints(_t(spark, sf_dir, "documents"))
    return fps.select(
        "doc_id", F.explode("fingerprints").alias("fingerprint")
    )


def q_request_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+C2: the real canonicalize+SHA1-fingerprint UDFs over synthetic
    URLs derived from events (ref: scrapy/utils/request.py::fingerprint
    ≈L75, w3lib canonicalize_url).

    Oracle-checked columns: url_canon and domain are recomputed literally
    in SQL, and fp_cardinality (distinct fingerprints per canonical URL,
    from the REAL sha1 UDF output) must be exactly 1 — the canon↔fp
    bijection. The digest bytes themselves are pinned against the public
    upstream byte layout in tests/vectors/fingerprints.jsonl (DuckDB has
    no sha1 function, so they cannot be SQL-oracled)."""
    from scrapy_spark.functions.udfs import with_request_identity

    ev = _t(spark, sf_dir, "events")
    urls = ev.select(
        "event_id",
        F.concat(
            F.lit("https://site-"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(".example.com/page/"),
            (F.col("event_id") % 400).cast("string"),
            F.lit("?b=2&a=1#frag"),
        ).alias("url"),
    )
    out = with_request_identity(urls)
    w_canon = Window.partitionBy("url_canon")
    return out.select(
        "event_id",
        "url_canon",
        "domain",
        F.size(F.collect_set(F.hex("fp")).over(w_canon)).alias("fp_cardinality"),
    )


def q_crawl_frontier_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full frontier pipeline on a synthetic frontier built
    from events — identity UDFs → within-batch dedupe → anti-join seen →
    per-slot capacity rank → downloader-aware global budget (SURVEY §3.1
    steps 1-2, §2.5 W1/W2)."""
    from scrapy_spark.functions.udfs import with_request_identity

    ev = _t(spark, sf_dir, "events")
    reqs = ev.select(
        F.col("event_id").alias("seq"),
        F.concat(
            F.lit("HTTPS://Site-"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(".Example.COM/page/"),
            (F.col("event_id") % 400).cast("string"),
        ).alias("url"),
        (F.col("value").cast("int") % 10).alias("priority"),
        F.col("event_type"),
    )
    ided = with_request_identity(reqs)
    # seen-set J1 as a per-fp window instead of a self-anti-join: the UDF
    # output is evaluated ONCE (a self-join would run the identity pass on
    # both branches — verified by tools/explain_audit.py: exactly one
    # ArrowEvalPython node in this plan)
    w_fp = Window.partitionBy("fp")
    candidates = (
        ided.withColumn(
            "fp_purchased",
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_fp),
        )
        .filter((F.col("event_type") != "purchase") & (F.col("fp_purchased") == 0))
        # within-batch dedupe: keep lowest seq per fp (J5)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy(F.asc("seq"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    # W2 pop: capacity 4 per slot, downloader-aware order, budget 200
    w_slot = Window.partitionBy("slot").orderBy(F.desc("priority"), F.asc("seq"))
    ranked = candidates.withColumn("slot_rank", F.row_number().over(w_slot)).filter(
        F.col("slot_rank") <= 4
    )
    order = [F.asc("slot_rank"), F.desc("priority"), F.asc("seq"), F.asc("slot")]
    popped = ranked.orderBy(*order).limit(200)
    w_global = Window.orderBy(*order)
    return popped.withColumn("pop_rank", F.row_number().over(w_global)).select(
        "pop_rank", "seq", "url_canon", "slot", "priority", "slot_rank"
    )


def q_image_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12/S10/J8 multimodal decode + per-row payload parity: synthetic
    corpus in the input_hint shape → mapInPandas decode → verdict flags
    vs re-synthesized ground truth (dims vs stored metadata, stored
    phash vs reference pixels, lossless bit-exact / lossy PSNR ≥ 40 dB,
    caption passthrough) — the north_rule per-row invariant as a
    contract query (ref: pipelines/images.py ≈L60,L130).

    Fully DuckDB-oracled: image_id / fmt / caption are pure formulas of
    doc_id, and every flag is TRUE for an intact corpus — a decode that
    returns wrong dims, wrong pixels, or the wrong container format
    flips a flag and fails the value hash. The deterministic id subset
    is doc_id < 200 (not LIMIT, which is order-undefined)."""
    from scrapy_spark.datapipe.multimodal import payload_parity_meta
    from scrapy_spark.sources.corpus import synth_corpus_df

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )
    corpus = synth_corpus_df(docs, id_col="doc_id")
    return payload_parity_meta(corpus, psnr_floor_db=40.0).orderBy("image_id")


def q_image_thumbs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 IMAGES_THUMBS as a value-checked contract query: synthetic
    corpus → resize_thumbnails (decode → nearest-neighbor subsample →
    rawrgb re-encode) → per-row verdict vs a recomputed expected
    thumbnail from the same decoded input (datapipe/multimodal.py
    thumbs_parity_meta). Flags pinned TRUE by the oracle — a wrong
    scale factor, wrong dims, or wrong pixels fails the value hash."""
    from scrapy_spark.datapipe.multimodal import (
        resize_thumbnails,
        thumbs_parity_meta,
    )
    from scrapy_spark.sources.corpus import synth_corpus_df

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )
    corpus = synth_corpus_df(docs, id_col="doc_id")
    thumbs = resize_thumbnails(corpus, max_side=16)
    joined = corpus.select("image_id", "bytes").join(thumbs, "image_id")
    return thumbs_parity_meta(joined, max_side=16).orderBy("image_id")


def q_audio_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio plumbing (C12 family): deterministic spcm corpus
    → mapInPandas decode → typed metadata + PCM content parity
    (datapipe/multimodal.py audio_decode_meta). rate / channels /
    nsamples / duration are DECODED values whose ground truth is a pure
    doc_id formula — the DuckDB oracle value-checks them; samples_ok
    (decoded PCM ≡ re-synthesis, bit-exact) is pinned TRUE."""
    from scrapy_spark.datapipe.multimodal import audio_decode_meta
    from scrapy_spark.sources.corpus import synth_media_df

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )
    return audio_decode_meta(synth_media_df(docs, "audio")).orderBy("media_id")


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal video plumbing: deterministic svid corpus → decode →
    every-3rd-frame sampling + per-frame bit-exact parity
    (datapipe/multimodal.py video_frame_sample). Dims / frame counts /
    sampled counts are doc_id formulas the oracle value-checks."""
    from scrapy_spark.datapipe.multimodal import video_frame_sample
    from scrapy_spark.sources.corpus import synth_media_df

    docs = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )
    return video_frame_sample(
        synth_media_df(docs, "video"), every_k=3
    ).orderBy("media_id")


def _synthetic_phash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (image_id, phash) table both engines can derive:
    base phash = top 60 bits of md5(doc_id) (15 hex chars → fits signed
    int64 non-negative); every doc_id % 37 == 0 gets two planted
    near-dup twins — ids +10M / +20M, phash with ≤3 / ≤2 bits flipped at
    doc_id-derived positions. The DuckDB oracle replicates this exactly
    (md5_number_upper >> 4 and the same shift masks), so the banded
    hamming join is fully value-checked; the REAL-pixel phash path (same
    operator over synth_corpus_df's stored phash) is covered by
    tests/test_images_phash.py."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    base = docs.select(F.col("doc_id").alias("image_id"), h.alias("phash"))
    planted = docs.filter(F.col("doc_id") % 37 == 0).select("doc_id", h.alias("ph"))
    m1 = F.expr(
        "shiftleft(1L, cast(doc_id % 60 as int)) | "
        "shiftleft(1L, cast((doc_id * 7 + 11) % 60 as int)) | "
        "shiftleft(1L, cast((doc_id * 13 + 29) % 60 as int))"
    )
    m2 = F.expr(
        "shiftleft(1L, cast((doc_id + 17) % 60 as int)) | "
        "shiftleft(1L, cast((doc_id * 11 + 5) % 60 as int))"
    )
    t1 = planted.select(
        (F.col("doc_id") + 10000000).alias("image_id"),
        F.col("ph").bitwiseXOR(m1).alias("phash"),
    )
    t2 = planted.select(
        (F.col("doc_id") + 20000000).alias("image_id"),
        F.col("ph").bitwiseXOR(m2).alias("phash"),
    )
    return base.unionByName(t1).unionByName(t2)


def q_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs on the stored 64-bit perceptual hash
    (datapipe/images.py phash_near_dups): EXACT hamming ≤ 3 via 4×16-bit
    pigeonhole band blocking — the image-side twin of SimHash text dedup,
    decode-free (only (id, phash) moves, never bytes)."""
    from scrapy_spark.datapipe.images import phash_near_dups

    return phash_near_dups(
        _synthetic_phash_table(spark, sf_dir), max_hamming=3
    ).orderBy("id_a", "id_b")


def q_image_phash_neardup_mih(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10^10-row variant of image_phash_neardup: Manku-style
    block-combination blocking (C(8,3)=56 keys × 40 bits — bucket size
    n/2^40 instead of n/2^16, no quadratic pocket; see
    dedup.hamming_near_dup_pairs_mih). EXACT like the band variant, so
    it shares the SAME DuckDB oracle — the strongest possible check that
    the two physical strategies agree."""
    from scrapy_spark.datapipe.images import phash_near_dups

    return phash_near_dups(
        _synthetic_phash_table(spark, sf_dir), max_hamming=3, strategy="blocks"
    ).orderBy("id_a", "id_b")


def _synthetic_corpus_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """input_hint-shaped METADATA table both engines can derive — the
    phash table (_synthetic_phash_table) widened with deterministic
    caption / w / h / bytes columns, every formula a pure function of
    image_id so the DuckDB oracle replicates it verbatim:

    - caption: base rows share 'cap <image_id % 211>' (≈n/211-sized
      exact-dup groups); planted twins get a UNIQUE 'tw <id>' caption so
      twin clusters form via phash edges only — exercising both edge
      kinds of the joint dedup.
    - w, h: 8 + image_id % 113 / 8 + (7·image_id + 3) % 113 — aspects
      spread across every bucket.
    - bytes: 'x' × (24 + (image_id % 50)·3) utf-8 — real binary with a
      replicable octet length (aspect-bucket stats sum LENGTH(bytes))."""
    iid = F.col("image_id")
    caption = F.when(
        iid < 10000000,
        F.concat(F.lit("cap "), (iid % 211).cast("string")),
    ).otherwise(F.concat(F.lit("tw "), iid.cast("string")))
    return _synthetic_phash_table(spark, sf_dir).select(
        "image_id",
        "phash",
        caption.alias("caption"),
        (F.lit(8) + iid % 113).cast("int").alias("w"),
        (F.lit(8) + (iid * 7 + 3) % 113).cast("int").alias("h"),
        F.encode(
            F.repeat(F.lit("x"), (F.lit(24) + (iid % 50) * 3).cast("int")),
            "utf-8",
        ).alias("bytes"),
    )


def q_image_caption_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-caption duplicate STAR edges (datapipe/images.py
    caption_dup_pairs): normalized-caption groups emit (min-id hub →
    member) pairs — linear in group size, never all-pairs, the caption
    half of the joint image+text dedup graph."""
    from scrapy_spark.datapipe.images import caption_dup_pairs

    return caption_dup_pairs(_synthetic_corpus_meta(spark, sf_dir)).orderBy(
        "id_a", "id_b"
    )


def q_image_joint_dedup_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint image+text dedup (datapipe/images.py joint_dedup_reps):
    phash-hamming edges ∪ exact-caption star edges, closed transitively
    → (image_id, rep_id) keep/drop map. Oracle: recursive CTE over the
    UNION of the inlined phash-pair SQL and the caption-star SQL."""
    from scrapy_spark.datapipe.images import joint_dedup_reps

    return joint_dedup_reps(_synthetic_corpus_meta(spark, sf_dir)).orderBy(
        "image_id"
    )


def q_image_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio training buckets (datapipe/images.py
    aspect_bucket_stats): nearest-rung assignment in log space via
    threshold CASE chain, then per-bucket count / mean aspect / payload
    bytes — one metadata scan + one hash-agg, bytes contribute LENGTH
    only. The same cut constants are inlined into the DuckDB oracle."""
    from scrapy_spark.datapipe.images import aspect_bucket_stats

    return aspect_bucket_stats(_synthetic_corpus_meta(spark, sf_dir))


def q_image_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical payload dedup (datapipe/images.py
    exact_bytes_dedup_reps): md5 over the binary payload → min-id rep per
    digest group. The cheapest dedup tier, run before any near-dup
    blocking; the synthetic corpus's bytes formula is replicated in the
    DuckDB oracle so the digest grouping is fully value-checked."""
    from scrapy_spark.datapipe.images import exact_bytes_dedup_reps

    return exact_bytes_dedup_reps(
        _synthetic_corpus_meta(spark, sf_dir)
    ).orderBy("image_id")


def _alignment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair_id, img_emb, txt_emb) from the embeddings fixture: row i's
    vector is the image embedding, row i+1's the caption embedding — a
    deterministic pairing both engines derive with one self-join, no
    table-size knowledge needed (the last row simply has no partner)."""
    e = _t(spark, sf_dir, "embeddings")
    img = e.select(
        F.col("vec_id").alias("pair_id"), F.col("embedding").alias("img_emb")
    )
    txt = e.select(
        (F.col("vec_id") - 1).alias("pair_id"),
        F.col("embedding").alias("txt_emb"),
    )
    return img.join(txt, "pair_id")


def q_image_text_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-style alignment gate (datapipe/alignment.py
    alignment_gate): per-pair image↔caption cosine (JVM zip_with +
    aggregate fold, no Python) with kept = cos ≥ 0.28 (the public CLIP
    ViT-B/32 curation threshold, LAION-5B) — the filter every web-scale
    image-text corpus runs after dedup."""
    from scrapy_spark.datapipe.alignment import alignment_gate

    return alignment_gate(_alignment_pairs(spark, sf_dir), min_cos=0.28).orderBy(
        "pair_id"
    )


def q_image_align_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment-score distribution for threshold tuning
    (datapipe/alignment.py alignment_histogram): 0.05-wide bins over the
    same pairs — one scan + one tiny hash-agg; the curve you eyeball
    before committing a corpus-wide min_cos."""
    from scrapy_spark.datapipe.alignment import alignment_histogram

    return alignment_histogram(_alignment_pairs(spark, sf_dir), bin_width=0.05)


def q_image_phash_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup keep-one-per-cluster map: phash pairs → connected
    components → (image_id, rep_id) (datapipe/images.py phash_dedup_reps).
    The two planted twins of each base image form a 3-node cluster where
    the twins may never share a band with EACH OTHER — transitive closure
    is what groups them. Oracle: recursive CTE over the same pairs."""
    from scrapy_spark.datapipe.images import phash_dedup_reps

    return phash_dedup_reps(
        _synthetic_phash_table(spark, sf_dir), max_hamming=3
    ).orderBy("image_id")


# =====================================================================
# contract surface
# =====================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_crawl_frontier_pop(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # crawl scheduling semantics (SURVEY §2)
        "frontier_pop_global": q_frontier_pop_global,
        "frontier_pop_per_slot": q_frontier_pop_per_slot,
        "dupefilter_anti_join": q_dupefilter_anti_join,
        "robots_broadcast_gate": q_robots_broadcast_gate,
        "depth_priority_histogram": q_depth_priority_histogram,
        "politeness_eligibility": q_politeness_eligibility,
        "retry_outcomes": q_retry_outcomes,
        "stats_rollup": q_stats_rollup,
        "topk_orders": q_topk_orders,
        "union_dedupe": q_union_dedupe,
        "tumbling_window_counts": q_tumbling_window_counts,
        "latency_ema_inputs": q_latency_ema_inputs,
        "offsite_urllength_filter": q_offsite_urllength_filter,
        "httperror_filter": q_httperror_filter,
        "httpcache_replay": q_httpcache_replay,
        "logstats_rates": q_logstats_rates,
        "redirect_requeue": q_redirect_requeue,
        # training-data pipeline
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "knn_cosine_topk": q_knn_cosine_topk,
        "text_token_stats": q_text_token_stats,
        "text_quality_score": q_text_quality_score,
        "text_lang_id": q_text_lang_id,
        "text_token_count": q_text_token_count,
        # sketches / UDF identity (oracled via md5_number_upper replicas
        # and inlined SRP hyperplanes; image_decode_meta via the
        # payload-parity verdict shape — every query is value-oracled)
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_cluster_reps": q_dedup_cluster_reps,
        "sample_stratified": q_sample_stratified,
        "text_repetition_stats": q_text_repetition_stats,
        "text_contamination": q_text_contamination,
        "pii_scrub": q_pii_scrub,
        "quality_heuristic_rules": q_quality_heuristic_rules,
        "dedup_span_stats": q_dedup_span_stats,
        "dedup_span_removal": q_dedup_span_removal,
        "script_mix": q_script_mix,
        "text_top_terms": q_text_top_terms,
        "pack_sequences": q_pack_sequences,
        "semdedup_reps": q_semdedup_reps,
        "corpus_mix": q_corpus_mix,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "dedup_incremental": q_dedup_incremental,
        "html_extract_text": q_html_extract_text,
        "doc_winnow_fingerprints": q_doc_winnow_fingerprints,
        "request_identity": q_request_identity,
        "crawl_frontier_pop": q_crawl_frontier_pop,
        "image_decode_meta": q_image_decode_meta,
        "image_thumbs_parity": q_image_thumbs_parity,
        "audio_decode_meta": q_audio_decode_meta,
        "video_frame_sample": q_video_frame_sample,
        "image_phash_neardup": q_image_phash_neardup,
        "image_phash_neardup_mih": q_image_phash_neardup_mih,
        "image_phash_cluster_reps": q_image_phash_cluster_reps,
        "image_caption_dup_pairs": q_image_caption_dup_pairs,
        "image_joint_dedup_reps": q_image_joint_dedup_reps,
        "image_aspect_buckets": q_image_aspect_buckets,
        "image_exact_dedup": q_image_exact_dedup,
        "image_text_alignment": q_image_text_alignment,
        "image_align_histogram": q_image_align_histogram,
    }


_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _script_mix_oracle_sql() -> str:
    """script_mix replayed in DuckDB — generated from the SAME
    SCRIPT_RANGES tuple the Spark operator uses, so the two engines
    cannot drift. RE2 reads the \\x{..} range classes identically to
    Java regex (single-quoted DuckDB strings pass backslashes raw)."""
    from scrapy_spark.datapipe.text import SCRIPT_RANGES

    counts = ",\n                   ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS {name}"
        for name, pat in SCRIPT_RANGES
    )
    unions = "\n              UNION ALL ".join(
        f"SELECT doc_id, '{name}' AS name, {name} AS cnt FROM c"
        for name, _ in SCRIPT_RANGES
    )
    return f"""
        WITH c AS (
          SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                   {counts}
          FROM documents),
        dom AS (
          SELECT doc_id, name,
                 ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY cnt DESC, name ASC) AS rn
          FROM ({unions}))
        SELECT c.*, dom.name AS dominant_script
        FROM c JOIN dom ON c.doc_id = dom.doc_id AND dom.rn = 1
    """


def _simhash_oracle_sql() -> str:
    """SimHash near-dup pairs replicated in DuckDB (md5_number_upper bit
    sampling, 4x16 band join, hamming<=3) - shared by the dedup_simhash
    oracle and the dedup_cluster_reps recursive-CTE oracle."""
    return f"""
            WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
            tc AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY doc_id, tok),
            bits AS (
              SELECT doc_id, j,
                     sum(cnt * (2 * CAST((md5_number_upper(tok) >> j) & 1 AS BIGINT) - 1)) AS v
              FROM tc CROSS JOIN range(64) r(j) GROUP BY doc_id, j),
            shv AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << j ELSE 0 END)
                          AS UHUGEINT) AS hu
              FROM bits GROUP BY doc_id),
            alld AS (
              SELECT d.doc_id, coalesce(CAST(s.hu AS UBIGINT), 0) AS h
              FROM documents d LEFT JOIN shv s USING (doc_id)),
            banded AS (
              SELECT doc_id, h, bi AS band_id, (h >> (16*bi)) & 65535 AS chunk
              FROM alld CROSS JOIN range(4) r(bi)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.h AS ha, b.h AS hb
              FROM banded a JOIN banded b
                ON a.band_id = b.band_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
            SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
            FROM cand WHERE bit_count(xor(ha, hb)) <= 3
        """


def _phash_pairs_oracle_sql() -> str:
    """DuckDB replica of q_image_phash_neardup: same md5-derived 60-bit
    base hashes (md5_number_upper >> 4 ≡ Spark's conv(md5hex[1:15],16,10)),
    same planted-twin bit flips, same 4×16-bit pigeonhole band join +
    popcount ≤ 3 filter."""
    return """
            WITH base AS (
              SELECT doc_id AS image_id,
                     CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) >> 4
                          AS BIGINT) AS phash
              FROM documents),
            planted AS (
              SELECT doc_id,
                     CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) >> 4
                          AS BIGINT) AS ph
              FROM documents WHERE doc_id % 37 = 0),
            t1 AS (
              SELECT doc_id + 10000000 AS image_id,
                     xor(ph, (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
                           | (CAST(1 AS BIGINT) << CAST((doc_id*7+11) % 60 AS INT))
                           | (CAST(1 AS BIGINT) << CAST((doc_id*13+29) % 60 AS INT)))
                       AS phash
              FROM planted),
            t2 AS (
              SELECT doc_id + 20000000 AS image_id,
                     xor(ph, (CAST(1 AS BIGINT) << CAST((doc_id+17) % 60 AS INT))
                           | (CAST(1 AS BIGINT) << CAST((doc_id*11+5) % 60 AS INT)))
                       AS phash
              FROM planted),
            allimg AS (
              SELECT * FROM base UNION ALL SELECT * FROM t1
              UNION ALL SELECT * FROM t2),
            banded AS (
              SELECT image_id, phash, bi AS band_id,
                     (phash >> (16*bi)) & 65535 AS chunk
              FROM allimg CROSS JOIN range(4) r(bi)),
            cand AS (
              SELECT DISTINCT a.image_id AS id_a, b.image_id AS id_b,
                              a.phash AS pa, b.phash AS pb
              FROM banded a JOIN banded b
                ON a.band_id = b.band_id AND a.chunk = b.chunk
               AND a.image_id < b.image_id)
            SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
            FROM cand WHERE bit_count(xor(pa, pb)) <= 3
        """


def _corpus_meta_oracle_cte() -> str:
    """DuckDB CTE replica of _synthetic_corpus_meta: the phash allimg
    union widened with the same image_id-derived caption/w/h/bytes
    formulas. Returns the CTE body (callers embed in WITH ... )."""
    return """
            base AS (
              SELECT doc_id AS image_id,
                     CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) >> 4
                          AS BIGINT) AS phash
              FROM documents),
            planted AS (
              SELECT doc_id,
                     CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) >> 4
                          AS BIGINT) AS ph
              FROM documents WHERE doc_id % 37 = 0),
            t1 AS (
              SELECT doc_id + 10000000 AS image_id,
                     xor(ph, (CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT))
                           | (CAST(1 AS BIGINT) << CAST((doc_id*7+11) % 60 AS INT))
                           | (CAST(1 AS BIGINT) << CAST((doc_id*13+29) % 60 AS INT)))
                       AS phash
              FROM planted),
            t2 AS (
              SELECT doc_id + 20000000 AS image_id,
                     xor(ph, (CAST(1 AS BIGINT) << CAST((doc_id+17) % 60 AS INT))
                           | (CAST(1 AS BIGINT) << CAST((doc_id*11+5) % 60 AS INT)))
                       AS phash
              FROM planted),
            allimg AS (
              SELECT * FROM base UNION ALL SELECT * FROM t1
              UNION ALL SELECT * FROM t2),
            meta AS (
              SELECT image_id, phash,
                     CASE WHEN image_id < 10000000
                          THEN 'cap ' || CAST(image_id % 211 AS VARCHAR)
                          ELSE 'tw ' || CAST(image_id AS VARCHAR) END
                       AS caption,
                     CAST(8 + image_id % 113 AS INT) AS w,
                     CAST(8 + (image_id*7+3) % 113 AS INT) AS h,
                     encode(repeat('x',
                       CAST(24 + (image_id % 50) * 3 AS INT))) AS bytes
              FROM allimg)
        """


def _caption_star_pairs_sql() -> str:
    """DuckDB replica of caption_dup_pairs over the meta CTE: min-id
    hub → member star edges for duplicated captions."""
    return """
            SELECT h.id_a, m.image_id AS id_b
            FROM (SELECT caption, min(image_id) AS id_a
                  FROM meta GROUP BY caption HAVING count(*) > 1) h
            JOIN meta m ON m.caption = h.caption
            WHERE m.image_id <> h.id_a
        """


def _aspect_buckets_oracle_sql() -> str:
    """DuckDB replica of q_image_aspect_buckets: the SAME geometric-mean
    cut constants, generated from datapipe.images.ASPECT_BUCKETS by the
    identical math.sqrt calls — constants can never drift apart."""
    import math

    from scrapy_spark.datapipe.images import ASPECT_BUCKETS

    expr = f"'{ASPECT_BUCKETS[-1][0]}'"
    for (name, a), (_n, b) in zip(
        reversed(ASPECT_BUCKETS[:-1]), reversed(ASPECT_BUCKETS[1:])
    ):
        cut = math.sqrt(a * b)
        expr = (
            f"CASE WHEN CAST(w AS DOUBLE)/CAST(h AS DOUBLE) < {cut!r} "
            f"THEN '{name}' ELSE {expr} END"
        )
    return f"""
            WITH {_corpus_meta_oracle_cte()}
            SELECT {expr} AS bucket,
                   count(*) AS n,
                   CAST(sum(CAST(CAST(w AS DOUBLE)/CAST(h AS DOUBLE)
                                 AS DECIMAL(30,10))) AS DOUBLE)
                     AS sum_aspect,
                   CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes
            FROM meta
            GROUP BY 1 ORDER BY 1
        """


def _minhash_oracle_sql() -> str:
    """DuckDB replica of datapipe.dedup.minhash_lsh_pairs (64 hashes,
    16 bands × 4 rows, threshold 0.5, 3-gram shingles, seed 42).

    The (a, b) permutation constants are generated by the SAME
    _hash_params(64, seed=42) the Spark UDF uses and inlined as literals;
    shingle hash = md5_number_upper % 4294967291 ≡ the UDF's
    int.from_bytes(md5[:8], 'little') % p. Band membership is checked on
    band VALUES (Spark joins on murmur3 of the band slice — identical
    output modulo a ~2^-32 hash collision, which the correctness gate
    would surface)."""
    from scrapy_spark.datapipe.dedup import _hash_params

    a, b = _hash_params(64)
    params = ",".join(f"({i},{int(a[i])},{int(b[i])})" for i in range(64))
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(len(t) - 2),
                   i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
          FROM toks WHERE len(t) >= 3),
        hv AS (SELECT doc_id, md5_number_upper(shingle) % 4294967291 AS h FROM sh),
        params(i, pa, pb) AS (VALUES {params}),
        sig AS (
          SELECT doc_id, i,
                 min((CAST(pa AS HUGEINT) * h + pb) % 4294967291) AS s
          FROM hv CROSS JOIN params GROUP BY doc_id, i),
        sigfull AS (
          SELECT d.doc_id,
                 coalesce(sg.sig,
                          list_transform(range(64),
                                         x -> CAST(4294967291 AS HUGEINT))) AS sig
          FROM documents d LEFT JOIN
            (SELECT doc_id, list(s ORDER BY i) AS sig FROM sig GROUP BY doc_id) sg
          USING (doc_id)),
        bands AS (
          SELECT doc_id, bi AS band_id, CAST(sig[bi*4+1:bi*4+4] AS VARCHAR) AS bv
          FROM sigfull CROSS JOIN range(16) r(bi)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id),
        est AS (
          SELECT id_a, id_b,
                 round(list_sum(list_transform(range(64),
                       x -> CASE WHEN sa.sig[x+1] = sb.sig[x+1]
                            THEN 1 ELSE 0 END)) / 64.0, 4) AS est_jaccard
          FROM cand
          JOIN sigfull sa ON sa.doc_id = id_a
          JOIN sigfull sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
    """


def _ann_lsh_oracle_sql(nbits: int = 16, ntables: int = 8, dim: int = 64,
                        seed: int = 7, k: int = 5) -> str:
    """Exact DuckDB twin of ``q_ann_lsh_topk`` — the MinHash trick applied
    to SRP: the random hyperplanes are deterministic given the seed, so
    their 8×16×64 doubles are INLINED as a VALUES table (generated here,
    not hand-written) and the whole pipeline — sign-bit buckets, bucket
    join, exact cosine re-rank — is replayed relationally. Output equality
    therefore checks the bucketing itself, not just recall. Sign flips
    from summation-order fp noise would need |v·p| ≲ 1e-14 (observed |v·p|
    is O(1)); probability over the full corpus ≈ 1e-10 — vacuously safe."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(ntables * nbits, dim))
    rows = ",\n              ".join(
        f"({t},{j},[{','.join(repr(float(x)) for x in planes[t * nbits + j])}])"
        for t in range(ntables)
        for j in range(nbits)
    )
    return f"""
        WITH base AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        jit AS (
          SELECT vec_id + 10000 AS vec_id,
                 list_transform(v, (x, i) ->
                   x * (CAST(1.0 AS DOUBLE) + CAST(0.05 AS DOUBLE)
                        * ((((i - 1) % 2) * 2) - 1))) AS v
          FROM base WHERE vec_id < 100),
        corpus AS (SELECT * FROM base UNION ALL SELECT * FROM jit),
        planes(tbl, bit, p) AS (VALUES
              {rows}),
        buck AS (
          SELECT c.vec_id,
                 pl.tbl * {1 << nbits} + SUM(
                   CASE WHEN list_dot_product(c.v, pl.p::DOUBLE[]) > 0
                        THEN (1::BIGINT << pl.bit) ELSE 0 END) AS bucket
          FROM corpus c CROSS JOIN planes pl
          GROUP BY c.vec_id, pl.tbl),
        cand AS (
          SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
          FROM buck a JOIN buck b
            ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 round(list_dot_product(q.v, c.v) /
                       (sqrt(list_dot_product(q.v, q.v)) *
                        sqrt(list_dot_product(c.v, c.v))), 4) AS cos_sim
          FROM cand
          JOIN corpus q ON q.vec_id = cand.query_id
          JOIN corpus c ON c.vec_id = cand.neighbor_id)
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
          SELECT query_id, neighbor_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id ASC)
                   AS rank
          FROM scored)
        WHERE rank <= {k}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "frontier_pop_global": """
            SELECT o_orderkey, priority, pop_rank FROM (
              SELECT o_orderkey,
                     6 - CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority,
                     ROW_NUMBER() OVER (
                       ORDER BY 6 - CAST(substr(o_orderpriority, 1, 1) AS INT) DESC,
                                o_orderkey ASC) AS pop_rank
              FROM orders) WHERE pop_rank <= 100
        """,
        "frontier_pop_per_slot": """
            SELECT o_orderkey, o_custkey, priority, slot_rank FROM (
              SELECT o_orderkey, o_custkey,
                     6 - CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority,
                     ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY 6 - CAST(substr(o_orderpriority, 1, 1) AS INT) DESC,
                                o_orderkey ASC) AS slot_rank
              FROM orders) WHERE slot_rank <= 3
        """,
        "dupefilter_anti_join": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'F')
        """,
        "robots_broadcast_gate": """
            SELECT r_name, count(*) AS n_customers,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
                     AS sum_acctbal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r_name <> 'ASIA'
            GROUP BY r_name
        """,
        "depth_priority_histogram": """
            SELECT depth, count(*) AS n_requests, -depth AS eff_priority
            FROM (SELECT l_linenumber AS depth FROM lineitem)
            WHERE depth <= 4 GROUP BY depth
        """,
        "politeness_eligibility": """
            WITH nf AS (
              SELECT user_id,
                     min(ts) + (user_id % 60) * INTERVAL 1 MINUTE AS next_free_at
              FROM events GROUP BY user_id)
            SELECT e.user_id, count(*) AS n_eligible
            FROM events e JOIN nf ON e.user_id = nf.user_id
            WHERE e.ts >= nf.next_free_at
            GROUP BY e.user_id
        """,
        "retry_outcomes": """
            SELECT user_id, n_errors,
                   CASE WHEN n_errors <= 2 THEN 'RETRY' ELSE 'FAILED' END AS final_status,
                   -least(n_errors, 3) AS priority_adjust
            FROM (SELECT user_id, count(*) AS n_errors FROM events
                  WHERE event_type = 'error' GROUP BY user_id)
        """,
        "stats_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
                     AS sum_price,
                   CAST(sum(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE)
                     AS sum_disc
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "topk_orders": """
            SELECT o_orderkey, totalprice, rk FROM (
              SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
                     ROW_NUMBER() OVER (ORDER BY round(o_totalprice, 2) DESC,
                                        o_orderkey ASC) AS rk
              FROM orders) WHERE rk <= 50
        """,
        "union_dedupe": """
            SELECT DISTINCT custkey FROM (
              SELECT o_custkey AS custkey FROM orders
              UNION ALL
              SELECT c_custkey AS custkey FROM customer)
        """,
        "tumbling_window_counts": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "latency_ema_inputs": """
            SELECT user_id,
                   CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE)
                     AS sum_latency,
                   count(*) AS n_samples
            FROM events GROUP BY user_id
        """,
        "offsite_urllength_filter": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE regexp_matches(source, '^src[0-3]$') AND n_chars <= 300
        """,
        "httperror_filter": """
            SELECT event_type, count(*) AS n_ok FROM events
            WHERE event_type <> 'error' AND value BETWEEN 10 AND 90
            GROUP BY event_type
        """,
        "redirect_requeue": """
            SELECT o_orderkey,
                   (6 - CAST(substr(o_orderpriority, 1, 1) AS INT)) + 2
                     AS new_priority,
                   CAST(o_orderkey % 21 AS INT) + 1 AS new_hops
            FROM orders
            WHERE o_orderstatus = 'O' AND o_orderkey % 21 < 20
        """,
        "logstats_rates": """
            WITH per_epoch AS (
              SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
              FROM events GROUP BY event_type, CAST(ts AS DATE)
            )
            SELECT event_type, CAST(day AS VARCHAR) AS day, n,
                   n - COALESCE(LAG(n) OVER (PARTITION BY event_type
                                             ORDER BY day), 0) AS rate_delta
            FROM per_epoch
        """,
        "httpcache_replay": """
            WITH popped AS (
              SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
            ),
            cached AS (
              SELECT user_id, event_id AS cached_event_id FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase')
              WHERE rn = 1
            )
            SELECT p.user_id, c.cached_event_id, 'hit' AS outcome
            FROM popped p JOIN cached c USING (user_id)
            UNION ALL
            SELECT p.user_id, CAST(NULL AS BIGINT) AS cached_event_id,
                   'miss' AS outcome
            FROM popped p WHERE NOT EXISTS
              (SELECT 1 FROM cached c WHERE c.user_id = p.user_id)
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_ngram_jaccard": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(len(t) - 2),
                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
              FROM toks WHERE len(t) >= 3),
            cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, common,
                   round(common * 1.0 / (ca.n_sh + cb.n_sh - common), 4) AS jaccard
            FROM pairs
            JOIN cnt ca ON ca.doc_id = id_a
            JOIN cnt cb ON cb.doc_id = id_b
            WHERE round(common * 1.0 / (ca.n_sh + cb.n_sh - common), 4) >= 0.5
        """,
        "embedding_near_dup_pairs": """
            SELECT id_a, id_b, cos_sim FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(
                       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                       4) AS cos_sim
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
            WHERE cos_sim >= 0.4
        """,
        "embedding_near_dup_lsh": """
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            jit AS (
              SELECT vec_id + 10000 AS vec_id,
                     list_transform(v, (x, i) ->
                       x * (CAST(1.0 AS DOUBLE) + CAST(0.05 AS DOUBLE)
                            * ((((i - 1) % 2) * 2) - 1))) AS v
              FROM base WHERE vec_id < 100),
            corpus AS (SELECT * FROM base UNION ALL SELECT * FROM jit)
            SELECT id_a, id_b, cos_sim FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_dot_product(a.v, b.v) /
                           (sqrt(list_dot_product(a.v, a.v)) *
                            sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
              FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
            WHERE cos_sim >= 0.99
        """,
        # IVF at nprobe = ncells probes every cell, so its output must
        # EQUAL exact brute-force kNN — the oracle is the same shape as
        # knn_cosine_topk (same query set, rounding, and tie-break)
        "ann_ivf_topk": """
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(
                       list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                       4) AS cos_sim,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(
                         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                         4) DESC, c.vec_id ASC) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 10)
            WHERE rank <= 5
        """,
        # IVF-PQ at nprobe = ncells with rerank ≥ |corpus| keeps every
        # candidate through the ADC prune and re-ranks all of them with
        # exact cosine, so its output must EQUAL exact brute-force kNN —
        # identical oracle to ann_ivf_topk (PQ quality cancels out)
        "ann_ivfpq_topk": """
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(
                       list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                       4) AS cos_sim,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(
                         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                         4) DESC, c.vec_id ASC) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 10)
            WHERE rank <= 5
        """,
        # dedup_incremental: direct (no-prefix) delta-vs-corpus
        # classification — the Spark side's asymmetric prefix filter
        # must reproduce these verdicts exactly
        "dedup_incremental": f"""
            WITH delta AS (
              SELECT doc_id + 100000 AS doc_id, text
              FROM documents WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id + 100000, text || ' aardvark aardvark aardvark'
              FROM documents WHERE doc_id % 10 = 1
              UNION ALL
              SELECT doc_id + 100000,
                     'zulu zebra quokka wombat numbat doc ' || CAST(doc_id AS VARCHAR)
              FROM documents WHERE doc_id % 10 = 2),
            exact AS (
              SELECT d.doc_id, 'exact_dup' AS verdict,
                     min(c.doc_id)::BIGINT AS match_id,
                     CAST(1.0 AS DOUBLE) AS jaccard
              FROM delta d JOIN documents c ON md5(d.text) = md5(c.text)
              GROUP BY d.doc_id),
            surv AS (
              SELECT * FROM delta
              WHERE doc_id NOT IN (SELECT doc_id FROM exact)),
            shd AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(len(t) - 2),
                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
              FROM (SELECT doc_id, {_TOKS} AS t FROM surv) WHERE len(t) >= 3),
            shc AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(len(t) - 2),
                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
              FROM (SELECT doc_id, {_TOKS} AS t FROM documents) WHERE len(t) >= 3),
            cntd AS (SELECT doc_id, count(*) AS n_sh FROM shd GROUP BY doc_id),
            cntc AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
            pairs AS (
              SELECT d.doc_id AS d_id, c.doc_id AS c_id, count(*) AS common
              FROM shd d JOIN shc c ON d.shingle = c.shingle
              GROUP BY 1, 2),
            scored AS (
              SELECT d_id, c_id,
                     round(common * 1.0 / (nd.n_sh + nc.n_sh - common), 4) AS jaccard
              FROM pairs
              JOIN cntd nd ON nd.doc_id = d_id
              JOIN cntc nc ON nc.doc_id = c_id),
            near AS (
              SELECT d_id AS doc_id, 'near_dup' AS verdict,
                     c_id::BIGINT AS match_id, CAST(jaccard AS DOUBLE) AS jaccard
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY d_id ORDER BY jaccard DESC, c_id ASC) AS r
                    FROM scored WHERE jaccard >= 0.5)
              WHERE r = 1)
            SELECT * FROM exact
            UNION ALL SELECT * FROM near
            UNION ALL
            SELECT doc_id, 'new' AS verdict, NULL::BIGINT AS match_id,
                   NULL::DOUBLE AS jaccard
            FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM near)
        """,
        # html_extract_text: the full strip/mark/split/filter chain
        # re-expressed in DuckDB (RE2) — every regex is in the
        # RE2 ∩ Java-regex subset so the two engines agree byte-for-byte
        "html_extract_text": """
            WITH pages AS (
              SELECT doc_id,
                '<html><head><title>Synthetic page for doc ' || CAST(doc_id AS VARCHAR) ||
                '</title><style>p { margin: 0 }</style></head><body>' ||
                '<div id="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>' ||
                '<p>' || regexp_replace(text, '\\n', '</p><p>', 'g') ||
                '</p><script>var tracker = 1;</script>' ||
                '<p>Tom &amp; Jerry say &quot;hello&quot; to doc ' || CAST(doc_id AS VARCHAR) ||
                ' &lt;here&gt;</p>' ||
                '<div id="footer"><a href="/tos">Terms of use</a> © 2026 Example</div></body></html>'
                AS html
              FROM documents),
            stripped AS (
              SELECT doc_id,
                replace(replace(replace(replace(replace(replace(
                  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  regexp_replace(regexp_replace(regexp_replace(
                    html,
                    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                    '(?s)<!--.*?-->', ' ', 'g'),
                    '(?is)<a[ \\t][^>]*>', chr(1), 'g'),
                    '(?is)</a>', chr(2), 'g'),
                    '(?i)</(p|div|li|h1|h2|h3|h4|h5|h6|tr|title|ul|ol|table)>', chr(10), 'g'),
                    '(?i)<(br|hr)[^>]*>', chr(10), 'g'),
                    '<[^>]*>', ' ', 'g'),
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&')
                AS txt
              FROM pages),
            kept AS (
              SELECT doc_id,
                list_filter(
                  list_transform(string_split(txt, chr(10)), l ->
                    CASE WHEN
                      length(trim(regexp_replace(replace(replace(l, chr(1), ''), chr(2), ''), '[ \\t\\r]+', ' ', 'g'))) > 0
                      AND len(string_split(trim(regexp_replace(replace(replace(l, chr(1), ''), chr(2), ''), '[ \\t\\r]+', ' ', 'g')), ' ')) >= 3
                      AND (length(l) - length(regexp_replace(l, chr(1) || '[^' || chr(2) || ']*' || chr(2), '', 'g'))
                           - 2 * (length(l) - length(replace(l, chr(1), ''))))
                          <= 0.33 * length(trim(regexp_replace(replace(replace(l, chr(1), ''), chr(2), ''), '[ \\t\\r]+', ' ', 'g')))
                    THEN trim(regexp_replace(replace(replace(l, chr(1), ''), chr(2), ''), '[ \\t\\r]+', ' ', 'g'))
                    END),
                  x -> x IS NOT NULL) AS lines
              FROM stripped)
            SELECT doc_id, array_to_string(lines, chr(10)) AS text,
                   len(lines)::BIGINT AS n_lines,
                   length(array_to_string(lines, chr(10)))::BIGINT AS n_chars
            FROM kept
        """,
        "knn_cosine_topk": """
            SELECT query_id, neighbor_id, cos_sim, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(
                       list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                        sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                       4) AS cos_sim,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(
                         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                         4) DESC, c.vec_id ASC) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 10)
            WHERE rank <= 5
        """,
        "text_token_stats": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
            SELECT doc_id, len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_uniq_tokens,
                   round(CASE WHEN len(t) > 0
                         THEN len(list_distinct(t)) / len(t) ELSE 0.0 END, 4) AS ttr,
                   round(CASE WHEN len(t) > 0
                         THEN list_sum(list_transform(t, x -> length(x))) / len(t)
                         ELSE 0.0 END, 4) AS avg_token_len
            FROM toks
        """,
        "text_quality_score": f"""
            WITH s AS (
              SELECT doc_id, {_TOKS} AS t,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
              FROM documents),
            m AS (
              SELECT doc_id, len(t) AS n_tokens,
                     CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END
                       AS punct_ratio,
                     CASE WHEN len(t) > 0
                          THEN len(list_filter(t,
                            x -> x IN ('the','a','of','and','to','is'))) / len(t)
                          ELSE 0.0 END AS stop_ratio
              FROM s)
            SELECT doc_id, n_tokens, round(punct_ratio, 4) AS punct_ratio,
                   round(stop_ratio, 4) AS stop_ratio,
                   round(0.3 * least(n_tokens / 100.0, 1.0)
                       + 0.3 * (1.0 - punct_ratio)
                       + 0.4 * least(stop_ratio * 5.0, 1.0), 4) AS quality
            FROM m
        """,
        "text_lang_id": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sc AS (
              SELECT doc_id,
                len(list_filter(t, x -> x IN ('the','a','of','and','to','is'))) AS score_en,
                len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht'))) AS score_de,
                len(list_filter(t, x -> x IN ('le','la','les','et','est','une'))) AS score_fr,
                len(list_filter(t, x -> x IN ('el','los','las','es','una','que'))) AS score_es
              FROM toks)
            SELECT doc_id,
                   CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0 THEN 'und'
                        WHEN score_en = greatest(score_en, score_de, score_fr, score_es) THEN 'en'
                        WHEN score_de = greatest(score_en, score_de, score_fr, score_es) THEN 'de'
                        WHEN score_fr = greatest(score_en, score_de, score_fr, score_es) THEN 'fr'
                        ELSE 'es' END AS pred_lang,
                   score_en, score_de, score_fr, score_es
            FROM sc
        """,
        # BPE-ish pattern: apostrophes doubled per SQL literal rules; the
        # regex itself is BPE_ISH_RE (datapipe/text.py), byte-identical
        "text_token_count": r"""
            WITH c AS (
              SELECT doc_id, text,
                     len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+'))
                       AS n_bpe,
                     CASE WHEN length(trim(text)) > 0
                          THEN len(regexp_split_to_array(trim(text), '\s+'))
                          ELSE 0 END AS n_ws
              FROM documents)
            SELECT doc_id, n_ws AS n_ws_tokens, n_bpe AS n_bpe_tokens,
                   round(CASE WHEN n_bpe > 0 THEN length(text) / n_bpe
                         ELSE 0.0 END, 4) AS chars_per_bpe_token
            FROM c
        """,
        # ---- sketch oracles: DuckDB's md5_number_upper(s) equals the
        # package's int.from_bytes(md5(s)[:8], 'little') shingle/token hash
        # (verified bit-for-bit), so MinHash / SimHash / winnowing are
        # fully SQL-replicable. MinHash a/b permutation constants are
        # inlined from the same _hash_params(seed=42) the Spark UDF uses.
        "dedup_minhash_lsh": _minhash_oracle_sql(),
        "ann_lsh_topk": _ann_lsh_oracle_sql(),
        "dedup_simhash": _simhash_oracle_sql(),
        "image_phash_neardup": _phash_pairs_oracle_sql(),
        # mih is EXACT too — identical output contract, same oracle
        "image_phash_neardup_mih": _phash_pairs_oracle_sql(),
        "image_caption_dup_pairs": f"""
            WITH {_corpus_meta_oracle_cte()}
            {_caption_star_pairs_sql()}
        """,
        "image_joint_dedup_reps": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_phash_pairs_oracle_sql()}) p
              UNION
              SELECT id_a, id_b
              FROM (WITH {_corpus_meta_oracle_cte()}
                    {_caption_star_pairs_sql()}) c
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs
            ),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(id, comp) AS (
              SELECT id, id AS comp FROM nodes
              UNION
              SELECT e.a AS id, r.comp
              FROM reach r JOIN edges e ON r.id = e.b
            )
            SELECT id AS image_id, CAST(min(comp) AS BIGINT) AS rep_id
            FROM reach GROUP BY id
        """,
        # payload-parity verdict: image_id/fmt/caption are pure doc_id
        # formulas (sources/corpus.py synth_corpus_df), and an intact
        # corpus pins every verdict flag TRUE — any wrong decode (dims,
        # pixels, container magic, phash lineage) flips a flag and fails
        # the value hash. Word list = corpus._WORDS, 1-based list_extract.
        "image_decode_meta": """
            SELECT 'img' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS image_id,
                   CASE WHEN doc_id % 5 < 3 THEN 'rawrgb' ELSE 'qrgb' END AS fmt,
                   'caption for img' || lpad(CAST(doc_id AS VARCHAR), 10, '0')
                     || ': ' || list_extract(
                          ['ant','bee','cat','dog','elk','fox','gnu','hen',
                           'ibex','jay'], CAST(doc_id % 10 AS INT) + 1)
                     AS caption,
                   TRUE AS decode_ok, TRUE AS dims_ok, TRUE AS phash_ok,
                   TRUE AS pixels_ok, TRUE AS payload_ok
            FROM documents WHERE doc_id < 200
        """,
        # audio/video fake-codec corpora: every header field the decode
        # returns is a pure doc_id formula (functions/media.py
        # audio_params/video_params), so the oracle checks VALUES —
        # only the bit-exact content flags are pinned TRUE
        "audio_decode_meta": """
            SELECT 'aud' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS media_id,
                   CAST(16000 + (doc_id % 2) * 28100 AS INT) AS rate,
                   CAST(1 + doc_id % 2 AS INT) AS channels,
                   CAST(256 + (doc_id % 50) * 64 AS INT) AS nsamples,
                   round((256 + (doc_id % 50) * 64) * 1000.0
                         / (16000 + (doc_id % 2) * 28100), 4) AS duration_ms,
                   TRUE AS decode_ok, TRUE AS samples_ok
            FROM documents WHERE doc_id < 200
        """,
        "video_frame_sample": """
            SELECT 'vid' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS media_id,
                   CAST(4 + doc_id % 9 AS INT) AS w,
                   CAST(4 + (doc_id * 3) % 9 AS INT) AS h,
                   CAST(4 + doc_id % 13 AS INT) AS nframes,
                   CAST(floor((4 + doc_id % 13 - 1) / 3) AS INT) + 1
                     AS n_sampled,
                   TRUE AS decode_ok, TRUE AS frames_ok
            FROM documents WHERE doc_id < 200
        """,
        "image_thumbs_parity": """
            SELECT 'img' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS image_id,
                   TRUE AS thumb_decodes, TRUE AS dims_ok,
                   TRUE AS within_cap, TRUE AS pixels_ok, TRUE AS thumb_ok
            FROM documents WHERE doc_id < 200
        """,
        "image_aspect_buckets": _aspect_buckets_oracle_sql(),
        "image_exact_dedup": f"""
            WITH {_corpus_meta_oracle_cte()},
            h AS (
              SELECT image_id,
                     md5(repeat('x', CAST(24 + (image_id % 50) * 3 AS INT)))
                       AS content_md5
              FROM meta)
            SELECT h.image_id, r.rep_id, h.content_md5
            FROM h JOIN (SELECT content_md5, min(image_id) AS rep_id
                         FROM h GROUP BY content_md5) r
              USING (content_md5)
        """,
        "image_text_alignment": """
            WITH p AS (
              SELECT q.vec_id AS pair_id,
                     q.embedding::DOUBLE[] AS vi, c.embedding::DOUBLE[] AS vt
              FROM embeddings q JOIN embeddings c ON c.vec_id = q.vec_id + 1),
            s AS (
              SELECT pair_id,
                     CASE WHEN sqrt(list_dot_product(vi, vi)) > 0
                           AND sqrt(list_dot_product(vt, vt)) > 0
                          THEN round(list_dot_product(vi, vt) /
                                (sqrt(list_dot_product(vi, vi)) *
                                 sqrt(list_dot_product(vt, vt))), 4)
                     END AS align_cos
              FROM p)
            SELECT pair_id, align_cos,
                   coalesce(align_cos >= 0.28, false) AS kept
            FROM s
        """,
        "image_align_histogram": """
            WITH p AS (
              SELECT q.vec_id AS pair_id,
                     q.embedding::DOUBLE[] AS vi, c.embedding::DOUBLE[] AS vt
              FROM embeddings q JOIN embeddings c ON c.vec_id = q.vec_id + 1),
            s AS (
              SELECT round(list_dot_product(vi, vt) /
                       (sqrt(list_dot_product(vi, vi)) *
                        sqrt(list_dot_product(vt, vt))), 4) AS align_cos
              FROM p)
            SELECT round(floor(align_cos / 0.05) * 0.05, 4) AS bin_lo,
                   count(*) AS n
            FROM s WHERE align_cos IS NOT NULL
            GROUP BY 1
        """,
        "image_phash_cluster_reps": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_phash_pairs_oracle_sql()}) s
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs
            ),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(id, comp) AS (
              SELECT id, id AS comp FROM nodes
              UNION
              SELECT e.a AS id, r.comp
              FROM reach r JOIN edges e ON r.id = e.b
            )
            SELECT id AS image_id, CAST(min(comp) AS BIGINT) AS rep_id
            FROM reach GROUP BY id
        """,
        "dedup_cluster_reps": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_simhash_oracle_sql()}) s
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs
            ),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(id, comp) AS (
              SELECT id, id AS comp FROM nodes
              UNION
              SELECT e.a AS id, r.comp
              FROM reach r JOIN edges e ON r.id = e.b
            )
            SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS rep_id
            FROM reach GROUP BY id
        """,
        "corpus_mix": """
            WITH agg AS (
              SELECT source AS bucket,
                     count(*) AS n_docs,
                     CAST(SUM(CAST(len(regexp_extract_all(lower(text),
                         '[a-z0-9]+')) AS BIGINT)) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source),
            tot AS (SELECT SUM(n_tokens) AS total FROM agg)
            SELECT bucket, n_docs, n_tokens,
                   CAST(n_tokens * 1000000 // total AS BIGINT) AS tok_ppm,
                   CAST(row_number() OVER (ORDER BY n_tokens DESC, bucket ASC)
                        AS BIGINT) AS rank,
                   CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, bucket ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_tokens
            FROM agg CROSS JOIN tot
        """,
        "pack_sequences": """
            WITH toks AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS BIGINT) AS n_tok
              FROM documents),
            nz AS (SELECT * FROM toks WHERE n_tok > 0),
            c AS (
              SELECT doc_id, n_tok,
                     CAST(coalesce(SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS tok_start
              FROM nz)
            SELECT doc_id, n_tok, tok_start,
                   CAST(floor(tok_start / 512) AS BIGINT) AS first_chunk,
                   CAST(floor((tok_start + n_tok - 1) / 512) AS BIGINT)
                     AS last_chunk,
                   CAST(floor((tok_start + n_tok - 1) / 512)
                        - floor(tok_start / 512) + 1 AS BIGINT) AS n_chunks
            FROM c
        """,
        "semdedup_reps": """
            WITH RECURSIVE base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            jit AS (
              SELECT vec_id + 10000 AS vec_id,
                     list_transform(v, (x, i) ->
                       x * (CAST(1.0 AS DOUBLE) + CAST(0.05 AS DOUBLE)
                            * ((((i - 1) % 2) * 2) - 1))) AS v
              FROM base WHERE vec_id < 100),
            corpus AS (SELECT * FROM base UNION ALL SELECT * FROM jit),
            cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                     v AS cvec
              FROM corpus ORDER BY vec_id LIMIT 8),
            scored AS (
              SELECT c.vec_id, c.v,
                     sqrt(list_dot_product(c.v, c.v)) AS nrm, ct.cell,
                     round(list_dot_product(c.v, ct.cvec) /
                           (sqrt(list_dot_product(c.v, c.v)) *
                            sqrt(list_dot_product(ct.cvec, ct.cvec))), 4)
                       AS cos
              FROM corpus c CROSS JOIN cent ct),
            assign AS (
              SELECT vec_id, v, nrm, cell FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cos DESC, cell ASC) AS rn FROM scored)
              WHERE rn = 1),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM assign a JOIN assign b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4)
                    >= 0.99),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(id, comp) AS (
              SELECT id, id AS comp FROM nodes
              UNION
              SELECT e.a AS id, r.comp FROM reach r JOIN edges e ON r.id = e.b)
            SELECT id AS vec_id, CAST(min(comp) AS BIGINT) AS rep_id
            FROM reach GROUP BY id
        """,
        "text_contamination": f"""
            WITH probes AS (
              SELECT doc_id AS probe_id, text FROM documents
              WHERE doc_id % 50 = 0),
            ptoks AS (
              SELECT probe_id, {_TOKS} AS t FROM probes),
            pg AS (
              SELECT DISTINCT probe_id,
                     CAST(CAST(md5_number_upper(g) AS HUGEINT)
                          - CAST(9223372036854775808 AS HUGEINT) AS BIGINT)
                       AS gh
              FROM (SELECT probe_id,
                           unnest(list_transform(range(len(t) - 7), i ->
                             t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                             || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                             || ' ' || t[i+7] || ' ' || t[i+8])) AS g
                    FROM ptoks WHERE len(t) >= 8)),
            dtoks AS (
              SELECT doc_id, {_TOKS} AS t FROM documents),
            dg AS (
              SELECT DISTINCT doc_id,
                     CAST(CAST(md5_number_upper(g) AS HUGEINT)
                          - CAST(9223372036854775808 AS HUGEINT) AS BIGINT)
                       AS gh
              FROM (SELECT doc_id,
                           unnest(list_transform(range(len(t) - 7), i ->
                             t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                             || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                             || ' ' || t[i+7] || ' ' || t[i+8])) AS g
                    FROM dtoks WHERE len(t) >= 8))
            SELECT doc_id, probe_id, count(*) AS n_shared
            FROM dg JOIN pg USING (gh)
            GROUP BY doc_id, probe_id
        """,
        "pii_scrub": "WITH " + _PII_INJECT_CTE + _pii_oracle_body(),
        "quality_heuristic_rules": f"""
            WITH inj AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 17 = 2 THEN text || ' lorem ipsum'
                          WHEN doc_id % 11 = 4 THEN text || ' {{{{{{#|}}}}}} x'
                          WHEN doc_id % 3 = 0 THEN text || '.'
                          ELSE text END AS text
              FROM documents),
            base AS (
              SELECT doc_id, text,
                     list_filter(regexp_split_to_array(text, '[ \n\t]+'),
                                 x -> x != '') AS w,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                x -> trim(x)),
                                 x -> x != '') AS l
              FROM inj)
            SELECT doc_id, n_words, mean_word_len, frac_lines_end_punct,
                   symbol_word_ratio, has_blocklist,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3 AND mean_word_len <= 10
                    AND symbol_word_ratio <= 0.1
                    AND NOT has_blocklist) AS keep
            FROM (
              SELECT doc_id,
                     len(w) AS n_words,
                     CASE WHEN len(w) = 0 THEN 0.0
                          ELSE round(list_sum(list_transform(w, x -> length(x)))
                                     * 1.0 / len(w), 4) END AS mean_word_len,
                     CASE WHEN len(l) = 0 THEN 0.0
                          ELSE round(len(list_filter(l,
                                 x -> regexp_matches(x, '[.!?"]$')))
                                     * 1.0 / len(l), 4) END
                       AS frac_lines_end_punct,
                     CASE WHEN len(w) = 0 THEN 0.0
                          ELSE round((length(text) - length(
                                 replace(replace(replace(replace(text,
                                   '#', ''), '{{', ''), '}}', ''), '|', '')))
                                     * 1.0 / len(w), 4) END
                       AS symbol_word_ratio,
                     (contains(lower(text), 'lorem ipsum')
                      OR contains(lower(text), 'javascript'))
                       AS has_blocklist
              FROM base)
        """,
        "script_mix": _script_mix_oracle_sql(),
        "dedup_span_removal": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            pg0 AS (SELECT doc_id, unnest(range(len(t) - 7)) AS i0, t
                    FROM toks WHERE len(t) >= 8),
            pg AS (SELECT doc_id, i0 + 1 AS p,
                          t[i0+1] || ' ' || t[i0+2] || ' ' || t[i0+3] || ' '
                          || t[i0+4] || ' ' || t[i0+5] || ' ' || t[i0+6]
                          || ' ' || t[i0+7] || ' ' || t[i0+8] AS shingle
                   FROM pg0),
            dup AS (SELECT shingle FROM (SELECT DISTINCT doc_id, shingle FROM pg)
                    GROUP BY shingle HAVING count(*) >= 2),
            dp AS (SELECT doc_id, p FROM pg JOIN dup USING (shingle)),
            tk0 AS (SELECT doc_id, unnest(range(len(t))) AS j0, t FROM toks),
            kept AS (SELECT tk0.doc_id, j0 + 1 AS i, t[j0+1] AS tok
                     FROM tk0
                     WHERE NOT EXISTS (
                       SELECT 1 FROM dp
                       WHERE dp.doc_id = tk0.doc_id
                         AND tk0.j0 + 1 BETWEEN dp.p AND dp.p + 7)),
            agg AS (SELECT doc_id,
                           string_agg(tok, ' ' ORDER BY i) AS clean_text,
                           count(*) AS n_kept
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(agg.clean_text, '') AS clean_text,
                   CAST(coalesce(len(toks.t), 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(len(toks.t), 0)
                        - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
            FROM documents d
            LEFT JOIN toks ON toks.doc_id = d.doc_id
            LEFT JOIN agg ON agg.doc_id = d.doc_id
        """,
        "dedup_span_stats": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(len(t) - 7),
                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                            || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                            || ' ' || t[i+7] || ' ' || t[i+8]))) AS shingle
              FROM toks WHERE len(t) >= 8),
            dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
            per AS (
              SELECT doc_id, count(*) AS n_spans,
                     sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_dup_spans
              FROM sh JOIN dfreq USING (shingle) GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(per.n_spans, 0) AS BIGINT) AS n_spans,
                   CAST(coalesce(per.n_dup_spans, 0) AS BIGINT) AS n_dup_spans
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "text_top_terms": f"""
            WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term
                          FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
            scored AS (
              SELECT doc_id, term, tf, df,
                     CAST(tf * (nd - df) AS BIGINT) AS score
              FROM tf JOIN dfreq USING (term) CROSS JOIN n)
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df, score, rank
            FROM (SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, term ASC
                  ) AS rank FROM scored)
            WHERE rank <= 3
        """,
        "text_repetition_stats": """
            WITH lines AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                x -> trim(x)),
                                 x -> x <> '') AS ls
              FROM documents),
            lstats AS (
              SELECT doc_id, len(ls) AS n_lines,
                     CASE WHEN len(ls) <= 1 THEN 0.0
                     ELSE round(1.0 - CAST(len(list_distinct(ls)) AS DOUBLE)
                                / len(ls), 4) END AS dup_line_frac
              FROM lines),
            toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     unnest(list_transform(range(len(t) - 1),
                            i -> t[i+1] || ' ' || t[i+2])) AS g
              FROM toks WHERE len(t) >= 2),
            gstats AS (
              SELECT doc_id,
                     round(CAST(max(c) AS DOUBLE) / sum(c), 4)
                       AS top_bigram_frac
              FROM (SELECT doc_id, g, count(*) AS c
                    FROM grams GROUP BY doc_id, g)
              GROUP BY doc_id)
            SELECT l.doc_id,
                   CAST(n_lines AS INT) AS n_lines,
                   dup_line_frac,
                   coalesce(top_bigram_frac, 0.0) AS top_bigram_frac
            FROM lstats l LEFT JOIN gstats USING (doc_id)
        """,
        "sample_stratified": """
            SELECT doc_id, lang, source, sample_rank FROM (
              SELECT doc_id, lang, source,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(concat_ws('|', CAST(doc_id AS VARCHAR), '42')),
                                doc_id
                     ) AS INT) AS sample_rank
              FROM documents)
            WHERE sample_rank <= 5
        """,
        "doc_winnow_fingerprints": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            grams AS (
              SELECT doc_id,
                     list_transform(range(len(t) - 4),
                       i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' '
                            || t[i+4] || ' ' || t[i+5]) AS g
              FROM toks WHERE len(t) >= 5),
            hs AS (
              SELECT doc_id,
                     list_transform(g, x ->
                       CAST(CASE WHEN md5_number_upper(x) >= CAST(9223372036854775808 AS UBIGINT)
                            THEN CAST(md5_number_upper(x) AS HUGEINT)
                                 - CAST(18446744073709551616 AS HUGEINT)
                            ELSE CAST(md5_number_upper(x) AS HUGEINT) END AS BIGINT)) AS h,
                     len(g) AS L
              FROM grams),
            sel AS (
              SELECT doc_id,
                     CASE WHEN L < 4 THEN [list_min(h)]
                     ELSE list_distinct(list_transform(range(L - 3),
                       i -> h[i + 4 - list_position(list_reverse(h[i+1:i+4]),
                                                    list_min(h[i+1:i+4])) + 1]))
                     END AS fps
              FROM hs)
            SELECT doc_id, unnest(fps) AS fingerprint FROM sel
        """,
        "request_identity": """
            SELECT event_id,
                   'https://site-' || CAST(user_id % 50 AS VARCHAR)
                     || '.example.com/page/' || CAST(event_id % 400 AS VARCHAR)
                     || '?a=1&b=2' AS url_canon,
                   'site-' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS domain,
                   1 AS fp_cardinality
            FROM events
        """,
        "crawl_frontier_pop": """
            WITH reqs AS (
              SELECT event_id AS seq,
                     'https://site-' || CAST(user_id % 50 AS VARCHAR)
                       || '.example.com/page/' || CAST(event_id % 400 AS VARCHAR) AS url_canon,
                     'site-' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS slot,
                     CAST(trunc(value) AS INT) % 10 AS priority,
                     event_type
              FROM events),
            flagged AS (
              SELECT *, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                          OVER (PARTITION BY url_canon) AS fp_purchased
              FROM reqs),
            cand AS (
              SELECT * FROM (
                SELECT seq, url_canon, slot, priority,
                       ROW_NUMBER() OVER (PARTITION BY url_canon ORDER BY seq ASC) AS rn
                FROM flagged WHERE event_type <> 'purchase' AND fp_purchased = 0)
              WHERE rn = 1),
            ranked AS (
              SELECT * FROM (
                SELECT seq, url_canon, slot, priority,
                       ROW_NUMBER() OVER (PARTITION BY slot
                                          ORDER BY priority DESC, seq ASC) AS slot_rank
                FROM cand)
              WHERE slot_rank <= 4),
            popped AS (
              SELECT * FROM ranked
              ORDER BY slot_rank ASC, priority DESC, seq ASC, slot ASC LIMIT 200)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY slot_rank ASC, priority DESC,
                                           seq ASC, slot ASC) AS INT) AS pop_rank,
                   seq, url_canon, slot, priority, slot_rank
            FROM popped
        """,
    }
