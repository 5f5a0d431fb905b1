"""Sequence packing (concat-and-chunk) for training-batch assembly.

The standard LLM pretraining packer concatenates the token streams of all
documents in a fixed corpus order and slices the stream into fixed-size
training sequences of ``budget`` tokens (GPT-2/3 style "packing"; public
descriptions in the GPT-3 appendix and the T5 paper's "pack" preprocessor).
The per-document question a pipeline needs answered is: *which training
chunks does each document land in, and how badly is it fragmented across
chunk boundaries?*

This module computes, for every document, its global token offset in the
concatenated stream and the chunk span it occupies — WITHOUT a
single-partition global window. A plain
``Window.orderBy(doc_id).rowsBetween(unboundedPreceding, ...)`` funnels the
whole corpus through ONE task (Spark plans an Exchange SinglePartition);
at 10^10 documents that task is the job. Instead the prefix sum is built
the same way operators/pop.py::global_seq builds its sequence numbers:

    range-repartition on the order key (RangePartitioner is key-based, so
    partition concatenation in pid order IS the global order)
      → per-partition running sum (local window, parallel)
      → per-partition token totals (≤ shuffle-partition-count rows)
      → driver-free prefix sum over that tiny table, broadcast back
      → global offset = local running sum + partition offset.

Everything is integer arithmetic over JVM built-ins — no floats, no
Python, bit-identical across engines and parallelism levels.

Scale notes (100 TB): one range shuffle of (id, n_tok) pairs — the text
column never moves; the window and aggregates are per-partition;
the offsets table has one row per partition and broadcasts. Skewed doc
lengths don't skew the shuffle (keys are unique doc ids).

Reference anchor: this is a training-data-pipeline extension (SURVEY §2
"beyond-reference" family), not an upstream Scrapy operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def running_offset(
    df: DataFrame, order_col: str, n_col: str, out_col: str = "tok_start"
) -> DataFrame:
    """Exclusive prefix sum of ``n_col`` over global ``order_col`` order,
    computed with parallel per-partition windows + a broadcast offsets
    table (no single-partition exchange)."""
    d = df.repartitionByRange(F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Pin ONE materialization before the counts subplan and the probe side
    # consume __pid — re-instantiated range exchanges can sample different
    # bounds / coalesce differently under AQE, making __pid disagree
    # between the join sides and silently dropping rows (see
    # operators/pop.py::global_seq, same pattern and full rationale).
    d = d.localCheckpoint(eager=True)
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.asc(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "__before", F.coalesce(F.sum(n_col).over(w_local), F.lit(0))
    )
    counts = d.groupBy("__pid").agg(F.sum(n_col).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        d.join(F.broadcast(offs), "__pid")
        .withColumn(
            out_col, (F.col("__before") + F.col("__off")).cast("long")
        )
        .drop("__pid", "__before", "__off")
    )


def pack_spans(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tok, tok_start, first_chunk, last_chunk, n_chunks)
    for every document with ≥1 token: the document's slice of the
    concatenated-and-chunked token stream under fixed ``budget``-token
    training sequences, in ``id_col`` ascending corpus order.

    ``n_chunks`` is the number of training sequences the document touches;
    ``n_chunks - 1`` is its boundary-fragmentation count (how many times a
    chunk boundary cuts through it)."""
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).select(
        F.col(id_col), F.size("__t").cast("long").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    d = running_offset(toks, order_col=id_col, n_col="n_tok")
    first = F.floor(F.col("tok_start") / budget).cast("long")
    last = F.floor(
        (F.col("tok_start") + F.col("n_tok") - 1) / budget
    ).cast("long")
    return d.select(
        F.col(id_col),
        "n_tok",
        "tok_start",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


def pack_summary(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-row corpus packing report: total tokens, number of full
    ``budget``-token training sequences, tokens in the final partial
    sequence, and how many documents straddle ≥1 chunk boundary."""
    spans = pack_spans(df, budget=budget, id_col=id_col, text_col=text_col)
    return spans.agg(
        F.sum("n_tok").alias("total_tokens"),
        F.floor(F.sum("n_tok") / budget).cast("long").alias("n_full_chunks"),
        (F.sum("n_tok") % budget).cast("long").alias("tail_tokens"),
        F.sum((F.col("n_chunks") > 1).cast("long")).alias("n_fragmented_docs"),
    )


__all__ = ["running_offset", "pack_spans", "pack_summary"]
