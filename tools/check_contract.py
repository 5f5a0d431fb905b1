"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the same query on DuckDB over the same
parquet; compares row count, column names, and an order-insensitive
value comparison (rows sorted by all columns after sorting columns by
name). Usage:  python tools/check_contract.py [sf_dir] [query ...]

Env: ``CONTRACT_MASTER`` / ``CONTRACT_SHUFFLE`` override the Spark master
and shuffle-partition count. The r4 driver run caught a flake that ONLY
reproduced at local[32]/200 partitions (float partial-agg order flipped a
round(…,4) digit), so run BOTH gates before shipping contract changes:

    python tools/check_contract.py                       # local[8]/8
    CONTRACT_MASTER='local[32]' CONTRACT_SHUFFLE=200 \\
        python tools/check_contract.py                   # driver-like
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """EXACT stringify normalization — replicates the driver's hash input.

    The driver sorts columns by name, stringifies every cell, and hashes —
    with NO float tolerance and NO dtype coercion. A float64 ``253942.0``
    vs int64 ``253942`` therefore MUST fail here (it failed the round-1
    driver hash while a tolerant local gate said OK — never again)."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(lambda v: "NULL" if pd.isna(v) else str(v))
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if len(s) == len(d):
        for c in s.columns:
            bad = s[c] != d[c]
            if bad.any():
                i = bad.idxmax()
                errs.append(
                    f"values[{c}]: {int(bad.sum())} mismatches, first at row {i}: "
                    f"spark={s[c][i]!r} duck={d[c][i]!r}"
                )
    return errs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    import os

    master = os.environ.get("CONTRACT_MASTER", "local[8]")
    shuffle = os.environ.get("CONTRACT_SHUFFLE", "8")
    print(f"[gate] master={master} shuffle.partitions={shuffle} sf_dir={sf_dir}")
    spark = (
        SparkSession.builder.master(master)
        .appName("contract-check")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(spark_pdf)} rows  [{dt:.1f}s]")
            if len(spark_pdf) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        errs = compare(name, spark_pdf, duck_pdf)
        if errs:
            n_fail += 1
            print(f"FAIL {name}: [{dt:.1f}s]")
            for e in errs:
                print(f"  {e}")
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows match  [{dt:.1f}s]")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
