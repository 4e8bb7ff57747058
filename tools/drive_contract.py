"""Drive the driver contract end-to-end, the way the driver does.

Runs ``entry(spark)`` as a smoke check, then every ``queries()`` entry at
the given sf dir against its ``oracle_sql()`` through DuckDB with
driver-like comparison semantics: row count, schema (sorted column
names), and order-insensitive value comparison (columns sorted by name,
rows sorted by all columns, floats compared exactly after both engines'
own rounding).

Usage:  python tools/drive_contract.py [--window] [sf_dir] [query ...]

``--window`` restricts to the first 50 queries() entries — exactly the
set the driver's 50-slot certification run will sample.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np


def compare(name: str, pdf, odf) -> list[str]:
    problems = []
    if sorted(pdf.columns) != sorted(odf.columns):
        problems.append(
            f"schema mismatch: spark-only={set(pdf.columns) - set(odf.columns)} "
            f"oracle-only={set(odf.columns) - set(pdf.columns)}"
        )
        return problems
    if len(pdf) != len(odf):
        problems.append(f"row count {len(pdf)} != oracle {len(odf)}")
        return problems
    cols = sorted(pdf.columns)
    a = pdf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = odf[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        av, bv = a[c], b[c]
        if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
            eq = np.array_equal(
                av.astype(float).fillna(-9e99).values,
                bv.astype(float).fillna(-9e99).values,
            )
        else:
            eq = (av.astype(str).fillna("~") == bv.astype(str).fillna("~")).all()
        if not eq:
            mask = ~(av.astype(str) == bv.astype(str))
            problems.append(
                f"values differ in {c}: spark={av[mask].head(3).tolist()} "
                f"oracle={bv[mask].head(3).tolist()}"
            )
    return problems


def main() -> int:
    import os

    args = [a for a in sys.argv[1:] if a != "--window"]
    window_only = "--window" in sys.argv[1:]
    # a path-looking first arg is the sf dir (and must exist — a typo'd
    # dir must fail loudly, not silently verify the default dataset);
    # a name-looking first arg is a query filter
    if args and (os.sep in args[0] or args[0].startswith(".")):
        if not os.path.isdir(args[0]):
            print(f"sf dir does not exist: {args[0]}")
            return 2
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)

    sys.path.insert(0, ".")
    import __spark_entry__ as contract

    # VANILLA session, exactly like the driver's verify harness — NOT
    # get_spark().  Round 1 failed 36/50 queries because get_spark()
    # masked a config the contract code itself must set (nanosAsLong);
    # verification must reproduce the driver's environment.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("drive_contract")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    edf = contract.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows, {len(edf.columns)} cols  [{time.time() - t0:.1f}s]")
    assert n >= 0

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = contract.queries(), contract.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:  # typo'd names must fail loudly, not print ALL OK
        print(f"unknown queries: {unknown}")
        spark.stop()
        return 2
    if window_only:  # exactly what the driver's 50-slot run will sample
        window = set(list(qs)[:50])
        if only:  # explicit names further restrict, never get discarded
            outside = sorted(only - window)
            if outside:
                print(f"note: not in the 50-slot window, skipped: {outside}")
            only = only & window
            if not only:
                print("none of the requested queries are in the window")
                spark.stop()
                return 1
        else:
            only = window
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        pdf = sdf.toPandas()
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only, {len(pdf)} rows  [{spark_s:.1f}s]")
            continue
        t0 = time.time()
        odf = con.execute(oracles[name]).fetchdf()
        duck_s = time.time() - t0
        problems = compare(name, pdf, odf)
        status = "OK " if not problems else "FAIL"
        print(
            f"  {name}: {status} {len(pdf)} rows x {len(pdf.columns)} cols "
            f"[spark {spark_s:.1f}s / duck {duck_s:.1f}s]"
        )
        for p in problems:
            print(f"      {p}")
        if problems:
            failed.append(name)
    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
