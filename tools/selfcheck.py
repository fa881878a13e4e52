"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf=0.01 on Spark AND its
``oracle_sql()`` twin on DuckDB; compares row count, column names, and
values (columns sorted by name, rows sorted, NaN-safe). Stricter than the
driver (exact float equality by default, with a tiny ulp tolerance knob) so
anything green here is green there.

Usage: python tools/selfcheck.py [query ...] [--sf-dir DIR] [--tol T]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(df, float_cols_tol: float):
    """pandas df -> sorted canonical rows (list of tuples)."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]

    def keyify(v):
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", round(v, 9))
        return (str(type(v).__name__), str(v))

    return sorted(rows, key=lambda r: tuple(keyify(v) for v in r))


def values_equal(a, b, tol: float) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            values_equal(x, y, tol) for x, y in zip(a, b))
    return a == b


def compare(name, spark_pdf, duck_pdf, tol):
    problems = []
    sc = sorted(spark_pdf.columns)
    dc = sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"schema mismatch: spark={sc} duck={dc}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(
            f"rowcount mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    rs = normalize(spark_pdf, tol)
    rd = normalize(duck_pdf, tol)
    bad = 0
    for i, (ra, rb) in enumerate(zip(rs, rd)):
        if not values_equal(ra, rb, tol):
            if bad < 3:
                problems.append(f"row {i}: spark={ra!r} duck={rb!r}")
            bad += 1
    if bad:
        problems.append(f"{bad}/{len(rs)} rows differ (tol={tol})")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tol", type=float, default=0.0)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from mahout_spark.session import get_spark, load_tables

    spark = get_spark("selfcheck", shuffle_partitions=16)
    load_tables(spark, args.sf_dir)
    con = duck_connect(args.sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows={len(spdf)}, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, spdf, dpdf, args.tol)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name} rows={len(spdf)} ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
