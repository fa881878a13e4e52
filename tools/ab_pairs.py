"""Interleaved A/B: ordered-pair plan vs unordered+mirror plan.

Settles whether the round-2 restructure of rowsim_cosine /
llr_itemsim (count each unordered pair once, mirror after scoring)
regressed against the round-1 ordered-pair plan, on a host whose
wall-clock swings 2-4x on a minutes timescale. Protocol: >= N
ALTERNATING reps of each variant in ONE session (A B A B ...), per-
variant min-of-passes — additive noise cancels because adjacent reps
see the same host state.

Run: python tools/ab_pairs.py [--reps 5] [--sf-dir /root/testdata/sf0.1]
Writes BENCH/ab_pairs.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_rowsim(spark, sf_dir: str, pair_mode: str) -> None:
    from pyspark.sql import functions as F

    from mahout_spark.operators.rowsim import row_similarity

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    triples = (li.groupBy(F.col("l_orderkey").alias("row_id"),
                          F.col("l_partkey").alias("col_id"))
               .agg(F.sum("l_quantity").alias("value")))
    (row_similarity(triples, measure="cosine", k=10, pair_mode=pair_mode)
     .write.format("noop").mode("overwrite").save())


def run_llr(spark, sf_dir: str, pair_mode: str) -> None:
    from pyspark.sql import functions as F

    from mahout_spark.operators.cooccurrence import llr_item_similarity

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    triples = li.select(F.col("l_orderkey").alias("row_id"),
                        F.col("l_partkey").alias("col_id"))
    (llr_item_similarity(triples, k=10, downsample=True, pair_mode=pair_mode)
     .write.format("noop").mode("overwrite").save())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from mahout_spark.session import get_spark

    spark = get_spark("ab_pairs", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    queries = {"rowsim_cosine": run_rowsim, "llr_itemsim": run_llr}
    raw: dict[str, dict[str, list[float]]] = {
        q: {"ordered": [], "unordered": []} for q in queries}
    for rep in range(args.reps):
        for q, fn in queries.items():
            for mode in ("ordered", "unordered"):  # adjacent = same host state
                t0 = time.time()
                fn(spark, args.sf_dir, mode)
                raw[q][mode].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()

    result = {"reps": args.reps, "sf_dir": args.sf_dir, "cpus": args.cpus,
              "raw": raw, "verdict": {}}
    for q in queries:
        mo = min(raw[q]["ordered"])
        mu = min(raw[q]["unordered"])
        result["verdict"][q] = {
            "ordered_min_s": mo, "unordered_min_s": mu,
            "unordered_over_ordered": round(mu / mo, 3),
            "winner": "unordered" if mu <= mo else "ordered",
        }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/ab_pairs.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["verdict"]))


if __name__ == "__main__":
    main()
