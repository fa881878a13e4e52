"""Blocked vs all-pairs CMS user similarity at 1x and 10x users.

Auditable harness for the claim that routing per-user CMS similarity
through the blocked tile kernel (cms_user_similarity(top_n=)) removes
the quadratic blow-up of the all-pairs crossJoin. Writes
BENCH/users10x.json.

Run: python tools/bench_users10x.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mahout_spark.operators.recommender import (cms_user_similarity,
                                                    nearest_n_neighborhood,
                                                    user_cms_profiles)
    from mahout_spark.session import get_spark

    spark = get_spark("users10x", master=f"local[{args.cpus}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(args.sf_dir, "orders.parquet"))
    out = {"sf_dir": args.sf_dir, "cpus": args.cpus, "depth": 4,
           "width": 256, "top_n": 10, "scales": {}}
    for n_users in (100, 1000):
        prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
                 .filter(F.col("o_custkey") < n_users)
                 .groupBy(F.col("o_custkey").alias("user_id"),
                          F.col("l_partkey").alias("item_id"))
                 .agg(F.sum("l_quantity").alias("pref")))
        profiles = user_cms_profiles(prefs, depth=4, width=256,
                                     seed=11).persist()
        profiles.count()
        t0 = time.time()
        n_b = cms_user_similarity(profiles, top_n=10).count()
        t_blocked = round(time.time() - t0, 2)
        t0 = time.time()
        n_a = nearest_n_neighborhood(
            cms_user_similarity(profiles), 10).count()
        t_allpairs = round(time.time() - t0, 2)
        profiles.unpersist()
        out["scales"][n_users] = {
            "blocked_s": t_blocked, "blocked_rows": n_b,
            "allpairs_s": t_allpairs, "allpairs_rows": n_a,
            "speedup": round(t_allpairs / t_blocked, 2)}
        print(f"users={n_users}: blocked {t_blocked}s | "
              f"all-pairs {t_allpairs}s | {out['scales'][n_users]['speedup']}x",
              flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "users10x.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
