"""spark-submit job: sketch-based equi-join cardinality estimation.

Estimate |A JOIN B on A.key = B.key| from two independent Count-Sketch
scans (plans/joinsize.py) — no join executed, no row-pair shuffle. The
RESULT.json carries the unbiased estimate, each side's F2, the
a-posteriori AMS error radius, and (with --exact) the exact size from
the frequency-table inner product plus the bound check.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/joinsize.py \
      --left a.parquet --left-key k --right b.parquet --right-key k \
      --output /tmp/js [--width 8192] [--depth 9] [--exact]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", required=True)
    ap.add_argument("--left-key", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--right-key", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--depth", type=int, default=9)
    ap.add_argument("--width", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--exact", action="store_true",
                    help="also compute the exact size (verifier path)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.plans.joinsize import (exact_join_size,
                                             join_size_estimate)
    from mahout_spark.session import get_spark

    spark = get_spark("joinsize", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    left = spark.read.parquet(args.left)
    right = spark.read.parquet(args.right)
    row = join_size_estimate(left, args.left_key, right, args.right_key,
                             depth=args.depth, width=args.width,
                             seed=args.seed).collect()[0]
    result = {k: row[k] for k in ("join_size_est", "f2_a", "f2_b",
                                  "err_bound")}
    if args.exact:
        true = exact_join_size(left, args.left_key, right,
                               args.right_key).collect()[0]["true_size"]
        result["true_size"] = int(true)
        result["within_bound"] = bool(
            abs(result["join_size_est"] - true) <= result["err_bound"])
    result["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(result))
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "RESULT.json"), "w") as f:
        json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main()
