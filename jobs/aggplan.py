"""spark-submit job: sketch-driven aggregation plan for a groupBy key.

One HLL scan (group cardinality) + one MG scan with exact verify (heavy
groups) pick the aggregation strategy and shuffle width BEFORE the big
job runs (plans/aggplan.py) — the third leg of the planner triad next
to skewplan (salting) and joinsize (join cardinality). Deterministic:
same data -> same plan, so a checkpoint-resumed pipeline regenerates it
identically.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/aggplan.py \
      --input pages.parquet --key-col domain --target 2000000 \
      --output /tmp/plan
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--key-col", required=True)
    ap.add_argument("--target", type=int, default=2_000_000,
                    help="max rows a single (group, salt) task should own")
    ap.add_argument("--min-combine-ratio", type=float, default=4.0)
    ap.add_argument("--groups-per-partition", type=int, default=100_000)
    ap.add_argument("--max-partitions", type=int, default=8192)
    ap.add_argument("--fast", action="store_true",
                    help="xxhash64 HLL family (default: md5 parity)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.plans.aggplan import agg_plan
    from mahout_spark.session import get_spark

    spark = get_spark("aggplan", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    df = spark.read.parquet(args.input)
    p = agg_plan(df, args.key_col,
                 target_rows_per_task=args.target,
                 min_combine_ratio=args.min_combine_ratio,
                 groups_per_partition=args.groups_per_partition,
                 max_partitions=args.max_partitions,
                 parity=not args.fast)
    result = {
        "key_col": args.key_col,
        "n_rows": p.n_rows,
        "est_groups": p.est_groups,
        "n_heavy": p.n_heavy,
        "max_salt_factor": p.max_salt_factor,
        "strategy": p.strategy,
        "shuffle_partitions": p.shuffle_partitions,
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(result))
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "RESULT.json"), "w") as f:
        json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main()
