"""spark-submit job: sketch-driven skew/salting plan for a table column.

One Misra-Gries pass + exact isin-verify (plans/skewplan.py) finds every
key of ``--key-col`` owning more rows than ``--target`` and assigns its
salt fan-out ceil(n/target). The plan parquet is what salted_join /
groupBy consumers broadcast; RESULT.json carries the summary a capacity
planner wants (heavy-key count, worst key, total replication cost).
Deterministic: same data -> same plan, so a resumed pipeline regenerates
it identically.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/skewplan.py \
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
    ap.add_argument("--target", type=int, required=True,
                    help="max rows a single (key, salt) task should own")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.plans.skewplan import skew_plan
    from mahout_spark.session import get_spark

    spark = get_spark("skewplan", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    df = spark.read.parquet(args.input)
    plan = skew_plan(df, args.key_col, args.target).cache()
    rows = plan.collect()
    os.makedirs(args.output, exist_ok=True)
    plan.write.mode("overwrite").parquet(
        os.path.join(args.output, "plan.parquet"))
    worst = max(rows, key=lambda r: r["n"], default=None)
    result = {
        "n_heavy_keys": len(rows),
        "total_heavy_rows": int(sum(r["n"] for r in rows)),
        "total_salt_tasks": int(sum(r["salt_factor"] for r in rows)),
        "worst_key": None if worst is None else str(worst[args.key_col]),
        "worst_n": None if worst is None else int(worst["n"]),
        "worst_salt_factor": (None if worst is None
                              else int(worst["salt_factor"])),
        "target_rows_per_task": args.target,
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(result))
    with open(os.path.join(args.output, "RESULT.json"), "w") as f:
        json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main()
