"""spark-submit job: parallel FP-Growth — the `mahout fpg` CLI twin.

Reference: Mahout's FPGrowthDriver (org.apache.mahout.fpm.pfpgrowth;
removed from the modern tree, still referenced by examples/) with
options --minSupport, --maxHeapSize (top-K), --numGroups.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/fpg.py \
      --input txns.parquet --output /tmp/itemsets \
      --min-support 100 [--max-len 4] [--num-groups 32] [--top-k 50]

Input: parquet with (txn_id, item) rows, or (txn_id, items array)
with --array-input.
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
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-support", type=int, required=True)
    ap.add_argument("--max-len", type=int, default=None)
    ap.add_argument("--num-groups", type=int, default=32)
    ap.add_argument("--top-k", type=int, default=None,
                    help="keep only the K highest-support itemsets per "
                         "pattern length (maxHeapSize analog)")
    ap.add_argument("--txn-col", default="txn_id")
    ap.add_argument("--item-col", default="item")
    ap.add_argument("--array-input", action="store_true",
                    help="input rows carry (txn_id, items array)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.operators.fpm import parallel_fp_growth
    from mahout_spark.operators.topk import topk_per_group
    from mahout_spark.session import get_spark

    spark = get_spark("fpg", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    if args.array_input:
        df = df.select(args.txn_col,
                       F.explode(args.item_col).alias(args.item_col))
    t0 = time.time()
    out = parallel_fp_growth(df, args.min_support,
                             item_col=args.item_col,
                             txn_col=args.txn_col,
                             max_len=args.max_len,
                             n_groups=args.num_groups)
    if args.top_k:
        out = (topk_per_group(
            out.withColumn("__len", F.size("itemset")),
            ["__len"], "support", args.top_k,
            tiebreak_cols=["itemset"]).drop("__len"))
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"wall_s": round(time.time() - t0, 2),
                      "itemsets": n,
                      "min_support": args.min_support}))


if __name__ == "__main__":
    main()
