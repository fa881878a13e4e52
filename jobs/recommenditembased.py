"""spark-submit job: `mahout recommenditembased` CLI twin — item-based

CF recommendations end-to-end (similarity + recommend in one job).

Reference anchors (studied, not copied):
  cf/taste/hadoop/item/RecommenderJob.java (the MR pipeline:
  preparePreferenceMatrix → RowSimilarityJob → partial-multiply →
  aggregate-and-recommend, with --similarityClassname, --numRecommendations,
  --maxPrefsPerUser, --booleanData). Here the whole chain is the
  cooccurrence/LLR similarity operator + recommend_item_based's one
  declarative plan.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/recommenditembased.py \
      --input prefs.parquet --output /tmp/recs \
      [--similarity cooccurrence|llr] [--num-recommendations 10] \
      [--max-similarities-per-item 100] [--boolean-data]

Input: parquet (user_id, item_id, pref).
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
    ap.add_argument("--similarity", default="llr",
                    choices=["llr", "cooccurrence"])
    ap.add_argument("--num-recommendations", type=int, default=10)
    ap.add_argument("--max-similarities-per-item", type=int, default=100)
    ap.add_argument("--min-evidence", type=int, default=2)
    ap.add_argument("--boolean-data", action="store_true")
    ap.add_argument("--user-col", default="user_id")
    ap.add_argument("--item-col", default="item_id")
    ap.add_argument("--pref-col", default="pref")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.operators.cooccurrence import (cooccurrence_counts,
                                                     llr_item_similarity)
    from mahout_spark.operators.recommender import recommend_item_based
    from mahout_spark.session import get_spark

    spark = get_spark("recommenditembased", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    prefs = spark.read.parquet(args.input).select(
        F.col(args.user_col).alias("user_id"),
        F.col(args.item_col).alias("item_id"),
        F.col(args.pref_col).cast("double").alias("pref"))

    t0 = time.time()
    inter = prefs.select(F.col("user_id").alias("row_id"),
                         F.col("item_id").alias("col_id")).distinct()
    if args.similarity == "llr":
        sims = llr_item_similarity(
            inter, k=args.max_similarities_per_item).select(
            "item_a", "item_b", F.col("llr").alias("sim"))
    else:
        sims = cooccurrence_counts(inter).select(
            "item_a", "item_b", F.col("n_ab").cast("double").alias("sim"))
    recs = recommend_item_based(
        prefs, sims, top_n=args.num_recommendations,
        min_evidence=args.min_evidence,
        boolean_pref=args.boolean_data)
    recs.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"similarity": args.similarity, "n_recs": n,
                      "output": args.output,
                      "wall_s": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
