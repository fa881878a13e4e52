"""spark-submit job: item similarity from interaction logs — the

spark-itemsimilarity CLI twin (drivers/ItemSimilarityDriver.scala:44-213).

Reads element text (`rowID,filter,itemID`) or parquet triples; computes
LLR self-similarity for the primary action and cross-similarity for each
secondary action; writes the reference's row text format or parquet.
Defaults mirror the reference: maxPrefs=500, maxSimilaritiesPerItem=100.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/itemsimilarity.py \
      --input interactions.csv --filter1 purchase [--filter2 view] \
      --output /tmp/out [--k 100] [--max-prefs 500] [--format rows]
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
    ap.add_argument("--filter1", default=None,
                    help="primary action value (e.g. purchase)")
    ap.add_argument("--filter2", default=None,
                    help="secondary action for cross-similarity (e.g. view)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--max-prefs", type=int, default=500)
    ap.add_argument("--min-llr", type=float, default=None)
    ap.add_argument("--format", default="rows", choices=["rows", "parquet"])
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.operators.cooccurrence import (llr_cross_similarity,
                                                     llr_item_similarity)
    from mahout_spark.session import get_spark
    from mahout_spark.sources.text_delimited import read_elements, write_rows

    spark = get_spark("itemsimilarity", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    def load(filter_value):
        if args.input.endswith(".parquet") or os.path.isdir(args.input):
            return spark.read.parquet(args.input)
        return read_elements(spark, args.input, filter_value=filter_value)

    from pyspark.sql import functions as F

    t0 = time.time()
    primary = load(args.filter1)
    sims = llr_item_similarity(primary, k=args.k, min_llr=args.min_llr,
                               max_interactions=args.max_prefs)
    # reference semantics: llr==0 cells are sparse zeros -> absent from
    # the written matrix (SimilarityAnalysis sets them into a sparse row)
    sims = sims.filter(F.col("llr") > 0.0)
    sim_path = f"{args.output}/similarity-matrix"
    if args.format == "rows":
        write_rows(sims, sim_path)
    else:
        sims.write.mode("overwrite").parquet(sim_path)

    outputs = {"similarity_matrix": sim_path}
    if args.filter2:
        secondary = load(args.filter2)
        cross = llr_cross_similarity(primary, secondary, k=args.k,
                                     min_llr=args.min_llr,
                                     max_interactions=args.max_prefs) \
            .filter(F.col("llr") > 0.0)
        cross_path = f"{args.output}/cross-similarity-matrix"
        if args.format == "rows":
            write_rows(cross, cross_path)
        else:
            cross.write.mode("overwrite").parquet(cross_path)
        outputs["cross_similarity_matrix"] = cross_path

    print(json.dumps({"wall_s": round(time.time() - t0, 2), **outputs}))
    spark.stop()


if __name__ == "__main__":
    main()
