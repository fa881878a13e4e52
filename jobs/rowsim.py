"""spark-submit job: row similarity — the spark-rowsimilarity CLI twin.

Reference: spark/.../drivers/RowSimilarityDriver.scala:43-75 (defaults
maxObservations=500, maxSimilaritiesPerRow=100).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/rowsim.py \
      --input triples.parquet --output /tmp/rowsim_out \
      [--measure cosine] [--k 100] [--max-observations 500]
      [--text-input elements.csv] [--format rows|parquet]

Input: parquet with (row_id, col_id, value) columns, or --text-input with
the reference's element text format.
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
    ap.add_argument("--input")
    ap.add_argument("--text-input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--measure", default="cosine",
                    choices=["cosine", "pearson", "euclidean", "tanimoto",
                             "cityblock", "loglikelihood", "cooccurrence"])
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--format", default="parquet", choices=["parquet", "rows"])
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.operators.rowsim import row_similarity
    from mahout_spark.session import get_spark
    from mahout_spark.sources.text_delimited import read_elements, write_rows

    spark = get_spark("rowsim", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    if args.text_input:
        triples = read_elements(spark, args.text_input)
    else:
        triples = spark.read.parquet(args.input)

    t0 = time.time()
    sims = row_similarity(triples, measure=args.measure, k=args.k,
                          threshold=args.threshold)
    if args.format == "rows":
        write_rows(sims, args.output, row="row_a", col="row_b", score="sim")
    else:
        sims.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"wall_s": round(time.time() - t0, 2),
                      "measure": args.measure}))
    spark.stop()


if __name__ == "__main__":
    main()
