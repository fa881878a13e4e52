"""spark-submit job: train a Naive Bayes model — the spark-trainnb CLI twin.

Reference: spark/.../drivers/TrainNBDriver.scala:38-69 (options: input,
output, --trainComplementary, --alphaI > 0, --overwrite).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/trainnb.py \
      --input labeled.parquet --output /tmp/nb_model \
      [--label-col label] [--alpha 1.0] [--complementary]
      [--text-input] [--weighting tf|mahout|mllib]

Input: parquet with (doc_id, label, term, weight) doc-level triples, OR
with --text-input a parquet of (doc_id, text, <label-col>) raw documents
that get tokenized + TF-weighted (seq2sparse analog) before aggregation.
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
    ap.add_argument("--label-col", default="label")
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--complementary", action="store_true")
    ap.add_argument("--text-input", action="store_true",
                    help="input is raw (doc_id, text, label) documents")
    ap.add_argument("--weighting", default="tf",
                    choices=["tf", "mahout", "mllib"],
                    help="term weighting for --text-input (tf counts or "
                         "a tfidf variant)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)
    if args.alpha <= 0:
        ap.error("--alpha must be > 0")

    from pyspark.sql import functions as F

    from mahout_spark.operators.naivebayes import (nb_aggregate,
                                                   nb_text_triples, nb_train)
    from mahout_spark.session import get_spark

    spark = get_spark("trainnb", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    t0 = time.time()
    if args.text_input:
        triples = nb_text_triples(df, label_col=args.label_col,
                                  weighting=args.weighting)
    else:
        triples = df.select("doc_id",
                            F.col(args.label_col).alias("label"),
                            "term", "weight")
    model = nb_train(nb_aggregate(triples), alpha=args.alpha,
                     complementary=args.complementary)
    model.save(args.output)
    print(json.dumps({"wall_s": round(time.time() - t0, 2),
                      "labels": model.labels,
                      "n_features": model.n_features,
                      "total_weight": model.total_weight,
                      "complementary": model.complementary}))


if __name__ == "__main__":
    main()
