"""spark-submit job: test a Naive Bayes model — the spark-testnb CLI twin.

Reference: spark/.../drivers/TestNBDriver.scala (options: input, model
path, --testComplementary); prints the ResultAnalyzer-style accuracy +
confusion matrix and writes per-doc predictions.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/testnb.py \
      --input labeled.parquet --model /tmp/nb_model --output /tmp/preds \
      [--label-col label] [--complementary] [--text-input]
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
    ap.add_argument("--model", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--label-col", default="label")
    ap.add_argument("--complementary", action="store_true")
    ap.add_argument("--text-input", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.operators.naivebayes import (
        NBModel, confusion_from_predictions, nb_predict, nb_text_triples)
    from mahout_spark.session import get_spark

    spark = get_spark("testnb", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    model = NBModel.load(spark, args.model)
    df = spark.read.parquet(args.input)
    t0 = time.time()
    if args.text_input:
        triples = nb_text_triples(df, label_col=args.label_col)
    else:
        triples = df.select("doc_id",
                            F.col(args.label_col).alias("label"),
                            "term", "weight")
    # classify ONCE: the same predictions frame feeds both the optional
    # parquet output and the confusion matrix
    preds = nb_predict(model, triples.select("doc_id", "term", "weight"),
                       complementary=args.complementary).persist()
    if args.output:
        preds.write.mode("overwrite").parquet(args.output)
    result = confusion_from_predictions(
        preds, triples.select("doc_id", "label"))
    result["labels"] = model.labels
    preds.unpersist()
    print(json.dumps({
        "wall_s": round(time.time() - t0, 2),
        "accuracy": round(result["accuracy"], 6),
        "labels": result["labels"],
        "confusion": {f"{a}->{p}": n
                      for (a, p), n in sorted(result["confusion"].items())},
    }))


if __name__ == "__main__":
    main()
