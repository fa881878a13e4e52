"""spark-submit job: `mahout runlogistic` CLI twin — score data with a

trained logistic model (trainlogistic's model JSON) and report AUC +
confusion, the reference's default output.

Reference anchors (studied, not copied):
  examples/.../sgd/RunLogistic.java:55-98 (loads the model, scores every
  row, defaults to AUC + confusion when no show flag is given; --scores
  emits per-row (target, model-output)). The reference's collector is
  the in-core Auc buffer; here scoring and the exact midrank AUC run
  distributed (operators/evaluation.py) — no driver loop.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/runlogistic.py \
      --input labeled.parquet --model /tmp/lr_model.json \
      [--scores out.parquet] [--auc] [--confusion]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--model", required=True,
                    help="model JSON from jobs/trainlogistic.py")
    ap.add_argument("--scores", default=None,
                    help="write per-row scored parquet here")
    ap.add_argument("--auc", action="store_true")
    ap.add_argument("--confusion", action="store_true")
    ap.add_argument("--label-col", default="label")
    ap.add_argument("--features-col", default="features")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)
    # reference default: no flags -> AUC + confusion
    if not args.auc and not args.confusion and not args.scores:
        args.auc = args.confusion = True

    import numpy as np
    from pyspark.sql import functions as F

    from mahout_spark.operators.evaluation import auc, confusion_binary
    from mahout_spark.operators.sgd import logistic_classify
    from mahout_spark.session import get_spark

    with open(args.model) as f:
        model = json.load(f)
    beta = np.asarray(model["beta"], dtype=float)

    spark = get_spark("runlogistic", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    scored = logistic_classify(df, beta, features_col=args.features_col)
    # binary score = P(class 1), the reference's classifyScalar
    scored = scored.withColumn("score", F.col("probs").getItem(0))
    out: dict = {"model": args.model, "n": df.count()}
    if args.scores:
        scored.select(args.label_col, "score", "prediction") \
            .write.mode("overwrite").parquet(args.scores)
        out["scores"] = args.scores
    if args.auc:
        row = auc(scored, label_col=args.label_col).collect()[0]
        out["auc"] = round(float(row["auc"]), 6)
        print(f"AUC = {row['auc']:.2f}")
    if args.confusion:
        cm = {(r["actual"], r["predicted"]): r["n"]
              for r in confusion_binary(
                  scored, threshold=0.5, label_col=args.label_col,
                  score_col="score").collect()}
        m = [[cm.get((0, 0), 0), cm.get((1, 0), 0)],
             [cm.get((0, 1), 0), cm.get((1, 1), 0)]]
        out["confusion"] = m
        print(f"confusion: [[{m[0][0]:.1f}, {m[0][1]:.1f}], "
              f"[{m[1][0]:.1f}, {m[1][1]:.1f}]]")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
