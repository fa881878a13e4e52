"""spark-submit job: train + score SGD logistic regression — the

`mahout trainlogistic` / `runlogistic` CLI twin.

Reference: examples/.../sgd/TrainLogistic.java (options: input, output
model file, --categories, --features, --passes, --rate/--lambda) and
RunLogistic.java (scores + AUC-style summary).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/trainlogistic.py \
      --input labeled.parquet --output /tmp/lr_model.json \
      --categories 2 [--features N] [--passes 3] [--lambda 1e-5]
      [--score-output /tmp/scores.parquet]

Input: parquet with (label int, features array<double>).
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
    ap.add_argument("--output", required=True,
                    help="model JSON path (beta + hyperparams)")
    ap.add_argument("--categories", type=int, required=True)
    ap.add_argument("--features", type=int, default=None,
                    help="feature count (default: length of the first "
                         "feature vector)")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--lambda", dest="lambda_", type=float, default=1e-5)
    ap.add_argument("--prior", default="L2", choices=["L1", "L2"])
    ap.add_argument("--label-col", default="label")
    ap.add_argument("--features-col", default="features")
    ap.add_argument("--score-output", default=None,
                    help="also write (probs, prediction) parquet")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.operators.sgd import (logistic_classify,
                                            parallel_sgd_train)
    from mahout_spark.session import get_spark

    spark = get_spark("trainlogistic", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    n_feat = args.features
    if n_feat is None:
        n_feat = len(df.select(args.features_col).first()[0])
    t0 = time.time()
    model = parallel_sgd_train(df, args.categories, n_feat,
                               label_col=args.label_col,
                               features_col=args.features_col,
                               epochs=args.passes,
                               lambda_=args.lambda_, prior=args.prior)
    with open(args.output, "w") as f:
        json.dump({"categories": args.categories, "features": n_feat,
                   "lambda": args.lambda_, "prior": args.prior,
                   "passes": args.passes,
                   "beta": model.beta.tolist()}, f)
    out = {"wall_s": round(time.time() - t0, 2),
           "categories": args.categories, "features": n_feat}
    if args.score_output:
        scored = logistic_classify(df, model.beta,
                                   features_col=args.features_col)
        scored.write.mode("overwrite").parquet(args.score_output)
        correct = scored.filter(
            scored["prediction"] == scored[args.label_col]).count()
        total = df.count()
        out["train_accuracy"] = round(correct / total, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
