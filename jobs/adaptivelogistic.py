"""spark-submit job: adaptive logistic regression CLI twins —

`mahout trainAdaptiveLogistic`, `validateAdaptiveLogistic`,
`runAdaptiveLogistic`.

Reference anchors (studied, not copied):
  examples/.../sgd/TrainAdaptiveLogistic.java (options --input, --output
  model, --categories, --features, --passes→generations here),
  ValidateAdaptiveLogistic.java (held-out AUC / accuracy /
  log-likelihood report), RunAdaptiveLogistic.java (score new data,
  optional --maxScoreOnly).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/adaptivelogistic.py \
      train --input labeled.parquet --output /tmp/alr.json \
      --categories 2 --features 4 [--pool-size 20] [--generations 3]
  ... validate --input holdout.parquet --model /tmp/alr.json
  ... run --input new.parquet --model /tmp/alr.json --output scores/

Input: parquet with (label int, features array<double>) — `run` only
needs features.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _save_model(path: str, res: dict, categories: int,
                features: int, folds: int, prior: str) -> None:
    learner = res["learner"]
    with open(path, "w") as f:
        json.dump({"categories": categories, "features": features,
                   "folds": folds, "prior": prior,
                   "lambda": res["lambda"], "mu0": res["mu0"],
                   "search_auc": res["auc"],
                   "betas": [m.beta.tolist() for m in learner.models]},
                  f)


def _scorer(model: dict):
    """mapInPandas closure: average of fold-model soft-max scores."""
    import numpy as np
    import pandas as pd

    betas = [np.array(b) for b in model["betas"]]

    def softmax_full(x):
        ps = []
        for b in betas:
            v = b @ x
            m = max(v.max(), 0.0)
            e = np.exp(v - m)
            z = np.exp(-m) + e.sum()
            ps.append(np.concatenate([[np.exp(-m) / z], e / z]))
        return np.mean(ps, axis=0)

    def run(batches):
        for pdf in batches:
            probs, pred = [], []
            for x in pdf["features"]:
                p = softmax_full(np.asarray(x, dtype=np.float64))
                probs.append(p.tolist())
                pred.append(int(np.argmax(p)))
            out = pdf.copy()
            out["probs"] = probs
            out["prediction"] = pred
            yield out

    return run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["train", "validate", "run"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--model", default=None)
    ap.add_argument("--categories", type=int, default=2)
    ap.add_argument("--features", type=int, default=None)
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--pool-size", type=int, default=20)
    ap.add_argument("--survivors", type=int, default=2)
    ap.add_argument("--generations", type=int, default=3)
    ap.add_argument("--prior", choices=["L1", "L2"], default="L2")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.operators.adaptive import adaptive_logistic_train
    from mahout_spark.session import get_spark

    spark = get_spark("adaptivelogistic", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    t0 = time.time()

    if args.mode == "train":
        if not args.output:
            ap.error("train requires --output (model JSON path)")
        feats = args.features or len(df.select("features").first()[0])
        res = adaptive_logistic_train(
            df, args.categories, feats, pool_size=args.pool_size,
            survivors=args.survivors, generations=args.generations,
            folds=args.folds, prior=args.prior, seed=args.seed)
        _save_model(args.output, res, args.categories, feats,
                    args.folds, args.prior)
        print(json.dumps({"wall_s": round(time.time() - t0, 2),
                          "lambda": res["lambda"], "mu0": res["mu0"],
                          "auc": round(res["auc"], 4),
                          "percent_correct":
                              round(res["percent_correct"], 4)}))
    else:
        if not args.model:
            ap.error(f"{args.mode} requires --model")
        with open(args.model) as f:
            model = json.load(f)
        schema = ", ".join(f"{f_.name} {f_.dataType.simpleString()}"
                           for f_ in df.schema.fields)
        scored = df.mapInPandas(
            _scorer(model),
            schema=schema + ", probs array<double>, prediction int")
        if args.mode == "validate":
            row = scored.agg(
                F.avg((F.col("prediction") == F.col("label"))
                      .cast("double")).alias("acc"),
                F.avg(F.log(F.greatest(
                    F.element_at("probs", F.col("label") + 1),
                    F.lit(1.0e-100)))).alias("ll"),
                F.count("*").alias("n")).first()
            print(json.dumps({"wall_s": round(time.time() - t0, 2),
                              "n": row["n"],
                              "accuracy": round(row["acc"], 4),
                              "mean_log_likelihood": round(row["ll"], 4)}))
        else:
            if not args.output:
                ap.error("run requires --output")
            scored.write.mode("overwrite").parquet(args.output)
            print(json.dumps({"wall_s": round(time.time() - t0, 2),
                              "rows": spark.read.parquet(
                                  args.output).count()}))
    spark.stop()


if __name__ == "__main__":
    main()
