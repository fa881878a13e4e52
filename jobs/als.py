"""spark-submit job: ALS factorization workflow — `mahout parallelALS`,

`mahout recommendfactorized`, `mahout evaluateFactorization` CLI twins.

Reference anchors (studied, not copied):
  cf/taste/hadoop/als/ParallelALSFactorizationJob.java (options
  --numFeatures, --lambda, --numIterations; U/ and M/ outputs),
  als/RecommenderJob.java (recommendfactorized: top-N per user from the
  factor matrices), als/FactorizationEvaluator.java (RMSE/MAE of
  predictions vs a probe set).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/als.py \
      factorize --input ratings.parquet --output /tmp/als \
      [--num-features 10] [--lambda 0.065] [--num-iterations 10] \
      [--factorizer als|sgd|svdpp]  (sgd = RatingSGDFactorizer,
      svdpp = SVDPlusPlusFactorizer; both accept --learning-rate and
      --n-shards)
      [--implicit-feedback [--alpha 40]]  (Hu/Koren/Volinsky implicit
      ALS — the reference job's --implicitFeedback path)
  ... recommend --input ratings.parquet --factors /tmp/als \
      --output /tmp/recs [--num-recommendations 10]
  ... evaluate --probes probe.parquet --factors /tmp/als

Input: parquet rating triples (user_id, item_id, pref) — override with
--user-col/--item-col/--pref-col. factorize writes U/ and M/ factor
triple parquets (row_id = entity id, col_id = feature, value).
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
    ap.add_argument("mode", choices=["factorize", "recommend", "evaluate"])
    ap.add_argument("--input", default=None)
    ap.add_argument("--probes", default=None)
    ap.add_argument("--factors", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--num-features", type=int, default=10)
    ap.add_argument("--lambda", dest="lambda_", type=float, default=0.065)
    ap.add_argument("--num-iterations", type=int, default=10)
    ap.add_argument("--num-recommendations", type=int, default=10)
    ap.add_argument("--factorizer", choices=["als", "sgd", "svdpp"],
                    default="als",
                    help="als = ALS-WR (ALSWRFactorizer); sgd = biased "
                    "SGD (RatingSGDFactorizer); svdpp = SVD++ "
                    "(SVDPlusPlusFactorizer)")
    ap.add_argument("--implicit-feedback", action="store_true",
                    help="treat prefs as implicit counts and factorize "
                    "with the Hu/Koren/Volinsky confidence-weighted "
                    "solve (ParallelALSFactorizationJob "
                    "--implicitFeedback)")
    ap.add_argument("--alpha", type=float, default=40.0,
                    help="implicit confidence slope c = 1 + alpha*r")
    ap.add_argument("--learning-rate", type=float, default=0.01)
    ap.add_argument("--n-shards", type=int, default=None)
    ap.add_argument("--user-col", default="user_id")
    ap.add_argument("--item-col", default="item_id")
    ap.add_argument("--pref-col", default="pref")
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.operators.svdrec import (alswr_factorize,
                                               evaluate_factorization,
                                               svd_recommend)
    from mahout_spark.session import get_spark

    spark = get_spark(f"als_{args.mode}", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    if args.mode == "factorize":
        if not (args.input and args.output):
            ap.error("factorize requires --input --output")
        prefs = spark.read.parquet(args.input)
        if args.factorizer == "als" and args.implicit_feedback:
            from mahout_spark.operators.svdrec import implicit_als_factorize
            u, m = implicit_als_factorize(
                prefs, k=args.num_features, lambda_=args.lambda_,
                alpha=args.alpha, iterations=args.num_iterations,
                user=args.user_col, item=args.item_col,
                pref=args.pref_col, seed=args.seed)
        elif args.factorizer == "als":
            u, m = alswr_factorize(prefs, k=args.num_features,
                                   lambda_=args.lambda_,
                                   iterations=args.num_iterations,
                                   user=args.user_col, item=args.item_col,
                                   pref=args.pref_col, seed=args.seed)
        else:
            from mahout_spark.operators.ratingsgd import (
                rating_sgd_factorize, svdpp_factorize)
            fac = (rating_sgd_factorize if args.factorizer == "sgd"
                   else svdpp_factorize)
            u, m = fac(prefs, num_features=args.num_features,
                       learning_rate=args.learning_rate,
                       num_iterations=args.num_iterations,
                       n_shards=args.n_shards, seed=args.seed,
                       user=args.user_col, item=args.item_col,
                       pref=args.pref_col)
        u.write.mode("overwrite").parquet(f"{args.output}/U")
        m.write.mode("overwrite").parquet(f"{args.output}/M")
        print(json.dumps({"wall_s": round(time.time() - t0, 2),
                          "k": args.num_features,
                          "users": spark.read.parquet(
                              f"{args.output}/U")
                          .select("row_id").distinct().count()}))
    elif args.mode == "recommend":
        if not (args.input and args.factors and args.output):
            ap.error("recommend requires --input --factors --output")
        prefs = spark.read.parquet(args.input)
        u = spark.read.parquet(f"{args.factors}/U")
        m = spark.read.parquet(f"{args.factors}/M")
        recs = svd_recommend(u, m, prefs,
                             top_n=args.num_recommendations,
                             user=args.user_col, item=args.item_col)
        recs.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"wall_s": round(time.time() - t0, 2),
                          "rows": spark.read.parquet(
                              args.output).count()}))
    else:
        if not (args.probes and args.factors):
            ap.error("evaluate requires --probes --factors")
        probe = spark.read.parquet(args.probes)
        u = spark.read.parquet(f"{args.factors}/U")
        m = spark.read.parquet(f"{args.factors}/M")
        res = evaluate_factorization(u, m, probe, user=args.user_col,
                                     item=args.item_col,
                                     pref=args.pref_col)
        res["wall_s"] = round(time.time() - t0, 2)
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
