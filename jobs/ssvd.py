"""spark-submit job: `mahout ssvd` CLI twin — distributed stochastic SVD.

Reference anchors (studied, not copied):
  mr/.../ssvd/SSVDCli.java + SSVDSolver.java (options -k rank,
  -p oversampling, -q power iterations, output U/V/sigma directories)
  and the Samsara path math-scala/.../decompositions/DSSVD.scala.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/ssvd.py \
      --input drm.parquet --output /tmp/ssvd -k 10 [-p 15] [-q 0]
      [--pca]

Input: triple-format DRM parquet (row_id, col_id, value). Output dir
gets U/ and V/ triple parquets and sigma.json (singular values; for
--pca also the column means). --pca runs dspca (mean-centered SVD)
without ever materializing the dense centered matrix.
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
    ap.add_argument("-k", type=int, required=True)
    ap.add_argument("-p", type=int, default=15)
    ap.add_argument("-q", type=int, default=0)
    ap.add_argument("--pca", action="store_true")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.operators.decompositions import dspca, dssvd
    from mahout_spark.operators.drm import as_drm
    from mahout_spark.session import get_spark

    spark = get_spark("ssvd", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    a = as_drm(spark.read.parquet(args.input))
    nrow = a.agg(F.max("row_id")).first()[0] + 1
    ncol = a.agg(F.max("col_id")).first()[0] + 1

    t0 = time.time()
    if args.pca:
        u, v, s = dspca(a, int(nrow), int(ncol), args.k, p=args.p,
                        q=args.q, seed=args.seed)
    else:
        u, v, s = dssvd(a, int(nrow), int(ncol), args.k, p=args.p,
                        q=args.q, seed=args.seed)
    u.write.mode("overwrite").parquet(f"{args.output}/U")
    v.write.mode("overwrite").parquet(f"{args.output}/V")
    result = {"wall_s": round(time.time() - t0, 2), "k": args.k,
              "nrow": int(nrow), "ncol": int(ncol),
              "sigma": [float(x) for x in s]}
    with open(f"{args.output}/sigma.json", "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
