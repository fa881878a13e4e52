"""spark-submit job: `mahout transpose` / `mahout matrixmult` CLI twins.

Reference anchors (studied, not copied):
  math/hadoop/TransposeJob.java (one MR pass swapping (row, col)),
  math/hadoop/MatrixMultiplicationJob.java (A^T is the MR-friendly
  layout: computes A %*% B from A', here just A %*% B directly — the
  DRM layer's join+groupBy plan, Catalyst picks the join strategy).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/matrix.py \
      transpose --input a.parquet --output /tmp/at
  spark-submit ... jobs/matrix.py matrixmult \
      --input a.parquet --other b.parquet --output /tmp/ab

Inputs are DRM triples (row_id long, col_id long, value double).
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
    ap.add_argument("mode", choices=["transpose", "matrixmult"])
    ap.add_argument("--input", required=True, help="A as DRM triples")
    ap.add_argument("--other", default=None, help="B (matrixmult)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.operators.drm import ab, at
    from mahout_spark.session import get_spark

    spark = get_spark(f"matrix_{args.mode}", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    a = spark.read.parquet(args.input)
    if args.mode == "transpose":
        out = at(a)
    else:
        if not args.other:
            raise SystemExit("matrixmult needs --other B.parquet")
        out = ab(a, spark.read.parquet(args.other))
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"mode": args.mode, "output": args.output,
                      "nnz": n, "wall_s": round(time.time() - t0, 2)}))


if __name__ == "__main__":
    main()
