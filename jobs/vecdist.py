"""spark-submit job: `mahout vecdist` CLI twin — distances between a

small seed set and every vector.

Reference anchors (studied, not copied):
  math/hadoop/similarity/VectorDistanceSimilarityJob.java (seeds must
  fit in memory → mapper-side broadcast; per (seed, vector) pair emits
  distance, or with --outType v one row per vector with all seed
  distances) with the usual DistanceMeasure options.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/vecdist.py \
      --input points.parquet --seeds seeds.parquet --output /tmp/dist \
      [--measure euclidean|squared|cosine|manhattan] [--out-type p|v]

Input: parquet with (vec_id, embedding array<double>) both sides.
out-type p → (seed_id, vec_id, distance) rows; v → one row per vector
with a distances array ordered by seed_id.
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
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--measure", default="euclidean",
                    choices=["euclidean", "squared", "cosine", "manhattan",
                             "chebyshev", "tanimoto", "minkowski"])
    ap.add_argument("--minkowski-p", type=float, default=3.0)
    ap.add_argument("--out-type", default="p", choices=["p", "v"])
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.session import get_spark

    spark = get_spark("vecdist", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    pts = spark.read.parquet(args.input).select(
        F.col(args.id_col).alias("vec_id"),
        F.col(args.vec_col).cast("array<double>").alias("v"))
    seeds = spark.read.parquet(args.seeds).select(
        F.col(args.id_col).alias("seed_id"),
        F.col(args.vec_col).cast("array<double>").alias("s"))

    t0 = time.time()
    # broadcast the seed side (the reference requires it to fit in
    # memory); all distance math stays in JVM expressions via the
    # pluggable DistanceMeasure registry
    from mahout_spark.functions.distance import DISTANCES, minkowski

    j = pts.crossJoin(F.broadcast(seeds))
    if args.measure == "minkowski":
        fn = minkowski(args.minkowski_p)
    else:
        fn = DISTANCES[args.measure]
    dist = fn(F.col("v"), F.col("s"))
    out = j.select("seed_id", "vec_id", dist.alias("distance"))
    if args.out_type == "v":
        out = (out.groupBy("vec_id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct("seed_id", "distance"))),
                   lambda x: x["distance"]).alias("distances")))
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"wall_s": round(time.time() - t0, 2), "rows": n,
                      "measure": args.measure}))
    spark.stop()


if __name__ == "__main__":
    main()
