"""spark-submit job: `mahout svd` / `mahout cleansvd` CLI twins.

Reference anchors (studied, not copied):
  mr/.../decomposer/DistributedLanczosSolver.java (svd: --numCols,
  --rank, --symmetric, --cleansvd chaining) and
  EigenVerificationJob.java (cleansvd: --eigenInput, --corpusInput,
  --maxError, --minEigenvalue). The reference deprecates Lanczos in
  favor of ssvd (jobs/ssvd.py); this twin exists for registry
  completeness and for workloads that want the Krylov spectrum.

Usage:
  ... jobs/lanczossvd.py svd --input drm.parquet --output DIR \
      --rank 10 [--symmetric] [--clean] [--max-error 0.05] \
      [--min-eigenvalue 0.0]
  ... jobs/lanczossvd.py cleansvd --input drm.parquet --eigens DIR \
      --output DIR2 [--max-error 0.05] [--min-eigenvalue 0.0]

Input: triple-format DRM parquet (row_id, col_id, value). svd writes
rawEigenvectors/ (eigen_index, col_id, value triples) + sigma.json;
cleansvd (or svd --clean) writes cleanEigenvectors/ the same way with
(eigen_value, cos_angle) per kept vector in eigens.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_vectors(spark, path, vectors):
    rows = [(int(i), int(j), float(x))
            for i, vec in enumerate(vectors)
            for j, x in enumerate(vec) if x != 0.0]
    spark.createDataFrame(
        rows, "eigen_index long, col_id long, value double") \
        .write.mode("overwrite").parquet(path)


def _read_vectors(spark, path, ncol):
    import numpy as np
    rows = spark.read.parquet(path).collect()
    k = max(int(r["eigen_index"]) for r in rows) + 1
    out = [np.zeros(ncol) for _ in range(k)]
    for r in rows:
        out[int(r["eigen_index"])][int(r["col_id"])] = float(r["value"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["svd", "cleansvd"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eigens", default=None,
                    help="cleansvd: rawEigenvectors parquet from svd")
    ap.add_argument("--rank", type=int, default=10)
    ap.add_argument("--symmetric", action="store_true")
    ap.add_argument("--clean", action="store_true",
                    help="svd: chain the verification job (the "
                         "reference's --cleansvd flag)")
    ap.add_argument("--max-error", type=float, default=0.05)
    ap.add_argument("--min-eigenvalue", type=float, default=0.0)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.operators.lanczos import (clean_eigens, lanczos_svd,
                                                spark_times_squared)
    from mahout_spark.operators.solver import spark_matvec
    from mahout_spark.session import get_spark

    spark = get_spark(f"lanczos_{args.mode}", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    a = spark.read.parquet(args.input)
    ncol = a.agg(F.max("col_id")).first()[0] + 1
    t0 = time.time()
    os.makedirs(args.output, exist_ok=True)

    if args.symmetric:
        def matvec(v):
            return spark_matvec(a, v, int(ncol))
    else:
        def matvec(v):
            return spark_times_squared(a, v, int(ncol))

    result = {}
    if args.mode == "svd":
        st = lanczos_svd(a, int(ncol), args.rank,
                         symmetric=args.symmetric)
        _write_vectors(spark, os.path.join(args.output,
                                           "rawEigenvectors"),
                       st.right_singular_vectors)
        with open(os.path.join(args.output, "sigma.json"), "w") as fh:
            json.dump({"singular_values": st.singular_values,
                       "scale_factor": st.scale_factor}, fh)
        result["n_vectors"] = len(st.right_singular_vectors)
        vectors = st.right_singular_vectors if args.clean else None
    else:
        if not args.eigens:
            ap.error("cleansvd requires --eigens")
        vectors = _read_vectors(spark, args.eigens, int(ncol))

    if vectors is not None:
        kept = clean_eigens(matvec, vectors, max_error=args.max_error,
                            min_eigenvalue=args.min_eigenvalue)
        _write_vectors(spark, os.path.join(args.output,
                                           "cleanEigenvectors"),
                       [m["vector"] for m in kept])
        with open(os.path.join(args.output, "eigens.json"), "w") as fh:
            json.dump([{"index": m["index"],
                        "eigen_value": m["eigen_value"],
                        "cos_angle": m["cos_angle"]} for m in kept], fh)
        result["n_clean"] = len(kept)

    result["wall_s"] = round(time.time() - t0, 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
