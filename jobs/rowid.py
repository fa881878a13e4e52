"""spark-submit job: `mahout rowid` CLI twin — re-key arbitrary row ids

to dense 0..n-1 ints, emitting the matrix and the docIndex map.

Reference anchors (studied, not copied):
  utils/vectors/RowIdJob.java (SequenceFile<Text,VectorWritable> →
  {SequenceFile<IntWritable,VectorWritable> "matrix",
  SequenceFile<IntWritable,Text> "docIndex"}); our distributed rank
  uses the per-partition-counts zipWithIndex shape instead of the
  reference's single-reducer enumeration (operators/drm.rekey_seq_ints).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/rowid.py \
      --input triples.parquet --output /tmp/rowid

Input: triple parquet (row_id of any type, col_id, value). Output dir
gets matrix/ (int-keyed triples) and docIndex/ (row_id, new_id).
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
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.operators.drm import as_drm, rekey_seq_ints
    from mahout_spark.session import get_spark

    spark = get_spark("rowid", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    a = as_drm(spark.read.parquet(args.input))

    t0 = time.time()
    rekeyed, keymap = rekey_seq_ints(a)
    rekeyed.write.mode("overwrite").parquet(f"{args.output}/matrix")
    keymap.write.mode("overwrite").parquet(f"{args.output}/docIndex")
    n = spark.read.parquet(f"{args.output}/docIndex").count()
    print(json.dumps({"wall_s": round(time.time() - t0, 2), "rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
