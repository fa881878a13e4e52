"""spark-submit job: `mahout describe` CLI twin — generate a dataset

descriptor (.info JSON) for a CSV data file.

Reference anchors (studied, not copied):
  mr/.../classifier/df/tools/Describe.java:44-130 (--path --file
  --descriptor [--regression]; descriptor tokens like "2 N C L");
  Dataset.java toJSON for the .info layout.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/describe.py \
      --path data.csv --file data.info --descriptor 2 N C L \
      [--regression]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", "-p", required=True)
    ap.add_argument("--file", "-f", required=True,
                    help="output .info descriptor file")
    ap.add_argument("--descriptor", "-d", nargs="+", required=True)
    ap.add_argument("--regression", "-r", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.session import get_spark
    from mahout_spark.sources.describe import describe_dataset

    spark = get_spark("describe", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    info, n = describe_dataset(spark, args.path, args.descriptor,
                               regression=args.regression)
    if os.path.exists(args.file):
        raise SystemExit(f"output {args.file} already exists "
                         f"(reference validateOutput contract)")
    with open(args.file, "w") as f:
        f.write(info)
    print(json.dumps({"file": args.file, "n_rows": n,
                      "descriptor": args.descriptor,
                      "regression": args.regression}))


if __name__ == "__main__":
    main()
