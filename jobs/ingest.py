"""spark-submit job: text ingestion — `mahout seqdirectory` and

`mahout regexconverter` twins, parquet-native.

Reference anchors (studied, not copied):
  text/SequenceFilesFromDirectory.java (directory of text files →
  SequenceFile<Text(path), Text(body)>, options --keyPrefix, charset)
  and utils/regex/RegexConverterDriver.java (per-line regex
  transformation, --regex / --groupsToKeep / --transformerClass).
  SequenceFiles are replaced by parquet: (doc_id = file path, text).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/ingest.py \
      seqdirectory --input 'dir/**' --output docs.parquet \
      [--key-prefix P] [--wholetext/--lines]
  ... regexconverter --input docs.parquet --output out.parquet \
      --regex '(\\d{4})-(\\d{2})' [--replace '$1/$2' | --group 1]
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
    ap.add_argument("mode", choices=["seqdirectory", "regexconverter"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--key-prefix", default="")
    ap.add_argument("--lines", action="store_true",
                    help="seqdirectory: one row per LINE "
                         "(doc_id = path:lineno) instead of per file")
    ap.add_argument("--regex", default=None)
    ap.add_argument("--replace", default=None,
                    help="regexconverter: replacement with $1-style "
                         "group refs (regexp_replace)")
    ap.add_argument("--group", type=int, default=0,
                    help="regexconverter: emit just this capture group "
                         "(regexp_extract) when --replace is not given")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.session import get_spark

    spark = get_spark(f"ingest_{args.mode}", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    if args.mode == "seqdirectory":
        if args.lines:
            df = (spark.read.text(args.input)
                  .select(F.input_file_name().alias("__path"), "value"))
            from pyspark.sql import Window
            w = Window.partitionBy("__path").orderBy(
                F.monotonically_increasing_id())
            df = df.select(
                F.concat(F.lit(args.key_prefix), F.col("__path"),
                         F.lit(":"),
                         F.row_number().over(w).cast("string"))
                .alias("doc_id"),
                F.col("value").alias(args.text_col))
        else:
            df = (spark.read.text(args.input, wholetext=True)
                  .select(F.concat(F.lit(args.key_prefix),
                                   F.input_file_name()).alias("doc_id"),
                          F.col("value").alias(args.text_col)))
        df.write.mode("overwrite").parquet(args.output)
    else:
        if not args.regex:
            ap.error("regexconverter requires --regex")
        df = spark.read.parquet(args.input)
        if args.replace is not None:
            expr = F.regexp_replace(F.col(args.text_col), args.regex,
                                    args.replace)
        else:
            expr = F.regexp_extract(F.col(args.text_col), args.regex,
                                    args.group)
        df.withColumn(args.text_col, expr) \
          .write.mode("overwrite").parquet(args.output)

    n = spark.read.parquet(args.output).count()
    print(json.dumps({"wall_s": round(time.time() - t0, 2), "rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
