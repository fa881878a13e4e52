"""spark-submit job: streaming near-duplicate detection.

No reference CLI twin (the reference has no streaming engine); this is
the builder-brief crawl-dedup stage as a deployable job: documents
arriving as parquet files in a directory are incrementally LSH'd
(streaming/dedup.py) and candidate pairs append to a parquet sink.
Run once with --available-now to drain what's there (cron-style), or
without it to keep running on a processing-time trigger.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/streamdedup.py \
      --input /data/docs --output /data/dup_pairs \
      --checkpoint /data/ckpt [--num-perm 16] [--bands 4] \
      [--shingle-n 3] [--max-bucket 1000] [--threshold 0.7] \
      [--available-now] [--family fast|parity]

Input: parquet (doc_id, text) files; override with --id-col/--text-col.
Output: parquet (band, id_a, id_b, est_jaccard) appended per batch —
dedup across bands downstream (SELECT DISTINCT id_a, id_b), or feed
dedup_groups for transitive group resolution.
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
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--num-perm", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--max-bucket", type=int, default=1000)
    ap.add_argument("--threshold", type=float, default=None,
                    help="min est_jaccard to emit")
    ap.add_argument("--family", choices=["fast", "parity"],
                    default="fast")
    ap.add_argument("--available-now", action="store_true",
                    help="drain existing files then exit")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.session import get_spark
    from mahout_spark.streaming.dedup import streaming_minhash_pairs

    spark = get_spark("streamdedup", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    schema = spark.read.parquet(args.input).schema
    reader = spark.readStream.schema(schema)
    if args.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               args.max_files_per_trigger)
    docs = reader.parquet(args.input)
    pairs = streaming_minhash_pairs(
        docs, id_col=args.id_col, text_col=args.text_col,
        num_perm=args.num_perm, bands=args.bands,
        shingle_n=args.shingle_n, seed=args.seed,
        max_bucket=args.max_bucket, family=args.family,
        output_mode="append")
    if args.threshold is not None:
        pairs = pairs.filter(F.col("est_jaccard") >= args.threshold)

    writer = (pairs.writeStream.format("parquet")
              .option("path", args.output)
              .option("checkpointLocation", args.checkpoint)
              .outputMode("append"))
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        n = spark.read.parquet(args.output).count()
        print(json.dumps({"wall_s": round(time.time() - t0, 2),
                          "pairs_total": n}))
        spark.stop()
    else:
        q = writer.start()
        q.awaitTermination()


if __name__ == "__main__":
    main()
