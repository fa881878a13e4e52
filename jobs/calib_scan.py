"""Calibration twin for scaling pairs: an EMBARRASSINGLY PARALLEL job.

Reads the same web-page parquet the flagship scaling job reads, runs the
same JVM tokenizer over every page, and reduces to ONE long (bit-xor of
token hashes) — a pure map + scalar-agg plan with no shuffle, no Python
stages, no skew, nothing an optimizer could serialize. Its measured
local[1] -> local[4] efficiency is therefore the HOST's parallel-speedup
ceiling for this data profile (string-heavy scan, memory-bandwidth
bound) at measurement time: a real 4x-executor cluster brings 4x memory
buses and would run this at ~1.0, so any shortfall here is the shared
box, not the engine or the plan. tools/calibration_pair.py runs this
back-to-back with the flagship at both sizes and reports the flagship's
efficiency both raw and normalized by this ceiling.

Usage: python jobs/calib_scan.py --input pages.parquet --cpus 4
Prints one JSON line {"wall_s": ..., "checksum": ...}.
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
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--warmup", action="store_true")
    ap.add_argument("--passes", type=int, default=1,
                    help="full-corpus passes inside the timed window — "
                         "longer walls are less sensitive to the box's "
                         "minutes-scale bandwidth swings")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.functions.text import tokens_array
    from mahout_spark.session import get_spark

    spark = get_spark("calib_scan", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 4, 32))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.input)

    def run(df):
        toks = df.select(
            F.explode(tokens_array(F.col("text"))).alias("token"))
        return toks.agg(F.expr("bit_xor(xxhash64(token))")).first()[0]

    if args.warmup:
        run(pages.limit(1000))

    t0 = time.time()
    checksum = 0
    for _ in range(args.passes):
        checksum = run(pages)
    wall = time.time() - t0
    print(json.dumps({"wall_s": round(wall, 2), "checksum": checksum,
                      "passes": args.passes}))
    spark.stop()


if __name__ == "__main__":
    main()
