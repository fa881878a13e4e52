"""spark-submit job: train/test splitting — `mahout split` and

`mahout splitDataset` CLI twins.

Reference anchors (studied, not copied):
  utils/SplitInput.java (--testSplitPct / --randomSelectionPct, per-file
  or random selection) and cf/taste/hadoop/als/DatasetSplitter.java
  (--trainingPercentage / --probePercentage over rating triples, two
  filtered passes with a markRow random tag).

Spark-first determinism: the reference tags rows with Random; here the
coin is xxhash64(<row key>, seed) so the split is reproducible across
reruns, partitionings, and executor counts — and both output sides are
plain pushdown-friendly FILTERS over one scan (no shuffle at all).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/split.py \
      --input data.parquet --output /tmp/split \
      [--test-pct 20] [--key-cols user_id,item_id] [--seed 42]
      [--probe-pct 10]   # DatasetSplitter mode: train/probe naming

Output dir gets train/ and test/ (or probe/) parquet plus
SPLIT.json with the realized counts.
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
    ap.add_argument("--test-pct", type=float, default=None,
                    help="SplitInput --testSplitPct (held-out share)")
    ap.add_argument("--probe-pct", type=float, default=None,
                    help="DatasetSplitter --probePercentage; output "
                         "named probe/ instead of test/")
    ap.add_argument("--key-cols", default=None,
                    help="comma-separated columns hashed for the coin "
                         "(default: every column = row-level split). "
                         "Equal keys land on the SAME side — pass e.g. "
                         "user_id for a grouped per-user holdout; with "
                         "few distinct keys the realized pct is "
                         "correspondingly coarse")
    ap.add_argument("--num-splits", type=int, default=None,
                    help="`mahout resplit` mode: N equal hash splits "
                         "written as split=0..N-1 partitions")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)
    n_modes = sum(x is not None
                  for x in (args.test_pct, args.probe_pct, args.num_splits))
    if n_modes != 1:
        ap.error("exactly one of --test-pct / --probe-pct / --num-splits")
    if args.num_splits is None:
        pct = args.test_pct if args.test_pct is not None else args.probe_pct
        held_name = "test" if args.test_pct is not None else "probe"
        if not 0 < pct < 100:
            ap.error("percentage must be in (0, 100)")

    from pyspark.sql import functions as F

    from mahout_spark.session import get_spark

    spark = get_spark("split", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.input)
    keys = (args.key_cols.split(",") if args.key_cols else df.columns)

    t0 = time.time()
    if args.num_splits is not None:
        sid = F.pmod(F.xxhash64(*[F.col(c) for c in keys],
                                F.lit(args.seed)), F.lit(args.num_splits))
        (df.withColumn("split", sid)
           .write.mode("overwrite").partitionBy("split")
           .parquet(args.output))
        counts = (spark.read.parquet(args.output).groupBy("split").count()
                  .orderBy("split").collect())
        result = {"wall_s": round(time.time() - t0, 2),
                  "splits": {int(r["split"]): int(r["count"])
                             for r in counts}}
        print(json.dumps(result))
        spark.stop()
        return
    # uniform in [0, 1): low 20 bits of a seeded xxhash64 of the keys
    coin = (F.pmod(F.xxhash64(*[F.col(c) for c in keys], F.lit(args.seed)),
                   F.lit(1 << 20)) / float(1 << 20))
    held = df.filter(coin < pct / 100.0)
    train = df.filter(coin >= pct / 100.0)
    held.write.mode("overwrite").parquet(f"{args.output}/{held_name}")
    train.write.mode("overwrite").parquet(f"{args.output}/train")
    n_held = spark.read.parquet(f"{args.output}/{held_name}").count()
    n_train = spark.read.parquet(f"{args.output}/train").count()
    result = {"wall_s": round(time.time() - t0, 2), "train": n_train,
              held_name: n_held,
              "realized_pct": round(100.0 * n_held /
                                    max(1, n_held + n_train), 2)}
    with open(f"{args.output}/SPLIT.json", "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
