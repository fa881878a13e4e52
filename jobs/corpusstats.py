"""spark-submit job: one-pass corpus statistics report.

The first thing a corpus owner runs against a new crawl drop: volume,
per-language composition, length distribution, duplication rate, and
quality-gate pass rate — one job, one REPORT.json, plus the per-language
table as parquet.

Plan shape (10^12-doc posture): everything is ONE pass over the corpus
into two aggregations — a per-language groupBy of algebraic aggs
(map-side combine absorbs the Zipf language head) and one exact-dup
groupBy on the text hash. Distinct-token counts use the HLL sketch
(broadcastable, mergeable) — the exact distinct would shuffle the full
token stream. Length quantiles are exact interpolated percentiles here
(report scale); at corpus scale swap in the gated t-digest path
(sketch/queries.py) — same output columns.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/corpusstats.py \
      --input docs.parquet --output /tmp/report [--no-gopher]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from mahout_spark.functions.corpus import (per_language_stats,
                                            per_language_stats_sql)  # noqa: E402,F401 (re-export for tests/CLI)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--no-gopher", action="store_true")
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.core.hll import HyperLogLog
    from mahout_spark.functions.text import tokens_array
    from mahout_spark.session import get_spark
    from mahout_spark.sketch.agg import hll_spec, sketch_global

    spark = get_spark("corpusstats", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    tc, lc = args.text_col, args.lang_col

    per_lang = per_language_stats(docs, tc, lc,
                                  gopher=not args.no_gopher)
    per_lang.write.mode("overwrite").parquet(f"{args.output}/per_lang")
    rows = sorted((r.asDict() for r in per_lang.collect()),
                  key=lambda r: r["lang"])

    toks = docs.select(F.explode(tokens_array(F.col(tc))).alias("token"))
    blob = sketch_global(toks, hll_spec(p=args.hll_p), key_col="token")
    distinct_tokens = int(round(HyperLogLog.deserialize(blob).count()))

    report = {
        "wall_s": round(time.time() - t0, 2),
        "n_docs": int(sum(r["n_docs"] for r in rows)),
        "n_tokens": int(sum(r["n_tokens"] for r in rows)),
        "n_chars": int(sum(r["n_chars"] for r in rows)),
        "dup_docs": int(sum(r["dup_docs"] for r in rows)),
        "distinct_tokens_hll": distinct_tokens,
        "per_lang": rows,
    }
    print(json.dumps(report, default=str))
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/REPORT.json", "w") as f:
        json.dump(report, f, default=str)
    spark.stop()


if __name__ == "__main__":
    main()
