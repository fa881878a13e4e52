"""spark-submit job: `mahout seqwiki` CLI twin — Wikipedia XML dump to
a (category, doc_key, title, text) parquet table.

Reference anchors (studied, not copied):
  integration/.../text/wikipedia/WikipediaToSequenceFileDriver +
  WikipediaMapper.java (see sources/wikipedia.py for semantics).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/seqwiki.py \
      --input dump.xml --output /tmp/wiki \
      [--categories science,math] [--exactMatch] [--all] [--removeLabels]
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
    ap.add_argument("--categories", default="",
                    help="comma-separated category list")
    ap.add_argument("--exactMatch", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="keep pages with no matching category")
    ap.add_argument("--removeLabels", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.session import get_spark
    from mahout_spark.sources.wikipedia import wikipedia_pages

    spark = get_spark("seqwiki", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    cats = [c.strip() for c in args.categories.split(",") if c.strip()]
    t0 = time.time()
    pages = wikipedia_pages(spark, args.input, categories=cats,
                            exact_match=args.exactMatch,
                            all_pages=args.all or not cats,
                            remove_labels=args.removeLabels)
    pages.write.mode("overwrite").parquet(f"{args.output}/pages")
    n = spark.read.parquet(f"{args.output}/pages").count()
    print(json.dumps({"pages": n,
                      "wall_s": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
