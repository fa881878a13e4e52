"""spark-submit job: WARC crawl segments → the north-rule web-page table.

Reads a directory of .warc / .warc.gz files (ISO 28500; Common-Crawl
per-record-gzip convention supported) and writes the BASELINE.json
input_hint table (url, warc_ts, html, text, lang) as parquet — the
bridge from raw crawl output to every sketch/curation job in this repo.
No reference anchor: jalhajj/mahout has no web ingest; the WARC grammar
is public spec (see sources/warc.py).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/warcingest.py \
      --input crawl/segments/ --output webpages.parquet \
      [--records] [--cpus 32]

--records keeps ALL record types with full WARC metadata instead of the
web-page table (one row per record: warc_file, record_type, url,
warc_ts, content_type, payload, text).
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
    ap.add_argument("--records", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.session import get_spark
    from mahout_spark.sources.warc import warc_records, warc_webpages

    spark = get_spark("warcingest", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()

    if args.records:
        df = warc_records(spark, args.input, types=())
    else:
        df = warc_webpages(spark, args.input)
    df.write.mode("overwrite").parquet(args.output)

    n = spark.read.parquet(args.output).count()
    print(json.dumps({"wall_s": round(time.time() - t0, 2), "rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
