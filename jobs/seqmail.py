"""spark-submit job: `mahout seqmailarchives` CLI twin — a directory of
(optionally gzipped) mbox archives to a (key, value, parsed headers)
parquet table.

Reference anchors (studied, not copied):
  integration/.../text/SequenceFilesFromMailArchives.java:176-267 (flag
  wiring) + utils/email/MailProcessor.java (see
  sources/mailarchives.py for the state-machine semantics).

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/seqmail.py \
      --input mboxdir/ --output /tmp/mail \
      [--subject] [--to] [--from] [--references] [--body] \
      [--stripQuoted] [--quotedRegex RE] [--prefix P] \
      [--separator SEP] [--bodySeparator SEP] [--charset utf-8]
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
    ap.add_argument("--prefix", default="")
    ap.add_argument("--subject", action="store_true")
    ap.add_argument("--to", action="store_true")
    ap.add_argument("--from", dest="from_", action="store_true")
    ap.add_argument("--references", action="store_true")
    ap.add_argument("--body", action="store_true")
    ap.add_argument("--stripQuoted", action="store_true")
    ap.add_argument("--quotedRegex", default=r"^(\||>)")
    ap.add_argument("--separator", default="\n")
    ap.add_argument("--bodySeparator", default="\n")
    ap.add_argument("--charset", default="utf-8")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.session import get_spark
    from mahout_spark.sources.mailarchives import mail_records

    spark = get_spark("seqmailarchives", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    fields = tuple(n for n, on in (("from", args.from_), ("to", args.to),
                                   ("refs", args.references),
                                   ("subject", args.subject)) if on)
    t0 = time.time()
    mail = mail_records(spark, args.input, prefix=args.prefix,
                        fields=fields, include_body=args.body,
                        strip_quoted=args.stripQuoted,
                        quoted_regex=args.quotedRegex,
                        separator=args.separator,
                        body_separator=args.bodySeparator,
                        charset=args.charset)
    mail.write.mode("overwrite").parquet(f"{args.output}/chunks")
    n = spark.read.parquet(f"{args.output}/chunks").count()
    print(json.dumps({"messages": n,
                      "wall_s": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
