"""spark-submit job: seq2sparse CLI twin — text corpus → sparse TF-IDF

vectors + dictionary + document frequencies.

Reference anchors (studied, not copied):
  mr/.../vectorizer/SparseVectorsFromSequenceFiles.java (options
  --minDF (-md), --maxDFPercent (-x), --weight (-wt tfidf|tf),
  --norm (-n), --namedVector) and DictionaryVectorizer /
  TFIDFConverter MR phases. Here the whole pipeline is three
  DataFrame plans sharing one token scan.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/seq2sparse.py \
      --input docs.parquet --output /tmp/vectors \
      [--weight tfidf|tf] [--min-df 1] [--max-df-percent 100]
      [--norm 2.0] [--variant mahout|mllib]

Input: parquet with (doc_id, text). Output dir gets dictionary/
(token, token_id, df), tfidf-vectors/ (doc_id, token, token_id,
weight), and df-count/ (token, df).
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
    ap.add_argument("--weight", choices=["tfidf", "tf"], default="tfidf")
    ap.add_argument("--encoded", action="store_true",
                    help="`mahout seq2encoded` twin: dictionary-free "
                    "feature-hashing vectors (EncodedVectorsFrom"
                    "SequenceFiles)")
    ap.add_argument("--cardinality", type=int, default=1 << 12,
                    help="--encoded: hash-bucket count")
    ap.add_argument("--variant", choices=["mahout", "mllib"],
                    default="mahout",
                    help="tfidf formula (TFIDF.scala variants)")
    ap.add_argument("--min-df", type=int, default=1)
    ap.add_argument("--max-df-percent", type=float, default=100.0)
    ap.add_argument("--norm", type=float, default=0.0,
                    help="p-norm row normalization (0 = off)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.operators.vectorize import (build_dictionary,
                                                  doc_freq, normalize_rows,
                                                  term_counts, tfidf)
    from mahout_spark.session import get_spark

    spark = get_spark("seq2sparse", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.input)

    t0 = time.time()
    if args.encoded:
        from mahout_spark.operators.vectorize import encoded_vectors

        vecs = encoded_vectors(docs, dim=args.cardinality,
                               id_col=args.id_col, text_col=args.text_col)
        if args.norm > 0:
            vecs = normalize_rows(
                vecs.withColumnRenamed("bucket", "token_id"),
                p=args.norm, id_col=args.id_col)
        else:
            vecs = vecs.withColumnRenamed("bucket", "token_id")
        vecs.write.mode("overwrite").parquet(f"{args.output}/vectors")
        n = spark.read.parquet(f"{args.output}/vectors").count()
        print(json.dumps({"mode": "seq2encoded",
                          "cardinality": args.cardinality, "nnz": n,
                          "wall_s": round(time.time() - t0, 2)}))
        return
    tc = term_counts(docs, args.id_col, args.text_col)
    dfreq = doc_freq(tc, args.id_col)
    dfreq.write.mode("overwrite").parquet(f"{args.output}/df-count")
    dictionary = build_dictionary(tc)
    dictionary.write.mode("overwrite").parquet(f"{args.output}/dictionary")

    variant = args.variant if args.weight == "tfidf" else "tf"
    max_df_fraction = (args.max_df_percent / 100.0
                       if args.max_df_percent < 100.0 else None)
    vecs = tfidf(docs, variant=variant, id_col=args.id_col,
                 text_col=args.text_col, min_df=args.min_df,
                 max_df_fraction=max_df_fraction)
    if args.norm > 0:
        vecs = normalize_rows(vecs, p=args.norm, id_col=args.id_col)
    (vecs.join(dictionary.select("token", "token_id"), "token")
         .select(args.id_col, "token", "token_id", "weight")
         .write.mode("overwrite").parquet(f"{args.output}/tfidf-vectors"))

    result = {"wall_s": round(time.time() - t0, 2),
              "n_docs": docs.count(),
              "vocab": dictionary.count()}
    print(json.dumps(result))
    with open(f"{args.output}/RESULT.json", "w") as f:
        json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main()
