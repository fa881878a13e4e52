"""spark-submit job: `mahout arff.vector` CLI twin — ARFF file(s) to
vector triples plus the label/word dictionaries.

Reference anchors (studied, not copied):
  integration/.../utils/vectors/arff/Driver.java:60-180 — per-file
  vectorization writing the vectors plus dictionary (label -> index)
  and, in JSON mode, the type/nominal maps.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/arffvector.py \
      --input data.arff --output /tmp/arffout

Output dir gets triples/ (row_id, col_id, value parquet), dictionary/
(label, col_id), words/ (word, word_id — empty without STRING attrs)
and MODEL.json (relation, types, nominal ordinals, date formats).
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
    ap.add_argument("--input", required=True, help="one .arff file")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.session import get_spark
    from mahout_spark.sources.arff import read_arff_with_words

    spark = get_spark("arffvector", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    model, triples, words = read_arff_with_words(spark, args.input)
    triples.write.mode("overwrite").parquet(f"{args.output}/triples")
    spark.createDataFrame(
        [(lab, i) for i, lab in enumerate(model.labels)],
        "label string, col_id int").write.mode("overwrite").parquet(
        f"{args.output}/dictionary")
    words.write.mode("overwrite").parquet(f"{args.output}/words")
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/MODEL.json", "w") as f:
        json.dump({"relation": model.relation, "labels": model.labels,
                   "types": model.types, "nominals": model.nominals,
                   "date_fmts": model.date_fmts}, f)
    n = spark.read.parquet(f"{args.output}/triples").count()
    print(json.dumps({"relation": model.relation,
                      "n_attrs": model.n_attrs, "n_cells": n,
                      "wall_s": round(time.time() - t0, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
