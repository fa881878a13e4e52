"""spark-submit job: `mahout cvb` CLI twin — LDA via CVB0.

Reference anchors (studied, not copied):
  mr/.../clustering/lda/cvb/CVB0Driver.java (options --num_topics (-k),
  --maxIter (-x), --doc_topic_smoothing (-a), --term_topic_smoothing
  (-e), --num_terms (-nt), topic-term + doc-topic outputs) and
  InMemoryCollapsedVariationalBayes0.java.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/cvb.py \
      --input corpus.parquet --output /tmp/lda -k 10 \
      [--max-iterations 10] [--alpha 1e-4] [--eta 1e-4]
      [--top-terms 10] [--perplexity]

Input: parquet with (doc_id, term_id, count) — the reference's
sparse-vector corpus in triple form. Output dir gets topic-term/
(term_id, topics array), doc-topics/ (doc_id, doc_topics array),
top-terms/ (topic, term_id, weight), and model.json (topic sums,
perplexity history when --perplexity).
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
    ap.add_argument("-k", "--num-topics", dest="k", type=int, required=True)
    ap.add_argument("--max-iterations", type=int, default=10)
    ap.add_argument("--doc-iters", type=int, default=10)
    ap.add_argument("--alpha", type=float, default=1e-4)
    ap.add_argument("--eta", type=float, default=1e-4)
    ap.add_argument("--num-terms", type=int, default=None)
    ap.add_argument("--top-terms", type=int, default=10)
    ap.add_argument("--perplexity", action="store_true")
    ap.add_argument("--count-col", default="count",
                    help="input column holding the term count")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from mahout_spark.operators.lda import cvb0_train
    from mahout_spark.session import get_spark

    spark = get_spark("cvb", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(args.input)
    if "cnt" not in corpus.columns:  # operator contract: (doc_id, term_id, cnt)
        corpus = corpus.withColumnRenamed(args.count_col, "cnt")

    t0 = time.time()
    model = cvb0_train(corpus, args.k, num_terms=args.num_terms,
                       alpha=args.alpha, eta=args.eta,
                       max_iterations=args.max_iterations,
                       doc_iters=args.doc_iters, seed=args.seed,
                       track_perplexity=args.perplexity)
    model.model.write.mode("overwrite") \
        .parquet(f"{args.output}/topic-term")
    model.doc_topics(corpus, doc_iters=args.doc_iters) \
        .write.mode("overwrite").parquet(f"{args.output}/doc-topics")
    model.top_terms(args.top_terms) \
        .write.mode("overwrite").parquet(f"{args.output}/top-terms")
    result = {"wall_s": round(time.time() - t0, 2), "k": args.k,
              "iterations": model.iterations,
              "num_terms": model.num_terms,
              "topic_sums": [float(x) for x in model.topic_sums],
              "perplexity_history": model.perplexity_history}
    with open(f"{args.output}/model.json", "w") as f:
        json.dump(result, f)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
