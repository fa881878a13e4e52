"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The flagship (north star) measurement is ``cms_build_topk_cosine``:
fast-mode CMS build per lang over document tokens + pairwise CMS cosine +
exact top-K token-pair cosine — docs/sec derived from it. Other entries
cover the headline operator families at bench scale.

Run: python bench.py  (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS env knobs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop_consume(df):
    # materialize without driver transfer
    df.write.format("noop").mode("overwrite").save()


def bench_cms_build_topk_cosine(spark, sf_dir):
    """North-star flagship: per-lang CMS sketches + pairwise CMS cosine +

    per-head-token CMS context profiles -> top-K CMS-cosine item pairs
    (the CosineCM flow at corpus scale)."""
    from pyspark.sql import functions as F

    from mahout_spark.functions.text import tokens_array
    from mahout_spark.sketch.agg import (cms_spec, cms_spec_shape,
                                         sketch_by_key,
                                         sketch_per_group_skewed)
    from mahout_spark.sketch.queries import cms_pairwise, cms_topk_cosine

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = docs.select(
        "doc_id", "lang",
        F.explode(tokens_array(F.col("text"))).alias("token"))
    # single-pass shape (mirrors jobs/topk_cosine.py): one explode feeds
    # both the weighted CMS build and the head-token list
    tl = (toks.groupBy("lang", "token")
          .agg(F.count("*").cast("double").alias("cnt")).persist())
    sk = sketch_by_key(tl, ["lang"], cms_spec(eps=0.001, delta=0.01),
                       key_col="token", value_col="cnt", n_salt=4)
    _noop_consume(cms_pairwise(sk, "lang", kind="cosine"))
    head_counts = (tl.groupBy("token").agg(F.sum("cnt").alias("count"))
                   .orderBy(F.desc("count"), "token").limit(1000).persist())
    head = head_counts.select("token")
    heavy = (head_counts.orderBy(F.desc("count"), "token").limit(32)
             .select("token"))
    profiles = sketch_per_group_skewed(
        toks.join(F.broadcast(head), "token"), ["token"],
        cms_spec_shape(4, 512, seed=2), heavy, key_col="doc_id")
    _noop_consume(cms_topk_cosine(profiles, "token", k=10))
    n = docs.count()
    tl.unpersist()
    head_counts.unpersist()
    return n


def bench_llr_itemsim_lineitem(spark, sf_dir):
    from pyspark.sql import functions as F

    from mahout_spark.operators.cooccurrence import llr_item_similarity

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    triples = li.select(F.col("l_orderkey").alias("row_id"),
                        F.col("l_partkey").alias("col_id"))
    _noop_consume(llr_item_similarity(triples, k=10, downsample=True))


def bench_rowsim_cosine(spark, sf_dir):
    from pyspark.sql import functions as F

    from mahout_spark.operators.rowsim import row_similarity

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    triples = (li.groupBy(F.col("l_orderkey").alias("row_id"),
                          F.col("l_partkey").alias("col_id"))
               .agg(F.sum("l_quantity").alias("value")))
    _noop_consume(row_similarity(triples, measure="cosine", k=10))


def bench_minhash_dedup(spark, sf_dir):
    from mahout_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    _noop_consume(minhash_dedup_pairs(docs, "doc_id", "text",
                                      num_perm=16, bands=4, threshold=0.5))


def bench_tfidf(spark, sf_dir):
    from mahout_spark.operators.vectorize import tfidf

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    _noop_consume(tfidf(docs, variant="mahout"))


def bench_ann_topk(spark, sf_dir):
    from pyspark.sql import functions as F

    from mahout_spark.operators.ann import brute_force_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = (emb.filter(F.col("vec_id") < 50)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    _noop_consume(brute_force_topk(emb, q, k=10))


def bench_quantile_sketches(spark, sf_dir):
    from mahout_spark.sketch.agg import sketch_by_key, tdigest_spec
    from mahout_spark.sketch.queries import sketch_eval

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # value-dedup preagg: discrete-ish price column -> Python-bound rows
    # bounded by value cardinality (2.3x at sf0.1, same rank error)
    spec = tdigest_spec(100.0, dedup_values=True)
    sk = sketch_by_key(li, ["l_returnflag"], spec,
                       value_col="l_extendedprice")
    _noop_consume(sketch_eval(sk, spec, "quantile", "qv", args=(0.5,)))


BENCHES = {
    "cms_build_topk_cosine": bench_cms_build_topk_cosine,
    "llr_itemsim_lineitem": bench_llr_itemsim_lineitem,
    "rowsim_cosine": bench_rowsim_cosine,
    "minhash_dedup": bench_minhash_dedup,
    "tfidf": bench_tfidf,
    "ann_topk": bench_ann_topk,
    "quantile_sketches": bench_quantile_sketches,
}


def main():
    from mahout_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/Arrow paths so timings reflect steady state
    spark.range(1000).selectExpr("sum(id)").collect()

    # The sandbox hypervisor's memory bandwidth fluctuates 4-7x on a
    # minutes timescale (measured: 0.5-3.4 GB/s single-proc triad within
    # one session). Two interleaved passes + per-query min suppress those
    # bursts; min (not median) because noise here is strictly additive.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    times: dict[str, float] = {}
    n_docs = 0
    flagship_sec = 0.0
    for _ in range(passes):
        for name, fn in BENCHES.items():
            t0 = time.time()
            out = fn(spark, SF_DIR)
            dt = time.time() - t0
            spark.catalog.clearCache()  # persists from one bench must not
            # occupy memory / skew the next entry
            if name not in times or dt < times[name]:
                times[name] = round(dt, 3)
                if name == "cms_build_topk_cosine":
                    n_docs = out or 0
                    flagship_sec = dt
    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "docs_per_sec": round(n_docs / flagship_sec, 1) if flagship_sec else None,
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
