"""spark-submit job: CMS-build + top-K cosine over a web-page table.

The north-star pipeline end-to-end (mirrors the reference CLI
spark-itemsimilarity, drivers/ItemSimilarityDriver.scala:44-213):

  pages(url, warc_ts, html, text, lang)
    → tokenize (JVM explode)
    → per-<group> CMS sketches (two-phase salted merge)  [--group]
    → pairwise CMS cosine between groups                  → <out>/cms_cosine
    → token top-K cosine item pairs (doc×token matrix)    → <out>/topk_pairs
    → CMS point estimates for the head tokens             → <out>/cms_points
  with per-shard lineage + resume via --checkpoint-dir.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/topk_cosine.py \
      --input /data/webpages.parquet --output /tmp/out \
      [--generate N] [--k 100] [--max-prefs 500] [--eps 1e-3]
      [--delta 1e-2] [--group lang] [--checkpoint-dir DIR] [--cpus 32]

Defaults mirror the reference: maxPrefs=500, top-K=100
(ItemSimilarityDriver.scala:46-49).
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
    ap.add_argument("--input", help="webpage parquet path")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output", required=True)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--max-prefs", type=int, default=500)
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--delta", type=float, default=1e-2)
    ap.add_argument("--group", default="lang")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--master", default=None,
                    help="override spark master (e.g. local-cluster[4,2,"
                         "4096] for separate executor JVMs); --cpus should "
                         "then be the TOTAL core count")
    ap.add_argument("--skip-itemsim", action="store_true")
    ap.add_argument("--warmup", action="store_true",
                    help="run a 1k-page slice through the same pipeline "
                         "BEFORE the timed window: executor JVM launch + "
                         "whole-stage-codegen JIT + python worker/Arrow "
                         "warmup are one-time costs a production-scale "
                         "run amortizes to nothing, so steady-state "
                         "throughput is the number that extrapolates")
    ap.add_argument("--llr-itemsim", action="store_true",
                    help="also run the exact LLR cooccurrence top-K")
    ap.add_argument("--head-items", type=int, default=1000,
                    help="head tokens given CMS context profiles for the "
                         "top-K cosine pair search")
    ap.add_argument("--block-rows", type=int, default=None,
                    help="fix the cms_topk_cosine tile decomposition "
                         "instead of the parallelism-aware default — "
                         "scaling experiments MUST pass the same value at "
                         "both cluster sizes so the N and 4N runs execute "
                         "the identical plan (the auto default picks more, "
                         "smaller blocks at higher parallelism, i.e. "
                         "different pack/shuffle work per size)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.functions.text import explode_tokens
    from mahout_spark.operators.cooccurrence import llr_item_similarity
    from mahout_spark.operators.rowsim import row_similarity
    from mahout_spark.session import get_spark
    from mahout_spark.sketch.agg import cms_spec, sketch_by_key
    from mahout_spark.sketch.queries import cms_pairwise, cms_point_lookup
    from mahout_spark.sources.webpages import generate_webpages

    spark = get_spark("topk_cosine",
                      master=args.master or f"local[{args.cpus}]",
                      # 4x cores (was 2x): at 800k docs / 4 cores the
                      # 16-bin tail-profile shuffle left fat skewed bins
                      # — 64 bins measured 12% faster end-to-end; AQE
                      # coalesces the surplus at small inputs, so extra
                      # initial bins are ~free (SPARK_GRAFT_SHUFFLE_
                      # PARTITIONS overrides for experiments)
                      shuffle_partitions=int(os.environ.get(
                          "SPARK_GRAFT_SHUFFLE_PARTITIONS",
                          max(args.cpus * 4, 32))))
    spark.sparkContext.setLogLevel("ERROR")

    if args.generate:
        pages = generate_webpages(spark, args.generate, seed=args.seed)
    else:
        pages = spark.read.parquet(args.input)

    phases: dict[str, float] = {}

    def mark(name: str, t_start: float) -> float:
        now = time.time()
        phases[name] = round(now - t_start, 2)
        return now

    def group(name: str) -> None:
        # label stages per phase so event-log accounting
        # (tools/stage_accounting.py) can roll bytes/CPU into phases
        spark.sparkContext.setJobGroup(name, name)

    from mahout_spark.functions.text import tokens_array

    if args.warmup:
        from mahout_spark.sketch.queries import cms_topk_cosine as _tk
        from mahout_spark.sketch.agg import (cms_spec_shape as _shape,
                                             sketch_per_group as _spg)

        w = pages.limit(1000)
        wt = w.select("url", args.group,
                      F.explode(tokens_array(F.col("text"))).alias("token"))
        _ws = sketch_by_key(wt, [args.group],
                            cms_spec(eps=args.eps, delta=args.delta, seed=1),
                            key_col="token", n_salt=2)
        cms_pairwise(_ws, args.group, kind="cosine").count()
        _wh = (wt.groupBy("token").count()
               .orderBy(F.desc("count"), "token").limit(50).select("token"))
        _wp = _spg(wt.join(F.broadcast(_wh), "token"), ["token"],
                   _shape(4, 512, seed=2), key_col="url")
        _tk(_wp, "token", k=5).count()

    t0 = time.time()
    group("tokenize_count")

    # NOT persisted: caching a deserialized token stream convoys on the
    # memory store at high thread counts (measured 13s -> 78-143s), and at
    # corpus scale you can't cache exploded tokens anyway — recomputing the
    # narrow scan+split pipeline per consumer is the production pattern.
    toks = pages.select(
        "url", args.group,
        F.explode(tokens_array(F.col("text"))).alias("token"))
    n_docs = pages.count()
    t = mark("tokenize_count", t0)

    group("cms_build_cosine")
    spec = cms_spec(eps=args.eps, delta=args.delta, seed=1)
    tl_counts = None
    if args.checkpoint_dir:
        from mahout_spark.plans.checkpoint import CheckpointedSketchJob

        job = CheckpointedSketchJob(spark, args.checkpoint_dir,
                                    f"cms-{args.group}", n_shards=16)
        sketches = job.run(toks, [args.group], spec, key_col="token",
                           shard_key="url")
    else:
        # ONE explode pass: the (group, token, count) table feeds the CMS
        # build as weights (counts sum associatively — identical sketches
        # to a raw-stream build) AND the head-token lists below. It is
        # vocab x groups rows — tiny next to the token stream.
        tl_counts = (toks.groupBy(args.group, "token")
                     .agg(F.count("*").cast("double").alias("cnt"))
                     .persist())
        sketches = sketch_by_key(tl_counts, [args.group], spec,
                                 key_col="token", value_col="cnt", n_salt=8)
    sketches = sketches.persist()

    cms_pairwise(sketches, args.group, kind="cosine") \
        .write.mode("overwrite").parquet(f"{args.output}/cms_cosine")
    t = mark("cms_build_cosine", t)

    # ONE token-count pass feeds both head lists (tiny vocab-sized table);
    # the global sketch is the associative MERGE of the per-group sketches
    # — mergeability means no second build pass over the raw tokens.
    group("cms_points")
    from mahout_spark.sketch.agg import merge_sketch_rows

    tok_counts = (tl_counts.groupBy("token")
                  .agg(F.sum("cnt").cast("long").alias("count"))
                  if tl_counts is not None
                  else toks.groupBy("token").count())
    head_items = (tok_counts
                  .orderBy(F.desc("count"), "token")
                  .limit(args.head_items).select("token", "count").persist())
    head = head_items.orderBy(F.desc("count"), "token").limit(100) \
        .select("token")
    glob = merge_sketch_rows(sketches, spec)
    cms_point_lookup(glob, head, F.xxhash64(F.col("token"))) \
        .write.mode("overwrite").parquet(f"{args.output}/cms_points")
    t = mark("cms_points", t)

    if not args.skip_itemsim:
        # the CosineCM flagship: CMS context profile per head token
        # (token/url co-occurrence vectors) -> top-K CMS-cosine pairs.
        # Generic build (pairs -> Arrow -> NumPy): measured faster up to
        # ~10^6 docs. Past the point where distinct (token,url) pairs
        # dwarf head_items x depth x width, switch to the all-JVM
        # cms_per_group_bucketed (byte-identical, Arrow volume capped).
        group("topk_pairs")
        from mahout_spark.sketch.agg import (cms_spec_shape,
                                             sketch_per_group_skewed)
        from mahout_spark.sketch.queries import cms_topk_cosine

        # Zipf head: the few fattest token groups would be indivisible
        # single tasks (Amdahl straggler at small core counts) — route
        # them through partitioned partials (sketch_per_group_skewed)
        heavy = (head_items.orderBy(F.desc("count"), "token").limit(32)
                 .select("token"))
        head_items = head_items.select("token")
        profiles = sketch_per_group_skewed(
            toks.join(F.broadcast(head_items), "token"), ["token"],
            cms_spec_shape(4, 512, seed=2), heavy, key_col="url")
        pairs = cms_topk_cosine(profiles, "token", k=args.k,
                                block_rows=args.block_rows)
        pairs.write.mode("overwrite").parquet(f"{args.output}/topk_pairs")
        t = mark("topk_pairs", t)

    if args.llr_itemsim:
        group("llr_pairs")
        triples = toks.select(F.col("url").alias("row_id"),
                              F.col("token").alias("col_id"))
        sims = llr_item_similarity(triples, k=args.k,
                                   max_interactions=args.max_prefs)
        sims.write.mode("overwrite").parquet(f"{args.output}/llr_pairs")
        t = mark("llr_pairs", t)

    wall = time.time() - t0
    result = {"n_docs": n_docs, "wall_s": round(wall, 2),
              "docs_per_sec": round(n_docs / wall, 1), "cpus": args.cpus,
              "phases": phases}
    print(json.dumps(result))
    with open(f"{args.output}/RESULT.json", "w") as f:
        json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main()
