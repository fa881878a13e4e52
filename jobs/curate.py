"""spark-submit job: end-to-end web-corpus curation pipeline.

The training-data path the brief's webtext payload exists for, as one
deployable job:

  0. unicode hygiene  — optional strip-controls + NFC composition
                        (functions/unicode.py) so every downstream
                        hash stage keys on canonical bytes
  1. quality filter   — Gopher rules (functions/webquality.py) and/or
                        the C4 line filter (cleaned text replaces text)
  2. exact line dedup — corpus-level first-occurrence-wins (optional)
  3. near-dup groups  — MinHash-LSH pairs → transitive groups
                        (operators/dedup.py)
  4. keep best        — quality-based representative per group
                        (pick_representatives; score = n_chars of the
                        surviving text) + dedup_filter anti-join
  4b. substring dedup — optional RefinedWeb-style exact-substring stage:
                        corpus-duplicated >= K-token spans removed
                        (operators/substring.py, k-gram anchoring)
  4c. decontaminate   — optional benchmark n-gram-overlap drop (Brown
                        et al. 13-gram rule; operators/substring.py
                        contamination_spans over a benchmark parquet)
  4d. DSIR            — optional importance resampling toward a target
                        corpus (functions/dsir.py; hashed n-gram models,
                        deterministic Gumbel-top-K)
  5. LM filter        — optional CCNet-style perplexity cut under a
                        self-trained bigram LM (functions/lm.py; exact
                        count tables or broadcast CMS blobs)
  6. sample/split     — per-language stratified rates + train/val/test
                        split columns (functions/sampling.py)

Every stage is deterministic (hash coins, not rand()), so the output
is identical under task retry and re-run — the property the north
rule's resumability story depends on. Stage plan shapes: 1 is map-only;
2 is two key-hash shuffles; 3 is the banded LSH equi-join + O(log d)
label-propagation rounds; 4 is two combinable aggs + an anti-join;
5 is map-only.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/curate.py \
      --input docs.parquet --output /tmp/curated \
      [--no-gopher] [--c4] [--line-dedup] [--scrub-pii] \
      [--minhash-perm 16] [--bands 8] [--threshold 0.125] \
      [--rates en=0.5,de=0.25] [--splits 0.8,0.1,0.1] [--seed 1]

Input: parquet with (doc_id, text [, lang]). Output dir gets
curated/ (doc_id, text, lang?, split) and RESULT.json with
per-stage row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_rates(s: str) -> dict:
    out = {}
    for part in s.split(","):
        if part:
            k, v = part.split("=")
            out[k] = float(v)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--nfc", action="store_true",
                    help="strip control chars + NFC-normalize text "
                         "before any filtering/hashing stage")
    ap.add_argument("--no-gopher", action="store_true",
                    help="skip the Gopher quality filter")
    ap.add_argument("--c4", action="store_true",
                    help="apply the C4 line filter (cleaned text kept)")
    ap.add_argument("--line-dedup", action="store_true",
                    help="corpus-level exact line dedup")
    ap.add_argument("--minhash-perm", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.125)
    ap.add_argument("--no-neardup", action="store_true",
                    help="skip MinHash near-dup group removal")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="replace emails/IPv4/phone-like runs with typed "
                         "placeholders after dedup (dedup hashes stay on "
                         "the original text); per-rule match totals land "
                         "in RESULT.json")
    ap.add_argument("--substring-dedup", type=int, default=None,
                    metavar="K",
                    help="remove corpus-duplicated token spans anchored "
                         "on K-grams (RefinedWeb exact-substring stage); "
                         "runs after near-dup group removal")
    ap.add_argument("--substring-min-count", type=int, default=2)
    ap.add_argument("--decontaminate", default=None, metavar="PARQUET",
                    help="drop docs sharing any K-gram (see "
                         "--decontaminate-k) with the benchmark parquet "
                         "(column named by --text-col); the Brown et al. "
                         "n-gram-overlap decontamination rule")
    ap.add_argument("--decontaminate-k", type=int, default=13)
    ap.add_argument("--lm-filter", type=float, default=None,
                    metavar="FRAC",
                    help="keep the FRAC lowest-cross-entropy share of docs "
                         "under a self-trained add-0.5 bigram LM (CCNet "
                         "shape); docs too short to score (< 2 tokens) are "
                         "dropped. Cut = exact percentile here; at corpus "
                         "scale swap in the t-digest quantile")
    ap.add_argument("--lm-cms", action="store_true",
                    help="score with the broadcast count-min-sketch LM "
                         "(no count-table join; the 10^12-token path)")
    ap.add_argument("--lm-eps", type=float, default=1e-5)
    ap.add_argument("--dsir-target", default=None, metavar="PARQUET",
                    help="importance-resample toward this target-corpus "
                         "parquet (Xie et al. DSIR): hashed n-gram "
                         "models, Gumbel-top-K selection")
    ap.add_argument("--dsir-k", type=int, default=None,
                    help="number of docs the DSIR stage keeps")
    ap.add_argument("--dsir-buckets", type=int, default=8192)
    ap.add_argument("--rates", default="",
                    help="per-lang sample rates k=v,...; empty = keep all")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--splits", default="0.8,0.1,0.1")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from mahout_spark.functions.sampling import (split_fractions,
                                                 stratified_sample)
    from mahout_spark.functions.webquality import (c4_clean, gopher_filter,
                                                   line_dedup)
    from mahout_spark.operators.dedup import (dedup_groups,
                                              minhash_dedup_pairs)
    from mahout_spark.session import get_spark

    spark = get_spark("curate", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.input)
    idc, tc = args.id_col, args.text_col
    has_lang = args.lang_col in docs.columns

    t0 = time.time()
    counts = {"input": docs.count()}

    if args.nfc:
        from mahout_spark.functions.unicode import (nfc_normalize,
                                                    strip_control_chars)

        docs = docs.withColumn(
            tc, nfc_normalize(strip_control_chars(F.col(tc))))
    if not args.no_gopher:
        docs = gopher_filter(docs, tc)
        counts["gopher"] = docs.count()
    if args.c4:
        docs = (c4_clean(docs, tc).where(F.col("c4_keep"))
                .drop(tc, "c4_keep")
                .withColumnRenamed("c4_text", tc))
        counts["c4"] = docs.count()
    if args.line_dedup:
        keep_cols = [c for c in docs.columns if c != tc]
        docs = (line_dedup(docs, idc, tc)
                .where(F.col("n_lines_kept") > 0)
                .withColumnRenamed("text_dedup", tc)
                .drop("n_lines", "n_lines_kept")
                .join(docs.select(*keep_cols), idc))
        counts["line_dedup"] = docs.count()
    if not args.no_neardup:
        pairs = minhash_dedup_pairs(
            docs, idc, tc, num_perm=args.minhash_perm, bands=args.bands,
            seed=args.seed, threshold=args.threshold, family="fast")
        groups = dedup_groups(pairs.select("id_a", "id_b"))
        scored = docs.select(F.col(idc),
                             F.length(F.col(tc)).alias("__q"))
        docs = _keep_best(docs, groups, scored, idc)
        counts["neardup"] = docs.count()
    if args.substring_dedup:
        from mahout_spark.operators.substring import remove_duplicate_spans

        cleaned = remove_duplicate_spans(
            docs, idc, tc, k=args.substring_dedup,
            min_count=args.substring_min_count)
        counts["substring_dup_units"] = int(
            cleaned.agg(F.sum("n_dup_units")).collect()[0][0] or 0)
        docs = (cleaned.withColumn(tc, F.col("text_dedup"))
                .drop("text_dedup", "n_dup_units"))
        counts["substring_dedup"] = docs.count()
    if args.decontaminate:
        from mahout_spark.operators.substring import decontaminate

        bench = spark.read.parquet(args.decontaminate)
        docs = decontaminate(docs, bench, idc, tc, tc,
                             k=args.decontaminate_k, policy="drop")
        counts["decontaminate"] = docs.count()
    pii_totals = None
    if args.scrub_pii:
        from mahout_spark.functions.webquality import pii_counts, scrub_pii

        cnt = pii_counts(F.col(tc))
        pii_totals = {k: int(v) for k, v in
                      docs.agg(*[F.sum(c).alias(k)
                                 for k, c in cnt.items()])
                      .collect()[0].asDict().items()}
        docs = docs.withColumn(tc, scrub_pii(F.col(tc)))
    lm_cut = None
    if args.lm_filter is not None:
        from mahout_spark.functions.lm import (lm_cross_entropy,
                                               lm_cross_entropy_cms,
                                               train_lm, train_lm_cms)

        if args.lm_cms:
            blob_n, blob_ctx, v = train_lm_cms(
                docs, tc, n=2, eps=args.lm_eps, seed=args.seed)
            scored_lm = lm_cross_entropy_cms(docs, idc, tc, blob_n,
                                             blob_ctx, v)
        else:
            counts_n, counts_ctx, v = train_lm(docs, tc, n=2)
            scored_lm = lm_cross_entropy(docs, idc, tc, counts_n,
                                         counts_ctx, v)
        scored_lm = scored_lm.persist()
        lm_cut = scored_lm.agg(F.expr(
            f"percentile(cross_entropy, {args.lm_filter})")).collect()[0][0]
        keep = scored_lm.filter(F.col("cross_entropy") <= lm_cut)
        docs = docs.join(keep.select(idc), idc, "left_semi")
        scored_lm.unpersist()
        counts["lm_filter"] = docs.count()
    if args.dsir_target:
        if not args.dsir_k:
            raise SystemExit("--dsir-target requires --dsir-k")
        from mahout_spark.functions.dsir import dsir_sample

        tgt = spark.read.parquet(args.dsir_target)
        sel = dsir_sample(docs, tgt, args.dsir_k, idc, tc,
                          buckets=args.dsir_buckets, seed=args.seed + 2)
        docs = docs.join(sel.select(idc), idc, "left_semi")
        counts["dsir"] = docs.count()
    rates = _parse_rates(args.rates)
    if rates and has_lang:
        docs = stratified_sample(docs, args.lang_col, rates, idc,
                                 seed=args.seed,
                                 default_rate=args.default_rate)
        counts["sampled"] = docs.count()
    fractions = [float(x) for x in args.splits.split(",") if x]
    docs = split_fractions(docs, idc, fractions, seed=args.seed + 1)

    docs.write.mode("overwrite").parquet(f"{args.output}/curated")
    result = {"wall_s": round(time.time() - t0, 2), "counts": counts,
              "output_rows": counts.get("sampled",
                                        counts[list(counts)[-1]])}
    if pii_totals is not None:
        result["pii"] = pii_totals
    if lm_cut is not None:
        result["lm_cut"] = lm_cut
    print(json.dumps(result))
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/RESULT.json", "w") as f:
        json.dump(result, f)
    spark.stop()


def _keep_best(docs, groups, scored, idc):
    from mahout_spark.operators.dedup import (dedup_filter,
                                              pick_representatives)

    reps = pick_representatives(groups, scored, idc, "__q")
    return dedup_filter(docs, reps, idc)


if __name__ == "__main__":
    main()
