"""spark-submit job: the COMPLETE pretraining-data pipeline, one deploy.

Chains every stage this repo ships, raw documents to training shards:

  1. curation   — jobs/curate.py invoked as a sub-stage with its own
                  RESULT.json (unicode hygiene, Gopher/C4 quality, line
                  dedup, MinHash-LSH near-dup keep-best, optional
                  substring dedup / decontamination / PII scrub /
                  LM+DSIR selection, stratified sampling,
                  train/val/test split) — composition by the file
                  contract, the same way the reference's driver chains
                  its MR jobs
  2. tokenizer  — BPE merges learned on the TRAIN split only
                  (operators/bpe.py: one corpus word-count pass +
                  deterministic driver merge loop); vocabulary = sorted
                  distinct train tokens, so val/test leakage into the
                  model is structurally impossible (unseen tokens map
                  to the reserved unk id)
  3. encode     — bpe_encode_pandas (Arrow batches, per-partition
                  segment cache) + tokens_to_ids_pandas (closure dict,
                  O(1)/token) over every split
  4. pack       — GPT-style concat-and-chunk into fixed blocks per
                  split (operators/packing.py: deterministic
                  pseudo-shuffle, two-phase distributed prefix sum;
                  drop_last only on train — eval sets keep their tail)
  5. shard      — size-balanced deterministic shard export per split
                  (write_shards: contiguous ranges of the shuffle
                  order, exact integer arithmetic, partitionBy(shard))

Every stage is hash-coin deterministic: the same inputs + seed produce
the same shards on any cluster size, any partitioning, any retry —
the CLI test asserts byte-identical block contents across reruns.

The stages themselves are individually CORRECTNESS-gated (gopher_quality,
dedup_keep_best, stratified_sample, bpe_merges/bpe_encode,
sequence_pack, shard_plan) and the tokenize→pack composition is gated
end-to-end (bpe_pack); this job is their deployable composition.

Usage:
  spark-submit --py-files dist/mahout_spark.zip jobs/pretrain.py \
      --input docs.parquet --output /tmp/pretrain \
      [--merges 64] [--min-count 2] [--block-size 256] [--n-shards 8] \
      [--skip-curation] [--no-gopher] [--c4] [--line-dedup] \
      [--scrub-pii] [--rates en=0.5] [--splits 0.9,0.05,0.05] [--seed 1]

Output layout:
  {output}/curate/curated/        curated docs + split column
  {output}/tokenizer/merges/      BPE merge table (rank, left, right)
  {output}/tokenizer/vocab/       (token_id, token)
  {output}/packed/split=N/shard=S/  fixed-length blocks
  {output}/RESULT.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPLIT_NAMES = {0: "train", 1: "val", 2: "test"}


def _split_intact(spark, sp_path: str) -> tuple[bool, list | None]:
    """(intact, manifest-or-None) for a packed split. Intact = _SUCCESS
    exists AND (when a _MANIFEST.json was written) the shard manifest
    recomputed from the parquet matches bit-for-bit. ANY read/parse
    failure — truncated part file, missing parts, half-written manifest
    JSON — counts as not-intact (logged to stderr with the diagnostics),
    so --resume repacks instead of crashing: self-healing over trusting.
    A pre-manifest layout returns (True, None); the caller backfills its
    manifest. Callers memoize — verification reads the whole split."""
    if not os.path.exists(f"{sp_path}/_SUCCESS"):
        return False, None
    man_path = f"{sp_path}/_MANIFEST.json"
    if not os.path.exists(man_path):
        # pre-manifest layout: trust the marker, loudly — integrity
        # checking is downgraded until the caller backfills the manifest
        print(f"resume: {sp_path} has _SUCCESS but no _MANIFEST.json; "
              f"trusting the marker and backfilling a manifest from "
              f"on-disk content (verify it if this layout is not a "
              f"known legacy write)", file=sys.stderr)
        return True, None
    from mahout_spark.operators.packing import verify_shards

    try:
        man = json.load(open(man_path))
        problems = verify_shards(spark, sp_path, man, "seq_id", "tokens")
    except Exception as e:  # corrupt parquet/JSON: repack, don't crash
        print(f"resume: {sp_path} unreadable "
              f"({e.__class__.__name__}: {str(e)[:200]}); repacking",
              file=sys.stderr)
        return False, None
    if problems:
        print(f"resume: {sp_path} failed manifest verification; "
              f"repacking: " + "; ".join(problems[:5]), file=sys.stderr)
        return False, None
    return True, man


def _manifest_stats(man: list) -> dict:
    """pack-stage stats straight from a verified manifest — no rescan."""
    return {"blocks": int(sum(m["n_rows"] for m in man)),
            "tokens": int(sum(m.get("n_tokens", 0) for m in man)),
            "n_shards": len(man)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    # curation pass-through (subset of jobs/curate.py's surface)
    ap.add_argument("--skip-curation", action="store_true",
                    help="input already has a `split` column; go "
                         "straight to tokenization")
    ap.add_argument("--no-gopher", action="store_true")
    ap.add_argument("--c4", action="store_true")
    ap.add_argument("--line-dedup", action="store_true")
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--no-neardup", action="store_true")
    ap.add_argument("--rates", default="")
    ap.add_argument("--splits", default="0.9,0.05,0.05")
    # cross-split leakage QA (after curation, before tokenization)
    ap.add_argument("--leakage-check", type=int, default=None,
                    metavar="K",
                    help="report train docs sharing any K-token gram "
                         "with the val/test splits (the Brown et al. "
                         "overlap rule turned inward: eval examples "
                         "quoted inside training text); the small eval "
                         "side broadcasts, the train side adds one "
                         "gram join")
    ap.add_argument("--leakage-drop", action="store_true",
                    help="also drop the flagged train docs (one "
                         "anti-join); RESULT records before/after")
    # tokenizer
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--max-words", type=int, default=None)
    # mixture (train split only)
    ap.add_argument("--mix", default="",
                    help="target token shares per lang, k=v,... "
                         "(functions/mixing.py): the train split is "
                         "re-mixed by water-filling rates before "
                         "packing; strata outside the recipe drop")
    ap.add_argument("--mix-epochs", type=float, default=1.0,
                    help="repetition cap for scarce strata (rate > 1 "
                         "emits full copies + a fractional coin)")
    # pack + shard
    ap.add_argument("--block-size", type=int, default=256)
    ap.add_argument("--n-shards", type=int, default=8,
                    help="shards for the train split; val/test get a "
                         "token-proportional share (min 1)")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--resume", action="store_true",
                    help="skip stages whose outputs already exist "
                         "(curate RESULT.json, tokenizer _SUCCESS, "
                         "per-split packed _SUCCESS) — safe because "
                         "every stage is deterministic: a resumed run "
                         "produces byte-identical shards to a full one")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args(argv)
    if args.leakage_drop and not args.leakage_check:
        # the whole leakage stage is gated on --leakage-check K; a bare
        # --leakage-drop would otherwise silently do nothing
        ap.error("--leakage-drop requires --leakage-check K "
                 "(e.g. --leakage-check 13, the Brown et al. rule)")

    from pyspark.sql import functions as F

    from mahout_spark.operators.bpe import (BPEModel, bpe_encode_pandas,
                                            bpe_train, build_vocab,
                                            tokens_to_ids_pandas)
    from mahout_spark.operators.packing import (pack_sequences,
                                                shard_manifest,
                                                write_shards)
    from mahout_spark.session import get_spark

    idc, tc = args.id_col, args.text_col
    result: dict = {"stages": {}, "resumed": []}
    t_all = time.time()

    # determinism only makes resume safe for IDENTICAL parameters: stamp
    # every output-shaping knob and refuse to resume across a change
    # (otherwise stale shards would sit under a manifest claiming the
    # new parameters)
    knobs = {k: getattr(args, k) for k in
             ("input", "merges", "min_count", "max_words", "block_size",
              "n_shards", "seed", "mix", "mix_epochs", "splits", "rates",
              "no_gopher", "c4", "line_dedup", "scrub_pii", "no_neardup",
              "skip_curation", "leakage_check", "leakage_drop")}
    stamp_path = f"{args.output}/ARGS.json"
    prior_result = None
    if args.resume:
        if os.path.exists(stamp_path):
            prior = json.load(open(stamp_path))
            if prior != knobs:
                diff = {k: (prior.get(k), v) for k, v in knobs.items()
                        if prior.get(k) != v}
                raise SystemExit(
                    f"--resume refused: parameters changed since the "
                    f"existing output was written {diff}; use a fresh "
                    f"--output (or delete it) to rebuild")
        if os.path.exists(f"{args.output}/RESULT.json"):
            prior_result = json.load(open(f"{args.output}/RESULT.json"))
    os.makedirs(args.output, exist_ok=True)

    def _commit_stamp():
        # stamp knobs only on SUCCESSFUL completion (tmp + rename):
        # a crashed run must not canonize its parameters, or a later
        # --resume would silently adopt the previous run's outputs
        with open(stamp_path + ".tmp", "w") as f:
            json.dump(knobs, f)
        os.replace(stamp_path + ".tmp", stamp_path)

    # -- stage 1: curation (sub-job via the file contract) --------------------
    if args.skip_curation:
        curated_path = args.input
    else:
        curate_out = f"{args.output}/curate"
        curated_path = f"{curate_out}/curated"
        if args.resume and os.path.exists(f"{curate_out}/RESULT.json"):
            # every stage is hash-coin deterministic, so an existing
            # output IS the output a re-run would produce
            result["stages"]["curate"] = json.load(
                open(f"{curate_out}/RESULT.json"))
            result["resumed"].append("curate")
        else:
            from jobs import curate

            cargv = ["--input", args.input, "--output", curate_out,
                     "--id-col", idc, "--text-col", tc,
                     "--lang-col", args.lang_col,
                     "--splits", args.splits, "--seed", str(args.seed),
                     "--cpus", str(args.cpus)]
            for flag, on in [("--no-gopher", args.no_gopher),
                             ("--c4", args.c4),
                             ("--line-dedup", args.line_dedup),
                             ("--scrub-pii", args.scrub_pii),
                             ("--no-neardup", args.no_neardup)]:
                if on:
                    cargv.append(flag)
            if args.rates:
                cargv += ["--rates", args.rates]
            t0 = time.time()
            curate.main(cargv)  # runs + stops its own SparkSession
            result["stages"]["curate"] = json.load(
                open(f"{curate_out}/RESULT.json"))
            result["stages"]["curate"]["wall_s"] = round(
                time.time() - t0, 2)

    spark = get_spark("pretrain", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(curated_path).filter(F.col("split") >= 0)

    # -- stage 1b: cross-split leakage QA --------------------------------------
    if args.leakage_check:
        from mahout_spark.operators.substring import contamination_spans

        k = args.leakage_check
        train_d = docs.filter(F.col("split") == 0)
        eval_d = docs.filter(F.col("split") > 0)
        spans = contamination_spans(train_d, eval_d, idc, tc, tc,
                                    k=k).persist()
        agg = spans.agg(F.countDistinct(idc).alias("d"),
                        F.count(F.lit(1)).alias("s"),
                        F.sum("n_units").alias("u")).collect()[0]
        leak = {"k": k,
                "train_docs_overlapping_eval": int(agg["d"] or 0),
                "spans": int(agg["s"] or 0),
                "tokens_covered": int(agg["u"] or 0)}
        if args.leakage_drop:
            before = train_d.count()
            # localCheckpoint materializes the flagged ids so the
            # anti-join below never recomputes the gram join after
            # spans is unpersisted
            flagged = spans.select(idc).distinct() \
                .localCheckpoint(eager=True)
            docs = (docs.filter(F.col("split") > 0)
                    .unionByName(train_d.join(flagged, idc,
                                              "left_anti")))
            leak["train_docs_before"] = before
            leak["train_docs_after"] = before - leak[
                "train_docs_overlapping_eval"]
        spans.unpersist()
        result["stages"]["leakage"] = leak

    # -- stage 2: tokenizer (train split only) ---------------------------------
    t0 = time.time()
    merges_path = f"{args.output}/tokenizer/merges"
    vocab_path = f"{args.output}/tokenizer/vocab"
    enc = None
    if args.resume and os.path.exists(f"{merges_path}/_SUCCESS") \
            and os.path.exists(f"{vocab_path}/_SUCCESS"):
        model = BPEModel.load(spark, merges_path)
        vrows = spark.read.parquet(vocab_path).orderBy("token_id") \
            .collect()
        vocab = [r["token"] for r in vrows[:-1]]  # last row is <unk>
        unk_id = len(vocab)
        result["resumed"].append("tokenizer")
    else:
        train_docs = docs.filter(F.col("split") == 0)
        model = bpe_train(train_docs, tc, n_merges=args.merges,
                          min_count=args.min_count,
                          max_words=args.max_words)
        model.save(merges_path)
        enc = bpe_encode_pandas(docs, idc, tc, model.merges) \
            .join(docs.select(idc, "split"), idc).persist()
        vocab = build_vocab(enc.filter(F.col("split") == 0), "tokens")
        unk_id = len(vocab)
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(vocab)] + [(unk_id, "<unk>")],
            "token_id int, token string").coalesce(1) \
            .write.mode("overwrite").parquet(vocab_path)
    result["stages"]["tokenizer"] = {
        "n_merges": len(model.merges), "vocab_size": unk_id + 1,
        "wall_s": round(time.time() - t0, 2)}

    # fully-resumed fast path: when the prior run's every packed split is
    # intact (and the tokenizer was reusable), the corpus encode — the
    # dominant compute — is skipped outright; stats come from the prior
    # manifest and the packed parquet itself
    prior_stages = (prior_result or {}).get("stages", {})
    name_to_split = {v: k for k, v in SPLIT_NAMES.items()}
    prior_splits = [name_to_split.get(n) for n in
                    prior_stages.get("pack", {}) if n != "wall_s"]
    # memoized verification: each split is read-and-hashed at most once
    # per run even though both the fast path and the per-split loop ask
    intact_memo: dict = {}

    def split_intact(sp_path: str) -> tuple[bool, list | None]:
        if sp_path not in intact_memo:
            intact_memo[sp_path] = _split_intact(spark, sp_path)
        return intact_memo[sp_path]

    def resumed_stats(sp_path: str, man: list | None) -> dict:
        """Stats for a verified split; legacy (manifest-less) layouts
        get their manifest backfilled here so the NEXT resume verifies
        them too."""
        if man is None:
            from mahout_spark.operators.packing import shard_manifest

            man = [r.asDict() for r in shard_manifest(
                spark.read.parquet(sp_path), "seq_id", "tokens")
                .collect()]
            with open(f"{sp_path}/_MANIFEST.json", "w") as f:
                json.dump(man, f)
            intact_memo[sp_path] = (True, man)
        return _manifest_stats(man)

    if (args.resume and "tokenizer" in result["resumed"]
            and prior_stages.get("encode") and prior_splits
            and None not in prior_splits
            and all(split_intact(f"{args.output}/packed/split={s}")[0]
                    for s in prior_splits)):
        result["stages"]["encode"] = prior_stages["encode"]
        result["resumed"].append("encode")
        packs = {}
        for s in sorted(prior_splits):
            name = SPLIT_NAMES.get(s, str(s))
            sp_path = f"{args.output}/packed/split={s}"
            result["resumed"].append(f"pack/{name}")
            packs[name] = resumed_stats(sp_path, split_intact(sp_path)[1])
        if args.mix and prior_stages.get("mix"):
            result["stages"]["mix"] = prior_stages["mix"]
        result["stages"]["pack"] = packs
        result["block_size"] = args.block_size
        result["wall_s"] = round(time.time() - t_all, 2)
        print(json.dumps(result))
        with open(f"{args.output}/RESULT.json", "w") as f:
            json.dump(result, f)
        _commit_stamp()
        spark.stop()
        return

    # -- stages 3-5 per split: encode -> ids -> pack -> shards -----------------
    t0 = time.time()
    if enc is None:
        enc = bpe_encode_pandas(docs, idc, tc, model.merges) \
            .join(docs.select(idc, "split"), idc).persist()
    ids = tokens_to_ids_pandas(enc, idc, "tokens", vocab, unk_id=unk_id) \
        .join(enc.select(idc, "split"), idc).persist()
    tok_stats = {int(r["split"]): (int(r["docs"]), int(r["toks"]))
                 for r in ids.groupBy("split")
                 .agg(F.count(F.lit(1)).alias("docs"),
                      F.sum(F.size("token_ids")).alias("toks")).collect()}
    enc.unpersist()
    result["stages"]["encode"] = {
        SPLIT_NAMES.get(s, str(s)): {"docs": d, "tokens": n}
        for s, (d, n) in sorted(tok_stats.items())}
    result["stages"]["encode"]["wall_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    parts = {s: (ids.filter(F.col("split") == s), idc) for s in tok_stats}
    if args.mix and 0 in tok_stats:
        from jobs.curate import _parse_rates
        from mahout_spark.functions.mixing import (apply_mixture,
                                                   mixture_plan)

        shares = _parse_rates(args.mix)
        train_part = (ids.filter(F.col("split") == 0)
                      .join(docs.select(idc, args.lang_col), idc)
                      .withColumn("__w", F.size("token_ids")))
        plan = mixture_plan(train_part, args.lang_col, "__w", shares,
                            max_epochs=args.mix_epochs)
        plan_rows = plan.orderBy("stratum").collect()
        mixed = (apply_mixture(train_part, args.lang_col, idc, plan,
                               seed=args.seed + 7)
                 .withColumn("__pack_id",
                             F.concat(F.col(idc).cast("string"),
                                      F.lit("#"),
                                      F.col("copy").cast("string"))))
        parts[0] = (mixed, "__pack_id")
        agg = mixed.agg(F.count(F.lit(1)).alias("d"),
                        F.sum(F.size("token_ids")).alias("t")).collect()[0]
        tok_stats[0] = (int(agg["d"]), int(agg["t"] or 0))
        result["stages"]["mix"] = {
            "plan": [{k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in r.asDict().items()} for r in plan_rows],
            "train_rows": tok_stats[0][0],
            "train_tokens": tok_stats[0][1]}
    train_toks = tok_stats.get(0, (0, 1))[1] or 1
    packs = {}
    for s, (n_docs, n_toks) in sorted(tok_stats.items()):
        name = SPLIT_NAMES.get(s, str(s))
        sp_path = f"{args.output}/packed/split={s}"
        intact, man = (split_intact(sp_path) if args.resume
                       else (False, None))
        if intact:
            result["resumed"].append(f"pack/{name}")
            packs[name] = resumed_stats(sp_path, man)
        else:
            part, pack_key = parts[s]
            packed = pack_sequences(part, pack_key, "token_ids",
                                    args.block_size, drop_last=(s == 0),
                                    seed=args.seed + s)
            # token-proportional share of the train shard count, clamped
            # to [1, n_shards] (no train split -> train_toks falls back
            # to 1 and the ratio explodes without the cap)
            n_shards = args.n_shards if s == 0 else min(
                args.n_shards, max(
                    1, round(args.n_shards * n_toks / train_toks)))
            write_shards(packed, "seq_id", sp_path, n_shards,
                         weight_col="n_tokens", seed=args.seed + s)
            man = [r.asDict() for r in shard_manifest(
                spark.read.parquet(sp_path), "seq_id", "tokens")
                .collect()]
            with open(f"{sp_path}/_MANIFEST.json", "w") as f:
                json.dump(man, f)
            packs[name] = _manifest_stats(man)
    ids.unpersist()
    result["stages"]["pack"] = dict(packs)
    result["stages"]["pack"]["wall_s"] = round(time.time() - t0, 2)

    result["block_size"] = args.block_size
    result["wall_s"] = round(time.time() - t_all, 2)
    print(json.dumps(result))
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/RESULT.json", "w") as f:
        json.dump(result, f)
    _commit_stamp()
    spark.stop()


if __name__ == "__main__":
    main()
