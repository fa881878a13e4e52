"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: distributed parity-CMS build over document
tokens + point-frequency estimates (the north star's core query).

``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §2 and the training-data-pipeline extensions. Every oracle-
checked query is engineered for engine-exact floats (integral aggregates,
bounded IEEE expression arithmetic, deterministic tiebreaks); sketch
queries whose hash families are not SQL-expressible (splitmix64) have no
oracle and get the driver's rows-only check — their error bounds are
asserted in pytest instead. The parity-CMS queries DO have SQL oracles:
DuckDB recomputes the mathematical sketch definition under the same affine
hash family, so the correctness gate verifies the entire distributed
build + merge numerically.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# CMS geometry shared by Spark queries and DuckDB oracles
CMS_DEPTH, CMS_WIDTH, CMS_SEED = 4, 509, 12345
MINHASH_PERM, MINHASH_SEED, MINHASH_BANDS = 16, 1, 4
TOPK = 10
# parity-HLL register bits; parity-Bloom geometry; quantile rank-error bound
HLL_P = 7
BLOOM_HEAD, BLOOM_CAP, BLOOM_FP, BLOOM_SEED = 1000, 2000, 0.001, 2
QEPS = 0.03
# recommend_cms parity-CMS profile geometry
RCMS_DEPTH, RCMS_WIDTH, RCMS_SEED = 5, 1024, 7
# Count-Sketch geometry (odd depth: exact-element median) + DP noise params
CSK_DEPTH, CSK_WIDTH, CSK_SEED = 5, 509, 4242
DP_EPS_TOTAL, DP_SEED = 2.0, 99
# driver testdata embeddings dimension (fixed across SFs) + LSH geometry
EMB_DIM, LSH_BANDS, LSH_BAND_PLANES, LSH_SEED = 64, 4, 4, 11


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _order_part_triples(spark, sf_dir) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.select(F.col("l_orderkey").alias("row_id"),
                     F.col("l_partkey").alias("col_id"),
                     F.col("l_quantity").alias("value"))


def _doc_tokens(spark, sf_dir) -> DataFrame:
    from mahout_spark.functions.text import explode_tokens

    docs = _read(spark, sf_dir, "documents")
    return explode_tokens(docs.select("doc_id", "lang", "text"),
                          "doc_id", "text").join(
        _read(spark, sf_dir, "documents").select("doc_id", "lang"), "doc_id")


TOKSRC_SQL = None  # set lazily (needs tokens_array_sql)


def _toksrc_sql() -> str:
    from mahout_spark.functions.text import tokens_array_sql

    return (f"SELECT doc_id, lang, unnest({tokens_array_sql('text')}) AS token "
            f"FROM documents")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: distributed parity-CMS build over document

    tokens, point-frequency estimates for the 25 head tokens."""
    return _q_cms_point_frequency(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# sketch queries
# ---------------------------------------------------------------------------


def _q_cms_point_frequency(spark, sf_dir) -> DataFrame:
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import cms_point_lookup

    toks = _doc_tokens(spark, sf_dir)
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    sk = sketch_by_key(toks.withColumn("__g", F.lit(0)), ["__g"], spec,
                       key_expr=md5_long60(F.col("token")),
                       n_salt=4).drop("__g")
    probe = (toks.groupBy("token").count()
             .orderBy(F.desc("count"), "token").limit(25).select("token"))
    return cms_point_lookup(sk, probe, md5_long60(F.col("token")))


def _q_cms_point_merged(spark, sf_dir) -> DataFrame:
    """Same point estimates as cms_point_frequency, but the global sketch

    is the associative MERGE of per-lang sketches (merge_sketch_rows) —
    the DuckDB oracle recomputes global bucket sums directly, so a
    hash-match verifies distributed build + cross-group merge
    numerically end-to-end (the mergeability contract in the gate)."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import (cms_spec_shape, merge_sketch_rows,
                                         sketch_by_key)
    from mahout_spark.sketch.queries import cms_point_lookup

    toks = _doc_tokens(spark, sf_dir)
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    per_lang = sketch_by_key(toks, ["lang"], spec,
                             key_expr=md5_long60(F.col("token")), n_salt=4)
    merged = merge_sketch_rows(per_lang, spec)
    probe = (toks.groupBy("token").count()
             .orderBy(F.desc("count"), "token").limit(25).select("token"))
    return cms_point_lookup(merged, probe, md5_long60(F.col("token")))


def _q_checkpoint_resume(spark, sf_dir) -> DataFrame:
    """North-rule resumability, gate-verified end-to-end: an 8-shard CMS

    build over (lang, token) is preempted after 3 shards (run #1 returns
    None, leaving only lineage + partials on disk), a FRESH job object
    resumes from the lineage table, computes only the 5 missing shards,
    and the cross-shard + cross-lang merged sketch answers the same 25
    probe lookups as a never-killed build. The DuckDB oracle rebuilds the
    CMS from scratch, so a hash match proves the kill/resume cycle is
    numerically invisible (integer-weight float sums are order-
    independent). Reference anchor: the reference's only memoization is
    CountMinSketchConfig's ser/ files (CountMinSketchConfig.java:74-113);
    plans/checkpoint.py is the distributed generalization the north rule
    asks for ("every partition emits lineage + counter metrics to a
    checkpoint table so jobs resume mid-scan")."""
    import shutil
    import tempfile

    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.plans.checkpoint import CheckpointedSketchJob
    from mahout_spark.sketch.agg import (cms_spec_shape, merge_sketch_rows,
                                         sketch_by_key)
    from mahout_spark.sketch.queries import cms_point_lookup

    toks = _doc_tokens(spark, sf_dir)
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    root = tempfile.mkdtemp(prefix="mahout_ckpt_gate_")
    try:
        job1 = CheckpointedSketchJob(spark, root, "gate", n_shards=8)
        first = job1.run(toks, ["lang"], spec,
                         key_expr=md5_long60(F.col("token")),
                         shard_key="doc_id", max_shards=3)
        if first is not None:
            raise AssertionError("expected mid-scan preemption")
        job2 = CheckpointedSketchJob(spark, root, "gate", n_shards=8)
        per_lang = job2.run(toks, ["lang"], spec,
                            key_expr=md5_long60(F.col("token")),
                            shard_key="doc_id")
        if len(job2.shards_computed) != 8 - 3:
            raise AssertionError(
                f"resume recomputed {job2.shards_computed} — expected "
                f"exactly the 5 missing shards")
        merged = merge_sketch_rows(per_lang, spec)
        probe = (toks.groupBy("token").count()
                 .orderBy(F.desc("count"), "token").limit(25)
                 .select("token"))
        out = cms_point_lookup(merged, probe, md5_long60(F.col("token")))
        # materialize before the checkpoint dir is removed
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _q_cms_cosine_lang(spark, sf_dir) -> DataFrame:
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import cms_pairwise

    toks = _doc_tokens(spark, sf_dir)
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    sk = sketch_by_key(toks, ["lang"], spec,
                       key_expr=md5_long60(F.col("token")))
    return cms_pairwise(sk, "lang", kind="cosine")


def _q_cms_inner_lang(spark, sf_dir) -> DataFrame:
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import cms_pairwise

    toks = _doc_tokens(spark, sf_dir)
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    sk = sketch_by_key(toks, ["lang"], spec,
                       key_expr=md5_long60(F.col("token")))
    return cms_pairwise(sk, "lang", kind="inner")


def _q_countsketch_point_frequency(spark, sf_dir) -> DataFrame:
    """Count-Sketch (signed/AMS) point estimates — UNBIASED, two-sided

    |err| <= eps*||a||_2, vs the CMS's one-sided overestimate
    (core/countsketch.py). Per-lang parity sketches merged associatively,
    so a hash-match verifies distributed build + merge + the signed
    median-over-rows estimator end-to-end. Odd depth -> the median is an
    exact element, integral counters -> hash-exact."""
    from mahout_spark.core.countsketch import CountSketch
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import (countsketch_spec_shape,
                                         merge_sketch_rows, sketch_by_key)
    from mahout_spark.sketch.queries import cms_point_lookup

    toks = _doc_tokens(spark, sf_dir)
    spec = countsketch_spec_shape(CSK_DEPTH, CSK_WIDTH, CSK_SEED,
                                  family="parity")
    per_lang = sketch_by_key(toks, ["lang"], spec,
                             key_expr=md5_long60(F.col("token")), n_salt=4)
    merged = merge_sketch_rows(per_lang, spec)
    probe = (toks.groupBy("token").count()
             .orderBy(F.desc("count"), "token").limit(25).select("token"))
    return cms_point_lookup(merged, probe, md5_long60(F.col("token")),
                            out_col="cs_estimate",
                            deserializer=CountSketch.deserialize)


def _q_countsketch_inner_lang(spark, sf_dir) -> DataFrame:
    """Unbiased Count-Sketch inner products between per-lang token

    vectors (median over depth rows of the signed row dot) — the
    estimator whose expectation is the TRUE <a, b>, unlike cms_inner_lang
    which is biased up by collision mass."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import countsketch_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import countsketch_pairwise

    toks = _doc_tokens(spark, sf_dir)
    spec = countsketch_spec_shape(CSK_DEPTH, CSK_WIDTH, CSK_SEED,
                                  family="parity")
    sk = sketch_by_key(toks, ["lang"], spec,
                       key_expr=md5_long60(F.col("token")))
    return countsketch_pairwise(sk, "lang")


def _dp_thresholds() -> list[int]:
    """Noise CDF thresholds for the DP gates: per-cell eps =

    DP_EPS_TOTAL / depth (basic composition across the depth rows an
    item touches), computed once and injected as literals into BOTH
    engines (core/privacy.py)."""
    from mahout_spark.core.privacy import geometric_thresholds

    return geometric_thresholds(DP_EPS_TOTAL / CMS_DEPTH)


def _q_cms_point_noised(spark, sf_dir) -> DataFrame:
    """North-rule "privacy-noised CMS": the merged global sketch is

    released with deterministic two-sided-geometric (discrete Laplace)
    noise on every counter — eps_total-DP for unit-weight streams — and
    the head tokens are estimated against the NOISED counters. The
    DuckDB oracle replays the noise exactly (integer noise from literal
    CDF thresholds + the cross-engine md5 uniform), so the gate verifies
    build + merge + noise + query end-to-end."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import (cms_spec_shape, merge_sketch_rows,
                                         sketch_by_key)
    from mahout_spark.sketch.queries import (cms_point_lookup,
                                             noised_sketch_rows)

    toks = _doc_tokens(spark, sf_dir)
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    per_lang = sketch_by_key(toks, ["lang"], spec,
                             key_expr=md5_long60(F.col("token")), n_salt=4)
    noised = noised_sketch_rows(merge_sketch_rows(per_lang, spec), [],
                                _dp_thresholds(), DP_SEED)
    probe = (toks.groupBy("token").count()
             .orderBy(F.desc("count"), "token").limit(25).select("token"))
    return cms_point_lookup(noised, probe, md5_long60(F.col("token")))


def _q_cms_inner_noised_lang(spark, sf_dir) -> DataFrame:
    """North-rule "privacy-noised CMS inner products": per-lang sketches

    each released with independent per-release noise (tag = lang), then
    pairwise inner products over the noised counters."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import (cms_pairwise,
                                             noised_sketch_rows)

    toks = _doc_tokens(spark, sf_dir)
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    sk = sketch_by_key(toks, ["lang"], spec,
                       key_expr=md5_long60(F.col("token")))
    noised = noised_sketch_rows(sk, ["lang"], _dp_thresholds(), DP_SEED)
    return cms_pairwise(noised, "lang", kind="inner",
                        out_col="cms_inner_noised")


def _q_token_drift_topk(spark, sf_dir) -> DataFrame:
    """Corpus drift via sketch LINEARITY: cs(en) - cs(de) is the

    Count-Sketch of the per-token frequency DELTA, so its point
    estimates are unbiased signed drift estimates (the deltoids /
    change-detection use-case) — top-20 tokens by |estimated change|,
    ties broken lexicographically. The oracle rebuilds both groups'
    signed counters and replays the difference, medians, and ranking."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import countsketch_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import countsketch_drift_topk

    toks = _doc_tokens(spark, sf_dir)
    spec = countsketch_spec_shape(CSK_DEPTH, CSK_WIDTH, CSK_SEED,
                                  family="parity")
    sk = sketch_by_key(toks.filter(F.col("lang").isin("en", "de")),
                       ["lang"], spec,
                       key_expr=md5_long60(F.col("token")))
    probe = toks.select("token").distinct()
    return countsketch_drift_topk(sk, "lang", "en", "de", probe,
                                  md5_long60(F.col("token")), k=20)


def _q_join_size_estimate(spark, sf_dir) -> DataFrame:
    """Sketch-based join-size estimation (plans/joinsize.py): the

    unbiased Count-Sketch inner product estimates the equi-join output
    cardinality between the English and non-English token streams from
    two independent scans — no join executed. The row carries the
    estimate, per-side F2, the a-posteriori AMS error radius, the exact
    size (frequency-table inner product), and the bound check; the
    DuckDB oracle replays all six values hash-exact."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.plans.joinsize import (exact_join_size,
                                             join_size_estimate)

    toks = _doc_tokens(spark, sf_dir)
    a = toks.filter(F.col("lang") == "en").select("token")
    b = toks.filter(F.col("lang") != "en").select("token")
    est = join_size_estimate(
        a, "token", b, "token", depth=CSK_DEPTH, width=CSK_WIDTH,
        seed=CSK_SEED, family="parity",
        key_expr_a=md5_long60(F.col("token")),
        key_expr_b=md5_long60(F.col("token")))
    true = exact_join_size(a, "token", b, "token")
    return est.crossJoin(F.broadcast(true)).select(
        "join_size_est", "f2_a", "f2_b", "err_bound", "true_size",
        (F.abs(F.col("join_size_est") - F.col("true_size").cast("double"))
         <= F.col("err_bound")).cast("int").alias("within_bound"))


def _q_corpus_language_stats(spark, sf_dir) -> DataFrame:
    """The corpusstats report's per-language table (functions/corpus.py,

    jobs/corpusstats.py): volume, token/char totals, exact interpolated
    length percentiles, exact-dup count, Gopher-gate pass count — one
    pass, two aggregations."""
    from mahout_spark.functions.corpus import per_language_stats

    docs = _read(spark, sf_dir, "documents")
    return per_language_stats(docs, "text", "lang", gopher=True)


def _q_hll_distinct_tokens(spark, sf_dir) -> DataFrame:
    """Parity-HLL (md5-60-bit hash domain, dense registers) so the DuckDB

    oracle replays the estimate bit-for-bit — the production path is the
    splitmix64 family (hll_spec defaults), same machinery."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import hll_spec, sketch_by_key
    from mahout_spark.sketch.queries import sketch_eval

    toks = _doc_tokens(spark, sf_dir)
    spec = hll_spec(p=HLL_P, seed=1, sparse_limit=0, parity=True)
    sk = sketch_by_key(toks, ["lang"], spec,
                       key_expr=md5_long60(F.col("token")))
    return (sketch_eval(sk, spec, "count", "distinct_est")
            .select("lang", F.round("distinct_est", 2).alias("distinct_est")))


def _q_hll_rollup_distinct(spark, sf_dir) -> DataFrame:
    """Distinct-count CUBE gate: per-(lang, source) parity-HLL sketches

    rolled up with sketch_rollup to every ROLLUP(lang, source) level —
    (lang, source), (lang, *), (*, *) — by register merges over the tiny
    sketch table alone. Distinct counts do NOT add across groups (shared
    tokens), so the only scale-sane distinct cube is the mergeable-
    sketch one; the DuckDB oracle rebuilds each level's HLL DIRECTLY
    from the token stream, so a hash match proves fine-build + rollup
    merge == direct build at every level, bit-for-bit. Reference anchor:
    numNonZeroElementsPerColumn's HLL swap (operators/drm.py:277) — this
    generalizes it to the data-cube shape."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import hll_spec, sketch_by_key, sketch_rollup
    from mahout_spark.sketch.queries import sketch_eval

    toks = _doc_tokens(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    src = toks.join(docs, "doc_id")
    spec = hll_spec(p=HLL_P, seed=1, sparse_limit=0, parity=True)
    fine = sketch_by_key(src, ["lang", "source"], spec,
                         key_expr=md5_long60(F.col("token")))
    cube = sketch_rollup(fine, spec, ["lang", "source"])
    return (sketch_eval(cube, spec, "count", "distinct_est")
            .select("lang", "source",
                    F.round("distinct_est", 2).alias("distinct_est")))


def _q_tdigest_price_quantiles(spark, sf_dir) -> DataFrame:
    """t-digest quantiles gate-checked against exact rank windows: output

    is (group, q, lo_val, hi_val, within) where [lo_val, hi_val] is the
    SQL-exact value window at ranks (q ± QEPS)·n and ``within`` asserts
    the sketch estimate landed inside its published rank-error bound."""
    from mahout_spark.sketch.agg import sketch_by_key, tdigest_spec
    from mahout_spark.sketch.queries import quantile_bound_check

    li = _read(spark, sf_dir, "lineitem")
    spec = tdigest_spec(100.0)
    sk = sketch_by_key(li, ["l_returnflag"], spec,
                       value_col="l_extendedprice")
    return quantile_bound_check(sk, spec, li, ["l_returnflag"],
                                "l_extendedprice", [0.25, 0.5, 0.75],
                                eps=QEPS)


def _q_kll_event_quantiles(spark, sf_dir) -> DataFrame:
    from mahout_spark.sketch.agg import kll_spec, sketch_by_key
    from mahout_spark.sketch.queries import quantile_bound_check

    ev = _read(spark, sf_dir, "events")
    spec = kll_spec(200, seed=5)
    sk = sketch_by_key(ev, ["event_type"], spec, value_col="value")
    return quantile_bound_check(sk, spec, ev, ["event_type"], "value",
                                [0.1, 0.5, 0.9], eps=QEPS)


def _q_windowed_tdigest_events(spark, sf_dir) -> DataFrame:
    """Event-time daily windows × event_type → t-digest median of value —

    the batch shape of streaming/windowed.py's stateful operator, gate-
    checked against exact rank windows (see _q_tdigest_price_quantiles)."""
    from mahout_spark.sketch.agg import sketch_by_key, tdigest_spec
    from mahout_spark.sketch.queries import quantile_bound_check

    ev = _read(spark, sf_dir, "events")
    spec = tdigest_spec(100.0)
    w = ev.withColumn("w_start",
                      F.window(F.col("ts"), "1 day").getField("start"))
    sk = sketch_by_key(w, ["w_start", "event_type"], spec, value_col="value")
    return quantile_bound_check(sk, spec, w, ["w_start", "event_type"],
                                "value", [0.5], eps=QEPS)


def _q_windowed_cms_events(spark, sf_dir) -> DataFrame:
    """Event-time daily windows -> one parity CMS per window over the

    event_type stream; point estimates for every (window, event_type)
    pair. The batch shape of streaming/windowed.py's stateful operator
    (pytest pins streaming build == this batch build byte-exact); the
    DuckDB oracle replays every windowed counter."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import cms_point_lookup

    ev = _read(spark, sf_dir, "events")
    w = ev.withColumn("w_start",
                      F.window(F.col("ts"), "1 day").getField("start"))
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    sk = sketch_by_key(w, ["w_start"], spec,
                       key_expr=md5_long60(F.col("event_type")))
    probe = w.select("w_start", "event_type").distinct()
    return cms_point_lookup(sk, probe, md5_long60(F.col("event_type")),
                            join_cols=["w_start"])


def _q_cms_rollup_weekly(spark, sf_dir) -> DataFrame:
    """TIME-rollup gate (the lambda-architecture downsampling move):

    the per-DAY windowed CMS table — the exact output shape
    windowed_cms_events gates — rolls up to per-WEEK sketches by blob
    merge alone, so historical fine-grained sketch tables answer
    coarser time grains without replaying the event stream. The DuckDB
    oracle builds the weekly sketches directly from events, proving
    daily-build + cross-day merge == direct weekly build (integer
    counter addition, order-independent). Probes: every (week,
    event_type) pair."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import (cms_spec_shape, merge_sketch_rows,
                                         sketch_by_key)
    from mahout_spark.sketch.queries import cms_point_lookup

    ev = _read(spark, sf_dir, "events")
    w = ev.withColumn("w_start",
                      F.window(F.col("ts"), "1 day").getField("start"))
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    daily = sketch_by_key(w, ["w_start"], spec,
                          key_expr=md5_long60(F.col("event_type")))
    weekly = merge_sketch_rows(
        daily.withColumn("week", F.date_trunc("week", F.col("w_start"))),
        spec, group_cols=["week"])
    probe = (ev.select(F.date_trunc("week", F.col("ts")).alias("week"),
                       "event_type").distinct())
    return cms_point_lookup(weekly, probe, md5_long60(F.col("event_type")),
                            join_cols=["week"])


ROLLUP_HEAD = 5  # probe tokens per coarse group in the rollup gate


def _q_cms_rollup_lang(spark, sf_dir) -> DataFrame:
    """Sketch ROLLUP gate: fine-grained (lang, source) parity-CMS sketches

    are merged to per-lang sketches with merge_sketch_rows(group_cols=
    ["lang"]) — answering a coarser grouping WITHOUT rescanning the
    corpus, the mergeability dividend that makes a sketch table a
    reusable data cube at 100 TB (build once at the finest grain, roll
    up to any coarser grain by blob addition). The DuckDB oracle builds
    the per-lang sketches DIRECTLY from the token stream, so a hash
    match proves fine-build + cross-source merge == direct coarse build
    numerically (integer-weight sums are order-independent). Probes: the
    top-ROLLUP_HEAD tokens per lang by exact count (integer ranks →
    deterministic). Reference anchor: CountMinSketch.java's merge-by-
    cell-addition contract (core/cms.py:124 mirrors it)."""
    from pyspark.sql import Window

    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import (cms_spec_shape, merge_sketch_rows,
                                         sketch_by_key)
    from mahout_spark.sketch.queries import cms_point_lookup

    toks = _doc_tokens(spark, sf_dir)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    fine_src = toks.join(docs, "doc_id")
    spec = cms_spec_shape(CMS_DEPTH, CMS_WIDTH, CMS_SEED, parity=True)
    fine = sketch_by_key(fine_src, ["lang", "source"], spec,
                         key_expr=md5_long60(F.col("token")))
    rolled = merge_sketch_rows(fine, spec, group_cols=["lang"])
    w = Window.partitionBy("lang").orderBy(F.desc("count"), "token")
    probe = (toks.groupBy("lang", "token").count()
             .withColumn("__r", F.row_number().over(w))
             .filter(F.col("__r") <= ROLLUP_HEAD)
             .select("lang", "token"))
    return cms_point_lookup(rolled, probe, md5_long60(F.col("token")),
                            join_cols=["lang"])


def _q_bloom_token_filter(spark, sf_dir) -> DataFrame:
    """BloomTokenFilter analog: keep only tokens in the head-1000 allowlist

    (built as a parity-Bloom sketch so the DuckDB oracle replays the bit
    set and every membership decision), count survivors per lang."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import bloom_spec, sketch_global
    from mahout_spark.sketch.queries import bloom_contains_lookup

    toks = _doc_tokens(spark, sf_dir).persist()
    head = (toks.groupBy("token").count()
            .orderBy(F.desc("count"), "token").limit(BLOOM_HEAD)
            .select("token"))
    blob = sketch_global(head, bloom_spec(capacity=BLOOM_CAP,
                                          fp_rate=BLOOM_FP, seed=BLOOM_SEED,
                                          parity=True),
                         key_expr=md5_long60(F.col("token")))
    sk = spark.createDataFrame([(bytearray(blob),)], "sketch binary")
    filtered = bloom_contains_lookup(sk, toks, md5_long60(F.col("token")))
    return (filtered.filter(F.col("maybe_contains"))
            .groupBy("lang").agg(F.count("*").alias("n_kept")))


# ---------------------------------------------------------------------------
# cooccurrence / similarity / recommender
# ---------------------------------------------------------------------------


def _q_cooccurrence_topk(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.cooccurrence import cooccurrence_counts
    from mahout_spark.operators.topk import topk_per_group

    inter = _order_part_triples(spark, sf_dir).select(
        "row_id", "col_id").distinct()
    cooc = cooccurrence_counts(inter)
    return topk_per_group(cooc, ["item_a"], "n_ab", TOPK,
                          tiebreak_cols=["item_b"])


def _q_llr_item_similarity(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.cooccurrence import llr_item_similarity

    triples = _order_part_triples(spark, sf_dir)
    out = llr_item_similarity(triples, k=TOPK, downsample=False)
    # rank on raw llr, emit 6dp-rounded (ln ulp differs across engines)
    return out.withColumn("llr", F.round("llr", 6))


def _q_rowsim_tanimoto(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.rowsim import row_similarity

    return row_similarity(_order_part_triples(spark, sf_dir),
                          measure="tanimoto", k=TOPK)


def _q_rowsim_cosine(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.rowsim import row_similarity

    return row_similarity(_order_part_triples(spark, sf_dir),
                          measure="cosine", k=TOPK)


def _q_rowsim_pearson(spark, sf_dir) -> DataFrame:
    """Pearson row similarity — hash-exact because the plan centers with

    the scaled form w = n*x - S (integer-exact on l_quantity), making
    Pearson a plain cosine over w (see PearsonMeasure)."""
    from mahout_spark.operators.rowsim import row_similarity

    return row_similarity(_order_part_triples(spark, sf_dir),
                          measure="pearson", k=TOPK)


def _q_rowsim_euclidean(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.rowsim import row_similarity

    return row_similarity(_order_part_triples(spark, sf_dir),
                          measure="euclidean", k=TOPK)


def _q_rowsim_cityblock(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.rowsim import row_similarity

    return row_similarity(_order_part_triples(spark, sf_dir),
                          measure="cityblock", k=TOPK)


def _q_cross_similarity_llr(spark, sf_dir) -> DataFrame:
    """A'B cross-occurrence: parts vs suppliers sharing orders (the

    purchase-vs-view shape of ItemSimilarityDriver's two inputs)."""
    from mahout_spark.operators.cooccurrence import llr_cross_similarity

    li = _read(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("row_id"),
                  F.col("l_partkey").alias("col_id"))
    b = li.select(F.col("l_orderkey").alias("row_id"),
                  F.col("l_suppkey").alias("col_id"))
    out = llr_cross_similarity(a, b, k=TOPK, max_interactions=10 ** 9)
    return out.withColumn("llr", F.round("llr", 6))


def _q_ata_gramian(spark, sf_dir) -> DataFrame:
    """A'A Gramian in long form over the order×part quantity matrix."""
    from mahout_spark.operators.drm import ata

    li = _read(spark, sf_dir, "lineitem")
    triples = (li.groupBy(F.col("l_orderkey").alias("row_id"),
                          F.col("l_partkey").alias("col_id"))
               .agg(F.sum("l_quantity").alias("value")))
    g = ata(triples)
    return g.select(F.col("row_id").alias("part_a"),
                    F.col("col_id").alias("part_b"),
                    F.col("value").alias("gram"))


def _q_dcol_mean_cov(spark, sf_dir) -> DataFrame:
    """Distributed column covariance (dcolMeanCov, drm/package.scala:259)

    of the order×linenumber quantity matrix — exact dense COV(X) =
    (A'A)/n − μμ' in long form, SQL-replayable."""
    from mahout_spark.operators.drm import dcol_mean_cov

    li = _read(spark, sf_dir, "lineitem")
    triples = (li.groupBy(F.col("l_orderkey").alias("row_id"),
                          (F.col("l_linenumber") - 1).alias("col_id"))
               .agg(F.sum("l_quantity").alias("value")))
    nrow = triples.select("row_id").distinct().count()
    _, cov = dcol_mean_cov(triples, nrow)
    return cov.select(F.col("row_id").alias("col_i"),
                      F.col("col_id").alias("col_j"),
                      F.round(F.col("value"), 9).alias("cov"))


def _q_feature_hashing(spark, sf_dir) -> DataFrame:
    """Hash-trick vectors with the SQL-replayable md5 bucket (the

    EncodedVectors operator; production path uses xxhash64)."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.functions.text import explode_tokens

    docs = _read(spark, sf_dir, "documents")
    toks = explode_tokens(docs, "doc_id", "text")
    return (toks.withColumn("bucket", F.pmod(md5_long60(F.col("token")),
                                             F.lit(256)))
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").alias("weight")))


def _q_recommend_cooc(spark, sf_dir) -> DataFrame:
    """User-based recommend with cooccurrence-count similarity (integer

    weights → engine-exact weighted averages)."""
    from mahout_spark.operators.recommender import (nearest_n_neighborhood,
                                                    recommend)

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").alias("pref")))
    a = prefs.select(F.col("item_id").alias("__i"),
                     F.col("user_id").alias("user_a"))
    b = prefs.select(F.col("item_id").alias("__i"),
                     F.col("user_id").alias("user_b"))
    sims = (a.join(b, "__i").filter(F.col("user_a") != F.col("user_b"))
            .groupBy("user_a", "user_b")
            .agg(F.count("*").cast("double").alias("sim")))
    nb = nearest_n_neighborhood(sims, 10)
    return recommend(prefs, nb, top_n=5, min_evidence=2)


def _q_recommend_boolean(spark, sf_dir) -> DataFrame:
    """GenericBooleanPrefUserBasedRecommender: estimates are plain
    similarity SUMS over neighbors who have the item (integer
    cooccurrence sims → exact)."""
    from mahout_spark.operators.recommender import (nearest_n_neighborhood,
                                                    recommend)

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").alias("pref")))
    a = prefs.select(F.col("item_id").alias("__i"),
                     F.col("user_id").alias("user_a"))
    b = prefs.select(F.col("item_id").alias("__i"),
                     F.col("user_id").alias("user_b"))
    sims = (a.join(b, "__i").filter(F.col("user_a") != F.col("user_b"))
            .groupBy("user_a", "user_b")
            .agg(F.count("*").cast("double").alias("sim")))
    nb = nearest_n_neighborhood(sims, 10)
    return recommend(prefs, nb, top_n=5, boolean_pref=True)


def _q_user_similarity_tanimoto(spark, sf_dir) -> DataFrame:
    """Taste TanimotoCoefficientSimilarity over item sets — integer-exact

    (|X∩Y| / |X∪Y|), so the oracle verifies the full pairwise plan."""
    from mahout_spark.operators.recommender import exact_user_similarity
    from mahout_spark.operators.topk import topk_per_group

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .filter(F.col("o_custkey") < 300)
             .select(F.col("o_custkey").alias("user_id"),
                     F.col("l_partkey").alias("item_id"))
             .distinct().withColumn("pref", F.lit(1.0)))
    sims = exact_user_similarity(prefs, measure="tanimoto")
    return topk_per_group(sims, ["user_a"], "sim", TOPK,
                          tiebreak_cols=["user_b"])


def _q_user_similarity_spearman(spark, sf_dir) -> DataFrame:
    """Taste SpearmanCorrelationSimilarity: per-pair ranks over common

    items (deterministic (pref, item) order), 1 − 6Σd²/(n(n²−1)). Ranks
    are integers, so d² sums are exact and the single division is
    bit-reproducible; n ≤ 1 pairs (NaN in the reference) are dropped so
    the gate compares finite values only."""
    from mahout_spark.operators.recommender import exact_user_similarity

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .filter(F.col("o_custkey") < 150)
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").alias("pref")))
    sims = exact_user_similarity(prefs, measure="spearman")
    return sims.filter(F.col("n") >= 2).select(
        "user_a", "user_b", "sim", "n")


def _q_abt_product(spark, sf_dir) -> DataFrame:
    """OpABt gate (blas/ABt.scala semantics, drm.abt): A·Bᵗ over

    integer-valued matrices — products and sums stay exact, so the full
    join+groupBy matrix multiply is hash-verifiable."""
    from mahout_spark.operators.drm import abt

    li = _read(spark, sf_dir, "lineitem")
    a = (li.filter(F.col("l_orderkey") < 2000)
         .groupBy(F.col("l_orderkey").alias("row_id"),
                  F.col("l_linenumber").cast("long").alias("col_id"))
         .agg(F.sum("l_quantity").alias("value")))
    b = (li.groupBy((F.col("l_partkey") % 50).alias("row_id"),
                    F.col("l_linenumber").cast("long").alias("col_id"))
         .agg(F.sum("l_quantity").alias("value")))
    return abt(a, b)


ANON_PREFS = [(1, 10.0), (2, 5.0), (3, 8.0), (5, 2.0)]


def _q_dsq_dist(spark, sf_dir) -> DataFrame:
    """dsqDist gate: pairwise squared row distances via the sparse

    Gramian (|xi|² + |xj|² − 2·xi·xj) over an integer-valued matrix —
    every term exact, absent Gramian pairs coalesce to 0."""
    from mahout_spark.operators.drm import dsq_dist

    li = _read(spark, sf_dir, "lineitem")
    a = (li.filter(F.col("l_orderkey") < 300)
         .groupBy(F.col("l_orderkey").alias("row_id"),
                  F.col("l_linenumber").cast("long").alias("col_id"))
         .agg(F.sum("l_quantity").alias("value")))
    return dsq_dist(a)


def _q_drm_colstats(spark, sf_dir) -> DataFrame:
    """colSums / colMeans / nnzPerColumn / dcolMeanVars gate over the

    lineitem triple matrix (integer sums → exact means; variance
    rounded at the final projection only)."""
    from mahout_spark.operators.drm import (col_mean_vars, col_sums,
                                            nnz_per_column)

    li = _read(spark, sf_dir, "lineitem")
    a = (li.groupBy(F.col("l_orderkey").alias("row_id"),
                    F.col("l_linenumber").cast("long").alias("col_id"))
         .agg(F.sum("l_quantity").alias("value")))
    nrow = a.select("row_id").distinct().count()
    sums = col_sums(a).select("col_id", F.col("value").alias("sum"))
    nnz = nnz_per_column(a).select("col_id", F.col("value").alias("nnz"))
    mv = col_mean_vars(a, nrow)
    return (sums.join(nnz, "col_id").join(mv, "col_id")
            .select("col_id", "sum", "nnz", F.round("mean", 6).alias("mean"),
                    F.round("var", 6).alias("var")))


def _q_recommend_anonymous(spark, sf_dir) -> DataFrame:
    """PlusAnonymousUserDataModel gate: cold-start top-N for a user not

    in the model, cooccurrence similarity (integer counts → the
    similarity-weighted average is exact)."""
    from mahout_spark.operators.recommender import recommend_anonymous

    prefs = _gate_prefs(spark, sf_dir)
    return recommend_anonymous(prefs, ANON_PREFS, top_n=25,
                               n_neighbors=20, min_evidence=2,
                               measure="cooccurrence")


def _q_projection_search(spark, sf_dir) -> DataFrame:
    """ProjectionSearch gate (math/neighborhood/ProjectionSearch.java):

    4 deterministic unit projections, ±20 ball per projection via the
    banded window join, exact euclidean re-rank. Integer window ranks +
    bit-identical dot folds (list_dot_product == zip_with/aggregate)
    make the full ANN pipeline hash-exact."""
    from mahout_spark.operators.ann import projection_search_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = projection_search_topk(emb, q, k=10, n_projections=4,
                                 search_size=20, seed=23, dim=64)
    return out.select("query_id", "neighbor_id",
                      F.round("distance", 6).alias("distance"))


def _q_rating_sgd_recommend(spark, sf_dir) -> DataFrame:
    """RatingSGDFactorizer → svd_recommend. NO DuckDB oracle: iterative

    SGD trajectories are not ANSI-SQL-replayable, so the driver records
    the weaker rows-only check; bit-level correctness is covered by
    pytest (single-shard == in-core trainer exactly, determinism under
    repartition — tests/test_ratingsgd.py)."""
    from mahout_spark.operators.ratingsgd import rating_sgd_factorize
    from mahout_spark.operators.svdrec import svd_recommend

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .filter(F.col("o_custkey") < 100)
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").cast("double").alias("pref")))
    uf, vf = rating_sgd_factorize(prefs, num_features=6, num_iterations=3,
                                  n_shards=4)
    return svd_recommend(uf, vf, prefs, top_n=3).select(
        "user_id", "item_id", F.round("score", 6).alias("score"))


def _q_implicit_als_recommend(spark, sf_dir) -> DataFrame:
    """Implicit-feedback ALS (Hu/Koren/Volinsky; math/.../als/
    ImplicitFeedbackAlternatingLeastSquaresSolver.java:60-170) over
    order-count interactions → top-3 per user. NO DuckDB oracle:
    per-entity k x k solves against the confidence-weighted Gramian are
    not ANSI-SQL-replayable, so the driver records the rows-only check;
    value correctness is pytest-proven against an in-core replay of the
    reference formulas (tests/test_implicit_als.py)."""
    from mahout_spark.operators.svdrec import (implicit_als_factorize,
                                               svd_recommend)

    o = _read(spark, sf_dir, "orders")
    # implicit strength = interaction count per (customer-bucket,
    # clerk-ish item bucket) — small dense-ish grid, deterministic
    inter = (o.groupBy((F.col("o_custkey") % 120).alias("user_id"),
                       (F.col("o_orderkey") % 60).alias("item_id"))
             .agg(F.count("*").cast("double").alias("pref"))
             .filter(F.col("pref") > 2.0))
    uf, vf = implicit_als_factorize(inter, k=4, lambda_=0.1, alpha=5.0,
                                    iterations=3)
    return svd_recommend(uf, vf, inter, top_n=3).select(
        "user_id", "item_id", F.round("score", 6).alias("score"))


def _q_recommend_itembased(spark, sf_dir) -> DataFrame:
    """GenericItemBasedRecommender with cooccurrence-count item similarity

    (integer weights → engine-exact weighted averages)."""
    from mahout_spark.operators.cooccurrence import cooccurrence_counts
    from mahout_spark.operators.recommender import recommend_item_based

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .filter(F.col("o_custkey") < 200)
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").alias("pref")))
    inter = prefs.select(F.col("user_id").alias("row_id"),
                         F.col("item_id").alias("col_id")).distinct()
    sims = cooccurrence_counts(inter).select(
        "item_a", "item_b", F.col("n_ab").cast("double").alias("sim"))
    return recommend_item_based(prefs, sims, top_n=5, min_evidence=2)


# ---------------------------------------------------------------------------
# text / vectorization
# ---------------------------------------------------------------------------


def _q_recommend_cms(spark, sf_dir) -> DataFrame:
    """The fork's flagship end-to-end: per-user CMS profiles → CMS-cosine

    user similarity → top-N recommendations whose preference estimates
    are CMS point queries. Parity hash family → the DuckDB oracle replays
    the ENTIRE pipeline (profile build, cosine neighborhoods, CMS point
    estimates, weighted averages) numerically."""
    from mahout_spark.operators.recommender import (cms_user_similarity,
                                                    recommend_cms,
                                                    user_cms_profiles)

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .filter(F.col("o_custkey") < 100)
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").alias("pref")))
    profiles = user_cms_profiles(prefs, depth=RCMS_DEPTH, width=RCMS_WIDTH,
                                 seed=RCMS_SEED, parity=True)
    # top-N neighborhoods straight from the blocked tile kernel — no
    # all-pairs crossJoin, no per-pair deserialization
    nb = cms_user_similarity(profiles, top_n=10)
    out = recommend_cms(prefs, profiles, nb, top_n=5, min_evidence=2,
                        cap_range=(0.0, 200.0))
    return out.withColumn("score", F.round("score", 6))


def _q_kmeans_assign(spark, sf_dir) -> DataFrame:
    """k-means Catalyst assignment gate: every embedding assigned to its

    nearest of 8 deterministic centroids (the embeddings of the 8
    smallest vec_ids — SQL-derivable, so the oracle recomputes the same
    centers). The Lloyd iteration loop itself is pytest-oracled against
    a NumPy trajectory replay (tests/test_clustering.py)."""
    import numpy as np

    from mahout_spark.operators.clustering import KMeansModel

    emb = _read(spark, sf_dir, "embeddings")
    rows = (emb.filter(F.col("vec_id") < 8).orderBy("vec_id")
            .select(F.col("embedding").cast("array<double>")).collect())
    centers = np.array([r[0] for r in rows], dtype=np.float64)
    out = KMeansModel(centers, 0, True, 0.0).assign(emb)
    return out.select("vec_id", "cluster",
                      F.round("dist2", 6).alias("dist2"))


def _q_fuzzy_memberships(spark, sf_dir) -> DataFrame:
    """Fuzzy k-means soft-membership gate (FuzzyKMeansClusterer

    computeProbWeight at m=2): every embedding gets a probability for
    each of 8 deterministic centroids (the embeddings of the 8 smallest
    vec_ids — SQL-derivable, so the oracle recomputes the same centers
    and the same w_j = max(d_j, 1e-10)^-2 chain). The fuzzy Lloyd loop
    itself is pytest-oracled against a NumPy trajectory replay
    (tests/test_clustering.py)."""
    import numpy as np

    from mahout_spark.operators.clustering import FuzzyKMeansModel

    emb = _read(spark, sf_dir, "embeddings")
    rows = (emb.filter(F.col("vec_id") < 8).orderBy("vec_id")
            .select(F.col("embedding").cast("array<double>")).collect())
    centers = np.array([r[0] for r in rows], dtype=np.float64)
    out = FuzzyKMeansModel(centers, 2.0, 0, True).memberships(emb)
    return out.select("vec_id", "cluster",
                      F.round("prob", 6).alias("prob"))


def _q_recommend_svd(spark, sf_dir) -> DataFrame:
    """SVDRecommender wiring gate: factor-dot-product scoring, known-item

    exclusion, per-user top-N with deterministic tie-break — hash-exact
    because the gate's factors are closed-form integral features
    (sum(pref), n) rather than ALS output (whose float iterations aren't
    SQL-replayable; alswr_factorize itself is pytest-oracled against the
    in-core ridge solves, tests/test_svdrec.py)."""
    from mahout_spark.operators.svdrec import svd_recommend

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .filter(F.col("o_custkey") < 100)
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").cast("double").alias("pref")))
    uf = (prefs.groupBy(F.col("user_id").alias("row_id"))
          .agg(F.sum("pref").alias("f0"),
               F.count("*").cast("double").alias("f1")))
    vf = (prefs.groupBy(F.col("item_id").alias("row_id"))
          .agg(F.sum("pref").alias("f0"),
               F.count("*").cast("double").alias("f1")))
    expand = [F.explode(F.array(
        F.struct(F.lit(0).alias("col_id"), F.col("f0").alias("value")),
        F.struct(F.lit(1).alias("col_id"), F.col("f1").alias("value"))))
        .alias("__f")]
    uft = uf.select("row_id", *expand).select("row_id", "__f.col_id",
                                              "__f.value")
    vft = vf.select("row_id", *expand).select("row_id", "__f.col_id",
                                              "__f.value")
    out = svd_recommend(uft, vft, prefs, top_n=5)
    return out.select("user_id", "item_id",
                      F.round("score", 6).alias("score"))


def _q_factorization_rmse(spark, sf_dir) -> DataFrame:
    """FactorizationEvaluator gate (cf/taste/hadoop/als/
    FactorizationEvaluator.java): split rating triples into train/probe
    with a DuckDB-replayable md5 coin (DatasetSplitter.java semantics,
    deterministic instead of Random), fit closed-form integral factors
    on train, and score the probe through the REAL
    evaluate_factorization operator — rmse/mae/counts land as one row.
    Integral prefs + integral factor dots make every error exact in
    float64, so the aggregate is hash-exact after round(6)."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.operators.svdrec import evaluate_factorization

    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    prefs = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
             .filter(F.col("o_custkey") < 150)
             .groupBy(F.col("o_custkey").alias("user_id"),
                      F.col("l_partkey").alias("item_id"))
             .agg(F.sum("l_quantity").cast("double").alias("pref")))
    coin = F.pmod(md5_long60(F.concat_ws(
        "|", F.col("user_id"), F.col("item_id"))), F.lit(5))
    train = prefs.filter(coin != 0)
    probe = prefs.filter(coin == 0)
    expand = [F.explode(F.array(
        F.struct(F.lit(0).alias("col_id"), F.col("f0").alias("value")),
        F.struct(F.lit(1).alias("col_id"), F.col("f1").alias("value"))))
        .alias("__f")]
    uf = (train.groupBy(F.col("user_id").alias("row_id"))
          .agg(F.sum("pref").alias("f0"),
               F.count("*").cast("double").alias("f1"))
          .select("row_id", *expand)
          .select("row_id", "__f.col_id", "__f.value"))
    vf = (train.groupBy(F.col("item_id").alias("row_id"))
          .agg(F.sum("pref").alias("f0"),
               F.count("*").cast("double").alias("f1"))
          .select("row_id", *expand)
          .select("row_id", "__f.col_id", "__f.value"))
    res = evaluate_factorization(uf, vf, probe)
    return spark.createDataFrame(
        [(int(res["n_probe"]), int(res["n_scored"]),
          round(res["mae"], 6), round(res["rmse"], 6))],
        "n_probe long, n_scored long, mae double, rmse double")


def _q_vecdist_euclidean(spark, sf_dir) -> DataFrame:
    """VectorDistanceSimilarityJob gate (math/hadoop/similarity/
    VectorDistanceSimilarityJob.java): broadcast seed set x all vectors,
    euclidean distance per pair — the jobs/vecdist.py plan verbatim
    (seed side broadcast, all math in JVM expressions)."""
    emb = _read(spark, sf_dir, "embeddings")
    seeds = (emb.filter(F.col("vec_id") < 5)
             .select(F.col("vec_id").alias("seed_id"),
                     F.col("embedding").cast("array<double>").alias("s")))
    pts = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
    diff2 = F.aggregate(
        F.zip_with("v", "s", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (pts.crossJoin(F.broadcast(seeds))
            .select("seed_id", "vec_id",
                    F.round(F.sqrt(diff2), 6).alias("distance")))


def _q_doc_token_stats(spark, sf_dir) -> DataFrame:
    from mahout_spark.functions.text import (bpe_token_count,
                                             content_fingerprint, detect_lang,
                                             quality_score, token_count,
                                             tokens_array)

    docs = _read(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).cast("long").alias("n_tokens"),
        bpe_token_count(t).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(tokens_array(t))).cast("long")
        .alias("n_distinct"),
        detect_lang(t).alias("lang_detected"),
        quality_score(t).alias("quality"),
        content_fingerprint(t).alias("fingerprint"))


def _q_tfidf(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.vectorize import tfidf

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return tfidf(docs, variant="mahout")


def _q_bigram_collocations(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.vectorize import bigram_collocations

    docs = _read(spark, sf_dir, "documents")
    return bigram_collocations(docs, min_llr=1.0, min_count=3)


def _nb_doc_triples(spark, sf_dir) -> DataFrame:
    """(doc_id, label=lang, term, weight=tf) from the documents table."""
    from mahout_spark.operators.naivebayes import nb_text_triples

    docs = _read(spark, sf_dir, "documents")
    return nb_text_triples(docs, label_col="lang")


def _q_nb_model_standard(spark, sf_dir) -> DataFrame:
    """Standard NB log weights per (label, term) — NaiveBayes.train +

    StandardNBClassifier.computeWeight, trained on lang-labeled TF counts.
    """
    from mahout_spark.operators.naivebayes import nb_aggregate, nb_train

    model = nb_train(nb_aggregate(_nb_doc_triples(spark, sf_dir)),
                     complementary=False)
    a, v = model.alpha, float(model.n_features)
    lw = spark.createDataFrame(
        [(l, model.label_weight(l)) for l in model.labels], ["label", "w_l"])
    return (model.pairs.join(F.broadcast(lw), "label")
            .select("label", "term",
                    F.round(F.log((F.col("weight") + a)
                                  / (F.col("w_l") + a * v)), 6)
                    .alias("log_weight")))


def _q_nb_classify_standard(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.naivebayes import (nb_aggregate, nb_predict,
                                                   nb_train)

    triples = _nb_doc_triples(spark, sf_dir)
    model = nb_train(nb_aggregate(triples), complementary=False)
    preds = nb_predict(model, triples.select("doc_id", "term", "weight"))
    return preds.select("doc_id", "predicted",
                        F.round("score", 6).alias("score"))


def _q_nb_classify_complementary(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.naivebayes import (nb_aggregate, nb_predict,
                                                   nb_train)

    triples = _nb_doc_triples(spark, sf_dir)
    model = nb_train(nb_aggregate(triples), complementary=True)
    preds = nb_predict(model, triples.select("doc_id", "term", "weight"))
    return preds.select("doc_id", "predicted",
                        F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# dedup / ANN
# ---------------------------------------------------------------------------


def _q_exact_dedup(spark, sf_dir) -> DataFrame:
    """Exact dedup over the corpus SEEDED with known duplicates (every

    37th doc re-inserted under doc_id + 10^9) so the gate row is
    non-vacuous at every SF — the oracle applies the identical seeding."""
    from mahout_spark.operators.dedup import exact_dedup_groups

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    dup = (docs.filter(F.col("doc_id") % 37 == 0)
           .select((F.col("doc_id") + F.lit(10 ** 9)).alias("doc_id"),
                   "text"))
    return exact_dedup_groups(docs.unionByName(dup), "doc_id", "text")


def _q_minhash_signatures(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.dedup import minhash_signatures

    return minhash_signatures(_read(spark, sf_dir, "documents"),
                              "doc_id", "text", num_perm=MINHASH_PERM,
                              seed=MINHASH_SEED)


def _q_simhash(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.dedup import simhash

    return simhash(_read(spark, sf_dir, "documents"), "doc_id", "text")


def _q_ngram_jaccard(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(spark, sf_dir, "documents"),
                               "doc_id", "text", threshold=0.2)


def _q_minhash_lsh_pairs(spark, sf_dir) -> DataFrame:
    """Banded LSH candidates scored by signature agreement — the full

    minhash dedup path (8 bands x 2 rows so the sf0.01 corpus yields
    candidates; bucket cap disabled so the oracle is exact)."""
    from mahout_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_read(spark, sf_dir, "documents"),
                               "doc_id", "text", num_perm=MINHASH_PERM,
                               bands=8, seed=MINHASH_SEED,
                               threshold=0.125, max_bucket=10 ** 9,
                               family="parity")


def _q_streaming_minhash(spark, sf_dir) -> DataFrame:
    """Streaming incremental MinHash-LSH gate — the documents table

    replayed as a TWO-micro-batch availableNow stream through
    applyInPandasWithState bucket state (streaming/dedup.py); the
    DuckDB twin rebuilds the per-(band, pair) emissions from the
    parity-family signatures. The first stateful-streaming gate beyond
    the windowed sketches."""
    import glob
    import os
    import shutil
    import tempfile

    from mahout_spark.streaming.dedup import streaming_minhash_pairs

    docs = (_read(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 300).select("doc_id", "text"))
    tmp = tempfile.mkdtemp(prefix="gate_smh_")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(tmp, "c0"))
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(tmp, "c1"))
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    for i, f in enumerate(sorted(glob.glob(
            os.path.join(tmp, "c*", "part-*.parquet")))):
        shutil.copy(f, os.path.join(src, f"{i:02d}.parquet"))
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    pairs = streaming_minhash_pairs(stream, num_perm=MINHASH_PERM,
                                    bands=8, seed=MINHASH_SEED,
                                    max_bucket=10 ** 9, family="parity")
    qname = "gate_streaming_minhash"
    q = (pairs.writeStream.format("memory").queryName(qname)
         .outputMode("update")
         .option("checkpointLocation", os.path.join(tmp, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    # the state layer canonicalizes pairs as STRINGS (generic id type);
    # re-normalize numerically for the oracle's id_a < id_b convention
    a = F.col("id_a").cast("long")
    b = F.col("id_b").cast("long")
    return (spark.table(qname)
            .select("band", F.least(a, b).alias("id_a"),
                    F.greatest(a, b).alias("id_b"),
                    F.round("est_jaccard", 6).alias("est_jaccard")))


def _q_ann_topk(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.ann import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return brute_force_topk(emb, queries, k=TOPK)


def _q_embedding_neardup(spark, sf_dir) -> DataFrame:
    from mahout_spark.operators.ann import cosine_expr

    emb = _read(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("__va"))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("__vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (pairs.select("id_a", "id_b",
                         cosine_expr(F.col("__va"), F.col("__vb"))
                         .alias("cos"))
            .filter(F.col("cos") >= 0.3))


def _q_embedding_neardup_lsh(spark, sf_dir) -> DataFrame:
    """Production near-dup shape: banded sign-LSH candidates → exact

    cosine verify (the all-pairs embedding_neardup stays as the recall
    oracle; this is the plan that survives 10^12 rows)."""
    from mahout_spark.operators.dedup import embedding_neardup_lsh

    return embedding_neardup_lsh(_read(spark, sf_dir, "embeddings"),
                                 "vec_id", "embedding", threshold=0.3,
                                 n_bands=LSH_BANDS,
                                 band_planes=LSH_BAND_PLANES, seed=LSH_SEED,
                                 dim=EMB_DIM)


def _q_ols_fit(spark, sf_dir) -> DataFrame:
    """Samsara OLS gate: per-order integral design from lineitem

    (x1 = line count, x2 = total quantity, y = sum(linenumber*quantity),
    intercept) — every Gramian cell is an exact integer sum, so beta /
    se / t are deterministic to ~1e-12 and round(6) is engine-exact.
    The DuckDB twin solves the same 3x3 normal equations via Cramer's
    rule. (OrdinaryLeastSquaresModel.scala:55-66 fit semantics;
    LinearRegressorModel.scala:60-90 standard errors.)"""
    from mahout_spark.operators.regression import ols_fit

    li = _read(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").cast("double").alias("x1"),
        F.sum("l_quantity").cast("double").alias("x2"),
        F.sum(F.col("l_linenumber") * F.col("l_quantity"))
        .cast("double").alias("y"))
    model = ols_fit(per_order, ["x1", "x2"], "y")
    rows = [(name, float(b), float(s), float(t))
            for name, b, s, t in zip(model.coef_names, model.beta,
                                     model.se, model.t_score)]
    out = spark.createDataFrame(
        rows, "coef string, beta double, se double, t_score double")
    return out.select("coef", F.round("beta", 6).alias("beta"),
                      F.round("se", 6).alias("se"),
                      F.round("t_score", 6).alias("t_score"))


OLS_FIT_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         count(*)::DOUBLE AS x1,
         sum(l_quantity)::DOUBLE AS x2,
         sum(l_linenumber * l_quantity)::DOUBLE AS y
  FROM lineitem GROUP BY l_orderkey),
s AS (SELECT count(*)::DOUBLE AS n,
             sum(x1) AS s1, sum(x2) AS s2,
             sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12,
             sum(y) AS t0, sum(x1*y) AS t1, sum(x2*y) AS t2,
             sum(y*y) AS tt
      FROM per_order),
m AS (SELECT *,
   s11*(s22*n - s2*s2) - s12*(s12*n - s2*s1) + s1*(s12*s2 - s22*s1) AS det
   FROM s),
b AS (SELECT *,
   (t1*(s22*n - s2*s2) - s12*(t2*n - s2*t0) + s1*(t2*s2 - s22*t0))
     / det AS b1,
   (s11*(t2*n - t0*s2) - t1*(s12*n - s2*s1) + s1*(s12*t0 - t2*s1))
     / det AS b2,
   (s11*(s22*t0 - t2*s2) - s12*(s12*t0 - t2*s1) + t1*(s12*s2 - s22*s1))
     / det AS b0
   FROM m),
r AS (SELECT *,
   tt - 2*(b1*t1 + b2*t2 + b0*t0)
      + (b1*b1*s11 + b2*b2*s22 + b0*b0*n
         + 2*b1*b2*s12 + 2*b1*b0*s1 + 2*b2*b0*s2) AS rss
   FROM b),
se AS (SELECT *,
   sqrt(rss/(n-3) * (s22*n - s2*s2)/det) AS se1,
   sqrt(rss/(n-3) * (s11*n - s1*s1)/det) AS se2,
   sqrt(rss/(n-3) * (s11*s22 - s12*s12)/det) AS se0
   FROM r)
SELECT 'x1' AS coef, round(b1, 6) AS beta, round(se1, 6) AS se,
       round(b1/se1, 6) AS t_score FROM se
UNION ALL
SELECT 'x2', round(b2, 6), round(se2, 6), round(b2/se2, 6) FROM se
UNION ALL
SELECT '(Intercept)', round(b0, 6), round(se0, 6), round(b0/se0, 6) FROM se
"""


LDA_V, LDA_K = 50, 4
LDA_CORPUS_SQL = (f"SELECT l_orderkey AS doc_id, l_partkey % {LDA_V} AS "
                  "term_id, sum(l_quantity)::DOUBLE AS cnt "
                  "FROM lineitem GROUP BY 1, 2")


def _q_lda_cvb0_gamma(spark, sf_dir) -> DataFrame:
    """LDA CVB0 gate: one trainDocTopicModel pass at uniform docTopics

    over an integral (doc, term, cnt) corpus derived from lineitem and
    the arithmetic init model — gamma is a closed-form scalar expression
    chain that DuckDB replays bit-for-bit (cvb0_doc_gamma docstring).
    The multi-iteration trajectory + perplexity decrease are pytest
    (tests/test_lda.py). (TopicModel.java:284-304 semantics.)"""
    from mahout_spark.operators.lda import (arithmetic_init_model,
                                            cvb0_doc_gamma)

    li = _read(spark, sf_dir, "lineitem")
    corpus = (li.groupBy(
        F.col("l_orderkey").alias("doc_id"),
        (F.col("l_partkey") % LDA_V).alias("term_id"))
        .agg(F.sum("l_quantity").cast("double").alias("cnt")))
    model = arithmetic_init_model(spark, LDA_V, LDA_K)
    # integral topic sums: exact integer-valued doubles
    agg = model.select(*[F.sum(F.col("topics")[x]).alias(f"s{x}")
                         for x in range(LDA_K)]).first()
    sums = [float(agg[f"s{x}"]) for x in range(LDA_K)]
    g = cvb0_doc_gamma(corpus, model, sums, LDA_K, num_terms=LDA_V)
    return g.select("doc_id", "term_id", "topic",
                    F.round("gamma", 6).alias("gamma"))


SGD_BETA = [[0.3, -0.2], [-0.1, 0.25]]  # (n_cat-1=2) x (F=2), n_cat = 3


def _q_sgd_classify(spark, sf_dir) -> DataFrame:
    """SGD logistic scoring gate: classifyFull as pure Catalyst column

    math at a FIXED beta over integral per-order features (x1 = line
    count, x2 = total quantity / 100) — softmax link with the implicit
    0th category, probabilities rounded 6dp; DuckDB twin replays the
    identical expression chain. Training (the sequential reference
    update rule + sharded parallel averaging) is pytest-verified
    step-for-step vs an in-core replay (tests/test_sgd.py).
    (AbstractOnlineLogisticRegression.java:86-121 link semantics.)"""
    import numpy as np

    from mahout_spark.operators.sgd import logistic_classify

    li = _read(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.count("*").cast("double").alias("x1"),
        (F.sum("l_quantity") / 100.0).cast("double").alias("x2"))
    feats = per_order.select("order_id",
                             F.array("x1", "x2").alias("features"))
    scored = logistic_classify(feats, np.array(SGD_BETA), full=True)
    return (scored.select("order_id",
                          F.posexplode("probs_full")
                          .alias("category", "prob"))
            .select("order_id", F.col("category").cast("int"),
                    F.round("prob", 6).alias("prob")))


# Fixed literal forest for the rf_classify gate: scoring-path gate only
# (training is pytest-verified; a trained forest isn't DuckDB-replayable).
RF_TREES = [
    {"attr": 0, "split": 4.0, "lo": {"leaf": 0.0},
     "hi": {"attr": 1, "split": 150.0, "lo": {"leaf": 1.0},
            "hi": {"leaf": 2.0}}},
    {"attr": 1, "split": 100.0, "lo": {"leaf": 0.0},
     "hi": {"attr": 0, "split": 5.0, "lo": {"leaf": 2.0},
            "hi": {"leaf": 1.0}}},
]
RF_SRC_SQL = ("SELECT l_orderkey AS order_id, count(*)::DOUBLE AS x1, "
              "sum(l_quantity)::DOUBLE AS x2 FROM lineitem GROUP BY 1")


def _q_rf_classify(spark, sf_dir) -> DataFrame:
    """Random forest gate: DecisionForest majority vote over trees

    compiled to Catalyst CASE WHEN expressions (the all-JVM scoring
    path) at a FIXED 2-tree forest over integral per-order features —
    comparisons and integer vote counts only, so DuckDB replays it
    exactly. Training (partition-local partial builder + bagging) is
    pytest-verified (tests/test_randomforest.py).
    (DecisionForest.java:70-120, DecisionTreeBuilder semantics.)"""
    from mahout_spark.operators.randomforest import (DecisionForest,
                                                     forest_predict_expr)

    li = _read(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.count("*").cast("double").alias("x1"),
        F.sum("l_quantity").cast("double").alias("x2"))
    forest = DecisionForest(RF_TREES, n_labels=3)
    return per_order.select(
        "order_id",
        forest_predict_expr(forest, F.array("x1", "x2"))
        .alias("prediction"))


def _q_rf_ig_split(spark, sf_dir) -> DataFrame:
    """Random forest split-math gate: the OptIgSplit information-gain

    prefix scan as a distributed plan — IG at every candidate split of
    l_quantity against a 3-class label, entropy in bits. Exercises the
    exact builder math (operators/randomforest.py:best_numeric_split)
    in an engine-checkable shape. (OptIgSplit.java:57-163.)"""
    from mahout_spark.operators.randomforest import ig_numeric_split_frame

    li = _read(spark, sf_dir, "lineitem")
    src = li.select(F.col("l_quantity").cast("double").alias("v"),
                    (F.col("l_linenumber") % 3).cast("int").alias("y"))
    return ig_numeric_split_frame(src, "v", "y", n_labels=3)


HMM_H, HMM_O = 3, 4
# (seq, linenumber) is NOT unique in the synthetic lineitem — the event
# order must be TOTAL or the lag pairs are engine-dependent; (linenumber,
# partkey, suppkey) is unique per order, packed into one bigint
HMM_T = ("(l_linenumber * 1099511627776 + l_partkey * 1048576 "
         "+ l_suppkey)")
HMM_EVENTS_SQL = (f"SELECT l_orderkey AS seq_id, {HMM_T} AS t, "
                  f"(l_partkey % {HMM_H})::INT AS hidden, "
                  f"(l_suppkey % {HMM_O})::INT AS obs FROM lineitem")


def _q_hmm_supervised(spark, sf_dir) -> DataFrame:
    """HMM gate: trainSupervisedSequence (pseudo-count + transition /

    emission / initial counting + row-normalize) over integral event
    sequences from lineitem — every probability is a ratio of exact
    integers (pseudo-count 1), so the (kind, i, j, p) model rows are
    engine-exact. Forward/backward/Viterbi/Baum-Welch are pytest-
    oracled by brute-force path enumeration (tests/test_hmm.py).
    (HmmTrainer.java:109-199 semantics.)"""
    from mahout_spark.operators.hmm import (hmm_model_rows,
                                            train_supervised_frame)

    li = _read(spark, sf_dir, "lineitem")
    events = li.select(
        F.col("l_orderkey").alias("seq_id"),
        (F.col("l_linenumber") * F.lit(1099511627776)
         + F.col("l_partkey") * F.lit(1048576)
         + F.col("l_suppkey")).alias("t"),
        (F.col("l_partkey") % HMM_H).cast("int").alias("hidden"),
        (F.col("l_suppkey") % HMM_O).cast("int").alias("obs"))
    model = train_supervised_frame(events, HMM_H, HMM_O,
                                   pseudo_count=1.0)
    return hmm_model_rows(model, spark)


FPM_MIN_SUPPORT, FPM_MAX_LEN = 200, 3
FPM_SRC_SQL = ("SELECT l_orderkey AS txn_id, "
               "'p' || (l_partkey % 25)::VARCHAR AS item FROM lineitem")


def _q_fp_growth(spark, sf_dir) -> DataFrame:
    """PFP frequent-itemset gate: full parallel FP-growth (counting

    pass -> group-dependent prefix shipping -> per-shard conditional-
    base mining) over order/part transactions; supports are exact
    integers, itemsets re-sorted lexicographically to match the
    brute-force self-join oracle. (Li et al. RecSys'08 / Mahout
    PFPGrowth semantics; miner pinned to brute-force subset counts in
    tests/test_fpm.py.)"""
    from mahout_spark.operators.fpm import parallel_fp_growth

    li = _read(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("txn_id"),
        F.concat(F.lit("p"), (F.col("l_partkey") % 25).cast("string"))
        .alias("item"))
    out = parallel_fp_growth(items, FPM_MIN_SUPPORT, max_len=FPM_MAX_LEN)
    return out.select(
        F.array_join(F.array_sort("itemset"), ",").alias("itemset"),
        "support")


def _q_dedup_groups(spark, sf_dir) -> DataFrame:
    """Duplicate-GROUP resolution gate: the minhash LSH pair set (same

    params as minhash_lsh_pairs) resolved into transitive groups with a
    min-id representative (dedup.py dedup_groups — min-label propagation
    + pointer doubling). The DuckDB oracle replays the closure with a
    recursive CTE over the identical pair SQL."""
    from mahout_spark.operators.dedup import (dedup_groups,
                                              minhash_dedup_pairs)

    pairs = minhash_dedup_pairs(_read(spark, sf_dir, "documents"),
                                "doc_id", "text", num_perm=MINHASH_PERM,
                                bands=8, seed=MINHASH_SEED,
                                threshold=0.125, max_bucket=10 ** 9,
                                family="parity")
    out = dedup_groups(pairs.select("id_a", "id_b"))
    return out.select("group_id", "member_id",
                      F.col("is_representative").cast("int")
                      .alias("is_representative"))


def _gate_prefs(spark, sf_dir) -> DataFrame:
    """(user_id, item_id, pref) — integer-valued sums, engine-exact."""
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy(F.col("o_custkey").alias("user_id"),
                     F.col("l_partkey").alias("item_id"))
            .agg(F.sum("l_quantity").cast("double").alias("pref")))


def _q_recommend_itemavg(spark, sf_dir) -> DataFrame:
    """ItemAverageRecommender gate (pure aggregation — hash-exact):

    estimate = item mean pref, top-5 unseen per user via the exact
    broadcast-top-M plan."""
    from mahout_spark.operators.recommender import item_average_recommend

    out = item_average_recommend(_gate_prefs(spark, sf_dir), top_n=5)
    return out.select("user_id", "item_id",
                      F.round("score", 6).alias("score"))


def _q_recommend_itemuseravg(spark, sf_dir) -> DataFrame:
    """ItemUserAverageRecommender gate: itemAvg + (userAvg - overallAvg);

    all three terms are exact-integer-sum divisions, so the shifted score
    is bit-reproducible."""
    from mahout_spark.operators.recommender import (
        item_user_average_recommend)

    out = item_user_average_recommend(_gate_prefs(spark, sf_dir), top_n=5)
    return out.select("user_id", "item_id",
                      F.round("score", 6).alias("score"))


def _q_ir_stats(spark, sf_dir) -> DataFrame:
    """GenericRecommenderIRStatsEvaluator gate: hold out every pref whose

    md5 coin lands in fold 0 (engine-replayable split), recommend top-5
    by item average from the train side, and emit the PER-USER IR frame
    (hits, n_rel, precision@5, recall@5). Hits counts and the two
    single-int-division ratios are bit-exact across engines; the macro
    average is a float fold and stays out of the gate (pytest covers
    it). Reference anchor:
    cf/taste/impl/eval/GenericRecommenderIRStatsEvaluator.java:85-170
    (per-user relevant set -> intersect with top-N -> precision/recall)."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.operators.recommender import (item_average_recommend,
                                                    ir_stats)

    prefs = _gate_prefs(spark, sf_dir)
    coin = F.pmod(md5_long60(F.concat_ws("|", "user_id", "item_id")),
                  F.lit(5))
    train = prefs.filter(coin != 0)
    relevant = prefs.filter(coin == 0).select("user_id", "item_id")
    recs = item_average_recommend(train, top_n=5)
    return ir_stats(recs, relevant, n=5, per_user=True)


IR_STATS_SQL_TEMPLATE = """
WITH prefs AS ({prefs}),
coined AS (SELECT u, i, p,
                  ({coin}) % 5 AS fold
           FROM prefs),
train AS (SELECT u, i, p FROM coined WHERE fold <> 0),
relevant AS (SELECT u, i FROM coined WHERE fold = 0),
avgs AS (SELECT i, avg(p) AS score FROM train GROUP BY i),
m AS (SELECT 5 + max(cnt) AS m
      FROM (SELECT count(*) AS cnt FROM train GROUP BY u)),
top_items AS (SELECT i, score FROM (
    SELECT i, score, row_number() OVER (ORDER BY score DESC, i) AS rn
    FROM avgs) WHERE rn <= (SELECT m FROM m)),
users AS (SELECT DISTINCT u FROM train),
cand AS (SELECT users.u, t.i, t.score FROM users CROSS JOIN top_items t
         WHERE NOT EXISTS (SELECT 1 FROM train p2
                           WHERE p2.u = users.u AND p2.i = t.i)),
recs AS (SELECT u, i FROM (SELECT u, i, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, i) AS rn FROM cand)
         WHERE rn <= 5),
rel_counts AS (SELECT u, count(*) AS n_rel FROM relevant GROUP BY u),
hits AS (SELECT r.u, count(rel.i) AS hits
         FROM recs r LEFT JOIN relevant rel
           ON rel.u = r.u AND rel.i = r.i
         GROUP BY r.u)
SELECT rc.u AS user_id,
       coalesce(h.hits, 0)::BIGINT AS hits,
       rc.n_rel::BIGINT AS n_rel,
       coalesce(h.hits, 0) / least(5, rc.n_rel) AS precision_at_n,
       coalesce(h.hits, 0) / rc.n_rel AS recall_at_n
FROM rel_counts rc LEFT JOIN hits h ON h.u = rc.u
"""


def _q_recommend_rescored(spark, sf_dir) -> DataFrame:
    """IDRescorer gate: user-based recommend (the recommend_cooc plan)

    with a rescorer that FILTERS items ≡ 0 (mod 7) and boosts items
    ≡ 0 (mod 3) by ×1.5 (exact in binary — the rescored score is the
    hash-exact base estimate times a power-of-two-scaled constant)."""
    from mahout_spark.operators.recommender import (IDRescorer,
                                                    nearest_n_neighborhood,
                                                    recommend)

    prefs = _gate_prefs(spark, sf_dir)
    a = prefs.select(F.col("item_id").alias("__i"),
                     F.col("user_id").alias("user_a"))
    b = prefs.select(F.col("item_id").alias("__i"),
                     F.col("user_id").alias("user_b"))
    sims = (a.join(b, "__i").filter(F.col("user_a") != F.col("user_b"))
            .groupBy("user_a", "user_b")
            .agg(F.count("*").cast("double").alias("sim")))
    nb = nearest_n_neighborhood(sims, 10)
    resc = IDRescorer(
        rescore=lambda i, s: F.when(i % 3 == 0, s * F.lit(1.5)).otherwise(s),
        is_filtered=lambda i: i % 7 == 0)
    return recommend(prefs, nb, top_n=5, min_evidence=2, rescorer=resc)


def _q_vecdist_chebyshev(spark, sf_dir) -> DataFrame:
    """DistanceMeasure-family gate: chebyshev (max |a_i-b_i|) through the

    pluggable registry (functions/distance.py), same broadcast-seeds plan
    as vecdist_euclidean."""
    from mahout_spark.functions.distance import DISTANCES

    emb = _read(spark, sf_dir, "embeddings")
    seeds = (emb.filter(F.col("vec_id") < 5)
             .select(F.col("vec_id").alias("seed_id"),
                     F.col("embedding").cast("array<double>").alias("s")))
    pts = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("v"))
    d = DISTANCES["chebyshev"](F.col("v"), F.col("s"))
    return (pts.crossJoin(F.broadcast(seeds))
            .select("seed_id", "vec_id",
                    F.round(d, 6).alias("distance")))


CLASSIFY_THRESHOLD = 0.13  # just above 1/8 so far points become outliers


def _q_cluster_classify(spark, sf_dir) -> DataFrame:
    """ClusterClassificationDriver gate: assign every embedding to the

    8 deterministic centroids (same SQL-derivable centers as
    kmeans_assign) with pdf = 1/(1+euclidean) normalized, outlier
    threshold on max normalized pdf; below-threshold points keep
    cluster = -1."""
    import numpy as np

    from mahout_spark.operators.clustering import cluster_classify

    emb = _read(spark, sf_dir, "embeddings")
    rows = (emb.filter(F.col("vec_id") < 8).orderBy("vec_id")
            .select(F.col("embedding").cast("array<double>")).collect())
    centers = np.array([r[0] for r in rows], dtype=np.float64)
    out = cluster_classify(emb, centers, threshold=CLASSIFY_THRESHOLD)
    return out.select("vec_id", "cluster",
                      F.round("weight", 6).alias("weight"),
                      F.col("is_outlier").cast("int").alias("is_outlier"))


def _q_auc_scores(spark, sf_dir) -> DataFrame:
    """Mann-Whitney AUC gate (Auc.java rank statistic, exact midranks):

    label = returnflag R, score = quantity (integer midrank arithmetic
    → hash-exact single division)."""
    from mahout_spark.operators.evaluation import auc

    li = _read(spark, sf_dir, "lineitem")
    scored = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("label"),
        F.col("l_quantity").cast("double").alias("score"))
    return auc(scored)


def _q_confusion_binary(spark, sf_dir) -> DataFrame:
    """Auc.java 2x2 confusion gate: predicted = score > 25 (strict)."""
    from mahout_spark.operators.evaluation import confusion_binary

    li = _read(spark, sf_dir, "lineitem")
    scored = li.select(
        (F.col("l_returnflag") == "R").cast("int").alias("label"),
        F.col("l_quantity").cast("double").alias("score"))
    return confusion_binary(scored, threshold=25.0)


EWA_ALPHA_US = 3_600_000_000.0  # 1 hour in microseconds


def _q_ewa_events(spark, sf_dir) -> DataFrame:
    """OnlineExponentialAverage gate: the sequential recurrence's closed

    form sum(x e^((t-T)/alpha))/sum(e^((t-T)/alpha)) per event_type —
    ONE grouped aggregation instead of an ordered accumulator; t in
    integer microseconds so (t-T) is exact in both engines."""
    from mahout_spark.operators.evaluation import exponential_average

    # ts is TIMESTAMP_NTZ in the parquet; the session tz is pinned UTC,
    # so casting to TIMESTAMP is identity and unix_micros matches
    # DuckDB's epoch_us on the naive value exactly
    ev = (_read(spark, sf_dir, "events")
          .select("event_type",
                  F.unix_micros(F.col("ts").cast("timestamp"))
                  .alias("t_us"),
                  F.col("value")))
    out = exponential_average(ev, "t_us", "value", EWA_ALPHA_US,
                              group_cols=["event_type"])
    return out.select("event_type", F.round("ewa_mean", 6).alias("ewa_mean"),
                      "n")


def _q_grouped_online_auc(spark, sf_dir) -> DataFrame:
    """GroupedOnlineAuc gate (math/.../stats/GroupedOnlineAuc.java): the
    SEQUENTIAL per-group online-AUC estimator (FIFO history-10 ring,
    running average) replayed per event_type via applyInPandas. The
    DuckDB oracle replays the same fold with a recursive CTE — the FIFO
    ring holds exactly the last min(n,10) scores as a multiset, so
    list_append + tail-slice reproduces it and every float op matches
    IEEE-for-IEEE (hash-exact, no rounding)."""
    from mahout_spark.operators.evaluation import grouped_online_auc

    ev = (_read(spark, sf_dir, "events")
          .filter(F.col("event_id") % 13 == 0)
          .select("event_type",
                  F.col("event_id").alias("o"),
                  (F.col("user_id") % 2).cast("int").alias("y"),
                  F.col("value").cast("double").alias("s")))
    return grouped_online_auc(ev, "event_type", "y", "s", "o")


def _heavy_hitters_oracle_sql() -> str:
    from mahout_spark.sketch.queries import heavy_hitters_oracle_sql

    return heavy_hitters_oracle_sql(
        "SELECT token FROM (" + _toksrc_sql() + ")", "token", 0.002)


def _skew_plan_oracle_sql() -> str:
    from mahout_spark.plans.skewplan import skew_plan_oracle_sql

    return skew_plan_oracle_sql(
        "SELECT token FROM (" + _toksrc_sql() + ")", "token", 150)


def _lm_perplexity_oracle_sql() -> str:
    from mahout_spark.functions.lm import lm_cross_entropy_sql

    inner = lm_cross_entropy_sql("documents", "doc_id", "text", n=2, k=0.5)
    return (f"SELECT id AS doc_id, n_ngrams, round(cross_entropy, 6) AS "
            f"cross_entropy FROM ({inner})")


def _q_pii_redaction(spark, sf_dir) -> DataFrame:
    """PII scrub gate (functions/webquality.py PII_RULES; no reference
    anchor — the standard pre-training curation stage the reference
    lacks, deployed via jobs/curate.py --scrub-pii): emails / card
    numbers / IPv4 / phones seeded deterministically into document text
    from doc_id arithmetic, then counted (sequential consumption
    semantics) and redacted with the pinned rule chain. Redacted
    strings and counts are hash-exact — the Spark side rewrites \\b to
    an explicit ASCII lookaround so Java regex and DuckDB's RE2 agree
    byte for byte."""
    from mahout_spark.functions.webquality import pii_counts, scrub_pii

    d = (_read(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 17 == 0)
         .select("doc_id", "lang", "text"))
    seeded = d.withColumn(
        "text",
        F.concat(F.col("text"),
                 F.lit(" contact u"), F.col("doc_id").cast("string"),
                 F.lit("@crawl-"), F.col("lang"), F.lit(".org"),
                 F.lit(" node 10."), (F.col("doc_id") % 256).cast("string"),
                 F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
                 F.lit(" tel +1 555-"),
                 (F.col("doc_id") % 900 + 100).cast("string"),
                 F.lit("-"), (F.col("doc_id") % 9000 + 1000).cast("string"),
                 F.lit(" ref 4111111111111"),
                 (F.col("doc_id") % 900 + 100).cast("string")))
    counts = pii_counts(F.col("text"))
    return seeded.select(
        "doc_id", *[v.alias(k) for k, v in counts.items()],
        scrub_pii(F.col("text")).alias("redacted"))


def _pii_redaction_oracle_sql() -> str:
    from mahout_spark.functions.webquality import (pii_counts_sql,
                                                   scrub_pii_sql)

    seeded = ("text || ' contact u' || CAST(doc_id AS VARCHAR) || "
              "'@crawl-' || lang || '.org' || "
              "' node 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
              "CAST(doc_id % 100 AS VARCHAR) || "
              "' tel +1 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || "
              "'-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || "
              "' ref 4111111111111' || CAST(doc_id % 900 + 100 AS VARCHAR)")
    counts = pii_counts_sql("t2")
    count_cols = ", ".join(f"{v} AS {k}" for k, v in counts.items())
    return f"""
WITH __pii_src AS (
  SELECT doc_id, {seeded} AS t2
  FROM documents WHERE doc_id % 17 = 0)
SELECT doc_id, {count_cols}, {scrub_pii_sql('t2')} AS redacted
FROM __pii_src
"""


def _q_cg_solve(spark, sf_dir) -> DataFrame:
    """Distributed conjugate-gradient gate (mr/.../solver/
    DistributedConjugateGradientSolver.java:42-76): solve A x = b where
    A = X'X + 1000 I is an SPD integer matrix derived from orders
    (X[i][j] = #orders with o_custkey%6==i, o_orderkey%6==j) and
    b[i] = 1 + #orders with o_orderkey%6==i. Every CG iteration is one
    REAL distributed matvec (per-row j-ordered F.aggregate fold —
    TimesMapper shape, no cross-row reduce); driver scalar updates use
    sequential folds, so the fixed 8-iteration schedule is
    bit-reproducible and the DuckDB oracle replays it with a recursive
    CTE over list columns — hash-exact with NO rounding, the first
    iterative linear solver in the gate battery."""
    import numpy as np

    from mahout_spark.operators.solver import cg_solve

    n, k = 6, 8
    od = _read(spark, sf_dir, "orders")
    cells = (od.groupBy((F.col("o_custkey") % n).cast("int").alias("i"),
                        (F.col("o_orderkey") % n).cast("int").alias("j"))
             .agg(F.count("*").alias("c")).collect())
    x_m = np.zeros((n, n), dtype=np.int64)
    for r in cells:
        x_m[r["i"], r["j"]] = r["c"]
    a = (x_m.T @ x_m + 1000 * np.eye(n, dtype=np.int64)).astype(np.float64)
    brows = (od.groupBy((F.col("o_orderkey") % n).cast("int").alias("i"))
             .agg(F.count("*").alias("c")).collect())
    b = np.ones(n, dtype=np.float64)
    for r in brows:
        b[r["i"]] += float(r["c"])
    triples = [(int(i), int(j), float(a[i, j]))
               for i in range(n) for j in range(n) if a[i, j] != 0.0]
    drm = spark.createDataFrame(triples,
                                "row_id long, col_id long, value double")
    x = cg_solve(drm, b, n, max_iterations=k, max_error=0.0,
                 seq_folds=True)
    return spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(x)], "i int, x double")


def _cg_solve_oracle_sql() -> str:
    n, k = 6, 8
    rng = f"range(1,{n + 1})"

    def dot(var, expr):
        return (f"list_reduce(list_transform({rng}, {var} -> {expr}), "
                f"(s,t) -> s + t)")

    return f"""
WITH RECURSIVE
__cg_x AS (
  SELECT (o_custkey % {n})::INT AS i, (o_orderkey % {n})::INT AS j,
         COUNT(*)::DOUBLE AS c
  FROM orders GROUP BY 1, 2),
__cg_cells AS (
  SELECT ii.i::INT AS i, jj.j::INT AS j, COALESCE(x.c, 0.0) AS c
  FROM range({n}) ii(i) CROSS JOIN range({n}) jj(j)
  LEFT JOIN __cg_x x ON x.i = ii.i AND x.j = jj.j),
__cg_ata AS (
  SELECT l.j AS i, r.j AS j,
         SUM(l.c * r.c) + CASE WHEN l.j = r.j THEN 1000.0 ELSE 0.0 END AS v
  FROM __cg_cells l JOIN __cg_cells r ON l.i = r.i
  GROUP BY l.j, r.j),
__cg_arow AS (
  SELECT i, list(v ORDER BY j) AS row FROM __cg_ata GROUP BY i),
__cg_a AS (SELECT list(row ORDER BY i) AS a FROM __cg_arow),
__cg_b AS (
  SELECT list(1.0 + COALESCE(c.cnt, 0.0) ORDER BY t.i) AS b
  FROM range({n}) t(i) LEFT JOIN (
    SELECT (o_orderkey % {n})::INT AS i, COUNT(*)::DOUBLE AS cnt
    FROM orders GROUP BY 1) c ON c.i = t.i),
__cg_it AS (
  SELECT 0 AS k, CAST(list_transform({rng}, i -> 0.0) AS DOUBLE[]) AS x,
         b AS r, b AS p,
         {dot("i", "b[i]*b[i]")} AS rs,
         CAST(NULL AS DOUBLE) AS prev
  FROM __cg_b
  UNION ALL
  SELECT k+1,
         CAST(list_transform({rng}, i -> x[i] + alpha*p2[i]) AS DOUBLE[]),
         CAST(list_transform({rng}, i -> r[i] - alpha*ap[i]) AS DOUBLE[]),
         p2,
         {dot("i", "(r[i] - alpha*ap[i])*(r[i] - alpha*ap[i])")},
         rs
  FROM (
    SELECT *, rs / {dot("i", "p2[i]*ap[i]")} AS alpha
    FROM (
      SELECT *, CAST(list_transform({rng}, i ->
               {dot("j", "a[i][j]*p2[j]")}) AS DOUBLE[]) AS ap
      FROM (
        SELECT it.*, a.a, CAST(CASE WHEN k=0 THEN r ELSE
               list_transform({rng}, i -> (rs/prev)*p[i] + r[i])
             END AS DOUBLE[]) AS p2
        FROM __cg_it it, __cg_a a WHERE k < {k}
      )
    )
  )
)
SELECT t.i::INT AS i, x[t.i + 1] AS x
FROM (SELECT x FROM __cg_it WHERE k = {k}) f CROSS JOIN range({n}) t(i)
"""


def _q_lanczos_tridiag(spark, sf_dir) -> DataFrame:
    """Distributed Lanczos tridiagonalization gate (math/.../lanczos/
    LanczosSolver.java:92-145 + mr/.../DistributedLanczosSolver.java —
    the `svd` registry program, round-5 session 11): X is the dense
    8x5 count matrix X[i][j] = #orders with o_custkey%8==i and
    o_orderkey%5==j, held as a DISTRIBUTED triple DRM (dense so both
    engines fold the identical element set); each Lanczos iteration is
    one real distributed timesSquared pass (two seq-fold shuffles —
    TimesSquaredJob shape). With seq_folds every dot/norm/scale is a
    pinned sequential order, so the fixed 3-iteration schedule
    (rank 4) replays bit-exactly in a DuckDB recursive CTE over list
    columns — alphas and betas hash-exact with NO rounding. The
    eigendecomposition of the tridiagonal is LAPACK-side and is
    pytest-verified instead (test_lanczos vs numpy SVD)."""
    from mahout_spark.operators.lanczos import lanczos_svd

    m, n, k = 8, 5, 4
    od = _read(spark, sf_dir, "orders")
    counts = (od.groupBy(
        (F.col("o_custkey") % m).cast("long").alias("row_id"),
        (F.col("o_orderkey") % n).cast("long").alias("col_id"))
        .agg(F.count("*").cast("double").alias("c")))
    grid = (spark.range(m).select(F.col("id").alias("row_id"))
            .crossJoin(spark.range(n).select(F.col("id").alias("col_id"))))
    drm = (grid.join(counts, ["row_id", "col_id"], "left")
           .select("row_id", "col_id",
                   F.coalesce(F.col("c"), F.lit(0.0)).alias("value")))
    st = lanczos_svd(drm, n, k, seq_folds=True)
    rows = [(i + 1, float(st.alphas[i]), float(st.betas[i]))
            for i in range(len(st.alphas))]
    return spark.createDataFrame(rows,
                                 "iter int, alpha double, beta double")


def _lanczos_tridiag_oracle_sql() -> str:
    m, n, k = 8, 5, 4
    rn, rm = f"range(1,{n + 1})", f"range(1,{m + 1})"

    def dot(rng, var, expr):
        return (f"list_reduce(list_transform({rng}, {var} -> {expr}), "
                f"(s,t) -> s + t)")

    init = (f"CAST(list_transform({rn}, i -> 1.0/sqrt({n}.0)) "
            f"AS DOUBLE[])")
    return f"""
WITH RECURSIVE
__lz_cnt AS (
  SELECT (o_custkey % {m})::INT AS i, (o_orderkey % {n})::INT AS j,
         COUNT(*)::DOUBLE AS c
  FROM orders GROUP BY 1, 2),
__lz_cells AS (
  SELECT ii.i::INT AS i, jj.j::INT AS j, COALESCE(x.c, 0.0) AS c
  FROM range({m}) ii(i) CROSS JOIN range({n}) jj(j)
  LEFT JOIN __lz_cnt x ON x.i = ii.i AND x.j = jj.j),
__lz_xrow AS (
  SELECT i, list(c ORDER BY j) AS row FROM __lz_cells GROUP BY i),
__lz_x AS (SELECT list(row ORDER BY i) AS xm FROM __lz_xrow),
__lz_it AS (
  SELECT 1 AS step, [{init}] AS basis, {init} AS cur,
         CAST(NULL AS DOUBLE[]) AS prev,
         0.0::DOUBLE AS beta, 0.0::DOUBLE AS scale,
         CAST(NULL AS DOUBLE) AS alpha_out,
         CAST(NULL AS DOUBLE) AS beta_out
  UNION ALL
  SELECT step + 1, list_append(basis, nrm), nrm, cur, beta2, scale2,
         alpha, beta2
  FROM (
    SELECT step, basis, cur, scale2, alpha,
           sqrt({dot(rn, "i", "v3[i]*v3[i]")}) AS beta2,
           CAST(list_transform({rn}, i -> v3[i] * (1.0/beta2))
                AS DOUBLE[]) AS nrm
    FROM (
      SELECT *,
             CAST(list_reduce(
                 list_prepend(CAST(list_transform({rn}, i ->
                     v1[i] + cur[i]*(-alpha)) AS DOUBLE[]), basis),
                 (acc, b) -> CASE
                     WHEN {dot(rn, "i", "acc[i]*b[i]")} = 0.0 THEN acc
                     ELSE list_transform({rn}, i ->
                         acc[i] + b[i]*(-{dot(rn, "q", "acc[q]*b[q]")}))
                 END) AS DOUBLE[]) AS v3
      FROM (
        SELECT *, {dot(rn, "i", "cur[i]*v1[i]")} AS alpha
        FROM (
          SELECT *,
                 CAST(CASE WHEN prev IS NULL THEN v0
                      ELSE list_transform({rn}, i ->
                          v0[i] + prev[i]*(-beta))
                 END AS DOUBLE[]) AS v1
          FROM (
            SELECT *,
                   CASE WHEN scale <= 0
                        THEN sqrt({dot(rn, "i", "ts[i]*ts[i]")})
                        ELSE scale END AS scale2,
                   CAST(list_transform({rn}, i ->
                       ts[i] * (1.0/(CASE WHEN scale <= 0
                           THEN sqrt({dot(rn, "q", "ts[q]*ts[q]")})
                           ELSE scale END))) AS DOUBLE[]) AS v0
            FROM (
              SELECT *,
                     CAST(list_transform({rn}, c ->
                         {dot(rm, "r", "xm[r][c]*u[r]")})
                         AS DOUBLE[]) AS ts
              FROM (
                SELECT it.*, x.xm,
                       CAST(list_transform({rm}, r ->
                           {dot(rn, "j", "xm[r][j]*cur[j]")})
                           AS DOUBLE[]) AS u
                FROM __lz_it it, __lz_x x WHERE it.step < {k}
              )
            )
          )
        )
      )
    )
  )
)
SELECT (step - 1)::INT AS iter, alpha_out AS alpha, beta_out AS beta
FROM __lz_it WHERE step > 1
"""


GROUPED_ONLINE_AUC_SQL = """
WITH RECURSIVE
__oa_src AS (
  SELECT event_type::VARCHAR AS g, event_id AS o,
         (user_id % 2)::INT AS y, value::DOUBLE AS s
  FROM events WHERE event_id % 13 = 0),
__oa_arr AS (
  SELECT g, list(struct_pack(y := y, s := s) ORDER BY o, s, y) AS seq
  FROM __oa_src GROUP BY g),
__oa_state AS (
  SELECT g, 0 AS i, 0 AS n0, 0 AS n1, 0.5::DOUBLE AS a0, 0.5::DOUBLE AS a1,
         CAST([] AS DOUBLE[]) AS h0, CAST([] AS DOUBLE[]) AS h1
  FROM __oa_arr
  UNION ALL
  SELECT g, i + 1,
         n0 + CASE WHEN e.y = 0 THEN 1 ELSE 0 END,
         n1 + CASE WHEN e.y = 1 THEN 1 ELSE 0 END,
         CASE WHEN e.y = 0 AND len(h1) > 0
              THEN a0 + (list_sum(list_transform(h1, v ->
                     CASE WHEN e.s > v THEN 1.0
                          WHEN e.s = v THEN 0.5 ELSE 0.0 END))
                   / len(h1) - a0) / (n0 + 1)
              ELSE a0 END,
         CASE WHEN e.y = 1 AND len(h0) > 0
              THEN a1 + (list_sum(list_transform(h0, v ->
                     CASE WHEN e.s > v THEN 1.0
                          WHEN e.s = v THEN 0.5 ELSE 0.0 END))
                   / len(h0) - a1) / (n1 + 1)
              ELSE a1 END,
         CASE WHEN e.y = 0 THEN list_slice(list_append(h0, e.s),
                greatest(len(h0) - 8, 1), len(h0) + 1) ELSE h0 END,
         CASE WHEN e.y = 1 THEN list_slice(list_append(h1, e.s),
                greatest(len(h1) - 8, 1), len(h1) + 1) ELSE h1 END
  FROM (SELECT st.*, a.seq[st.i + 1] AS e
        FROM __oa_state st JOIN __oa_arr a USING (g)
        WHERE st.i < len(a.seq)) )
SELECT st.g AS event_type, (1 - st.a0 + st.a1) / 2 AS online_auc,
       len(a.seq) AS n_samples
FROM __oa_state st JOIN __oa_arr a USING (g) WHERE st.i = len(a.seq)
"""


# -- webtext quality / C4 gates ---------------------------------------------

# deterministic re-lining of the (single-line) synthetic documents:
# chunks of CHUNK_TOKENS tokens become "lines"; every 3rd line gets no
# terminal '.', so the C4 line filter has real variance to act on.
CHUNK_TOKENS = 8


def _chunked_docs(spark, sf_dir) -> DataFrame:
    from mahout_spark.functions.text import tokens_array

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens_array(F.col("text"))
    n_chunks = F.floor((F.size(toks) + (CHUNK_TOKENS - 1)) / CHUNK_TOKENS) \
        .cast("int")
    lines = F.when(F.size(toks) > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * CHUNK_TOKENS + 1, CHUNK_TOKENS),
                         " "),
            F.when(i % 3 < 2, F.lit(".")).otherwise(F.lit(""))))
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.array_join(lines, "\n").alias("text"))


def _chunked_text_sql() -> str:
    from mahout_spark.functions.text import tokens_array_sql

    toks = tokens_array_sql("text")
    c = CHUNK_TOKENS
    lines = (f"CASE WHEN len({toks}) > 0 THEN "
             f"list_transform(range(0, (len({toks}) + {c - 1}) // {c}), "
             f"i -> array_to_string(list_slice({toks}, i * {c} + 1, "
             f"i * {c} + {c}), ' ') || "
             f"(CASE WHEN i % 3 < 2 THEN '.' ELSE '' END)) "
             f"ELSE [] END")
    return f"coalesce(array_to_string({lines}, chr(10)), '')"


def _q_gopher_quality(spark, sf_dir) -> DataFrame:
    """Gopher (Rae et al. 2021) quality+repetition signals and the keep
    decision per document — the materialized-arrays scale path
    (gopher_signals_df): map-only, every unit array evaluated once per
    row, every signal an exact int/int quotient."""
    from mahout_spark.functions.webquality import gopher_signals_df

    docs = _read(spark, sf_dir, "documents")
    sig = gopher_signals_df(docs, "text", with_keep=True)
    return sig.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_length", "symbol_to_word_ratio", "frac_words_alpha",
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        "dup_line_frac", "top_2gram_char_frac", "top_3gram_char_frac",
        "dup_5gram_char_frac",
        F.col("keep").cast("int").alias("keep"))


def _q_c4_line_filter(spark, sf_dir) -> DataFrame:
    """C4 (Raffel et al. 2020) line filter + document gate over the
    deterministically re-lined documents (terminal-punct rule, ≥5-word
    rule, blocklist on the CLEANED text, ≥3-sentence minimum)."""
    from mahout_spark.functions import webquality as wq

    docs = _chunked_docs(spark, sf_dir)
    out = wq.c4_clean(docs)
    return out.select(
        "doc_id",
        F.size(wq.lines_array(F.col("text"))).cast("long").alias("n_lines"),
        F.size(wq.lines_array(F.col("c4_text"))).cast("long")
        .alias("n_lines_kept"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("c4_keep").cast("int").alias("c4_keep"),
        F.md5(F.col("c4_text")).alias("c4_text_md5"))


def _q_line_dedup(spark, sf_dir) -> DataFrame:
    """Corpus-level exact line dedup (C4 span-dedup analog): every
    distinct line survives once at its first (doc_id, pos) occurrence;
    one groupBy on the line key + one reassembly groupBy — two
    shuffles, no window over a low-cardinality key."""
    from mahout_spark.functions.webquality import line_dedup

    docs = _chunked_docs(spark, sf_dir)
    out = line_dedup(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        F.md5(F.col("text_dedup")).alias("text_dedup_md5"))


def _q_dedup_keep_best(spark, sf_dir) -> DataFrame:
    """End-to-end dedup with QUALITY-based representative selection:
    LSH pair set → transitive groups → argmax(n_chars) winner per group
    (ties → min id) — the keep-the-best-copy policy a real corpus dedup
    uses instead of min-id (dedup.pick_representatives)."""
    from mahout_spark.operators.dedup import (dedup_groups,
                                              minhash_dedup_pairs,
                                              pick_representatives)

    docs = _read(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, "doc_id", "text",
                                num_perm=MINHASH_PERM, bands=8,
                                seed=MINHASH_SEED, threshold=0.125,
                                max_bucket=10 ** 9, family="parity")
    groups = dedup_groups(pairs.select("id_a", "id_b"))
    out = pick_representatives(groups, docs.select("doc_id", "n_chars"),
                               "doc_id", "n_chars")
    return out.select("group_id", "member_id",
                      F.col("is_representative").cast("int")
                      .alias("is_representative"))


def _q_pii_scrub(spark, sf_dir) -> DataFrame:
    """PII scrubbing gate: deterministic emails/IPs/phones injected per
    document, then webquality.scrub_pii (chained regexp_replace, Java
    regex == RE2 on the ASCII rule set) + per-rule counts."""
    from mahout_spark.functions import webquality as wq

    d = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(d % 2 == 0, F.concat(F.lit(" contact user"),
                                    d.cast("string"),
                                    F.lit("@example.com")))
        .otherwise(F.lit("")),
        F.when(d % 3 == 0, F.concat(F.lit(" host 10.0."),
                                    (d % 256).cast("string"),
                                    F.lit(".1")))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit(" tel 555-12"),
                                    (d % 10).cast("string"),
                                    F.lit("-4567")))
        .otherwise(F.lit("")))
    docs = _read(spark, sf_dir, "documents") \
        .select("doc_id", injected.alias("text"))
    counts = wq.pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(wq.scrub_pii(F.col("text"))).alias("scrubbed_md5"),
        *[v.cast("long").alias(k) for k, v in counts.items()])


_SS_BOILER = ("subscribe to our newsletter for weekly updates and "
              "exclusive member offers today")
_SS_K = 5


def _ss_injected(spark, sf_dir) -> DataFrame:
    """documents with a shared boilerplate tail on every 3rd doc — the
    corpus-level duplicated-span fixture (oracle replays the same CASE)."""
    injected = F.when(F.col("doc_id") % 3 == 0,
                      F.concat_ws(" ", F.col("text"), F.lit(_SS_BOILER))
                      ).otherwise(F.col("text"))
    return _read(spark, sf_dir, "documents").select(
        "doc_id", injected.alias("text"))


_SS_INJECT_SQL = (f"(SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN "
                  f"concat_ws(' ', text, '{_SS_BOILER}') ELSE text END "
                  f"AS text FROM documents)")


def _q_substring_spans(spark, sf_dir) -> DataFrame:
    """Exact substring dedup gate (Lee et al. k-gram anchoring): maximal
    0-based token spans covered by any 5-gram occurring >= 2 times in
    the corpus — gaps-and-islands merge, all-integer output. Runs the
    production 64-bit-hashed-gram path; the DuckDB oracle groups on the
    gram string (pytest pins the two paths equal)."""
    from mahout_spark.operators.substring import duplicate_spans

    return duplicate_spans(_ss_injected(spark, sf_dir), k=_SS_K,
                           min_count=2, hash_grams=True)


def _q_substring_clean(spark, sf_dir) -> DataFrame:
    """Duplicated-span REMOVAL gate: md5 of the single-space-rejoined
    kept tokens + tokens removed per doc, same fixture as
    substring_dup_spans."""
    from mahout_spark.operators.substring import remove_duplicate_spans

    out = remove_duplicate_spans(_ss_injected(spark, sf_dir), k=_SS_K,
                                 min_count=2, hash_grams=True)
    return out.select("doc_id", F.md5("text_dedup").alias("clean_md5"),
                      "n_dup_units")


_DC_K = 13  # the GPT-3/PaLM 13-gram decontamination rule


def _dc_bench(spark, sf_dir) -> DataFrame:
    """Synthetic benchmark: a 17-token excerpt (tokens 4..20) of every
    7th document — contaminated docs are known by construction, and the
    oracle derives the identical benchmark in SQL."""
    from mahout_spark.functions.webquality import words_array

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    return docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(words_array(F.col("text")), 4, 17))
        .alias("text"))


def _dc_bench_sql() -> str:
    from mahout_spark.functions.webquality import words_array_sql

    return (f"(SELECT doc_id, array_to_string(list_slice("
            f"{words_array_sql('text')}, 4, 20), ' ') AS text "
            f"FROM documents WHERE doc_id % 7 = 0)")


def _q_decontamination(spark, sf_dir) -> DataFrame:
    """Benchmark-decontamination gate (Brown et al. 13-gram overlap):
    maximal token spans of the corpus sharing a 13-gram with the
    benchmark excerpts. Production hashed-gram path; the DuckDB oracle
    joins on gram strings (pytest pins the two equal)."""
    from mahout_spark.operators.substring import contamination_spans

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return contamination_spans(docs, _dc_bench(spark, sf_dir), k=_DC_K,
                               hash_grams=True)


def _sd_corpus(spark, sf_dir) -> DataFrame:
    """embeddings plus injected scaled near-copies (cosine-invariant
    scaling, so copies are exact semantic dups): every 7th vector gets
    a 1.25x twin at id+10000, every 14th ALSO a 1.5x twin at id+20000 —
    the %14 vectors form 3-cliques exercising the transitive closure."""
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>")
        .alias("embedding"))

    def scaled(mod, offset, s):
        return (emb.where(F.col("vec_id") % mod == 0)
                .select((F.col("vec_id") + offset).alias("vec_id"),
                        F.transform("embedding",
                                    lambda x: x * F.lit(s))
                        .alias("embedding")))

    return emb.unionByName(scaled(7, 10000, 1.25)).unionByName(
        scaled(14, 20000, 1.5))


_SD_CORPUS_SQL = """(
  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, list_transform(embedding::DOUBLE[], x -> x * 1.25)
  FROM embeddings WHERE vec_id % 7 = 0
  UNION ALL
  SELECT vec_id + 20000, list_transform(embedding::DOUBLE[], x -> x * 1.5)
  FROM embeddings WHERE vec_id % 14 = 0)"""

_SD_CENTERS_SQL = ("SELECT vec_id AS cidx, embedding::DOUBLE[] AS cv "
                   "FROM embeddings WHERE vec_id < 4")


def _q_semdedup(spark, sf_dir) -> DataFrame:
    """SemDeDup gate (Abbas et al. 2023): cosine-argmax assignment to 4
    fixed centroids (the vec_id<4 embeddings — bounded driver fetch,
    drmBroadcast convention), within-cluster pairs >= 0.99, transitive
    groups, min-id keep. The DuckDB oracle replays assignment, every
    pair cosine, and the closure bit-exactly."""
    from mahout_spark.operators.semdedup import semdedup

    centers = [list(r["embedding"]) for r in
               _read(spark, sf_dir, "embeddings")
               .where(F.col("vec_id") < 4).orderBy("vec_id")
               .select("embedding").collect()]
    return semdedup(_sd_corpus(spark, sf_dir), centers, threshold=0.99)


def _q_dsir_weights(spark, sf_dir) -> DataFrame:
    """DSIR gate (Xie et al. 2023): importance log-weight of every doc
    toward the English subset as target — hashed unigram+bigram bucket
    models (md5 % 4096), add-0.5 smoothing, bucket-sorted ln fold.
    log_w rounded 6 dp (the repo ln convention); counts exact."""
    from mahout_spark.functions.dsir import dsir_log_weights

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text",
                                                    "lang")
    target = docs.where(F.col("lang") == "en")
    w = dsir_log_weights(docs, target, buckets=4096)
    return w.select("doc_id", "n_feats",
                    F.round("log_w", 6).alias("log_w"))


def _q_fd_bound(spark, sf_dir) -> DataFrame:
    """Frequent-directions gate (Liberty 2013), exact-verify style like
    heavy_hitters: build the ell=16 FD sketch of the embeddings matrix
    distributedly, build the EXACT Gramian through the same machinery
    (ell=512 ≥ n rows ⇒ zero shrinks ⇒ BᵗB = AᵗA, certified by
    delta_sum == 0), and emit the published-bound checks as booleans —
    the oracle is their literal truth. SVD isn't SQL-expressible; the
    bound checks are."""
    import numpy as np

    from mahout_spark.sketch.fd import fd_sketch

    emb = _read(spark, sf_dir, "embeddings").select("embedding")
    fd = fd_sketch(emb, "embedding", ell=16, dim=64)
    exact = fd_sketch(emb, "embedding", ell=512, dim=64)
    assert exact.spectral_bound() == 0.0
    diff = exact.ata() - fd.ata()
    eig = np.linalg.eigvalsh(diff)
    scale = max(1.0, float(np.abs(eig).max()))
    cert = fd.spectral_bound()
    rows = [(16, 64,
             bool(eig.min() >= -1e-8 * scale),
             bool(eig.max() <= cert + 1e-8 * max(1.0, cert)),
             bool(cert <= exact.fnorm2 / 16 + 1e-8))]
    return spark.createDataFrame(
        rows, "ell int, dim int, psd_ok boolean, certified_ok boolean,"
              " apriori_ok boolean")


#: decomposed / control-char injections keyed by doc_id % 4 — built
#: from explicit code points so no editor/tool can silently compose them
_NFC_INJ = {
    0: " cafe" + chr(0x301),                       # e + combining acute
    1: " " + chr(0x1100) + chr(0x1161) + chr(0x11A8),   # hangul jamo
    2: " a" + chr(0x301) + chr(0x327) + "\x07x",   # combining run + BEL
    3: " " + chr(0x212B),                          # angstrom sign
}


def _nfc_inject_sql() -> str:
    def lit(s):
        return " || ".join(
            "chr(%d)" % ord(c) if ord(c) > 126 or ord(c) < 32
            else "'%s'" % c.replace("'", "''") for c in s)
    cases = " ".join(
        f"WHEN doc_id % 4 = {i} THEN text || {lit(s)}"
        for i, s in sorted(_NFC_INJ.items()))
    return f"(SELECT doc_id, CASE {cases} END AS text FROM documents)"


def _q_theta_overlap(spark, sf_dir) -> DataFrame:
    """Theta/KMV set-analytics gate: per-event-type distinct-user
    sketches (k=64, saturated — the estimator path) from ONE
    distributed build, then pairwise union/intersection/Jaccard. State
    is merge-order independent, so the DuckDB bottom-k replay
    (ORDER BY hash LIMIT k) is bit-exact including every float
    estimate (multiplication-first integer-derived divisions)."""
    from mahout_spark.sketch.queries import theta_group_overlap

    ev = _read(spark, sf_dir, "events")
    return theta_group_overlap(ev, "event_type", "user_id", k=64)


PQ_M, PQ_KSUB = 4, 4  # fixed table-derived codebooks (vec_id < ksub)


def _pq_fixed_books(spark, sf_dir):
    import numpy as np

    emb = _read(spark, sf_dir, "embeddings")
    rows = {r["vec_id"]: np.asarray(r["e"], dtype=np.float64)
            for r in emb.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("e"))
            .filter(F.col("vec_id") < PQ_KSUB).collect()}
    x = np.stack([rows[i] for i in range(PQ_KSUB)])
    dsub = x.shape[1] // PQ_M
    return emb, np.stack([x[:, j * dsub:(j + 1) * dsub]
                          for j in range(PQ_M)]), dsub


def _q_pq_adc_topk(spark, sf_dir) -> DataFrame:
    """Product-quantization gate (Jegou et al. TPAMI'11,
    operators/pq.py): encode the embeddings table against fixed
    table-derived codebooks (subvectors of vec_id < 4 — the
    literal-center gate form), then ADC top-8 for two query vectors.
    Every distance is the repo's pinned zip_with/aggregate IEEE fold and
    the ADC sum is a j-ordered chain, so codes, distances and rankings
    replay bit-exact in DuckDB (argmin = first-min == ORDER BY dist, c
    LIMIT 1). Training (pq_train) is pytest-covered; the gate pins the
    scan-side machinery a 10^12-vector corpus would run."""
    from mahout_spark.operators.pq import adc_topk, pq_encode

    emb, books, _ = _pq_fixed_books(spark, sf_dir)
    q = emb.filter(F.col("vec_id").isin(7, 11)).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return adc_topk(pq_encode(emb, books), q, books, k=8)


def _q_priority_sample_docs(spark, sf_dir) -> DataFrame:
    """Priority-sampling gate (Duffield-Lund-Thorup JACM'07,
    core/priority.py — the tenth mergeable sketch): global k=32
    weighted doc sample (weight = n_chars) from ONE distributed build
    (JVM per-key sum preagg -> mapInPandas partial samples -> salted
    merge; retained state is a pure order statistic of the union, so
    any partitioning yields the same bits), joined back to doc identity
    by broadcasting the <=k sampled hashes over one map-only corpus
    scan. tau and w_hat are single pinned IEEE multiply-then-divide /
    max ops, so the DuckDB one-window replay is bit-exact with no
    rounding."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.queries import priority_sample_weights

    docs = _read(spark, sf_dir, "documents")
    sample = priority_sample_weights(docs, "doc_id", "n_chars", k=32)
    keyed = docs.select(
        (md5_long60(F.col("doc_id").cast("string")) + F.lit(1)).alias("u"),
        "doc_id", "lang")
    return (keyed.join(F.broadcast(sample), "u")
            .select("rank", "doc_id", "lang", "u", "w", "tau", "w_hat")
            .orderBy("rank"))


def _q_priority_lang_totals(spark, sf_dir) -> DataFrame:
    """Subset-sum estimation from the same k=32 priority sample —
    DLT'07's whole point: per-language total chars for subsets chosen
    AFTER the sample was built, each estimated by summing w_hat over
    the sample's members of that language, next to the exact totals.
    The w_hat fold is pinned u-ascending (F.aggregate over a sorted
    struct array == DuckDB list_sum(list(... ORDER BY u))) so the
    <=32-term float sum is bit-exact cross-engine."""
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.queries import priority_sample_weights

    docs = _read(spark, sf_dir, "documents")
    sample = priority_sample_weights(docs, "doc_id", "n_chars", k=32)
    keyed = docs.select(
        (md5_long60(F.col("doc_id").cast("string")) + F.lit(1)).alias("u"),
        "lang")
    j = keyed.join(F.broadcast(sample), "u")
    est = (j.groupBy("lang")
           .agg(F.count("*").cast("int").alias("n_sampled"),
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("u", "w_hat"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["w_hat"]).alias("est_chars")))
    exact = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("double").alias("exact_chars"))
    return (exact.join(est, "lang", "left")
            .select("lang", "exact_chars",
                    F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
                    F.coalesce("est_chars", F.lit(0.0)).alias("est_chars"))
            .orderBy("lang"))


def _q_tuple_lang_totals(spark, sf_dir) -> DataFrame:
    """Tuple-sketch gate (the DataSketches array-of-doubles line,
    core/tuplesketch.py — the 11th mergeable sketch): per-language k=32
    bottom-k state over doc_id, each retained hash carrying the summed
    n_chars summary, from ONE distributed build (JVM per-key value-sum
    preagg -> mapInPandas partials -> salted merge; bottom-k state is a
    pure order statistic of the union, so any partitioning yields the
    same bits). Output per language: retained count, knowledge horizon
    theta, estimated distinct docs, estimated total chars, next to the
    exact values. domain = 2^60 is a power of two, so each estimator is
    one EXACT float64 exponent-shift multiply plus one IEEE divide —
    the DuckDB window replay (tuple_totals_oracle_sql) is bit-exact
    with NO rounding."""
    from mahout_spark.sketch.queries import tuple_totals_by_group

    docs = _read(spark, sf_dir, "documents")
    est = tuple_totals_by_group(docs, "lang", "doc_id", "n_chars", k=32)
    exact = docs.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("double").alias("exact_docs"),
        F.sum("n_chars").cast("double").alias("exact_chars"))
    return (est.join(exact, "lang")
            .select("lang", "n_retained", "theta", "est_distinct",
                    "est_total", "exact_docs", "exact_chars")
            .orderBy("lang"))


def _q_moments_lang_chars(spark, sf_dir) -> DataFrame:
    """Moments-sketch gate (Gan et al. VLDB'18, core/moments.py — the
    12th mergeable sketch): per-language power-sum state (n, min, max,
    sum x..x^4) over n_chars from the generic distributed sketch build
    (mapInPandas partials + salted merge — the same machinery every
    sketch uses). n_chars <= ~600 keeps sum(x^4) ~1e12, far below
    2^53, so every partial sum is an exact float64 integer under ANY
    partitioning/merge order and the DuckDB chained-product replay is
    bit-exact. Quantile recovery (the maxent solve) is an estimator
    over this exact state — accuracy-pinned in tests/test_moments.py,
    not oracle-replayable."""
    from mahout_spark.sketch.queries import moments_by_group

    docs = _read(spark, sf_dir, "documents")
    return moments_by_group(docs, "lang", "n_chars", t=4).orderBy("lang")


CBF_CAP, CBF_FP, CBF_SEED, CBF_PROBES = 4000, 0.01, 3, 100


def _q_counting_bloom_retract(spark, sf_dir) -> DataFrame:
    """Counting-Bloom gate (Fan et al. ToN'00, core/countingbloom.py —
    the 13th mergeable sketch): build a parity counting filter over
    every 'en' token occurrence (JVM per-key multiplicity preagg),
    RETRACT the doc_id%7==0 subset by merging the negated sketch of
    that subset (counter linearity — the thing a bit-OR Bloom cannot
    do), then probe the global head-100 tokens: per-token min counter
    across the k affine probes + the membership decision. Counters are
    integer adds under the DuckDB-replayable affine family, so the
    whole build + retraction + probe replays bit-exact."""
    from mahout_spark.core.countingbloom import CountingBloomFilter
    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import countingbloom_spec, sketch_global

    toks = _doc_tokens(spark, sf_dir).persist()
    spec = countingbloom_spec(capacity=CBF_CAP, fp_rate=CBF_FP,
                              seed=CBF_SEED, parity=True)
    en = toks.filter(F.col("lang") == "en")
    add = CountingBloomFilter.deserialize(sketch_global(
        en, spec, key_expr=md5_long60(F.col("token"))))
    rem = CountingBloomFilter.deserialize(sketch_global(
        en.filter(F.col("doc_id") % 7 == 0), spec,
        key_expr=md5_long60(F.col("token"))))
    net = add.merge(rem.negate())
    head = (toks.groupBy("token").count()
            .orderBy(F.desc("count"), "token").limit(CBF_PROBES)
            .select("token", md5_long60(F.col("token")).alias("__key"))
            .collect())                        # bounded: CBF_PROBES rows
    toks.unpersist()
    import numpy as np
    keys = np.array([r["__key"] for r in head], dtype=np.int64)
    mins = net.counts[net._positions(keys)].min(axis=0)
    rows = [(r["token"], int(m), bool(m > 0))
            for r, m in zip(head, mins)]
    return spark.createDataFrame(
        rows, "token string, min_count long, maybe_contains boolean")


AGGPLAN_PARAMS = dict(
    docs_lang=dict(target_rows_per_task=150, groups_per_partition=4,
                   max_partitions=8, min_combine_ratio=4.0, hll_p=14),
    events_id=dict(target_rows_per_task=1_000_000,
                   groups_per_partition=1000, max_partitions=8192,
                   min_combine_ratio=4.0, hll_p=14),
    events_user=dict(target_rows_per_task=1_000_000,
                     groups_per_partition=1000, max_partitions=8192,
                     min_combine_ratio=4.0, hll_p=14),
)


def _q_agg_strategy_plan(spark, sf_dir) -> DataFrame:
    """Aggregation-planner gate (plans/aggplan.py — closes the
    sketch-driven planning triad: skew salts, join sizes, agg shape):
    three plans exercising all three strategies — documents.lang with
    a tiny per-task budget (the 'en' head group forces
    salted_two_phase), events.event_id (unique key: combine can't pay
    for itself -> wide_shuffle), events.user_id (hundreds of rows per
    user -> direct). Every number is an exact count, an exact-verified
    heavy-group count, or the UNROUNDED parity-HLL estimate (bit-exact
    register math, one shared ln), and every branch compares identical
    doubles — the DuckDB replay is hash-exact with no rounding."""
    from mahout_spark.plans.aggplan import agg_plan_row

    docs = _read(spark, sf_dir, "documents")
    events = _read(spark, sf_dir, "events")
    rows = [
        agg_plan_row(docs, "lang", "docs_lang",
                     **AGGPLAN_PARAMS["docs_lang"]),
        agg_plan_row(events, "event_id", "events_id",
                     **AGGPLAN_PARAMS["events_id"]),
        agg_plan_row(events, "user_id", "events_user",
                     **AGGPLAN_PARAMS["events_user"]),
    ]
    from functools import reduce
    return reduce(lambda a, b: a.unionByName(b), rows).orderBy("plan_for")


def _q_unicode_nfc(spark, sf_dir) -> DataFrame:
    """Unicode hygiene gate: deterministic decomposed sequences +
    control chars injected per doc, then strip-controls -> NFC (the
    pipeline order contract: DuckDB's nfc_normalize truncates at NUL,
    so controls go first). md5 of the normalized text + codepoint
    delta; engines bit-equal (CPython unicodedata vs utf8proc, both
    UAX #15)."""
    from mahout_spark.functions.unicode import (nfc_normalize,
                                                strip_control_chars)

    d = F.col("doc_id")
    inj = F.concat(
        F.col("text"),
        *[F.when(d % 4 == i, F.lit(t)).otherwise(F.lit(""))
          for i, t in sorted(_NFC_INJ.items())])
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", inj.alias("text"))
    norm = nfc_normalize(strip_control_chars(F.col("text")))
    return docs.select(
        "doc_id", F.md5(norm).alias("nfc_md5"),
        (F.length(F.col("text")) - F.length(norm)).cast("long")
        .alias("n_chars_delta"))


def _q_thin_qr_r(spark, sf_dir) -> DataFrame:
    """Thin-QR gate: R factor of a tall-skinny A (lineitem quantity /
    linenumber / ones columns) via the distributed Gramian + Cholesky
    (decompositions.dqr_thin ← DQR.scala:39-76). The Gramian entries
    are integer-valued sums (order-independent → exact == SQL sums);
    the oracle replays Cholesky in closed form — LAPACK differs by
    ≤1 ulp on 3×3, bridged by round(6) at the final select only."""
    from mahout_spark.operators.decompositions import dqr_thin

    li = _read(spark, sf_dir, "lineitem")
    # (orderkey, partkey, linenumber, suppkey) is the table's unique key
    # — the synthetic lineitem repeats (orderkey, linenumber) pairs, and
    # DRM triples require one value per (row, col)
    trip = li.select(
        F.concat_ws("|", "l_orderkey", "l_partkey", "l_linenumber",
                    "l_suppkey").alias("row_id"),
        F.posexplode(F.array(F.col("l_quantity").cast("double"),
                             F.col("l_linenumber").cast("double"),
                             F.lit(1.0))).alias("col_id", "value"))
    _, r_mat = dqr_thin(trip, 3)
    rows = [(i, j, round(float(r_mat[i, j]), 6))
            for i in range(3) for j in range(3) if j >= i]
    return spark.createDataFrame(rows, "i int, j int, r double")


STRAT_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.125, "zh": 1.0}


def _q_stratified_sample(spark, sf_dir) -> DataFrame:
    """Deterministic per-language rate sampling + train/val/test split —
    one md5-coin per row (retry-stable, engine-exact integer compare),
    literal CASE thresholds, map-only (functions/sampling.py)."""
    from mahout_spark.functions.sampling import (split_fractions,
                                                 stratified_sample)

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = stratified_sample(docs, "lang", STRAT_RATES, "doc_id", seed=5)
    return split_fractions(kept, "doc_id", [0.8, 0.1, 0.1], seed=9) \
        .select("doc_id", "lang", F.col("split").cast("int").alias("split"))


# -- URL layer gate -----------------------------------------------------------

# deterministic synthetic URL per document (messy on purpose: mixed
# case, userinfo, default/explicit ports, unsorted queries, fragments,
# multi-label public suffixes) — no testdata column is URL-shaped.
URL_TLDS = ["com", "co.uk", "github.io", "de", "org"]


def _synth_url_expr() -> F.Column:
    d = F.col("doc_id")
    scheme = F.element_at(F.array(F.lit("HTTP"), F.lit("https"),
                                  F.lit("HTTPS"), F.lit("http")),
                          (d % 4 + 1).cast("int"))
    user = F.when(d % 7 == 0, F.lit("user:pw@")).otherwise(F.lit(""))
    www = F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    tld = F.element_at(F.array(*[F.lit(t) for t in URL_TLDS]),
                       (d % 5 + 1).cast("int"))
    port = F.element_at(F.array(F.lit(":80"), F.lit(":443"),
                                F.lit(":8080"), F.lit("")),
                        (d % 4 + 1).cast("int"))
    path = F.when(d % 3 == 0, F.lit("/")) \
        .when(d % 3 == 1, F.concat(F.lit("/a/"), d.cast("string"))) \
        .otherwise(F.lit(""))
    query = F.when(d % 2 == 0,
                   F.concat(F.lit("?b=2&a=1&m="), F.col("lang"))) \
        .otherwise(F.lit(""))
    frag = F.when(d % 3 == 0, F.lit("#frag")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), user, www, F.col("source"),
                    F.lit(".Example."), tld, port, path, query, frag)


def _synth_url_sql() -> str:
    tlds = ", ".join(f"'{t}'" for t in URL_TLDS)
    return (
        "list_extract(['HTTP','https','HTTPS','http'], "
        "(doc_id % 4 + 1)::INT) || '://' || "
        "(CASE WHEN doc_id % 7 = 0 THEN 'user:pw@' ELSE '' END) || "
        "(CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) || "
        "source || '.Example.' || "
        f"list_extract([{tlds}], (doc_id % 5 + 1)::INT) || "
        "list_extract([':80',':443',':8080',''], (doc_id % 4 + 1)::INT) || "
        "(CASE WHEN doc_id % 3 = 0 THEN '/' WHEN doc_id % 3 = 1 "
        "THEN '/a/' || doc_id::VARCHAR ELSE '' END) || "
        "(CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&m=' || lang "
        "ELSE '' END) || "
        "(CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END)")


def _q_url_canonicalize(spark, sf_dir) -> DataFrame:
    """URL canonicalization + registrable-domain (eTLD+1) extraction —
    pure column expressions (functions/urls.py), map-only; PSL
    longest-suffix match as a literal-array membership test."""
    from mahout_spark.functions import urls as U

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", _synth_url_expr().alias("url"))
    return docs.select(
        "doc_id", "url",
        U.canonicalize_url(F.col("url")).alias("canon"),
        U.url_host(F.col("url")).alias("host"),
        U.url_domain(F.col("url")).alias("domain"))


def _q_heavy_hitters(spark, sf_dir) -> DataFrame:
    """Misra-Gries heavy hitters (core/spacesaving.py + sketch/queries.
    heavy_hitters): candidates from the sixth mergeable sketch (JVM
    preagg + salted two-phase merge), output made EXACT by one
    pushed-down isin scan + tiny groupBy — so the DuckDB oracle is a
    plain GROUP BY ... HAVING, no sketch replay needed. Deterministic
    regardless of partitioning/ingest order."""
    from mahout_spark.sketch.queries import heavy_hitters

    toks = _doc_tokens(spark, sf_dir).select("token")
    return heavy_hitters(toks, "token", threshold_frac=0.002)


def _q_skew_plan(spark, sf_dir) -> DataFrame:
    """Sketch-driven skew planning (plans/skewplan.py): one Misra-Gries
    pass + exact isin-verify finds every token owning more rows than a
    task budget, and ceil(n/target) assigns its salt fan-out — the
    deterministic salting plan salted_join/groupBy consumers broadcast
    at 10^12-row scale (north rule: skew handled EXPLICITLY). The plan
    is exact by construction, so the oracle is a plain GROUP BY/HAVING
    with the same ceil arithmetic."""
    from mahout_spark.plans.skewplan import skew_plan

    toks = _doc_tokens(spark, sf_dir).select("token")
    return skew_plan(toks, "token", target_rows_per_task=150)


def _q_lm_perplexity(spark, sf_dir) -> DataFrame:
    """CCNet-style LM quality scoring (functions/lm.py): self-train an
    add-0.5-smoothed bigram LM on the documents corpus (two
    explode+groupBy count scans), score every doc's per-token
    cross-entropy via two string equi-joins + an ngram-ordered fold.
    Raw fold is order-deterministic; emitted value rounds to 6dp (the
    repo-wide ln convention — Java Math.log vs libm differ by <= 1
    ulp)."""
    from mahout_spark.functions.lm import lm_cross_entropy, train_lm

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    counts_n, counts_ctx, v = train_lm(docs, "text", n=2)
    out = lm_cross_entropy(docs, "doc_id", "text", counts_n, counts_ctx,
                           v, n=2, k=0.5)
    return out.select("doc_id", "n_ngrams",
                      F.round("cross_entropy", 6).alias("cross_entropy"))


def _q_domain_stats(spark, sf_dir) -> DataFrame:
    """Per-registrable-domain aggregation (functions/urls.py
    domain_stats): algebraic aggregates only, so map-side partials
    absorb Zipf-head domains — one partial row per (task, domain)
    crosses the shuffle. extra_aggs exercises aggregation over a
    source column (total text chars per domain)."""
    from mahout_spark.functions.urls import domain_stats

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text",
        _synth_url_expr().alias("url"))
    return domain_stats(
        docs, "url",
        extra_aggs=[F.sum(F.length("text")).alias("sum_chars")])


# BPE tokenizer + packing/shard gates (session 12): the training-data
# pipeline's tokenize -> pack -> shard last mile. Both BPE oracles replay
# the ENTIRE merge-learning loop in a recursive CTE (no Python-derived
# literals); pack/shard oracles replay the two-phase offsets as one
# global window.
BPE_MERGES_N = 32
PACK_BLOCK, PACK_SEED = 256, 7
SHARD_N, SHARD_SEED = 8, 3


def _q_bpe_merges(spark, sf_dir) -> DataFrame:
    """BPE vocabulary training: one corpus-scale word-count pass +
    deterministic driver-side merge loop (the SentencePiece shape;
    operators/bpe.py). Hash-exact vs the recursive-CTE replay of the
    same loop."""
    from mahout_spark.operators.bpe import bpe_train

    docs = _read(spark, sf_dir, "documents")
    model = bpe_train(docs, "text", n_merges=BPE_MERGES_N)
    return model.merges_df(spark).select(
        F.col("rank").cast("long").alias("rank"), "left", "right", "merged")


def _q_bpe_encode(spark, sf_dir) -> DataFrame:
    """BPE encoding as a pure JVM replace-chain expression (train on the
    same corpus, then encode every document). The oracle re-learns the
    merges AND re-applies them by rank — the full tokenizer pipeline
    replayed end to end."""
    from mahout_spark.operators.bpe import SEP, bpe_encode_expr, bpe_train

    docs = _read(spark, sf_dir, "documents")
    model = bpe_train(docs, "text", n_merges=BPE_MERGES_N)
    toks = bpe_encode_expr(F.col("text"), model.merges)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(SEP, toks)).alias("tokens_md5"))


def _q_sequence_pack(spark, sf_dir) -> DataFrame:
    """GPT-style concat-and-chunk packing of tokenized documents into
    fixed 256-token training sequences in a deterministic pseudo-shuffle
    order (operators/packing.py): two-phase distributed prefix sum,
    slice fan-out, one assembly groupBy."""
    from mahout_spark.functions.text import tokens_array
    from mahout_spark.operators.packing import SEP, pack_sequences

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", tokens_array(F.col("text")).alias("toks"))
    packed = pack_sequences(docs, "doc_id", "toks", PACK_BLOCK,
                            drop_last=True, seed=PACK_SEED)
    return packed.select(
        "seq_id", "n_docs", "n_tokens",
        F.md5(F.concat_ws(",", F.transform(
            "doc_ids", lambda i: i.cast("string")))).alias("doc_ids_md5"),
        F.md5(F.concat_ws(SEP, "tokens")).alias("tokens_md5"))


def _q_shard_plan(spark, sf_dir) -> DataFrame:
    """Deterministic size-balanced shard plan (token-weighted, 8 shards):
    contiguous ranges of the pseudo-shuffle order via exact integer
    arithmetic over the same two-phase offsets."""
    from mahout_spark.functions.text import token_count
    from mahout_spark.operators.packing import shard_assignments

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("w"))
    sh = shard_assignments(docs, "doc_id", SHARD_N, weight_col="w",
                           seed=SHARD_SEED)
    return (sh.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("w").cast("long").alias("sum_weight"),
                 F.md5(F.concat_ws(",", F.transform(
                     F.array_sort(F.collect_list(F.struct(
                         F.col("__k"), F.col("doc_id").alias("i")))),
                     lambda s: s["i"].cast("string")))).alias("ids_md5")))


MIX_SHARES = {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.1}
MIX_EPOCHS, MIX_SEED = 2.0, 11
REQ_QS, REQ_EPS = [0.5, 0.9, 0.99, 0.999], 0.1


def _q_req_event_quantiles(spark, sf_dir) -> DataFrame:
    """REQ relative-error quantiles (core/req.py — Cormode et al. 2021):
    tail quantiles whose rank error shrinks with distance from the top,
    so p99/p999 stay sharp where KLL's additive eps*n bound saturates.
    Verified against exact RELATIVE rank windows (half-width
    ceil(eps*(n-r+1))) — the windows hash-exact, the sketch lands
    inside."""
    from mahout_spark.sketch.agg import req_spec, sketch_by_key
    from mahout_spark.sketch.queries import relative_quantile_bound_check

    ev = _read(spark, sf_dir, "events")
    spec = req_spec(32, seed=5)
    sk = sketch_by_key(ev, ["event_type"], spec, value_col="value")
    return relative_quantile_bound_check(sk, spec, ev, ["event_type"],
                                         "value", REQ_QS, rel_eps=REQ_EPS)


def _q_mixture_plan(spark, sf_dir) -> DataFrame:
    """Corpus mixture plan (functions/mixing.py): target token shares +
    measured per-language availability → closed-form water-filling
    rates with upsampling capped at 2 epochs. One algebraic aggregation;
    every float op pinned multiply-then-divide — hash-exact with no
    rounding."""
    from mahout_spark.functions.mixing import mixture_plan

    docs = _read(spark, sf_dir, "documents")
    return mixture_plan(docs, "lang", "n_chars", MIX_SHARES,
                        max_epochs=MIX_EPOCHS).orderBy("stratum")


def _q_mixture_sample(spark, sf_dir) -> DataFrame:
    """Mixture plan APPLIED: per-document copy counts from the md5 coin
    against driver-computed integer thresholds (floor(rate) full copies
    + fractional coin), aggregated per language. The oracle recomputes
    the plan AND the thresholds fully in-engine — floor((rate −
    floor(rate))·2^60) is an exact exponent shift, so the two threshold
    derivations agree bit-for-bit."""
    from mahout_spark.functions.mixing import apply_mixture, mixture_plan

    docs = _read(spark, sf_dir, "documents")
    plan = mixture_plan(docs, "lang", "n_chars", MIX_SHARES,
                        max_epochs=MIX_EPOCHS)
    ap = apply_mixture(docs, "lang", "doc_id", plan, seed=MIX_SEED)
    key = F.concat(F.col("doc_id").cast("string"), F.lit("#"),
                   F.col("copy").cast("string"))
    return (ap.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars"),
                 F.md5(F.concat_ws(",", F.array_sort(
                     F.collect_list(key)))).alias("keys_md5")))


def _q_bpe_pack(spark, sf_dir) -> DataFrame:
    """Tokenize→pack COMPOSITION: BPE-encode every document with a
    corpus-trained merge table (operators/bpe.py), then concat-and-chunk
    the token streams into fixed blocks (operators/packing.py). The
    oracle replays the ENTIRE chain — merge learning, rank-order encode,
    global-order prefix sum, block slicing — in one DuckDB statement
    with no Python-derived literals: the last mile of the training-data
    pipeline proven hash-exact end to end, not just stage by stage."""
    from mahout_spark.operators.bpe import bpe_encode_expr, bpe_train
    from mahout_spark.operators.packing import SEP, pack_sequences

    docs = _read(spark, sf_dir, "documents")
    model = bpe_train(docs, "text", n_merges=BPE_MERGES_N)
    enc = docs.select(
        "doc_id", bpe_encode_expr(F.col("text"), model.merges).alias("toks"))
    packed = pack_sequences(enc, "doc_id", "toks", PACK_BLOCK,
                            drop_last=True, seed=PACK_SEED)
    return packed.select(
        "seq_id", "n_docs", "n_tokens",
        F.md5(F.concat_ws(",", F.transform(
            "doc_ids", lambda i: i.cast("string")))).alias("doc_ids_md5"),
        F.md5(F.concat_ws(SEP, "tokens")).alias("tokens_md5"))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cms_point_frequency": _q_cms_point_frequency,
        "cms_point_merged": _q_cms_point_merged,
        "checkpoint_resume_cms": _q_checkpoint_resume,
        "cms_cosine_lang": _q_cms_cosine_lang,
        "cms_inner_lang": _q_cms_inner_lang,
        "countsketch_point_frequency": _q_countsketch_point_frequency,
        "countsketch_inner_lang": _q_countsketch_inner_lang,
        "cms_point_noised": _q_cms_point_noised,
        "cms_inner_noised_lang": _q_cms_inner_noised_lang,
        "join_size_estimate": _q_join_size_estimate,
        "token_drift_topk": _q_token_drift_topk,
        "corpus_language_stats": _q_corpus_language_stats,
        "hll_distinct_tokens": _q_hll_distinct_tokens,
        "hll_rollup_distinct": _q_hll_rollup_distinct,
        "tdigest_price_quantiles": _q_tdigest_price_quantiles,
        "kll_event_quantiles": _q_kll_event_quantiles,
        "bloom_token_filter": _q_bloom_token_filter,
        "windowed_tdigest_events": _q_windowed_tdigest_events,
        "windowed_cms_events": _q_windowed_cms_events,
        "cms_rollup_lang": _q_cms_rollup_lang,
        "cms_rollup_weekly": _q_cms_rollup_weekly,
        "cooccurrence_topk": _q_cooccurrence_topk,
        "llr_item_similarity": _q_llr_item_similarity,
        "cross_similarity_llr": _q_cross_similarity_llr,
        "rowsim_tanimoto": _q_rowsim_tanimoto,
        "rowsim_cosine": _q_rowsim_cosine,
        "rowsim_pearson": _q_rowsim_pearson,
        "rowsim_euclidean": _q_rowsim_euclidean,
        "rowsim_cityblock": _q_rowsim_cityblock,
        "ata_gramian": _q_ata_gramian,
        "dcol_mean_cov": _q_dcol_mean_cov,
        "feature_hashing": _q_feature_hashing,
        "recommend_cooc": _q_recommend_cooc,
        "recommend_cms": _q_recommend_cms,
        "recommend_itembased": _q_recommend_itembased,
        "recommend_svd": _q_recommend_svd,
        "factorization_rmse": _q_factorization_rmse,
        "vecdist_euclidean": _q_vecdist_euclidean,
        "kmeans_assign": _q_kmeans_assign,
        "fuzzy_kmeans_memberships": _q_fuzzy_memberships,
        "ols_fit": _q_ols_fit,
        "lda_cvb0_gamma": _q_lda_cvb0_gamma,
        "sgd_classify": _q_sgd_classify,
        "rf_classify": _q_rf_classify,
        "rf_ig_split": _q_rf_ig_split,
        "hmm_supervised": _q_hmm_supervised,
        "fp_growth": _q_fp_growth,
        "recommend_boolean": _q_recommend_boolean,
        "user_similarity_tanimoto": _q_user_similarity_tanimoto,
        "user_similarity_spearman": _q_user_similarity_spearman,
        "abt_product": _q_abt_product,
        "rating_sgd_recommend": _q_rating_sgd_recommend,
        "implicit_als_recommend": _q_implicit_als_recommend,
        "projection_search_topk": _q_projection_search,
        "recommend_anonymous": _q_recommend_anonymous,
        "dsq_dist": _q_dsq_dist,
        "drm_colstats": _q_drm_colstats,
        "doc_token_stats": _q_doc_token_stats,
        "tfidf": _q_tfidf,
        "bigram_collocations": _q_bigram_collocations,
        "nb_model_standard": _q_nb_model_standard,
        "nb_classify_standard": _q_nb_classify_standard,
        "nb_classify_complementary": _q_nb_classify_complementary,
        "exact_dedup": _q_exact_dedup,
        "minhash_signatures": _q_minhash_signatures,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "streaming_minhash_pairs": _q_streaming_minhash,
        "simhash": _q_simhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "ann_topk": _q_ann_topk,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "dedup_groups": _q_dedup_groups,
        "recommend_itemavg": _q_recommend_itemavg,
        "ir_stats_at_5": _q_ir_stats,
        "recommend_rescored": _q_recommend_rescored,
        "recommend_itemuseravg": _q_recommend_itemuseravg,
        "vecdist_chebyshev": _q_vecdist_chebyshev,
        "cluster_classify": _q_cluster_classify,
        "auc_scores": _q_auc_scores,
        "confusion_binary": _q_confusion_binary,
        "ewa_events": _q_ewa_events,
        "gopher_quality": _q_gopher_quality,
        "c4_line_filter": _q_c4_line_filter,
        "line_dedup_corpus": _q_line_dedup,
        "url_canonicalize": _q_url_canonicalize,
        "domain_stats": _q_domain_stats,
        "grouped_online_auc": _q_grouped_online_auc,
        "cg_solve": _q_cg_solve,
        "lanczos_tridiag": _q_lanczos_tridiag,
        "pii_redaction": _q_pii_redaction,
        "lm_doc_perplexity": _q_lm_perplexity,
        "heavy_hitters_tokens": _q_heavy_hitters,
        "skew_salt_plan": _q_skew_plan,
        "dedup_keep_best": _q_dedup_keep_best,
        "stratified_sample": _q_stratified_sample,
        "thin_qr_r": _q_thin_qr_r,
        "pii_scrub": _q_pii_scrub,
        "substring_dup_spans": _q_substring_spans,
        "substring_dedup_clean": _q_substring_clean,
        "decontamination_spans": _q_decontamination,
        "semdedup_keep": _q_semdedup,
        "dsir_weights": _q_dsir_weights,
        "fd_gramian_bound": _q_fd_bound,
        "unicode_nfc_docs": _q_unicode_nfc,
        "theta_user_overlap": _q_theta_overlap,
        "priority_sample_docs": _q_priority_sample_docs,
        "priority_lang_totals": _q_priority_lang_totals,
        "pq_adc_topk": _q_pq_adc_topk,
        "tuple_lang_totals": _q_tuple_lang_totals,
        "moments_lang_chars": _q_moments_lang_chars,
        "counting_bloom_retract": _q_counting_bloom_retract,
        "agg_strategy_plan": _q_agg_strategy_plan,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "sequence_pack": _q_sequence_pack,
        "shard_plan": _q_shard_plan,
        "bpe_pack": _q_bpe_pack,
        "mixture_plan": _q_mixture_plan,
        "mixture_sample": _q_mixture_sample,
        "req_event_quantiles": _q_req_event_quantiles,
    }


def _lda_gamma_oracle() -> str:
    from mahout_spark.operators.lda import cvb0_doc_gamma_sql

    return cvb0_doc_gamma_sql(LDA_CORPUS_SQL, LDA_K, LDA_V)


def _rf_classify_oracle() -> str:
    from mahout_spark.operators.randomforest import (DecisionForest,
                                                     forest_predict_sql)

    expr = forest_predict_sql(DecisionForest(RF_TREES, n_labels=3),
                              ["x1", "x2"])
    return (f"SELECT order_id, {expr} AS prediction "
            f"FROM ({RF_SRC_SQL}) t")


def _rf_ig_split_oracle() -> str:
    from mahout_spark.operators.randomforest import ig_numeric_split_sql

    src = ("SELECT l_quantity::DOUBLE AS v, (l_linenumber % 3)::INT AS y "
           "FROM lineitem")
    return ig_numeric_split_sql(src, n_labels=3)


def _hmm_supervised_oracle() -> str:
    from mahout_spark.operators.hmm import hmm_supervised_sql

    return hmm_supervised_sql(HMM_EVENTS_SQL, HMM_H, HMM_O,
                              pseudo_count=1.0)


def _fp_growth_oracle() -> str:
    from mahout_spark.operators.fpm import frequent_itemsets_sql

    return frequent_itemsets_sql(FPM_SRC_SQL, FPM_MIN_SUPPORT,
                                 FPM_MAX_LEN)


def _substring_spans_oracle() -> str:
    from mahout_spark.operators.substring import duplicate_spans_sql

    return duplicate_spans_sql(_SS_INJECT_SQL, k=_SS_K, min_count=2)


def _decontamination_oracle() -> str:
    from mahout_spark.operators.substring import contamination_spans_sql

    return contamination_spans_sql("documents", _dc_bench_sql(), k=_DC_K)


def _dsir_oracle() -> str:
    from mahout_spark.functions.dsir import dsir_log_weights_sql

    return dsir_log_weights_sql(
        "documents", "(SELECT doc_id, text FROM documents "
        "WHERE lang = 'en')", buckets=4096, round_dp=6)


def _semdedup_oracle() -> str:
    from mahout_spark.operators.semdedup import semdedup_sql

    return semdedup_sql(_SD_CORPUS_SQL, _SD_CENTERS_SQL, threshold=0.99)


def _substring_clean_oracle() -> str:
    from mahout_spark.operators.substring import remove_duplicate_spans_sql

    sql = remove_duplicate_spans_sql(_SS_INJECT_SQL, k=_SS_K, min_count=2)
    return (f"SELECT doc_id, md5(text_dedup) AS clean_md5, n_dup_units "
            f"FROM ({sql})")


def _theta_overlap_oracle() -> str:
    from mahout_spark.sketch.queries import theta_overlap_oracle_sql

    src = "SELECT event_type, user_id::VARCHAR AS ukey FROM events"
    return theta_overlap_oracle_sql(src, "event_type", "ukey", k=64)


def _pq_adc_oracle() -> str:
    from mahout_spark.operators.pq import adc_topk_sql

    # dsub is fixed by the testdata schema (64-dim embeddings / m=4),
    # matching _pq_fixed_books' division of the same table
    dsub = 64 // PQ_M
    corpus_sql = "SELECT * FROM embeddings"
    sp = ", ".join(f"({j}, {j * dsub + 1}, {(j + 1) * dsub})"
                   for j in range(PQ_M))
    book_sql = (f"SELECT vec_id AS c, j, (embedding::DOUBLE[])[lo:hi] AS cb "
                f"FROM ({corpus_sql}) CROSS JOIN (VALUES {sp}) "
                f"AS sp(j, lo, hi) WHERE vec_id < {PQ_KSUB}")
    q_sql = (f"SELECT vec_id AS query_id, embedding FROM ({corpus_sql}) "
             f"WHERE vec_id IN (7, 11)")
    return adc_topk_sql(corpus_sql, book_sql, q_sql, PQ_M, dsub, k=8)


def _priority_inner_sql() -> str:
    from mahout_spark.sketch.queries import priority_sample_oracle_sql

    return priority_sample_oracle_sql(
        "SELECT * FROM documents", "doc_id::VARCHAR", "n_chars", k=32)


def _priority_sample_oracle() -> str:
    from mahout_spark.functions.hashutil import md5_long60_sql

    u = f"({md5_long60_sql('doc_id::VARCHAR')} + 1)"
    return f"""
WITH __sample AS ({_priority_inner_sql()}),
__keyed AS (SELECT {u} AS u, doc_id, lang FROM documents)
SELECT s.rank, k.doc_id, k.lang, s.u, s.w, s.tau, s.w_hat
FROM __sample s JOIN __keyed k USING (u)
"""


def _tuple_totals_oracle() -> str:
    from mahout_spark.sketch.queries import tuple_totals_oracle_sql

    inner = tuple_totals_oracle_sql(
        "SELECT lang, doc_id::VARCHAR AS doc_id, n_chars FROM documents",
        "lang", "doc_id", "n_chars", k=32)
    return f"""
WITH __tu AS ({inner}),
__exact AS (SELECT lang, count(DISTINCT doc_id)::DOUBLE AS exact_docs,
                   SUM(n_chars)::DOUBLE AS exact_chars
            FROM documents GROUP BY lang)
SELECT t.lang, t.n_retained, t.theta::BIGINT AS theta, t.est_distinct,
       t.est_total, e.exact_docs, e.exact_chars
FROM __tu t JOIN __exact e USING (lang)
"""


def _bpe_merges_oracle() -> str:
    from mahout_spark.operators.bpe import bpe_train_oracle_sql

    return bpe_train_oracle_sql("SELECT text FROM documents", BPE_MERGES_N)


def _bpe_encode_oracle() -> str:
    from mahout_spark.operators.bpe import bpe_encode_oracle_sql

    return bpe_encode_oracle_sql("SELECT doc_id, text FROM documents",
                                 BPE_MERGES_N)


def _sequence_pack_oracle() -> str:
    from mahout_spark.functions.text import tokens_array_sql
    from mahout_spark.operators.packing import pack_sequences_oracle_sql

    return pack_sequences_oracle_sql(
        "SELECT doc_id, text FROM documents", "doc_id",
        tokens_array_sql("text"), PACK_BLOCK, drop_last=True,
        seed=PACK_SEED)


def _req_quantiles_oracle() -> str:
    from mahout_spark.sketch.queries import (
        relative_quantile_bound_oracle_sql)

    return relative_quantile_bound_oracle_sql(
        "SELECT event_type, value FROM events", ["event_type"], "value",
        REQ_QS, REQ_EPS)


def _mixture_plan_oracle() -> str:
    from mahout_spark.functions.mixing import mixture_plan_sql

    return (mixture_plan_sql("SELECT * FROM documents", "lang",
                             "n_chars", MIX_SHARES,
                             max_epochs=MIX_EPOCHS)
            + " ORDER BY stratum")


def _mixture_sample_oracle() -> str:
    from mahout_spark.functions.mixing import mixture_sample_oracle_sql

    ap = mixture_sample_oracle_sql(
        "SELECT * FROM documents", "lang", "doc_id", "n_chars",
        MIX_SHARES, max_epochs=MIX_EPOCHS, seed=MIX_SEED)
    return f"""
SELECT lang, count(*)::BIGINT AS n_rows,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       md5(array_to_string(
           list(doc_id::VARCHAR || '#' || copy::VARCHAR
                ORDER BY doc_id::VARCHAR || '#' || copy::VARCHAR), ','))
         AS keys_md5
FROM ({ap}) GROUP BY lang
"""


def _bpe_pack_oracle() -> str:
    from mahout_spark.operators.bpe import bpe_encode_arrays_sql
    from mahout_spark.operators.packing import pack_sequences_oracle_sql

    enc = bpe_encode_arrays_sql("SELECT doc_id, text FROM documents",
                                BPE_MERGES_N)
    return pack_sequences_oracle_sql(enc, "doc_id", "tokens", PACK_BLOCK,
                                     drop_last=True, seed=PACK_SEED)


def _shard_plan_oracle() -> str:
    from mahout_spark.functions.text import tokens_array_sql
    from mahout_spark.operators.packing import shard_plan_oracle_sql

    return shard_plan_oracle_sql(
        "SELECT doc_id, text FROM documents", "doc_id",
        f"len({tokens_array_sql('text')})", SHARD_N, seed=SHARD_SEED)


def _agg_plan_oracle() -> str:
    from mahout_spark.plans.aggplan import agg_plan_oracle_sql

    parts = [
        agg_plan_oracle_sql("SELECT lang FROM documents", "lang",
                            "docs_lang", **AGGPLAN_PARAMS["docs_lang"]),
        agg_plan_oracle_sql("SELECT event_id FROM events",
                            "event_id::VARCHAR", "events_id",
                            **AGGPLAN_PARAMS["events_id"]),
        agg_plan_oracle_sql("SELECT user_id FROM events",
                            "user_id::VARCHAR", "events_user",
                            **AGGPLAN_PARAMS["events_user"]),
    ]
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


def _moments_oracle() -> str:
    from mahout_spark.sketch.queries import moments_oracle_sql

    return moments_oracle_sql("SELECT lang, n_chars FROM documents",
                              "lang", "n_chars", t=4)


def _priority_totals_oracle() -> str:
    from mahout_spark.functions.hashutil import md5_long60_sql

    u = f"({md5_long60_sql('doc_id::VARCHAR')} + 1)"
    return f"""
WITH __sample AS ({_priority_inner_sql()}),
__keyed AS (SELECT {u} AS u, lang FROM documents),
__j AS (SELECT k.lang, s.u, s.w_hat
        FROM __sample s JOIN __keyed k USING (u)),
__agg AS (SELECT lang, count(*)::INT AS n_sampled,
                 list_sum(list(w_hat ORDER BY u)) AS est_chars
          FROM __j GROUP BY lang),
__exact AS (SELECT lang, SUM(n_chars)::DOUBLE AS exact_chars
            FROM documents GROUP BY lang)
SELECT e.lang, e.exact_chars,
       COALESCE(a.n_sampled, 0)::INT AS n_sampled,
       COALESCE(a.est_chars, 0.0)::DOUBLE AS est_chars
FROM __exact e LEFT JOIN __agg a USING (lang)
"""


def _unicode_nfc_oracle() -> str:
    from mahout_spark.functions.unicode import (nfc_normalize_sql,
                                                strip_control_chars_sql)

    norm = nfc_normalize_sql(strip_control_chars_sql("text"))
    return (f"SELECT doc_id, md5({norm}) AS nfc_md5, "
            f"(length(text) - length({norm}))::BIGINT AS n_chars_delta "
            f"FROM {_nfc_inject_sql()}")


def _sgd_classify_oracle() -> str:
    import numpy as np

    from mahout_spark.operators.sgd import logistic_classify_sql

    table = ("(SELECT l_orderkey AS order_id, count(*)::DOUBLE AS x1, "
             "(sum(l_quantity) / 100.0)::DOUBLE AS x2 "
             "FROM lineitem GROUP BY 1) t")
    return logistic_classify_sql(table, np.array(SGD_BETA), ["x1", "x2"],
                                 "order_id")


def oracle_sql() -> dict[str, str]:
    from mahout_spark.functions.measures import llr_cooc_sql
    from mahout_spark.functions.text import (content_fingerprint_sql,
                                             detect_lang_sql,
                                             quality_score_sql,
                                             token_count_sql,
                                             tokens_array_sql)
    from mahout_spark.operators.ann import brute_force_topk_sql, cosine_sql
    from mahout_spark.operators.dedup import (dedup_groups_sql,
                                              embedding_neardup_lsh_sql,
                                              exact_dedup_groups_sql,
                                              minhash_signatures_sql,
                                              ngram_jaccard_pairs_sql,
                                              pick_representatives_sql,
                                              simhash_sql)
    from mahout_spark.operators.evaluation import auc_sql
    from mahout_spark.operators.naivebayes import (nb_classify_sql,
                                                   nb_model_sql)
    from mahout_spark.operators.vectorize import (bigram_collocations_sql,
                                                  tfidf_sql)
    from mahout_spark.core.hashing import BIG_PRIME, affine_params
    from mahout_spark.functions.corpus import per_language_stats_sql
    from mahout_spark.plans.joinsize import countsketch_join_size_oracle_sql
    from mahout_spark.sketch.queries import (bloom_filter_count_oracle_sql,
                                             counting_bloom_oracle_sql,
                                             cms_pairwise_noised_oracle_sql,
                                             cms_pairwise_oracle_sql,
                                             cms_point_grouped_oracle_sql,
                                             cms_point_noised_oracle_sql,
                                             cms_point_oracle_sql,
                                             countsketch_drift_topk_oracle_sql,
                                             countsketch_pairwise_oracle_sql,
                                             countsketch_point_oracle_sql,
                                             hll_distinct_oracle_sql,
                                             quantile_bound_oracle_sql)

    toksrc = _toksrc_sql()
    from mahout_spark.functions.text import tokens_array_sql
    toksrc_src = (f"SELECT doc_id, lang, source, "
                  f"unnest({tokens_array_sql('text')}) AS token "
                  f"FROM documents")
    GATE_PREFS_SQL = (
        "SELECT o_custkey AS u, l_partkey AS i, "
        "(sum(l_quantity))::DOUBLE AS p "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2")
    probe = (f"SELECT token FROM ({toksrc}) GROUP BY token "
             f"ORDER BY count(*) DESC, token LIMIT 25")
    llr = llr_cooc_sql("n_a", "n_b", "n_ab", "n_users")

    cooc_sql = f"""
WITH inter AS (SELECT DISTINCT l_orderkey AS r, l_partkey AS c FROM lineitem),
pairs AS (SELECT a.c AS item_a, b.c AS item_b, count(*) AS n_ab
          FROM inter a JOIN inter b ON a.r = b.r AND a.c <> b.c GROUP BY 1, 2),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY item_a ORDER BY n_ab DESC, item_b) AS rn FROM pairs)
SELECT item_a, item_b, n_ab FROM ranked WHERE rn <= {TOPK}
"""

    llr_sql = f"""
WITH inter AS (SELECT DISTINCT l_orderkey AS r, l_partkey AS c FROM lineitem),
nu AS (SELECT count(DISTINCT r) AS n_users FROM inter),
ic AS (SELECT c, count(*) AS n FROM inter GROUP BY c),
pairs AS (SELECT a.c AS item_a, b.c AS item_b, count(*) AS n_ab
          FROM inter a JOIN inter b ON a.r = b.r AND a.c <> b.c GROUP BY 1, 2),
scored AS (
  SELECT item_a, item_b, n_ab,
         ca.n AS n_a, cb.n AS n_b, (SELECT n_users FROM nu) AS n_users
  FROM pairs JOIN ic ca ON ca.c = item_a JOIN ic cb ON cb.c = item_b),
vals AS (SELECT item_a, item_b, n_ab, {llr} AS llr FROM scored),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY item_a ORDER BY llr DESC, item_b) AS rn FROM vals)
SELECT item_a, item_b, n_ab, round(llr, 6) AS llr
FROM ranked WHERE rn <= {TOPK}
"""

    rowsim_tanimoto_sql = f"""
WITH t AS (SELECT DISTINCT l_orderkey AS r, l_partkey AS c FROM lineitem),
sizes AS (SELECT r, count(*)::DOUBLE AS nz FROM t GROUP BY r),
dots AS (SELECT a.r AS row_a, b.r AS row_b, count(*)::DOUBLE AS d
         FROM t a JOIN t b ON a.c = b.c AND a.r <> b.r GROUP BY 1, 2),
scored AS (SELECT row_a, row_b, d / (sa.nz + sb.nz - d) AS sim
           FROM dots JOIN sizes sa ON sa.r = row_a
                     JOIN sizes sb ON sb.r = row_b),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY row_a ORDER BY sim DESC, row_b) AS rn FROM scored)
SELECT row_a, row_b, sim FROM ranked WHERE rn <= {TOPK}
"""

    rowsim_cosine_sql = f"""
WITH t AS (SELECT l_orderkey AS r, l_partkey AS c, (l_quantity)::DOUBLE AS v
           FROM lineitem),
norms AS (SELECT r, sum(v * v) AS nn FROM t GROUP BY r),
dots AS (SELECT a.r AS row_a, b.r AS row_b, sum(a.v * b.v) AS d
         FROM t a JOIN t b ON a.c = b.c AND a.r <> b.r GROUP BY 1, 2),
scored AS (SELECT row_a, row_b, (d / (sqrt(na.nn) * sqrt(nb.nn))) AS sim
           FROM dots JOIN norms na ON na.r = row_a
                     JOIN norms nb ON nb.r = row_b),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY row_a ORDER BY sim DESC, row_b) AS rn FROM scored)
SELECT row_a, row_b, sim FROM ranked WHERE rn <= {TOPK}
"""

    rowsim_pearson_sql = f"""
WITH t AS (SELECT l_orderkey AS r, l_partkey AS c, (l_quantity)::DOUBLE AS v
           FROM lineitem),
stats AS (SELECT r, count(*)::DOUBLE AS n, sum(v) AS s FROM t GROUP BY r),
w AS (SELECT t.r, t.c, stats.n * t.v - stats.s AS w
      FROM t JOIN stats ON stats.r = t.r
      WHERE stats.n * t.v - stats.s <> 0),
norms AS (SELECT r, sum(w * w) AS nn FROM w GROUP BY r),
dots AS (SELECT a.r AS row_a, b.r AS row_b, sum(a.w * b.w) AS d
         FROM w a JOIN w b ON a.c = b.c AND a.r <> b.r GROUP BY 1, 2),
scored AS (SELECT row_a, row_b, (d / (sqrt(na.nn) * sqrt(nb.nn))) AS sim
           FROM dots JOIN norms na ON na.r = row_a
                     JOIN norms nb ON nb.r = row_b),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY row_a ORDER BY sim DESC, row_b) AS rn FROM scored)
SELECT row_a, row_b, sim FROM ranked WHERE rn <= {TOPK}
"""

    cross_llr_sql = f"""
WITH a AS (SELECT DISTINCT l_orderkey AS r, l_partkey AS c FROM lineitem),
b AS (SELECT DISTINCT l_orderkey AS r, l_suppkey AS c FROM lineitem),
nu AS (SELECT count(*) AS n_users
       FROM (SELECT r FROM a UNION SELECT r FROM b)),
ca AS (SELECT c, count(*) AS n_a FROM a GROUP BY c),
cb AS (SELECT c, count(*) AS n_b FROM b GROUP BY c),
pairs AS (SELECT a.c AS item_a, b.c AS item_b, count(*) AS n_ab
          FROM a JOIN b ON a.r = b.r GROUP BY 1, 2),
scored AS (
  SELECT item_a, item_b, n_ab, ca.n_a, cb.n_b,
         (SELECT n_users FROM nu) AS n_users
  FROM pairs JOIN ca ON ca.c = item_a JOIN cb ON cb.c = item_b),
vals AS (SELECT item_a, item_b, n_ab, {llr} AS llr FROM scored),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY item_a ORDER BY llr DESC, item_b) AS rn FROM vals)
SELECT item_a, item_b, n_ab, round(llr, 6) AS llr
FROM ranked WHERE rn <= {TOPK}
"""

    rowsim_euclid_sql = f"""
WITH t AS (SELECT l_orderkey AS r, l_partkey AS c, (l_quantity)::DOUBLE AS v
           FROM lineitem),
norms AS (SELECT r, sum(v * v) AS nn FROM t GROUP BY r),
dots AS (SELECT a.r AS row_a, b.r AS row_b, sum(a.v * b.v) AS d
         FROM t a JOIN t b ON a.c = b.c AND a.r <> b.r GROUP BY 1, 2),
scored AS (SELECT row_a, row_b,
                  1.0 / (1.0 + sqrt(greatest(0.0, na.nn - 2.0*d + nb.nn)))
                  AS sim
           FROM dots JOIN norms na ON na.r = row_a
                     JOIN norms nb ON nb.r = row_b),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY row_a ORDER BY sim DESC, row_b) AS rn FROM scored)
SELECT row_a, row_b, sim FROM ranked WHERE rn <= {TOPK}
"""

    rowsim_cityblock_sql = f"""
WITH t AS (SELECT DISTINCT l_orderkey AS r, l_partkey AS c FROM lineitem),
sizes AS (SELECT r, count(*)::DOUBLE AS nz FROM t GROUP BY r),
dots AS (SELECT a.r AS row_a, b.r AS row_b, count(*)::DOUBLE AS d
         FROM t a JOIN t b ON a.c = b.c AND a.r <> b.r GROUP BY 1, 2),
scored AS (SELECT row_a, row_b,
                  1.0 / (1.0 + sa.nz + sb.nz - 2.0*d) AS sim
           FROM dots JOIN sizes sa ON sa.r = row_a
                     JOIN sizes sb ON sb.r = row_b),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY row_a ORDER BY sim DESC, row_b) AS rn FROM scored)
SELECT row_a, row_b, sim FROM ranked WHERE rn <= {TOPK}
"""

    ata_sql = """
WITH t AS (SELECT l_orderkey AS r, l_partkey AS c, sum(l_quantity) AS v
           FROM lineitem GROUP BY 1, 2)
SELECT a.c AS part_a, b.c AS part_b, sum(a.v * b.v) AS gram
FROM t a JOIN t b ON a.r = b.r GROUP BY 1, 2
"""

    dcol_cov_sql = """
WITH t AS (SELECT l_orderkey AS r, l_linenumber - 1 AS c,
                  sum(l_quantity)::DOUBLE AS v
           FROM lineitem GROUP BY 1, 2),
nn AS (SELECT count(DISTINCT r)::DOUBLE AS n FROM t),
mu AS (SELECT c, sum(v) / (SELECT n FROM nn) AS m FROM t GROUP BY c),
gram AS (SELECT a.c AS ci, b.c AS cj, sum(a.v * b.v) AS g
         FROM t a JOIN t b ON a.r = b.r GROUP BY 1, 2),
cells AS (SELECT mi.c AS col_i, mj.c AS col_j, mi.m AS mi, mj.m AS mj
          FROM mu mi CROSS JOIN mu mj)
SELECT col_i, col_j,
       round(coalesce(g, 0) / (SELECT n FROM nn) - mi * mj, 9) AS cov
FROM cells LEFT JOIN gram ON ci = col_i AND cj = col_j
"""

    from mahout_spark.functions.hashutil import md5_long60_sql as _md5sql

    feature_hashing_sql = f"""
WITH tok AS (SELECT doc_id, unnest({tokens_array_sql('text')}) AS token
             FROM documents)
SELECT doc_id, ({_md5sql('token')}) % 256 AS bucket, count(*) AS weight
FROM tok GROUP BY 1, 2
"""

    recommend_sql = """
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
sims AS (SELECT a.u AS ua, b.u AS ub, count(*)::DOUBLE AS sim
         FROM prefs a JOIN prefs b ON a.i = b.i AND a.u <> b.u GROUP BY 1, 2),
nb AS (SELECT *, row_number() OVER (
    PARTITION BY ua ORDER BY sim DESC, ub) AS rn FROM sims),
cand AS (
  SELECT nb.ua AS u, pr.i AS it, nb.sim, pr.p
  FROM nb JOIN prefs pr ON pr.u = nb.ub
  WHERE nb.rn <= 10
    AND NOT EXISTS (SELECT 1 FROM prefs s WHERE s.u = nb.ua AND s.i = pr.i)),
est AS (SELECT u, it, sum(sim * p) / sum(sim) AS score,
               count(*) AS n FROM cand GROUP BY 1, 2),
ranked AS (SELECT u, it, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, it) AS rn
  FROM est WHERE n >= 2)
SELECT u AS user_id, it AS item_id, score FROM ranked WHERE rn <= 5
"""

    # IDRescorer twin of recommend_sql: filtered ids cut before the
    # estimate agg (TopItems.java:62 checks isFiltered pre-estimate; the
    # estimate only aggregates over the candidate's own rows, so cutting
    # candidates never changes surviving scores), rescore applied before
    # ranking (TopItems.java:70-73).
    recommend_rescored_sql = """
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
sims AS (SELECT a.u AS ua, b.u AS ub, count(*)::DOUBLE AS sim
         FROM prefs a JOIN prefs b ON a.i = b.i AND a.u <> b.u GROUP BY 1, 2),
nb AS (SELECT *, row_number() OVER (
    PARTITION BY ua ORDER BY sim DESC, ub) AS rn FROM sims),
cand AS (
  SELECT nb.ua AS u, pr.i AS it, nb.sim, pr.p
  FROM nb JOIN prefs pr ON pr.u = nb.ub
  WHERE nb.rn <= 10
    AND pr.i % 7 <> 0
    AND NOT EXISTS (SELECT 1 FROM prefs s WHERE s.u = nb.ua AND s.i = pr.i)),
est AS (SELECT u, it, sum(sim * p) / sum(sim) AS score,
               count(*) AS n FROM cand GROUP BY 1, 2),
rescored AS (
  SELECT u, it,
         CASE WHEN it % 3 = 0 THEN score * 1.5 ELSE score END AS score
  FROM est WHERE n >= 2),
ranked AS (SELECT u, it, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, it) AS rn
  FROM rescored)
SELECT u AS user_id, it AS item_id, score FROM ranked WHERE rn <= 5
"""

    kmeans_assign_sql = """
WITH centers AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 8),
dists AS (
  SELECT e.vec_id, c.c,
         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv),
                                 p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM embeddings e CROSS JOIN centers c),
best AS (SELECT vec_id, c, d, row_number() OVER (
           PARTITION BY vec_id ORDER BY d, c) AS rn FROM dists)
SELECT vec_id, c AS cluster, round(d, 6) AS dist2 FROM best WHERE rn = 1
"""

    # fuzzy memberships at fixed centers, m=2 (p = -2/(m-1) = -2). tot is
    # summed in cluster order (list ORDER BY c, left-fold list_sum) to
    # mirror Spark's ws[0]+ws[1]+... float-addition order exactly.
    fuzzy_memberships_sql = """
WITH centers AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 8),
w AS (
  SELECT e.vec_id, c.c,
         pow(greatest(sqrt(
           list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cv),
                                   p -> (p[1] - p[2]) * (p[1] - p[2])))),
           1e-10), -2.0) AS wv
  FROM embeddings e CROSS JOIN centers c),
t AS (SELECT vec_id, list_sum(list(wv ORDER BY c)) AS tot
      FROM w GROUP BY 1)
SELECT w.vec_id, w.c AS cluster, round(w.wv / t.tot, 6) AS prob
FROM w JOIN t USING (vec_id)
"""

    recommend_boolean_sql = """
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
sims AS (SELECT a.u AS ua, b.u AS ub, count(*)::DOUBLE AS sim
         FROM prefs a JOIN prefs b ON a.i = b.i AND a.u <> b.u GROUP BY 1, 2),
nb AS (SELECT *, row_number() OVER (
    PARTITION BY ua ORDER BY sim DESC, ub) AS rn FROM sims),
cand AS (
  SELECT nb.ua AS u, pr.i AS it, nb.sim
  FROM nb JOIN prefs pr ON pr.u = nb.ub
  WHERE nb.rn <= 10
    AND NOT EXISTS (SELECT 1 FROM prefs s WHERE s.u = nb.ua AND s.i = pr.i)),
est AS (SELECT u, it, sum(sim) AS score FROM cand GROUP BY 1, 2),
ranked AS (SELECT u, it, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, it) AS rn FROM est)
SELECT u AS user_id, it AS item_id, score FROM ranked WHERE rn <= 5
"""

    recommend_svd_sql = """
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 100 GROUP BY 1, 2),
uf AS (SELECT u, sum(p) AS f0, count(*)::DOUBLE AS f1 FROM prefs GROUP BY 1),
vf AS (SELECT i, sum(p) AS f0, count(*)::DOUBLE AS f1 FROM prefs GROUP BY 1),
cand AS (SELECT uf.u, vf.i, uf.f0 * vf.f0 + uf.f1 * vf.f1 AS score
         FROM uf CROSS JOIN vf
         WHERE NOT EXISTS (SELECT 1 FROM prefs s
                           WHERE s.u = uf.u AND s.i = vf.i)),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, i) AS rn FROM cand)
SELECT u AS user_id, i AS item_id, round(score, 6) AS score
FROM ranked WHERE rn <= 5
"""

    from mahout_spark.functions.hashutil import md5_long60_sql as _h60

    factorization_rmse_sql = f"""
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 150 GROUP BY 1, 2),
tagged AS (SELECT *,
    {_h60("u::VARCHAR || '|' || i::VARCHAR")} % 5 AS coin FROM prefs),
train AS (SELECT u, i, p FROM tagged WHERE coin <> 0),
probe AS (SELECT u, i, p FROM tagged WHERE coin = 0),
uf AS (SELECT u, sum(p) AS f0, count(*)::DOUBLE AS f1 FROM train GROUP BY 1),
vf AS (SELECT i, sum(p) AS f0, count(*)::DOUBLE AS f1 FROM train GROUP BY 1),
scored AS (SELECT probe.u, probe.i, probe.p,
                  uf.f0 * vf.f0 + uf.f1 * vf.f1 AS est
           FROM probe JOIN uf ON uf.u = probe.u JOIN vf ON vf.i = probe.i)
SELECT (SELECT count(*) FROM probe) AS n_probe,
       count(*) AS n_scored,
       round(avg(abs(p - est)), 6) AS mae,
       round(sqrt(avg((p - est) * (p - est))), 6) AS rmse
FROM scored
"""

    user_tanimoto_sql = f"""
WITH prefs AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               WHERE o_custkey < 300),
sz AS (SELECT u, count(*) AS n FROM prefs GROUP BY u),
pairs AS (SELECT a.u AS ua, b.u AS ub, count(*) AS n
          FROM prefs a JOIN prefs b ON a.i = b.i AND a.u <> b.u
          GROUP BY 1, 2),
scored AS (SELECT ua AS user_a, ub AS user_b,
                  pairs.n::DOUBLE / (sa.n + sb.n - pairs.n) AS sim,
                  pairs.n AS n
           FROM pairs JOIN sz sa ON sa.u = ua JOIN sz sb ON sb.u = ub),
ranked AS (SELECT *, row_number() OVER (
    PARTITION BY user_a ORDER BY sim DESC, user_b) AS rn FROM scored)
SELECT user_a, user_b, sim, n FROM ranked WHERE rn <= {TOPK}
"""

    # Spearman: both engines rank the pair's common items by (pref, item)
    # with row_number -> integer ranks -> exact d² sums; one final
    # division. n ≤ 1 (NaN in the reference) filtered on both sides.
    user_spearman_sql = """
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 150 GROUP BY 1, 2),
joined AS (SELECT a.u AS ua, b.u AS ub, a.i AS i, a.p AS pa, b.p AS pb
           FROM prefs a JOIN prefs b ON a.i = b.i AND a.u <> b.u),
ranked AS (SELECT ua, ub,
                  row_number() OVER (PARTITION BY ua, ub
                                     ORDER BY pa, i)::DOUBLE AS ra,
                  row_number() OVER (PARTITION BY ua, ub
                                     ORDER BY pb, i)::DOUBLE AS rb
           FROM joined),
agg AS (SELECT ua AS user_a, ub AS user_b,
               sum((ra - rb) * (ra - rb)) AS d2, count(*) AS n
        FROM ranked GROUP BY 1, 2)
SELECT user_a, user_b,
       1.0 - 6.0 * d2 / (n::DOUBLE * (n::DOUBLE * n::DOUBLE - 1.0)) AS sim,
       n
FROM agg WHERE n >= 2
"""

    dsq_dist_sql = """
WITH a AS (SELECT l_orderkey AS r, l_linenumber AS c,
                  sum(l_quantity)::DOUBLE AS v
           FROM lineitem WHERE l_orderkey < 300 GROUP BY 1, 2),
sq AS (SELECT r, sum(v * v) AS s FROM a GROUP BY 1),
gram AS (SELECT x.r AS i, y.r AS j, sum(x.v * y.v) AS dot
         FROM a x JOIN a y ON x.c = y.c AND x.r <> y.r GROUP BY 1, 2)
SELECT si.r AS row_id, sj.r AS col_id,
       si.s + sj.s - 2 * coalesce(gram.dot, 0) AS value
FROM sq si CROSS JOIN sq sj
LEFT JOIN gram ON gram.i = si.r AND gram.j = sj.r
WHERE si.r <> sj.r
"""

    drm_colstats_sql = """
WITH a AS (SELECT l_orderkey AS r, l_linenumber AS c,
                  sum(l_quantity)::DOUBLE AS v
           FROM lineitem GROUP BY 1, 2),
n AS (SELECT count(DISTINCT r)::DOUBLE AS nrow FROM a)
SELECT c AS col_id, sum(v) AS sum,
       sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END)::DOUBLE AS nnz,
       round(sum(v) / n.nrow, 6) AS mean,
       round(sum(v * v) / n.nrow - pow(sum(v) / n.nrow, 2), 6) AS var
FROM a CROSS JOIN n GROUP BY c, n.nrow
"""

    _anon_vals = ", ".join(f"({i}, {p})" for i, p in ANON_PREFS)
    recommend_anonymous_sql = f"""
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
anon(i, ap) AS (VALUES {_anon_vals}),
sims AS (SELECT pr.u, count(*)::DOUBLE AS sim
         FROM prefs pr JOIN anon ON pr.i = anon.i GROUP BY 1),
nb AS (SELECT u, sim, row_number() OVER (ORDER BY sim DESC, u) AS rn
       FROM sims),
cand AS (SELECT pr.i, nb.sim, pr.p
         FROM nb JOIN prefs pr ON pr.u = nb.u
         WHERE nb.rn <= 20 AND pr.i NOT IN (SELECT i FROM anon)),
est AS (SELECT i, sum(sim * p) / sum(sim) AS score, count(*) AS n
        FROM cand GROUP BY 1),
ranked AS (SELECT i, score, row_number() OVER (
    ORDER BY score DESC, i) AS rn FROM est WHERE n >= 2)
SELECT i AS item_id, score FROM ranked WHERE rn <= 25
"""

    # ProjectionSearch: replay the window-rank + ±search_size ball + exact
    # euclidean re-rank. Ranks are integers; dots are bit-identical
    # (list_dot_product == the Spark left fold); ranking runs on the
    # UNROUNDED distance in both engines, rounding only in the final
    # projection.
    from mahout_spark.operators.ann import _basis_normal
    _ps_basis = _basis_normal(64, 4, 23)
    _ps_rows = ", ".join(
        "(" + str(p) + ", [" + ", ".join(repr(float(x)) for x in b)
        + "]::DOUBLE[])" for p, b in enumerate(_ps_basis))
    projection_search_sql = f"""
WITH basis(p, b) AS (VALUES {_ps_rows}),
cp AS (SELECT e.vec_id, basis.p,
              list_dot_product(e.embedding::DOUBLE[], basis.b) AS proj
       FROM embeddings e CROSS JOIN basis),
cr AS (SELECT vec_id, p, proj,
              row_number() OVER (PARTITION BY p ORDER BY proj, vec_id) AS r
       FROM cp),
qp AS (SELECT vec_id AS query_id, p, proj FROM cp WHERE vec_id < 5),
pos AS (SELECT q.query_id, q.p,
               (SELECT count(*) FROM cr
                WHERE cr.p = q.p AND cr.proj <= q.proj) AS qpos
        FROM qp q),
cand AS (SELECT DISTINCT pos.query_id, cr.vec_id AS neighbor_id
         FROM pos JOIN cr ON cr.p = pos.p
                         AND cr.r BETWEEN pos.qpos - 19 AND pos.qpos + 20),
scored AS (SELECT c.query_id, c.neighbor_id,
                  sqrt(list_sum(list_transform(
                      list_zip(q.embedding::DOUBLE[],
                               e.embedding::DOUBLE[]),
                      x -> (x[1] - x[2]) * (x[1] - x[2])))) AS d
           FROM cand c
           JOIN embeddings q ON q.vec_id = c.query_id
           JOIN embeddings e ON e.vec_id = c.neighbor_id),
ranked AS (SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY d, neighbor_id) AS rn
           FROM scored)
SELECT query_id, neighbor_id, round(d, 6) AS distance
FROM ranked WHERE rn <= 10
"""

    # OpABt over integer-valued matrices: sums of integer products are
    # order-independent, so the matrix multiply hashes exactly.
    abt_product_sql = """
WITH a AS (SELECT l_orderkey AS r, l_linenumber AS c,
                  sum(l_quantity)::DOUBLE AS v
           FROM lineitem WHERE l_orderkey < 2000 GROUP BY 1, 2),
b AS (SELECT l_partkey % 50 AS r, l_linenumber AS c,
             sum(l_quantity)::DOUBLE AS v
      FROM lineitem GROUP BY 1, 2)
SELECT a.r AS row_id, b.r AS col_id, sum(a.v * b.v) AS value
FROM a JOIN b ON a.c = b.c GROUP BY 1, 2
"""

    recommend_itembased_sql = """
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 200 GROUP BY 1, 2),
inter AS (SELECT DISTINCT u, i FROM prefs),
sims AS (SELECT a.i AS cand, b.i AS j, count(*)::DOUBLE AS s
         FROM inter a JOIN inter b ON a.u = b.u AND a.i <> b.i
         GROUP BY 1, 2),
cand AS (
  SELECT pr.u, sims.cand AS it, sims.s, pr.p
  FROM prefs pr JOIN sims ON sims.j = pr.i
  WHERE NOT EXISTS (SELECT 1 FROM prefs sn
                    WHERE sn.u = pr.u AND sn.i = sims.cand)),
est AS (SELECT u, it, sum(s * p) / sum(s) AS score, count(*) AS n
        FROM cand GROUP BY 1, 2),
ranked AS (SELECT u, it, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, it) AS rn
  FROM est WHERE n >= 2)
SELECT u AS user_id, it AS item_id, score FROM ranked WHERE rn <= 5
"""

    from mahout_spark.functions.text import bpe_token_count_sql

    stats_sql = f"""
SELECT doc_id,
       ({token_count_sql('text')})::BIGINT AS n_tokens,
       ({bpe_token_count_sql('text')})::BIGINT AS n_bpe_tokens,
       (len(list_distinct({tokens_array_sql('text')})))::BIGINT AS n_distinct,
       {detect_lang_sql('text')} AS lang_detected,
       {quality_score_sql('text')} AS quality,
       {content_fingerprint_sql('text')} AS fingerprint
FROM documents
"""

    neardup_sql = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {cosine_sql('a.embedding', 'b.embedding')} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.3
"""

    sigs_sql = minhash_signatures_sql("documents", "doc_id", "text",
                                      num_perm=MINHASH_PERM,
                                      seed=MINHASH_SEED)
    n_bands, rows_pb = 8, MINHASH_PERM // 8
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS b, md5(concat_ws(',', {cols})) AS bh "
        "FROM sigs".format(
            b=b, cols=", ".join(
                f"sig_{b * rows_pb + r}::VARCHAR" for r in range(rows_pb)))
        for b in range(n_bands))
    eq_terms = " + ".join(
        f"(CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END)"
        for i in range(MINHASH_PERM))
    # streaming incremental LSH twin: one row per (band, colliding
    # pair) — exactly what the state function emits (each unordered
    # pair once per band), est = fraction of agreeing components
    stream_sigs_sql = minhash_signatures_sql(
        "(SELECT * FROM documents WHERE doc_id < 300)", "doc_id", "text",
        num_perm=MINHASH_PERM, seed=MINHASH_SEED)
    streaming_minhash_sql = f"""
WITH sigs AS ({stream_sigs_sql}),
bands AS ({band_selects}),
pairs AS (SELECT a.b::BIGINT AS band, a.doc_id AS id_a, b2.doc_id AS id_b
          FROM bands a JOIN bands b2
            ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id)
SELECT p.band, p.id_a, p.id_b,
       round(({eq_terms})::DOUBLE / {float(MINHASH_PERM)}, 6)
           AS est_jaccard
FROM pairs p JOIN sigs sa ON sa.doc_id = p.id_a
             JOIN sigs sb ON sb.doc_id = p.id_b
"""

    minhash_lsh_sql = f"""
WITH sigs AS ({sigs_sql}),
bands AS ({band_selects}),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         FROM bands a JOIN bands b2
           ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id),
eq AS (SELECT id_a, id_b, ({eq_terms}) AS n_eq
       FROM cand JOIN sigs sa ON sa.doc_id = cand.id_a
                 JOIN sigs sb ON sb.doc_id = cand.id_b)
SELECT id_a, id_b, n_eq / {float(MINHASH_PERM)} AS est_jaccard
FROM eq WHERE n_eq / {float(MINHASH_PERM)} >= 0.125
"""

    ann_queries = ("SELECT vec_id AS query_id, embedding FROM embeddings "
                   "WHERE vec_id < 5")

    rcms_hashes = ", ".join(
        f"({i}, {a}::HUGEINT, {b}::HUGEINT)"
        for i, (a, b) in enumerate(affine_params(RCMS_SEED, RCMS_DEPTH)))
    # Replays the ENTIRE recommend_cms pipeline under the parity hash
    # family: per-user CMS bucket sums (integral -> exact float64), CMS
    # cosine = min over depth rows of dots/(sqrt(na)*sqrt(nb)) (single
    # IEEE roundings of exact integers -> bit-equal to the NumPy kernel),
    # top-10 neighborhoods, CMS point estimates (min over rows, integral),
    # similarity-weighted averages, cap, top-5.
    recommend_cms_sql = f"""
WITH prefs AS (
  SELECT o_custkey AS u, l_partkey AS i, sum(l_quantity)::DOUBLE AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_custkey < 100 GROUP BY 1, 2),
hashes(hi, a, b) AS (SELECT * FROM (VALUES {rcms_hashes}) v(hi, a, b)),
bucketed AS (SELECT u, h.hi,
                    ((h.a * prefs.i + h.b) % {BIG_PRIME}) % {RCMS_WIDTH}
                    AS bucket,
                    sum(p) AS bc
             FROM prefs CROSS JOIN hashes h GROUP BY ALL),
rownorm AS (SELECT u, hi, sum(bc * bc) AS nn FROM bucketed GROUP BY 1, 2),
users AS (SELECT DISTINCT u FROM prefs),
pairs AS (SELECT x.u AS ua, y.u AS ub FROM users x JOIN users y
          ON x.u <> y.u),
rowdots AS (SELECT x.u AS ua, y.u AS ub, x.hi, sum(x.bc * y.bc) AS dots
            FROM bucketed x JOIN bucketed y
              ON x.hi = y.hi AND x.bucket = y.bucket AND x.u <> y.u
            GROUP BY ALL),
simrows AS (
  SELECT p.ua, p.ub, h.hi,
         coalesce(d.dots, 0.0) / (sqrt(na.nn) * sqrt(nb.nn)) AS rc
  FROM pairs p CROSS JOIN hashes h
  LEFT JOIN rowdots d ON d.ua = p.ua AND d.ub = p.ub AND d.hi = h.hi
  JOIN rownorm na ON na.u = p.ua AND na.hi = h.hi
  JOIN rownorm nb ON nb.u = p.ub AND nb.hi = h.hi),
sims AS (SELECT ua, ub, min(rc) AS sim FROM simrows GROUP BY 1, 2),
nb AS (SELECT *, row_number() OVER (
    PARTITION BY ua ORDER BY sim DESC, ub) AS rn FROM sims),
items AS (SELECT DISTINCT u, i FROM prefs),
cand AS (SELECT nb.ua AS u, it.i AS it, nb.ub, nb.sim
         FROM nb JOIN items it ON it.u = nb.ub
         WHERE nb.rn <= 10
           AND NOT EXISTS (SELECT 1 FROM prefs s
                           WHERE s.u = nb.ua AND s.i = it.i)),
ptest AS (SELECT c.u, c.it, c.ub, c.sim,
                 min(coalesce(b.bc, 0.0)) AS pref_est
          FROM cand c CROSS JOIN hashes h
          LEFT JOIN bucketed b ON b.u = c.ub AND b.hi = h.hi
             AND b.bucket = ((h.a * c.it + h.b) % {BIG_PRIME}) % {RCMS_WIDTH}
          GROUP BY 1, 2, 3, 4),
est AS (SELECT u, it, sum(sim * pref_est) / sum(sim) AS score,
               count(*) AS n
        FROM ptest WHERE pref_est > 0 GROUP BY 1, 2),
capped AS (SELECT u, it, least(200.0, greatest(0.0, score)) AS score
           FROM est WHERE n >= 2),
ranked AS (SELECT u, it, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, it) AS rn FROM capped)
SELECT u AS user_id, it AS item_id, round(score, 6) AS score
FROM ranked WHERE rn <= 5
"""

    from mahout_spark.functions.webquality import (c4_clean_sql,
                                                   gopher_signals_sql,
                                                   lines_array_sql)

    gopher_quality_sql_text = f"""
SELECT doc_id,
       n_words::BIGINT AS n_words,
       mean_word_length, symbol_to_word_ratio, frac_words_alpha,
       n_stopwords::BIGINT AS n_stopwords,
       dup_line_frac, top_2gram_char_frac, top_3gram_char_frac,
       dup_5gram_char_frac,
       keep::INT AS keep
FROM ({gopher_signals_sql('documents', 'doc_id', 'text')}) g
"""

    c4 = c4_clean_sql("text")
    c4_line_filter_sql_text = f"""
WITH chunked AS (SELECT doc_id, {_chunked_text_sql()} AS text
                 FROM documents)
SELECT doc_id,
       (len({lines_array_sql('text')}))::BIGINT AS n_lines,
       (len({lines_array_sql(c4['c4_text'])}))::BIGINT AS n_lines_kept,
       ({c4['n_sentences']})::BIGINT AS n_sentences,
       ({c4['c4_keep']})::INT AS c4_keep,
       md5({c4['c4_text']}) AS c4_text_md5
FROM chunked
"""

    lines_expr = lines_array_sql("text")
    line_dedup_sql_text = f"""
WITH chunked AS (SELECT doc_id, {_chunked_text_sql()} AS text
                 FROM documents),
lines AS (SELECT doc_id, unnest({lines_expr}) AS line,
                 generate_subscripts({lines_expr}, 1) - 1 AS pos
          FROM chunked),
winners AS (SELECT line, min(doc_id) AS wid FROM lines GROUP BY line),
wpos AS (SELECT l.line, l.doc_id AS wid, min(l.pos) AS wp
         FROM lines l JOIN winners w
           ON l.line = w.line AND l.doc_id = w.wid
         GROUP BY l.line, l.doc_id),
kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
         JOIN wpos w ON l.line = w.line
         WHERE l.doc_id = w.wid AND l.pos = w.wp),
rebuilt AS (SELECT doc_id,
                   coalesce(array_to_string(list(line ORDER BY pos),
                                            chr(10)), '') AS text_dedup,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id)
SELECT c.doc_id,
       (len({lines_array_sql("c.text")}))::BIGINT AS n_lines,
       coalesce(r.n_kept, 0)::BIGINT AS n_lines_kept,
       md5(coalesce(r.text_dedup, '')) AS text_dedup_md5
FROM chunked c LEFT JOIN rebuilt r ON c.doc_id = r.doc_id
"""

    from mahout_spark.functions.sampling import (_threshold,
                                                 hash_coin_u60_sql,
                                                 stratified_sample_sql)

    _coin9 = hash_coin_u60_sql("doc_id", 9)
    # bounds via the SAME float accumulation as split_fractions —
    # int((0.8+0.1)*2^60) can differ from int(0.9*2^60) by ulps
    _cum, _cases = 0.0, []
    for _i, _f in enumerate([0.8, 0.1, 0.1]):
        _lo = _threshold(_cum)
        _cum += _f
        _cases.append(f"WHEN {_coin9} >= {_lo} AND "
                      f"{_coin9} < {_threshold(_cum)} THEN {_i}")
    stratified_sample_sql_text = f"""
WITH kept AS ({stratified_sample_sql(
        '(SELECT doc_id, lang FROM documents)', 'lang', STRAT_RATES,
        'doc_id', seed=5)})
SELECT doc_id, lang,
       (CASE {' '.join(_cases)} ELSE -1 END)::INT AS split
FROM kept
"""

    from mahout_spark.functions.webquality import (pii_counts_sql,
                                                   scrub_pii_sql)

    _pii_inject = (
        "text || "
        "(CASE WHEN doc_id % 2 = 0 THEN ' contact user' || doc_id::VARCHAR"
        " || '@example.com' ELSE '' END) || "
        "(CASE WHEN doc_id % 3 = 0 THEN ' host 10.0.' || "
        "(doc_id % 256)::VARCHAR || '.1' ELSE '' END) || "
        "(CASE WHEN doc_id % 5 = 0 THEN ' tel 555-12' || "
        "(doc_id % 10)::VARCHAR || '-4567' ELSE '' END)")
    _pii_csql = pii_counts_sql("text")
    pii_scrub_sql_text = f"""
WITH inj AS (SELECT doc_id, {_pii_inject} AS text FROM documents)
SELECT doc_id, md5({scrub_pii_sql('text')}) AS scrubbed_md5,
       {', '.join(f'({v})::BIGINT AS {k}' for k, v in _pii_csql.items())}
FROM inj
"""

    from mahout_spark.functions.urls import (canonicalize_url_sql,
                                             url_domain_sql, url_host_sql)

    url_canonicalize_sql_text = f"""
WITH u AS (SELECT doc_id, {_synth_url_sql()} AS url FROM documents)
SELECT doc_id, url,
       {canonicalize_url_sql('url')} AS canon,
       {url_host_sql('url')} AS host,
       {url_domain_sql('url')} AS domain
FROM u
"""

    return {
        "cms_point_frequency": cms_point_oracle_sql(
            toksrc, probe, CMS_DEPTH, CMS_WIDTH, CMS_SEED),
        "cms_point_merged": cms_point_oracle_sql(
            toksrc, probe, CMS_DEPTH, CMS_WIDTH, CMS_SEED),
        # resume == from-scratch: same oracle as the one-shot builds
        "checkpoint_resume_cms": cms_point_oracle_sql(
            toksrc, probe, CMS_DEPTH, CMS_WIDTH, CMS_SEED),
        "cms_cosine_lang": cms_pairwise_oracle_sql(
            toksrc, CMS_DEPTH, CMS_WIDTH, CMS_SEED, group_col="lang"),
        "cms_inner_lang": cms_pairwise_oracle_sql(
            toksrc, CMS_DEPTH, CMS_WIDTH, CMS_SEED, group_col="lang",
            kind="inner"),
        "countsketch_point_frequency": countsketch_point_oracle_sql(
            toksrc, probe, CSK_DEPTH, CSK_WIDTH, CSK_SEED),
        "countsketch_inner_lang": countsketch_pairwise_oracle_sql(
            toksrc, CSK_DEPTH, CSK_WIDTH, CSK_SEED, group_col="lang"),
        "cms_point_noised": cms_point_noised_oracle_sql(
            toksrc, probe, CMS_DEPTH, CMS_WIDTH, CMS_SEED,
            _dp_thresholds(), DP_SEED),
        "cms_inner_noised_lang": cms_pairwise_noised_oracle_sql(
            toksrc, CMS_DEPTH, CMS_WIDTH, CMS_SEED, _dp_thresholds(),
            DP_SEED, group_col="lang", kind="inner"),
        "join_size_estimate": countsketch_join_size_oracle_sql(
            f"SELECT token FROM ({toksrc}) WHERE lang = 'en'",
            f"SELECT token FROM ({toksrc}) WHERE lang <> 'en'",
            CSK_DEPTH, CSK_WIDTH, CSK_SEED),
        "corpus_language_stats": per_language_stats_sql("documents"),
        "token_drift_topk": countsketch_drift_topk_oracle_sql(
            toksrc, CSK_DEPTH, CSK_WIDTH, CSK_SEED, "lang", "en", "de",
            f"SELECT DISTINCT token FROM ({toksrc})", 20),
        "hll_distinct_tokens": hll_distinct_oracle_sql(
            toksrc, HLL_P, group_col="lang"),
        "hll_rollup_distinct": " UNION ALL ".join(
            f"SELECT * FROM ({hll_distinct_oracle_sql(toksrc_src, HLL_P, group_exprs=gx)})"
            for gx in (
                [("lang", "lang"), ("source", "source")],
                [("lang", "lang"), ("'*'", "source")],
                [("'*'", "lang"), ("'*'", "source")])),
        "bloom_token_filter": bloom_filter_count_oracle_sql(
            toksrc, BLOOM_HEAD, BLOOM_CAP, BLOOM_FP, BLOOM_SEED,
            group_col="lang"),
        "counting_bloom_retract": counting_bloom_oracle_sql(
            f"SELECT token AS t FROM ({toksrc}) WHERE lang = 'en'",
            f"SELECT token AS t FROM ({toksrc}) "
            f"WHERE lang = 'en' AND doc_id % 7 = 0",
            f"SELECT token AS t FROM ({toksrc}) GROUP BY token "
            f"ORDER BY count(*) DESC, token LIMIT {CBF_PROBES}",
            CBF_CAP, CBF_FP, CBF_SEED),
        "tdigest_price_quantiles": quantile_bound_oracle_sql(
            "SELECT l_returnflag, l_extendedprice FROM lineitem",
            ["l_returnflag"], "l_extendedprice", [0.25, 0.5, 0.75], QEPS),
        "kll_event_quantiles": quantile_bound_oracle_sql(
            "SELECT event_type, value FROM events",
            ["event_type"], "value", [0.1, 0.5, 0.9], QEPS),
        "windowed_tdigest_events": quantile_bound_oracle_sql(
            "SELECT date_trunc('day', ts) AS w_start, event_type, value "
            "FROM events",
            ["w_start", "event_type"], "value", [0.5], QEPS),
        "windowed_cms_events": cms_point_grouped_oracle_sql(
            "SELECT date_trunc('day', ts) AS w_start, event_type "
            "FROM events",
            CMS_DEPTH, CMS_WIDTH, CMS_SEED, group_col="w_start",
            token_col="event_type"),
        "cms_rollup_weekly": cms_point_grouped_oracle_sql(
            "SELECT date_trunc('week', ts) AS week, event_type "
            "FROM events",
            CMS_DEPTH, CMS_WIDTH, CMS_SEED, group_col="week",
            token_col="event_type"),
        "cms_rollup_lang": cms_point_grouped_oracle_sql(
            _toksrc_sql(), CMS_DEPTH, CMS_WIDTH, CMS_SEED,
            group_col="lang", token_col="token",
            probe_sql=(
                "SELECT lang, token FROM ("
                "  SELECT lang, token, row_number() OVER ("
                "    PARTITION BY lang ORDER BY c DESC, token) AS r"
                "  FROM (SELECT lang, token, count(*) AS c FROM ("
                + _toksrc_sql() + ") GROUP BY 1, 2))"
                f" WHERE r <= {ROLLUP_HEAD}")),
        "recommend_cms": recommend_cms_sql,
        "cooccurrence_topk": cooc_sql,
        "llr_item_similarity": llr_sql,
        "cross_similarity_llr": cross_llr_sql,
        "rowsim_tanimoto": rowsim_tanimoto_sql,
        "rowsim_cosine": rowsim_cosine_sql,
        "rowsim_pearson": rowsim_pearson_sql,
        "rowsim_euclidean": rowsim_euclid_sql,
        "rowsim_cityblock": rowsim_cityblock_sql,
        "ata_gramian": ata_sql,
        "dcol_mean_cov": dcol_cov_sql,
        "feature_hashing": feature_hashing_sql,
        "recommend_cooc": recommend_sql,
        "recommend_rescored": recommend_rescored_sql,
        "recommend_itembased": recommend_itembased_sql,
        "recommend_svd": recommend_svd_sql,
        "factorization_rmse": factorization_rmse_sql,
        "vecdist_euclidean": """
SELECT s.vec_id AS seed_id, p.vec_id,
       round(sqrt(list_sum(list_transform(
           list_zip(p.embedding::DOUBLE[], s.embedding::DOUBLE[]),
           x -> (x[1] - x[2]) * (x[1] - x[2])))), 6) AS distance
FROM embeddings p
CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) s
""",
        "kmeans_assign": kmeans_assign_sql,
        "fuzzy_kmeans_memberships": fuzzy_memberships_sql,
        "ols_fit": OLS_FIT_SQL,
        "lda_cvb0_gamma": _lda_gamma_oracle(),
        "sgd_classify": _sgd_classify_oracle(),
        "rf_classify": _rf_classify_oracle(),
        "rf_ig_split": _rf_ig_split_oracle(),
        "hmm_supervised": _hmm_supervised_oracle(),
        "fp_growth": _fp_growth_oracle(),
        "recommend_boolean": recommend_boolean_sql,
        "user_similarity_tanimoto": user_tanimoto_sql,
        "user_similarity_spearman": user_spearman_sql,
        "abt_product": abt_product_sql,
        "projection_search_topk": projection_search_sql,
        "recommend_anonymous": recommend_anonymous_sql,
        "dsq_dist": dsq_dist_sql,
        "drm_colstats": drm_colstats_sql,
        "doc_token_stats": stats_sql,
        "tfidf": tfidf_sql("(SELECT * FROM documents WHERE doc_id < 200)",
                           variant="mahout"),
        "bigram_collocations": bigram_collocations_sql(
            "documents", min_llr=1.0, min_count=3),
        "nb_model_standard": nb_model_sql("documents"),
        "nb_classify_standard": nb_classify_sql("documents",
                                                complementary=False),
        "nb_classify_complementary": nb_classify_sql("documents",
                                                     complementary=True),
        "exact_dedup": exact_dedup_groups_sql(
            "(SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 1000000000 AS doc_id, text FROM documents "
            "WHERE doc_id % 37 = 0) seeded",
            "doc_id", "text"),
        "minhash_signatures": minhash_signatures_sql(
            "documents", "doc_id", "text", num_perm=MINHASH_PERM,
            seed=MINHASH_SEED),
        "minhash_lsh_pairs": minhash_lsh_sql,
        "streaming_minhash_pairs": streaming_minhash_sql,
        "simhash": simhash_sql("documents", "doc_id", "text"),
        "ngram_jaccard": ngram_jaccard_pairs_sql(
            "documents", "doc_id", "text", threshold=0.2),
        "ann_topk": brute_force_topk_sql("embeddings", ann_queries, TOPK),
        "embedding_neardup": neardup_sql,
        "embedding_neardup_lsh": embedding_neardup_lsh_sql(
            "embeddings", EMB_DIM, "vec_id", "embedding", threshold=0.3,
            n_bands=LSH_BANDS, band_planes=LSH_BAND_PLANES, seed=LSH_SEED),
        "dedup_groups": f"""
SELECT group_id, member_id, is_representative::INT AS is_representative
FROM ({dedup_groups_sql(minhash_lsh_sql)})
""",
        "dedup_keep_best": f"""
SELECT group_id, member_id, is_representative::INT AS is_representative
FROM ({pick_representatives_sql(
        dedup_groups_sql(minhash_lsh_sql),
        'SELECT doc_id, n_chars FROM documents',
        'doc_id', 'n_chars')})
""",
        "ir_stats_at_5": IR_STATS_SQL_TEMPLATE.format(
            prefs=GATE_PREFS_SQL,
            coin=_h60("u::VARCHAR || '|' || i::VARCHAR")),
        "recommend_itemavg": f"""
WITH prefs AS ({GATE_PREFS_SQL}),
avgs AS (SELECT i, avg(p) AS score FROM prefs GROUP BY i),
m AS (SELECT 5 + max(cnt) AS m
      FROM (SELECT count(*) AS cnt FROM prefs GROUP BY u)),
top_items AS (SELECT i, score FROM (
    SELECT i, score, row_number() OVER (ORDER BY score DESC, i) AS rn
    FROM avgs) WHERE rn <= (SELECT m FROM m)),
users AS (SELECT DISTINCT u FROM prefs),
cand AS (SELECT users.u, t.i, t.score FROM users CROSS JOIN top_items t
         WHERE NOT EXISTS (SELECT 1 FROM prefs p2
                           WHERE p2.u = users.u AND p2.i = t.i)),
ranked AS (SELECT u, i, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, i) AS rn FROM cand)
SELECT u AS user_id, i AS item_id, round(score, 6) AS score
FROM ranked WHERE rn <= 5
""",
        "recommend_itemuseravg": f"""
WITH prefs AS ({GATE_PREFS_SQL}),
avgs AS (SELECT i, avg(p) AS iavg FROM prefs GROUP BY i),
uavgs AS (SELECT u, avg(p) AS uavg FROM prefs GROUP BY u),
oa AS (SELECT avg(p) AS o FROM prefs),
m AS (SELECT 5 + max(cnt) AS m
      FROM (SELECT count(*) AS cnt FROM prefs GROUP BY u)),
top_items AS (SELECT i, iavg FROM (
    SELECT i, iavg, row_number() OVER (ORDER BY iavg DESC, i) AS rn
    FROM avgs) WHERE rn <= (SELECT m FROM m)),
cand AS (SELECT uavgs.u, t.i,
                (t.iavg + (uavgs.uavg - (SELECT o FROM oa))) AS score
         FROM uavgs CROSS JOIN top_items t
         WHERE NOT EXISTS (SELECT 1 FROM prefs p2
                           WHERE p2.u = uavgs.u AND p2.i = t.i)),
ranked AS (SELECT u, i, score, row_number() OVER (
    PARTITION BY u ORDER BY score DESC, i) AS rn FROM cand)
SELECT u AS user_id, i AS item_id, round(score, 6) AS score
FROM ranked WHERE rn <= 5
""",
        "vecdist_chebyshev": """
SELECT s.vec_id AS seed_id, p.vec_id,
       round(list_max(list_transform(
           list_zip(p.embedding::DOUBLE[], s.embedding::DOUBLE[]),
           x -> abs(x[1] - x[2]))), 6) AS distance
FROM embeddings p
CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) s
""",
        "cluster_classify": f"""
WITH centers AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 8),
p AS (
  SELECT e.vec_id, c.c,
         1.0 / (1.0 + sqrt(list_sum(list_transform(
             list_zip(e.embedding::DOUBLE[], c.cv),
             q -> (q[1] - q[2]) * (q[1] - q[2]))))) AS pdf
  FROM embeddings e CROSS JOIN centers c),
agg AS (SELECT vec_id, list_sum(list(pdf ORDER BY c)) AS t
        FROM p GROUP BY vec_id),
best AS (SELECT vec_id, c AS bc, pdf AS bp, row_number() OVER (
           PARTITION BY vec_id ORDER BY pdf DESC, c) AS rn FROM p),
j AS (SELECT b.vec_id, b.bc, b.bp, a.t
      FROM best b JOIN agg a USING (vec_id) WHERE b.rn = 1)
SELECT vec_id,
       (CASE WHEN bp / t >= {CLASSIFY_THRESHOLD!r} THEN bc ELSE -1 END)
         AS cluster,
       round(bp / t, 6) AS weight,
       (bp / t < {CLASSIFY_THRESHOLD!r})::INT AS is_outlier
FROM j
""",
        "auc_scores": auc_sql("lineitem", "(l_returnflag = 'R')",
                              "l_quantity"),
        "confusion_binary": """
SELECT (l_returnflag = 'R')::INT AS actual,
       (l_quantity > 25.0)::INT AS predicted, count(*) AS n
FROM lineitem GROUP BY 1, 2
""",
        "ewa_events": f"""
WITH e AS (SELECT event_type, epoch_us(ts) AS t, value AS x FROM events),
mx AS (SELECT event_type, max(t) AS mt FROM e GROUP BY 1),
d AS (SELECT e.event_type, exp((e.t - mx.mt) / {EWA_ALPHA_US!r}) AS disc,
             e.x
      FROM e JOIN mx USING (event_type))
SELECT event_type, round(sum(x * disc) / sum(disc), 6) AS ewa_mean,
       count(*) AS n
FROM d GROUP BY event_type
""",
        "gopher_quality": gopher_quality_sql_text,
        "c4_line_filter": c4_line_filter_sql_text,
        "line_dedup_corpus": line_dedup_sql_text,
        "url_canonicalize": url_canonicalize_sql_text,
        "domain_stats": f"""
WITH u AS (SELECT doc_id, text, {_synth_url_sql()} AS url FROM documents)
SELECT {url_domain_sql('url')} AS domain,
       count(*) AS n_pages,
       count(DISTINCT {url_host_sql('url')}) AS n_hosts,
       sum(length(text))::BIGINT AS sum_chars
FROM u GROUP BY 1""",
        "grouped_online_auc": GROUPED_ONLINE_AUC_SQL,
        "cg_solve": _cg_solve_oracle_sql(),
        "lanczos_tridiag": _lanczos_tridiag_oracle_sql(),
        "pii_redaction": _pii_redaction_oracle_sql(),
        "lm_doc_perplexity": _lm_perplexity_oracle_sql(),
        "heavy_hitters_tokens": _heavy_hitters_oracle_sql(),
        "skew_salt_plan": _skew_plan_oracle_sql(),
        "stratified_sample": stratified_sample_sql_text,
        "pii_scrub": pii_scrub_sql_text,
        "substring_dup_spans": _substring_spans_oracle(),
        "substring_dedup_clean": _substring_clean_oracle(),
        "decontamination_spans": _decontamination_oracle(),
        "semdedup_keep": _semdedup_oracle(),
        "dsir_weights": _dsir_oracle(),
        "fd_gramian_bound": (
            "SELECT 16::INT AS ell, 64::INT AS dim, "
            "TRUE AS psd_ok, TRUE AS certified_ok, "
            "TRUE AS apriori_ok"),
        "unicode_nfc_docs": _unicode_nfc_oracle(),
        "theta_user_overlap": _theta_overlap_oracle(),
        "priority_sample_docs": _priority_sample_oracle(),
        "priority_lang_totals": _priority_totals_oracle(),
        "pq_adc_topk": _pq_adc_oracle(),
        "tuple_lang_totals": _tuple_totals_oracle(),
        "moments_lang_chars": _moments_oracle(),
        "agg_strategy_plan": _agg_plan_oracle(),
        "bpe_merges": _bpe_merges_oracle(),
        "bpe_encode": _bpe_encode_oracle(),
        "sequence_pack": _sequence_pack_oracle(),
        "shard_plan": _shard_plan_oracle(),
        "bpe_pack": _bpe_pack_oracle(),
        "mixture_plan": _mixture_plan_oracle(),
        "mixture_sample": _mixture_sample_oracle(),
        "req_event_quantiles": _req_quantiles_oracle(),
        "thin_qr_r": """
WITH g AS (
  SELECT sum(l_quantity * l_quantity) AS g00,
         sum(l_quantity * l_linenumber) AS g01,
         sum(l_quantity) AS g02,
         sum(l_linenumber * l_linenumber) AS g11,
         sum(l_linenumber) AS g12,
         count(*)::DOUBLE AS g22
  FROM lineitem),
c AS (
  SELECT sqrt(g00) AS l11, g01 / sqrt(g00) AS l21, g02 / sqrt(g00) AS l31,
         g00, g01, g02, g11, g12, g22
  FROM g),
c2 AS (
  SELECT l11, l21, l31, sqrt(g11 - l21 * l21) AS l22, g12, g22
  FROM c),
c3 AS (
  SELECT l11, l21, l31, l22, (g12 - l31 * l21) / l22 AS l32, g22
  FROM c2),
c4 AS (
  SELECT l11, l21, l31, l22, l32,
         sqrt(g22 - l31 * l31 - l32 * l32) AS l33
  FROM c3)
SELECT 0 AS i, 0 AS j, round(l11, 6) AS r FROM c4
UNION ALL SELECT 0, 1, round(l21, 6) FROM c4
UNION ALL SELECT 0, 2, round(l31, 6) FROM c4
UNION ALL SELECT 1, 1, round(l22, 6) FROM c4
UNION ALL SELECT 1, 2, round(l32, 6) FROM c4
UNION ALL SELECT 2, 2, round(l33, 6) FROM c4
""",
    }
