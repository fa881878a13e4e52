"""Focused tests for round-6 optimization internals.

Each optimization here changed an operator's PLAN, never its results; these
tests pin both directions: result parity with the pre-optimization shape,
and the plan property the optimization exists for.
"""

import pytest
from pyspark.sql import functions as F


def test_global_topk_matches_constant_group_window(spark):
    df = spark.createDataFrame(
        [(i % 7, float((i * 37) % 19), i) for i in range(200)],
        "item int, score double, tb int")
    from mahout_spark.operators.topk import global_topk, topk_per_group

    got = global_topk(df, "score", 12, tiebreak_cols=["tb"])
    want = (topk_per_group(df.withColumn("__g", F.lit(1)), ["__g"],
                           "score", 12, tiebreak_cols=["tb"])
            .drop("__g"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # the point of global_topk: a bounded TakeOrderedAndProject, no Window
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_exponential_average_ungrouped_no_single_partition_window(spark):
    rows = [(float(t), float((t * 13) % 7)) for t in range(1, 300)]
    df = spark.createDataFrame(rows, "ts double, x double")
    from mahout_spark.operators.evaluation import exponential_average

    out = exponential_average(df, "ts", "x", alpha=20.0)
    # plan: global max arrives via a broadcast join, not an unpartitioned
    # window funnelling every row through one partition
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # value parity with the grouped branch (single constant group)
    grouped = exponential_average(
        df.withColumn("g", F.lit("a")), "ts", "x", alpha=20.0,
        group_cols=["g"])
    assert out.first()["ewa_mean"] == \
        pytest.approx(grouped.first()["ewa_mean"], abs=0.0)
    assert out.first()["n"] == grouped.first()["n"]


def test_brute_force_topk_hoisted_norms_bit_identical(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(8)])
            for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = (emb.filter(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    from mahout_spark.operators.ann import (brute_force_topk, cosine_expr,
                                            dot_expr)
    from mahout_spark.operators.topk import topk_per_group

    got = brute_force_topk(emb, q, k=4)
    # reference shape: inline cosine_expr (norms recomputed per pair)
    qq = q.select(F.col("query_id"), F.col("embedding").alias("__qv"))
    cc = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("__cv"))
    scored = cc.crossJoin(F.broadcast(qq)).select(
        "query_id", "neighbor_id",
        cosine_expr(F.col("__qv"), F.col("__cv")).alias("score"))
    want = topk_per_group(scored, ["query_id"], "score", 4,
                          tiebreak_cols=["neighbor_id"])
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_minhash_distinct_free_signatures_unchanged(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * (1 + i % 3)
          + f"tail {i % 4}") for i in range(40)],
        "doc_id int, text string")
    from mahout_spark.operators.dedup import minhash_signatures

    fast = minhash_signatures(docs, "doc_id", "text", num_perm=8,
                              family="fast")
    # repartitioning the input must not change signatures (min is
    # insensitive to both duplicates and partitioning)
    fast2 = minhash_signatures(docs.repartition(7), "doc_id", "text",
                               num_perm=8, family="fast")
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, fast2.collect()))


def test_sample_down_window_counts_match_join_counts(spark):
    rows = [(u, i) for u in range(30) for i in range(u % 9 + 1)]
    df = spark.createDataFrame(rows, "row_id int, col_id int")
    from mahout_spark.operators.cooccurrence import sample_down_and_binarize

    out = sample_down_and_binarize(df, max_per_row=4, max_per_col=8)
    # pre-optimization formula, computed directly: counts over the
    # distinct matrix + the same deterministic coin
    from mahout_spark.functions.hashutil import deterministic_coin

    b = df.select("row_id", "col_id").distinct()
    rc = b.groupBy("row_id").agg(F.count("*").alias("__rc"))
    cc = b.groupBy("col_id").agg(F.count("*").alias("__cc"))
    rate = F.least(F.lit(1.0), F.lit(4.0) / F.col("__rc"),
                   F.lit(8.0) / F.col("__cc"))
    want = (b.join(rc, "row_id").join(cc, "col_id")
            .filter(deterministic_coin(
                [F.col("row_id"), F.col("col_id")], 0xDEADBEEF, rate))
            .select("row_id", "col_id"))
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, want.collect()))


def test_tdigest_scalar_kscale_compaction_bounds(spark):
    import numpy as np

    from mahout_spark.core.tdigest import TDigest, _k1, _k1_scalar

    # scalar k-scale stays within 1 ulp of the vector form everywhere
    qs = np.linspace(0.0, 1.0, 20001)
    v = _k1(qs, 100.0)
    s = np.array([_k1_scalar(float(q), 100.0) for q in qs])
    assert np.max(np.abs((v - s))) <= np.finfo(np.float64).eps * 100
    # rank-error contract unchanged
    rng = np.random.default_rng(11)
    vals = rng.gamma(3.0, 10.0, size=40_000)
    td = TDigest(100.0)
    for chunk in np.array_split(vals, 23):
        td.update_batch(chunk)
    srt = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        lo = srt[max(0, int((q - 0.012) * len(srt)) - 1)]
        hi = srt[min(len(srt) - 1, int((q + 0.012) * len(srt)))]
        assert lo <= est <= hi, (q, lo, est, hi)
