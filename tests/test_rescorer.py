"""IDRescorer hook — TopItems.java:62-73 semantics on every top-K path."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.recommender import (
    IDRescorer, item_average_recommend, item_user_average_recommend,
    most_similar_items, nearest_n_neighborhood, recommend,
    recommend_item_based)
from mahout_spark.operators.rescorer import (NULL_RESCORER, apply_rescorer,
                                             filter_candidates)

GOLDEN = [
    (1, 10, 5.0), (1, 11, 3.0), (1, 12, 2.0),
    (2, 10, 4.0), (2, 11, 2.0), (2, 13, 5.0),
    (3, 11, 4.0), (3, 12, 4.0), (3, 13, 3.0),
    (4, 10, 2.0), (4, 14, 1.0),
]


@pytest.fixture(scope="module")
def golden(spark):
    return spark.createDataFrame(
        GOLDEN, "user_id long, item_id long, pref double").persist()


def _user_recs(golden, rescorer=None):
    a = golden.select(F.col("item_id").alias("__i"),
                      F.col("user_id").alias("user_a"))
    b = golden.select(F.col("item_id").alias("__i"),
                      F.col("user_id").alias("user_b"))
    sims = (a.join(b, "__i").filter(F.col("user_a") != F.col("user_b"))
            .groupBy("user_a", "user_b")
            .agg(F.count("*").cast("double").alias("sim")))
    nb = nearest_n_neighborhood(sims, 10)
    return recommend(golden, nb, top_n=5, min_evidence=1,
                     rescorer=rescorer)


def test_null_rescorer_is_identity(golden):
    base = sorted(map(tuple, _user_recs(golden).collect()))
    nulled = sorted(map(tuple, _user_recs(golden, NULL_RESCORER).collect()))
    assert base == nulled


def test_filter_removes_items(golden):
    resc = IDRescorer(is_filtered=lambda i: i == 13)
    recs = {(r["user_id"], r["item_id"])
            for r in _user_recs(golden, resc).collect()}
    assert recs  # something survives
    assert not any(i == 13 for _, i in recs)
    base = {(r["user_id"], r["item_id"])
            for r in _user_recs(golden).collect()}
    assert (1, 13) in base  # the filter actually removed a live result


def test_rescore_reorders_ranking(golden):
    # boost item 14 to the top for everyone
    resc = IDRescorer(rescore=lambda i, s: F.when(i == 14, s + 100.0)
                      .otherwise(s))
    recs = _user_recs(golden, resc)
    top1 = {r["user_id"]: r["item_id"]
            for r in recs.withColumn(
                "rn", F.row_number().over(
                    __import__("pyspark.sql.window",
                               fromlist=["Window"]).Window
                    .partitionBy("user_id")
                    .orderBy(F.desc("score"), "item_id")))
            .filter("rn = 1").collect()}
    # every user who has 14 as a candidate now ranks it first
    for u, it in top1.items():
        cand_has_14 = any(r["item_id"] == 14 for r in
                          _user_recs(golden).filter(
                              F.col("user_id") == u).collect())
        if cand_has_14:
            assert it == 14


def test_nan_rescore_drops_rows(golden):
    # NaN rescored value = the reference idiom for filter-by-pair
    resc = IDRescorer(rescore=lambda i, s: F.when(
        i == 13, F.lit(float("nan"))).otherwise(s))
    recs = {(r["user_id"], r["item_id"])
            for r in _user_recs(golden, resc).collect()}
    assert not any(i == 13 for _, i in recs)


def test_item_based_and_most_similar_hooks(spark, golden):
    sims = spark.createDataFrame(
        [(10, 11, 0.9), (10, 12, 0.8), (10, 13, 0.7), (11, 13, 0.6)],
        "item_a long, item_b long, sim double")
    resc = IDRescorer(is_filtered=lambda i: i == 13)
    ms = most_similar_items(sims, 2, rescorer=resc).collect()
    assert all(r["item_b"] != 13 for r in ms)
    ib = recommend_item_based(golden, sims, top_n=3, min_evidence=1,
                              rescorer=resc).collect()
    assert ib and all(r["item_id"] != 13 for r in ib)


def test_item_average_rescorer_matches_bruteforce(golden):
    """The broadcast-prefix plan with a rescorer == rescore-then-rank
    over the full candidate set."""
    resc = IDRescorer(
        rescore=lambda i, s: F.when(i % 2 == 0, s * 2.0).otherwise(s),
        is_filtered=lambda i: i == 10)
    fast = {(r["user_id"], r["item_id"]): r["score"]
            for r in item_average_recommend(golden, top_n=2,
                                            rescorer=resc).collect()}
    # brute force: full avgs, rescore, per-user rank
    avgs = golden.groupBy(F.col("item_id")).agg(
        F.avg("pref").alias("score"))
    avgs = apply_rescorer(avgs, "item_id", "score", resc)
    users = golden.select("user_id").distinct()
    seen = golden.select("user_id", "item_id")
    cand = (users.crossJoin(avgs)
            .join(seen, ["user_id", "item_id"], "left_anti"))
    from mahout_spark.operators.topk import topk_per_group
    slow = {(r["user_id"], r["item_id"]): r["score"]
            for r in topk_per_group(cand, ["user_id"], "score", 2,
                                    tiebreak_cols=["item_id"]).collect()}
    assert fast == slow


def test_item_user_average_filter_only_keeps_prefix_plan(golden):
    resc = IDRescorer(is_filtered=lambda i: i == 13)
    recs = {(r["user_id"], r["item_id"])
            for r in item_user_average_recommend(
                golden, top_n=3, rescorer=resc).collect()}
    assert recs and not any(i == 13 for _, i in recs)


def test_filter_candidates_noop_without_filter(golden):
    resc = IDRescorer(rescore=lambda i, s: s)
    assert filter_candidates(golden, "item_id", resc) is golden
    assert filter_candidates(golden, "item_id", None) is golden


def test_recommend_anonymous_matches_injected_user(spark, golden):
    """PlusAnonymousUserDataModel semantics: the anonymous path must
    produce the same result as physically injecting a temp user and
    running the standard user-based recommender."""
    from mahout_spark.operators.recommender import (exact_user_similarity,
                                                    recommend,
                                                    recommend_anonymous)

    anon = [(10, 5.0), (13, 4.0)]
    fast = {(r["item_id"], round(r["score"], 9))
            for r in recommend_anonymous(golden, anon, top_n=3,
                                         n_neighbors=3,
                                         min_evidence=1).collect()}
    # inject TEMP user id -1 and run the stock pipeline
    injected = golden.unionByName(golden.sparkSession.createDataFrame(
        [(-1, i, p) for i, p in anon],
        "user_id long, item_id long, pref double"))
    sims = exact_user_similarity(injected, "cosine")
    from mahout_spark.operators.recommender import nearest_n_neighborhood
    nb = nearest_n_neighborhood(
        sims.filter(~F.isnan(F.col("sim"))), 3)
    recs = recommend(injected, nb, top_n=3, min_evidence=1)
    slow = {(r["item_id"], round(r["score"], 9))
            for r in recs.filter(F.col("user_id") == -1).collect()}
    assert fast == slow


def test_recommend_anonymous_excludes_seen_and_bounds(spark, golden):
    from mahout_spark.operators.recommender import recommend_anonymous

    anon = [(10, 5.0), (11, 1.0)]
    out = recommend_anonymous(golden, anon, top_n=2, n_neighbors=4,
                              min_evidence=1, measure="cooccurrence")
    rows = out.collect()
    assert 0 < len(rows) <= 2
    assert all(r["item_id"] not in (10, 11) for r in rows)
