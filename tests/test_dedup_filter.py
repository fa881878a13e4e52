"""pick_representatives / dedup_filter: quality-based winner selection
over resolved duplicate groups."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.dedup import (dedup_filter, dedup_groups,
                                          pick_representatives,
                                          pick_representatives_sql)

PAIRS = [(1, 2), (2, 3), (10, 11), (20, 21)]
SCORES = [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1),
          (20, 0.7), (21, 0.3), (99, 1.0)]


@pytest.fixture(scope="module")
def groups(spark):
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    return dedup_groups(pairs).cache()


@pytest.fixture(scope="module")
def scores(spark):
    return spark.createDataFrame(SCORES, "doc_id long, score double")


def test_best_score_wins_ties_min_id(groups, scores):
    out = pick_representatives(groups, scores, "doc_id", "score")
    reps = {r["group_id"]: r["member_id"] for r in out.collect()
            if r["is_representative"]}
    assert reps[1] == 2    # 0.9 beats 0.5; tie 2 vs 3 → min id 2
    assert reps[10] == 10  # tie 0.1/0.1 → min id
    assert reps[20] == 20  # 0.7 beats 0.3
    # exactly one representative per group, membership unchanged
    assert out.count() == groups.count()
    assert out.where("is_representative").count() == 3


def test_unscored_members_lose(spark, groups):
    # only doc 3 scored → it must win group {1,2,3}
    s = spark.createDataFrame([(3, 0.1)], "doc_id long, score double")
    out = pick_representatives(groups, s, "doc_id", "score")
    reps = {r["group_id"]: r["member_id"] for r in out.collect()
            if r["is_representative"]}
    assert reps[1] == 3
    assert reps[10] == 10  # fully unscored group → min id


def test_matches_duckdb(groups, scores):
    sp = sorted(tuple(r) for r in pick_representatives(
        groups, scores, "doc_id", "score")
        .select("group_id", "member_id",
                F.col("is_representative").cast("int")).collect())
    con = duckdb.connect()
    con.register("g", groups.toPandas())
    con.register("s", pd.DataFrame(SCORES, columns=["doc_id", "score"]))
    sql = pick_representatives_sql(
        "SELECT group_id, member_id FROM g", "SELECT * FROM s",
        "doc_id", "score")
    du = sorted(tuple(r) for r in con.execute(
        f"SELECT group_id, member_id, is_representative::INT "
        f"FROM ({sql}) q").fetchall())
    assert sp == du


def test_dedup_filter_keeps_best_and_untouched(spark, groups):
    docs = spark.createDataFrame(
        [(i, s) for i, s in SCORES], "doc_id long, score double")
    out = dedup_filter(docs, groups, "doc_id", score_col="score")
    kept = sorted(r["doc_id"] for r in out.collect())
    # winners 2, 10, 20 + untouched 99
    assert kept == [2, 10, 20, 99]
    # min-id mode (no score): winners 1, 10, 20 + 99
    out2 = dedup_filter(docs, groups, "doc_id")
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 10, 20, 99]
