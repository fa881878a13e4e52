"""DSIR importance resampling: weight-ordering goldens, hand-computed
feature counts, Gumbel-top-k determinism, DuckDB bit-parity (6 dp ln
convention), partitioning invariance."""

import duckdb
import math
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.dsir import (dsir_log_weights,
                                         dsir_log_weights_sql,
                                         dsir_sample, gumbel_key,
                                         gumbel_key_sql)

RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices fell sharply today"),
    (3, "the cat chased the dog"),
    (4, "buy cheap pills online now"),
]
TARGET = [
    (100, "the cat and the dog played"),
    (101, "a cat sat with another cat"),
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(RAW, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def _weights(df):
    return {r["doc_id"]: (r["n_feats"], r["log_w"]) for r in df.collect()}


def test_n_feats(raw, target):
    w = _weights(dsir_log_weights(raw, target, buckets=512))
    # unigrams + bigrams: 2*len - 1
    assert {k: v[0] for k, v in w.items()} == {1: 11, 2: 11, 3: 9, 4: 9}


def test_target_like_docs_weigh_more(raw, target):
    w = _weights(dsir_log_weights(raw, target, buckets=512))
    # cat/dog docs should out-weigh finance and spam
    assert w[1][1] > w[2][1] and w[3][1] > w[4][1]
    assert min(w[1][1], w[3][1]) > max(w[2][1], w[4][1])


def test_partitioning_invariance(raw, target):
    a = _weights(dsir_log_weights(raw, target, buckets=512))
    b = _weights(dsir_log_weights(raw.repartition(5),
                                  target.repartition(3), buckets=512))
    assert a == b  # bucket-sorted fold: bit-equal, not just close


def test_gumbel_key_matches_formula(spark):
    df = spark.createDataFrame([(7,)], "doc_id long")
    got = df.select(gumbel_key(F.col("doc_id"), 3).alias("g")).collect()[0]["g"]
    con = duckdb.connect()
    want = con.execute(
        f"SELECT {gumbel_key_sql('7', 3)}").fetchone()[0]
    # ln differs by <=1 ulp between libm builds (the repo-wide 6 dp
    # round-at-final-select convention exists for exactly this)
    assert round(got, 6) == round(want, 6)
    assert abs(got - want) < 1e-12


def test_sample_deterministic_and_sized(raw, target):
    s1 = dsir_sample(raw, target, k=2, buckets=512, seed=5)
    s2 = dsir_sample(raw.repartition(3), target, k=2, buckets=512, seed=5)
    ids1 = [r["doc_id"] for r in s1.collect()]
    ids2 = [r["doc_id"] for r in s2.collect()]
    assert len(ids1) == 2 and ids1 == ids2
    # different seed may differ; k larger than corpus returns all
    assert dsir_sample(raw, target, k=10, buckets=512).count() == 4


def test_duckdb_parity(raw, target):
    got = sorted(
        (r["doc_id"], r["n_feats"], r["log_w"]) for r in
        dsir_log_weights(raw, target, buckets=512)
        .select("doc_id", "n_feats", F.round("log_w", 6).alias("log_w"))
        .collect())
    con = duckdb.connect()
    con.register("raw_t", pd.DataFrame(RAW, columns=["doc_id", "text"]))
    con.register("tgt_t", pd.DataFrame(TARGET, columns=["doc_id", "text"]))
    sql = dsir_log_weights_sql("raw_t", "tgt_t", buckets=512)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
