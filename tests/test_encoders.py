"""FeatureVectorEncoder family (vectorizer/encoders)."""

import math

import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.encoders import (adaptive_word_encode,
                                             constant_encode,
                                             interaction_encode,
                                             static_word_encode)

TOKS = [(1, "cat"), (1, "dog"), (1, "cat"), (2, "dog"), (2, "fish")]


@pytest.fixture(scope="module")
def toks(spark):
    return spark.createDataFrame(TOKS, "doc_id long, token string")


def test_static_word_encode_counts_and_weights(toks):
    out = static_word_encode(toks, dim=1 << 16, probes=1,
                             weights={"cat": 2.0}, missing_weight=1.0)
    rows = out.collect()
    # doc 1: cat twice at weight 2 -> one bucket with 4.0, dog 1.0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["weight"])
    assert sorted(by_doc[1]) == [1.0, 4.0]
    assert sorted(by_doc[2]) == [1.0, 1.0]


def test_probes_add_full_weight_at_each_location(toks):
    one = static_word_encode(toks, dim=1 << 16, probes=1)
    three = static_word_encode(toks, dim=1 << 16, probes=3)
    # WordValueEncoder:47-52 adds the FULL weight at every probe
    s1 = one.agg(F.sum("weight")).first()[0]
    s3 = three.agg(F.sum("weight")).first()[0]
    assert s3 == pytest.approx(3 * s1)
    # distinct buckets grow with probes (collisions aside at dim 65536)
    assert (three.select("bucket").distinct().count()
            > one.select("bucket").distinct().count())


def test_adaptive_weight_formula(toks, spark):
    out = adaptive_word_encode(toks, dim=1 << 16, probes=1)
    # corpus: cat=2, dog=2, fish=1; total=5, distinct=3
    denom = 5 + 3 * 0.5 + 0.5
    w_cat = -math.log(2.5 / denom)
    w_fish = -math.log(1.5 / denom)
    doc2 = {r["weight"] for r in out.filter("doc_id = 2").collect()}
    assert any(abs(w - w_fish) < 1e-12 for w in doc2)
    assert w_fish > w_cat  # rare words weigh more
    # doc 1 has cat twice -> 2*w_cat in one bucket
    doc1 = sorted(r["weight"] for r in out.filter("doc_id = 1").collect())
    assert doc1[-1] == pytest.approx(2 * w_cat)


def test_interaction_encode_crosses(spark):
    rows = spark.createDataFrame(
        [(1, "us", "sports"), (1, "us", "news"), (2, "fr", "sports")],
        "doc_id long, country string, topic string")
    out = interaction_encode(rows, "country", "topic", dim=1 << 16,
                             weight=2.0)
    assert out.count() == 3  # three distinct crosses
    assert all(r["weight"] == 2.0 for r in out.collect())
    # the same cross from different docs hits the same bucket
    b1 = interaction_encode(rows.filter("doc_id = 1"), "country", "topic",
                            dim=1 << 16).filter("bucket is not null")
    b2 = interaction_encode(rows.filter("doc_id = 2"), "country", "topic",
                            dim=1 << 16)
    # deterministic: rerun gives identical rows
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, interaction_encode(
            rows, "country", "topic", dim=1 << 16,
            weight=2.0).collect()))
    assert b1.count() == 2 and b2.count() == 1


def test_constant_and_continuous_encode(spark):
    rows = spark.createDataFrame([(1, 3.5), (2, 1.25)],
                                 "doc_id long, price double")
    const = constant_encode(rows, dim=256, probes=2, weight=1.0)
    # no token in the hash: every doc maps to the SAME two buckets
    buckets = {r["bucket"] for r in const.collect()}
    assert len(buckets) == 2
    cont = constant_encode(rows, dim=256, value_col="price")
    vals = {r["doc_id"]: r["weight"] for r in cont.collect()}
    assert vals == {1: 3.5, 2: 1.25}
