"""Deterministic hash sampling: rate accuracy, retry stability, DuckDB
parity, stratified rates, disjoint splits."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions import sampling as S

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_rate_accuracy_and_determinism(docs):
    kept = S.sample_by_rate(docs, "doc_id", 0.3, seed=7)
    n, total = kept.count(), docs.count()
    assert abs(n / total - 0.3) < 0.08          # 500 docs, binomial noise
    again = S.sample_by_rate(docs.repartition(13), "doc_id", 0.3, seed=7)
    assert sorted(r["doc_id"] for r in kept.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    # nested property: rate 0.1 sample ⊂ rate 0.3 sample (same seed)
    sub = S.sample_by_rate(docs, "doc_id", 0.1, seed=7)
    ids3 = {r["doc_id"] for r in kept.collect()}
    assert {r["doc_id"] for r in sub.collect()} <= ids3


def test_seed_independence(docs):
    a = {r["doc_id"] for r in
         S.sample_by_rate(docs, "doc_id", 0.5, seed=1).collect()}
    b = {r["doc_id"] for r in
         S.sample_by_rate(docs, "doc_id", 0.5, seed=2).collect()}
    assert a != b


def test_matches_duckdb(docs):
    sp = sorted(r["doc_id"] for r in
                S.sample_by_rate(docs, "doc_id", 0.25, seed=3)
                .select("doc_id").collect())
    du = duckdb.sql(S.sample_by_rate_sql(
        f"'{DOCS}'", "doc_id", 0.25, seed=3)).fetchdf()
    assert sp == sorted(du["doc_id"].tolist())


def test_stratified_rates(docs):
    rates = {"en": 0.5, "de": 0.25, "zh": 1.0}
    out = S.stratified_sample(docs, "lang", rates, "doc_id", seed=5)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["zh"] == base["zh"]              # rate 1.0 keeps all
    assert "fr" not in got and "es" not in got  # default_rate 0
    assert 0.2 < got["en"] / base["en"] < 0.8
    # DuckDB parity
    sp = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    du = duckdb.sql(S.stratified_sample_sql(
        f"'{DOCS}'", "lang", rates, "doc_id", seed=5)).fetchdf()
    assert sp == sorted(du["doc_id"].tolist())


def test_split_fractions_disjoint_exhaustive(docs):
    out = S.split_fractions(docs, "doc_id", [0.6, 0.2, 0.2], seed=9)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {0, 1, 2}             # fractions sum to 1
    assert sum(counts.values()) == docs.count()
    assert counts[0] > counts[1] and counts[0] > counts[2]
    # stability under repartition
    again = S.split_fractions(docs.repartition(17), "doc_id",
                              [0.6, 0.2, 0.2], seed=9)
    a = {(r["doc_id"], r["split"]) for r in
         out.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in
         again.select("doc_id", "split").collect()}
    assert a == b


def test_bad_rates_raise(docs):
    with pytest.raises(ValueError):
        S.sample_by_rate(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        S.split_fractions(docs, "doc_id", [0.9, 0.2])
