"""Corpus mixture planning (functions/mixing.py): water-filling plan,
epoch upsampling, engine parity, determinism."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.mixing import (apply_mixture,
                                           apply_mixture_sql,
                                           mixture_plan, mixture_plan_sql,
                                           mixture_sample_oracle_sql)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist at teardown: a leaked cache entry substitutes an
    # InMemoryRelation for every later identical read in the shared
    # session, breaking the plan-audit tests' pruning assertions
    d = spark.read.parquet(DOCS).cache()
    yield d
    d.unpersist()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * "
              f"FROM read_parquet('{DOCS}')")
    return c


def test_plan_golden_math(spark):
    # avail: a=1000, b=300; shares 0.5/0.5, E=2 -> binding stratum b:
    # T = 300*2/0.5 = 1200; rate_a = 0.5*1200/1000 = 0.6, rate_b = 2.0
    df = spark.createDataFrame(
        [("a", i, 10) for i in range(100)]
        + [("b", 1000 + i, 10) for i in range(30)],
        "g string, id long, w long")
    plan = {r["stratum"]: r for r in
            mixture_plan(df, "g", "w", {"a": 0.5, "b": 0.5},
                         max_epochs=2.0).collect()}
    assert plan["a"]["available"] == 1000.0
    assert plan["a"]["rate"] == pytest.approx(0.6)
    assert plan["b"]["rate"] == 2.0
    assert plan["a"]["planned"] == plan["b"]["planned"] == 600.0


def test_plan_share_scale_invariant(docs):
    a = mixture_plan(docs, "lang", "n_chars", {"en": 0.6, "de": 0.4})
    b = mixture_plan(docs, "lang", "n_chars", {"en": 3.0, "de": 2.0})
    ra = {r["stratum"]: (r["rate"], r["planned"]) for r in a.collect()}
    rb = {r["stratum"]: (r["rate"], r["planned"]) for r in b.collect()}
    for k in ra:
        assert ra[k][0] == pytest.approx(rb[k][0], rel=1e-12)
        assert ra[k][1] == pytest.approx(rb[k][1], rel=1e-12)


def test_plan_absent_stratum_forces_zero(docs):
    plan = {r["stratum"]: r for r in
            mixture_plan(docs, "lang", "n_chars",
                         {"en": 0.5, "xx": 0.5}).collect()}
    assert plan["xx"]["available"] == 0.0
    assert plan["en"]["planned"] == 0.0 and plan["en"]["rate"] == 0.0


def test_plan_validation(docs):
    with pytest.raises(ValueError):
        mixture_plan(docs, "lang", "n_chars", {})
    with pytest.raises(ValueError):
        mixture_plan(docs, "lang", "n_chars", {"en": -0.1})
    with pytest.raises(ValueError):
        mixture_plan(docs, "lang", "n_chars", {"en": 1.0}, max_epochs=0)


def test_plan_duckdb_bit_parity(docs, con):
    shares = {"en": 0.55, "de": 0.2, "fr": 0.15, "es": 0.1}
    got = sorted(tuple(r) for r in
                 mixture_plan(docs, "lang", "n_chars", shares,
                              max_epochs=1.5).collect())
    exp = sorted(con.execute(mixture_plan_sql(
        "SELECT * FROM documents", "lang", "n_chars", shares,
        max_epochs=1.5)).fetchall())
    assert got == exp  # bit-exact, no rounding


def test_apply_epochs_and_parity(docs, con):
    shares = {"en": 0.6, "de": 0.25, "fr": 0.15}
    plan = mixture_plan(docs, "lang", "n_chars", shares, max_epochs=2.0)
    rows = plan.collect()
    ap = apply_mixture(docs, "lang", "doc_id", plan, seed=5)
    got = sorted((r["doc_id"], r["copy"]) for r in
                 ap.select("doc_id", "copy").collect())
    exp = sorted(con.execute(
        "SELECT doc_id, copy FROM ("
        + apply_mixture_sql("SELECT * FROM documents", "lang",
                            "doc_id", rows, seed=5) + ")").fetchall())
    assert got == [tuple(r) for r in exp]
    # the rate-2.0 stratum keeps every doc exactly twice
    rate2 = [r["stratum"] for r in rows if r["rate"] == 2.0]
    assert rate2
    per = {r["doc_id"]: r["n"] for r in
           ap.filter(F.col("lang") == rate2[0]).groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per and set(per.values()) == {2}
    # in-engine oracle (plan + thresholds recomputed in SQL) agrees too
    exp2 = sorted(con.execute(
        "SELECT doc_id, copy FROM ("
        + mixture_sample_oracle_sql("SELECT * FROM documents", "lang",
                                    "doc_id", "n_chars", shares,
                                    max_epochs=2.0, seed=5)
        + ")").fetchall())
    assert got == [tuple(r) for r in exp2]


def test_apply_partitioning_invariance(docs):
    shares = {"en": 0.5, "de": 0.5}
    plan = mixture_plan(docs, "lang", "n_chars", shares, max_epochs=1.7)
    a = sorted((r["doc_id"], r["copy"]) for r in
               apply_mixture(docs, "lang", "doc_id", plan,
                             seed=3).collect())
    b = sorted((r["doc_id"], r["copy"]) for r in
               apply_mixture(docs.repartition(17), "lang", "doc_id",
                             plan, seed=3).collect())
    assert a == b


def test_achieved_mix_tracks_recipe(docs):
    shares = {"en": 0.6, "de": 0.25, "fr": 0.15}
    plan = mixture_plan(docs, "lang", "n_chars", shares, max_epochs=2.0)
    ap = apply_mixture(docs, "lang", "doc_id", plan, seed=1)
    got = {r["lang"]: r["w"] for r in
           ap.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()}
    tot = sum(got.values())
    for k, s in shares.items():
        assert abs(got[k] / tot - s) < 0.05
