"""Sketch-driven skew planning: plan exactness vs a plain groupBy,
empty-plan edge, salted_join == plain join (inner/left, null keys,
partitioning invariance), and genuine fan-out on the heavy key."""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mahout_spark.plans.skewplan import (salted_join, skew_plan,
                                         skew_plan_oracle_sql)


@pytest.fixture(scope="module")
def skewed(spark):
    """700 rows: 'head' owns 500, 'mid' 150, the rest singletons."""
    rows = [Row(k="head", v=i) for i in range(500)] + \
           [Row(k="mid", v=i) for i in range(150)] + \
           [Row(k=f"t{i}", v=i) for i in range(50)]
    return spark.createDataFrame(rows)


def test_plan_exact(skewed):
    got = {r["k"]: (r["n"], r["salt_factor"])
           for r in skew_plan(skewed, "k", 100).collect()}
    assert got == {"head": (500, 5), "mid": (150, 2)}


def test_plan_empty_when_target_large(skewed, spark):
    p = skew_plan(skewed, "k", 10_000)
    assert p.count() == 0
    assert p.columns == ["k", "n", "salt_factor"]


def test_plan_oracle_parity(skewed):
    pdf = skewed.toPandas()  # noqa: F841 — registered for duckdb below
    sql = skew_plan_oracle_sql("SELECT * FROM pdf", "k", 100)
    exp = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    got = {r["k"]: (r["n"], r["salt_factor"])
           for r in skew_plan(skewed, "k", 100).collect()}
    assert got == exp


def _canon(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


def test_salted_join_equals_plain(skewed, spark):
    build = spark.createDataFrame(
        [Row(k="head", w="H1"), Row(k="head", w="H2"),
         Row(k="mid", w="M"), Row(k="t3", w="T"),
         Row(k="absent", w="X")])
    plan = skew_plan(skewed, "k", 100)
    for how in ("inner", "left"):
        plain = skewed.join(build, "k", how) \
            .select("k", "v", "w")
        salted = salted_join(skewed, build, "k", plan, how=how)
        assert _canon(salted) == _canon(plain)


def test_salted_join_null_keys(spark):
    probe = spark.createDataFrame(
        [Row(k=None, v=1), Row(k="a", v=2)],
        "k string, v int")
    build = spark.createDataFrame(
        [Row(k=None, w=9), Row(k="a", w=8)], "k string, w int")
    plan = skew_plan(probe, "k", 10)  # empty plan
    for how in ("inner", "left"):
        plain = probe.join(build, "k", how).select("k", "v", "w")
        got = salted_join(probe, build, "k", plan, how=how)
        assert _canon(got) == _canon(plain)


def test_salted_join_partitioning_invariance(skewed, spark):
    build = spark.createDataFrame([Row(k="head", w="H"), Row(k="mid", w="M")])
    plan = skew_plan(skewed, "k", 100)
    a = salted_join(skewed, build, "k", plan)
    b = salted_join(skewed.repartition(13), build.repartition(7),
                    "k", plan)
    assert _canon(a) == _canon(b)


def test_heavy_key_actually_fans_out(skewed, spark):
    """The probe side of the heavy key must use >1 salt value (the whole
    point: no single reducer owns the head key)."""
    from mahout_spark.plans.skewplan import _row_salt

    plan = skew_plan(skewed, "k", 100)
    p = F.broadcast(plan.select(F.col("k").alias("__pk"), "salt_factor"))
    pr = skewed.join(p, skewed["k"] == F.col("__pk"), "inner")
    salts = pr.withColumn(
        "__salt", _row_salt(skewed, F.col("salt_factor").cast("long"), 41)) \
        .filter(F.col("k") == "head") \
        .select("__salt").distinct().count()
    assert salts == 5


def test_salted_join_rejects_unsupported_how(skewed, spark):
    build = spark.createDataFrame([Row(k="head", w="H")])
    plan = skew_plan(skewed, "k", 100)
    with pytest.raises(ValueError, match="inner"):
        salted_join(skewed, build, "k", plan, how="right")


def test_salted_join_custom_salt_expr(skewed, spark):
    """Duplicate-heavy probes: a caller-supplied salt expression (here a
    row id) must still produce exactly the plain join's result."""
    probe = skewed.withColumn("rid", F.monotonically_increasing_id())
    build = spark.createDataFrame(
        [("head", "H1"), ("head", "H2"), ("mid", "M")], "k string, w string")
    plan = skew_plan(skewed, "k", 100)
    plain = probe.join(build, "k").select("k", "v", "rid", "w")
    got = salted_join(probe, build, "k", plan, salt_expr=F.col("rid"))
    assert _canon(got.select("k", "v", "rid", "w")) == _canon(plain)
