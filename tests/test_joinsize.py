"""Sketch-based join-size estimation (plans/joinsize.py): exact-path
correctness, AMS bound on the estimate, and Spark-vs-in-core parity."""

import numpy as np
import pandas as pd
import pytest

from mahout_spark.core.countsketch import CountSketch
from mahout_spark.core.privacy import md5_long60_py


@pytest.fixture(scope="module")
def tables(spark):
    rng = np.random.default_rng(8)
    a = [(f"k{v}",) for v in rng.integers(0, 60, size=4000)]
    b = [(f"k{v}",) for v in rng.integers(20, 90, size=3000)]
    return (spark.createDataFrame(a, "token string"),
            spark.createDataFrame(b, "token string"))


def _true_size(df_a, df_b):
    fa = df_a.toPandas()["token"].value_counts()
    fb = df_b.toPandas()["token"].value_counts()
    shared = fa.index.intersection(fb.index)
    return int((fa[shared] * fb[shared]).sum())


def test_exact_join_size(spark, tables):
    from mahout_spark.plans.joinsize import exact_join_size

    df_a, df_b = tables
    got = exact_join_size(df_a, "token", df_b, "token").collect()[0]
    assert got["true_size"] == _true_size(df_a, df_b)
    # disjoint keys -> 0, not null
    empty = spark.createDataFrame([("zzz",)], "token string")
    assert exact_join_size(df_a, "token", empty,
                           "token").collect()[0]["true_size"] == 0


def test_estimate_within_bound(spark, tables):
    from mahout_spark.plans.joinsize import join_size_estimate

    df_a, df_b = tables
    row = join_size_estimate(df_a, "token", df_b, "token",
                             depth=9, width=1024, seed=5).collect()[0]
    true = _true_size(df_a, df_b)
    assert abs(row["join_size_est"] - true) <= row["err_bound"]
    assert abs(row["join_size_est"] - true) / true < 0.1
    # F2 estimates track the true squared norms
    fa = df_a.toPandas()["token"].value_counts().to_numpy(dtype=float)
    assert abs(row["f2_a"] - fa @ fa) / (fa @ fa) < 0.15


def test_parity_family_matches_incore(spark, tables):
    from pyspark.sql import functions as F

    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.plans.joinsize import join_size_estimate

    df_a, df_b = tables
    row = join_size_estimate(
        df_a, "token", df_b, "token", depth=5, width=97, seed=21,
        family="parity", key_expr_a=md5_long60(F.col("token")),
        key_expr_b=md5_long60(F.col("token"))).collect()[0]
    ref = {}
    for name, df in (("a", df_a), ("b", df_b)):
        cs = CountSketch(depth=5, width=97, seed=21, family="parity")
        ks = np.array([md5_long60_py(t) for t in df.toPandas()["token"]],
                      dtype=np.int64)
        cs.update_batch(ks)
        ref[name] = cs
    assert row["join_size_est"] == ref["a"].inner_product(ref["b"])
    assert row["f2_a"] == ref["a"].f2()
    assert row["f2_b"] == ref["b"].f2()
