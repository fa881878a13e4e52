"""Implicit-feedback ALS (Hu/Koren/Volinsky 2008) — parity with an
in-core replay of the reference solver's formulas, plus ranking sanity.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.svdrec import (implicit_als_factorize,
                                           svd_estimate, svd_recommend)


def _incore_sweep(ratings, y_factors, lambda_, alpha, k):
    """Reference ImplicitFeedbackAlternatingLeastSquaresSolver.solve for
    every entity: (Y'Y + Y'(Cu-I)Y + lambda I) w = Y' Cu p(u)."""
    yty = np.zeros((k, k))
    for vec in y_factors.values():
        yty += np.outer(vec, vec)
    out = {}
    for ent, rows in ratings.items():
        y = np.array([y_factors[c] for c, _ in rows])
        r = np.array([val for _, val in rows])
        cm1 = alpha * r
        a = yty + y.T @ (cm1[:, None] * y) + lambda_ * np.eye(k)
        rhs = y.T @ (1.0 + cm1)
        out[ent] = np.linalg.solve(a, rhs)
    return out


@pytest.fixture(scope="module")
def interactions(spark):
    # deterministic implicit counts: user u interacted with item i
    # count times, two taste groups
    rows = []
    for u in range(8):
        for i in range(10):
            if (u + 2 * i) % 5 == 0:
                continue  # held-out cells: stay unobserved
            same_group = (u % 2) == (i % 2)
            cnt = (u * 7 + i * 3) % 4 + (3 if same_group else 0)
            if cnt > 0:
                rows.append((u, i, float(cnt)))
    return spark.createDataFrame(rows, "user_id long, item_id long, "
                                       "pref double").persist()


def test_one_sweep_matches_incore_replay(spark, interactions):
    k, lam, alpha = 4, 0.1, 10.0
    # fixed deterministic init passed to BOTH paths
    init_rows = [(i, j, 0.1 + 0.01 * (i * k + j))
                 for i in range(10) for j in range(k)]
    init_v = spark.createDataFrame(
        init_rows, "row_id long, col_id long, value double")
    u_df, _ = implicit_als_factorize(interactions, k=k, lambda_=lam,
                                     alpha=alpha, iterations=1,
                                     init_v=init_v)
    got = (u_df.toPandas().pivot(index="row_id", columns="col_id",
                                 values="value").sort_index())

    y = {i: np.array([0.1 + 0.01 * (i * k + j) for j in range(k)])
         for i in range(10)}
    by_user = {}
    for r in interactions.collect():
        by_user.setdefault(r["user_id"], []).append(
            (r["item_id"], r["pref"]))
    want = _incore_sweep(by_user, y, lam, alpha, k)
    for uid in want:
        assert np.allclose(got.loc[uid].to_numpy(), want[uid], atol=1e-9)


def test_lambda_not_scaled_by_support(spark):
    """The implicit solve adds lambda*I (NOT lambda*n*I): two users with
    different support but identical per-row structure must differ
    exactly the way the unscaled-ridge replay says."""
    k, lam, alpha = 3, 5.0, 1.0
    rows = [(0, 0, 2.0), (1, 0, 2.0), (1, 1, 2.0), (1, 2, 2.0)]
    prefs = spark.createDataFrame(rows, "user_id long, item_id long, "
                                        "pref double")
    init_rows = [(i, j, [1.0, 0.5, 0.25][j] * (i + 1))
                 for i in range(3) for j in range(k)]
    init_v = spark.createDataFrame(
        init_rows, "row_id long, col_id long, value double")
    u_df, _ = implicit_als_factorize(prefs, k=k, lambda_=lam, alpha=alpha,
                                     iterations=1, init_v=init_v)
    got = {r["row_id"]: None for r in u_df.collect()}
    gotm = (u_df.toPandas().pivot(index="row_id", columns="col_id",
                                  values="value").sort_index())
    y = {i: np.array([[1.0, 0.5, 0.25][j] * (i + 1) for j in range(k)])
         for i in range(3)}
    want = _incore_sweep({0: [(0, 2.0)], 1: [(0, 2.0), (1, 2.0),
                                             (2, 2.0)]}, y, lam, alpha, k)
    for uid in (0, 1):
        assert np.allclose(gotm.loc[uid].to_numpy(), want[uid], atol=1e-10)
    assert len(got) == 2


def test_observed_items_rank_above_unobserved(spark, interactions):
    u, v = implicit_als_factorize(interactions, k=6, lambda_=0.05,
                                  alpha=20.0, iterations=8)
    pairs = (interactions.select("user_id").distinct()
             .crossJoin(interactions.select("item_id").distinct()))
    est = svd_estimate(u, v, pairs).toPandas()
    seen = {(r["user_id"], r["item_id"])
            for r in interactions.collect()}
    est["obs"] = [(r.user_id, r.item_id) in seen
                  for r in est.itertuples()]
    mean_obs = est[est.obs]["estimate"].mean()
    mean_un = est[~est.obs]["estimate"].mean()
    # observed cells have preference p=1 and confidence-weighted pull;
    # unobserved are pushed toward 0
    assert mean_obs > mean_un + 0.2
    assert mean_obs > 0.5


def test_alpha_raises_observed_confidence(spark, interactions):
    ests = {}
    for alpha in (1.0, 40.0):
        u, v = implicit_als_factorize(interactions, k=4, lambda_=0.1,
                                      alpha=alpha, iterations=4)
        est = svd_estimate(u, v, interactions.select("user_id",
                                                     "item_id"))
        ests[alpha] = est.agg(F.avg("estimate")).first()[0]
    assert ests[40.0] > ests[1.0]


def test_recommend_composes_with_implicit_factors(spark, interactions):
    u, v = implicit_als_factorize(interactions, k=4, iterations=3)
    recs = svd_recommend(u, v, interactions, top_n=3)
    pdf = recs.toPandas()
    assert set(pdf.columns) >= {"user_id", "item_id", "score"}
    assert (pdf.groupby("user_id").size() <= 3).all()
    seen = {(r["user_id"], r["item_id"]) for r in interactions.collect()}
    assert all((r.user_id, r.item_id) not in seen
               for r in pdf.itertuples())


def test_deterministic_across_runs(spark, interactions):
    outs = []
    for _ in range(2):
        u, _v = implicit_als_factorize(interactions, k=3, iterations=2,
                                       seed=5)
        outs.append(u.orderBy("row_id", "col_id").toPandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
