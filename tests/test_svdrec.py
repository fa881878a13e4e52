"""SVD recommender — ALS-WR factorizer + recommend-from-factors.

In-core oracles mirror AlternatingLeastSquaresSolver.solve (observed-only
ridge) and SVDRecommender.estimatePreference (plain dot product).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.svdrec import (alswr_factorize, svd_estimate,
                                           svd_recommend)


@pytest.fixture(scope="module")
def prefs(spark):
    # small dense-ish ratings matrix with planted rank-2 structure
    rng = np.random.default_rng(5)
    u_true = rng.uniform(1, 2, size=(12, 2))
    v_true = rng.uniform(1, 2, size=(8, 2))
    full = u_true @ v_true.T
    rows = [(u, i, float(round(full[u, i], 3)))
            for u in range(12) for i in range(8)
            if rng.uniform() < 0.8]
    return spark.createDataFrame(rows, ["user_id", "item_id", "pref"])


def _factors_np(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["row_id"], {})[r["col_id"]] = r["value"]
    ids = sorted(out)
    k = len(out[ids[0]])
    return ids, np.array([[out[i][j] for j in range(k)] for i in ids])


def test_one_sweep_matches_incore_ridge(spark, prefs):
    # with iterations=1 the user factors must equal the per-user
    # observed-only ridge solve against the deterministic item init
    k, lam = 3, 0.05
    u, v = alswr_factorize(prefs, k=k, lambda_=lam, iterations=1)
    pdf = prefs.toPandas()
    # reconstruct the INIT item matrix the sweep solved against:
    # feature 0 = avg rating, rest = hash coin * 0.1 — recompute via Spark
    # (the hash must match exactly), by running the init expression alone
    coin = (F.pmod(F.xxhash64("row_id", "col_id", F.lit(77)),
                   F.lit(1 << 24)).cast("double") / F.lit(float(1 << 24)))
    jcols = F.array(*[F.lit(j) for j in range(k)])
    v0_df = (prefs.groupBy(F.col("item_id").alias("row_id"))
             .agg(F.avg("pref").alias("__avg"))
             .select("row_id", F.explode(jcols).alias("col_id"), "__avg")
             .withColumn("value", F.when(F.col("col_id") == 0,
                                         F.col("__avg"))
                         .otherwise(coin * 0.1))
             .select("row_id", "col_id", "value"))
    iids, v0 = _factors_np(v0_df)
    iidx = {i: j for j, i in enumerate(iids)}
    uids, u_got = _factors_np(u)
    for uid in uids:
        rated = pdf[pdf["user_id"] == uid]
        y = v0[[iidx[i] for i in rated["item_id"]]]
        r = rated["pref"].to_numpy()
        w = np.linalg.solve(y.T @ y + lam * len(r) * np.eye(k), y.T @ r)
        got = u_got[uids.index(uid)]
        assert np.allclose(got, w, atol=1e-9), uid


def test_alswr_reconstructs_planted_structure(spark, prefs):
    u, v = alswr_factorize(prefs, k=2, lambda_=0.02, iterations=8)
    est = svd_estimate(u, v, prefs).toPandas()
    truth = {(r["user_id"], r["item_id"]): r["pref"]
             for r in prefs.collect()}
    errs = [abs(r.estimate - truth[(r.user_id, r.item_id)])
            for r in est.itertuples()]
    assert len(errs) == len(truth)
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 0.1, rmse  # planted rank-2 -> near-exact fit


def test_estimate_is_dot_product(spark):
    u = spark.createDataFrame(
        [(1, 0, 2.0), (1, 1, 3.0)], ["row_id", "col_id", "value"])
    v = spark.createDataFrame(
        [(7, 0, 0.5), (7, 1, -1.0), (8, 0, 1.0), (8, 1, 1.0)],
        ["row_id", "col_id", "value"])
    pairs = spark.createDataFrame([(1, 7), (1, 8)], ["user_id", "item_id"])
    got = {r["item_id"]: r["estimate"]
           for r in svd_estimate(u, v, pairs).collect()}
    assert abs(got[7] - (2.0 * 0.5 + 3.0 * -1.0)) < 1e-12
    assert abs(got[8] - (2.0 + 3.0)) < 1e-12


def test_recommend_excludes_seen_and_ranks(spark, prefs):
    u, v = alswr_factorize(prefs, k=2, lambda_=0.02, iterations=4)
    recs = svd_recommend(u, v, prefs, top_n=3).toPandas()
    seen = {(r["user_id"], r["item_id"]) for r in prefs.collect()}
    for r in recs.itertuples():
        assert (r.user_id, r.item_id) not in seen
    # per-user scores are non-increasing
    for _, g in recs.groupby("user_id"):
        s = g["score"].to_list()
        assert s == sorted(s, reverse=True)
    assert (recs.groupby("user_id").size() <= 3).all()


def test_recommend_include_known_scores_everything(spark, prefs):
    u, v = alswr_factorize(prefs, k=2, lambda_=0.02, iterations=2)
    n_items = prefs.select("item_id").distinct().count()
    recs = svd_recommend(u, v, prefs, top_n=n_items, include_known=True)
    per_user = recs.groupBy("user_id").count().collect()
    assert all(r["count"] == n_items for r in per_user)


def test_recommend_candidates_bound(spark, prefs):
    u, v = alswr_factorize(prefs, k=2, lambda_=0.02, iterations=2)
    cands = spark.createDataFrame([(0, 0), (0, 1), (1, 2)],
                                  ["user_id", "item_id"])
    recs = svd_recommend(u, v, prefs.limit(0), top_n=5, candidates=cands)
    got = {(r["user_id"], r["item_id"]) for r in recs.collect()}
    assert got <= {(0, 0), (0, 1), (1, 2)}


def test_string_ids_supported(spark):
    prefs = spark.createDataFrame(
        [("alice", "itemA", 4.0), ("alice", "itemB", 2.0),
         ("bob", "itemA", 5.0), ("bob", "itemC", 1.0),
         ("carol", "itemB", 3.0), ("carol", "itemC", 2.0)],
        ["user_id", "item_id", "pref"])
    u, v = alswr_factorize(prefs, k=2, lambda_=0.05, iterations=2)
    recs = svd_recommend(u, v, prefs, top_n=2).collect()
    assert recs
    users = {r["user_id"] for r in recs}
    assert users <= {"alice", "bob", "carol"}
    assert all(isinstance(r["item_id"], str) for r in recs)


def test_evaluate_factorization_exact(spark):
    from mahout_spark.operators.svdrec import evaluate_factorization

    # rank-1 integral factors: u = [2], [3]; v = [1], [2]
    uf = spark.createDataFrame(
        [(10, 0, 2.0), (11, 0, 3.0)], "row_id long, col_id int, value double")
    vf = spark.createDataFrame(
        [(100, 0, 1.0), (101, 0, 2.0)], "row_id long, col_id int, value double")
    # probe: (10,100,3) err=1; (11,101,5) err=1; (12,100,9) -> no factors
    probe = spark.createDataFrame(
        [(10, 100, 3.0), (11, 101, 5.0), (12, 100, 9.0)],
        "user_id long, item_id long, pref double")
    res = evaluate_factorization(uf, vf, probe)
    assert res["n_probe"] == 3 and res["n_scored"] == 2
    assert res["mae"] == pytest.approx(1.0)
    assert res["rmse"] == pytest.approx(1.0)
