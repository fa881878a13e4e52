"""RatingSGDFactorizer twin: in-core parity, shard determinism,
persistence round-trip (FilePersistenceStrategy)."""

import math

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.ratingsgd import (RatingSGD, load_factorization,
                                              rating_sgd_factorize,
                                              save_factorization)

# deterministic taste-group matrix: group signal for SGD to learn
ROWS = [(u, i, (4.5 if u % 3 == i % 3 else 1.5)
         + ((u * 7 + i * 13) % 5) / 10.0)
        for u in range(12) for i in range(9)
        if (u * 31 + i * 17) % 5 != 0]


@pytest.fixture(scope="module")
def prefs(spark):
    return spark.createDataFrame(
        ROWS, "user_id long, item_id long, pref double").persist()


def _rmse_incore(model, rows):
    errs = [(model.predict(u, i) - p) ** 2 for u, i, p in rows]
    return math.sqrt(sum(errs) / len(errs))


def test_incore_learns_the_matrix():
    m = RatingSGD(num_features=8, num_iterations=100,
                  learning_rate=0.02).fit(ROWS)
    rmse = _rmse_incore(m, ROWS)
    mean = sum(p for _, _, p in ROWS) / len(ROWS)
    base = math.sqrt(sum((p - mean) ** 2 for _, _, p in ROWS) / len(ROWS))
    assert rmse < 0.2 < base  # fits far below the constant predictor


def test_single_shard_matches_incore_exactly(spark, prefs):
    uf, vf = rating_sgd_factorize(prefs, num_features=6, num_iterations=5,
                                  n_shards=1, seed=101)
    # same order-independent decimal mean the distributed trainer uses
    row = prefs.agg(
        F.sum(F.col("pref").cast("decimal(30,15)")).alias("s"),
        F.count("*").alias("n")).first()
    ga = float(row["s"] / row["n"])
    m = RatingSGD(num_features=6, num_iterations=5, seed=101).fit(
        ROWS, global_avg=ga)
    got_u = {(r["row_id"], r["col_id"]): r["value"] for r in uf.collect()}
    for uid, vec in m.users.items():
        for j, v in enumerate(vec):
            assert got_u[(uid, j)] == pytest.approx(v, rel=0, abs=0), \
                (uid, j)
    got_v = {(r["row_id"], r["col_id"]): r["value"] for r in vf.collect()}
    for iid, vec in m.items.items():
        for j, v in enumerate(vec):
            assert got_v[(iid, j)] == pytest.approx(v, rel=0, abs=0)


def test_sharded_deterministic_under_repartition(spark, prefs):
    a_u, a_v = rating_sgd_factorize(prefs.repartition(7), num_features=6,
                                    num_iterations=3, n_shards=4)
    b_u, b_v = rating_sgd_factorize(prefs.repartition(2, "item_id"),
                                    num_features=6, num_iterations=3,
                                    n_shards=4)
    assert sorted(map(tuple, a_u.collect())) == \
        sorted(map(tuple, b_u.collect()))
    assert sorted(map(tuple, a_v.collect())) == \
        sorted(map(tuple, b_v.collect()))


def test_sharded_averaging_still_learns(spark, prefs):
    from mahout_spark.operators.svdrec import evaluate_factorization

    uf, vf = rating_sgd_factorize(prefs, num_features=8,
                                  num_iterations=30, learning_rate=0.02,
                                  n_shards=4)
    stats = evaluate_factorization(uf, vf, prefs)
    mean = sum(p for _, _, p in ROWS) / len(ROWS)
    base = math.sqrt(sum((p - mean) ** 2 for _, _, p in ROWS) / len(ROWS))
    assert stats["rmse"] < base  # beats the constant predictor


def test_feeds_svd_recommend(spark, prefs):
    from mahout_spark.operators.svdrec import svd_recommend

    uf, vf = rating_sgd_factorize(prefs, num_features=6, num_iterations=3,
                                  n_shards=2)
    recs = svd_recommend(uf, vf, prefs, top_n=3)
    per_user = recs.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert recs.count() > 0 and per_user <= 3
    seen = {(u, i) for u, i, _ in ROWS}
    assert all((r["user_id"], r["item_id"]) not in seen
               for r in recs.collect())


def test_persistence_round_trip(spark, prefs, tmp_path):
    uf, vf = rating_sgd_factorize(prefs, num_features=6, num_iterations=2,
                                  n_shards=2)
    save_factorization(uf, vf, str(tmp_path / "fact"))
    uf2, vf2 = load_factorization(spark, str(tmp_path / "fact"))
    assert sorted(map(tuple, uf.collect())) == \
        sorted(map(tuple, uf2.collect()))
    assert sorted(map(tuple, vf.collect())) == \
        sorted(map(tuple, vf2.collect()))


def test_rejects_too_few_features():
    with pytest.raises(ValueError):
        RatingSGD(num_features=3)


def test_svdpp_incore_learns():
    from mahout_spark.operators.ratingsgd import SVDPlusPlus

    m = SVDPlusPlus(num_features=8, num_iterations=100,
                    learning_rate=0.02, prevent_overfitting=0.02).fit(ROWS)
    # the reference's fold-in divides the global-average slot by sqrt(n)
    # (SVDPlusPlusFactorizer.factorize():100-112), so served estimates
    # carry a constant shift the training loop never saw; rank/learning
    # quality is the CENTERED residual
    resid = [m.predict(u, i) - p for u, i, p in ROWS]
    mean_r = sum(resid) / len(resid)
    centered = math.sqrt(sum((r - mean_r) ** 2 for r in resid)
                         / len(resid))
    mean = sum(p for _, _, p in ROWS) / len(ROWS)
    base = math.sqrt(sum((p - mean) ** 2 for _, _, p in ROWS) / len(ROWS))
    assert centered < base * 0.3  # implicit-feedback model fits the matrix


def test_svdpp_single_shard_matches_incore(spark, prefs):
    from mahout_spark.operators.ratingsgd import SVDPlusPlus, svdpp_factorize

    uf, vf = svdpp_factorize(prefs, num_features=6, num_iterations=3,
                             n_shards=1, seed=101)
    row = prefs.agg(
        F.sum(F.col("pref").cast("decimal(30,15)")).alias("s"),
        F.count("*").alias("n")).first()
    ga = float(row["s"] / row["n"])
    m = SVDPlusPlus(num_features=6, num_iterations=3, seed=101).fit(
        ROWS, global_avg=ga)
    got_u = {(r["row_id"], r["col_id"]): r["value"] for r in uf.collect()}
    for uid, vec in m.users.items():
        for j, v in enumerate(vec):
            assert got_u[(uid, j)] == pytest.approx(v, rel=0, abs=0)
    got_v = {(r["row_id"], r["col_id"]): r["value"] for r in vf.collect()}
    for iid, vec in m.items.items():
        for j, v in enumerate(vec):
            assert got_v[(iid, j)] == pytest.approx(v, rel=0, abs=0)


def test_svdpp_sharded_deterministic(spark, prefs):
    from mahout_spark.operators.ratingsgd import svdpp_factorize

    a_u, _ = svdpp_factorize(prefs.repartition(5), num_features=6,
                             num_iterations=2, n_shards=3)
    b_u, _ = svdpp_factorize(prefs.repartition(3, "user_id"),
                             num_features=6, num_iterations=2, n_shards=3)
    assert sorted(map(tuple, a_u.collect())) == \
        sorted(map(tuple, b_u.collect()))
