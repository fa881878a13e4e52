"""SGD logistic regression: reference-update parity, separable-data

accuracy, deterministic parallel training, Catalyst scoring parity,
DuckDB gate twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _replay_reference(labels, rows, n_cat, n_feat, lambda_=1e-5,
                      prior="L2"):
    """Independent slow-loop replay of the reference update rule

    (AbstractOnlineLogisticRegression.train + OnlineLogisticRegression
    annealing), used to cross-check the vectorized learner."""
    mu0, decay, step_offset, forget, pto = 1.0, 1 - 1e-3, 10, -0.5, 20
    beta = np.zeros((n_cat - 1, n_feat))
    update_steps = np.zeros(n_feat)
    update_counts = np.full(n_feat, float(pto))
    step = 0

    def link(v):
        m = v.max()
        if m >= 40:
            e = np.exp(v - m)
            return e / e.sum()
        e = np.exp(v)
        return e / (1.0 + e.sum())

    for y, x in zip(labels, rows):
        x = np.asarray(x, dtype=float)
        lr = mu0 * decay ** step * (step + step_offset) ** forget
        for j in np.nonzero(x)[0]:
            missing = step - update_steps[j]
            if missing > 0:
                rate = lambda_ * lr * np.sqrt(pto / update_counts[j])
                for i in range(n_cat - 1):
                    if prior == "L2":
                        beta[i, j] *= (1.0 - rate) ** missing
                    else:
                        beta[i, j] = np.sign(beta[i, j]) * max(
                            0.0, abs(beta[i, j]) - rate * missing)
                update_steps[j] = step
        p = link(beta @ x)
        for i in range(n_cat - 1):
            g = (1.0 if y == i + 1 else 0.0) - p[i]
            for j in np.nonzero(x)[0]:
                beta[i, j] += g * lr * np.sqrt(
                    pto / update_counts[j]) * x[j]
        for j in np.nonzero(x)[0]:
            update_steps[j] = step
            update_counts[j] += 1
        step += 1
    return beta


@pytest.mark.parametrize("prior", ["L2", "L1"])
def test_update_rule_matches_reference_replay(prior):
    from mahout_spark.operators.sgd import OnlineLogisticRegression

    rng = np.random.default_rng(0)
    n, n_feat, n_cat = 60, 6, 3
    rows = rng.normal(size=(n, n_feat))
    rows[rng.random(size=rows.shape) < 0.4] = 0.0  # sparsity: exercises
    labels = rng.integers(0, n_cat, size=n)        # lazy regularization
    m = OnlineLogisticRegression(n_cat, n_feat, prior=prior)
    m.train_many(labels, rows)
    want = _replay_reference(labels, rows, n_cat, n_feat, prior=prior)
    assert np.allclose(m.beta, want, atol=1e-12)


def test_separable_data_high_accuracy():
    from mahout_spark.operators.sgd import OnlineLogisticRegression

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4000, 2))
    x = x[np.abs(x[:, 0] + x[:, 1]) > 0.3][:2000]  # margin-separable
    y = (x[:, 0] + x[:, 1] > 0).astype(int)
    xb = np.hstack([np.ones((len(x), 1)), x])  # bias term
    m = OnlineLogisticRegression(2, 3, lambda_=1e-9)
    for _ in range(5):
        m.train_many(y, xb)
    pred = np.array([np.argmax(m.classify_full(r)) for r in xb])
    assert (pred == y).mean() > 0.99


def test_link_overflow_guard():
    from mahout_spark.operators.sgd import OnlineLogisticRegression

    v = np.array([50.0, 45.0])
    p = OnlineLogisticRegression._link(v)
    assert np.isfinite(p).all() and abs(p.sum() - 1.0) < 1e-9
    small = OnlineLogisticRegression._link(np.array([1.0, -1.0]))
    assert small.sum() < 1.0


@pytest.fixture(scope="module")
def separable_df(spark):
    rng = np.random.default_rng(3)
    n = 1200
    x = rng.normal(size=(n, 2))
    y = (x[:, 0] - 0.5 * x[:, 1] > 0).astype(int)
    rows = [(int(yy), [1.0, float(a), float(b)])
            for yy, (a, b) in zip(y, x)]
    return spark.createDataFrame(rows, ["label", "features"]), y


def test_parallel_sgd_deterministic_and_accurate(spark, separable_df):
    from mahout_spark.operators.sgd import (OnlineLogisticRegression,
                                            parallel_sgd_train)

    df, y = separable_df
    m1 = parallel_sgd_train(df, 2, 3, epochs=3, n_shards=4,
                            lambda_=1e-9)
    m2 = parallel_sgd_train(df, 2, 3, epochs=3, n_shards=4,
                            lambda_=1e-9)
    assert np.array_equal(m1.beta, m2.beta)  # bit-deterministic

    rows = df.collect()
    acc = np.mean([np.argmax(m1.classify_full(
        np.asarray(r["features"]))) == r["label"] for r in rows])
    assert acc > 0.97


def test_catalyst_scoring_matches_incore(spark, separable_df):
    from mahout_spark.operators.sgd import (OnlineLogisticRegression,
                                            logistic_classify,
                                            parallel_sgd_train)

    df, _ = separable_df
    m = parallel_sgd_train(df, 2, 3, epochs=1, n_shards=4)
    scored = logistic_classify(df.limit(50), m.beta).collect()
    for r in scored:
        want = m.classify_full(np.asarray(r["features"]))
        assert np.allclose(np.asarray(r["probs_full"]), want, atol=1e-12)
        assert r["prediction"] == int(np.argmax(want))


def test_classify_sql_twin(spark, tmp_path):
    import duckdb

    from mahout_spark.operators.sgd import (logistic_classify,
                                            logistic_classify_sql)

    rng = np.random.default_rng(5)
    rows = [(i, float(a), float(b))
            for i, (a, b) in enumerate(rng.integers(-3, 4, size=(40, 2)))]
    df = spark.createDataFrame(rows, ["rid", "f0", "f1"])
    beta = np.array([[0.25, -0.5], [0.125, 1.0]])  # 3 categories
    sdf = df.withColumn("features", F.array("f0", "f1"))
    got_rows = (logistic_classify(sdf, beta)
                .select("rid", F.posexplode("probs_full")
                        .alias("category", "prob"))
                .withColumn("prob", F.round("prob", 6)).collect())
    got = {(r["rid"], r["category"]): r["prob"] for r in got_rows}
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * "
                f"FROM read_parquet('{path}/*.parquet')")
    sql = logistic_classify_sql("t", beta, ["f0", "f1"], "rid")
    want = {(int(r[0]), int(r[1])): float(r[2])
            for r in con.execute(sql).fetchall()}
    assert got == want
