"""PassiveAggressive / GradientMachine / ModelDissector / priors."""

import numpy as np
import pytest

from mahout_spark.operators.online import (GradientMachine,
                                           PassiveAggressive,
                                           model_dissector, pa_classify)
from mahout_spark.operators.sgd import OnlineLogisticRegression


def _blobs(n=120, seed=3):
    rng = np.random.default_rng(seed)
    half = n // 2
    x0 = rng.normal((-2, -2), 0.6, size=(half, 2))
    x1 = rng.normal((2, 2), 0.6, size=(half, 2))
    X = np.vstack([x0, x1])
    y = np.array([0] * half + [1] * half)
    order = rng.permutation(n)
    return X[order], y[order]


def test_pa_learns_separable_blobs():
    X, y = _blobs()
    m = PassiveAggressive(2, 2).train_many(y, X)
    preds = [int(np.argmax(m.classify_no_link(x))) for x in X]
    acc = np.mean(np.array(preds) == y)
    assert acc > 0.97


def test_pa_update_rule_hand_traced():
    # zero weights: scores all 0, actual=0 -> other=1, loss=1,
    # tau = 1/(x.x + 0.5/lr)
    m = PassiveAggressive(2, 2, learning_rate=0.1)
    x = np.array([1.0, 2.0])
    m.train(0, x)
    tau = 1.0 / (5.0 + 5.0)
    assert np.allclose(m.weights[0], tau * x)
    assert np.allclose(m.weights[1], -tau * x)


def test_pa_classify_spark_matches_incore(spark):
    X, y = _blobs(40)
    m = PassiveAggressive(2, 2).train_many(y, X)
    df = spark.createDataFrame(
        [(int(i), x.tolist()) for i, x in enumerate(X)],
        "row_id int, features array<double>")
    got = {r["row_id"]: r["prediction"]
           for r in pa_classify(df, m.weights).collect()}
    for i, x in enumerate(X):
        r = m.classify_no_link(x)
        # greatest-chain picks the LOWEST index on exact ties, same as
        # first-argmax
        assert got[i] == int(np.argmax(r))


def test_gradient_machine_update_rule_hand_traced():
    """One training step replayed by hand. Note the replicated
    reference quirks: the output update only RESCALES the weight rows
    (its gradient derivation drops the activation term,
    GradientMachine.java:272-283), and the hidden gradient omits the
    input x (:294-299) — the learner is mostly bias-driven; we keep it
    for parity, it is an experimental learner in the reference."""
    m = GradientMachine(2, 3, 2, learning_rate=0.1, regularization=0.1,
                        seed=31)
    w_h, w_o = m.w_hidden.copy(), m.w_out.copy()
    x = np.array([1.0, -1.0])
    h = 1.0 / (1.0 + np.exp(-np.clip(w_h @ x + 0.0, -40, 40)))
    # n_out=2, good=0 -> the only possible sampled bad label is 1
    m.train(0, x)
    exp_good = w_o[0] * (1.0 + 0.1 * 0.9)
    exp_bad = w_o[1] * (1.0 - 0.1 * 1.1)
    assert np.allclose(m.w_out[0], exp_good)
    assert np.allclose(m.w_out[1], exp_bad)
    assert m.b_out[0] == pytest.approx(0.1)
    assert m.b_out[1] == pytest.approx(-0.1)
    grad_sig = h * (1.0 - h) * (-w_o[0] + w_o[1])
    exp_hidden = w_h - 0.1 * (grad_sig[:, None] + 0.1 * w_h)
    assert np.allclose(m.w_hidden, exp_hidden)


def test_gradient_machine_deterministic():
    X, y = _blobs(60, seed=7)
    m1 = GradientMachine(2, 8, 2, seed=31).train_many(y, X)
    m2 = GradientMachine(2, 8, 2, seed=31).train_many(y, X)
    assert np.array_equal(m1.w_hidden, m2.w_hidden)
    assert np.array_equal(m1.w_out, m2.w_out)
    assert np.array_equal(m1.b_out, m2.b_out)
    m3 = GradientMachine(2, 8, 2, seed=32).train_many(y, X)
    assert not np.array_equal(m1.w_out, m3.w_out)  # seed matters


def test_model_dissector_orders_by_magnitude():
    beta = np.array([[0.1, -3.0, 0.5], [2.0, 0.2, -0.4]])
    out = model_dissector(beta, ["a", "b", "c"], n=2)
    assert [o["feature"] for o in out] == ["b", "a"]
    assert out[0]["weight"] == 3.0 and out[0]["category"] == 0
    assert out[0]["weights"] == [-3.0, 0.2]


@pytest.mark.parametrize("prior", ["uniform", "t", "elastic"])
def test_new_priors_age_semantics(prior):
    m = OnlineLogisticRegression(2, 3, prior=prior, lambda_=0.1)
    b = np.array([[0.5, -0.4, 0.0]])
    missing = np.array([2.0, 2.0, 2.0])
    rate = np.array([0.1, 0.1, 0.1])
    aged = m._prior_age(b, missing, rate)
    if prior == "uniform":
        assert np.array_equal(aged, b)  # UniformPrior: untouched
    elif prior == "elastic":
        # L2 shrink then L1 step, no sign crossing
        old = b * (1.0 - 0.1) ** 2
        new = old - np.sign(old) * 0.1 * 2
        exp = np.where(new * old < 0.0, 0.0, new)
        assert np.allclose(aged, exp)
    else:
        # TPrior: two sequential gradient steps (df=1)
        v = b.copy()
        for _ in range(2):
            v = v - 0.1 * v * 2.0 / (1.0 + v * v)
        assert np.allclose(aged, v)


def test_priors_still_learn():
    X, y = _blobs(100, seed=11)
    Xb = np.hstack([X, np.ones((len(X), 1))])
    for prior in ["uniform", "t", "elastic"]:
        m = OnlineLogisticRegression(2, 3, prior=prior, lambda_=1e-6)
        m.train_many(y, Xb)
        m.close()
        preds = [int(m.classify_full(x).argmax()) for x in Xb]
        assert np.mean(np.array(preds) == y) > 0.9, prior


def test_bad_prior_rejected():
    with pytest.raises(ValueError):
        OnlineLogisticRegression(2, 3, prior="L3")
