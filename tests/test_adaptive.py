"""AdaptiveLogisticRegression / CrossFoldLearner tests (reference
semantics in operators/adaptive.py docstring)."""

import numpy as np
import pytest

from mahout_spark.operators.adaptive import (CrossFoldLearner,
                                             adaptive_logistic_train)


def _separable(n=400, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, 4))
    y = (X[:, 0] + 2 * X[:, 1] - X[:, 2] > 0).astype(int)
    return X, y


def test_crossfold_routing_and_auc():
    X, y = _separable()
    cf = CrossFoldLearner(5, 2, 4, mu0=0.5, lambda_=1e-6)
    for k, (x, t) in enumerate(zip(X, y)):
        cf.train(k, int(t), x)
    # each fold model saw exactly the records outside its fold
    assert all(m.step == len(X) - sum(1 for k in range(len(X))
                                      if k % 5 == i)
               for i, m in enumerate(cf.models))
    assert 0.9 < cf.auc() <= 1.0        # separable -> near-perfect AUC
    assert cf.percent_correct > 0.85
    p = cf.classify_full(X[0])
    assert p.shape == (2,) and abs(p.sum() - 1.0) < 1e-9


def test_crossfold_auc_handles_ties_and_one_class():
    cf = CrossFoldLearner(2, 2, 2)
    assert cf.auc() == 0.5              # empty window
    cf._heldout = [(1, 0.7), (1, 0.7)]  # one class only
    assert cf.auc() == 0.5
    cf._heldout = [(0, 0.5), (1, 0.5)]  # full tie -> 0.5 by midranks
    assert cf.auc() == pytest.approx(0.5)
    cf._heldout = [(0, 0.1), (1, 0.9), (0, 0.2), (1, 0.8)]
    assert cf.auc() == 1.0


def test_adaptive_train_picks_good_candidate(spark):
    X, y = _separable(600)
    df = spark.createDataFrame(
        [(int(t), [float(v) for v in x]) for x, t in zip(X, y)],
        "label int, features array<double>")
    res = adaptive_logistic_train(df, 2, 4, pool_size=6, survivors=2,
                                  generations=2, seed=11)
    assert res["auc"] > 0.9
    assert 1e-8 <= res["lambda"] <= 0.1 and 1e-8 <= res["mu0"] <= 1.0
    # deterministic: same seed, same winner
    res2 = adaptive_logistic_train(df, 2, 4, pool_size=6, survivors=2,
                                   generations=2, seed=11)
    assert res2["lambda"] == res["lambda"] and res2["mu0"] == res["mu0"]
    assert res2["auc"] == res["auc"]
    # the returned learner actually classifies
    acc = np.mean([np.argmax(res["learner"].classify_full(x)) == t
                   for x, t in zip(X, y)])
    assert acc > 0.9
