"""Generic evaluation operators: AUC, confusion, exponential average.

In-core oracles: pairwise win counting for AUC (the definition), the
sequential OnlineExponentialAverage recurrence for the closed-form
distributed EWA.
"""

import math

import numpy as np
import pytest

from mahout_spark.core.stats import OnlineExponentialAverage
from mahout_spark.operators.evaluation import (accuracy, auc, auc_sampled,
                                               confusion_binary,
                                               confusion_matrix,
                                               exponential_average)


def _pairwise_auc(ys, ss):
    pos = [s for y, s in zip(ys, ss) if y == 1]
    neg = [s for y, s in zip(ys, ss) if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


@pytest.fixture(scope="module")
def scored(spark):
    rng = np.random.default_rng(5)
    ys = rng.integers(0, 2, 200).tolist()
    # integer-ish scores force plenty of ties (midrank path)
    ss = (rng.integers(0, 25, 200) / 4.0).tolist()
    df = spark.createDataFrame(list(zip(ys, ss)), "label int, score double")
    return df, ys, ss


def test_auc_exact_matches_pairwise(scored):
    df, ys, ss = scored
    row = auc(df).first()
    assert row["n_pos"] == sum(ys)
    assert row["n_neg"] == len(ys) - sum(ys)
    assert row["auc"] == pytest.approx(_pairwise_auc(ys, ss), abs=1e-12)


def test_auc_sampled_exact_below_buffer(scored):
    df, ys, ss = scored
    assert auc_sampled(df) == pytest.approx(_pairwise_auc(ys, ss),
                                            abs=1e-12)


def test_auc_sampled_estimates_above_buffer(scored):
    df, ys, ss = scored
    est = auc_sampled(df, max_buffer=60)
    assert abs(est - _pairwise_auc(ys, ss)) < 0.15


def test_auc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (0, 0.5), (0, 1.0)], "label int, score double")
    assert auc(perfect).first()["auc"] == 1.0
    flipped = spark.createDataFrame(
        [(0, 2.0), (0, 3.0), (1, 0.5), (1, 1.0)], "label int, score double")
    assert auc(flipped).first()["auc"] == 0.0


def test_confusion_binary_strict_threshold(spark):
    # score == threshold predicts 0 (Auc.java:75 uses strict >)
    df = spark.createDataFrame(
        [(1, 0.5), (1, 0.8), (0, 0.5), (0, 0.2)], "label int, score double")
    cells = {(r["actual"], r["predicted"]): r["n"]
             for r in confusion_binary(df, 0.5).collect()}
    assert cells == {(1, 0): 1, (1, 1): 1, (0, 0): 2}


def test_confusion_matrix_and_accuracy(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")],
        "actual string, predicted string")
    cells = {(r["actual"], r["predicted"]): r["n"]
             for r in confusion_matrix(df).collect()}
    assert cells == {("a", "a"): 1, ("a", "b"): 1, ("b", "b"): 2}
    acc = accuracy(df).first()
    assert acc["accuracy"] == pytest.approx(0.75)
    assert acc["n_total"] == 4


def test_online_exponential_average_recurrence():
    o = OnlineExponentialAverage(5.0)
    pts = [(1.0, 2.0), (2.5, 4.0), (4.0, 9.0), (7.0, 1.0)]
    for t, x in pts:
        o.add(t, x)
    T = pts[-1][0]
    s = sum(x * math.exp(-(T - t) / 5.0) for t, x in pts)
    w = sum(math.exp(-(T - t) / 5.0) for t, x in pts)
    assert o.mean() == pytest.approx(s / w, rel=1e-12)


def test_exponential_average_distributed_matches_sequential(spark):
    rng = np.random.default_rng(11)
    rows = []
    expected = {}
    for g in ["a", "b"]:
        ts = np.sort(rng.uniform(0, 100, 50))
        xs = rng.normal(5, 2, 50)
        o = OnlineExponentialAverage(12.0)
        for t, x in zip(ts, xs):
            o.add(float(t), float(x))
        expected[g] = o.mean()
        rows += [(g, float(t), float(x)) for t, x in zip(ts, xs)]
    df = spark.createDataFrame(rows, "g string, t double, x double")
    out = {r["g"]: r["ewa_mean"]
           for r in exponential_average(df, "t", "x", 12.0,
                                        group_cols=["g"]).collect()}
    for g in expected:
        assert out[g] == pytest.approx(expected[g], rel=1e-9)


def test_exponential_average_ungrouped(spark):
    df = spark.createDataFrame([(1.0, 2.0), (2.0, 4.0), (3.0, 9.0)],
                               "t double, x double")
    o = OnlineExponentialAverage(5.0)
    for t, x in [(1.0, 2.0), (2.0, 4.0), (3.0, 9.0)]:
        o.add(t, x)
    row = exponential_average(df, "t", "x", 5.0).first()
    assert row["ewa_mean"] == pytest.approx(o.mean(), rel=1e-12)
    assert row["n"] == 3
