"""Random forest: in-core builder goldens, Spark partial trainer,

Catalyst scoring parity, IG split-frame oracle (reference semantics in
operators/randomforest.py docstring)."""

import json
import math

import numpy as np
import pytest

from mahout_spark.operators.randomforest import (
    DecisionForest, best_numeric_split, build_tree, forest_predict_expr,
    ig_numeric_split_frame, rf_train, tree_predict, tree_to_column)


def test_best_numeric_split_golden():
    # perfectly separable: [1,2 | 3,4] -> split 2.5, ig = H(Y) = 1 bit
    ig, sp = best_numeric_split(np.array([1.0, 2, 3, 4]),
                                np.array([0, 0, 1, 1]), 2)
    assert sp == 2.5
    assert abs(ig - 1.0) < 1e-12


def test_best_numeric_split_percentile_branch():
    # > MAX_NUMERIC_SPLITS + 1 values exercises the percentile path
    v = np.arange(100, dtype=float)
    y = (v >= 50).astype(int)
    ig, sp = best_numeric_split(v, y, 2)
    # candidates are 16 percentiles, none exactly at the boundary —
    # the best is the percentile nearest 50 (ig < 1 bit but high)
    assert ig > 0.8
    assert 40 <= sp <= 60


def _planted(n=400, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(n, 4))
    y = ((X[:, 0] > 0.5) ^ (X[:, 2] > 0.3)).astype(int)
    return X, y


def test_build_tree_fits_planted_rule():
    X, y = _planted()
    tree = build_tree(X, y, np.random.default_rng(0), n_labels=2)
    acc = (tree_predict(tree, X) == y).mean()
    assert acc > 0.97


def test_build_tree_deterministic():
    X, y = _planted()
    t1 = build_tree(X, y, np.random.default_rng(7), n_labels=2)
    t2 = build_tree(X, y, np.random.default_rng(7), n_labels=2)
    assert json.dumps(t1) == json.dumps(t2)


def test_build_tree_identical_label_leaf():
    X = np.arange(10, dtype=float).reshape(5, 2)
    t = build_tree(X, np.ones(5, dtype=int), np.random.default_rng(0),
                   n_labels=3)
    assert t == {"leaf": 1.0}


def test_regression_tree_recovers_step():
    rng = np.random.default_rng(1)
    X = rng.uniform(0, 1, size=(300, 2))
    y = np.where(X[:, 0] > 0.5, 10.0, -10.0)
    t = build_tree(X, y, np.random.default_rng(2), n_labels=0)
    pred = tree_predict(t, X)
    assert np.abs(pred - y).mean() < 1.0


def test_categorical_split_once_per_path():
    rng = np.random.default_rng(5)
    cat = rng.integers(0, 3, 200).astype(float)
    X = np.column_stack([cat, rng.uniform(0, 1, 200)])
    y = cat.astype(int)  # label IS the category
    t = build_tree(X, y, np.random.default_rng(6), n_labels=3,
                   categorical={0}, m=2)
    assert (tree_predict(t, X) == y).all()

    def depth_of_attr0(node, seen=0):
        if "leaf" in node:
            return True
        uses = node["attr"] == 0
        if uses and seen:
            return False
        kids = (node["children"].values() if "children" in node
                else [node["lo"], node["hi"]])
        return all(depth_of_attr0(k, seen or uses) for k in kids)

    assert depth_of_attr0(t), "categorical attr reused on a path"


def test_forest_majority_tie_breaks_smallest():
    f = DecisionForest([{"leaf": 2.0}, {"leaf": 0.0}], n_labels=3)
    assert f.predict_incore(np.zeros((1, 1)))[0] == 0.0


def test_forest_regression_ignores_nan():
    f = DecisionForest([{"leaf": 4.0}, {"leaf": math.nan}], n_labels=0)
    assert f.predict_incore(np.zeros((1, 1)))[0] == 4.0


@pytest.fixture(scope="module")
def planted_df(spark):
    # axis-aligned AND rule (exactly a depth-2 tree) — learnable from
    # the small per-shard samples the partial builder sees
    rng = np.random.default_rng(11)
    X = rng.uniform(0, 1, size=(600, 4))
    y = ((X[:, 0] > 0.5) & (X[:, 2] > 0.3)).astype(int)
    rows = [(x.tolist(), int(t)) for x, t in zip(X, y)]
    return (spark.createDataFrame(rows, "features array<double>, label int")
            .repartition(8), X, y)


def test_rf_train_accuracy_and_determinism(planted_df):
    df, X, y = planted_df
    f1 = rf_train(df, num_trees=8, n_labels=2, seed=9)
    f2 = rf_train(df, num_trees=8, n_labels=2, seed=9)
    assert f1.to_json() == f2.to_json()
    assert len(f1.trees) == 8
    acc = (f1.predict_incore(X) == y).mean()
    assert acc > 0.9


def test_catalyst_scoring_matches_incore(planted_df, spark):
    from pyspark.sql import functions as F

    df, X, y = planted_df
    forest = rf_train(df, num_trees=4, n_labels=2, seed=1)
    got = (df.select(forest_predict_expr(forest, F.col("features"))
                     .alias("p"), "features").collect())
    Xb = np.stack([r["features"] for r in got])
    want = forest.predict_incore(Xb)
    assert np.array_equal(np.array([r["p"] for r in got]), want)


def test_classify_pandas_matches_incore(planted_df):
    df, X, y = planted_df
    forest = rf_train(df, num_trees=4, n_labels=2, seed=2)
    got = forest.classify_pandas(df).select("features", "prediction") \
        .collect()
    Xb = np.stack([r["features"] for r in got])
    want = forest.predict_incore(Xb)
    assert np.array_equal(np.array([r["prediction"] for r in got]), want)


def test_forest_json_roundtrip(planted_df):
    df, _, _ = planted_df
    f = rf_train(df, num_trees=3, n_labels=2, seed=5)
    g = DecisionForest.from_json(f.to_json())
    assert g.n_labels == 2 and len(g.trees) == 3
    assert json.dumps(g.trees) == json.dumps(f.trees)


def test_ig_split_frame_matches_numpy_replay(spark):
    rng = np.random.default_rng(13)
    v = rng.integers(1, 20, 500).astype(float)
    y = ((v + rng.integers(0, 6, 500)) > 12).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(v, y)], "v double, y int")
    got = {r["split"]: r["ig"]
           for r in ig_numeric_split_frame(df, "v", "y", 2).collect()}

    def H(c):
        n = c.sum()
        if n == 0:
            return 0.0
        p = c[c > 0] / n
        return float(-(p * np.log(p)).sum() / math.log(2))

    for s in np.unique(v)[1:]:  # every candidate with non-empty left
        lo = np.bincount(y[v < s], minlength=2)
        hi = np.bincount(y[v >= s], minlength=2)
        tot = lo + hi
        n = tot.sum()
        want = H(tot) - lo.sum() / n * H(lo) - hi.sum() / n * H(hi)
        assert abs(got[s] - round(want, 6)) < 2e-6, s


def test_regression_all_nan_matches_incore_sentinel(spark):
    """Every tree NaN (all-unseen categorical path) -> the Catalyst
    expression must yield NaN like predict_incore, not SQL NULL."""
    from pyspark.sql import functions as F

    f = DecisionForest([{"leaf": math.nan}, {"leaf": math.nan}], n_labels=0)
    df = spark.createDataFrame([([0.0],)], "features array<double>")
    got = df.select(forest_predict_expr(f, F.col("features"))
                    .alias("p")).first()["p"]
    assert got is not None and math.isnan(got)
    assert math.isnan(f.predict_incore(np.zeros((1, 1)))[0])
