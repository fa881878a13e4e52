"""Remaining Taste/classifier online learners: PassiveAggressive,

GradientMachine, ModelDissector.

Reference anchors (studied, not copied):
- mr/.../classifier/sgd/PassiveAggressive.java:95-192 — multi-class PA
  (Crammer et al. 2006): rank hinge loss = 1 − score(actual) +
  score(best other); update tau = loss / (x·x + 0.5/learningRate);
  w[actual] += tau·x, w[worst_other] −= tau·x. classify() exponentiates
  scores into empirical probabilities (:96-104).
- mr/.../classifier/sgd/GradientMachine.java:108-127 (fan-in uniform
  init), :203-219 (inputToHidden: sigmoid of clipped ±40 activations),
  :246-301 (updateRanking: sampled negative labels, ranking hinge,
  sigmoid-gradient backprop), :387-393 (train: 2 sampling trials).
  Two reference quirks replicated faithfully: the hidden-weight
  gradient OMITS the input x (the :294-299 loop updates every column j
  by the same gradSig_i term), and only sampled negatives compete.
  The reference's java Random (init + negative sampling) becomes a
  seeded NumPy Generator — deterministic, partition-layout-free.
- mr/.../classifier/sgd/ModelDissector.java:40-120 — map learned
  weights back to feature names, largest |weight| first.

Spark posture: training is inherently sequential per model (the
reference trains single-JVM); the distributed path for these learners
is the same shard-train + example-weighted averaging used by
parallel_sgd_train, which they plug into via ``train_many`` +
``weights`` ndarray. Scoring is pure column math (see ``pa_classify``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PassiveAggressive", "GradientMachine", "model_dissector",
           "pa_classify"]


class PassiveAggressive:
    """Multi-class passive-aggressive rank-loss learner (in-core)."""

    def __init__(self, num_categories: int, num_features: int,
                 learning_rate: float = 0.1):
        if num_categories < 2:
            raise ValueError("need >= 2 categories")
        self.n_cat = num_categories
        self.n_feat = num_features
        self.lr = learning_rate
        self.weights = np.zeros((num_categories, num_features))

    def classify_no_link(self, x: np.ndarray) -> np.ndarray:
        return self.weights @ x

    def classify(self, x: np.ndarray) -> np.ndarray:
        """Empirical probabilities for categories 1..n-1 (:96-104)."""
        r = self.classify_no_link(x)
        e = np.exp(r - r.max())
        return (e / e.sum())[1:]

    def train(self, actual: int, x: np.ndarray) -> None:
        r = self.classify_no_link(x)
        my_score = r[actual]
        other = int(np.argmax(r))
        if other == actual:
            r2 = r.copy()
            r2[other] = -np.inf
            other = int(np.argmax(r2))
        loss = 1.0 - my_score + r[other]
        if loss >= 0:
            tau = loss / (float(x @ x) + 0.5 / self.lr)
            self.weights[actual] += tau * x
            self.weights[other] -= tau * x

    def train_many(self, labels, rows) -> "PassiveAggressive":
        for y, x in zip(labels, rows):
            self.train(int(y), np.asarray(x, dtype=np.float64))
        return self


class GradientMachine:
    """One-sigmoid-hidden-layer ranking machine (in-core)."""

    def __init__(self, num_features: int, num_hidden: int,
                 num_output: int, learning_rate: float = 0.1,
                 regularization: float = 0.1, seed: int = 31):
        self.n_feat = num_features
        self.n_hidden = num_hidden
        self.n_out = num_output
        self.lr = learning_rate
        self.reg = regularization
        self.rng = np.random.default_rng(seed)
        # initWeights (:108-127): uniform(-fanIn, fanIn)
        hf = 1.0 / np.sqrt(num_features)
        self.w_hidden = (2.0 * self.rng.random(
            (num_hidden, num_features)) - 1.0) * hf
        of = 1.0 / np.sqrt(num_hidden)
        self.w_out = (2.0 * self.rng.random(
            (num_output, num_hidden)) - 1.0) * of
        # biases start at 0 (initWeights touches only the weight
        # matrices; updateRanking trains outputBias)
        self.b_hidden = np.zeros(num_hidden)
        self.b_out = np.zeros(num_output)

    def input_to_hidden(self, x: np.ndarray) -> np.ndarray:
        a = np.clip(self.w_hidden @ x + self.b_hidden, -40.0, 40.0)
        return 1.0 / (1.0 + np.exp(-a))

    def hidden_to_output(self, h: np.ndarray) -> np.ndarray:
        return self.w_out @ h + self.b_out

    def classify_no_link(self, x: np.ndarray) -> np.ndarray:
        return self.hidden_to_output(self.input_to_hidden(x))

    def train(self, actual: int, x: np.ndarray, num_trials: int = 2
              ) -> None:
        h = self.input_to_hidden(np.asarray(x, dtype=np.float64))
        good = int(actual)
        if self.n_out <= 1:
            return
        good_score = float(self.w_out[good] @ h)
        # sampled negatives (:252-263), deterministic generator
        best_bad, best_bad_score = -1, -np.inf
        for _ in range(num_trials):
            bad = int(self.rng.integers(self.n_out))
            while bad == good:
                bad = int(self.rng.integers(self.n_out))
            s = float(self.w_out[bad] @ h)
            if s > best_bad_score:
                best_bad, best_bad_score = bad, s
        loss = 1.0 - good_score + best_bad_score
        if loss < 0.0:
            return
        # (:275-299) — note the reference's hidden update omits x
        prop_hidden = -self.w_out[good] + self.w_out[best_bad]
        self.w_out[good] += (-self.w_out[good]) * (
            -self.lr * (1.0 - self.reg))
        self.w_out[best_bad] += self.w_out[best_bad] * (
            -self.lr * (1.0 + self.reg))
        self.b_out[good] += self.lr
        self.b_out[best_bad] -= self.lr
        grad_sig = h * (1.0 - h) * prop_hidden
        self.w_hidden -= self.lr * (grad_sig[:, None]
                                    + self.reg * self.w_hidden)

    def train_many(self, labels, rows) -> "GradientMachine":
        for y, x in zip(labels, rows):
            self.train(int(y), np.asarray(x, dtype=np.float64))
        return self


def model_dissector(beta: np.ndarray, feature_names: list[str],
                    n: int = 10) -> list[dict]:
    """ModelDissector.summary(:40-120): the n most influential features

    by max |weight| across categories, with per-category weights."""
    beta = np.atleast_2d(np.asarray(beta, dtype=np.float64))
    mags = np.abs(beta).max(axis=0)
    order = np.argsort(-mags, kind="stable")[:n]
    return [{"feature": feature_names[j], "weight": float(mags[j]),
             "category": int(np.abs(beta[:, j]).argmax()),
             "weights": beta[:, j].tolist()} for j in order]


def pa_classify(df: DataFrame, weights: np.ndarray,
                features_col: str = "features") -> DataFrame:
    """Append per-category scores + predicted category for a trained

    PA model — pure column math (the 100-TB scoring path; one
    expression per category, argmax via greatest-chain)."""
    n_cat, n_feat = weights.shape
    x = F.col(features_col).cast("array<double>")
    scores = []
    for i in range(n_cat):
        s = F.lit(0.0)
        for j in range(n_feat):
            w = float(weights[i, j])
            if w != 0.0:
                s = s + F.lit(w) * F.element_at(x, j + 1)
        scores.append(s.alias(f"score_{i}"))
    out = df.select("*", *scores)
    best = F.lit(0)
    best_s: Column = F.col("score_0")
    for i in range(1, n_cat):
        cond = F.col(f"score_{i}") > best_s
        best = F.when(cond, F.lit(i)).otherwise(best)
        best_s = F.when(cond, F.col(f"score_{i}")).otherwise(best_s)
    return out.withColumn("prediction", best.cast("int"))
