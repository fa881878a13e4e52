"""Adaptive logistic regression (Mahout's classifier/sgd adaptive family).

Reference anchors (studied, not copied):
- mr/.../classifier/sgd/CrossFoldLearner.java:44-215 (5-fold online
  cross-validation: each record's fold model EVALUATES it — windowed
  logLikelihood / percentCorrect / online AUC — while every OTHER fold
  model trains on it; classify averages the fold models)
- mr/.../classifier/sgd/AdaptiveLogisticRegression.java:70-197,394-445
  (pool of 20 CrossFoldLearner candidates, evolutionary search over
  (lambda, mu) through Mapping.logLimit(1e-8, 0.1) / (1e-8, 1);
  each training interval the pool trains in parallel, candidates are
  ranked by AUC, survivors are mutated)
- mr/.../math/stats/GlobalOnlineAuc.java (sampled online AUC estimator)

Spark-first adaptation, documented differences:
- the reference's EvolutionaryProcess thread pool becomes ONE Spark
  stage per generation — candidates are replicated against a bounded
  deterministic sample (hash-coin, `sample_rows` shape) and each
  (candidate × data) task runs the faithful in-core CrossFoldLearner;
  only (pool_size × hyperparams + fitness) floats return per generation.
- mutation is deterministic: log-space Gaussian steps from a Generator
  seeded (seed, generation, candidate) — reruns pick the same winner.
- AUC is computed EXACTLY (rank statistic over the held-out window)
  instead of the reference's sampled online estimator; same [0, 1]
  scale, no sampling noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark.operators.sgd import OnlineLogisticRegression

__all__ = ["CrossFoldLearner", "adaptive_logistic_train"]

LAMBDA_LIMITS = (1.0e-8, 0.1)   # Wrapper.setMappings logLimit ranges
MU_LIMITS = (1.0e-8, 1.0)


class CrossFoldLearner:
    """k OLR fold models with online cross-validation accounting."""

    def __init__(self, folds: int, num_categories: int,
                 num_features: int, mu0: float = 1.0,
                 lambda_: float = 1.0e-5, prior: str = "L2",
                 window: int = 10_000):
        self.folds = folds
        self.models = [OnlineLogisticRegression(
            num_categories, num_features, mu0=mu0, lambda_=lambda_,
            prior=prior) for _ in range(folds)]
        self.window = window
        self.record = 0
        self.log_likelihood = 0.0
        self.percent_correct = 0.0
        self._heldout: list[tuple[int, float]] = []  # (actual, p1)

    def train(self, tracking_key: int, actual: int,
              x: np.ndarray) -> None:
        """CrossFoldLearner.train: fold = key % folds evaluates, the
        rest train."""
        fold = int(tracking_key) % self.folds
        self.record += 1
        for i, m in enumerate(self.models):
            if i == fold:
                p = m.classify_full(x)
                score = max(p[actual], 1.0e-100)
                w = min(self.record, self.window)
                self.log_likelihood += (np.log(score)
                                        - self.log_likelihood) / w
                correct = float(np.argmax(p) == actual)
                self.percent_correct += (correct
                                         - self.percent_correct) / w
                if len(p) == 2:
                    self._heldout.append((actual, float(p[1])))
                    if len(self._heldout) > self.window:
                        self._heldout.pop(0)
            else:
                m.train(actual, x)

    def auc(self) -> float:
        """Exact Mann-Whitney AUC over the held-out window (the
        reference estimates the same statistic by sampling)."""
        if not self._heldout:
            return 0.5
        y = np.array([a for a, _ in self._heldout])
        s = np.array([v for _, v in self._heldout])
        n1, n0 = int((y == 1).sum()), int((y == 0).sum())
        if n1 == 0 or n0 == 0:
            return 0.5
        order = np.argsort(s, kind="stable")
        ranks = np.empty(len(s))
        ranks[order] = np.arange(1, len(s) + 1)
        # midranks for ties
        ss = s[order]
        i = 0
        while i < len(ss):
            j = i
            while j + 1 < len(ss) and ss[j + 1] == ss[i]:
                j += 1
            if j > i:
                ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        r1 = ranks[y == 1].sum()
        return float((r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0))

    def classify_full(self, x: np.ndarray) -> np.ndarray:
        """Average of the fold models (CrossFoldLearner.classify)."""
        return np.mean([m.classify_full(x) for m in self.models], axis=0)


def _log_mutate(value: float, limits: tuple[float, float],
                rng: np.random.Generator, scale: float = 0.5) -> float:
    lo, hi = np.log(limits[0]), np.log(limits[1])
    v = np.clip(np.log(value) + rng.normal(0.0, scale * (hi - lo) / 10),
                lo, hi)
    return float(np.exp(v))


def adaptive_logistic_train(df: DataFrame, num_categories: int,
                            num_features: int, pool_size: int = 20,
                            survivors: int = 2, generations: int = 3,
                            folds: int = 5, prior: str = "L2",
                            max_incore_rows: int = 20_000,
                            seed: int = 42,
                            label_col: str = "label",
                            features_col: str = "features") -> dict:
    """Distributed hyperparameter evolution; returns
    {'lambda', 'mu0', 'auc', 'log_likelihood', 'percent_correct',
    'learner', 'history'}.

    Input: (label int, features array<double>). Each generation is ONE
    Spark stage: the bounded sample (hash-coin cap at
    ``max_incore_rows`` — the reference trains in-core too) is joined
    to a broadcast candidate table and grouped by candidate id, so all
    pool_size CrossFoldLearners train concurrently across the cluster.
    """
    spark = df.sparkSession
    n = df.count()
    frac = min(1.0, max_incore_rows / max(n, 1))
    # key derives from row CONTENT (as parallel_sgd_train does), not
    # monotonically_increasing_id, so the sample coin and training order
    # are identical under any input partitioning / rerun
    key = F.pmod(F.xxhash64(F.to_json(F.struct(label_col, features_col)),
                            F.lit(seed)), F.lit(1 << 24))
    sample = df.select(F.col(label_col).alias("__y"),
                       F.col(features_col).alias("__x"),
                       key.alias("__key"))
    if frac < 1.0:
        sample = sample.filter(
            F.col("__key") < int(frac * (1 << 24)))
    sample = sample.persist()
    sample.count()

    rng0 = np.random.default_rng([seed, 0])
    llo, lhi = np.log(LAMBDA_LIMITS[0]), np.log(LAMBDA_LIMITS[1])
    mlo, mhi = np.log(MU_LIMITS[0]), np.log(MU_LIMITS[1])
    cands = [(i, float(np.exp(rng0.uniform(llo, lhi))),
              float(np.exp(rng0.uniform(mlo, mhi))))
             for i in range(pool_size)]

    history = []
    out_schema = ("cand int, lambda double, mu0 double, auc double, "
                  "ll double, pc double")

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        cand = int(pdf["cand"].iloc[0])
        lam = float(pdf["lambda"].iloc[0])
        mu = float(pdf["mu0"].iloc[0])
        cf = CrossFoldLearner(folds, num_categories, num_features,
                              mu0=mu, lambda_=lam, prior=prior)
        order = np.argsort(pdf["__key"].to_numpy(), kind="stable")
        ys = pdf["__y"].to_numpy()[order]
        keys = pdf["__key"].to_numpy()[order]
        xs = pdf["__x"].to_numpy()[order]
        for k, y, x in zip(keys, ys, xs):
            cf.train(int(k), int(y), np.asarray(x, dtype=np.float64))
        return pd.DataFrame({"cand": [cand], "lambda": [lam],
                             "mu0": [mu], "auc": [cf.auc()],
                             "ll": [cf.log_likelihood],
                             "pc": [cf.percent_correct]})

    best = None
    for gen in range(generations):
        cand_df = spark.createDataFrame(
            cands, "cand int, lambda double, mu0 double")
        crossed = sample.crossJoin(F.broadcast(cand_df))
        scored = (crossed.groupBy("cand")
                  .applyInPandas(fit_group, schema=out_schema)
                  .collect())
        ranked = sorted(scored, key=lambda r: (-r["auc"], -r["pc"],
                                               r["cand"]))
        history.append([(r["cand"], r["lambda"], r["mu0"],
                         round(r["auc"], 4)) for r in ranked])
        best = ranked[0]
        keep = ranked[:survivors]
        cands = [(r["cand"], r["lambda"], r["mu0"]) for r in keep]
        nxt = len(cands)
        while len(cands) < pool_size:
            parent = keep[len(cands) % survivors]
            g = np.random.default_rng([seed, gen + 1, nxt])
            cands.append((nxt,
                          _log_mutate(parent["lambda"], LAMBDA_LIMITS, g),
                          _log_mutate(parent["mu0"], MU_LIMITS, g)))
            nxt += 1
    # refit the winner in-core on the sample for the returned learner
    final = CrossFoldLearner(folds, num_categories, num_features,
                             mu0=best["mu0"], lambda_=best["lambda"],
                             prior=prior)
    rows = sample.orderBy("__key").collect()
    sample.unpersist()
    for r in rows:
        final.train(int(r["__key"]), int(r["__y"]),
                    np.asarray(r["__x"], dtype=np.float64))
    return {"lambda": best["lambda"], "mu0": best["mu0"],
            "auc": best["auc"], "log_likelihood": best["ll"],
            "percent_correct": best["pc"], "learner": final,
            "history": history}
