"""SGD logistic regression (Mahout's OnlineLogisticRegression family).

Reference anchors (studied, not copied):
- mr/.../classifier/sgd/AbstractOnlineLogisticRegression.java:86-121
  (link: softmax over n-1 categories with the 0-th implicit; max>=40
  overflow guard), 157-188 (train: lazy regularize, gradient =
  onehot - link(beta x), beta[i][j] += g_i * lr * perTermRate(j) * x_j),
  200-221 (regularize: lazily age coefficients by missed steps)
- mr/.../classifier/sgd/OnlineLogisticRegression.java:37-48,107-114
  (annealing: lr = mu0 * decay^step * (step+stepOffset)^forgetting,
  defaults mu0=1, decay=1-1e-3, stepOffset=10, forgetting=-0.5;
  perTermRate(j) = sqrt(20 / updateCounts[j]), counts init 20)
- mr/.../classifier/sgd/DefaultGradient.java:38-48
- mr/.../classifier/sgd/L1.java / L2.java (prior.age)
- mr/.../classifier/sgd/AdaptiveLogisticRegression.java (the reference's
  own answer to parallelism: many online learners trained concurrently,
  results pooled — the shape parallel_sgd_train scales out)

Spark-first shape: online SGD is sequential by definition, so the
distributed trainer runs the FAITHFUL sequential learner per partition
over deterministically hash-ordered shards and pools the shard models by
example-weighted parameter averaging (one tiny all-to-driver reduce of
(n-1) x F doubles per epoch — no per-example driver traffic, no shuffle
of the training data beyond the initial hash repartition). Scoring is
pure Catalyst column math (JVM, codegen) — no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["OnlineLogisticRegression", "parallel_sgd_train",
           "logistic_classify", "logistic_classify_sql"]


class OnlineLogisticRegression:
    """In-core 1-of-n SGD logistic regression — the reference update

    rule exactly (beta is (n_categories-1) x n_features; category 0 is
    implicit). Deterministic: no RNG anywhere."""

    def __init__(self, num_categories: int, num_features: int,
                 mu0: float = 1.0, decay_factor: float = 1 - 1.0e-3,
                 step_offset: int = 10, forgetting_exponent: float = -0.5,
                 per_term_offset: int = 20, lambda_: float = 1.0e-5,
                 prior: str = "L2", prior_df: float = 1.0,
                 prior_alpha: float = 1.0):
        if num_categories < 2:
            raise ValueError("need >= 2 categories")
        self.n_cat = num_categories
        self.n_feat = num_features
        self.beta = np.zeros((num_categories - 1, num_features))
        self.mu0 = mu0
        self.decay = decay_factor
        self.step_offset = step_offset
        self.forget = forgetting_exponent
        self.per_term_offset = per_term_offset
        self.lambda_ = lambda_
        if prior not in ("L1", "L2", "uniform", "t", "elastic"):
            raise ValueError("prior must be one of L1, L2, uniform, t, "
                             f"elastic — got {prior}")
        self.prior = prior
        self.prior_df = prior_df  # TPrior degrees of freedom
        self.prior_alpha = prior_alpha  # ElasticBandPrior alphaByLambda
        self.step = 0
        self.update_steps = np.zeros(num_features)
        self.update_counts = np.full(num_features, float(per_term_offset))

    # --- annealing (OnlineLogisticRegression.java:107-114) ---
    def current_learning_rate(self) -> float:
        return (self.mu0 * self.decay ** self.step
                * (self.step + self.step_offset) ** self.forget)

    def per_term_rate(self, nz: np.ndarray) -> np.ndarray:
        return np.sqrt(self.per_term_offset / self.update_counts[nz])

    # --- link (AbstractOnlineLogisticRegression.java:86-99) ---
    @staticmethod
    def _link(v: np.ndarray) -> np.ndarray:
        m = v.max()
        if m >= 40:
            e = np.exp(v - m)
            return e / e.sum()
        e = np.exp(v)
        return e / (1.0 + e.sum())

    def classify(self, x: np.ndarray) -> np.ndarray:
        """n-1 probabilities (category 0 = 1 - sum)."""
        return self._link(self.beta @ x)

    def classify_full(self, x: np.ndarray) -> np.ndarray:
        p = self.classify(x)
        return np.concatenate([[1.0 - p.sum()], p])

    def _prior_age(self, b: np.ndarray, missing: np.ndarray,
                   rate: np.ndarray) -> np.ndarray:
        if self.prior == "L2":
            # L2.age: value * (1 - lambda*rate)^missing
            return b * (1.0 - rate) ** missing
        if self.prior == "L1":
            # L1.age: soft-threshold toward 0 by missing*rate
            return np.sign(b) * np.maximum(0.0, np.abs(b) - rate * missing)
        if self.prior == "uniform":
            # UniformPrior.age: no regularization (logP = 0)
            return b
        if self.prior == "elastic":
            # ElasticBandPrior.age:30-39 — L2 shrink by alphaByLambda,
            # then an L1 step that may not cross zero
            old = b * (1.0 - self.prior_alpha * rate) ** missing
            new = old - np.sign(old) * rate * missing
            return np.where(new * old < 0.0, 0.0, new)
        # TPrior.age:33-38 — one gradient-of-log-t step per missed
        # generation (the reference loops; vectorized with a mask)
        v = np.array(b, dtype=np.float64, copy=True)
        gens = np.broadcast_to(np.asarray(missing), v.shape)
        r = np.broadcast_to(np.asarray(rate), v.shape)
        df = self.prior_df
        for i in range(int(gens.max()) if gens.size else 0):
            m = gens > i
            v[m] -= r[m] * v[m] * (df + 1.0) / (df + v[m] * v[m])
        return v

    def regularize(self, nz: np.ndarray) -> None:
        """Lazy prior application on the touched features

        (AbstractOnlineLogisticRegression.regularize)."""
        missing = self.step - self.update_steps[nz]
        hit = missing > 0
        if not hit.any():
            return
        idx = nz[hit]
        lr = self.current_learning_rate()
        rate = self.lambda_ * lr * np.sqrt(
            self.per_term_offset / self.update_counts[idx])
        self.beta[:, idx] = self._prior_age(
            self.beta[:, idx], self.step - self.update_steps[idx], rate)
        self.update_steps[idx] = self.step

    def train(self, actual: int, x: np.ndarray) -> None:
        """One reference SGD step (train(long, String, int, Vector))."""
        nz = np.nonzero(x)[0]
        lr = self.current_learning_rate()
        self.regularize(nz)
        p = self.classify(x)
        target = np.zeros(self.n_cat - 1)
        if actual != 0:
            target[actual - 1] = 1.0
        g = target - p
        ptr = self.per_term_rate(nz)
        self.beta[:, nz] += np.outer(g, lr * ptr * x[nz])
        self.update_steps[nz] = self.step
        self.update_counts[nz] += 1
        self.step += 1

    def close(self) -> None:
        """Apply any pending regularization to ALL features (sealing)."""
        self.regularize(np.arange(self.n_feat))

    def train_many(self, labels, rows) -> "OnlineLogisticRegression":
        for y, x in zip(labels, rows):
            self.train(int(y), np.asarray(x, dtype=np.float64))
        return self


def parallel_sgd_train(df: DataFrame, num_categories: int,
                       num_features: int,
                       label_col: str = "label",
                       features_col: str = "features",
                       epochs: int = 1, n_shards: int | None = None,
                       seed: int = 42,
                       **olr_kwargs) -> OnlineLogisticRegression:
    """Distributed SGD: hash-sharded parallel online learners + weighted

    parameter averaging per epoch (the AdaptiveLogisticRegression
    pool-of-learners shape, scaled out). Deterministic: shard assignment
    and within-shard order are xxhash64-derived, so reruns and different
    cluster sizes produce the identical model. Each epoch is ONE
    applyInPandas pass (shard-local sequential learning in NumPy) and an
    (n_cat-1) x F averaged-beta collect — at 1000 executors that is a
    few MB to the driver per epoch, independent of corpus size."""
    spark = df.sparkSession
    if n_shards is None:
        n_shards = spark.sparkContext.defaultParallelism
    base = (df.select(
        F.col(label_col).cast("int").alias("__y"),
        F.col(features_col).cast("array<double>").alias("__x"),
        F.xxhash64(F.to_json(F.struct(label_col, features_col)),
                   F.lit(seed)).alias("__h"))
        .withColumn("__shard", F.pmod(F.col("__h"), F.lit(n_shards))))

    beta = np.zeros((num_categories - 1, num_features))
    schema = "shard long, n long, beta array<double>"

    for _ in range(epochs):
        init = beta.copy()

        def make_fit(init):
            # single-parameter closure: a 2-arg function would be called
            # by applyInPandas as (key, pdf)
            def fit(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("__h", kind="mergesort")
                m = OnlineLogisticRegression(num_categories, num_features,
                                             **olr_kwargs)
                m.beta = init.copy()
                m.train_many(pdf["__y"].to_numpy(),
                             pdf["__x"].to_numpy())
                m.close()
                return pd.DataFrame({"shard": [pdf["__shard"].iloc[0]],
                                     "n": [len(pdf)],
                                     "beta": [m.beta.ravel()]})
            return fit

        rows = (base.groupBy("__shard")
                .applyInPandas(make_fit(init), schema=schema)
                .collect())
        tot = sum(r["n"] for r in rows)
        beta = sum(
            np.asarray(r["beta"]).reshape(num_categories - 1, num_features)
            * (r["n"] / tot) for r in rows)

    out = OnlineLogisticRegression(num_categories, num_features,
                                   **olr_kwargs)
    out.beta = beta
    return out


def logistic_classify(df: DataFrame, beta: np.ndarray,
                      features_col: str = "features",
                      full: bool = True) -> DataFrame:
    """Append probabilities + predicted category as pure column math

    (classifyFull): scores_i = dot(beta_i, x), p = link(scores) with the
    same max>=40 guard, prediction = argmax over all n categories
    (category 0 prob = 1 - sum). All-JVM, codegen-friendly — the 100 TB
    scoring path."""
    n1, nf = beta.shape
    x = F.col(features_col).cast("array<double>")
    scores = []
    for i in range(n1):
        s = F.lit(0.0)
        for j in range(nf):
            b = float(beta[i, j])
            if b != 0.0:
                s = s + F.lit(b) * x[j]
        scores.append(s)
    out = df.withColumn("__s", F.array(*scores))
    m = F.array_max("__s")
    guard = m >= 40
    e_hi = F.transform("__s", lambda v: F.exp(v - m))
    e_lo = F.transform("__s", lambda v: F.exp(v))
    def _sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, v: a + v)
    p = F.when(guard, F.transform(e_hi, lambda v: v / _sum(e_hi))) \
         .otherwise(F.transform(e_lo, lambda v: v / (F.lit(1.0)
                                                     + _sum(e_lo))))
    out = out.withColumn("probs", p)
    if full:
        p0 = F.lit(1.0) - _sum(F.col("probs"))
        out = out.withColumn("probs_full",
                             F.concat(F.array(p0), F.col("probs")))
        idx = F.array_position(
            F.col("probs_full"), F.array_max("probs_full")) - 1
        out = out.withColumn("prediction", idx.cast("int"))
    return out.drop("__s")


def logistic_classify_sql(table: str, beta: np.ndarray,
                          feature_cols: list[str],
                          id_col: str, round_dp: int = 6) -> str:
    """DuckDB twin of logistic_classify over EXPLICIT feature columns

    (gate oracle; no-guard branch — keep |scores| < 40 in gate inputs).
    Emits (id, category, prob rounded) with prob_0 = 1 - sum."""
    n1 = beta.shape[0]
    svals = []
    for i in range(n1):
        terms = [f"({float(beta[i, j])!r} * {c})"
                 for j, c in enumerate(feature_cols)
                 if float(beta[i, j]) != 0.0]
        svals.append(" + ".join(terms) if terms else "0.0")
    es = [f"exp(s{i})" for i in range(n1)]
    tot = " + ".join(f"e{i}" for i in range(n1))
    probs = [f"1.0 - ({' + '.join(f'p{i}' for i in range(n1))})"] + \
            [f"p{i}" for i in range(n1)]
    sel = ", ".join(f"round({p}, {round_dp})" for p in probs)
    return f"""
WITH s AS (SELECT {id_col},
                  {', '.join(f'{v} AS s{i}' for i, v in enumerate(svals))}
           FROM {table}),
e AS (SELECT {id_col}, {', '.join(f'{v} AS e{i}'
                                  for i, v in enumerate(es))} FROM s),
p AS (SELECT {id_col},
             {', '.join(f'e{i} / (1.0 + ({tot})) AS p{i}'
                        for i in range(n1))} FROM e),
u AS (SELECT {id_col}, unnest([{sel}]) AS prob,
             unnest(range({n1 + 1})) AS category FROM p)
SELECT {id_col}, category::INT AS category, prob FROM u
"""
