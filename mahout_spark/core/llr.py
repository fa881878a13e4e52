"""Log-likelihood ratio (entropy form) — NumPy + golden-value parity.

Reference: math/.../stats/LogLikelihood.java:51-100 — the entropy
formulation ``2 * (H(matrix) - H(rowSums) - H(colSums))`` over the 2x2
contingency table (k11, k12, k21, k22). Golden:
``logLikelihoodRatio(1, 2, 1, 6) == 2.6341457841558764``
(spark test SimilarityAnalysisSuite.scala:380-420, "calculated by hadoop
itemsimilarity").

These NumPy forms mirror the Spark SQL column expressions in
mahout_spark.functions.measures so kernels and plans share goldens.
"""

from __future__ import annotations

import numpy as np


def xlogx(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = x[pos] * np.log(x[pos])
    return out


def _entropy(*counts) -> np.ndarray:
    """sum(x) * log(sum(x)) - sum(x log x) — Shannon-entropy-scaled form

    used by the reference (LogLikelihood.java:60-74).
    """
    arr = [np.asarray(c, dtype=np.float64) for c in counts]
    total = np.sum(arr, axis=0)
    sum_xlogx = np.sum([xlogx(a) for a in arr], axis=0)
    return xlogx(total) - sum_xlogx


def log_likelihood_ratio(k11, k12, k21, k22) -> np.ndarray:
    """2 * (H(matrix) - H(rows) - H(cols)), clamped at 0 for rounding."""
    row_entropy = _entropy(np.add(k11, k12), np.add(k21, k22))
    col_entropy = _entropy(np.add(k11, k21), np.add(k12, k22))
    mat_entropy = _entropy(k11, k12, k21, k22)
    llr = 2.0 * (row_entropy + col_entropy - mat_entropy)
    return np.maximum(0.0, llr) if np.ndim(llr) else max(0.0, float(llr))


def llr_from_cooccurrence(n_a, n_b, n_ab, n_total) -> np.ndarray:
    """LLR from cooccurrence counts (interactions with A, with B, with both,

    total) — the contingency construction of
    math-scala/.../cf/SimilarityAnalysis.scala:300-309. Golden:
    llr_from_cooccurrence(1, 2, 1, 6) == 2.6341457841558764.
    """
    k11 = np.asarray(n_ab, dtype=np.float64)
    k12 = np.asarray(n_a, dtype=np.float64) - k11
    k21 = np.asarray(n_b, dtype=np.float64) - k11
    k22 = np.asarray(n_total, dtype=np.float64) - n_a - n_b + k11
    return log_likelihood_ratio(k11, k12, k21, k22)


def root_log_likelihood_ratio(k11, k12, k21, k22) -> float:
    """Signed sqrt(LLR): negative when k11 underrepresents expectation

    (LogLikelihood.java root form).
    """
    llr = log_likelihood_ratio(k11, k12, k21, k22)
    s = np.sqrt(llr)
    k11, k12, k21, k22 = (float(k11), float(k12), float(k21), float(k22))
    if k11 / max(k11 + k12, 1e-300) < k21 / max(k21 + k22, 1e-300):
        s = -s
    return float(s)
