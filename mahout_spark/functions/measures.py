"""Similarity measures as Catalyst column expressions.

Port of the reference's pluggable ``VectorSimilarityMeasure`` strategy
contract (mr/.../cooccurrence/measures/VectorSimilarityMeasure.java:23-31):
``normalize(v)`` / ``norm(v)`` are row-level preprocessing; ``similarity
(dots, normA, normB, numberOfColumns)`` combines pairwise aggregates. Here
each measure supplies:

- ``norm_expr(value)``   — contribution of one element to the row norm
  (summed per row by the caller); L2-squared for cosine/euclidean families,
  L0 (count) for the count-based family;
- ``normalize`` flag     — whether values are pre-scaled to unit L2 rows
  (cosine family) before the pairwise dot;
- ``binarize`` flag      — count-based measures operate on 0/1;
- ``similarity_expr(dots, norm_a, norm_b, n_cols)`` — the final score.

Goldens pinned by tests/test_measures.py from
mr/src/test/.../measures/VectorSimilarityMeasuresTest.java:30-131.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


def xlogx(c: Column) -> Column:
    return F.when(c > 0, c * F.log(c)).otherwise(F.lit(0.0))


def _entropy2(a: Column, b: Column) -> Column:
    return xlogx(a + b) - xlogx(a) - xlogx(b)


def _entropy4(a: Column, b: Column, c: Column, d: Column) -> Column:
    return xlogx(a + b + c + d) - xlogx(a) - xlogx(b) - xlogx(c) - xlogx(d)


def llr_expr(k11: Column, k12: Column, k21: Column, k22: Column) -> Column:
    """Raw LLR — 2*(rowEntropy + colEntropy - matrixEntropy), >= 0.

    Column-expression mirror of math/.../stats/LogLikelihood.java:51-100
    (same formula as mahout_spark.core.llr.log_likelihood_ratio).
    """
    row_e = _entropy2(k11 + k12, k21 + k22)
    col_e = _entropy2(k11 + k21, k12 + k22)
    mat_e = _entropy4(k11, k12, k21, k22)
    return F.greatest(F.lit(0.0), 2.0 * (row_e + col_e - mat_e))


def llr_cooc_expr(n_a: Column, n_b: Column, n_ab: Column,
                  n_total: Column) -> Column:
    """LLR from cooccurrence counts — the contingency construction of

    SimilarityAnalysis.scala:300-309 (golden: (1,2,1,6) -> 2.6341457841558764).
    """
    k11 = n_ab
    k12 = n_a - n_ab
    k21 = n_b - n_ab
    k22 = n_total - n_a - n_b + n_ab
    # a negative cell means the caller's n_total is not a true universe
    # size (e.g. N from A only while B has extra rows) — surface it as an
    # error instead of letting xlogx clamp it into a silently-wrong LLR
    guard = F.when(k22 < 0, F.raise_error(F.concat(
        F.lit("llr_cooc_expr: k22 < 0 (n_total smaller than "
              "|rows(A) ∪ rows(B)|): "), k22.cast("string"))))
    return F.coalesce(guard.cast("double"),
                      llr_expr(k11.cast("double"), k12.cast("double"),
                               k21.cast("double"), k22.cast("double")))


LLR_COOC_SQL = """
    greatest(0.0, 2.0 * (
        (CASE WHEN {N} > 0 THEN {N} * ln({N}) ELSE 0 END
         - CASE WHEN {na} > 0 THEN {na} * ln({na}) ELSE 0 END
         - CASE WHEN ({N} - {na}) > 0 THEN ({N} - {na}) * ln({N} - {na}) ELSE 0 END)
      + (CASE WHEN {N} > 0 THEN {N} * ln({N}) ELSE 0 END
         - CASE WHEN {nb} > 0 THEN {nb} * ln({nb}) ELSE 0 END
         - CASE WHEN ({N} - {nb}) > 0 THEN ({N} - {nb}) * ln({N} - {nb}) ELSE 0 END)
      - (CASE WHEN {N} > 0 THEN {N} * ln({N}) ELSE 0 END
         - CASE WHEN {nab} > 0 THEN {nab} * ln({nab}) ELSE 0 END
         - CASE WHEN ({na} - {nab}) > 0 THEN ({na} - {nab}) * ln({na} - {nab}) ELSE 0 END
         - CASE WHEN ({nb} - {nab}) > 0 THEN ({nb} - {nab}) * ln({nb} - {nab}) ELSE 0 END
         - CASE WHEN ({N} - {na} - {nb} + {nab}) > 0
                THEN ({N} - {na} - {nb} + {nab}) * ln({N} - {na} - {nb} + {nab}) ELSE 0 END)
    ))
"""


def llr_cooc_sql(na: str, nb: str, nab: str, n: str) -> str:
    """DuckDB-runnable SQL text equivalent of llr_cooc_expr (entropy form

    expanded: H(row)+H(col)-H(matrix) with k11=nab,k12=na-nab,k21=nb-nab,
    k22=N-na-nb+nab — the row-entropy uses sums (na, N-na)).
    """
    return LLR_COOC_SQL.format(na=f"({na})::DOUBLE", nb=f"({nb})::DOUBLE",
                               nab=f"({nab})::DOUBLE", N=f"({n})::DOUBLE")


@dataclass(frozen=True)
class Measure:
    """One VectorSimilarityMeasure strategy: flags + the similarity expr."""

    name: str
    binarize: bool          # operate on 0/1 (count-based family)
    l2_normalize: bool      # pre-scale rows to unit L2 before dots
    norm_is_count: bool     # row norm = nnz count (L0) instead of sum(v^2)

    def similarity_expr(self, dots: Column, norm_a: Column, norm_b: Column,
                        n_cols: Column) -> Column:
        raise NotImplementedError

    def similarity_sql(self, dots: str, norm_a: str, norm_b: str,
                       n_cols: str) -> str:
        raise NotImplementedError


class CosineMeasure(Measure):
    """cos = dots / (sqrt(normA)·sqrt(normB)), norm = Σv².

    Reference (measures/CosineSimilarity.java:22-47) pre-scales rows to
    unit L2 and returns the raw dot; we compute the algebraically identical
    post-normalized form — on integral inputs every intermediate is exact
    in float64, so the DuckDB oracle matches bit-for-bit (pre-scaling would
    make the dot a float sum whose order differs across engines).
    """

    def __init__(self):
        super().__init__("cosine", binarize=False, l2_normalize=False,
                         norm_is_count=False)

    def similarity_expr(self, dots, norm_a, norm_b, n_cols):
        return dots / (F.sqrt(norm_a) * F.sqrt(norm_b))

    def similarity_sql(self, dots, norm_a, norm_b, n_cols):
        return f"({dots} / (sqrt({norm_a}) * sqrt({norm_b})))"


class PearsonMeasure(Measure):
    """Mean-center nonzeros per row, then cosine.

    Reference: measures/PearsonCorrelationSimilarity.java (extends Cosine).
    The pipeline centers row-level with the SCALED form w = n*x - S
    (= n*(x - mean); a per-row constant scale leaves the cosine
    unchanged), so intermediates stay exact on integral inputs and the
    post-normalized cosine applies directly — no per-value division.
    """

    def __init__(self):
        super().__init__("pearson", binarize=False, l2_normalize=False,
                         norm_is_count=False)

    similarity_expr = CosineMeasure.similarity_expr
    similarity_sql = CosineMeasure.similarity_sql


class EuclideanMeasure(Measure):
    """1 / (1 + sqrt(normA - 2*dots + normB)), norm = sum(v^2).

    Reference: measures/EuclideanDistanceSimilarity.java.
    """

    def __init__(self):
        super().__init__("euclidean", binarize=False, l2_normalize=False,
                         norm_is_count=False)

    def similarity_expr(self, dots, norm_a, norm_b, n_cols):
        return 1.0 / (1.0 + F.sqrt(F.greatest(F.lit(0.0),
                                              norm_a - 2.0 * dots + norm_b)))

    def similarity_sql(self, dots, norm_a, norm_b, n_cols):
        return (f"1.0 / (1.0 + sqrt(greatest(0.0, "
                f"{norm_a} - 2.0*{dots} + {norm_b})))")


class TanimotoMeasure(Measure):
    """dots / (normA + normB - dots), count-based.

    Reference: measures/TanimotoCoefficientSimilarity.java.
    """

    def __init__(self):
        super().__init__("tanimoto", binarize=True, l2_normalize=False,
                         norm_is_count=True)

    def similarity_expr(self, dots, norm_a, norm_b, n_cols):
        return dots / (norm_a + norm_b - dots)

    def similarity_sql(self, dots, norm_a, norm_b, n_cols):
        return f"{dots} / ({norm_a} + {norm_b} - {dots})"


class CityBlockMeasure(Measure):
    """1 / (1 + normA + normB - 2*dots), count-based.

    Reference: measures/CityBlockSimilarity.java.
    """

    def __init__(self):
        super().__init__("cityblock", binarize=True, l2_normalize=False,
                         norm_is_count=True)

    def similarity_expr(self, dots, norm_a, norm_b, n_cols):
        return 1.0 / (1.0 + norm_a + norm_b - 2.0 * dots)

    def similarity_sql(self, dots, norm_a, norm_b, n_cols):
        return f"1.0 / (1.0 + {norm_a} + {norm_b} - 2.0*{dots})"


class LoglikelihoodMeasure(Measure):
    """1 - 1/(1 + LLR) on binarized counts.

    Reference: measures/LoglikelihoodSimilarity.java (contingency from
    (dots, normA, normB, numberOfColumns)).
    """

    def __init__(self):
        super().__init__("loglikelihood", binarize=True, l2_normalize=False,
                         norm_is_count=True)

    def similarity_expr(self, dots, norm_a, norm_b, n_cols):
        llr = llr_cooc_expr(norm_a, norm_b, dots, n_cols)
        return 1.0 - 1.0 / (1.0 + llr)

    def similarity_sql(self, dots, norm_a, norm_b, n_cols):
        llr = llr_cooc_sql(norm_a, norm_b, dots, n_cols)
        return f"(1.0 - 1.0/(1.0 + {llr}))"


class CooccurrenceCountMeasure(Measure):
    """similarity = raw cooccurrence count.

    Reference: measures/CooccurrenceCountSimilarity.java.
    """

    def __init__(self):
        super().__init__("cooccurrence", binarize=True, l2_normalize=False,
                         norm_is_count=True)

    def similarity_expr(self, dots, norm_a, norm_b, n_cols):
        return dots

    def similarity_sql(self, dots, norm_a, norm_b, n_cols):
        return dots


MEASURES: dict[str, Measure] = {m.name: m for m in [
    CosineMeasure(), PearsonMeasure(), EuclideanMeasure(), TanimotoMeasure(),
    CityBlockMeasure(), LoglikelihoodMeasure(), CooccurrenceCountMeasure(),
]}
