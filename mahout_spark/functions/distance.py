"""DistanceMeasure family over array<double> columns.

Reference anchors (studied, not copied):
  mr/src/main/java/org/apache/mahout/common/distance/
    EuclideanDistanceMeasure.java, SquaredEuclideanDistanceMeasure.java,
    ManhattanDistanceMeasure.java, CosineDistanceMeasure.java,
    ChebyshevDistanceMeasure.java, MinkowskiDistanceMeasure.java (default
    exponent 3), TanimotoDistanceMeasure.java,
    WeightedEuclideanDistanceMeasure.java,
    WeightedManhattanDistanceMeasure.java, MahalanobisDistanceMeasure.java.

Every measure is a pure JVM column expression (zip_with + aggregate —
whole-stage-codegen, no Python), with a DuckDB SQL twin for the gate
oracles. ``DISTANCES`` is the pluggable registry the CLI jobs consume,
mirroring the reference's DistanceMeasure class-name option.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _diff(v, s) -> Column:
    return F.zip_with(v, s, lambda a, b: a - b)


def _dot(v, s) -> Column:
    return F.aggregate(F.zip_with(v, s, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def squared_euclidean(v, s) -> Column:
    return F.aggregate(F.zip_with(v, s, lambda a, b: (a - b) * (a - b)),
                       F.lit(0.0), lambda acc, x: acc + x)


def euclidean(v, s) -> Column:
    return F.sqrt(squared_euclidean(v, s))


def manhattan(v, s) -> Column:
    return F.aggregate(F.zip_with(v, s, lambda a, b: F.abs(a - b)),
                       F.lit(0.0), lambda acc, x: acc + x)


def chebyshev(v, s) -> Column:
    """max_i |a_i - b_i| (ChebyshevDistanceMeasure.java:37-48)."""
    return F.array_max(F.zip_with(v, s, lambda a, b: F.abs(a - b)))


def cosine_distance(v, s) -> Column:
    """1 - cos; 0-norm guard matches the reference (denominator==0 -> 1)."""
    n1 = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    n2 = F.aggregate(s, F.lit(0.0), lambda acc, x: acc + x * x)
    denom = F.sqrt(n1) * F.sqrt(n2)
    return F.when(denom == 0.0, F.lit(1.0)).otherwise(
        F.lit(1.0) - _dot(v, s) / denom)


def tanimoto(v, s) -> Column:
    """1 - dot / (||a||^2 + ||b||^2 - dot)
    (TanimotoDistanceMeasure.java:33-50)."""
    n1 = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    n2 = F.aggregate(s, F.lit(0.0), lambda acc, x: acc + x * x)
    d = _dot(v, s)
    denom = n1 + n2 - d
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(F.lit(1.0) - d / denom)


def minkowski(p: float = 3.0):
    """(sum |a-b|^p)^(1/p); p=3 is the reference default
    (MinkowskiDistanceMeasure.java:31)."""
    def dist(v, s) -> Column:
        acc = F.aggregate(
            F.zip_with(v, s, lambda a, b: F.pow(F.abs(a - b), F.lit(p))),
            F.lit(0.0), lambda a2, x: a2 + x)
        return F.pow(acc, F.lit(1.0 / p))
    return dist


def weighted_euclidean(weights: list[float]):
    """sqrt(sum w_i (a_i-b_i)^2) — weights a driver literal (the
    reference reads them from a weights Vector)."""
    warr = F.array(*[F.lit(float(w)) for w in weights])

    def dist(v, s) -> Column:
        wd = F.zip_with(_diff(v, s), warr, lambda d, w: w * d * d)
        return F.sqrt(F.aggregate(wd, F.lit(0.0), lambda acc, x: acc + x))
    return dist


def weighted_manhattan(weights: list[float]):
    warr = F.array(*[F.lit(float(w)) for w in weights])

    def dist(v, s) -> Column:
        wd = F.zip_with(_diff(v, s), warr, lambda d, w: w * F.abs(d))
        return F.aggregate(wd, F.lit(0.0), lambda acc, x: acc + x)
    return dist


def mahalanobis(inv_cov: list[list[float]]):
    """sqrt(d' S^-1 d) with the inverse covariance as driver literals
    (MahalanobisDistanceMeasure.java:48-77 keeps it in memory too; pair
    with operators.drm.dcol_mean_cov + a driver-side inverse).

    Expression size is O(dim^2) literal terms — fine for the model-sized
    feature spaces Mahalanobis is used on (the reference materializes a
    dense DenseMatrix for the same reason); for wide vectors fall back to
    a NumPy mapInPandas kernel.
    """
    dim = len(inv_cov)

    def dist(v, s) -> Column:
        d = _diff(v, s)
        ds = [F.element_at(d, i + 1) for i in range(dim)]
        quad = None
        for i in range(dim):
            row = None
            for j in range(dim):
                m = float(inv_cov[i][j])
                if m == 0.0:
                    continue
                term = F.lit(m) * ds[j]
                row = term if row is None else row + term
            if row is None:
                continue
            term_i = ds[i] * row
            quad = term_i if quad is None else quad + term_i
        return F.sqrt(quad if quad is not None else F.lit(0.0))
    return dist


#: measure-name -> fn(v, s) -> Column registry (CLI `--measure` values)
DISTANCES = {
    "euclidean": euclidean,
    "squared": squared_euclidean,
    "manhattan": manhattan,
    "cosine": cosine_distance,
    "chebyshev": chebyshev,
    "tanimoto": tanimoto,
    "minkowski": minkowski(3.0),
}


# ---------------------------------------------------------------------------
# DuckDB SQL twins (gate oracles) — same fold shapes, bit-equal results
# ---------------------------------------------------------------------------


def distance_sql(measure: str, a: str, b: str, p: float = 3.0) -> str:
    za = f"list_zip(({a})::DOUBLE[], ({b})::DOUBLE[])"
    diff2 = f"list_sum(list_transform({za}, x -> (x[1]-x[2])*(x[1]-x[2])))"
    if measure == "squared":
        return diff2
    if measure == "euclidean":
        return f"sqrt({diff2})"
    if measure == "manhattan":
        return f"list_sum(list_transform({za}, x -> abs(x[1]-x[2])))"
    if measure == "chebyshev":
        return f"list_max(list_transform({za}, x -> abs(x[1]-x[2])))"
    if measure == "minkowski":
        return (f"pow(list_sum(list_transform({za}, "
                f"x -> pow(abs(x[1]-x[2]), {p}))), {1.0 / p})")
    dot = f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"
    na = f"list_dot_product(({a})::DOUBLE[], ({a})::DOUBLE[])"
    nb = f"list_dot_product(({b})::DOUBLE[], ({b})::DOUBLE[])"
    if measure == "cosine":
        return (f"(CASE WHEN sqrt({na})*sqrt({nb}) = 0 THEN 1.0 "
                f"ELSE 1.0 - {dot}/(sqrt({na})*sqrt({nb})) END)")
    if measure == "tanimoto":
        return (f"(CASE WHEN {na}+{nb}-{dot} = 0 THEN 0.0 "
                f"ELSE 1.0 - {dot}/({na}+{nb}-{dot}) END)")
    raise ValueError(f"unknown measure {measure!r}")
