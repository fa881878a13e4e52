"""DistanceMeasure family vs NumPy oracles + DuckDB SQL-twin parity."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.distance import (DISTANCES, chebyshev,
                                             distance_sql, mahalanobis,
                                             minkowski, weighted_euclidean,
                                             weighted_manhattan)

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 0.0, 3.0]),
    ([0.5, -1.0, 2.5], [0.5, -1.0, 2.5]),
    ([-3.0, 0.0, 1.0], [2.0, 2.0, -2.0]),
]


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(VECS, "v array<double>, s array<double>")


def _np_oracle(measure, a, b, p=3.0, w=None, m=None):
    a, b = np.asarray(a), np.asarray(b)
    d = a - b
    if measure == "euclidean":
        return float(np.sqrt((d * d).sum()))
    if measure == "squared":
        return float((d * d).sum())
    if measure == "manhattan":
        return float(np.abs(d).sum())
    if measure == "chebyshev":
        return float(np.abs(d).max())
    if measure == "minkowski":
        return float((np.abs(d) ** p).sum() ** (1.0 / p))
    if measure == "cosine":
        den = np.linalg.norm(a) * np.linalg.norm(b)
        return 1.0 if den == 0 else float(1.0 - a.dot(b) / den)
    if measure == "tanimoto":
        den = a.dot(a) + b.dot(b) - a.dot(b)
        return 0.0 if den == 0 else float(1.0 - a.dot(b) / den)
    if measure == "weuclid":
        return float(np.sqrt((np.asarray(w) * d * d).sum()))
    if measure == "wmanhattan":
        return float((np.asarray(w) * np.abs(d)).sum())
    if measure == "mahalanobis":
        return float(np.sqrt(d @ np.asarray(m) @ d))
    raise AssertionError(measure)


@pytest.mark.parametrize("measure", sorted(DISTANCES))
def test_registry_vs_numpy(pairs, measure):
    rows = pairs.select(
        DISTANCES[measure](F.col("v"), F.col("s")).alias("d")).collect()
    for row, (a, b) in zip(rows, VECS):
        assert row["d"] == pytest.approx(_np_oracle(measure, a, b),
                                         abs=1e-12)


def test_weighted_and_mahalanobis(pairs):
    w = [1.0, 2.0, 0.5]
    m = [[2.0, 0.1, 0.0], [0.1, 1.0, 0.0], [0.0, 0.0, 3.0]]
    rows = pairs.select(
        weighted_euclidean(w)(F.col("v"), F.col("s")).alias("we"),
        weighted_manhattan(w)(F.col("v"), F.col("s")).alias("wm"),
        mahalanobis(m)(F.col("v"), F.col("s")).alias("mh")).collect()
    for row, (a, b) in zip(rows, VECS):
        assert row["we"] == pytest.approx(
            _np_oracle("weuclid", a, b, w=w), abs=1e-12)
        assert row["wm"] == pytest.approx(
            _np_oracle("wmanhattan", a, b, w=w), abs=1e-12)
        assert row["mh"] == pytest.approx(
            _np_oracle("mahalanobis", a, b, m=m), abs=1e-12)


def test_minkowski_p_values(pairs):
    for p in (1.0, 2.0, 4.0):
        rows = pairs.select(
            minkowski(p)(F.col("v"), F.col("s")).alias("d")).collect()
        for row, (a, b) in zip(rows, VECS):
            assert row["d"] == pytest.approx(
                _np_oracle("minkowski", a, b, p=p), abs=1e-12)


@pytest.mark.parametrize("measure", sorted(DISTANCES))
def test_sql_twin_bit_parity(pairs, measure):
    """The DuckDB twin must agree with Spark to the last bit (gate
    contract), not just approximately."""
    spark_vals = [r["d"] for r in pairs.select(
        DISTANCES[measure](F.col("v"), F.col("s")).alias("d")).collect()]
    con = duckdb.connect()
    for (a, b), sv in zip(VECS, spark_vals):
        la = "[" + ", ".join(repr(x) for x in a) + "]"
        lb = "[" + ", ".join(repr(x) for x in b) + "]"
        dv = con.execute(
            f"SELECT {distance_sql(measure, la, lb)}").fetchone()[0]
        assert dv == sv, (measure, a, b, dv, sv)


def test_chebyshev_zero_distance(pairs):
    row = pairs.filter(F.col("v") == F.col("s")).select(
        chebyshev(F.col("v"), F.col("s")).alias("d")).first()
    assert row["d"] == 0.0
