"""Samsara preprocessing layer: StandardScaler, MeanCenter, AsFactor.

Reference anchors (studied, not copied):
- math-scala/.../preprocessing/StandardScaler.scala:30-60 (fit =
  dcolMeanVars, stdev = sqrt(POPULATION variance — divide by n; the
  PreprocessorSuiteBase golden standardizes (1,2,3) by sqrt(2/3));
  transform = (row - mu) / sigma per block)
- math-scala/.../preprocessing/MeanCenter.scala:33-75 (fit = colMeans;
  setCenters adds offsets to the fitted means; transform subtracts,
  invTransform adds)
- math-scala/.../preprocessing/AsFactor.scala:35-100 (fit = per-column
  max; one-hot transform into a sparse row of total cardinality).
  NOTE the reference code computes cardinality = sum(max_i) and offsets
  = exclusive-cumsum(max_i), which disagrees with its own golden
  (PreprocessorSuiteBase.scala:18-42: cardinality 12 = sum(max_i + 1),
  offsets (0,4,7,9) for maxes (3,2,1,2)); the norm-only assertion hides
  it. This implementation follows the GOLDEN (each column one-hots into
  max_i + 1 slots, so value 0 gets a slot), the semantics the test and
  the in-code comment "(4,2,2)" intend.

Spark-first: fit = one JVM aggregate per model; transform = pure column
expressions (no UDF, no mapBlock); AsFactor emits long-form DRM triples
via posexplode so downstream Samsara ops consume it directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class StandardScalerModel:
    cols: list
    mean_vec: np.ndarray
    stdev: np.ndarray

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = [((F.col(c).cast("double") - F.lit(float(m)))
                  / F.lit(float(s))).alias(c)
                 for c, m, s in zip(self.cols, self.mean_vec, self.stdev)]
        others = [c for c in df.columns if c not in self.cols]
        return df.select(*[F.col(c) for c in others], *exprs)

    def inv_transform(self, df: DataFrame) -> DataFrame:
        exprs = [(F.col(c).cast("double") * F.lit(float(s))
                  + F.lit(float(m))).alias(c)
                 for c, m, s in zip(self.cols, self.mean_vec, self.stdev)]
        others = [c for c in df.columns if c not in self.cols]
        return df.select(*[F.col(c) for c in others], *exprs)


def standard_scaler_fit(df: DataFrame, cols: list) -> StandardScalerModel:
    """One aggregate: per-column mean + population stddev

    (StandardScaler.scala:32-35 via dcolMeanVars)."""
    aggs = []
    for c in cols:
        aggs += [F.avg(F.col(c).cast("double")).alias(f"__m_{c}"),
                 F.var_pop(F.col(c).cast("double")).alias(f"__v_{c}")]
    row = df.agg(*aggs).collect()[0]
    means = np.array([float(row[f"__m_{c}"]) for c in cols])
    stds = np.sqrt(np.array([float(row[f"__v_{c}"]) for c in cols]))
    return StandardScalerModel(list(cols), means, stds)


@dataclass
class MeanCenterModel:
    cols: list
    means: np.ndarray

    def __post_init__(self):
        self.col_centers = self.means.copy()

    def set_centers(self, centers: np.ndarray) -> None:
        """Recenter to means + centers (MeanCenter.scala:40-46)."""
        if len(centers) != len(self.means):
            raise ValueError(
                f"length of centers ({len(centers)}) must equal length of "
                f"means ({len(self.means)})")
        self.col_centers = self.means + np.asarray(centers, dtype=float)

    def transform(self, df: DataFrame) -> DataFrame:
        exprs = [(F.col(c).cast("double") - F.lit(float(m))).alias(c)
                 for c, m in zip(self.cols, self.col_centers)]
        others = [c for c in df.columns if c not in self.cols]
        return df.select(*[F.col(c) for c in others], *exprs)

    def inv_transform(self, df: DataFrame) -> DataFrame:
        exprs = [(F.col(c).cast("double") + F.lit(float(m))).alias(c)
                 for c, m in zip(self.cols, self.col_centers)]
        others = [c for c in df.columns if c not in self.cols]
        return df.select(*[F.col(c) for c in others], *exprs)


def mean_center_fit(df: DataFrame, cols: list) -> MeanCenterModel:
    row = df.agg(*[F.avg(F.col(c).cast("double")).alias(f"__m_{c}")
                   for c in cols]).collect()[0]
    return MeanCenterModel(list(cols),
                           np.array([float(row[f"__m_{c}"]) for c in cols]))


@dataclass
class AsFactorModel:
    """One-hot factorizer over integer-valued columns.

    offsets[m] = exclusive cumsum of (max_m + 1); cardinality = their
    sum; column m value v maps to slot offsets[m] + v."""

    cols: list
    maxes: np.ndarray  # per-column max (int)

    def __post_init__(self):
        widths = self.maxes.astype(np.int64) + 1
        self.offsets = np.concatenate([[0], np.cumsum(widths)[:-1]])
        self.cardinality = int(widths.sum())
        self.factor_map = self.offsets  # reference naming (factorMap)

    def transform(self, df: DataFrame, id_col: str) -> DataFrame:
        """Long-form DRM triples (row_id, col_id, 1.0) — the sparse

        one-hot matrix of AsFactor.scala:54-80 in the repo's DRM
        encoding. Pure posexplode over a literal-offset array."""
        slots = F.array(*[
            (F.lit(int(off)) + F.col(c).cast("long")).alias(c)
            for c, off in zip(self.cols, self.offsets)])
        return (df.select(F.col(id_col).alias("row_id"),
                          F.explode(slots).alias("col_id"))
                .withColumn("value", F.lit(1.0)))

    def inv_transform(self, drm: DataFrame) -> DataFrame:
        """Triples back to (row_id, <col>...) original integer values

        (AsFactor.scala:82-109). Each slot index decodes as
        col m = bucket(offsets), value = col_id - offsets[m]."""
        m = len(self.cols)
        # bucket via chained when — offsets are literals, all JVM
        col_idx = F.lit(m - 1)
        for i in range(m - 1, 0, -1):
            col_idx = F.when(F.col("col_id") < int(self.offsets[i]),
                             F.lit(i - 1)).otherwise(col_idx)
        decoded = drm.select(
            "row_id", col_idx.alias("__m"),
            F.col("col_id").alias("__slot"))
        offs = F.array(*[F.lit(int(o)) for o in self.offsets])
        decoded = decoded.withColumn(
            "__v", F.col("__slot") - F.element_at(offs, F.col("__m") + 1))
        return decoded.groupBy("row_id").pivot(
            "__m", list(range(m))).agg(F.first("__v")).select(
            "row_id", *[F.col(str(i)).alias(c)
                        for i, c in enumerate(self.cols)])


def as_factor_fit(df: DataFrame, cols: list) -> AsFactorModel:
    """Per-column max in one aggregate (AsFactor.scala:38-52's

    allreduceBlock column-max)."""
    row = df.agg(*[F.max(F.col(c).cast("long")).alias(f"__x_{c}")
                   for c in cols]).collect()[0]
    return AsFactorModel(list(cols),
                         np.array([int(row[f"__x_{c}"]) for c in cols]))
