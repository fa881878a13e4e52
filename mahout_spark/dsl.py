"""Samsara R-Like DSL surface: the ``Drm`` wrapper.

Reference anchors (studied, not copied):
- math-scala/.../drm/RLikeDrmOps.scala (operators: ``%*%`` -> OpAB /
  OpAtB / OpABt / OpAtA via transpose pattern-matching, ``t``,
  elementwise + - * /, cbind/rbind, scalar ops)
- math-scala/.../drm/package.scala (drmParallelize, drmBroadcast,
  colSums/colMeans/rowSums/rowMeans/norm helpers)
- spark/.../drm/CheckpointedDrmSpark.scala (collect, checkpoint)

A reference user writes ``val C = (drmA.t %*% drmA).checkpoint()``;
here that is ``C = (A.t @ A).checkpoint()`` — the same expression
shape, with the same logical rewrites applied eagerly by Python-side
pattern matching instead of a deferred optimizer (Catalyst then
optimizes the physical plan):

- ``A.t @ A``  -> ``ata``   (OpAtAnyKey+OpAB -> OpAtA,
  DistributedEngine.scala:208-230's self-squaring rewrite)
- ``A.t @ B``  -> ``atb``   (OpAtB)
- ``A @ B.t``  -> ``abt``   (OpABt)
- ``A.t.t``    -> ``A``     (double-transpose elimination)
- ``A @ <np.ndarray>``      -> ``times_incore`` (OpTimesRightMatrix)
- elementwise ops fuse in Catalyst (OpAewUnaryFuncFusion's job).

The wrapper is THIN: ``.df`` is always the plain triple DataFrame, so
DSL and functional styles mix freely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from mahout_spark.operators import drm as _ops

__all__ = ["Drm", "drm_from_numpy", "drm_wrap"]


class Drm:
    """A distributed row matrix: (row_id, col_id, value) triples +
    optional cached geometry. Immutable; every op returns a new Drm."""

    def __init__(self, df: DataFrame, nrow: int | None = None,
                 ncol: int | None = None, _transposed_of: "Drm" = None):
        self.df = df
        self._nrow = nrow
        self._ncol = ncol
        self._transposed_of = _transposed_of  # set on X.t views

    # --- geometry (computed lazily, cached) -----------------------------
    @property
    def nrow(self) -> int:
        if self._nrow is None:
            from pyspark.sql import functions as F

            self._nrow = int(self.df.agg(
                F.max("row_id")).first()[0]) + 1
        return self._nrow

    @property
    def ncol(self) -> int:
        if self._ncol is None:
            from pyspark.sql import functions as F

            self._ncol = int(self.df.agg(
                F.max("col_id")).first()[0]) + 1
        return self._ncol

    # --- structure ------------------------------------------------------
    @property
    def t(self) -> "Drm":
        if self._transposed_of is not None:  # A.t.t -> A
            return self._transposed_of
        return Drm(_ops.at(self.df), self._ncol, self._nrow,
                   _transposed_of=self)

    def __getitem__(self, key) -> "Drm":
        """A[r0:r1, c0:c1] — OpRowRange / column slice. Keys are
        REBASED to 0..len-1 like the reference's int-keyed row range."""
        from pyspark.sql import functions as F

        rows, cols = key if isinstance(key, tuple) else (key, slice(None))
        df, nrow, ncol = self.df, self._nrow, self._ncol
        if isinstance(rows, slice) and (rows.start or rows.stop is not None):
            start = rows.start or 0
            stop = self.nrow if rows.stop is None else rows.stop
            df = _ops.row_range(df, start, stop)
            if start:
                df = df.withColumn("row_id", F.col("row_id") - start)
            nrow = stop - start
        if isinstance(cols, slice) and (cols.start or cols.stop is not None):
            start = cols.start or 0
            stop = self.ncol if cols.stop is None else cols.stop
            df = _ops.col_range(df, start, stop)
            if start:
                df = df.withColumn("col_id", F.col("col_id") - start)
            ncol = stop - start
        return Drm(df, nrow, ncol)

    def cbind(self, other) -> "Drm":
        if isinstance(other, (int, float)):
            return Drm(_ops.cbind_scalar(self.df, self.ncol,
                                         float(other)),
                       self._nrow, self.ncol + 1)
        return Drm(_ops.cbind(self.df, other.df, self.ncol),
                   self._nrow, self.ncol + other.ncol)

    def rbind(self, other: "Drm") -> "Drm":
        return Drm(_ops.rbind(self.df, other.df, self.nrow),
                   self.nrow + other.nrow, self._ncol)

    # --- matmul with rewrites --------------------------------------------
    def __matmul__(self, other):
        if isinstance(other, np.ndarray):
            if other.ndim == 1:  # OpAx
                return _ops.ax(self.df, other)
            return Drm(_ops.times_incore(self.df, other),
                       self._nrow, other.shape[1])
        if not isinstance(other, Drm):
            return NotImplemented
        if (self._transposed_of is not None
                and self._transposed_of is other):
            return Drm(_ops.ata(other.df), other._ncol, other._ncol)
        if self._transposed_of is not None:  # A.t @ B -> atb
            return Drm(_ops.atb(self._transposed_of.df, other.df),
                       self._nrow, other._ncol)
        if other._transposed_of is not None:  # A @ B.t -> abt
            return Drm(_ops.abt(self.df, other._transposed_of.df),
                       self._nrow, other._ncol)
        return Drm(_ops.ab(self.df, other.df), self._nrow, other._ncol)

    # --- elementwise -----------------------------------------------------
    def _ew(self, other, op: str) -> "Drm":
        if isinstance(other, (int, float)):
            return Drm(_ops.aew_scalar(self.df, op, float(other)),
                       self._nrow, self._ncol)
        return Drm(_ops.aew_b(self.df, other.df, op),
                   self._nrow, self._ncol)

    def __add__(self, o):
        return self._ew(o, "+")

    def __sub__(self, o):
        return self._ew(o, "-")

    def __mul__(self, o):
        return self._ew(o, "*")

    def __truediv__(self, o):
        return self._ew(o, "/")

    def __rmul__(self, o):
        return self._ew(o, "*")

    def __radd__(self, o):
        return self._ew(o, "+")

    def apply(self, fn: str) -> "Drm":
        """Elementwise unary function (OpAewUnaryFunc): 'abs', 'exp',
        'sqrt', 'signum', ... — whatever aew_unary supports."""
        return Drm(_ops.aew_unary(self.df, fn), self._nrow, self._ncol)

    # --- reductions --------------------------------------------------
    def col_sums(self) -> DataFrame:
        return _ops.col_sums(self.df)

    def col_means(self) -> DataFrame:
        return _ops.col_means(self.df, self.nrow)

    def row_sums(self) -> DataFrame:
        return _ops.row_sums(self.df)

    def row_means(self) -> DataFrame:
        return _ops.row_means(self.df, self.ncol)

    def norm(self) -> float:
        return _ops.frobenius_norm(self.df)

    # --- block API / lifecycle -------------------------------------
    def map_block(self, block_fn, out_ncol: int | None = None) -> "Drm":
        return Drm(_ops.map_block(self.df, self.ncol, block_fn,
                                  out_ncol=out_ncol),
                   self._nrow, out_ncol or self._ncol)

    def checkpoint(self) -> "Drm":
        """CheckpointedDrm: pin + truncate lineage (localCheckpoint —
        the single-app equivalent of the reference's checkpoint())."""
        return Drm(self.df.localCheckpoint(), self._nrow, self._ncol)

    def collect(self) -> np.ndarray:
        return _ops.drm_collect(self.df, self._nrow, self._ncol)

    def __repr__(self):
        return (f"Drm(nrow={self._nrow or '?'}, ncol={self._ncol or '?'}"
                f"{', transposed-view' if self._transposed_of else ''})")


def drm_from_numpy(spark, m: np.ndarray, n_partitions: int = 2) -> Drm:
    """drmParallelize twin."""
    return Drm(_ops.drm_parallelize(spark, m, n_partitions),
               m.shape[0], m.shape[1])


def drm_wrap(df: DataFrame, nrow: int | None = None,
             ncol: int | None = None) -> Drm:
    """drmWrap twin: adopt an existing triple DataFrame."""
    return Drm(_ops.as_drm(df), nrow, ncol)
