"""Count-Sketch (AMS) — the signed sibling of the count-min sketch.

Where the CMS only OVERestimates (one-sided: ``a <= a_hat <= a + eps*L1``),
the Count-Sketch (Charikar-Chen-Farach-Colton 2002, built on the
Alon-Matias-Szegedy 1996 F2 estimator) keeps SIGNED counters
``C[i, h_i(k)] += s_i(k) * w`` and answers with the MEDIAN over depth rows
of ``s_i(k) * C[i, h_i(k)]`` — an UNBIASED estimate with two-sided error
``|a_hat - a| <= eps * ||a||_2`` w.p. >= 1-delta for ``w = ceil(3/eps^2)``,
``d = ceil(4*ln(1/delta))`` (per-row variance <= ||a||_2^2 / w, Chebyshev
gives per-row failure <= 1/3, median amplifies). The same structure yields:

- unbiased INNER products: each depth row's ``sum_j A[i,j]*B[i,j]`` has
  expectation <a, b> (cross-term signs cancel); the estimate is the median
  over rows. The CMS inner product, by contrast, is biased UP.
- the AMS second moment F2 = ||a||_2^2: median over rows of the row's
  self-dot (row width w drives the variance: Var <= 2*F2^2/w).

Relationship to the reference: the reference ships only the count-min
structure (mr/.../cf/taste/impl/common/AbstractCountMinSketch.java:69-123);
the Count-Sketch is the north-rule "sibling mergeable sketch" that fixes
CMS's one-sided bias for inner-product/similarity work on signed or
heavy-tailed data. Same hash plumbing as core/cms.py:

- fast family: splitmix64 bucket rows (core/hashing.fast_rows); signs from
  an independently-salted splitmix64 bit.
- parity family: the reference's affine family ``((a*k+b) mod p) mod w``
  (HashFunctionBuilder.java:23-61) for buckets, and an independent affine
  draw (seed + SIGN_SEED_OFFSET) reduced mod 2 for signs — every counter,
  estimate, and merge is then DuckDB-replayable in exact HUGEINT
  arithmetic (sketch/queries.countsketch_* oracle builders).

Merge = counter-wise addition (hash family is a pure function of config),
so the sketch drops into the generic two-phase distributed build
(sketch/agg.sketch_by_key) with the 'sum' JVM preagg: the shuffle carries
(key, total weight) rows, never the token stream.

Determinism: updates commute (addition), so any partitioning / merge tree
yields bit-identical counters for integer-valued weights.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.hashing import (affine_hash, affine_params, fast_rows)

_MAGIC = b"CSK1"

# Sign-family seed offset (both families): an independent stream whose
# (a, b) draws / splitmix base never collide with the bucket stream for
# any seed. Shared by the SQL oracle builders — change in lockstep or never.
SIGN_SEED_OFFSET = 0x5151


def countsketch_shape(eps: float, delta: float) -> tuple[int, int]:
    """(depth, width) for the two-sided guarantee |err| <= eps * ||a||_2

    w.p. >= 1 - delta: w = ceil(3/eps^2) (Chebyshev per-row failure 1/3),
    d = ceil(4 * ln(1/delta)) (median/Chernoff amplification).
    """
    if not (0.0 < eps <= 1.0):
        raise ValueError(f"eps must be in (0, 1], got {eps}")
    if not (0.0 < delta < 1.0):
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    width = int(math.ceil(3.0 / (eps * eps)))
    depth = int(math.ceil(4.0 * math.log(1.0 / delta)))
    return depth, width


@dataclass
class CountSketch:
    depth: int
    width: int
    seed: int = 1
    family: str = "fast"  # "fast" | "parity"
    counts: np.ndarray = field(default=None, repr=False)  # (depth, width) f64
    _bucket_params: list = field(default=None, repr=False)
    _sign_params: list = field(default=None, repr=False)

    def __post_init__(self):
        if self.family not in ("fast", "parity"):
            raise ValueError(f"unknown CountSketch family {self.family!r}")
        if self.counts is None:
            self.counts = np.zeros((self.depth, self.width), dtype=np.float64)
        if self.family == "parity":
            self._bucket_params = affine_params(self.seed, self.depth)
            self._sign_params = affine_params(self.seed + SIGN_SEED_OFFSET,
                                              self.depth)

    @classmethod
    def from_error_bound(cls, eps: float, delta: float, seed: int = 1,
                         family: str = "fast") -> "CountSketch":
        d, w = countsketch_shape(eps, delta)
        return cls(depth=d, width=w, seed=seed, family=family)

    @property
    def eps(self) -> float:
        """Two-sided L2 error coefficient implied by the width."""
        return math.sqrt(3.0 / self.width)

    # -- hashing ---------------------------------------------------------
    def _rows_signs(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """((depth, n) bucket indices, (depth, n) +-1.0 signs)."""
        keys = np.asarray(keys, dtype=np.int64)
        if self.family == "parity":
            rows = np.stack([affine_hash(keys, a, b, self.width)
                             for (a, b) in self._bucket_params])
            bits = np.stack([affine_hash(keys, a, b, 2)
                             for (a, b) in self._sign_params])
        else:
            rows = fast_rows(keys, self.seed, self.depth, self.width)
            bits = fast_rows(keys, self.seed + SIGN_SEED_OFFSET,
                             self.depth, 2)
        return rows, 1.0 - 2.0 * bits.astype(np.float64)

    # -- updates ---------------------------------------------------------
    def update_batch(self, keys: np.ndarray,
                     increments: np.ndarray | float = 1.0) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        if np.isscalar(increments):
            incs = np.full(len(keys), float(increments))
        else:
            incs = np.asarray(increments, dtype=np.float64)
        rows, signs = self._rows_signs(keys)
        for i in range(self.depth):
            np.add.at(self.counts[i], rows[i], signs[i] * incs)

    def update(self, key: int, increment: float = 1.0) -> None:
        self.update_batch(np.array([key], dtype=np.int64),
                          np.array([float(increment)]))

    # -- queries ---------------------------------------------------------
    def point_batch(self, keys: np.ndarray) -> np.ndarray:
        """Median over depth rows of sign * counter — unbiased, two-sided."""
        keys = np.asarray(keys, dtype=np.int64)
        rows, signs = self._rows_signs(keys)
        per_row = np.empty((self.depth, len(keys)))
        for i in range(self.depth):
            per_row[i] = signs[i] * self.counts[i, rows[i]]
        return np.median(per_row, axis=0)

    def point(self, key: int) -> float:
        return float(self.point_batch(np.array([key], dtype=np.int64))[0])

    def inner_product(self, other: "CountSketch") -> float:
        """Unbiased <a, b> estimate: median over rows of the row dot.

        Valid only for sketches sharing (depth, width, seed, family) —
        the cross terms cancel in expectation because the sign families
        are pairwise independent of the bucket collisions.
        """
        if (self.depth, self.width, self.seed, self.family) != (
                other.depth, other.width, other.seed, other.family):
            raise ValueError("CountSketch inner product requires identical "
                             "(depth, width, seed, family)")
        dots = np.einsum("ij,ij->i", self.counts, other.counts)
        return float(np.median(dots))

    def f2(self) -> float:
        """AMS second-moment estimate: median over rows of the self-dot."""
        return float(np.median(
            np.einsum("ij,ij->i", self.counts, self.counts)))

    def subtract(self, other: "CountSketch") -> "CountSketch":
        """Sketch of the DIFFERENCE vector a - b (linearity): point

        estimates on the result are unbiased estimates of per-key
        frequency deltas — the corpus-drift / change-detection primitive
        (Cormode-Muthukrishnan "deltoids" use-case). Config contract as
        merge.
        """
        if (self.depth, self.width, self.seed, self.family) != (
                other.depth, other.width, other.seed, other.family):
            raise ValueError("subtract requires identical CountSketch config")
        return CountSketch(self.depth, self.width, self.seed,
                           family=self.family,
                           counts=self.counts - other.counts)

    # -- merge -----------------------------------------------------------
    def merge(self, other: "CountSketch") -> "CountSketch":
        if (self.depth, self.width, self.seed, self.family) != (
                other.depth, other.width, other.seed, other.family):
            raise ValueError("merge requires identical CountSketch config")
        return CountSketch(self.depth, self.width, self.seed,
                           family=self.family,
                           counts=self.counts + other.counts)

    # -- serialization ---------------------------------------------------
    _FAMILY_CODE = {"fast": 0, "parity": 1}

    def serialize(self) -> bytes:
        header = struct.pack("<4sIIqB", _MAGIC, self.depth, self.width,
                             self.seed, self._FAMILY_CODE[self.family])
        return header + self.counts.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CountSketch":
        try:
            magic, depth, width, seed, fam = struct.unpack_from("<4sIIqB",
                                                                data)
        except struct.error as e:
            raise ValueError("not a CountSketch blob") from e
        if magic != _MAGIC:
            raise ValueError("not a CountSketch blob")
        families = {v: k for k, v in cls._FAMILY_CODE.items()}
        if fam not in families:
            raise ValueError(f"unknown CountSketch family code {fam}")
        off = struct.calcsize("<4sIIqB")
        counts = np.frombuffer(data, dtype=np.float64, offset=off).reshape(
            depth, width).copy()
        return cls(depth=depth, width=width, seed=seed,
                   counts=counts, family=families[fam])
