"""Count-min sketch with double counters — the reference fork's core structure.

Behavioral parity targets (studied, not copied, from the reference):

- geometry from (eps, delta): ``w = ceil(e/eps)``, ``d = ceil(ln(1/delta))``
  with guards ``delta in (0, 1/e]``, ``eps in (0, e]``
  (mr/.../common/AbstractCountMinSketch.java:69-83);
- point query = min over depth rows, guarantee ``a <= a_hat <= a + eps*||a||_1``
  w.p. >= 1-delta (DoubleCountMinSketch.java:88-103);
- cosine(a, b) = min over depth rows of the row-wise cosine, rows with zero
  denominator skipped, NaN when every row denominator is zero
  (DoubleCountMinSketch.java:114-149);
- hash family: parity mode replicates the seeded affine family exactly
  (HashFunctionBuilder.java:23-61); fast mode uses splitmix64 (same bound).

Additions over the reference (required by the north rule):

- ``merge`` — counter-wise addition; valid because the hash family is a pure
  function of (seed, depth, width), so equal-config sketches share hashes.
  The reference has NO merge (single-JVM usage only).
- vectorized batch update over NumPy arrays (Arrow batches on the Spark side).
- serialization to bytes for use as a Spark ``binary`` column.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.hashing import (affine_hash, affine_params, fast_rows,
                                       xxh_rows)

_MAGIC = b"CMS1"
_E = math.e


def cms_shape(eps: float, delta: float) -> tuple[int, int]:
    """(depth, width) from the accuracy contract, reference formulas."""
    if not (0.0 < delta <= 1.0 / _E):
        raise ValueError(f"delta must be in (0, 1/e], got {delta}")
    if not (0.0 < eps <= _E):
        raise ValueError(f"eps must be in (0, e], got {eps}")
    width = int(math.ceil(_E / eps))
    depth = int(math.ceil(math.log(1.0 / delta)))
    return depth, width


@dataclass
class CountMinSketch:
    depth: int
    width: int
    seed: int = 1
    parity: bool = False  # exact affine-hash family replication (slow; tests)
    counts: np.ndarray = field(default=None, repr=False)  # (depth, width) f64
    _params: list = field(default=None, repr=False)
    family: str = None  # "fast" | "parity" | "xxh" (None -> from parity flag)

    def __post_init__(self):
        if self.family is None:
            self.family = "parity" if self.parity else "fast"
        elif self.parity and self.family != "parity":
            raise ValueError(
                f"conflicting arguments: parity=True but family="
                f"{self.family!r}; pass family='parity' or drop parity")
        self.parity = self.family == "parity"
        if self.counts is None:
            self.counts = np.zeros((self.depth, self.width), dtype=np.float64)
        if self.parity:
            self._params = affine_params(self.seed, self.depth)

    @classmethod
    def from_error_bound(cls, eps: float, delta: float, seed: int = 1,
                         parity: bool = False) -> "CountMinSketch":
        d, w = cms_shape(eps, delta)
        return cls(depth=d, width=w, seed=seed, parity=parity)

    @property
    def eps(self) -> float:
        return _E / self.width

    @property
    def delta(self) -> float:
        return math.exp(-float(self.depth))

    # -- hashing ---------------------------------------------------------
    def _bucket_rows(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) bucket indices for int64 keys."""
        if self.parity:
            return np.stack([
                affine_hash(keys, a, b, self.width) for (a, b) in self._params
            ])
        if self.family == "xxh":
            return xxh_rows(keys, self.seed, self.depth, self.width)
        return fast_rows(keys, self.seed, self.depth, self.width)

    # -- updates ---------------------------------------------------------
    def update_batch(self, keys: np.ndarray, increments: np.ndarray | float = 1.0) -> None:
        """Vectorized: for each depth row i, counts[i, h_i(k)] += inc."""
        keys = np.asarray(keys, dtype=np.int64)
        if np.isscalar(increments):
            incs = np.full(len(keys), float(increments))
        else:
            incs = np.asarray(increments, dtype=np.float64)
        rows = self._bucket_rows(keys)
        for i in range(self.depth):
            np.add.at(self.counts[i], rows[i], incs)

    def update(self, key: int, increment: float = 1.0) -> None:
        self.update_batch(np.array([key], dtype=np.int64), np.array([increment]))

    # -- queries ---------------------------------------------------------
    def point_batch(self, keys: np.ndarray) -> np.ndarray:
        """min over depth rows — the CMS point estimate, vectorized."""
        keys = np.asarray(keys, dtype=np.int64)
        rows = self._bucket_rows(keys)
        est = np.full(len(keys), np.inf)
        for i in range(self.depth):
            np.minimum(est, self.counts[i, rows[i]], out=est)
        return est

    def point(self, key: int) -> float:
        return float(self.point_batch(np.array([key], dtype=np.int64))[0])

    @staticmethod
    def cosine(a: "CountMinSketch", b: "CountMinSketch") -> float:
        """min over depth rows of row-cosine; zero-denominator rows skipped;

        NaN if every row has zero denominator — reference semantics.
        """
        if a.width != b.width or a.depth != b.depth:
            raise ValueError("CMS cosine requires equal (depth, width)")
        ca, cb = a.counts, b.counts
        num = np.einsum("ij,ij->i", ca, cb)
        den = np.sqrt(np.einsum("ij,ij->i", ca, ca)) * np.sqrt(
            np.einsum("ij,ij->i", cb, cb))
        mask = den != 0.0
        if not mask.any():
            return float("nan")
        return float(np.min(num[mask] / den[mask]))

    def inner_product(self, other: "CountMinSketch") -> float:
        """CMS inner-product estimate: min over depth rows of row dot."""
        if self.width != other.width or self.depth != other.depth:
            raise ValueError("CMS inner product requires equal (depth, width)")
        return float(np.min(np.einsum("ij,ij->i", self.counts, other.counts)))

    def l1(self) -> float:
        """||a||_1 of inserted mass (any row's sum; rows are equal by constr)."""
        return float(self.counts[0].sum())

    # -- merge -----------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width, self.seed, self.family) != (
                other.depth, other.width, other.seed, other.family):
            raise ValueError("merge requires identical CMS config")
        return CountMinSketch(self.depth, self.width, self.seed,
                              counts=self.counts + other.counts,
                              family=self.family)

    # -- serialization ---------------------------------------------------
    _FAMILY_CODE = {"fast": 0, "parity": 1, "xxh": 2}

    def serialize(self) -> bytes:
        header = struct.pack("<4sIIqB", _MAGIC, self.depth, self.width,
                             self.seed, self._FAMILY_CODE[self.family])
        return header + self.counts.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CountMinSketch":
        try:
            magic, depth, width, seed, fam = struct.unpack_from("<4sIIqB", data)
        except struct.error as e:
            raise ValueError("not a CMS blob") from e
        if magic != _MAGIC:
            raise ValueError("not a CMS blob")
        families = {v: k for k, v in cls._FAMILY_CODE.items()}
        if fam not in families:
            raise ValueError(f"unknown CMS family code {fam}")
        off = struct.calcsize("<4sIIqB")
        counts = np.frombuffer(data, dtype=np.float64, offset=off).reshape(
            depth, width).copy()
        return cls(depth=depth, width=width, seed=seed,
                   counts=counts, family=families[fam])


# ---------------------------------------------------------------------------
# Privacy/accuracy (eps, delta) auto-configuration — reference parity with
# CountMinSketchConfig.java:120-219. q is the privacy/accuracy trade-off: CMS
# collisions give plausible deniability; larger q favors more collisions.
# ---------------------------------------------------------------------------

def proba_inserted(w: int, d: int, n: int, u: int) -> float:
    """P(key truly inserted | CMS reports present).

    Reference: CountMinSketchConfig.java:170-178.
    """
    fp = (1.0 - (1.0 - 1.0 / w) ** n) ** d
    denom = n + fp * (u - n)
    return n / denom if denom > 0 else 0.0


def proba_not_exact_retrieve(w: int, d: int, n: int) -> float:
    """P(point query inflated). Reference: CountMinSketchConfig.java:190-196."""
    return (1.0 - (1.0 - 1.0 / w) ** n) ** d


def f_measure(w: int, d: int, n: int, u: int, q: float) -> float:
    """Privacy/accuracy objective. Reference: CountMinSketchConfig.java:210-219."""
    beta = 1.0 - proba_not_exact_retrieve(w, d, n)
    p = 1.0 - proba_inserted(w, d, n, u)
    denom = q * q * beta + p
    return (1.0 + 2.0) * beta * p / denom if denom > 0 else 0.0


def compute_config(n: int, u: int, q: float, max_depth: int = 25,
                   max_width: int | None = None) -> tuple[float, float]:
    """Grid-search (delta, eps) maximizing f_measure over d in [1, max_depth),

    w in [d, n] — vectorized NumPy version of the reference's per-user search
    (CountMinSketchConfig.java:120-158). Returns (delta, eps) with
    eps = e/w, delta = e^-d.
    """
    wmax = max_width or max(n, 2)
    best = (-1.0, 1, 1)
    for d in range(1, max_depth):
        ws = np.arange(max(d, 1), wmax + 1)
        fp = (1.0 - (1.0 - 1.0 / ws) ** n) ** d
        beta = 1.0 - fp
        p = 1.0 - n / (n + fp * (u - n))
        denom = q * q * beta + p
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.where(denom > 0, 3.0 * beta * p / denom, 0.0)
        j = int(np.argmax(f))
        if f[j] > best[0]:
            best = (float(f[j]), d, int(ws[j]))
    _, d, w = best
    return math.exp(-float(d)), _E / w
