"""t-digest quantile sketch (merging variant, Dunning & Ertl's published

algorithm). Reference anchor: OnlineSummarizer wraps
``TDigest.createDigest(100.0)`` for count/mean/sd/quartiles
(math/.../stats/OnlineSummarizer.java:43-92); compression defaults to 100
to match. The reference uses the t-digest library; we implement the merging
t-digest from the paper: buffer points, sort with existing centroids, and
merge adjacent centroids while the k-scale budget allows.

Merge across sketches = concatenate centroids + one compaction pass —
associative up to the documented quantile error (not bit-exact; property
tests bound error vs exact percentiles).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"TDG1"
_BUFFER = 512


def _k1(q: np.ndarray, compression: float) -> np.ndarray:
    q = np.clip(q, 1e-15, 1 - 1e-15)
    return compression / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)


def _k1_scalar(q: float, compression: float) -> float:
    """Scalar twin of ``_k1`` for the sequential compaction loop.

    Same clip bounds and operation order, without the per-element ndarray
    allocation that dominated the compaction loop (guide §1.2 per-task
    work: the t-digest build was the quantile bench's hottest kernel).
    libm's ``asin`` can differ from NumPy's vectorized ``arcsin`` in the
    last ulp on some inputs; ``_k1`` only gates centroid-absorb decisions
    in an algorithm whose results are bounded by rank error, and every
    gate checks the estimate against an exact rank WINDOW (never raw
    centroid values), so a 1-ulp k-scale difference is within contract.
    """
    q = min(max(q, 1e-15), 1 - 1e-15)
    return compression / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


@dataclass
class TDigest:
    compression: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.empty(0), repr=False)
    weights: np.ndarray = field(default_factory=lambda: np.empty(0), repr=False)
    _buf: list = field(default_factory=list, repr=False)
    _min: float = np.inf
    _max: float = -np.inf

    # -- updates ---------------------------------------------------------
    def update_batch(self, values: np.ndarray,
                     weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(values)
        values = values[mask]
        if len(values) == 0:
            return
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        # NaN rows must drop their weights too, or _compress pairs the
        # shortened value array with a full-length weight array.
        w = (np.ones(len(values)) if weights is None
             else np.asarray(weights, dtype=np.float64)[mask])
        self._buf.append((values, w))
        if sum(len(v) for v, _ in self._buf) >= _BUFFER:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            vals = np.concatenate([self.means] + [v for v, _ in self._buf])
            wts = np.concatenate([self.weights] + [w for _, w in self._buf])
            self._buf = []
        else:
            vals, wts = self.means, self.weights
        if len(vals) == 0:
            return
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        total = wts.sum()
        # plain-float locals in the sequential loop: ndarray round-trips
        # per element were ~10x the arithmetic (same values, same branches)
        vals_l, wts_l = vals.tolist(), wts.tolist()
        out_means, out_weights = [], []
        cur_mean, cur_w = vals_l[0], wts_l[0]
        w_so_far = 0.0
        k_lim = _k1_scalar(0.0, self.compression) + 1.0
        for i in range(1, len(vals_l)):
            wi = wts_l[i]
            proposed = (w_so_far + cur_w + wi) / total
            if _k1_scalar(proposed, self.compression) <= k_lim:
                # absorb into current centroid (weighted mean)
                nw = cur_w + wi
                cur_mean += (vals_l[i] - cur_mean) * wi / nw
                cur_w = nw
            else:
                out_means.append(cur_mean)
                out_weights.append(cur_w)
                w_so_far += cur_w
                k_lim = _k1_scalar(w_so_far / total,
                                   self.compression) + 1.0
                cur_mean, cur_w = vals_l[i], wts_l[i]
        out_means.append(cur_mean)
        out_weights.append(cur_w)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    # -- queries ---------------------------------------------------------
    @property
    def count(self) -> float:
        return float(self.weights.sum() + sum(w.sum() for _, w in self._buf))

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # centroid i sits at cumulative weight cum_i - w_i/2
        cum = np.cumsum(self.weights)
        centers = cum - self.weights / 2.0
        if target <= centers[0]:
            return float(self._min + (self.means[0] - self._min)
                         * max(target, 0) / max(centers[0], 1e-300))
        if target >= centers[-1]:
            span = total - centers[-1]
            frac = (target - centers[-1]) / span if span > 0 else 1.0
            return float(self.means[-1] + (self._max - self.means[-1])
                         * min(frac, 1.0))
        j = int(np.searchsorted(centers, target))
        lo, hi = centers[j - 1], centers[j]
        frac = (target - lo) / (hi - lo) if hi > lo else 0.0
        return float(self.means[j - 1] + frac * (self.means[j] - self.means[j - 1]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def mean(self) -> float:
        self._compress()
        total = self.weights.sum()
        return float((self.means * self.weights).sum() / total) if total else float("nan")

    # -- merge -----------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if self.compression != other.compression:
            raise ValueError("merge requires identical compression")
        self._compress()
        other._compress()
        out = TDigest(self.compression)
        out.means = np.concatenate([self.means, other.means])
        out.weights = np.concatenate([self.weights, other.weights])
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        out._compress()
        return out

    # -- serialization ---------------------------------------------------
    def serialize(self) -> bytes:
        self._compress()
        n = len(self.means)
        header = struct.pack("<4sdIdd", _MAGIC, self.compression, n,
                             self._min, self._max)
        return header + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "TDigest":
        try:
            magic, compression, n, mn, mx = struct.unpack_from("<4sdIdd", data)
        except struct.error as e:
            raise ValueError("not a t-digest blob") from e
        if magic != _MAGIC:
            raise ValueError("not a t-digest blob")
        off = struct.calcsize("<4sdIdd")
        means = np.frombuffer(data, dtype=np.float64, offset=off, count=n).copy()
        weights = np.frombuffer(data, dtype=np.float64,
                                offset=off + 8 * n, count=n).copy()
        out = cls(compression=compression, means=means, weights=weights)
        out._min, out._max = mn, mx
        return out


@dataclass
class OnlineSummarizer:
    """Reference-parity façade: count/mean/sd/quartiles over a t-digest,

    mirroring math/.../stats/OnlineSummarizer.java:43-92 (which wraps
    TDigest.createDigest(100.0) plus streaming mean/variance).
    """

    digest: TDigest = field(default_factory=lambda: TDigest(100.0))
    n: int = 0
    _mean: float = 0.0
    _m2: float = 0.0

    def add_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        self.digest.update_batch(values)
        for x in values:  # Welford; small driver-side use
            self.n += 1
            d = x - self._mean
            self._mean += d / self.n
            self._m2 += d * (x - self._mean)

    @property
    def count(self) -> int:
        return self.n

    def mean(self) -> float:
        return self._mean

    def sd(self) -> float:
        return float(np.sqrt(self._m2 / (self.n - 1))) if self.n > 1 else 0.0

    def median(self) -> float:
        return self.digest.quantile(0.5)

    def quartile(self, i: int) -> float:
        return self.digest.quantile([0.0, 0.25, 0.5, 0.75, 1.0][i])
