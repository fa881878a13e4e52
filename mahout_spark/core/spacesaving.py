"""Misra-Gries heavy-hitters summary — the sixth mergeable sketch.

Not in the reference (its sketch family stops at count-min); added for
the web-corpus tier where "which tokens/domains dominate" is a
first-class query. Public algorithm: Misra & Gries 1982 counters with
the mergeable-summaries reduction of Agarwal, Cormode, Huang, Phillips,
Wei, Yi (PODS'12): merge = combine counters, subtract the (k+1)-th
largest count from everything, drop the non-positive remainder.

Guarantees (with N = total ingested weight, preserved under arbitrary
merge trees):

    point(x) <= true(x)                      (never overestimates)
    point(x) >= true(x) - N / (k + 1)        (bounded undercount)

so every item with true weight > N/(k+1) survives with a positive
counter — the candidate-completeness property
``sketch.queries.heavy_hitters`` builds its exact-verify join on.

Counter VALUES depend on ingest/merge order (inherent to MG — unlike
the linear CMS); the bounds above do not. Treat the counters as
candidates + bounds, never as exact counts: the production pattern is
candidates from the sketch, one exact-count verify join behind them.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"MGS1"


@dataclass
class MisraGries:
    k: int
    counters: dict = field(default_factory=dict)   # int key -> float weight
    n_total: float = 0.0                           # exact ingested weight

    @classmethod
    def from_error_bound(cls, eps: float) -> "MisraGries":
        """Undercount bounded by eps * N  (k = ceil(1/eps) - 1)."""
        import math

        return cls(k=max(1, int(math.ceil(1.0 / eps)) - 1))

    @property
    def eps(self) -> float:
        return 1.0 / (self.k + 1)

    def update_batch(self, keys: np.ndarray, weights) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        if np.isscalar(weights) or weights is None:
            weights = np.full(len(keys), 1.0 if weights is None else weights)
        weights = np.asarray(weights, dtype=np.float64)
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uk))
        np.add.at(sums, inv, weights)
        c = self.counters
        for key, w in zip(uk.tolist(), sums.tolist()):
            c[key] = c.get(key, 0.0) + w
        self.n_total += float(weights.sum())
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        vals = np.fromiter(self.counters.values(), dtype=np.float64)
        # (k+1)-th largest value; subtract it everywhere, drop <= 0
        m = np.partition(vals, len(vals) - self.k - 1)[len(vals) - self.k - 1]
        self.counters = {key: v - m for key, v in self.counters.items()
                         if v - m > 0.0}

    def point(self, key: int) -> float:
        """Underestimate: true - eps*N <= point <= true."""
        return self.counters.get(int(key), 0.0)

    def point_batch(self, keys: np.ndarray) -> np.ndarray:
        return np.array([self.counters.get(int(key), 0.0) for key in keys])

    def candidates(self, min_true_weight: float) -> list[int]:
        """Every key whose TRUE weight exceeds ``min_true_weight`` is in
        this list (completeness needs min_true_weight > eps * n_total —
        enforced)."""
        slack = self.n_total / (self.k + 1)
        if min_true_weight <= slack:
            raise ValueError(
                f"threshold {min_true_weight} not above the sketch's "
                f"undercount slack {slack}; raise k or the threshold")
        cut = min_true_weight - slack
        return [key for key, v in self.counters.items() if v > cut]

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("merge requires identical MG config")
        out = MisraGries(self.k, dict(self.counters),
                         self.n_total + other.n_total)
        c = out.counters
        for key, v in other.counters.items():
            c[key] = c.get(key, 0.0) + v
        out._shrink()
        return out

    def serialize(self) -> bytes:
        head = struct.pack("<4sId", _MAGIC, self.k, self.n_total)
        n = len(self.counters)
        keys = np.fromiter(self.counters.keys(), dtype=np.int64, count=n)
        vals = np.fromiter(self.counters.values(), dtype=np.float64, count=n)
        return head + struct.pack("<I", n) + keys.tobytes() + vals.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "MisraGries":
        try:
            magic, k, n_total = struct.unpack_from("<4sId", data)
            off = struct.calcsize("<4sId")
            (n,) = struct.unpack_from("<I", data, off)
            off += 4
        except struct.error as e:
            raise ValueError("not a MisraGries blob") from e
        if magic != _MAGIC:
            raise ValueError("not a MisraGries blob")
        keys = np.frombuffer(data, dtype=np.int64, count=n, offset=off)
        vals = np.frombuffer(data, dtype=np.float64, count=n,
                             offset=off + 8 * n)
        return cls(k=k, counters=dict(zip(keys.tolist(), vals.tolist())),
                   n_total=n_total)
