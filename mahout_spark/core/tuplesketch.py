"""Tuple sketch (theta + per-key value summary) — 11th mergeable sketch.

Not in the reference (its sketch family stops at count-min); added for
the web-corpus tier where the question is not just "how many distinct
urls?" but "how many BYTES do those distinct urls carry?" — estimated
totals of a metric over a distinct-key population, including totals over
set EXPRESSIONS between corpora (bytes of the urls two crawls share).
Public algorithm: the *tuple sketch* ("array-of-doubles" sketch) of the
Apache DataSketches line — a KMV/theta bottom-k sketch (`core/theta.py`)
where every retained hash carries a value summary, combined per-key by a
fixed commutative rule (sum / min / max).

State: the k smallest DISTINCT hashes of the stream plus, aligned with
each, the combined summary of every stream row that hashed there. The
same bottom-k argument that makes theta merge-order independent extends
to the summaries in ``sum`` mode: a key below the merged knowledge
horizon theta = min over inputs of their own horizons was retained by
EVERY input that saw it (its hash is below each input's horizon), each
holding that input's full partial sum — so the merged summary is the
true total regardless of merge tree. ``min``/``max`` are idempotent and
inherit the property directly.

Estimators (D = domain, theta = own h_(k) when full else D):
    distinct:   exact n while not full, else (k-1) * D / theta
                (same convention as ThetaSketch — the k-th order
                statistic is the horizon, the k-1 below it the sample)
    total:      exact sum while not full, else
                sum(values where hash < theta) * D / theta
                (the k-1 entries strictly below the horizon are a
                uniform sample of the keys with hash < theta; each
                represents D/theta of the population)
    inter_total(other): sum of SELF's summaries over keys retained by
                both sides with hash <= joint theta, scaled D/theta —
                the inclusive joint-horizon rule `ThetaSketch.
                intersection_count` already uses; exact when both
                sides are exact.

Float exactness for the SQL oracle: with integer-valued summaries the
per-key sums are order-free, D is a power of two so ``sum * D`` is an
EXACT float64 exponent shift, and the single trailing divide is one
IEEE op both engines perform identically — the whole gate replays
bit-exact in DuckDB (ORDER BY hash LIMIT k window + the same
multiply-then-divide).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"TUS1"

#: md5_long60 hash domain (functions/hashutil.py): 60-bit
DOMAIN60 = 1 << 60

_MODES = ("sum", "min", "max")


def _empty_i() -> np.ndarray:
    return np.empty(0, dtype=np.int64)


def _empty_f() -> np.ndarray:
    return np.empty(0, dtype=np.float64)


@dataclass
class TupleSketch:
    k: int
    domain: int = DOMAIN60
    mode: str = "sum"
    #: ascending, distinct, len <= k — the k smallest hashes seen
    hashes: np.ndarray = field(default_factory=_empty_i)
    #: value summary aligned with ``hashes``
    values: np.ndarray = field(default_factory=_empty_f)

    def __post_init__(self):
        if self.mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}")
        if len(self.hashes) != len(self.values):
            raise ValueError("hashes/values length mismatch")

    @property
    def is_full(self) -> bool:
        return len(self.hashes) >= self.k

    @property
    def theta(self) -> int:
        return int(self.hashes[-1]) if self.is_full else self.domain

    # -- ingest / merge ---------------------------------------------------

    def _combine_dups(self, h: np.ndarray,
                      v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Collapse duplicate hashes within (h, v) per the mode."""
        uh, inv = np.unique(h, return_inverse=True)
        if self.mode == "sum":
            uv = np.zeros(len(uh))
            np.add.at(uv, inv, v)
        else:
            fill = np.inf if self.mode == "min" else -np.inf
            uv = np.full(len(uh), fill)
            getattr(np, f"{self.mode}imum").at(uv, inv, v)
        return uh, uv

    def update_batch(self, hash_values: np.ndarray,
                     values: np.ndarray) -> None:
        h = np.asarray(hash_values, dtype=np.int64)
        v = np.asarray(values, dtype=np.float64)
        if len(h) != len(v):
            raise ValueError("hashes/values length mismatch")
        if len(h) == 0:
            return
        if np.any((h < 0) | (h >= self.domain)):
            raise ValueError("hash values outside [0, domain)")
        uh, uv = self._combine_dups(np.concatenate([self.hashes, h]),
                                    np.concatenate([self.values, v]))
        self.hashes, self.values = uh[:self.k], uv[:self.k]

    def merge(self, other: "TupleSketch") -> "TupleSketch":
        if (self.k, self.domain, self.mode) != (other.k, other.domain,
                                                other.mode):
            raise ValueError("merge requires identical tuple-sketch config")
        uh, uv = self._combine_dups(
            np.concatenate([self.hashes, other.hashes]),
            np.concatenate([self.values, other.values]))
        return TupleSketch(self.k, self.domain, self.mode,
                           uh[:self.k], uv[:self.k])

    # -- estimators -------------------------------------------------------

    def estimate(self) -> float:
        """Distinct-key estimate; exact while not full."""
        if not self.is_full:
            return float(len(self.hashes))
        return float(self.k - 1) * float(self.domain) / float(self.hashes[-1])

    def total_estimate(self) -> float:
        """Estimated total of the summaries over ALL distinct keys
        (sum mode); exact while not full."""
        if not self.is_full:
            return float(self.values.sum())
        below = self.values[self.hashes < self.theta]
        return float(below.sum()) * float(self.domain) / float(self.theta)

    def intersection_total_estimate(self, other: "TupleSketch") -> float:
        """Estimated total of SELF's summaries over keys present in
        BOTH streams (inclusive joint-horizon rule, matching
        ThetaSketch.intersection_count)."""
        if self.domain != other.domain:
            raise ValueError("intersection requires identical hash domain")
        theta = min(self.theta, other.theta)
        mask = np.isin(self.hashes, other.hashes) & (self.hashes <= theta)
        s = float(self.values[mask].sum())
        if theta >= self.domain:        # both sides exact
            return s
        return s * float(self.domain) / float(theta)

    # -- serialization ----------------------------------------------------

    def serialize(self) -> bytes:
        header = struct.pack("<4sIQBI", _MAGIC, self.k, self.domain,
                             _MODES.index(self.mode), len(self.hashes))
        return (header + np.ascontiguousarray(self.hashes).tobytes()
                + np.ascontiguousarray(self.values).tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "TupleSketch":
        data = bytes(data)
        if len(data) < 21 or data[:4] != _MAGIC:
            raise ValueError("not a TupleSketch blob")
        _, k, domain, mode_i, n = struct.unpack("<4sIQBI", data[:21])
        if len(data) != 21 + 16 * n or mode_i >= len(_MODES):
            raise ValueError("truncated or corrupt TupleSketch blob")
        hashes = np.frombuffer(data[21:21 + 8 * n], dtype=np.int64).copy()
        values = np.frombuffer(data[21 + 8 * n:], dtype=np.float64).copy()
        return cls(k=k, domain=domain, mode=_MODES[mode_i],
                   hashes=hashes, values=values)
