"""KMV / Theta bottom-k distinct sketch — the seventh mergeable sketch.

Not in the reference (its sketch family stops at count-min); added for
the web-corpus tier where SET analytics are first-class: estimated
distinct counts plus union / intersection / Jaccard BETWEEN corpora
(crawl-over-crawl overlap, per-language vocabulary overlap) — the one
question HLL alone can't answer without error-amplifying
inclusion-exclusion. Public algorithm: the k-minimum-values estimator
of Beyer, Haas, Reinwald, Sismanis, Gemulla (SIGMOD'07) with the theta
intersection rule of the DataSketches line (Dasgupta et al.).

The sketch stores the k smallest DISTINCT hash values of a stream of
uniform hashes in [0, DOMAIN). Everything is a set operation on
integers, so unlike Misra-Gries the state is completely
ingest/merge-order INDEPENDENT — any partitioning, any merge tree,
same bytes — and a SQL oracle can replay it with ORDER BY hash LIMIT k.

Estimators (D = DOMAIN, h_(k) = largest retained hash when full):
    distinct:      n < k retained -> exact n;  else (k-1) * D / h_(k)
    union A,B:     bottom-k' of (set_A ∪ set_B), k' = min(k_A, k_B)
                   (== bottom-k' of A ∪ B: any bottom-k' hash of the
                   union is a bottom-k' hash of one side)
    intersection:  theta = min over both sketches of their knowledge
                   horizon (D if not full else h_(k)); every distinct
                   value hashing <= theta is KNOWN to both sides, so
                   |A∩B| ≈ |{h in set_A ∩ set_B : h <= theta}| * D / theta
    jaccard:       intersection est / union est (derived ratio)

Hashing happens OUTSIDE the sketch (ingest is pre-hashed int64), so the
JVM does it: md5_long60 for the DuckDB-replayable parity family, or
xxhash64 & mask for the fast path — mirroring the CMS family split.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"THS1"

#: md5_long60 hash domain (functions/hashutil.py): 60-bit
DOMAIN60 = 1 << 60


def _empty() -> np.ndarray:
    return np.empty(0, dtype=np.int64)


@dataclass
class ThetaSketch:
    k: int
    domain: int = DOMAIN60
    #: ascending, distinct, len <= k — the k smallest hashes seen
    hashes: np.ndarray = field(default_factory=_empty)

    @property
    def is_full(self) -> bool:
        return len(self.hashes) >= self.k

    @property
    def theta(self) -> int:
        """Knowledge horizon: every distinct stream value with hash <=
        theta is retained (bottom-k keeps everything below the k-th
        smallest)."""
        return int(self.hashes[-1]) if self.is_full else self.domain

    def update_batch(self, hash_values: np.ndarray) -> None:
        h = np.asarray(hash_values, dtype=np.int64)
        if len(h) == 0:
            return
        if np.any((h < 0) | (h >= self.domain)):
            raise ValueError("hash values outside [0, domain)")
        merged = np.union1d(self.hashes, h)   # sorted + distinct
        self.hashes = merged[:self.k]

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if (self.k, self.domain) != (other.k, other.domain):
            raise ValueError("merge requires identical theta config")
        merged = np.union1d(self.hashes, other.hashes)
        return ThetaSketch(self.k, self.domain, merged[:self.k])

    # -- estimators -------------------------------------------------------

    def estimate(self) -> float:
        """Distinct-count estimate; exact while not full."""
        if not self.is_full:
            return float(len(self.hashes))
        return (self.k - 1) * float(self.domain) / float(self.hashes[-1])

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.domain != other.domain:
            raise ValueError("union requires identical hash domain")
        k = min(self.k, other.k)
        merged = np.union1d(self.hashes, other.hashes)
        return ThetaSketch(k, self.domain, merged[:k])

    def intersection_count(self, other: "ThetaSketch") -> tuple[int, int]:
        """(rho, theta): rho = retained common hashes <= the joint
        knowledge horizon theta = min(theta_a, theta_b)."""
        if self.domain != other.domain:
            raise ValueError("intersection requires identical hash domain")
        theta = min(self.theta, other.theta)
        common = np.intersect1d(self.hashes, other.hashes)
        return int(np.count_nonzero(common <= theta)), theta

    def intersection_estimate(self, other: "ThetaSketch") -> float:
        rho, theta = self.intersection_count(other)
        if theta >= self.domain:        # both sides exact
            return float(rho)
        return rho * float(self.domain) / float(theta)

    def jaccard(self, other: "ThetaSketch") -> float:
        u = self.union(other).estimate()
        return 0.0 if u == 0.0 else self.intersection_estimate(other) / u

    def a_not_b_count(self, other: "ThetaSketch") -> tuple[int, int]:
        """(rho, theta): rho = retained hashes of self under the joint

        knowledge horizon that other does NOT contain. For h <= theta
        both sides know membership exactly, so this samples |A \\ B| —
        the DataSketches a-not-b rule. Partition identity:
        intersection_count.rho + a_not_b_count.rho == |{h in A: h <=
        theta}| (tested).
        """
        if self.domain != other.domain:
            raise ValueError("a_not_b requires identical hash domain")
        theta = min(self.theta, other.theta)
        mine = self.hashes[self.hashes <= theta]
        only = np.setdiff1d(mine, other.hashes)
        return int(len(only)), theta

    def a_not_b_estimate(self, other: "ThetaSketch") -> float:
        rho, theta = self.a_not_b_count(other)
        if theta >= self.domain:        # both sides exact
            return float(rho)
        return rho * float(self.domain) / float(theta)

    # -- serialization ----------------------------------------------------

    def serialize(self) -> bytes:
        header = struct.pack("<4sIQI", _MAGIC, self.k, self.domain,
                             len(self.hashes))
        return header + np.ascontiguousarray(self.hashes).tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "ThetaSketch":
        data = bytes(data)
        if len(data) < 20 or data[:4] != _MAGIC:
            raise ValueError("not a ThetaSketch blob")
        _, k, domain, n = struct.unpack("<4sIQI", data[:20])
        hashes = np.frombuffer(data[20:20 + 8 * n], dtype=np.int64).copy()
        if len(hashes) != n:
            raise ValueError("truncated ThetaSketch blob")
        return cls(k=k, domain=domain, hashes=hashes)
