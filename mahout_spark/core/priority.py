"""Priority sampling — mergeable weighted sample, the tenth mergeable sketch.

Not in the reference (its sketch family stops at count-min); added for the
web-corpus tier where "how much of X is there?" must be answerable from a
bounded sample of an already-aggregated weight table: estimate per-domain /
per-language byte totals, shard-size planning, and join-input costing from
k retained rows instead of a rescan. Public algorithm: *priority sampling*
of Duffield, Lund, Thorup (JACM 54(6), 2007; "Priority sampling for
estimation of arbitrary subset sums") — the weighted sibling of the
bottom-k/theta sketch this repo already ships (`core/theta.py`), and the
same estimator family as DataSketches' VarOpt line.

Each item i carries a weight w_i > 0 and a uniform u_i in [1, DOMAIN]
derived deterministically from the item's key (md5_long60(key) + 1 — the
repo's no-rand() convention: retries, reruns and both engines agree by
construction). DLT define the priority over a unit uniform; here that is
q_i = w_i / (u_i / DOMAIN) = (w_i * DOMAIN) / u_i — and since DOMAIN is a
power of two the scaling is an exact float64 exponent shift, so the
UN-normalized ratio w_i / u_i induces the identical order (including
ties) and is what the retention comparisons use. The sketch retains the
k+1 highest-priority items; the *sample* is the top k, and the threshold
tau is the (k+1)-th NORMALIZED priority (weight-scale, so it can exceed
sampled weights). The Horvitz-Thompson-style estimator

    w_hat_i = max(w_i, tau)        for sampled i, else 0

is unbiased for every item simultaneously (DLT'07 Theorem 1 — for truly
random u), so any subset sum is estimated by summing w_hat over the
sampled members: Sum_{i in S} w_i  ~=  Sum_{i in sample ∩ S} max(w_i, tau).
With fewer than k+1 items retained the sample is the whole input and every
subset sum is EXACT (tau = 0).

Mergeability: for a stream of DISTINCT keys the retained set is "top-(k+1)
by (q desc, u asc)", a pure order statistic of the union — any merge tree,
any partitioning, same state (exactly the theta argument with the order
reversed and weight-tilted). Duplicate keys across merge inputs share the
same u (u is a function of the key), so merge sums their weights first;
this is exact as long as no input sketch had already evicted one of the
duplicates — the distributed builder (`sketch/agg.sketch_by_key`,
preagg='sum') guarantees global per-key pre-aggregation, making the
contract unconditional on that path.

Everything the sketch retains is (int64 u, float64 w), so a SQL oracle
replays the entire distributed build with one window:
ROW_NUMBER() OVER (ORDER BY w / u DESC, u ASC) <= k, with
tau = (w * DOMAIN) / u at rank k+1 — and every float (q, tau, w_hat)
lands bit-exact (both engines perform the same IEEE double
multiply-then-divide; ties in q break on u).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"PSK1"

#: md5_long60 domain, shifted by +1 so u is never 0: u in [1, 2^60]
DOMAIN60 = 1 << 60


def _empty_i() -> np.ndarray:
    return np.empty(0, dtype=np.int64)


def _empty_f() -> np.ndarray:
    return np.empty(0, dtype=np.float64)


@dataclass
class PrioritySample:
    """Top-(k+1)-by-priority retained set; sample = top k, tau = (k+1)-th.

    Canonical state ordering: u ascending (set-like, merge-order free);
    priority order is re-derived on demand.
    """

    k: int
    domain: int = DOMAIN60
    #: ascending by u, distinct, len <= k+1
    u: np.ndarray = field(default_factory=_empty_i)
    w: np.ndarray = field(default_factory=_empty_f)

    # -- building ----------------------------------------------------------

    def _truncate(self, u: np.ndarray, w: np.ndarray) -> None:
        """Keep top-(k+1) by (q desc, u asc); store sorted by u."""
        if len(u) > self.k + 1:
            q = w / u            # float64; u > 2^53 rounds identically
            # np.lexsort: LAST key is primary -> (-q) primary, u tie-break
            order = np.lexsort((u, -q))[: self.k + 1]
            u, w = u[order], w[order]
        order = np.argsort(u)
        self.u, self.w = u[order], w[order]

    def update_batch(self, u_values: np.ndarray, weights: np.ndarray) -> None:
        """Add items; duplicate u (same key) sums weights (exact only if
        the duplicate's twin was never evicted — the distributed builder
        pre-aggregates per key so this never triggers there)."""
        un = np.asarray(u_values, dtype=np.int64)
        wn = np.asarray(weights, dtype=np.float64)
        if len(un) == 0:
            return
        if np.any((un < 1) | (un > self.domain)):
            raise ValueError("u values outside [1, domain]")
        if np.any(wn <= 0):
            raise ValueError("priority sampling needs positive weights")
        allu = np.concatenate([self.u, un])
        allw = np.concatenate([self.w, wn])
        uu, inv = np.unique(allu, return_inverse=True)
        ww = np.zeros(len(uu), dtype=np.float64)
        np.add.at(ww, inv, allw)
        self._truncate(uu, ww)

    def merge(self, other: "PrioritySample") -> "PrioritySample":
        if (self.k, self.domain) != (other.k, other.domain):
            raise ValueError("merge requires identical priority config")
        out = PrioritySample(self.k, self.domain,
                             self.u.copy(), self.w.copy())
        if len(other.u):
            out.update_batch(other.u, other.w)
        return out

    # -- estimators --------------------------------------------------------

    @property
    def is_full(self) -> bool:
        return len(self.u) >= self.k + 1

    def _priority_order(self) -> np.ndarray:
        q = self.w / self.u
        return np.lexsort((self.u, -q))

    def tau(self) -> float:
        """(k+1)-th normalized priority (weight scale) — 0.0 while the
        sample is still exhaustive/exact."""
        if not self.is_full:
            return 0.0
        order = self._priority_order()
        i = order[self.k]
        # multiply FIRST (exact: domain is a power of two), then the one
        # IEEE division — the pinned cross-engine operation order
        return float((self.w[i] * self.domain) / self.u[i])

    def sample(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(u, w, w_hat) of the top-k sample, in priority order."""
        order = self._priority_order()[: self.k]
        u, w = self.u[order], self.w[order]
        return u, w, np.maximum(w, self.tau())

    def estimate_total(self) -> float:
        """Unbiased estimate of the total weight (sequential fold in
        u-ascending order — a pinned summation order, matching the
        repo's cross-engine float-fold convention)."""
        u, w, w_hat = self.sample()
        order = np.argsort(u)
        total = 0.0
        for v in w_hat[order]:
            total += float(v)
        return total

    # -- serialization -----------------------------------------------------

    def serialize(self) -> bytes:
        header = struct.pack("<4sIQI", _MAGIC, self.k, self.domain,
                             len(self.u))
        return (header + np.ascontiguousarray(self.u).tobytes()
                + np.ascontiguousarray(self.w).tobytes())

    @classmethod
    def deserialize(cls, data: bytes) -> "PrioritySample":
        data = bytes(data)
        if len(data) < 20 or data[:4] != _MAGIC:
            raise ValueError("not a PrioritySample blob")
        _, k, domain, n = struct.unpack("<4sIQI", data[:20])
        u = np.frombuffer(data[20:20 + 8 * n], dtype=np.int64).copy()
        w = np.frombuffer(data[20 + 8 * n:20 + 16 * n],
                          dtype=np.float64).copy()
        if len(u) != n or len(w) != n:
            raise ValueError("truncated PrioritySample blob")
        return cls(k=k, domain=domain, u=u, w=w)
