"""KLL quantile sketch (Karnin–Lang–Liberty 2016; see also KLL± VLDB 2021

in PAPERS.md). The reference has no KLL — quantile duty there is
OnlineSummarizer/t-digest — KLL is a sibling mergeable quantile sketch
mandated by the north rule (SURVEY.md §2.4).

Structure: a stack of levels; items at level l carry weight 2^l. Level
capacities shrink geometrically (c = 2/3) below the top. Compaction sorts a
level and promotes every other item (offset chosen by a deterministic
seeded counter — retries reproduce the same sketch, per the engine-wide
no-rand() rule).

Exact mode: while nothing has ever been compacted, level 0 holds every item
and ``quantile`` returns the EXACT order statistic with the 1-based
rank-ceil convention (element at rank ceil(q*n)) — deliberately identical
to DuckDB's ``quantile_disc`` so small-scale oracle queries hash-match.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.hashing import splitmix64

_MAGIC = b"KLL1"
_C = 2.0 / 3.0


def _capacity(k: int, depth_from_top: int) -> int:
    return max(2, int(np.ceil(k * (_C ** depth_from_top))))


@dataclass
class KLLSketch:
    k: int = 200
    seed: int = 1
    levels: list = field(default_factory=lambda: [np.empty(0)], repr=False)
    n: int = 0
    _compactions: int = 0

    # -- updates ---------------------------------------------------------
    def update_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.n += len(values)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compact_if_needed()

    def _coin(self) -> int:
        """Deterministic 0/1 from (seed, compaction counter)."""
        self._compactions += 1
        h = splitmix64(np.array([self.seed * 0x9E3779B9 + self._compactions],
                                dtype=np.uint64))[0]
        return int(h & np.uint64(1))

    def _compact_if_needed(self) -> None:
        while True:
            H = len(self.levels)
            over = None
            for l in range(H):
                if len(self.levels[l]) > _capacity(self.k, H - 1 - l):
                    over = l
                    break
            if over is None:
                return
            lvl = np.sort(self.levels[over], kind="stable")
            off = self._coin()
            promoted = lvl[off::2]
            self.levels[over] = np.empty(0)
            if over + 1 >= len(self.levels):
                self.levels.append(np.empty(0))
            self.levels[over + 1] = np.concatenate(
                [self.levels[over + 1], promoted])

    # -- queries ---------------------------------------------------------
    @property
    def is_exact(self) -> bool:
        return len(self.levels) == 1

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = []
        wts = []
        for l, lvl in enumerate(self.levels):
            if len(lvl):
                vals.append(lvl)
                wts.append(np.full(len(lvl), float(1 << l)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Smallest value whose cumulative weight >= ceil(q * N) — the

        rank-ceil discrete quantile (matches DuckDB quantile_disc; exact
        while uncompacted).
        """
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        total = w.sum()
        rank = max(1.0, np.ceil(q * total))
        cum = np.cumsum(w)
        j = int(np.searchsorted(cum, rank))
        return float(v[min(j, len(v) - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if len(v) == 0:
            return float("nan")
        return float(w[v <= x].sum() / w.sum())

    # -- merge -----------------------------------------------------------
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("merge requires identical k")
        out = KLLSketch(self.k, self.seed)
        H = max(len(self.levels), len(other.levels))
        out.levels = []
        for l in range(H):
            a = self.levels[l] if l < len(self.levels) else np.empty(0)
            b = other.levels[l] if l < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]))
        out.n = self.n + other.n
        out._compactions = self._compactions + other._compactions
        out._compact_if_needed()
        return out

    # -- serialization ---------------------------------------------------
    def serialize(self) -> bytes:
        header = struct.pack("<4sIqqII", _MAGIC, self.k, self.seed, self.n,
                             self._compactions, len(self.levels))
        parts = [header]
        for lvl in self.levels:
            parts.append(struct.pack("<I", len(lvl)))
            parts.append(np.asarray(lvl, dtype=np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, data: bytes) -> "KLLSketch":
        try:
            magic, k, seed, n, comps, nlev = struct.unpack_from("<4sIqqII", data)
        except struct.error as e:
            raise ValueError("not a KLL blob") from e
        if magic != _MAGIC:
            raise ValueError("not a KLL blob")
        off = struct.calcsize("<4sIqqII")
        levels = []
        for _ in range(nlev):
            (cnt,) = struct.unpack_from("<I", data, off)
            off += 4
            levels.append(np.frombuffer(data, dtype=np.float64, offset=off,
                                        count=cnt).copy())
            off += 8 * cnt
        out = cls(k=k, seed=seed, levels=levels, n=n)
        out._compactions = comps
        return out
