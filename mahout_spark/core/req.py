"""REQ sketch: RELATIVE-error streaming quantiles (HRA + LRA modes).

Cormode, Karnin, Liberty, Thaler, Veselý — "Relative Error Streaming
Quantiles" (PODS 2021; the Apache DataSketches ``req_sketch``). KLL and
t-digest (core/kll.py, core/tdigest.py) bound the ADDITIVE rank error
eps·n, which is useless exactly where web-corpus monitoring looks:
p99/p999/max-ish tail latencies, document-length outliers, head-domain
sizes. REQ bounds the error RELATIVE to the distance from the accurate
end — in high-rank-accuracy (HRA) mode the estimate of a rank r is off
by O(eps · (n − r)), so the p999 of 10^12 rows is as sharp as the p50;
``hra=False`` (LRA) mirrors the protection to LOW ranks — error
O(eps · r) — for minima / p001 floors.

Mechanics (the paper's relative-compactor scheme, same simplification
discipline as core/kll.py — which pins a fixed 2/3 capacity decay):

- a stack of compactors; items at level h carry weight 2^h;
- each compactor holds ``num_sections`` sections of ``section_size``
  items (capacity = 2·num_sections·section_size);
- on overflow the buffer is sorted and only its INACCURATE side is
  compacted (every other item promoted, offset by a deterministic
  splitmix coin — the engine-wide no-rand() rule) while
  ``num_sections·section_size`` items on the accurate end (top for HRA,
  bottom for LRA) are PROTECTED in place: values near the accurate end
  survive uncompacted longer, which is exactly where the relative
  guarantee comes from;
- the number of low sections compacted follows the trailing-ones
  schedule of the compaction counter (1, 2, 1, 3, 1, 2, 1, 4, …), and
  after 2^num_sections compactions the sections double and halve in
  size — older levels protect a finer high-end slice;
- merge = level-wise concatenation + re-compaction (associative up to
  the documented bound, like KLL; the schedule state advances by the
  larger operand).

Exact while nothing has compacted (quantile = rank-ceil order statistic,
matching DuckDB ``quantile_disc`` — gate-friendly, like KLL's exact
mode). The empirical HRA bound (rank error ≤ eps_hat·(n − r + 1) with
eps_hat pinned in tests) backs the ``req_rank_bound`` gate's exact
rank windows.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.hashing import splitmix64

_MAGIC = b"REQ2"
_MAGIC_V1 = b"REQ1"  # pre-LRA layout (no hra field; implicitly HRA)
_MIN_SEC = 4


def _trailing_ones(x: int) -> int:
    t = 0
    while x & 1:
        t += 1
        x >>= 1
    return t


@dataclass
class _Compactor:
    section_size: int
    num_sections: int = 3
    state: int = 0  # compaction counter (drives the section schedule)
    hra: bool = True
    buf: np.ndarray = field(default_factory=lambda: np.empty(0),
                            repr=False)

    @property
    def capacity(self) -> int:
        return 2 * self.num_sections * self.section_size

    def compact(self, coin: int) -> np.ndarray:
        """Sort, compact the schedule-chosen region on the INACCURATE
        side, return the promoted items. Only ``secs·section_size``
        items leave per compaction (secs follows the trailing-ones
        schedule) and ``num_sections·section_size`` items on the
        accurate end (top for HRA, bottom for LRA) are never touched —
        repeated calls drain an over-full buffer while the schedule
        state keeps advancing."""
        self.buf = np.sort(self.buf, kind="stable")
        secs = min(_trailing_ones(self.state) + 1, self.num_sections)
        protect = self.num_sections * self.section_size
        compactable = max(len(self.buf) - protect, 0)
        c_len = min(max(secs * self.section_size, 2), compactable)
        if self.hra:
            region, kept = self.buf[:c_len], self.buf[c_len:]
        else:
            cut = len(self.buf) - c_len
            kept, region = self.buf[:cut], self.buf[cut:]
        promoted = region[coin::2]
        self.buf = kept
        self.state += 1
        if self.state >= (1 << self.num_sections) \
                and self.section_size > _MIN_SEC:
            self.num_sections *= 2
            self.section_size = max(_MIN_SEC, self.section_size // 2)
        return promoted


@dataclass
class REQSketch:
    """Relative-error quantile sketch over float64 values.

    ``hra=True`` (default) protects HIGH ranks (p99/p999 tails);
    ``hra=False`` is the LRA variant protecting LOW ranks (minima /
    p001 floors) — the same DataSketches mode switch."""

    k: int = 32  # initial section size (even, >= 4)
    seed: int = 1
    levels: list = field(default_factory=list, repr=False)
    n: int = 0
    _compactions: int = 0
    # kept LAST so the pre-LRA positional signature (k, seed, levels, n)
    # still binds correctly; pass as a keyword
    hra: bool = True

    def __post_init__(self):
        if self.k < _MIN_SEC or self.k % 2:
            raise ValueError("k must be an even integer >= 4")
        if not self.levels:
            self.levels = [_Compactor(self.k, hra=self.hra)]

    # -- updates ---------------------------------------------------------
    def update_batch(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.n += len(values)
        # feed in capacity-sized chunks so every compaction sees a
        # near-capacity buffer (a mega-batch dumped whole would be
        # drained by one schedule step per capacity excess, distorting
        # the section discipline the guarantee rests on)
        i = 0
        while i < len(values):
            c0 = self.levels[0]
            room = max(c0.capacity + 1 - len(c0.buf), 1)
            c0.buf = np.concatenate([c0.buf, values[i:i + room]])
            i += room
            self._compact_if_needed()

    def update(self, value: float) -> None:
        self.update_batch(np.array([value]))

    def _coin(self) -> int:
        self._compactions += 1
        h = splitmix64(np.array(
            [self.seed * 0x9E3779B9 + self._compactions],
            dtype=np.uint64))[0]
        return int(h & np.uint64(1))

    def _compact_if_needed(self) -> None:
        while True:
            over = None
            for h, c in enumerate(self.levels):
                if len(c.buf) > c.capacity:
                    over = h
                    break
            if over is None:
                return
            promoted = self.levels[over].compact(self._coin())
            if over + 1 >= len(self.levels):
                self.levels.append(_Compactor(self.k, hra=self.hra))
            up = self.levels[over + 1]
            up.buf = np.concatenate([up.buf, promoted])

    # -- queries ---------------------------------------------------------
    @property
    def is_exact(self) -> bool:
        return len(self.levels) == 1 and self.levels[0].state == 0

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, c in enumerate(self.levels):
            if len(c.buf):
                vals.append(c.buf)
                wts.append(np.full(len(c.buf), float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Smallest retained value whose cumulative weight >= ceil(q*N)
        (rank-ceil convention == DuckDB quantile_disc; exact while
        uncompacted)."""
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
    def merge(self, other: "REQSketch") -> "REQSketch":
        if self.k != other.k or self.hra != other.hra:
            raise ValueError("merge requires identical k and hra mode")
        out = REQSketch(self.k, self.seed, hra=self.hra)
        H = max(len(self.levels), len(other.levels))
        out.levels = []
        for h in range(H):
            a = self.levels[h] if h < len(self.levels) else None
            b = other.levels[h] if h < len(other.levels) else None
            # schedule state advances by the more-compacted operand so
            # the section refinement never regresses under merge
            pick = max(
                [c for c in (a, b) if c is not None],
                key=lambda c: (c.state, -c.section_size))
            c = _Compactor(pick.section_size, pick.num_sections,
                           pick.state, hra=self.hra)
            c.buf = np.concatenate(
                [x.buf for x in (a, b) if x is not None])
            out.levels.append(c)
        out.n = self.n + other.n
        out._compactions = self._compactions + other._compactions
        out._compact_if_needed()
        return out

    # -- serialization ---------------------------------------------------
    def serialize(self) -> bytes:
        header = struct.pack("<4sIqqIII", _MAGIC, self.k, self.seed,
                             self.n, self._compactions, len(self.levels),
                             int(self.hra))
        parts = [header]
        for c in self.levels:
            parts.append(struct.pack("<III", c.section_size,
                                     c.num_sections, c.state))
            parts.append(struct.pack("<I", len(c.buf)))
            parts.append(np.asarray(c.buf, dtype=np.float64).tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, data: bytes) -> "REQSketch":
        try:
            (magic,) = struct.unpack_from("<4s", data)
            if magic == _MAGIC_V1:  # legacy pre-LRA layout: hra=True
                k, seed, n, comps, nlev = struct.unpack_from(
                    "<IqqII", data, 4)
                hra = 1
                off = struct.calcsize("<4sIqqII")
            else:
                magic, k, seed, n, comps, nlev, hra = struct.unpack_from(
                    "<4sIqqIII", data)
                off = struct.calcsize("<4sIqqIII")
        except struct.error as e:
            raise ValueError("not a REQ blob") from e
        if magic not in (_MAGIC, _MAGIC_V1):
            raise ValueError("not a REQ blob")
        levels = []
        for _ in range(nlev):
            ss, ns, st = struct.unpack_from("<III", data, off)
            off += 12
            (cnt,) = struct.unpack_from("<I", data, off)
            off += 4
            c = _Compactor(ss, ns, st, hra=bool(hra))
            c.buf = np.frombuffer(data, dtype=np.float64, offset=off,
                                  count=cnt).copy()
            off += 8 * cnt
            levels.append(c)
        out = cls(k=k, seed=seed, hra=bool(hra), levels=levels, n=n)
        out._compactions = comps
        return out
