"""DGIM sliding-window counter — approximate "events in the last W".

Not in the reference (no streaming engine at all, SURVEY.md §2.7);
added because a sliding-window count is the one sketch question the
repo's windowed sketches can't answer without keeping every window
open: "how many events did this key receive in the LAST W time units,
right now" over an unbounded stream, in O(log^2 W) state per key.
Public algorithm: Datar, Gionis, Indyk, Motwani (SICOMP 31(6), 2002,
"Maintaining stream statistics over sliding windows"), the exponential
-histogram form in MMDS ch. 4.6.

State per key: buckets (timestamp_of_newest_element, size), sizes
powers of two, at most ``r`` buckets of each size — inserting a new
event adds a size-1 bucket and cascades merges of the two OLDEST
buckets of any size that exceeds r. Query(now, W): sum the sizes of
buckets whose timestamp lies in (now - W, now], counting the OLDEST
qualifying bucket at half size. Relative error <= 1 / (2 (r - 1)) for
r >= 2 (MMDS Thm; r=2 gives the classic 50% bound, r=9 ~ 6%).

Unlike the rest of the sketch family this is ORDER-SENSITIVE (events
must arrive in non-decreasing timestamp order per key) and NOT
mergeable — it exists for the per-key stateful streaming path
(``streaming/dgim.py``), where Structured Streaming's per-key state
already serializes updates; each micro-batch is sorted before ingest
and late events below the key's high-water mark are counted at the
high-water mark (the watermark bounds how wrong that can be).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_MAGIC = b"DGM1"


@dataclass
class DGIM:
    """Exponential histogram of event timestamps (ms or any int unit)."""

    r: int = 4
    #: (newest_ts, size) oldest-first; sizes are powers of two
    buckets: list = field(default_factory=list)
    #: high-water mark: largest timestamp ingested
    hwm: int = -(1 << 62)

    def __post_init__(self):
        if self.r < 2:
            raise ValueError("r must be >= 2 (error bound 1/(2(r-1)))")

    def update(self, ts: int) -> None:
        """Ingest one event at integer timestamp ts (non-decreasing;
        a late ts clamps to the high-water mark)."""
        ts = max(int(ts), self.hwm)
        self.hwm = ts
        self.buckets.append((ts, 1))
        # cascade: merge the two oldest of any size occurring > r times
        size = 1
        while True:
            idx = [i for i, (_, s) in enumerate(self.buckets) if s == size]
            if len(idx) <= self.r:
                break
            i, j = idx[0], idx[1]          # two oldest of this size
            merged = (self.buckets[j][0], size * 2)   # newer ts survives
            self.buckets[j] = merged
            del self.buckets[i]
            size *= 2

    def update_batch(self, ts_sorted) -> None:
        for t in ts_sorted:
            self.update(t)

    def expire(self, now: int, window: int) -> None:
        """Drop buckets wholly outside (now - window, now]."""
        cut = now - window
        self.buckets = [(t, s) for (t, s) in self.buckets if t > cut]

    def count(self, now: int, window: int) -> float:
        """Estimated events with timestamp in (now - window, now]."""
        live = [(t, s) for (t, s) in self.buckets if t > now - window]
        if not live:
            return 0.0
        total = sum(s for _, s in live)
        oldest = live[0][1]
        if oldest == 1:                    # oldest bucket is exact
            return float(total)
        return float(total - oldest / 2.0)

    @property
    def n_buckets(self) -> int:
        return len(self.buckets)

    def serialize(self) -> bytes:
        header = struct.pack("<4sIqI", _MAGIC, self.r, self.hwm,
                             len(self.buckets))
        body = b"".join(struct.pack("<qq", t, s) for t, s in self.buckets)
        return header + body

    @classmethod
    def deserialize(cls, data: bytes) -> "DGIM":
        data = bytes(data)
        if len(data) < 20 or data[:4] != _MAGIC:
            raise ValueError("not a DGIM blob")
        _, r, hwm, n = struct.unpack("<4sIqI", data[:20])
        if len(data) != 20 + 16 * n:
            raise ValueError("truncated DGIM blob")
        buckets = [struct.unpack("<qq", data[20 + 16 * i:36 + 16 * i])
                   for i in range(n)]
        return cls(r=r, buckets=[(t, s) for t, s in buckets], hwm=hwm)
