"""HyperLogLog distinct-count sketch with an exact sparse mode.

The reference has no HLL; its nearest semantics is exact
``numNonZeroElementsPerColumn`` counting used to drive downsampling
(spark/.../SparkEngine.scala:63-82). At 10^12-document scale exact counting
is the bottleneck, so HLL substitutes (SURVEY.md §2.4).

Design (all public algorithms: Flajolet et al. 2007 + the 64-bit practical
variants popularized by HLL++):

- 64-bit hashes (splitmix64) — no large-range correction needed;
- ``p``-bit register index, 2^p registers of max-leading-zero ranks;
- **sparse mode**: below ``sparse_limit`` distinct hashes we keep the exact
  hash set — counts are EXACT there (and SQL-oracle-able), flipping to dense
  registers only past the threshold;
- dense estimate: alpha_m * m^2 / sum(2^-M) with linear counting when
  E <= 2.5m and empty registers exist;
- merge: union of hash sets / element-wise register max — associative.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.hashing import hash_u64

_MAGIC_SPARSE = b"HLS1"
_MAGIC_DENSE = b"HLD1"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@dataclass
class HyperLogLog:
    p: int = 14
    seed: int = 1
    sparse_limit: int = 4096  # distinct hashes kept exactly before densifying
    sparse: set = field(default_factory=set, repr=False)
    registers: np.ndarray = field(default=None, repr=False)  # uint8[2^p] or None

    @property
    def is_sparse(self) -> bool:
        return self.registers is None

    # -- updates ---------------------------------------------------------
    def update_batch(self, keys: np.ndarray) -> None:
        """keys: int64 array (pre-hash strings with hash_strings_u64)."""
        h = hash_u64(np.asarray(keys, dtype=np.int64), self.seed)
        if self.is_sparse:
            self.sparse.update(h.tolist())
            if len(self.sparse) > self.sparse_limit:
                self._densify()
        else:
            self._update_dense(h)

    def _densify(self) -> None:
        m = 1 << self.p
        self.registers = np.zeros(m, dtype=np.uint8)
        if self.sparse:
            self._update_dense(np.fromiter(self.sparse, dtype=np.uint64))
        self.sparse = set()

    def _update_dense(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, + 1
        # clz via bit_length: 64 - bit_length(rest >> p-shifted domain)
        nz = rest != 0
        ranks = np.empty(len(h), dtype=np.uint8)
        ranks[~nz] = 64 - self.p + 1
        if nz.any():
            # floor(log2) via conversion to float64 is unsafe near 2^64;
            # use a loop-free approach on the top bits
            r = rest[nz]
            lz = np.zeros(r.shape, dtype=np.uint8)
            cur = r.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                mask = cur < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += np.uint8(shift)
                cur[mask] = cur[mask] << np.uint64(shift)
            ranks[nz] = lz + 1
        np.maximum.at(self.registers, idx, ranks)

    # -- query -----------------------------------------------------------
    def count(self) -> float:
        if self.is_sparse:
            return float(len(self.sparse))
        m = float(1 << self.p)
        regs = self.registers.astype(np.float64)
        e = _alpha(int(m)) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros > 0:
            return float(m * np.log(m / zeros))  # linear counting
        return float(e)

    # -- merge -----------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if (self.p, self.seed) != (other.p, other.seed):
            raise ValueError("merge requires identical HLL config")
        out = HyperLogLog(self.p, self.seed, self.sparse_limit)
        if self.is_sparse and other.is_sparse:
            out.sparse = self.sparse | other.sparse
            if len(out.sparse) > out.sparse_limit:
                out._densify()
        else:
            a = self if not self.is_sparse else other
            out.registers = a.registers.copy()
            b = other if a is self else self
            if b.is_sparse:
                if b.sparse:
                    out._update_dense(np.fromiter(b.sparse, dtype=np.uint64))
            else:
                np.maximum(out.registers, b.registers, out=out.registers)
        return out

    # -- serialization ---------------------------------------------------
    def serialize(self) -> bytes:
        if self.is_sparse:
            arr = np.fromiter(sorted(self.sparse), dtype=np.uint64)
            header = struct.pack("<4sBqI", _MAGIC_SPARSE, self.p, self.seed,
                                 len(arr))
            return header + arr.tobytes()
        header = struct.pack("<4sBqI", _MAGIC_DENSE, self.p, self.seed,
                             len(self.registers))
        return header + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, sparse_limit: int = 4096) -> "HyperLogLog":
        try:
            magic, p, seed, n = struct.unpack_from("<4sBqI", data)
        except struct.error as e:
            raise ValueError("not a HLL blob") from e
        off = struct.calcsize("<4sBqI")
        out = cls(p=p, seed=seed, sparse_limit=sparse_limit)
        if magic == _MAGIC_SPARSE:
            out.sparse = set(np.frombuffer(data, dtype=np.uint64, offset=off,
                                           count=n).tolist())
        elif magic == _MAGIC_DENSE:
            out.registers = np.frombuffer(data, dtype=np.uint8, offset=off,
                                          count=n).copy()
        else:
            raise ValueError("not an HLL blob")
        return out
