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

**Parity mode** (``parity=True``): keys are taken as pre-computed uniform
hashes in a 60-bit domain (md5_long60 — first 15 hex chars of md5), no
splitmix64 re-mix. Register index = top ``p`` bits, rank = leading zeros of
the remaining ``60-p`` bits + 1. Every step (including the register-sum
``sum(2^-M)``, computed in exact integer arithmetic before a single float
conversion) is replayable in DuckDB SQL, so the driver's oracle verifies
the full distributed build + merge numerically — same trick as parity-CMS.
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
    parity: bool = False  # keys ARE 60-bit hashes (md5_long60); SQL-replayable
    sparse: set = field(default_factory=set, repr=False)
    registers: np.ndarray = field(default=None, repr=False)  # uint8[2^p] or None

    @property
    def is_sparse(self) -> bool:
        return self.registers is None

    @property
    def _hash_bits(self) -> int:
        return 60 if self.parity else 64

    # -- updates ---------------------------------------------------------
    def update_batch(self, keys: np.ndarray) -> None:
        """keys: int64 array (pre-hash strings with hash_strings_u64);

        in parity mode keys are already uniform 60-bit hashes."""
        if self.parity:
            h = np.asarray(keys, dtype=np.int64).astype(np.uint64)
        else:
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
        bits = self._hash_bits
        idx = (h >> np.uint64(bits - self.p)).astype(np.int64)
        # shift the remaining (bits-p) field to the top of a 64-bit word so
        # its leading zeros equal the field's leading zeros (the idx bits
        # wrap out of range and are discarded)
        rest = h << np.uint64(64 - (bits - self.p))
        # rank = leading zeros of the remaining bits-p bits, + 1
        nz = rest != 0
        ranks = np.empty(len(h), dtype=np.uint8)
        ranks[~nz] = bits - self.p + 1
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
    @property
    def alpha_m2(self) -> float:
        m = 1 << self.p
        return _alpha(m) * float(m) * float(m)

    def count(self) -> float:
        if self.is_sparse:
            return float(len(self.sparse))
        m = 1 << self.p
        # sum(2^-M) computed EXACTLY: S = sum(2^(rmax - reg)) in arbitrary-
        # precision integers (order-insensitive), one float conversion, one
        # exact power-of-two scale. Bit-identical to the DuckDB oracle's
        # HUGEINT sum regardless of register order or partitioning.
        rmax = self._hash_bits - self.p + 1
        hist = np.bincount(self.registers, minlength=rmax + 1)
        s_int = sum(int(c) << (rmax - v)
                    for v, c in enumerate(hist.tolist()) if c)
        sum_exp2 = float(s_int) / float(1 << rmax)
        e = self.alpha_m2 / sum_exp2
        zeros = int(hist[0])
        if e <= 2.5 * m and zeros > 0:
            return float(m * np.log(m / float(zeros)))  # linear counting
        return float(e)

    # -- merge -----------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if (self.p, self.seed, self.parity) != (other.p, other.seed,
                                                other.parity):
            raise ValueError("merge requires identical HLL config")
        out = HyperLogLog(self.p, self.seed, self.sparse_limit, self.parity)
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
        par = 1 if self.parity else 0
        if self.is_sparse:
            arr = np.fromiter(sorted(self.sparse), dtype=np.uint64)
            header = struct.pack("<4sBBqI", _MAGIC_SPARSE, self.p, par,
                                 self.seed, len(arr))
            return header + arr.tobytes()
        header = struct.pack("<4sBBqI", _MAGIC_DENSE, self.p, par, self.seed,
                             len(self.registers))
        return header + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, sparse_limit: int = 4096) -> "HyperLogLog":
        try:
            magic, p, par, seed, n = struct.unpack_from("<4sBBqI", data)
        except struct.error as e:
            raise ValueError("not a HLL blob") from e
        off = struct.calcsize("<4sBBqI")
        out = cls(p=p, seed=seed, sparse_limit=sparse_limit, parity=bool(par))
        if magic == _MAGIC_SPARSE:
            out.sparse = set(np.frombuffer(data, dtype=np.uint64, offset=off,
                                           count=n).tolist())
        elif magic == _MAGIC_DENSE:
            out.registers = np.frombuffer(data, dtype=np.uint8, offset=off,
                                          count=n).copy()
        else:
            raise ValueError("not an HLL blob")
        return out
