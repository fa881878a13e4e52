"""Bloom filter — token allow/deny filtering as in the reference's

BloomTokenFilter (integration/.../llr/BloomTokenFilter.java:38-78, which
keeps/drops tokens by ``filter.membershipTest(key)``). Merge = bitwise OR
(same geometry + seed), which the Hadoop filter also supports conceptually.

Standard construction: m bits, k hash probes; probes derived from one 64-bit
hash split into two 32-bit halves (Kirsch–Mitzenmacher double hashing,
public technique) — fully vectorized.

**Parity mode** (``parity=True``): the k probe positions come from the same
seeded affine family the parity-CMS uses — ``((a_j*key + b_j) mod p) mod m``
(HashFunctionBuilder.java:23-61 shape) — exactly replayable in DuckDB SQL
(HUGEINT arithmetic), so the driver's oracle can verify the distributed
build + merge + membership tests bit-for-bit. Slower; gate/tests only.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.hashing import affine_hash, affine_params, hash_u64

_MAGIC = b"BLM1"


def bloom_geometry(n_items: int, fp_rate: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for target capacity and false-positive rate."""
    n_items = max(n_items, 1)
    m = max(8, int(math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n_items * math.log(2))))
    return m, k


@dataclass
class BloomFilter:
    m_bits: int
    k: int
    seed: int = 1
    parity: bool = False  # affine probe family, SQL-replayable (slow)
    bits: np.ndarray = field(default=None, repr=False)  # uint8 packed
    _params: list = field(default=None, repr=False)

    def __post_init__(self):
        if self.bits is None:
            self.bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)
        if self.parity:
            self._params = affine_params(self.seed, self.k)

    @classmethod
    def from_capacity(cls, n_items: int, fp_rate: float = 0.01,
                      seed: int = 1, parity: bool = False) -> "BloomFilter":
        m, k = bloom_geometry(n_items, fp_rate)
        return cls(m_bits=m, k=k, seed=seed, parity=parity)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing h1 + i*h2 mod m

        (fast mode) or the seeded affine family (parity mode)."""
        if self.parity:
            ks = np.asarray(keys, dtype=np.int64)
            return np.stack([affine_hash(ks, a, b, self.m_bits)
                             for (a, b) in self._params])
        h = hash_u64(np.asarray(keys, dtype=np.int64), self.seed)
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)  # odd
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m_bits)
                    ).astype(np.int64)

    def add_batch(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k, self.seed, self.parity) != (
                other.m_bits, other.k, other.seed, other.parity):
            raise ValueError("merge requires identical Bloom config")
        return BloomFilter(self.m_bits, self.k, self.seed, self.parity,
                           bits=np.bitwise_or(self.bits, other.bits))

    def serialize(self) -> bytes:
        header = struct.pack("<4sIIqB", _MAGIC, self.m_bits, self.k,
                             self.seed, 1 if self.parity else 0)
        return header + self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        try:
            magic, m_bits, k, seed, par = struct.unpack_from("<4sIIqB", data)
        except struct.error as e:
            raise ValueError("not a Bloom blob") from e
        if magic != _MAGIC:
            raise ValueError("not a Bloom blob")
        off = struct.calcsize("<4sIIqB")
        bits = np.frombuffer(data, dtype=np.uint8, offset=off).copy()
        return cls(m_bits=m_bits, k=k, seed=seed, parity=bool(par), bits=bits)
