"""Bloom filter — token allow/deny filtering as in the reference's

BloomTokenFilter (integration/.../llr/BloomTokenFilter.java:38-78, which
keeps/drops tokens by ``filter.membershipTest(key)``). Merge = bitwise OR
(same geometry + seed), which the Hadoop filter also supports conceptually.

Standard construction: m bits, k hash probes; probes derived from one 64-bit
hash split into two 32-bit halves (Kirsch–Mitzenmacher double hashing,
public technique) — fully vectorized.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.hashing import hash_u64

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
    bits: np.ndarray = field(default=None, repr=False)  # uint8 packed

    def __post_init__(self):
        if self.bits is None:
            self.bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def from_capacity(cls, n_items: int, fp_rate: float = 0.01,
                      seed: int = 1) -> "BloomFilter":
        m, k = bloom_geometry(n_items, fp_rate)
        return cls(m_bits=m, k=k, seed=seed)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing h1 + i*h2 mod m."""
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
        if (self.m_bits, self.k, self.seed) != (other.m_bits, other.k, other.seed):
            raise ValueError("merge requires identical Bloom config")
        return BloomFilter(self.m_bits, self.k, self.seed,
                           bits=np.bitwise_or(self.bits, other.bits))

    def serialize(self) -> bytes:
        header = struct.pack("<4sIIq", _MAGIC, self.m_bits, self.k, self.seed)
        return header + self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "BloomFilter":
        try:
            magic, m_bits, k, seed = struct.unpack_from("<4sIIq", data)
        except struct.error as e:
            raise ValueError("not a Bloom blob") from e
        if magic != _MAGIC:
            raise ValueError("not a Bloom blob")
        off = struct.calcsize("<4sIIq")
        bits = np.frombuffer(data, dtype=np.uint8, offset=off).copy()
        return cls(m_bits=m_bits, k=k, seed=seed, bits=bits)
