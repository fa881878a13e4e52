"""Counting Bloom filter — deletable membership, 13th mergeable sketch.

Extends the repo's BloomFilter (core/bloom.py, reference anchor
integration/.../llr/BloomTokenFilter.java:38-78) with per-position
COUNTERS instead of bits (Fan, Cao, Almeida, Broder, ToN 2000 —
"Summary cache: a scalable wide-area Web cache sharing protocol").
The web-pipeline use case: decontamination / blocklists that receive
REMOVALS (a benchmark rotates out, a url is un-banned) — a plain Bloom
must be rebuilt from scratch, a counting Bloom subtracts.

Properties:
  - add/remove are counter +1/-1 at the same k probe positions the
    plain Bloom uses (identical hash families, including the
    DuckDB-replayable affine parity mode), so membership semantics
    and fp-rate analysis carry over unchanged.
  - merge = elementwise counter ADD (linear!), so the sketch drops
    into the same two-phase distributed build as CMS — and unlike the
    bit-OR Bloom a counting build is UNDO-ABLE: merging a negated
    sketch retracts a whole partition's contribution.
  - ``contains`` = all k probe counters > 0. Deleting a key never
    present can produce false negatives (the classic caveat) — callers
    delete only keys they inserted; counters saturate at the int32
    range and raise on underflow below zero to surface misuse.
  - ``to_bloom()`` projects to the plain BloomFilter (counter > 0 ->
    bit) for the cheap broadcast-membership path once updates stop.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from mahout_spark.core.bloom import BloomFilter, bloom_geometry
from mahout_spark.core.hashing import affine_hash, affine_params, hash_u64

_MAGIC = b"CBF1"


@dataclass
class CountingBloomFilter:
    m_bits: int
    k: int
    seed: int = 1
    parity: bool = False
    counts: np.ndarray = field(default=None, repr=False)  # int32
    _params: list = field(default=None, repr=False)

    def __post_init__(self):
        if self.counts is None:
            self.counts = np.zeros(self.m_bits, dtype=np.int32)
        if len(self.counts) != self.m_bits:
            raise ValueError("counts length != m_bits")
        if self.parity:
            self._params = affine_params(self.seed, self.k)

    @classmethod
    def from_capacity(cls, n_items: int, fp_rate: float = 0.01,
                      seed: int = 1,
                      parity: bool = False) -> "CountingBloomFilter":
        m, k = bloom_geometry(n_items, fp_rate)
        return cls(m_bits=m, k=k, seed=seed, parity=parity)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) positions — IDENTICAL to BloomFilter's families."""
        if self.parity:
            ks = np.asarray(keys, dtype=np.int64)
            return np.stack([affine_hash(ks, a, b, self.m_bits)
                             for (a, b) in self._params])
        h = hash_u64(np.asarray(keys, dtype=np.int64), self.seed)
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        h2 = (h >> np.uint64(32)).astype(np.uint64) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m_bits)
                    ).astype(np.int64)

    def add_batch(self, keys: np.ndarray,
                  counts: np.ndarray | None = None) -> None:
        """``counts``: per-key integer multiplicities — lets the JVM
        'sum' preagg collapse duplicate keys before Arrow transfer
        (counter linearity makes this exact)."""
        pos = self._positions(keys)
        if counts is None:
            np.add.at(self.counts, pos.ravel(), 1)
        else:
            c = np.asarray(counts)
            if np.any(c <= 0) or np.any(c != np.floor(c)):
                raise ValueError("counts must be positive integers")
            np.add.at(self.counts, pos,
                      np.broadcast_to(c.astype(np.int32), pos.shape))

    def remove_batch(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.subtract.at(self.counts, pos, 1)
        if np.any(self.counts < 0):
            raise ValueError(
                "counting-Bloom underflow: removed a key more times than "
                "it was added (delete only what you inserted)")

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        return (self.counts[pos] > 0).all(axis=0)

    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if (self.m_bits, self.k, self.seed, self.parity) != (
                other.m_bits, other.k, other.seed, other.parity):
            raise ValueError("merge requires identical counting-Bloom config")
        return CountingBloomFilter(self.m_bits, self.k, self.seed,
                                   self.parity,
                                   counts=self.counts + other.counts)

    def negate(self) -> "CountingBloomFilter":
        """Retraction sketch: merge(build(P).negate()) removes the whole
        partition P's contribution (counter linearity)."""
        return CountingBloomFilter(self.m_bits, self.k, self.seed,
                                   self.parity, counts=-self.counts)

    def to_bloom(self) -> BloomFilter:
        bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)
        pos = np.nonzero(self.counts > 0)[0]
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return BloomFilter(self.m_bits, self.k, self.seed, self.parity,
                           bits=bits)

    def serialize(self) -> bytes:
        header = struct.pack("<4sIIqB", _MAGIC, self.m_bits, self.k,
                             self.seed, 1 if self.parity else 0)
        return header + np.ascontiguousarray(self.counts).tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "CountingBloomFilter":
        data = bytes(data)
        try:
            magic, m_bits, k, seed, par = struct.unpack_from("<4sIIqB", data)
        except struct.error as e:
            raise ValueError("not a counting-Bloom blob") from e
        if magic != _MAGIC:
            raise ValueError("not a counting-Bloom blob")
        off = struct.calcsize("<4sIIqB")
        counts = np.frombuffer(data, dtype=np.int32, offset=off).copy()
        if len(counts) != m_bits:
            raise ValueError("truncated counting-Bloom blob")
        return cls(m_bits=m_bits, k=k, seed=seed, parity=bool(par),
                   counts=counts)
