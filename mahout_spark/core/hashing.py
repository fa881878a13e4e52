"""Deterministic, vectorized hash families for the sketch kernels.

Two families are provided:

- **fast mode** — ``splitmix64``-derived per-depth hashing on ``uint64``
  NumPy arrays (wraparound arithmetic, fully vectorized). This is the
  production path: pairwise-independence-quality mixing at memory bandwidth.
- **parity mode** — the reference's affine family
  ``((a*k + b) mod p) mod w`` with ``p = 9223372036854775783`` (largest
  prime < 2^63) and per-depth ``(a, b)`` drawn as
  ``abs(java.util.Random(seed).nextLong())`` — behavioral parity with the
  reference's HashFunctionBuilder/HashFunction
  (mr/.../cf/taste/impl/common/HashFunctionBuilder.java:23-61,
  HashFunction.java:31-35) so CMS estimates can be asserted identical.

Both satisfy the CMS (eps, delta) guarantee; parity mode exists so tests can
pin estimate-level equality with the reference algorithm.
"""

from __future__ import annotations

import numpy as np

BIG_PRIME = 9223372036854775783  # largest prime < 2**63, as in the reference

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain constant set), vectorized.

    Input/output dtype uint64; wraparound arithmetic is intended.
    """
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z = (z + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash_u64(keys: np.ndarray, seed: int) -> np.ndarray:
    """64-bit mix of int64/uint64 keys with a seed; vectorized."""
    k = np.asarray(keys).astype(np.int64, copy=False).view(_U64)
    with np.errstate(over="ignore"):
        return splitmix64(k ^ splitmix64(np.full_like(k, _U64(seed & 0xFFFFFFFFFFFFFFFF))))


def hash_strings_u64(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of a sequence of strings (vectorized FNV-1a

    over UTF-8 bytes via NumPy, then splitmix64). Stable across processes —
    unlike Python's builtin hash().
    """
    import pandas as pd

    s = pd.Series(values, dtype="object").fillna("")
    # FNV-1a per string; loop over strings but byte-level work is C-speed.
    out = np.empty(len(s), dtype=_U64)
    fnv_offset = _U64(0xCBF29CE484222325)
    fnv_prime = _U64(0x100000001B3)
    with np.errstate(over="ignore"):
        for i, v in enumerate(s):
            b = np.frombuffer(v.encode("utf-8"), dtype=np.uint8).astype(_U64)
            h = fnv_offset
            for byte in b:
                h = (h ^ byte) * fnv_prime
            out[i] = h
    return splitmix64(out ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))


class JavaRandom:
    """Exact re-implementation of java.util.Random's 48-bit LCG (public

    algorithm, JDK spec) — used only for parity-mode (a, b) parameter
    generation to mirror the reference's HashFunctionBuilder.
    """

    def __init__(self, seed: int):
        self._seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        r = self._seed >> (48 - bits)
        # interpret as signed 32-bit
        if r >= 1 << 31:
            r -= 1 << 32
        return r

    def next_long(self) -> int:
        hi = self._next(32)
        lo = self._next(32)
        v = (hi << 32) + lo
        # wrap to signed 64-bit
        v &= (1 << 64) - 1
        if v >= 1 << 63:
            v -= 1 << 64
        return v


def affine_params(seed: int, depth: int) -> list[tuple[int, int]]:
    """Per-depth (a, b) affine-hash parameters, reference-compatible:

    consecutive ``abs(nextLong())`` pairs from ``java.util.Random(seed)``.
    """
    rng = JavaRandom(seed)
    params = []
    for _ in range(depth):
        a = abs(rng.next_long())
        b = abs(rng.next_long())
        params.append((a, b))
    return params


def affine_hash(keys: np.ndarray, a: int, b: int, width: int) -> np.ndarray:
    """((a*k + b) mod p) mod w on int64 keys, exact (object-dtype big ints).

    Parity mode only — O(n) Python-int arithmetic; production path is
    fast_rows().
    """
    ks = np.asarray(keys, dtype=np.int64)
    out = np.empty(len(ks), dtype=np.int64)
    for i, k in enumerate(ks):
        out[i] = ((a * int(k) + b) % BIG_PRIME) % width
    return out


def fast_rows(keys: np.ndarray, seed: int, depth: int, width: int) -> np.ndarray:
    """(depth, n) int64 matrix of bucket indices, fully vectorized.

    Row i uses an independent splitmix64-mixed stream (seed ^ i-derived).
    """
    k = np.asarray(keys).astype(np.int64, copy=False).view(_U64)
    out = np.empty((depth, len(k)), dtype=np.int64)
    with np.errstate(over="ignore"):
        base = splitmix64(k ^ _U64(seed & 0xFFFFFFFFFFFFFFFF))
        for i in range(depth):
            h = splitmix64(base + _U64(0x9E3779B97F4A7C15) * _U64(i + 1))
            out[i] = (h % _U64(width)).astype(np.int64)
    return out


# -- XXH64 family (bit-parity with Spark's built-in xxhash64 on longs) --------

_XP1 = _U64(0x9E3779B185EBCA87)
_XP2 = _U64(0xC2B2AE3D27D4EB4F)
_XP3 = _U64(0x165667B19E3779F9)
_XP4 = _U64(0x85EBCA77C2B2AE63)
_XP5 = _U64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def xxh64_long(v, seed) -> np.ndarray:
    """XXH64 of an int64 (8-byte little-endian block), vectorized —

    bit-identical to Spark SQL's ``xxhash64`` on a LongType column
    (XxHash64.hashLong). ``seed`` may be a scalar or an int64 array
    (chaining: Spark's multi-column xxhash64 feeds each column's hash as
    the next seed). Returns int64."""
    with np.errstate(over="ignore"):
        vv = np.asarray(v).astype(np.int64, copy=False).view(_U64)
        sd = (np.asarray(seed).astype(np.int64, copy=False).view(_U64)
              if not np.isscalar(seed) else _U64(seed & 0xFFFFFFFFFFFFFFFF))
        acc = sd + _XP5 + _U64(8)
        k1 = _rotl(vv * _XP2, 31) * _XP1
        acc = acc ^ k1
        acc = _rotl(acc, 27) * _XP1 + _XP4
        acc ^= acc >> _U64(33)
        acc *= _XP2
        acc ^= acc >> _U64(29)
        acc *= _XP3
        acc ^= acc >> _U64(32)
        return acc.view(np.int64)


def xxh_rows(keys: np.ndarray, seed: int, depth: int,
             width: int) -> np.ndarray:
    """(depth, n) bucket indices for the 'xxh' CMS family: row i is

    ``pmod(xxhash64(key, seed, i), width)`` — the exact expression
    Catalyst evaluates in the all-JVM bucketed profile build
    (sketch/agg.cms_per_group_bucketed), so JVM-built and Python-built
    sketches are byte-identical."""
    k = np.asarray(keys, dtype=np.int64)
    base = xxh64_long(np.full(len(k), seed, dtype=np.int64),
                      xxh64_long(k, 42))
    out = np.empty((depth, len(k)), dtype=np.int64)
    for i in range(depth):
        h = xxh64_long(np.full(len(k), i, dtype=np.int64), base)
        out[i] = np.mod(h, width)  # numpy mod == Spark pmod for w > 0
    return out
