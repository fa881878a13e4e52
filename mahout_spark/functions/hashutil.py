"""Cross-engine-stable hashing expressions.

The engine's deterministic sampling / sharding / minhash decisions must be
(1) reproducible under task retry (north rule: no ``rand()`` — the reference
seeds MurmurHash per row, SimilarityAnalysis.scala:403-405), and (2) for
test-oracle parity, computable identically in DuckDB SQL. Two families:

- ``xxhash64(...)`` — Spark-native, JVM-speed; used when no cross-engine
  parity is needed (salting, CMS key mapping, downsampling coins).
- ``md5_long60(...)`` — first 15 hex chars of md5 as a 60-bit BIGINT;
  bit-identical in Spark (``conv(substring(md5(x),1,15),16,10)``) and DuckDB
  (``('0x'||substring(md5(x),1,15))::UBIGINT``). Used for minhash/simhash
  so the DuckDB oracle can replay the exact pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1, Mersenne prime: modulus for affine minhash permutations.
MERSENNE61 = (1 << 61) - 1


def md5_long60(col: Column | str) -> Column:
    """60-bit integer hash of a string column, DuckDB-replayable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long60_sql(expr: str) -> str:
    """The same hash as DuckDB SQL text (for oracle queries)."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::UBIGINT)::BIGINT"


def affine_minhash(hash_col: Column, a: int, b: int) -> Column:
    """((a*h + b) mod M61) via decimal(38) arithmetic — exact (no int64

    overflow; a*h can reach ~2^91) and replayable in DuckDB with HUGEINT.
    """
    dec = hash_col.cast("decimal(38,0)")
    return ((dec * F.lit(a) + F.lit(b)) % F.lit(MERSENNE61)).cast("long")


def affine_minhash_sql(hash_expr: str, a: int, b: int) -> str:
    return f"((({hash_expr})::HUGEINT * {a} + {b}) % {MERSENNE61})::BIGINT"


def minhash_params(num_perm: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine permutations; generated

    driver-side and inlined as literals into BOTH the Spark plan and the
    oracle SQL so they agree by construction.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE61, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE61, size=num_perm, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def deterministic_coin(cols: list[Column], seed: int, rate_col: Column) -> Column:
    """Boolean accept/reject with probability ``rate_col`` — hash-based,

    retry-stable (replaces rand(); reference seeds MurmurHash similarly).
    uniform = (xxhash64(cols, seed) mod 2^24) / 2^24.
    """
    h = F.xxhash64(*cols, F.lit(seed))
    uniform = (F.pmod(h, F.lit(1 << 24))).cast("double") / F.lit(float(1 << 24))
    return uniform < rate_col
