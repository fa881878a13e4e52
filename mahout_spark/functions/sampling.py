"""Deterministic corpus sampling: hash-gated uniform and stratified.

Training-data pipelines sample per stratum (language, domain, quality
band) with different rates; at 10^12 documents the sample must be
(1) retry-stable — a recomputed partition makes the same decisions, so
no ``rand()``; (2) a map-only scan — no shuffle, no count() pre-pass;
(3) reproducible across engines for the correctness gate.

The coin is the repo's cross-engine 60-bit hash (``md5_long60``,
functions/hashutil.py): keep a row iff
``md5_long60(key || '|' || seed) < floor(rate * 2^60)`` — an integer
comparison, so Spark and DuckDB agree bit-exactly, and disjoint seeds
give independent samples. Rates are exact to 2^-60 (documented: a rate
is realized as floor(rate·2^60)/2^60).

The reference's sampling surface (``drmSampleRows``, Taste's
``SamplingCandidateItemsStrategy``) is uniform/row-count-based;
stratified rate sampling is part of the training-data extension layer
(like webquality.py), used standing in front of vectorize/dedup stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashutil import md5_long60, md5_long60_sql

U60 = 1 << 60


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * U60)


def hash_coin_u60(key: Column, seed: int) -> Column:
    """Integer in [0, 2^60) — deterministic per (key, seed), engine-exact."""
    return md5_long60(F.concat(key.cast("string"), F.lit(f"|{seed}")))


def hash_coin_u60_sql(key: str, seed: int) -> str:
    return md5_long60_sql(f"({key})::VARCHAR || '|{seed}'")


def sample_by_rate(df: DataFrame, key_col: str, rate: float,
                   seed: int = 1) -> DataFrame:
    """Keep ~rate of rows, decided by the key hash alone (map-only)."""
    return df.where(hash_coin_u60(F.col(key_col), seed)
                    < F.lit(_threshold(rate)))


def sample_by_rate_sql(table: str, key_col: str, rate: float,
                       seed: int = 1) -> str:
    return (f"SELECT * FROM {table} WHERE "
            f"{hash_coin_u60_sql(key_col, seed)} < {_threshold(rate)}")


def stratified_sample(df: DataFrame, stratum_col: str, rates: dict,
                      key_col: str, seed: int = 1,
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum rate sampling: keep a row iff its key coin clears the
    rate of its stratum. Rates is {stratum_value: rate}; strata absent
    from the dict use ``default_rate``. One literal CASE chain over the
    stratum column — no join, no shuffle, skew-immune.
    """
    thr = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value,
                     F.lit(_threshold(rate))).otherwise(thr)
    return df.where(hash_coin_u60(F.col(key_col), seed) < thr)


def stratified_sample_sql(table: str, stratum_col: str, rates: dict,
                          key_col: str, seed: int = 1,
                          default_rate: float = 0.0) -> str:
    thr = str(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        v = str(value).replace("'", "''")
        thr = (f"CASE WHEN {stratum_col} = '{v}' "
               f"THEN {_threshold(rate)} ELSE {thr} END")
    return (f"SELECT * FROM {table} WHERE "
            f"{hash_coin_u60_sql(key_col, seed)} < ({thr})")


def split_fractions(df: DataFrame, key_col: str,
                    fractions: list[float], seed: int = 1,
                    split_col: str = "split") -> DataFrame:
    """Disjoint deterministic splits (train/val/test): assigns split i
    where the coin falls in [Σf_<i, Σf_≤i)·2^60; rows beyond Σf get
    split = -1. One hash + CASE chain, map-only, exactly disjoint."""
    if sum(fractions) > 1.0 + 1e-12:
        raise ValueError("fractions must sum to <= 1")
    coin = hash_coin_u60(F.col(key_col), seed)
    expr = F.lit(-1)
    cum = 0.0
    bounds = []
    for i, frac in enumerate(fractions):
        lo = _threshold(cum)
        cum += frac
        bounds.append((i, lo, _threshold(cum)))
    for i, lo, hi in reversed(bounds):
        expr = F.when((coin >= lo) & (coin < hi), F.lit(i)).otherwise(expr)
    return df.withColumn(split_col, expr)
