"""Misra-Gries heavy hitters: error bounds, mergeability, candidate
completeness, and the exact-verify Spark query with DuckDB parity."""

import random
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.spacesaving import MisraGries
from mahout_spark.sketch.queries import (heavy_hitters,
                                         heavy_hitters_oracle_sql)


def _zipf_stream(seed=3, n=20_000, vocab=2_000):
    rng = random.Random(seed)
    return [int(vocab * (rng.random() ** 3)) for _ in range(n)]


def test_bounds_never_over_never_far_under():
    stream = _zipf_stream()
    true = Counter(stream)
    mg = MisraGries(k=99)
    for i in range(0, len(stream), 997):          # uneven batches
        chunk = np.array(stream[i:i + 997], dtype=np.int64)
        mg.update_batch(chunk, None)
    assert mg.n_total == len(stream)
    slack = len(stream) / 100.0
    for key, t in true.items():
        est = mg.point(key)
        assert est <= t
        assert est >= t - slack
    # absent key
    assert mg.point(10**9) == 0.0


def test_merge_bounds_any_tree():
    stream = _zipf_stream(seed=9, n=12_000)
    true = Counter(stream)
    parts = [stream[i::5] for i in range(5)]
    sks = []
    for p in parts:
        s = MisraGries(k=79)
        s.update_batch(np.array(p, dtype=np.int64), None)
        sks.append(s)
    # left fold and a balanced tree must both respect the bound
    fold = sks[0]
    for s in sks[1:]:
        fold = fold.merge(s)
    tree = sks[0].merge(sks[1]).merge(sks[2].merge(sks[3]).merge(sks[4]))
    for m in (fold, tree):
        assert m.n_total == len(stream)
        slack = len(stream) / 80.0
        for key, t in true.items():
            assert m.point(key) <= t
            assert m.point(key) >= t - slack
    with pytest.raises(ValueError):
        fold.merge(MisraGries(k=5))


def test_candidates_completeness_and_guard():
    stream = _zipf_stream(seed=11)
    true = Counter(stream)
    mg = MisraGries.from_error_bound(0.001)
    assert mg.k == 999
    mg.update_batch(np.array(stream, dtype=np.int64), None)
    thr = 0.004 * len(stream)
    cand = set(mg.candidates(thr))
    for key, t in true.items():
        if t > thr:
            assert key in cand
    with pytest.raises(ValueError, match="slack"):
        mg.candidates(0.0001 * len(stream))


def test_serialize_roundtrip_and_errors():
    mg = MisraGries(k=10)
    mg.update_batch(np.array([1, 2, 2, 3, 3, 3], dtype=np.int64), None)
    back = MisraGries.deserialize(mg.serialize())
    assert back.k == 10 and back.n_total == 6.0
    assert back.counters == mg.counters
    with pytest.raises(ValueError):
        MisraGries.deserialize(b"garbage")


def test_weighted_updates():
    mg = MisraGries(k=3)
    mg.update_batch(np.array([7, 8, 7], dtype=np.int64),
                    np.array([2.0, 1.0, 3.0]))
    assert mg.point(7) == 5.0
    assert mg.n_total == 6.0


@pytest.fixture(scope="module")
def tokens_df(spark):
    rng = random.Random(17)
    words = [f"w{i}" for i in range(300)]
    rows = [(i, words[int(300 * (rng.random() ** 4))])
            for i in range(30_000)]
    return spark.createDataFrame(rows, "row long, token string"), rows


def test_spark_heavy_hitters_exact(spark, tokens_df):
    df, rows = tokens_df
    frac = 0.01
    got = {r["token"]: r["n"]
           for r in heavy_hitters(df, "token", frac).collect()}
    true = Counter(t for _, t in rows)
    expect = {w: c for w, c in true.items() if c > frac * len(rows)}
    assert got == expect
    # partitioning-independent (the verify join makes the output exact)
    got2 = {r["token"]: r["n"] for r in
            heavy_hitters(df.repartition(13), "token", frac).collect()}
    assert got2 == expect


def test_spark_heavy_hitters_weighted(spark, tokens_df):
    df, rows = tokens_df
    wdf = df.withColumn("w", (F.col("row") % 3 + 1).cast("double"))
    frac = 0.01
    got = {r["token"]: r["weight"] for r in
           heavy_hitters(wdf, "token", frac, value_col="w").collect()}
    true = Counter()
    for i, t in rows:
        true[t] += float(i % 3 + 1)
    total = sum(true.values())
    expect = {w: c for w, c in true.items() if c > frac * total}
    assert got == expect


def test_duckdb_oracle_parity(spark, tokens_df):
    df, rows = tokens_df
    con = duckdb.connect()
    con.register("toks", pd.DataFrame(rows, columns=["row", "token"]))
    sql = heavy_hitters_oracle_sql("SELECT token FROM toks", "token", 0.01)
    duck = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    got = {r["token"]: r["n"]
           for r in heavy_hitters(df, "token", 0.01).collect()}
    assert duck == got
