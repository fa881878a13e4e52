"""Moments sketch (Gan et al. VLDB'18): exact-state goldens vs NumPy,
merge associativity/bit-exactness on integer inputs, weighted updates ==
expanded updates, maxent quantile accuracy on three distribution shapes,
degenerate cases, serde, and the two distributed builds (sketch
machinery vs all-JVM aggregates) vs each other and the DuckDB oracle."""

import duckdb
import numpy as np
import pytest

from mahout_spark.core.moments import MomentsSketch
from mahout_spark.sketch.queries import moments_by_group, moments_oracle_sql
from tests.conftest import SF_DIR


def _ints(n, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 700, n).astype(float)


def test_state_golden_vs_numpy():
    v = _ints(1000)
    s = MomentsSketch(t=5)
    s.update_batch(v)
    assert s.n == 1000.0 and s.lo == v.min() and s.hi == v.max()
    for k in range(1, 6):
        assert s.sums[k - 1] == float((v ** k).sum())
    assert s.mean() == v.mean()
    assert abs(s.variance() - v.var()) < 1e-6 * v.var()


def test_merge_bit_exact_any_tree():
    v = _ints(4000)
    direct = MomentsSketch(t=4)
    direct.update_batch(v)
    parts = []
    for i in range(8):
        p = MomentsSketch(t=4)
        p.update_batch(v[i::8])
        parts.append(p)
    left = parts[0]
    for p in parts[1:]:
        left = left.merge(p)
    pair = lambda a, b: a.merge(b)
    balanced = pair(pair(pair(parts[0], parts[1]), pair(parts[2], parts[3])),
                    pair(pair(parts[4], parts[5]), pair(parts[6], parts[7])))
    for m in (left, balanced):
        assert m.serialize() == direct.serialize()   # bit-exact on ints


def test_weighted_equals_expanded():
    vals = np.array([3.0, 9.0, 21.0])
    wts = np.array([5.0, 2.0, 7.0])
    a = MomentsSketch(t=4)
    a.update_batch(vals, wts)
    b = MomentsSketch(t=4)
    b.update_batch(np.repeat(vals, wts.astype(int)))
    assert a.serialize() == b.serialize()
    with pytest.raises(ValueError):
        MomentsSketch(t=2).update_batch(vals, np.array([1.0, -1.0, 2.0]))


@pytest.mark.parametrize("shape", ["uniform", "lognormal", "gaussian"])
def test_quantile_rank_error(shape):
    rng = np.random.default_rng(11)
    data = {
        "uniform": rng.integers(1, 1000, 40000).astype(float),
        "lognormal": np.exp(rng.normal(3, 0.6, 40000)).round(),
        "gaussian": rng.normal(500, 80, 40000).round(),
    }[shape]
    s = MomentsSketch(t=6)
    s.update_batch(data)
    qs = np.array([0.1, 0.25, 0.5, 0.75, 0.9])
    est = s.quantile(qs)
    rank_err = max(abs((data < e).mean() - q) for e, q in zip(est, qs))
    assert rank_err < 0.05, f"{shape}: rank error {rank_err}"
    assert s.quantile(0.0) >= s.lo and s.quantile(1.0) <= s.hi


def test_degenerate_cases():
    s = MomentsSketch(t=4)
    with pytest.raises(ValueError):
        s.quantile(0.5)              # empty
    s.update_batch(np.array([7.0, 7.0, 7.0]))
    assert s.quantile(0.5) == 7.0    # constant support short-circuit
    with pytest.raises(ValueError):
        s.quantile(1.5)
    with pytest.raises(ValueError):
        MomentsSketch(t=0)
    with pytest.raises(ValueError):
        s.merge(MomentsSketch(t=3))


def test_serde_roundtrip():
    s = MomentsSketch(t=5)
    s.update_batch(_ints(100))
    r = MomentsSketch.deserialize(s.serialize())
    assert r.t == 5 and r.n == s.n and r.lo == s.lo and r.hi == s.hi
    assert np.array_equal(r.sums, s.sums)
    with pytest.raises(ValueError):
        MomentsSketch.deserialize(b"junk")


def test_distributed_builds_match_and_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    via_sketch = moments_by_group(docs, "lang", "n_chars", t=4)
    via_jvm = moments_by_group(docs, "lang", "n_chars", t=4, jvm_only=True)
    a = sorted(map(tuple, via_sketch.collect()))
    b = sorted(map(tuple, via_jvm.collect()))
    assert a == b                                     # bit-identical paths
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = sorted(map(tuple, con.execute(moments_oracle_sql(
        "SELECT lang, n_chars FROM documents", "lang", "n_chars",
        t=4)).fetchall()))
    assert a == want                                  # bit-exact vs SQL
    # partitioning independence of the sketch-machinery build
    c = sorted(map(tuple, moments_by_group(
        docs.repartition(13), "lang", "n_chars", t=4).collect()))
    assert c == a


def test_distributed_quantile_columns(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = moments_by_group(docs, "lang", "n_chars", t=6,
                           quantiles=[0.5]).collect()
    exact = {r["lang"]: r["med"] for r in docs.groupBy("lang").agg(
        F_expr_median("n_chars").alias("med")).collect()}
    for r in out:
        lo, hi = sorted((exact[r["lang"]], r["q0_5"]))
        assert hi - lo <= 0.25 * exact[r["lang"]]     # coarse sanity


def F_expr_median(c):
    from pyspark.sql import functions as F
    return F.expr(f"percentile({c}, 0.5)")
