"""Tuple sketch (theta + per-key value summaries): brute-replay
goldens, merge-tree/order/partitioning independence, duplicate-key
summary combining per mode, estimator sanity on a known population,
intersection totals, serde round-trip, and the distributed
tuple_totals_by_group query vs its DuckDB oracle."""

import hashlib

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.tuplesketch import DOMAIN60, TupleSketch
from mahout_spark.sketch.queries import (tuple_totals_by_group,
                                         tuple_totals_oracle_sql)
from tests.conftest import SF_DIR


def md5h(x) -> int:
    """md5_long60(str(x)) — the builder's key mapping (no +1 shift)."""
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def _fixture(n):
    """n distinct keys with deterministic integer values."""
    h = np.array([md5h(f"key-{i}") for i in range(n)], dtype=np.int64)
    v = np.array([float(1 + (i * 3) % 11) for i in range(n)],
                 dtype=np.float64)
    return h, v


def _brute_state(h, v, k):
    """Reference replay: bottom-k by hash with per-key value sums."""
    order = np.argsort(h)
    return h[order][:k], v[order][:k]


def test_exact_below_k():
    h, v = _fixture(10)
    s = TupleSketch(k=32)
    s.update_batch(h, v)
    assert not s.is_full and s.theta == DOMAIN60
    assert s.estimate() == 10.0
    assert s.total_estimate() == v.sum()


def test_bottom_k_state_and_estimators():
    h, v = _fixture(200)
    k = 16
    s = TupleSketch(k=k)
    s.update_batch(h, v)
    bh, bv = _brute_state(h, v, k)
    assert np.array_equal(s.hashes, bh)
    assert np.array_equal(s.values, bv)
    theta = bh[-1]
    assert s.theta == theta
    assert s.estimate() == float(k - 1) * float(DOMAIN60) / float(theta)
    assert s.total_estimate() == (
        float(bv[:-1].sum()) * float(DOMAIN60) / float(theta))
    # the estimates should be in the right ballpark on uniform hashes
    assert 0.5 * 200 < s.estimate() < 2.0 * 200
    assert 0.4 * v.sum() < s.total_estimate() < 2.5 * v.sum()


def test_duplicate_keys_sum_min_max():
    h = np.array([md5h("a"), md5h("b"), md5h("a")], dtype=np.int64)
    v = np.array([3.0, 5.0, 4.0])
    for mode, expect_a in (("sum", 7.0), ("min", 3.0), ("max", 4.0)):
        s = TupleSketch(k=8, mode=mode)
        s.update_batch(h, v)
        got = dict(zip(s.hashes.tolist(), s.values.tolist()))
        assert got[md5h("a")] == expect_a and got[md5h("b")] == 5.0


def test_merge_tree_independence():
    h, v = _fixture(300)
    k = 24
    direct = TupleSketch(k=k)
    direct.update_batch(h, v)
    # 6 partials over an interleaved partitioning, merged two ways
    parts = []
    for i in range(6):
        p = TupleSketch(k=k)
        p.update_batch(h[i::6], v[i::6])
        parts.append(p)
    left = parts[0]
    for p in parts[1:]:
        left = left.merge(p)
    balanced = (parts[0].merge(parts[1])).merge(
        parts[2].merge(parts[3])).merge(parts[4].merge(parts[5]))
    for m in (left, balanced):
        assert np.array_equal(m.hashes, direct.hashes)
        assert np.array_equal(m.values, direct.values)
        assert m.serialize() == direct.serialize()


def test_merge_sums_split_keys():
    # the same key's value split across partials must sum exactly,
    # provided no partial evicted it (k large enough here)
    a, b = TupleSketch(k=8), TupleSketch(k=8)
    a.update_batch(np.array([md5h("x")]), np.array([2.0]))
    b.update_batch(np.array([md5h("x"), md5h("y")]), np.array([5.0, 1.0]))
    m = a.merge(b)
    got = dict(zip(m.hashes.tolist(), m.values.tolist()))
    assert got[md5h("x")] == 7.0 and got[md5h("y")] == 1.0


def test_intersection_total():
    h, v = _fixture(400)
    k = 32
    a, b = TupleSketch(k=k), TupleSketch(k=k)
    a.update_batch(h, v)                      # all 400
    b.update_batch(h[:200], v[:200])          # first half
    est = a.intersection_total_estimate(b)
    true = v[:200].sum()
    assert 0.3 * true < est < 3.0 * true
    # identical streams: intersection total == own total estimate family
    c = TupleSketch(k=k)
    c.update_batch(h, v)
    self_est = a.intersection_total_estimate(c)
    # inclusive joint-horizon rule counts all k retained entries
    assert self_est == float(a.values.sum()) * DOMAIN60 / a.theta


def test_serde_roundtrip_and_errors():
    h, v = _fixture(50)
    s = TupleSketch(k=16, mode="max")
    s.update_batch(h, v)
    r = TupleSketch.deserialize(s.serialize())
    assert (r.k, r.domain, r.mode) == (16, DOMAIN60, "max")
    assert np.array_equal(r.hashes, s.hashes)
    assert np.array_equal(r.values, s.values)
    with pytest.raises(ValueError):
        TupleSketch.deserialize(b"garbage")
    with pytest.raises(ValueError):
        s.merge(TupleSketch(k=8))
    with pytest.raises(ValueError):
        s.merge(TupleSketch(k=16, mode="sum"))
    with pytest.raises(ValueError):
        TupleSketch(k=4, mode="median")
    with pytest.raises(ValueError):
        s.update_batch(np.array([-1]), np.array([1.0]))


def test_distributed_totals_vs_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = tuple_totals_by_group(docs, "lang", "doc_id", "n_chars",
                                k=32).orderBy("lang")
    sql = tuple_totals_oracle_sql(
        "SELECT lang, doc_id::VARCHAR AS doc_id, n_chars FROM documents",
        "lang", "doc_id", "n_chars", k=32)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = con.execute(sql + " ORDER BY lang").fetchall()
    rows = [(r["lang"], r["n_retained"], r["theta"], r["est_distinct"],
             r["est_total"]) for r in got.collect()]
    assert len(rows) == len(want) > 0
    for g, w in zip(rows, want):
        assert g[0] == w[0] and g[1] == int(w[1]) and g[2] == int(w[2])
        assert g[3] == w[3] and g[4] == w[4]      # bit-exact floats


def test_distributed_partitioning_independence(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = tuple_totals_by_group(docs, "lang", "doc_id", "n_chars", k=16)
    b = tuple_totals_by_group(docs.repartition(17, "doc_id"),
                              "lang", "doc_id", "n_chars", k=16)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
