"""Priority sampling (DLT'07): exact-below-k, tau/w_hat goldens vs a
brute NumPy replay, merge-tree/order independence, duplicate-key weight
summing, estimator sanity, serde round-trip, and the distributed
priority_sample_weights query vs its DuckDB oracle."""

import hashlib

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.priority import DOMAIN60, PrioritySample
from mahout_spark.sketch.queries import (priority_sample_oracle_sql,
                                         priority_sample_weights)
from tests.conftest import SF_DIR


def md5u(x) -> int:
    """u = md5_long60(str(x)) + 1 — the builder's key mapping."""
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) + 1


def _fixture(n, k):
    """n items with deterministic heavy-tailed integer weights."""
    u = np.array([md5u(f"key-{i}") for i in range(n)], dtype=np.int64)
    w = np.array([float(1 + (i * i) % 97 + (i % 7) * 50)
                  for i in range(n)], dtype=np.float64)
    s = PrioritySample(k=k)
    s.update_batch(u, w)
    return u, w, s


def _brute(u, w, k):
    """Reference replay: top-(k+1) by (w/u desc, u asc); tau on the
    normalized (weight) scale — multiply first, then divide."""
    q = w / u
    order = np.lexsort((u, -q))
    i = order[k] if len(u) >= k + 1 else None
    tau = float((w[i] * DOMAIN60) / u[i]) if i is not None else 0.0
    top = order[:k]
    return u[top], w[top], tau


def test_exact_below_k():
    u, w, s = _fixture(10, k=64)
    assert not s.is_full
    assert s.tau() == 0.0
    su, sw, sh = s.sample()
    assert set(su.tolist()) == set(u.tolist())
    assert np.array_equal(np.sort(sh), np.sort(w))  # w_hat == w: exact
    assert s.estimate_total() == float(np.sum(w))


def test_golden_vs_brute_replay():
    u, w, s = _fixture(500, k=32)
    bu, bw, btau = _brute(u, w, 32)
    su, sw, sh = s.sample()
    assert np.array_equal(su, bu)
    assert np.array_equal(sw, bw)
    assert s.tau() == btau
    assert np.array_equal(sh, np.maximum(bw, btau))


def test_estimator_sanity():
    u, w, s = _fixture(2000, k=256)
    total = float(np.sum(w))
    # DLT'07: variance ~ total^2/(k-1); 5 sigma on this fixture
    assert abs(s.estimate_total() - total) / total < 5.0 / np.sqrt(255)
    # per-item estimator never shrinks a sampled weight
    _, sw, sh = s.sample()
    assert np.all(sh >= sw)


def test_merge_tree_and_order_independence():
    u, w, ref = _fixture(400, k=24)
    rng = np.random.RandomState(11)
    for n_parts in (3, 7, 13):
        perm = rng.permutation(len(u))
        acc = PrioritySample(k=24)
        for idx in np.array_split(perm, n_parts):
            part = PrioritySample(k=24)
            part.update_batch(u[idx], w[idx])
            acc = acc.merge(part)
        assert np.array_equal(acc.u, ref.u)
        assert np.array_equal(acc.w, ref.w)
    # balanced tree == left fold
    parts = []
    for idx in np.array_split(np.arange(len(u)), 4):
        p = PrioritySample(k=24)
        p.update_batch(u[idx], w[idx])
        parts.append(p)
    tree = parts[0].merge(parts[1]).merge(parts[2].merge(parts[3]))
    assert np.array_equal(tree.u, ref.u) and np.array_equal(tree.w, ref.w)


def test_duplicate_key_sums_weights():
    s = PrioritySample(k=8)
    s.update_batch(np.array([5, 9, 5]), np.array([2.0, 1.0, 3.0]))
    assert s.u.tolist() == [5, 9]
    assert s.w.tolist() == [5.0, 1.0]
    # same across two batches
    t = PrioritySample(k=8)
    t.update_batch(np.array([5, 9]), np.array([2.0, 1.0]))
    t.update_batch(np.array([5]), np.array([3.0]))
    assert np.array_equal(t.u, s.u) and np.array_equal(t.w, s.w)


def test_validation():
    s = PrioritySample(k=4)
    with pytest.raises(ValueError, match="positive"):
        s.update_batch(np.array([1]), np.array([0.0]))
    with pytest.raises(ValueError, match="domain"):
        s.update_batch(np.array([0]), np.array([1.0]))
    with pytest.raises(ValueError, match="config"):
        s.merge(PrioritySample(k=5))


def test_serde_round_trip():
    _, _, s = _fixture(100, k=16)
    r = PrioritySample.deserialize(s.serialize())
    assert (r.k, r.domain) == (s.k, s.domain)
    assert np.array_equal(r.u, s.u) and np.array_equal(r.w, s.w)
    with pytest.raises(ValueError):
        PrioritySample.deserialize(b"nope")


def test_distributed_vs_duckdb_oracle(spark):
    """The whole distributed build (JVM per-key sum preagg -> partial
    samples -> salted merge) must equal the single-window SQL replay
    bit-for-bit, including tau and every w_hat."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = priority_sample_weights(docs, "doc_id", "n_chars", k=16) \
        .orderBy("rank").collect()
    sql = priority_sample_oracle_sql(
        f"SELECT * FROM '{SF_DIR}/documents.parquet'",
        "doc_id::VARCHAR", "n_chars", k=16)
    exp = duckdb.sql(sql + " ORDER BY rank").fetchall()
    assert len(got) == len(exp) == 16
    for g, e in zip(got, exp):
        assert (g["rank"], g["u"]) == (e[0], e[1])
        assert g["w"] == e[2] and g["tau"] == e[3] and g["w_hat"] == e[4]


def test_distributed_partitioning_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = priority_sample_weights(docs, "doc_id", "n_chars", k=12).collect()
    b = priority_sample_weights(docs.repartition(17), "doc_id",
                                "n_chars", k=12).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
