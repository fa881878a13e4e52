"""KMV/Theta bottom-k distinct sketch: exact-below-k, estimator
goldens vs brute replay, order/merge-tree independence, union =
bottom-k-of-union property, intersection horizon rule, serde, and the
distributed group-overlap query vs its DuckDB oracle."""

import hashlib

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.theta import DOMAIN60, ThetaSketch
from mahout_spark.sketch.queries import (theta_group_overlap,
                                         theta_overlap_oracle_sql)


def md5h(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def _hashes(items):
    return np.array(sorted({md5h(i) for i in items}), dtype=np.int64)


def _sk(items, k):
    s = ThetaSketch(k=k)
    s.update_batch(np.array([md5h(i) for i in items], dtype=np.int64))
    return s


def test_exact_below_k():
    s = _sk(range(10), k=64)
    assert not s.is_full
    assert s.estimate() == 10.0
    assert s.theta == DOMAIN60


def test_estimator_golden_when_full():
    items = [f"item-{i}" for i in range(1000)]
    k = 32
    s = _sk(items, k)
    h = _hashes(items)
    assert np.array_equal(s.hashes, h[:k])
    expected = (k - 1) * float(DOMAIN60) / float(h[k - 1])
    assert s.estimate() == expected
    # unbiased-ish: within 3.5/sqrt(k-1) relative error on this fixture
    assert abs(s.estimate() - 1000) / 1000 < 3.5 / np.sqrt(k - 1)


def test_order_and_merge_tree_independence():
    items = [f"w{i}" for i in range(500)]
    k = 16
    ref = _sk(items, k)
    rng = np.random.RandomState(7)
    for _ in range(3):
        perm = rng.permutation(items)
        s = ThetaSketch(k=k)
        for chunk in np.array_split(perm, 7):
            part = ThetaSketch(k=k)
            part.update_batch(np.array([md5h(i) for i in chunk]))
            s = s.merge(part)
        assert np.array_equal(s.hashes, ref.hashes)


def test_union_is_bottom_k_of_union():
    a_items = [f"a{i}" for i in range(300)]
    b_items = [f"b{i}" for i in range(300)] + a_items[:100]
    k = 24
    u = _sk(a_items, k).union(_sk(b_items, k))
    brute = _hashes(set(a_items) | set(b_items))[:k]
    assert np.array_equal(u.hashes, brute)
    assert u.estimate() == _sk(set(a_items) | set(b_items), k).estimate()


def test_intersection_horizon_rule():
    shared = [f"s{i}" for i in range(200)]
    a = _sk(shared + [f"a{i}" for i in range(300)], 32)
    b = _sk(shared + [f"b{i}" for i in range(300)], 32)
    rho, theta = a.intersection_count(b)
    assert theta == min(a.theta, b.theta)
    # replay: common retained hashes under theta
    common = np.intersect1d(a.hashes, b.hashes)
    assert rho == int(np.count_nonzero(common <= theta))
    est = a.intersection_estimate(b)
    assert est == rho * float(DOMAIN60) / float(theta)
    # sanity: in the right ballpark of the true 200
    assert 50 < est < 500
    j = a.jaccard(b)
    assert j == est / a.union(b).estimate()


def test_exact_sets_exact_intersection():
    a = _sk(["x", "y", "z"], 64)
    b = _sk(["y", "z", "q"], 64)
    assert a.intersection_estimate(b) == 2.0
    assert a.union(b).estimate() == 4.0


def test_serde_and_errors():
    s = _sk(range(100), 16)
    r = ThetaSketch.deserialize(s.serialize())
    assert r.k == 16 and np.array_equal(r.hashes, s.hashes)
    with pytest.raises(ValueError):
        ThetaSketch.deserialize(b"garbage")
    with pytest.raises(ValueError):
        s.merge(ThetaSketch(k=8))
    with pytest.raises(ValueError):
        s.update_batch(np.array([-1]))
    empty = ThetaSketch(k=4)
    assert empty.estimate() == 0.0
    assert empty.jaccard(s) == 0.0


EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_group_overlap_vs_duckdb(spark):
    ev = spark.read.parquet(EVENTS)
    out = theta_group_overlap(ev, "event_type", "user_id", k=16)
    got = sorted(map(tuple, out.collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{EVENTS}')")
    src = "SELECT event_type, user_id::VARCHAR AS ukey FROM events"
    ora = sorted(map(tuple, con.sql(theta_overlap_oracle_sql(
        src, "event_type", "ukey", k=16)).fetchall()))
    assert got == ora
    assert len(got) == 10    # C(5,2) event-type pairs


def test_group_overlap_partitioning_invariant(spark):
    ev = spark.read.parquet(EVENTS)
    a = sorted(map(tuple, theta_group_overlap(
        ev, "event_type", "user_id", k=16).collect()))
    b = sorted(map(tuple, theta_group_overlap(
        ev.repartition(13), "event_type", "user_id", k=16).collect()))
    assert a == b


def test_a_not_b_partition_identity_and_exact():
    shared = [f"s{i}" for i in range(200)]
    a = _sk(shared + [f"a{i}" for i in range(300)], 32)
    b = _sk(shared + [f"b{i}" for i in range(300)], 32)
    rho_int, theta = a.intersection_count(b)
    rho_anb, theta2 = a.a_not_b_count(b)
    assert theta2 == theta
    # partition identity: A's retained hashes under theta split exactly
    # into (in B) + (not in B)
    assert rho_int + rho_anb == int(np.count_nonzero(a.hashes <= theta))
    est = a.a_not_b_estimate(b)
    assert est == rho_anb * float(DOMAIN60) / float(theta)
    # true |A \ B| = 300; ballpark under the k=32 estimator
    assert 50 < est < 1200
    # exact regime: small sets, both below k
    x = _sk(["x", "y", "z"], 64)
    y = _sk(["y", "z", "q"], 64)
    assert x.a_not_b_estimate(y) == 1.0
    assert y.a_not_b_estimate(x) == 1.0
    # disjoint exact
    assert x.a_not_b_estimate(_sk(["q"], 64)) == 3.0
