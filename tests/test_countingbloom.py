"""Counting Bloom filter: add/remove/contains semantics, merge
linearity + negation retraction, parity-vs-fast family agreement on
membership, to_bloom projection, weighted adds == repeated adds,
underflow guard, serde, and the distributed gate replayed bit-exact by
the DuckDB oracle."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.bloom import BloomFilter
from mahout_spark.core.countingbloom import CountingBloomFilter
from tests.conftest import SF_DIR


def _keys(n, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 60, n).astype(np.int64)


def test_add_remove_contains():
    k = _keys(500)
    f = CountingBloomFilter.from_capacity(1000, 0.01)
    f.add_batch(k)
    assert f.contains_batch(k).all()
    f.remove_batch(k[:200])
    assert f.contains_batch(k[200:]).all()       # no false negatives
    # removed keys are *usually* gone (collisions can retain a few)
    assert f.contains_batch(k[:200]).mean() < 0.2


def test_merge_linearity_and_negation():
    k = _keys(800)
    whole = CountingBloomFilter.from_capacity(2000, 0.01)
    whole.add_batch(k)
    a = CountingBloomFilter.from_capacity(2000, 0.01)
    b = CountingBloomFilter.from_capacity(2000, 0.01)
    a.add_batch(k[:300])
    b.add_batch(k[300:])
    m = a.merge(b)
    assert np.array_equal(m.counts, whole.counts)
    # retract partition a: counters equal a build of only b's keys
    retracted = m.merge(a.negate())
    assert np.array_equal(retracted.counts, b.counts)
    with pytest.raises(ValueError):
        a.merge(CountingBloomFilter.from_capacity(500, 0.01))


def test_same_positions_as_plain_bloom():
    k = _keys(300)
    for parity in (False, True):
        cbf = CountingBloomFilter.from_capacity(1000, 0.01, parity=parity)
        blf = BloomFilter.from_capacity(1000, 0.01, parity=parity)
        assert (cbf.m_bits, cbf.k) == (blf.m_bits, blf.k)
        assert np.array_equal(cbf._positions(k), blf._positions(k))
        cbf.add_batch(k)
        blf.add_batch(k)
        probes = _keys(1000, seed=9)
        assert np.array_equal(cbf.contains_batch(probes),
                              blf.contains_batch(probes))
        pb = cbf.to_bloom()
        assert np.array_equal(pb.bits, blf.bits)


def test_weighted_add_equals_repeats_and_guards():
    f = CountingBloomFilter.from_capacity(100, 0.05)
    g = CountingBloomFilter.from_capacity(100, 0.05)
    ks = np.array([11, 22, 33], dtype=np.int64)
    f.add_batch(ks, np.array([3.0, 1.0, 2.0]))
    g.add_batch(np.repeat(ks, [3, 1, 2]))
    assert np.array_equal(f.counts, g.counts)
    with pytest.raises(ValueError):
        f.add_batch(ks, np.array([1.0, -2.0, 1.0]))
    with pytest.raises(ValueError):
        f.add_batch(ks, np.array([1.5, 2.0, 1.0]))
    with pytest.raises(ValueError):      # underflow on over-removal
        g.remove_batch(np.array([22, 22], dtype=np.int64))


def test_serde_roundtrip():
    f = CountingBloomFilter.from_capacity(500, 0.01, seed=7, parity=True)
    f.add_batch(_keys(100))
    r = CountingBloomFilter.deserialize(f.serialize())
    assert (r.m_bits, r.k, r.seed, r.parity) == (f.m_bits, f.k, 7, True)
    assert np.array_equal(r.counts, f.counts)
    with pytest.raises(ValueError):
        CountingBloomFilter.deserialize(b"nope")


def test_gate_vs_duckdb_oracle(spark):
    import __spark_entry__ as e

    got = sorted(map(tuple,
                     e.queries()["counting_bloom_retract"](
                         spark, SF_DIR).collect()))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = sorted(map(tuple, con.execute(
        e.oracle_sql()["counting_bloom_retract"]).fetchall()))
    assert len(got) == len(want) > 0
    assert got == want
    # retraction did something: some probe's counter dropped to 0
    assert any(not r[2] for r in got) or all(r[1] > 0 for r in got)
