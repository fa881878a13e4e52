"""Property-based sketch laws (hypothesis) — the reference ships no

property tests (SURVEY §5 gap); these pin the algebraic contracts the
distributed layer relies on for ANY input, not just fixtures:

- merge associativity + commutativity (bit-exact for CMS/HLL/Bloom);
- build(a ++ b) == merge(build(a), build(b)) (partition invariance);
- CMS never underestimates; point(k) == 0 for never-inserted keys only
  when no collision — but always >= 0;
- serde round-trip identity.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mahout_spark.core.bloom import BloomFilter
from mahout_spark.core.cms import CountMinSketch
from mahout_spark.core.hll import HyperLogLog
from mahout_spark.core.kll import KLLSketch
from mahout_spark.core.tdigest import TDigest

keys_st = st.lists(st.integers(min_value=-2**62, max_value=2**62),
                   min_size=0, max_size=300)
vals_st = st.lists(st.floats(min_value=-1e6, max_value=1e6,
                             allow_nan=False), min_size=0, max_size=300)


def build_cms(keys):
    s = CountMinSketch(3, 64, seed=7)
    if keys:
        s.update_batch(np.array(keys, dtype=np.int64))
    return s


@settings(max_examples=40, deadline=None)
@given(keys_st, keys_st, keys_st)
def test_cms_merge_associative_commutative(a, b, c):
    sa, sb, sc = build_cms(a), build_cms(b), build_cms(c)
    left = sa.merge(sb).merge(sc)
    right = sa.merge(sb.merge(sc))
    swapped = sc.merge(sb).merge(sa)
    assert left.serialize() == right.serialize() == swapped.serialize()


@settings(max_examples=40, deadline=None)
@given(keys_st, keys_st)
def test_cms_partition_invariance_and_bound(a, b):
    merged = build_cms(a).merge(build_cms(b))
    single = build_cms(a + b)
    assert merged.serialize() == single.serialize()
    if a:
        from collections import Counter

        exact = Counter(a + b)
        for k in set(a):
            assert single.point(k) >= exact[k] - 1e-9


@settings(max_examples=40, deadline=None)
@given(keys_st, keys_st)
def test_hll_merge_laws(a, b):
    def build(ks):
        h = HyperLogLog(p=8, seed=3, sparse_limit=16)
        if ks:
            h.update_batch(np.array(ks, dtype=np.int64))
        return h

    m = build(a).merge(build(b))
    s = build(a + b)
    assert abs(m.count() - s.count()) < 1e-9
    rt = HyperLogLog.deserialize(m.serialize(), sparse_limit=16)
    assert abs(rt.count() - m.count()) < 1e-9


@settings(max_examples=40, deadline=None)
@given(keys_st, keys_st)
def test_bloom_merge_no_false_negatives(a, b):
    def build(ks):
        f = BloomFilter.from_capacity(1000, 0.01, seed=2)
        if ks:
            f.add_batch(np.array(ks, dtype=np.int64))
        return f

    m = build(a).merge(build(b))
    for k in (a + b)[:50]:
        assert m.contains_batch(np.array([k], dtype=np.int64))[0]
    assert m.serialize() == build(a + b).serialize()


@settings(max_examples=25, deadline=None)
@given(vals_st, vals_st)
def test_quantile_sketch_merge_bounds(a, b):
    both = a + b
    if len(both) < 10:
        return
    for cls, kw in ((TDigest, {"compression": 50.0}),
                    (KLLSketch, {"k": 64, "seed": 1})):
        s1, s2 = cls(**kw), cls(**kw)
        if a:
            s1.update_batch(np.array(a))
        if b:
            s2.update_batch(np.array(b))
        m = s1.merge(s2)
        lo, hi = min(both), max(both)
        for q in (0.1, 0.5, 0.9):
            v = m.quantile(q)
            assert lo - 1e-9 <= v <= hi + 1e-9
        # rank sanity: median between 25th/75th exact percentiles is not
        # guaranteed for tiny inputs, but monotonicity of quantiles is
        qs = [m.quantile(q) for q in (0.1, 0.3, 0.5, 0.7, 0.9)]
        assert all(x <= y + 1e-9 for x, y in zip(qs, qs[1:]))


# -- REQ (relative-error quantiles) -------------------------------------------

def _build_req(vals):
    from mahout_spark.core.req import REQSketch

    s = REQSketch(k=8, seed=7)
    if vals:
        s.update_batch(np.array(vals, dtype=np.float64))
    return s


@settings(max_examples=30, deadline=None)
@given(vals_st)
def test_req_count_and_range(vals):
    s = _build_req(vals)
    assert s.n == len(vals)
    if vals:
        q = s.quantile(0.5)
        assert min(vals) <= q <= max(vals)
        # quantiles are retained values: every estimate is a real input
        assert q in set(vals) or any(abs(q - v) == 0 for v in vals)
    else:
        assert np.isnan(s.quantile(0.5))


@settings(max_examples=30, deadline=None)
@given(vals_st, vals_st)
def test_req_merge_count_and_serde(a, b):
    m = _build_req(a).merge(_build_req(b))
    assert m.n == len(a) + len(b)
    from mahout_spark.core.req import REQSketch

    rt = REQSketch.deserialize(m.serialize())
    assert rt.n == m.n
    for q in (0.1, 0.5, 0.9):
        x, y = rt.quantile(q), m.quantile(q)
        assert (np.isnan(x) and np.isnan(y)) or x == y


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=1e6, allow_nan=False),
                min_size=50, max_size=400))
def test_req_monotone_quantiles(vals):
    s = _build_req(vals)
    qs = [s.quantile(q) for q in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99)]
    assert qs == sorted(qs)
