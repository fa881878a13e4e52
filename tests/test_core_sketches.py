"""Kernel-level sketch tests (no Spark): error bounds, merge laws, serde.

Test strategy mirrors the reference's distributed-vs-in-core oracle style
(SURVEY.md §5) plus the north rule's merge-associativity requirement.
"""

import collections

import numpy as np
import pytest

from mahout_spark.core.bloom import BloomFilter
from mahout_spark.core.cms import (CountMinSketch, cms_shape, compute_config,
                                   f_measure, proba_inserted,
                                   proba_not_exact_retrieve)
from mahout_spark.core.hll import HyperLogLog
from mahout_spark.core.kll import KLLSketch
from mahout_spark.core.llr import (llr_from_cooccurrence,
                                   log_likelihood_ratio, xlogx)
from mahout_spark.core.tdigest import OnlineSummarizer, TDigest


def zipf_keys(n=50_000, vocab=4_000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, size=n).clip(max=vocab).astype(np.int64)


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------

class TestCMS:
    def test_shape_formulas(self):
        # w = ceil(e/eps), d = ceil(ln(1/delta)) — AbstractCountMinSketch.java:78-79
        d, w = cms_shape(0.01, 0.01)
        assert w == 272 and d == 5

    def test_shape_guards(self):
        with pytest.raises(ValueError):
            cms_shape(0.01, 0.5)  # delta > 1/e
        with pytest.raises(ValueError):
            cms_shape(3.0, 0.01)  # eps > e

    @pytest.mark.parametrize("parity", [False, True])
    def test_point_query_bound(self, parity):
        keys = zipf_keys(20_000 if parity else 100_000)
        eps, delta = 0.005, 0.01
        cms = CountMinSketch.from_error_bound(eps, delta, seed=7, parity=parity)
        cms.update_batch(keys)
        exact = collections.Counter(keys.tolist())
        test = np.fromiter(exact.keys(), dtype=np.int64)
        est = cms.point_batch(test)
        ex = np.array([exact[int(k)] for k in test])
        # never underestimates
        assert (est >= ex - 1e-9).all()
        # overestimate <= eps*N w.p. >= 1-delta
        n = len(keys)
        frac_ok = np.mean(est <= ex + eps * n)
        assert frac_ok >= 1 - delta

    def test_merge_bit_exact_and_associative(self):
        keys = zipf_keys()
        whole = CountMinSketch.from_error_bound(0.01, 0.01, seed=3)
        whole.update_batch(keys)
        parts = np.array_split(keys, 5)
        sks = []
        for p in parts:
            s = CountMinSketch.from_error_bound(0.01, 0.01, seed=3)
            s.update_batch(p)
            sks.append(s)
        left = sks[0]
        for s in sks[1:]:
            left = left.merge(s)
        right = sks[0].merge(sks[1].merge(sks[2].merge(sks[3].merge(sks[4]))))
        assert np.array_equal(left.counts, right.counts)
        assert np.array_equal(left.counts, whole.counts)

    def test_merge_config_mismatch(self):
        a = CountMinSketch(3, 100, seed=1)
        b = CountMinSketch(3, 100, seed=2)
        with pytest.raises(ValueError):
            a.merge(b)

    def test_cosine_reference_semantics(self):
        # identical sketches -> cosine 1; empty -> NaN
        a = CountMinSketch(4, 64, seed=5)
        a.update_batch(np.arange(100))
        assert CountMinSketch.cosine(a, a) == pytest.approx(1.0)
        e1, e2 = CountMinSketch(4, 64, seed=5), CountMinSketch(4, 64, seed=5)
        assert np.isnan(CountMinSketch.cosine(e1, e2))

    def test_cosine_tracks_exact(self):
        rng = np.random.default_rng(1)
        items = 300
        prefs_a = rng.integers(1, 6, items).astype(float)
        prefs_b = rng.integers(1, 6, items).astype(float)
        mask_a, mask_b = rng.random(items) < 0.5, rng.random(items) < 0.5
        va, vb = prefs_a * mask_a, prefs_b * mask_b
        exact = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        sa = CountMinSketch.from_error_bound(0.001, 0.01, seed=11)
        sb = CountMinSketch.from_error_bound(0.001, 0.01, seed=11)
        sa.update_batch(np.where(mask_a)[0], va[mask_a])
        sb.update_batch(np.where(mask_b)[0], vb[mask_b])
        approx = CountMinSketch.cosine(sa, sb)
        assert abs(approx - exact) < 0.05

    def test_parity_vs_fast_same_bound_different_family(self):
        keys = zipf_keys(5_000)
        p = CountMinSketch.from_error_bound(0.01, 0.05, seed=42, parity=True)
        f = CountMinSketch.from_error_bound(0.01, 0.05, seed=42, parity=False)
        p.update_batch(keys)
        f.update_batch(keys)
        assert p.counts.sum() == pytest.approx(f.counts.sum())  # same mass

    def test_serde_roundtrip(self):
        cms = CountMinSketch.from_error_bound(0.01, 0.01, seed=9)
        cms.update_batch(zipf_keys(1000))
        back = CountMinSketch.deserialize(cms.serialize())
        assert np.array_equal(back.counts, cms.counts)
        assert (back.depth, back.width, back.seed) == (cms.depth, cms.width, cms.seed)

    def test_config_search(self):
        # formulas from CountMinSketchConfig.java:170-219
        assert proba_not_exact_retrieve(100, 3, 50) == pytest.approx(
            (1 - (1 - 1 / 100) ** 50) ** 3)
        assert proba_inserted(100, 3, 50, 500) <= 1.0
        assert f_measure(100, 3, 50, 500, 1.0) >= 0.0
        delta, eps = compute_config(n=200, u=2000, q=1.0, max_width=500)
        d, w = cms_shape(eps, delta)
        assert 1 <= d < 25 and w <= 500


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------

class TestHLL:
    def test_sparse_mode_exact(self):
        keys = zipf_keys(30_000, vocab=2_000)
        h = HyperLogLog(p=14, seed=1, sparse_limit=10_000)
        h.update_batch(keys)
        assert h.is_sparse
        assert h.count() == len(set(keys.tolist()))

    def test_dense_error(self):
        rng = np.random.default_rng(2)
        keys = rng.integers(0, 2**50, 300_000)
        h = HyperLogLog(p=14, seed=1, sparse_limit=16)
        h.update_batch(keys)
        true = len(set(keys.tolist()))
        rel = abs(h.count() - true) / true
        assert rel < 3 * 1.04 / np.sqrt(2**14)

    def test_merge_equals_single_pass(self):
        keys = zipf_keys(100_000, vocab=60_000)
        whole = HyperLogLog(p=12, seed=4, sparse_limit=100)
        whole.update_batch(keys)
        parts = np.array_split(keys, 7)
        merged = None
        for p in parts:
            h = HyperLogLog(p=12, seed=4, sparse_limit=100)
            h.update_batch(p)
            merged = h if merged is None else merged.merge(h)
        assert np.array_equal(merged.registers, whole.registers)

    def test_sparse_dense_mixed_merge(self):
        big = HyperLogLog(p=12, seed=4, sparse_limit=10)
        big.update_batch(np.arange(1000))
        small = HyperLogLog(p=12, seed=4, sparse_limit=10)
        small.update_batch(np.arange(995, 1005))
        m1, m2 = big.merge(small), small.merge(big)
        assert np.array_equal(m1.registers, m2.registers)

    def test_serde(self):
        for limit in (10, 10_000):
            h = HyperLogLog(p=12, seed=4, sparse_limit=limit)
            h.update_batch(zipf_keys(5_000))
            back = HyperLogLog.deserialize(h.serialize(), sparse_limit=limit)
            assert back.count() == h.count()


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

class TestBloom:
    def test_no_false_negatives(self):
        keys = np.arange(10_000, dtype=np.int64)
        b = BloomFilter.from_capacity(10_000, 0.01, seed=3)
        b.add_batch(keys)
        assert b.contains_batch(keys).all()

    def test_fp_rate_within_2x_design(self):
        b = BloomFilter.from_capacity(10_000, 0.01, seed=3)
        b.add_batch(np.arange(10_000, dtype=np.int64))
        probe = np.arange(10**7, 10**7 + 50_000, dtype=np.int64)
        assert b.contains_batch(probe).mean() < 0.02

    def test_merge_is_or_and_associative(self):
        b1 = BloomFilter.from_capacity(1000, 0.01, seed=5)
        b2 = BloomFilter.from_capacity(1000, 0.01, seed=5)
        b3 = BloomFilter.from_capacity(1000, 0.01, seed=5)
        b1.add_batch(np.arange(0, 300))
        b2.add_batch(np.arange(300, 600))
        b3.add_batch(np.arange(600, 900))
        m1 = b1.merge(b2).merge(b3)
        m2 = b1.merge(b2.merge(b3))
        assert np.array_equal(m1.bits, m2.bits)
        assert m1.contains_batch(np.arange(900)).all()

    def test_serde(self):
        b = BloomFilter.from_capacity(1000, 0.01, seed=5)
        b.add_batch(np.arange(500))
        back = BloomFilter.deserialize(b.serialize())
        assert np.array_equal(back.bits, b.bits)


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------

class TestTDigest:
    def test_quantile_accuracy(self):
        rng = np.random.default_rng(6)
        vals = rng.normal(size=200_000)
        td = TDigest(100.0)
        td.update_batch(vals)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            got = td.quantile(q)
            lo, hi = np.quantile(vals, max(0, q - 0.01)), np.quantile(vals, min(1, q + 0.01))
            assert lo - 1e-6 <= got <= hi + 1e-6, (q, got, lo, hi)

    def test_extremes_exact(self):
        vals = np.arange(1000.0)
        td = TDigest(100.0)
        td.update_batch(vals)
        assert td.quantile(0.0) == 0.0
        assert td.quantile(1.0) == 999.0

    def test_merge_error_bounded(self):
        rng = np.random.default_rng(7)
        vals = rng.exponential(size=100_000)
        parts = np.array_split(vals, 9)
        merged = None
        for p in parts:
            t = TDigest(100.0)
            t.update_batch(p)
            merged = t if merged is None else merged.merge(t)
        for q in (0.1, 0.5, 0.9, 0.99):
            got = merged.quantile(q)
            lo, hi = np.quantile(vals, max(0, q - 0.02)), np.quantile(vals, min(1, q + 0.02))
            assert lo - 1e-9 <= got <= hi + 1e-9

    def test_nan_values_drop_their_weights(self):
        # regression: a NaN value must drop its weight too, or _compress
        # pairs a shortened value array with full-length weights and
        # silently mis-weights every centroid (value-dedup preagg path)
        vals = np.array([1.0, np.nan, 2.0, 3.0, np.nan, 4.0])
        wts = np.array([10.0, 999.0, 20.0, 30.0, 999.0, 40.0])
        td = TDigest(100.0)
        td.update_batch(vals, wts)
        td._compress()
        clean = TDigest(100.0)
        clean.update_batch(np.array([1.0, 2.0, 3.0, 4.0]),
                           np.array([10.0, 20.0, 30.0, 40.0]))
        clean._compress()
        assert td.weights.sum() == clean.weights.sum() == 100.0
        for q in (0.1, 0.5, 0.9):
            assert td.quantile(q) == clean.quantile(q)

    def test_centroid_budget(self):
        td = TDigest(100.0)
        td.update_batch(np.random.default_rng(8).normal(size=500_000))
        td._compress()
        assert len(td.means) < 200  # ~delta centroids

    def test_serde(self):
        td = TDigest(100.0)
        td.update_batch(np.arange(10_000.0))
        back = TDigest.deserialize(td.serialize())
        assert back.quantile(0.5) == td.quantile(0.5)

    def test_online_summarizer_facade(self):
        # OnlineSummarizer.java parity: count/mean/sd/median/quartiles
        s = OnlineSummarizer()
        vals = np.arange(1, 102.0)
        s.add_batch(vals)
        assert s.count == 101
        assert s.mean() == pytest.approx(51.0)
        assert s.sd() == pytest.approx(np.std(vals, ddof=1))
        assert abs(s.median() - 51.0) <= 1.0


# ---------------------------------------------------------------------------
# KLL
# ---------------------------------------------------------------------------

class TestKLL:
    def test_exact_mode_rank_ceil(self):
        # matches DuckDB quantile_disc: element at 1-based rank ceil(q*n)
        k = KLLSketch(200, seed=1)
        k.update_batch(np.array([1.0, 2, 3, 4]))
        assert k.is_exact
        assert k.quantile(0.5) == 2.0
        k2 = KLLSketch(400, seed=1)
        k2.update_batch(np.arange(1.0, 11.0))
        assert [k2.quantile(q) for q in (0.25, 0.5, 0.75)] == [3.0, 5.0, 8.0]

    def test_rank_error(self):
        rng = np.random.default_rng(9)
        vals = rng.normal(size=150_000)
        k = KLLSketch(200, seed=1)
        k.update_batch(vals)
        svals = np.sort(vals)
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            got = k.quantile(q)
            true_rank = np.searchsorted(svals, got) / len(svals)
            assert abs(true_rank - q) < 0.02

    def test_merge_rank_error(self):
        rng = np.random.default_rng(10)
        vals = rng.uniform(size=120_000)
        parts = np.array_split(vals, 8)
        merged = None
        for p in parts:
            s = KLLSketch(200, seed=1)
            s.update_batch(p)
            merged = s if merged is None else merged.merge(s)
        for q in (0.1, 0.5, 0.9):
            assert abs(merged.quantile(q) - q) < 0.03  # uniform: value≈rank

    def test_deterministic_rebuild(self):
        vals = np.random.default_rng(11).normal(size=50_000)
        a, b = KLLSketch(200, seed=1), KLLSketch(200, seed=1)
        a.update_batch(vals)
        b.update_batch(vals)
        assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))

    def test_serde(self):
        k = KLLSketch(200, seed=1)
        k.update_batch(np.random.default_rng(12).normal(size=30_000))
        back = KLLSketch.deserialize(k.serialize())
        assert back.quantile(0.5) == k.quantile(0.5)
        assert back.n == k.n


# ---------------------------------------------------------------------------
# LLR
# ---------------------------------------------------------------------------

class TestLLR:
    def test_reference_golden(self):
        # SimilarityAnalysisSuite.scala:420 — "calculated by hadoop itemsimilarity"
        assert llr_from_cooccurrence(1, 2, 1, 6) == 2.6341457841558764

    def test_raw_contingency(self):
        assert log_likelihood_ratio(1, 0, 1, 4) == pytest.approx(
            2.6341457841558764)

    def test_independence_is_zero(self):
        # perfectly independent counts -> LLR ~ 0
        assert log_likelihood_ratio(10, 10, 10, 10) == pytest.approx(0.0, abs=1e-9)

    def test_xlogx_zero(self):
        assert xlogx(np.array([0.0]))[0] == 0.0

    def test_vectorized(self):
        out = llr_from_cooccurrence(
            np.array([1, 2]), np.array([2, 2]), np.array([1, 2]),
            np.array([6, 6]))
        assert out[0] == pytest.approx(2.6341457841558764)
