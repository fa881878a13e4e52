"""math/random sampler family — deterministic replays + statistical laws.

Reference anchors: Multinomial.java (heap tree + probe-order test trick),
ChineseRestaurant.java (Pitman-Yor growth), Empirical.java (inverse ECDF),
PoissonSampler.java (pmf partial sums), Missing.java (shared pattern),
MultiNormal.java (A u + m).
"""
import math

import numpy as np
import pytest

from mahout_spark.core.random import (ChineseRestaurant, Empirical,
                                      IndianBuffet, Missing, MultiNormal,
                                      Multinomial, Normal, PoissonSampler,
                                      WeightedThing, _poisson_pmf)


class TestMultinomial:
    def build(self):
        m = Multinomial()
        for i, w in enumerate([1.0, 2.0, 4.0, 8.0, 16.0]):
            m.add(f"v{i}", w)
        return m

    def test_weights_and_probabilities(self):
        m = self.build()
        assert m.total_weight == 31.0
        assert m.get_weight("v3") == 8.0
        assert m.get_probability("v4") == 16.0 / 31.0
        assert m.get_weight("nope") == 0.0
        assert set(m) == {f"v{i}" for i in range(5)}

    def test_java_probe_order_structural_parity(self):
        # _leaf_weights mirrors Multinomial.java:168-185 getWeights():
        # deepest row first, then the second row INCLUDING the slot that
        # became internal (tree weight 17 = 1 + 16) — pinning the exact
        # heap layout the "parent comes down" insertion produces
        m = self.build()
        assert m._leaf_weights() == [1.0, 16.0, 17.0, 4.0, 2.0, 8.0]

    def test_sample_u_probes_every_tree_decision(self):
        # probing just before/after each cumulative in-order leaf weight
        # exercises every left/right branch; each u must land on the
        # leaf whose cumulative interval contains it
        m = self.build()
        size = len(m._weight)

        def in_order(n):
            if 2 * n < size:
                yield from in_order(2 * n)
                yield from in_order(2 * n + 1)
            else:
                yield m._values[n], m._weight[n]

        leaves = list(in_order(1))
        # heap: [v0:1, v4:16, v2:4, v1:2, v3:8] in sample-space order
        assert leaves == [("v0", 1.0), ("v4", 16.0), ("v2", 4.0),
                          ("v1", 2.0), ("v3", 8.0)]
        cum = np.cumsum([0.0] + [w for _, w in leaves])
        total = m.total_weight
        eps = 1e-12
        for i, (v, _) in enumerate(leaves):
            lo, hi = cum[i] / total, cum[i + 1] / total
            assert m.sample(lo + eps) == v
            assert m.sample((lo + hi) / 2) == v
            assert m.sample(hi - eps) == v

    def test_set_and_phantom_delete(self):
        m = self.build()
        m.set("v2", 10.0)
        assert m.get_weight("v2") == 10.0
        assert m.total_weight == 37.0
        m.delete("v0")
        assert m.total_weight == 36.0
        assert m.get_weight("v0") == 0.0
        assert set(m) == {"v1", "v2", "v3", "v4"}  # phantom skipped
        # deleted mass is gone from sampling: v0 never comes back
        got = {m.sample(u) for u in np.linspace(1e-9, 1 - 1e-9, 500)}
        assert "v0" not in got and got == {"v1", "v2", "v3", "v4"}

    def test_add_duplicate_and_empty_errors(self):
        m = Multinomial()
        with pytest.raises(ValueError):
            m.sample(0.5)
        m.add("a", 1.0)
        with pytest.raises(ValueError):
            m.add("a", 2.0)

    def test_empirical_frequencies_match_weights(self):
        m = Multinomial([WeightedThing("a", 1.0), WeightedThing("b", 3.0)],
                        seed=7)
        n = 20000
        hits = sum(m.sample() == "b" for _ in range(n))
        assert abs(hits / n - 0.75) < 0.02


class TestChineseRestaurant:
    def test_deterministic_replay(self):
        # hand-trace: alpha=1, first draw always opens table 0
        crp = ChineseRestaurant(1.0)
        assert crp.sample(0.99) == 0          # no tables yet -> new
        # state: w=[1], W=1, alpha+W=2; u*2 < 1 -> table 0 again
        assert crp.sample(0.49) == 0
        # w=[2], W=2; u=0.8 -> u*3=2.4 >= 2 -> new table 1
        assert crp.sample(0.8) == 1
        assert crp.size() == 2 and crp.count() == 3
        assert crp.count(0) == 2 and crp.count(1) == 1 and crp.count(5) == 0

    def test_dirichlet_growth_logarithmic(self):
        crp = ChineseRestaurant(5.0, seed=11)
        for _ in range(20000):
            crp.sample()
        # O(alpha log T): ~ 5 ln 20000 ~ 50; generous band
        assert 25 <= crp.size() <= 110

    def test_pitman_yor_grows_faster(self):
        a = ChineseRestaurant(5.0, seed=3)
        b = ChineseRestaurant(5.0, discount=0.5, seed=3)
        for _ in range(20000):
            a.sample()
            b.sample()
        assert b.size() > 2 * a.size()  # T^0.5 beats log T

    def test_validation(self):
        with pytest.raises(ValueError):
            ChineseRestaurant(0.0)
        with pytest.raises(ValueError):
            ChineseRestaurant(1.0, discount=1.5)


class TestEmpirical:
    def test_linear_interpolation_exact(self):
        # knots at (0,1), (0.5,3), (1,10); no tails -> no squeeze
        e = Empirical(False, False, 100, 0.0, 1, 0.5, 3, 1.0, 10)
        assert e.sample(0.0) == pytest.approx(1.0)
        assert e.sample(0.25) == pytest.approx(2.0)
        assert e.sample(0.5 - 1e-12) == pytest.approx(3.0, abs=1e-9)
        assert e.sample(0.75) == pytest.approx(6.5)

    def test_tails_are_exponential_and_monotonic(self):
        e = Empirical(True, True, 100, 0.0, 1, 0.5, 3, 1.0, 10)
        lo = e.sample(1e-6)
        hi = e.sample(1 - 1e-6)
        assert lo < 1.0 and hi > 10.0
        us = np.linspace(1e-6, 1 - 1e-6, 200)
        vals = [e.sample(u) for u in us]
        assert all(b >= a for a, b in zip(vals, vals[1:]))

    def test_validation(self):
        with pytest.raises(ValueError):
            Empirical(False, False, 100, 0.1, 1, 1.0, 10)  # no 0 knot
        with pytest.raises(ValueError):
            Empirical(True, True, 2, 0.0, 1, 1.0, 10)      # samples < 3
        with pytest.raises(ValueError):
            Empirical(True, True, 100, 0.0, 1, 0.5, 0.5, 1.0, 10)


class TestPoisson:
    def test_distribution_matches_pmf(self):
        # sample(u) walks the cached Multinomial's heap, so the u->k map
        # is NOT the quantile function (heap order != insertion order —
        # same in the reference); the contract is distributional: the
        # preimage of each k under uniform u carries pmf(k) mass
        lam = 3.0
        p = PoissonSampler(lam, seed=17)
        n = 40000
        from collections import Counter
        freq = Counter(p.sample() for _ in range(n))
        for k in range(9):
            assert abs(freq[k] / n - _poisson_pmf(lam, k)) < 0.012, k

    def test_mean_matches_lambda(self):
        p = PoissonSampler(4.2, seed=5)
        xs = [p.sample() for _ in range(20000)]
        assert abs(np.mean(xs) - 4.2) < 0.08
        assert abs(np.var(xs) - 4.2) < 0.3


class TestOthers:
    def test_normal_moments(self):
        n = Normal(3.0, 2.0, seed=9)
        xs = np.array([n.sample() for _ in range(20000)])
        assert abs(xs.mean() - 3.0) < 0.05
        assert abs(xs.std() - 2.0) < 0.05

    def test_missing_shared_pattern(self):
        # same seed + same p => identical missingness pattern across
        # variables (Missing.java's documented property)
        a = Missing(0.3, Normal(seed=1), missing_marker=None, seed=4)
        b = Missing(0.3, Normal(seed=2), missing_marker=None, seed=4)
        pa = [a.sample() is None for _ in range(500)]
        pb = [b.sample() is None for _ in range(500)]
        assert pa == pb
        assert 0.2 < np.mean(pa) < 0.4

    def test_multinormal_covariance(self):
        cov_sqrt = np.array([[2.0, 0.0], [1.0, 1.0]])
        mn = MultiNormal(cov_sqrt, mean=np.array([5.0, -1.0]), seed=13)
        xs = np.array([mn.sample() for _ in range(20000)])
        assert np.allclose(xs.mean(axis=0), [5.0, -1.0], atol=0.08)
        want = cov_sqrt @ cov_sqrt.T
        assert np.allclose(np.cov(xs.T), want, atol=0.15)

    def test_multinormal_spherical_and_dim(self):
        mn = MultiNormal(dimension=3, seed=2)
        assert mn.sample().shape == (3,)
        sp = MultiNormal.spherical(0.5, np.zeros(4), seed=2)
        xs = np.array([sp.sample() for _ in range(5000)])
        assert abs(xs.std() - 0.5) < 0.05

    def test_indian_buffet_sharing(self):
        ib = IndianBuffet(4.0, seed=21)
        docs = [ib.sample() for _ in range(300)]
        assert all(len(set(d)) == len(d) for d in docs)  # no dup dishes
        first_dishes = set(docs[0])
        later = set(x for d in docs[1:] for x in d)
        # popular early dishes keep reappearing (rich-get-richer)
        assert first_dishes & later
        words = IndianBuffet(2.0, IndianBuffet.word_converter(), seed=8)
        assert all(isinstance(w, str) and w.startswith("word-")
                   for w in words.sample())
