"""OnlineAuc family: in-core parity vs an independent Java-text replay,
grouped averaging, and the distributed applyInPandas twin.

Reference: math/src/main/java/org/apache/mahout/math/stats/
GlobalOnlineAuc.java + GroupedOnlineAuc.java (studied, not copied).
"""

import math
import random

import pytest

from mahout_spark.core.stats import GlobalOnlineAuc, GroupedOnlineAuc


def _java_replay(samples, history=10, window_size=None):
    """Independent line-by-line replay of GlobalOnlineAuc.addSample
    (FIFO policy) written directly from the Java source as an oracle —
    deliberately structured differently from the library class."""
    win = window_size if window_size else (1 << 62)
    scores = {0: [math.nan] * history, 1: [math.nan] * history}
    averages = {0: 0.5, 1: 0.5}
    nsamp = {0: 0, 1: 0}
    out = None
    for cat, score in samples:
        n = nsamp[cat]
        scores[cat][n % history] = score  # FIFO covers both n<H and n>=H
        nsamp[cat] = n + 1
        if nsamp[0] >= 1 and nsamp[1] >= 1:
            row = scores[1 - cat]
            m = sum((1.0 if score > v else (0.5 if score == v else 0.0))
                    for v in row if not math.isnan(v))
            count = float(sum(1 for v in row if not math.isnan(v)))
            averages[cat] += ((m / count - averages[cat])
                              / min(win, nsamp[cat]))
        out = (1.0 - averages[0] + averages[1]) / 2.0
    return out


def test_fifo_matches_java_replay_bitwise():
    rng = random.Random(7)
    for trial in range(5):
        samples = [(rng.randint(0, 1), round(rng.random(), 6))
                   for _ in range(200)]
        acc = GlobalOnlineAuc()
        last = None
        for cat, s in samples:
            last = acc.add_sample(cat, s)
        assert last == _java_replay(samples)


def test_windowed_average_matches_replay():
    rng = random.Random(13)
    samples = [(rng.randint(0, 1), rng.random()) for _ in range(300)]
    acc = GlobalOnlineAuc(window_size=25)
    for cat, s in samples:
        last = acc.add_sample(cat, s)
    assert last == _java_replay(samples, window_size=25)


def test_initial_and_single_category():
    acc = GlobalOnlineAuc()
    assert acc.auc() == 0.5
    # only positives seen: other category empty -> averages untouched
    for s in (0.9, 0.8, 0.7):
        assert acc.add_sample(1, s) == 0.5


def test_perfect_separation_converges_high():
    acc = GlobalOnlineAuc()
    rng = random.Random(3)
    for _ in range(500):
        acc.add_sample(0, rng.uniform(0.0, 0.4))
        acc.add_sample(1, rng.uniform(0.6, 1.0))
    assert acc.auc() > 0.95
    # and a random scorer stays near 0.5
    acc2 = GlobalOnlineAuc()
    for _ in range(500):
        acc2.add_sample(rng.randint(0, 1), rng.random())
    assert abs(acc2.auc() - 0.5) < 0.1


def test_fair_and_random_policies_deterministic_per_seed():
    rng = random.Random(11)
    samples = [(rng.randint(0, 1), rng.random()) for _ in range(100)]
    for policy in ("fair", "random"):
        a = GlobalOnlineAuc(policy=policy, seed=5)
        b = GlobalOnlineAuc(policy=policy, seed=5)
        c = GlobalOnlineAuc(policy=policy, seed=6)
        ra = [a.add_sample(*s) for s in samples][-1]
        rb = [b.add_sample(*s) for s in samples][-1]
        rc = [c.add_sample(*s) for s in samples][-1]
        assert ra == rb
        assert 0.0 <= rc <= 1.0
    with pytest.raises(ValueError):
        GlobalOnlineAuc(policy="lifo")


def test_grouped_mean_and_null_key():
    g = GroupedOnlineAuc()
    rng = random.Random(19)
    for _ in range(200):
        g.add_sample(rng.randint(0, 1), "u1", rng.random())
        g.add_sample(0, "u2", rng.uniform(0.0, 0.4))
        g.add_sample(1, "u2", rng.uniform(0.6, 1.0))
    expect = (g.groups["u1"].auc() + g.groups["u2"].auc()) / 2.0
    assert g.auc() == expect
    with pytest.raises(ValueError):
        g.add_sample(1, None, 0.5)
    assert math.isnan(GroupedOnlineAuc().auc())


def _make_events(rng, n_groups=6, n=120):
    rows = []
    for gi in range(n_groups):
        sep = gi / (n_groups - 1)  # group 0 random, last separable
        for t in range(n):
            y = rng.randint(0, 1)
            base = rng.random()
            s = base * (1 - sep) + sep * (0.25 + 0.5 * y + 0.2 * base)
            rows.append((f"g{gi}", t, y, round(s, 9)))
    return rows


def test_spark_grouped_online_auc_matches_incore(spark):
    from mahout_spark.operators.evaluation import grouped_online_auc

    rng = random.Random(23)
    rows = _make_events(rng)
    df = spark.createDataFrame(rows, "grp string, t int, y int, s double")
    got = {r["grp"]: (r["online_auc"], r["n_samples"])
           for r in grouped_online_auc(
               df.repartition(7), "grp", "y", "s", "t").collect()}
    # in-core oracle replayed in the same (t, s, y) order
    expect = {}
    for gkey in sorted({r[0] for r in rows}):
        acc = GlobalOnlineAuc()
        last = float("nan")
        seq = sorted([r for r in rows if r[0] == gkey],
                     key=lambda r: (r[1], r[3], r[2]))
        for _, _, y, s in seq:
            last = acc.add_sample(y, s)
        expect[gkey] = (last, len(seq))
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], k


def test_spark_grouped_online_auc_partitioning_invariant(spark):
    from mahout_spark.operators.evaluation import grouped_online_auc

    rng = random.Random(29)
    rows = _make_events(rng, n_groups=4, n=60)
    df = spark.createDataFrame(rows, "grp string, t int, y int, s double")
    a = sorted(grouped_online_auc(df.coalesce(1), "grp", "y", "s", "t",
                                  policy="fair").collect())
    b = sorted(grouped_online_auc(df.repartition(11), "grp", "y", "s", "t",
                                  policy="fair").collect())
    assert a == b
