"""PFP frequent-itemset mining: brute-force subset-count oracle,

distributed == in-core, group-count invariance."""

import itertools

import numpy as np
import pytest

from mahout_spark.operators.fpm import (fp_growth_incore,
                                        parallel_fp_growth)


def _random_txns(n=60, n_items=8, seed=0):
    rng = np.random.default_rng(seed)
    return [[f"i{j}" for j in rng.choice(n_items, size=rng.integers(1, 6),
                                         replace=False)]
            for _ in range(n)]


def _brute(txns, min_support, max_len):
    sets = [frozenset(t) for t in txns]
    items = sorted({i for t in sets for i in t})
    out = {}
    for size in range(1, max_len + 1):
        for combo in itertools.combinations(items, size):
            s = sum(1 for t in sets if t.issuperset(combo))
            if s >= min_support:
                out[frozenset(combo)] = s
    return out


def test_incore_matches_brute_force():
    txns = _random_txns()
    got = fp_growth_incore(txns, min_support=5, max_len=3)
    want = _brute(txns, 5, 3)
    assert {frozenset(k): v for k, v in got.items()} == want


def test_incore_unbounded_len_matches_brute_force():
    txns = _random_txns(40, 6, seed=3)
    got = fp_growth_incore(txns, min_support=4)
    want = _brute(txns, 4, 6)
    assert {frozenset(k): v for k, v in got.items()} == want


def test_incore_max_len_respected():
    txns = _random_txns(seed=1)
    got = fp_growth_incore(txns, min_support=3, max_len=2)
    assert got and max(len(k) for k in got) <= 2


def test_itemsets_are_rank_ordered():
    txns = _random_txns(seed=2)
    counts = {}
    for t in txns:
        for i in set(t):
            counts[i] = counts.get(i, 0) + 1
    for pat in fp_growth_incore(txns, min_support=4, max_len=3):
        ranks = [(-counts[i], i) for i in pat]
        assert ranks == sorted(ranks)


@pytest.fixture(scope="module")
def txn_df(spark):
    txns = _random_txns(n=120, n_items=10, seed=7)
    rows = [(t_id, it) for t_id, t in enumerate(txns) for it in t]
    return (spark.createDataFrame(rows, "txn_id int, item string"),
            txns)


def test_parallel_matches_incore(txn_df):
    df, txns = txn_df
    got = {frozenset(r["itemset"]): r["support"]
           for r in parallel_fp_growth(df, min_support=8,
                                       max_len=3).collect()}
    want = {frozenset(k): v
            for k, v in fp_growth_incore(txns, 8, max_len=3).items()}
    assert got == want


def test_parallel_group_count_invariant(txn_df):
    df, txns = txn_df
    a = {frozenset(r["itemset"]): r["support"]
         for r in parallel_fp_growth(df, min_support=10, max_len=3,
                                     n_groups=1).collect()}
    b = {frozenset(r["itemset"]): r["support"]
         for r in parallel_fp_growth(df, min_support=10, max_len=3,
                                     n_groups=7).collect()}
    assert a == b and a


def test_parallel_empty_below_support(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")],
                               "txn_id int, item string")
    assert parallel_fp_growth(df, min_support=5).count() == 0
