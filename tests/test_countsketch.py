"""Count-Sketch (signed/AMS): published error bound, unbiasedness vs the
CMS's one-sided bias, merge/serialization contracts, distributed build
parity, and DuckDB oracle replay of the parity family."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from mahout_spark.core.cms import CountMinSketch
from mahout_spark.core.countsketch import CountSketch, countsketch_shape
from mahout_spark.core.privacy import md5_long60_py


def _zipf_keys(n=30_000, n_items=500, seed=3):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n) % n_items
    return ranks.astype(np.int64)


def test_shape_formula():
    d, w = countsketch_shape(0.1, 0.01)
    assert w == 300  # ceil(3 / 0.01)
    assert d == int(np.ceil(4 * np.log(100)))
    with pytest.raises(ValueError):
        countsketch_shape(0.0, 0.01)
    with pytest.raises(ValueError):
        countsketch_shape(0.1, 1.0)


def test_point_two_sided_bound():
    keys = _zipf_keys()
    freq = np.bincount(keys)
    l2 = float(np.sqrt((freq.astype(np.float64) ** 2).sum()))
    # collision-forcing geometry (width << #distinct) so the error paths
    # are actually exercised; the bound still uses the sketch's own eps
    cs = CountSketch(depth=9, width=64, seed=11)
    cs.update_batch(keys)
    probe = np.arange(len(freq), dtype=np.int64)
    est = cs.point_batch(probe)
    err = np.abs(est - freq)
    # per-row failure prob <= 1/3 (Chebyshev at eps = sqrt(3/w)); the
    # 9-row median amplifies — allow the guaranteed tail
    assert (err <= cs.eps * l2).mean() >= 0.97
    # two-sided: under- AND over-estimates occur (CMS can never under)
    diffs = est - freq
    assert (diffs < 0).any() and (diffs > 0).any()
    # and at a wide, clean geometry every head estimate is exact
    wide = CountSketch.from_error_bound(0.05, 0.01, seed=11)
    wide.update_batch(keys)
    assert np.array_equal(wide.point_batch(probe), freq.astype(float))


def test_inner_product_beats_cms_bias():
    rng = np.random.default_rng(5)
    ka = rng.integers(0, 400, size=20_000, dtype=np.int64)
    kb = rng.integers(0, 400, size=20_000, dtype=np.int64)
    fa = np.bincount(ka, minlength=400).astype(np.float64)
    fb = np.bincount(kb, minlength=400).astype(np.float64)
    true = float(fa @ fb)
    # collision-heavy geometry so the CMS bias is visible
    cs_a = CountSketch(depth=7, width=128, seed=9)
    cs_b = CountSketch(depth=7, width=128, seed=9)
    cm_a = CountMinSketch(depth=7, width=128, seed=9)
    cm_b = CountMinSketch(depth=7, width=128, seed=9)
    for s, k in ((cs_a, ka), (cs_b, kb), (cm_a, ka), (cm_b, kb)):
        s.update_batch(k)
    cs_est = cs_a.inner_product(cs_b)
    cm_est = cm_a.inner_product(cm_b)
    assert cm_est >= true  # CMS inner product is biased up, always
    assert abs(cs_est - true) < cm_est - true  # signed estimator is closer
    assert abs(cs_est - true) / true < 0.15


def test_f2_estimate():
    keys = _zipf_keys(seed=7)
    freq = np.bincount(keys).astype(np.float64)
    true = float(freq @ freq)
    cs = CountSketch(depth=9, width=1024, seed=2)
    cs.update_batch(keys)
    assert abs(cs.f2() - true) / true < 0.1


@pytest.mark.parametrize("family", ["fast", "parity"])
def test_merge_and_roundtrip(family):
    keys = _zipf_keys(n=2_000 if family == "parity" else 20_000)
    one = CountSketch(depth=5, width=256, seed=4, family=family)
    one.update_batch(keys)
    h = len(keys) // 2
    a = CountSketch(depth=5, width=256, seed=4, family=family)
    b = CountSketch(depth=5, width=256, seed=4, family=family)
    a.update_batch(keys[:h])
    b.update_batch(keys[h:])
    assert np.array_equal(a.merge(b).counts, one.counts)
    rt = CountSketch.deserialize(one.serialize())
    assert np.array_equal(rt.counts, one.counts)
    assert (rt.depth, rt.width, rt.seed, rt.family) == (5, 256, 4, family)


def test_merge_contract_errors():
    a = CountSketch(depth=5, width=256, seed=4)
    with pytest.raises(ValueError):
        a.merge(CountSketch(depth=5, width=128, seed=4))
    with pytest.raises(ValueError):
        a.merge(CountSketch(depth=5, width=256, seed=5))
    with pytest.raises(ValueError):
        a.inner_product(CountSketch(depth=5, width=256, seed=4,
                                    family="parity"))
    with pytest.raises(ValueError):
        CountSketch.deserialize(b"garbage")
    with pytest.raises(ValueError):
        CountSketch(depth=2, width=8, family="nope")


TOKENS = [f"tok{i % 40}" for i in range(900)]
LANGS = [("en", "de", "fr")[i % 3] for i in range(900)]


def test_distributed_build_matches_incore(spark):
    from pyspark.sql import functions as F

    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import countsketch_spec_shape, sketch_by_key

    df = spark.createDataFrame(list(zip(LANGS, TOKENS)), "lang string, token string")
    spec = countsketch_spec_shape(5, 97, seed=21, family="parity")
    rows = sketch_by_key(df, ["lang"], spec,
                         key_expr=md5_long60(F.col("token"))).collect()
    pdf = pd.DataFrame({"lang": LANGS, "token": TOKENS})
    for r in rows:
        ref = CountSketch(depth=5, width=97, seed=21, family="parity")
        sub = pdf[pdf["lang"] == r["lang"]]
        ks = np.array([md5_long60_py(t) for t in sub["token"]],
                      dtype=np.int64)
        ref.update_batch(ks)
        got = CountSketch.deserialize(bytes(r["sketch"]))
        assert np.array_equal(got.counts, ref.counts), r["lang"]


def test_oracle_sql_parity():
    from mahout_spark.sketch.queries import (countsketch_pairwise_oracle_sql,
                                             countsketch_point_oracle_sql)

    con = duckdb.connect()
    con.register("toktbl", pd.DataFrame({"lang": LANGS, "token": TOKENS}))
    src = "SELECT lang, token FROM toktbl"
    probe = ("SELECT token FROM toktbl GROUP BY token "
             "ORDER BY count(*) DESC, token LIMIT 8")
    per = {}
    pdf = pd.DataFrame({"lang": LANGS, "token": TOKENS})
    merged = CountSketch(depth=5, width=97, seed=21, family="parity")
    for lang, sub in pdf.groupby("lang"):
        s = CountSketch(depth=5, width=97, seed=21, family="parity")
        s.update_batch(np.array([md5_long60_py(t) for t in sub["token"]],
                                dtype=np.int64))
        per[lang] = s
        merged = merged.merge(s)
    got = dict(con.execute(
        countsketch_point_oracle_sql(src, probe, 5, 97, 21)).fetchall())
    for tok, v in got.items():
        assert v == merged.point(md5_long60_py(tok))
    got2 = {(a, b): v for a, b, v in con.execute(
        countsketch_pairwise_oracle_sql(src, 5, 97, 21)).fetchall()}
    for (a, b), v in got2.items():
        assert v == per[a].inner_product(per[b])


def test_subtract_linearity_and_drift():
    rng = np.random.default_rng(11)
    ka = rng.integers(0, 300, size=15_000, dtype=np.int64)
    kb = rng.integers(0, 300, size=12_000, dtype=np.int64)
    fa = np.bincount(ka, minlength=300).astype(np.float64)
    fb = np.bincount(kb, minlength=300).astype(np.float64)
    a = CountSketch(depth=9, width=1024, seed=6)
    b = CountSketch(depth=9, width=1024, seed=6)
    a.update_batch(ka)
    b.update_batch(kb)
    d = a.subtract(b)
    # linearity: the difference sketch equals a sketch built from the
    # signed delta stream
    ref = CountSketch(depth=9, width=1024, seed=6)
    ref.update_batch(np.arange(300, dtype=np.int64), fa - fb)
    assert np.array_equal(d.counts, ref.counts)
    # unbiased drift estimates: |est - true delta| within the L2 bound
    probe = np.arange(300, dtype=np.int64)
    est = d.point_batch(probe)
    true = fa - fb
    l2 = float(np.sqrt(((fa - fb) ** 2).sum()))
    assert (np.abs(est - true) <= d.eps * l2).mean() >= 0.97
    with pytest.raises(ValueError):
        a.subtract(CountSketch(depth=9, width=512, seed=6))
