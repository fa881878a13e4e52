"""Privacy-noised sketch release: DP ratio of the mechanism's pmf,
threshold-table properties, noise determinism, release-level error, and
DuckDB replay of the noised point + pairwise oracles."""

import math

import duckdb
import numpy as np
import pandas as pd

from mahout_spark.core.cms import CountMinSketch
from mahout_spark.core.privacy import (cell_noise, geometric_bound,
                                       geometric_noise_from_u,
                                       geometric_thresholds, md5_long60_py)

_U60 = 1 << 60


def test_thresholds_monotone_and_symmetric():
    thr = geometric_thresholds(0.5)
    assert len(thr) == 2 * geometric_bound(0.5)
    assert all(b >= a for a, b in zip(thr, thr[1:]))
    # symmetry of the distribution: T[m] + T[2B-1-m] ~ 2^60 up to a few
    # double ulps at 2^60 scale (ulp = 128 there) — the table is built
    # once from float partial sums and shared as literals, so the tiny
    # asymmetry is identical in both engines
    for m in range(len(thr)):
        assert abs(thr[m] + thr[len(thr) - 1 - m] - _U60) <= 2048


def test_dp_ratio():
    # the mechanism's pmf satisfies p(z)/p(z+1) = e^eps exactly on the
    # untruncated support — check via the threshold gaps (the pmf the
    # two engines actually sample from)
    eps = 0.4
    thr = np.array(geometric_thresholds(eps), dtype=np.float64)
    gaps = np.diff(thr)  # pmf mass of z = -B+1 .. B-1 in u-units
    bound = len(thr) // 2
    center = bound - 1  # gap index of z = 0
    for k in range(0, 8):
        ratio = gaps[center - k] / gaps[center - k - 1]
        assert abs(math.log(ratio) - eps) < 1e-6, k


def test_noise_mean_zero_and_determinism():
    thr = geometric_thresholds(0.5)
    u = np.linspace(0, _U60 - 1, 400_001).astype(np.int64)
    z = geometric_noise_from_u(u, thr)
    assert abs(z.mean()) < 0.01
    n1 = cell_noise(4, 64, 7, "en", thr)
    assert np.array_equal(n1, cell_noise(4, 64, 7, "en", thr))
    assert not np.array_equal(n1, cell_noise(4, 64, 7, "de", thr))
    assert not np.array_equal(n1, cell_noise(4, 64, 8, "en", thr))
    assert np.all(n1 == np.floor(n1))  # integer-valued


def test_noised_release_error_bounded():
    thr = geometric_thresholds(0.5)
    bound = len(thr) // 2
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 50, size=5_000, dtype=np.int64)
    cms = CountMinSketch(depth=4, width=256, seed=3)
    cms.update_batch(keys)
    noised = CountMinSketch(
        depth=4, width=256, seed=3,
        counts=cms.counts + cell_noise(4, 256, 11, "g", thr))
    probe = keys[:200]
    shift = np.abs(noised.point_batch(probe) - cms.point_batch(probe))
    assert shift.max() <= bound  # min-over-rows moves at most max |noise|
    assert shift.max() <= 25    # and in practice by a few noise units


TOKENS = [f"w{i % 50}" for i in range(1200)]
LANGS = [("en", "de", "fr")[i % 3] for i in range(1200)]


def _parity_cms(tokens, depth=4, width=61, seed=13):
    c = CountMinSketch(depth=depth, width=width, seed=seed, parity=True)
    c.update_batch(np.array([md5_long60_py(t) for t in tokens],
                            dtype=np.int64))
    return c


def test_noised_oracles_replay():
    from mahout_spark.sketch.queries import (cms_pairwise_noised_oracle_sql,
                                             cms_point_noised_oracle_sql)

    thr = geometric_thresholds(0.5)
    con = duckdb.connect()
    pdf = pd.DataFrame({"lang": LANGS, "token": TOKENS})
    con.register("toktbl", pdf)
    src = "SELECT lang, token FROM toktbl"
    probe = ("SELECT token FROM toktbl GROUP BY token "
             "ORDER BY count(*) DESC, token LIMIT 6")
    merged = _parity_cms(TOKENS)
    gnoised = CountMinSketch(depth=4, width=61, seed=13, parity=True,
                             counts=merged.counts
                             + cell_noise(4, 61, 99, "", thr))
    got = dict(con.execute(cms_point_noised_oracle_sql(
        src, probe, 4, 61, 13, thr, 99)).fetchall())
    assert len(got) == 6
    for tok, v in got.items():
        assert v == gnoised.point(md5_long60_py(tok))

    per = {lang: CountMinSketch(
               depth=4, width=61, seed=13, parity=True,
               counts=_parity_cms(sub["token"]).counts
               + cell_noise(4, 61, 99, lang, thr))
           for lang, sub in pdf.groupby("lang")}
    got2 = {(a, b): v for a, b, v in con.execute(
        cms_pairwise_noised_oracle_sql(src, 4, 61, 13, thr, 99,
                                       group_col="lang",
                                       kind="inner")).fetchall()}
    assert len(got2) == 3
    for (a, b), v in got2.items():
        assert v == per[a].inner_product(per[b])


def test_noised_sketch_rows_spark(spark):
    from pyspark.sql import functions as F

    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_by_key
    from mahout_spark.sketch.queries import noised_sketch_rows

    thr = geometric_thresholds(0.5)
    df = spark.createDataFrame(list(zip(LANGS, TOKENS)),
                               "lang string, token string")
    spec = cms_spec_shape(4, 61, 13, parity=True)
    sk = sketch_by_key(df, ["lang"], spec,
                       key_expr=md5_long60(F.col("token")))
    rows = noised_sketch_rows(sk, ["lang"], thr, 99).collect()
    pdf = pd.DataFrame({"lang": LANGS, "token": TOKENS})
    for r in rows:
        sub = pdf[pdf["lang"] == r["lang"]]
        ref = _parity_cms(sub["token"])
        want = ref.counts + cell_noise(4, 61, 99, r["lang"], thr)
        got = CountMinSketch.deserialize(bytes(r["sketch"])).counts
        assert np.array_equal(got, want), r["lang"]
