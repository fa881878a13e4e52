"""OLS + Cochrane-Orcutt + preprocessing — reference goldens and

in-core NumPy oracles (RegressionSuiteBase.scala, PreprocessorSuiteBase
.scala)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.stats import betainc, f_sf, t_two_sided_pval
from mahout_spark.operators.preprocessing import (as_factor_fit,
                                                  mean_center_fit,
                                                  standard_scaler_fit)
from mahout_spark.operators.regression import (cochrane_orcutt, ols_fit,
                                               ols_fit_drm, ols_predict)

# RegressionSuiteBase.scala:16-62 — the cereal dataset (R lm golden)
CEREAL = np.array([
    [2, 2, 10.5, 10, 29.509541],
    [1, 2, 12, 12, 18.042851],
    [1, 1, 12, 13, 22.736446],
    [2, 1, 11, 13, 32.207582],
    [1, 2, 12, 11, 21.871292],
    [2, 1, 16, 8, 36.187559],
    [6, 2, 17, 1, 50.764999],
    [3, 2, 13, 7, 40.400208],
    [3, 3, 13, 4, 45.811716]])
# R: lm(y ~ X) coefficients, feature order a,b,c,d then intercept
CEREAL_BETA = np.array([-1.336265, -13.157702, -4.152654, -5.679908,
                        163.179329])

# RegressionSuiteBase.scala:64-160 — Blaisdell Co (Kutner et al. p492-4)
BLAISDELL = np.array([
    [20.96, 127.3], [21.40, 130.0], [21.96, 132.7], [21.52, 129.4],
    [22.39, 135.0], [22.76, 137.1], [23.48, 141.2], [23.66, 142.8],
    [24.10, 145.5], [24.01, 145.3], [24.54, 148.3], [24.30, 146.4],
    [25.00, 150.2], [25.64, 153.1], [26.36, 157.3], [26.98, 160.7],
    [27.52, 164.2], [27.78, 165.6], [28.24, 168.7], [28.78, 171.7]])


def _cereal_df(spark):
    rows = [tuple(map(float, r)) for r in CEREAL]
    return spark.createDataFrame(rows, ["a", "b", "c", "d", "y"])


def test_ols_cereal_golden(spark):
    model = ols_fit(_cereal_df(spark), ["a", "b", "c", "d"], "y")
    assert np.abs(model.beta - CEREAL_BETA).sum() < 1e-5
    # R summary(lm) cross-check (computed with R's lm on this data)
    assert model.r2 == pytest.approx(0.9424805, abs=1e-6)
    # in-core oracle for se/t/pval via the textbook formulas
    x = np.hstack([CEREAL[:, :4], np.ones((9, 1))])
    y = CEREAL[:, 4]
    beta = np.linalg.lstsq(x, y, rcond=None)[0]
    resid = y - x @ beta
    rss = resid @ resid
    se = np.sqrt(rss / (9 - 5) * np.diag(np.linalg.inv(x.T @ x)))
    assert np.allclose(model.se, se, rtol=1e-8)
    assert np.allclose(model.t_score, beta / se, rtol=1e-8)
    assert model.rss == pytest.approx(rss, rel=1e-8)
    assert model.mse == pytest.approx(rss / 9, rel=1e-8)


def test_ols_no_intercept_and_predict(spark):
    df = _cereal_df(spark)
    model = ols_fit(df, ["a", "b", "c", "d"], "y", add_intercept=False)
    x = CEREAL[:, :4]
    y = CEREAL[:, 4]
    beta = np.linalg.lstsq(x, y, rcond=None)[0]
    assert np.allclose(model.beta, beta, rtol=1e-8)
    got = (ols_predict(model, df).select("yhat").toPandas()["yhat"]
           .to_numpy())
    # predict follows row order of the original frame on a tiny local df
    want = x @ beta
    assert np.allclose(np.sort(got), np.sort(want), rtol=1e-8)


def test_ols_gramian_modes_agree(spark):
    df = _cereal_df(spark)
    m_jvm = ols_fit(df, ["a", "b", "c", "d"], "y", gramian_mode="jvm")
    m_pd = ols_fit(df, ["a", "b", "c", "d"], "y", gramian_mode="pandas")
    assert np.allclose(m_jvm.beta, m_pd.beta, rtol=1e-12)
    assert np.allclose(m_jvm.se, m_pd.se, rtol=1e-12)


def test_ols_drm_parity(spark):
    from mahout_spark.operators.drm import drm_parallelize

    x_drm = drm_parallelize(spark, CEREAL[:, :4])
    y_drm = drm_parallelize(spark, CEREAL[:, 4:5]).drop("col_id") \
        .withColumn("col_id", F.lit(0))
    model = ols_fit_drm(x_drm, y_drm, ncol=4)
    assert np.abs(model.beta - CEREAL_BETA).sum() < 1e-5
    wide = ols_fit(_cereal_df(spark), ["a", "b", "c", "d"], "y")
    assert np.allclose(model.beta, wide.beta, rtol=1e-10)
    assert np.allclose(model.se, wide.se, rtol=1e-10)


def test_cochrane_orcutt_blaisdell_golden(spark):
    rows = [(i, float(y), float(x))
            for i, (y, x) in enumerate(BLAISDELL)]
    df = spark.createDataFrame(rows, ["t", "y", "x"])
    co = cochrane_orcutt(df, ["x"], "y", order_col="t", iterations=2)
    # RegressionSuiteBase.scala:151-159
    assert co.rhos[0] == pytest.approx(0.631166, abs=1e-5)
    assert np.abs(co.betas[1] - np.array([0.17376, -1.0685])).sum() < 2e-4
    assert np.abs(co.se - np.array([0.002957, 0.45332])).sum() < 2e-4


def test_stats_tails():
    # golden values verified by numeric integration of the densities
    assert t_two_sided_pval(2.0, 10) == pytest.approx(0.07338803, rel=1e-6)
    assert t_two_sided_pval(-2.0, 10) == pytest.approx(0.07338803, rel=1e-6)
    assert f_sf(3.5, 3, 12) == pytest.approx(0.04964054, rel=1e-6)
    assert betainc(2.0, 3.0, 0.4) == pytest.approx(0.5248, abs=1e-4)
    assert betainc(2.0, 3.0, 0.0) == 0.0
    assert betainc(2.0, 3.0, 1.0) == 1.0


# --- preprocessing -----------------------------------------------------------


def test_standard_scaler_golden(spark):
    # PreprocessorSuiteBase.scala:44-67: population stddev
    a = np.array([[1, 1, 5], [2, 5, -15], [3, 9, -2]], dtype=float)
    df = spark.createDataFrame([tuple(map(float, r)) for r in a],
                               ["c0", "c1", "c2"])
    model = standard_scaler_fit(df, ["c0", "c1", "c2"])
    mu, sd = a.mean(axis=0), a.std(axis=0)  # population (ddof=0)
    assert np.allclose(model.mean_vec, mu)
    assert np.allclose(model.stdev, sd)
    got = model.transform(df).toPandas()[["c0", "c1", "c2"]].to_numpy()
    want = (a - mu) / sd
    assert np.allclose(np.sort(got, axis=0), np.sort(want, axis=0),
                       rtol=1e-9)
    # golden spot value: column (1,2,3) standardizes to +-1.224745
    assert np.allclose(sorted(got[:, 0]),
                       [-1.224745, 0.0, 1.224745], atol=1e-6)
    back = model.inv_transform(model.transform(df)) \
        .toPandas()[["c0", "c1", "c2"]].to_numpy()
    assert np.allclose(np.sort(back, axis=0), np.sort(a, axis=0))


def test_mean_center_golden(spark):
    # PreprocessorSuiteBase.scala:69-93
    a = np.array([[1, 1, -2], [2, 5, 2], [3, 9, 0]], dtype=float)
    df = spark.createDataFrame([tuple(map(float, r)) for r in a],
                               ["c0", "c1", "c2"])
    model = mean_center_fit(df, ["c0", "c1", "c2"])
    got = model.transform(df).toPandas()[["c0", "c1", "c2"]].to_numpy()
    want = a - a.mean(axis=0)
    assert np.allclose(np.sort(got, axis=0), np.sort(want, axis=0))
    model.set_centers(np.array([1.0, 0.0, -1.0]))
    got2 = model.transform(df).toPandas()[["c0", "c1", "c2"]].to_numpy()
    want2 = a - (a.mean(axis=0) + np.array([1.0, 0.0, -1.0]))
    assert np.allclose(np.sort(got2, axis=0), np.sort(want2, axis=0))
    with pytest.raises(ValueError):
        model.set_centers(np.array([1.0]))


def test_as_factor_golden(spark):
    # PreprocessorSuiteBase.scala:18-42 golden MATRIX (not just norm):
    # maxes (3,2,1,2) -> offsets (0,4,7,9), cardinality 12
    rows = [(0, 3, 2, 1, 2), (1, 0, 0, 0, 0), (2, 1, 1, 1, 1)]
    df = spark.createDataFrame(rows, ["id", "c0", "c1", "c2", "c3"])
    model = as_factor_fit(df, ["c0", "c1", "c2", "c3"])
    assert model.cardinality == 12
    assert list(model.offsets) == [0, 4, 7, 9]
    trip = model.transform(df, "id").toPandas()
    got = {(int(r.row_id), int(r.col_id)) for r in trip.itertuples()}
    want = {(0, 3), (0, 6), (0, 8), (0, 11),
            (1, 0), (1, 4), (1, 7), (1, 9),
            (2, 1), (2, 5), (2, 8), (2, 10)}
    assert got == want
    assert (trip["value"] == 1.0).all()
    back = model.inv_transform(model.transform(df, "id")) \
        .orderBy("row_id").toPandas()
    assert [tuple(int(v) for v in r[1:]) for r in
            back.itertuples(index=False)] == \
        [(3, 2, 1, 2), (0, 0, 0, 0), (1, 1, 1, 1)]
