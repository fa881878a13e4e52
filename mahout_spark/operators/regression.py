"""Samsara algorithms layer: linear regression (OLS + Cochrane-Orcutt).

Reference anchors (studied, not copied):
- math-scala/.../algorithms/regression/OrdinaryLeastSquaresModel.scala:40-70
  (fit: X cbind 1, XtX = (X.t %*% X).collect, beta = solve(XtX) %*% X'y —
  the normal equations with a driver-side k x k solve)
- math-scala/.../algorithms/regression/LinearRegressorModel.scala:60-100
  (standard errors: varCovar = rss/(n-k) * inv(XtX), se = sqrt(diag),
  tScore = beta/se, pval = 2*(1 - T_cdf(|t|)), summary string)
- math-scala/.../algorithms/regression/tests/FittnessTests.scala
  (r2 = 1 - rss/sst over the mean-centered target, mse = rss/n,
  F = ((sst - rss)/(k-1)) / (rss/(n-k)), rss cached on the model)
- math-scala/.../algorithms/regression/CochraneOrcuttModel.scala
  (iterated rho-differencing: rho = sum(e_t e_{t-1})/sum(e_{t-1}^2),
  y' = y - rho*lag(y), X' = X - rho*lag(X), refit; betas/rhos per
  iteration, standard errors on the final iteration only; default 3
  iterations per Kutner et al. p492)
- golden: math-scala/.../RegressionSuiteBase.scala:16-62 (cereal OLS
  beta vs R lm), :64-160 (Blaisdell Cochrane-Orcutt rho/beta/se)

Spark-first shape: the model NEVER materializes residual rows. One
distributed pass builds the augmented Gramian G = Z'Z for
Z = [x_1..x_p, 1, y]; every statistic the reference derives from extra
DRM passes (X'y, rss = e'e, sst, target mean) is a cell or quadratic
form of G, so a 100 TB fit is exactly one scan + one (p+2)^2 driver
solve. Small p runs as a single whole-stage-codegen JVM aggregate;
large p switches to a per-partition NumPy Gramian (the blas/AtA.scala
slim path, same shape as drm.ata_slim).

Coefficient order matches the reference: features first, intercept LAST
(X cbind 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mahout_spark.core.stats import f_sf, t_two_sided_pval

# above this many feature columns the single JVM aggregate of
# (p+2)(p+3)/2 sum-of-product expressions bloats codegen; switch to the
# per-partition BLAS Gramian (mapInPandas), which also avoids a
# quadratic expression count at wide p
MAX_JVM_GRAMIAN_COLS = 24


@dataclass
class OLSModel:
    """Fitted linear model — beta/se/tScore/pval mirror

    LinearRegressorModel.scala:36-40; fitness stats FittnessTests.scala."""

    beta: np.ndarray
    feature_cols: list
    add_intercept: bool
    training_examples: int
    degrees_of_freedom: int  # ncol(X) incl. intercept (reference naming)
    se: np.ndarray | None = None
    t_score: np.ndarray | None = None
    pval: np.ndarray | None = None
    rss: float = -1.0
    mse: float | None = None
    r2: float | None = None
    f_score: float | None = None
    f_pval: float | None = None
    summary: str = ""
    gramian: np.ndarray = field(default=None, repr=False)

    @property
    def coef_names(self) -> list:
        return list(self.feature_cols) + (
            ["(Intercept)"] if self.add_intercept else [])


def augmented_gramian(df: DataFrame, feature_cols: list[str],
                      target_col: str,
                      mode: str = "auto") -> np.ndarray:
    """One-pass G = Z'Z for Z = [features..., 1, target].

    G holds XtX (with-intercept design), X'y, y'y, n and sum(y) — the
    entire sufficient statistic for OLS + its fitness tests. `mode`:
    'jvm' (single aggregate, exact for integral data, codegen'd),
    'pandas' (per-partition BLAS partial Gramians, driver-merged —
    blas/AtA.scala:69-125's slim shape), 'auto' picks by width.
    """
    cols = list(feature_cols) + ["__one", target_col]
    d = len(cols)
    if mode == "auto":
        mode = "jvm" if d <= MAX_JVM_GRAMIAN_COLS + 2 else "pandas"

    zdf = df.select(*[F.col(c).cast("double") for c in feature_cols],
                    F.lit(1.0).alias("__one"),
                    F.col(target_col).cast("double"))

    if mode == "jvm":
        aggs = [F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"g_{i}_{j}")
                for i in range(d) for j in range(i, d)]
        row = zdf.agg(*aggs).collect()[0]
        g = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                g[i, j] = g[j, i] = float(row[f"g_{i}_{j}"] or 0.0)
        return g

    def partial(batches):
        acc = np.zeros((d, d))
        seen = False
        for pdf in batches:
            if len(pdf):
                block = pdf.to_numpy(dtype=np.float64)
                acc += block.T @ block
                seen = True
        if seen:
            yield pd.DataFrame({"m": [acc.tobytes()]})

    parts = zdf.mapInPandas(partial, schema="m binary").collect()
    g = np.zeros((d, d))
    for r in parts:
        g += np.frombuffer(bytes(r["m"])).reshape(d, d)
    return g


def _fit_from_gramian(g: np.ndarray, feature_cols: list,
                      add_intercept: bool, calc_standard_errors: bool,
                      calc_common_statistics: bool) -> OLSModel:
    """Driver-side normal-equation solve + postprocessing from G = Z'Z."""
    p = len(feature_cols)
    one_i, y_i = p, p + 1
    d_idx = list(range(p)) + ([one_i] if add_intercept else [])
    xtx = g[np.ix_(d_idx, d_idx)]
    xty = g[d_idx, y_i]
    yty = g[y_i, y_i]
    n = int(round(g[one_i, one_i]))
    sum_y = g[one_i, y_i]
    k = len(d_idx)

    xtx_inv = np.linalg.inv(xtx)
    beta = xtx_inv @ xty

    model = OLSModel(beta=beta, feature_cols=list(feature_cols),
                     add_intercept=add_intercept, training_examples=n,
                     degrees_of_freedom=k, gramian=g)

    # rss = (y - Xb)'(y - Xb) = y'y - 2 b'X'y + b'XtX b — algebraically
    # the reference's residuals.t %*% residuals without a second pass
    rss = float(yty - 2.0 * beta @ xty + beta @ xtx @ beta)
    model.rss = max(rss, 0.0)

    if calc_standard_errors:
        var_covar = (model.rss / (n - k)) * xtx_inv
        model.se = np.sqrt(np.diag(var_covar))
        with np.errstate(divide="ignore", invalid="ignore"):
            model.t_score = beta / model.se
        model.pval = np.array(
            [t_two_sided_pval(float(t), n - k) for t in model.t_score])

    if calc_common_statistics:
        sst = float(yty - n * (sum_y / n) ** 2)  # centered target SS
        model.r2 = 1.0 - model.rss / sst if sst > 0 else float("nan")
        model.mse = model.rss / n  # FittnessTests.scala:40 divides by nrow
        if k > 1 and n > k:
            model.f_score = (((sst - model.rss) / (k - 1))
                             / (model.rss / (n - k)))
            model.f_pval = f_sf(model.f_score, k - 1, n - k)

    model.summary = _summary_string(model)
    return model


def _summary_string(model: OLSModel) -> str:
    lines = ["", "Coef.\t\tEstimate\t\tStd. Error\t\tt-score\t\t\tPr(Beta=0)"]
    for i, name in enumerate(model.coef_names):
        if model.se is not None:
            lines.append("%-12s\t%+5.5f\t\t%+5.5f\t\t%+5.5f\t\t%+5.5f" % (
                name, model.beta[i], model.se[i], model.t_score[i],
                model.pval[i]))
        else:
            lines.append("%-12s\t%+5.5f" % (name, model.beta[i]))
    out = "\n".join(lines)
    if model.f_score is not None:
        out += (f"\nF-statistic: {model.f_score} on "
                f"{model.degrees_of_freedom - 1} and "
                f"{model.training_examples - model.degrees_of_freedom} DF, "
                f" p-value: {model.f_pval}")
    if model.mse is not None:
        out += f"\nMean Squared Error: {model.mse}\nR^2: {model.r2}"
    return out


def ols_fit(df: DataFrame, feature_cols: list, target_col: str,
            add_intercept: bool = True, calc_standard_errors: bool = True,
            calc_common_statistics: bool = True,
            gramian_mode: str = "auto") -> OLSModel:
    """OrdinaryLeastSquares.fit over a wide DataFrame.

    One distributed scan (augmented Gramian) + a k x k driver solve —
    the reference's (X.t %*% X).collect shape
    (OrdinaryLeastSquaresModel.scala:62-66), with the standard-error /
    R^2 / F-test passes folded into the same Gramian.
    """
    g = augmented_gramian(df, feature_cols, target_col, mode=gramian_mode)
    return _fit_from_gramian(g, feature_cols, add_intercept,
                             calc_standard_errors, calc_common_statistics)


def ols_predict_expr(model: OLSModel, feature_cols: list | None = None
                     ) -> Column:
    """yhat as a pure Catalyst expression (model.predict — X %*% beta

    with broadcast beta; literals here, no join, no UDF)."""
    cols = feature_cols if feature_cols is not None else model.feature_cols
    expr = F.lit(float(model.beta[-1])) if model.add_intercept \
        else F.lit(0.0)
    for i, c in enumerate(cols):
        expr = expr + F.lit(float(model.beta[i])) * F.col(c).cast("double")
    return expr


def ols_predict(model: OLSModel, df: DataFrame,
                feature_cols: list | None = None,
                out_col: str = "yhat") -> DataFrame:
    return df.withColumn(out_col, ols_predict_expr(model, feature_cols))


def ols_fit_drm(x_drm: DataFrame, y_drm: DataFrame, ncol: int,
                add_intercept: bool = True,
                calc_standard_errors: bool = True,
                calc_common_statistics: bool = True) -> OLSModel:
    """Samsara-parity entry: fit from triple-form DRMs (row_id, col_id,

    value), target a single-column DRM — the DrmLike[K] signature of
    OrdinaryLeastSquares.fit. Builds the same augmented Gramian via the
    slim per-partition path (rows co-located by repartition("row_id")).
    NOTE: absent triples are zeros (sparse semantics), matching the DRM
    contract; the dense golden tests cover parity with ols_fit.
    """
    d = ncol + 2
    x = x_drm.select("row_id", "col_id",
                     F.col("value").cast("double").alias("value"))
    y = y_drm.select("row_id", F.lit(ncol + 1).alias("col_id"),
                     F.col("value").cast("double").alias("value"))
    ones = (x_drm.select("row_id").union(y_drm.select("row_id")).distinct()
            .select("row_id", F.lit(ncol).alias("col_id"),
                    F.lit(1.0).alias("value")))
    z = x.unionByName(ones).unionByName(y)

    def partial(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        rows, rinv = np.unique(pdf["row_id"].to_numpy(), return_inverse=True)
        block = np.zeros((len(rows), d))
        block[rinv, pdf["col_id"].to_numpy(dtype=np.int64)] = \
            pdf["value"].to_numpy()
        yield pd.DataFrame({"m": [(block.T @ block).tobytes()]})

    parts = (z.repartition("row_id")
             .mapInPandas(partial, schema="m binary").collect())
    g = np.zeros((d, d))
    for r in parts:
        g += np.frombuffer(bytes(r["m"])).reshape(d, d)
    feature_cols = [f"X{i}" for i in range(ncol)]
    return _fit_from_gramian(g, feature_cols, add_intercept,
                             calc_standard_errors, calc_common_statistics)


@dataclass
class CochraneOrcuttModel:
    """CochraneOrcuttModel.scala:30-41 — per-iteration betas and rhos;

    the final model carries the LAST transformed-equation fit (the
    reference keeps the transformed intercept, per Kutner et al.
    p492-4 — untransform as beta0' / (1 - rho) if needed)."""

    model: OLSModel
    betas: list
    rhos: list

    @property
    def beta(self) -> np.ndarray:
        return self.model.beta

    @property
    def se(self) -> np.ndarray:
        return self.model.se


def cochrane_orcutt(df: DataFrame, feature_cols: list, target_col: str,
                    order_col: str, iterations: int = 3,
                    add_intercept: bool = True) -> CochraneOrcuttModel:
    """Cochrane-Orcutt AR(1) correction (CochraneOrcuttModel.scala:55-120).

    Distributed where the reference collects: rho needs
    sum(e_t * e_{t-1}) / sum(e_{t-1}^2) — the reference collects the
    whole residual vector to the driver (calculateRho,
    CochraneOrcuttModel.scala:44-52); here residuals stay a column and
    the lag runs in a window, so only two scalars ever reach the driver.
    The un-partitioned ORDER BY window funnels through one task — the
    unavoidable price of a global time order; partition by series id for
    panel data before calling.
    """
    from pyspark.sql import Window

    w = Window.orderBy(order_col)
    df = df.select(order_col,
                   *[F.col(c).cast("double") for c in feature_cols],
                   F.col(target_col).cast("double"))

    betas: list[np.ndarray] = []
    rhos: list[float] = []
    model = ols_fit(df, feature_cols, target_col,
                    add_intercept=add_intercept)
    betas.append(model.beta)

    lagged = df
    for c in feature_cols + [target_col]:
        lagged = lagged.withColumn(f"__lag_{c}", F.lag(c).over(w))
    lagged = lagged.filter(F.col(f"__lag_{target_col}").isNotNull())
    lagged = lagged.persist()

    final = model
    for it in range(1, max(iterations, 1)):
        # rho from the current model's residuals on the ORIGINAL data:
        # regression through the origin of e_t on e_{t-1}
        # (CochraneOrcuttModel.scala:44-52; steps 2-3 of the loop)
        e_now = F.col(target_col) - ols_predict_expr(final, feature_cols)
        e_lag = F.col(f"__lag_{target_col}") - _lagged_predict_expr(
            final, feature_cols)
        sums = lagged.agg(
            F.sum(e_now * e_lag).alias("num"),
            F.sum(e_lag * e_lag).alias("den")).collect()[0]
        rho = float(sums["num"]) / float(sums["den"])
        rhos.append(rho)

        transformed = lagged.select(
            *[(F.col(c) - F.lit(rho) * F.col(f"__lag_{c}")).alias(c)
              for c in feature_cols],
            (F.col(target_col) - F.lit(rho) * F.col(f"__lag_{target_col}"))
            .alias(target_col))
        last = it == max(iterations, 1) - 1
        final = ols_fit(transformed, feature_cols, target_col,
                        add_intercept=add_intercept,
                        calc_standard_errors=last,
                        calc_common_statistics=last)
        if add_intercept:
            # transformed-equation intercept back to the original scale
            # (CochraneOrcuttModel.scala:97 "intercept adjust")
            final.beta[-1] = final.beta[-1] / (1.0 - rho)
        betas.append(final.beta)

    if add_intercept and rhos and final.se is not None:
        # CochraneOrcuttModel.scala:113-115: final intercept SE rescaled
        final.se[-1] = final.se[-1] / (1.0 - rhos[-1])
    lagged.unpersist()
    return CochraneOrcuttModel(model=final, betas=betas, rhos=rhos)


def _lagged_predict_expr(model: OLSModel, feature_cols: list) -> Column:
    expr = F.lit(float(model.beta[-1])) if model.add_intercept \
        else F.lit(0.0)
    for i, c in enumerate(feature_cols):
        expr = expr + F.lit(float(model.beta[i])) * F.col(f"__lag_{c}")
    return expr
