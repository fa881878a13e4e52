"""Generic classifier-evaluation operators over (score, label) frames.

Reference anchors (studied, not copied):
  mr/src/main/java/org/apache/mahout/classifier/evaluation/Auc.java:37-160
    — rank-sum (Mann-Whitney) AUC with a bounded per-class sample and a
    2x2 threshold confusion matrix;
  mr/src/main/java/org/apache/mahout/classifier/ConfusionMatrix.java
    — generic multi-class confusion counts + accuracy;
  math/src/main/java/org/apache/mahout/math/stats/
    OnlineExponentialAverage.java — time-discounted average (distributed
    closed form below).

Scale design: the exact AUC groups by score value FIRST (one shuffle,
map-side combinable), so the ordered prefix-sum window runs over distinct
scores, not rows; when scores are near-unique at corpus scale use
``auc_sampled``, which reproduces the reference's own contract (exact on
<= max_buffer rows per class, a uniform per-class sample above it) with a
deterministic hash-rank sample instead of java Random.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc(scored: DataFrame, label_col: str = "label",
        score_col: str = "score") -> DataFrame:
    """One-row (auc, n_pos, n_neg) — EXACT midrank Mann-Whitney AUC.

    AUC = (R1 - n1(n1+1)/2) / (n1 * n0) where R1 is the positive class's
    midrank sum (Auc.java:138-160's statistic, computed distributedly
    instead of over the in-core buffers). Ties get the average rank via
    per-score grouping: midrank = rows_before + (n + 1)/2. All counts are
    integers, so R1 sums are exact in float64 and the single final
    division is bit-reproducible across engines.

    Scale caveat: the prefix window runs over DISTINCT SCORES on a single
    partition. Fine for discrete/quantized scorers (distinct << n); for
    continuous scores distinct ~ n and the plan degenerates — use
    ``auc_sampled`` (the reference's own bounded-buffer contract,
    Auc.java:30-35) at that scale.
    """
    g = (scored.select(F.col(score_col).cast("double").alias("s"),
                       F.col(label_col).cast("int").alias("y"))
         .groupBy("s")
         .agg(F.count("*").alias("n"),
              F.sum("y").alias("np")))
    w = (Window.orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    g2 = g.withColumn("cb", F.coalesce(F.sum("n").over(w), F.lit(0)))
    midrank = F.col("cb") + (F.col("n") + F.lit(1)) / F.lit(2.0)
    sums = g2.agg(
        F.sum(F.col("np") * midrank).alias("r1"),
        F.sum("np").alias("n1"),
        F.sum(F.col("n") - F.col("np")).alias("n0"))
    return sums.select(
        ((F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0))
         / (F.col("n1") * F.col("n0"))).alias("auc"),
        F.col("n1").alias("n_pos"), F.col("n0").alias("n_neg"))


def auc_sql(table: str, label_expr: str, score_expr: str) -> str:
    """DuckDB twin of auc(): same grouping, same midrank, same division."""
    return f"""
WITH g AS (SELECT ({score_expr})::DOUBLE AS s, count(*) AS n,
                  sum(({label_expr})::INT) AS np
           FROM {table} GROUP BY 1),
r AS (SELECT s, n, np,
             coalesce(sum(n) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM g),
sums AS (SELECT sum(np * (cb + (n + 1) / 2.0)) AS r1,
                sum(np) AS n1, sum(n - np) AS n0 FROM r)
SELECT (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0) AS auc,
       n1::BIGINT AS n_pos, n0::BIGINT AS n_neg FROM sums
"""


def auc_sampled(scored: DataFrame, label_col: str = "label",
                score_col: str = "score", max_buffer: int = 10_000,
                seed: int = 7) -> float:
    """The reference Auc.java contract: keep a uniform sample of at most

    ``max_buffer`` scores per class (here: the max_buffer smallest
    xxhash64 ranks — deterministic, retry-stable), then the exact
    rank-sum on the sample. Exactly correct when each class fits the
    buffer, an unbiased estimate above it (AUC is invariant to per-class
    downsampling, Auc.java:30-35). Driver memory is bounded by
    2 * max_buffer floats.
    """
    import numpy as np

    w = Window.partitionBy("y").orderBy("h", "s")
    sample = (scored.select(F.col(score_col).cast("double").alias("s"),
                            F.col(label_col).cast("int").alias("y"))
              .withColumn("h", F.xxhash64("s", "y", F.lit(seed)))
              .withColumn("r", F.row_number().over(w))
              .filter(F.col("r") <= max_buffer)
              .select("y", "s").collect())
    ys = np.array([r["y"] for r in sample])
    ss = np.array([r["s"] for r in sample])
    order = np.argsort(ss, kind="stable")
    ranks = np.empty(len(ss))
    ranks[order] = np.arange(1, len(ss) + 1)
    sorted_s = ss[order]
    i = 0
    while i < len(sorted_s):
        j = i
        while j + 1 < len(sorted_s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    n1 = int((ys == 1).sum())
    n0 = int((ys == 0).sum())
    if n1 == 0 or n0 == 0:
        return float("nan")
    r1 = float(ranks[ys == 1].sum())
    return (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0)


def confusion_matrix(preds: DataFrame, actual_col: str = "actual",
                     predicted_col: str = "predicted") -> DataFrame:
    """(actual, predicted, n) multi-class confusion cells

    (ConfusionMatrix.java's count grid as one groupBy) — feed any scored
    frame; pair with ``accuracy`` for the summary row."""
    return (preds.groupBy(F.col(actual_col).alias("actual"),
                          F.col(predicted_col).alias("predicted"))
            .agg(F.count("*").alias("n")))


def confusion_matrix_sql(table: str, actual_expr: str,
                         predicted_expr: str) -> str:
    return (f"SELECT {actual_expr} AS actual, {predicted_expr} AS predicted,"
            f" count(*) AS n FROM {table} GROUP BY 1, 2")


def confusion_binary(scored: DataFrame, threshold: float = 0.5,
                     label_col: str = "label",
                     score_col: str = "score") -> DataFrame:
    """The Auc.java 2x2: predicted = score > threshold (strict, :75)."""
    pred = (F.col(score_col) > threshold).cast("int")
    return confusion_matrix(
        scored.select(F.col(label_col).alias("actual"),
                      pred.alias("predicted")))


def accuracy(preds: DataFrame, actual_col: str = "actual",
             predicted_col: str = "predicted") -> DataFrame:
    """One-row (accuracy, n_total) over a predictions frame."""
    return preds.agg(
        (F.sum(F.when(F.col(actual_col) == F.col(predicted_col), 1)
               .otherwise(0)) / F.count("*")).alias("accuracy"),
        F.count("*").alias("n_total"))


def grouped_online_auc(df: DataFrame, group_col: str, label_col: str,
                       score_col: str, order_col: str,
                       policy: str = "fifo",
                       window_size: int | None = None,
                       history: int = 10, seed: int = 42) -> DataFrame:
    """Distributed GroupedOnlineAuc (math/.../stats/GroupedOnlineAuc.java:
    46-59 + GlobalOnlineAuc.java:79-127): one sequential online-AUC
    accumulator per group, replayed in ``order_col`` order.

    The estimator is sequential BY DEFINITION (each sample folds into a
    running average against a bounded history), so the Spark shape is
    applyInPandas per group: groups scale out across the cluster, the
    per-group replay stays in-core and bounded (history buffer of
    ``history`` floats per category) — exactly the reference's semantics
    at web-scale group counts (per-user click streams). FAIR/RANDOM
    replacement seeds a deterministic per-group RNG (splitmix of the
    group key), so results are partitioning- and retry-stable.

    Rows are replayed ordered by (order_col, score, label) — pass a
    unique order_col (event time / sequence id) for well-defined
    semantics; the extra keys only break pathological ties
    deterministically. Returns one row per group:
    (group, online_auc, n).
    """
    import pandas as pd

    from ..core.hashing import hash_strings_u64
    from ..core.stats import GlobalOnlineAuc

    src = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.col(label_col).cast("int").alias("y"),
        F.col(score_col).cast("double").alias("s"),
        F.col(order_col).alias("o"))

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o", "s", "y"], kind="mergesort")
        key = pdf["g"].iloc[0]
        gseed = int(hash_strings_u64([repr(key)], seed=seed)[0]) & 0x7FFFFFFF
        acc = GlobalOnlineAuc(policy=policy, window_size=window_size,
                              seed=gseed, history=history)
        last = float("nan")
        for y, s in zip(pdf["y"].to_numpy(), pdf["s"].to_numpy()):
            last = acc.add_sample(int(y), float(s))
        return pd.DataFrame({"g": [key], "online_auc": [last],
                             "n": [len(pdf)]})

    out = src.groupBy("g").applyInPandas(
        replay, schema="g string, online_auc double, n long")
    return (out.withColumnRenamed("g", group_col)
            .withColumnRenamed("n", "n_samples"))


def exponential_average(df: DataFrame, t_col: str, x_col: str,
                        alpha: float,
                        group_cols: list[str] | None = None) -> DataFrame:
    """Distributed OnlineExponentialAverage: the recurrence

    s_n = x_n + e^(-dt/alpha) * s_{n-1} unrolls to
    s = sum_i x_i * e^(-(T - t_i)/alpha) with T = max(t), and likewise
    w = sum_i e^(-(T - t_i)/alpha) — so the sequential accumulator
    becomes ONE grouped aggregation (two passes: max t, then the
    discounted sums; no ordering or state needed). Returns
    (group..., ewa_mean, n).
    """
    gcols = group_cols or []
    t = F.col(t_col).cast("double")
    x = F.col(x_col).cast("double")
    if gcols:
        mx = df.groupBy(*gcols).agg(F.max(t).alias("__T"))
        src = df.join(mx, gcols)
    else:
        # broadcast the 1-row global max instead of an unpartitioned
        # window: Window.partitionBy(lit(1)) funnels EVERY raw event row
        # through one partition before the discounted sums — a
        # scale-killer; the cross join attaches the same value with a
        # map-side broadcast (mirrors the grouped branch)
        mx = df.agg(F.max(t).alias("__T"))
        src = df.crossJoin(F.broadcast(mx))
    disc = F.exp((t - F.col("__T")) / F.lit(float(alpha)))
    agg = [(F.sum(x * disc) / F.sum(disc)).alias("ewa_mean"),
           F.count("*").alias("n")]
    if gcols:
        return src.groupBy(*gcols).agg(*agg)
    return src.agg(*agg)
