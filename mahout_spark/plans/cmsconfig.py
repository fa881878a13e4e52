"""Per-group (δ, ε) CMS auto-configuration with a memoization table.

The reference resolves a per-user (δ, ε) by grid-searching the
privacy/accuracy F-measure and memoizes the result to ``ser/<dataset>_q_
<q>.ser`` (CountMinSketchConfig.java:57-158). Here the search is the
vectorized NumPy routine in core.cms.compute_config, driven by per-group
statistics computed in ONE aggregation pass (n = interactions, u = distinct
keys — u estimable by HLL at 10^12 scale), and memoized to a parquet
config table keyed by (dataset, group, q) — the same role the checkpoint/
lineage table plays for scan state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.core.cms import cms_shape, compute_config

CONFIG_SCHEMA = ("dataset string, group_key string, q double, n long, "
                 "u long, delta double, eps double, depth int, width int")


def group_stats(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group_key, n, u) per group — one aggregation pass.

    u uses exact countDistinct here; at web scale substitute the HLL
    sketch estimate (SURVEY §2.4) — the config search only needs u to
    ~1% accuracy.
    """
    return df.groupBy(F.col(group_col).alias("group_key")).agg(
        F.count("*").alias("n"),
        F.countDistinct(key_col).alias("u"))


def configure_groups(spark: SparkSession, df: DataFrame, group_col: str,
                     key_col: str, dataset: str, q: float,
                     table_path: str, max_width: int = 4096) -> DataFrame:
    """Resolve (δ, ε, depth, width) per group, reusing memoized rows.

    Returns the full config DataFrame for this (dataset, q). Groups already
    present in the table are not re-searched (the reference's .ser cache,
    distributed).
    """
    stats = group_stats(df, group_col, key_col).toPandas()

    cached = {}
    if os.path.exists(table_path):
        prev = (spark.read.parquet(table_path)
                .filter((F.col("dataset") == dataset) & (F.col("q") == q))
                .toPandas())
        cached = {r.group_key: r for r in prev.itertuples()}

    new_rows = []
    for r in stats.itertuples():
        gk = str(r.group_key)
        if gk in cached:
            continue
        delta, eps = compute_config(int(r.n), int(max(r.u, 1)), q,
                                    max_width=max_width)
        d, w = cms_shape(eps, delta)
        new_rows.append((dataset, gk, float(q), int(r.n), int(r.u),
                         float(delta), float(eps), d, w))
    if new_rows:
        (spark.createDataFrame(new_rows, CONFIG_SCHEMA)
         .write.mode("append").parquet(table_path))
    return (spark.read.parquet(table_path)
            .filter((F.col("dataset") == dataset) & (F.col("q") == q)))
