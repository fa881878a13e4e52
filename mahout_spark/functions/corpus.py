"""Corpus-statistics report functions — the per-language composition
table a corpus owner reads first (volume, length distribution, duplicate
rate, quality-gate pass rate) plus its DuckDB SQL twin.

Plan shape (10^12-doc posture): ONE pass over the corpus into two
aggregations — a per-language groupBy of algebraic aggs (map-side combine
absorbs the Zipf language head) and one exact-dup hash-groupBy. Length
quantiles are exact interpolated percentiles here (report scale); at
corpus scale swap in the gated t-digest path (sketch/queries.py) — same
output columns. Consumed by jobs/corpusstats.py (spark-submit CLI) and
gated as corpus_language_stats.
"""

from __future__ import annotations


def per_language_stats(docs, text_col: str, lang_col: str,
                       gopher: bool = True):
    """(lang, n_docs, n_tokens, n_chars, mean_tokens, p50_tokens,
    p90_tokens, dup_docs, gopher_pass) — one groupBy of algebraic +
    percentile aggs plus one hash-groupBy for the dup count."""
    from pyspark.sql import functions as F

    from mahout_spark.functions.webquality import words_array

    base = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(text_col).alias("__t"),
        F.size(words_array(F.col(text_col))).alias("__n"))
    aggs = [F.count("*").alias("n_docs"),
            F.sum("__n").cast("long").alias("n_tokens"),
            F.sum(F.length("__t")).cast("long").alias("n_chars"),
            F.round(F.avg("__n"), 6).alias("mean_tokens"),
            F.round(F.expr("percentile(__n, 0.5)"), 6).alias("p50_tokens"),
            F.round(F.expr("percentile(__n, 0.9)"), 6).alias("p90_tokens")]
    if gopher:
        from mahout_spark.functions.webquality import gopher_keep

        aggs.append(F.sum(gopher_keep(F.col("__t")).cast("long"))
                    .cast("long").alias("gopher_pass"))
    stats = base.groupBy("lang").agg(*aggs)
    dups = (base.groupBy("lang", F.xxhash64("__t").alias("__h"))
            .agg(F.count("*").alias("c"))
            .groupBy("lang")
            .agg((F.sum("c") - F.count("*")).cast("long")
                 .alias("dup_docs")))
    return stats.join(dups, "lang")


def per_language_stats_sql(table: str, text_col: str = "text",
                           lang_col: str = "lang",
                           gopher: bool = True) -> str:
    """DuckDB replay (string-hash dup grouping; quantile_cont matches
    Spark's interpolated percentile — integer inputs, 6 dp rounding)."""
    from mahout_spark.functions.webquality import (gopher_keep_sql,
                                                   words_array_sql)

    toks = words_array_sql(text_col)
    gp = (f", sum(CASE WHEN {gopher_keep_sql('t')} THEN 1 ELSE 0 "
          f"END)::BIGINT AS gopher_pass" if gopher else "")
    return f"""
WITH base AS MATERIALIZED (
  SELECT {lang_col} AS lang, {text_col} AS t, len({toks}) AS n
  FROM {table}
),
stats AS (
  SELECT lang, count(*) AS n_docs, sum(n)::BIGINT AS n_tokens,
         sum(length(t))::BIGINT AS n_chars,
         round(avg(n), 6) AS mean_tokens,
         round(quantile_cont(n, 0.5), 6) AS p50_tokens,
         round(quantile_cont(n, 0.9), 6) AS p90_tokens{gp}
  FROM base GROUP BY lang
),
dups AS (
  SELECT lang, (sum(c) - count(*))::BIGINT AS dup_docs
  FROM (SELECT lang, t, count(*) AS c FROM base GROUP BY lang, t)
  GROUP BY lang
)
SELECT s.*, d.dup_docs FROM stats s JOIN dups d USING (lang)
"""
