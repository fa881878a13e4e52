"""DSIR: data selection via importance resampling (hashed n-grams).

The distribution-matching selector for webtext curation — Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"
(arXiv:2302.03169). Raw web documents are re-weighted toward a TARGET
corpus (the high-quality set you wish you had more of): features are
hashed n-gram counts, both corpora fit bag-of-ngrams models over the
hash buckets, each raw doc gets an importance log-weight
log w = Σ_b c_b · (ln p_target[b] − ln p_raw[b]), and the selected
subset is the Gumbel-top-k of the log-weights (sampling WITHOUT
replacement from the softmax — Vieira 2014). No reference anchor: the
reference stops at TF-IDF/seq2sparse; this is the builder brief's
training-data layer.

Scale design (10^12 docs):
- features are map-only: one materialized token-array projection, the
  1..n_max shingle arrays concatenated, one explode, one md5 bucket
  expr; per-doc counts = ONE groupBy(doc, bucket) with map-side combine;
- the two bucket models are tiny (``buckets`` rows) — their totals are
  bounded driver scalars, the log-ratio table is a broadcast join;
- per-doc weight = ln-terms folded in bucket-sorted order
  (collect_list → sort_array → aggregate — the lm.py convention that
  keeps the float fold identical across partitionings AND engines);
- selection is Gumbel keys from the md5 coin (retry-stable, no rand())
  + a global top-k = TakeOrderedAndProject (per-partition heads, no
  full sort).

Everything is DuckDB-replayable: md5_long60 buckets, integer counts,
ln terms summed in the same order; ln itself differs by ≤1 ulp between
libm builds, so gates follow the repo-wide round-at-final-select
convention (6 dp).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashutil import md5_long60, md5_long60_sql
from .text import (shingles_from_tokens, shingles_from_tokens_sql,
                   tokens_array, tokens_array_sql)

DOMAIN60 = float(1 << 60)


def _doc_buckets(docs: DataFrame, id_col: str, text_col: str,
                 buckets: int, n_max: int) -> DataFrame:
    """(__id, bucket, c): per-doc hashed n-gram (n = 1..n_max) counts."""
    toks = docs.select(F.col(id_col).alias("__id"),
                       tokens_array(F.col(text_col)).alias("__toks"))
    feats = F.concat(*[shingles_from_tokens(F.col("__toks"), n)
                       for n in range(1, n_max + 1)])
    return (toks.select("__id", F.explode(feats).alias("__g"))
            .select("__id", F.pmod(md5_long60(F.col("__g")),
                                   F.lit(buckets)).alias("bucket"))
            .groupBy("__id", "bucket").agg(F.count("*").alias("c")))


def _bucket_counts(docs: DataFrame, id_col: str, text_col: str,
                   buckets: int, n_max: int) -> DataFrame:
    return (_doc_buckets(docs, id_col, text_col, buckets, n_max)
            .groupBy("bucket").agg(F.sum("c").alias("n")))


def dsir_log_weights(docs: DataFrame, target: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     target_text_col: str | None = None,
                     buckets: int = 8192, n_max: int = 2,
                     alpha: float = 0.5) -> DataFrame:
    """(id_col, n_feats, log_w): importance log-weight of every doc in
    ``docs`` toward ``target``. Add-alpha smoothed bucket models:
    p[b] = (c_b + alpha) / (N + alpha·buckets)."""
    ttc = target_text_col or text_col
    raw_b = _bucket_counts(docs, id_col, text_col, buckets, n_max)
    tgt_b = (_bucket_counts(target, id_col, ttc, buckets, n_max)
             .withColumnRenamed("n", "nt"))
    n_raw = raw_b.agg(F.sum("n")).collect()[0][0] or 0
    n_tgt = tgt_b.agg(F.sum("nt")).collect()[0][0] or 0
    zr = float(n_raw) + alpha * buckets
    zt = float(n_tgt) + alpha * buckets
    lr = (raw_b.join(tgt_b, "bucket", "left")
          .select("bucket",
                  (F.log((F.coalesce(F.col("nt"), F.lit(0))
                          + F.lit(alpha)) / F.lit(zt))
                   - F.log((F.col("n") + F.lit(alpha)) / F.lit(zr)))
                  .alias("lr")))
    db = _doc_buckets(docs, id_col, text_col, buckets, n_max)
    # every doc bucket exists in raw_b by construction (same corpus)
    terms = (db.join(F.broadcast(lr), "bucket")
             .select("__id", "c",
                     (F.col("c").cast("double") * F.col("lr"))
                     .alias("t"), "bucket")
             .groupBy("__id")
             .agg(F.sum("c").alias("nf"),
                  F.sort_array(F.collect_list(
                      F.struct("bucket", "t"))).alias("arr")))
    total = F.aggregate("arr", F.lit(0.0), lambda acc, x: acc + x["t"])
    return terms.select(F.col("__id").alias(id_col),
                        F.col("nf").cast("long").alias("n_feats"),
                        total.alias("log_w"))


def gumbel_key(id_col: F.Column, seed: int) -> F.Column:
    """Deterministic Gumbel(0,1) draw from the md5 coin: u = (h+0.5)/2^60
    ∈ (0,1), g = −ln(−ln u). Retry-stable, engine-exact arithmetic."""
    h = md5_long60(F.concat(id_col.cast("string"), F.lit(f"|{seed}")))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(DOMAIN60)
    return -F.log(-F.log(u))


def gumbel_key_sql(id_expr: str, seed: int) -> str:
    h = md5_long60_sql(f"({id_expr})::VARCHAR || '|{seed}'")
    return f"-ln(-ln((({h})::DOUBLE + 0.5) / {DOMAIN60!r}))"


def dsir_sample(docs: DataFrame, target: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                target_text_col: str | None = None,
                buckets: int = 8192, n_max: int = 2,
                alpha: float = 0.5, seed: int = 1) -> DataFrame:
    """(id_col, n_feats, log_w, key): the Gumbel-top-k selection —
    k docs sampled without replacement ∝ softmax(log_w). Global top-k
    by (key DESC, id) — TakeOrderedAndProject, no full sort."""
    w = dsir_log_weights(docs, target, id_col, text_col,
                         target_text_col, buckets, n_max, alpha)
    keyed = w.withColumn("key",
                         F.col("log_w") + gumbel_key(F.col(id_col), seed))
    return keyed.orderBy(F.col("key").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _doc_buckets_sql(rel: str, id_col: str, text_col: str, buckets: int,
                     n_max: int, tag: str) -> str:
    """CTE chain {tag}_toks, {tag}_db replaying _doc_buckets."""
    shingle_lists = " || ".join(
        shingles_from_tokens_sql("toks", n) for n in range(1, n_max + 1))
    b = md5_long60_sql("g")
    return f"""{tag}_toks AS MATERIALIZED (
  SELECT {id_col} AS id, {tokens_array_sql(text_col)} AS toks FROM {rel}
),
{tag}_db AS (
  SELECT id, ({b}) % {buckets} AS bucket, count(*) AS c
  FROM (SELECT id, unnest({shingle_lists}) AS g FROM {tag}_toks)
  GROUP BY 1, 2
)"""


def dsir_log_weights_sql(raw_rel: str, target_rel: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         target_text_col: str | None = None,
                         buckets: int = 8192, n_max: int = 2,
                         alpha: float = 0.5,
                         round_dp: int | None = 6) -> str:
    """DuckDB replay of dsir_log_weights — same buckets, same smoothing,
    same bucket-sorted float fold; log_w rounded at ``round_dp`` (the
    repo's ln convention; pass None for raw)."""
    ttc = target_text_col or text_col
    raw = _doc_buckets_sql(raw_rel, id_col, text_col, buckets, n_max,
                           "__dsr")
    tgt = _doc_buckets_sql(target_rel, id_col, ttc, buckets, n_max,
                           "__dst")
    ab = float(alpha) * buckets
    w = "list_aggregate(list(t ORDER BY bucket), 'sum')"
    if round_dp is not None:
        w = f"round({w}, {round_dp})"
    return f"""
WITH {raw},
{tgt},
__ds_rawb AS (SELECT bucket, sum(c) AS n FROM __dsr_db GROUP BY 1),
__ds_tgtb AS (SELECT bucket, sum(c) AS nt FROM __dst_db GROUP BY 1),
__ds_tot AS (
  SELECT (SELECT sum(n) FROM __ds_rawb)::DOUBLE + {ab!r} AS zr,
         (SELECT coalesce(sum(nt), 0) FROM __ds_tgtb)::DOUBLE + {ab!r}
         AS zt),
__ds_lr AS (
  SELECT r.bucket,
         ln((coalesce(t.nt, 0) + {float(alpha)!r}) / (SELECT zt FROM __ds_tot))
         - ln((r.n + {float(alpha)!r}) / (SELECT zr FROM __ds_tot)) AS lr
  FROM __ds_rawb r LEFT JOIN __ds_tgtb t ON r.bucket = t.bucket),
__ds_terms AS (
  SELECT d.id, d.bucket, d.c, d.c::DOUBLE * l.lr AS t
  FROM __dsr_db d JOIN __ds_lr l ON d.bucket = l.bucket)
SELECT id AS {id_col}, sum(c)::BIGINT AS n_feats, {w} AS log_w
FROM __ds_terms GROUP BY id
"""
