"""N-gram language-model perplexity scoring for web-corpus curation.

The CCNet / Gopher-style quality signal the reference's seq2sparse
pipeline stops short of: train an add-k-smoothed n-gram LM on a corpus,
score every document by per-token cross-entropy, and filter the
high-perplexity tail. Reference-free by design (the reference has no LM
layer); the tokenization is the repo's shared ``functions.text`` layer so
LM scores compose with the existing doc_token_stats / gopher signals.

Model: p(w_n | w_1..w_{n-1}) = (c(ngram) + k) / (c(context) + k * V)
where c(context) is the corpus count of the (n-1)-gram over ALL positions
(the standard MLE simplification) and V the unigram vocabulary size.

    cross_entropy(doc) = -(1/T) * sum over ngram occurrences ln p
    perplexity(doc)    = exp(cross_entropy)

Two paths, same model:

* **exact** (`train_lm` + `lm_cross_entropy`) — counts are two
  explode+groupBy scans (map-side combinable); scoring is two string
  equi-joins against the count tables. The per-doc sum folds the ln-terms
  in ngram-sorted order, so the result is bit-reproducible across engines
  (DuckDB twin: ``lm_cross_entropy_sql``) — this is the gate path.
* **sketch** (`train_lm_cms` + `lm_cross_entropy_cms`) — the 100-TB
  path: counts live in two count-min sketches (ngram + context) built by
  the salted two-phase merge, scoring broadcasts the blobs and reads
  point estimates in Arrow batches — no count-table shuffle join at all,
  memory O(1/eps). CMS overestimates counts by <= eps*N w.p. 1-delta, so
  per-term log-probability error is bounded by ln(1 + eps*N/c) on each
  side (pytest pins the bound).

Scale notes: the exact path's ngram-count join is the textbook shuffle
equi-join (AQE handles skew); the Zipf head of the context table is why
the sketch path exists. Documents shorter than n tokens produce no
ngrams and are absent from the output (same in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import (shingles_from_tokens, shingles_from_tokens_sql,
                   tokens_array, tokens_array_sql)

# drop the last space-separated word: "w1 w2 w3" -> "w1 w2"
_CTX_RE = " [^ ]*$"


def ngram_counts(df: DataFrame, text_col: str, n: int = 2,
                 min_count: int = 1) -> DataFrame:
    """Corpus n-gram counts (ngram string, c long): one explode + one
    map-side-combinable groupBy."""
    toks = df.select(tokens_array(F.col(text_col)).alias("__toks"))
    ng = toks.select(F.explode(
        shingles_from_tokens(F.col("__toks"), n)).alias("ngram"))
    out = ng.groupBy("ngram").agg(F.count("*").alias("c"))
    if min_count > 1:
        out = out.filter(F.col("c") >= min_count)
    return out


def train_lm(docs: DataFrame, text_col: str, n: int = 2):
    """(counts_n, counts_ctx, vocab_size) for an n-gram LM (n >= 2).

    counts_ctx are (n-1)-gram counts over all positions; vocab_size is
    the exact distinct-unigram count (one extra row-count over the
    unigram table when n == 2, a separate distinct otherwise)."""
    if n < 2:
        raise ValueError("train_lm needs n >= 2 (context = (n-1)-gram)")
    counts_n = ngram_counts(docs, text_col, n)
    counts_ctx = ngram_counts(docs, text_col, n - 1)
    if n == 2:
        vocab = counts_ctx.count()
    else:
        vocab = ngram_counts(docs, text_col, 1).count()
    return counts_n, counts_ctx, vocab


def lm_cross_entropy(docs: DataFrame, id_col: str, text_col: str,
                     counts_n: DataFrame, counts_ctx: DataFrame,
                     vocab_size: int, n: int = 2,
                     k: float = 0.5) -> DataFrame:
    """Per-document cross-entropy under the exact count tables.

    Returns (id, n_ngrams, cross_entropy). Deterministic across
    partitionings and engines: per-doc ln-terms are folded in
    ngram-sorted order (collect_list -> sort_array -> aggregate), every
    other operation is integer or a single float expression."""
    kv = float(k) * float(vocab_size)
    toks = docs.select(F.col(id_col).alias("__id"),
                       tokens_array(F.col(text_col)).alias("__toks"))
    ng = toks.select("__id", F.explode(
        shingles_from_tokens(F.col("__toks"), n)).alias("ngram"))
    per_doc = (ng.withColumn("ctx", F.regexp_replace("ngram", _CTX_RE, ""))
               .groupBy("__id", "ngram", "ctx")
               .agg(F.count("*").alias("m")))
    joined = (per_doc
              .join(counts_n.withColumnRenamed("c", "cn"), "ngram", "left")
              .join(counts_ctx.select(F.col("ngram").alias("ctx"),
                                      F.col("c").alias("cx")),
                    "ctx", "left"))
    lp = (F.col("m").cast("double")
          * F.log((F.coalesce(F.col("cn"), F.lit(0)) + F.lit(float(k)))
                  / (F.coalesce(F.col("cx"), F.lit(0)) + F.lit(kv))))
    terms = (joined.select("__id", "ngram", "m", lp.alias("lp"))
             .groupBy("__id")
             .agg(F.sum("m").alias("t"),
                  F.sort_array(F.collect_list(
                      F.struct("ngram", "lp"))).alias("arr")))
    total = F.aggregate("arr", F.lit(0.0),
                        lambda acc, x: acc + x["lp"])
    return terms.select(
        F.col("__id").alias(id_col),
        F.col("t").alias("n_ngrams"),
        (-total / F.col("t")).alias("cross_entropy"))


def lm_cross_entropy_sql(doc_table: str, id_expr: str, text_expr: str,
                         n: int = 2, k: float = 0.5,
                         train_table: str | None = None,
                         train_text_expr: str | None = None) -> str:
    """DuckDB twin of train_lm + lm_cross_entropy (self-trained on
    ``train_table``/``train_text_expr``, defaulting to the scored table):
    same counts, same smoothing, same ngram-ordered fold."""
    train_table = train_table or doc_table
    train_text_expr = train_text_expr or text_expr
    kf = repr(float(k))
    return f"""
WITH __lm_ttok AS MATERIALIZED (
  SELECT {tokens_array_sql(train_text_expr)} AS toks FROM {train_table}),
__lm_tng AS (SELECT unnest({shingles_from_tokens_sql('toks', n)}) AS ngram
             FROM __lm_ttok),
__lm_cn AS (SELECT ngram, count(*) AS c FROM __lm_tng GROUP BY 1),
__lm_tcx AS (SELECT unnest({shingles_from_tokens_sql('toks', n - 1)}) AS g
             FROM __lm_ttok),
__lm_cx AS (SELECT g, count(*) AS c FROM __lm_tcx GROUP BY 1),
__lm_v AS (SELECT count(*) AS v
           FROM (SELECT DISTINCT unnest(toks) FROM __lm_ttok)),
__lm_dtok AS MATERIALIZED (
  SELECT {id_expr} AS id, {tokens_array_sql(text_expr)} AS toks
  FROM {doc_table}),
__lm_dng AS (SELECT id, unnest({shingles_from_tokens_sql('toks', n)}) AS ngram
             FROM __lm_dtok),
__lm_doc AS (SELECT id, ngram,
                    regexp_replace(ngram, '{_CTX_RE}', '') AS ctx,
                    count(*) AS m
             FROM __lm_dng GROUP BY 1, 2, 3),
__lm_t AS (SELECT d.id, d.ngram, d.m,
                  d.m::DOUBLE * ln((coalesce(cn.c, 0) + {kf})
                        / (coalesce(cx.c, 0) + {kf} * v.v)) AS lp
           FROM __lm_doc d
           LEFT JOIN __lm_cn cn USING (ngram)
           LEFT JOIN __lm_cx cx ON cx.g = d.ctx
           CROSS JOIN __lm_v v)
SELECT id, sum(m)::BIGINT AS n_ngrams,
       -(list_sum(list(lp ORDER BY ngram))) / sum(m) AS cross_entropy
FROM __lm_t GROUP BY id
"""


def perplexity(cross_entropy: F.Column) -> F.Column:
    return F.exp(cross_entropy)


def lm_filter(scored: DataFrame, max_cross_entropy: float,
              ce_col: str = "cross_entropy") -> DataFrame:
    """Keep documents at or below the cross-entropy cut (CCNet keeps the
    low-perplexity head/middle; pick the cut from a quantile of the
    score distribution — ``tdigest`` pairs well at scale)."""
    return scored.filter(F.col(ce_col) <= max_cross_entropy)


# -- sketch-backed path ------------------------------------------------------


def train_lm_cms(docs: DataFrame, text_col: str, n: int = 2,
                 eps: float = 1e-4, delta: float = 1e-3, seed: int = 1,
                 vocab: str = "exact"):
    """(blob_n, blob_ctx, vocab_size): the two count tables as count-min
    sketches built by the salted two-phase merge — the memory-bounded
    path for 10^12-token corpora where the exact ngram table would
    itself be a large shuffle. ``vocab="hll"`` estimates V with a
    HyperLogLog instead of an exact distinct (the scale default)."""
    from ..sketch.agg import cms_spec, hll_spec, sketch_global

    if n < 2:
        raise ValueError("train_lm_cms needs n >= 2")
    toks = docs.select(tokens_array(F.col(text_col)).alias("__toks"))
    ng = toks.select(F.explode(
        shingles_from_tokens(F.col("__toks"), n)).alias("g"))
    cx = toks.select(F.explode(
        shingles_from_tokens(F.col("__toks"), n - 1)).alias("g"))
    blob_n = sketch_global(ng, cms_spec(eps, delta, seed),
                           key_expr=F.xxhash64("g"))
    blob_ctx = sketch_global(cx, cms_spec(eps, delta, seed),
                             key_expr=F.xxhash64("g"))
    uni = (cx if n == 2 else toks.select(
        F.explode(F.col("__toks")).alias("g")))
    if vocab == "exact":
        v = uni.select("g").distinct().count()
    else:
        hll_blob = sketch_global(uni, hll_spec(),
                                 key_expr=F.xxhash64("g"))
        v = int(round(hll_spec().deserialize(hll_blob).count()))
    return blob_n, blob_ctx, v


def lm_cross_entropy_cms(docs: DataFrame, id_col: str, text_col: str,
                         blob_n: bytes, blob_ctx: bytes, vocab_size: int,
                         n: int = 2, k: float = 0.5) -> DataFrame:
    """Per-document cross-entropy from broadcast CMS blobs: tokenize and
    hash JVM-side (xxhash64, same keys the build used), then one
    mapInPandas pass reads point estimates for every occurrence in Arrow
    batches — no join, no shuffle; the whole model travels as two blobs.
    Returns (id, n_ngrams, cross_entropy)."""
    import numpy as np
    import pandas as pd

    from ..core.cms import CountMinSketch

    kf, kv = float(k), float(k) * float(vocab_size)
    bn, bc = bytes(blob_n), bytes(blob_ctx)
    toks = docs.select(F.col(id_col).alias("id"),
                       tokens_array(F.col(text_col)).alias("__toks"))
    ng = shingles_from_tokens(F.col("__toks"), n)
    keyed = toks.select(
        "id",
        F.transform(ng, lambda g: F.xxhash64(g)).alias("kn"),
        F.transform(shingles_from_tokens(F.col("__toks"), n - 1),
                    lambda g: F.xxhash64(g)).alias("kc"))

    def score(batches):
        sn = CountMinSketch.deserialize(bn)
        sc = CountMinSketch.deserialize(bc)
        for pdf in batches:
            ids, touts, ceouts = [], [], []
            for did, kn, kc in zip(pdf["id"], pdf["kn"], pdf["kc"]):
                t = len(kn)
                if t == 0:
                    continue
                kn = np.asarray(kn, dtype=np.int64)
                # context of occurrence i is the (n-1)-gram at the same
                # start position: the first t entries of kc
                kc = np.asarray(kc, dtype=np.int64)[:t]
                cn = sn.point_batch(kn)
                cx = sc.point_batch(kc)
                lp = np.log((cn + kf) / (cx + kv))
                ids.append(did)
                touts.append(t)
                ceouts.append(-float(lp.sum()) / t)
            yield pd.DataFrame({"id": ids, "n_ngrams": touts,
                                "cross_entropy": ceouts})

    out = keyed.mapInPandas(
        score, schema=f"id {docs.schema[id_col].dataType.simpleString()}, "
                      "n_ngrams long, cross_entropy double")
    return out.withColumnRenamed("id", id_col)
