"""Text vectorization — the seq2sparse pipeline re-expressed declaratively.

Reference flow (mr/.../vectorizer/SparseVectorsFromSequenceFiles.java):
tokenize → dictionary → TF vectors → DF counts → TF-IDF weight →
p-norm normalize → prune high-DF terms. Each MR phase is one DataFrame
stage here; the dictionary is a DataFrame join (never collected), the
weight formulas come from math-scala/.../nlp/tfidf/TFIDF.scala.

Collocations (bigram LLR) mirror mr/.../vectorizer/collocations/llr:
n-gram counting + LLR against unigram margins — same contingency build as
the cooccurrence pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mahout_spark.functions.measures import llr_cooc_expr, llr_cooc_sql
from mahout_spark.functions.text import (explode_tokens, tokens_array,
                                         tokens_array_sql)


def term_counts(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, token, tf) — long-form TF vectors."""
    return (explode_tokens(docs, id_col, text_col)
            .groupBy(id_col, "token").agg(F.count("*").alias("tf")))


def doc_freq(tc: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(token, df) — document frequency."""
    return tc.groupBy("token").agg(
        F.countDistinct(id_col).alias("df"))


def build_dictionary(tc: DataFrame) -> DataFrame:
    """(token, token_id) — deterministic ordinals by (df desc, token).

    The reference builds its dictionary by collect+broadcast
    (IndexedDatasetSpark.scala:84-101); we keep it distributed, and rank
    with the per-partition-counts zipWithIndex shape (global_sorted_rank)
    instead of a single-partition global window.
    """
    from mahout_spark.operators.drm import global_sorted_rank

    dfreq = doc_freq(tc)
    ranked = global_sorted_rank(dfreq, [F.desc("df"), F.asc("token")],
                                out_col="token_id")
    return ranked.select("token", "token_id", "df")


def tfidf(docs: DataFrame, variant: str = "mahout", id_col: str = "doc_id",
          text_col: str = "text", min_df: int = 1,
          max_df_fraction: float | None = None) -> DataFrame:
    """(doc_id, token, weight) under the reference's weight variants

    (TFIDF.scala): 'mahout' = sqrt(tf)·(log(N/(df+1))+1);
    'mllib' = tf·log((N+1)/(df+1)); 'tf' = tf. High-DF pruning mirrors
    HighDFWordsPruner (maxDFPercent).
    """
    from mahout_spark.plans.scaleio import widen_partitions

    # widen a single-row-group source so tokenize+explode parallelizes
    # (guide §2.5); count aggregation is partition-insensitive. Inputs
    # under a few MB tokenize serially faster than an exchange costs
    # (measured crossover at sf0.1 vs 10x), hence the byte floor.
    tc = term_counts(widen_partitions(docs.select(id_col, text_col),
                                      min_bytes=4 << 20),
                     id_col, text_col)
    if max_df_fraction is not None:
        # pruning needs the concrete count driver-side
        n_docs = docs.select(id_col).distinct().count()
        n = F.lit(float(n_docs))
    else:
        # fold the corpus count into the one job as a broadcast scalar —
        # same value, no separate count action (guide §2.4: fewer passes)
        nd = docs.select(id_col).distinct().agg(
            F.count("*").cast("double").alias("__n_docs"))
        n = F.col("__n_docs")
    dfreq = doc_freq(tc, id_col)
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    if max_df_fraction is not None:
        dfreq = dfreq.filter(
            F.col("df") <= int(max_df_fraction * n_docs))
    j = tc.join(dfreq, "token")
    if max_df_fraction is None:
        j = j.crossJoin(F.broadcast(nd))
    tf, df = F.col("tf").cast("double"), F.col("df").cast("double")
    if variant == "mahout":
        w = F.sqrt(tf) * (F.log(n / (df + 1)) + 1.0)
    elif variant == "mllib":
        w = tf * F.log((n + 1) / (df + 1))
    elif variant == "tf":
        w = tf
    else:
        raise ValueError(variant)
    return j.select(id_col, "token", w.alias("weight"))


def tfidf_sql(table: str, variant: str = "mahout", id_col: str = "doc_id",
              text_col: str = "text") -> str:
    """DuckDB twin of tfidf() (no pruning) for the oracle gate."""
    toks = tokens_array_sql(text_col)
    tf, df, n = "(tf)::DOUBLE", "(df)::DOUBLE", "(SELECT n FROM nd)::DOUBLE"
    w = {
        "mahout": f"sqrt({tf}) * (ln({n} / ({df} + 1)) + 1.0)",
        "mllib": f"{tf} * ln(({n} + 1) / ({df} + 1))",
        "tf": tf,
    }[variant]
    return f"""
WITH tok AS (SELECT {id_col}, unnest({toks}) AS token FROM {table}),
tc AS (SELECT {id_col}, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT {id_col}) AS df FROM tc GROUP BY 1),
nd AS (SELECT count(DISTINCT {id_col}) AS n FROM {table})
SELECT tc.{id_col} AS {id_col}, tc.token AS token, {w} AS weight
FROM tc JOIN dfreq ON tc.token = dfreq.token
"""


def normalize_rows(vectors: DataFrame, p: float = 2.0,
                   id_col: str = "doc_id",
                   val_col: str = "weight") -> DataFrame:
    """p-norm row normalization (seq2sparse --norm)."""
    w = Window.partitionBy(id_col)
    v = F.col(val_col)
    norm = F.pow(F.sum(F.pow(F.abs(v), F.lit(p))).over(w), 1.0 / p)
    return vectors.withColumn(val_col, v / norm)


def encoded_vectors(docs: DataFrame, dim: int = 1 << 12,
                    id_col: str = "doc_id", text_col: str = "text",
                    seed: int = 0) -> DataFrame:
    """Feature-hashing ('hash trick') vectors — EncodedVectorsFrom-

    SequenceFiles / EncodingMapper: no dictionary, token -> bucket =
    hash(token) mod dim; (doc_id, bucket, weight=count). The same trick
    CMS itself uses, so collisions follow the CMS analysis.
    """
    toks = explode_tokens(docs, id_col, text_col)
    bucket = F.pmod(F.xxhash64(F.col("token"), F.lit(seed)), F.lit(dim))
    return (toks.withColumn("bucket", bucket)
            .groupBy(id_col, "bucket")
            .agg(F.count("*").cast("double").alias("weight")))


def bigram_collocations(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", min_llr: float = 1.0,
                        min_count: int = 2) -> DataFrame:
    """(gram_a, gram_b, n_ab, llr) — LLR-scored bigrams (CollocDriver).

    Contingency per bigram (a,b): k11 = count(ab), margins from unigram
    head/tail counts, N = total bigrams — LogLikelihood.java semantics.
    """
    toks = docs.select(F.col(id_col),
                       tokens_array(F.col(text_col)).alias("__toks"))
    pairs = toks.select(
        F.explode(F.when(F.size("__toks") >= 2, F.expr(
            "transform(sequence(0, size(__toks) - 2), "
            "i -> struct(__toks[i] as a, __toks[i+1] as b))")
        ).otherwise(F.array())).alias("bg")
    ).select(F.col("bg.a").alias("gram_a"), F.col("bg.b").alias("gram_b"))
    bg = pairs.groupBy("gram_a", "gram_b").agg(F.count("*").alias("n_ab"))
    bg = bg.filter(F.col("n_ab") >= min_count)
    heads = pairs.groupBy("gram_a").agg(F.count("*").alias("n_a"))
    tails = pairs.groupBy("gram_b").agg(F.count("*").alias("n_b"))
    total = pairs.count()
    scored = (bg.join(heads, "gram_a").join(tails, "gram_b")
              .withColumn("llr", F.round(llr_cooc_expr(
                  F.col("n_a"), F.col("n_b"), F.col("n_ab"),
                  F.lit(total)), 6)))
    # llr rounded to 6dp: ln() differs in the last ulp across engines;
    # rounding makes the value (and the threshold decision) engine-exact
    return (scored.filter(F.col("llr") >= min_llr)
            .select("gram_a", "gram_b", "n_ab", "llr"))


def bigram_collocations_sql(table: str, id_col: str = "doc_id",
                            text_col: str = "text", min_llr: float = 1.0,
                            min_count: int = 2) -> str:
    toks = tokens_array_sql(text_col)
    llr = ("round(" + llr_cooc_sql("n_a", "n_b", "n_ab", "(SELECT t FROM total)")
           + ", 6)")
    return f"""
WITH tl AS (SELECT {id_col}, {toks} AS toks FROM {table}),
pairs AS (
  SELECT toks[i] AS gram_a, toks[i + 1] AS gram_b
  FROM tl, unnest(range(1, len(toks))) u(i)
  WHERE len(toks) >= 2),
bg AS (SELECT gram_a, gram_b, count(*) AS n_ab FROM pairs
       GROUP BY 1, 2 HAVING count(*) >= {min_count}),
heads AS (SELECT gram_a, count(*) AS n_a FROM pairs GROUP BY 1),
tails AS (SELECT gram_b, count(*) AS n_b FROM pairs GROUP BY 1),
total AS (SELECT count(*) AS t FROM pairs)
SELECT bg.gram_a AS gram_a, bg.gram_b AS gram_b, bg.n_ab AS n_ab,
       {llr} AS llr
FROM bg JOIN heads ON bg.gram_a = heads.gram_a
        JOIN tails ON bg.gram_b = tails.gram_b
WHERE {llr} >= {min_llr}
"""
