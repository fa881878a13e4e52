"""LDA via CVB0 (collapsed variational Bayes, zeroth-order).

Reference anchors (studied, not copied):
- mr/.../clustering/lda/cvb/TopicModel.java:284-304 (trainDocTopicModel:
  gamma[x][a] = (ttc[x][a]+eta)*(docTopics[x]+alpha)/(topicSums[x]+eta*V),
  normalized over x per term, then multiplied by c_ai; docTopics[x] =
  sum_a gamma[x][a], renormalized to 1)
- mr/.../clustering/lda/cvb/TopicModel.java:358-383 (pTopicGivenTerm),
  386-401 (perplexity: -sum c_ai log sum_x p(x|i)p(a|x), smoothed)
- mr/.../clustering/lda/cvb/ModelTrainer.java:264-295 (TrainerRunnable:
  numDocTopicIters fixed-point passes, then writeModel.update(gamma))
- mr/.../clustering/lda/cvb/CachingCVB0Mapper.java:113-119 (per MR pass
  docTopics restart from uniform 1/K; maxIters default 10)
- mr/.../clustering/lda/cvb/CVB0Driver.java:122-129 (defaults: alpha =
  eta = 1e-4, maxItersPerDoc = 10; outer loop over full-corpus passes)

Spark-first shape (NOT the MR translation): the corpus lives as
(doc_id, term_id, count) triples. One outer CVB0 pass is

    corpus ⋈ model (term-keyed; broadcast when V x K is small)
      -> groupBy(doc_id).applyInPandas        # inner fixed-point loop,
         (doc-local NumPy, 10 iters default)  # Arrow-batched
      -> (term_id, gamma[K]) rows
      -> posexplode + groupBy(term_id, topic) sum   # model update
      -> new model (term_id, topics[K])

i.e. exactly one shuffle-join plus one aggregation per pass; topic sums
are K driver-side doubles (collected from a K-row aggregate). At corpus
scale the join is the plan you want: triples co-partitioned by term for
the update, docs grouped by doc_id for inference, no driver-side
per-doc loop, model broadcastable whenever V*K*8 bytes fits
(spark.sql.autoBroadcastJoinThreshold governs — typical 100k-term,
20-topic model is 16 MB).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["LDAModel", "lda_init_model", "cvb0_iteration", "cvb0_train",
           "cvb0_doc_gamma", "lda_perplexity", "cvb0_doc_gamma_sql"]


def lda_init_model(spark: SparkSession, num_terms: int, k: int,
                   seed: int = 1234, integral: bool = False) -> DataFrame:
    """Deterministic pseudo-random init model: (term_id, topics[K]).

    TopicModel.randomMatrix (TopicModel.java:188-202) draws uniform
    counts per (topic, term); here the draw is a pure column expression
    — uniform in (0,1] from xxhash64(term, topic, seed) — so every
    executor (and DuckDB, for the gate twin) can recompute the identical
    init without an RNG broadcast. ``integral=True`` yields small exact
    integers (1..8) instead, which makes downstream float expressions
    bit-reproducible across engines (gate mode).
    """
    terms = spark.range(num_terms).select(F.col("id").alias("term_id"))
    cols = []
    for x in range(k):
        h = F.xxhash64(F.col("term_id"), F.lit(x), F.lit(seed))
        u = (F.pmod(h, F.lit(1_000_000)) + F.lit(1)) / F.lit(1_000_000.0)
        cols.append((F.floor(u * 8) + 1).cast("double") if integral else u)
    return terms.select("term_id", F.array(*cols).alias("topics"))


def _topic_sums(model: DataFrame, k: int) -> np.ndarray:
    """K driver-side doubles: sum_a ttc[x][a] (TopicModel.topicSums)."""
    agg = model.select(*[
        F.sum(F.col("topics")[x]).alias(f"s{x}") for x in range(k)]).first()
    return np.array([agg[f"s{x}"] for x in range(k)], dtype=np.float64)


def _gamma_pandas_factory(k: int, alpha: float, eta: float,
                          num_terms: int, topic_sums: np.ndarray,
                          doc_iters: int):
    """Per-doc inner loop (TrainerRunnable.run): doc_iters fixed-point

    passes of trainDocTopicModel starting from uniform docTopics, in
    doc-local NumPy. Input pdf: term_id, cnt, topics (K-array). Output:
    one row per input term with the final gamma[K] plus the converged
    docTopics[K] (same on every row of the doc)."""
    denom = topic_sums + eta * num_terms  # (K,)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        ttc = np.stack(pdf["topics"].to_numpy())      # (T, K)
        cnt = pdf["cnt"].to_numpy(dtype=np.float64)   # (T,)
        beta = (ttc + eta) / denom                    # (T, K) p(a|x)-ish
        theta = np.full(k, 1.0 / k)
        gamma = None
        for _ in range(doc_iters):
            gamma = beta * (theta + alpha)            # (T, K)
            gamma /= gamma.sum(axis=1, keepdims=True)
            gamma *= cnt[:, None]
            topic_mass = gamma.sum(axis=0)
            theta = topic_mass / topic_mass.sum()
        out = pdf[["doc_id", "term_id"]].copy()
        out["gamma"] = list(gamma)
        out["doc_topics"] = [theta] * len(out)
        return out

    return run


def cvb0_iteration(corpus: DataFrame, model: DataFrame,
                   topic_sums: np.ndarray, k: int,
                   alpha: float = 1e-4, eta: float = 1e-4,
                   num_terms: int | None = None,
                   doc_iters: int = 10,
                   broadcast_model: bool = True) -> DataFrame:
    """One full-corpus CVB0 pass -> per-(doc, term) gamma rows.

    Returns (doc_id, term_id, gamma array<double>[K], doc_topics
    array<double>[K]) — the sufficient statistics of the pass. The model
    update (CachingCVB0Mapper cleanup + VectorSumReducer) is
    ``gamma_to_model`` on this frame; doc inference output is the
    distinct (doc_id, doc_topics) projection.
    """
    if num_terms is None:
        num_terms = model.count()
    m = F.broadcast(model) if broadcast_model else model
    joined = (corpus
              .select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("term_id").cast("long").alias("term_id"),
                      F.col("cnt").cast("double").alias("cnt"))
              .join(m.select(F.col("term_id").cast("long").alias("term_id"),
                             "topics"), "term_id")
              .select("doc_id", "term_id", "cnt", "topics"))
    fn = _gamma_pandas_factory(k, alpha, eta, num_terms, topic_sums,
                               doc_iters)
    schema = ("doc_id long, term_id long, gamma array<double>, "
              "doc_topics array<double>")
    return joined.groupBy("doc_id").applyInPandas(fn, schema=schema)


def gamma_to_model(gamma_df: DataFrame, k: int) -> DataFrame:
    """Model update: new ttc[x][a] = sum over docs of gamma[x][a]

    (writeModel.update + VectorSumReducer). posexplode + one groupBy —
    term-keyed, map-side combinable."""
    g = gamma_df.select("term_id",
                        F.posexplode("gamma").alias("topic", "g"))
    per = (g.groupBy("term_id", "topic").agg(F.sum("g").alias("s")))
    return (per.groupBy("term_id")
            .agg(F.array_sort(F.collect_list(
                F.struct("topic", "s"))).alias("ts"))
            .select("term_id",
                    F.transform("ts", lambda t: t["s"]).alias("topics")))


class LDAModel:
    """Trained CVB0 topic model over (term_id, topics[K])."""

    def __init__(self, model: DataFrame, topic_sums: np.ndarray, k: int,
                 alpha: float, eta: float, num_terms: int,
                 iterations: int,
                 perplexity_history: list[float] | None = None):
        self.model = model
        self.topic_sums = topic_sums
        self.k = k
        self.alpha = alpha
        self.eta = eta
        self.num_terms = num_terms
        self.iterations = iterations
        self.perplexity_history = perplexity_history or []

    def doc_topics(self, corpus: DataFrame,
                   doc_iters: int = 10) -> DataFrame:
        """(doc_id, doc_topics[K]) — inference only, no model update

        (CVB0DocInferenceMapper.java:38-50)."""
        g = cvb0_iteration(corpus, self.model, self.topic_sums, self.k,
                           self.alpha, self.eta, self.num_terms,
                           doc_iters)
        return (g.groupBy("doc_id")
                .agg(F.first("doc_topics").alias("doc_topics")))

    def top_terms(self, n: int = 10) -> DataFrame:
        """(topic, term_id, weight) — n heaviest terms per topic

        (CVB0Driver topic-term output, normalized p(a|x))."""
        from mahout_spark.operators.topk import topk_per_group

        ts = [float(s) for s in self.topic_sums]
        g = self.model.select(
            "term_id", F.posexplode("topics").alias("topic", "w"))
        g = g.select("topic", "term_id",
                     (F.col("w") / F.element_at(
                         F.array(*[F.lit(s) for s in ts]),
                         F.col("topic") + 1)).alias("weight"))
        return topk_per_group(g, ["topic"], "weight", n,
                              tiebreak_cols=["term_id"])


def cvb0_train(corpus: DataFrame, k: int, num_terms: int | None = None,
               alpha: float = 1e-4, eta: float = 1e-4,
               max_iterations: int = 10, doc_iters: int = 10,
               seed: int = 1234,
               track_perplexity: bool = False) -> LDAModel:
    """CVB0Driver.run as a Spark outer loop: each pass re-reads the

    corpus (never cached exploded — see jobs/topk_cosine.py note),
    joins the current model, runs the doc-local fixed point, and
    aggregates the next model. Only K doubles (topic sums) and the
    optional perplexity scalar ever touch the driver."""
    spark = corpus.sparkSession
    if num_terms is None:
        num_terms = int(corpus.agg(
            F.max("term_id").alias("m")).first()["m"]) + 1
    model = lda_init_model(spark, num_terms, k, seed).persist()
    sums = _topic_sums(model, k)
    history: list[float] = []
    for _ in range(max_iterations):
        g = cvb0_iteration(corpus, model, sums, k, alpha, eta,
                           num_terms, doc_iters)
        new_model = gamma_to_model(g, k).persist()
        new_model.count()  # materialize before dropping the old model
        model.unpersist()
        model = new_model
        sums = _topic_sums(model, k)
        if track_perplexity:
            history.append(lda_perplexity(
                corpus, model, sums, k, alpha, eta, num_terms))
    return LDAModel(model, sums, k, alpha, eta, num_terms,
                    max_iterations, history)


def lda_perplexity(corpus: DataFrame, model: DataFrame,
                   topic_sums: np.ndarray, k: int,
                   alpha: float = 1e-4, eta: float = 1e-4,
                   num_terms: int | None = None,
                   doc_iters: int = 10) -> float:
    """Corpus perplexity (TopicModel.perplexity normalized by corpus

    token mass, ModelTrainer.calculatePerplexity:116-135): docTopics are
    re-inferred (10 fixed-point passes, no update), then
    -sum c_ai log(sum_x p~(x|i) p~(a|x)) / sum c_ai with the smoothed
    estimates. All-JVM after the gamma pass."""
    if num_terms is None:
        num_terms = model.count()
    g = cvb0_iteration(corpus, model, topic_sums, k, alpha, eta,
                       num_terms, doc_iters)
    joined = g.join(model, "term_id")
    # corpus count c_ai = gamma row mass (gamma sums to c_ai over topics)
    denom = [float(s) + eta * num_terms for s in topic_sums]
    prob = None
    theta_norm = (F.aggregate(F.col("doc_topics"), F.lit(0.0),
                              lambda a, x: a + x) + k * alpha)
    for x in range(k):
        p = ((F.col("doc_topics")[x] + alpha) / theta_norm
             * (F.col("topics")[x] + eta) / F.lit(denom[x]))
        prob = p if prob is None else prob + p
    cnt = F.aggregate(F.col("gamma"), F.lit(0.0), lambda a, g_: a + g_)
    r = joined.select(cnt.alias("c"), prob.alias("p")).agg(
        (-F.sum(F.col("c") * F.log("p"))).alias("num"),
        F.sum("c").alias("den")).first()
    return float(r["num"] / r["den"])


# ---------------------------------------------------------------------------
# Gate path: ONE inner iteration from uniform docTopics, pure Catalyst
# ---------------------------------------------------------------------------


def cvb0_doc_gamma(corpus: DataFrame, model: DataFrame,
                   topic_sums: list[float] | np.ndarray, k: int,
                   alpha: float = 1e-4, eta: float = 1e-4,
                   num_terms: int | None = None) -> DataFrame:
    """(doc_id, term_id, topic, gamma) after exactly one

    trainDocTopicModel pass at uniform docTopics = 1/K — the closed-form
    special case where gamma needs no fixed point:

        gamma[x][a] = c_ai * w_x(a) / sum_x' w_x'(a),
        w_x(a) = (ttc[x][a]+eta) * (1/K+alpha) / (topicSums[x]+eta*V)

    Every arithmetic step is a scalar column expression and the
    normalizing sum is an ORDERED left fold over topics, so a DuckDB
    twin (cvb0_doc_gamma_sql) reproduces it bit-for-bit when the init
    model is integral — this is the hash-exact gate for the CVB0 math;
    the multi-iteration trajectory is pytest-oracled in NumPy."""
    if num_terms is None:
        num_terms = model.count()
    ts = [float(s) for s in topic_sums]
    w = [(F.col("topics")[x] + F.lit(eta))
         * F.lit((1.0 / k + alpha) / (ts[x] + eta * num_terms))
         for x in range(k)]
    tot = w[0]
    for wx in w[1:]:
        tot = tot + wx
    gam = F.array(*[wx / tot * F.col("cnt") for wx in w])
    return (corpus
            .select("doc_id", "term_id",
                    F.col("cnt").cast("double").alias("cnt"))
            .join(F.broadcast(model), "term_id")
            .select("doc_id", "term_id",
                    F.posexplode(gam).alias("topic", "gamma")))


def arithmetic_init_model(spark: SparkSession, num_terms: int,
                          k: int) -> DataFrame:
    """Integral init model from pure integer arithmetic on term_id —

    topics[x] = (term_id * (x+3) + x) % 7 + 1 — trivially recomputable
    in any SQL engine (the gate's replayable stand-in for the hash
    init; production uses lda_init_model)."""
    terms = spark.range(num_terms).select(F.col("id").alias("term_id"))
    cols = [((F.col("term_id") * (x + 3) + x) % 7 + 1).cast("double")
            for x in range(k)]
    return terms.select("term_id", F.array(*cols).alias("topics"))


def cvb0_doc_gamma_sql(corpus_sql: str, k: int, num_terms: int,
                       alpha: float = 1e-4, eta: float = 1e-4,
                       round_dp: int = 6) -> str:
    """DuckDB twin of cvb0_doc_gamma over the arithmetic_init_model:

    the identical scalar expression chain — integral topic sums computed
    exactly, w_x = (t_x + eta) * ((1/K + alpha) / (S_x + eta*V)),
    ordered left-fold total, gamma = w_x / tot * cnt. ``corpus_sql``
    must yield (doc_id, term_id, cnt)."""
    tcols = ", ".join(
        f"((term_id * {x + 3} + {x}) % 7 + 1)::DOUBLE AS t{x}"
        for x in range(k))
    scols = ", ".join(f"sum(t{x}) AS s{x}" for x in range(k))
    wcols = ", ".join(
        f"(m.t{x} + {eta!r}) * ((1.0/{k} + {alpha!r}) / "
        f"(s.s{x} + {eta!r} * {num_terms})) AS w{x}" for x in range(k))
    tot = " + ".join(f"w{x}" for x in range(k))
    gam = ", ".join(f"round(w{x} / ({tot}) * cnt, {round_dp})"
                    for x in range(k))
    return f"""
WITH corpus AS ({corpus_sql}),
model AS (SELECT range::BIGINT AS term_id, {tcols}
          FROM range({num_terms})),
sums AS (SELECT {scols} FROM model),
w AS (SELECT c.doc_id, c.term_id, c.cnt::DOUBLE AS cnt, {wcols}
      FROM corpus c JOIN model m ON c.term_id = m.term_id
      CROSS JOIN sums s),
g AS (SELECT doc_id, term_id, unnest([{gam}]) AS gamma,
             unnest(range({k})) AS topic FROM w)
SELECT doc_id, term_id, topic::INT AS topic, gamma FROM g
"""
