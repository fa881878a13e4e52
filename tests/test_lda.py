"""LDA CVB0: NumPy trajectory replay, perplexity property, gate twin.

Reference semantics under test (studied, not copied):
TopicModel.trainDocTopicModel (TopicModel.java:284-304),
ModelTrainer.TrainerRunnable (ModelTrainer.java:264-295),
CachingCVB0Mapper per-pass uniform docTopics restart
(CachingCVB0Mapper.java:113-119).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

K = 3
V = 20
ALPHA = 0.01
ETA = 0.05


def _np_cvb0_pass(docs, ttc, alpha, eta, doc_iters):
    """In-core replay: one full-corpus pass. docs: list of (terms, cnts).

    Returns (new_ttc, doc_topics list)."""
    sums = ttc.sum(axis=1)                       # (K,)
    denom = sums + eta * ttc.shape[1]
    new_ttc = np.zeros_like(ttc)
    thetas = []
    for terms, cnts in docs:
        beta = (ttc[:, terms].T + eta) / denom   # (T, K)
        theta = np.full(ttc.shape[0], 1.0 / ttc.shape[0])
        for _ in range(doc_iters):
            gamma = beta * (theta + alpha)
            gamma /= gamma.sum(axis=1, keepdims=True)
            gamma *= np.asarray(cnts, dtype=float)[:, None]
            mass = gamma.sum(axis=0)
            theta = mass / mass.sum()
        new_ttc[:, terms] += gamma.T
        thetas.append(theta)
    return new_ttc, thetas


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    rows = []
    docs = []
    for d in range(12):
        terms = sorted(rng.choice(V, size=rng.integers(3, 8),
                                  replace=False).tolist())
        cnts = rng.integers(1, 5, size=len(terms)).tolist()
        docs.append((terms, cnts))
        rows += [(d, t, int(c)) for t, c in zip(terms, cnts)]
    df = spark.createDataFrame(rows, ["doc_id", "term_id", "cnt"])
    return df, docs


def _model_np(model_df, k, v):
    ttc = np.zeros((k, v))
    for r in model_df.collect():
        ttc[:, r["term_id"]] = np.asarray(r["topics"])
    return ttc


def test_single_pass_matches_numpy(spark, corpus):
    from mahout_spark.operators.lda import (cvb0_iteration, gamma_to_model,
                                            lda_init_model)

    df, docs = corpus
    model = lda_init_model(spark, V, K, seed=3)
    ttc = _model_np(model, K, V)
    want_ttc, want_thetas = _np_cvb0_pass(docs, ttc, ALPHA, ETA, 10)

    g = cvb0_iteration(df, model, ttc.sum(axis=1), K, ALPHA, ETA, V,
                       doc_iters=10)
    got_model = gamma_to_model(g, K)
    got = _model_np(got_model, K, V)
    # terms never seen keep zero counts in both replays
    assert np.allclose(got, want_ttc, atol=1e-10)

    thetas = {r["doc_id"]: np.asarray(r["doc_topics"])
              for r in g.select("doc_id", "doc_topics").distinct().collect()}
    for d, want in enumerate(want_thetas):
        assert np.allclose(thetas[d], want, atol=1e-12), d


def test_train_two_passes_matches_numpy(spark, corpus):
    from mahout_spark.operators.lda import cvb0_train, lda_init_model

    df, docs = corpus
    ttc = _model_np(lda_init_model(spark, V, K, seed=1234), K, V)
    for _ in range(2):
        ttc, _ = _np_cvb0_pass(docs, ttc, ALPHA, ETA, 5)

    m = cvb0_train(df, K, num_terms=V, alpha=ALPHA, eta=ETA,
                   max_iterations=2, doc_iters=5, seed=1234)
    got = _model_np(m.model, K, V)
    # gamma_to_model drops never-seen terms; compare seen columns
    seen = sorted({t for terms, _ in docs for t in terms})
    assert np.allclose(got[:, seen], ttc[:, seen], atol=1e-8)
    assert np.allclose(m.topic_sums, ttc[:, seen].sum(axis=1), atol=1e-8)


def test_perplexity_decreases(spark, corpus):
    from mahout_spark.operators.lda import cvb0_train

    df, _ = corpus
    m = cvb0_train(df, K, num_terms=V, alpha=ALPHA, eta=ETA,
                   max_iterations=4, doc_iters=5, seed=2,
                   track_perplexity=True)
    h = m.perplexity_history
    assert len(h) == 4
    assert all(np.isfinite(x) and x > 0 for x in h)
    # CVB0 monotonically improves the (smoothed) corpus likelihood on
    # these small fixtures
    assert h[-1] < h[0]


def test_doc_topics_sum_to_one(spark, corpus):
    from mahout_spark.operators.lda import cvb0_train

    df, docs = corpus
    m = cvb0_train(df, K, num_terms=V, alpha=ALPHA, eta=ETA,
                   max_iterations=1, doc_iters=3, seed=5)
    dt = m.doc_topics(df, doc_iters=3).collect()
    assert len(dt) == len(docs)
    for r in dt:
        assert abs(sum(r["doc_topics"]) - 1.0) < 1e-9


def test_top_terms_shape(spark, corpus):
    from mahout_spark.operators.lda import cvb0_train

    df, docs = corpus
    m = cvb0_train(df, K, num_terms=V, alpha=ALPHA, eta=ETA,
                   max_iterations=1, doc_iters=2, seed=5)
    tt = m.top_terms(4).collect()
    per_topic = {}
    for r in tt:
        per_topic.setdefault(r["topic"], []).append(r["weight"])
    assert set(per_topic) == set(range(K))
    for ws in per_topic.values():
        assert ws == sorted(ws, reverse=True)


def test_doc_gamma_gate_twin(spark, corpus, tmp_path):
    """cvb0_doc_gamma (one uniform pass, arithmetic init) is bit-equal

    to its DuckDB twin — the gate contract."""
    import duckdb

    from mahout_spark.operators.lda import (arithmetic_init_model,
                                            cvb0_doc_gamma,
                                            cvb0_doc_gamma_sql)

    df, _ = corpus
    path = str(tmp_path / "corpus.parquet")
    df.write.parquet(path)
    model = arithmetic_init_model(spark, V, K)
    sums = [float(r) for r in _model_np(model, K, V).sum(axis=1)]
    got = {(r["doc_id"], r["term_id"], r["topic"]): round(r["gamma"], 6)
           for r in cvb0_doc_gamma(df, model, sums, K, ALPHA, ETA, V)
           .collect()}
    con = duckdb.connect()
    sql = cvb0_doc_gamma_sql(
        f"SELECT doc_id, term_id, cnt FROM "
        f"read_parquet('{path}/*.parquet')", K, V, ALPHA, ETA)
    want = {(int(r[0]), int(r[1]), int(r[2])): float(r[3])
            for r in con.execute(sql).fetchall()}
    assert got == want
