"""N-gram LM perplexity scoring: pure-Python oracle, DuckDB bit-parity,
and the CMS-backed approximate path (plumbing parity + epsilon bound)."""

import math
import random
import re
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.lm import (lm_cross_entropy,
                                       lm_cross_entropy_cms,
                                       lm_cross_entropy_sql, lm_filter,
                                       ngram_counts, train_lm, train_lm_cms)

_WORDS = ("the cat sat on a mat and the dog ran to the cat with a hat "
          "while birds flew over green hills near old towns").split()


def _mk_texts(seed=5, n_docs=12, lo=8, hi=60):
    rng = random.Random(seed)
    texts = ["the cat sat on the mat and the cat ran"]   # heavy bigram reuse
    for _ in range(n_docs - 3):
        texts.append(" ".join(rng.choice(_WORDS)
                              for _ in range(rng.randint(lo, hi))))
    texts.append("zq xv qqk zzj pwl mxn")                # OOV-ish garbage
    texts.append("one")                                  # < n tokens
    return texts


def _tok(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py_lm(texts, n=2, k=0.5):
    """Independent pure-Python replay: counts, smoothing, ngram-sorted
    left fold — the engine-shared semantics."""
    cn, cx = Counter(), Counter()
    vocab = set()
    for t in texts:
        toks = _tok(t)
        vocab.update(toks)
        for i in range(len(toks) - n + 1):
            cn[" ".join(toks[i:i + n])] += 1
        for i in range(len(toks) - n + 2):
            cx[" ".join(toks[i:i + n - 1])] += 1
    v = len(vocab)
    out = {}
    for did, t in enumerate(texts):
        toks = _tok(t)
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            continue
        per = Counter(grams)
        acc = 0.0
        for g in sorted(per):
            ctx = g.rsplit(" ", 1)[0]
            p = (cn[g] + k) / (cx[ctx] + k * v)
            acc = acc + per[g] * math.log(p)
        out[did] = (len(grams), -acc / len(grams))
    return out, v


@pytest.fixture(scope="module")
def texts():
    return _mk_texts()


@pytest.fixture(scope="module")
def tdf(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_exact_path_matches_python_oracle_bitwise(spark, tdf, texts):
    counts_n, counts_ctx, v = train_lm(tdf, "text", n=2)
    expect, pv = _py_lm(texts)
    assert v == pv
    got = {r["doc_id"]: (r["n_ngrams"], r["cross_entropy"])
           for r in lm_cross_entropy(tdf.repartition(5), "doc_id", "text",
                                     counts_n, counts_ctx, v).collect()}
    assert set(got) == set(expect)          # the 1-token doc is absent
    for did in expect:
        assert got[did][0] == expect[did][0]
        # Java Math.log vs libm differ by <=1 ulp on some inputs (the
        # repo-wide ln convention: rank raw, emit 6dp) — the fold itself
        # is order-deterministic, so agreement is ulp-tight
        assert math.isclose(got[did][1], expect[did][1],
                            rel_tol=1e-13), did
        assert round(got[did][1], 6) == round(expect[did][1], 6)


def test_ngram_counts_golden(spark, tdf, texts):
    cn = {r["ngram"]: r["c"]
          for r in ngram_counts(tdf, "text", 2).collect()}
    py = Counter()
    for t in texts:
        toks = _tok(t)
        for i in range(len(toks) - 1):
            py[" ".join(toks[i:i + 2])] += 1
    assert cn == dict(py)
    assert ngram_counts(tdf, "text", 2, min_count=3).count() == sum(
        1 for c in py.values() if c >= 3)


def test_duckdb_twin_bit_parity(spark, tdf, texts):
    counts_n, counts_ctx, v = train_lm(tdf, "text", n=2)
    spark_rows = {r["doc_id"]: (r["n_ngrams"], r["cross_entropy"])
                  for r in lm_cross_entropy(tdf, "doc_id", "text",
                                            counts_n, counts_ctx,
                                            v).collect()}
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(
        [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]))
    sql = lm_cross_entropy_sql("docs", "doc_id", "text", n=2, k=0.5)
    duck = {r[0]: (r[1], r[2]) for r in con.sql(sql).fetchall()}
    assert set(duck) == set(spark_rows)
    for d in duck:
        assert duck[d][0] == spark_rows[d][0]
        assert math.isclose(duck[d][1], spark_rows[d][1], rel_tol=1e-13)
        assert round(duck[d][1], 6) == round(spark_rows[d][1], 6)


def test_trigram_model(spark, tdf, texts):
    counts_n, counts_ctx, v = train_lm(tdf, "text", n=3)
    expect, pv = _py_lm(texts, n=3)
    assert v == pv
    got = {r["doc_id"]: (r["n_ngrams"], r["cross_entropy"])
           for r in lm_cross_entropy(tdf, "doc_id", "text", counts_n,
                                     counts_ctx, v, n=3).collect()}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0]
        assert math.isclose(got[d][1], expect[d][1], rel_tol=1e-13)


def test_cms_path_matches_independent_replay(spark, tdf, texts):
    blob_n, blob_ctx, v = train_lm_cms(tdf, "text", n=2,
                                       eps=1e-4, delta=1e-3)
    _, pv = _py_lm(texts)
    assert v == pv                      # exact vocab mode
    got = {r["doc_id"]: (r["n_ngrams"], r["cross_entropy"])
           for r in lm_cross_entropy_cms(tdf.repartition(4), "doc_id",
                                         "text", blob_n, blob_ctx,
                                         v).collect()}
    # independent replay: read the same sketches in-core with the same
    # per-doc key arrays (hashed once in Spark, reused here)
    from mahout_spark.core.cms import CountMinSketch
    from mahout_spark.functions.text import shingles_from_tokens, tokens_array

    sn = CountMinSketch.deserialize(blob_n)
    sc = CountMinSketch.deserialize(blob_ctx)

    toks = tdf.select("doc_id", tokens_array(F.col("text")).alias("tk"))
    keyed = toks.select(
        "doc_id",
        F.transform(shingles_from_tokens(F.col("tk"), 2),
                    lambda g: F.xxhash64(g)).alias("kn"),
        F.transform(shingles_from_tokens(F.col("tk"), 1),
                    lambda g: F.xxhash64(g)).alias("kc")).collect()
    kf, kv = 0.5, 0.5 * v
    for r in keyed:
        t = len(r["kn"])
        if t == 0:
            assert r["doc_id"] not in got
            continue
        cn = sn.point_batch(np.array(r["kn"], dtype=np.int64))
        cx = sc.point_batch(np.array(r["kc"][:t], dtype=np.int64))
        ce = -float(np.log((cn + kf) / (cx + kv)).sum()) / t
        assert got[r["doc_id"]][0] == t
        assert got[r["doc_id"]][1] == ce, r["doc_id"]


def test_cms_estimates_within_epsilon_bound(spark, tdf, texts):
    eps = 1e-3
    blob_n, _, v = train_lm_cms(tdf, "text", n=2, eps=eps, delta=1e-3)
    from mahout_spark.core.cms import CountMinSketch

    sn = CountMinSketch.deserialize(blob_n)
    py = Counter()
    for t in texts:
        toks = _tok(t)
        for i in range(len(toks) - 1):
            py[" ".join(toks[i:i + 2])] += 1
    total = sum(py.values())
    grams = sorted(py)
    keys = {r["g"]: r["k"] for r in spark.createDataFrame(
        [(g,) for g in grams], "g string").select(
        "g", F.xxhash64("g").alias("k")).collect()}
    est = sn.point_batch(np.array([keys[g] for g in grams],
                                  dtype=np.int64))
    exact = np.array([py[g] for g in grams], dtype=np.float64)
    assert (est >= exact).all()                     # CMS never undercounts
    assert (est <= exact + eps * total + 1e-9).all()


def test_lm_filter_and_perplexity(spark, tdf, texts):
    garbage_id = len(texts) - 2                     # the OOV doc
    # hold the garbage doc out of training so its ngrams are truly unseen
    counts_n, counts_ctx, v = train_lm(
        tdf.filter(F.col("doc_id") != garbage_id), "text", n=2)
    scored = lm_cross_entropy(tdf, "doc_id", "text",
                              counts_n, counts_ctx, v)
    rows = {r["doc_id"]: r["cross_entropy"] for r in scored.collect()}
    assert rows[garbage_id] == max(rows.values())   # garbage scores worst
    cut = sorted(rows.values())[len(rows) // 2]
    kept = lm_filter(scored, cut).collect()
    assert {r["doc_id"] for r in kept} == {
        d for d, ce in rows.items() if ce <= cut}
    assert garbage_id not in {r["doc_id"] for r in kept}


def test_train_lm_rejects_unigram():
    with pytest.raises(ValueError):
        train_lm(None, "text", n=1)
