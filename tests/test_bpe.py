"""BPE tokenizer: trainer goldens, three-engine parity, boundary rules."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.bpe import (SEP, BPEModel, _apply_merge,
                                        _bracket, _symbols,
                                        bpe_encode_chain_sql,
                                        bpe_encode_expr,
                                        bpe_encode_oracle_sql,
                                        bpe_encode_pandas, bpe_train,
                                        bpe_train_incore,
                                        bpe_train_oracle_sql,
                                        bpe_word_counts, word_counts_sql)

CORPUS = [
    (0, "the window scans the sorted column"),
    (1, "sorted scans beat the unsorted scans"),
    (2, "the column store sorts the window"),
    (3, ""),
    (4, "the the the window window"),
]


def _encode_py(text: str, merges) -> list[str]:
    """Reference encode: per-segment bracketed replace chain."""
    import re

    from mahout_spark.functions.text import BPE_SPLIT_RE

    out = []
    for seg in re.findall(BPE_SPLIT_RE, text.replace(SEP, "")):
        s = _bracket(seg)
        for left, right in merges:
            s = _apply_merge(s, left, right)
        out.extend(_symbols(s))
    return out


def test_train_golden_sennrich_example():
    # The classic fixture: 'es'/'est' dominate, then lowest-pair order
    # is broken by (count desc, left asc, right asc).
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
          (" the", 7)]
    merges = bpe_train_incore(wc, 8)
    assert merges == [("e", "s"), ("es", "t"), (" ", "t"), (" t", "h"),
                      (" th", "e"), ("l", "o"), ("lo", "w"), ("e", "w")]
    # rank-order encode of an UNSEEN word composed of learned symbols
    s = _bracket("lowest")
    for left, right in merges:
        s = _apply_merge(s, left, right)
    assert _symbols(s) == ["low", "est"]


def test_train_stops_when_no_pairs_left():
    merges = bpe_train_incore([("ab", 3)], 10)
    assert merges == [("a", "b")]  # then nothing left to merge


def test_word_counts_pruning_deterministic(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    full = {r["word"]: r["cnt"]
            for r in bpe_word_counts(df, "text").collect()}
    assert full["the"] == 3 and full[" the"] == 5
    top = bpe_word_counts(df, "text", max_words=3).collect()
    got = [(r["word"], r["cnt"]) for r in top]
    assert got == sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    pruned = {r["word"] for r in
              bpe_word_counts(df, "text", min_count=4).collect()}
    assert "store" not in pruned and " the" in pruned


def test_trainer_matches_duckdb_replay(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=16)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in CORPUS) +
                ") t(doc_id, text)")
    rows = con.execute(
        bpe_train_oracle_sql("SELECT text FROM docs", 16)).fetchall()
    assert [tuple(r) for r in rows] == \
        [(i + 1, l, r, l + r) for i, (l, r) in enumerate(model.merges)]


def test_encode_expr_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=12)
    got = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", bpe_encode_expr(F.col("text"), model.merges)
        .alias("toks")).collect()}
    for i, text in CORPUS:
        assert got[i] == _encode_py(text, model.merges), (i, text)
    assert got[3] == []  # empty doc -> empty token array
    # lossless: concatenated tokens reconstruct the text
    for i, text in CORPUS:
        assert "".join(got[i]) == text


def test_encode_pandas_bit_parity_with_expr(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string") \
        .repartition(3)
    model = bpe_train(df, "text", n_merges=12)
    expr = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", bpe_encode_expr(F.col("text"), model.merges)
        .alias("toks")).collect()}
    pand = {r["doc_id"]: r["tokens"] for r in
            bpe_encode_pandas(df, "doc_id", "text", model.merges).collect()}
    assert pand == expr


def test_merges_never_cross_segment_boundaries(spark):
    # ('a', ' ') could only merge ACROSS the 'a'|' b' segment boundary;
    # the triple-separator join makes that pattern unmatchable.
    df = spark.createDataFrame([(0, "ab a b")], "doc_id long, text string")
    got = df.select(bpe_encode_expr(
        F.col("text"), [("a", " "), ("a", "b")]).alias("t")).head()["t"]
    assert got == ["ab", " ", "a", " ", "b"]


def test_sep_stripped_and_unicode_safe(spark):
    text = "café \x1f déjà \U0001f600ok"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=6)
    got = df.select(bpe_encode_expr(F.col("text"), model.merges)
                    .alias("t")).head()["t"]
    assert got == _encode_py(text, model.merges)
    assert "".join(got) == text.replace(SEP, "")


def test_model_save_load_round_trip(spark, tmp_path):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=10)
    path = str(tmp_path / "bpe_model")
    model.save(path)
    back = BPEModel.load(spark, path)
    assert back == model
    assert model.vocab()[0] == model.merges[0][0] + model.merges[0][1]


def test_chain_sql_matches_expr(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=10)
    expr = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", bpe_encode_expr(F.col("text"), model.merges)
        .alias("toks")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in CORPUS) +
                ") t(doc_id, text)")
    sql = bpe_encode_chain_sql("text", model.merges)
    rows = con.execute(
        f"SELECT doc_id, {sql} AS t FROM docs ORDER BY doc_id").fetchall()
    assert {r[0]: list(r[1]) for r in rows} == expr


def test_encode_oracle_full_pipeline_parity(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    model = bpe_train(df, "text", n_merges=16)
    got = [(r["doc_id"], r["n"], r["h"]) for r in df.select(
        "doc_id",
        F.size(bpe_encode_expr(F.col("text"), model.merges))
        .cast("long").alias("n"),
        F.md5(F.concat_ws(SEP, bpe_encode_expr(F.col("text"),
                                               model.merges))).alias("h"))
        .orderBy("doc_id").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT * FROM (VALUES " +
                ",".join(f"({i}, '{t}')" for i, t in CORPUS) +
                ") t(doc_id, text)")
    rows = con.execute(bpe_encode_oracle_sql(
        "SELECT doc_id, text FROM docs", 16)).fetchall()
    assert [tuple(r) for r in rows] == got
    # cross-check one md5 by hand
    toks = _encode_py(CORPUS[0][1], model.merges)
    assert got[0][2] == hashlib.md5(SEP.join(toks).encode()).hexdigest()
