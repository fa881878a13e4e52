"""Text functions: Spark vs DuckDB twin agreement on real testdata."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.text import (content_fingerprint,
                                         content_fingerprint_sql, detect_lang,
                                         detect_lang_sql, quality_score,
                                         quality_score_sql, shingles_array,
                                         shingles_array_sql, token_count,
                                         token_count_sql, tokens_array,
                                         tokens_array_sql)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def duck(sql):
    return duckdb.sql(sql).fetchdf()


def _spark_one_col(docs, expr, name):
    return (docs.select(F.col("doc_id"), expr.alias(name))
            .orderBy("doc_id").toPandas())


def _duck_one_col(sql_expr, name):
    return duck(f"SELECT doc_id, {sql_expr} AS {name} FROM '{DOCS}' "
                f"ORDER BY doc_id")


def test_token_count_matches_duckdb(docs):
    s = _spark_one_col(docs, token_count(F.col("text")), "n")
    d = _duck_one_col(token_count_sql("text"), "n")
    assert (s["n"].to_numpy() == d["n"].to_numpy()).all()


def test_bpe_token_count_matches_duckdb(docs):
    from mahout_spark.functions.text import (bpe_token_count,
                                             bpe_token_count_sql)

    s = _spark_one_col(docs, bpe_token_count(F.col("text")), "n")
    d = _duck_one_col(bpe_token_count_sql("text"), "n")
    assert (s["n"].to_numpy() == d["n"].to_numpy()).all()


def test_bpe_segments_golden(spark):
    from mahout_spark.functions.text import bpe_segments, bpe_token_count

    df = spark.createDataFrame(
        [(0, "Hello, world! don't 123 foo_bar")], "id long, t string")
    row = df.select(bpe_segments(F.col("t")).alias("s"),
                    bpe_token_count(F.col("t")).alias("n")).collect()[0]
    assert list(row["s"]) == ["Hello", ",", " world", "!", " don", "'t",
                              " 123", " foo", "_", "bar"]
    assert row["n"] == 10


def test_tokens_match_duckdb(docs):
    s = _spark_one_col(docs, tokens_array(F.col("text")), "toks")
    d = _duck_one_col(tokens_array_sql("text"), "toks")
    for a, b in zip(s["toks"], d["toks"]):
        assert list(a) == list(b)


def test_detect_lang_matches_duckdb(docs):
    s = _spark_one_col(docs, detect_lang(F.col("text")), "l")
    d = _duck_one_col(detect_lang_sql("text"), "l")
    assert (s["l"] == d["l"]).all()


def test_quality_score_matches_duckdb_bitexact(docs):
    s = _spark_one_col(docs, quality_score(F.col("text")), "q")
    d = _duck_one_col(quality_score_sql("text"), "q")
    assert (s["q"].to_numpy() == d["q"].to_numpy()).all()


def test_fingerprint_matches_duckdb(docs):
    s = _spark_one_col(docs, content_fingerprint(F.col("text")), "fp")
    d = _duck_one_col(content_fingerprint_sql("text"), "fp")
    assert (s["fp"] == d["fp"]).all()


def test_shingles_match_duckdb(docs):
    s = _spark_one_col(docs, shingles_array(F.col("text"), 3), "sh")
    d = _duck_one_col(shingles_array_sql("text", 3), "sh")
    for a, b in zip(s["sh"], d["sh"]):
        assert list(a) == list(b)


def test_shingle_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, ""), (4, "one two three four")],
        "doc_id int, text string")
    got = {r["doc_id"]: list(r["sh"]) for r in df.select(
        "doc_id", shingles_array(F.col("text"), 3).alias("sh")).collect()}
    assert got[1] == []
    assert got[2] == ["a b c"]
    assert got[3] == []
    assert got[4] == ["one two three", "two three four"]
