"""Exact substring dedup (duplicated k-gram span masking): hand-computed
span goldens incl. overlap merging, hash-vs-string gram parity,
removal semantics, min_count, DuckDB bit-parity, partitioning
invariance."""

import duckdb
import pandas as pd
import pytest

from mahout_spark.operators.substring import (duplicate_spans,
                                              duplicate_spans_sql,
                                              remove_duplicate_spans,
                                              remove_duplicate_spans_sql)

ROWS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "xx yy alpha beta gamma delta epsilon qq rr ss tt uu"),
    (3, "one two three four five six"),
    (4, "one two three four five seven eight nine ten "
        "one two three four five"),
    (5, "short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _spans(df):
    return sorted((r["doc_id"], r["span_start"], r["span_end"],
                   r["n_units"]) for r in df.collect())


def test_golden_spans(docs):
    got = _spans(duplicate_spans(docs, k=5, min_count=2))
    # 'alpha..epsilon' shared by docs 1/2; 'one..five' occurs 3x
    # (doc 3 once, doc 4 twice, non-overlapping)
    assert got == [
        (1, 0, 5, 5), (2, 2, 7, 5), (3, 0, 5, 5),
        (4, 0, 5, 5), (4, 9, 14, 5),
    ]


def test_overlapping_windows_merge(spark):
    """A shared 7-token run yields marked starts {0,1,2} -> ONE maximal
    [0,7) span, not three windows."""
    d = spark.createDataFrame(
        [(1, "a b c d e f g tail1 tail2 tail3"),
         (2, "pre1 pre2 a b c d e f g")],
        "doc_id long, text string")
    got = _spans(duplicate_spans(d, k=5, min_count=2))
    assert got == [(1, 0, 7, 7), (2, 2, 9, 7)]


def test_min_count(docs):
    got = _spans(duplicate_spans(docs, k=5, min_count=3))
    # only 'one two three four five' reaches 3 corpus occurrences
    assert got == [(3, 0, 5, 5), (4, 0, 5, 5), (4, 9, 14, 5)]


def test_within_doc_repeat_counts(spark):
    d = spark.createDataFrame(
        [(1, "p q r s t filler1 filler2 p q r s t")],
        "doc_id long, text string")
    got = _spans(duplicate_spans(d, k=5, min_count=2))
    assert got == [(1, 0, 5, 5), (1, 7, 12, 5)]


def test_hash_equals_string_path(docs):
    a = _spans(duplicate_spans(docs, k=5, min_count=2, hash_grams=True))
    b = _spans(duplicate_spans(docs, k=5, min_count=2, hash_grams=False))
    assert a == b


def test_remove_spans(docs):
    got = {r["doc_id"]: (r["text_dedup"], r["n_dup_units"])
           for r in remove_duplicate_spans(docs, k=5,
                                           min_count=2).collect()}
    assert got[1] == ("zeta eta theta", 5)
    assert got[2] == ("xx yy qq rr ss tt uu", 5)
    assert got[4] == ("seven eight nine ten", 10)
    assert got[5] == ("short text", 0)
    # original columns preserved
    cols = remove_duplicate_spans(docs, k=5, min_count=2).columns
    assert cols == ["doc_id", "text", "text_dedup", "n_dup_units"]


def test_remove_with_precomputed_spans(docs, spark):
    spans = duplicate_spans(docs, k=5, min_count=2)
    a = remove_duplicate_spans(docs, k=5, min_count=2)
    b = remove_duplicate_spans(docs, spans=spans)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple,
                                                         b.collect()))


def test_partitioning_invariance(docs):
    base = _spans(duplicate_spans(docs, k=5, min_count=2))
    assert _spans(duplicate_spans(docs.repartition(7), k=5,
                                  min_count=2)) == base


def test_duckdb_parity(docs):
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    oracle = sorted(map(tuple, con.sql(
        duplicate_spans_sql("docs", k=5, min_count=2)).fetchall()))
    assert _spans(duplicate_spans(docs, k=5, min_count=2)) == oracle

    o2 = {r[0]: (r[1], r[2]) for r in con.sql(
        remove_duplicate_spans_sql("docs", k=5, min_count=2)).fetchall()}
    s2 = {r["doc_id"]: (r["text_dedup"], r["n_dup_units"])
          for r in remove_duplicate_spans(docs, k=5,
                                          min_count=2).collect()}
    assert s2 == o2


def test_messy_whitespace_parity(spark):
    rows = [(1, "  a\tb \n c d e  f\r\ng  "),
            (2, "a b c d e tail"),
            (3, "")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    assert _spans(duplicate_spans(d, k=5, min_count=2)) == sorted(
        map(tuple, con.sql(
            duplicate_spans_sql("docs", k=5, min_count=2)).fetchall()))
    got = {r["doc_id"]: r["text_dedup"] for r in
           remove_duplicate_spans(d, k=5, min_count=2).collect()}
    ora = {r[0]: r[1] for r in con.sql(
        remove_duplicate_spans_sql("docs", k=5, min_count=2)).fetchall()}
    assert got == ora
    assert got[3] == ""
