"""Benchmark decontamination (n-gram overlap vs a held-out set):
hand-computed span goldens, drop/mask policies, hash-vs-string gram
parity, DuckDB bit-parity, no-contamination identity."""

import duckdb
import pandas as pd
import pytest

from mahout_spark.operators.substring import (contamination_spans,
                                              contamination_spans_sql,
                                              decontaminate)

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
    (2, "xx yy alpha beta gamma delta epsilon qq rr ss"),
    (3, "one two three four five six seven"),
    (4, "clean words only nothing shared here at all"),
    (5, "tiny"),
]

# benchmark shares a 5-token run with docs 1+2 and another with doc 3;
# one bench row matches nothing
BENCH = [
    (100, "alpha beta gamma delta epsilon"),
    (101, "zz one two three four five zz"),
    (102, "totally absent benchmark prompt tokens"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(BENCH, "doc_id long, text string")


def _spans(df):
    return sorted((r["doc_id"], r["span_start"], r["span_end"],
                   r["n_units"]) for r in df.collect())


def test_golden_spans(docs, bench):
    got = _spans(contamination_spans(docs, bench, k=5))
    assert got == [
        (1, 0, 5, 5),   # alpha..epsilon at doc start
        (2, 2, 7, 5),   # same run shifted by 2
        (3, 0, 5, 5),   # one..five
    ]


def test_hash_vs_string_parity(docs, bench):
    h = _spans(contamination_spans(docs, bench, k=5, hash_grams=True))
    s = _spans(contamination_spans(docs, bench, k=5, hash_grams=False))
    assert h == s


def test_drop_policy(docs, bench):
    kept = decontaminate(docs, bench, k=5, policy="drop")
    assert sorted(r["doc_id"] for r in kept.collect()) == [4, 5]


def test_mask_policy(docs, bench):
    out = {r["doc_id"]: (r["text_dedup"], r["n_dup_units"])
           for r in decontaminate(docs, bench, k=5,
                                  policy="mask").collect()}
    assert out[1] == ("zeta eta theta iota", 5)
    assert out[2] == ("xx yy qq rr ss", 5)
    assert out[3] == ("six seven", 5)
    assert out[4] == ("clean words only nothing shared here at all", 0)
    assert out[5] == ("tiny", 0)


def test_bad_policy(docs, bench):
    with pytest.raises(ValueError):
        decontaminate(docs, bench, k=5, policy="purge")


def test_no_contamination_is_identity(spark, docs):
    empty_bench = spark.createDataFrame(
        [(1, "nothing matches this benchmark")],
        "doc_id long, text string")
    assert contamination_spans(docs, empty_bench, k=5).count() == 0
    kept = decontaminate(docs, empty_bench, k=5, policy="drop")
    assert kept.count() == docs.count()


def test_overlapping_hits_merge_to_maximal_span(spark):
    """Bench holding a 7-token run -> corpus hit starts {0,1,2} merge
    to ONE [0,7) span."""
    d = spark.createDataFrame([(1, "a b c d e f g tail")],
                              "doc_id long, text string")
    b = spark.createDataFrame([(9, "a b c d e f g")],
                              "doc_id long, text string")
    assert _spans(contamination_spans(d, b, k=5)) == [(1, 0, 7, 7)]


def test_duckdb_parity(spark, docs, bench):
    got = _spans(contamination_spans(docs, bench, k=5,
                                     hash_grams=False))
    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.register("bench_t", pd.DataFrame(BENCH,
                                         columns=["doc_id", "text"]))
    sql = contamination_spans_sql(
        "docs_t", "(SELECT doc_id, text FROM bench_t)", k=5)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
