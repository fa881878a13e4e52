"""Corpus statistics report: DuckDB bit-parity of the per-language
table, dup counting on a forced-duplicate fixture, CLI smoke with
report-total consistency."""

import json
import os
import subprocess
import sys

import duckdb
import pandas as pd
import pytest

from jobs.corpusstats import per_language_stats, per_language_stats_sql

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    (1, "en", "the quick brown fox jumps over the lazy dog"),
    (2, "en", "the quick brown fox jumps over the lazy dog"),  # dup
    (3, "en", "a different english document with more words here"),
    (4, "de", "der schnelle braune fuchs"),
    (5, "de", "der schnelle braune fuchs"),                    # dup
    (6, "de", "der schnelle braune fuchs"),                    # triple
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS,
                                 "doc_id long, lang string, text string")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_dup_counting(docs):
    got = {r["lang"]: r["dup_docs"]
           for r in per_language_stats(docs, "text", "lang",
                                       gopher=False).collect()}
    assert got == {"en": 1, "de": 2}


def test_duckdb_parity(docs):
    got = _rows(per_language_stats(docs, "text", "lang"))
    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(
        ROWS, columns=["doc_id", "lang", "text"]))
    pdf = con.execute(per_language_stats_sql("docs_t")).df()
    want = sorted(tuple(r[c] for c in sorted(pdf.columns))
                  for _, r in pdf.iterrows())
    assert got == want


def test_duckdb_parity_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = _rows(per_language_stats(docs, "text", "lang"))
    con = duckdb.connect()
    con.execute("CREATE VIEW docs_t AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    pdf = con.execute(per_language_stats_sql("docs_t")).df()
    want = sorted(tuple(r[c] for c in sorted(pdf.columns))
                  for _, r in pdf.iterrows())
    assert got == want


def test_cli(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    out = subprocess.run(
        [sys.executable, "jobs/corpusstats.py",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", str(tmp_path / "rep")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads([ln for ln in out.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert rep["n_docs"] == 500
    assert rep["n_docs"] == sum(r["n_docs"] for r in rep["per_lang"])
    assert rep["n_tokens"] == sum(r["n_tokens"] for r in rep["per_lang"])
    # synthetic vocab is tiny; HLL at p=14 is exact-ish there
    assert 25 <= rep["distinct_tokens_hll"] <= 40
    assert json.load(open(tmp_path / "rep" / "REPORT.json")) == rep
