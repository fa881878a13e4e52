"""Unicode hygiene: NFC normalization (pandas UDF) + control-char
strip — goldens, DuckDB bit-parity (utf8proc vs CPython unicodedata),
idempotence, NUL ordering contract."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.unicode import (nfc_normalize,
                                            nfc_normalize_sql,
                                            strip_control_chars,
                                            strip_control_chars_sql)

ZOO = [
    (1, "café vs café"),            # combining acute
    (2, "각 hangul jamo"),     # -> U+AC01
    (3, "á̧ combining run"),        # reorders + composes
    (4, "Å angstrom sign"),          # NFC: U+212B -> U+00C5
    (5, "ctrl\x07bell\ttab\nnl\x1besc\x7fdel\x85nel"),
    (6, None),
    (7, "plain ascii"),
    (8, "Å ring -> Å"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ZOO, "id long, t string")


def test_nfc_goldens(df):
    import unicodedata

    got = {r["id"]: r["n"] for r in
           df.select("id", nfc_normalize(F.col("t")).alias("n")).collect()}
    assert got[1] == "café vs café"
    assert got[2].startswith("각")
    # U+212B is a singleton canonical decomposition -> U+00C5
    assert got[4] == "Å angstrom sign"
    assert got[6] is None
    assert got[8].endswith("Å")
    for i, t in ZOO:
        if t is not None:
            assert got[i] == unicodedata.normalize("NFC", t)


def test_strip_control_chars(df):
    got = {r["id"]: r["s"] for r in df.select(
        "id", strip_control_chars(F.col("t")).alias("s")).collect()}
    assert got[5] == "ctrlbell\ttab\nnlescdelnel"
    assert got[7] == "plain ascii"


def test_idempotent(df):
    once = df.select("id", nfc_normalize(
        strip_control_chars(F.col("t"))).alias("n"))
    twice = once.select("id", nfc_normalize(
        strip_control_chars(F.col("n"))).alias("n"))
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect()))


def test_duckdb_parity_strip_then_nfc(df):
    """Pipeline order contract: strip controls FIRST (DuckDB's
    nfc_normalize truncates at NUL), then NFC — bit-equal engines."""
    rows = ZOO + [(9, "nul\x00tail café")]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "t"]))
    ora = {r[0]: r[1] for r in con.sql(
        f"SELECT id, {nfc_normalize_sql(strip_control_chars_sql('t'))} "
        f"FROM t").fetchall()}
    sdf = df.sparkSession.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r["n"] for r in sdf.select(
        "id", nfc_normalize(strip_control_chars(F.col("t"))).alias("n"))
        .collect()}
    assert got == ora
    assert got[9] == "nultail café"
