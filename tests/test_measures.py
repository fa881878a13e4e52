"""Measure goldens pinned from the reference's

VectorSimilarityMeasuresTest.java:30-131 (values, not code) plus the LLR
matrix golden from SimilarityAnalysisSuite. Each measure runs through the
full row_similarity pipeline on a 2-row matrix."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.measures import MEASURES
from mahout_spark.operators.rowsim import row_similarity

V_BIN_A = [0, 1, 0, 0, 1, 1, 0, 1, 0, 1, 1, 1, 0]
V_BIN_B = [1, 0, 0, 0, 1, 0, 1, 1, 1, 1, 1, 1, 1]
V_COS_A = [0, 2, 0, 0, 8, 3, 0, 6, 0, 1, 2, 2, 0]
V_COS_B = [3, 0, 0, 0, 7, 0, 2, 2, 1, 3, 2, 1, 1]
V_PEA_A = [0, 2, 0, 0, 8, 3, 0, 6, 0, 1, 1, 2, 1]
V_PEA_B = [3, 0, 0, 0, 7, 0, 2, 2, 1, 3, 2, 4, 3]
V_EUC_A = [0, 2, 0, 0, 8, 3, 0, 6, 0, 1, 1, 2, 1]
V_EUC_B = [3, 0, 0, 0, 7, 0, 2, 2, 1, 3, 2, 4, 4]

GOLDENS = [  # (measure, vec_a, vec_b, expected)
    ("cooccurrence", V_BIN_A, V_BIN_B, 5.0),
    ("tanimoto", V_BIN_A, V_BIN_B, 0.454545455),
    ("cityblock", V_BIN_A, V_BIN_B, 0.142857143),
    ("loglikelihood", V_BIN_A, V_BIN_B, 0.03320155369284261),
    ("cosine", V_COS_A, V_COS_B, 0.769846046),
    ("pearson", V_PEA_A, V_PEA_B, 0.5303300858899108),
    ("euclidean", V_EUC_A, V_EUC_B, 0.11268865367232477),
]


def two_row_df(spark, va, vb):
    rows = [(0, j, float(v)) for j, v in enumerate(va) if v] + \
           [(1, j, float(v)) for j, v in enumerate(vb) if v]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["row_id", "col_id", "value"]))


@pytest.mark.parametrize("measure,va,vb,want", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_measure_goldens(spark, measure, va, vb, want):
    df = two_row_df(spark, va, vb)
    out = row_similarity(df, measure=measure, k=5, n_cols=len(va)).toPandas()
    got = out[(out["row_a"] == 0) & (out["row_b"] == 1)]["sim"].iloc[0]
    assert abs(got - want) < 1e-6, (measure, got, want)


def test_llr_golden(spark):
    # logLikelihoodRatio(numA=1, numB=2, numAB=1, numInteractions=6)
    # = 2.6341457841558764 — SimilarityAnalysisSuite.scala:411-420,
    # "value calculated by hadoop itemsimilarity"
    from mahout_spark.functions.measures import llr_cooc_expr

    row = spark.range(1).select(llr_cooc_expr(
        F.lit(1.0), F.lit(2.0), F.lit(1.0), F.lit(6.0)).alias("llr")).collect()
    assert abs(row[0]["llr"] - 2.6341457841558764) < 1e-12

    # duckdb twin agrees bit-exactly
    import duckdb

    from mahout_spark.functions.measures import llr_cooc_sql

    d = duckdb.sql(
        f"SELECT {llr_cooc_sql('1', '2', '1', '6')} AS llr").fetchone()[0]
    assert d == row[0]["llr"]
