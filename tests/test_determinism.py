"""Retry-safety / partitioning-invariance of every random-looking choice.

The north rule's resume + two-cluster-size criteria only hold if sampling,
salting, and LSH decisions are pure functions of data — these tests pin
that across different partitionings (a proxy for task retries and
different cluster sizes)."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.cooccurrence import (llr_item_similarity,
                                                 sample_down_and_binarize)
from mahout_spark.operators.dedup import minhash_dedup_pairs


@pytest.fixture(scope="module")
def triples(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return li.select(F.col("l_orderkey").alias("row_id"),
                     F.col("l_partkey").alias("col_id"))


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


def test_downsample_partitioning_invariant(spark, triples):
    a = sample_down_and_binarize(triples.repartition(2), seed=5,
                                 max_per_row=3, max_per_col=3)
    b = sample_down_and_binarize(triples.repartition(13), seed=5,
                                 max_per_row=3, max_per_col=3)
    ra, rb = rows_of(a), rows_of(b)
    assert ra == rb
    assert 0 < len(ra) < triples.count()
    # different seed -> different sample
    c = sample_down_and_binarize(triples.repartition(2), seed=6,
                                 max_per_row=3, max_per_col=3)
    assert rows_of(c) != ra


def test_downsampled_itemsim_partitioning_invariant(spark, triples):
    a = llr_item_similarity(triples.repartition(3), k=5, seed=9,
                            max_interactions=4)
    b = llr_item_similarity(triples.repartition(17), k=5, seed=9,
                            max_interactions=4)
    assert rows_of(a) == rows_of(b)


def test_minhash_dedup_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = minhash_dedup_pairs(docs.repartition(2), "doc_id", "text",
                            num_perm=8, bands=4, threshold=0.1)
    b = minhash_dedup_pairs(docs.repartition(9), "doc_id", "text",
                            num_perm=8, bands=4, threshold=0.1)
    assert rows_of(a) == rows_of(b)
