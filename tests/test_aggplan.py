"""Sketch-driven aggregation planner: strategy branches, determinism
under repartitioning, empty input, clamping, parity with the DuckDB
oracle, and the fast (non-parity) path producing the same SHAPE."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mahout_spark.plans.aggplan import (AggPlan, agg_plan, agg_plan_row,
                                        agg_plan_oracle_sql)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_salted_branch_and_factors(spark, docs):
    p = agg_plan(docs, "lang", target_rows_per_task=150,
                 groups_per_partition=4, max_partitions=8)
    assert p.strategy == "salted_two_phase"
    assert p.n_heavy >= 1 and p.max_salt_factor >= 2
    assert p.n_rows == docs.count()
    assert 1 <= p.shuffle_partitions <= 8


def test_wide_shuffle_branch(spark, docs):
    # doc_id is unique -> rows/group == 1 < min_combine_ratio
    p = agg_plan(docs, "doc_id", target_rows_per_task=10**6,
                 groups_per_partition=100, max_partitions=3)
    assert p.strategy == "wide_shuffle"
    assert p.n_heavy == 0 and p.max_salt_factor == 1
    assert p.shuffle_partitions == 3            # clamped at max


def test_direct_branch(spark, docs):
    p = agg_plan(docs, "lang", target_rows_per_task=10**6)
    assert p.strategy == "direct"
    assert p.shuffle_partitions == 1
    assert 4.0 < p.est_groups < 6.0             # ~5 languages


def test_deterministic_under_partitioning(spark, docs):
    a = agg_plan(docs, "lang", target_rows_per_task=150)
    b = agg_plan(docs.repartition(17, "doc_id"), "lang",
                 target_rows_per_task=150)
    assert a == b                               # dataclass equality, bitwise


def test_empty_input(spark):
    empty = spark.createDataFrame([], "k string")
    assert agg_plan(empty, "k") == AggPlan(0, 0.0, 0, 1, "direct", 1)


def test_fast_family_same_shape(spark, docs):
    slow = agg_plan(docs, "lang", target_rows_per_task=150, parity=True)
    fast = agg_plan(docs, "lang", target_rows_per_task=150, parity=False)
    assert fast.strategy == slow.strategy
    assert fast.n_rows == slow.n_rows and fast.n_heavy == slow.n_heavy
    # estimates differ by hash family but stay in the same ballpark
    assert abs(fast.est_groups - slow.est_groups) < 3.0


def test_row_form_vs_duckdb_oracle(spark, docs):
    got = agg_plan_row(docs, "lang", "p1", target_rows_per_task=150,
                       groups_per_partition=4, max_partitions=8).collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = con.execute(agg_plan_oracle_sql(
        "SELECT lang FROM documents", "lang", "p1",
        target_rows_per_task=150, groups_per_partition=4,
        max_partitions=8)).fetchall()
    assert len(got) == len(want) == 1
    assert tuple(got[0]) == tuple(want[0])      # bit-exact incl. est
