"""Duplicate-group resolution: transitive closure over dup pairs."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.dedup import dedup_groups, dedup_groups_sql


def _groups(rows):
    out = {}
    for r in rows:
        out.setdefault(r["group_id"], set()).add(r["member_id"])
    return out


def test_chain_topology_one_group(spark):
    # a-b, b-c, c-d => ONE group (the adversarial diameter case for
    # naive one-hop propagation; pointer doubling closes it)
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "id_a long, id_b long")
    rows = dedup_groups(pairs).collect()
    assert _groups(rows) == {1: {1, 2, 3, 4}}
    reps = {r["member_id"]: r["is_representative"] for r in rows}
    assert reps == {1: True, 2: False, 3: False, 4: False}


def test_long_chain_converges(spark):
    # diameter 63 chain — O(diameter) propagation would need 63 rounds;
    # doubling needs ~log2
    n = 64
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  "id_a long, id_b long")
    rows = dedup_groups(pairs, max_iter=10).collect()
    assert _groups(rows) == {0: set(range(n + 1))}


def test_multiple_components_and_duplicate_edges(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (5, 6), (8, 9), (9, 7), (7, 8)],
        "id_a long, id_b long")
    rows = dedup_groups(pairs).collect()
    assert _groups(rows) == {1: {1, 2}, 5: {5, 6}, 7: {7, 8, 9}}


def test_string_ids(spark):
    pairs = spark.createDataFrame([("b", "a"), ("b", "c")],
                                  "id_a string, id_b string")
    rows = dedup_groups(pairs).collect()
    assert _groups(rows) == {"a": {"a", "b", "c"}}


def test_partitioning_invariance(spark):
    pairs = [(i, i + 1) for i in range(0, 30, 2)] + [(0, 28)]
    df1 = spark.createDataFrame(pairs, "id_a long, id_b long").repartition(1)
    df8 = spark.createDataFrame(pairs, "id_a long, id_b long").repartition(8)
    r1 = sorted((r["group_id"], r["member_id"])
                for r in dedup_groups(df1).collect())
    r8 = sorted((r["group_id"], r["member_id"])
                for r in dedup_groups(df8).collect())
    assert r1 == r8


def test_duckdb_recursive_cte_twin(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = sorted((r["group_id"], r["member_id"], r["is_representative"])
                 for r in dedup_groups(df).collect())
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = dedup_groups_sql(f"SELECT * FROM (VALUES {vals}) t(id_a, id_b)")
    con = duckdb.connect()
    want = sorted((int(g), int(m), bool(r))
                  for g, m, r in con.execute(sql).fetchall())
    assert got == want
