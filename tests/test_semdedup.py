"""SemDeDup (embedding-space semantic dedup): hand-computed assignment
and pair goldens, transitive grouping, keep rule, DuckDB bit-parity,
partitioning invariance."""

import duckdb
import pandas as pd
import pytest

from mahout_spark.operators.semdedup import (assign_clusters_cosine,
                                             semdedup, semdedup_pairs,
                                             semdedup_sql)

# two well-separated directions; ids 1-3 are near-copies of e1 (scaled /
# tiny perturbation), ids 4-5 near-copies of e2, id 6 is an e1-cluster
# member far from the copies
E1, E2 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
ROWS = [
    (1, [1.0, 0.01, 0.0, 0.0]),
    (2, [2.0, 0.02, 0.0, 0.0]),      # scaled copy of 1 -> cos = 1
    (3, [1.0, 0.012, 0.0, 0.0]),     # near copy of 1
    (4, [0.01, 1.0, 0.0, 0.0]),
    (5, [0.02, 2.0, 0.0, 0.0]),      # scaled copy of 4
    (6, [1.0, -0.9, 0.0, 0.0]),      # e1 cluster, not a dup
]
CENTERS = [E1, E2]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(ROWS,
                                 "vec_id long, embedding array<double>")


def test_assignment(emb):
    got = dict((r["vec_id"], r["cluster"]) for r in
               assign_clusters_cosine(emb, CENTERS).collect())
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 0}


def test_assignment_tie_breaks_low(spark):
    d = spark.createDataFrame([(1, [1.0, 1.0])],
                              "vec_id long, embedding array<double>")
    got = assign_clusters_cosine(
        d, [[1.0, 0.0], [0.0, 1.0]]).collect()[0]["cluster"]
    assert got == 0  # equal cosines -> first centroid wins


def test_pairs_golden(emb):
    got = sorted((r["id_a"], r["id_b"]) for r in
                 semdedup_pairs(emb, CENTERS, threshold=0.99).collect())
    assert got == [(1, 2), (1, 3), (2, 3), (4, 5)]


def test_pairs_cross_cluster_never_compared(emb):
    # 1 and 4 have cos ~0.02 but would ALSO be excluded by threshold;
    # prove the cluster blocking itself: threshold=-1 keeps every
    # within-cluster pair yet still no (1,4)-style cross pair
    got = sorted((r["id_a"], r["id_b"]) for r in
                 semdedup_pairs(emb, CENTERS, threshold=-1.0).collect())
    assert (1, 4) not in got and (3, 6) in got


def test_semdedup_groups_and_keep(emb):
    out = {r["vec_id"]: (r["cluster"], r["group_id"], r["keep"])
           for r in semdedup(emb, CENTERS, threshold=0.99).collect()}
    assert out == {
        1: (0, 1, True), 2: (0, 1, False), 3: (0, 1, False),
        4: (1, 4, True), 5: (1, 4, False),
        6: (0, 6, True),   # unduplicated: own group, kept
    }


def test_transitive_chain(spark):
    # a~b and b~c but cos(a,c) just under threshold: one group anyway
    d = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.14]), (3, [1.0, 0.28])],
        "vec_id long, embedding array<double>")
    out = semdedup(d, [[1.0, 0.0]], threshold=0.99)
    got = {r["vec_id"]: (r["group_id"], r["keep"])
           for r in out.collect()}
    assert got == {1: (1, True), 2: (1, False), 3: (1, False)}


def test_duckdb_parity(emb):
    got = sorted((r["vec_id"], r["cluster"], r["group_id"], r["keep"])
                 for r in semdedup(emb, CENTERS, threshold=0.99).collect())
    con = duckdb.connect()
    con.register("emb_t", pd.DataFrame(ROWS,
                                       columns=["vec_id", "embedding"]))
    centers_sql = " UNION ALL ".join(
        f"SELECT {i} AS cidx, {c}::DOUBLE[] AS cv"
        for i, c in enumerate(CENTERS))
    want = sorted(map(tuple, con.execute(
        semdedup_sql("emb_t", centers_sql, threshold=0.99)).fetchall()))
    assert got == want


def test_partitioning_invariance(emb):
    a = sorted(map(tuple, semdedup(emb, CENTERS).collect()))
    b = sorted(map(tuple, semdedup(emb.repartition(7), CENTERS).collect()))
    assert a == b
