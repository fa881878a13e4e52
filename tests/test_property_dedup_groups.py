"""Property-based check: dedup_groups == union-find on random graphs.

Hypothesis generates arbitrary edge lists (self-loops, duplicates,
reversed duplicates, long chains, dense blobs); the Spark closure must
match an in-core union-find exactly — same partition into groups, same
min-id representative — for every one of them.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mahout_spark.operators.dedup import dedup_groups

# py4j's callback thread changes the recursion limit; hypothesis warns
# it won't reset it — expected under Spark, not a signal
pytestmark = pytest.mark.filterwarnings(
    "ignore:The recursion limit will not be reset")

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark
    yield


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for v in list(parent):
        groups.setdefault(find(v), set()).add(v)
    return {g: members | {g} for g, members in groups.items()}


edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=40)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_strategy)
def test_groups_match_union_find(edges):
    df = _spark.createDataFrame(edges, "id_a long, id_b long")
    out = dedup_groups(df).collect()
    got = {}
    for r in out:
        got.setdefault(r["group_id"], set()).add(r["member_id"])
    exp = _union_find(edges)
    assert got == exp
    # representative flag: exactly the min id of each group
    reps = {r["group_id"] for r in out if r["is_representative"]}
    assert reps == {min(m) for m in exp.values()}
    for r in out:
        assert r["is_representative"] == (r["member_id"] == r["group_id"])


def test_chain_worst_case_converges(spark):
    # a 40-vertex path needs pointer doubling (log2(40) ~ 6 rounds)
    edges = [(i, i + 1) for i in range(39)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = dedup_groups(df).collect()
    assert {r["group_id"] for r in out} == {0}
    assert len(out) == 40
