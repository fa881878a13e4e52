"""Sketch-driven aggregation planning — choose the groupBy strategy
from the data, at sketch cost.

Completes the planner triad the north rule's "partitioning / shuffle /
skew handled explicitly" asks for: ``plans/skewplan.py`` derives SALT
plans (MG + exact verify), ``plans/joinsize.py`` estimates JOIN sizes
(Count-Sketch), and this module sizes and shapes AGGREGATIONS (HLL +
MG): a groupBy over 10^12 rows behaves completely differently at 10
groups (map-side combine collapses everything; one tiny shuffle), 10^6
groups (classic two-phase agg; shuffle width matters), and 10^11
groups (combine is useless — rows ≈ groups; pay one wide exchange and
skip partials), and a handful of Zipf-head groups poison any of those
shapes unless routed through salted partials.

``agg_plan`` is a pure function of the data (every input is an exact
count, an exact-verified heavy-key count, or a bit-replayable
parity-HLL estimate), so a checkpoint-resumed job regenerates the
identical plan — the same determinism contract as ``skew_plan``.

Decision rule (thresholds are explicit parameters):
    1. any group's row count > target_rows_per_task  -> 'salted_two_phase'
       (route heavy groups through sketch_per_group_skewed-style
       partial shards; salt factors come from skew_plan)
    2. est avg rows/group < min_combine_ratio        -> 'wide_shuffle'
       (map-side combine can't pay for itself; skip partial agg and
       size the exchange directly)
    3. otherwise                                     -> 'direct'
       (plain two-phase hash aggregation)
shuffle_partitions = clamp(ceil(est_groups / groups_per_partition),
                           1, max_partitions)

Float parity with the SQL oracle: the HLL estimate is bit-exact
UNROUNDED (integer register state; one divide / one shared ln), the
combine ratio is one double divide, and the partition count is one
divide + ceil — every branch decision compares identical doubles in
both engines.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AggPlan:
    n_rows: int
    est_groups: float
    n_heavy: int
    max_salt_factor: int
    strategy: str
    shuffle_partitions: int


def agg_plan(df: DataFrame, group_col: str,
             target_rows_per_task: int = 2_000_000,
             min_combine_ratio: float = 4.0,
             groups_per_partition: int = 100_000,
             max_partitions: int = 8192,
             hll_p: int = 14, parity: bool = True) -> AggPlan:
    """Derive the aggregation plan for ``df.groupBy(group_col)``.

    Cost: one count() (metadata-only on parquet), one HLL scan over
    the group key, one MG scan + pushed-down isin verify. ``parity=
    True`` uses the md5 hash family so a DuckDB oracle replays the
    whole plan bit-exact; ``parity=False`` is the faster production
    hash (same plan shape, different estimate bits).
    """
    from ..functions.hashutil import md5_long60
    from ..sketch.agg import hll_spec, sketch_global
    from .skewplan import skew_plan

    n_rows = df.count()
    if n_rows == 0:
        return AggPlan(0, 0.0, 0, 1, "direct", 1)
    kc = df.schema[group_col].dataType.simpleString()
    key = (F.col(group_col) if kc == "string"
           else F.col(group_col).cast("string"))
    spec = hll_spec(p=hll_p, seed=1, sparse_limit=0, parity=parity)
    blob = sketch_global(df, spec, key_expr=(
        md5_long60(key) if parity else F.xxhash64(key)))
    est_groups = spec.deserialize(blob).count()

    heavy = skew_plan(df, group_col, target_rows_per_task).collect()
    n_heavy = len(heavy)
    max_salt = max((r["salt_factor"] for r in heavy), default=1)

    if n_heavy > 0:
        strategy = "salted_two_phase"
    elif est_groups > 0 and float(n_rows) / est_groups < min_combine_ratio:
        strategy = "wide_shuffle"
    else:
        strategy = "direct"
    parts = min(max_partitions,
                max(1, math.ceil(est_groups / groups_per_partition)))
    return AggPlan(int(n_rows), float(est_groups), n_heavy,
                   int(max_salt), strategy, int(parts))


def agg_plan_row(df: DataFrame, group_col: str, plan_name: str,
                 **kwargs) -> DataFrame:
    """One-row DataFrame form of ``agg_plan`` (gate/CLI shape)."""
    p = agg_plan(df, group_col, **kwargs)
    return df.sparkSession.createDataFrame(
        [(plan_name, p.n_rows, p.est_groups, p.n_heavy,
          p.max_salt_factor, p.strategy, p.shuffle_partitions)],
        "plan_for string, n_rows long, est_groups double, n_heavy int, "
        "max_salt_factor int, strategy string, shuffle_partitions int")


def agg_plan_oracle_sql(source_sql: str, key: str, plan_name: str,
                        target_rows_per_task: int = 2_000_000,
                        min_combine_ratio: float = 4.0,
                        groups_per_partition: int = 100_000,
                        max_partitions: int = 8192,
                        hll_p: int = 14) -> str:
    """DuckDB replay of ``agg_plan_row``: exact row count, the
    UNROUNDED parity-HLL group estimate (hll_distinct_oracle_sql with
    round_dp=None — bit-identical register math), exact heavy-group
    counts via GROUP BY/HAVING (the sketch side exact-verifies its MG
    candidates, so both engines hold the same exact values), then the
    same CASE + ceil arithmetic. ``key`` must be a string-typed SQL
    expression over the source (cast ints)."""
    from ..sketch.queries import hll_distinct_oracle_sql

    hll = hll_distinct_oracle_sql(
        f"SELECT {key} AS __k FROM ({source_sql})", hll_p,
        token_col="__k", round_dp=None,
        group_exprs=[("'*'", "g")])
    return f"""
WITH __ap_src AS ({source_sql}),
__ap_est AS ({hll}),
__ap_cnt AS (SELECT count(*)::BIGINT AS n_rows FROM __ap_src),
__ap_heavy AS (
  SELECT {key} AS k, count(*)::BIGINT AS n FROM __ap_src
  GROUP BY 1 HAVING count(*) > {target_rows_per_task}
),
__ap_hv AS (
  SELECT count(*)::INT AS n_heavy,
         COALESCE(MAX(CEIL(n / {target_rows_per_task}::DOUBLE)), 1)::INT
           AS max_salt
  FROM __ap_heavy
)
SELECT '{plan_name}' AS plan_for, c.n_rows,
       e.distinct_est AS est_groups, h.n_heavy,
       h.max_salt AS max_salt_factor,
       CASE WHEN h.n_heavy > 0 THEN 'salted_two_phase'
            WHEN c.n_rows::DOUBLE / e.distinct_est
                 < {min_combine_ratio!r} THEN 'wide_shuffle'
            ELSE 'direct' END AS strategy,
       LEAST({max_partitions},
             GREATEST(1, CEIL(e.distinct_est
                              / {groups_per_partition}::DOUBLE)))::INT
         AS shuffle_partitions
FROM __ap_cnt c, __ap_est e, __ap_hv h
"""
