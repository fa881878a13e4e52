"""Top-K per group — the engine's single bounded-selection primitive.

Replaces every PriorityQueue in the reference (TopItems.java:51-94,
TopElementsQueue, SimilarityAnalysis.scala:337, MergeToTopKSimilaritiesReducer
RowSimilarityJob.java:542-559) with one Window plan. Ties broken
deterministically by the tiebreak column so results are stable across
retries and engines (the reference's heap order on ties is arbitrary).

Scale note: Window.partitionBy(group).orderBy(...) + row_number is a single
shuffle on the group key and streams each partition — no per-group
materialization, skew handled by AQE. For extreme-cardinality groups
prefilter with ``F.max``-style pre-aggregation before windowing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, group_cols: list[str],
                   order_col: str, k: int,
                   tiebreak_cols: list[str] | None = None,
                   descending: bool = True) -> DataFrame:
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    for t in (tiebreak_cols or []):
        order.append(F.col(t).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn"))


def global_topk(df: DataFrame, order_col: str, k: int,
                tiebreak_cols: list[str] | None = None,
                descending: bool = True) -> DataFrame:
    """GLOBAL top-K — selection-identical to ``topk_per_group`` with a
    constant group, but planned as TakeOrderedAndProject (per-partition
    bounded heaps + driver merge of k rows) instead of a single-partition
    Window: no ``WindowExec: No Partition Defined`` warning, no full sort,
    and the shuffle is bounded by n_partitions x k rows.
    """
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    for t in (tiebreak_cols or []):
        order.append(F.col(t).asc())
    return df.orderBy(*order).limit(k)
