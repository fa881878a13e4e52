"""Scan-parallelism repair for narrow inputs.

A parquet file with a single (or few) row groups yields a single-task scan
no matter how many cores the cluster has — every map-side operation fused
into that stage (tokenize, explode, per-row scoring) then runs serially:
the "one huge unsplittable file" input-skew case (optimization guide §2.5,
whose fix is "repartition immediately after the read").

``widen_partitions`` applies that fix *adaptively*: it round-robin
repartitions only when the frame has fewer partitions than the session's
default parallelism. At real scale (100 TB = tens of thousands of splits)
the condition is false and the call is a no-op, so no extra shuffle is ever
paid where the scan is already parallel.

Only use it on ORDER-INSENSITIVE pipelines (hash aggregations, joins,
top-K, linear/idempotent sketches). Order-sensitive folds (t-digest/KLL
ingestion) must keep their input partitioning, since their results depend
on which rows share a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame, max_target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the cluster's default parallelism
    when (and only when) its current partitioning is narrower.

    ``max_target`` optionally caps the target partition count (for small
    bounded frames where full parallelism is overkill).
    """
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (unresolved plans)
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if max_target is not None:
        target = min(target, max_target)
    if n >= target:
        return df
    return df.repartition(target)
