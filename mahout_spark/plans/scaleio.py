"""Scan-parallelism repair for narrow inputs.

A parquet file with a single (or few) row groups yields a single-task scan
no matter how many cores the cluster has — every map-side operation fused
into that stage (tokenize, explode, per-row scoring) then runs serially:
the "one huge unsplittable file" input-skew case (optimization guide §2.5,
whose fix is "repartition immediately after the read").

``widen_partitions`` applies that fix *adaptively*: it repartitions only
when the frame has fewer partitions than the session's default
parallelism. At real scale (100 TB = tens of thousands of splits) the
condition is false and the call is a no-op, so no extra shuffle is ever
paid where the scan is already parallel.

The spread key is ``xxhash64(<all columns>)`` — a deterministic hash
partitioning, NOT round-robin ``repartition(n)``: round-robin pays a
local sort of every input partition first (``sortBeforeRepartition``,
needed for retry determinism), which on the exact single-partition
inputs this helper targets is a SERIAL sort of the whole frame — the
cost the widening was meant to remove. A deterministic hash key needs no
sort and is retry/AQE-safe by construction (guide §2.5).

Only use it on ORDER-INSENSITIVE pipelines (hash aggregations, joins,
top-K, linear/idempotent sketches). Order-sensitive folds (t-digest/KLL
ingestion) must keep their input partitioning, since their results depend
on which rows share a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def widen_partitions(df: DataFrame, max_target: int | None = None,
                     min_bytes: int = 0) -> DataFrame:
    """Hash-repartition ``df`` to the cluster's default parallelism when
    (and only when) its current partitioning is narrower.

    ``max_target`` optionally caps the target partition count (for small
    bounded frames where full parallelism is overkill). ``min_bytes``
    optionally skips the repartition when the frame's source files total
    fewer bytes — for pipelines whose per-byte cost is modest (plain
    tokenization), a tiny input finishes serially faster than the
    exchange costs; leave it 0 for per-row-expensive work (scoring,
    multi-hash signatures), where even small inputs are worth spreading.
    """
    import os

    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (unresolved plans)
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if max_target is not None:
        target = min(target, max_target)
    if n >= target:
        return df
    if min_bytes:
        try:
            files = df.inputFiles()
            total = sum(os.path.getsize(f[5:] if f.startswith("file:")
                                        else f) for f in files)
            if files and total < min_bytes:
                return df
        except Exception:  # non-local FS / no file source: widen anyway
            pass
    # Deterministic spread key — no round-robin sort (see module
    # docstring). Hashing the full row alone would send every copy of a
    # duplicated row (Zipf token streams) to ONE partition, so a
    # monotonic per-row disambiguator joins the hash. It is deterministic
    # for the scan-level single-partition inputs this helper targets
    # (file order), and the helper is a no-op on the multi-split inputs
    # where shuffle-retry order could vary.
    cols = [F.col(c) for c in df.columns]
    return df.repartition(target,
                          F.xxhash64(*cols, F.monotonically_increasing_id()))
