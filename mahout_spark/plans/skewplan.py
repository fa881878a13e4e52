"""Sketch-driven skew detection + deterministic salted-join planning.

The north rule makes "partitioning / shuffle / skew handled explicitly" a
first-class requirement. Everywhere else in this repo the salting is
hand-placed (sketch/agg.py n_salt, rowsim's downsample cap, AQE skew
splits); this module closes the loop by DERIVING the salting plan from
the data itself at sketch cost:

1. ``skew_plan`` — one Misra-Gries pass (sketch/queries.heavy_hitters:
   JVM map-side (key, count) combine -> salted two-phase merge -> exact
   isin-verify scan) finds every key whose row count exceeds
   ``target_rows_per_task``, then assigns it
   ``salt_factor = ceil(n / target)``. MG's bounded undercount makes the
   candidate set provably complete above the threshold and the exact
   verify makes the PLAN deterministic: the output is a pure function of
   the data, independent of partitioning, order, or retries — so a
   resumed job regenerates the identical plan (checkpoint contract).

2. ``salted_join`` — the standard skew-join rewrite, executed
   deterministically: probe-side rows of a heavy key scatter to
   ``pmod(xxhash64(to_json(struct(*)), seed), factor)`` sub-keys (row
   CONTENT, not rand() — retry-stable, the repo-wide coin convention);
   build-side rows of that key replicate to all ``factor`` sub-keys via
   one ``explode(sequence(...))`` — replication cost = sum of factors
   over heavy keys only, never a full-table blow-up. Light keys keep
   salt 0 on both sides, so the rewrite is a no-op where the data is
   well-behaved. Result set provably equals the plain join: the salt is
   a function of the probe row alone, and the build side covers every
   possible salt value of each replicated key.

Why not just AQE? AQE's skew-join split only fires on sorted-merge joins
after a shuffle materializes (and within one stage); a sketch-derived
plan works for any strategy, costs one linear scan, can be persisted
with the checkpoint lineage, and — unlike AQE — also feeds groupBy-shaped
consumers (``sketch_per_group_skewed``'s explicit partial routing).

Scale shape: the MG pass shuffles <= 1/eps counters per partial, the
verify scan pushes an isin filter to the source, the plan itself is
O(#heavy keys) rows (broadcast everywhere it is consumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_plan(df: DataFrame, key_col: str,
              target_rows_per_task: int,
              eps: float | None = None) -> DataFrame:
    """-> DataFrame[key_col, n, salt_factor] for every key with more

    rows than ``target_rows_per_task`` (strict >). ``eps`` defaults to
    half the threshold fraction (heavy_hitters' completeness contract:
    eps < threshold_frac; the MG state is then <= 2N/target counters).
    Deterministic: same data -> same plan, any partitioning.

    Cost: one count() (metadata-only on parquet sources) to turn the
    row budget into a frequency threshold, one MG sketch scan, one
    pushed-down isin verify scan.
    """
    from ..sketch.queries import heavy_hitters

    n_total = df.count()
    if n_total == 0 or target_rows_per_task >= n_total:
        spark = df.sparkSession
        kt = df.schema[key_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"{key_col} {kt}, n long, salt_factor int")
    threshold_frac = target_rows_per_task / n_total
    hh = heavy_hitters(df, key_col, threshold_frac, eps=eps)
    return hh.select(
        key_col, F.col("n").cast("long").alias("n"),
        F.ceil(F.col("n") / F.lit(target_rows_per_task))
         .cast("int").alias("salt_factor"))


def _row_salt(df: DataFrame, factor_col: F.Column, seed: int) -> F.Column:
    """Deterministic per-row salt in [0, factor): hash of the full row
    content (the repo's no-rand() coin — retry/rerun-stable)."""
    content = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return F.pmod(F.xxhash64(content, F.lit(seed)), factor_col)


def salted_join(probe: DataFrame, build: DataFrame, key_col: str,
                plan: DataFrame, how: str = "inner",
                seed: int = 41,
                salt_expr: F.Column | None = None) -> DataFrame:
    """Plain ``probe.join(build, key_col, how)`` rewritten against a

    ``skew_plan``: heavy keys fan out over ``salt_factor`` sub-keys so no
    single reducer owns a whole head key. Supports 'inner' and 'left'
    (the build side is replicated, so right/full semantics would need
    per-key dedup of unmatched rows — out of scope). Returns the same
    columns as the plain join (salt columns are internal).

    The default probe salt hashes the full row content (retry-stable);
    byte-identical duplicate rows therefore SHARE a salt — if the probe
    can contain millions of fully identical rows, pass ``salt_expr``
    (any deterministic long expression, e.g. a precomputed row id) to
    spread them.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    p = F.broadcast(plan.select(F.col(key_col).alias("__pk"),
                                F.col("salt_factor")))
    raw_salt = (F.pmod(F.xxhash64(salt_expr, F.lit(seed)),
                       F.col("salt_factor").cast("long"))
                if salt_expr is not None else
                _row_salt(probe, F.col("salt_factor").cast("long"), seed))
    pr = probe.join(p, probe[key_col] == F.col("__pk"), "left")
    pr = pr.withColumn(
        "__salt",
        F.when(F.col("salt_factor").isNotNull(), raw_salt)
         .otherwise(F.lit(0)).cast("int")).drop("__pk", "salt_factor")

    bl = build.join(p, build[key_col] == F.col("__pk"), "left")
    bl = bl.withColumn(
        "__salt",
        F.explode(F.sequence(
            F.lit(0),
            F.coalesce(F.col("salt_factor"), F.lit(1)).cast("int")
             - F.lit(1)))).drop("__pk", "salt_factor")

    out_cols = [F.col(f"__probe.{c}") for c in probe.columns] + \
               [F.col(f"__build.{c}") for c in build.columns
                if c != key_col]
    return (pr.alias("__probe")
            .join(bl.alias("__build"),
                  [F.col(f"__probe.{key_col}") == F.col(f"__build.{key_col}"),
                   F.col("__probe.__salt") == F.col("__build.__salt")],
                  how)
            .select(*out_cols))


def skew_plan_oracle_sql(keyed_source_sql: str, key: str,
                         target_rows_per_task: int) -> str:
    """DuckDB replay: the plan is exact by construction (MG only ever
    proposes candidates; the verify scan decides), so the oracle is a
    plain GROUP BY / HAVING with the same ceil arithmetic."""
    return f"""
SELECT {key}, count(*)::BIGINT AS n,
       ceil(count(*)::DOUBLE / {target_rows_per_task})::INT AS salt_factor
FROM ({keyed_source_sql}) GROUP BY {key}
HAVING count(*) > {target_rows_per_task}
"""
