"""Corpus mixture planning: hit a target token mixture, deterministically.

Training corpora are specified as token SHARES per source/language/domain
("70% web-en, 20% code, 10% wiki" — the Pile/DoReMi-style recipe), but
the curated pools have whatever sizes they have. This module turns a
share recipe + the measured per-stratum availability into an exact,
engine-replayable sampling plan, including UPSAMPLING (epochs > 1) for
scarce high-quality strata — the capability plain rate sampling
(functions/sampling.py) lacks, and the standard practice for small
curated sources.

The plan is closed-form, no iteration: with fixed shares s_g, per-stratum
availability a_g (tokens), and a repetition cap E (max epochs), the
largest total T respecting a_g·E ≥ s_g·T for every g is

    T = min_g (a_g · E) / s_g          (water level set by the binding
    rate_g = (s_g · T) / a_g ∈ [0, E]   stratum; shares need not sum to 1
    planned_g = s_g · T                 — scaling all shares rescales T
                                        and leaves the plan invariant)

Availability is ONE algebraic aggregation (map-side combine absorbs Zipf
head strata); every float op is pinned multiply-then-divide so Spark and
DuckDB produce bit-identical plans (integer-valued token sums are exact
doubles; min over identical operand sets picks identical values).

Application draws the repo's md5 coin once per key: a row with rate r
keeps floor(r) full copies plus one more iff coin < (r − floor(r))·2^60
— deterministic under retry/re-run/partitioning, exactly the
functions/sampling.py contract extended to r > 1. Fractional thresholds
are computed DRIVER-side from the collected plan (strata are bounded by
the recipe size) and injected as integer literals into both engines —
the repo's threshold-literal convention (see stratified_sample,
core/privacy.py).

No reference anchor: the reference stops at vectorization; this is the
training-data extension layer (like webquality.py / dsir.py), and the
missing stage between curation and packing in jobs/pretrain.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import U60, hash_coin_u60, hash_coin_u60_sql


def mixture_plan(df: DataFrame, stratum_col: str, weight_col: str,
                 shares: dict[str, float],
                 max_epochs: float = 1.0) -> DataFrame:
    """(stratum, available, share, rate, planned) — one row per recipe
    stratum. Strata absent from the recipe are excluded (rate 0 by
    omission); a recipe stratum absent from the data has available = 0
    and forces T = 0 (an impossible recipe plans an empty corpus — the
    caller sees it immediately rather than silently missing a source).
    `max_epochs` > 1 allows repetition of scarce strata up to that
    factor."""
    if not shares:
        raise ValueError("shares must be non-empty")
    if any(s <= 0 for s in shares.values()):
        raise ValueError("shares must be positive")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    E = float(max_epochs)
    recipe = F.explode(F.array(*[
        F.struct(F.lit(k).alias("stratum"),
                 F.lit(float(v)).alias("share"))
        for k, v in sorted(shares.items())])).alias("r")
    rec = df.sparkSession.range(1).select(recipe).select("r.*")
    avail = (df.filter(F.col(stratum_col).isin(*shares.keys()))
             .groupBy(F.col(stratum_col).alias("stratum"))
             .agg(F.sum(F.col(weight_col).cast("long"))
                  .cast("double").alias("available")))
    p = (rec.join(avail, "stratum", "left")
         .withColumn("available", F.coalesce("available", F.lit(0.0))))
    t = p.agg(F.min((F.col("available") * E) / F.col("share"))
              .alias("__t"))
    return (p.join(F.broadcast(t))
            .select(
                "stratum", "available", "share",
                F.when(F.col("available") > 0,
                       (F.col("share") * F.col("__t"))
                       / F.col("available"))
                .otherwise(F.lit(0.0)).alias("rate"),
                (F.col("share") * F.col("__t")).alias("planned")))


def mixture_plan_sql(docs_sql: str, stratum_sql: str, weight_sql: str,
                     shares: dict[str, float],
                     max_epochs: float = 1.0) -> str:
    """DuckDB twin — identical pinned float-op order, hash-exact."""
    E = float(max_epochs)
    vals = ", ".join(
        f"('{k.replace(chr(39), chr(39) * 2)}', {float(v)!r}::DOUBLE)"
        for k, v in sorted(shares.items()))
    keys = ", ".join(f"'{k.replace(chr(39), chr(39)*2)}'" for k in shares)
    return f"""
WITH sh(stratum, share) AS (VALUES {vals}),
av AS (
  SELECT ({stratum_sql}) AS stratum,
         sum(({weight_sql})::BIGINT)::DOUBLE AS available
  FROM ({docs_sql}) WHERE ({stratum_sql}) IN ({keys}) GROUP BY 1
),
p AS (
  SELECT sh.stratum, sh.share, coalesce(av.available, 0.0) AS available
  FROM sh LEFT JOIN av USING (stratum)
),
t AS (SELECT min((available * {E!r}) / share) AS tt FROM p)
SELECT stratum, available, share,
       CASE WHEN available > 0 THEN (share * tt) / available
            ELSE 0.0 END AS rate,
       share * tt AS planned
FROM p, t
"""


def _rate_literals(plan_rows) -> list[tuple[str, int, int]]:
    """(stratum, n_full, frac_threshold) integer literals from a
    collected plan — the driver-computed threshold convention."""
    out = []
    for r in plan_rows:
        rate = float(r["rate"])
        n_full = int(rate)
        out.append((r["stratum"], n_full, int((rate - n_full) * U60)))
    return out


def apply_mixture(df: DataFrame, stratum_col: str, key_col: str,
                  plan: DataFrame, seed: int = 1,
                  copy_col: str = "copy") -> DataFrame:
    """Materialize a mixture plan: each row keeps floor(rate) full
    copies (`copy` = 1..n) plus one more iff its md5 coin clears the
    fractional threshold. Map-only (literal CASE chains, no join — the
    plan is recipe-bounded); strata outside the plan are dropped.
    Downstream stages that key on row identity should key on
    (key, copy) — jobs/pretrain.py packs on that composite."""
    lits = _rate_literals(plan.collect())
    nf = F.lit(0)
    thr = F.lit(0).cast("long")
    for stratum, n_full, t in sorted(lits):
        cond = F.col(stratum_col) == stratum
        nf = F.when(cond, F.lit(n_full)).otherwise(nf)
        thr = F.when(cond, F.lit(t).cast("long")).otherwise(thr)
    coin = hash_coin_u60(F.col(key_col), seed)
    n_copies = nf + F.when(coin < thr, F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("__nc", n_copies)
            .filter(F.col("__nc") >= 1)
            .withColumn(copy_col,
                        F.explode(F.sequence(F.lit(1), F.col("__nc"))))
            .drop("__nc"))


def apply_mixture_sql(docs_sql: str, stratum_sql: str, key_sql: str,
                      plan_rows, seed: int = 1) -> str:
    """DuckDB twin over the SAME collected plan rows (same integer
    literals) — emits every input column plus `copy`."""
    lits = _rate_literals(plan_rows)
    nf = "0"
    thr = "0"
    for stratum, n_full, t in sorted(lits):
        v = stratum.replace("'", "''")
        nf = f"CASE WHEN ({stratum_sql}) = '{v}' THEN {n_full} ELSE {nf} END"
        thr = f"CASE WHEN ({stratum_sql}) = '{v}' THEN {t} ELSE {thr} END"
    coin = hash_coin_u60_sql(key_sql, seed)
    return f"""
SELECT d.* EXCLUDE (__nc), u.copy
FROM (
  SELECT *, ({nf}) + (CASE WHEN {coin} < ({thr}) THEN 1 ELSE 0 END) AS __nc
  FROM ({docs_sql})
) d, unnest(generate_series(1, d.__nc)) AS u(copy)
WHERE d.__nc >= 1
"""


def mixture_sample_oracle_sql(docs_sql: str, stratum_sql: str,
                              key_sql: str, weight_sql: str,
                              shares: dict[str, float],
                              max_epochs: float = 1.0,
                              seed: int = 1) -> str:
    """Fully in-engine replay of plan+apply (no Python-derived
    literals): the plan CTE recomputes rates, the fractional threshold
    is floor((rate − floor(rate)) · 2^60) — multiplication by 2^60 is
    an exact exponent shift, so this equals the driver-side
    `_rate_literals` integers bit-for-bit. Emits every input column
    plus `copy`."""
    plan = mixture_plan_sql(docs_sql, stratum_sql, weight_sql, shares,
                            max_epochs)
    coin = hash_coin_u60_sql(key_sql, seed)
    return f"""
WITH pl AS ({plan}),
j AS (
  SELECT d.*, floor(pl.rate)::BIGINT AS __nf,
         floor((pl.rate - floor(pl.rate)) * {float(U60)!r})::BIGINT
           AS __thr
  FROM ({docs_sql}) d JOIN pl ON ({stratum_sql}) = pl.stratum
),
w AS (
  SELECT *, __nf + (CASE WHEN {coin} < __thr THEN 1 ELSE 0 END) AS __nc
  FROM j
)
SELECT w.* EXCLUDE (__nf, __thr, __nc), u.copy
FROM w, unnest(generate_series(1, w.__nc)) AS u(copy)
WHERE w.__nc >= 1
"""
