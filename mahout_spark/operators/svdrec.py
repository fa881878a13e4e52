"""Taste SVD recommender: ALS-WR factorization + recommend-from-factors.

Reference anchors (studied, not copied):
- mr/.../impl/recommender/svd/SVDRecommender.java:152-162 (estimate =
  dot(userFeatures, itemFeatures)), :134-147 (recommend = top-N over
  AllUnknownItems candidates, known items excluded)
- mr/.../impl/recommender/svd/ALSWRFactorizer.java:95-160 (init: item
  feature 0 = average rating, rest small random; per-entity solves),
  :174-244 (alternating user/item sweeps)
- math/.../als/AlternatingLeastSquaresSolver.java:37-56 (observed-only
  ridge: solve (Y_i' Y_i + lambda * n_ui * I) w = Y_i' r_i — the Zhou et
  al. ALS-WR weighted-lambda regularization)

Spark shape: factors live as long-form triples (row_id, col_id=feature,
value), interchangeable with operators/decompositions.dals output. The
ALS-WR sweep is one join (prefs x current counter-side factors packed as
arrays) + one applyInPandas per entity group solving the k x k normal
equations with vectorized NumPy — the same data layout MLlib's ALS uses,
so it shuffles once per sweep on the entity key and never collects a
factor matrix to the driver. Scoring joins on the feature index;
recommend exposes a ``candidates`` frame so web-scale callers bound the
per-user candidate set (the reference's AllUnknownItemsCandidateItems-
Strategy enumerates EVERY item per user — fine for Taste's single-node
sizes, quadratic at 10^12; an ANN/item-sim prefilter is the production
candidate source).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark.operators.topk import topk_per_group

TRIPLE = ["row_id", "col_id", "value"]


def _pack(factors: DataFrame, k: int, id_alias: str,
          vec_alias: str) -> DataFrame:
    """(id, array<double> length k) from factor triples."""
    return (factors.groupBy(F.col("row_id").alias(id_alias))
            .agg(F.array_sort(F.collect_list(F.struct(
                F.col("col_id").cast("int").alias("j"),
                F.col("value").alias("v")))).alias("__s"))
            .select(id_alias,
                    F.transform("__s", lambda s: s["v"]).alias(vec_alias)))


def alswr_factorize(prefs: DataFrame, k: int = 10, lambda_: float = 0.065,
                    iterations: int = 10, user: str = "user_id",
                    item: str = "item_id", pref: str = "pref",
                    seed: int = 77) -> tuple[DataFrame, DataFrame]:
    """(U, V) factor triples — ALSWRFactorizer semantics: item features

    init to (average rating, small deterministic pseudo-random...); each
    sweep solves, per entity, the OBSERVED-ONLY ridge system
    (Y'Y + lambda * n * I) w = Y'r (AlternatingLeastSquaresSolver.solve).
    Deterministic: the reference's Random init is replaced by a hash
    coin so retries/stragglers reproduce bit-identical factors.
    User/item ids may be any groupable type (long, string, ...) — the
    factor schema mirrors the input id types.
    """
    p = prefs.select(F.col(user).alias("u"), F.col(item).alias("i"),
                     F.col(pref).cast("double").alias("r")).persist()
    # item init: feature 0 = average rating (ALSWRFactorizer.java:150-158),
    # features 1..k-1 = uniform[0, 0.1) from a deterministic hash coin
    coin = (F.pmod(F.xxhash64("row_id", "col_id", F.lit(seed)),
                   F.lit(1 << 24)).cast("double") / F.lit(float(1 << 24)))
    jcols = F.array(*[F.lit(j) for j in range(k)])
    v = (p.groupBy(F.col("i").alias("row_id"))
         .agg(F.avg("r").alias("__avg"))
         .select("row_id", F.explode(jcols).alias("col_id"), "__avg")
         .withColumn("value", F.when(F.col("col_id") == 0, F.col("__avg"))
                     .otherwise(coin * 0.1))
         .select(*TRIPLE))

    n_buckets = max(64, p.sparkSession.sparkContext.defaultParallelism * 4)
    id_types = {"u": p.schema["u"].dataType.simpleString(),
                "i": p.schema["i"].dataType.simpleString()}

    def _sweep(ratings: DataFrame, other: DataFrame,
               entity: str, counter: str) -> DataFrame:
        """Solve every `entity` from its observed `counter` rows.

        Entities are salted into buckets so each applyInPandas call
        carries MANY entities in one Arrow batch (one transfer per
        bucket, not per user) — the per-entity k x k solves run in a
        NumPy loop inside.
        """
        joined = (ratings
                  .join(_pack(other, k, counter, "__y"), counter)
                  .select(F.col(entity).alias("__e"), "r", "__y",
                          F.pmod(F.xxhash64(entity), F.lit(n_buckets))
                          .alias("__bkt")))

        def solve(pdf: pd.DataFrame) -> pd.DataFrame:
            out_ids, out_w = [], []
            eye = lambda_ * np.eye(k)
            for eid, g in pdf.groupby("__e", sort=False):
                y = np.array(g["__y"].tolist(), dtype=np.float64)  # (n, k)
                r = g["r"].to_numpy(dtype=np.float64)
                a = y.T @ y + len(r) * eye
                out_w.append(np.linalg.solve(a, y.T @ r))
                out_ids.append(eid)
            return pd.DataFrame({
                "row_id": np.repeat(np.asarray(out_ids, dtype=object), k),
                "col_id": np.tile(np.arange(k, dtype=np.int32),
                                  len(out_ids)),
                "value": np.concatenate(out_w) if out_w else
                np.empty(0)})

        solve_schema = (f"row_id {id_types[entity]}, col_id int, "
                        f"value double")
        return joined.groupBy("__bkt").applyInPandas(solve, solve_schema)

    u = None
    for _ in range(iterations):
        new_u = _sweep(p.select(F.col("u"), F.col("i").alias("counter_id"),
                                "r"),
                       v, "u", "counter_id").persist()
        if u is not None:
            u.unpersist()
        u = new_u
        new_v = _sweep(p.select(F.col("i"), F.col("u").alias("counter_id"),
                                "r"),
                       u, "i", "counter_id").persist()
        v.unpersist()
        v = new_v
    # materialize the final factors, then release the cached ratings so
    # the session doesn't pin a ratings copy per factorization call
    u.count()
    v.count()
    p.unpersist()
    return u, v


def implicit_als_factorize(prefs: DataFrame, k: int = 10,
                           lambda_: float = 0.065, alpha: float = 40.0,
                           iterations: int = 10, user: str = "user_id",
                           item: str = "item_id", pref: str = "pref",
                           seed: int = 77,
                           init_v: DataFrame | None = None
                           ) -> tuple[DataFrame, DataFrame]:
    """(U, V) factors for IMPLICIT feedback — Hu/Koren/Volinsky 2008.

    Reference anchors (studied, not copied):
    - math/.../als/ImplicitFeedbackAlternatingLeastSquaresSolver.java:
      60-170 — confidence c = 1 + alpha*r; per-entity system
      (Y'Y + Y'(Cu - I)Y + lambda*I) w = Y' Cu p(u) with p = 1 on every
      observed cell; lambda NOT scaled by n_u (unlike the explicit
      ALS-WR solve); Y'Y computed once per sweep over ALL counter-side
      entities.
    - mr/.../cf/taste/hadoop/als/ParallelALSFactorizationJob.java:
      200-214, 309-311 — same U-then-M alternation and item init
      (feature 0 = average interaction strength) as the explicit job,
      with the solver mapper swapped.

    Spark shape: the global k x k Gramian Y'Y is ONE ata_slim pass
    (per-partition BLAS partial, driver-merged — it is k x k no matter
    how many entities exist), broadcast into the solver closure; the
    per-entity correction touches only that entity's OBSERVED rows, so
    each sweep is the same join + bucketed applyInPandas as the
    explicit path. ``init_v`` overrides the deterministic default init
    (test hook: lets an in-core replay start from identical factors).
    Score with svd_estimate — the dot is the predicted preference.
    """
    from mahout_spark.operators.drm import ata_slim

    p = prefs.select(F.col(user).alias("u"), F.col(item).alias("i"),
                     F.col(pref).cast("double").alias("r")).persist()
    if init_v is not None:
        v = init_v.select(*TRIPLE)
    else:
        coin = (F.pmod(F.xxhash64("row_id", "col_id", F.lit(seed)),
                       F.lit(1 << 24)).cast("double") / F.lit(float(1 << 24)))
        jcols = F.array(*[F.lit(j) for j in range(k)])
        v = (p.groupBy(F.col("i").alias("row_id"))
             .agg(F.avg("r").alias("__avg"))
             .select("row_id", F.explode(jcols).alias("col_id"), "__avg")
             .withColumn("value",
                         F.when(F.col("col_id") == 0, F.col("__avg"))
                         .otherwise(coin * 0.1))
             .select(*TRIPLE))

    n_buckets = max(64, p.sparkSession.sparkContext.defaultParallelism * 4)
    id_types = {"u": p.schema["u"].dataType.simpleString(),
                "i": p.schema["i"].dataType.simpleString()}

    def _sweep(ratings: DataFrame, other: DataFrame,
               entity: str, counter: str) -> DataFrame:
        yty = ata_slim(other, k)  # k x k, broadcast via task closure

        joined = (ratings
                  .join(_pack(other, k, counter, "__y"), counter)
                  .select(F.col(entity).alias("__e"), "r", "__y",
                          F.pmod(F.xxhash64(entity), F.lit(n_buckets))
                          .alias("__bkt")))

        def solve(pdf: pd.DataFrame) -> pd.DataFrame:
            out_ids, out_w = [], []
            lam_eye = lambda_ * np.eye(k)
            for eid, g in pdf.groupby("__e", sort=False):
                y = np.array(g["__y"].tolist(), dtype=np.float64)  # (n, k)
                cm1 = alpha * g["r"].to_numpy(dtype=np.float64)  # c - 1
                a = yty + y.T @ (cm1[:, None] * y) + lam_eye
                rhs = y.T @ (1.0 + cm1)  # Y' Cu p(u), p = 1 observed
                out_w.append(np.linalg.solve(a, rhs))
                out_ids.append(eid)
            return pd.DataFrame({
                "row_id": np.repeat(np.asarray(out_ids, dtype=object), k),
                "col_id": np.tile(np.arange(k, dtype=np.int32),
                                  len(out_ids)),
                "value": np.concatenate(out_w) if out_w else
                np.empty(0)})

        solve_schema = (f"row_id {id_types[entity]}, col_id int, "
                        f"value double")
        return joined.groupBy("__bkt").applyInPandas(solve, solve_schema)

    u = None
    for _ in range(iterations):
        # unlike the explicit sweep (one deep plan, analyzed once at the
        # final action), every implicit sweep runs an EAGER side action
        # (the ata_slim Gramian collect), so the cumulative lineage would
        # be re-analyzed per iteration and Catalyst analysis time blows
        # up super-linearly (measured ~1.8x/iteration).  localCheckpoint
        # truncates the plan to O(1) per sweep — the dedup_groups
        # pointer-doubling lesson applied here.
        u = _sweep(p.select(F.col("u"), F.col("i").alias("counter_id"),
                            "r"),
                   v, "u", "counter_id").localCheckpoint(eager=True)
        v = _sweep(p.select(F.col("i"), F.col("u").alias("counter_id"),
                            "r"),
                   u, "i", "counter_id").localCheckpoint(eager=True)
    p.unpersist()
    return u, v


def svd_estimate(user_factors: DataFrame, item_factors: DataFrame,
                 pairs: DataFrame, user: str = "user_id",
                 item: str = "item_id") -> DataFrame:
    """(user, item, estimate) for requested pairs — SVDRecommender.

    estimatePreference: dot product of feature vectors, via a feature-
    index join (no dense matrices, no driver transfer).
    """
    uf = user_factors.select(F.col("row_id").alias(user),
                             F.col("col_id").alias("__j"),
                             F.col("value").alias("__u"))
    vf = item_factors.select(F.col("row_id").alias(item),
                             F.col("col_id").alias("__j"),
                             F.col("value").alias("__v"))
    return (pairs.select(user, item)
            .join(uf, user).join(vf, [item, "__j"])
            .groupBy(user, item)
            .agg(F.sum(F.col("__u") * F.col("__v")).alias("estimate")))


def svd_recommend(user_factors: DataFrame, item_factors: DataFrame,
                  prefs: DataFrame, top_n: int = 10,
                  user: str = "user_id", item: str = "item_id",
                  include_known: bool = False,
                  candidates: DataFrame | None = None,
                  rescorer=None) -> DataFrame:
    """(user, item, score) — top-N per user by factor dot product,

    known (already-preferred) items excluded unless ``include_known``
    (SVDRecommender.recommend + AllUnknownItemsCandidateItemsStrategy).
    ``candidates`` ((user, item) frame) bounds the candidate set; default
    is every (user, item) combination — the reference's semantics, right
    for Taste-scale catalogs, while web-scale callers pass an ANN or
    item-similarity prefilter here.
    """
    if candidates is None:
        candidates = (user_factors.select(F.col("row_id").alias(user))
                      .distinct()
                      .crossJoin(item_factors.select(
                          F.col("row_id").alias(item)).distinct()))
    if not include_known:
        candidates = candidates.join(
            prefs.select(user, item), [user, item], "left_anti")
    if rescorer is not None:
        from mahout_spark.operators.rescorer import filter_candidates
        candidates = filter_candidates(candidates, item, rescorer)
    scored = svd_estimate(user_factors, item_factors, candidates, user, item)
    if rescorer is not None:
        from mahout_spark.operators.rescorer import apply_rescorer
        scored = apply_rescorer(scored, item, "estimate", rescorer)
    return (topk_per_group(scored, [user], "estimate", top_n,
                           tiebreak_cols=[item])
            .select(user, item, F.col("estimate").alias("score")))


def factor_features_sql(prefs_cte: str, user: str = "user_id",
                        item: str = "item_id", pref: str = "pref") -> str:
    """CTE text for the gate's deterministic closed-form factors

    (see __spark_entry__._q_recommend_svd): user/item vectors
    (sum(pref), n) — integral, so the scoring join is exactly replayable.
    """
    return f"""
uf AS (SELECT {user}, sum({pref})::DOUBLE AS f0, count(*)::DOUBLE AS f1
       FROM {prefs_cte} GROUP BY 1),
vf AS (SELECT {item}, sum({pref})::DOUBLE AS f0, count(*)::DOUBLE AS f1
       FROM {prefs_cte} GROUP BY 1)
"""


def evaluate_factorization(user_factors: DataFrame,
                           item_factors: DataFrame, probe: DataFrame,
                           user: str = "user_id", item: str = "item_id",
                           pref: str = "pref") -> dict:
    """{'rmse', 'mae', 'n_scored', 'n_probe'} — FactorizationEvaluator

    (cf/taste/hadoop/als/FactorizationEvaluator.java: PredictRatingsMapper
    dots the two factor vectors per probe pair, then RMSE/MAE over the
    errors). Probe pairs whose user or item never appeared in training
    have no factors and are skipped — reported via n_scored vs n_probe
    so a shrunken denominator is never silent. One join plan, one agg;
    nothing driver-side.
    """
    est = svd_estimate(user_factors, item_factors,
                       probe.select(user, item), user, item)
    joined = probe.join(est, [user, item])
    row = joined.agg(
        F.count("*").alias("n"),
        F.avg(F.abs(F.col(pref) - F.col("estimate"))).alias("mae"),
        F.sqrt(F.avg(F.pow(F.col(pref) - F.col("estimate"), F.lit(2.0))))
        .alias("rmse")).first()
    return {"rmse": float(row["rmse"]) if row["n"] else float("nan"),
            "mae": float(row["mae"]) if row["n"] else float("nan"),
            "n_scored": int(row["n"]), "n_probe": probe.count()}
