"""Cluster-quality evaluation: representative points, CDbw, ClusterEvaluator.

Reference anchors (studied, not copied):
- integration/.../clustering/evaluation/RepresentativePointsDriver.java
  + RepresentativePointsMapper.java:61-79 — iteration 0 seeds each
  cluster's representative list with its CENTER; each further iteration
  appends, per cluster, the point with the LARGEST SUM of distances to
  the cluster's current representatives (the mapper keeps a running
  most-distant point, the reducer appends it).
- integration/.../clustering/cdbw/CDbwEvaluator.java — CDbw
  (Halkidi & Vazirgiannis): per-cluster avg-std from the representative
  points (OnlineGaussianAccumulator.getAverageStd:93-99 = mean of
  per-dimension sample stds), intra-cluster density (eqn 5-7:
  fraction of reps within the clusters' MEAN avg-std of the center,
  each scaled 1/std), minimum rep-pair distances + midpoints between
  cluster pairs, inter-cluster density (eqn 1-3), separation (eqn 4),
  CDbw = intraDensity · separation (eqn 8, :180-182).
- integration/.../clustering/evaluation/ClusterEvaluator.java:105-200 —
  the simpler scaled densities: inter = (mean−min)/(max−min) over
  pairwise CENTER distances, intra = per-cluster (mean−min)/(max−min)
  over pairwise REP distances, averaged (NaN skipped).

Spark shape: the point scan is the only big side — each iteration of
representative-point selection is ONE broadcast join against the tiny
(cluster → reps) table, a JVM fold for the distance sum, and a top-1
window per cluster; the evaluators then run driver-side on the
collected representatives (|clusters| × iterations rows — bounded).
Deterministic: ties broken by point id, no RNG anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark.functions.distance import DISTANCES
from mahout_spark.operators.clustering import NP_MEASURES
from mahout_spark.operators.topk import topk_per_group

__all__ = ["representative_points", "cdbw_evaluate", "cluster_evaluator"]


def representative_points(points: DataFrame, centers: dict,
                          n_iterations: int = 3,
                          measure: str = "euclidean",
                          id_col: str = "vec_id", vec_col: str = "vector",
                          cluster_col: str = "cluster") -> dict:
    """{cluster: [np.ndarray, ...]} — center first, then one

    most-distant point appended per iteration (RepresentativePoints-
    Driver semantics; distance = sum over current reps)."""
    spark = points.sparkSession
    dist = DISTANCES[measure]
    reps = {int(c): [np.asarray(v, dtype=np.float64)]
            for c, v in centers.items()}
    pts = points.select(F.col(cluster_col).alias("__c"),
                        F.col(id_col).alias("__id"),
                        F.col(vec_col).cast("array<double>").alias("__v"))
    for _ in range(n_iterations):
        reps_df = F.broadcast(spark.createDataFrame(
            [(c, [list(map(float, r)) for r in rs])
             for c, rs in reps.items()],
            "__c int, __reps array<array<double>>"))
        total = F.aggregate(
            F.col("__reps"), F.lit(0.0),
            lambda acc, rep: acc + dist(F.col("__v"), rep))
        scored = (pts.join(reps_df, pts["__c"] == reps_df["__c"])
                  .select(pts["__c"], "__id", "__v",
                          total.alias("__d")))
        winners = topk_per_group(scored, ["__c"], "__d", 1,
                                 tiebreak_cols=["__id"]).collect()
        for r in winners:
            reps[int(r["__c"])].append(
                np.asarray(r["__v"], dtype=np.float64))
    return reps


def _np_dist(measure: str):
    f = NP_MEASURES[measure]
    return lambda a, b: float(f(np.asarray(a)[None, :], np.asarray(b))[0])


def _avg_std(rep_list) -> float:
    """OnlineGaussianAccumulator.getAverageStd: mean over dimensions of

    the per-dimension sample (n−1) standard deviation of the reps."""
    m = np.asarray(rep_list, dtype=np.float64)
    if len(m) < 2:
        return 0.0
    return float(np.sqrt(m.var(axis=0, ddof=1)).mean())


def cdbw_evaluate(reps: dict, centers: dict,
                  measure: str = "euclidean") -> dict:
    """{'intra_density', 'inter_density', 'separation', 'cdbw'} —

    CDbwEvaluator formulas on the collected representative points."""
    d = _np_dist(measure)
    cids = sorted(reps)
    stds = {c: _avg_std(reps[c]) for c in cids}
    # intra (eqn 5-7): global mean avg-std; rep counts within it of the
    # cluster center, each scaled by 1/std
    stdev = float(np.mean([stds[c] for c in cids]))
    intra_vals = []
    for c in cids:
        r = len(reps[c])
        sum_j = 0.0
        for rep in reps[c]:
            if d(np.asarray(centers[c], dtype=np.float64), rep) <= stdev:
                sum_j += 1.0 / stdev if stdev > 0 else np.nan
        intra_vals.append(sum_j / r)
    intra = float(np.mean([v for v in intra_vals if not np.isnan(v)]))
    # minimum rep-pair distance + its midpoint per cluster pair
    inter_vals, min_dist_sum = [], 0.0
    for i, ci in enumerate(cids):
        for cj in cids[i + 1:]:
            best, best_pair = np.inf, None
            for a in reps[ci]:
                for b in reps[cj]:
                    dd = d(a, b)
                    if dd < best:
                        best, best_pair = dd, (a, b)
            if np.isfinite(best):
                min_dist_sum += best * 2  # both triangle halves (:250)
            u = (best_pair[0] + best_pair[1]) / 2.0
            std_sum = stds[ci] + stds[cj]
            half = std_sum / 2.0
            n_close = sum(1.0 for rep in list(reps[ci]) + list(reps[cj])
                          if d(u, rep) <= half)
            density = n_close / (len(reps[ci]) + len(reps[cj]))
            inter = best * density / std_sum if std_sum > 0 else np.nan
            if not np.isnan(inter):
                inter_vals.append(inter)
    inter_density = float(np.mean(inter_vals)) if inter_vals else 0.0
    separation = min_dist_sum / (1.0 + inter_density)
    return {"intra_density": intra, "inter_density": inter_density,
            "separation": separation, "cdbw": intra * separation}


def _scaled_density(dists: list[float]) -> float:
    """(mean − min) / (max − min) (ClusterEvaluator:120,190)."""
    if not dists:
        return float("nan")
    lo, hi = min(dists), max(dists)
    if hi == lo:
        return float("nan")
    return (sum(dists) / len(dists) - lo) / (hi - lo)


def cluster_evaluator(reps: dict, centers: dict,
                      measure: str = "euclidean") -> dict:
    """{'inter_density', 'intra_density'} — ClusterEvaluator's scaled

    densities (inter over center pairs, intra over rep pairs per
    cluster, averaged with NaN skipped)."""
    d = _np_dist(measure)
    cids = sorted(reps)
    inter = _scaled_density(
        [d(np.asarray(centers[a], dtype=np.float64),
           np.asarray(centers[b], dtype=np.float64))
         for i, a in enumerate(cids) for b in cids[i + 1:]])
    intra_vals = []
    for c in cids:
        rs = reps[c]
        v = _scaled_density([d(rs[i], rs[j]) for i in range(len(rs))
                             for j in range(i + 1, len(rs))])
        if not np.isnan(v):
            intra_vals.append(v)
    intra = float(np.mean(intra_vals)) if intra_vals else 0.0
    return {"inter_density": float(inter), "intra_density": intra}
