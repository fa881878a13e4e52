"""Distributed k-means over vector DataFrames (id, array<double>).

Reference anchors (studied, not copied):
- mr/.../clustering/kmeans/KMeansDriver.java:82-150 (driver loop:
  convergenceDelta, maxIterations, optional final classification pass)
- mr/.../clustering/kmeans/RandomSeedGenerator.java (seed centroids =
  k random input points; here a deterministic hash pick so every run
  and every retry chooses the same seeds)
- mr/.../clustering/kmeans/Kluster.java:88-95 (converged when
  distance(old center, new centroid) <= delta, per cluster)
- mr/.../clustering/iterator/CIMapper/CIReducer (one MR pass per
  iteration: assign + partial sums; here assignment is a pure Catalyst
  expression over literal centroids and the recompute is one
  posexplode + groupBy avg — map-side combined, one shuffle of
  k x dim x n_partitions partial rows)

Scale: per-iteration state is k x dim doubles on the driver (same
contract as MLlib KMeans); the data never leaves executors. Assignment
stays inside whole-stage codegen — no Python, no UDF.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist_expr(vec: Column, center: np.ndarray) -> Column:
    carr = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), carr,
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def assign_expr(vec: Column, centers: np.ndarray) -> Column:
    """struct(cluster int, dist2 double) — argmin over literal centroids,

    ties to the lowest cluster id (array_sort on (dist, id) structs, the
    IVF probe_cells_expr shape). Pure Catalyst: the per-iteration
    centroid state is inlined as literals, identical on every executor.
    """
    entries = [F.struct(_sq_dist_expr(vec, c).alias("d"),
                        F.lit(i).alias("c"))
               for i, c in enumerate(centers)]
    best = F.array_sort(F.array(*entries))[0]
    return F.struct(best["c"].alias("cluster"), best["d"].alias("dist2"))


def kmeans_seed_centers(points: DataFrame, k: int, seed: int = 42,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """(k, dim) seed centroids — the k input points with the smallest

    xxhash64(id, seed): RandomSeedGenerator's 'k random points' made
    deterministic and distributed (a top-k by hash, no driver sampling).
    """
    rows = (points
            .select(F.col(vec_col).cast("array<double>").alias("v"),
                    F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"))
            .orderBy("__h").limit(k).collect())
    if len(rows) < k:
        raise ValueError(f"need at least k={k} points, got {len(rows)}")
    return np.array([r["v"] for r in rows], dtype=np.float64)


class KMeansModel:
    def __init__(self, centers: np.ndarray, iterations: int,
                 converged: bool, cost: float):
        self.centers = centers
        self.iterations = iterations
        self.converged = converged
        self.cost = cost  # sum of squared distances at the final assignment

    def assign(self, points: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
        """(id, cluster, dist2) — the final classification pass

        (KMeansDriver runClustering)."""
        a = assign_expr(F.col(vec_col), self.centers)
        return points.select(F.col(id_col), a.alias("__a")) \
            .select(id_col, "__a.cluster", "__a.dist2")


def kmeans(points: DataFrame, k: int, max_iterations: int = 20,
           convergence_delta: float = 1e-4, seed: int = 42,
           id_col: str = "vec_id", vec_col: str = "embedding",
           init_centers: np.ndarray | None = None) -> KMeansModel:
    """Lloyd's k-means: deterministic hash-seeded init, Catalyst argmin

    assignment, centroid recompute via posexplode + groupBy avg (one
    shuffle per iteration, k x dim result). Converged when EVERY center
    moves <= convergence_delta in euclidean distance (Kluster semantics).
    Empty clusters keep their previous center (reference clusters simply
    don't observe points).
    """
    pts = points.select(F.col(id_col).alias("__id"),
                        F.col(vec_col).cast("array<double>").alias("__v"))
    pts = pts.persist()
    centers = (np.asarray(init_centers, dtype=np.float64)
               if init_centers is not None
               else kmeans_seed_centers(pts, k, seed, "__id", "__v"))
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        a = assign_expr(F.col("__v"), centers)
        assigned = pts.select("__v", a["cluster"].alias("__c"))
        agg = (assigned
               .select("__c", F.posexplode("__v").alias("__j", "__x"))
               .groupBy("__c", "__j")
               .agg(F.sum("__x").alias("s"), F.count("*").alias("n"))
               .collect())
        new_centers = centers.copy()
        for r in agg:
            new_centers[r["__c"], r["__j"]] = r["s"] / r["n"]
        moves = np.linalg.norm(new_centers - centers, axis=1)
        centers = new_centers
        if float(moves.max()) <= convergence_delta:
            converged = True
            break
    a = assign_expr(F.col("__v"), centers)
    cost = pts.select(a["dist2"].alias("d")).agg(F.sum("d")).first()[0]
    pts.unpersist()
    return KMeansModel(centers, it, converged, float(cost or 0.0))


def kmeans_assign_sql(table: str, centers: np.ndarray,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_dp: int = 6) -> str:
    """DuckDB twin of KMeansModel.assign at FIXED centroids (gate oracle):

    same argmin + lowest-id tie-break, squared euclidean.
    """
    dist_exprs = []
    for i, c in enumerate(centers):
        lit = "[" + ", ".join(repr(float(x)) for x in c) + "]"
        dist_exprs.append(
            f"list_sum(list_transform(list_zip({vec_col}::DOUBLE[], "
            f"{lit}::DOUBLE[]), p -> (p[1] - p[2]) * (p[1] - p[2])))")
    structs = ", ".join(
        f"{{'d': {d}, 'c': {i}}}" for i, d in enumerate(dist_exprs))
    return f"""
SELECT {id_col},
       best['c']::INT AS cluster,
       round(best['d'], {round_dp}) AS dist2
FROM (SELECT {id_col}, list_sort([{structs}])[1] AS best FROM {table})
"""
