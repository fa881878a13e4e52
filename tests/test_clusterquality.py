"""RepresentativePoints + CDbw + ClusterEvaluator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.clusterquality import (cdbw_evaluate,
                                                   cluster_evaluator,
                                                   representative_points)


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(9)
    a = rng.normal((0, 0), 0.4, size=(60, 2))
    b = rng.normal((8, 8), 0.4, size=(60, 2))
    rows = ([(i, v.tolist(), 0) for i, v in enumerate(a)]
            + [(100 + i, v.tolist(), 1) for i, v in enumerate(b)])
    pts = spark.createDataFrame(
        rows, "vec_id long, vector array<double>, cluster int")
    centers = {0: a.mean(axis=0), 1: b.mean(axis=0)}
    return pts.persist(), centers, a, b


def test_representative_points_semantics(spark, blobs):
    pts, centers, a, b = blobs
    reps = representative_points(pts, centers, n_iterations=2)
    # center + one point per iteration
    assert len(reps[0]) == 3 and len(reps[1]) == 3
    assert np.allclose(reps[0][0], centers[0])
    # iteration 1 must pick the point farthest from the center (sum over
    # the single rep = plain distance)
    d = np.linalg.norm(a - centers[0], axis=1)
    far = a[int(np.argmax(d))]
    assert np.allclose(reps[0][1], far)
    # all reps belong to their own blob (well-separated data)
    for r in reps[0][1:]:
        assert np.linalg.norm(r - centers[0]) < 4.0
    for r in reps[1][1:]:
        assert np.linalg.norm(r - centers[1]) < 4.0


def test_representative_points_deterministic(spark, blobs):
    pts, centers, *_ = blobs
    r1 = representative_points(pts.repartition(5), centers, 2)
    r2 = representative_points(pts.repartition(2, "vec_id"), centers, 2)
    for c in r1:
        assert np.array_equal(np.asarray(r1[c]), np.asarray(r2[c]))


def test_cdbw_prefers_separated_clusters(spark, blobs):
    pts, centers, a, b = blobs
    reps = representative_points(pts, centers, n_iterations=3)
    good = cdbw_evaluate(reps, centers)
    assert good["cdbw"] > 0 and good["separation"] > 0
    # squash the clusters together: same shape, tiny separation
    shift = b - (8, 8) + (0.8, 0.8)
    rows = ([(i, v.tolist(), 0) for i, v in enumerate(a)]
            + [(100 + i, v.tolist(), 1) for i, v in enumerate(shift)])
    pts2 = pts.sparkSession.createDataFrame(
        rows, "vec_id long, vector array<double>, cluster int")
    centers2 = {0: a.mean(axis=0), 1: shift.mean(axis=0)}
    reps2 = representative_points(pts2, centers2, n_iterations=3)
    bad = cdbw_evaluate(reps2, centers2)
    assert good["separation"] > bad["separation"]
    assert good["cdbw"] > bad["cdbw"]


def test_cluster_evaluator_scaled_densities(spark, blobs):
    pts, centers, *_ = blobs
    reps = representative_points(pts, centers, n_iterations=3)
    out = cluster_evaluator(reps, centers)
    # with 2 clusters there is ONE center distance: max==min -> NaN
    assert np.isnan(out["inter_density"])
    assert 0.0 <= out["intra_density"] <= 1.0
    # three clusters give a finite scaled inter density
    centers3 = {0: np.array([0.0, 0.0]), 1: np.array([8.0, 8.0]),
                2: np.array([0.0, 3.0])}
    reps3 = {c: [v, v + 0.1, v + 0.2] for c, v in centers3.items()}
    out3 = cluster_evaluator(reps3, centers3)
    assert 0.0 <= out3["inter_density"] <= 1.0


def test_cdbw_intra_density_hand_case():
    # two clusters, reps exactly at center + within-std ring
    centers = {0: np.array([0.0, 0.0]), 1: np.array([10.0, 0.0])}
    reps = {0: [np.array([0.0, 0.0]), np.array([1.0, 0.0]),
                np.array([-1.0, 0.0])],
            1: [np.array([10.0, 0.0]), np.array([11.0, 0.0]),
                np.array([9.0, 0.0])]}
    out = cdbw_evaluate(reps, centers)
    # per-cluster avg std: x-dim sample std = 1, y-dim 0 -> 0.5; the
    # global mean stdev is 0.5. Reps within 0.5 of the center: only the
    # center rep -> sum_j = 1/0.5 = 2; intra per cluster = 2/3.
    assert out["intra_density"] == pytest.approx(2.0 / 3.0, abs=1e-12)
