"""Decompositions vs in-core NumPy oracles — the reference's own test
strategy (math-scala/.../DistributedDecompositionsSuiteBase.scala:
norm(A - QR) / svd reconstruction / pca reconstruction / ALS rmse)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.decompositions import (dals, dqr_thin, dspca,
                                                   dssvd)
from mahout_spark.operators.drm import drm_parallelize


def _collect(drm, nrow, ncol):
    out = np.zeros((nrow, ncol))
    for r in drm.collect():
        out[int(r["row_id"]), int(r["col_id"])] = r["value"]
    return out


@pytest.fixture(scope="module")
def dense_a():
    rng = np.random.default_rng(42)
    return rng.standard_normal((60, 8))


def test_dqr_thin(spark, dense_a):
    a = drm_parallelize(spark, dense_a)
    q_drm, r_mat = dqr_thin(a, dense_a.shape[1])
    q = _collect(q_drm, *dense_a.shape)
    # Q'Q == I and A == QR (DQR contract)
    assert np.abs(q.T @ q - np.eye(dense_a.shape[1])).max() < 1e-10
    assert np.abs(q @ r_mat - dense_a).max() < 1e-10
    # R upper triangular
    assert np.abs(np.tril(r_mat, -1)).max() < 1e-12


def test_dqr_rank_deficiency(spark):
    m = np.zeros((10, 3))
    m[:, 0] = np.arange(10)
    m[:, 1] = 2 * m[:, 0]  # linearly dependent
    m[:, 2] = np.random.default_rng(1).standard_normal(10)
    a = drm_parallelize(spark, m)
    with pytest.raises(ValueError, match="rank-deficient"):
        dqr_thin(a, 3)


def test_dssvd_exact_on_lowrank(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 3)) @ rng.standard_normal((3, 12))
    a = drm_parallelize(spark, base)
    u_drm, v_drm, s = dssvd(a, 40, 12, k=3, p=5, q=1, seed=99)
    u = _collect(u_drm, 40, 3)
    v = _collect(v_drm, 12, 3)
    # reconstruction exact for rank-3 input with k=3
    recon = u @ np.diag(s) @ v.T
    assert np.abs(recon - base).max() < 1e-8
    # singular values match numpy
    s_np = np.linalg.svd(base, compute_uv=False)[:3]
    assert np.abs(s - s_np).max() < 1e-8
    # U, V orthonormal
    assert np.abs(u.T @ u - np.eye(3)).max() < 1e-8
    assert np.abs(v.T @ v - np.eye(3)).max() < 1e-8


def test_dspca_matches_numpy_pca(spark):
    rng = np.random.default_rng(11)
    base = (rng.standard_normal((50, 3)) @ rng.standard_normal((3, 10))
            + 5.0 * rng.standard_normal(10)[None, :])  # shifted columns
    a = drm_parallelize(spark, base)
    u_drm, v_drm, s = dspca(a, 50, 10, k=3, p=5, q=1, seed=123)
    centered = base - base.mean(axis=0, keepdims=True)
    s_np = np.linalg.svd(centered, compute_uv=False)[:3]
    assert np.abs(s - s_np).max() < 1e-7
    u = _collect(u_drm, 50, 3)
    v = _collect(v_drm, 10, 3)
    recon = u @ np.diag(s) @ v.T
    assert np.abs(recon - centered).max() < 1e-7


def test_dals_converges(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 4)) @ rng.standard_normal((4, 20))
    a = drm_parallelize(spark, base)
    u_drm, v_drm, rmse = dals(a, 30, 20, k=4, lambda_=0.0,
                              max_iterations=12,
                              convergence_threshold=0.001, seed=5)
    assert len(rmse) >= 1
    # monotone non-increasing up to float noise (reference warns on
    # increase; at machine-zero rmse the clamp max(0, ssq) jitters ~1e-8)
    for prev, cur in zip(rmse, rmse[1:]):
        assert cur <= prev + 1e-6
    u = _collect(u_drm, 30, 4)
    v = _collect(v_drm, 20, 4)
    # rank-4 matrix factorized by k=4 ALS: near-exact reconstruction
    assert np.abs(u @ v.T - base).max() < 1e-4
