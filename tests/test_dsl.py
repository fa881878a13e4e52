"""R-Like DSL wrapper tests (mahout_spark/dsl.py) — expression parity

vs NumPy and rewrite dispatch (A.t @ A -> ata, double-transpose
elimination), mirroring RLikeDrmOpsSuite's norm(diff) assertions."""

import numpy as np
import pytest

from mahout_spark.dsl import Drm, drm_from_numpy, drm_wrap


@pytest.fixture(scope="module")
def mats(spark):
    rng = np.random.default_rng(11)
    A = np.round(rng.uniform(-3, 3, (12, 5)), 1)
    B = np.round(rng.uniform(-3, 3, (12, 5)), 1)
    # keep zero entries out so triple representation is exact under
    # elementwise division
    A[A == 0] = 1.0
    B[B == 0] = 1.0
    return A, B, drm_from_numpy(spark, A), drm_from_numpy(spark, B)


def _close(drm, want, tol=1e-10):
    got = drm.collect()
    assert np.linalg.norm(got - want) < tol, (got, want)


def test_matmul_rewrites(mats):
    A, B, dA, dB = mats
    _close(dA.t @ dA, A.T @ A)            # OpAtA fast path
    _close(dA.t @ dB, A.T @ B)            # OpAtB
    _close(dA @ dB.t, A @ B.T)            # OpABt
    _close(dA @ (dA.t @ dA), A @ (A.T @ A))   # OpAB after OpAtA
    assert (dA.t).t is dA                 # double-transpose elimination
    _close(dA @ np.ones((5, 2)), A @ np.ones((5, 2)))  # TimesRightMatrix


def test_elementwise_and_scalars(mats):
    A, B, dA, dB = mats
    _close(dA + dB, A + B)
    _close(dA - dB, A - B)
    _close(dA * dB, A * B)
    _close(dA / dB, A / B)
    _close((dA * 2.0) + 1.5, A * 2.0 + 1.5)
    _close(3 * dA, 3 * A)
    _close(dA.apply("abs"), np.abs(A))


def test_structure_ops(mats):
    A, B, dA, dB = mats
    _close(dA[2:7, 1:4], A[2:7, 1:4])
    _close(dA.cbind(dB), np.hstack([A, B]))
    _close(dA.cbind(1.0), np.hstack([A, np.ones((12, 1))]))
    _close(dA.rbind(dB), np.vstack([A, B]))


def test_reductions_and_lifecycle(mats, spark):
    A, _, dA, _ = mats
    cs = {r["col_id"]: r["value"] for r in dA.col_sums().collect()}
    assert np.allclose([cs[j] for j in range(5)], A.sum(axis=0))
    rm = {r["row_id"]: r["value"] for r in dA.row_means().collect()}
    assert np.allclose([rm[i] for i in range(12)], A.mean(axis=1))
    assert dA.norm() == pytest.approx(np.linalg.norm(A))
    chk = (dA.t @ dA).checkpoint()
    _close(chk @ drm_from_numpy(spark, np.eye(5)), A.T @ A)
    # drm_wrap adopts plain triple frames
    wrapped = drm_wrap(dA.df, nrow=12, ncol=5)
    _close(wrapped, A)


def test_map_block(mats):
    A, _, dA, _ = mats

    def double(keys, block):
        return keys, block * 2.0

    _close(dA.map_block(double), A * 2.0)


def test_open_ended_slices(mats):
    A, _, dA, _ = mats
    _close(dA[2:, :], A[2:, :])
    _close(dA[:, 1:], A[:, 1:])
    _close(dA[3:, 2:], A[3:, 2:])
    _close(dA[:5, :], A[:5, :])
    _close(dA[2:, 1:4], A[2:, 1:4])
