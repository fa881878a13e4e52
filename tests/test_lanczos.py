"""Lanczos SVD + cleansvd (operators/lanczos.py).

Oracle strategy: the in-core solver is checked against numpy SVD /
eigh on small dense matrices (full reorthogonalization at full rank
recovers the spectrum); the distributed twin is pinned bit-exact to an
in-core replay that uses the same fold orders; the verifier/cleaner is
checked on deliberately corrupted eigenvectors.
"""

import math

import numpy as np
import pytest

from mahout_spark.operators.lanczos import (clean_eigens, initial_vector,
                                            lanczos_solve, lanczos_svd,
                                            spark_times_squared,
                                            verify_eigen)


def _rect(m=12, n=6, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(m, n)) + 0.5


def _ts_matvec(x):
    return lambda v: x.T @ (x @ v)


def test_singular_values_match_numpy():
    x = _rect()
    k = x.shape[1]
    st = lanczos_solve(_ts_matvec(x), initial_vector(k), k + 1)
    got = sorted(st.singular_values, reverse=True)[:k - 1]
    want = sorted(np.linalg.svd(x, compute_uv=False), reverse=True)
    # top singular values converge tightly at full rank
    assert np.allclose(got[:3], want[:3], rtol=1e-6)


def test_right_singular_vectors_are_svd_directions():
    x = _rect()
    k = x.shape[1]
    st = lanczos_solve(_ts_matvec(x), initial_vector(k), k + 1)
    _, _, vt = np.linalg.svd(x)
    # match the top vector up to sign
    top = st.right_singular_vectors[
        int(np.argmax(st.singular_values))]
    assert abs(abs(np.dot(top, vt[0])) - 1.0) < 1e-6


def test_symmetric_path_eigenvalues():
    a = np.array([[4.0, 1.0, 0.0], [1.0, 3.0, 1.0], [0.0, 1.0, 2.0]])
    st = lanczos_solve(lambda v: a @ v, initial_vector(3), 4,
                       symmetric=True)
    got = sorted(st.singular_values, reverse=True)[:2]
    want = sorted(np.linalg.eigvalsh(a), reverse=True)[:2]
    assert np.allclose(got, want, rtol=1e-8)


def test_scale_factor_bounds_spectrum():
    # the scale factor is the first timesSquared norm; eigenvalues of
    # the SCALED operator stay <= ~1 (the overflow guard's purpose)
    x = _rect() * 1e3
    k = x.shape[1]
    st = lanczos_solve(_ts_matvec(x), initial_vector(k), k + 1)
    assert st.scale_factor > 0
    assert max(st.alphas) <= 1.5  # scaled operator has norm ~<= 1


def test_tridiag_last_beta_not_stored():
    x = _rect()
    k = 4
    st = lanczos_solve(_ts_matvec(x), initial_vector(x.shape[1]), k)
    # k-1 iterations -> k-1 alphas and betas computed; the reference
    # stores only the first k-2 betas in the tridiagonal
    assert len(st.alphas) == k - 1 and len(st.betas) == k - 1


def test_distributed_equals_incore_bit_exact(spark):
    x = np.arange(1, 25, dtype=np.float64).reshape(8, 3) % 7 + 1
    triples = [(i, j, float(x[i, j]))
               for i in range(8) for j in range(3)]
    drm = spark.createDataFrame(
        triples, "row_id long, col_id long, value double")
    st_d = lanczos_svd(drm, 3, 4, seq_folds=True)

    def seq_ts(v):
        # the EXACT fold orders spark_times_squared(seq_folds) uses
        u = np.zeros(8)
        for r in range(8):
            s = 0.0
            for c in range(3):
                s = s + x[r, c] * v[c]
            u[r] = s
        w = np.zeros(3)
        for c in range(3):
            s = 0.0
            for r in range(8):
                s = s + x[r, c] * u[r]
            w[c] = s
        return w

    st_i = lanczos_solve(seq_ts, initial_vector(3), 4, seq_folds=True)
    assert st_d.alphas == st_i.alphas
    assert st_d.betas == st_i.betas
    assert st_d.singular_values == st_i.singular_values


def test_spark_times_squared_fast_close(spark):
    x = _rect(10, 4)
    triples = [(i, j, float(x[i, j]))
               for i in range(10) for j in range(4)]
    drm = spark.createDataFrame(
        triples, "row_id long, col_id long, value double")
    v = np.arange(1.0, 5.0)
    got = spark_times_squared(drm, v, 4)
    assert np.allclose(got, x.T @ (x @ v))


def test_verify_eigen_quirk_and_clean():
    x = _rect()
    k = x.shape[1]
    st = lanczos_solve(_ts_matvec(x), initial_vector(k), k + 1)
    mv = _ts_matvec(x)
    # true eigenvectors verify with cosAngle ~ 1
    order = np.argsort(st.singular_values)[::-1]
    good = [st.right_singular_vectors[i] for i in order[:3]]
    for g in good:
        ev, cos = verify_eigen(mv, g)
        assert abs(1 - cos) < 1e-8 and ev > 0
    # a corrupted vector has cosAngle far from 1 -> dropped
    rng = np.random.default_rng(0)
    bad = rng.normal(size=k)
    bad /= np.linalg.norm(bad)
    _, cos_bad = verify_eigen(mv, bad)
    assert abs(1 - cos_bad) > 0.05
    kept = clean_eigens(mv, good + [bad], max_error=0.05)
    assert len(kept) == 3
    assert all(abs(1 - m["cos_angle"]) < 0.05 for m in kept)
    # ascending-eigenvalue first element (the reference's sort quirk)
    assert kept[0]["eigen_value"] == min(m["eigen_value"] for m in kept)


def test_clean_eigens_min_eigenvalue_filter():
    x = _rect()
    k = x.shape[1]
    st = lanczos_solve(_ts_matvec(x), initial_vector(k), k + 1)
    mv = _ts_matvec(x)
    order = np.argsort(st.singular_values)[::-1]
    vs = [st.right_singular_vectors[i] for i in order[:4]]
    evs = sorted(verify_eigen(mv, v)[0] for v in vs)
    kept = clean_eigens(mv, vs, max_error=0.05,
                        min_eigenvalue=evs[1] + 1e-12)
    assert len(kept) == 2


def test_zero_vector_verify_contract():
    ev, cos = verify_eigen(lambda v: np.zeros_like(v), np.zeros(4))
    assert (ev, cos) == (1.0, 0.0)
