"""math/solver family: CG (in-core + distributed), LSMR, eigen.

Mirrors the reference's TestConjugateGradientSolver strategy (exact
solve residual, preconditioner changes the iteration count, early stop
by maxError and by maxIterations) on our own seeded SPD fixtures, plus
LSMR least-squares parity and the JAMA eigen contract A V = V D.
"""

import duckdb
import numpy as np
import pytest

from mahout_spark.operators.drm import drm_parallelize
from mahout_spark.operators.solver import (LSMR, ConjugateGradientSolver,
                                           EigenDecomposition,
                                           JacobiConditioner, cg_solve,
                                           cg_solve_normal, spark_matvec)


def _spd(n, seed=7, scale=None):
    rng = np.random.default_rng(seed)
    x = rng.integers(-3, 4, size=(n, n)).astype(float)
    a = x.T @ x + n * np.eye(n)
    if scale is not None:
        a = np.diag(scale) @ a @ np.diag(scale)
    return a


def _b(n, seed=11):
    return np.random.default_rng(seed).integers(1, 9, size=n).astype(float)


# -- in-core CG ----------------------------------------------------------------


def test_cg_solves_spd_system():
    a, b = _spd(10), _b(10)
    solver = ConjugateGradientSolver()
    x = solver.solve(a, b)
    assert np.linalg.norm(a @ x - b) < 1e-7
    assert solver.residual_norm <= 1e-9
    assert solver.iterations <= 12  # default budget n+2


def test_cg_matches_numpy_solve():
    a, b = _spd(8, seed=3), _b(8, seed=5)
    x = ConjugateGradientSolver().solve(a, b)
    assert np.allclose(x, np.linalg.solve(a, b), atol=1e-8)


def test_jacobi_preconditioner_on_badly_scaled_system():
    # diagonal scaling over 4 orders of magnitude: Jacobi provably helps
    n = 10
    scale = np.logspace(0, 2, n)
    a, b = _spd(n, seed=9, scale=scale), _b(n)
    plain = ConjugateGradientSolver()
    xp = plain.solve(a, b, max_iterations=300)
    cond = ConjugateGradientSolver()
    xc = cond.solve(a, b, JacobiConditioner(a), max_iterations=300)
    for x in (xp, xc):
        assert np.linalg.norm(a @ x - b) < 1e-6
    assert cond.iterations < plain.iterations


def test_cg_early_stop_by_error_and_by_iterations():
    a, b = _spd(10), _b(10)
    s1 = ConjugateGradientSolver()
    x1 = s1.solve(a, b, max_error=0.1)
    assert 1e-9 < np.linalg.norm(a @ x1 - b) <= 0.1
    assert s1.iterations < 10
    s2 = ConjugateGradientSolver()
    s2.solve(a, b, max_iterations=3)
    assert s2.iterations == 3


def test_cg_validates_inputs():
    with pytest.raises(ValueError):
        ConjugateGradientSolver().solve(np.ones((3, 2)), np.ones(2))
    with pytest.raises(ValueError):
        ConjugateGradientSolver().solve(np.eye(3), np.ones(2))
    with pytest.raises(ValueError):
        ConjugateGradientSolver().solve(np.eye(3), np.ones(3),
                                        max_iterations=0)
    with pytest.raises(ValueError):
        ConjugateGradientSolver().solve(np.eye(3), np.ones(3),
                                        max_error=-1.0)


def test_cg_seq_folds_deterministic_bits():
    a, b = _spd(6), _b(6)
    xs = [ConjugateGradientSolver(seq_folds=True)
          .solve(a, b, max_iterations=8, max_error=0.0) for _ in range(2)]
    assert (xs[0] == xs[1]).all()


# -- distributed CG ------------------------------------------------------------


def test_spark_matvec_matches_numpy(spark):
    a = _spd(7)
    drm = drm_parallelize(spark, a, n_partitions=3)
    v = _b(7, seed=2)
    assert np.allclose(spark_matvec(drm, v, 7), a @ v, atol=1e-12)
    # seq fold path: identical bits to the sequential in-core fold
    got = spark_matvec(drm, v, 7, seq_folds=True)
    want = np.array([sum([row[j] * v[j] for j in range(7)], 0.0)
                     for row in a])
    assert (got == want).all()


def test_distributed_cg_matches_incore(spark):
    a, b = _spd(8, seed=13), _b(8, seed=17)
    drm = drm_parallelize(spark, a, n_partitions=3)
    x = cg_solve(drm, b, 8)
    assert np.allclose(x, np.linalg.solve(a, b), atol=1e-7)
    assert cg_solve.residual_norm <= 1e-9


def test_distributed_cg_ridge(spark):
    a, b = _spd(6), _b(6)
    drm = drm_parallelize(spark, a, n_partitions=2)
    lam = 2.5
    x = cg_solve(drm, b, 6, ridge=lam)
    assert np.allclose(x, np.linalg.solve(a + lam * np.eye(6), b), atol=1e-7)


def test_cg_solve_normal_least_squares(spark):
    # tall system: solve A'A x = A'b without forming A'A
    rng = np.random.default_rng(23)
    a = rng.integers(-2, 3, size=(30, 5)).astype(float)
    y = rng.integers(1, 6, size=30).astype(float)
    drm = drm_parallelize(spark, a, n_partitions=4)
    b = a.T @ y
    x = cg_solve_normal(drm, b, 5)
    want, *_ = np.linalg.lstsq(a, y, rcond=None)
    assert np.allclose(x, want, atol=1e-6)


def test_cg_solve_normal_ridge_regression(spark):
    rng = np.random.default_rng(29)
    a = rng.integers(-2, 3, size=(25, 4)).astype(float)
    y = rng.integers(1, 6, size=25).astype(float)
    drm = drm_parallelize(spark, a, n_partitions=3)
    lam = 3.0
    x = cg_solve_normal(drm, a.T @ y, 4, ridge=lam)
    want = np.linalg.solve(a.T @ a + lam * np.eye(4), a.T @ y)
    assert np.allclose(x, want, atol=1e-7)


def test_distributed_cg_seq_matches_duckdb_replay(spark):
    """The gate form: fixed-iteration seq-fold CG replays bit-exactly
    in a DuckDB recursive CTE (left list_reduce == F.aggregate ==
    Python accumulation, operation for operation)."""
    n, k = 6, 8
    a, b = _spd(n), _b(n)
    drm = drm_parallelize(spark, a, n_partitions=2)
    x = cg_solve(drm, b, n, max_iterations=k, max_error=0.0,
                 seq_folds=True)

    al = ("CAST([" + ",".join(
        "[" + ",".join(repr(v) for v in row) + "]" for row in a)
        + "] AS DOUBLE[][])")
    bl = "CAST([" + ",".join(repr(v) for v in b) + "] AS DOUBLE[])"
    rng_ = f"range(1,{n + 1})"
    dot = ("list_reduce(list_transform(%s, i -> %s), (s,t) -> s + t)")
    q = f"""
    WITH RECURSIVE it AS (
      SELECT 0 AS k, CAST(list_transform({rng_}, i -> 0.0) AS DOUBLE[]) AS x,
             {bl} AS r, {bl} AS p,
             {dot % (rng_, f'({bl})[i]*({bl})[i]')} AS rs,
             CAST(NULL AS DOUBLE) AS prev
      UNION ALL
      SELECT k+1,
             CAST(list_transform({rng_}, i -> x[i] + alpha*p2[i]) AS DOUBLE[]),
             CAST(list_transform({rng_}, i -> r[i] - alpha*ap[i]) AS DOUBLE[]),
             p2,
             {dot % (rng_, '(r[i] - alpha*ap[i])*(r[i] - alpha*ap[i])')},
             rs
      FROM (
        SELECT *, rs / {dot % (rng_, 'p2[i]*ap[i]')} AS alpha
        FROM (
          SELECT *, CAST(list_transform({rng_}, i ->
                 list_reduce(list_transform({rng_}, j ->
                   ({al})[i][j]*p2[j]), (s,t) -> s + t)
               ) AS DOUBLE[]) AS ap
          FROM (
            SELECT *, CAST(CASE WHEN k=0 THEN r ELSE
                   list_transform({rng_}, i -> (rs/prev)*p[i] + r[i])
                 END AS DOUBLE[]) AS p2
            FROM it WHERE k < {k}
          )
        )
      )
    )
    SELECT x FROM it WHERE k = {k}
    """
    sql_x = np.array([float(v) for v in duckdb.sql(q).fetchone()[0]])
    assert (x == sql_x).all()


# -- LSMR ----------------------------------------------------------------------


def test_lsmr_consistent_square_system():
    a, b = _spd(8, seed=31), _b(8, seed=37)
    solver = LSMR()
    solver.a_tolerance = solver.b_tolerance = 1e-12
    solver.iteration_limit = 200
    x = solver.solve(a, b)
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-8
    assert solver.istop in (1, 4)
    assert solver.iteration <= 200


def test_lsmr_overdetermined_least_squares():
    rng = np.random.default_rng(41)
    a = rng.standard_normal((40, 6))
    b = rng.standard_normal(40)
    solver = LSMR()
    solver.a_tolerance = solver.b_tolerance = 1e-10
    solver.iteration_limit = 100
    x = solver.solve(a, b)
    want, *_ = np.linalg.lstsq(a, b, rcond=None)
    assert np.allclose(x, want, atol=1e-6)
    assert solver.istop in (2, 5)  # least-squares convergence
    # normal-equation residual really is small
    assert np.linalg.norm(a.T @ (b - a @ x)) < 1e-6


def test_lsmr_lambda_matches_augmented_system():
    rng = np.random.default_rng(43)
    a = rng.standard_normal((20, 5))
    b = rng.standard_normal(20)
    lam = 0.7
    solver = LSMR(lambda_value=lam)
    solver.a_tolerance = solver.b_tolerance = 1e-12
    solver.iteration_limit = 200
    x = solver.solve(a, b)
    aug = np.vstack([a, lam * np.eye(5)])
    want, *_ = np.linalg.lstsq(aug, np.concatenate([b, np.zeros(5)]),
                               rcond=None)
    assert np.allclose(x, want, atol=1e-6)


def test_lsmr_zero_rhs_and_iteration_limit():
    a = _spd(5)
    s = LSMR()
    x = s.solve(a, np.zeros(5))
    assert (x == 0).all() and s.istop == 0 and s.iteration == 0
    s2 = LSMR()
    s2.iteration_limit = 2
    s2.a_tolerance = s2.b_tolerance = 0.0
    s2.condition_limit = 0.0
    s2.solve(a, _b(5))
    assert s2.istop == 7 and s2.iteration == 2


def test_lsmr_local_reorthogonalization_converges():
    rng = np.random.default_rng(47)
    a = rng.standard_normal((30, 8)) * np.logspace(0, 3, 8)
    b = rng.standard_normal(30)
    s = LSMR()
    s.local_size = 10
    s.a_tolerance = s.b_tolerance = 1e-10
    s.iteration_limit = 300
    x = s.solve(a, b)
    want, *_ = np.linalg.lstsq(a, b, rcond=None)
    assert np.allclose(x, want, atol=1e-5)


def test_lsmr_diagnostics_estimates():
    a, b = _spd(7, seed=53), _b(7, seed=59)
    s = LSMR()
    s.iteration_limit = 100
    x = s.solve(a, b)
    assert abs(s.residual_norm - np.linalg.norm(b - a @ x)) < 1e-4
    assert s.a_norm <= np.linalg.norm(a, "fro") + 1e-9
    assert s.x_norm == pytest.approx(np.linalg.norm(x))
    assert s.condition >= 1.0


# -- eigendecomposition --------------------------------------------------------


def test_eigen_symmetric_contract():
    a = _spd(6, seed=61)
    e = EigenDecomposition(a)
    assert e.symmetric
    assert (np.diff(e.real_eigenvalues) >= 0).all()  # ascending (JAMA)
    assert (e.imag_eigenvalues == 0).all()
    assert np.allclose(a @ e.v, e.v @ e.d, atol=1e-9)
    assert np.allclose(e.v.T @ e.v, np.eye(6), atol=1e-9)


def test_eigen_nonsymmetric_complex_pairs():
    # rotation block: eigenvalues 1 +- 2i plus a real one
    a = np.array([[1.0, 2.0, 0.0], [-2.0, 1.0, 0.0], [0.0, 0.0, 3.0]])
    e = EigenDecomposition(a)
    assert not e.symmetric
    assert sorted(np.round(e.real_eigenvalues, 9)) == [1.0, 1.0, 3.0]
    assert sorted(np.round(e.imag_eigenvalues, 9)) == [-2.0, 0.0, 2.0]
    assert np.allclose(a @ e.v, e.v @ e.d, atol=1e-9)


def test_eigen_nonsymmetric_real_spectrum():
    rng = np.random.default_rng(67)
    # similar transform of a diagonal: real distinct eigenvalues
    d = np.diag([1.0, 2.0, 5.0, -3.0])
    p = rng.standard_normal((4, 4))
    a = p @ d @ np.linalg.inv(p)
    e = EigenDecomposition(a)
    assert np.allclose(sorted(e.real_eigenvalues), [-3, 1, 2, 5], atol=1e-8)
    assert np.allclose(a @ e.v, e.v @ e.d, atol=1e-7)


def test_eigen_rejects_nonsquare():
    with pytest.raises(ValueError):
        EigenDecomposition(np.ones((2, 3)))
