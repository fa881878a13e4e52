"""Iterative linear solvers + eigendecomposition (math/solver family).

Reference anchors (studied, not copied):
  math/.../solver/ConjugateGradientSolver.java:57-215 — standard +
    preconditioned CG; x0 = 0; terminates when sqrt(r.r) <= maxError or
    maxIterations reached; defaults maxError 1e-9, iterations = size+2;
    exposes getIterations()/getResidualNorm().
  math/.../solver/Preconditioner.java, JacobiConditioner.java:28-45 —
    precondition(v); Jacobi = elementwise multiply by inv(diag(A)).
  math/.../solver/LSMR.java:86-560 — Fong & Saunders LSMR (SIAM 2011)
    with lambda ridge, aTolerance/bTolerance/conditionLimit stops,
    iterationLimit, optional local reorthogonalization of the last
    localSize v-vectors, istop codes 0-7, and running estimates of
    ||r||, ||A'r||, ||A||_F, cond(A), ||x||.
  math/.../solver/EigenDecomposition.java — JAMA-lineage symmetric
    tridiagonal-QL and nonsymmetric Hessenberg-QR; here LAPACK (via
    numpy.linalg) supplies the same (V, D) contract: A.V = V.D with D
    block-diagonal (2x2 rotation blocks for complex pairs).
  mr/.../solver/DistributedConjugateGradientSolver.java:42-76 — the
    same CG loop where each a.times(v) is one distributed pass;
    TimesSquaredJob.TimesMapper (TimesSquaredJob.java:212-222) emits
    out[row] = row . v (one value per row, no cross-row reduce) and
    TimesSquaredMapper (190-199) accumulates sum_rows (row.v) row for
    the normal-equation operator.

Spark-first shape
-----------------
A matvec against a broadcast vector is embarrassingly parallel:
out[i] = row_i . x needs only a per-row sum after a literal-array
lookup (the drm.ax plan), so a CG iteration is ONE distributed pass
with O(n) driver state — the bounded-driver-aggregate posture every
other iterative operator here uses.  The normal-equation operator
(A'A v without forming A'A) stays fully distributed: the row-dot
vector u = A v is never collected; A' u is a row_id join + per-column
sum, and only the final n_col-sized vector reaches the driver.

``seq_folds=True`` switches every dot product — executor-side row
folds AND driver-side scalar updates — to sequential left-to-right
IEEE-754 folds.  With a fixed iteration count the whole solve is then
bit-reproducible and DuckDB can replay it with a recursive CTE over
list columns (the ``cg_solve`` gate): left list_reduce == Spark
F.aggregate == a Python accumulation loop, operation for operation.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ERROR = 1.0e-9


def _seq_dot(u, v) -> float:
    """Left-to-right sequential dot — the bit-reproducible fold."""
    s = 0.0
    for a, b in zip(u, v):
        s = s + float(a) * float(b)
    return s


class JacobiConditioner:
    """inv(diag(A)) preconditioner (JacobiConditioner.java:28-45)."""

    def __init__(self, a: np.ndarray):
        a = np.asarray(a, dtype=np.float64)
        if a.shape[0] != a.shape[1]:
            raise ValueError("Matrix must be square.")
        self.inverse_diagonal = 1.0 / np.diag(a)

    def precondition(self, v: np.ndarray) -> np.ndarray:
        return v * self.inverse_diagonal


class ConjugateGradientSolver:
    """CG for SPD systems Ax = b (ConjugateGradientSolver.java:57-215).

    ``a`` may be a dense ndarray or a matvec callable v -> A v (the
    VectorIterable contract the distributed wrapper plugs into).
    ``seq_folds`` makes every dot product a sequential fold so a fixed
    iteration schedule is bit-reproducible across engines.
    """

    def __init__(self, seq_folds: bool = False):
        self.iterations = 0
        self.residual_norm_squared = float("nan")
        self._seq = seq_folds

    def _dot(self, u, v) -> float:
        return _seq_dot(u, v) if self._seq else float(np.dot(u, v))

    @property
    def residual_norm(self) -> float:
        return math.sqrt(self.residual_norm_squared)

    def solve(self, a, b: np.ndarray, preconditioner=None,
              max_iterations: int | None = None,
              max_error: float = DEFAULT_MAX_ERROR) -> np.ndarray:
        b = np.asarray(b, dtype=np.float64)
        if callable(a):
            matvec = a
        else:
            a = np.asarray(a, dtype=np.float64)
            if a.shape[0] != a.shape[1]:
                raise ValueError(
                    "Matrix must be square, symmetric and positive definite.")
            if a.shape[1] != b.shape[0]:
                raise ValueError(f"cardinality: {a.shape[1]} != {b.shape[0]}")
            matvec = a.dot if not self._seq else (
                lambda v, _m=a: np.array([_seq_dot(row, v) for row in _m]))
        if max_iterations is None:
            max_iterations = b.shape[0] + 2
        if max_iterations <= 0:
            raise ValueError("Max iterations must be positive.")
        if max_error < 0.0:
            raise ValueError("Max error must be non-negative.")

        x = np.zeros_like(b)
        self.iterations = 0
        residual = b - matvec(x)
        self.residual_norm_squared = self._dot(residual, residual)

        previous_conditioned = 0.0
        p = None
        while (math.sqrt(self.residual_norm_squared) > max_error
               and self.iterations < max_iterations):
            if preconditioner is None:
                z = residual
                conditioned = self.residual_norm_squared
            else:
                z = preconditioner.precondition(residual)
                conditioned = self._dot(residual, z)

            self.iterations += 1
            if self.iterations == 1:
                p = z.copy()
            else:
                beta = conditioned / previous_conditioned
                # p = beta * p + z, elementwise (PlusMult order; IEEE
                # addition is commutative so beta*p[i] + z[i] is exact)
                p = beta * p + z

            ap = matvec(p)
            alpha = conditioned / self._dot(p, ap)
            x = x + alpha * p
            residual = residual - alpha * ap
            previous_conditioned = conditioned
            self.residual_norm_squared = self._dot(residual, residual)
        return x


# -- distributed matvecs -------------------------------------------------------


def spark_matvec(a: DataFrame, x: np.ndarray, n: int,
                 seq_folds: bool = False) -> np.ndarray:
    """One distributed pass out[i] = row_i . x over a triple DRM.

    TimesMapper shape: one value per row, no cross-row reduce.  With
    ``seq_folds`` each row folds its (col-sorted) elements sequentially
    (F.aggregate) so the result is bit-deterministic; default is the
    commutative F.sum (fast path — order-free up to float association).
    """
    xlit = F.array(*[F.lit(float(v)) for v in x])
    if seq_folds:
        rows = (a.groupBy("row_id")
                .agg(F.array_sort(
                    F.collect_list(F.struct("col_id", "value"))).alias("e")))
        dot = F.aggregate(
            "e", F.lit(0.0),
            lambda acc, el: acc + el["value"] * F.element_at(
                xlit, el["col_id"].cast("int") + 1))
        got = rows.select("row_id", dot.alias("d")).collect()
    else:
        got = (a.withColumn(
                   "__x", F.element_at(xlit, F.col("col_id").cast("int") + 1))
               .groupBy("row_id")
               .agg(F.sum(F.col("value") * F.col("__x")).alias("d"))
               .collect())
    out = np.zeros(n, dtype=np.float64)
    for r in got:
        out[int(r["row_id"])] = float(r["d"])
    return out


def cg_solve(a: DataFrame, b: np.ndarray, n: int, preconditioner=None,
             max_iterations: int | None = None,
             max_error: float = DEFAULT_MAX_ERROR,
             ridge: float = 0.0,
             seq_folds: bool = False) -> np.ndarray:
    """Distributed CG over a square symmetric triple DRM.

    Solves (A + ridge*I) x = b — the DistributedConjugateGradientSolver
    contract (runJob, DistributedConjugateGradientSolver.java:42-76):
    the in-core loop with the matvec swapped for one distributed pass
    per iteration.  Driver state is three n-vectors.
    """
    solver = ConjugateGradientSolver(seq_folds=seq_folds)

    def matvec(v: np.ndarray) -> np.ndarray:
        out = spark_matvec(a, v, n, seq_folds=seq_folds)
        if ridge != 0.0:
            out = out + ridge * v
        return out

    x = solver.solve(matvec, b, preconditioner=preconditioner,
                     max_iterations=max_iterations, max_error=max_error)
    cg_solve.iterations = solver.iterations
    cg_solve.residual_norm = solver.residual_norm
    return x


def cg_solve_normal(a: DataFrame, b: np.ndarray, ncol: int,
                    max_iterations: int | None = None,
                    max_error: float = DEFAULT_MAX_ERROR,
                    ridge: float = 0.0) -> np.ndarray:
    """CG on the normal equations (A'A + ridge*I) x = b, A never squared.

    The reference's "one pass through A" extension (header comment,
    ConjugateGradientSolver.java:33-37; TimesSquaredMapper shape): the
    row-dot vector u = A v stays DISTRIBUTED (it is num_rows long — at
    corpus scale it must never reach the driver); A' u is a row_id join
    back onto A plus a per-column sum, and only the ncol-sized result
    is collected.  Minimizes ||Ax - b'|| for any b in col space; with
    ridge > 0 this is exactly ridge regression.
    """
    solver = ConjugateGradientSolver()

    def matvec(v: np.ndarray) -> np.ndarray:
        xlit = F.array(*[F.lit(float(c)) for c in v])
        u = (a.withColumn(
                 "__x", F.element_at(xlit, F.col("col_id").cast("int") + 1))
             .groupBy("row_id")
             .agg(F.sum(F.col("value") * F.col("__x")).alias("__d")))
        got = (a.join(u, "row_id")
               .groupBy("col_id")
               .agg(F.sum(F.col("value") * F.col("__d")).alias("w"))
               .collect())
        out = np.zeros(ncol, dtype=np.float64)
        for r in got:
            out[int(r["col_id"])] = float(r["w"])
        if ridge != 0.0:
            out = out + ridge * v
        return out

    x = solver.solve(matvec, b, max_iterations=max_iterations,
                     max_error=max_error)
    cg_solve_normal.iterations = solver.iterations
    cg_solve_normal.residual_norm = solver.residual_norm
    return x


# -- LSMR ----------------------------------------------------------------------


class LSMR:
    """LSMR least-squares solver (LSMR.java:86-560; Fong & Saunders,
    SIAM J. Sci. Comput. 33(5), 2011 — written from the published
    algorithm, Golub-Kahan bidiagonalization + two QR sweeps).

    min ||b - A x||_2, optionally regularized by ``lambda_value``
    (solves the stacked [A; lambda*I] system).  Termination mirrors the
    reference: istop 1/2 on the atol/btol backward-error tests, 3 on
    the condition-limit, 4-6 the machine-precision variants, 7 on the
    iteration limit, 0 when b = 0 (x = 0 is the solution).
    ``local_size`` > 0 reorthogonalizes each new v against the last
    local_size v-vectors (the reference's localSize).
    """

    def __init__(self, lambda_value: float = 0.0):
        self.lambda_value = float(lambda_value)
        self.a_tolerance = 1.0e-6
        self.b_tolerance = 1.0e-6
        self.condition_limit = 1.0e8
        self.iteration_limit: int | None = None
        self.local_size = 0
        # result diagnostics
        self.iteration = 0
        self.istop = 0
        self.residual_norm = 0.0
        self.normal_equation_residual = 0.0
        self.a_norm = 0.0
        self.condition = 0.0
        self.x_norm = 0.0

    def solve(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        m, n = a.shape
        itn_limit = self.iteration_limit or min(m, n)
        lam = self.lambda_value
        ctol = 1.0 / self.condition_limit if self.condition_limit > 0 else 0.0

        u = b.copy()
        normb = float(np.linalg.norm(b))
        beta = normb
        if beta > 0:
            u = u / beta
        v = a.T @ u
        alpha = float(np.linalg.norm(v))
        if alpha > 0:
            v = v / alpha

        x = np.zeros(n)
        self.iteration = 0
        self.istop = 0
        self.residual_norm = beta
        self.normal_equation_residual = alpha * beta
        if self.normal_equation_residual == 0.0:
            # b = 0 or A'b = 0: x = 0 solves the problem exactly
            self.a_norm = 0.0
            self.condition = 0.0
            self.x_norm = 0.0
            return x

        # rotation state
        zetabar = alpha * beta
        alphabar = alpha
        rho = rhobar = cbar = 1.0
        sbar = 0.0
        h = v.copy()
        hbar = np.zeros(n)
        # residual-norm recurrence (paper section 5.4)
        betadd = beta
        betad = 0.0
        rhodold = 1.0
        tautildeold = thetatilde = zeta = d = 0.0
        # norm/cond estimates
        norm_a2 = alpha * alpha
        maxrbar = 0.0
        minrbar = 1.0e100

        local_v: list[np.ndarray] = []

        while self.iteration < itn_limit and self.istop == 0:
            self.iteration += 1

            # Golub-Kahan step
            u = a @ v - alpha * u
            beta = float(np.linalg.norm(u))
            if beta > 0:
                u = u / beta
                v = a.T @ u - beta * v
                if self.local_size > 0:
                    for vk in local_v:
                        v = v - float(np.dot(vk, v)) * vk
                alpha = float(np.linalg.norm(v))
                if alpha > 0:
                    v = v / alpha
                if self.local_size > 0:
                    local_v.append(v.copy())
                    if len(local_v) > self.local_size:
                        local_v.pop(0)

            # fold the regularization into alphabar
            alphahat = math.hypot(alphabar, lam)
            chat = alphabar / alphahat if alphahat != 0 else 1.0
            shat = lam / alphahat if alphahat != 0 else 0.0

            # plane rotation eliminating beta
            rhoold = rho
            rho = math.hypot(alphahat, beta)
            c = alphahat / rho
            s = beta / rho
            thetanew = s * alpha
            alphabar = c * alpha

            # second rotation (the bar system)
            rhobarold = rhobar
            zetaold = zeta
            thetabar = sbar * rho
            rhotemp = cbar * rho
            rhobar = math.hypot(cbar * rho, thetanew)
            cbar = cbar * rho / rhobar
            sbar = thetanew / rhobar
            zeta = cbar * zetabar
            zetabar = -sbar * zetabar

            # update h, hbar, x
            hbar = h - (thetabar * rho / (rhoold * rhobarold)) * hbar
            x = x + (zeta / (rho * rhobar)) * hbar
            h = v - (thetanew / rho) * h

            # residual-norm estimate
            betaacute = chat * betadd
            betacheck = -shat * betadd
            betahat = c * betaacute
            betadd = -s * betaacute
            thetatildeold = thetatilde
            rhotildeold = math.hypot(rhodold, thetabar)
            ctildeold = rhodold / rhotildeold
            stildeold = thetabar / rhotildeold
            thetatilde = stildeold * rhobar
            rhodold = ctildeold * rhobar
            betad = -stildeold * betad + ctildeold * betahat
            tautildeold = ((zetaold - thetatildeold * tautildeold)
                           / rhotildeold)
            taud = (zeta - thetatilde * tautildeold) / rhodold
            d = d + betacheck * betacheck
            self.residual_norm = math.sqrt(
                d + (betad - taud) ** 2 + betadd * betadd)

            norm_a2 = norm_a2 + beta * beta
            self.a_norm = math.sqrt(norm_a2)
            norm_a2 = norm_a2 + alpha * alpha
            maxrbar = max(maxrbar, rhobarold)
            if self.iteration > 1:
                minrbar = min(minrbar, rhobarold)
            self.condition = (max(maxrbar, rhotemp)
                              / min(minrbar, rhotemp))

            self.normal_equation_residual = abs(zetabar)
            self.x_norm = float(np.linalg.norm(x))

            # convergence tests (reference order: iteration limit and
            # the eps variants first, then the user tolerances)
            test1 = self.residual_norm / normb if normb > 0 else 0.0
            test2 = (self.normal_equation_residual
                     / (self.a_norm * self.residual_norm)
                     if self.a_norm * self.residual_norm > 0 else 0.0)
            test3 = 1.0 / self.condition
            t1 = test1 / (1.0 + self.a_norm * self.x_norm / normb)
            rtol = (self.b_tolerance
                    + self.a_tolerance * self.a_norm * self.x_norm / normb)

            if self.iteration >= itn_limit:
                self.istop = 7
            if 1.0 + test3 <= 1.0:
                self.istop = 6
            if 1.0 + test2 <= 1.0:
                self.istop = 5
            if 1.0 + t1 <= 1.0:
                self.istop = 4
            if test3 <= ctol:
                self.istop = 3
            if test2 <= self.a_tolerance:
                self.istop = 2
            if test1 <= rtol:
                self.istop = 1
        return x


# -- eigendecomposition --------------------------------------------------------


class EigenDecomposition:
    """Eigen decomposition A V = V D (EigenDecomposition.java; JAMA
    contract, LAPACK arithmetic via numpy.linalg).

    Symmetric input (exact A == A'): real ascending eigenvalues and an
    orthonormal V (eigh — the tridiagonal-QL result up to sign).
    Nonsymmetric: possibly complex pairs; D is the real block-diagonal
    matrix with 2x2 [[re, im], [-im, re]] rotation blocks and V the
    matching real basis, so A V = V D holds in real arithmetic.
    """

    def __init__(self, a: np.ndarray, symmetric: bool | None = None):
        a = np.asarray(a, dtype=np.float64)
        if a.shape[0] != a.shape[1]:
            raise ValueError("Matrix must be square.")
        n = a.shape[0]
        if symmetric is None:
            symmetric = bool(np.array_equal(a, a.T))
        self.symmetric = symmetric
        if symmetric:
            w, vmat = np.linalg.eigh(a)
            self.real_eigenvalues = w
            self.imag_eigenvalues = np.zeros(n)
            self.v = vmat
        else:
            w, vc = np.linalg.eig(a)
            # deterministic order: by (real, imag); conjugate pairs stay
            # adjacent with the +imag member first
            order = np.lexsort((-w.imag, w.real))
            w, vc = w[order], vc[:, order]
            self.real_eigenvalues = w.real.copy()
            self.imag_eigenvalues = w.imag.copy()
            v = np.zeros((n, n))
            j = 0
            while j < n:
                if abs(w[j].imag) > 0 and j + 1 < n:
                    v[:, j] = vc[:, j].real
                    v[:, j + 1] = vc[:, j].imag
                    j += 2
                else:
                    v[:, j] = vc[:, j].real
                    j += 1
            self.v = v

    @property
    def d(self) -> np.ndarray:
        n = self.real_eigenvalues.shape[0]
        dm = np.diag(self.real_eigenvalues).astype(np.float64)
        for i in range(n):
            im = self.imag_eigenvalues[i]
            if im > 0:
                dm[i, i + 1] = im
            elif im < 0:
                dm[i, i - 1] = im
        return dm
