"""Lanczos SVD + eigen verification — the reference's `svd`/`cleansvd`.

Closes the last algorithmic exclusion in the `bin/mahout` registry.
Reference anchors (studied, not copied):

  math/.../decomposer/lanczos/LanczosSolver.java:92-180 — the iteration:
    nextVector = corpus.timesSquared(current) (times() when symmetric);
    the FIRST next-vector's 2-norm becomes a global scale factor
    (overflow guard, header comment :44-55) and every next-vector is
    multiplied by its reciprocal; subtract beta*previous, alpha =
    current.dot(next), subtract alpha*current, then brute-force
    re-orthogonalization against every stored basis vector
    (orthoganalizeAgainstAllButLast:193-200 — the dot==0.0 skip
    included); beta = ||next||; tridiag gets alpha at (i-1,i-1) and
    beta at (i-1,i)/(i,i-1) only while i < rank-1 (the final beta is
    computed but never stored); out-of-range alpha/beta bails out.
  LanczosSolver.java:146-178 — eigen extraction: JAMA eigendecomposition
    of the rank×rank tridiagonal (ascending eigenvalues), each right
    singular vector = normalized basis combination, singular value =
    eigenvalue*scaleFactor (sqrt of that when not symmetric).
  mr/.../decomposer/DistributedLanczosSolver.java:67-70 — initial
    vector = dense 1/sqrt(ncol).
  mr/.../TimesSquaredJob.java — timesSquared as two passes over the
    triple matrix: u = X v per row, then w = X' u per column.
  math/.../decomposer/SimpleEigenVerifier.java:25-40 — eigenValue =
    |Xᵗ X v| / |v|, cosAngle = v̂·(XᵗXv) / newNorm * oldNorm (the Java
    precedence is (dot/newNorm)*oldNorm — replicated verbatim).
  mr/.../decomposer/EigenVerificationJob.java:219-268 — prune keeps
    |1 − cosAngle| < maxError and eigenValue > minEigenValue, sorts
    ASCENDING by eigenvalue (the comment says descending; the code's
    eg1.compareTo(eg2) does not — quirk replicated), then greedily
    appends the candidate minimizing Σ ||selected ⊙ candidate||₂ (the
    reference's element-wise `times(...).norm(2)` metric, replicated
    as written).

Spark shape: the Krylov basis is `desired_rank` driver vectors of size
ncol (the reference's LanczosState holds exactly the same — HDFS-backed
only for restart); every iteration costs ONE distributed timesSquared
pass (two shuffles over the triple DRM, nothing row-proportional on
the driver). ``seq_folds=True`` pins every dot/fold to a sequential
order (executor F.aggregate over sorted structs == driver Python fold
== DuckDB list_reduce), making a fixed iteration schedule bit-exact
across engines — the cg_solve gate convention, reused for the
``lanczos_tridiag`` gate.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark.operators.solver import EigenDecomposition, _seq_dot

SAFE_MAX = 1.0e150  # LanczosSolver.SAFE_MAX


def _dot(u, v, seq: bool) -> float:
    return _seq_dot(u, v) if seq else float(np.dot(u, v))


def _norm2(v, seq: bool) -> float:
    return math.sqrt(_dot(v, v, seq))


def _out_of_range(d: float) -> bool:
    return math.isnan(d) or d > SAFE_MAX or -d > SAFE_MAX


class LanczosState:
    """LanczosState.java twin: basis map, tridiagonal, scale factor,
    singular values + right singular vectors keyed by row."""

    def __init__(self, initial: np.ndarray, desired_rank: int):
        self.desired_rank = desired_rank
        self.basis: list[np.ndarray] = [
            np.asarray(initial, dtype=np.float64)]
        self.scale_factor = 0.0
        self.iteration = 1
        self.alphas: list[float] = []
        self.betas: list[float] = []   # every computed beta, in order
        self.singular_values: list[float] = []
        self.right_singular_vectors: list[np.ndarray] = []


def lanczos_solve(matvec, initial: np.ndarray, desired_rank: int,
                  symmetric: bool = False,
                  seq_folds: bool = False) -> LanczosState:
    """LanczosSolver.solve twin over any matvec v -> XᵗX v (or X v when
    ``symmetric`` — then ``matvec`` must BE the symmetric operator)."""
    st = LanczosState(initial, desired_rank)
    current = st.basis[0]
    previous = None
    beta = 0.0
    i = 1
    while i < desired_rank:
        nxt = np.asarray(matvec(current), dtype=np.float64)
        if st.scale_factor <= 0:
            st.scale_factor = _norm2(nxt, seq_folds)
        nxt = nxt * (1.0 / st.scale_factor)
        if previous is not None:
            nxt = nxt + previous * (-beta)
        alpha = _dot(current, nxt, seq_folds)
        nxt = nxt + current * (-alpha)
        for j in range(i):  # brute-force reorthogonalization
            d = _dot(nxt, st.basis[j], seq_folds)
            if d != 0.0:
                nxt = nxt + st.basis[j] * (-d)
        beta = _norm2(nxt, seq_folds)
        if _out_of_range(beta) or _out_of_range(alpha):
            break
        nxt = nxt * (1.0 / beta)
        st.basis.append(nxt)
        previous, current = current, nxt
        st.alphas.append(alpha)
        st.betas.append(beta)
        st.iteration = i = i + 1

    # tridiagonal exactly as the reference stores it: the final beta
    # (i == desired_rank - 1) is computed but NOT written
    k = desired_rank
    tri = np.zeros((k, k), dtype=np.float64)
    for idx, a in enumerate(st.alphas):
        tri[idx, idx] = a
    for idx, b in enumerate(st.betas[:max(0, len(st.alphas) - 1)]):
        tri[idx, idx + 1] = b
        tri[idx + 1, idx] = b
    decomp = EigenDecomposition(tri, symmetric=True)
    vects, vals = decomp.v, decomp.real_eigenvalues
    for row in range(st.iteration):
        ej = vects[:, row]
        size = min(len(ej), len(st.basis))
        real = np.zeros_like(st.basis[0])
        for j in range(size):
            real = real + st.basis[j] * ej[j]
        nrm = np.linalg.norm(real)
        real = real / nrm if nrm > 0 else real
        st.right_singular_vectors.append(real)
        e = vals[row] * st.scale_factor
        st.singular_values.append(math.sqrt(e) if not symmetric else e)
    return st


def spark_times_squared(a: DataFrame, v: np.ndarray, ncol: int,
                        seq_folds: bool = False) -> np.ndarray:
    """One distributed XᵗX v pass over a triple DRM (TimesSquaredJob
    shape): u = X v stays distributed; Xᵗ u is a row_id join + per-col
    agg; only the ncol result is collected. ``seq_folds`` pins both
    folds (col-sorted then row-sorted) for cross-engine bit parity."""
    xlit = F.array(*[F.lit(float(c)) for c in v])
    if seq_folds:
        rows = (a.groupBy("row_id")
                .agg(F.array_sort(
                    F.collect_list(F.struct("col_id", "value"))).alias("e")))
        u = rows.select(
            "row_id",
            F.aggregate(
                "e", F.lit(0.0),
                lambda acc, el: acc + el["value"] * F.element_at(
                    xlit, el["col_id"].cast("int") + 1)).alias("__d"))
        got = (a.join(u, "row_id")
               .groupBy("col_id")
               .agg(F.array_sort(F.collect_list(
                   F.struct("row_id", (F.col("value") * F.col("__d"))
                            .alias("t")))).alias("e"))
               .select("col_id",
                       F.aggregate("e", F.lit(0.0),
                                   lambda acc, el: acc + el["t"])
                       .alias("w"))
               .collect())
    else:
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
    return out


def initial_vector(ncol: int) -> np.ndarray:
    """DistributedLanczosSolver.getInitialVector: dense 1/sqrt(ncol)."""
    return np.full(ncol, 1.0 / math.sqrt(ncol), dtype=np.float64)


def lanczos_svd(a: DataFrame, ncol: int, desired_rank: int,
                symmetric: bool = False,
                seq_folds: bool = False) -> LanczosState:
    """DistributedLanczosSolver twin: Lanczos over the triple DRM with
    one distributed (timesSquared | times) pass per iteration."""
    if symmetric:
        from mahout_spark.operators.solver import spark_matvec

        def matvec(v):
            return spark_matvec(a, v, ncol, seq_folds=seq_folds)
    else:
        def matvec(v):
            return spark_times_squared(a, v, ncol, seq_folds=seq_folds)
    return lanczos_solve(matvec, initial_vector(ncol), desired_rank,
                         symmetric=symmetric, seq_folds=seq_folds)


# -- eigen verification (cleansvd) ---------------------------------------------


def verify_eigen(matvec, vector: np.ndarray) -> tuple[float, float]:
    """SimpleEigenVerifier.verify: (eigenValue, cosAngle) — including
    the reference's precedence quirk cosAngle = dot/newNorm*oldNorm
    (exact cosine for the unit vectors Lanczos emits)."""
    res = np.asarray(matvec(vector), dtype=np.float64)
    new_norm = float(np.linalg.norm(res))
    old_norm = float(np.linalg.norm(vector))
    if new_norm > 0 and old_norm > 0:
        eigen_value = new_norm / old_norm
        cos_angle = float(np.dot(res, vector)) / new_norm * old_norm
    else:
        eigen_value, cos_angle = 1.0, 0.0
    return eigen_value, cos_angle


def clean_eigens(matvec, vectors: list[np.ndarray],
                 max_error: float = 0.05, min_eigenvalue: float = 0.0
                 ) -> list[dict]:
    """EigenVerificationJob.pruneEigens twin: verify every vector with
    one matvec pass, keep |1 − cosAngle| < maxError and eigenValue >
    minEigenValue, sort ASCENDING by eigenvalue (reference quirk), then
    greedily append the candidate minimizing the reference's
    Σ ||selected ⊙ candidate||₂ element-wise metric. Returns dicts
    (index, eigen_value, cos_angle, vector) in selection order."""
    meta = []
    for idx, vec in enumerate(vectors):
        ev, cos = verify_eigen(matvec, vec)
        if abs(1 - cos) < max_error and ev > min_eigenvalue:
            meta.append({"index": idx, "eigen_value": ev,
                         "cos_angle": cos, "vector": np.asarray(vec)})
    if not meta:
        return []
    meta.sort(key=lambda m: m["eigen_value"])  # ascending (quirk)
    selected = [meta.pop(0)]
    while meta:
        best_i, best_sum = 0, float("inf")
        for i, cand in enumerate(meta):
            tmp = sum(float(np.linalg.norm(s["vector"] * cand["vector"]))
                      for s in selected)
            if tmp < best_sum:
                best_sum, best_i = tmp, i
        selected.append(meta.pop(best_i))
    return selected
