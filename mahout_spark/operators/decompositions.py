"""Distributed decompositions over the triples DRM: dqrThin / dssvd /
dspca / dals.

Reference algorithms (studied, not copied — the reference is Scala over
RDD blocks; this is the same algebra over DataFrame triples):

- ``dqr_thin``   — math-scala/.../decompositions/DQR.scala:39-76:
  Cholesky of the in-core Gramian A'A, R = L', Q = A·R^{-1} distributed.
- ``dssvd``      — DSSVD.scala:44-100 (Halko/Martinsson/Tropp stochastic
  SVD): Y = A·Ω, Q = qr(Y).Q, B' = A'Q, q power iterations
  (Y = A·B', re-QR, re-B'), eigen(B'B in r×r) → Û, s = √d,
  U = Q·Û, V = B'·Û·diag(1/s).
- ``dspca``      — DSPCA.scala (PCA = SSVD of the column-centered matrix):
  identical pipeline with the rank-one centering −1ξ' carried as exact
  correction triples (never densifying A).
- ``dals``       — ALS.scala:91-163: alternating ridge solves
  V = A'U·(U'U+λI)^{-1}, U = A·V·(V'V+λI)^{-1}, RMSE-converged.
  (The reference's ``-: diag(λ)`` is the ridge term; λ=0 by default.)

Scale shape: every distributed intermediate is a skinny (· × r) triples
table; the only in-core objects are r×r / ncol×r-sliced matrices (r =
k+p « min(m,n)), matching the reference's drmBroadcast budget. RMSE in
``dals`` is computed SPARSELY (⟨A,UV'⟩ via joins + trace identity), not
by materializing A−UV' as the reference does — same value, no m×n blow-up.

Deviations (documented): the random matrices (Ω, ALS init) use
deterministic hash/seeded-NumPy draws rather than Mahout's
``Matrices.symmetricUniformView`` — any iid zero-mean family satisfies
the SSVD/ALS contracts; determinism is retry- and cluster-size-stable.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark.operators.drm import (TRIPLE_COLS, ab, ata_slim, atb,
                                        times_incore)


def dqr_thin(a: DataFrame, ncol: int,
             check_rank_deficiency: bool = True) -> tuple[DataFrame, np.ndarray]:
    """(Q drm, R in-core) — thin QR for tall-skinny A (DQR.scala:39-76).

    A'A must fit in memory (reference warns past ncol 5000); Q = A·R^{-1}
    is a broadcast in-core multiply, fully distributed.
    """
    if ncol > 5000:
        import warnings

        warnings.warn("A is too fat: A'A must fit in memory (DQR.scala:44)")
    gram = ata_slim(a, ncol)
    scale = float(np.max(np.diag(gram))) or 1.0
    try:
        low = np.linalg.cholesky(gram)
        # numerical chol can "succeed" on a singular PSD Gramian with
        # near-zero pivots; mirror the reference's isPositiveDefinite
        pos_def = float(np.min(np.diag(low)) ** 2) > 1e-12 * scale
    except np.linalg.LinAlgError:
        low, pos_def = None, False
    if not pos_def:
        if check_rank_deficiency:
            raise ValueError("R is rank-deficient (DQR.scala:57)")
        low = np.linalg.cholesky(gram + (1e-12 * scale) * np.eye(ncol))
    r_mat = low.T
    q = times_incore(a, np.linalg.inv(r_mat))
    return q, r_mat


def dssvd(a: DataFrame, nrow: int, ncol: int, k: int, p: int = 15,
          q: int = 0, seed: int = 1234) -> tuple[DataFrame, DataFrame, np.ndarray]:
    """(U drm m×k, V drm n×k, s[k]) — distributed stochastic SVD

    (DSSVD.scala:44-100). r = k+p columns of randomness; q power
    iterations sharpen the spectrum decay.
    """
    if k > min(nrow, ncol):
        raise ValueError("k cannot be greater than smaller of m, n")
    r = k + max(0, min(p, min(nrow, ncol) - k))
    rng = np.random.default_rng(seed)
    omega = rng.standard_normal((ncol, r))

    # the reference checkpoints Y/Q/B' between stages (DSSVD.scala:56-84);
    # localCheckpoint truncates the union-of-aggregates lineage the same way
    y = times_incore(a, omega).localCheckpoint()
    q_drm, _ = dqr_thin(y, r, check_rank_deficiency=False)
    q_drm = q_drm.localCheckpoint()
    bt = atb(a, q_drm).localCheckpoint()  # (ncol x r)
    for _ in range(q):
        y = ab(a, bt).localCheckpoint()
        q_drm, _ = dqr_thin(y, r, check_rank_deficiency=False)
        q_drm = q_drm.localCheckpoint()
        bt = atb(a, q_drm).localCheckpoint()

    bbt = ata_slim(bt, r)  # B·B' == (B')'·(B') in r×r
    d, u_hat = np.linalg.eigh(bbt)
    order = np.argsort(d)[::-1]
    d, u_hat = d[order], u_hat[:, order]
    s = np.sqrt(np.clip(d, 0.0, None))
    u = times_incore(q_drm, u_hat[:, :k])
    inv_s = np.where(s[:k] > 0, 1.0 / np.where(s[:k] > 0, s[:k], 1.0), 0.0)
    v = times_incore(bt, u_hat[:, :k] * inv_s[None, :])
    return u, v, s[:k]


def _rank_one_triples(keys: DataFrame, key_col: str,
                      vec: np.ndarray) -> DataFrame:
    """keys × r grid: (key, j, vec[j]) — exact rank-one correction triples

    (JVM posexplode of a literal array; no Python)."""
    arr = F.array(*[F.lit(float(x)) for x in vec])
    return keys.select(
        F.col(key_col).alias("row_id"),
        F.posexplode(arr).alias("col_id", "value")).select(
        "row_id", F.col("col_id").cast("long").alias("col_id"), "value")


def dspca(a: DataFrame, nrow: int, ncol: int, k: int, p: int = 15,
          q: int = 0, seed: int = 1234) -> tuple[DataFrame, DataFrame, np.ndarray]:
    """PCA via SSVD of the column-centered matrix Ac = A − 1ξ'

    (DSPCA.scala semantics). The centering is NEVER materialized into A:
    each product picks up its exact rank-one correction —
    Y = AΩ − 1(ξ'Ω), B' = A'Q − ξ(1'Q), A·B' − 1(ξ'B') — as correction
    triples unioned into the sum, so sparsity of A is preserved.
    """
    r = k + max(0, min(p, min(nrow, ncol) - k))
    rng = np.random.default_rng(seed)
    omega = rng.standard_normal((ncol, r))

    # column means xi (n-vector, in-core: ncol is the "narrow" dimension)
    xi = np.zeros(ncol)
    for row in (a.groupBy("col_id").agg(F.sum("value").alias("s"))
                .collect()):
        xi[int(row["col_id"])] = row["s"] / nrow
    rows = a.select("row_id").distinct()

    def centered_times(mat_in: np.ndarray, src: DataFrame) -> DataFrame:
        """(src − 1ξ')·M = src·M − 1·(ξ'M), exact via correction grid."""
        base = times_incore(src, mat_in)
        corr = _rank_one_triples(rows, "row_id", -(xi @ mat_in))
        return (base.unionByName(corr).groupBy("row_id", "col_id")
                .agg(F.sum("value").alias("value")).select(*TRIPLE_COLS))

    y = centered_times(omega, a).localCheckpoint()
    q_drm, _ = dqr_thin(y, r, check_rank_deficiency=False)
    q_drm = q_drm.localCheckpoint()

    def centered_bt(qd: DataFrame) -> DataFrame:
        """Ac'Q = A'Q − ξ(1'Q)."""
        base = atb(a, qd)
        col_sums_q = np.zeros(r)
        for row in (qd.groupBy("col_id").agg(F.sum("value").alias("s"))
                    .collect()):
            col_sums_q[int(row["col_id"])] = row["s"]
        xi_df = a.sparkSession.createDataFrame(
            [(int(j), float(xi[j])) for j in range(ncol) if xi[j] != 0.0],
            "row_id long, xi double")
        # correction = -outer(xi, 1'Q) as triples
        corr = (xi_df.select(
            "row_id", "xi",
            F.posexplode(F.array(*[F.lit(float(v)) for v in col_sums_q]))
            .alias("col_id", "__cs"))
            .select("row_id", F.col("col_id").cast("long").alias("col_id"),
                    (-F.col("xi") * F.col("__cs")).alias("value")))
        return (base.unionByName(corr.select(*TRIPLE_COLS))
                .groupBy("row_id", "col_id")
                .agg(F.sum("value").alias("value")).select(*TRIPLE_COLS))

    bt = centered_bt(q_drm).localCheckpoint()
    for _ in range(q):
        # Y = Ac·B' = A·B' − 1·(ξ'B')
        base = ab(a, bt)
        xi_bt = np.zeros(r)
        for row in (bt.withColumn("__xi", F.element_at(
                F.array(*[F.lit(float(v)) for v in xi]),
                F.col("row_id").cast("int") + 1))
                .groupBy("col_id")
                .agg(F.sum(F.col("value") * F.col("__xi")).alias("s"))
                .collect()):
            xi_bt[int(row["col_id"])] = row["s"]
        corr = _rank_one_triples(rows, "row_id", -xi_bt)
        y = (base.unionByName(corr).groupBy("row_id", "col_id")
             .agg(F.sum("value").alias("value")).select(*TRIPLE_COLS)
             .localCheckpoint())
        q_drm, _ = dqr_thin(y, r, check_rank_deficiency=False)
        q_drm = q_drm.localCheckpoint()
        bt = centered_bt(q_drm).localCheckpoint()

    bbt = ata_slim(bt, r)
    d, u_hat = np.linalg.eigh(bbt)
    order = np.argsort(d)[::-1]
    d, u_hat = d[order], u_hat[:, order]
    s = np.sqrt(np.clip(d, 0.0, None))
    u = times_incore(q_drm, u_hat[:, :k])
    inv_s = np.where(s[:k] > 0, 1.0 / np.where(s[:k] > 0, s[:k], 1.0), 0.0)
    v = times_incore(bt, u_hat[:, :k] * inv_s[None, :])
    return u, v, s[:k]


def dals(a: DataFrame, nrow: int, ncol: int, k: int = 50,
         lambda_: float = 0.0, max_iterations: int = 10,
         convergence_threshold: float = 0.10,
         seed: int = 1234) -> tuple[DataFrame, DataFrame, list[float]]:
    """(U m×k, V n×k, rmse per iteration) — distributed ALS

    (ALS.scala:91-163): V = A'U(U'U+λI)^{-1}, U = AV(V'V+λI)^{-1}.
    RMSE is computed sparsely: ‖A−UV'‖² = ‖A‖² − 2⟨A,UV'⟩ +
    tr((U'U)(V'V)); the inner product joins only A's nonzeros.
    """
    assert convergence_threshold < 1.0
    assert max_iterations >= 1
    # deterministic uniform(-1,1)*0.01 init per (row, j) — retry-stable
    rows = a.select("row_id").distinct()
    jcols = F.array(*[F.lit(j) for j in range(k)])
    coin = (F.pmod(F.xxhash64("row_id", "col_id", F.lit(seed)),
                   F.lit(1 << 24)).cast("double") / F.lit(float(1 << 24)))
    u = (rows.select("row_id", F.explode(jcols).alias("__j"))
         .withColumn("col_id", F.col("__j").cast("long"))
         .withColumn("value", (coin * 2.0 - 1.0) * 0.01)
         .select(*TRIPLE_COLS))

    a_ssq = a.agg(F.sum(F.col("value") * F.col("value")).alias("s")) \
        .first()["s"] or 0.0

    def _solve_side(src: DataFrame, factor: DataFrame) -> DataFrame:
        gram = ata_slim(factor, k) + lambda_ * np.eye(k)
        m_inv = np.linalg.inv(gram)
        return times_incore(atb(src, factor), m_inv)

    def _rmse(u_df: DataFrame, v_df: DataFrame) -> float:
        utu = ata_slim(u_df, k)
        vtv = ata_slim(v_df, k)
        # <A, UV'> = sum over A's nonzeros of a_ij * (u_i . v_j)
        au = (a.select(F.col("row_id").alias("__i"),
                       F.col("col_id").alias("__j"), "value")
              .join(u_df.select(F.col("row_id").alias("__i"),
                                F.col("col_id").alias("__k"),
                                F.col("value").alias("__u")), "__i"))
        inner = (au.join(v_df.select(F.col("row_id").alias("__j"),
                                     F.col("col_id").alias("__k"),
                                     F.col("value").alias("__v")),
                         ["__j", "__k"])
                 .agg(F.sum(F.col("value") * F.col("__u") * F.col("__v"))
                      .alias("s")).first()["s"]) or 0.0
        ssq = a_ssq - 2.0 * inner + float(np.trace(utu @ vtv))
        return math.sqrt(max(0.0, ssq) / (nrow * ncol))

    u = u.persist()
    v = None
    rmse_iters: list[float] = []
    a_t = a.select(F.col("col_id").alias("row_id"),
                   F.col("row_id").alias("col_id"), "value")
    for i in range(max_iterations):
        new_v = _solve_side(a, u).persist()  # V = (A'U)(U'U+λI)^-1
        if v is not None:
            v.unpersist()
        v = new_v
        new_u = _solve_side(a_t, v).persist()  # U = (AV)(V'V+λI)^-1
        u.unpersist()
        u = new_u
        if convergence_threshold > 0:
            rmse = _rmse(u, v)
            if rmse_iters:
                prev = rmse_iters[-1]
                conv = (prev - rmse) / prev if prev > 0 else 0.0
                rmse_iters.append(rmse)
                if conv < 0 or conv < convergence_threshold:
                    break
            else:
                rmse_iters.append(rmse)
    return u, v, rmse_iters
