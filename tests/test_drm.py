"""DRM algebra vs in-core NumPy oracle — the reference's own test strategy

(every RLikeDrmOpsSuite computes the same algebra in-core and asserts
norm(diff) < 1e-10; SURVEY.md §5)."""

import numpy as np
import pytest

from mahout_spark.operators import drm as D

RNG = np.random.default_rng(7)


def sparse_matrix(nrow, ncol, density=0.4, seed=1):
    rng = np.random.default_rng(seed)
    m = rng.random((nrow, ncol))
    m[rng.random((nrow, ncol)) > density] = 0.0
    return np.round(m * 10)  # integral values -> exact float sums


@pytest.fixture(scope="module")
def mats(spark):
    a = sparse_matrix(12, 7, seed=1)
    b = sparse_matrix(12, 7, seed=2)
    return {"a": a, "b": b,
            "da": D.drm_parallelize(spark, a, 3),
            "db": D.drm_parallelize(spark, b, 3)}


def close(got, want, tol=1e-10):
    assert np.linalg.norm(got - want) < tol, (got, want)


def test_transpose(mats):
    close(D.drm_collect(D.at(mats["da"]), 7, 12), mats["a"].T)


def test_ata(mats):
    close(D.drm_collect(D.ata(mats["da"]), 7, 7), mats["a"].T @ mats["a"])


def test_ata_slim_matches_distributed(mats):
    close(D.ata_slim(mats["da"], 7), mats["a"].T @ mats["a"])


def test_atb(mats):
    close(D.drm_collect(D.atb(mats["da"], mats["db"]), 7, 7),
          mats["a"].T @ mats["b"])


def test_abt(mats):
    close(D.drm_collect(D.abt(mats["da"], mats["db"]), 12, 12),
          mats["a"] @ mats["b"].T)


def test_ab(mats):
    close(D.drm_collect(D.ab(mats["da"], D.at(mats["db"])), 12, 12),
          mats["a"] @ mats["b"].T)


def test_pairwise_inner_products_orthonormality(spark, mats):
    # OrthonormalityVerifier: Gram of the rows; an orthonormal basis
    # verifies as the identity
    close(D.drm_collect(D.pairwise_inner_products(mats["da"]), 12, 12),
          mats["a"] @ mats["a"].T)
    q, _ = np.linalg.qr(np.random.default_rng(3).standard_normal((6, 6)))
    dq = D.drm_parallelize(spark, q, 2)
    close(D.drm_collect(D.pairwise_inner_products(dq), 6, 6), np.eye(6))


def test_ax_atx(mats):
    x = np.arange(1.0, 8.0)
    close(D.drm_collect(D.ax(mats["da"], x), 12, 1).ravel(), mats["a"] @ x)
    y = np.arange(1.0, 13.0)
    close(D.drm_collect(D.atx(mats["da"], y), 7, 1).ravel(), mats["a"].T @ y)


def test_times_incore(mats):
    b = np.round(RNG.random((7, 3)) * 5)
    close(D.drm_collect(D.times_incore(mats["da"], b), 12, 3), mats["a"] @ b)


def test_aew_b(mats):
    a, b = mats["a"], mats["b"]
    close(D.drm_collect(D.aew_b(mats["da"], mats["db"], "+"), 12, 7), a + b)
    close(D.drm_collect(D.aew_b(mats["da"], mats["db"], "-"), 12, 7), a - b)
    close(D.drm_collect(D.aew_b(mats["da"], mats["db"], "*"), 12, 7), a * b)


def test_aew_scalar_unary(mats):
    a = mats["a"]
    close(D.drm_collect(D.aew_scalar(mats["da"], "*", 2.0), 12, 7), a * 2)
    # unary on nonzero cells only (sparse semantics, evalZeros=False)
    want = np.where(a != 0, np.sqrt(a), 0.0)
    close(D.drm_collect(D.aew_unary(mats["da"], "sqrt"), 12, 7), want)


def test_cbind_rbind_slicing(mats):
    a, b = mats["a"], mats["b"]
    close(D.drm_collect(D.cbind(mats["da"], mats["db"], 7), 12, 14),
          np.hstack([a, b]))
    close(D.drm_collect(D.rbind(mats["da"], mats["db"], 12), 24, 7),
          np.vstack([a, b]))
    close(D.drm_collect(D.row_range(mats["da"], 2, 5), 12, 7)[2:5],
          a[2:5])
    csc = D.drm_collect(D.cbind_scalar(mats["da"], 7, 5.0), 12, 8)
    close(csc[:, :7], a)
    # all-zero rows are absent from the sparse DRM (canHaveMissingRows,
    # DrmLike.scala:34) — the scalar column appears only on present rows
    present = (a != 0).any(axis=1)
    assert (csc[present, 7] == 5.0).all()
    assert (csc[~present, 7] == 0.0).all()


def test_aggregates(mats):
    a = mats["a"]
    present = np.where((a != 0).any(axis=1))[0]
    close(np.array([r["value"] for r in D.col_sums(mats["da"])
                    .orderBy("col_id").collect()]), a.sum(axis=0))
    close(np.array([r["value"] for r in D.row_sums(mats["da"])
                    .orderBy("row_id").collect()]), a.sum(axis=1)[present])
    close(np.array([r["value"] for r in D.col_means(mats["da"], 12)
                    .orderBy("col_id").collect()]), a.mean(axis=0))
    close(np.array([r["value"] for r in D.nnz_per_column(mats["da"])
                    .orderBy("col_id").collect()]),
          (a != 0).sum(axis=0).astype(float))
    assert abs(D.frobenius_norm(mats["da"]) - np.linalg.norm(a)) < 1e-10


def test_col_mean_vars(mats):
    a = mats["a"]
    rows = D.col_mean_vars(mats["da"], 12).orderBy("col_id").collect()
    close(np.array([r["mean"] for r in rows]), a.mean(axis=0))
    close(np.array([r["var"] for r in rows]), a.var(axis=0), tol=1e-9)


def test_diagv_roundtrip(spark, mats):
    v = np.array([3.0, 0.0, 2.5, -1.0, 4.0])
    d = D.diagv(spark, v, 2)
    close(D.drm_collect(d, 5, 5), np.diag(v))
    back = np.zeros(5)
    for r in D.diag_of(d).collect():
        back[int(r["col_id"])] = r["value"]
    close(back, v)


def test_dcol_mean_cov(mats):
    a = mats["a"]
    mu_df, cov_drm = D.dcol_mean_cov(mats["da"], 12)
    mu = np.zeros(7)
    for r in mu_df.collect():
        mu[int(r["col_id"])] = r["value"]
    close(mu, a.mean(axis=0))
    want = (a.T @ a) / 12.0 - np.outer(a.mean(axis=0), a.mean(axis=0))
    close(D.drm_collect(cov_drm, 7, 7), want, tol=1e-9)
    mu2, cov2 = D.dcol_mean_cov_thin(mats["da"], 7, 12)
    close(mu2, a.mean(axis=0))
    close(cov2, want, tol=1e-9)


def test_dsq_dist(mats):
    a = mats["a"]
    present = (a != 0).any(axis=1)
    want = ((a[:, None, :] - a[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(want, 0.0)
    want[~present, :] = 0.0
    want[:, ~present] = 0.0  # absent rows don't appear in the sparse DRM
    got = D.drm_collect(D.dsq_dist(mats["da"]), 12, 12)
    close(got, want, tol=1e-8)


def test_rekey_and_sampling(spark, mats):
    pdf = mats["da"].toPandas()
    pdf["row_id"] = pdf["row_id"].map(lambda i: f"row-{i:03d}")
    sdf = spark.createDataFrame(pdf)
    rekeyed, keymap = D.rekey_seq_ints(sdf)
    n_present = sdf.select("row_id").distinct().count()
    ids = sorted(r["row_id"] for r in
                 rekeyed.select("row_id").distinct().collect())
    assert ids == list(range(n_present))

    s1 = D.sample_rows(mats["da"], 0.5, seed=3)
    s2 = D.sample_rows(mats["da"], 0.5, seed=3)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    k = D.sample_k_rows(mats["da"], 4, seed=3)
    assert k.select("row_id").distinct().count() == 4


def test_map_block(mats):
    # block fn: scale by 3 — mapBlock contract (keys, block) -> (keys, block)
    got = D.drm_collect(D.map_block(
        mats["da"], 7, lambda keys, blk: (keys, blk * 3.0)), 12, 7)
    close(got, mats["a"] * 3.0)
