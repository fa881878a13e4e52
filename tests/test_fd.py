"""Frequent-directions matrix sketch: the published bound (two-sided:
PSD + Frobenius-loss ceiling), exact regime below ell, mergeability
under fold and balanced trees, serialization, distributed build vs
in-core replay, bound certification on the embeddings table."""

import numpy as np
import pytest

from mahout_spark.core.fd import FrequentDirections
from mahout_spark.sketch.fd import fd_ata, fd_sketch


def _rand(n, d, seed):
    return np.random.default_rng(seed).standard_normal((n, d))


def _check_bound(a: np.ndarray, fd: FrequentDirections):
    diff = a.T @ a - fd.ata()
    eig = np.linalg.eigvalsh(diff)
    cert = fd.spectral_bound()
    assert eig.min() >= -1e-8 * max(1.0, abs(eig).max())   # AᵗA ⪰ BᵗB
    assert eig.max() <= cert + 1e-8 * max(1.0, cert)       # certified
    # a-priori ceiling of the doubling variant
    assert cert <= (a * a).sum() / fd.ell + 1e-8


def test_exact_below_ell():
    a = _rand(10, 6, 1)
    fd = FrequentDirections(ell=16, dim=6)
    fd.update_batch(a)
    assert np.allclose(fd.ata(), a.T @ a)
    assert fd.spectral_bound() <= 1e-9


def test_bound_holds_after_many_shrinks():
    a = _rand(500, 12, 2)
    fd = FrequentDirections(ell=8, dim=12)
    for lo in range(0, 500, 37):     # uneven batches
        fd.update_batch(a[lo:lo + 37])
    assert fd.spectral_bound() > 0   # it really did shrink
    _check_bound(a, fd)


def test_low_rank_input_recovered_nearly_exactly():
    # rank-3 matrix, ell=8 > rank: FD captures it almost losslessly
    rng = np.random.default_rng(3)
    a = rng.standard_normal((400, 3)) @ rng.standard_normal((3, 20))
    fd = FrequentDirections(ell=8, dim=20)
    fd.update_batch(a)
    rel = (np.linalg.norm(a.T @ a - fd.ata(), 2)
           / np.linalg.norm(a.T @ a, 2))
    assert rel < 0.05


def test_merge_bound_fold_and_tree():
    a = _rand(300, 10, 4)
    parts = [a[i::4] for i in range(4)]
    sks = []
    for p in parts:
        s = FrequentDirections(ell=8, dim=10)
        s.update_batch(p)
        sks.append(s)
    fold = sks[0].merge(sks[1]).merge(sks[2]).merge(sks[3])
    tree = sks[0].merge(sks[1]).merge(sks[2].merge(sks[3]))
    for m in (fold, tree):
        assert m.fnorm2 == pytest.approx((a * a).sum())
        _check_bound(a, m)


def test_merge_config_mismatch():
    with pytest.raises(ValueError):
        FrequentDirections(8, 4).merge(FrequentDirections(8, 5))
    with pytest.raises(ValueError):
        FrequentDirections(8, 4).merge(FrequentDirections(16, 4))


def test_serialize_roundtrip():
    a = _rand(100, 7, 5)
    fd = FrequentDirections(ell=6, dim=7)
    fd.update_batch(a)
    back = FrequentDirections.deserialize(fd.serialize())
    assert back.fnorm2 == fd.fnorm2 and back.n_rows == fd.n_rows
    assert back.delta_sum == fd.delta_sum
    assert np.array_equal(back.b, fd.b)
    with pytest.raises(ValueError):
        FrequentDirections.deserialize(b"garbage")
    with pytest.raises(ValueError):
        FrequentDirections.deserialize(fd.serialize()[:-8])


def test_distributed_build_bound(spark):
    a = _rand(600, 16, 6)
    df = spark.createDataFrame(
        [(i, a[i].tolist()) for i in range(600)],
        "vec_id long, embedding array<double>").repartition(8)
    fd = fd_sketch(df, "embedding", ell=12, dim=16, n_merge=4)
    assert fd.fnorm2 == pytest.approx((a * a).sum())
    _check_bound(a, fd)
    ata, cert = fd_ata(df, "embedding", ell=12, dim=16)
    assert cert <= (a * a).sum() / 12 + 1e-8


def test_distributed_on_testdata(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fd = fd_sketch(emb, "embedding", ell=16, dim=64)
    a = np.stack([np.array(r["embedding"], dtype=np.float64)
                  for r in emb.collect()])
    assert fd.fnorm2 == pytest.approx((a * a).sum(), rel=1e-9)
    _check_bound(a, fd)
