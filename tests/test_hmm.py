"""HMM: brute-force path-enumeration oracles for forward/backward/

Viterbi, trainer goldens, distributed-vs-incore parity (reference
semantics in operators/hmm.py docstring)."""

import itertools
import math

import numpy as np
import pytest

from mahout_spark.operators.hmm import (HmmModel, backward,
                                        baum_welch_frame, forward,
                                        model_likelihood, train_baum_welch,
                                        train_supervised,
                                        train_supervised_frame,
                                        train_viterbi, viterbi,
                                        viterbi_decode_frame)


@pytest.fixture
def model():
    a = np.array([[0.7, 0.2, 0.1], [0.1, 0.6, 0.3], [0.3, 0.3, 0.4]])
    b = np.array([[0.8, 0.1, 0.1], [0.2, 0.5, 0.3], [0.1, 0.2, 0.7]])
    pi = np.array([0.5, 0.3, 0.2])
    return HmmModel(a, b, pi)


OBS = np.array([0, 1, 2, 0, 1])


def _path_prob(m, path, obs):
    p = m.pi[path[0]] * m.b[path[0], obs[0]]
    for t in range(1, len(obs)):
        p *= m.a[path[t - 1], path[t]] * m.b[path[t], obs[t]]
    return p


def test_forward_likelihood_matches_enumeration(model):
    want = sum(_path_prob(model, p, OBS) for p in
               itertools.product(range(3), repeat=len(OBS)))
    alpha = forward(model, OBS)
    assert math.isclose(model_likelihood(alpha), want, rel_tol=1e-12)


def test_scaled_forward_matches_unscaled(model):
    lik = model_likelihood(forward(model, OBS))
    log_lik = model_likelihood(forward(model, OBS, scaled=True),
                               scaled=True)
    assert math.isclose(log_lik, math.log(lik), rel_tol=1e-10)


def test_backward_gives_same_likelihood(model):
    beta = backward(model, OBS)
    lik = float((model.pi * model.b[:, OBS[0]] * beta[0]).sum())
    assert math.isclose(lik, model_likelihood(forward(model, OBS)),
                        rel_tol=1e-12)


def test_scaled_backward_matches_unscaled(model):
    b_lin = backward(model, OBS)
    b_log = backward(model, OBS, scaled=True)
    assert np.allclose(np.exp(b_log), b_lin, rtol=1e-10)


def test_viterbi_matches_enumeration(model):
    best, best_p = None, -1.0
    for p in itertools.product(range(3), repeat=len(OBS)):
        pp = _path_prob(model, p, OBS)
        if pp > best_p:
            best, best_p = p, pp
    assert tuple(viterbi(model, OBS)) == best
    assert tuple(viterbi(model, OBS, scaled=True)) == best


def test_train_supervised_golden():
    # one sequence: hidden 0->1->1, obs 0,1,1; pseudo-count 1
    m = train_supervised(2, 2, [[0, 1, 1]], [[0, 1, 1]], pseudo_count=1.0)
    # transitions: 0->1 once, 1->1 once (+1 everywhere)
    assert np.allclose(m.a, [[1 / 3, 2 / 3], [1 / 3, 2 / 3]])
    # emissions: (0,obs0) once, (1,obs1) twice
    assert np.allclose(m.b, [[2 / 3, 1 / 3], [1 / 4, 3 / 4]])
    assert np.allclose(m.pi, [2 / 3, 1 / 3])


def test_train_viterbi_improves_likelihood(model):
    rng = np.random.default_rng(0)
    obs = rng.integers(0, 3, 40)
    out = train_viterbi(model, obs, max_iterations=5)
    before = model_likelihood(forward(model, obs, True), True)
    after = model_likelihood(forward(out, obs, True), True)
    assert after > before


def test_baum_welch_monotone_likelihood(model):
    rng = np.random.default_rng(1)
    obs = rng.integers(0, 3, 30)
    cur, liks = model, []
    for _ in range(4):
        cur = train_baum_welch(cur, obs, epsilon=0.0, max_iterations=1)
        liks.append(model_likelihood(forward(cur, obs, True), True))
    assert all(b >= a - 1e-9 for a, b in zip(liks, liks[1:]))


def test_train_supervised_frame_matches_incore(spark):
    rng = np.random.default_rng(5)
    hidden = [rng.integers(0, 3, rng.integers(3, 8)).tolist()
              for _ in range(20)]
    obs = [[int(h) if rng.random() < 0.8 else int(rng.integers(0, 4) % 4)
            for h in hs] for hs in hidden]
    want = train_supervised(3, 4, hidden, obs)
    rows = [(s, t, int(h), int(o)) for s, (hs, os) in
            enumerate(zip(hidden, obs)) for t, (h, o) in
            enumerate(zip(hs, os))]
    df = spark.createDataFrame(rows, "seq_id int, t int, hidden int, obs int")
    got = train_supervised_frame(df, 3, 4)
    assert np.allclose(got.a, want.a) and np.allclose(got.b, want.b)
    assert np.allclose(got.pi, want.pi)


def test_viterbi_decode_frame_matches_incore(spark, model):
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 3, rng.integers(4, 10)).tolist()
            for _ in range(12)]
    df = spark.createDataFrame(list(enumerate(seqs)),
                               "seq_id int, obs array<int>")
    got = {r["seq_id"]: r["path"]
           for r in viterbi_decode_frame(df, model).collect()}
    for i, s in enumerate(seqs):
        assert got[i] == viterbi(model, np.array(s), scaled=True).tolist()


def test_baum_welch_frame_matches_incore_on_one_seq(spark, model):
    obs = [0, 1, 2, 0, 1, 1, 2, 0]
    df = spark.createDataFrame([(0, obs)], "seq_id int, obs array<int>")
    got = baum_welch_frame(df, model, epsilon=0.0, max_iterations=3)
    want = train_baum_welch(model, np.array(obs), epsilon=0.0,
                            max_iterations=3)
    assert np.allclose(got.a, want.a, atol=1e-12)
    assert np.allclose(got.b, want.b, atol=1e-12)
    assert np.allclose(got.pi, want.pi, atol=1e-12)


def test_model_validate_and_serde(model):
    model.validate()
    again = HmmModel.from_json(model.to_json())
    assert np.array_equal(again.a, model.a)
    with pytest.raises(ValueError):
        HmmModel(np.eye(2), np.array([[0.5, 0.6], [0.5, 0.5]]),
                 np.array([0.5, 0.5])).validate()
    with pytest.raises(ValueError):
        HmmModel(np.eye(3), np.eye(2), np.ones(2) / 2)


def test_generate_sequences_deterministic_and_plausible(spark, model):
    from mahout_spark.operators.hmm import generate_sequences_frame

    df = generate_sequences_frame(spark, model, 16, 200, seed=9)
    rows = {r["seq_id"]: r for r in df.collect()}
    # deterministic regardless of partitioning: regenerate at a
    # different parallelism and compare per-sequence
    again = {r["seq_id"]: r for r in
             generate_sequences_frame(
                 spark, model, 16, 200, seed=9).repartition(7).collect()}
    assert set(rows) == set(range(16))
    for sid in rows:
        assert rows[sid]["obs"] == again[sid]["obs"]
        assert rows[sid]["hidden"] == again[sid]["hidden"]
    # emissions follow B: a state with zero emission prob never emits it
    b = model.b
    for r in rows.values():
        for h, o in zip(r["hidden"], r["obs"]):
            assert b[h][o] > 0.0
    # different seed -> different draws
    other = generate_sequences_frame(spark, model, 16, 200, seed=10)
    assert other.collect()[0]["obs"] != rows[0]["obs"]
