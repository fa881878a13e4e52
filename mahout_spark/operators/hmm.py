"""Hidden Markov models (Mahout's classifier/sequencelearning/hmm).

Reference anchors (studied, not copied):
- mr/.../sequencelearning/hmm/HmmAlgorithms.java:61-107 (forward:
  alpha[0][i] = pi_i * b_i(o0); alpha[t][i] = sum_j alpha[t-1][j]
  a_ji * b_i(ot); scaled variant in log space with log1p-exp
  accumulation), 133-155 (backward: beta[T-1][i] = 1; beta[t][i] =
  sum_j beta[t+1][j] a_ij b_j(o_{t+1})), 186-306 (Viterbi: delta /
  phi recursion, ties keep the FIRST (lowest) state index because
  updates require strict >, backtrack from argmax of the last row)
- mr/.../hmm/HmmTrainer.java:109-199 (supervised: pseudo-count every
  cell, count initial states / hidden transitions / emissions, row-
  normalize), 216-281 (Viterbi training: decode, recount, normalize,
  iterate to convergence), 283-361+ (Baum-Welch: forward-backward
  expected counts / model likelihood, row-normalize)
- mr/.../hmm/HmmEvaluator.java (modelLikelihood = sum of the last
  alpha row; log-scaled = logsumexp of the last row)
- mr/.../hmm/HmmModel.java (A = hidden x hidden transition, B =
  hidden x output emission, pi initial; validate = rows sum to 1)

Spark-first shape: sequences live as event triples (seq_id, t,
hidden, obs). SUPERVISED training is a pure DataFrame plan — initial /
transition / emission counts are three groupBys (transitions via a
lag window per sequence), all-JVM, and only the (H*H + H*O + H)
count cells ever reach the driver, independent of corpus size.
Decoding and Baum-Welch E-steps are per-sequence dynamic programs —
mapInPandas with the (tiny) model broadcast in the closure, one
sequence per row, NumPy inner loops; M-step aggregation of expected
counts is again a groupBy. The in-core functions below are the
faithful per-sequence kernels AND the pytest oracles (verified by
brute-force enumeration over all hidden paths in the tests).
"""

from __future__ import annotations

import json
import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["HmmModel", "forward", "backward", "viterbi",
           "model_likelihood", "train_supervised", "train_viterbi",
           "train_baum_welch", "train_supervised_frame",
           "viterbi_decode_frame", "hmm_model_rows",
           "hmm_supervised_sql", "generate_sequence",
           "generate_sequences_frame"]


class HmmModel:
    """A (HxH transitions), B (HxO emissions), pi (H initial)."""

    def __init__(self, a: np.ndarray, b: np.ndarray, pi: np.ndarray):
        self.a = np.asarray(a, dtype=np.float64)
        self.b = np.asarray(b, dtype=np.float64)
        self.pi = np.asarray(pi, dtype=np.float64)
        h, o = self.b.shape
        if self.a.shape != (h, h) or self.pi.shape != (h,):
            raise ValueError(
                f"inconsistent shapes: a{self.a.shape} b{self.b.shape} "
                f"pi{self.pi.shape}")

    @property
    def n_hidden(self) -> int:
        return self.b.shape[0]

    @property
    def n_output(self) -> int:
        return self.b.shape[1]

    def validate(self, tol: float = 1e-9) -> None:
        """HmmModel.validate: all rows are probability distributions."""
        for name, m in (("transition", self.a), ("emission", self.b)):
            if not np.allclose(m.sum(axis=1), 1.0, atol=tol):
                raise ValueError(f"{name} rows must sum to 1")
        if not math.isclose(self.pi.sum(), 1.0, abs_tol=tol):
            raise ValueError("initial probabilities must sum to 1")

    def clone(self) -> "HmmModel":
        return HmmModel(self.a.copy(), self.b.copy(), self.pi.copy())

    def to_json(self) -> str:
        return json.dumps({"a": self.a.tolist(), "b": self.b.tolist(),
                           "pi": self.pi.tolist()})

    @classmethod
    def from_json(cls, s: str) -> "HmmModel":
        d = json.loads(s)
        return cls(np.array(d["a"]), np.array(d["b"]), np.array(d["pi"]))


# ---------------------------------------------------------------------------
# per-sequence kernels (HmmAlgorithms)
# ---------------------------------------------------------------------------

def forward(model: HmmModel, obs: np.ndarray,
            scaled: bool = False) -> np.ndarray:
    """alpha (T x H); scaled -> log alpha (log1p-exp accumulation)."""
    obs = np.asarray(obs, dtype=np.int64)
    T, h = len(obs), model.n_hidden
    alpha = np.empty((T, h))
    if scaled:
        with np.errstate(divide="ignore"):
            la = np.log(model.a)
            alpha[0] = np.log(model.pi * model.b[:, obs[0]])
            for t in range(1, T):
                tmp = alpha[t - 1][:, None] + la  # (j, i)
                mx = tmp.max(axis=0)
                s = np.where(
                    np.isneginf(mx), -np.inf,
                    mx + np.log(np.exp(tmp - mx).sum(axis=0)))
                alpha[t] = s + np.log(model.b[:, obs[t]])
        return alpha
    alpha[0] = model.pi * model.b[:, obs[0]]
    for t in range(1, T):
        alpha[t] = (alpha[t - 1] @ model.a) * model.b[:, obs[t]]
    return alpha


def backward(model: HmmModel, obs: np.ndarray,
             scaled: bool = False) -> np.ndarray:
    """beta (T x H); scaled -> log beta."""
    obs = np.asarray(obs, dtype=np.int64)
    T, h = len(obs), model.n_hidden
    beta = np.empty((T, h))
    if scaled:
        with np.errstate(divide="ignore"):
            la = np.log(model.a)
            beta[T - 1] = 0.0
            for t in range(T - 2, -1, -1):
                tmp = (beta[t + 1][None, :] + la
                       + np.log(model.b[:, obs[t + 1]])[None, :])
                mx = tmp.max(axis=1)
                beta[t] = np.where(
                    np.isneginf(mx), -np.inf,
                    mx + np.log(np.exp(tmp - mx[:, None]).sum(axis=1)))
        return beta
    beta[T - 1] = 1.0
    for t in range(T - 2, -1, -1):
        beta[t] = model.a @ (model.b[:, obs[t + 1]] * beta[t + 1])
    return beta


def model_likelihood(alpha: np.ndarray, scaled: bool = False) -> float:
    """HmmEvaluator.modelLikelihood: (log)sum of the last alpha row."""
    last = alpha[-1]
    if not scaled:
        return float(last.sum())
    mx = last.max()
    if np.isneginf(mx):
        return float("-inf")
    return float(mx + np.log(np.exp(last - mx).sum()))


def viterbi(model: HmmModel, obs: np.ndarray,
            scaled: bool = False) -> np.ndarray:
    """Most likely hidden path; ties keep the LOWEST state index

    (the reference's strict-> scan)."""
    obs = np.asarray(obs, dtype=np.int64)
    T, h = len(obs), model.n_hidden
    with np.errstate(divide="ignore"):
        if scaled:
            delta0 = np.log(model.pi * model.b[:, obs[0]])
            step_a = np.log(model.a)
        else:
            delta0 = model.pi * model.b[:, obs[0]]
            step_a = model.a
    delta = delta0
    phi = np.empty((max(T - 1, 0), h), dtype=np.int64)
    for t in range(1, T):
        if scaled:
            cand = delta[:, None] + step_a          # (j, i)
        else:
            cand = delta[:, None] * step_a
        phi[t - 1] = cand.argmax(axis=0)            # first max -> lowest j
        best = cand[phi[t - 1], np.arange(h)]
        if scaled:
            delta = best + np.log(model.b[:, obs[t]])
        else:
            delta = best * model.b[:, obs[t]]
    seq = np.empty(T, dtype=np.int64)
    # reference init: maxProb = -inf (scaled) / 0.0 (unscaled) with
    # strict >, so an all-zero last row keeps state 0
    seq[T - 1] = int(delta.argmax()) if (scaled or delta.max() > 0.0) \
        else 0
    for t in range(T - 2, -1, -1):
        seq[t] = phi[t][seq[t + 1]]
    return seq


# ---------------------------------------------------------------------------
# in-core trainers (HmmTrainer) — also the pytest oracles
# ---------------------------------------------------------------------------

def _normalize_rows(m: np.ndarray) -> np.ndarray:
    return m / m.sum(axis=1, keepdims=True)


def train_supervised(n_hidden: int, n_output: int, hidden_seqs,
                     obs_seqs, pseudo_count: float = 1.0) -> HmmModel:
    """trainSupervisedSequence: pseudo-count + count + row-normalize."""
    pc = pseudo_count if pseudo_count != 0 else np.finfo(float).tiny
    a = np.full((n_hidden, n_hidden), pc)
    b = np.full((n_hidden, n_output), pc)
    pi = np.full(n_hidden, pc)
    for hid, obs in zip(hidden_seqs, obs_seqs):
        hid = np.asarray(hid, dtype=np.int64)
        obs = np.asarray(obs, dtype=np.int64)
        pi[hid[0]] += 1
        np.add.at(b, (hid, obs), 1)
        np.add.at(a, (hid[:-1], hid[1:]), 1)
    return HmmModel(_normalize_rows(a), _normalize_rows(b), pi / pi.sum())


def _check_convergence(last: HmmModel, cur: HmmModel,
                       epsilon: float) -> bool:
    """HmmTrainer.checkConvergence: Frobenius norm of A and B diffs."""
    da = math.sqrt(((last.a - cur.a) ** 2).sum())
    db = math.sqrt(((last.b - cur.b) ** 2).sum())
    return da + db < epsilon


def train_viterbi(model: HmmModel, obs: np.ndarray,
                  pseudo_count: float = 1.0, epsilon: float = 1e-4,
                  max_iterations: int = 10,
                  scaled: bool = False) -> HmmModel:
    """trainViterbi: decode -> recount -> normalize until converged."""
    pc = pseudo_count if pseudo_count != 0 else np.finfo(float).tiny
    obs = np.asarray(obs, dtype=np.int64)
    last = model.clone()
    cur = model.clone()
    for _ in range(max_iterations):
        path = viterbi(last, obs, scaled)
        a = np.full_like(cur.a, pc)
        b = np.full_like(cur.b, pc)
        np.add.at(b, (path, obs), 1)
        np.add.at(a, (path[:-1], path[1:]), 1)
        cur = HmmModel(_normalize_rows(a), _normalize_rows(b),
                       last.pi.copy())
        if _check_convergence(last, cur, epsilon):
            break
        last = cur.clone()
    return cur


def _expected_counts(model: HmmModel, obs: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unscaled Baum-Welch E-step for ONE sequence: un-normalized

    (pi, A-numerator, B-numerator) contributions divided by the
    sequence likelihood (HmmTrainer.unscaledBaumWelch)."""
    alpha = forward(model, obs)
    beta = backward(model, obs)
    lik = model_likelihood(alpha)
    pi = alpha[0] * beta[0]
    # A numerator: a_ij * sum_t alpha[t][i] b_j(o_{t+1}) beta[t+1][j]
    temp = alpha[:-1].T @ (model.b[:, obs[1:]].T * beta[1:])  # (i, j)
    a_num = model.a * temp / lik
    b_num = np.zeros_like(model.b)
    gamma = alpha * beta                                     # (t, i)
    np.add.at(b_num.T, np.asarray(obs, dtype=np.int64), gamma)
    b_num /= lik
    return pi, a_num, b_num


def train_baum_welch(model: HmmModel, obs: np.ndarray,
                     epsilon: float = 1e-4, max_iterations: int = 10
                     ) -> HmmModel:
    """trainBaumWelch (unscaled): forward-backward expected counts,

    row-normalize, iterate to convergence."""
    obs = np.asarray(obs, dtype=np.int64)
    last = model.clone()
    for _ in range(max_iterations):
        pi, a_num, b_num = _expected_counts(last, obs)
        cur = HmmModel(_normalize_rows(a_num), _normalize_rows(b_num),
                       pi / pi.sum())
        if _check_convergence(last, cur, epsilon):
            return cur
        last = cur
    return last


# ---------------------------------------------------------------------------
# distributed surfaces
# ---------------------------------------------------------------------------

def train_supervised_frame(events: DataFrame, n_hidden: int,
                           n_output: int, seq_col: str = "seq_id",
                           t_col: str = "t", hidden_col: str = "hidden",
                           obs_col: str = "obs",
                           pseudo_count: float = 1.0) -> HmmModel:
    """Distributed trainSupervisedSequence over event triples: three

    all-JVM count aggregations (transition pairs from a lag window
    per sequence); only H*H + H*O + H cells reach the driver."""
    pc = pseudo_count if pseudo_count != 0 else np.finfo(float).tiny
    e = events.select(F.col(seq_col).alias("__s"),
                      F.col(t_col).alias("__t"),
                      F.col(hidden_col).cast("int").alias("__h"),
                      F.col(obs_col).cast("int").alias("__o"))
    w = Window.partitionBy("__s").orderBy("__t")
    prev = e.withColumn("__ph", F.lag("__h").over(w))

    # ONE corpus pass: each event contributes an emission cell, plus
    # either a transition cell (has a predecessor) or an initial cell —
    # exploded to (kind, i, j) and counted in a single shuffle
    cells = prev.select(F.explode(F.array(
        F.struct(F.lit("b").alias("kind"), F.col("__h").alias("i"),
                 F.col("__o").alias("j")),
        F.when(F.col("__ph").isNotNull(),
               F.struct(F.lit("a").alias("kind"),
                        F.col("__ph").alias("i"),
                        F.col("__h").alias("j")))
        .otherwise(F.struct(F.lit("pi").alias("kind"),
                            F.col("__h").alias("i"),
                            F.lit(-1).alias("j"))))).alias("c"))
    a = np.full((n_hidden, n_hidden), pc)
    b = np.full((n_hidden, n_output), pc)
    pi = np.full(n_hidden, pc)
    for r in (cells.groupBy("c.kind", "c.i", "c.j").count().collect()):
        if r["kind"] == "b":
            b[r["i"], r["j"]] += r["count"]
        elif r["kind"] == "a":
            a[r["i"], r["j"]] += r["count"]
        else:
            pi[r["i"]] += r["count"]
    return HmmModel(_normalize_rows(a), _normalize_rows(b), pi / pi.sum())


def viterbi_decode_frame(sequences: DataFrame, model: HmmModel,
                         seq_col: str = "seq_id", obs_col: str = "obs",
                         scaled: bool = True) -> DataFrame:
    """(seq_id, path array<int>) — per-sequence Viterbi, Arrow-batched

    (mapInPandas; the model rides the closure — KBs)."""
    mj = model.to_json()

    def run(it):
        import pandas as pd

        m = HmmModel.from_json(mj)
        for pdf in it:
            paths = [viterbi(m, np.asarray(o, dtype=np.int64),
                             scaled).tolist()
                     for o in pdf[obs_col]]
            yield pd.DataFrame({seq_col: pdf[seq_col], "path": paths})

    out_t = dict(sequences.select(seq_col).dtypes)[seq_col]
    return sequences.mapInPandas(
        run, schema=f"{seq_col} {out_t}, path array<int>")


def baum_welch_frame(sequences: DataFrame, model: HmmModel,
                     epsilon: float = 1e-4, max_iterations: int = 10,
                     obs_col: str = "obs") -> HmmModel:
    """Multi-sequence Baum-Welch: each outer iteration runs the

    per-sequence E-step distributed (mapInPandas emits flattened
    expected-count vectors), sums them with ONE aggregate, and
    normalizes on the driver — the standard corpus-level EM extension
    of HmmTrainer.trainBaumWelch (which is single-sequence)."""
    h, o = model.n_hidden, model.n_output
    last = model.clone()
    for _ in range(max_iterations):
        mj = last.to_json()

        def estep(it):
            import pandas as pd

            m = HmmModel.from_json(mj)
            for pdf in it:
                tot = np.zeros(h + h * h + h * o)
                for obs in pdf[obs_col]:
                    pi, a_num, b_num = _expected_counts(
                        m, np.asarray(obs, dtype=np.int64))
                    tot += np.concatenate(
                        [pi, a_num.ravel(), b_num.ravel()])
                yield pd.DataFrame({"c": [tot.tolist()]})

        agg = (sequences.mapInPandas(estep, schema="c array<double>")
               .select(F.aggregate(
                   F.collect_list("c"),
                   F.array(*[F.lit(0.0)] * (h + h * h + h * o)),
                   lambda acc, v: F.zip_with(acc, v,
                                             lambda x, y: x + y))
                   .alias("tot")).first()["tot"])
        tot = np.asarray(agg)
        pi = tot[:h]
        a_num = tot[h:h + h * h].reshape(h, h)
        b_num = tot[h + h * h:].reshape(h, o)
        cur = HmmModel(_normalize_rows(a_num), _normalize_rows(b_num),
                       pi / pi.sum())
        if _check_convergence(last, cur, epsilon):
            return cur
        last = cur
    return last


# ---------------------------------------------------------------------------
# gate helpers
# ---------------------------------------------------------------------------

def hmm_model_rows(model: HmmModel, spark, round_dp: int = 6
                   ) -> DataFrame:
    """(kind, i, j, p) rows of a model — 'pi' rows use j = -1."""
    rows = []
    for i in range(model.n_hidden):
        rows.append(("pi", i, -1, round(float(model.pi[i]), round_dp)))
        for j in range(model.n_hidden):
            rows.append(("a", i, j, round(float(model.a[i, j]), round_dp)))
        for j in range(model.n_output):
            rows.append(("b", i, j, round(float(model.b[i, j]), round_dp)))
    return spark.createDataFrame(rows, "kind string, i int, j int, p double")


def hmm_supervised_sql(events_sql: str, n_hidden: int, n_output: int,
                       pseudo_count: float = 1.0,
                       round_dp: int = 6) -> str:
    """DuckDB twin of train_supervised_frame; ``events_sql`` yields

    (seq_id, t, hidden, obs). With an integral pseudo-count every
    probability is a ratio of exact integers -> bit-identical."""
    pc = pseudo_count
    return f"""
WITH e AS ({events_sql}),
prev AS (SELECT *, lag(hidden) OVER (PARTITION BY seq_id ORDER BY t)
                AS ph FROM e),
hh AS (SELECT range::INT AS i FROM range({n_hidden})),
oo AS (SELECT range::INT AS j FROM range({n_output})),
tc AS (SELECT ph AS i, hidden AS j, count(*)::DOUBLE AS c FROM prev
       WHERE ph IS NOT NULL GROUP BY 1, 2),
ec AS (SELECT hidden AS i, obs AS j, count(*)::DOUBLE AS c
       FROM e GROUP BY 1, 2),
ic AS (SELECT hidden AS i, count(*)::DOUBLE AS c FROM prev
       WHERE ph IS NULL GROUP BY 1),
arow AS (SELECT hh.i, ({pc!r} * {n_hidden} +
            coalesce((SELECT sum(c) FROM tc WHERE tc.i = hh.i), 0.0))
            AS s FROM hh),
brow AS (SELECT hh.i, ({pc!r} * {n_output} +
            coalesce((SELECT sum(c) FROM ec WHERE ec.i = hh.i), 0.0))
            AS s FROM hh),
isum AS (SELECT {pc!r} * {n_hidden} + coalesce(sum(c), 0.0) AS s FROM ic)
SELECT 'pi' AS kind, hh.i, -1 AS j,
       round(({pc!r} + coalesce(ic.c, 0.0)) / (SELECT s FROM isum),
             {round_dp}) AS p
FROM hh LEFT JOIN ic ON ic.i = hh.i
UNION ALL
SELECT 'a', hh.i, h2.i AS j,
       round(({pc!r} + coalesce(tc.c, 0.0)) / arow.s, {round_dp})
FROM hh CROSS JOIN hh h2
JOIN arow ON arow.i = hh.i
LEFT JOIN tc ON tc.i = hh.i AND tc.j = h2.i
UNION ALL
SELECT 'b', hh.i, oo.j,
       round(({pc!r} + coalesce(ec.c, 0.0)) / brow.s, {round_dp})
FROM hh CROSS JOIN oo
JOIN brow ON brow.i = hh.i
LEFT JOIN ec ON ec.i = hh.i AND ec.j = oo.j
"""


def generate_sequence(model: HmmModel, length: int,
                      rng: np.random.Generator
                      ) -> tuple[np.ndarray, np.ndarray]:
    """(hidden[length], obs[length]) — one sampled trajectory.

    RandomSequenceGenerator.java semantics (draw the hidden state from
    pi, then per step emit from B[state] and transition via A[state]),
    with an explicit Generator instead of the reference's global
    Random so distributed generation is deterministic per sequence.
    """
    hidden = np.empty(length, dtype=np.int64)
    obs = np.empty(length, dtype=np.int64)
    state = int(rng.choice(model.n_hidden, p=model.pi))
    for t in range(length):
        hidden[t] = state
        obs[t] = int(rng.choice(model.n_output, p=model.b[state]))
        state = int(rng.choice(model.n_hidden, p=model.a[state]))
    return hidden, obs


def generate_sequences_frame(spark, model: HmmModel, n_seqs: int,
                             length: int, seed: int = 42,
                             seq_col: str = "seq_id") -> DataFrame:
    """(seq_id, hidden array<int>, obs array<int>) — the `mahout

    hmmpredict` twin, distributed: spark.range drives one task batch
    per partition, each sequence gets its own Generator seeded
    (seed, seq_id) so the output is deterministic regardless of
    partitioning or executor count."""
    mj = model.to_json()

    def run(it):
        import pandas as pd

        m = HmmModel.from_json(mj)
        for pdf in it:
            hid_l, obs_l = [], []
            for sid in pdf[seq_col]:
                g = np.random.default_rng([seed, int(sid)])
                hidden, obs = generate_sequence(m, length, g)
                hid_l.append(hidden.tolist())
                obs_l.append(obs.tolist())
            yield pd.DataFrame({seq_col: pdf[seq_col],
                                "hidden": hid_l, "obs": obs_l})

    ids = spark.range(n_seqs).withColumnRenamed("id", seq_col)
    return ids.mapInPandas(
        run, schema=f"{seq_col} long, hidden array<int>, obs array<int>")
