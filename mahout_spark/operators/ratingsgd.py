"""Biased-SGD matrix factorization (RatingSGDFactorizer) + persistence.

Reference anchors (studied, not copied):
- mr/.../impl/recommender/svd/RatingSGDFactorizer.java:80-121 (init:
  user slot 0 = global average, slot 1 = user bias, slot 2 pinned 1;
  item slots 0,1 pinned 1, slot 2 = item bias; slots 3.. ~ N(0, noise)),
  :165-177 (epoch loop, learning-rate decay per epoch),
  :183-211 (update rule: biases first, then simultaneous per-feature
  gradient with the PRE-update values on both sides),
  :125-151 (cachePreferences + Durstenfeld shuffle — replaced here by a
  deterministic hash order so reruns/retries are bit-identical)
- mr/.../impl/recommender/svd/ParallelSGDFactorizer.java:42-90 (the
  reference's own "train shards concurrently against shared factors"
  scale-out; shared memory does not exist across executors, so the
  distributed twin below trains hash-shards independently from the same
  deterministic init and averages per-entity, weighted by touch count —
  one-shot parameter averaging, Zinkevich et al., NIPS 2010)
- mr/.../impl/recommender/svd/FilePersistenceStrategy.java:44-90
  (persist/load a Factorization — here a parquet round-trip of the
  factor triples, partition-friendly instead of a java-serialized blob)

Scale posture: each shard's model covers only the entities its rows
touch, so executor memory is O(entities-per-shard x k), not O(corpus).
The final average is one groupBy on (entity, slot). The driver never
holds factors. For 10^12-interaction catalogs ALS (alswr_factorize) is
the production path — this operator exists for reference parity and for
rating-prediction workloads at Taste scale, where SGD's bias terms beat
plain ALS on RMSE.

Factor layout matches svdrec.TRIPLE (row_id, col_id, value): slots
0..2 are the bias slots, 3..num_features-1 the latent features, so
svd_estimate / svd_recommend / evaluate_factorization consume the
output unchanged (prediction = dot product, biases included — exactly
predictRating, RatingSGDFactorizer.java:213-219).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_OFFSET = 3
USER_BIAS = 1
ITEM_BIAS = 2


def _norm_id(x):
    """numpy scalar -> Python scalar so repr()-keyed hashing is identical

    whether ids arrive from pandas (np.int64) or Python (int)."""
    return x.item() if isinstance(x, np.generic) else x


def _entity_seed(entity_id, seed: int) -> int:
    """Stable 64-bit seed for an entity's init vector — independent of

    partitioning, process hash randomization, and shard count (every
    shard derives the identical init for a shared entity)."""
    h = hashlib.blake2b(repr(entity_id).encode(), digest_size=8,
                        key=seed.to_bytes(8, "little", signed=True))
    return int.from_bytes(h.digest(), "little")


def _init_vec(entity_id, num_features: int, noise: float, seed: int,
              is_user: bool, global_avg: float) -> np.ndarray:
    v = np.empty(num_features)
    rng = np.random.default_rng(_entity_seed(entity_id, seed))
    v[FEATURE_OFFSET:] = rng.standard_normal(
        num_features - FEATURE_OFFSET) * noise
    if is_user:
        v[0], v[USER_BIAS], v[ITEM_BIAS] = global_avg, 0.0, 1.0
    else:
        v[0], v[USER_BIAS], v[ITEM_BIAS] = 1.0, 1.0, 0.0
    return v


class RatingSGD:
    """In-core trainer — the exact reference semantics, deterministic.

    ``num_features`` INCLUDES the three reserved bias slots (the
    reference's convention), so latent rank = num_features - 3.
    """

    def __init__(self, num_features: int = 8, learning_rate: float = 0.01,
                 prevent_overfitting: float = 0.02,
                 random_noise: float = 0.01, num_iterations: int = 10,
                 learning_rate_decay: float = 1.0, seed: int = 101,
                 bias_learning_rate: float = 0.5, bias_reg: float = 0.1):
        if num_features <= FEATURE_OFFSET:
            raise ValueError(f"num_features must be > {FEATURE_OFFSET}")
        self.k = num_features
        self.lr = learning_rate
        self.reg = prevent_overfitting
        self.noise = random_noise
        self.iters = num_iterations
        self.decay = learning_rate_decay
        self.seed = seed
        self.bias_lr = bias_learning_rate
        self.bias_reg = bias_reg
        self.users: dict = {}
        self.items: dict = {}

    def _vec(self, store: dict, eid, is_user: bool,
             global_avg: float) -> np.ndarray:
        v = store.get(eid)
        if v is None:
            v = _init_vec(eid, self.k, self.noise, self.seed, is_user,
                          global_avg)
            store[eid] = v
        return v

    def fit(self, triples, global_avg: float | None = None) -> "RatingSGD":
        """triples: iterable of (user, item, rating). Training order is

        the deterministic hash order (replaces shufflePreferences).
        ``global_avg`` overrides the computed mean — the distributed
        trainer passes the CORPUS mean so every shard inits user
        slot 0 identically."""
        rows = [(_norm_id(u), _norm_id(i), float(p)) for u, i, p in triples]
        if not rows:
            return self
        if global_avg is None:
            global_avg = float(sum(r[2] for r in rows)) / len(rows)
        order = sorted(range(len(rows)),
                       key=lambda i: _entity_seed((rows[i][0], rows[i][1]),
                                                  self.seed + 1))
        lr = self.lr
        for _ in range(self.iters):
            for idx in order:
                u_id, i_id, rating = rows[idx]
                self._update(
                    self._vec(self.users, u_id, True, global_avg),
                    self._vec(self.items, i_id, False, global_avg),
                    float(rating), lr)
            lr *= self.decay
        return self

    def _update(self, u: np.ndarray, v: np.ndarray, rating: float,
                lr: float) -> None:
        err = rating - float(u @ v)
        # biases first, with the pre-update error (reference :192-198)
        u[USER_BIAS] += self.bias_lr * lr * (
            err - self.bias_reg * self.reg * u[USER_BIAS])
        v[ITEM_BIAS] += self.bias_lr * lr * (
            err - self.bias_reg * self.reg * v[ITEM_BIAS])
        # features simultaneously from the pre-update values (:200-211)
        uf = u[FEATURE_OFFSET:].copy()
        vf = v[FEATURE_OFFSET:].copy()
        u[FEATURE_OFFSET:] += lr * (err * vf - self.reg * uf)
        v[FEATURE_OFFSET:] += lr * (err * uf - self.reg * vf)

    def predict(self, u_id, i_id) -> float:
        if u_id not in self.users or i_id not in self.items:
            return float("nan")
        return float(self.users[u_id] @ self.items[i_id])


class SVDPlusPlus(RatingSGD):
    """SVD++ (Koren, KDD 2008) — SVDPlusPlusFactorizer.java:58-177,

    faithfully including its quirks:
    * the trained user-side vector is ``p`` (slots 0..2 init 0), while
      ``userVectors`` keeps its RatingSGD init untouched until the final
      fold-in (factorize():100-112);
    * the per-step prediction uses pPlusY = float32(Σ y_j / √n + p)
      (the reference narrows to float at :137 — reproduced with
      np.float32 so trajectories match);
    * implicit item factors y_j of EVERY item the user rated get the
      normalized-error update each step (:158-165);
    * final user factor = float32((init_userVector + Σ y_j) / √n + p).
    Defaults mirror the 3-arg ctor: bias_learning_rate 0.7,
    bias_reg 0.33 (.java:46-48).

    Replicated quirk worth knowing: the fold-in divides the WHOLE init
    userVector by √n — including slot 0, the global-average slot — while
    the training-time estimate (pPlusY · itemVector) never contains that
    term at all (p's slot 0 stays 0). Served dot-product estimates are
    therefore offset by ~globalAvg/√n relative to the residuals SGD
    minimized; per-user RANKING (what recommend() consumes) is
    unaffected, and parity with the reference requires keeping it.
    """

    def __init__(self, num_features: int = 8, learning_rate: float = 0.01,
                 prevent_overfitting: float = 0.1,
                 random_noise: float = 0.01, num_iterations: int = 10,
                 learning_rate_decay: float = 1.0, seed: int = 101,
                 bias_learning_rate: float = 0.7, bias_reg: float = 0.33):
        super().__init__(num_features, learning_rate, prevent_overfitting,
                         random_noise, num_iterations, learning_rate_decay,
                         seed, bias_learning_rate, bias_reg)
        self.p: dict = {}
        self.y: dict = {}
        self.items_by_user: dict = {}

    def _aux_vec(self, store: dict, eid, salt: str) -> np.ndarray:
        v = store.get(eid)
        if v is None:
            v = np.zeros(self.k)
            rng = np.random.default_rng(
                _entity_seed((salt, eid), self.seed))
            v[FEATURE_OFFSET:] = rng.standard_normal(
                self.k - FEATURE_OFFSET) * self.noise
            store[eid] = v
        return v

    def fit(self, triples, global_avg: float | None = None
            ) -> "SVDPlusPlus":
        rows = [(_norm_id(u), _norm_id(i), float(p)) for u, i, p in triples]
        if not rows:
            return self
        if global_avg is None:
            global_avg = float(sum(r[2] for r in rows)) / len(rows)
        self._ga = global_avg
        order = sorted(range(len(rows)),
                       key=lambda i: _entity_seed((rows[i][0], rows[i][1]),
                                                  self.seed + 1))
        # rated lists in hash order: Σ y_j float-addition order is then
        # independent of the caller's row order (parity across shards)
        for idx in order:
            u_id, i_id = rows[idx][0], rows[idx][1]
            self.items_by_user.setdefault(u_id, [])
            if i_id not in self.items_by_user[u_id]:
                self.items_by_user[u_id].append(i_id)
        lr = self.lr
        for _ in range(self.iters):
            for idx in order:
                u_id, i_id, rating = rows[idx]
                self._update_pp(u_id, i_id, rating, lr)
            lr *= self.decay
        self._fold_in(global_avg)
        return self

    def _update_pp(self, u_id, i_id, rating: float, lr: float) -> None:
        p_u = self._aux_vec(self.p, u_id, "p")
        v = self._vec(self.items, i_id, False, 0.0)
        rated = self.items_by_user[u_id]
        y_sum = np.zeros(self.k)
        for j in rated:
            y_sum[FEATURE_OFFSET:] += self._aux_vec(
                self.y, j, "y")[FEATURE_OFFSET:]
        denom = np.sqrt(len(rated))
        p_plus_y = (y_sum / denom + p_u).astype(np.float32).astype(
            np.float64)  # the reference's (float) narrowing, :137
        err = rating - float(p_plus_y @ v)
        norm_err = err / denom
        p_u[USER_BIAS] += self.bias_lr * lr * (
            err - self.bias_reg * self.reg * p_u[USER_BIAS])
        v[ITEM_BIAS] += self.bias_lr * lr * (
            err - self.bias_reg * self.reg * v[ITEM_BIAS])
        pf = p_u[FEATURE_OFFSET:].copy()
        vf = v[FEATURE_OFFSET:].copy()
        p_u[FEATURE_OFFSET:] += lr * (err * vf - self.reg * pf)
        v[FEATURE_OFFSET:] += lr * (err * p_plus_y[FEATURE_OFFSET:]
                                    - self.reg * vf)
        common = norm_err * vf  # pre-update item features, :157
        for j in rated:
            y_j = self._aux_vec(self.y, j, "y")
            y_j[FEATURE_OFFSET:] += self.lr * (
                common - self.reg * y_j[FEATURE_OFFSET:])

    def _fold_in(self, global_avg: float) -> None:
        """factorize():100-112 — user factor = float32((init userVector

        + Σ y_j)/√n + p). The RatingSGD ``userVectors`` never trained
        (updateParameters is overridden), so its INIT is the base."""
        for u_id, rated in self.items_by_user.items():
            base = _init_vec(u_id, self.k, self.noise, self.seed, True,
                             global_avg)
            for j in rated:
                base[FEATURE_OFFSET:] += self.y[j][FEATURE_OFFSET:]
            denom = np.sqrt(len(rated))
            self.users[u_id] = (base / denom + self.p[u_id]).astype(
                np.float32).astype(np.float64)


def svdpp_factorize(prefs: DataFrame, num_features: int = 8,
                    learning_rate: float = 0.01,
                    prevent_overfitting: float = 0.1,
                    random_noise: float = 0.01, num_iterations: int = 10,
                    learning_rate_decay: float = 1.0,
                    n_shards: int | None = None, seed: int = 101,
                    user: str = "user_id", item: str = "item_id",
                    pref: str = "pref") -> tuple[DataFrame, DataFrame]:
    """Distributed SVD++ — same shard-train + weighted-average shape as

    rating_sgd_factorize (ParallelSGDFactorizer's scale-out, one-shot
    parameter averaging). Note the y-update fan-out makes each SGD step
    O(|R(u)| · k); shards only see their own rows, so |R(u)| inside a
    shard shrinks as shards grow — the averaging bound degrades
    gracefully. ``n_shards=1`` = the sequential reference exactly.
    """
    return _factorize_with(SVDPlusPlus, prefs, num_features, learning_rate,
                           prevent_overfitting, random_noise,
                           num_iterations, learning_rate_decay, n_shards,
                           seed, user, item, pref)


def rating_sgd_factorize(prefs: DataFrame, num_features: int = 8,
                         learning_rate: float = 0.01,
                         prevent_overfitting: float = 0.02,
                         random_noise: float = 0.01,
                         num_iterations: int = 10,
                         learning_rate_decay: float = 1.0,
                         n_shards: int | None = None, seed: int = 101,
                         user: str = "user_id", item: str = "item_id",
                         pref: str = "pref"
                         ) -> tuple[DataFrame, DataFrame]:
    """(U, V) factor triples — distributed RatingSGDFactorizer.

    Each hash-shard trains the full epoch schedule from the SAME
    deterministic per-entity init; shared entities are then averaged
    weighted by how many ratings each shard trained them on (one-shot
    parameter averaging — the cross-executor stand-in for
    ParallelSGDFactorizer's shared-memory threads). ``n_shards=1``
    reproduces the sequential reference exactly (in deterministic hash
    order) without collecting the ratings to the driver.
    """
    return _factorize_with(RatingSGD, prefs, num_features, learning_rate,
                           prevent_overfitting, random_noise,
                           num_iterations, learning_rate_decay, n_shards,
                           seed, user, item, pref)


def _factorize_with(model_cls, prefs: DataFrame, num_features: int,
                    learning_rate: float, prevent_overfitting: float,
                    random_noise: float, num_iterations: int,
                    learning_rate_decay: float, n_shards: int | None,
                    seed: int, user: str, item: str,
                    pref: str) -> tuple[DataFrame, DataFrame]:
    spark = prefs.sparkSession
    if n_shards is None:
        n_shards = spark.sparkContext.defaultParallelism
    base = prefs.select(
        F.col(user).alias("__u"), F.col(item).alias("__i"),
        F.col(pref).cast("double").alias("__p"),
        F.xxhash64(user, item, F.lit(seed)).alias("__h"))
    # exact decimal sum -> the global average is order-independent
    # (double summation order varies with partitioning; decimal does not)
    row = base.agg(F.sum(F.col("__p").cast("decimal(30,15)")).alias("s"),
                   F.count("*").alias("n")).first()
    global_avg = float(row["s"] / row["n"])
    sharded = base.withColumn("__shard",
                              F.pmod(F.col("__h"), F.lit(n_shards)))
    k = num_features
    utype = prefs.schema[user].dataType.simpleString()
    itype = prefs.schema[item].dataType.simpleString()

    def fit_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__h", kind="mergesort")
        m = model_cls(num_features=k, learning_rate=learning_rate,
                      prevent_overfitting=prevent_overfitting,
                      random_noise=random_noise,
                      num_iterations=num_iterations,
                      learning_rate_decay=learning_rate_decay, seed=seed)
        # corpus (not shard) mean so every shard inits user slot 0
        # identically
        m.fit(zip(pdf["__u"], pdf["__i"], pdf["__p"]),
              global_avg=global_avg)
        shard_id = int(pdf["__shard"].iloc[0]) if len(pdf) else -1
        touches_u = pdf.groupby("__u").size().to_dict()
        touches_i = pdf.groupby("__i").size().to_dict()
        recs = []
        for eid, vec in m.users.items():
            recs.append(("u", eid, None, touches_u[eid], vec))
        for eid, vec in m.items.items():
            recs.append(("i", eid, None, touches_i[eid], vec))
        return pd.DataFrame({
            "side": [r[0] for r in recs],
            "uid": [r[1] if r[0] == "u" else None for r in recs],
            "iid": [r[1] if r[0] == "i" else None for r in recs],
            "shard": shard_id,
            "w": [r[3] for r in recs],
            "vec": [r[4] for r in recs]})

    schema = (f"side string, uid {utype}, iid {itype}, shard int, w long, "
              f"vec array<double>")
    shard_out = (sharded.groupBy("__shard")
                 .applyInPandas(fit_shard, schema=schema))
    slots = F.posexplode(F.col("vec"))
    # weighted average folded in SHARD ORDER (array_sort on the shard id)
    # so float addition order — hence the result — is independent of
    # which executor finishes first
    parts = F.array_sort(F.collect_list(F.struct(
        F.col("shard").alias("s"), F.col("__v").alias("v"),
        F.col("w").alias("w"))))
    num = F.aggregate(parts, F.lit(0.0),
                      lambda acc, x: acc + x["v"] * x["w"].cast("double"))
    den = F.aggregate(parts, F.lit(0.0),
                      lambda acc, x: acc + x["w"].cast("double"))
    # entities seen by ONE shard keep that shard's value bit-exactly
    # ((v*w)/w can be off by an ulp when w is not a power of two)
    value = F.when(F.size(parts) == 1,
                   F.element_at(parts, 1)["v"]).otherwise(num / den)
    long_form = (shard_out
                 .select("side", "uid", "iid", "shard", "w",
                         slots.alias("col_id", "__v"))
                 .groupBy("side", "uid", "iid", "col_id")
                 .agg(value.alias("value")))
    u_fac = (long_form.filter(F.col("side") == "u")
             .select(F.col("uid").alias("row_id"), "col_id", "value"))
    v_fac = (long_form.filter(F.col("side") == "i")
             .select(F.col("iid").alias("row_id"), "col_id", "value"))
    return u_fac, v_fac


def save_factorization(user_factors: DataFrame, item_factors: DataFrame,
                       path: str) -> None:
    """FilePersistenceStrategy.maybePersist twin: parquet the factor

    triples under <path>/{user,item}_factors (partition-parallel write,
    no java-serialized blob)."""
    user_factors.write.mode("overwrite").parquet(f"{path}/user_factors")
    item_factors.write.mode("overwrite").parquet(f"{path}/item_factors")


def load_factorization(spark: SparkSession,
                       path: str) -> tuple[DataFrame, DataFrame]:
    """FilePersistenceStrategy.load twin."""
    return (spark.read.parquet(f"{path}/user_factors"),
            spark.read.parquet(f"{path}/item_factors"))
