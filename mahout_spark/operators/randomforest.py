"""Random decision forests (Mahout's classifier/df partial builder).

Reference anchors (studied, not copied):
- mr/.../classifier/df/builder/DecisionTreeBuilder.java:103-281 (node
  recursion: m = ceil(sqrt(e)) classification / ceil(e/3) regression
  attributes sampled per node; leaves on identical data / identical
  label / ig < 1e-6 / child < minSplitNum(2) / regression variance <
  minVarianceProportion * full-set variance; categorical attributes
  selectable once per path, numeric attributes reusable)
- mr/.../classifier/df/split/OptIgSplit.java:57-232 (classification IG:
  candidate numeric splits = midpoints of sorted values when n <= 17
  else 16 percentiles; prefix-scan less/greater label counts; entropy
  in bits; categorical IG = H(Y) - sum_v p_v H(Y|v) over unique values)
- mr/.../classifier/df/split/RegressionSplit.java (variance gain)
- mr/.../classifier/df/Bagging.java:52-61 (per-tree bootstrap of the
  partition's data), mapreduce/partial/Step1Mapper.java:120-167
  (partition p builds nbTrees(P, T, p) trees over ITS split only —
  the "partial data" forest), DecisionForest.java:70-120 (classify:
  per-tree votes; categorical = majority vote, numerical = mean of
  non-NaN predictions)

Spark-first shape: training is ONE applyInPandas pass — every shard
builds its quota of trees in-core over its own rows (the Step1Mapper
contract, so the model is identical in spirit to the reference's
partial forests: trees see a subsample, bagged again per tree) and
emits (tree_id, tree_json); the driver collects only the serialized
trees (KBs). Scoring has two paths:
- ``forest_predict_expr``: each tree compiles to a nested CASE WHEN
  Catalyst expression — all-JVM, whole-stage-codegen scoring, the
  100 TB path for the shallow trees this builder produces;
- ``DecisionForest.classify_pandas``: Arrow-batched NumPy masked
  descent for deep/categorical forests.

Deterministic deviations from the reference (documented, test-pinned):
ties in majority votes break to the SMALLEST label index (the
reference draws from rng); numeric split percentiles use NumPy's
linear interpolation (commons-math legacy estimate differs in the
last ulp at worst).
"""

from __future__ import annotations

import json
import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_tree", "tree_predict", "DecisionForest", "rf_train",
           "tree_to_column", "forest_predict_expr", "forest_predict_sql",
           "best_numeric_split", "ig_numeric_split_frame",
           "ig_numeric_split_sql"]

MAX_NUMERIC_SPLITS = 16
EPSILON = 1.0e-6
_LOG2 = math.log(2.0)


# ---------------------------------------------------------------------------
# in-core split math (OptIgSplit / RegressionSplit)
# ---------------------------------------------------------------------------

def _entropy(counts: np.ndarray) -> float:
    n = counts.sum()
    if n == 0:
        return 0.0
    p = counts[counts > 0] / n
    return float(-(p * np.log(p)).sum() / _LOG2)


def _numeric_split_points(values: np.ndarray) -> np.ndarray:
    """OptIgSplit.chooseNumericSplitPoints: midpoints when n <= 17,

    else MAX_NUMERIC_SPLITS percentiles at 100*(i+1)/17."""
    v = np.sort(values)
    if len(v) <= 1:
        return v
    if len(v) <= MAX_NUMERIC_SPLITS + 1:
        return (v[1:] + v[:-1]) / 2.0
    q = [100.0 * (i + 1.0) / (MAX_NUMERIC_SPLITS + 1.0)
         for i in range(MAX_NUMERIC_SPLITS)]
    return np.percentile(v, q)


def best_numeric_split(values: np.ndarray, labels: np.ndarray,
                       n_labels: int) -> tuple[float, float]:
    """(ig, split) — OptIgSplit.numericalSplit prefix scan: bucket i

    counts instances with split[i-1] < value <= split[i]; scanning
    buckets left to right, ig = H(Y) - p< H(Y|<) - p>= H(Y|>=) where
    "<" means value <= split (the reference's `value > splitPoints`
    walk puts equal values in the LEFT bucket)."""
    pts = _numeric_split_points(values)
    if len(pts) == 0:
        return -1.0, math.nan
    # bucket index: first split point >= value
    idx = np.searchsorted(pts, values, side="left")
    n = len(values)
    counts = np.zeros((len(pts) + 1, n_labels), dtype=np.int64)
    np.add.at(counts, (idx, labels), 1)
    count_all = counts.sum(axis=0)
    hy = _entropy(count_all)
    best_ig, best = -1.0, -1
    less = np.zeros(n_labels, dtype=np.int64)
    rest = count_all.copy()
    for i in range(len(pts)):
        less += counts[i]
        rest -= counts[i]
        ig = (hy - less.sum() / n * _entropy(less)
              - rest.sum() / n * _entropy(rest))
        if ig > best_ig:
            best_ig, best = ig, i
    return best_ig, float(pts[best])


def _categorical_ig(values: np.ndarray, labels: np.ndarray,
                    n_labels: int) -> float:
    """OptIgSplit.categoricalSplit: H(Y) - sum_v p_v H(Y|v)."""
    uniq, inv = np.unique(values, return_inverse=True)
    counts = np.zeros((len(uniq), n_labels), dtype=np.int64)
    np.add.at(counts, (inv, labels), 1)
    n = len(values)
    hy = _entropy(counts.sum(axis=0))
    hyx = sum(c.sum() / n * _entropy(c) for c in counts)
    return hy - hyx


def _regression_split(values: np.ndarray, y: np.ndarray
                      ) -> tuple[float, float]:
    """(gain, split) — RegressionSplit shape: variance reduction over

    the same candidate split points; gain = var(y) - sum side vars."""
    pts = _numeric_split_points(values)
    if len(pts) == 0:
        return -1.0, math.nan
    base = float(((y - y.mean()) ** 2).sum())
    best_gain, best = -1.0, -1
    for i, p in enumerate(pts):
        m = values <= p
        lo, hi = y[m], y[~m]
        if len(lo) == 0 or len(hi) == 0:
            continue
        g = base - float(((lo - lo.mean()) ** 2).sum()) \
            - float(((hi - hi.mean()) ** 2).sum())
        if g > best_gain:
            best_gain, best = g, i
    if best < 0:
        return -1.0, math.nan
    return best_gain, float(pts[best])


# ---------------------------------------------------------------------------
# in-core tree builder (DecisionTreeBuilder)
# ---------------------------------------------------------------------------

def _majority(labels: np.ndarray, n_labels: int) -> int:
    c = np.bincount(labels, minlength=n_labels)
    return int(c.argmax())  # ties -> smallest index (deterministic)


def build_tree(X: np.ndarray, y: np.ndarray, rng: np.random.Generator,
               n_labels: int = 0, categorical: set[int] | None = None,
               m: int = 0, min_split_num: int = 2,
               min_variance_proportion: float = 1.0e-3,
               _selected: np.ndarray | None = None,
               _min_variance: float | None = None) -> dict:
    """One decision tree as a JSON-able dict. n_labels == 0 -> regression

    (y numeric); else classification with integer labels 0..n_labels-1.
    ``categorical`` marks categorical feature indices (selectable once
    per path, split one-branch-per-value)."""
    e = X.shape[1]
    categorical = categorical or set()
    regression = n_labels == 0
    if m == 0:
        m = math.ceil(e / 3.0) if regression else math.ceil(math.sqrt(e))
    if _selected is None:
        _selected = np.zeros(e, dtype=bool)
    if len(y) == 0:
        return {"leaf": math.nan}

    if regression:
        var = float(((y - y.mean()) ** 2).sum())
        if _min_variance is None:
            _min_variance = var / len(y) * min_variance_proportion
        if var / len(y) < _min_variance:
            return {"leaf": float(y.mean())}
    else:
        y = y.astype(np.int64)
        if (X == X[0]).all():
            return {"leaf": float(_majority(y, n_labels))}
        if (y == y[0]).all():
            return {"leaf": float(y[0])}

    # randomAttributes: shuffle unselected, take first m
    avail = np.nonzero(~_selected)[0]
    if len(avail) == 0:
        fallback = y.mean() if regression else _majority(y, n_labels)
        return {"leaf": float(fallback)}
    attrs = rng.permutation(avail)[:min(m, len(avail))]

    best_attr, best_ig, best_split = -1, -1.0, math.nan
    for a in sorted(attrs):
        if a in categorical:
            ig, sp = _categorical_ig(X[:, a], y, n_labels), math.nan
        elif regression:
            ig, sp = _regression_split(X[:, a], y)
        else:
            ig, sp = best_numeric_split(X[:, a], y, n_labels)
        if ig > best_ig:
            best_attr, best_ig, best_split = int(a), ig, sp

    if best_ig < EPSILON:
        fallback = y.mean() if regression else _majority(y, n_labels)
        return {"leaf": float(fallback)}

    kw = dict(n_labels=n_labels, categorical=categorical, m=m,
              min_split_num=min_split_num,
              min_variance_proportion=min_variance_proportion,
              _min_variance=_min_variance)

    if best_attr in categorical:
        sel = _selected.copy()
        sel[best_attr] = True  # categorical: once per path
        uniq = np.unique(X[:, best_attr])
        children = {}
        for v in uniq:
            mask = X[:, best_attr] == v
            if mask.sum() < min_split_num:
                sub = y[mask]
                lv = sub.mean() if regression else _majority(sub, n_labels)
                children[str(float(v))] = {"leaf": float(lv)}
            else:
                children[str(float(v))] = build_tree(
                    X[mask], y[mask], rng, _selected=sel, **kw)
        return {"attr": best_attr, "children": children}

    mask = X[:, best_attr] < best_split
    lo_n, hi_n = int(mask.sum()), int((~mask).sum())
    if lo_n == 0 or hi_n == 0:
        sel = _selected.copy()
        sel[best_attr] = True  # degenerate: retire the attribute
    else:
        # data changed -> numeric attrs become selectable again
        sel = np.zeros(e, dtype=bool)
        for c in categorical:
            sel[c] = _selected[c]
    if lo_n < min_split_num or hi_n < min_split_num:
        fallback = y.mean() if regression else _majority(y, n_labels)
        return {"leaf": float(fallback)}
    return {"attr": best_attr, "split": best_split,
            "lo": build_tree(X[mask], y[mask], rng, _selected=sel, **kw),
            "hi": build_tree(X[~mask], y[~mask], rng, _selected=sel, **kw)}


def tree_predict(tree: dict, X: np.ndarray) -> np.ndarray:
    """Vectorized masked descent (Node.classify over a batch)."""
    out = np.full(len(X), math.nan)
    idx = np.arange(len(X))

    def walk(node, rows):
        if len(rows) == 0:
            return
        if "leaf" in node:
            out[rows] = node["leaf"]
            return
        a = node["attr"]
        if "children" in node:  # categorical
            vals = X[rows, a]
            for key, child in node["children"].items():
                walk(child, rows[vals == float(key)])
            # unseen category -> NaN (reference CategoricalNode)
        else:
            m = X[rows, a] < node["split"]
            walk(node["lo"], rows[m])
            walk(node["hi"], rows[~m])

    walk(tree, idx)
    return out


# ---------------------------------------------------------------------------
# forest train / classify
# ---------------------------------------------------------------------------

class DecisionForest:
    """List of JSON trees + vote combination (DecisionForest.java)."""

    def __init__(self, trees: list[dict], n_labels: int = 0):
        self.trees = trees
        self.n_labels = n_labels

    def predict_incore(self, X: np.ndarray) -> np.ndarray:
        preds = np.stack([tree_predict(t, X) for t in self.trees])
        if self.n_labels == 0:  # regression: mean of non-NaN
            ok = ~np.isnan(preds)
            n_ok = ok.sum(axis=0)
            sums = np.where(ok, preds, 0.0).sum(axis=0)
            # all-NaN columns -> NaN without the nanmean empty-slice
            # RuntimeWarning (matches forest_predict_expr's sentinel)
            return np.where(n_ok > 0, sums / np.maximum(n_ok, 1),
                            np.nan)
        votes = np.zeros((X.shape[0], self.n_labels))
        for row in preds:
            ok = ~np.isnan(row)
            votes[np.nonzero(ok)[0], row[ok].astype(int)] += 1
        out = votes.argmax(axis=1).astype(float)  # ties -> smallest
        out[votes.sum(axis=1) == 0] = math.nan
        return out

    def classify_pandas(self, df: DataFrame,
                        features_col: str = "features",
                        out_col: str = "prediction") -> DataFrame:
        """Arrow-batched scoring for deep forests (mapInPandas)."""
        import pandas as pd

        trees, n_labels = self.trees, self.n_labels
        fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields)

        def score(it):
            forest = DecisionForest(trees, n_labels)
            for pdf in it:
                X = np.stack(pdf[features_col].to_numpy())
                pdf = pdf.copy()
                pdf[out_col] = forest.predict_incore(X)
                yield pdf

        return df.mapInPandas(score, schema=f"{fields}, {out_col} double")

    def to_json(self) -> str:
        return json.dumps({"n_labels": self.n_labels, "trees": self.trees})

    @classmethod
    def from_json(cls, s: str) -> "DecisionForest":
        d = json.loads(s)
        return cls(d["trees"], d["n_labels"])


def _nb_trees(num_maps: int, num_trees: int, partition: int) -> int:
    """Step1Mapper.nbTrees: first partitions absorb the remainder."""
    per = num_trees // num_maps
    rem = num_trees - num_maps * per
    return per + (1 if partition < rem else 0)


def rf_train(df: DataFrame, num_trees: int = 10,
             features_col: str = "features", label_col: str = "label",
             n_labels: int = 0, categorical: set[int] | None = None,
             m: int = 0, min_split_num: int = 2, n_shards: int | None = None,
             seed: int = 42) -> DecisionForest:
    """PartialBuilder: shard the corpus by hash, shard p builds

    nbTrees(P, T, p) bagged trees over ITS rows only (Step1Mapper), one
    applyInPandas pass; the driver collects (tree_id, json) — model
    traffic is independent of corpus size. Deterministic: shard keys
    and per-tree bootstrap seeds derive from xxhash64/seed."""
    import pandas as pd

    spark = df.sparkSession
    if n_shards is None:
        n_shards = min(spark.sparkContext.defaultParallelism,
                       max(1, num_trees))
    cat = sorted(categorical or [])

    base = df.select(
        F.col(features_col).cast("array<double>").alias("__x"),
        F.col(label_col).cast("double").alias("__y"),
        F.pmod(F.xxhash64(F.to_json(F.struct(features_col, label_col)),
                          F.lit(seed)), F.lit(n_shards)).alias("__shard"),
        F.xxhash64(F.to_json(F.struct(features_col, label_col)),
                   F.lit(seed + 1)).alias("__ord"))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__ord", kind="mergesort")
        p = int(pdf["__shard"].iloc[0])
        X = np.stack(pdf["__x"].to_numpy())
        y = pdf["__y"].to_numpy()
        first = sum(_nb_trees(n_shards, num_trees, q) for q in range(p))
        rows = []
        for t in range(_nb_trees(n_shards, num_trees, p)):
            rng = np.random.default_rng(seed * 1_000_003 + first + t)
            bag = rng.integers(0, len(X), len(X))  # Bagging.build
            tree = build_tree(X[bag], y[bag], rng, n_labels=n_labels,
                              categorical=set(cat), m=m,
                              min_split_num=min_split_num)
            rows.append((first + t, json.dumps(tree)))
        return pd.DataFrame(rows, columns=["tree_id", "tree"])

    got = (base.groupBy("__shard")
           .applyInPandas(fit, schema="tree_id long, tree string")
           .collect())
    trees = [json.loads(r["tree"])
             for r in sorted(got, key=lambda r: r["tree_id"])]
    return DecisionForest(trees, n_labels)


# ---------------------------------------------------------------------------
# Catalyst scoring path: tree -> nested CASE WHEN expression
# ---------------------------------------------------------------------------

def tree_to_column(tree: dict, x: Column) -> Column:
    """Compile a tree into a single JVM expression over an

    array<double> feature column — whole-stage-codegen scoring with no
    Python in the loop (the 100 TB path; forests from this builder are
    depth-bounded by minSplitNum so expressions stay small)."""
    if "leaf" in tree:
        return F.lit(float(tree["leaf"]))
    a = tree["attr"]
    if "children" in tree:
        expr = F.lit(float("nan"))
        for key, child in reversed(list(tree["children"].items())):
            expr = F.when(x[a] == float(key),
                          tree_to_column(child, x)).otherwise(expr)
        return expr
    return (F.when(x[a] < tree["split"], tree_to_column(tree["lo"], x))
            .otherwise(tree_to_column(tree["hi"], x)))


def forest_predict_expr(forest: DecisionForest, x: Column) -> Column:
    """Majority vote (classification) / mean (regression) over compiled

    trees — DecisionForest.classify as one codegen'd expression."""
    votes = F.array(*[tree_to_column(t, x) for t in forest.trees])
    if forest.n_labels == 0:
        ok = F.filter(votes, lambda v: ~F.isnan(v))
        # all trees NaN (every path hit an unseen categorical) -> NaN,
        # matching predict_incore's sentinel instead of SQL NULL
        return F.when(
            F.size(ok) > 0,
            F.aggregate(ok, F.lit(0.0), lambda acc, v: acc + v)
            / F.size(ok)).otherwise(F.lit(float("nan")))
    counts = F.array(*[
        F.aggregate(votes, F.lit(0),
                    lambda acc, v: acc + F.when(v == float(k), 1)
                    .otherwise(0))
        for k in range(forest.n_labels)])
    # argmax with smallest-index tie-break
    return (F.array_position(counts, F.array_max(counts)) - 1
            ).cast("double")


def _tree_to_sql(tree: dict, feats: list[str]) -> str:
    """SQL twin of tree_to_column over explicit feature expressions."""
    if "leaf" in tree:
        return repr(float(tree["leaf"]))
    a = tree["attr"]
    if "children" in tree:
        arms = " ".join(
            f"WHEN {feats[a]} = {float(k)!r} "
            f"THEN {_tree_to_sql(c, feats)}"
            for k, c in tree["children"].items())
        return f"(CASE {arms} ELSE 'NaN'::DOUBLE END)"
    return (f"(CASE WHEN {feats[a]} < {tree['split']!r} "
            f"THEN {_tree_to_sql(tree['lo'], feats)} "
            f"ELSE {_tree_to_sql(tree['hi'], feats)} END)")


def forest_predict_sql(forest: DecisionForest, feats: list[str]) -> str:
    """Scalar SQL expression twin of forest_predict_expr

    (classification only): majority vote with smallest-index tie-break
    via list_position(counts, list_max(counts)) - 1."""
    assert forest.n_labels > 0, "SQL twin covers classification"
    votes = [_tree_to_sql(t, feats) for t in forest.trees]
    counts = ", ".join(
        "(" + " + ".join(f"(CASE WHEN {v} = {float(k)!r} THEN 1 "
                         "ELSE 0 END)" for v in votes) + ")"
        for k in range(forest.n_labels))
    return (f"(list_position([{counts}], "
            f"list_max([{counts}])) - 1)::DOUBLE")


# ---------------------------------------------------------------------------
# distributed split finder + gate oracle (the IG math, SQL-replayable)
# ---------------------------------------------------------------------------

def ig_numeric_split_frame(df: DataFrame, value_col: str, label_col: str,
                           n_labels: int, round_dp: int = 6) -> DataFrame:
    """(split, ig) for EVERY distinct candidate value of ``value_col``

    — the OptIgSplit prefix scan as a distributed plan: one groupBy to
    (value, label) counts, a cumulative window over values, entropy of
    the below/above label vectors per candidate. This is the builder's
    IG math made engine-checkable (and the shape a future
    whole-corpus-split trainer would use); candidates here are the
    distinct values (split semantics: left side takes value < split).
    """
    cnt = (df.groupBy(F.col(value_col).alias("v"),
                      F.col(label_col).cast("int").alias("y"))
           .agg(F.count("*").cast("double").alias("c")))
    pivot = cnt.groupBy("v").agg(*[
        F.coalesce(F.sum(F.when(F.col("y") == k, F.col("c"))),
                   F.lit(0.0)).alias(f"c{k}") for k in range(n_labels)])
    from pyspark.sql import Window
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, -1))
    lo = [F.coalesce(F.sum(f"c{k}").over(w), F.lit(0.0)).alias(f"lo{k}")
          for k in range(n_labels)]
    t = pivot.select("v", *lo, *[F.col(f"c{k}") for k in range(n_labels)])
    tot = [F.sum(f"c{k}").over(Window.partitionBy()).alias(f"t{k}")
           for k in range(n_labels)]
    t = t.select("*", *tot)

    def ent(cols, n):
        e = F.lit(0.0)
        for c in cols:
            p = c / n
            e = e + F.when(c > 0, -p * F.log(p)).otherwise(0.0)
        return e / F.lit(_LOG2)

    n_lo = sum((F.col(f"lo{k}") for k in range(n_labels)), F.lit(0.0))
    n_all = sum((F.col(f"t{k}") for k in range(n_labels)), F.lit(0.0))
    n_hi = n_all - n_lo
    hi_cols = [F.col(f"t{k}") - F.col(f"lo{k}") for k in range(n_labels)]
    hy = ent([F.col(f"t{k}") for k in range(n_labels)], n_all)
    ig = (hy - n_lo / n_all * ent([F.col(f"lo{k}") for k in
                                   range(n_labels)], n_lo)
          - n_hi / n_all * ent(hi_cols, n_hi))
    return (t.filter(n_lo > 0)  # v is a real split (non-empty left)
            .select(F.col("v").alias("split"),
                    F.round(ig, round_dp).alias("ig")))


def ig_numeric_split_sql(source_sql: str, n_labels: int,
                         round_dp: int = 6) -> str:
    """DuckDB twin of ig_numeric_split_frame; ``source_sql`` yields

    (v, y) rows. Identical expression order (entropy fold over label
    index, /log(2) last)."""
    cs = ", ".join(
        f"sum(CASE WHEN y = {k} THEN c ELSE 0.0 END) AS c{k}"
        for k in range(n_labels))
    los = ", ".join(
        f"coalesce(sum(c{k}) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND 1 PRECEDING), 0.0) AS lo{k}"
        for k in range(n_labels))
    ts = ", ".join(f"sum(c{k}) OVER () AS t{k}" for k in range(n_labels))

    def ent(cols, n):
        terms = " + ".join(
            f"(CASE WHEN {c} > 0 THEN -({c} / {n}) * ln({c} / {n}) "
            f"ELSE 0.0 END)" for c in cols)
        return f"(({terms}) / {_LOG2!r})"

    n_lo = "(0.0 + " + " + ".join(f"lo{k}" for k in range(n_labels)) + ")"
    n_all = "(0.0 + " + " + ".join(f"t{k}" for k in range(n_labels)) + ")"
    n_hi = f"({n_all} - {n_lo})"
    hy = ent([f"t{k}" for k in range(n_labels)], n_all)
    e_lo = ent([f"lo{k}" for k in range(n_labels)], n_lo)
    e_hi = ent([f"(t{k} - lo{k})" for k in range(n_labels)], n_hi)
    return f"""
WITH src AS ({source_sql}),
cnt AS (SELECT v, y, count(*)::DOUBLE AS c FROM src GROUP BY 1, 2),
piv AS (SELECT v, {cs} FROM cnt GROUP BY v),
cum AS (SELECT v, {los}, {ts},
               {', '.join(f'c{k}' for k in range(n_labels))} FROM piv)
SELECT v AS split,
       round({hy} - {n_lo} / {n_all} * {e_lo}
                  - {n_hi} / {n_all} * {e_hi}, {round_dp}) AS ig
FROM cum WHERE {n_lo} > 0
"""
