"""Distributed Naive Bayes (standard multinomial + transform-weight
normalized complementary, Rennie et al. ICML 2003) over long-form triples.

Reference anchors (studied, not copied):
- math-scala/.../classifier/naivebayes/NaiveBayes.scala:56-94 (train:
  colSums/rowSums + ComplementaryNBThetaTrainer), 313-383 (theta trainer)
- math-scala/.../classifier/naivebayes/NBClassifier.scala:91-95 (standard
  weight log((w_lt+a)/(w_l+a*V))), 114-118 (complementary weight
  -log((w_t-w_lt+a)/(total-w_l+a*V))), 103-107 (theta normalization)
- math-scala/.../classifier/naivebayes/NBModel.scala:49-50 (numFeatures =
  nonzero feature-weight count, totalWeightSum), 132-147 (validate)
- spark/.../classifier/naivebayes/SparkNaiveBayes.scala (label aggregation
  = reduceByKey on parsed category; alphabetical label index)

The reference keeps a dense labels x features in-core matrix and scores
documents row-by-row in a mapBlock. Here everything stays long-form
(label, term, weight) and the classifier is a join decomposition that
never materializes per-label vectors:

  standard:  score(d,l) = M(d,l) + T_d * (ln a - ln(w_l + a*V))
             M(d,l)     = sum_matched tf * (ln(w_lt + a) - ln a)
  compl.:    score(d,l) = (M(d,l) + D_d + T_d * ln(total - w_l + a*V)) / theta_l
             M(d,l)     = sum_matched tf * (ln(w_t + a) - ln(w_t - w_lt + a))
             D_d        = sum_t tf * (-ln(w_t + a))

with T_d = total in-vocabulary tf of the document. The unmatched
(label, term) pairs — zero w_lt — fold into the T_d / D_d terms, so the
big join touches only the SPARSE label-term pairs: one term-keyed join
(broadcast when the model is small), one (doc,label) aggregation,
entirely JVM-side. At 10^12 docs the term join shuffles on term and the
model side is labels x vocab — the same scale contract as the tfidf
dictionary join.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ALPHA = 1.0


# ---------------------------------------------------------------------------
# scalar reference-parity weights (goldens + oracle building blocks)
# ---------------------------------------------------------------------------

def standard_weight(w_lt: float, w_l: float, alpha: float,
                    n_features: float) -> float:
    """StandardNBClassifier.computeWeight (NBClassifier.scala:91-95)."""
    return math.log((w_lt + alpha) / (w_l + alpha * n_features))


def complementary_weight(w_t: float, w_lt: float, total: float, w_l: float,
                         alpha: float, n_features: float) -> float:
    """ComplementaryNBClassifier.computeWeight (NBClassifier.scala:114-118)."""
    return -math.log((w_t - w_lt + alpha) / (total - w_l + alpha * n_features))


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def nb_text_triples(docs: DataFrame, label_col: str = "label",
                    id_col: str = "doc_id", text_col: str = "text",
                    weighting: str = "tf") -> DataFrame:
    """(doc_id, label, term, weight) from raw labeled documents — the

    seq2sparse front of the NB pipeline shared by the gates, the
    trainnb/testnb CLIs, and the plan dumps. ``weighting``: 'tf' (term
    counts) or a tfidf() variant name ('mahout' | 'mllib').
    """
    from mahout_spark.functions.text import explode_tokens

    if weighting == "tf":
        weighted = (explode_tokens(docs, id_col, text_col)
                    .groupBy(id_col, "token").agg(
                        F.count("*").cast("double").alias("weight")))
    else:
        from mahout_spark.operators.vectorize import tfidf

        weighted = tfidf(docs, variant=weighting, id_col=id_col,
                         text_col=text_col)
    return (weighted
            .join(docs.select(id_col, label_col), id_col)
            .select(id_col, F.col(label_col).alias("label"),
                    F.col("token").alias("term"), "weight"))


def confusion_from_predictions(preds: DataFrame, actual: DataFrame,
                               doc_col: str = "doc_id",
                               label_col: str = "label") -> dict:
    """{"confusion": {(actual, predicted): n}, "accuracy": float} from an

    already-computed predictions frame — lets callers that also WRITE the
    predictions run the classify pipeline once (nb_test uses it too).
    """
    cells = (preds.join(actual.select(doc_col, label_col).distinct(),
                        doc_col)
             .groupBy(F.col(label_col).alias("actual"), "predicted")
             .agg(F.count("*").alias("n")).collect())
    confusion = {(r["actual"], r["predicted"]): int(r["n"]) for r in cells}
    n_total = sum(confusion.values())
    n_right = sum(n for (a, p), n in confusion.items() if a == p)
    return {"confusion": confusion,
            "accuracy": n_right / n_total if n_total else float("nan")}


def nb_aggregate(triples: DataFrame, label_col: str = "label",
                 term_col: str = "term",
                 weight_col: str = "weight") -> DataFrame:
    """Aggregate doc-level TF/TF-IDF triples by label — the Spark-native

    extractLabelsAndAggregateObservations (SparkNaiveBayes.scala: a
    reduceByKey on the parsed category; here one groupBy). Output:
    (label, term, weight) with weight summed across the label's docs.
    """
    return (triples.groupBy(label_col, term_col)
            .agg(F.sum(weight_col).alias("weight"))
            .withColumnRenamed(label_col, "label")
            .withColumnRenamed(term_col, "term"))


@dataclass
class NBModel:
    """Trained model. `pairs` is the sparse labels x terms weight matrix

    as a DataFrame (label, term, weight); label-side stats are in-core
    (labels are few — the reference also collects the full dense matrix,
    NBModel.scala:58-59, which we deliberately avoid for web-scale vocab).
    """
    pairs: DataFrame                 # (label, term, weight) sparse
    feature_weights: DataFrame       # (term, w_t) — colSums
    label_weights: dict              # label -> w_l — rowSums
    theta: dict                      # label -> theta normalizer (complementary)
    alpha: float
    n_features: int                  # nonzero feature weights (NBModel.scala:49)
    total_weight: float              # zSum of label weights (NBModel.scala:50)
    complementary: bool

    @property
    def labels(self) -> list:
        """Alphabetical — SparkNaiveBayes builds the label index with

        takeOrdered, so index order == sort order; argmax tie-breaking
        follows it.
        """
        return sorted(self.label_weights)

    def label_weight(self, label) -> float:
        return self.label_weights[label]

    def theta_normalizer(self, label) -> float:
        return self.theta[label]

    def validate(self) -> None:
        """NBModel.validate (NBModel.scala:132-147)."""
        assert self.alpha > 0, "alphaI has to be greater than 0!"
        assert self.n_features > 0, "the vocab count has to be greater than 0!"
        assert self.total_weight > 0, "totalWeightSum has to be greater than 0!"
        assert self.label_weights, "the number of labels has to be defined!"
        if self.complementary:
            thetas = [self.theta[l] for l in self.labels]
            assert thetas, "the theta normalizers have to be defined"
            signs = {math.copysign(1.0, t) for t in thetas}
            assert len(signs) == 1, "Theta normalizers do not all have the same sign"
            assert all(t != 0 for t in thetas), "Weight normalizers can not have zero value."

    # -- persistence (NBModel.dfsWrite/dfsRead shape, parquet + JSON) ------
    def save(self, path: str) -> None:
        self.pairs.write.mode("overwrite").parquet(
            os.path.join(path, "weightsPerLabelAndFeature.parquet"))
        self.feature_weights.write.mode("overwrite").parquet(
            os.path.join(path, "weightsPerFeature.parquet"))
        # label stats go through parquet too: JSON keys are strings, which
        # would silently corrupt integer-labeled models on reload
        spark = self.pairs.sparkSession
        label_type = self.pairs.schema["label"].dataType.simpleString()
        rows = [(l, float(self.label_weights[l]),
                 float(self.theta.get(l, 0.0))) for l in self.label_weights]
        spark.createDataFrame(
            rows, f"label {label_type}, w_l double, theta double") \
            .coalesce(1).write.mode("overwrite").parquet(
                os.path.join(path, "labelStats.parquet"))
        meta = {
            "alpha": self.alpha, "n_features": self.n_features,
            "total_weight": self.total_weight,
            "complementary": self.complementary,
        }
        with open(os.path.join(path, "nb_model.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark, path: str) -> "NBModel":
        with open(os.path.join(path, "nb_model.json")) as f:
            meta = json.load(f)
        stats = spark.read.parquet(
            os.path.join(path, "labelStats.parquet")).collect()
        model = cls(
            pairs=spark.read.parquet(
                os.path.join(path, "weightsPerLabelAndFeature.parquet")),
            feature_weights=spark.read.parquet(
                os.path.join(path, "weightsPerFeature.parquet")),
            label_weights={r["label"]: r["w_l"] for r in stats},
            theta=({r["label"]: r["theta"] for r in stats}
                   if meta["complementary"] else {}),
            alpha=meta["alpha"], n_features=meta["n_features"],
            total_weight=meta["total_weight"],
            complementary=meta["complementary"])
        model.validate()
        return model


def nb_train(aggregated: DataFrame, alpha: float = DEFAULT_ALPHA,
             complementary: bool = True) -> NBModel:
    """NaiveBayes.train (NaiveBayes.scala:56-94) over (label, term, weight).

    weightsPerFeature = colSums, weightsPerLabel = rowSums; complementary
    additionally trains the per-label theta normalizer
    (ComplementaryNBThetaTrainer, NaiveBayes.scala:313-383): for EVERY
    (label, feature) cell — including zero w_lt — sum
    |complementary_weight|. The zero cells collapse to a per-term value
    shared by all labels with the same denominator, so theta is one
    vocab x labels pass: terms LEFT-joined to the sparse pairs per label.
    """
    pairs = aggregated.select("label", "term",
                              F.col("weight").cast("double")).persist()
    feature_weights = (pairs.groupBy("term")
                       .agg(F.sum("weight").alias("w_t")))
    label_rows = (pairs.groupBy("label")
                  .agg(F.sum("weight").alias("w_l")).collect())
    label_weights = {r["label"]: float(r["w_l"]) for r in label_rows}
    total = float(sum(label_weights.values()))
    n_features = feature_weights.filter(F.col("w_t") != 0).count()

    theta: dict = {}
    if complementary:
        spark = aggregated.sparkSession
        labels_df = spark.createDataFrame(
            [(l, w) for l, w in label_weights.items()], ["label", "w_l"])
        a, v = float(alpha), float(n_features)
        # |weight| per (term, label) over the FULL cross product, sparse
        # pairs joined in; denominator total - w_l + a*V is per-label
        cell = F.abs(
            F.log(F.col("w_l_denom"))
            - F.log(F.col("w_t") - F.coalesce(F.col("weight"), F.lit(0.0)) + a))
        theta_rows = (feature_weights
                      .crossJoin(F.broadcast(
                          labels_df.select(
                              "label",
                              (F.lit(total) - F.col("w_l") + a * v)
                              .alias("w_l_denom"))))
                      .join(pairs, ["label", "term"], "left")
                      .groupBy("label")
                      .agg(F.sum(cell).alias("theta"))
                      .collect())
        theta = {r["label"]: float(r["theta"]) for r in theta_rows}

    model = NBModel(pairs=pairs, feature_weights=feature_weights,
                    label_weights=label_weights, theta=theta,
                    alpha=float(alpha), n_features=int(n_features),
                    total_weight=total, complementary=complementary)
    model.validate()
    return model


# ---------------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------------

def nb_classify(model: NBModel, test_triples: DataFrame,
                doc_col: str = "doc_id", term_col: str = "term",
                weight_col: str = "weight",
                complementary: bool | None = None) -> DataFrame:
    """Full score matrix (doc, label, score) — classifyFull for every doc.

    Join decomposition of AbstractNBClassifier.getScoreForLabelInstance
    (NBClassifier.scala:45-51); see module docstring for the algebra.
    Out-of-vocabulary test terms are dropped, matching the reference where
    test sets are vectorized with the training dictionary. A document with
    ZERO in-vocabulary terms still gets a row per label with score 0 (the
    reference scores the empty vector as all-zero and argmax takes the
    first label) — the feature join is a left join so such docs survive.
    """
    if complementary is None:
        complementary = model.complementary
    if complementary and not model.complementary:
        raise ValueError("Complementary Label Assignment requires "
                         "Complementary Training")
    a = float(model.alpha)
    v = float(model.n_features)
    spark = test_triples.sparkSession

    # LEFT join keeps zero-in-vocab docs alive (all-zero score vector);
    # per-doc sums guard on the match so OOV terms contribute nothing
    t_all = (test_triples
             .select(F.col(doc_col).alias("__doc"),
                     F.col(term_col).alias("term"),
                     F.col(weight_col).cast("double").alias("__tf"))
             .join(model.feature_weights, "term", "left"))
    invocab = F.col("w_t").isNotNull()
    t = t_all.filter(invocab)

    if complementary:
        per_doc = t_all.groupBy("__doc").agg(
            F.coalesce(F.sum(F.when(invocab, F.col("__tf"))),
                       F.lit(0.0)).alias("t_sum"),
            F.coalesce(F.sum(F.when(invocab, -F.col("__tf")
                                    * F.log(F.col("w_t") + a))),
                       F.lit(0.0)).alias("d_sum"))
        delta = F.col("__tf") * (F.log(F.col("w_t") + a)
                                 - F.log(F.col("w_t") - F.col("weight") + a))
        label_rows = [(l, float(model.total_weight - model.label_weights[l]
                                + a * v), float(model.theta[l]))
                      for l in model.labels]
        labels_df = spark.createDataFrame(label_rows,
                                          ["label", "denom", "theta"])
        score = ((F.coalesce(F.col("m"), F.lit(0.0)) + F.col("d_sum")
                  + F.col("t_sum") * F.log(F.col("denom")))
                 / F.col("theta"))
    else:
        per_doc = t_all.groupBy("__doc").agg(
            F.coalesce(F.sum(F.when(invocab, F.col("__tf"))),
                       F.lit(0.0)).alias("t_sum"))
        delta = F.col("__tf") * (F.log(F.col("weight") + a) - math.log(a))
        label_rows = [(l, float(model.label_weights[l] + a * v))
                      for l in model.labels]
        labels_df = spark.createDataFrame(label_rows, ["label", "denom"])
        score = (F.coalesce(F.col("m"), F.lit(0.0))
                 + F.col("t_sum") * (math.log(a) - F.log(F.col("denom"))))

    matched = (t.join(model.pairs, ["term"])
               .select("__doc", F.col("label"), delta.alias("__delta"))
               .groupBy("__doc", "label")
               .agg(F.sum("__delta").alias("m")))
    return (per_doc.crossJoin(F.broadcast(labels_df))
            .join(matched, ["__doc", "label"], "left")
            .select(F.col("__doc").alias(doc_col), "label",
                    score.alias("score")))


def nb_predict(model: NBModel, test_triples: DataFrame,
               doc_col: str = "doc_id", term_col: str = "term",
               weight_col: str = "weight",
               complementary: bool | None = None) -> DataFrame:
    """(doc, predicted_label, score) — winner takes all; ties go to the

    alphabetically-first label (reference argmax keeps the FIRST strictly
    greater score and the label index is alphabetical).
    """
    scores = nb_classify(model, test_triples, doc_col, term_col, weight_col,
                         complementary)
    w = Window.partitionBy(doc_col).orderBy(F.desc("score"), F.asc("label"))
    return (scores.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(doc_col, F.col("label").alias("predicted"), "score"))


def nb_test(model: NBModel, labeled_triples: DataFrame,
            doc_col: str = "doc_id", label_col: str = "label",
            term_col: str = "term", weight_col: str = "weight",
            complementary: bool | None = None) -> dict:
    """NaiveBayes.test analog: confusion matrix + accuracy.

    Returns {"confusion": {(actual, predicted): n}, "accuracy": float,
    "labels": [...]} — the ResultAnalyzer surface without the report
    formatting. The per-doc work is distributed; only the label x label
    count matrix is collected.
    """
    actual = labeled_triples.select(doc_col, label_col).distinct()
    preds = nb_predict(
        model,
        labeled_triples.select(doc_col, term_col, weight_col),
        doc_col, term_col, weight_col, complementary)
    out = confusion_from_predictions(preds, actual, doc_col, label_col)
    out["labels"] = model.labels
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle builders (driver correctness gate)
# ---------------------------------------------------------------------------

def nb_model_sql(table: str, label_col: str = "lang", id_col: str = "doc_id",
                 text_col: str = "text", alpha: float = 1.0,
                 round_dp: int = 6) -> str:
    """Oracle: per-(label, term) standard log weight over tokenized TF."""
    from mahout_spark.functions.text import tokens_array_sql

    toks = tokens_array_sql(text_col)
    return f"""
WITH tok AS (SELECT {id_col}, {label_col} AS label, unnest({toks}) AS term
             FROM {table}),
pairs AS (SELECT label, term, count(*)::DOUBLE AS w_lt FROM tok GROUP BY 1, 2),
wl AS (SELECT label, sum(w_lt) AS w_l FROM pairs GROUP BY 1),
v AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM pairs)
SELECT p.label AS label, p.term AS term,
       round(ln((p.w_lt + {alpha}) / (wl.w_l + {alpha} * (SELECT v FROM v))),
             {round_dp}) AS log_weight
FROM pairs p JOIN wl USING (label)
"""


def nb_classify_sql(table: str, label_col: str = "lang",
                    id_col: str = "doc_id", text_col: str = "text",
                    alpha: float = 1.0, complementary: bool = False,
                    round_dp: int = 6) -> str:
    """Oracle: self-test predictions (doc, predicted, score) replaying the

    full train + classify pipeline numerically in SQL.
    """
    from mahout_spark.functions.text import tokens_array_sql

    toks = tokens_array_sql(text_col)
    a = float(alpha)
    common = f"""
WITH tok AS (SELECT {id_col}, {label_col} AS label, unnest({toks}) AS term
             FROM {table}),
pairs AS (SELECT label, term, count(*)::DOUBLE AS w_lt FROM tok GROUP BY 1, 2),
wt AS (SELECT term, sum(w_lt) AS w_t FROM pairs GROUP BY 1),
wl AS (SELECT label, sum(w_lt) AS w_l FROM pairs GROUP BY 1),
v AS (SELECT count(*)::DOUBLE AS v FROM wt),
tot AS (SELECT sum(w_l) AS total FROM wl),
doc_t AS (SELECT {id_col}, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
invoc AS (SELECT d.*, wt.w_t FROM doc_t d JOIN wt USING (term))
"""
    if complementary:
        body = f"""
, per_doc AS (SELECT {id_col}, sum(tf) AS t_sum,
                     sum(-tf * ln(w_t + {a})) AS d_sum
              FROM invoc GROUP BY 1),
m AS (SELECT i.{id_col}, p.label,
             sum(i.tf * (ln(i.w_t + {a}) - ln(i.w_t - p.w_lt + {a}))) AS m
      FROM invoc i JOIN pairs p USING (term) GROUP BY 1, 2),
theta AS (SELECT l.label,
                 sum(abs(ln((SELECT total FROM tot) - l.w_l
                            + {a} * (SELECT v FROM v))
                         - ln(w.w_t - coalesce(p.w_lt, 0) + {a}))) AS theta
          FROM wt w CROSS JOIN wl l
          LEFT JOIN pairs p ON p.term = w.term AND p.label = l.label
          GROUP BY 1),
scores AS (SELECT d.{id_col}, l.label,
                  (coalesce(m.m, 0) + d.d_sum
                   + d.t_sum * ln((SELECT total FROM tot) - l.w_l
                                  + {a} * (SELECT v FROM v))) / th.theta
                  AS score
           FROM per_doc d CROSS JOIN wl l
           JOIN theta th ON th.label = l.label
           LEFT JOIN m ON m.{id_col} = d.{id_col} AND m.label = l.label)
"""
    else:
        body = f"""
, per_doc AS (SELECT {id_col}, sum(tf) AS t_sum FROM invoc GROUP BY 1),
m AS (SELECT i.{id_col}, p.label,
             sum(i.tf * (ln(p.w_lt + {a}) - ln({a}))) AS m
      FROM invoc i JOIN pairs p USING (term) GROUP BY 1, 2),
scores AS (SELECT d.{id_col}, l.label,
                  coalesce(m.m, 0)
                  + d.t_sum * (ln({a}) - ln(l.w_l + {a} * (SELECT v FROM v)))
                  AS score
           FROM per_doc d CROSS JOIN wl l
           LEFT JOIN m ON m.{id_col} = d.{id_col} AND m.label = l.label)
"""
    return common + body + f"""
SELECT {id_col}, label AS predicted, round(score, {round_dp}) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY {id_col}
                                   ORDER BY score DESC, label) AS rn
      FROM scores)
WHERE rn = 1
"""
