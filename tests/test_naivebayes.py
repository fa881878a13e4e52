"""Naive Bayes — NBTestBase goldens + in-core classifier parity.

Goldens ported from math-scala/src/test/.../naivebayes/NBTestBase.scala
(Simple Standard NB Model: row/col sums; NB Aggregator: per-label sums;
Model DFS Serialization; train-and-test perfect diagonal). The in-core
parity oracle reimplements NBClassifier.scala's computeWeight formulas
directly in NumPy and checks the join-decomposed distributed classifier
against a dense labels x features scoring loop.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.naivebayes import (NBModel, complementary_weight,
                                               nb_aggregate, nb_classify,
                                               nb_predict, nb_test, nb_train,
                                               standard_weight)

EPS = 1e-6

# NBTestBase.scala:36-41 — simulated sparse TF-IDF, one row per label
TFIDF = np.array([
    [0.7, 0.1, 0.1, 0.3],
    [0.4, 0.4, 0.1, 0.1],
    [0.1, 0.0, 0.8, 0.1],
    [0.1, 0.1, 0.1, 0.7],
])
LABELS = ["Cat1", "Cat2", "Cat3", "Cat4"]


def _pairs_df(spark, mat, labels):
    rows = [(labels[i], f"t{j}", float(mat[i, j]))
            for i in range(mat.shape[0]) for j in range(mat.shape[1])
            if mat[i, j] != 0.0]
    return spark.createDataFrame(rows, ["label", "term", "weight"])


def _incore_classify(mat, labels, alpha, complementary, instance):
    """Dense reference loop: classifyFull via computeWeight per cell."""
    w_l = mat.sum(axis=1)
    w_t = mat.sum(axis=0)
    total = mat.sum()
    v = int((w_t != 0).sum())
    scores = []
    for li in range(len(labels)):
        if complementary:
            theta = sum(abs(complementary_weight(w_t[j], mat[li, j], total,
                                                 w_l[li], alpha, v))
                        for j in range(mat.shape[1]))
            s = sum(instance[j] * complementary_weight(
                w_t[j], mat[li, j], total, w_l[li], alpha, v) / theta
                for j in range(mat.shape[1]) if instance[j] != 0)
        else:
            s = sum(instance[j] * standard_weight(mat[li, j], w_l[li],
                                                  alpha, v)
                    for j in range(mat.shape[1]) if instance[j] != 0)
        scores.append(s)
    return scores


class TestTrain:
    def test_simple_standard_model_goldens(self, spark):
        # NBTestBase "Simple Standard NB Model": label/feature weights
        model = nb_train(_pairs_df(spark, TFIDF, LABELS),
                         complementary=False)
        model.validate()
        for lbl, want in zip(LABELS, [1.2, 1.0, 1.0, 1.0]):
            assert abs(model.label_weight(lbl) - want) < EPS
        fw = {r["term"]: r["w_t"] for r in model.feature_weights.collect()}
        for term, want in zip(["t0", "t1", "t2", "t3"],
                              [1.3, 0.6, 1.1, 1.2]):
            assert abs(fw[term] - want) < EPS
        assert model.n_features == 4
        assert abs(model.total_weight - 4.2) < EPS

    def test_aggregator(self, spark):
        # NBTestBase "NB Aggregator": doc-level rows summed per category
        docs = [("Cat1", "doc_a"), ("Cat2", "doc_b"), ("Cat1", "doc_c"),
                ("Cat2", "doc_d"), ("Cat1", "doc_e")]
        vals = {"Cat1": [0.1, 0.0, 0.1, 0.0], "Cat2": [0.0, 0.1, 0.0, 0.1]}
        rows = [(d, cat, f"t{j}", vals[cat][j])
                for cat, d in docs for j in range(4) if vals[cat][j] != 0]
        triples = spark.createDataFrame(
            rows, ["doc_id", "label", "term", "weight"])
        agg = nb_aggregate(triples)
        got = {(r["label"], r["term"]): r["weight"] for r in agg.collect()}
        assert abs(got[("Cat1", "t0")] - 0.3) < EPS
        assert abs(got[("Cat1", "t2")] - 0.3) < EPS
        assert abs(got[("Cat2", "t1")] - 0.2) < EPS
        assert abs(got[("Cat2", "t3")] - 0.2) < EPS
        assert ("Cat1", "t1") not in got

    def test_theta_normalizer_matches_incore_trainer(self, spark):
        # ComplementaryNBThetaTrainer replay (NaiveBayes.scala:329-343)
        model = nb_train(_pairs_df(spark, TFIDF, LABELS), complementary=True)
        w_l, w_t = TFIDF.sum(axis=1), TFIDF.sum(axis=0)
        total, v = TFIDF.sum(), 4
        for li, lbl in enumerate(LABELS):
            want = sum(abs(complementary_weight(w_t[j], TFIDF[li, j], total,
                                                w_l[li], 1.0, v))
                       for j in range(4))
            assert abs(model.theta_normalizer(lbl) - want) < EPS

    def test_validate_rejects_bad_alpha(self, spark):
        with pytest.raises(AssertionError):
            nb_train(_pairs_df(spark, TFIDF, LABELS), alpha=0.0,
                     complementary=False)

    def test_serde_roundtrip(self, spark, tmp_path):
        # NBTestBase "Model DFS Serialization"
        model = nb_train(_pairs_df(spark, TFIDF, LABELS), complementary=True)
        model.save(str(tmp_path))
        back = NBModel.load(spark, str(tmp_path))
        assert back.complementary == model.complementary
        assert back.n_features == model.n_features
        for lbl in LABELS:
            assert abs(back.label_weight(lbl) - model.label_weight(lbl)) < EPS
            assert abs(back.theta_normalizer(lbl)
                       - model.theta_normalizer(lbl)) < EPS
        # classify with the reloaded model — identical predictions
        test = _pairs_df(spark, TFIDF, LABELS).withColumnRenamed(
            "label", "doc_id")
        a = {(r["doc_id"], r["label"]): r["score"]
             for r in nb_classify(model, test).collect()}
        b = {(r["doc_id"], r["label"]): r["score"]
             for r in nb_classify(back, test).collect()}
        assert a.keys() == b.keys()
        assert all(abs(a[k] - b[k]) < EPS for k in a)


    def test_serde_preserves_integer_labels(self, spark, tmp_path):
        # regression: JSON keys are strings — int-labeled models must
        # round-trip with their label TYPE intact (parquet label stats)
        rows = [(0, "t0", 3.0), (0, "t1", 1.0),
                (1, "t1", 2.0), (1, "t2", 4.0)]
        pairs = spark.createDataFrame(rows, ["label", "term", "weight"])
        model = nb_train(pairs, complementary=True)
        model.save(str(tmp_path))
        back = NBModel.load(spark, str(tmp_path))
        assert back.labels == [0, 1]
        assert all(isinstance(l, int) for l in back.labels)
        test = spark.createDataFrame([("d0", "t2", 2.0)],
                                     ["doc_id", "term", "weight"])
        [p] = nb_predict(back, test).collect()
        assert p["predicted"] == 1  # t2 dominated by label 1
        result = nb_test(back, spark.createDataFrame(
            [("d0", 1, "t2", 2.0)], ["doc_id", "label", "term", "weight"]))
        assert result["accuracy"] == 1.0


class TestClassify:
    @pytest.mark.parametrize("complementary", [False, True])
    def test_matches_incore_dense_loop(self, spark, complementary):
        # random dense instances scored by the distributed join plan must
        # equal the reference's per-cell computeWeight loop
        rng = np.random.default_rng(11)
        mat = rng.integers(0, 6, size=(3, 8)).astype(float)
        mat[2, 5] = 0.0
        labels = ["a", "b", "c"]
        model = nb_train(_pairs_df(spark, mat, labels),
                         complementary=complementary)
        insts = rng.integers(0, 4, size=(5, 8)).astype(float)
        rows = [(f"d{i}", f"t{j}", float(insts[i, j]))
                for i in range(5) for j in range(8) if insts[i, j] != 0]
        test = spark.createDataFrame(rows, ["doc_id", "term", "weight"])
        got = {(r["doc_id"], r["label"]): r["score"]
               for r in nb_classify(model, test,
                                    complementary=complementary).collect()}
        for i in range(5):
            want = _incore_classify(mat, labels, 1.0, complementary, insts[i])
            for li, lbl in enumerate(labels):
                assert abs(got[(f"d{i}", lbl)] - want[li]) < 1e-9, (i, lbl)

    def test_out_of_vocab_terms_ignored(self, spark):
        model = nb_train(_pairs_df(spark, TFIDF, LABELS), complementary=False)
        base = spark.createDataFrame([("d0", "t0", 2.0)],
                                     ["doc_id", "term", "weight"])
        noisy = spark.createDataFrame(
            [("d0", "t0", 2.0), ("d0", "zzz_not_in_vocab", 9.0)],
            ["doc_id", "term", "weight"])
        a = {r["label"]: r["score"] for r in nb_classify(model, base).collect()}
        b = {r["label"]: r["score"] for r in nb_classify(model, noisy).collect()}
        assert all(abs(a[l] - b[l]) < EPS for l in a)

    @pytest.mark.parametrize("complementary", [False, True])
    def test_zero_vocab_doc_scores_all_zero(self, spark, complementary):
        # a doc with NO in-vocabulary terms must still be scored: the
        # reference classifies the empty vector as all-zero scores and
        # argmax takes the first label (ADVICE r3)
        model = nb_train(_pairs_df(spark, TFIDF, LABELS),
                         complementary=complementary)
        test = spark.createDataFrame(
            [("dz", "zzz_not_in_vocab", 9.0), ("dok", "t0", 2.0)],
            ["doc_id", "term", "weight"])
        got = nb_classify(model, test, complementary=complementary)
        rows = got.filter(F.col("doc_id") == "dz").collect()
        assert len(rows) == len(LABELS)
        assert all(r["score"] == 0.0 for r in rows)
        pred = {r["doc_id"]: r["predicted"]
                for r in nb_predict(model, test,
                                    complementary=complementary).collect()}
        assert pred["dz"] == sorted(LABELS)[0]
        assert "dok" in pred

    def test_complementary_requires_complementary_training(self, spark):
        model = nb_train(_pairs_df(spark, TFIDF, LABELS), complementary=False)
        with pytest.raises(ValueError):
            nb_classify(model, _pairs_df(spark, TFIDF, LABELS)
                        .withColumnRenamed("label", "doc_id"),
                        complementary=True)

    def test_self_test_confusion_diagonal(self, spark):
        # NBTestBase "train and test a model with the confusion matrix":
        # separable per-label docs self-classify perfectly
        rng = np.random.default_rng(3)
        rows = []
        for li, lbl in enumerate(["Cat1", "Cat2"]):
            for d in range(5):
                doc = f"/{lbl}/doc_{li}_{d}/"
                for j in range(10):
                    # each label dominates its own disjoint term block
                    tf = int(rng.integers(3, 9)) if (j // 5) == li \
                        else int(rng.integers(0, 2))
                    if tf:
                        rows.append((doc, lbl, f"t{j}", float(tf)))
        triples = spark.createDataFrame(
            rows, ["doc_id", "label", "term", "weight"])
        model = nb_train(nb_aggregate(triples), complementary=False)
        result = nb_test(model, triples)
        assert result["confusion"][("Cat1", "Cat1")] == 5
        assert result["confusion"][("Cat2", "Cat2")] == 5
        assert result["confusion"].get(("Cat1", "Cat2"), 0) == 0
        assert result["confusion"].get(("Cat2", "Cat1"), 0) == 0
        assert result["accuracy"] == 1.0

    def test_predict_tie_breaks_alphabetical(self, spark):
        # two labels with identical weights -> argmax keeps the first
        # (alphabetical) label, matching the reference argmax scan order
        mat = np.array([[1.0, 2.0], [1.0, 2.0]])
        model = nb_train(_pairs_df(spark, mat, ["b", "a"]),
                         complementary=False)
        test = spark.createDataFrame([("d0", "t0", 1.0), ("d0", "t1", 3.0)],
                                     ["doc_id", "term", "weight"])
        [p] = nb_predict(model, test).collect()
        assert p["predicted"] == "a"


class TestOracleSQL:
    def test_model_and_classify_sql_match_spark(self, spark, tmp_path):
        # mini end-to-end: tokenized docs -> train -> classify, DuckDB twin
        import duckdb

        from mahout_spark.functions.text import explode_tokens
        from mahout_spark.operators.naivebayes import (nb_classify_sql,
                                                       nb_model_sql)

        docs = [(0, "spark rows spark columns", "en"),
                (1, "der spark und der shuffle", "de"),
                (2, "rows and columns and rows", "en"),
                (3, "und der und der und", "de"),
                (4, "spark und rows der columns", "en")]
        pdf = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
        path = str(tmp_path / "docs.parquet")
        pdf.write.parquet(path)

        tok = explode_tokens(pdf, "doc_id", "text")
        triples = (tok.join(pdf.select("doc_id", "lang"), "doc_id")
                   .groupBy("doc_id", "lang", "token").count()
                   .select("doc_id", F.col("lang").alias("label"),
                           F.col("token").alias("term"),
                           F.col("count").cast("double").alias("weight")))
        for complementary in (False, True):
            model = nb_train(nb_aggregate(triples),
                             complementary=complementary)
            got = {(r["doc_id"], r["predicted"]): round(r["score"], 6)
                   for r in nb_predict(
                       model, triples.select("doc_id", "term", "weight"),
                       complementary=complementary).collect()}
            con = duckdb.connect()
            con.execute(f"CREATE VIEW documents AS "
                        f"SELECT * FROM read_parquet('{path}/*.parquet')")
            sql = nb_classify_sql("documents", complementary=complementary)
            want = {(int(r[0]), r[1]): round(float(r[2]), 6)
                    for r in con.execute(sql).fetchall()}
            assert got == want, complementary

        # model-weights oracle
        model = nb_train(nb_aggregate(triples), complementary=False)
        a = float(model.alpha)
        v = float(model.n_features)
        lw = spark.createDataFrame(
            [(l, model.label_weight(l)) for l in model.labels],
            ["label", "w_l"])
        spark_w = {(r["label"], r["term"]): r["log_weight"] for r in
                   model.pairs.join(lw, "label").select(
                       "label", "term",
                       F.round(F.log((F.col("weight") + a)
                                     / (F.col("w_l") + a * v)), 6)
                       .alias("log_weight")).collect()}
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS "
                    f"SELECT * FROM read_parquet('{path}/*.parquet')")
        want = {(r[0], r[1]): float(r[2])
                for r in con.execute(nb_model_sql("documents")).fetchall()}
        assert spark_w == want
