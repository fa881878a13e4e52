"""cmsconfig memoization, IR stats, encoded vectors, text IO edge cases."""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.core.cms import cms_shape
from mahout_spark.operators.recommender import ir_stats, most_similar_users
from mahout_spark.operators.vectorize import encoded_vectors
from mahout_spark.plans.cmsconfig import configure_groups


def test_cms_config_table_memoizes(spark):
    from mahout_spark.functions.text import explode_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = explode_tokens(docs, "doc_id", "text").join(
        docs.select("doc_id", "lang"), "doc_id")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/cmsconfig"
        cfg1 = configure_groups(spark, toks, "lang", "token",
                                dataset="docs", q=0.5, table_path=path,
                                max_width=1024).toPandas()
        assert len(cfg1) == toks.select("lang").distinct().count()
        # geometry consistent with the (delta, eps) formulas
        for r in cfg1.itertuples():
            d, w = cms_shape(r.eps, r.delta)
            assert (d, w) == (r.depth, r.width)
            assert r.u <= r.n
        # second call: nothing recomputed, same rows
        cfg2 = configure_groups(spark, toks, "lang", "token",
                                dataset="docs", q=0.5, table_path=path,
                                max_width=1024).toPandas()
        assert len(cfg2) == len(cfg1)
        a = cfg1.sort_values("group_key").reset_index(drop=True)
        b = cfg2.sort_values("group_key").reset_index(drop=True)
        assert (a["width"] == b["width"]).all()


def test_ir_stats(spark):
    recs = spark.createDataFrame(
        [(1, 10, 1.0), (1, 11, 0.9), (1, 12, 0.8),
         (2, 20, 1.0), (2, 21, 0.9)],
        "user_id long, item_id long, score double")
    relevant = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 77)],
        "user_id long, item_id long")
    row = ir_stats(recs, relevant, n=3).collect()[0]
    # user1: hits 2 of min(3, 3 relevant) -> p=2/3, recall 2/3
    # user2: hits 0 -> p=0, recall 0
    assert abs(row["precision"] - (2 / 3 + 0) / 2) < 1e-12
    assert abs(row["recall"] - (2 / 3 + 0) / 2) < 1e-12
    assert row["n_users"] == 2
    pu = {r["user_id"]: r for r in
          ir_stats(recs, relevant, n=3, per_user=True).collect()}
    assert pu[1]["hits"] == 2 and pu[1]["n_rel"] == 3
    assert pu[1]["precision_at_n"] == 2 / 3
    assert pu[2]["hits"] == 0 and pu[2]["recall_at_n"] == 0.0


def test_most_similar_users(spark):
    sims = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.5), (1, 4, 0.7), (2, 1, 0.9)],
        "user_a long, user_b long, sim double")
    top = most_similar_users(sims, 2).toPandas()
    u1 = top[top["user_a"] == 1].sort_values("sim", ascending=False)
    assert list(u1["user_b"]) == [2, 4]


def test_encoded_vectors_hash_trick(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(50)
    v = encoded_vectors(docs, dim=256)
    pdf = v.toPandas()
    assert (pdf["bucket"] >= 0).all() and (pdf["bucket"] < 256).all()
    # total mass = total token count (hashing never drops tokens)
    from mahout_spark.functions.text import token_count

    total = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    assert pdf["weight"].sum() == total
    # deterministic
    pdf2 = encoded_vectors(docs, dim=256).toPandas()
    a = pdf.sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    b = pdf2.sort_values(["doc_id", "bucket"]).reset_index(drop=True)
    assert (a["weight"] == b["weight"]).all()


def test_normalize_rows_and_dictionary(spark):
    import numpy as np

    from mahout_spark.operators.vectorize import (build_dictionary,
                                                  normalize_rows,
                                                  term_counts, tfidf)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(40)
    w = tfidf(docs, variant="mahout")
    norm = normalize_rows(w, p=2.0, val_col="weight").toPandas()
    sums = norm.groupby("doc_id")["weight"].apply(
        lambda s: float((s ** 2).sum()))
    assert np.allclose(sums.to_numpy(), 1.0, atol=1e-9)

    tc = term_counts(docs)
    d = build_dictionary(tc).toPandas().sort_values("token_id")
    assert list(d["token_id"]) == list(range(len(d)))
    # ordered by (df desc, token)
    dfs = list(d["df"])
    assert dfs == sorted(dfs, reverse=True)

    # mllib + tf variants compute
    for v in ("mllib", "tf"):
        assert tfidf(docs, variant=v).count() > 0


def test_privacy_config_to_sketch_flow(spark):
    """The CosineCM privacy flow end-to-end: per-group (delta,eps) from the
    F-measure search -> per-group CMS at that geometry -> point estimates
    within each group's own eps*N bound (the north star's 'estimates
    within eps*N @ 1-delta')."""
    import numpy as np
    from pyspark.sql import functions as F

    from mahout_spark.functions.text import explode_tokens
    from mahout_spark.plans.cmsconfig import configure_groups
    from mahout_spark.sketch.agg import cms_spec_shape, sketch_per_group
    from mahout_spark.sketch.queries import cms_point_lookup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = explode_tokens(docs, "doc_id", "text").join(
        docs.select("doc_id", "lang"), "doc_id").persist()
    with tempfile.TemporaryDirectory() as tmp:
        cfg = configure_groups(spark, toks, "lang", "token", "docs", q=0.5,
                               table_path=f"{tmp}/cfg",
                               max_width=2048).toPandas()
    for r in cfg.itertuples():
        grp = toks.filter(F.col("lang") == r.group_key)
        sk = sketch_per_group(grp.withColumn("g", F.lit(0)), ["g"],
                              cms_spec_shape(r.depth, r.width, seed=3),
                              key_col="token")
        exact = {x["token"]: x["count"] for x in
                 grp.groupBy("token").count().collect()}
        n_total = sum(exact.values())
        probe = grp.groupBy("token").count().orderBy(
            F.desc("count"), "token").limit(50).select("token")
        est = cms_point_lookup(sk.drop("g"), probe,
                               F.xxhash64(F.col("token"))).collect()
        eps = r.eps
        over = sum(1 for e in est
                   if e["cms_estimate"] > exact[e["token"]] + eps * n_total)
        under = sum(1 for e in est if e["cms_estimate"] < exact[e["token"]])
        assert under == 0
        # overestimates beyond eps*N allowed at rate < delta (plus slack)
        assert over <= max(1, int((r.delta + 0.05) * len(est))), \
            (r.group_key, over, len(est), r.delta)


def test_cooccurrence_string_row_hash_matches_exact(spark):
    """The 128-bit (2x xxhash64) pre-hash join must agree with the exact
    string join — row-key hashing is a join-speed lever, never a result
    change (collision bound ~n^2/2^129)."""
    from mahout_spark.operators.cooccurrence import cooccurrence_counts

    rows = [(f"url-{u}", i) for u in range(40) for i in range(u % 7 + 1)]
    df = spark.createDataFrame(rows, "row_id string, col_id int").distinct()
    hashed = sorted(map(tuple, cooccurrence_counts(df).collect()))
    exact = sorted(map(tuple, cooccurrence_counts(
        df, exact_row_join=True).collect()))
    assert hashed == exact
    assert len(hashed) > 0
