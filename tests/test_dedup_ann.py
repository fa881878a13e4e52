"""Dedup + ANN operators: exactness vs DuckDB, LSH recall vs brute force."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.ann import (brute_force_topk,
                                        brute_force_topk_sql, lsh_topk)
from mahout_spark.operators.dedup import (exact_dedup_groups,
                                          exact_dedup_groups_sql,
                                          lsh_candidate_pairs,
                                          minhash_dedup_pairs,
                                          minhash_signatures,
                                          minhash_signatures_sql,
                                          ngram_jaccard_pairs,
                                          ngram_jaccard_pairs_sql, simhash,
                                          simhash_neardup_pairs, simhash_sql)

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


@pytest.fixture(scope="module")
def docs_dup(spark, docs):
    # append exact + near duplicates of the first few docs
    base = docs.limit(5).toPandas()
    dups = base.copy()
    dups["doc_id"] = dups["doc_id"] + 1_000_000
    near = base.copy()
    near["doc_id"] = near["doc_id"] + 2_000_000
    near["text"] = near["text"] + " extra tail token"
    pdf = pd.concat([docs.toPandas(), dups, near], ignore_index=True)
    return spark.createDataFrame(pdf)


def test_exact_dedup_matches_duckdb(spark, docs_dup):
    got = (exact_dedup_groups(docs_dup, "doc_id", "text").toPandas()
           .sort_values("fingerprint").reset_index(drop=True))
    docs_dup.toPandas().to_parquet("/tmp/docs_dup.parquet")
    want = duckdb.sql(exact_dedup_groups_sql(
        "'/tmp/docs_dup.parquet'", "doc_id", "text")).fetchdf() \
        .sort_values("fingerprint").reset_index(drop=True)
    assert len(got) >= 5
    pd.testing.assert_frame_equal(
        got, want[["fingerprint", "rep_id", "n_dups"]], check_dtype=False)


def test_minhash_signatures_match_duckdb(spark, docs):
    got = (minhash_signatures(docs, "doc_id", "text", num_perm=8, seed=3)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    want = duckdb.sql(minhash_signatures_sql(
        f"'{DOCS}'", "doc_id", "text", num_perm=8, seed=3)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_lsh_finds_near_dups(spark, docs_dup):
    pairs = minhash_dedup_pairs(docs_dup, "doc_id", "text", num_perm=16,
                                bands=4, threshold=0.5).toPandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    # exact dups must be found (identical signatures, est_jaccard = 1)
    for i in range(5):
        base = docs_dup.toPandas()["doc_id"].iloc[i]
    exact_pairs = {(d, d + 1_000_000) for d in
                   docs_dup.toPandas()["doc_id"].head(5)}
    hit = sum(1 for p in exact_pairs if p in found)
    assert hit == len(exact_pairs)


def test_ngram_jaccard_matches_duckdb(spark, docs_dup):
    got = (ngram_jaccard_pairs(docs_dup, "doc_id", "text", threshold=0.4)
           .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = duckdb.sql(ngram_jaccard_pairs_sql(
        "'/tmp/docs_dup.parquet'", "doc_id", "text", threshold=0.4)
    ).fetchdf().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["id_a"].to_numpy() == want["id_a"].to_numpy()).all()
    assert (got["jaccard"].to_numpy() == want["jaccard"].to_numpy()).all()


def test_simhash_matches_duckdb_and_finds_neardups(spark, docs_dup):
    got = (simhash(docs_dup, "doc_id", "text").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = duckdb.sql(simhash_sql("'/tmp/docs_dup.parquet'", "doc_id", "text")
                      ).fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert (got["simhash"].to_numpy() == want["simhash"].to_numpy()).all()

    pairs = simhash_neardup_pairs(docs_dup, "doc_id", "text",
                                  max_hamming=3).toPandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    exact_pairs = {(d, d + 1_000_000) for d in
                   docs_dup.toPandas()["doc_id"].head(5)}
    assert all(p in found for p in exact_pairs)
    assert (pairs[pairs.apply(
        lambda r: (r["id_a"], r["id_b"]) in exact_pairs, axis=1)]["hamming"]
        == 0).all()


def test_brute_force_topk_matches_duckdb(spark):
    emb = spark.read.parquet(EMB)
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = (brute_force_topk(emb, queries, k=5).toPandas()
           .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True))
    qsql = (f"SELECT vec_id AS query_id, embedding FROM '{EMB}' "
            f"WHERE vec_id < 3")
    want = duckdb.sql(brute_force_topk_sql(f"'{EMB}'", qsql, 5)).fetchdf() \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    assert (got["neighbor_id"].to_numpy()
            == want["neighbor_id"].to_numpy()).all()
    assert (got["score"].to_numpy() == want["score"].to_numpy()).all()


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet(EMB)
    queries = (emb.filter(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    approx = lsh_topk(emb, queries, k=5, n_planes=6, seed=7).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # self is always in own bucket -> rank-1 hit guaranteed
    self_hits = approx[approx["query_id"] == approx["neighbor_id"]]
    assert len(self_hits) == 10
