"""IVF ANN: recall vs brute force, and full-probe == brute force."""

import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.ann import brute_force_topk, ivf_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_ivf_recall_and_fullprobe(spark):
    emb = spark.read.parquet(EMB)
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}

    approx = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=3,
                      seed=7).toPandas()
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall
    # self always found (own cell always probed first)
    assert len(approx[approx["query_id"] == approx["neighbor_id"]]) == 8

    # probing every cell degenerates to brute force exactly
    full = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=8,
                    seed=7).toPandas()
    f = {(r.query_id, r.neighbor_id) for r in full.itertuples()}
    assert f == e
