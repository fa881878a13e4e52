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


def test_ivf_index_reuse(spark):
    """ivf_build trains ONCE; repeated .search() calls reuse the quantizer

    and cell assignment (no retrain, no driver-side query loop)."""
    from mahout_spark.operators.ann import ivf_build

    emb = spark.read.parquet(EMB)
    idx = ivf_build(emb, n_cells=8, seed=7, persist=True)
    try:
        q1 = (emb.filter(F.col("vec_id") < 4)
              .select(F.col("vec_id").alias("query_id"), "embedding"))
        q2 = (emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 8))
              .select(F.col("vec_id").alias("query_id"), "embedding"))
        r1 = idx.search(q1, k=5, n_probe=8).toPandas()
        r2 = idx.search(q2, k=5, n_probe=8).toPandas()
        exact = brute_force_topk(
            emb, q1.unionByName(q2), k=5).toPandas()
        e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
        got = {(r.query_id, r.neighbor_id) for r in r1.itertuples()} | \
              {(r.query_id, r.neighbor_id) for r in r2.itertuples()}
        assert got == e  # full probe == brute force, across two searches
        # one-shot plan must not contain a Python-side query loop: probing
        # is a join against the assigned corpus
        plan = idx.search(q1, k=5, n_probe=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Join" in plan
    finally:
        idx.assigned.unpersist()


def test_ivf_save_load_roundtrip_and_pruning(spark, tmp_path):
    """save -> load gives identical search results, the on-disk layout

    is partitioned by cell, and a cell-selective filter prunes
    partitions at the parquet source (the probed-cells-only read)."""
    import os

    from mahout_spark.operators.ann import IVFIndex, ivf_build

    emb = spark.read.parquet(EMB)
    idx = ivf_build(emb, n_cells=8, seed=7)
    path = str(tmp_path / "ivf_index")
    idx.save(path)
    back = IVFIndex.load(spark, path)

    assert (back.centers == idx.centers).all()
    assert back.id_col == idx.id_col and back.vec_col == idx.vec_col

    q = (emb.filter(F.col("vec_id") < 6)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    want = idx.search(q, k=5, n_probe=3).toPandas() \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    got = back.search(q, k=5, n_probe=3).toPandas() \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    assert got.equals(want)

    # physical layout: one directory per cell
    cells = [d for d in os.listdir(f"{path}/assigned")
             if d.startswith("__cell=")]
    assert len(cells) == 8

    # partition pruning: a static cell filter reaches the scan as a
    # PartitionFilter (reads probed cells only, not the corpus)
    plan = (back.assigned.filter(F.col("__cell").isin([1, 2]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan
    assert "__cell" in plan.split("PartitionFilters", 1)[1][:200]
