"""Sequence packing + shard planning: reconstruction, invariance, parity."""

import hashlib

import duckdb
from pyspark.sql import functions as F

from mahout_spark.operators.packing import (SEP, _order_key,
                                            pack_sequences,
                                            pack_sequences_oracle_sql,
                                            shard_assignments,
                                            shard_plan_oracle_sql,
                                            with_offsets, write_shards)

DOCS = [(i, [f"t{i}_{j}" for j in range(3 + (i * 7) % 11)])
        for i in range(40)] + [(99, [])]


def _docs_df(spark, repartition=None):
    df = spark.createDataFrame(DOCS, "doc_id long, toks array<string>")
    return df.repartition(repartition) if repartition else df


def _py_order(seed):
    """The pseudo-shuffle order the module defines."""
    def key(i):
        return (hashlib.md5(f"pack{seed}:{i}".encode()).hexdigest(), i)
    return sorted((i for i, t in DOCS if t), key=key)


def test_offsets_match_global_cumsum(spark):
    df = _docs_df(spark).withColumn("n", F.size("toks").cast("long")) \
        .filter(F.col("n") > 0)
    got = {r["doc_id"]: r["start"]
           for r in with_offsets(df, "doc_id", "n", seed=5).collect()}
    lens = {i: len(t) for i, t in DOCS}
    start, want = 0, {}
    for i in _py_order(5):
        want[i] = start
        start += lens[i]
    assert got == want


def test_pack_reconstructs_the_stream(spark):
    df = _docs_df(spark)
    packed = pack_sequences(df, "doc_id", "toks", 16, drop_last=False,
                            seed=5)
    rows = sorted(packed.collect(), key=lambda r: r["seq_id"])
    stream = [t for i in _py_order(5) for t in dict(DOCS)[i]]
    got = [t for r in rows for t in r["tokens"]]
    assert got == stream
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r["n_tokens"] == 16
    assert rows[-1]["n_tokens"] == len(stream) % 16 or 16
    # doc provenance: ids listed in offset order, spanning docs repeated
    for r in rows:
        assert r["n_docs"] == len(r["doc_ids"])


def test_drop_last_keeps_only_full_blocks(spark):
    df = _docs_df(spark)
    total = sum(len(t) for _, t in DOCS)
    full = pack_sequences(df, "doc_id", "toks", 16, drop_last=True, seed=5)
    rows = full.collect()
    assert len(rows) == total // 16
    assert all(r["n_tokens"] == 16 for r in rows)


def test_pack_partitioning_invariance(spark):
    a = pack_sequences(_docs_df(spark, 1), "doc_id", "toks", 16, seed=5)
    b = pack_sequences(_docs_df(spark, 13), "doc_id", "toks", 16, seed=5)
    ka = sorted((r["seq_id"], r["doc_ids"], r["tokens"]) for r in a.collect())
    kb = sorted((r["seq_id"], r["doc_ids"], r["tokens"]) for r in b.collect())
    assert ka == kb


def test_pack_oracle_parity(spark):
    df = _docs_df(spark)
    packed = pack_sequences(df, "doc_id", "toks", 16, drop_last=True,
                            seed=5)
    got = [(r["seq_id"], r["n_docs"], r["n_tokens"],
            hashlib.md5(",".join(map(str, r["doc_ids"])).encode())
            .hexdigest(),
            hashlib.md5(SEP.join(r["tokens"]).encode()).hexdigest())
           for r in packed.orderBy("seq_id").collect()]
    con = duckdb.connect()
    vals = ",".join(
        "(%d, [%s])" % (i, ",".join(f"'{t}'" for t in toks))
        for i, toks in DOCS)
    con.execute(f"CREATE TABLE d AS SELECT * FROM (VALUES {vals}) "
                f"t(doc_id, toks)")
    rows = con.execute(pack_sequences_oracle_sql(
        "SELECT doc_id, toks FROM d", "doc_id", "toks", 16,
        drop_last=True, seed=5)).fetchall()
    assert [tuple(r) for r in rows] == got


def test_shards_balanced_and_contiguous(spark):
    df = _docs_df(spark).filter(F.size("toks") > 0)
    sh = shard_assignments(df, "doc_id", 7, seed=2)
    rows = {r["doc_id"]: r["shard"] for r in sh.collect()}
    sizes = [list(rows.values()).count(s) for s in range(7)]
    assert max(sizes) - min(sizes) <= 1 and sum(sizes) == 40
    # contiguous in the pseudo-shuffle order
    order = _py_order(2)
    shards_in_order = [rows[i] for i in order]
    assert shards_in_order == sorted(shards_in_order)


def test_shard_plan_oracle_parity(spark):
    df = _docs_df(spark).filter(F.size("toks") > 0) \
        .withColumn("w", F.size("toks").cast("long"))
    sh = shard_assignments(df, "doc_id", 5, weight_col="w", seed=2)
    agg = (sh.groupBy("shard")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum("w").cast("long").alias("sum_weight"),
                F.md5(F.concat_ws(",", F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        F.col("__k"), F.col("doc_id").alias("i")))),
                    lambda s: s["i"].cast("string")))).alias("ids_md5"))
           .orderBy("shard"))
    got = [tuple(r) for r in agg.collect()]
    con = duckdb.connect()
    vals = ",".join(f"({i}, {len(t)})" for i, t in DOCS if t)
    con.execute(f"CREATE TABLE d AS SELECT * FROM (VALUES {vals}) "
                f"t(doc_id, w)")
    rows = con.execute(shard_plan_oracle_sql(
        "SELECT doc_id, w FROM d", "doc_id", "w", 5, seed=2)).fetchall()
    assert [tuple(r) for r in rows] == got


def test_write_shards_round_trip(spark, tmp_path):
    df = _docs_df(spark).filter(F.size("toks") > 0)
    out = str(tmp_path / "shards")
    write_shards(df, "doc_id", out, 4, seed=9)
    back = spark.read.parquet(out)
    assert back.count() == 40
    plan = {r["doc_id"]: r["shard"] for r in
            shard_assignments(df, "doc_id", 4, seed=9).collect()}
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == plan
    # partition pruning works on the shard directory layout
    one = back.filter(F.col("shard") == 2)
    assert one.count() == list(plan.values()).count(2)
