"""End-to-end pretraining-pipeline job (jobs/pretrain.py) + token-id layer.

The job composes individually-gated stages (curate -> BPE -> ids ->
pack -> shards); these tests pin the composition contracts: token
conservation across pack, id-range validity, drop_last semantics per
split, on-disk shard layout, and bit-identical reruns.
"""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run(args, timeout=600):
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=timeout)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pretrain") / "run1")
    res = _run(["jobs/pretrain.py", "--input", DOCS, "--output", out,
                "--no-gopher", "--no-neardup", "--merges", "8",
                "--min-count", "1", "--block-size", "64",
                "--n-shards", "2", "--seed", "1"])
    return out, res


def test_pretrain_stages_and_conservation(pipeline):
    out, res = pipeline
    st = res["stages"]
    assert st["curate"]["counts"]["input"] == 500
    assert st["tokenizer"]["n_merges"] == 8
    V = st["tokenizer"]["vocab_size"]
    assert V > 8  # merges + base chars + <unk>
    enc, pack = st["encode"], st["pack"]
    # train: drop_last -> whole blocks only, nothing but the tail lost
    assert pack["train"]["blocks"] * 64 == pack["train"]["tokens"]
    assert 0 <= enc["train"]["tokens"] - pack["train"]["tokens"] < 64
    # val/test keep their tail: every encoded token lands in a block
    for s in ("val", "test"):
        assert pack[s]["tokens"] == enc[s]["tokens"]
        assert pack[s]["n_shards"] == 1
    assert pack["train"]["n_shards"] == 2


def test_pretrain_output_layout(pipeline, spark):
    out, res = pipeline
    V = res["stages"]["tokenizer"]["vocab_size"]
    # shard directories exist per split
    for s, n in [(0, 2), (1, 1), (2, 1)]:
        p = f"{out}/packed/split={s}"
        shards = sorted(d for d in os.listdir(p) if d.startswith("shard="))
        assert shards == [f"shard={i}" for i in range(n)]
    train = spark.read.parquet(f"{out}/packed/split=0")
    # every train block is exactly block_size, ids in [0, V)
    bad = train.filter(
        (F.size("tokens") != 64)
        | F.exists("tokens", lambda t: (t < 0) | (t >= V))).count()
    assert bad == 0
    # vocab table: dense ids, <unk> last
    vocab = spark.read.parquet(f"{out}/tokenizer/vocab").collect()
    ids = sorted(r["token_id"] for r in vocab)
    assert ids == list(range(V))
    assert [r["token"] for r in vocab if r["token_id"] == V - 1] == ["<unk>"]
    # merge table round-trips through BPEModel.load
    from mahout_spark.operators.bpe import BPEModel
    model = BPEModel.load(spark, f"{out}/tokenizer/merges")
    assert len(model.merges) == 8


def test_pretrain_rerun_identical(pipeline, spark, tmp_path):
    out, res = pipeline
    out2 = str(tmp_path / "run2")
    res2 = _run(["jobs/pretrain.py", "--input", DOCS, "--output", out2,
                 "--no-gopher", "--no-neardup", "--merges", "8",
                 "--min-count", "1", "--block-size", "64",
                 "--n-shards", "2", "--seed", "1"])

    def strip_wall(d):
        if isinstance(d, dict):
            return {k: strip_wall(v) for k, v in d.items()
                    if k != "wall_s"}
        return d

    assert strip_wall(res) == strip_wall(res2)
    # block CONTENTS bit-identical, not just counts
    for s in (0, 1, 2):
        a = {r["seq_id"]: r["tokens"] for r in
             spark.read.parquet(f"{out}/packed/split={s}").collect()}
        b = {r["seq_id"]: r["tokens"] for r in
             spark.read.parquet(f"{out2}/packed/split={s}").collect()}
        assert a == b


def test_pretrain_resume_skips_and_matches(pipeline, spark):
    import shutil

    out, res = pipeline
    before = sorted((r["seq_id"], r["tokens"]) for r in
                    spark.read.parquet(f"{out}/packed/split=0").collect())
    shutil.rmtree(f"{out}/packed/split=0")
    res2 = _run(["jobs/pretrain.py", "--input", DOCS, "--output", out,
                 "--no-gopher", "--no-neardup", "--merges", "8",
                 "--min-count", "1", "--block-size", "64",
                 "--n-shards", "2", "--seed", "1", "--resume"])
    # curation + tokenizer + intact splits skipped; train repacked
    assert "curate" in res2["resumed"]
    assert "tokenizer" in res2["resumed"]
    assert {"pack/val", "pack/test"} <= set(res2["resumed"])
    assert "pack/train" not in res2["resumed"]
    # determinism: the repacked train split is byte-identical
    after = sorted((r["seq_id"], r["tokens"]) for r in
                   spark.read.parquet(f"{out}/packed/split=0").collect())
    assert before == after
    assert res2["stages"]["pack"]["train"] == \
        res["stages"]["pack"]["train"]
    # fully-resumed fast path: everything intact now, so the corpus
    # encode itself is skipped and stats come from manifest + disk
    res3 = _run(["jobs/pretrain.py", "--input", DOCS, "--output", out,
                 "--no-gopher", "--no-neardup", "--merges", "8",
                 "--min-count", "1", "--block-size", "64",
                 "--n-shards", "2", "--seed", "1", "--resume"])
    assert "encode" in res3["resumed"]
    assert {"pack/train", "pack/val", "pack/test"} <= set(res3["resumed"])
    assert res3["stages"]["pack"]["train"]["blocks"] == \
        res["stages"]["pack"]["train"]["blocks"]
    # resume across changed parameters is refused (stale shards would
    # not match the new manifest)
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    bad = subprocess.run(
        [sys.executable, "jobs/pretrain.py", "--input", DOCS,
         "--output", out, "--no-gopher", "--no-neardup", "--merges", "8",
         "--min-count", "1", "--block-size", "128", "--n-shards", "2",
         "--seed", "1", "--resume"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=120)
    assert bad.returncode != 0
    assert "refused" in bad.stderr


def test_shard_manifest_verifies_and_heals(pipeline, spark):
    """Each packed split carries a _MANIFEST.json (order-canonical
    per-shard digests); verify_shards proves integrity, and a corrupted
    split fails verification so --resume repacks it instead of silently
    reusing it."""
    import glob

    from mahout_spark.operators.packing import verify_shards

    out, res = pipeline
    for s in (0, 1, 2):
        sp = f"{out}/packed/split={s}"
        man = json.load(open(f"{sp}/_MANIFEST.json"))
        assert len(man) == res["stages"]["pack"][
            {0: "train", 1: "val", 2: "test"}[s]]["n_shards"]
        assert verify_shards(spark, sp, man, "seq_id", "tokens") == []
    # corrupt: drop one parquet part from train shard 0
    sp0 = f"{out}/packed/split=0"
    victim = glob.glob(f"{sp0}/shard=0/*.parquet")[0]
    os.remove(victim)
    man0 = json.load(open(f"{sp0}/_MANIFEST.json"))
    assert verify_shards(spark, sp0, man0, "seq_id", "tokens") != []
    before = {r["seq_id"]: r["tokens"] for r in
              spark.read.parquet(f"{out}/packed/split=1").collect()}
    res2 = _run(["jobs/pretrain.py", "--input", DOCS, "--output", out,
                 "--no-gopher", "--no-neardup", "--merges", "8",
                 "--min-count", "1", "--block-size", "64",
                 "--n-shards", "2", "--seed", "1", "--resume"])
    # the corrupted split was repacked, the intact ones were skipped
    assert "pack/train" not in res2["resumed"]
    assert {"pack/val", "pack/test"} <= set(res2["resumed"])
    assert res2["stages"]["pack"]["train"] == \
        res["stages"]["pack"]["train"]
    assert verify_shards(spark, sp0,
                         json.load(open(f"{sp0}/_MANIFEST.json")),
                         "seq_id", "tokens") == []
    after = {r["seq_id"]: r["tokens"] for r in
             spark.read.parquet(f"{out}/packed/split=1").collect()}
    assert before == after


def test_resume_heals_crash_corruptions(pipeline, spark):
    """The realistic kill-mid-write modes — truncated parquet part and
    half-written manifest JSON — must repack, not crash; a legacy
    manifest-less split is skipped AND gets its manifest backfilled."""
    import glob

    out, res = pipeline
    args = ["jobs/pretrain.py", "--input", DOCS, "--output", out,
            "--no-gopher", "--no-neardup", "--merges", "8",
            "--min-count", "1", "--block-size", "64",
            "--n-shards", "2", "--seed", "1", "--resume"]
    # truncated part file (corrupt footer)
    sp0 = f"{out}/packed/split=0"
    victim = glob.glob(f"{sp0}/shard=0/*.parquet")[0]
    blob = open(victim, "rb").read()
    open(victim, "wb").write(blob[:max(4, len(blob) // 2)])
    res2 = _run(args)
    assert "pack/train" not in res2["resumed"]
    assert res2["stages"]["pack"]["train"] == \
        res["stages"]["pack"]["train"]
    # half-written manifest JSON
    open(f"{sp0}/_MANIFEST.json", "w").write('[{"shard": 0, "n_r')
    res3 = _run(args)
    assert "pack/train" not in res3["resumed"]
    assert res3["stages"]["pack"]["train"] == \
        res["stages"]["pack"]["train"]
    # legacy layout: no manifest at all -> skipped via _SUCCESS, and
    # the manifest is backfilled for the next resume
    os.remove(f"{sp0}/_MANIFEST.json")
    res4 = _run(args)
    assert "pack/train" in res4["resumed"]
    assert res4["stages"]["pack"]["train"] == \
        res["stages"]["pack"]["train"]
    assert os.path.exists(f"{sp0}/_MANIFEST.json")


def test_pretrain_mix_stage(tmp_path, spark):
    out = str(tmp_path / "mix")
    res = _run(["jobs/pretrain.py", "--input", DOCS, "--output", out,
                "--no-gopher", "--no-neardup", "--merges", "4",
                "--min-count", "1", "--block-size", "64",
                "--n-shards", "2", "--seed", "1",
                "--mix", "en=0.6,de=0.4", "--mix-epochs", "2.0"])
    mix = res["stages"]["mix"]
    plan = {p["stratum"]: p for p in mix["plan"]}
    assert set(plan) == {"en", "de"}
    # water level: the binding stratum saturates at <= max_epochs,
    # planned token totals follow the 60/40 recipe
    assert all(0 < p["rate"] <= 2.0 for p in plan.values())
    assert plan["en"]["planned"] / plan["de"]["planned"] == \
        pytest.approx(1.5, rel=1e-9)
    # mixed train tokens ~ sum of planned (rounding = per-doc coins)
    total_planned = sum(p["planned"] for p in plan.values())
    assert abs(mix["train_tokens"] - total_planned) / total_planned < 0.1
    # packed train blocks carry the mixed stream; non-recipe langs drop
    pk = res["stages"]["pack"]["train"]
    assert pk["blocks"] * 64 == pk["tokens"]
    assert 0 <= mix["train_tokens"] - pk["tokens"] < 64


def test_pretrain_leakage_check_and_drop(tmp_path):
    out = str(tmp_path / "leak")
    res = _run(["jobs/pretrain.py", "--input", DOCS, "--output", out,
                "--no-gopher", "--no-neardup", "--merges", "4",
                "--min-count", "1", "--block-size", "64",
                "--n-shards", "2", "--seed", "1",
                "--leakage-check", "6", "--leakage-drop"])
    leak = res["stages"]["leakage"]
    assert leak["k"] == 6
    # the synthetic corpus shares short spans across docs, so the check
    # has something to find; the drop arithmetic must be exact
    assert leak["train_docs_overlapping_eval"] >= 0
    assert leak["spans"] >= leak["train_docs_overlapping_eval"]
    assert leak["train_docs_after"] == \
        leak["train_docs_before"] - leak["train_docs_overlapping_eval"]
    # encode saw the post-drop train split
    assert res["stages"]["encode"]["train"]["docs"] == \
        leak["train_docs_after"]


def test_token_ids_expr_pandas_sql_parity(spark):
    import duckdb

    from mahout_spark.operators.bpe import (bpe_encode_expr, bpe_train,
                                            build_vocab, token_ids_expr,
                                            token_ids_sql,
                                            tokens_to_ids_pandas)

    docs = spark.read.parquet(DOCS).limit(40)
    model = bpe_train(docs, "text", n_merges=6)
    enc = docs.select(
        "doc_id", bpe_encode_expr(F.col("text"), model.merges)
        .alias("tokens"))
    vocab = build_vocab(enc, "tokens")
    unk = len(vocab)
    a = {r["doc_id"]: r["ids"] for r in enc.select(
        "doc_id", token_ids_expr(F.col("tokens"), vocab, unk_id=unk)
        .alias("ids")).collect()}
    b = {r["doc_id"]: r["token_ids"] for r in
         tokens_to_ids_pandas(enc, "doc_id", "tokens", vocab,
                              unk_id=unk).collect()}
    assert a == b and all(all(0 <= i < unk for i in v)
                          for v in a.values())
    # SQL twin over the same (token array, vocab) inputs
    con = duckdb.connect()
    pdf = enc.toPandas()
    con.register("enc", pdf)
    import pandas as pd
    con.register("voc", pd.DataFrame({"token": vocab}))
    got = {r[0]: r[1] for r in con.execute(
        f"SELECT doc_id, {token_ids_sql('tokens', 'vl', unk)} "
        f"FROM enc CROSS JOIN "
        f"(SELECT list(token ORDER BY token) AS vl FROM voc) v"
    ).fetchall()}
    assert {k: list(v) for k, v in got.items()} == a
    # unseen-token branch on the SQL side too: drop one vocab entry so
    # real lookups miss (list_position NULL -> coalesce -> unk id)
    vocab2 = vocab[1:]
    unk2 = len(vocab2)
    a2 = {r["doc_id"]: r["ids"] for r in enc.select(
        "doc_id", token_ids_expr(F.col("tokens"), vocab2, unk_id=unk2)
        .alias("ids")).collect()}
    assert any(unk2 in v for v in a2.values())  # the branch fires
    con.register("voc2", pd.DataFrame({"token": vocab2}))
    got2 = {r[0]: list(r[1]) for r in con.execute(
        f"SELECT doc_id, {token_ids_sql('tokens', 'vl', unk2)} "
        f"FROM enc CROSS JOIN "
        f"(SELECT list(token ORDER BY token) AS vl FROM voc2) v"
    ).fetchall()}
    assert got2 == a2


def test_token_ids_unknown_maps_to_unk(spark):
    from mahout_spark.operators.bpe import (token_ids_expr,
                                            tokens_to_ids_pandas)

    vocab = ["a", "b"]
    df = spark.createDataFrame([(1, ["a", "zz", "b"])],
                               "doc_id long, tokens array<string>")
    exp = [0, 2, 1]
    got_e = df.select(token_ids_expr(
        F.col("tokens"), vocab, unk_id=2).alias("i")).collect()[0]["i"]
    got_p = tokens_to_ids_pandas(df, "doc_id", "tokens", vocab,
                                 unk_id=2).collect()[0]["token_ids"]
    assert got_e == exp and got_p == exp
