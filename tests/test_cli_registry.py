"""CLI twins added to close the reference program registry: describe,

transpose/matrixmult, runlogistic, seqdumper, seq2encoded,
recommenditembased, spectralkmeans, cat, resplit alias.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, expect_json=True):
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    if not expect_json:
        return out.stdout
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


class TestDescribe:
    def test_descriptor_grammar(self):
        from mahout_spark.sources.describe import generate_descriptor

        assert generate_descriptor("3 N I N N 2 C L 5 I") == \
            ["N", "N", "N", "I", "N", "N", "C", "C", "L",
             "I", "I", "I", "I", "I"]
        with pytest.raises(ValueError, match="Bad Token"):
            generate_descriptor("N X L")
        with pytest.raises(ValueError, match="must be > 0"):
            generate_descriptor("0 N L")
        with pytest.raises(ValueError, match="followed by another"):
            generate_descriptor("2 3 N L")

    def test_dataset_json(self, spark, tmp_path):
        from mahout_spark.sources.describe import describe_dataset

        p = tmp_path / "data.csv"
        p.write_text("1.5,red,yes\n2.5,blue,no\n?,red,yes\n"
                     "oops,blue,no\n3.5,green,yes\n")
        info, n = describe_dataset(spark, str(p), "N C L")
        assert n == 3  # '?' line and non-numeric line dropped
        attrs = json.loads(info)
        assert [a["type"] for a in attrs] == \
            ["numerical", "categorical", "label"]
        assert attrs[1]["values"] == ["blue", "green", "red"]
        assert attrs[2]["values"] == ["no", "yes"]
        assert [a["label"] for a in attrs] == [False, False, True]
        # regression: label must be numeric -> all rows with text label drop
        info_r, n_r = describe_dataset(spark, str(p), "N C L",
                                       regression=True)
        assert n_r == 0
        assert json.loads(info_r)[2]["values"] is None

    def test_cli(self, tmp_path):
        p = tmp_path / "d.csv"
        p.write_text("1,a,0\n2,b,1\n")
        out = tmp_path / "d.info"
        res = _run(["jobs/describe.py", "--path", str(p), "--file",
                    str(out), "--descriptor", "N", "C", "L"])
        assert res["n_rows"] == 2 and out.exists()
        assert json.loads(out.read_text())[0]["type"] == "numerical"


def test_matrix_cli(spark, tmp_path):
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    spark.createDataFrame([(0, 0, 2.0), (0, 1, 3.0), (1, 0, 4.0)],
                          "row_id long, col_id long, value double") \
        .write.parquet(str(a))
    spark.createDataFrame([(0, 0, 1.0), (1, 0, 5.0)],
                          "row_id long, col_id long, value double") \
        .write.parquet(str(b))
    rt = _run(["jobs/matrix.py", "transpose", "--input", str(a),
               "--output", str(tmp_path / "at")])
    assert rt["nnz"] == 3
    at = {(r["row_id"], r["col_id"]): r["value"] for r in
          spark.read.parquet(str(tmp_path / "at")).collect()}
    assert at[(1, 0)] == 3.0 and at[(0, 1)] == 4.0
    rm = _run(["jobs/matrix.py", "matrixmult", "--input", str(a),
               "--other", str(b), "--output", str(tmp_path / "ab")])
    # A(2x2) @ B(2x1): [[2*1+3*5], [4*1+0]] = [[17], [4]]
    ab = {(r["row_id"], r["col_id"]): r["value"] for r in
          spark.read.parquet(str(tmp_path / "ab")).collect()}
    assert ab[(0, 0)] == 17.0 and ab[(1, 0)] == 4.0
    assert rm["nnz"] == 2


def test_runlogistic_cli(spark, tmp_path):
    # linearly separable toy: label = x0 > 0
    rows = [(float(i % 2), [1.0 if i % 2 else -1.0, float(i % 3)])
            for i in range(80)]
    data = tmp_path / "lr.parquet"
    spark.createDataFrame(rows, "label double, features array<double>") \
        .write.parquet(str(data))
    model = tmp_path / "m.json"
    _run(["jobs/trainlogistic.py", "--input", str(data), "--output",
          str(model), "--categories", "2", "--passes", "5"])
    res = _run(["jobs/runlogistic.py", "--input", str(data), "--model",
                str(model)])
    assert res["auc"] > 0.95
    m = res["confusion"]
    assert m[0][0] + m[0][1] + m[1][0] + m[1][1] == 80


def test_seqdumper_cli(tmp_path):
    from mahout_spark.sources.seqfile import write_sequence_file

    blob = write_sequence_file([(i, f"v{i}") for i in range(7)],
                               "org.apache.hadoop.io.IntWritable",
                               "org.apache.hadoop.io.Text",
                               compression="block", block_records=3)
    p = tmp_path / "part-r-00000.seq"
    p.write_bytes(blob)
    txt = _run(["jobs/dump.py", "seqdumper", "--input", str(p),
                "--limit", "3"], expect_json=False)
    assert "Key: 0: Value: v0" in txt
    assert "Count: 7" in txt and "Total Count: 7" in txt
    assert "(4 more)" in txt


def test_seq2encoded_cli(spark, tmp_path):
    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, "alpha beta gamma delta"[: 10 + i]) for i in range(6)],
        "doc_id long, text string").write.parquet(str(docs))
    res = _run(["jobs/seq2sparse.py", "--input", str(docs), "--output",
                str(tmp_path / "enc"), "--encoded",
                "--cardinality", "64"])
    assert res["mode"] == "seq2encoded" and res["nnz"] > 0
    vec = spark.read.parquet(str(tmp_path / "enc" / "vectors"))
    assert set(vec.columns) == {"doc_id", "token_id", "weight"}
    assert vec.agg({"token_id": "max"}).first()[0] < 64


def test_recommenditembased_cli(spark, tmp_path):
    prefs = tmp_path / "prefs.parquet"
    rows = [(u, i, 1.0 + (u + i) % 3)
            for u in range(8) for i in range(6)
            if (u * 3 + i * 5) % 7 < 4]  # irregular partial baskets
    spark.createDataFrame(rows,
                          "user_id long, item_id long, pref double") \
        .write.parquet(str(prefs))
    res = _run(["jobs/recommenditembased.py", "--input", str(prefs),
                "--output", str(tmp_path / "recs"),
                "--similarity", "cooccurrence",
                "--num-recommendations", "3", "--min-evidence", "1"])
    assert res["n_recs"] > 0
    recs = spark.read.parquet(str(tmp_path / "recs"))
    assert set(recs.columns) == {"user_id", "item_id", "score"}
    # top-N bound respected
    per_user = recs.groupBy("user_id").count().agg({"count": "max"})
    assert per_user.first()[0] <= 3


def test_spectralkmeans_cli(spark, tmp_path):
    # two 4-cliques, weak bridge
    import itertools

    aff = []
    for base in (0, 4):
        for i, j in itertools.permutations(range(base, base + 4), 2):
            aff.append((i, j, 1.0))
    aff += [(3, 4, 0.01), (4, 3, 0.01)]
    p = tmp_path / "aff.parquet"
    spark.createDataFrame(aff, "row_id long, col_id long, value double") \
        .write.parquet(str(p))
    res = _run(["jobs/clustering.py", "spectralkmeans", "--input",
                str(p), "--output", str(tmp_path / "sc"), "-k", "2"])
    assert res["k"] == 2 and res["n"] == 8
    asg = {r["vec_id"]: r["cluster"] for r in
           spark.read.parquet(str(tmp_path / "sc" / "assignments"))
           .collect()}
    assert len({asg[i] for i in range(4)}) == 1
    assert len({asg[i] for i in range(4, 8)}) == 1
    assert asg[0] != asg[7]


def test_cat_and_registry_listing(tmp_path):
    f = tmp_path / "x.csv"
    f.write_text("a,b\n1,2\n")
    out = subprocess.run([sys.executable, "bin/mahout", "cat", str(f)],
                         capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0 and out.stdout == "a,b\n1,2\n"
    listing = subprocess.run([sys.executable, "bin/mahout"],
                             capture_output=True, text=True, cwd=REPO)
    for prog in ("describe", "transpose", "matrixmult", "runlogistic",
                 "seqdumper", "seq2encoded", "recommenditembased",
                 "spectralkmeans", "resplit", "cvb0_local", "fkmeans"):
        assert prog in listing.stdout, prog
