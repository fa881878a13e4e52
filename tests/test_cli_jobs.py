"""Subprocess smoke tests for the spark-submit CLI twins.

Each runs a real `python jobs/<job>.py` (own JVM) on a tiny parquet —
kept to the three cheapest utilities so the suite stays fast; the
heavier CLIs (clustering, cvb, ssvd, adaptivelogistic, ...) share the
same operator code paths exercised by their operator tests.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, env=env, cwd=REPO, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.fixture(scope="module")
def tiny(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    trip = d / "triples.parquet"
    spark.createDataFrame(
        [(f"r{i}", i % 3, float(i)) for i in range(30)],
        "row_id string, col_id long, value double") \
        .write.mode("overwrite").parquet(str(trip))
    return d


def test_split_cli(tiny):
    res = _run(["jobs/split.py", "--input", str(tiny / "triples.parquet"),
                "--output", str(tiny / "split"), "--test-pct", "30"])
    assert res["train"] + res["test"] == 30
    # deterministic: rerun gives identical counts
    res2 = _run(["jobs/split.py", "--input",
                 str(tiny / "triples.parquet"),
                 "--output", str(tiny / "split2"), "--test-pct", "30"])
    assert (res["train"], res["test"]) == (res2["train"], res2["test"])


def test_rowid_cli(spark, tiny):
    res = _run(["jobs/rowid.py", "--input", str(tiny / "triples.parquet"),
                "--output", str(tiny / "rowid")])
    assert res["rows"] == 30
    ids = [r["row_id"] for r in
           spark.read.parquet(str(tiny / "rowid" / "matrix")).collect()]
    assert min(ids) == 0 and max(ids) == 29


def test_resplit_cli(tiny):
    res = _run(["jobs/split.py", "--input", str(tiny / "triples.parquet"),
                "--output", str(tiny / "resplit"), "--num-splits", "3"])
    assert sum(res["splits"].values()) == 30
    assert set(res["splits"]) == {"0", "1", "2"}


def test_curate_cli(tmp_path):
    out = str(tmp_path / "curated")
    res = _run(["jobs/curate.py",
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", out, "--no-gopher", "--scrub-pii",
                "--rates", "en=0.5,de=0.5,fr=0.5,es=0.5,zh=0.5",
                "--seed", "1"])
    assert res["counts"]["input"] == 500
    assert set(res["pii"]) == {"n_email", "n_card", "n_ipv4", "n_phone"}
    assert all(isinstance(v, int) and v >= 0 for v in res["pii"].values())
    # near-dup removal dropped something; sampling halved the rest
    assert 0 < res["counts"]["neardup"] <= 500
    assert 0 < res["counts"]["sampled"] < res["counts"]["neardup"]
    assert res["output_rows"] == res["counts"]["sampled"]
    assert json.load(open(f"{out}/RESULT.json")) == res
    # deterministic: same seed, same counts
    res2 = _run(["jobs/curate.py",
                 "--input", "/root/testdata/sf0.001/documents.parquet",
                 "--output", str(tmp_path / "c2"), "--no-gopher",
                 "--rates", "en=0.5,de=0.5,fr=0.5,es=0.5,zh=0.5",
                 "--seed", "1"])
    assert res2["counts"] == res["counts"]


def test_curate_cli_substring_dedup(tmp_path):
    res = _run(["jobs/curate.py",
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", str(tmp_path / "ss"), "--no-gopher",
                "--no-neardup", "--substring-dedup", "5", "--seed", "1"])
    assert res["counts"]["input"] == 500
    # stage keeps every doc (span removal, not doc removal) and the
    # synthetic corpus shares at least some 5-gram spans
    assert res["counts"]["substring_dedup"] == 500
    assert res["counts"]["substring_dup_units"] > 0


def test_curate_cli_decontaminate(tmp_path, spark):
    # benchmark = 15-token excerpts of 30 docs -> those docs must drop
    from pyspark.sql import functions as F

    from mahout_spark.functions.webquality import words_array

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = (docs.where(F.col("doc_id") % 17 == 0)
             .select(F.concat_ws(
                 " ", F.slice(words_array(F.col("text")), 2, 15))
                 .alias("text")))
    bpath = str(tmp_path / "bench.parquet")
    bench.write.parquet(bpath)
    res = _run(["jobs/curate.py",
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", str(tmp_path / "dc"), "--no-gopher",
                "--no-neardup", "--decontaminate", bpath,
                "--decontaminate-k", "13", "--seed", "1"])
    assert res["counts"]["input"] == 500
    n_bench_sources = docs.where(
        (F.col("doc_id") % 17 == 0)
        & (F.size(words_array(F.col("text"))) >= 14)).count()
    assert res["counts"]["decontaminate"] <= 500 - n_bench_sources
    assert res["counts"]["decontaminate"] > 400  # only excerpts hit


def test_curate_cli_dsir(tmp_path, spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tpath = str(tmp_path / "target.parquet")
    docs.where(F.col("lang") == "en").select("doc_id", "text") \
        .write.parquet(tpath)
    res = _run(["jobs/curate.py",
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", str(tmp_path / "ds"), "--no-gopher",
                "--no-neardup", "--dsir-target", tpath,
                "--dsir-k", "100", "--dsir-buckets", "1024",
                "--seed", "1"])
    assert res["counts"]["dsir"] == 100
    res2 = _run(["jobs/curate.py",
                 "--input", "/root/testdata/sf0.001/documents.parquet",
                 "--output", str(tmp_path / "ds2"), "--no-gopher",
                 "--no-neardup", "--dsir-target", tpath,
                 "--dsir-k", "100", "--dsir-buckets", "1024",
                 "--seed", "1"])
    assert res2["counts"] == res["counts"]


def test_curate_cli_lm_filter(tmp_path):
    res = _run(["jobs/curate.py",
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", str(tmp_path / "lm"), "--no-gopher",
                "--no-neardup", "--lm-filter", "0.8", "--seed", "1"])
    assert res["counts"]["input"] == 500
    # exact-percentile cut keeps ~80% (ties may round up a hair)
    assert 380 <= res["counts"]["lm_filter"] <= 410
    assert res["lm_cut"] > 0
    # deterministic re-run, and the CMS path lands in the same ballpark
    res2 = _run(["jobs/curate.py",
                 "--input", "/root/testdata/sf0.001/documents.parquet",
                 "--output", str(tmp_path / "lm2"), "--no-gopher",
                 "--no-neardup", "--lm-filter", "0.8", "--lm-cms",
                 "--seed", "1"])
    assert res2["counts"]["lm_filter"] == res["counts"]["lm_filter"]
    assert abs(res2["lm_cut"] - res["lm_cut"]) < 0.05 * res["lm_cut"]


def test_arffvector_cli(tmp_path):
    from test_arff import EXPECTED, SAMPLE

    src = tmp_path / "sample.arff"
    src.write_text(SAMPLE)
    out = str(tmp_path / "arffout")
    res = _run(["jobs/arffvector.py", "--input", str(src),
                "--output", out])
    assert res["relation"] == "test rel"
    assert res["n_attrs"] == 8
    assert res["n_cells"] == len(EXPECTED)
    model = json.load(open(f"{out}/MODEL.json"))
    assert model["nominals"]["class"]["virg,inica"] == 3


def test_seqwiki_cli(spark, tmp_path):
    from test_wikipedia import WIKI

    src = tmp_path / "dump.xml"
    src.write_text(WIKI)
    out = str(tmp_path / "wiki")
    res = _run(["jobs/seqwiki.py", "--input", str(src), "--output", out,
                "--categories", "science", "--removeLabels"])
    assert res["pages"] == 2
    rows = {r["title"]: r for r in
            spark.read.parquet(f"{out}/pages").collect()}
    assert set(rows) == {"Alpha Beta", "Gamma"}
    assert "[[Category:" not in rows["Alpha Beta"]["text"]


def test_joinsize_cli(spark, tmp_path):
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    spark.createDataFrame([(i % 7,) for i in range(200)], "k long") \
        .write.mode("overwrite").parquet(str(a))
    spark.createDataFrame([(i % 5,) for i in range(100)], "k long") \
        .write.mode("overwrite").parquet(str(b))
    res = _run(["jobs/joinsize.py", "--left", str(a), "--left-key", "k",
                "--right", str(b), "--right-key", "k",
                "--output", str(tmp_path / "js"), "--exact",
                "--width", "1024", "--depth", "9"])
    # true size: keys 0..4 shared; a has ~200/7 each, b has 20 each
    assert res["true_size"] == sum(
        (200 // 7 + (1 if k < 200 % 7 else 0)) * 20 for k in range(5))
    assert res["within_bound"] is True
    assert abs(res["join_size_est"] - res["true_size"]) <= res["err_bound"]


def test_skewplan_cli(spark, tmp_path):
    src = tmp_path / "skewed.parquet"
    rows = [("head",) for _ in range(300)] + \
           [("mid",) for _ in range(120)] + \
           [(f"t{i}",) for i in range(40)]
    spark.createDataFrame(rows, "k string") \
        .write.mode("overwrite").parquet(str(src))
    res = _run(["jobs/skewplan.py", "--input", str(src), "--key-col", "k",
                "--target", "100", "--output", str(tmp_path / "plan")])
    assert res["n_heavy_keys"] == 2
    assert res["worst_key"] == "head"
    assert res["worst_salt_factor"] == 3   # ceil(300/100)
    assert res["total_salt_tasks"] == 3 + 2
    plan = {r["k"]: r["salt_factor"] for r in spark.read.parquet(
        str(tmp_path / "plan" / "plan.parquet")).collect()}
    assert plan == {"head": 3, "mid": 2}
    # determinism: a second run regenerates the identical plan
    res2 = _run(["jobs/skewplan.py", "--input", str(src), "--key-col", "k",
                 "--target", "100", "--output", str(tmp_path / "plan2")])
    assert {k: res2[k] for k in res if k != "wall_s"} == \
           {k: res[k] for k in res if k != "wall_s"}


def test_aggplan_cli(spark, tmp_path):
    src = tmp_path / "groups.parquet"
    rows = [("head",) for _ in range(300)] + \
           [(f"g{i % 6}",) for i in range(120)]
    spark.createDataFrame(rows, "k string") \
        .write.mode("overwrite").parquet(str(src))
    res = _run(["jobs/aggplan.py", "--input", str(src), "--key-col", "k",
                "--target", "100", "--groups-per-partition", "2",
                "--max-partitions", "3",
                "--output", str(tmp_path / "aplan")])
    assert res["strategy"] == "salted_two_phase"
    assert res["n_heavy"] == 1 and res["max_salt_factor"] == 3
    assert res["n_rows"] == 420
    assert res["shuffle_partitions"] == 3          # clamped
    assert 5.0 < res["est_groups"] < 9.0           # 7 distinct keys
    # high budget + fast family -> direct, same exact fields
    res2 = _run(["jobs/aggplan.py", "--input", str(src), "--key-col", "k",
                 "--target", "100000", "--fast",
                 "--output", str(tmp_path / "aplan2")])
    assert res2["strategy"] == "direct" and res2["n_heavy"] == 0


def test_warcingest_cli(tmp_path):
    from mahout_spark.sources.warc import write_warc
    from mahout_spark.sources.webpages import webpages_pandas
    pdf = webpages_pandas(8)
    pages = [(r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
              bytes(r.html)) for r in pdf.itertuples()]
    seg = tmp_path / "segments"
    seg.mkdir()
    (seg / "a.warc").write_bytes(write_warc(pages[:5]))
    (seg / "b.warc.gz").write_bytes(
        write_warc(pages[5:], per_record_gzip=True))
    res = _run(["jobs/warcingest.py", "--input", str(seg),
                "--output", str(tmp_path / "pages.parquet")])
    assert res["rows"] == 8
    # --records keeps warcinfo rows too (one per file)
    res2 = _run(["jobs/warcingest.py", "--input", str(seg), "--records",
                 "--output", str(tmp_path / "recs.parquet")])
    assert res2["rows"] == 10


def test_lanczos_svd_cli(spark, tmp_path):
    import numpy as np
    x = (np.arange(1, 61, dtype=np.float64).reshape(12, 5) % 9) + 1
    rows = [(i, j, float(x[i, j])) for i in range(12) for j in range(5)]
    src = tmp_path / "drm.parquet"
    spark.createDataFrame(
        rows, "row_id long, col_id long, value double") \
        .write.mode("overwrite").parquet(str(src))
    out = tmp_path / "svd"
    res = _run(["jobs/lanczossvd.py", "svd", "--input", str(src),
                "--output", str(out), "--rank", "5", "--clean"])
    assert res["n_vectors"] == 5 and res["n_clean"] >= 1
    sigma = json.load(open(out / "sigma.json"))
    top = max(sigma["singular_values"])
    want = np.linalg.svd(x, compute_uv=False)[0]
    assert abs(top - want) / want < 1e-6
    # standalone cleansvd over the raw output matches the chained run
    res2 = _run(["jobs/lanczossvd.py", "cleansvd", "--input", str(src),
                 "--eigens", str(out / "rawEigenvectors"),
                 "--output", str(tmp_path / "clean")])
    assert res2["n_clean"] == res["n_clean"]
