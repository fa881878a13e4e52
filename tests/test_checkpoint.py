"""Checkpoint/resume: preempted job resumes mid-scan and the final merged

sketch is byte-identical to a single-pass build; lineage metrics recorded
per shard; completed shards are not recomputed."""

import tempfile

import pytest
from pyspark.sql import functions as F

from mahout_spark.plans.checkpoint import CheckpointedSketchJob
from mahout_spark.sketch.agg import cms_spec, sketch_by_key
from mahout_spark.sources.webpages import generate_webpages


@pytest.fixture(scope="module")
def pages(spark):
    from mahout_spark.functions.text import explode_tokens

    df = generate_webpages(spark, 400, seed=42, partitions=4)
    return explode_tokens(df.select(F.col("url"), F.col("lang"), "text"),
                          "url", "text").join(
        df.select("url", "lang"), "url").persist()


def test_preempt_then_resume_bit_identical(spark, pages):
    spec = cms_spec(eps=0.01, delta=0.05, seed=9)
    with tempfile.TemporaryDirectory() as root:
        job1 = CheckpointedSketchJob(spark, root, "cms-lang", n_shards=6)
        out = job1.run(pages, ["lang"], spec, key_col="token",
                       shard_key="url", max_shards=2)
        assert out is None  # preempted mid-scan
        assert len(job1.completed_shards()) == 2

        # resume in a fresh job object (new "driver")
        job2 = CheckpointedSketchJob(spark, root, "cms-lang", n_shards=6)
        out = job2.run(pages, ["lang"], spec, key_col="token",
                       shard_key="url")
        assert out is not None
        assert sorted(job2.shards_computed) == [2, 3, 4, 5]  # no recompute

        resumed = {r["lang"]: bytes(r["sketch"]) for r in out.collect()}

    single = {r["lang"]: bytes(r["sketch"]) for r in
              sketch_by_key(pages, ["lang"], spec, key_col="token").collect()}
    assert resumed.keys() == single.keys()
    for lang in single:
        assert resumed[lang] == single[lang]  # byte-identical


def test_lineage_metrics_recorded(spark, pages):
    spec = cms_spec(eps=0.01, delta=0.05, seed=9)
    with tempfile.TemporaryDirectory() as root:
        job = CheckpointedSketchJob(spark, root, "j2", n_shards=4)
        out = job.run(pages, ["lang"], spec, key_col="token",
                      shard_key="url")
        assert out is not None
        lin = job.lineage().toPandas()
        assert len(lin) == 4
        assert (lin["n_rows"] > 0).all()
        assert lin["n_rows"].sum() == pages.count()
        assert (lin["sketch_md5"].str.len() == 32).all()
        assert (lin["wall_s"] > 0).all()
