"""Incremental streaming sketch maintenance == batch rebuild, byte-exact."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from mahout_spark.sketch.agg import cms_spec, sketch_by_key
from mahout_spark.sources.webpages import generate_webpages
from mahout_spark.streaming.incremental import (incremental_sketch_stream,
                                                read_sketch_store)


@pytest.mark.slow
def test_streaming_equals_batch(spark):
    from mahout_spark.functions.text import explode_tokens

    spec = cms_spec(eps=0.01, delta=0.05, seed=4)
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        store = os.path.join(tmp, "store")
        ckpt = os.path.join(tmp, "ckpt")

        def tokens_of(pages):
            return explode_tokens(pages.select("url", "lang", "text"),
                                  "url", "text").join(
                pages.select("url", "lang"), "url")

        # wave 1: 2 files
        p1 = generate_webpages(spark, 120, seed=1, partitions=2)
        tokens_of(p1).write.mode("append").parquet(src)
        out = incremental_sketch_stream(
            spark, src, store, ckpt, ["lang"], spec, key_col="token")
        assert out is not None

        # wave 2: more files arrive; second availableNow pass
        p2 = generate_webpages(spark, 80, seed=2, partitions=2)
        tokens_of(p2).write.mode("append").parquet(src)
        out = incremental_sketch_stream(
            spark, src, store, ckpt, ["lang"], spec, key_col="token")
        streamed = {r["lang"]: bytes(r["sketch"]) for r in out.collect()}

        # batch rebuild over everything
        all_toks = spark.read.parquet(src)
        batch = {r["lang"]: bytes(r["sketch"]) for r in
                 sketch_by_key(all_toks, ["lang"], spec,
                               key_col="token").collect()}
        assert streamed.keys() == batch.keys()
        for lang in batch:
            assert streamed[lang] == batch[lang]

        # replaying the same drained stream is a no-op (exactly-once)
        out2 = incremental_sketch_stream(
            spark, src, store, ckpt, ["lang"], spec, key_col="token")
        again = {r["lang"]: bytes(r["sketch"]) for r in out2.collect()}
        assert again == streamed
