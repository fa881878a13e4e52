"""Catalog abstraction: parquet backend end-to-end + Iceberg spec parity."""

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.sources.catalog import (WEBPAGES_SPEC, Catalog,
                                          PartitionField, TableSpec,
                                          has_iceberg)


def _pages(spark, n=20):
    base = pd.Timestamp("2026-03-01")
    rows = [(f"https://ex{i % 7}.com/p{i}",
             (base + pd.Timedelta(hours=6 * i)).to_pydatetime(),
             bytes([i % 250]), f"text {i}", "en" if i % 2 else "de")
            for i in range(n)]
    return spark.createDataFrame(rows, WEBPAGES_SPEC.schema_ddl)


def test_parquet_backend_roundtrip_and_layout(spark):
    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(spark, root=tmp, fmt="parquet")
        cat.ensure_table(WEBPAGES_SPEC)
        df = _pages(spark)
        cat.write(df, WEBPAGES_SPEC, mode="overwrite")

        # physical layout: days(warc_ts) then bucket(64, url) directories
        top = os.listdir(os.path.join(tmp, "webpages"))
        assert any(d.startswith("warc_ts_day=") for d in top)
        day_dir = next(d for d in top if d.startswith("warc_ts_day="))
        sub = os.listdir(os.path.join(tmp, "webpages", day_dir))
        assert any(d.startswith("url_bucket=") for d in sub)

        got = cat.read("webpages")
        # the declared schema survives (partition columns come back too)
        base_cols = {"url", "warc_ts", "html", "text", "lang"}
        assert base_cols <= set(got.columns)
        assert got.count() == 20
        # byte-identical html payloads after the round-trip
        src = {r["url"]: bytes(r["html"]) for r in df.collect()}
        back = {r["url"]: bytes(r["html"]) for r in got.collect()}
        assert src == back

        # partition pruning: filtering on the derived day column prunes
        plan = got.filter(
            F.col("warc_ts_day") == "2026-03-01")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "warc_ts_day" in plan.split("PartitionFilters")[1][:200]


def test_iceberg_ddl_spec_parity(spark):
    ddl = WEBPAGES_SPEC.iceberg_ddl("prod.web.")
    assert ddl == ("CREATE TABLE IF NOT EXISTS prod.web.webpages "
                   "(url string, warc_ts timestamp, html binary, "
                   "text string, lang string) USING iceberg "
                   "PARTITIONED BY (days(warc_ts), bucket(64, url))")
    # identical partition DECLARATION drives both backends
    assert WEBPAGES_SPEC.partition_cols() == ["warc_ts_day", "url_bucket"]


def test_auto_falls_back_without_iceberg(spark):
    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(spark, root=tmp, fmt="auto")
        if has_iceberg(spark):
            pytest.skip("Iceberg jar present; fallback not applicable")
        assert cat.fmt == "parquet"
        with pytest.raises(RuntimeError):
            Catalog(spark, root=tmp, fmt="iceberg")


def test_maintenance_sql_names_the_table(spark):
    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(spark, root=tmp, fmt="parquet",
                      catalog_prefix="prod.web.")
        stmts = cat.maintenance_sql(WEBPAGES_SPEC)
        assert len(stmts) == 3
        assert all("prod.web.webpages" in s for s in stmts)
        assert any("expire_snapshots" in s for s in stmts)


def test_streaming_read_parquet_backend(spark):
    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(spark, root=tmp, fmt="parquet")
        cat.write(_pages(spark), WEBPAGES_SPEC, mode="overwrite")
        stream = cat.read_stream("webpages", WEBPAGES_SPEC.schema_ddl)
        assert stream.isStreaming
        out = os.path.join(tmp, "out")
        q = (stream.groupBy("lang").count().writeStream
             .format("memory").queryName("cat_stream_test")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {r["lang"]: r["count"]
               for r in spark.sql("SELECT * FROM cat_stream_test").collect()}
        assert got == {"en": 10, "de": 10}
