"""Web-page generator: determinism, skew, byte-identical extraction."""

import numpy as np

from mahout_spark.sources.webpages import (extract_text, extract_text_udf,
                                           generate_webpages, webpages_pandas)


def test_deterministic_and_schema():
    a = webpages_pandas(50, seed=42)
    b = webpages_pandas(50, seed=42)
    assert list(a.columns) == ["url", "warc_ts", "html", "text", "lang"]
    assert (a["url"] == b["url"]).all()
    assert (a["text"] == b["text"]).all()
    assert all(x == y for x, y in zip(a["html"], b["html"]))
    c = webpages_pandas(50, seed=43)
    assert (a["text"] != c["text"]).any()


def test_extraction_byte_identical():
    # input_hint invariant: text == extract_text(html), byte-for-byte
    pdf = webpages_pandas(100, seed=42)
    for html, text in zip(pdf["html"], pdf["text"]):
        assert extract_text(html).encode() == text.encode()


def test_domain_skew_is_zipf():
    pdf = webpages_pandas(2000, seed=42)
    domains = pdf["url"].str.extract(r"https://d(\d+)\.")[0].astype(int)
    counts = domains.value_counts()
    # head domain should hold far more than uniform share (2 rows)
    assert counts.iloc[0] > 20 * (2000 / 1000) / 2


def test_distributed_generation_matches_local(spark):
    df = generate_webpages(spark, 64, seed=42, partitions=8)
    got = df.toPandas().sort_values("url").reset_index(drop=True)
    want = webpages_pandas(64, seed=42).sort_values("url").reset_index(drop=True)
    assert (got["text"] == want["text"]).all()
    assert (got["lang"] == want["lang"]).all()
    # partitioning-invariance: different parallelism, same table
    df2 = generate_webpages(spark, 64, seed=42, partitions=3)
    got2 = df2.toPandas().sort_values("url").reset_index(drop=True)
    assert (got2["text"] == got["text"]).all()


def test_extract_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    df = generate_webpages(spark, 32, seed=7, partitions=2)
    bad = (df.withColumn("t2", extract_text_udf()(F.col("html")))
             .filter(F.col("t2") != F.col("text")).count())
    assert bad == 0
