"""Head-domain skew handling — the north rule's explicit requirement.

The webpage generator produces Zipf(s=1.1) domains, so the head domain
owns a large share of urls. The salted two-level merge must (1) keep the
result byte-identical to the unsalted path, and (2) spread the heavy
group's partial blobs across salt buckets so no single merge task absorbs
the whole head key.
"""

import pytest
from pyspark.sql import functions as F

from mahout_spark.sketch.agg import cms_spec, sketch_by_key
from mahout_spark.sources.webpages import generate_webpages


@pytest.fixture(scope="module")
def domain_tokens(spark):
    pages = generate_webpages(spark, 3000, seed=11, partitions=16)
    from mahout_spark.functions.text import tokens_array

    return pages.select(
        F.regexp_extract("url", r"https://(d\d+)\.", 1).alias("domain"),
        F.explode(tokens_array(F.col("text"))).alias("token")).persist()


def test_zipf_head_domain_exists(domain_tokens):
    counts = (domain_tokens.groupBy("domain").count()
              .orderBy(F.desc("count")).limit(3).collect())
    total = domain_tokens.count()
    assert counts[0]["count"] > 0.05 * total  # head domain is heavy


def test_salted_merge_bit_identical_under_skew(spark, domain_tokens):
    spec = cms_spec(eps=0.01, delta=0.05, seed=13)
    unsalted = {r["domain"]: bytes(r["sketch"]) for r in sketch_by_key(
        domain_tokens, ["domain"], spec, key_col="token", n_salt=1).collect()}
    salted = {r["domain"]: bytes(r["sketch"]) for r in sketch_by_key(
        domain_tokens, ["domain"], spec, key_col="token", n_salt=8).collect()}
    assert salted == unsalted  # merge associativity under salting


def test_salt_buckets_spread_head_key(spark, domain_tokens):
    """The salted intermediate level must fan the head group's partials
    across multiple buckets (the treeAggregate depth-2 shape)."""
    from pyspark.sql import functions as F2

    from mahout_spark.sketch.agg import cms_spec as _spec

    spec = _spec(eps=0.01, delta=0.05, seed=13)
    # reproduce the partial+salt stage: partials per batch, salt by blob
    sel = domain_tokens.select("domain",
                               F2.xxhash64("token").alias("__key"))
    pre = sel.groupBy("domain", "__key").agg(
        F2.count("*").cast("double").alias("__val"))
    # distribution proxy: hash-salt of the head domain's preagg rows
    head = (pre.groupBy("domain").count()
            .orderBy(F2.desc("count")).limit(1).collect()[0]["domain"])
    n_buckets = (pre.filter(F2.col("domain") == head)
                 .withColumn("salt", F2.pmod(F2.xxhash64("__key"), F2.lit(8)))
                 .select("salt").distinct().count())
    assert n_buckets == 8
