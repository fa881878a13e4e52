"""cms_topk_cosine (blocked BLAS kernel) vs cms_pairwise (reference

pairwise semantics): same neighbors, cosines within float32 tolerance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions.text import explode_tokens
from mahout_spark.sketch.agg import (cms_spec_shape, sketch_by_key,
                                     sketch_per_group)
from mahout_spark.sketch.queries import cms_pairwise, cms_topk_cosine


@pytest.fixture(scope="module")
def profiles(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = explode_tokens(docs, "doc_id", "text")
    head = (toks.groupBy("token").count()
            .orderBy(F.desc("count"), "token").limit(40).select("token"))
    return sketch_per_group(
        toks.join(F.broadcast(head), "token"), ["token"],
        cms_spec_shape(4, 128, seed=2), key_col="doc_id").persist()


def test_per_group_equals_two_phase(spark, profiles):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = explode_tokens(docs, "doc_id", "text")
    head = (toks.groupBy("token").count()
            .orderBy(F.desc("count"), "token").limit(40).select("token"))
    two_phase = sketch_by_key(
        toks.join(F.broadcast(head), "token"), ["token"],
        cms_spec_shape(4, 128, seed=2), key_col="doc_id")
    a = {r["token"]: bytes(r["sketch"]) for r in profiles.collect()}
    b = {r["token"]: bytes(r["sketch"]) for r in two_phase.collect()}
    assert a == b  # same sketches byte-for-byte, either build shape


def test_topk_matches_pairwise(spark, profiles):
    k = 5
    fast = cms_topk_cosine(profiles, "token", k=k).toPandas()
    ref = cms_pairwise(profiles, "token", kind="cosine").toPandas()
    sym = {}
    for r in ref.itertuples():
        sym[(r.a, r.b)] = r.cms_cosine
        sym[(r.b, r.a)] = r.cms_cosine
    n_items = len({r.a for r in ref.itertuples()} |
                  {r.b for r in ref.itertuples()})
    items = sorted({r.item for r in fast.itertuples()})
    assert len(items) == n_items > 10
    for item in items:
        got = fast[fast["item"] == item]
        assert len(got) == k
        # every returned cosine matches the reference pairwise value
        for r in got.itertuples():
            assert abs(r.cms_cosine - sym[(item, r.neighbor)]) < 1e-4
        # and the k-th best is within fp tolerance of the true k-th best
        true_sorted = sorted((v for (a, b), v in sym.items() if a == item),
                             reverse=True)
        got_min = got["cms_cosine"].min()
        assert got_min >= true_sorted[k - 1] - 1e-4


def test_multi_block_equals_single_block(spark, profiles):
    """The blocked pair join (profile matrix split across many blocks —

    the beyond-broadcast-budget regime) returns the same top-K as the
    degenerate single-block path."""
    k = 5
    one = cms_topk_cosine(profiles, "token", k=k,
                          block_rows=10 ** 6).toPandas()
    many = cms_topk_cosine(profiles, "token", k=k, block_rows=7).toPandas()
    key = ["item", "neighbor"]
    a = one.sort_values(key).reset_index(drop=True)
    b = many.sort_values(key).reset_index(drop=True)
    # neighbor sets may differ only on exact cosine ties; values must agree
    ma = {(r.item, r.neighbor): r.cms_cosine for r in a.itertuples()}
    mb = {(r.item, r.neighbor): r.cms_cosine for r in b.itertuples()}
    assert len(ma) == len(mb)
    for kk in ma:
        if kk in mb:
            assert abs(ma[kk] - mb[kk]) < 1e-6
    # per-item k-th best cosine identical across blockings
    ka = one.groupby("item")["cms_cosine"].min()
    kb = many.groupby("item")["cms_cosine"].min()
    assert np.allclose(ka.sort_index(), kb.sort_index(), atol=1e-6)
