"""Dump formatted physical plans of flagship operators to docs/PLANS.md.

Plans only — nothing executes. These are the shapes tests/test_plans.py
pins; kept in-repo so reviewers can read them without running Spark.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mahout_spark.session import get_spark  # noqa: E402


def formatted(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    spark = get_spark("plans", master="local[2]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    triples = li.select(F.col("l_orderkey").alias("row_id"),
                        F.col("l_partkey").alias("col_id"),
                        F.col("l_quantity").alias("value"))
    sections = []

    from mahout_spark.operators.rowsim import row_similarity

    sections.append((
        "row_similarity(cosine, k=10) — the reference's 4 MR phases as one "
        "declarative plan",
        "the parquet scan reads only the 3 referenced columns; the dots "
        "groupBy gets map-side partial aggregation; the only Window is the "
        "final top-K; zero Python stages",
        formatted(row_similarity(triples, "cosine", k=10))))

    from mahout_spark.functions.text import explode_tokens
    from mahout_spark.sketch.agg import cms_spec, sketch_by_key

    toks = explode_tokens(docs, "doc_id", "text")
    sections.append((
        "sketch_by_key(CMS) — two-phase mergeable aggregation",
        "JVM pre-aggregation (HashAggregate over xxhash64(token)) runs "
        "below the MapInPandas partial build: the token stream is "
        "compressed before any Arrow transfer; exactly two Python stages "
        "(partial build, per-group merge)",
        formatted(sketch_by_key(toks.withColumn("g", F.lit(0)), ["g"],
                                cms_spec(0.01, 0.05), key_col="token"))))

    from mahout_spark.operators.ann import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    sections.append((
        "brute_force_topk — corpus scanned once, queries broadcast",
        "BroadcastNestedLoopJoin with the tiny query side broadcast; dot "
        "products are zip_with/aggregate expressions inside the "
        "projection (no Python, no corpus shuffle before top-K)",
        formatted(brute_force_topk(emb, q, k=5))))

    from mahout_spark.operators.naivebayes import (nb_aggregate, nb_classify,
                                                   nb_text_triples, nb_train)

    nb_triples = nb_text_triples(docs, label_col="lang")
    model = nb_train(nb_aggregate(nb_triples), complementary=False)
    sections.append((
        "nb_classify(standard) — the classifier as a join decomposition",
        "the big join touches only the SPARSE (label, term) model pairs "
        "(zero cells fold into per-doc scalars); the label table is a "
        "broadcast; one (doc, label) aggregation; zero Python stages",
        formatted(nb_classify(
            model, nb_triples.select("doc_id", "term", "weight")))))

    import numpy as np

    from mahout_spark.operators.clustering import KMeansModel

    emb8 = emb.limit(64)
    centers = np.zeros((4, 8))
    sections.append((
        "KMeansModel.assign (small model) — whole-stage-codegen argmin",
        "centroids inlined as literals; the assignment is a pure "
        "projection (no shuffle, no Python) — the per-iteration Lloyd "
        "assignment has this same shape",
        formatted(KMeansModel(centers, 0, True, 0.0).assign(emb8))))

    from mahout_spark.operators.ann import projection_search_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    sections.append((
        "projection_search_topk — ProjectionSearch's ±searchSize ball as "
        "a banded window join",
        "range-partitioned parallel rank (global_sorted_rank pattern — "
        "no one-task-per-projection sort; building this plan runs the "
        "small rank job) ; the ball is an equi-join on (projection, band) "
        "+ an integer range "
        "filter (fan-out ≤ 4·search_size per query·projection, corpus-"
        "size independent); no cartesian, all small sides broadcast, "
        "exact re-rank is pure column math",
        formatted(projection_search_topk(emb, q, k=5, n_projections=2,
                                         search_size=8, dim=64))))

    from mahout_spark.functions.webquality import (gopher_signals_df,
                                                   line_dedup)

    sections.append((
        "gopher_signals_df — the Gopher quality/repetition filter as a "
        "map-only scan",
        "no Exchange anywhere: unit arrays materialize in chained "
        "projections (each split()/n-gram expression evaluated once per "
        "row — the naive expression form re-tokenizes per lambda element, "
        "measured 42x slower), all 20 signals + keep are one projection "
        "over attributes; zero Python stages",
        formatted(gopher_signals_df(docs.select("doc_id", "text")))))

    sections.append((
        "line_dedup — corpus-level first-occurrence line dedup in two "
        "shuffles",
        "posexplode → one hash-partition groupBy on the LINE key (the "
        "winner min-struct agg gets map-side partial aggregation; "
        "boilerplate lines collapse in the combine, no skew pile-up) → "
        "equi-join back → one reassembly groupBy by doc; no window over "
        "a low-cardinality key, no Python",
        formatted(line_dedup(docs.select("doc_id", "text"), "doc_id",
                             "text"))))

    from mahout_spark.functions.hashutil import md5_long60
    from mahout_spark.sketch.agg import (hll_spec, sketch_by_key,
                                         sketch_rollup)

    fine = sketch_by_key(
        toks.join(docs.select("doc_id", "lang", "source"), "doc_id"),
        ["lang", "source"], hll_spec(p=12, seed=1, sparse_limit=0),
        key_expr=md5_long60(F.col("token")))
    sections.append((
        "sketch_rollup — the data-cube merge never rescans the corpus",
        "levels are CHAINED: each coarser level is a groupBy + "
        "applyInPandas over the PREVIOUS level's persisted output (one "
        "row per group — bytes, not documents), so the union branches "
        "are InMemoryTableScans and the fine build executes once at "
        "runtime; the parquet-scan text inside each InMemoryRelation "
        "is the cache's build recipe, not a re-execution",
        formatted(sketch_rollup(fine, hll_spec(p=12, seed=1,
                                               sparse_limit=0),
                                ["lang", "source"]))))

    import numpy as np

    from mahout_spark.operators.pq import adc_topk, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = np.arange(4 * 4 * 16, dtype=np.float64).reshape(4, 4, 16) / 64.0
    enc = pq_encode(emb, books)
    sections.append((
        "pq_encode + adc_topk — the ANN memory-scale scan",
        "both stages are single map-only Projects over literal "
        "centroid/LUT arrays followed by one Window top-K: encoding is "
        "WholeStageCodegen (no Python, no shuffle; the 100 TB float "
        "corpus becomes m ints/row) and the ADC query touches only the "
        "codes column — m element_at lookups + an m-term addition chain",
        formatted(adc_topk(
            enc, emb.limit(1).select(F.col("vec_id").alias("query_id"),
                                     "embedding"), books, k=5))))

    from mahout_spark.plans.skewplan import salted_join, skew_plan

    plan_df = spark.createDataFrame([("head", 500, 5)],
                                    "k string, n long, salt_factor int")
    probe = docs.select(F.col("lang").alias("k"), "doc_id")
    build = docs.select(F.col("lang").alias("k"), "source").limit(100)
    sections.append((
        "salted_join — skew-join rewrite from a sketch-derived plan",
        "the plan broadcasts twice (BroadcastHashJoin on both sides — "
        "never a shuffle of the plan); the probe side salts with a pure "
        "content-hash projection, the build side explodes ONLY heavy "
        "keys (sequence(0, salt_factor-1) with factor 1 for light "
        "keys), and the final join keys on (key, salt) so no reducer "
        "owns a whole head key",
        formatted(salted_join(probe, build, "k", plan_df))))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "PLANS.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("# PLANS — physical-plan audits of the flagship operators\n\n")
        f.write("Generated by `python tools/dump_plans.py`.\n")
        for title, note, plan in sections:
            f.write(f"\n## {title}\n\n{note}\n\n```\n{plan}\n```\n")
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
