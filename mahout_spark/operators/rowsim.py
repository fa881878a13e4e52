"""Row-similarity with pluggable measures — the RowSimilarityJob mirror.

The reference runs 4 MR phases (mr/.../cooccurrence/RowSimilarityJob.java:
160-217): count observations per column; downsample+normalize+transpose;
pairwise partial dot products per column; similarity + top-K merge. In
DataFrame form those collapse to: row-level preprocessing (normalize /
center / binarize) -> join-on-column pair dots -> measure expression ->
Window top-K. The per-column pair generation mirrors CooccurrencesMapper
(RowSimilarityJob.java:430-455); the final expr mirrors SimilarityReducer's
``similarity(dots, normA, normB, ncols)`` (:458-502).

Scale: the column join fan-out is quadratic in column frequency — cap heavy
columns first (downsample, as the reference's ObservationsPerColumn phase);
dots groupBy((row_a,row_b)) is the one big shuffle, AQE-skew-handled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mahout_spark.functions.measures import MEASURES, Measure
from mahout_spark.operators.topk import topk_per_group


def _preprocess(triples: DataFrame, measure: Measure, row: str, col: str,
                val: str) -> DataFrame:
    df = triples.select(F.col(row).alias("row_id"), F.col(col).alias("col_id"),
                        F.col(val).cast("double").alias("value"))
    if measure.binarize:
        # matrix semantics: one cell per (row, col) — dedupe repeated
        # observations (a DRM has no duplicate cells)
        df = (df.filter(F.col("value") != 0)
              .select("row_id", "col_id").distinct()
              .withColumn("value", F.lit(1.0)))
    if measure.name == "pearson":
        # scaled centering: w = n*x - S = n*(x - mean). Scaling a row by
        # a constant doesn't change its cosine, so Pearson == cosine over
        # w — and w stays EXACT (integer arithmetic) for integer-valued
        # inputs, which makes the measure bit-replayable in the DuckDB
        # oracle (plain `x - mean` floats drift between engines in the
        # last ulp and broke hash verification; see rowsim_pearson gate)
        w = Window.partitionBy("row_id")
        df = df.withColumn(
            "value",
            F.count("*").over(w) * F.col("value") - F.sum("value").over(w))
        df = df.filter(F.col("value") != 0)
    if measure.l2_normalize:
        w = Window.partitionBy("row_id")
        norm = F.sqrt(F.sum(F.col("value") * F.col("value")).over(w))
        df = df.withColumn("value", F.col("value") / norm)
    return df


def row_similarity(triples: DataFrame, measure: str = "cosine",
                   row: str = "row_id", col: str = "col_id",
                   val: str = "value", k: int = 100,
                   threshold: float | None = None,
                   exclude_self: bool = True,
                   n_cols: int | None = None,
                   pair_mode: str = "unordered") -> DataFrame:
    """(row_a, row_b, sim) — top-K most similar rows per row under the

    chosen measure. Measures: cosine, pearson, euclidean, tanimoto,
    cityblock, loglikelihood, cooccurrence (reference's 7 plug-ins).

    ``pair_mode``: 'unordered' counts each pair once (half the pair
    shuffle) and mirrors after scoring; 'ordered' generates both
    directions up front (the pre-mirror plan, kept for interleaved A/B
    benchmarking — results are identical, see tools/ab_pairs.py).
    """
    m = MEASURES[measure]
    df = _preprocess(triples, m, row, col, val)
    if n_cols is None and measure == "loglikelihood":
        # only the LLR contingency needs the column count — don't pay a
        # distinct-count action for the other measures
        n_cols = df.select("col_id").distinct().count()
    n_cols = n_cols or 0
    df = df.persist()

    # row norms: L0 (nnz) for count-based measures, sum(v^2) otherwise —
    # computed on the PREPROCESSED values, as the reference normalizes first
    norm_col = (F.count("*").cast("double") if m.norm_is_count
                else F.sum(F.col("value") * F.col("value")))
    # pinned: consumed twice (norm_a / norm_b joins) and — exclude_self
    # aside — the two differently-aliased branches were measured to defeat
    # exchange reuse, re-running the whole norm aggregation per branch
    norms = df.groupBy("row_id").agg(norm_col.alias("norm")).persist()

    a = df.select(F.col("col_id").alias("__c"), F.col("row_id").alias("row_a"),
                  F.col("value").alias("__va"))
    b = df.select(F.col("col_id").alias("__c"), F.col("row_id").alias("row_b"),
                  F.col("value").alias("__vb"))
    # every measure is symmetric in (a, b) (the LLR contingency swaps
    # k12/k21), so compute each unordered pair ONCE (row_a < row_b) —
    # halves the fan-out of the one big shuffle — and mirror the scored
    # pairs afterwards for the per-row top-K
    unordered = pair_mode == "unordered"
    pair_filter = (F.col("row_a") < F.col("row_b") if unordered
                   else F.col("row_a") != F.col("row_b"))
    pairs = a.join(b, "__c").filter(pair_filter)
    dots = pairs.groupBy("row_a", "row_b").agg(
        F.sum(F.col("__va") * F.col("__vb")).alias("dots"))

    scored = (dots
              .join(norms.select(F.col("row_id").alias("row_a"),
                                 F.col("norm").alias("norm_a")), "row_a")
              .join(norms.select(F.col("row_id").alias("row_b"),
                                 F.col("norm").alias("norm_b")), "row_b")
              .withColumn("sim", m.similarity_expr(
                  F.col("dots"), F.col("norm_a"), F.col("norm_b"),
                  F.lit(float(n_cols)))))
    if threshold is not None:
        scored = scored.filter(F.col("sim") >= threshold)
    mirrored = scored.select("row_a", "row_b", "sim")
    if unordered:
        # mirror with ONE explode, not a self-union: a union re-executes
        # the whole upstream (pair join + dots agg) once per branch —
        # measured 17% slower than the ordered plan at sf0.1
        # (tools/ab_pairs.py); the explode emits both directions from a
        # single computation of each unordered pair
        mirrored = (scored.select(F.explode(F.array(
            F.struct(F.col("row_a"), F.col("row_b"), F.col("sim")),
            F.struct(F.col("row_b").alias("row_a"),
                     F.col("row_a").alias("row_b"), F.col("sim"))))
            .alias("__p")).select("__p.row_a", "__p.row_b", "__p.sim"))
    if not exclude_self:
        # dot(i,i) == norm_i under every preprocessing here (nnz for
        # count-based measures, sum v^2 otherwise)
        diag = norms.select(
            F.col("row_id").alias("row_a"), F.col("row_id").alias("row_b"),
            m.similarity_expr(F.col("norm"), F.col("norm"), F.col("norm"),
                              F.lit(float(n_cols))).alias("sim"))
        if threshold is not None:
            diag = diag.filter(F.col("sim") >= threshold)
        mirrored = mirrored.unionByName(diag)
    return topk_per_group(mirrored, ["row_a"], "sim", k,
                          tiebreak_cols=["row_b"]).select(
        "row_a", "row_b", "sim")
