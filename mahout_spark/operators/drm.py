"""Distributed Row Matrix algebra in long-form triples — the Samsara layer.

The reference's DRM is ``RDD[(K, Vector)]`` with a logical-plan optimizer
lowering to hand-written blas ops (SURVEY.md §2.2). Here a DRM is simply a
``DataFrame[row_id, col_id, value]`` (sparse long form — zero cells absent)
and every Samsara operator is a declarative DataFrame plan, so Catalyst+AQE
do what Mahout's 3-pass rewriter did:

- ``A.t``              → column swap (free — no shuffle at all, vs
  blas/At.scala:34-85's groupByKey);
- ``A.t %*% A``        → self-join + groupBy: the Gramian-detection rewrite
  (DistributedEngine.scala:160-161) has nothing to detect — the single-
  shuffle plan *is* the natural encoding;
- elementwise fusion   → whole-stage codegen (vs OpAewUnaryFuncFusion);
- broadcast of in-core operands → literal arrays / broadcast joins
  (vs drmBroadcast).

The in-memory "slim" A'A fast path (blas/AtA.scala:42-61, ncol <= 200)
is mirrored by ``ata_slim`` — per-partition NumPy Gramians merged on the
driver, the same partial-then-merge shape as the sketch aggregation.

Row keys may be int or string (Mahout's Int/Long/String key classes);
``rekey_seq_ints`` mirrors drm2IntKeyed (SparkEngine.scala:221-243).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRIPLE_COLS = ("row_id", "col_id", "value")


def as_drm(df: DataFrame, row: str = "row_id", col: str = "col_id",
           val: str = "value") -> DataFrame:
    """Normalize any triple DataFrame to (row_id, col_id, value:double)."""
    return df.select(F.col(row).alias("row_id"), F.col(col).alias("col_id"),
                     F.col(val).cast("double").alias("value"))


def drm_parallelize(spark, m: np.ndarray, n_partitions: int = 2) -> DataFrame:
    """In-core matrix -> DRM (drmParallelize, SparkEngine.scala:164-215)."""
    rows, cols = np.nonzero(m)
    pdf = pd.DataFrame({"row_id": rows.astype(np.int64),
                        "col_id": cols.astype(np.int64),
                        "value": m[rows, cols].astype(np.float64)})
    return spark.createDataFrame(pdf).repartition(n_partitions)


def drm_collect(drm: DataFrame, nrow: int | None = None,
                ncol: int | None = None) -> np.ndarray:
    """DRM -> dense NumPy (test oracle path; int keys only)."""
    pdf = drm.toPandas()
    nrow = nrow or int(pdf["row_id"].max()) + 1
    ncol = ncol or int(pdf["col_id"].max()) + 1
    m = np.zeros((nrow, ncol))
    m[pdf["row_id"].to_numpy(dtype=np.int64),
      pdf["col_id"].to_numpy(dtype=np.int64)] = pdf["value"].to_numpy()
    return m


# -- structure ops (shuffle-free) --------------------------------------------


def at(drm: DataFrame) -> DataFrame:
    """A.t — free column swap (OpAt)."""
    return drm.select(F.col("col_id").alias("row_id"),
                      F.col("row_id").alias("col_id"), "value")


def row_range(drm: DataFrame, start: int, end: int) -> DataFrame:
    """A(start until end, ::) — filter pushdown (OpRowRange)."""
    return drm.filter((F.col("row_id") >= start) & (F.col("row_id") < end))


def col_range(drm: DataFrame, start: int, end: int) -> DataFrame:
    return drm.filter((F.col("col_id") >= start) & (F.col("col_id") < end))


def cbind(a: DataFrame, b: DataFrame, ncol_a: int) -> DataFrame:
    """[A | B] — b's columns shifted by ncol(A) (OpCbind)."""
    return a.unionByName(b.withColumn("col_id", F.col("col_id") + ncol_a))


def cbind_scalar(a: DataFrame, ncol_a: int, value: float) -> DataFrame:
    """[A | c] — constant column appended (OpCbindScalar)."""
    const = (a.select("row_id").distinct()
             .withColumn("col_id", F.lit(ncol_a).cast(
                 a.schema["col_id"].dataType))
             .withColumn("value", F.lit(float(value))))
    return a.unionByName(const)


def rbind(a: DataFrame, b: DataFrame, nrow_a: int) -> DataFrame:
    """A over B — b's rows shifted by nrow(A) (OpRbind)."""
    return a.unionByName(b.withColumn("row_id", F.col("row_id") + nrow_a))


# -- elementwise --------------------------------------------------------------


def aew_scalar(drm: DataFrame, op: str, s: float) -> DataFrame:
    """A <op> scalar on nonzero cells (OpAewScalar map-only semantics)."""
    v = F.col("value")
    expr = {"+": v + s, "-": v - s, "*": v * s, "/": v / s,
            "^": F.pow(v, F.lit(s))}[op]
    return drm.withColumn("value", expr)


def aew_unary(drm: DataFrame, fn: str) -> DataFrame:
    """dexp/dlog/dabs/dsqrt/dsignum (drm/package.scala:190-198)."""
    v = F.col("value")
    expr = {"exp": F.exp(v), "log": F.log(v), "abs": F.abs(v),
            "sqrt": F.sqrt(v), "signum": F.signum(v)}[fn]
    return drm.withColumn("value", expr)


def aew_b(a: DataFrame, b: DataFrame, op: str) -> DataFrame:
    """A <op> B elementwise — full outer join on (row, col), absent = 0

    (OpAewB cogroup semantics, blas/AewB.scala:94). Division keeps B's
    zero cells producing null → dropped, matching sparse 0/0 = absent.
    """
    aa = a.select("row_id", "col_id", F.col("value").alias("__va"))
    bb = b.select("row_id", "col_id", F.col("value").alias("__vb"))
    j = aa.join(bb, ["row_id", "col_id"], "outer").select(
        "row_id", "col_id",
        F.coalesce(F.col("__va"), F.lit(0.0)).alias("__va"),
        F.coalesce(F.col("__vb"), F.lit(0.0)).alias("__vb"))
    va, vb = F.col("__va"), F.col("__vb")
    expr = {"+": va + vb, "-": va - vb, "*": va * vb, "/": va / vb}[op]
    return (j.withColumn("value", expr).select(*TRIPLE_COLS)
            .filter(F.col("value").isNotNull() & (F.col("value") != 0.0)))


# -- products ------------------------------------------------------------------


def ata(a: DataFrame) -> DataFrame:
    """A.t %*% A — THE cooccurrence primitive (OpAtA, blas/AtA.scala).

    Self-join on row_id then groupBy(col_a, col_b) — one shuffle on the
    join key + one on the pair key, both AQE-managed; map-side partial
    aggregation replaces Mahout's combineByKey.
    """
    l = a.select(F.col("row_id").alias("__r"), F.col("col_id").alias("row_id"),
                 F.col("value").alias("__va"))
    r = a.select(F.col("row_id").alias("__r"), F.col("col_id").alias("col_id"),
                 F.col("value").alias("__vb"))
    return (l.join(r, "__r")
            .groupBy("row_id", "col_id")
            .agg(F.sum(F.col("__va") * F.col("__vb")).alias("value")))


def ata_slim(a: DataFrame, ncol: int) -> np.ndarray:
    """Driver-merge A'A for small ncol — the blas/AtA.scala:69-125 fast

    path: per-partition dense Gramian (NumPy BLAS), summed on the driver.
    Returns the in-core ncol x ncol matrix.
    """
    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # A Gramian partial is valid only over WHOLE rows — buffer the
        # partition (rows are co-located by the repartition below), build
        # the dense row block once, one BLAS gemm. This is exactly
        # blas/AtA.scala:69-125's per-partition in-core accumulator.
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        rows, rinv = np.unique(pdf["row_id"].to_numpy(), return_inverse=True)
        block = np.zeros((len(rows), ncol))
        block[rinv, pdf["col_id"].to_numpy(dtype=np.int64)] = \
            pdf["value"].to_numpy()
        acc = block.T @ block
        yield pd.DataFrame({"g": [b""], "m": [acc.tobytes()]})

    parts = (a.repartition("row_id")
             .mapInPandas(partial, schema="g binary, m binary").collect())
    out = np.zeros((ncol, ncol))
    for r in parts:
        out += np.frombuffer(bytes(r["m"])).reshape(ncol, ncol)
    return out


def atb(a: DataFrame, b: DataFrame) -> DataFrame:
    """A.t %*% B — join rows, outer products per shared row (OpAtB)."""
    l = a.select(F.col("row_id").alias("__r"), F.col("col_id").alias("row_id"),
                 F.col("value").alias("__va"))
    r = b.select(F.col("row_id").alias("__r"), F.col("col_id").alias("col_id"),
                 F.col("value").alias("__vb"))
    return (l.join(r, "__r").groupBy("row_id", "col_id")
            .agg(F.sum(F.col("__va") * F.col("__vb")).alias("value")))


def abt(a: DataFrame, b: DataFrame) -> DataFrame:
    """A %*% B.t — join on col_id (OpABt, blas/ABt.scala)."""
    l = a.select(F.col("col_id").alias("__c"), F.col("row_id").alias("row_id"),
                 F.col("value").alias("__va"))
    r = b.select(F.col("col_id").alias("__c"), F.col("row_id").alias("col_id"),
                 F.col("value").alias("__vb"))
    return (l.join(r, "__c").groupBy("row_id", "col_id")
            .agg(F.sum(F.col("__va") * F.col("__vb")).alias("value")))


def ab(a: DataFrame, b: DataFrame) -> DataFrame:
    """A %*% B = A %*% (B.t).t (OpAB is rewritten to ABt in the reference)."""
    return abt(a, at(b))


def pairwise_inner_products(basis: DataFrame) -> DataFrame:
    """Gram matrix of the basis rows — OrthonormalityVerifier.

    math/.../OrthonormalityVerifier.java:29-46 materializes every
    slice1.dot(slice2) into a dense matrix with a nested driver loop;
    the Gram matrix IS basis %*% basis.t, so here it is one ABt join
    (zero cells absent, as everywhere in the triple encoding).  An
    orthonormal basis verifies as the identity pattern: diagonal 1,
    off-diagonal ~0.
    """
    return abt(basis, basis)


def ax(a: DataFrame, x: np.ndarray) -> DataFrame:
    """A %*% x with broadcast in-core vector (OpAx, blas/Ax.scala).

    x enters the plan as a literal array — every executor evaluates
    element lookups JVM-side; no shuffle beyond the row-sum groupBy.
    """
    xlit = F.array(*[F.lit(float(v)) for v in x])
    return (a.withColumn("__x", F.element_at(xlit, F.col("col_id").cast("int") + 1))
            .groupBy("row_id")
            .agg(F.sum(F.col("value") * F.col("__x")).alias("value"))
            .withColumn("col_id", F.lit(0).cast(a.schema["col_id"].dataType))
            .select(*TRIPLE_COLS))


def atx(a: DataFrame, x: np.ndarray) -> DataFrame:
    """A.t %*% x (OpAtx)."""
    return ax(at(a), x)


def times_incore(a: DataFrame, b: np.ndarray) -> DataFrame:
    """A %*% inCoreB — broadcast matrix multiply (OpTimesRightMatrix).

    B enters as one literal 2-D array-of-arrays; each nonzero (i, j, v)
    fans out to B's row j via posexplode (JVM-side), then ONE partial-agg
    groupBy sums per (row, out-col). Single pass, single shuffle —
    replaces the previous per-output-column aggregation union.
    """
    blit = F.array(*[F.array(*[F.lit(float(v)) for v in row]) for row in b])
    row_arr = F.element_at(blit, F.col("col_id").cast("int") + 1)
    exploded = a.select("row_id", F.col("value").alias("__v"),
                        F.posexplode(row_arr).alias("__j", "__b"))
    ctype = a.schema["col_id"].dataType
    return (exploded.groupBy("row_id", "__j")
            .agg(F.sum(F.col("__v") * F.col("__b")).alias("value"))
            .select("row_id", F.col("__j").cast(ctype).alias("col_id"),
                    "value")
            .filter(F.col("value") != 0.0))


# -- aggregates ---------------------------------------------------------------


def col_sums(a: DataFrame) -> DataFrame:
    """(col_id, value) — SparkEngine.scala:44-61's accumulate+reduce is one

    partial-agg groupBy here."""
    return a.groupBy("col_id").agg(F.sum("value").alias("value"))


def col_means(a: DataFrame, nrow: int) -> DataFrame:
    return a.groupBy("col_id").agg(
        (F.sum("value") / F.lit(float(nrow))).alias("value"))


def row_sums(a: DataFrame) -> DataFrame:
    return a.groupBy("row_id").agg(F.sum("value").alias("value"))


def row_means(a: DataFrame, ncol: int) -> DataFrame:
    return a.groupBy("row_id").agg(
        (F.sum("value") / F.lit(float(ncol))).alias("value"))


def nnz_per_column(a: DataFrame) -> DataFrame:
    """numNonZeroElementsPerColumn — exact. At 10^12 rows swap in the HLL

    sketch (sketch_by_key(col, hll)) as SURVEY §2.4 prescribes."""
    return (a.filter(F.col("value") != 0.0).groupBy("col_id")
            .agg(F.count("*").cast("double").alias("value")))


def nnz_per_row(a: DataFrame) -> DataFrame:
    return (a.filter(F.col("value") != 0.0).groupBy("row_id")
            .agg(F.count("*").cast("double").alias("value")))


def frobenius_norm(a: DataFrame) -> float:
    """sqrt(sum v^2) (SparkEngine.scala:88-94)."""
    return float(a.agg(F.sqrt(F.sum(F.col("value") * F.col("value")))
                       .alias("n")).collect()[0]["n"])


def col_mean_vars(a: DataFrame, nrow: int) -> DataFrame:
    """(col_id, mean, var) — dcolMeanVars (drm/package.scala:210-259).

    Population variance over ALL nrow cells (absent = 0):
    var = E[v^2] - mean^2 with sums over nonzeros only.
    """
    n = F.lit(float(nrow))
    return a.groupBy("col_id").agg(
        (F.sum("value") / n).alias("mean"),
        (F.sum(F.col("value") * F.col("value")) / n
         - (F.sum("value") / n) ** 2).alias("var"))


def diagv(spark, v: np.ndarray, n_partitions: int = 2) -> DataFrame:
    """diag(v) as a DRM (scalabindings/package.scala:125 DiagonalMatrix).

    Triples (i, i, v_i); zero entries stay absent (sparse form).
    """
    rows = [(int(i), int(i), float(x)) for i, x in enumerate(v)
            if float(x) != 0.0]
    return spark.createDataFrame(rows, "row_id long, col_id long, "
                                 "value double").repartition(n_partitions)


def diag_of(a: DataFrame) -> DataFrame:
    """The main diagonal of A as (col_id, value) — m.viewDiagonal()

    (MatrixOps.scala:303). Pure filter; no shuffle."""
    return (a.filter(F.col("row_id") == F.col("col_id"))
            .select("col_id", "value"))


def dcol_mean_cov(a: DataFrame, nrow: int) -> tuple[DataFrame, DataFrame]:
    """dcolMeanCov (drm/package.scala:259-285): COV(X) = E(XX') - mu mu'

    with E(XX') = (A'A)/nrow. Returns (mu DataFrame [col_id, value],
    cov DRM triples). The mu-cross-mu subtraction is distributed (the
    reference redistributes it via mapBlock for the same reason): the
    dense ncol x ncol cell grid comes from a crossJoin of the (small)
    col-means vector with itself, left-joined with the sparse Gramian.
    """
    mu = col_means(a, nrow)
    gram = ata(a)
    n = F.lit(float(nrow))
    mi = mu.select(F.col("col_id").alias("row_id"),
                   F.col("value").alias("__mi"))
    mj = mu.select("col_id", F.col("value").alias("__mj"))
    cells = mi.crossJoin(F.broadcast(mj))
    cov = (cells.join(gram, ["row_id", "col_id"], "left")
           .withColumn("value",
                       F.coalesce(F.col("value"), F.lit(0.0)) / n
                       - F.col("__mi") * F.col("__mj"))
           .select(*TRIPLE_COLS))
    return mu, cov


def dcol_mean_cov_thin(a: DataFrame, ncol: int,
                       nrow: int) -> tuple[np.ndarray, np.ndarray]:
    """dcolMeanCovThin (drm/package.scala:241-249) — thin/tall inputs:

    Gramian reduced in driver memory (ata_slim), then cov finalized
    in-core exactly as the reference: (A'A)/n - mu cross mu."""
    mu = np.zeros(ncol)
    for r in col_means(a, nrow).collect():
        mu[int(r["col_id"])] = r["value"]
    cov = ata_slim(a, ncol) / float(nrow) - np.outer(mu, mu)
    return mu, cov


def dsq_dist(a: DataFrame) -> DataFrame:
    """Pairwise squared Euclidean distances between rows (dsqDist):

    d(i,j) = |xi|^2 + |xj|^2 - 2 xi·xj via the Gramian of A.t (AA').
    Output triples (row_id=i, col_id=j, value=d), i != j, sparse-safe.
    """
    sq = row_sums(aew_scalar(a, "^", 2.0))
    gram = abt(a, a)
    si = sq.select(F.col("row_id"), F.col("value").alias("__si"))
    sj = sq.select(F.col("row_id").alias("col_id"),
                   F.col("value").alias("__sj"))
    # cross join of row norms (pairs with zero dot are absent from the
    # sparse Gramian but still have distance |xi|^2 + |xj|^2)
    pairs = si.crossJoin(sj).filter(F.col("row_id") != F.col("col_id"))
    return (pairs.join(gram, ["row_id", "col_id"], "left")
            .withColumn("value", F.col("__si") + F.col("__sj")
                        - 2.0 * F.coalesce(F.col("value"), F.lit(0.0)))
            .select(*TRIPLE_COLS))


# -- keys / sampling -----------------------------------------------------------


def global_sorted_rank(df: DataFrame, sort_cols: list,
                       out_col: str = "rank") -> DataFrame:
    """df + 0-based global rank by ``sort_cols`` — WITHOUT the

    single-partition window a naive ``row_number().over(Window.orderBy())``
    plans. Shape mirrors the reference's rekeySeqInts
    (SparkEngine.scala:221-243): range-partition on the sort key,
    per-partition sort (parallel), then zipWithIndex = per-partition
    counts -> cumulative offsets. The resulting rank is the global sorted
    rank regardless of where the range boundaries fall, so the output is
    deterministic even though boundary sampling is not.

    Fully JVM-side (no ``rdd.zipWithIndex`` Python hop): the range-
    partitioned table is pinned via ``localCheckpoint`` with its
    partition id, per-partition row counts are collected (one tiny
    action; driver state = n_partitions longs) and turned into literal
    cumulative offsets, and the rank is a per-partition-id window
    row_number plus the offset. Intended for key-dictionary-sized inputs
    (distinct keys/tokens), never the fact stream. localCheckpoint (not
    persist) because correctness depends on the SAMPLED range boundaries
    staying fixed between the count action and the rank computation: a
    truncated lineage cannot silently re-sample on recompute, and its
    blocks are garbage-collected with the DataFrame — no session-lifetime
    cache pin.
    """
    spark = df.sparkSession
    n = max(2, spark.sparkContext.defaultParallelism)
    cols = [F.col(c) if isinstance(c, str) else c for c in sort_cols]
    arranged = (df.repartitionByRange(n, *cols)
                .withColumn("__pid", F.spark_partition_id())
                .localCheckpoint(eager=True))
    pcounts = {r["__pid"]: r["count"]
               for r in arranged.groupBy("__pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(pcounts):
        offsets[pid] = acc
        acc += pcounts[pid]
    off_expr = F.lit(0).cast("long")
    for pid, off in offsets.items():
        off_expr = F.when(F.col("__pid") == pid,
                          F.lit(off).cast("long")).otherwise(off_expr)
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (arranged
            .withColumn(out_col,
                        (F.row_number().over(w) - 1 + off_expr)
                        .cast("long"))
            .drop("__pid"))


def rekey_seq_ints(a: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Re-key arbitrary row ids to dense 0..n-1 ints (drm2IntKeyed,

    SparkEngine.scala:221-243). Returns (rekeyed DRM, keymap DataFrame
    [row_id, new_id]) — keymap built with the per-partition-counts
    zipWithIndex shape (global_sorted_rank), no single-partition exchange.
    """
    keymap = global_sorted_rank(a.select("row_id").distinct(), ["row_id"],
                                out_col="new_id")
    rekeyed = (a.join(keymap, "row_id")
               .select(F.col("new_id").alias("row_id"), "col_id", "value"))
    return rekeyed, keymap


def sample_rows(a: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """drmSampleRows — deterministic hash-coin row sampling (retry-safe,

    unlike rdd.sample's per-partition RNG)."""
    coin = (F.pmod(F.xxhash64(F.col("row_id"), F.lit(seed)), F.lit(1 << 24))
            .cast("double") / F.lit(float(1 << 24)))
    ids = a.select("row_id").distinct().filter(coin < fraction)
    return a.join(ids, "row_id")


def sample_k_rows(a: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """drmSampleKRows — deterministic: k smallest row hashes."""
    ids = (a.select("row_id").distinct()
           .orderBy(F.xxhash64(F.col("row_id"), F.lit(seed)), "row_id")
           .limit(k))
    return a.join(ids, "row_id")


# -- mapBlock ------------------------------------------------------------------


def map_block(a: DataFrame, ncol: int, block_fn, out_ncol: int | None = None,
              rows_per_block: int = 1024, nrow: int | None = None) -> DataFrame:
    """mapBlock(ncol){(keys, block) => (keys, block)} — the reference's UDF

    workhorse (OpMapBlock, DrmLikeOps.scala:68-75) as Arrow batches.

    ``block_fn(keys: np.ndarray, block: np.ndarray) -> (keys, block)``
    receives a dense (rows x ncol) NumPy block per row-group and returns
    the transformed block (out_ncol columns). Rows are grouped into blocks
    by a hash bucket of row_id so block membership is deterministic.

    ``rows_per_block`` bounds the EXPECTED rows per dense block: the hash
    bucket count is ``ceil(nrow / rows_per_block)`` so executor memory per
    block stays ~rows_per_block x ncol doubles regardless of matrix height.
    Pass ``nrow`` when known; otherwise it is estimated with a cheap
    approx_count_distinct scan (±5% is fine — it only sizes buckets).
    """
    out_ncol = out_ncol or ncol
    if nrow is None:
        nrow = a.agg(F.approx_count_distinct("row_id").alias("n")) \
                .first()["n"]
    n_blocks = max(1, -(-int(nrow) // rows_per_block))
    bucket = F.pmod(F.xxhash64(F.col("row_id")), F.lit(n_blocks))
    src = a.withColumn("__blk", bucket)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows, rinv = np.unique(pdf["row_id"].to_numpy(), return_inverse=True)
        block = np.zeros((len(rows), ncol))
        block[rinv, pdf["col_id"].to_numpy(dtype=np.int64)] = \
            pdf["value"].to_numpy()
        keys2, block2 = block_fn(rows, block)
        r, c = np.nonzero(block2)
        return pd.DataFrame({"row_id": np.asarray(keys2)[r],
                             "col_id": c.astype(np.int64),
                             "value": block2[r, c]})

    rtype = a.schema["row_id"].dataType.simpleString()
    return src.groupBy("__blk").applyInPandas(
        run, schema=f"row_id {rtype}, col_id long, value double")
