"""Similarity search over embedding columns (array<float>).

Two paths, same contract (query rows → top-k neighbors by cosine):

- ``brute_force_topk`` — exact: crossJoin + JVM-side ``zip_with``/
  ``aggregate`` dot product + Window top-k. This is the correctness
  baseline and the right plan when |queries| is small (the join broadcasts
  the query side; the corpus is scanned once, never shuffled).
- ``lsh_topk`` — sign-random-projection (Charikar) bucketing: deterministic
  hyperplanes (seeded NumPy, inlined as literals), equi-join on bucket with
  multiprobe (flip ≤1 bit) for recall, exact re-rank inside buckets. At
  10^12 rows the bucket join replaces the full scan; plane count trades
  recall for bucket size.

An IVF variant (k-means coarse quantizer) would slot in the same re-rank
frame; sign-LSH is chosen because it needs no training pass.

Dot products stay in whole-stage codegen — ``F.zip_with`` + ``F.aggregate``
fold left-to-right in array order, which DuckDB's ``list_dot_product``
(after DOUBLE[] cast) matches bit-for-bit, so the oracle can check exact
results.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mahout_spark.operators.topk import topk_per_group


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential fold (JVM, codegen-friendly)."""
    prods = F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                       lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def cosine_sql(a: str, b: str) -> str:
    return (f"{dot_sql(a, b)} / "
            f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}))")


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id: str = "query_id",
                     metric: str = "cosine") -> DataFrame:
    """(query_id, neighbor_id, score) — exact top-k, corpus scanned once.

    ``queries``: DataFrame[query_id, <vec_col>]. The query side is
    broadcast (explicitly) — the big side never shuffles before top-k.

    Per-pair work is one dot product: both norms are hoisted out of the
    |corpus| x |queries| expression (guide §1.2 "per-task work") — the
    query norm onto the broadcast side, the corpus norm onto the corpus
    row before the join. ``cosine_expr`` would otherwise recompute
    norm(corpus_vec) once per QUERY. The hoisted product keeps the exact
    IEEE expression dot/(norm_q * norm_c) of ``cosine_expr``, so scores
    are bit-identical. A narrow corpus scan (single-row-group file) is
    widened so the scoring parallelizes (guide §2.5).
    """
    from mahout_spark.plans.scaleio import widen_partitions

    q = queries.select(F.col(query_id),
                       F.col(vec_col).alias("__qv"))
    c = widen_partitions(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv")))
    if metric == "cosine":
        # cosine_expr(q, c) = dot/(norm(q) * norm(c)); precompute each
        # norm once per row instead of once per pair
        q = q.withColumn("__qn", norm_expr(F.col("__qv")))
        c = c.withColumn("__cn", norm_expr(F.col("__cv")))
        scored = (c.crossJoin(F.broadcast(q)).select(
            query_id, "neighbor_id",
            (dot_expr(F.col("__qv"), F.col("__cv"))
             / (F.col("__qn") * F.col("__cn"))).alias("score")))
    else:
        scored = (c.crossJoin(F.broadcast(q)).select(
            query_id, "neighbor_id",
            dot_expr(F.col("__qv"), F.col("__cv")).alias("score")))
    return topk_per_group(scored, [query_id], "score", k,
                          tiebreak_cols=["neighbor_id"])


def brute_force_topk_sql(corpus_table: str, queries_sql: str, k: int,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         query_id: str = "query_id") -> str:
    cos = cosine_sql(f"q.{vec_col}", f"c.{vec_col}")
    return f"""
WITH q AS ({queries_sql}),
scored AS (
  SELECT q.{query_id} AS {query_id}, c.{id_col} AS neighbor_id,
         {cos} AS score
  FROM {corpus_table} c CROSS JOIN q),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY {query_id} ORDER BY score DESC, neighbor_id) AS rn
  FROM scored)
SELECT {query_id}, neighbor_id, score FROM ranked WHERE rn <= {k}
"""


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signs_expr(vec: Column, planes: np.ndarray) -> Column:
    """int bucket id: bit j = sign(<v, plane_j>). Planes inlined as array

    literals — identical on every executor and at every cluster size.
    """
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = dot_expr(vec, plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


class IVFIndex:
    """Persisted IVF state: centroids + cell-assigned corpus.

    Build once with ``ivf_build`` (sample-trained quantizer, cell
    assignment cached/persistable), search many times with ``search`` —
    repeated query workloads never retrain or rescan. At 10^12 rows
    write ``assigned`` out partitioned by ``__cell`` so probes prune at
    the parquet source.
    """

    def __init__(self, centers: np.ndarray, assigned: DataFrame,
                 id_col: str, vec_col: str):
        self.centers = centers
        self.assigned = assigned
        self.id_col = id_col
        self.vec_col = vec_col

    def probe_cells_expr(self, vec: Column, n_probe: int) -> Column:
        """array<int> of the n_probe nearest cell ids — pure Catalyst

        (literal centroids, array_sort on (distance, cell) structs), so
        query probing is a JVM expression + join, no driver loop."""
        entries = []
        for i, c in enumerate(self.centers):
            carr = F.array(*[F.lit(float(x)) for x in c])
            d = F.aggregate(
                F.zip_with(vec.cast("array<double>"), carr,
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda acc, v: acc + v)
            entries.append(F.struct(d.alias("d"), F.lit(i).alias("c")))
        ordered = F.array_sort(F.array(*entries))
        return F.transform(F.slice(ordered, 1, n_probe), lambda s: s["c"])

    def save(self, path: str) -> None:
        """Persist the index: ``assigned`` as parquet PARTITIONED BY

        ``__cell`` (so probes prune whole cells at the source — the
        documented 10^12-row layout) plus a tiny centroid/meta table.
        """
        spark = self.assigned.sparkSession
        (self.assigned.write.mode("overwrite").partitionBy("__cell")
         .parquet(f"{path}/assigned"))
        rows = [(i, [float(x) for x in c], self.id_col, self.vec_col)
                for i, c in enumerate(self.centers)]
        (spark.createDataFrame(
            rows, "cell int, center array<double>, id_col string, "
                  "vec_col string")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))

    @classmethod
    def load(cls, spark, path: str) -> "IVFIndex":
        """Reopen a saved index; ``assigned`` scans carry the __cell

        partition column, so cell-selective joins trigger dynamic
        partition pruning (probed cells only reach the executors)."""
        meta = spark.read.parquet(f"{path}/meta").collect()
        meta.sort(key=lambda r: r["cell"])
        centers = np.stack([np.asarray(r["center"]) for r in meta])
        assigned = spark.read.parquet(f"{path}/assigned")
        return cls(centers, assigned, meta[0]["id_col"],
                   meta[0]["vec_col"])

    def search(self, queries: DataFrame, k: int = 10, n_probe: int = 4,
               query_id: str = "query_id") -> DataFrame:
        q = queries.select(
            F.col(query_id), F.col(self.vec_col).alias("__qv"),
            F.explode(self.probe_cells_expr(F.col(self.vec_col), n_probe))
            .alias("__cell"))
        cand = self.assigned.join(F.broadcast(q), "__cell")
        scored = cand.select(
            query_id, "neighbor_id",
            cosine_expr(F.col("__qv"), F.col("__cv")).alias("score"))
        return topk_per_group(scored, [query_id], "score", k,
                              tiebreak_cols=["neighbor_id"])


def ivf_build(corpus: DataFrame, n_cells: int = 16, seed: int = 7,
              id_col: str = "vec_id", vec_col: str = "embedding",
              max_iter: int = 10, max_train: int = 100_000,
              persist: bool = False) -> IVFIndex:
    """Train the coarse quantizer on a deterministic hash sample of at

    most ``max_train`` rows (KMeans needs no more to place n_cells
    centroids), assign every corpus row to its nearest cell with a pure
    Catalyst expression, and return a reusable IVFIndex.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # deterministic hash-rank sample: the max_train rows with the
    # smallest xxhash64(id) — a TakeOrderedAndProject (per-partition
    # partial top-k, no full count action; the previous corpus.count()
    # existed only to size a sample fraction)
    sample = (corpus
              .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
              .limit(max_train))
    train = sample.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])

    idx = IVFIndex(centers, None, id_col, vec_col)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        idx.probe_cells_expr(F.col(vec_col), 1)[0].alias("__cell"))
    if persist:
        assigned = assigned.persist()
    idx.assigned = assigned
    return idx


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4, seed: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id: str = "query_id",
             max_iter: int = 10) -> DataFrame:
    """One-shot IVF search (build + search); for repeated query workloads

    build the index once with ``ivf_build`` and call ``.search()``."""
    idx = ivf_build(corpus, n_cells=n_cells, seed=seed, id_col=id_col,
                    vec_col=vec_col, max_iter=max_iter)
    return idx.search(queries, k=k, n_probe=n_probe, query_id=query_id)


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 8, seed: int = 7, probe_bits: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id: str = "query_id", dim: int | None = None) -> DataFrame:
    """Approximate top-k: candidates from matching sign-LSH buckets

    (multiprobe: all buckets within ``probe_bits`` sign flips), exact
    cosine re-rank within candidates. probe_bits trades candidate count
    for recall; probe_bits = n_planes degenerates to brute force.
    Pass ``dim`` explicitly to keep the plan free of the ``first()``
    dimensionality probe (an extra job at plan-build time).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("__cv"),
                      signs_expr(F.col(vec_col), planes).alias("__b"))
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"),
                       signs_expr(F.col(vec_col), planes).alias("__b0"))
    masks = [0]
    if probe_bits >= 1:
        masks += [1 << j for j in range(n_planes)]
    if probe_bits >= 2:
        masks += [(1 << i) | (1 << j)
                  for i in range(n_planes) for j in range(i + 1, n_planes)]
    probes = F.array(*[F.col("__b0").bitwiseXOR(F.lit(m)) for m in masks])
    q = q.withColumn("__b", F.explode(probes))
    cand = c.join(F.broadcast(q.select(query_id, "__qv", "__b").distinct()),
                  "__b")
    scored = cand.select(
        query_id, "neighbor_id",
        cosine_expr(F.col("__qv"), F.col("__cv")).alias("score")).distinct()
    return topk_per_group(scored, [query_id], "score", k,
                          tiebreak_cols=["neighbor_id"])


def _basis_normal(dim: int, n_projections: int, seed: int) -> np.ndarray:
    """RandomProjector.generateBasisNormal twin: gaussian rows, each

    normalized to unit length — deterministic (seeded NumPy, inlined as
    literals) instead of the reference's java Random."""
    rng = np.random.default_rng(seed)
    b = rng.standard_normal((n_projections, dim))
    return b / np.linalg.norm(b, axis=1, keepdims=True)


def projection_search_topk(corpus: DataFrame, queries: DataFrame,
                           k: int = 10, n_projections: int = 4,
                           search_size: int = 10, seed: int = 23,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           query_id: str = "query_id",
                           metric: str = "euclidean",
                           dim: int | None = None) -> DataFrame:
    """(query_id, neighbor_id, distance|score) — ProjectionSearch

    (math/neighborhood/ProjectionSearch.java:40-120: project onto
    ``n_projections`` random unit vectors; per projection take the
    ``search_size`` corpus vectors on EACH side of the query's scalar
    projection; union candidates; exact re-rank). FastProjectionSearch
    (.java — same data structure with lazily-merged pending adds) has
    identical query semantics, so this operator covers both.

    Distributed shape — exact, no per-query driver work:
    1. one projection pass each side (dot with literal basis rows);
    2. per-projection cumulative corpus ranks via RANGE partitioning on
       (projection, scalar) + a per-partition window + literal offsets
       (the global_sorted_rank pattern, drm.py): the sort parallelizes
       across the whole cluster instead of one task per projection, so
       the rank phase survives corpora that do not fit one executor;
       the offsets are exact integers, so partition boundaries cannot
       change the result;
    3. the ±search_size ball becomes a BANDED equi-join: corpus rows
       carry band = (rank-1) div search_size, each query probes its ≤4
       adjacent bands, then the exact rank range filters — join fan-out
       is ≤ 4·search_size per (query, projection), independent of
       corpus size;
    4. distinct candidates, exact distance, Window top-k.
    Everything is JVM column math; ranks are integers, so the candidate
    set — and with a deterministic measure the full result — is
    bit-reproducible (DuckDB-replayable; gate projection_search_topk).
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    basis = _basis_normal(dim, n_projections, seed)
    s = int(search_size)

    def proj_rows(df, idc, tag):
        projs = F.array(*[
            dot_expr(F.col(vec_col),
                     F.array(*[F.lit(float(x)) for x in b]))
            for b in basis])
        return (df.select(F.col(idc).alias("__id"),
                          projs.alias("__ps"))
                .select("__id", F.posexplode("__ps").alias("__p", "__proj"))
                .withColumn("__tag", F.lit(tag)))

    from pyspark.sql import Window

    both = proj_rows(corpus, id_col, 0).unionByName(
        proj_rows(queries, query_id, 1))
    # range-partition on the full sort key so every executor sorts a
    # slice (one window per projection would funnel the WHOLE corpus
    # through n_projections tasks); localCheckpoint pins the sampled
    # range boundaries AND serves both downstream branches (without it
    # the projection pass executed twice — plan audit)
    spark = corpus.sparkSession
    n_part = max(2, spark.sparkContext.defaultParallelism)
    sort_cols = [F.col("__p"), F.col("__proj"), F.col("__tag"),
                 F.col("__id")]
    arranged = (both.repartitionByRange(n_part, *sort_cols)
                .withColumn("__pid", F.spark_partition_id())
                .localCheckpoint(eager=True))
    # corpus-row counts per (partition, projection) -> exact cumulative
    # offsets; tiny driver state (n_part x n_projections longs)
    counts = (arranged.groupBy("__pid", "__p")
              .agg(F.sum(1 - F.col("__tag")).alias("n")).collect())
    by_p: dict = {}
    for r in counts:
        by_p.setdefault(int(r["__p"]), []).append(
            (int(r["__pid"]), int(r["n"])))
    off_expr = F.lit(0).cast("long")
    for p, lst in by_p.items():
        acc = 0
        for pid, n in sorted(lst):
            if acc:
                off_expr = F.when((F.col("__p") == p)
                                  & (F.col("__pid") == pid),
                                  F.lit(acc).cast("long")).otherwise(
                    off_expr)
            acc += n
    w = (Window.partitionBy("__pid", "__p")
         .orderBy("__proj", "__tag", "__id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pos = arranged.withColumn(
        "__crank", F.sum(1 - F.col("__tag")).over(w) + off_expr)
    c_side = (pos.filter(F.col("__tag") == 0)
              .select(F.col("__p"), F.col("__id").alias("neighbor_id"),
                      F.col("__crank").alias("__r"))
              .withColumn("__band",
                          F.floor((F.col("__r") - 1) / F.lit(s))))
    q_side = (pos.filter(F.col("__tag") == 1)
              .select(F.col("__p"), F.col("__id").alias(query_id),
                      F.col("__crank").alias("__q")))
    lo = F.col("__q") - F.lit(s) + 1
    hi = F.col("__q") + F.lit(s)
    bands = F.array_distinct(F.array(
        F.floor((lo - 1) / F.lit(s)), F.floor((F.col("__q")) / F.lit(s)),
        F.floor((hi - 1) / F.lit(s))))
    q_side = (q_side.withColumn("__band", F.explode(bands))
              .withColumn("__lo", lo).withColumn("__hi", hi))
    cand = (c_side.join(q_side, ["__p", "__band"])
            .filter((F.col("__r") >= F.col("__lo"))
                    & (F.col("__r") <= F.col("__hi")))
            .select(query_id, "neighbor_id").distinct())
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("__cv"))
    qv = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    pairs = cand.join(cv, "neighbor_id").join(qv, query_id)
    if metric == "cosine":
        scored = pairs.select(
            query_id, "neighbor_id",
            cosine_expr(F.col("__qv"), F.col("__cv")).alias("score"))
        return topk_per_group(scored, [query_id], "score", k,
                              tiebreak_cols=["neighbor_id"])
    d = F.sqrt(F.aggregate(
        F.zip_with(F.col("__qv").cast("array<double>"),
                   F.col("__cv").cast("array<double>"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v))
    scored = pairs.select(query_id, "neighbor_id", d.alias("distance"))
    return topk_per_group(scored, [query_id], "distance", k,
                          tiebreak_cols=["neighbor_id"], descending=False)
