"""Product quantization (Jégou, Douze, Schmid, TPAMI 2011) — the ANN
memory-scale path that pairs with the IVF index.

At 10^9-10^12 vectors the float corpus itself is the bottleneck (64-dim
float32 = 256 B/vector → 256 TB at 10^12); PQ stores m uint8 codes per
vector (m bytes) and answers top-k with asymmetric distance computation
(ADC): the query stays exact, each corpus vector is approximated by the
concatenation of its per-subspace centroids, and the distance is a sum
of m table lookups — no float vector is ever touched at query time.

Spark-first shapes:

- ``pq_train`` — per-subspace Lloyd k-means, driver-side NumPy over the
  same deterministic hash-rank sample ``ivf_build`` uses (ksub
  centroids per subspace need no more data; TakeOrderedAndProject, no
  count). Deterministic: hash-ranked init, fixed iterations, float64 —
  retries and reruns yield identical codebooks.
- ``pq_encode`` — one map-only scan: per subspace, squared distance to
  each centroid (functions/distance.py's zip_with/aggregate fold over a
  ``slice`` of the vector, centroids inlined as literals) and
  first-min ``array_position`` argmin (ties → lowest code, the same
  rule DuckDB's list_position replays). Output: (id, codes array<int>)
  — the 100 TB corpus becomes an m-byte-per-row table.
- ``adc_topk`` — queries are collected (bounded, like every query side
  in operators/ann.py), their per-subspace LUTs computed driver-side
  with the SAME sequential fold both engines use and inlined as
  literals; the scan computes dist = Σ_j lut_j[code_j] as an explicit
  j-ordered addition chain (bit-exact replayable: the SQL twin
  recomputes each per-j term from the same subvectors and sums in j
  order), then the usual Window top-k with (dist asc, id) tiebreak.

Exactness contract for the oracle gates: with codebooks taken from
corpus rows (fixed, like the semdedup/cluster_classify literal-center
gates), every distance is the identical IEEE fold in both engines, so
codes, ADC distances, and rankings are hash-exact with no rounding.
Training quality (quantization error shrinks, recall vs brute force) is
pytest territory, mirroring how the IVF quantizer is tested.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mahout_spark.functions.distance import distance_sql, squared_euclidean
from mahout_spark.operators.topk import topk_per_group


def _check_shape(codebooks: np.ndarray) -> tuple[int, int, int]:
    cb = np.asarray(codebooks, dtype=np.float64)
    if cb.ndim != 3:
        raise ValueError("codebooks must be (m, ksub, dsub)")
    return cb.shape


def _sq_seq(a: np.ndarray, b: np.ndarray) -> float:
    """Sequential left-fold squared distance — the exact operation order
    of zip_with+aggregate (Spark) and list_sum(list_transform) (DuckDB),
    so driver-computed LUT literals match engine-computed terms."""
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc = acc + d * d
    return acc


def pq_train(corpus: DataFrame, m: int = 8, ksub: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_iter: int = 10, max_train: int = 65_536,
             seed: int = 7) -> np.ndarray:
    """-> codebooks (m, ksub, dsub) — per-subspace Lloyd k-means on a

    deterministic hash-rank sample (the ``max_train`` rows with the
    smallest xxhash64(id, seed); TakeOrderedAndProject, no count
    action). Init = the first ksub sampled subvectors in hash-rank
    order; empty clusters keep their previous centroid (standard Lloyd
    degeneracy rule, deterministic)."""
    sample = (corpus
              .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
              .limit(max_train)
              .select(F.col(vec_col).cast("array<double>").alias("v")))
    x = np.array([r["v"] for r in sample.collect()], dtype=np.float64)
    if x.ndim != 2 or x.shape[0] < ksub:
        raise ValueError(f"need >= ksub={ksub} training vectors")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        centers = sub[:ksub].copy()
        for _ in range(max_iter):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    centers[c] = sub[mask].mean(axis=0)
        books[j] = centers
    return books


def _dists_expr(vec: Column, book_j: np.ndarray, j: int,
                dsub: int) -> Column:
    """array<double> of sqdist(subvec_j, centroid_c) for every c."""
    sub = F.slice(vec.cast("array<double>"), j * dsub + 1, dsub)
    return F.array(*[
        squared_euclidean(sub, F.array(*[F.lit(float(v)) for v in c]))
        for c in book_j])


def pq_encode(corpus: DataFrame, codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """-> DataFrame[id_col, codes array<int>] — one map-only scan, all

    JVM expressions (centroid literals; no UDF, no shuffle). The
    per-subspace distance arrays are materialized in a CHAINED
    projection so the argmin's array_position(d, array_min(d)) reads an
    attribute instead of duplicating ksub aggregate expressions — the
    webquality lesson: at production ksub=256, m=16 the naive form
    carries 2*m*ksub higher-order folds and the chained form m*ksub."""
    m, ksub, dsub = _check_shape(codebooks)
    with_d = corpus.select(
        F.col(id_col),
        *[_dists_expr(F.col(vec_col), codebooks[j], j, dsub)
          .alias(f"__d{j}") for j in range(m)])
    codes = F.array(*[
        (F.array_position(F.col(f"__d{j}"), F.array_min(F.col(f"__d{j}")))
         - 1).cast("int")
        for j in range(m)])
    return with_d.select(F.col(id_col), codes.alias("codes"))


def adc_topk(encoded: DataFrame, queries: DataFrame,
             codebooks: np.ndarray, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id: str = "query_id") -> DataFrame:
    """(query_id, neighbor_id, adc_dist) — asymmetric-distance top-k

    over the codes table. The query side is collected (bounded — the
    same contract as brute_force_topk's broadcast) and each query's
    m x ksub LUT is inlined as literals; the corpus-side scan does m
    array lookups + an m-term addition chain per row, never touching a
    float vector."""
    m, ksub, dsub = _check_shape(codebooks)
    qrows = queries.select(query_id,
                           F.col(vec_col).cast("array<double>")
                           .alias("__qv")).collect()
    if not qrows:
        raise ValueError("adc_topk needs at least one query row")
    per_query = []
    for r in qrows:
        qv = np.asarray(r["__qv"], dtype=np.float64)
        if len(qv) != m * dsub:
            raise ValueError("query dim != m * dsub")
        luts = [
            F.array(*[F.lit(_sq_seq(qv[j * dsub:(j + 1) * dsub],
                                    codebooks[j][c]))
                      for c in range(ksub)])
            for j in range(m)]
        dist = reduce(
            lambda acc, j: acc + F.element_at(
                luts[j], F.col("codes")[j] + F.lit(1)),
            range(m), F.lit(0.0))
        per_query.append(encoded.select(
            F.lit(r[query_id]).alias(query_id),
            F.col(id_col).alias("neighbor_id"),
            dist.alias("adc_dist")))
    scored = reduce(lambda a, b: a.unionByName(b), per_query)
    return topk_per_group(scored, [query_id], "adc_dist", k,
                          descending=False, tiebreak_cols=["neighbor_id"])


# ---------------------------------------------------------------------------
# DuckDB twins — codebooks derived from corpus rows (gate form)
# ---------------------------------------------------------------------------


def _subspaces_sql(m: int, dsub: int) -> str:
    rows = ", ".join(f"({j}, {j * dsub + 1}, {(j + 1) * dsub})"
                     for j in range(m))
    return f"(VALUES {rows}) AS __sp(j, lo, hi)"


def pq_encode_sql(corpus_sql: str, codebook_sql: str, m: int, dsub: int,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> str:
    """DuckDB replay of pq_encode where the codebooks are themselves
    derived from table rows: ``codebook_sql`` must yield (c, j, cb) —
    0-based centroid index, subspace, DOUBLE[] centroid. Argmin =
    ORDER BY (dist, c) LIMIT 1 == Spark's first-min array_position."""
    sq = distance_sql("squared", "s.sub", "b.cb")
    return f"""
WITH __pq_corpus AS ({corpus_sql}),
__pq_book AS ({codebook_sql}),
__pq_subs AS (
  SELECT {id_col}, j,
         ({vec_col}::DOUBLE[])[lo:hi] AS sub
  FROM __pq_corpus CROSS JOIN {_subspaces_sql(m, dsub)}
),
__pq_codes AS (
  SELECT s.{id_col}, s.j,
         (SELECT b.c FROM __pq_book b WHERE b.j = s.j
          ORDER BY {sq}, b.c LIMIT 1) AS code
  FROM __pq_subs s
)
SELECT {id_col}, list(code ORDER BY j) AS codes
FROM __pq_codes GROUP BY {id_col}
"""


def adc_topk_sql(corpus_sql: str, codebook_sql: str, queries_sql: str,
                 m: int, dsub: int, k: int,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id: str = "query_id") -> str:
    """DuckDB replay of pq_encode + adc_topk: recomputes each per-j term
    from the same subvectors (identical IEEE fold as the inlined LUT)
    and sums in j order — bit-exact vs the Spark addition chain."""
    sq = distance_sql("squared", "s.sub", "b.cb")
    term = distance_sql("squared", "qs.sub", "b.cb")
    return f"""
WITH __pq_corpus AS ({corpus_sql}),
__pq_book AS ({codebook_sql}),
__pq_q AS ({queries_sql}),
__pq_subs AS (
  SELECT {id_col}, j, ({vec_col}::DOUBLE[])[lo:hi] AS sub
  FROM __pq_corpus CROSS JOIN {_subspaces_sql(m, dsub)}
),
__pq_codes AS (
  SELECT s.{id_col}, s.j,
         (SELECT b.c FROM __pq_book b WHERE b.j = s.j
          ORDER BY {sq}, b.c LIMIT 1) AS code
  FROM __pq_subs s
),
__pq_qsubs AS (
  SELECT {query_id}, j, ({vec_col}::DOUBLE[])[lo:hi] AS sub
  FROM __pq_q CROSS JOIN {_subspaces_sql(m, dsub)}
),
__pq_terms AS (
  SELECT qs.{query_id}, cd.{id_col} AS neighbor_id, cd.j,
         {term} AS t
  FROM __pq_codes cd
  JOIN __pq_book b ON b.j = cd.j AND b.c = cd.code
  JOIN __pq_qsubs qs ON qs.j = cd.j
),
__pq_dist AS (
  SELECT {query_id}, neighbor_id,
         list_sum(list(t ORDER BY j)) AS adc_dist
  FROM __pq_terms GROUP BY 1, 2
),
__pq_rank AS (
  SELECT *, row_number() OVER (
      PARTITION BY {query_id} ORDER BY adc_dist, neighbor_id) AS rn
  FROM __pq_dist
)
SELECT {query_id}, neighbor_id, adc_dist
FROM __pq_rank WHERE rn <= {k}
"""


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
               n_cells: int = 8, n_probe: int = 2,
               m: int = 8, ksub: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id: str = "query_id", seed: int = 7,
               max_iter: int = 10, index=None,
               codebooks: np.ndarray | None = None,
               encoded: DataFrame | None = None) -> DataFrame:
    """IVF-PQ (Jégou et al. §V) — the canonical billion-scale recipe:

    the IVF coarse quantizer prunes the corpus to ``n_probe`` cells per
    query, then ADC scores only those candidates from their m-byte
    codes. With ``assigned`` written partitioned by ``__cell``
    (IVFIndex.save) the probe is dynamic partition pruning at the
    parquet source: a query touches n_probe/n_cells of the data and
    never a float vector.

    Pass ``index`` / ``codebooks`` / ``encoded`` to reuse persisted
    state (the repeated-workload path); otherwise each is built here.
    Probing all cells (n_probe = n_cells) returns exactly
    ``adc_topk``'s answer (pytest-pinned).
    """
    from .ann import ivf_build

    idx = index if index is not None else ivf_build(
        corpus, n_cells=n_cells, seed=seed, id_col=id_col,
        vec_col=vec_col, max_iter=max_iter)
    books = codebooks if codebooks is not None else pq_train(
        corpus, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col,
        max_iter=max_iter, seed=seed)
    mm, ksub_, dsub = _check_shape(books)
    enc = encoded if encoded is not None else pq_encode(
        corpus, books, id_col, vec_col)
    cells = idx.assigned.select(F.col("neighbor_id").alias("__nid"),
                                "__cell")
    enc_cells = enc.join(cells, enc[id_col] == F.col("__nid")) \
        .select(F.col(id_col), "codes", "__cell")

    qrows = queries.select(query_id,
                           F.col(vec_col).cast("array<double>")
                           .alias("__qv")).collect()
    if not qrows:
        raise ValueError("ivfpq_topk needs at least one query row")
    per_query = []
    for r in qrows:
        qv = np.asarray(r["__qv"], dtype=np.float64)
        if len(qv) != mm * dsub:
            raise ValueError("query dim != m * dsub")
        # nearest n_probe cells, (dist, cell) order — the same
        # sequential fold probe_cells_expr evaluates JVM-side
        cd = sorted((_sq_seq(qv, c), i) for i, c in enumerate(idx.centers))
        probes = [i for _, i in cd[:n_probe]]
        luts = [
            F.array(*[F.lit(_sq_seq(qv[j * dsub:(j + 1) * dsub],
                                    books[j][c]))
                      for c in range(ksub_)])
            for j in range(mm)]
        dist = reduce(
            lambda acc, j: acc + F.element_at(
                luts[j], F.col("codes")[j] + F.lit(1)),
            range(mm), F.lit(0.0))
        per_query.append(
            enc_cells.filter(F.col("__cell").isin(probes)).select(
                F.lit(r[query_id]).alias(query_id),
                F.col(id_col).alias("neighbor_id"),
                dist.alias("adc_dist")))
    scored = reduce(lambda a, b: a.unionByName(b), per_query)
    return topk_per_group(scored, [query_id], "adc_dist", k,
                          descending=False, tiebreak_cols=["neighbor_id"])


class IVFPQIndex:
    """Persisted IVF-PQ state: codebooks + cell-assigned CODES table.

    The 10^12-row layout: ``codes`` is written partitioned by
    ``__cell`` (like IVFIndex.save), so a probe prunes whole cells at
    the parquet source and each surviving row costs m ints — the float
    corpus is never stored, never read. Build once with
    ``ivfpq_build``, search many times with ``search``; reopened
    indexes answer queries with zero retraining and zero rescans.
    """

    def __init__(self, centers: np.ndarray, codebooks: np.ndarray,
                 codes: DataFrame, id_col: str):
        self.centers = centers
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        self.codes = codes          # (id_col, codes array<int>, __cell)
        self.id_col = id_col

    def save(self, path: str) -> None:
        spark = self.codes.sparkSession
        (self.codes.write.mode("overwrite").partitionBy("__cell")
         .parquet(f"{path}/codes"))
        m, ksub, dsub = self.codebooks.shape
        rows = [(j, c, [float(x) for x in self.codebooks[j][c]])
                for j in range(m) for c in range(ksub)]
        (spark.createDataFrame(rows, "j int, c int, cb array<double>")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/books"))
        cr = [(i, [float(x) for x in v], self.id_col)
              for i, v in enumerate(self.centers)]
        (spark.createDataFrame(cr, "cell int, center array<double>, "
                                   "id_col string")
         .coalesce(1).write.mode("overwrite").parquet(f"{path}/centers"))

    @classmethod
    def load(cls, spark, path: str) -> "IVFPQIndex":
        br = spark.read.parquet(f"{path}/books").collect()
        m = 1 + max(r["j"] for r in br)
        ksub = 1 + max(r["c"] for r in br)
        books = np.empty((m, ksub, len(br[0]["cb"])), dtype=np.float64)
        for r in br:
            books[r["j"]][r["c"]] = r["cb"]
        cr = sorted(spark.read.parquet(f"{path}/centers").collect(),
                    key=lambda r: r["cell"])
        centers = np.stack([np.asarray(r["center"]) for r in cr])
        codes = spark.read.parquet(f"{path}/codes")
        return cls(centers, books, codes, cr[0]["id_col"])

    def search(self, queries: DataFrame, k: int = 10, n_probe: int = 2,
               vec_col: str = "embedding",
               query_id: str = "query_id") -> DataFrame:
        """ADC top-k over the probed cells only (dynamic partition
        pruning on a reopened index: the probe isin-filter sits on the
        __cell partition column)."""
        m, ksub, dsub = self.codebooks.shape
        qrows = queries.select(query_id,
                               F.col(vec_col).cast("array<double>")
                               .alias("__qv")).collect()
        if not qrows:
            raise ValueError("search needs at least one query row")
        per_query = []
        for r in qrows:
            qv = np.asarray(r["__qv"], dtype=np.float64)
            if len(qv) != m * dsub:
                raise ValueError("query dim != m * dsub")
            cd = sorted((_sq_seq(qv, c), i)
                        for i, c in enumerate(self.centers))
            probes = [i for _, i in cd[:n_probe]]
            luts = [
                F.array(*[F.lit(_sq_seq(qv[j * dsub:(j + 1) * dsub],
                                        self.codebooks[j][c]))
                          for c in range(ksub)])
                for j in range(m)]
            dist = reduce(
                lambda acc, j: acc + F.element_at(
                    luts[j], F.col("codes")[j] + F.lit(1)),
                range(m), F.lit(0.0))
            per_query.append(
                self.codes.filter(F.col("__cell").isin(probes)).select(
                    F.lit(r[query_id]).alias(query_id),
                    F.col(self.id_col).alias("neighbor_id"),
                    dist.alias("adc_dist")))
        scored = reduce(lambda a, b: a.unionByName(b), per_query)
        return topk_per_group(scored, [query_id], "adc_dist", k,
                              descending=False,
                              tiebreak_cols=["neighbor_id"])


def ivfpq_build(corpus: DataFrame, n_cells: int = 8, m: int = 8,
                ksub: int = 16, id_col: str = "vec_id",
                vec_col: str = "embedding", seed: int = 7,
                max_iter: int = 10) -> IVFPQIndex:
    """Train coarse quantizer + codebooks, encode, assign — one corpus

    scan for the codes+cells table (encode and cell argmin fuse into
    the same map-only projection)."""
    from .ann import ivf_build

    idx = ivf_build(corpus, n_cells=n_cells, seed=seed, id_col=id_col,
                    vec_col=vec_col, max_iter=max_iter)
    books = pq_train(corpus, m=m, ksub=ksub, id_col=id_col,
                     vec_col=vec_col, max_iter=max_iter, seed=seed)
    enc = pq_encode(corpus, books, id_col, vec_col)
    cell = corpus.select(
        F.col(id_col).alias("__nid"),
        idx.probe_cells_expr(F.col(vec_col), 1)[0].alias("__cell"))
    codes = enc.join(cell, enc[id_col] == F.col("__nid")) \
        .select(F.col(id_col), "codes", "__cell")
    return IVFPQIndex(idx.centers, books, codes, id_col)
