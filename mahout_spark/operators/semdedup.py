"""SemDeDup: semantic deduplication over an embedding column.

The embedding-space sibling of the text dedup stack (operators/dedup.py)
— Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" (arXiv:2303.09540). No reference anchor:
the reference has no embedding pipeline at all; this is the builder
brief's training-data layer, composed entirely from pieces already
gate-proven here (cosine folds from operators/ann.py, transitive
closure + representative selection from operators/dedup.py).

Shape (the paper's own): cluster embeddings with k-means (k large, so
clusters are small), then compare pairs ONLY within a cluster and drop
all but one member of each semantic-duplicate group.

Scale design (10^12 docs):
- centroids ride along as literal arrays (drmBroadcast convention), so
  assignment is a map-only projection — one cosine fold per centroid,
  argmax via a single greatest() chain, no join, no shuffle;
- the pair stage is ONE equi-join on the cluster id; the paper bounds
  the quadratic blow-up by choosing k ∝ N so E[cluster] is constant
  (their 50k clusters over 233M docs ⇒ ~4.7k per cluster). AQE's skew
  split handles an oversized cluster; for pathological ones the same
  banded sign-LSH used by dedup.embedding_neardup_lsh can pre-bucket
  WITHIN a cluster — the composition is associative;
- duplicate groups resolve through dedup.dedup_groups (O(log diameter)
  label-propagation rounds) and the keep decision is one left join —
  no driver data path anywhere.

Everything is deterministic (literal centroids, fixed fold order), so a
DuckDB oracle replays assignment, pair cosines, and the closure
bit-exactly — including every float.

Train the centroids with operators/clustering.kmeans_train (or any
external model); pass `centers` as a list of vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mahout_spark.operators.ann import cosine_expr, cosine_sql
from mahout_spark.operators.dedup import dedup_groups, dedup_groups_sql


def _centroid_lit(c) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in c])


def assign_clusters_cosine(emb: DataFrame, centers: list,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """(id_col, cluster): index of the max-cosine centroid; ties break
    to the LOWEST centroid index (strict > while scanning). Map-only —
    centroids are inlined literals."""
    v = F.col(vec_col)
    best_c, best_i = cosine_expr(v, _centroid_lit(centers[0])), F.lit(0)
    for i, c in enumerate(centers[1:], start=1):
        ci = cosine_expr(v, _centroid_lit(c))
        best_i = F.when(ci > best_c, F.lit(i)).otherwise(best_i)
        best_c = F.when(ci > best_c, ci).otherwise(best_c)
    return emb.select(F.col(id_col), best_i.cast("int").alias("cluster"))


def semdedup_pairs(emb: DataFrame, centers: list,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   threshold: float = 0.99) -> DataFrame:
    """(id_a, id_b, cos): within-cluster pairs with exact cosine >=
    threshold (id_a < id_b). One cluster-keyed equi-join."""
    assigned = assign_clusters_cosine(emb, centers, id_col, vec_col)
    keyed = (emb.select(F.col(id_col).alias("__id"),
                        F.col(vec_col).alias("__v"))
             .join(assigned.select(F.col(id_col).alias("__id"), "cluster"),
                   "__id"))
    a = keyed.select(F.col("__id").alias("id_a"),
                     F.col("__v").alias("__va"), "cluster")
    b = keyed.select(F.col("__id").alias("id_b"),
                     F.col("__v").alias("__vb"), "cluster")
    return (a.join(b, "cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    cosine_expr(F.col("__va"), F.col("__vb"))
                    .alias("cos"))
            .filter(F.col("cos") >= threshold))


def semdedup(emb: DataFrame, centers: list, id_col: str = "vec_id",
             vec_col: str = "embedding",
             threshold: float = 0.99) -> DataFrame:
    """(id_col, cluster, group_id, keep): every input vector with its
    cluster, its semantic-duplicate group (group_id = its own id when
    unduplicated), and the keep decision — the min-id member of each
    group survives (swap in dedup.pick_representatives for a
    quality-scored winner)."""
    assigned = assign_clusters_cosine(emb, centers, id_col, vec_col)
    pairs = semdedup_pairs(emb, centers, id_col, vec_col, threshold)
    groups = dedup_groups(pairs.select("id_a", "id_b"))
    return (assigned.join(
        groups.select(F.col("member_id").alias(id_col), "group_id",
                      F.col("is_representative").alias("__rep")),
        id_col, "left")
        .select(id_col, "cluster",
                F.coalesce("group_id", F.col(id_col)).alias("group_id"),
                F.coalesce("__rep", F.lit(True)).alias("keep")))


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _assign_sql(table: str, centers_sql: str, id_col: str,
                vec_col: str) -> str:
    """CTE body: (id, cluster) via max-cosine centroid, ties to lowest
    centroid index. ``centers_sql``: relation (cidx, cv)."""
    cos = cosine_sql(f"e.{vec_col}", "c.cv")
    return f"""
SELECT id, cluster FROM (
  SELECT e.{id_col} AS id, c.cidx AS cluster,
         row_number() OVER (PARTITION BY e.{id_col}
                            ORDER BY {cos} DESC, c.cidx) AS rn
  FROM {table} e CROSS JOIN ({centers_sql}) c) WHERE rn = 1"""


def semdedup_sql(table: str, centers_sql: str, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 threshold: float = 0.99) -> str:
    """DuckDB replay of semdedup: same assignment, same pair cosines
    (list_dot_product == the zip_with/aggregate fold bit-for-bit), same
    recursive-CTE closure, same keep rule."""
    cos = cosine_sql(f"x.{vec_col}", f"y.{vec_col}")
    pairs_sql = f"""
SELECT * FROM (
  SELECT a.id AS id_a, b.id AS id_b, {cos} AS cos
  FROM __sd_assign a JOIN __sd_assign b ON a.cluster = b.cluster
       AND a.id < b.id
  JOIN {table} x ON x.{id_col} = a.id
  JOIN {table} y ON y.{id_col} = b.id
) WHERE cos >= {threshold!r}"""
    closure = dedup_groups_sql("SELECT id_a, id_b FROM __sd_pairs")
    return f"""
WITH __sd_assign AS MATERIALIZED ({_assign_sql(table, centers_sql,
                                               id_col, vec_col)}),
__sd_pairs AS MATERIALIZED ({pairs_sql}),
__sd_groups AS ({closure})
SELECT a.id AS {id_col}, a.cluster,
       coalesce(g.group_id, a.id) AS group_id,
       coalesce(g.is_representative, TRUE) AS keep
FROM __sd_assign a LEFT JOIN __sd_groups g ON g.member_id = a.id
"""
