"""Sequence packing + deterministic shuffle/shard planning for training data.

The missing LAST mile of an LLM training-data pipeline: after curation,
dedup and tokenization, documents become fixed-length training sequences
(GPT-style concat-and-chunk: concatenate all token streams in a global
order, cut every `block_size` tokens) and the corpus is exported as
size-balanced shards in a deterministic shuffle order. No reference
anchor — the reference stops at vectorization (seq2sparse); this is the
builder brief's training-data-pipeline layer.

Determinism and scale are the whole design:

- The global order is a PSEUDO-SHUFFLE: ``md5('pack<seed>:' || id)``
  (the engine-exact coin convention from functions/sampling.py — both
  Java and DuckDB md5 the same bytes to the same lowercase hex). Same
  seed → same order on any cluster, any partitioning, any retry.
- The global prefix sum (each doc's start offset in the virtual
  concatenated token stream) is TWO-PHASE: the first 2 hex chars of the
  order key are an order-consistent PREFIX bucket (256 buckets), so
  within-bucket running sums are a partitioned window (parallel, no
  single-reducer bottleneck) and the cross-bucket offsets are a window
  over the 256-row bucket-total table (driver-trivial). Equivalent to
  the single global window by construction — the DuckDB oracle replays
  it AS the single global window and the gate hashes match.
- A document spanning several blocks emits one row per spanned block
  (fan-out = ceil(len/B)+1 worst case), so the shuffle carries token
  SLICES, never the concatenated stream; block assembly is one groupBy.
- Shard assignment is pure integer arithmetic over the same offsets:
  ``shard = floor(start * n_shards / total)`` — size-balanced to one
  document, no sampling, no second pass over the data.

Blocks never merge token arrays across executors in Python; every
operation is a JVM expression (sequence/slice/flatten/array_sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SEP = "\x1f"


# -- deterministic order + two-phase offsets -----------------------------------

def _order_key(id_col: Column, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"pack{seed}:"), id_col.cast("string")))


def _order_key_sql(id_sql: str, seed: int) -> str:
    return f"md5('pack{seed}:' || ({id_sql})::VARCHAR)"


def with_offsets(df: DataFrame, id_col: str, len_col: str,
                 seed: int = 0) -> DataFrame:
    """Adds __k (order key) and start (exclusive global prefix sum of
    `len_col` in (__k, id) order) — the two-phase cumsum described in
    the module docstring. `len_col` must be a non-negative long.
    """
    d = (df.withColumn("__k", _order_key(F.col(id_col), seed))
         .withColumn("__bkt", F.conv(F.substring("__k", 1, 2), 16, 10)
                     .cast("int")))
    w_in = (Window.partitionBy("__bkt").orderBy("__k", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("__run", F.sum(F.col(len_col)).over(w_in))
    totals = d.groupBy("__bkt").agg(F.sum(len_col).alias("__tot"))
    # exclusive scan over the <=256 bucket totals: a triangular self-join
    # keeps it declarative without a global (single-partition) window
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (a.join(b, F.col("b.__bkt") < F.col("a.__bkt"), "left")
               .groupBy(F.col("a.__bkt").alias("__bkt"))
               .agg(F.coalesce(F.sum("b.__tot"), F.lit(0)).alias("__off")))
    d = d.join(F.broadcast(offsets), "__bkt")
    return (d.withColumn("start",
                         (F.col("__off") + F.col("__run") -
                          F.col(len_col)).cast("long"))
            .drop("__bkt", "__run", "__off"))


# -- GPT-style concat-and-chunk packing ----------------------------------------

def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   block_size: int, drop_last: bool = True,
                   seed: int = 0) -> DataFrame:
    """(seq_id, n_docs, n_tokens, doc_ids, tokens): fixed-length blocks.

    Concatenates every document's token array in the deterministic
    pseudo-shuffle order and cuts every `block_size` tokens; documents
    straddle block boundaries (no padding, no token dropped except the
    final partial block when `drop_last`). Fan-out per doc = number of
    blocks it touches; assembly is ONE groupBy(block) whose per-block
    pieces are sorted by offset (array_sort on (lo, …) structs — integer
    first field, deterministic).
    """
    B = int(block_size)
    d = (df.select(F.col(id_col), F.col(tokens_col).alias("__toks"))
         .withColumn("__n", F.size("__toks").cast("long"))
         .filter(F.col("__n") > 0))
    d = with_offsets(d, id_col, "__n", seed)
    end = F.col("start") + F.col("__n")
    d = d.withColumn("seq_id", F.explode(F.sequence(
        F.floor(F.col("start") / B), F.floor((end - 1) / B))))
    lo = F.greatest(F.col("start"), F.col("seq_id") * B)
    hi = F.least(end, (F.col("seq_id") + 1) * B)
    d = d.select(
        "seq_id", F.col(id_col),
        lo.alias("__lo"),
        F.slice("__toks", (lo - F.col("start") + 1).cast("int"),
                (hi - lo).cast("int")).alias("__piece"))
    out = (d.groupBy("seq_id")
           .agg(F.array_sort(F.collect_list(
               F.struct(F.col("__lo"), F.col(id_col).alias("__id"),
                        F.col("__piece")))).alias("__ps"))
           .select(
               "seq_id",
               F.size("__ps").cast("long").alias("n_docs"),
               F.transform("__ps", lambda p: p["__id"]).alias("doc_ids"),
               F.flatten(F.transform("__ps", lambda p: p["__piece"]))
               .alias("tokens"))
           .withColumn("n_tokens", F.size("tokens").cast("long")))
    if drop_last:
        out = out.filter(F.col("n_tokens") == B)
    return out.select("seq_id", "n_docs", "n_tokens", "doc_ids", "tokens")


def pack_sequences_oracle_sql(docs_sql: str, id_sql: str, tokens_sql: str,
                              block_size: int, drop_last: bool = True,
                              seed: int = 0) -> str:
    """DuckDB replay as ONE global window cumsum (the semantics the
    two-phase Spark plan implements). Emits
    (seq_id, n_docs, n_tokens, doc_ids_md5, tokens_md5).
    """
    B = int(block_size)
    k = _order_key_sql("id", seed)
    tail = f"WHERE n_tokens = {B}" if drop_last else ""
    return f"""
WITH base AS (
  SELECT ({id_sql}) AS id, ({tokens_sql}) AS toks FROM ({docs_sql})
),
sized AS (
  SELECT id, toks, len(toks)::BIGINT AS n, {k} AS k
  FROM base WHERE len(toks) > 0
),
off AS (
  SELECT id, toks, n, k,
         (sum(n) OVER (ORDER BY k, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)::BIGINT
           AS start
  FROM sized
),
spans AS (
  SELECT o.id, o.toks, o.n, o.start, u.seq_id,
         greatest(o.start, u.seq_id * {B}) AS lo,
         least(o.start + o.n, (u.seq_id + 1) * {B}) AS hi
  FROM off o,
       unnest(generate_series(o.start // {B}, (o.start + o.n - 1) // {B}))
         AS u(seq_id)
),
pieces AS (
  SELECT seq_id, id, lo,
         list_slice(toks, (lo - start + 1)::INT, (hi - start)::INT) AS piece
  FROM spans
),
blocks AS (
  SELECT seq_id,
         count(*)::BIGINT AS n_docs,
         md5(array_to_string(list(id::VARCHAR ORDER BY lo), ',')) AS doc_ids_md5,
         flatten(list(piece ORDER BY lo)) AS tokens
  FROM pieces GROUP BY seq_id
)
SELECT seq_id, n_docs, len(tokens)::BIGINT AS n_tokens, doc_ids_md5,
       md5(array_to_string(tokens, chr(31))) AS tokens_md5
FROM blocks {tail}
ORDER BY seq_id
"""


# -- deterministic size-balanced sharding --------------------------------------

def shard_assignments(df: DataFrame, id_col: str, n_shards: int,
                      weight_col: str | None = None,
                      seed: int = 0) -> DataFrame:
    """Adds `shard` (0..n_shards-1): contiguous ranges of the
    pseudo-shuffle order, balanced by `weight_col` (default: row count).
    ``shard = floor(start * n_shards / total)`` — exact integer
    arithmetic, no sampling pass, stable under any partitioning.
    """
    if weight_col is None:
        d = df.withColumn("__w", F.lit(1).cast("long"))
        weight_col = "__w"
    else:
        d = df.withColumn("__w", F.col(weight_col).cast("long"))
    d = with_offsets(d, id_col, "__w", seed)
    total = d.groupBy().agg(F.sum("__w").alias("__total"))
    d = d.join(F.broadcast(total))
    return (d.withColumn(
        "shard", F.floor((F.col("start") * n_shards) / F.col("__total"))
        .cast("int"))
        .drop("__total"))


def shard_plan_oracle_sql(docs_sql: str, id_sql: str, weight_sql: str,
                          n_shards: int, seed: int = 0) -> str:
    """DuckDB replay → (shard, n_docs, sum_weight, ids_md5)."""
    k = _order_key_sql("id", seed)
    return f"""
WITH base AS (
  SELECT ({id_sql}) AS id, ({weight_sql})::BIGINT AS w FROM ({docs_sql})
),
off AS (
  SELECT id, w, k,
         (sum(w) OVER (ORDER BY k, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w)::BIGINT
           AS start,
         (SELECT sum(w) FROM base)::BIGINT AS total
  FROM (SELECT id, w, {k} AS k FROM base)
)
SELECT ((start * {n_shards}) // total)::INT AS shard,
       count(*)::BIGINT AS n_docs,
       sum(w)::BIGINT AS sum_weight,
       md5(array_to_string(list(id::VARCHAR ORDER BY k, id), ',')) AS ids_md5
FROM off GROUP BY 1 ORDER BY 1
"""


def write_shards(df: DataFrame, id_col: str, path: str, n_shards: int,
                 weight_col: str | None = None, seed: int = 0) -> None:
    """Materialize the shard plan: one directory per shard
    (``shard=<i>/``), rows inside each file in the pseudo-shuffle order.
    `repartition(shard)` co-locates each shard before the write, so a
    shard is one output task; readers get partition pruning on `shard`.
    """
    d = shard_assignments(df, id_col, n_shards, weight_col, seed)
    (d.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "__k", id_col)
     .drop("__k", "__w", "start")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def shard_manifest(df: DataFrame, id_col: str,
                   tokens_col: str | None = None) -> DataFrame:
    """(shard, n_rows[, n_tokens], ids_md5[, content_md5]) per shard —
    the data-loader contract for a written shard layout: a trainer (or a
    resumed pipeline) can verify a shard's integrity without trusting
    _SUCCESS markers. Hashes are order-canonical (per-row digests sorted
    before the shard digest), so any partitioning of the read reproduces
    them. One groupBy over the shard column; the result is
    n_shards-bounded."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list(
            F.col(id_col).cast("string"))))).alias("ids_md5"),
    ]
    if tokens_col is not None:
        row_h = F.md5(F.concat_ws(
            ":", F.col(id_col).cast("string"),
            F.concat_ws(SEP, F.col(tokens_col))))
        aggs += [
            F.sum(F.size(tokens_col)).cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list(row_h))))
            .alias("content_md5"),
        ]
    return df.groupBy(F.col("shard").cast("int").alias("shard")).agg(*aggs)


def verify_shards(spark, path: str, manifest: list[dict], id_col: str,
                  tokens_col: str | None = None) -> list[str]:
    """Recompute `shard_manifest` over a written layout and diff it
    against a stored manifest (the _MANIFEST.json contract written by
    jobs/pretrain.py). Returns a list of human-readable mismatches —
    empty means the layout is bit-intact."""
    got = {int(r["shard"]): r.asDict() for r in shard_manifest(
        spark.read.parquet(path), id_col, tokens_col).collect()}
    want = {int(m["shard"]): m for m in manifest}
    problems = []
    for sh in sorted(set(got) | set(want)):
        if sh not in got:
            problems.append(f"shard {sh}: in manifest but not on disk")
            continue
        if sh not in want:
            problems.append(f"shard {sh}: on disk but not in manifest")
            continue
        for k, v in want[sh].items():
            if k != "shard" and got[sh].get(k) != v:
                problems.append(
                    f"shard {sh}: {k} mismatch "
                    f"(manifest {v!r}, disk {got[sh].get(k)!r})")
    return problems
