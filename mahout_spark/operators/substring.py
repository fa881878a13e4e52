"""Corpus-level exact substring dedup: duplicated k-gram span masking.

The missing last mile after document-level dedup (operators/dedup.py):
web corpora share long verbatim SPANS (boilerplate, licenses, quoted
articles) inside otherwise-distinct documents. The standard treatment
(Lee et al. 2021 "Deduplicating Training Data Makes Language Models
Better"; RefinedWeb's exact-substring stage) finds every duplicated
substring of >= k tokens and removes it. Suffix arrays don't
distribute; the equivalent k-gram anchoring does: a duplicated span of
length >= k tokens contains a duplicated k-gram, so the set of tokens
covered by any k-gram occurring >= min_count times in the corpus is
exactly the duplicated-span mask, and merging overlapping windows
reconstructs the maximal spans. No reference anchor — the reference
stops at Bloom token filtering (integration/.../BloomTokenFilter.java);
this is the builder brief's training-data-pipeline layer, sharing the
whitespace-word unit convention with functions/webquality.py.

Scale design (10^12 docs):
- gram generation is map-only: one materialized token-array projection
  (attribute references are free inside higher-order lambdas — the
  630 s -> 15 s lesson from webquality), then posexplode of slice-joins;
  with ``hash_grams=True`` each shuffled row is (id, pos, xxhash64) —
  ~24 bytes — regardless of k;
- ONE shuffle keyed on the gram finds duplicated grams (map-side
  combine absorbs the Zipf head) and the occurrence->dup join reuses
  the same key, so AQE handles boilerplate-gram skew;
- span merging is the classic gaps-and-islands: a window per DOCUMENT
  (docs are small, so no low-cardinality-window hazard), all-integer
  arithmetic -> bit-exact across engines and retries;
- removal is a per-row array filter against the doc's own (few) spans.

``hash_grams=True`` is the production path (64-bit collisions can only
ADD a spurious dup mark, never miss one; ~n²/2⁶⁴ per gram pair);
``hash_grams=False`` groups on the gram string itself — the exact path
the DuckDB oracles replay. Both produce identical spans on every test
corpus (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mahout_spark.functions.webquality import words_array, words_array_sql

_CTE = "__ss"  # CTE prefix: never collide with registered view names


def _occurrences(docs: DataFrame, id_col: str, text_col: str, k: int,
                 hash_grams: bool) -> DataFrame:
    """(__id, pos, gram) — one row per k-gram window start (0-based)."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        words_array(F.col(text_col)).alias("__toks"))
    # __toks is now an attribute reference: the per-element slice below
    # cannot re-run the tokenizer (the HOF re-evaluation trap)
    toks = toks.select("__id", "__toks", F.size("__toks").alias("__n"))
    gram = lambda i: F.concat_ws(  # noqa: E731 — words contain no ws
        " ", F.slice(F.col("__toks"), i + 1, k))
    if hash_grams:
        inner = lambda i: F.xxhash64(gram(i))  # noqa: E731
    else:
        inner = gram
    return (toks.where(F.col("__n") >= k)
            .select("__id", F.posexplode(
                F.transform(F.sequence(F.lit(0), F.col("__n") - k),
                            inner)).alias("pos", "gram")))


def _merge_spans(marked: DataFrame, k: int, id_col: str) -> DataFrame:
    """(__id, pos) hit-window starts -> maximal merged token spans
    (id_col, span_start, span_end, n_units) — the gaps-and-islands
    window per DOCUMENT, all-integer arithmetic."""
    prev = Window.partitionBy("__id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1)
    run = Window.partitionBy("__id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0)
    islands = (marked
               .withColumn("__new", F.when(
                   F.col("pos") > F.coalesce(
                       F.max(F.col("pos") + k).over(prev), F.lit(-1)),
                   1).otherwise(0))
               .withColumn("__isl", F.sum("__new").over(run)))
    return (islands.groupBy("__id", "__isl")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.max("pos") + k).cast("long").alias("span_end"))
            .select(F.col("__id").alias(id_col), "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start"))
                    .alias("n_units")))


def duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 8,
                    min_count: int = 2,
                    hash_grams: bool = True) -> DataFrame:
    """(id_col, span_start, span_end, n_units): maximal 0-based token
    spans [start, end) covered by some k-gram occurring >= min_count
    times in the corpus (within-doc repeats count — Lee et al.'s
    whole-corpus occurrence count)."""
    occ = _occurrences(docs, id_col, text_col, k, hash_grams)
    dup = (occ.groupBy("gram").agg(F.count("*").alias("__c"))
           .where(F.col("__c") >= min_count).select("gram"))
    marked = occ.join(dup, "gram").select("__id", "pos")
    return _merge_spans(marked, k, id_col)


def duplicate_spans_sql(table: str, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        min_count: int = 2) -> str:
    """DuckDB replay of duplicate_spans(hash_grams=False) — identical
    spans (grams grouped by string; positions/islands all-integer)."""
    return f"""
WITH {_CTE}_toks AS MATERIALIZED (
  SELECT {id_col} AS id, {words_array_sql(text_col)} AS toks FROM {table}
),
{_CTE}_idx AS (
  SELECT id, toks,
         unnest(range(1, greatest(len(toks) - {k} + 2, 1))) AS i
  FROM {_CTE}_toks
),
{_CTE}_occ AS (
  SELECT id, i - 1 AS pos,
         array_to_string(list_slice(toks, i, i + {k} - 1), ' ') AS gram
  FROM {_CTE}_idx
),
{_CTE}_dup AS (
  SELECT gram FROM {_CTE}_occ GROUP BY gram HAVING count(*) >= {min_count}
),
{_CTE}_marked AS (
  SELECT id, pos FROM {_CTE}_occ
  WHERE gram IN (SELECT gram FROM {_CTE}_dup)
),
{_merge_spans_sql(f"{_CTE}_marked", k)}
SELECT id AS {id_col},
       min(pos)::BIGINT AS span_start,
       (max(pos) + {k})::BIGINT AS span_end,
       (max(pos) + {k} - min(pos))::BIGINT AS n_units
FROM {_CTE}_grp GROUP BY id, isl
"""


def _merge_spans_sql(marked_cte: str, k: int) -> str:
    """CTE chain {_CTE}_isl, {_CTE}_grp replaying _merge_spans over a
    (id, pos) CTE; caller SELECTs the min/max span bounds from
    {_CTE}_grp GROUP BY id, isl."""
    return f"""{_CTE}_isl AS (
  SELECT id, pos,
         CASE WHEN pos > coalesce(max(pos + {k}) OVER (
                  PARTITION BY id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS newisl
  FROM {marked_cte}
),
{_CTE}_grp AS (
  SELECT id, pos, sum(newisl) OVER (
             PARTITION BY id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM {_CTE}_isl
)"""


def remove_duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8,
                           min_count: int = 2, hash_grams: bool = True,
                           spans: DataFrame | None = None,
                           out_col: str = "text_dedup") -> DataFrame:
    """docs + (out_col, n_dup_units): text with every duplicated span's
    tokens removed, single-space re-joined (tokens are whitespace-split,
    so intra-token bytes are preserved; inter-token whitespace is
    normalized — the same contract as webquality's line_dedup)."""
    if spans is None:
        spans = duplicate_spans(docs, id_col, text_col, k=k,
                                min_count=min_count,
                                hash_grams=hash_grams)
    sp = (spans.groupBy(id_col)
          .agg(F.collect_list(F.struct("span_start", "span_end"))
               .alias("__spans")))
    empty = F.array().cast("array<struct<span_start:long,span_end:long>>")
    j = (docs.join(sp, id_col, "left")
         .select(*docs.columns,
                 F.coalesce(F.col("__spans"), empty).alias("__spans"))
         .select(*docs.columns, "__spans",
                 words_array(F.col(text_col)).alias("__toks")))
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"])))
    return j.select(
        *docs.columns,
        F.array_join(kept, " ").alias(out_col),
        (F.size("__toks") - F.size(kept)).cast("long")
        .alias("n_dup_units"))


def remove_duplicate_spans_sql(table: str, id_col: str = "doc_id",
                               text_col: str = "text", k: int = 8,
                               min_count: int = 2,
                               out_col: str = "text_dedup") -> str:
    """DuckDB replay of remove_duplicate_spans (string-gram path).
    Emits (id_col, out_col, n_dup_units)."""
    spans_sql = duplicate_spans_sql(table, id_col, text_col, k, min_count)
    return f"""
WITH {_CTE}_spans AS ({spans_sql}),
{_CTE}_byid AS (
  SELECT {id_col} AS id,
         list(struct_pack(s := span_start, e := span_end)) AS spans
  FROM {_CTE}_spans GROUP BY {id_col}
),
{_CTE}_src AS MATERIALIZED (
  SELECT d.{id_col} AS id, {words_array_sql(f"d.{text_col}")} AS toks,
         coalesce(b.spans, []) AS spans
  FROM {table} d LEFT JOIN {_CTE}_byid b ON d.{id_col} = b.id
),
{_CTE}_kept AS (
  SELECT id, toks,
         list_filter(toks, (x, i) -> len(list_filter(spans,
             sp -> (i - 1) >= sp.s AND (i - 1) < sp.e)) = 0) AS kept
  FROM {_CTE}_src
)
SELECT id AS {id_col},
       coalesce(array_to_string(kept, ' '), '') AS {out_col},
       (len(toks) - len(kept))::BIGINT AS n_dup_units
FROM {_CTE}_kept
"""


# ---------------------------------------------------------------------------
# benchmark decontamination: corpus spans overlapping a held-out set
# ---------------------------------------------------------------------------


def contamination_spans(docs: DataFrame, bench: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_text_col: str = "text", k: int = 13,
                        hash_grams: bool = True) -> DataFrame:
    """(id_col, span_start, span_end, n_units): maximal 0-based token
    spans of ``docs`` covered by some k-gram that also occurs anywhere
    in ``bench`` — the n-gram-overlap benchmark-decontamination test
    (Brown et al. 2020 appx C / PaLM's 13-gram rule; no reference
    anchor — the reference has no decontamination stage).

    Scale design: the corpus side is the same map-only gram explode +
    ONE equi-join as duplicate_spans; the benchmark side (distinct
    grams of a ~10^5-doc eval suite) is tiny next to a 10^12-doc corpus
    and is broadcast, so the hot path adds NO extra shuffle of corpus
    rows beyond the gram join. ``hash_grams=True`` ships 8-byte gram
    keys (collisions only ever ADD a spurious mark — conservative in
    the safe direction for decontamination)."""
    occ = _occurrences(docs, id_col, text_col, k, hash_grams)
    b = bench.select(F.lit(0).cast("long").alias("__bid"),
                     F.col(bench_text_col).alias("__btext"))
    bgrams = (_occurrences(b, "__bid", "__btext", k, hash_grams)
              .select("gram").distinct())
    marked = (occ.join(F.broadcast(bgrams), "gram")
              .select("__id", "pos"))
    return _merge_spans(marked, k, id_col)


def contamination_spans_sql(table: str, bench_sql: str,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            bench_text_col: str = "text",
                            k: int = 13) -> str:
    """DuckDB replay of contamination_spans(hash_grams=False).
    ``bench_sql`` is a parenthesized relation with ``id_col`` and
    ``bench_text_col`` columns."""
    return f"""
WITH {_CTE}_toks AS MATERIALIZED (
  SELECT {id_col} AS id, {words_array_sql(text_col)} AS toks FROM {table}
),
{_CTE}_idx AS (
  SELECT id, toks,
         unnest(range(1, greatest(len(toks) - {k} + 2, 1))) AS i
  FROM {_CTE}_toks
),
{_CTE}_occ AS (
  SELECT id, i - 1 AS pos,
         array_to_string(list_slice(toks, i, i + {k} - 1), ' ') AS gram
  FROM {_CTE}_idx
),
{_CTE}_btoks AS MATERIALIZED (
  SELECT {words_array_sql(bench_text_col)} AS toks FROM {bench_sql} __b
),
{_CTE}_bgrams AS (
  SELECT DISTINCT array_to_string(list_slice(toks, i, i + {k} - 1), ' ')
         AS gram
  FROM (SELECT toks,
               unnest(range(1, greatest(len(toks) - {k} + 2, 1))) AS i
        FROM {_CTE}_btoks)
),
{_CTE}_marked AS (
  SELECT id, pos FROM {_CTE}_occ
  WHERE gram IN (SELECT gram FROM {_CTE}_bgrams)
),
{_merge_spans_sql(f"{_CTE}_marked", k)}
SELECT id AS {id_col},
       min(pos)::BIGINT AS span_start,
       (max(pos) + {k})::BIGINT AS span_end,
       (max(pos) + {k} - min(pos))::BIGINT AS n_units
FROM {_CTE}_grp GROUP BY id, isl
"""


def decontaminate(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text", k: int = 13,
                  hash_grams: bool = True,
                  policy: str = "drop") -> DataFrame:
    """Remove benchmark contamination from ``docs``.

    policy='drop' (the GPT-3/PaLM treatment): any doc sharing a k-gram
    with the benchmark is removed outright — one anti-join against the
    contaminated-id set. policy='mask': only the contaminated spans'
    tokens are removed (remove_duplicate_spans plumbing), emitting
    (docs..., text_dedup, n_dup_units)."""
    spans = contamination_spans(docs, bench, id_col, text_col,
                                bench_text_col, k, hash_grams)
    if policy == "drop":
        return docs.join(spans.select(id_col).distinct(), id_col,
                         "left_anti")
    if policy == "mask":
        return remove_duplicate_spans(docs, id_col, text_col, k=k,
                                      spans=spans)
    raise ValueError(f"unknown policy {policy!r}; use 'drop' or 'mask'")
