"""Byte-pair-encoding tokenizer: distributed training + JVM-side encode.

The missing first mile of an LLM training-data pipeline: after curation
(functions/webquality.py), dedup (operators/dedup.py, substring.py) and
packing comes TOKENIZATION, and its vocabulary has to be learned from
the corpus itself. The reference stops at analyzer tokens feeding
seq2sparse (mr/.../vectorizer/document/SequenceFileTokenizerMapper.java);
this module adds the Sennrich et al. 2016 BPE algorithm the way
SentencePiece / HF tokenizers train it at scale:

1. ONE corpus-scale pass aggregates pre-tokenizer segments into a
   (word, count) table (`bpe_word_counts`) — the GPT-2-style segment
   regex already in functions/text.py. By Heaps' law the distinct-word
   table is sublinear in corpus size (~10^7-10^8 rows at 10^12 docs),
   and `min_count`/`max_words` pruning bounds it explicitly, so the
2. merge-learning loop runs DRIVER-SIDE over the collected table
   (`bpe_train_incore`) — the SentencePiece convention. Each iteration
   counts weighted adjacent symbol pairs and merges the argmax
   (count desc, then lexicographic (left, right) — fully deterministic).
3. Encoding applies the learned merges IN RANK ORDER, each as one
   leftmost-nonoverlapping replace. Over a bracketed symbol string
   ("\\x1f" around every symbol) a merge (l, r) is literally
   ``replace(s, '\\x1fl\\x1f\\x1fr\\x1f', '\\x1flr\\x1f')`` — which makes
   the whole encoder a chain of JVM `replace` calls (`bpe_encode_expr`,
   zero Python in the hot path) with a bit-identical DuckDB twin, and
   the trainer's own merge application the very same primitive in all
   three engines. `bpe_encode_pandas` is the large-vocab path (50k
   merges won't fit a Catalyst expression chain): same rank-order
   semantics in Arrow batches with a per-partition segment cache
   (Zipf makes the hit rate ~1).

Rank-order application is the standard sequential formulation; it can
differ from the lowest-rank-present loop only when a later merge
re-creates an earlier pair via a different derivation of the same
symbol string — impossible for single-derivation vocabularies and
pinned as out of scope (the gate proves Spark == trainer == DuckDB).

Segment boundaries: bracketed segments are joined with ONE extra
separator (boundary = "\\x1f\\x1f\\x1f"), which no merge pattern
("\\x1fl\\x1f\\x1fr\\x1f", symbols never contain the separator) can
straddle — so merges never cross pre-tokenizer segments, the defining
BPE invariant. Final tokens = split on /\\x1f+/, drop empties. Input
text is stripped of the separator char first (unicode hygiene strips
all C0 controls anyway — functions/unicode.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.functions.text import BPE_SPLIT_RE, bpe_segments

SEP = "\x1f"  # unit separator: symbol bracket; never appears in symbols
_S = "chr(31)"  # the same char, spelled for DuckDB SQL builders


# -- word counts (the only corpus-scale pass) --------------------------------

def bpe_word_counts(df: DataFrame, text_col: str = "text",
                    min_count: int = 1,
                    max_words: int | None = None) -> DataFrame:
    """(word, cnt) over pre-tokenizer segments — one explode + groupBy.

    Map-side combine absorbs the Zipf head; `min_count` and `max_words`
    (kept by cnt desc, word asc — deterministic) bound the table the
    driver will collect for merge learning.
    """
    clean = F.replace(F.col(text_col), F.lit(SEP), F.lit(""))
    out = (df.select(F.explode(bpe_segments(clean)).alias("word"))
           .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    if max_words is not None:
        out = out.orderBy(F.col("cnt").desc(), "word").limit(max_words)
    return out


def word_counts_sql(docs_sql: str, text: str = "text",
                    min_count: int = 1,
                    max_words: int | None = None) -> str:
    pat = BPE_SPLIT_RE.replace("'", "''")
    base = (f"SELECT word, count(*)::BIGINT AS cnt FROM ("
            f"SELECT unnest(regexp_extract_all(replace({text}, {_S}, ''), "
            f"'{pat}', 0)) AS word FROM ({docs_sql})) GROUP BY word")
    if min_count > 1:
        base += f" HAVING count(*) >= {min_count}"
    if max_words is not None:
        base = (f"SELECT word, cnt FROM ({base}) "
                f"ORDER BY cnt DESC, word LIMIT {max_words}")
    return base


# -- shared bracketed-string primitives ---------------------------------------

def _bracket(word: str) -> str:
    return "".join(SEP + ch + SEP for ch in word)


def _apply_merge(s: str, left: str, right: str) -> str:
    return s.replace(SEP + left + SEP + SEP + right + SEP,
                     SEP + left + right + SEP)


def _symbols(s: str) -> list[str]:
    return [t for t in s.split(SEP) if t]


# -- driver-side merge learning ----------------------------------------------

def bpe_train_incore(word_counts: Iterable[tuple[str, int]],
                     n_merges: int) -> list[tuple[str, str]]:
    """Learn `n_merges` merges from a (word, count) table.

    Deterministic: argmax pair count, ties broken by lexicographic
    (left, right) — byte order on UTF-8, matching both engines' binary
    varchar collation. Merge application is the same bracketed-string
    replace the Spark/DuckDB encoders use. Stops early when no adjacent
    pair remains.
    """
    rows = [(_bracket(w), int(c)) for w, c in word_counts]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, c in rows:
            syms = _symbols(s)
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), _n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((left, right))
        rows = [(_apply_merge(s, left, right), c) for s, c in rows]
    return merges


@dataclass(frozen=True)
class BPEModel:
    """A learned merge table (rank order) with encode/persist helpers."""

    merges: tuple[tuple[str, str], ...]

    def vocab(self) -> list[str]:
        """Merged symbols in rank order (base chars live in the data)."""
        return [left + right for left, right in self.merges]

    def merges_df(self, spark: SparkSession) -> DataFrame:
        rows = [(i + 1, left, right, left + right)
                for i, (left, right) in enumerate(self.merges)]
        return spark.createDataFrame(
            rows, "rank int, left string, right string, merged string")

    def save(self, path: str) -> None:
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        self.merges_df(spark).coalesce(1).write.mode("overwrite") \
            .parquet(path)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "BPEModel":
        rows = spark.read.parquet(path).orderBy("rank").collect()
        return BPEModel(tuple((r["left"], r["right"]) for r in rows))


def bpe_train(df: DataFrame, text_col: str = "text", n_merges: int = 32,
              min_count: int = 1, max_words: int | None = None) -> BPEModel:
    """One corpus pass + driver-side merge loop (see module docstring)."""
    wc = bpe_word_counts(df, text_col, min_count, max_words).collect()
    return BPEModel(tuple(bpe_train_incore(
        [(r["word"], r["cnt"]) for r in wc], n_merges)))


# -- encoding: JVM expression chain (bounded merge tables) ---------------------

def _bracket_expr(text: Column) -> Column:
    """Whole-doc bracketed string: per-segment char brackets, segments
    joined with one extra separator (an unmergeable triple-SEP boundary).
    """
    clean = F.replace(text, F.lit(SEP), F.lit(""))
    segs = bpe_segments(clean)
    brack = F.transform(
        segs, lambda g: F.regexp_replace(g, "(?s)(.)", SEP + "$1" + SEP))
    return F.concat_ws(SEP, brack)


def bpe_encode_expr(text: Column,
                    merges: Sequence[tuple[str, str]]) -> Column:
    """array<string> BPE tokens — a pure chain of JVM `replace` calls.

    One replace per merge; suited to bounded merge tables (gates, probes,
    ablations). For 50k-merge production vocabularies use
    `bpe_encode_pandas`.
    """
    s = _bracket_expr(text)
    for left, right in merges:
        s = F.replace(s, F.lit(SEP + left + SEP + SEP + right + SEP),
                      F.lit(SEP + left + right + SEP))
    return F.filter(F.split(s, SEP + "+"), lambda t: t != "")


def bpe_encode_chain_sql(text: str,
                         merges: Sequence[tuple[str, str]]) -> str:
    """DuckDB twin of `bpe_encode_expr` (merge table as literals)."""
    pat = BPE_SPLIT_RE.replace("'", "''")
    s = (f"coalesce(array_to_string(list_transform("
         f"regexp_extract_all(replace({text}, {_S}, ''), '{pat}', 0), "
         f"g -> regexp_replace(g, '(.)', {_S} || '\\1' || {_S}, 'gs')), "
         f"{_S}), '')")
    for left, right in merges:
        el, er = left.replace("'", "''"), right.replace("'", "''")
        em = (left + right).replace("'", "''")
        s = (f"replace({s}, {_S}||'{el}'||{_S}||{_S}||'{er}'||{_S}, "
             f"{_S}||'{em}'||{_S})")
    return (f"list_filter(string_split_regex({s}, {_S}||'+'), "
            f"t -> t <> '')")


# -- encoding: Arrow batch path (production vocabularies) ----------------------

def bpe_encode_pandas(df: DataFrame, id_col: str, text_col: str,
                      merges: Sequence[tuple[str, str]],
                      out_col: str = "tokens") -> DataFrame:
    """(id, tokens array<string>) via mapInPandas with a segment cache.

    Same rank-order replace semantics as `bpe_encode_expr` (pytest pins
    bit-parity); the per-partition dict caches encoded segments, so the
    merge chain runs once per DISTINCT segment per partition — Zipf
    makes the amortized cost per token ~O(1). Merges ship once per
    executor via closure capture (broadcast-sized: ~1 MB at 50k).
    """
    import re

    merge_list = list(merges)
    seg_re = re.compile(BPE_SPLIT_RE)

    def encode_batches(batches: Iterator["pd.DataFrame"]) \
            -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_segment(seg: str) -> list[str]:
            hit = cache.get(seg)
            if hit is None:
                s = _bracket(seg)
                for left, right in merge_list:
                    s = _apply_merge(s, left, right)
                hit = cache[seg] = _symbols(s)
            return hit

        for pdf in batches:
            toks = [
                [t for seg in seg_re.findall(str(txt).replace(SEP, ""))
                 for t in enc_segment(seg)]
                for txt in pdf[text_col]]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        encode_batches, schema=f"{id_col} {id_type}, {out_col} array<string>")


# -- DuckDB oracle builders (full-pipeline replay, no Python literals) --------

def bpe_train_oracle_sql(docs_sql: str, n_merges: int,
                         text: str = "text", min_count: int = 1,
                         max_words: int | None = None) -> str:
    """Recursive-CTE replay of the ENTIRE training loop.

    Single-row list state (words as bracketed strings + counts); each
    step extracts weighted adjacent pairs, takes the argmax with the
    trainer's exact tiebreak, and applies the merge with the same
    `replace` primitive. Emits (rank, left, right, merged).
    """
    wc = word_counts_sql(docs_sql, text, min_count, max_words)
    return f"""
WITH RECURSIVE {_TRAIN_CTES(wc, n_merges)}
SELECT rank, "left", "right", merged FROM mg ORDER BY rank
"""


def _TRAIN_CTES(wc_sql: str, n_merges: int) -> str:
    """The shared wc/st/mg CTE block (callers add SELECTs / more CTEs)."""
    return f"""wc AS ({wc_sql}),
st AS (
  SELECT 0 AS it,
         list(regexp_replace(word, '(.)', {_S} || '\\1' || {_S}, 'gs')
              ORDER BY word) AS words,
         list(cnt ORDER BY word) AS cnts,
         []::STRUCT(l VARCHAR, r VARCHAR)[] AS merges
  FROM wc
  UNION ALL
  SELECT it + 1,
         list_transform(words, w -> replace(w,
             {_S} || best.l || {_S} || {_S} || best.r || {_S},
             {_S} || best.l || best.r || {_S})),
         cnts,
         list_append(merges, best)
  FROM (
    SELECT it, words, cnts, merges,
      (SELECT {{'l': g.l, 'r': g.r}}
       FROM (SELECT pr.l AS l, pr.r AS r, sum(pr.c) AS n
             FROM (SELECT unnest(flatten(list_transform(
                     generate_series(1, len(syms)), wi ->
                     list_transform(generate_series(1, len(syms[wi]) - 1),
                       i -> {{'l': syms[wi][i], 'r': syms[wi][i + 1],
                              'c': cnts[wi]}})))) AS pr)
             GROUP BY 1, 2) g
       ORDER BY g.n DESC, g.l, g.r LIMIT 1) AS best
    FROM (SELECT it, words, cnts, merges,
                 list_transform(words, w ->
                   string_split(trim(w, {_S}), {_S} || {_S})) AS syms
          FROM st WHERE it < {n_merges}))
  WHERE best IS NOT NULL
),
mg AS MATERIALIZED (
  SELECT i AS rank, merges[i].l AS "left", merges[i].r AS "right",
         merges[i].l || merges[i].r AS merged
  FROM (SELECT merges FROM st ORDER BY it DESC LIMIT 1),
       unnest(generate_series(1, len(merges))) AS t(i)
)"""


def bpe_encode_oracle_sql(docs_sql: str, n_merges: int,
                          id_col: str = "doc_id", text: str = "text",
                          min_count: int = 1,
                          max_words: int | None = None) -> str:
    """Training replay + rank-order encode replay in one statement.

    The encode CTE iterates the merge table by rank (a join against the
    training CTE's output — no Python-derived literals anywhere), then
    tokenizes. Emits (id, n_tokens, tokens_md5).
    """
    wc = word_counts_sql(docs_sql, text, min_count, max_words)
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"""
WITH RECURSIVE {_TRAIN_CTES(wc, n_merges)},
enc AS (
  SELECT {id_col}, 0 AS it,
         coalesce(array_to_string(list_transform(
           regexp_extract_all(replace({text}, {_S}, ''), '{pat}', 0),
           g -> regexp_replace(g, '(.)', {_S} || '\\1' || {_S}, 'gs')),
           {_S}), '') AS s
  FROM ({docs_sql})
  UNION ALL
  SELECT e.{id_col}, e.it + 1,
         replace(e.s, {_S}||m."left"||{_S}||{_S}||m."right"||{_S},
                 {_S}||m.merged||{_S})
  FROM enc e JOIN mg m ON m.rank = e.it + 1
)
SELECT {id_col},
       len(list_filter(string_split_regex(s, {_S}||'+'),
           t -> t <> ''))::BIGINT AS n_tokens,
       md5(coalesce(array_to_string(
           list_filter(string_split_regex(s, {_S}||'+'),
                       t -> t <> ''), {_S}), '')) AS tokens_md5
FROM enc
WHERE it = (SELECT coalesce(max(rank), 0) FROM mg)
ORDER BY {id_col}
"""


# -- token ids: vocabulary ranks for packed training shards --------------------

def build_vocab(encoded: DataFrame, tokens_col: str = "tokens") -> list[str]:
    """Sorted distinct tokens of an encoded corpus — merged symbols plus
    the surviving base characters, so every token the encoder can emit
    on its own training corpus gets an id. Bounded by |merges| + the
    corpus alphabet (Heaps-law sublinear, NOT corpus-proportional), so
    the collect is a driver-bounded model artifact like the merge table
    itself. Sort is binary codepoint order — identical in Python,
    Spark's UTF8String comparison and DuckDB's binary varchar collation,
    so id assignment is engine-exact.
    """
    rows = (encoded.select(F.explode(tokens_col).alias("t"))
            .distinct().orderBy("t").collect())
    return [r["t"] for r in rows]


def token_ids_expr(tokens: Column, vocab: Sequence[str],
                   unk_id: int = -1) -> Column:
    """array<int> ids via a literal-map lookup — pure JVM, no shuffle.

    For bounded vocabularies (gates, probes, ablations): the map ships
    inside the plan. Production vocabularies (50k merges) use
    `tokens_to_ids_pandas`. Unseen tokens map to `unk_id`
    (`try_element_at`: ANSI-safe NULL on a missing key).
    """
    m = F.create_map(*[x for i, v in enumerate(vocab)
                       for x in (F.lit(v), F.lit(i))])
    return F.transform(
        tokens,
        lambda t: F.coalesce(F.try_element_at(m, t),
                             F.lit(unk_id)).cast("int"))


def token_ids_sql(tokens_sql: str, vocab_list_sql: str,
                  unk_id: int = -1) -> str:
    """DuckDB twin of the id lookup. `vocab_list_sql` must be an
    expression of type VARCHAR[] holding the sorted vocabulary (DuckDB
    forbids subqueries inside lambdas, so callers bind it once via a
    cross join: ``CROSS JOIN (SELECT list(token ORDER BY token) AS vl
    FROM vocab)``); id = 0-based position in that order (list_position
    is 1-based, hence the -1). Misses: DuckDB's list_position returns 0
    for a missing element (NULL in some versions) — nullif(…, 0) folds
    both conventions into NULL so coalesce lands on `unk_id` either
    way (pinned by the dropped-vocab branch of the parity test)."""
    return (f"list_transform({tokens_sql}, t -> coalesce("
            f"nullif(list_position({vocab_list_sql}, t), 0) - 1, "
            f"{unk_id})::INT)")


def tokens_to_ids_pandas(df: DataFrame, id_col: str, tokens_col: str,
                         vocab: Sequence[str], out_col: str = "token_ids",
                         unk_id: int = -1) -> DataFrame:
    """(id, token_ids array<int>) — the production path: a closure dict
    ships once per executor (broadcast-sized), lookup is O(1)/token in
    Arrow batches. Same id convention as `token_ids_expr`
    (pytest-pinned equal)."""
    index = {t: i for i, t in enumerate(vocab)}

    def map_batches(batches: Iterator["pd.DataFrame"]) \
            -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids = [[index.get(t, unk_id) for t in toks]
                   for toks in pdf[tokens_col]]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: ids})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, tokens_col).mapInPandas(
        map_batches, schema=f"{id_col} {id_type}, {out_col} array<int>")


def bpe_encode_arrays_sql(docs_sql: str, n_merges: int,
                          id_col: str = "doc_id", text: str = "text",
                          min_count: int = 1,
                          max_words: int | None = None) -> str:
    """Training replay + encode replay emitting (id, tokens LIST) — the
    composition form: feed it as `docs_sql` to
    packing.pack_sequences_oracle_sql (or any consumer of token arrays)
    so a DuckDB oracle replays tokenize→downstream end to end with no
    Python-derived literals."""
    wc = word_counts_sql(docs_sql, text, min_count, max_words)
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"""
WITH RECURSIVE {_TRAIN_CTES(wc, n_merges)},
enc AS (
  SELECT {id_col}, 0 AS it,
         coalesce(array_to_string(list_transform(
           regexp_extract_all(replace({text}, {_S}, ''), '{pat}', 0),
           g -> regexp_replace(g, '(.)', {_S} || '\\1' || {_S}, 'gs')),
           {_S}), '') AS s
  FROM ({docs_sql})
  UNION ALL
  SELECT e.{id_col}, e.it + 1,
         replace(e.s, {_S}||m."left"||{_S}||{_S}||m."right"||{_S},
                 {_S}||m.merged||{_S})
  FROM enc e JOIN mg m ON m.rank = e.it + 1
)
SELECT {id_col},
       list_filter(string_split_regex(s, {_S}||'+'), t -> t <> '')
         AS tokens
FROM enc
WHERE it = (SELECT coalesce(max(rank), 0) FROM mg)
"""
