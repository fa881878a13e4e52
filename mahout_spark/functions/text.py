"""Text primitives: tokenizer, token stats, language-ID, quality, fingerprint.

Every function here comes in two bit-agreeing forms — a Catalyst column
expression and a DuckDB SQL text builder — so the driver's oracle can replay
the exact pipeline. Determinism rules:

- token splitting uses the simple class regex ``[^a-z0-9]+`` which Java
  regex (Spark) and RE2 (DuckDB) interpret identically;
- all scores are built from integer counts + a bounded number of IEEE ops
  (one division, etc.) — no float aggregations whose summation order could
  differ between engines.

The reference's text path is the Lucene-analyzer tokenizer feeding
seq2sparse (mr/.../vectorizer/document/SequenceFileTokenizerMapper.java);
language-ID / quality scoring / fingerprinting are the training-data-
pipeline extensions the engine adds for web-scale corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Tiny embedded stopword lists per language — the language-ID heuristic
# (n-gram/stopword evidence; real systems use fastText, same plumbing).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "his", "her", "this", "have", "not", "are", "be", "you"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "den", "von", "auf", "sich", "des", "dem", "auch", "als", "ich"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une", "dans", "que",
           "pour", "qui", "pas", "sur", "avec", "sont", "mais", "nous"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "es", "por", "con", "para", "del", "se", "no", "su", "al"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "non", "sono",
           "con", "del", "le", "si", "da", "come", "anche", "ma", "nel"],
}
LANG_ORDER = ["en", "de", "fr", "es", "it"]


TOKEN_MATCH_RE = "[a-z0-9]+"


def tokens_array(text: Column) -> Column:
    """array<string> of lowercase [a-z0-9]+ tokens, empties removed.

    Implemented as ``regexp_extract_all`` of the token class rather than
    split-on-separators + filter: the maximal [a-z0-9]+ runs ARE the
    non-empty split segments (verified value-identical corpus-wide incl.
    null/empty/all-separator rows), and extracting them directly skips
    both the empty-string allocations and the per-element filter lambda
    (~30% faster tokenize kernel, guide §1.2 per-task work). The DuckDB
    twin below keeps the split+filter formulation — oracle SQL is frozen
    — which is fine because the two forms are value-identical.
    """
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_MATCH_RE),
                                F.lit(0))


def tokens_array_sql(text: str) -> str:
    return (f"list_filter(regexp_split_to_array(lower({text}), "
            f"'{TOKEN_SPLIT_RE}'), t -> t <> '')")


def explode_tokens(df: DataFrame, id_col: str, text_col: str,
                   token_col: str = "token") -> DataFrame:
    """(id, token) long form — one row per token occurrence.

    The reference's SequenceFileTokenizerMapper analog; `explode` is the
    UDTF shape (one row in, many out) and stays fully JVM-side.
    """
    return df.select(F.col(id_col),
                     F.explode(tokens_array(F.col(text_col))).alias(token_col))


def token_count(text: Column) -> Column:
    """Whitespace/punct token count — JVM-side, no UDF."""
    return F.size(tokens_array(text))


def token_count_sql(text: str) -> str:
    return f"len({tokens_array_sql(text)})"


# GPT-2-style pre-tokenizer pattern, ASCII approximation: contraction
# suffixes, space-prefixed letter/digit runs, other-char runs, whitespace
# runs. Counting these segments estimates BPE token budgets without a
# merges table (real BPE only splits WITHIN segments, so this is a lower
# bound that tracks actual counts closely on natural text). Explicit
# [ \t\n\r] instead of \s — Java \s includes \x0B, RE2's doesn't; with
# this class Java regex (Spark) and RE2 (DuckDB) match identically
# (leftmost-first alternation in both).
BPE_SPLIT_RE = ("'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
                "| ?[^ \\t\\n\\ra-zA-Z0-9]+|[ \\t\\n\\r]+")


def bpe_segments(text: Column) -> Column:
    """array<string> of GPT-2-style pre-tokenizer segments."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token-count estimate — one regexp pass, JVM-side."""
    return F.size(bpe_segments(text))


def bpe_token_count_sql(text: str) -> str:
    pat = BPE_SPLIT_RE.replace("'", "''")
    return f"len(regexp_extract_all({text}, '{pat}', 0))"


# -- language ID -------------------------------------------------------------

def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language evidence = |distinct tokens ∩ stopword list| (integer)."""
    toks = F.array_distinct(tokens_array(text))
    return {lang: F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])))
        for lang in LANG_ORDER}


def detect_lang(text: Column) -> Column:
    """argmax language with deterministic LANG_ORDER tie-break; 'und' when

    no evidence. Integer comparisons only — engine-exact.
    """
    scores = lang_scores(text)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)) \
            .otherwise(expr)
    return expr


def detect_lang_sql(text: str) -> str:
    toks = f"list_distinct({tokens_array_sql(text)})"
    score = {}
    for lang in LANG_ORDER:
        lits = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score[lang] = f"len(list_intersect({toks}, [{lits}]))"
    best = "greatest(" + ", ".join(score[la] for la in LANG_ORDER) + ")"
    expr = "'und'"
    for lang in reversed(LANG_ORDER):
        expr = (f"CASE WHEN {best} > 0 AND {score[lang]} = {best} "
                f"THEN '{lang}' ELSE {expr} END")
    return expr


# -- quality scoring ----------------------------------------------------------

def quality_features(text: Column) -> dict[str, Column]:
    """Integer-count features for document quality (C4/Gopher-style rules)."""
    toks = tokens_array(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    return {"n_chars": n_chars, "n_tokens": n_tokens, "n_alpha": n_alpha,
            "n_digits": n_digit, "n_distinct_tokens": n_distinct}


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality: length gate × alpha ratio × distinct ratio.

    Each factor is (int count) / (int count) — single IEEE divisions, so the
    DuckDB oracle reproduces it bit-exactly.
    """
    f = quality_features(text)
    len_ok = F.when((f["n_tokens"] >= 5) & (f["n_tokens"] <= 100000),
                    F.lit(1.0)).otherwise(F.lit(0.0))
    alpha_ratio = f["n_alpha"].cast("double") / \
        F.greatest(f["n_chars"], F.lit(1)).cast("double")
    distinct_ratio = f["n_distinct_tokens"].cast("double") / \
        F.greatest(f["n_tokens"], F.lit(1)).cast("double")
    return len_ok * alpha_ratio * distinct_ratio


def quality_score_sql(text: str) -> str:
    toks = tokens_array_sql(text)
    n_tokens = f"len({toks})"
    n_chars = f"length({text})"
    n_alpha = f"length(regexp_replace(lower({text}), '[^a-z]', '', 'g'))"
    n_distinct = f"len(list_distinct({toks}))"
    return (f"(CASE WHEN {n_tokens} >= 5 AND {n_tokens} <= 100000 "
            f"THEN 1.0 ELSE 0.0 END) * "
            f"(({n_alpha})::DOUBLE / greatest({n_chars}, 1)::DOUBLE) * "
            f"(({n_distinct})::DOUBLE / greatest({n_tokens}, 1)::DOUBLE)")


# -- fingerprinting ------------------------------------------------------------

def content_fingerprint(text: Column) -> Column:
    """md5 of whitespace-normalized lowercase text — exact-dup key."""
    norm = F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")
    return F.md5(norm)


def content_fingerprint_sql(text: str) -> str:
    # explicit class = Java's \s ([ \t\n\x0B\f\r]); RE2's \s misses \x0B
    return (f"md5(regexp_replace(trim(lower({text})), "
            f"'[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """array of word n-gram shingles from an ALREADY MATERIALIZED token

    array column (project `tokens_array(text)` first — expressions that
    reference a raw tokenizer expr inline and re-evaluate it per element).
    Per-position element_at lookups, JVM-side, no UDF.
    """
    if n == 1:
        return toks
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) >= n, F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]))
    ).otherwise(F.array())


def shingles_array(text: Column, n: int = 3) -> Column:
    """array of word n-gram shingles ('a b c') — MinHash/Jaccard input.

    Convenience form over raw text; hot paths should project
    ``tokens_array(text)`` once and use ``shingles_from_tokens``.
    """
    return shingles_from_tokens(tokens_array(text), n)


def shingles_from_tokens_sql(toks: str, n: int = 3) -> str:
    """DuckDB twin of shingles_from_tokens over an already-computed token
    list expression (pass a MATERIALIZED CTE column, not a raw
    tokenizer expr — same per-element re-evaluation hazard as Spark)."""
    if n == 1:
        return toks
    return (f"CASE WHEN len({toks}) >= {n} THEN "
            f"list_transform(range(1, len({toks}) - {n} + 2), "
            f"i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')) "
            f"ELSE [] END")


def shingles_array_sql(text: str, n: int = 3) -> str:
    return shingles_from_tokens_sql(tokens_array_sql(text), n)
