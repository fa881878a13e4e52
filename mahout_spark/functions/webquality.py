"""Web-corpus quality signals and filters: Gopher rules + C4 rules.

The training-data-pipeline layer on top of ``functions/text.py``: the
repetition/quality heuristics published in Rae et al. 2021 (Gopher,
arXiv:2112.11446 Table A1) and Raffel et al. 2020 (C4, arXiv:1910.10683
§2.2), re-expressed as pure Catalyst column expressions so a 100-TB
filtering pass is a map-only scan — no UDF, no shuffle, fused into the
parquet read by whole-stage codegen.

Every signal comes in two bit-agreeing forms (Spark Column builder +
DuckDB SQL text builder) following the ``text.py`` determinism rules:
integer counts first, at most one IEEE division per signal, threshold
decisions on the exact quotient (never on a rounded value).

Definitional notes (the published rules leave char-counting ambiguous;
we pin deterministic variants and document them):

- *words* = whitespace-split non-empty strings (punctuation kept), the
  Gopher convention; *tokens* = ``text.tokens_array`` ([a-z0-9]+) are
  used only for the stop-word signal.
- ``dup_*_char_frac`` counts characters in occurrences BEYOND THE FIRST
  of each duplicated unit (line / n-gram), over total unit characters —
  the "remove the copies" reading used by public curation stacks.
- ``top_ngram_char_frac`` = max over n-grams of count·len(gram), over
  total text characters; the max of integer products is tie-free by
  construction (ties collapse to the same value).

Reference anchor: the reference repo has no corpus-curation layer at
all (its text path stops at seq2sparse vectorization,
mr/src/main/java/org/apache/mahout/vectorizer/); this module is part of
the brief's LLM-training-data extension surface, same as operators/dedup.py.

Scale design: per-row expressions are O(len²) in the worst case
(distinct-unit counting) but bounded by document length, embarrassingly
parallel, and shuffle-free; ``line_dedup`` (corpus-level C4-style span
dedup) is exactly two shuffles — one hash-partition by line key to pick
winners, one by doc id to reassemble — both AQE-coalesced, no window
over a low-cardinality key, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_array, tokens_array_sql

# Gopher's required-stopword list (Rae et al. Table A1: "contains at
# least two of the following English words").
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

BULLET_PREFIXES = ["•", "-", "*"]  # bullet point, dash, asterisk
ELLIPSIS_SUFFIXES = ["...", "…"]

# C4: terminal punctuation a retained line must end with.
C4_TERMINAL_PUNCT = [".", "!", "?", "\""]
# C4 drops any page containing these (the public description names the
# "List of Dirty, Naughty ..." blocklist and 'lorem ipsum' / '{' rules;
# the blocklist itself is a plug-in parameter).
C4_DOC_BLOCKLIST = ["lorem ipsum", "{"]


# -- unit builders -------------------------------------------------------------

def words_array(text: Column) -> Column:
    """Whitespace-split words, empties removed (punctuation kept)."""
    return F.filter(F.split(text, "\\s+"), lambda w: w != "")


def words_array_sql(text: str) -> str:
    # explicit class = Java's \s ([ \t\n\x0B\f\r]); RE2's \s misses \x0B
    return (f"list_filter(regexp_split_to_array({text}, "
            f"'[ \\t\\n\\x0B\\f\\r]+'), w -> w <> '')")


def lines_array(text: Column) -> Column:
    """Newline-split lines, trimmed, empties removed.

    NB: the trim MUST be a lambda — ``F.trim`` itself has an optional
    second parameter, so ``F.transform`` would call it as
    ``trim(element, index)`` and the index becomes the trim-character
    set (a silent no-op trim; caught by the seeded fuzz parity test).
    """
    return F.filter(F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
                    lambda l: l != "")


def lines_array_sql(text: str) -> str:
    return (f"list_filter(list_transform(string_split({text}, chr(10)), "
            f"l -> trim(l)), l -> l <> '')")


def _word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams (space-joined) from a materialized words array."""
    if n == 1:
        return words
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    return F.when(F.size(words) >= n, F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j) for j in range(n)]))
    ).otherwise(F.array().cast("array<string>"))


def _word_ngrams_sql(words: str, n: int) -> str:
    if n == 1:
        return words
    return (f"CASE WHEN len({words}) >= {n} THEN "
            f"list_transform(range(1, len({words}) - {n} + 2), "
            f"i -> array_to_string(list_slice({words}, i, i + {n} - 1), ' ')) "
            f"ELSE [] END")


def _lit_count(text: Column, lit: str) -> Column:
    """Non-overlapping occurrences of a literal — identical leftmost
    semantics in Spark's replace and DuckDB's replace."""
    return (F.length(text) - F.length(F.replace(text, F.lit(lit)))) \
        / F.lit(len(lit))


def _lit_count_sql(text: str, lit: str) -> str:
    esc = lit.replace("'", "''")
    return (f"(length({text}) - length(replace({text}, '{esc}', '')))"
            f" / {len(lit)}")


# -- Gopher quality signals ----------------------------------------------------

def gopher_quality_signals(text: Column) -> dict[str, Column]:
    """Rae et al. Table A1 quality signals as integer-exact columns."""
    words = words_array(text)
    lines = lines_array(text)
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_chars = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x)
    one = F.greatest(n_words, F.lit(1)).cast("double")
    n_hash = _lit_count(text, "#")
    n_ellipsis = _lit_count(text, "...")
    bullet = F.size(F.filter(lines, _any_prefix))
    ellipsis_end = F.size(F.filter(lines, _any_suffix))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    stops = F.size(F.array_intersect(
        F.array_distinct(tokens_array(text)),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
    return {
        "n_words": n_words,
        "mean_word_length": sum_word_chars.cast("double") / one,
        "symbol_to_word_ratio": (n_hash + n_ellipsis).cast("double") / one,
        "frac_lines_start_bullet": bullet.cast("double")
            / F.greatest(n_lines, F.lit(1)).cast("double"),
        "frac_lines_end_ellipsis": ellipsis_end.cast("double")
            / F.greatest(n_lines, F.lit(1)).cast("double"),
        "frac_words_alpha": alpha_words.cast("double") / one,
        "n_stopwords": stops,
    }


def _any_prefix(line: Column) -> Column:
    expr = F.lit(False)
    for p in BULLET_PREFIXES:
        expr = expr | line.startswith(p)
    return expr


def _any_suffix(line: Column) -> Column:
    expr = F.lit(False)
    for s in ELLIPSIS_SUFFIXES:
        expr = expr | line.endswith(s)
    return expr


def gopher_quality_signals_sql(text: str) -> dict[str, str]:
    words = words_array_sql(text)
    lines = lines_array_sql(text)
    n_words = f"len({words})"
    n_lines = f"len({lines})"
    sum_word_chars = (f"coalesce(list_sum(list_transform({words}, "
                      f"w -> length(w)))::BIGINT, 0)")
    one = f"greatest({n_words}, 1)::DOUBLE"
    n_hash = _lit_count_sql(text, "#")
    n_ellipsis = _lit_count_sql(text, "...")
    bullet_pred = " OR ".join(
        f"starts_with(l, '{p}')" for p in BULLET_PREFIXES)
    ellipsis_pred = " OR ".join(
        f"ends_with(l, '{s}')" for s in ELLIPSIS_SUFFIXES)
    stops_lits = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return {
        "n_words": n_words,
        "mean_word_length": f"({sum_word_chars})::DOUBLE / {one}",
        "symbol_to_word_ratio":
            f"(({n_hash}) + ({n_ellipsis}))::DOUBLE / {one}",
        "frac_lines_start_bullet":
            f"len(list_filter({lines}, l -> {bullet_pred}))::DOUBLE"
            f" / greatest({n_lines}, 1)::DOUBLE",
        "frac_lines_end_ellipsis":
            f"len(list_filter({lines}, l -> {ellipsis_pred}))::DOUBLE"
            f" / greatest({n_lines}, 1)::DOUBLE",
        "frac_words_alpha":
            f"len(list_filter({words}, w -> regexp_matches(w, "
            f"'[a-zA-Z]')))::DOUBLE / {one}",
        "n_stopwords":
            f"len(list_intersect(list_distinct({tokens_array_sql(text)}), "
            f"[{stops_lits}]))",
    }


# -- Gopher repetition signals -------------------------------------------------

def _dup_beyond_first_chars(units: Column) -> Column:
    """Σ over distinct units with count>1 of (count−1)·len(unit)."""
    distinct = F.array_distinct(units)
    per = F.transform(
        distinct,
        lambda u: (F.size(F.filter(units, lambda x: x == u)) - 1)
        * F.length(u))
    return F.aggregate(F.filter(per, lambda c: c > 0), F.lit(0),
                       lambda a, x: a + x)


def _dup_beyond_first_chars_sql(units: str) -> str:
    per = (f"list_transform(list_distinct({units}), "
           f"u -> (len(list_filter({units}, x -> x = u)) - 1) * length(u))")
    return (f"coalesce(list_sum(list_filter({per}, c -> c > 0))::BIGINT, 0)")


def _total_chars(units: Column) -> Column:
    return F.aggregate(F.transform(units, F.length), F.lit(0),
                       lambda a, x: a + x)


def _total_chars_sql(units: str) -> str:
    return (f"coalesce(list_sum(list_transform({units}, "
            f"u -> length(u)))::BIGINT, 0)")


def gopher_repetition_signals(
        text: Column,
        top_ns: tuple[int, ...] = (2, 3, 4),
        dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10)) -> dict[str, Column]:
    """Rae et al. Table A1 repetition signals.

    dup_line/dup_paragraph fractions by count and by character;
    top-n-gram char fraction for n in ``top_ns``; duplicated-n-gram char
    fraction for n in ``dup_ns``. All int/int single divisions.
    """
    out: dict[str, Column] = {}
    words = words_array(text)
    n_text_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    for unit_name, units in (
            ("line", lines_array(text)),
            ("paragraph", paragraphs_array(text))):
        n = F.size(units)
        n_distinct = F.size(F.array_distinct(units))
        out[f"dup_{unit_name}_frac"] = \
            (n - n_distinct).cast("double") \
            / F.greatest(n, F.lit(1)).cast("double")
        out[f"dup_{unit_name}_char_frac"] = \
            _dup_beyond_first_chars(units).cast("double") \
            / F.greatest(_total_chars(units), F.lit(1)).cast("double")
    for n in top_ns:
        grams = _word_ngrams(words, n)
        top_chars = F.coalesce(F.array_max(F.transform(
            F.array_distinct(grams),
            lambda g: F.size(F.filter(grams, lambda x: x == g))
            * F.length(g))), F.lit(0))
        out[f"top_{n}gram_char_frac"] = \
            top_chars.cast("double") / n_text_chars
    for n in dup_ns:
        grams = _word_ngrams(words, n)
        out[f"dup_{n}gram_char_frac"] = \
            _dup_beyond_first_chars(grams).cast("double") / n_text_chars
    return out


def gopher_repetition_signals_sql(
        text: str,
        top_ns: tuple[int, ...] = (2, 3, 4),
        dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10)) -> dict[str, str]:
    out: dict[str, str] = {}
    words = words_array_sql(text)
    n_text_chars = f"greatest(length({text}), 1)::DOUBLE"
    for unit_name, units in (("line", lines_array_sql(text)),
                             ("paragraph", paragraphs_array_sql(text))):
        n = f"len({units})"
        n_distinct = f"len(list_distinct({units}))"
        out[f"dup_{unit_name}_frac"] = \
            (f"({n} - {n_distinct})::DOUBLE / greatest({n}, 1)::DOUBLE")
        out[f"dup_{unit_name}_char_frac"] = \
            (f"({_dup_beyond_first_chars_sql(units)})::DOUBLE / "
             f"greatest({_total_chars_sql(units)}, 1)::DOUBLE")
    for n in top_ns:
        grams = _word_ngrams_sql(words, n)
        top_chars = (f"coalesce(list_max(list_transform("
                     f"list_distinct({grams}), "
                     f"g -> len(list_filter({grams}, x -> x = g)) "
                     f"* length(g))), 0)")
        out[f"top_{n}gram_char_frac"] = \
            f"({top_chars})::DOUBLE / {n_text_chars}"
    for n in dup_ns:
        grams = _word_ngrams_sql(words, n)
        out[f"dup_{n}gram_char_frac"] = \
            (f"({_dup_beyond_first_chars_sql(grams)})::DOUBLE / "
             f"{n_text_chars}")
    return out


# Published Gopher thresholds (Rae et al. Table A1).
GOPHER_THRESHOLDS = {
    "min_words": 50, "max_words": 100_000,
    "min_mean_word_length": 3.0, "max_mean_word_length": 10.0,
    "max_symbol_to_word_ratio": 0.1,
    "max_frac_lines_start_bullet": 0.9,
    "max_frac_lines_end_ellipsis": 0.3,
    "min_frac_words_alpha": 0.8,
    "min_stopwords": 2,
    "max_dup_line_frac": 0.3, "max_dup_paragraph_frac": 0.3,
    "max_dup_line_char_frac": 0.2, "max_dup_paragraph_char_frac": 0.2,
    "max_top_ngram_char_frac": {2: 0.2, 3: 0.18, 4: 0.16},
    "max_dup_ngram_char_frac": {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                                9: 0.11, 10: 0.10},
}


def gopher_keep(text: Column,
                thresholds: dict | None = None) -> Column:
    """Boolean keep decision under the published Gopher thresholds.

    Comparisons run on the EXACT int/int quotients (no pre-rounding) so
    the decision is engine-identical.
    """
    t = thresholds or GOPHER_THRESHOLDS
    q = gopher_quality_signals(text)
    r = gopher_repetition_signals(
        text, top_ns=tuple(t["max_top_ngram_char_frac"]),
        dup_ns=tuple(t["max_dup_ngram_char_frac"]))
    keep = (
        (q["n_words"] >= t["min_words"])
        & (q["n_words"] <= t["max_words"])
        & (q["mean_word_length"] >= t["min_mean_word_length"])
        & (q["mean_word_length"] <= t["max_mean_word_length"])
        & (q["symbol_to_word_ratio"] <= t["max_symbol_to_word_ratio"])
        & (q["frac_lines_start_bullet"]
           <= t["max_frac_lines_start_bullet"])
        & (q["frac_lines_end_ellipsis"]
           <= t["max_frac_lines_end_ellipsis"])
        & (q["frac_words_alpha"] >= t["min_frac_words_alpha"])
        & (q["n_stopwords"] >= t["min_stopwords"])
        & (r["dup_line_frac"] <= t["max_dup_line_frac"])
        & (r["dup_paragraph_frac"] <= t["max_dup_paragraph_frac"])
        & (r["dup_line_char_frac"] <= t["max_dup_line_char_frac"])
        & (r["dup_paragraph_char_frac"]
           <= t["max_dup_paragraph_char_frac"]))
    for n, mx in t["max_top_ngram_char_frac"].items():
        keep = keep & (r[f"top_{n}gram_char_frac"] <= mx)
    for n, mx in t["max_dup_ngram_char_frac"].items():
        keep = keep & (r[f"dup_{n}gram_char_frac"] <= mx)
    return keep


def gopher_keep_sql(text: str, thresholds: dict | None = None) -> str:
    t = thresholds or GOPHER_THRESHOLDS
    q = gopher_quality_signals_sql(text)
    r = gopher_repetition_signals_sql(
        text, top_ns=tuple(t["max_top_ngram_char_frac"]),
        dup_ns=tuple(t["max_dup_ngram_char_frac"]))
    parts = [
        f"({q['n_words']}) >= {t['min_words']}",
        f"({q['n_words']}) <= {t['max_words']}",
        f"({q['mean_word_length']}) >= {t['min_mean_word_length']}",
        f"({q['mean_word_length']}) <= {t['max_mean_word_length']}",
        f"({q['symbol_to_word_ratio']}) <= {t['max_symbol_to_word_ratio']}",
        f"({q['frac_lines_start_bullet']}) <= "
        f"{t['max_frac_lines_start_bullet']}",
        f"({q['frac_lines_end_ellipsis']}) <= "
        f"{t['max_frac_lines_end_ellipsis']}",
        f"({q['frac_words_alpha']}) >= {t['min_frac_words_alpha']}",
        f"({q['n_stopwords']}) >= {t['min_stopwords']}",
        f"({r['dup_line_frac']}) <= {t['max_dup_line_frac']}",
        f"({r['dup_paragraph_frac']}) <= {t['max_dup_paragraph_frac']}",
        f"({r['dup_line_char_frac']}) <= {t['max_dup_line_char_frac']}",
        f"({r['dup_paragraph_char_frac']}) <= "
        f"{t['max_dup_paragraph_char_frac']}",
    ]
    for n, mx in t["max_top_ngram_char_frac"].items():
        parts.append(f"({r[f'top_{n}gram_char_frac']}) <= {mx}")
    for n, mx in t["max_dup_ngram_char_frac"].items():
        parts.append(f"({r[f'dup_{n}gram_char_frac']}) <= {mx}")
    return "(" + " AND ".join(parts) + ")"


def paragraphs_array(text: Column) -> Column:
    # lambda, not bare F.trim — see lines_array for the arity trap
    return F.filter(F.transform(F.split(text, "\n\\s*\n"),
                                lambda p: F.trim(p)),
                    lambda p: p != "")


def paragraphs_array_sql(text: str) -> str:
    # [ \t\n\x0B\f\r] = Java's \s exactly (RE2's \s misses \x0B)
    return (f"list_filter(list_transform(regexp_split_to_array({text}, "
            f"'\\n[ \\t\\n\\x0B\\f\\r]*\\n'), p -> trim(p)), p -> p <> '')")


# -- hot-path DataFrame form ---------------------------------------------------
#
# The expression-level builders above re-instantiate the tokenizer inside
# every higher-order lambda, so Catalyst evaluates split() once PER ARRAY
# ELEMENT — O(d³) per row, measured 630 s for 500 docs. The DataFrame form
# materializes each unit array in its own projection first; downstream
# signals then reference plain attributes (free), and CollapseProject
# will not re-inline a non-cheap expression referenced more than once.
# Same formulas, bit-identical values, ~100× faster. Use THIS at scale.

def _signal_map(text: Column, words: Column, lines: Column, paras: Column,
                toks: Column, ngrams: dict[int, Column],
                top_ns: tuple[int, ...],
                dup_ns: tuple[int, ...]) -> dict[str, Column]:
    """All Gopher signals from MATERIALIZED unit arrays (attributes)."""
    n_words = F.size(words)
    one = F.greatest(n_words, F.lit(1)).cast("double")
    n_lines = F.size(lines)
    sum_word_chars = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x)
    out = {
        "n_words": n_words,
        "mean_word_length": sum_word_chars.cast("double") / one,
        "symbol_to_word_ratio":
            (_lit_count(text, "#") + _lit_count(text, "...")).cast("double")
            / one,
        "frac_lines_start_bullet":
            F.size(F.filter(lines, _any_prefix)).cast("double")
            / F.greatest(n_lines, F.lit(1)).cast("double"),
        "frac_lines_end_ellipsis":
            F.size(F.filter(lines, _any_suffix)).cast("double")
            / F.greatest(n_lines, F.lit(1)).cast("double"),
        "frac_words_alpha":
            F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
            .cast("double") / one,
        "n_stopwords": F.size(F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))),
    }
    n_text_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    for unit_name, units in (("line", lines), ("paragraph", paras)):
        n = F.size(units)
        out[f"dup_{unit_name}_frac"] = \
            (n - F.size(F.array_distinct(units))).cast("double") \
            / F.greatest(n, F.lit(1)).cast("double")
        out[f"dup_{unit_name}_char_frac"] = \
            _dup_beyond_first_chars(units).cast("double") \
            / F.greatest(_total_chars(units), F.lit(1)).cast("double")
    for n in top_ns:
        grams = ngrams[n]
        out[f"top_{n}gram_char_frac"] = F.coalesce(F.array_max(F.transform(
            F.array_distinct(grams),
            lambda g: F.size(F.filter(grams, lambda x: x == g))
            * F.length(g))), F.lit(0)).cast("double") / n_text_chars
    for n in dup_ns:
        out[f"dup_{n}gram_char_frac"] = \
            _dup_beyond_first_chars(ngrams[n]).cast("double") / n_text_chars
    return out


def _keep_from_signals(sig: dict[str, Column], t: dict) -> Column:
    keep = (
        (sig["n_words"] >= t["min_words"])
        & (sig["n_words"] <= t["max_words"])
        & (sig["mean_word_length"] >= t["min_mean_word_length"])
        & (sig["mean_word_length"] <= t["max_mean_word_length"])
        & (sig["symbol_to_word_ratio"] <= t["max_symbol_to_word_ratio"])
        & (sig["frac_lines_start_bullet"]
           <= t["max_frac_lines_start_bullet"])
        & (sig["frac_lines_end_ellipsis"]
           <= t["max_frac_lines_end_ellipsis"])
        & (sig["frac_words_alpha"] >= t["min_frac_words_alpha"])
        & (sig["n_stopwords"] >= t["min_stopwords"])
        & (sig["dup_line_frac"] <= t["max_dup_line_frac"])
        & (sig["dup_paragraph_frac"] <= t["max_dup_paragraph_frac"])
        & (sig["dup_line_char_frac"] <= t["max_dup_line_char_frac"])
        & (sig["dup_paragraph_char_frac"]
           <= t["max_dup_paragraph_char_frac"]))
    for n, mx in t["max_top_ngram_char_frac"].items():
        keep = keep & (sig[f"top_{n}gram_char_frac"] <= mx)
    for n, mx in t["max_dup_ngram_char_frac"].items():
        keep = keep & (sig[f"dup_{n}gram_char_frac"] <= mx)
    return keep


def gopher_signals_df(df: DataFrame, text_col: str = "text",
                      top_ns: tuple[int, ...] = (2, 3, 4),
                      dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
                      with_keep: bool = True,
                      thresholds: dict | None = None) -> DataFrame:
    """df + every Gopher signal column (+ ``keep``) — the scale path.

    Three chained projections: unit arrays → n-gram arrays → signals;
    each stage references only attributes of the previous one, so no
    expensive expression is ever evaluated more than once per row.
    Map-only, shuffle-free, whole-stage-codegen friendly.
    """
    t = thresholds or GOPHER_THRESHOLDS
    if with_keep:
        top_ns = tuple(sorted(set(top_ns)
                              | set(t["max_top_ngram_char_frac"])))
        dup_ns = tuple(sorted(set(dup_ns)
                              | set(t["max_dup_ngram_char_frac"])))
    tc = F.col(text_col)
    base = df.withColumns({
        "__words": words_array(tc), "__lines": lines_array(tc),
        "__paras": paragraphs_array(tc), "__toks": tokens_array(tc)})
    all_ns = sorted({n for n in (*top_ns, *dup_ns) if n != 1})
    base = base.withColumns(
        {f"__ng{n}": _word_ngrams(F.col("__words"), n) for n in all_ns})
    ngrams = {n: F.col(f"__ng{n}") for n in all_ns}
    if 1 in (*top_ns, *dup_ns):
        ngrams[1] = F.col("__words")
    sig = _signal_map(tc, F.col("__words"), F.col("__lines"),
                      F.col("__paras"), F.col("__toks"), ngrams,
                      top_ns, dup_ns)
    out = base.withColumns({k: v for k, v in sig.items()})
    if with_keep:
        out = out.withColumn(
            "keep", _keep_from_signals(
                {k: F.col(k) for k in sig}, t))
    return out.drop("__words", "__lines", "__paras", "__toks",
                    *[f"__ng{n}" for n in all_ns])


def gopher_signals_sql(table: str, id_col: str = "doc_id",
                       text_col: str = "text",
                       top_ns: tuple[int, ...] = (2, 3, 4),
                       dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
                       with_keep: bool = True,
                       thresholds: dict | None = None) -> str:
    """DuckDB twin of ``gopher_signals_df``: MATERIALIZED array CTE +
    lateral-alias n-grams, then signal formulas over plain columns —
    identical arithmetic, one evaluation per unit array."""
    t = thresholds or GOPHER_THRESHOLDS
    if with_keep:
        top_ns = tuple(sorted(set(top_ns)
                              | set(t["max_top_ngram_char_frac"])))
        dup_ns = tuple(sorted(set(dup_ns)
                              | set(t["max_dup_ngram_char_frac"])))
    all_ns = sorted({n for n in (*top_ns, *dup_ns) if n != 1})
    ng_defs = ", ".join(
        f"{_word_ngrams_sql('words', n)} AS ng{n}" for n in all_ns)
    arrays = (f"SELECT {id_col}, {text_col} AS __t, "
              f"{words_array_sql(text_col)} AS words, "
              f"{lines_array_sql(text_col)} AS lines, "
              f"{paragraphs_array_sql(text_col)} AS paras, "
              f"{tokens_array_sql(text_col)} AS toks"
              + (", " + ng_defs if ng_defs else "")
              + f" FROM {table}")

    def gram(n: int) -> str:
        return "words" if n == 1 else f"ng{n}"

    one = "greatest(len(words), 1)::DOUBLE"
    stops_lits = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    bullet_pred = " OR ".join(
        f"starts_with(l, '{p}')" for p in BULLET_PREFIXES)
    ellipsis_pred = " OR ".join(
        f"ends_with(l, '{s}')" for s in ELLIPSIS_SUFFIXES)
    sig: dict[str, str] = {
        "n_words": "len(words)",
        "mean_word_length":
            "(coalesce(list_sum(list_transform(words, w -> length(w)))"
            f"::BIGINT, 0))::DOUBLE / {one}",
        "symbol_to_word_ratio":
            f"(({_lit_count_sql('__t', '#')}) + "
            f"({_lit_count_sql('__t', '...')}))::DOUBLE / {one}",
        "frac_lines_start_bullet":
            f"len(list_filter(lines, l -> {bullet_pred}))::DOUBLE"
            " / greatest(len(lines), 1)::DOUBLE",
        "frac_lines_end_ellipsis":
            f"len(list_filter(lines, l -> {ellipsis_pred}))::DOUBLE"
            " / greatest(len(lines), 1)::DOUBLE",
        "frac_words_alpha":
            "len(list_filter(words, w -> regexp_matches(w, "
            f"'[a-zA-Z]')))::DOUBLE / {one}",
        "n_stopwords":
            f"len(list_intersect(list_distinct(toks), [{stops_lits}]))",
    }
    n_text_chars = "greatest(length(__t), 1)::DOUBLE"
    for unit_name, units in (("line", "lines"), ("paragraph", "paras")):
        sig[f"dup_{unit_name}_frac"] = \
            (f"(len({units}) - len(list_distinct({units})))::DOUBLE / "
             f"greatest(len({units}), 1)::DOUBLE")
        sig[f"dup_{unit_name}_char_frac"] = \
            (f"({_dup_beyond_first_chars_sql(units)})::DOUBLE / "
             f"greatest({_total_chars_sql(units)}, 1)::DOUBLE")
    for n in top_ns:
        g = gram(n)
        sig[f"top_{n}gram_char_frac"] = \
            (f"(coalesce(list_max(list_transform(list_distinct({g}), "
             f"gg -> len(list_filter({g}, x -> x = gg)) * length(gg))), "
             f"0))::DOUBLE / {n_text_chars}")
    for n in dup_ns:
        sig[f"dup_{n}gram_char_frac"] = \
            (f"({_dup_beyond_first_chars_sql(gram(n))})::DOUBLE / "
             f"{n_text_chars}")
    sig_sel = ", ".join(f"{v} AS {k}" for k, v in sig.items())
    parts = [
        f"n_words >= {t['min_words']}", f"n_words <= {t['max_words']}",
        f"mean_word_length >= {t['min_mean_word_length']}",
        f"mean_word_length <= {t['max_mean_word_length']}",
        f"symbol_to_word_ratio <= {t['max_symbol_to_word_ratio']}",
        f"frac_lines_start_bullet <= {t['max_frac_lines_start_bullet']}",
        f"frac_lines_end_ellipsis <= {t['max_frac_lines_end_ellipsis']}",
        f"frac_words_alpha >= {t['min_frac_words_alpha']}",
        f"n_stopwords >= {t['min_stopwords']}",
        f"dup_line_frac <= {t['max_dup_line_frac']}",
        f"dup_paragraph_frac <= {t['max_dup_paragraph_frac']}",
        f"dup_line_char_frac <= {t['max_dup_line_char_frac']}",
        f"dup_paragraph_char_frac <= {t['max_dup_paragraph_char_frac']}",
    ]
    for n, mx in t["max_top_ngram_char_frac"].items():
        parts.append(f"top_{n}gram_char_frac <= {mx}")
    for n, mx in t["max_dup_ngram_char_frac"].items():
        parts.append(f"dup_{n}gram_char_frac <= {mx}")
    keep = ", (" + " AND ".join(parts) + ") AS keep" if with_keep else ""
    return (f"WITH __arrays AS MATERIALIZED ({arrays}), "
            f"__sig AS MATERIALIZED "
            f"(SELECT {id_col}, {sig_sel} FROM __arrays) "
            f"SELECT {id_col}, " + ", ".join(sig) + keep + " FROM __sig")


def gopher_filter(df: DataFrame, text_col: str = "text",
                  thresholds: dict | None = None) -> DataFrame:
    """df → rows passing the Gopher quality gate (map-only scan)."""
    sig = gopher_signals_df(df, text_col, with_keep=True,
                            thresholds=thresholds)
    return sig.where(F.col("keep")).select(*df.columns)


# -- C4 filters ----------------------------------------------------------------

def c4_line_keep(line: Column, min_words: int = 5) -> Column:
    """Raffel et al. §2.2 per-line rule: terminal punctuation + ≥5 words
    + no 'javascript' mention."""
    punct = F.lit(False)
    for p in C4_TERMINAL_PUNCT:
        punct = punct | F.trim(line).endswith(p)
    return (punct
            & (F.size(words_array(line)) >= min_words)
            & ~F.lower(line).contains("javascript"))


def c4_line_keep_sql(line: str, min_words: int = 5) -> str:
    punct = " OR ".join(f"ends_with(trim({line}), '{p}')"
                        if p != "\"" else f"ends_with(trim({line}), '\"')"
                        for p in C4_TERMINAL_PUNCT)
    return (f"(({punct}) AND len({words_array_sql(line)}) >= {min_words} "
            f"AND NOT contains(lower({line}), 'javascript'))")


def c4_clean(df: DataFrame, text_col: str = "text",
             min_sentences: int = 3,
             blocklist: list[str] | None = None) -> DataFrame:
    """C4 document cleaning: drop bad lines, re-join, gate the document.

    Adds ``c4_text`` (retained lines re-joined with newlines),
    ``n_sentences`` (terminal-punct count over the cleaned text) and
    ``c4_keep``. Map-only; blocklist hits and the sentence minimum are
    evaluated on the CLEANED text, matching the published order.
    """
    block = blocklist if blocklist is not None else C4_DOC_BLOCKLIST
    # single-arg wrapper: F.filter passes (element, index) to 2-param
    # callables, which would bind the array index to min_words.
    kept = F.filter(lines_array(F.col(text_col)),
                    lambda l: c4_line_keep(l))
    out = df.withColumn("c4_text", F.array_join(kept, "\n"))
    n_sent = (
        F.length(F.regexp_replace(F.col("c4_text"), "[^.!?]", ""))
    )
    keep = n_sent >= min_sentences
    for b in block:
        keep = keep & ~F.lower(F.col("c4_text")).contains(b.lower())
    return out.withColumn("n_sentences", n_sent) \
              .withColumn("c4_keep", keep)


def c4_clean_sql(text: str, min_sentences: int = 3,
                 blocklist: list[str] | None = None) -> dict[str, str]:
    """DuckDB twins for c4_clean's derived columns, keyed like the
    Spark output (c4_text / n_sentences / c4_keep)."""
    block = blocklist if blocklist is not None else C4_DOC_BLOCKLIST
    kept = (f"list_filter({lines_array_sql(text)}, "
            f"l -> {c4_line_keep_sql('l')})")
    # DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''.
    c4_text = f"coalesce(array_to_string({kept}, chr(10)), '')"
    n_sent = (f"length(regexp_replace({c4_text}, '[^.!?]', '', 'g'))")
    keep_parts = [f"({n_sent}) >= {min_sentences}"]
    for b in block:
        esc = b.lower().replace("'", "''")
        keep_parts.append(f"NOT contains(lower({c4_text}), '{esc}')")
    return {"c4_text": c4_text, "n_sentences": n_sent,
            "c4_keep": "(" + " AND ".join(keep_parts) + ")"}


# -- corpus-level line dedup (C4 span-dedup analog) ----------------------------

def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Corpus-level exact line dedup: every distinct (normalized) line
    survives exactly once, at its first occurrence — C4's three-sentence-
    span dedup re-expressed at line granularity.

    First occurrence = lexicographic min (id, line position); the winner
    set is computed with ONE groupBy on the line key (map-side combine,
    hash-partitioned — no global sort, no low-cardinality window), then
    an equi-join back and a per-document reassembly groupBy. Two
    shuffles total; at 10^12 docs both are key-hash partitioned and
    AQE-coalesced, and the dedup key is the line itself (arbitrarily
    many distinct values — no skew pile-up beyond boilerplate lines,
    which collapse to a single winner row in the combine).

    Returns (id, text_dedup, n_lines, n_lines_kept); documents whose
    every line was a later duplicate keep an empty text_dedup.
    """
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(lines_array(F.col(text_col)))
        .alias("__pos", "__line"))
    winners = lines.groupBy("__line").agg(
        F.min(F.struct("__id", "__pos")).alias("__first"))
    kept = (lines.join(winners, "__line")
            .where((F.col("__id") == F.col("__first.__id"))
                   & (F.col("__pos") == F.col("__first.__pos")))
            .select("__id", "__pos", "__line"))
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(
                F.struct("__pos", "__line"))), lambda s: s["__line"]),
            "\n").alias("text_dedup"),
        F.count("*").alias("n_lines_kept"))
    base = df.select(F.col(id_col).alias("__id"),
                     F.size(lines_array(F.col(text_col))).alias("n_lines"))
    return (base.join(rebuilt, "__id", "left")
            .select(F.col("__id").alias(id_col),
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
                    "n_lines",
                    F.coalesce("n_lines_kept", F.lit(0))
                    .cast("long").alias("n_lines_kept")))


# -- PII scrubbing ---------------------------------------------------------------
#
# Standard curation stage before training-data release: replace emails,
# IPv4 addresses, and phone-like digit runs with typed placeholder
# tokens. ASCII-only regexes chosen for identical Java-regex/RE2
# semantics; map-only, chained regexp_replace, no UDF. Patterns are
# deliberately conservative (precision over recall) and pluggable via
# the PII_RULES list — a production deployment swaps in its legal
# team's rules, the plan shape (N chained regexp_replace over one scan)
# is unchanged.
#
# Boundary contract: rule patterns are written in RE2-safe syntax and
# \b means RE2's ASCII word boundary ([0-9A-Za-z_] vs not). Java's \b
# is Unicode-aware even without UNICODE_CHARACTER_CLASS ('é' is a word
# char, so 'à1.2.3.4' has no Java boundary — caught by the seeded fuzz
# parity test), so the Spark side mechanically rewrites \b to the
# equivalent ASCII lookaround before compiling.

_ASCII_B = ("(?:(?<=[0-9A-Za-z_])(?![0-9A-Za-z_])"
            "|(?<![0-9A-Za-z_])(?=[0-9A-Za-z_]))")


def _java_pat(pat: str) -> str:
    """RE2-style pattern → Java pattern (ASCII \\b)."""
    return pat.replace("\\b", _ASCII_B)

PII_RULES: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("email",
     "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
     "<EMAIL>"),
    # card BEFORE phone: a 16-digit grouped run must become <CARD>,
    # never phone fragments. Four - or space-separated groups (mixing
    # allowed — uniform separators would need a backreference, which
    # RE2 lacks) or a bare 13-19-digit run.
    ("card",
     "\\b[0-9]{4}([- ][0-9]{4}){2}[- ][0-9]{1,7}\\b|\\b[0-9]{13,19}\\b",
     "<CARD>"),
    ("ipv4",
     "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
     "<IP>"),
    ("phone",
     "(\\+?[0-9]{1,3}[-. (]{0,2}[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]?"
     "[0-9]{2,4})|([0-9]{3}[-.][0-9]{3}[-.][0-9]{4})",
     "<PHONE>"),
]


def scrub_pii(text: Column,
              rules: list[tuple[str, str, str]] | None = None) -> Column:
    """Text with PII spans replaced by typed placeholders (rule order
    matters: earlier rules consume their spans first)."""
    out = text
    for _, pat, repl in (rules if rules is not None else PII_RULES):
        out = F.regexp_replace(out, _java_pat(pat), repl)
    return out


def scrub_pii_sql(text: str,
                  rules: list[tuple[str, str, str]] | None = None) -> str:
    out = text
    for _, pat, repl in (rules if rules is not None else PII_RULES):
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def pii_counts(text: Column,
               rules: list[tuple[str, str, str]] | None = None
               ) -> dict[str, Column]:
    """Per-rule match counts (sequential semantics: each rule counts on
    the text AFTER earlier rules ran, matching scrub_pii's consumption
    order) — audit/reporting signal alongside the scrub."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, repl in (rules if rules is not None else PII_RULES):
        jpat = _java_pat(pat)
        out[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(jpat), F.lit(0)))
        cur = F.regexp_replace(cur, jpat, repl)
    return out


def pii_counts_sql(text: str,
                   rules: list[tuple[str, str, str]] | None = None
                   ) -> dict[str, str]:
    out: dict[str, str] = {}
    cur = text
    for name, pat, repl in (rules if rules is not None else PII_RULES):
        p = pat.replace("'", "''")
        out[f"n_{name}"] = f"len(regexp_extract_all({cur}, '{p}', 0))"
        cur = f"regexp_replace({cur}, '{p}', '{repl}', 'g')"
    return out
