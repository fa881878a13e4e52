"""Gopher/C4 web-corpus quality signals: hand-computed goldens + DuckDB
bit-parity + the corpus-level line dedup operator."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions import webquality as wq

TEXTS = [
    # 0: clean English prose with an exact duplicate sentence
    "The cat sat on the mat. The cat sat on the mat. It was good to be "
    "with that cat, and we have to be of good cheer.",
    # 1: bullets, duplicate lines, duplicate paragraphs
    "- bullet one\n- bullet two\nplain line here we go now...\n"
    "plain line here we go now...\n\npara two\n\npara two",
    # 2: empty
    "",
    # 3: symbol soup
    "### code ### block ... ... more ... stuff # here",
    # 4: too short
    "short",
    # 5: extreme 2-gram repetition
    "a b a b a b a b a b a b a b a b a b a b",
    # 6: unicode bullet + ellipsis char
    "• uni bullet\nline ends…\nnormal line with words here.",
    # 7: C4 line rules — quotes, questions, a javascript line
    'He said "quote" and left! Did he? Yes. javascript line here '
    "should die.\nGood line with five words total.",
    # 8: cross-line duplicate for line_dedup
    "same line here again ok.\nsame line here again ok.\n"
    "unique one two three four.",
]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, text string")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("t", pd.DataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], columns=["id", "text"]))
    return c


# -- hand-computed goldens -----------------------------------------------------

def test_quality_signals_golden(tdf):
    q = wq.gopher_quality_signals(F.col("text"))
    row = {r["id"]: r for r in tdf.select(
        "id", *[v.alias(k) for k, v in q.items()]).collect()}
    # doc 0: 28 whitespace words; stopwords present
    assert row[0]["n_words"] == 28
    assert row[0]["n_stopwords"] >= 6   # the,be,to,of,and,that,have,with
    assert row[2]["n_words"] == 0 and row[2]["mean_word_length"] == 0.0
    # doc 3: 11 words, 7 '#' chars + 3 '...' → ratio 10/11
    assert row[3]["symbol_to_word_ratio"] == pytest.approx(10 / 11)
    # doc 1: 6 non-empty lines, 2 bullets, 2 '...'-enders
    assert row[1]["frac_lines_start_bullet"] == pytest.approx(2 / 6)
    assert row[1]["frac_lines_end_ellipsis"] == pytest.approx(2 / 6)
    # doc 6: unicode bullet/ellipsis recognized
    assert row[6]["frac_lines_start_bullet"] == pytest.approx(1 / 3)
    assert row[6]["frac_lines_end_ellipsis"] == pytest.approx(1 / 3)
    # doc 5: all words alphabetic, 1-char mean
    assert row[5]["frac_words_alpha"] == 1.0
    assert row[5]["mean_word_length"] == 1.0


def test_repetition_signals_golden(tdf):
    r = wq.gopher_repetition_signals(F.col("text"))
    row = {x["id"]: x for x in tdf.select(
        "id", *[v.alias(k) for k, v in r.items()]).collect()}
    # doc 1: 6 lines, 2 duplicated (one dup each) → frac 2/6
    assert row[1]["dup_line_frac"] == pytest.approx(2 / 6)
    # paragraphs: '- bullet one ... now...' block + 'para two' ×2 → 1/3 dup
    assert row[1]["dup_paragraph_frac"] == pytest.approx(1 / 3)
    # doc 5: "a b" 2-grams: 19 grams of len 3, top count 10 ('a b')
    # → top chars 30 over 39 text chars
    assert row[5]["top_2gram_char_frac"] == pytest.approx(30 / 39)
    # doc 2 (empty): everything 0
    for k, v in row[2].asDict().items():
        if k != "id":
            assert v == 0.0
    # doc 0: the duplicated 5-gram "the cat sat on the" exists → frac > 0
    assert row[0]["dup_5gram_char_frac"] > 0.0


def test_gopher_keep_thresholds(spark):
    # 60 clean non-repetitive words pass; word count < 50 fails.
    good = ("The quick brown fox jumps over the lazy dog while seven "
            "wizards brew strange potions near an ancient stone bridge, "
            "and every curious traveler must pause to watch the river "
            "flow beneath pale morning light before walking onward "
            "through quiet villages that have kept their old customs "
            "alive with songs, stories, and warm bread shared among "
            "friendly neighbors each evening.")
    df = spark.createDataFrame([(0, good), (1, "too short to keep.")],
                               "id long, text string")
    out = {r["id"]: r["k"] for r in df.select(
        "id", wq.gopher_keep(F.col("text")).alias("k")).collect()}
    assert out[0] is True and out[1] is False


# -- DuckDB twin bit-parity -----------------------------------------------------

def test_signals_match_duckdb_bit_exact(tdf, con):
    q = wq.gopher_quality_signals(F.col("text"))
    r = wq.gopher_repetition_signals(F.col("text"))
    cols = ([v.alias(k) for k, v in q.items()]
            + [v.alias(k) for k, v in r.items()]
            + [wq.gopher_keep(F.col("text")).cast("int").alias("keep")])
    sp = tdf.select("id", *cols).orderBy("id").collect()
    qs = wq.gopher_quality_signals_sql("text")
    rs = wq.gopher_repetition_signals_sql("text")
    sel = ", ".join([f"{v} AS {k}" for k, v in qs.items()]
                    + [f"{v} AS {k}" for k, v in rs.items()]
                    + [f"({wq.gopher_keep_sql('text')})::INT AS keep"])
    du = con.execute(f"SELECT id, {sel} FROM t ORDER BY id").fetchall()
    names = ["id"] + list(qs) + list(rs) + ["keep"]
    for srow, drow in zip(sp, du):
        for nm, a, b in zip(names, srow, drow):
            assert a == b, (srow[0], nm, a, b)


def test_c4_clean_matches_duckdb(tdf, con):
    sp = wq.c4_clean(tdf).select(
        "id", "c4_text", "n_sentences",
        F.col("c4_keep").cast("int").alias("c4_keep")) \
        .orderBy("id").collect()
    s = wq.c4_clean_sql("text")
    du = con.execute(
        f"SELECT id, {s['c4_text']} AS c4_text, "
        f"{s['n_sentences']} AS n_sentences, "
        f"({s['c4_keep']})::INT AS c4_keep FROM t ORDER BY id").fetchall()
    for srow, drow in zip(sp, du):
        assert tuple(srow) == tuple(drow)


def test_c4_line_rules(tdf):
    out = {r["id"]: r for r in wq.c4_clean(tdf).collect()}
    # doc 7: javascript line dropped even though it ends in '.'
    assert "javascript" not in out[7]["c4_text"]
    assert out[7]["c4_text"] == "Good line with five words total."
    # doc 3: nothing survives (no terminal punctuation)
    assert out[3]["c4_text"] == "" and not out[3]["c4_keep"]
    # blocklist: a '{' in the cleaned text kills the doc
    assert wq.C4_DOC_BLOCKLIST == ["lorem ipsum", "{"]


def test_c4_blocklist_hits_cleaned_text_only(spark):
    # '{' appears only on a line that the LINE filter drops → doc survives.
    t = ("code { block\n"
         "This is a real sentence with many words in it. "
         "Here is another full sentence for the count. "
         "And a third sentence to pass the gate.")
    df = spark.createDataFrame([(0, t)], "id long, text string")
    row = wq.c4_clean(df).collect()[0]
    assert "{" not in row["c4_text"] and row["c4_keep"]


def test_signals_df_matches_expression_form(tdf):
    """The materialized-arrays scale path == the expression form."""
    q = wq.gopher_quality_signals(F.col("text"))
    r = wq.gopher_repetition_signals(F.col("text"))
    expr_rows = tdf.select(
        "id", *[v.alias(k) for k, v in {**q, **r}.items()],
        wq.gopher_keep(F.col("text")).alias("keep")) \
        .orderBy("id").collect()
    df_rows = wq.gopher_signals_df(tdf).orderBy("id") \
        .drop("text").collect()
    names = ["id"] + list(q) + list(r) + ["keep"]
    for e, d in zip(expr_rows, df_rows):
        for nm in names:
            assert e[nm] == d[nm], (e["id"], nm, e[nm], d[nm])


def test_signals_df_matches_duckdb_cte(tdf, con):
    df_rows = wq.gopher_signals_df(tdf).orderBy("id") \
        .drop("text").collect()
    sql = wq.gopher_signals_sql("t", "id", "text")
    du = con.execute(
        f"SELECT * FROM ({sql}) g ORDER BY id").fetchdf()
    assert list(du.columns) == list(df_rows[0].asDict().keys())
    for i, srow in enumerate(df_rows):
        for nm, v in srow.asDict().items():
            dv = du.iloc[i][nm]
            dv = bool(dv) if nm == "keep" else \
                (dv.item() if hasattr(dv, "item") else dv)
            assert v == dv, (srow["id"], nm, v, dv)


def test_gopher_filter_matches_keep(tdf):
    kept = wq.gopher_filter(tdf)
    assert kept.columns == tdf.columns
    ids = {r["id"] for r in kept.collect()}
    expected = {r["id"] for r in wq.gopher_signals_df(tdf)
                .where(F.col("keep")).collect()}
    assert ids == expected


# -- corpus line dedup -----------------------------------------------------------

def test_line_dedup_first_occurrence_wins(tdf):
    out = {r["doc_id"]: r for r in
           wq.line_dedup(tdf, "id", "text")
           .withColumnRenamed("id", "doc_id").collect()}
    # doc 8's first copy of the dup line survives, second dies
    assert out[8]["text_dedup"] == \
        "same line here again ok.\nunique one two three four."
    assert out[8]["n_lines"] == 3 and out[8]["n_lines_kept"] == 2
    # empty doc → empty output, 0 lines
    assert out[2]["text_dedup"] == "" and out[2]["n_lines_kept"] == 0


def test_line_dedup_cross_document(spark):
    df = spark.createDataFrame(
        [(10, "shared line here.\nown line ten."),
         (11, "shared line here.\nown line eleven."),
         (12, "shared line here.")],
        "id long, text string")
    out = {r["id"]: r for r in wq.line_dedup(df, "id", "text").collect()}
    assert out[10]["text_dedup"] == "shared line here.\nown line ten."
    assert out[11]["text_dedup"] == "own line eleven."
    assert out[12]["text_dedup"] == "" and out[12]["n_lines_kept"] == 0


def test_line_dedup_partitioning_invariant(spark, tdf):
    a = wq.line_dedup(tdf.repartition(7), "id", "text") \
        .orderBy("id").collect()
    b = wq.line_dedup(tdf.coalesce(1), "id", "text") \
        .orderBy("id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_gopher_filter_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = wq.gopher_filter(docs).count()
    total = docs.count()
    assert 0 <= kept <= total
    # repetition-only variant: the synthetic docs are one-line token
    # streams, so line signals are degenerate but n-gram signals bite.
    sig = docs.select(wq.gopher_repetition_signals(
        F.col("text"))["top_2gram_char_frac"].alias("f"))
    mx = sig.agg(F.max("f")).first()[0]
    assert mx > 0.0


# -- PII scrubbing ---------------------------------------------------------------

PII_TEXTS = [
    "email me at john.doe+spam@example.co.uk or admin@sub.example.com",
    "server at 192.168.0.1 and 8.8.8.8; version 1.2.3.4.5 stays? no",
    "call +1 (555) 123-4567 or 555-123-4567 now",
    "date 2026-08-18 should stay; no phone here",
    "no pii here at all",
    "",
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], "id long, text string")


def test_scrub_pii_golden(pii_df):
    got = {r["id"]: r["s"] for r in pii_df.select(
        "id", wq.scrub_pii(F.col("text")).alias("s")).collect()}
    assert got[0] == "email me at <EMAIL> or <EMAIL>"
    assert got[1] == "server at <IP> and <IP>; version <IP>.5 stays? no"
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[3] == "date 2026-08-18 should stay; no phone here"
    assert got[4] == PII_TEXTS[4] and got[5] == ""


def test_scrub_pii_card_rule(spark):
    df = spark.createDataFrame(
        [(0, "card 4111 1111 1111 1111 expires; order 4111111111111111"),
         (1, "the 1990 census counted 248709873 people"),
         (2, "mixed 4111-1111 2222-3333 is grouped digits")],
        "id long, text string")
    got = {r["id"]: r["s"] for r in df.select(
        "id", wq.scrub_pii(F.col("text")).alias("s")).collect()}
    # spaced and bare card runs both become <CARD>, never <PHONE>
    assert got[0] == "card <CARD> expires; order <CARD>"
    # 9-digit prose run: below the card's 13-digit floor, but the
    # (pre-existing) phone rule's zero-separator alternative consumes
    # 8+ bare digit runs — card must NOT have claimed it first
    assert got[1] == "the 1990 census counted <PHONE> people"
    # mixed separators allowed (no backrefs in RE2)
    assert got[2] == "mixed <CARD> is grouped digits"
    c = wq.pii_counts(F.col("text"))
    counts = {r["id"]: r for r in df.select(
        "id", *[v.alias(k) for k, v in c.items()]).collect()}
    assert counts[0]["n_card"] == 2 and counts[0]["n_phone"] == 0


def test_pii_counts_golden(pii_df):
    c = wq.pii_counts(F.col("text"))
    got = {r["id"]: r for r in pii_df.select(
        "id", *[v.alias(k) for k, v in c.items()]).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == \
        (2, 0, 0)
    assert got[1]["n_ipv4"] == 3
    assert got[2]["n_phone"] == 2
    assert got[3]["n_phone"] == 0


def test_pii_matches_duckdb(pii_df):
    c = wq.pii_counts(F.col("text"))
    sp = pii_df.select("id", wq.scrub_pii(F.col("text")).alias("s"),
                       *[v.alias(k) for k, v in c.items()]) \
        .orderBy("id").collect()
    con = duckdb.connect()
    con.register("p", pd.DataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], columns=["id", "text"]))
    csql = wq.pii_counts_sql("text")
    du = con.execute(
        f"SELECT id, {wq.scrub_pii_sql('text')} AS s, "
        + ", ".join(f"{v} AS {k}" for k, v in csql.items())
        + " FROM p ORDER BY id").fetchall()
    for s, d in zip(sp, du):
        assert tuple(s) == tuple(d)


def test_scrub_custom_rules(pii_df):
    rules = [("digits", "[0-9]+", "<N>")]
    got = pii_df.select(wq.scrub_pii(F.col("text"), rules).alias("s")) \
        .collect()
    assert all("<N>" in r["s"] or not any(ch.isdigit() for ch in r["s"])
               for r in got)


# -- seeded fuzz: every signal, adversarial random strings ------------------------

def test_fuzz_parity_all_signals(spark):
    """150 seeded random strings over an adversarial alphabet (newlines,
    bullets, ellipses, '#', quotes, digits, unicode) — every Gopher
    signal + keep + C4 + PII scrub must match DuckDB bit-exactly."""
    import random

    rng = random.Random(20260818)
    alphabet = ["the", "cat", "42", "#", "...", "…", "•", "-", "*", "!",
                "?", '"', ".", "a@b.io", "1.2.3.4", "déjà", "\n", "\n\n",
                " ", "  ", "\t", "\x0b", "{", "lorem ipsum", "javascript",
                "555-123-4567", "word", "be", "to"]
    texts = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(0, 40)))
             for _ in range(150)]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    counts = wq.pii_counts(F.col("text"))
    sp = (wq.gopher_signals_df(df)
          .withColumn("scrub_md5", F.md5(wq.scrub_pii(F.col("text"))))
          .withColumns({k: v for k, v in counts.items()})
          .join(wq.c4_clean(df.select("id", "text")).select(
              "id", "c4_text", F.col("c4_keep").cast("int")
              .alias("c4_keep")), "id")
          .drop("text").orderBy("id").collect())
    con = duckdb.connect()
    con.register("fz", pd.DataFrame(rows, columns=["id", "text"]))
    gsql = wq.gopher_signals_sql("fz", "id", "text")
    c4 = wq.c4_clean_sql("text")
    csql = wq.pii_counts_sql("text")
    du = con.execute(f"""
SELECT g.*, md5({wq.scrub_pii_sql('fz.text')}) AS scrub_md5,
       {', '.join(f'{v} AS {k}' for k, v in csql.items())},
       {c4['c4_text']} AS c4_text, ({c4['c4_keep']})::INT AS c4_keep
FROM ({gsql}) g JOIN fz ON g.id = fz.id ORDER BY g.id""").fetchdf()
    cols = [c for c in sp[0].asDict() if c != "id"]
    for i, srow in enumerate(sp):
        for nm in cols:
            a, b = srow[nm], du.iloc[i][nm]
            if nm == "keep":
                b = bool(b)
            elif hasattr(b, "item"):
                b = b.item()
            assert a == b, (srow["id"], nm, a, b)
