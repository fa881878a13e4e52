"""URL canonicalization / registrable domain: goldens + DuckDB parity
+ the per-domain aggregation."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mahout_spark.functions import urls as U

URLS = [
    "HTTPS://WWW.Example.COM:443/path/x?b=2&a=1#frag",
    "http://user:pw@Sub.Co.UK.example.co.uk:8080/",
    "https://blog.github.io/post?z=9&y=8&y=7",
    "http://example.com:80",
    "ftp://Files.Example.ORG/pub/",
    "https://single",
    "not a url at all",
    "https://api.amazonaws.com/v1?x=1",
    "http://a.b.c.d.co.jp/deep/path/",
    "https://host.example.com.",
    "http://example.com/#only-frag",
    "https://x.unknowntld2026/p",
]


@pytest.fixture(scope="module")
def udf_(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "id long, url string")


def test_canonicalize_goldens(udf_):
    got = {r["id"]: r["c"] for r in udf_.select(
        "id", U.canonicalize_url(F.col("url")).alias("c")).collect()}
    assert got[0] == "https://www.example.com/path/x?a=1&b=2"   # port+frag
    assert got[1] == "http://sub.co.uk.example.co.uk:8080"      # userinfo
    assert got[2] == "https://blog.github.io/post?y=7&y=8&z=9"  # sort query
    assert got[3] == "http://example.com"                       # default 80
    assert got[4] == "ftp://files.example.org/pub/"             # non-http
    assert got[6] is None                                       # not a URL
    assert got[9] == "https://host.example.com"                 # trailing .
    assert got[10] == "http://example.com"                      # '/' + frag


def test_registrable_domain_goldens(udf_):
    got = {r["id"]: r["d"] for r in udf_.select(
        "id", U.url_domain(F.col("url")).alias("d")).collect()}
    assert got[0] == "example.com"
    assert got[1] == "example.co.uk"        # longest PSL match wins
    assert got[2] == "blog.github.io"       # github.io IS a public suffix
    assert got[7] == "api.amazonaws.com"    # amazonaws.com too
    assert got[8] == "d.co.jp"
    assert got[11] == "x.unknowntld2026"    # unknown TLD → last two labels
    assert got[5] == "single"               # one-label host → itself


def test_matches_duckdb_bit_exact(udf_):
    sp = udf_.select(
        "id", U.canonicalize_url(F.col("url")).alias("canon"),
        U.url_host(F.col("url")).alias("host"),
        U.url_port(F.col("url")).alias("port"),
        U.url_domain(F.col("url")).alias("domain")) \
        .orderBy("id").collect()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        [(i, u) for i, u in enumerate(URLS)], columns=["id", "url"]))
    du = con.execute(f"""
SELECT id, {U.canonicalize_url_sql('url')} AS canon,
       {U.url_host_sql('url')} AS host,
       {U.url_port_sql('url')} AS port,
       {U.url_domain_sql('url')} AS domain
FROM t ORDER BY id""").fetchall()
    for s, d in zip(sp, du):
        assert tuple(s) == tuple(d)


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [("https://a.example.com/1",), ("https://b.example.com/2",),
         ("https://a.example.com/3",), ("http://other.org/x",)],
        "url string")
    out = {r["domain"]: r for r in U.domain_stats(df).collect()}
    assert out["example.com"]["n_pages"] == 3
    assert out["example.com"]["n_hosts"] == 2
    assert out["other.org"]["n_pages"] == 1


def test_canonical_is_idempotent(udf_):
    once = udf_.select(
        "id", U.canonicalize_url(F.col("url")).alias("url"))
    twice = once.select(
        "id", U.canonicalize_url(F.col("url")).alias("url"))
    a = {r["id"]: r["url"] for r in once.collect()}
    b = {r["id"]: r["url"] for r in twice.collect()}
    # idempotent wherever the first pass produced a URL at all
    assert all(b[i] == a[i] for i in a if a[i] is not None)


# -- seeded fuzz: canonical form / host / domain vs DuckDB ----------------------

def test_fuzz_parity_urls(spark):
    """200 seeded random URL-ish strings assembled from adversarial
    pieces (userinfo, default/weird ports, unsorted/empty query params,
    fragments, empty labels, trailing dots, unicode, whitespace) —
    canonicalize/host/domain must match DuckDB bit-exactly, NULLs
    included."""
    import random

    rng = random.Random(20260818)
    heads = ["http://", "https://", "HTTPS://", "HtTp://", "ftp://",
             "", "//", "x+y-1://"]
    hosts = ["Example.COM", "a.b.c.d.co.jp", "WWW.Sub.Co.UK", "single",
             "x..y", "host.example.com.", "é.example.de", "1.2.3.4",
             "blog.GitHub.io", ".", "", "x.unknowntld2026"]
    mids = ["", "user:pw@", "user@", ":80", ":443", ":8080", ":0", ":"]
    tails = ["", "/", "/p/q", "//x", "/p?b=2&a=1", "?a=1&", "?", "??x",
             "?z=9&y=8&y=7", "#f", "/p#f?notquery", "?a=1#f", " ", "\t",
             "?b&a", "?=1", "/p%20q", "?a=%26"]
    cases = []
    for _ in range(200):
        s = (rng.choice(heads) + rng.choice(hosts) + rng.choice(mids)
             + rng.choice(tails))
        cases.append(s)
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "id long, url string")
    got = (df.select(
        "id",
        U.canonicalize_url(F.col("url")).alias("canon"),
        U.url_host(F.col("url")).alias("host"),
        U.url_domain(F.col("url")).alias("domain"))
        .orderBy("id").collect())
    con = duckdb.connect()
    con.register("fz", pd.DataFrame(
        [(i, u) for i, u in enumerate(cases)], columns=["id", "url"]))
    du = con.execute(f"""
SELECT id, {U.canonicalize_url_sql('url')} AS canon,
       {U.url_host_sql('url')} AS host,
       {U.url_domain_sql('url')} AS domain
FROM fz ORDER BY id""").fetchdf()
    for i, row in enumerate(got):
        for nm in ("canon", "host", "domain"):
            a = row[nm]
            b = du.iloc[i][nm]
            if b is None or (isinstance(b, float) and pd.isna(b)):
                b = None
            assert a == b, (row["id"], nm, repr(cases[i]), a, b)
