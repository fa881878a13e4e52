"""URL canonicalization + registrable-domain extraction for web corpora.

The north star's input is a Common-Crawl-style table keyed by ``url``;
token/url co-occurrence and per-domain statistics need a deterministic
canonical form and a registrable-domain (eTLD+1) key. Everything here is
a pure Catalyst column expression with a bit-agreeing DuckDB SQL twin
(same determinism rules as ``functions/text.py``): regexp_extract with
identical group semantics in Java regex and RE2, integer label
arithmetic, no UDFs — a 100-TB canonicalization pass is a map-only scan
fused into the parquet read.

Canonical form (documented; pinned, not configurable per-call):

- scheme and host lowercased; userinfo stripped
- fragment stripped; default ports (http:80 / https:443) stripped
- query parameters sorted lexicographically ('' query → no '?')
- path '/' collapsed to '' (``https://x.com/`` == ``https://x.com``)

Registrable domain follows the public-suffix algorithm (longest listed
suffix wins; unknown TLD falls back to the prevailing-'*' rule = last
label) over an EMBEDDED SAMPLE of the Mozilla PSL. At production scale
the full list is still a few thousand literals — swap ``PUBLIC_SUFFIXES``
for the full load; the plan shape (a literal array membership test, no
join, no UDF) is unchanged.

Reference anchor: none — the reference repo has no URL layer (its web
examples ingest pre-extracted text); this module belongs to the
training-data-pipeline extension surface, like webquality.py.

Skew note: per-domain aggregation over web data is Zipf-skewed
(head domains carry orders of magnitude more rows). ``domain_stats``
uses only algebraic aggregates, which Spark computes with map-side
partial aggregation — the shuffle carries one partial row per (task,
domain), so a head domain costs one reduce-side merge per task, not a
single giant task. Holders of non-algebraic per-domain work should
route through sketch/agg.py's salted two-phase helpers instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Embedded sample of the Mozilla Public Suffix List (public domain data;
# publicsuffix.org). Production: replace with the full list — it stays a
# literal array / broadcast lookup.
PUBLIC_SUFFIXES = [
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "dev", "app", "info", "biz", "xyz",
    "de", "fr", "uk", "nl", "it", "es", "pl", "ru", "jp", "cn", "in",
    "br", "au", "ca", "ch", "se", "no", "fi", "dk", "be", "at", "us",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "web.za",
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "cloudfront.net", "amazonaws.com",
]
MAX_SUFFIX_LABELS = 3  # longest entry above; bump if the list grows

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


# -- parsing pieces ------------------------------------------------------------

def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(F.trim(url), _SCHEME_RE, 1))


def _no_user(url: Column) -> Column:
    """Authority minus userinfo — regex strip (identical Java/RE2
    semantics; split() would diverge on trailing empties)."""
    auth = F.regexp_extract(F.trim(url), _AUTH_RE, 1)
    return F.regexp_replace(auth, "^[^@]*@", "")


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo, port, trailing dots."""
    return F.lower(F.regexp_replace(
        F.regexp_replace(_no_user(url), ":[0-9]*$", ""), "\\.+$", ""))


def url_port(url: Column) -> Column:
    """Explicit port string ('' when absent)."""
    return F.regexp_extract(_no_user(url), ":([0-9]+)$", 1)


def url_path(url: Column) -> Column:
    return F.regexp_extract(F.trim(url), _PATH_RE, 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(F.trim(url), _QUERY_RE, 1)


def url_scheme_sql(url: str) -> str:
    return f"lower(regexp_extract(trim({url}), '{_SCHEME_RE}', 1))"


def _no_user_sql(url: str) -> str:
    auth = f"regexp_extract(trim({url}), '{_AUTH_RE}', 1)"
    return f"regexp_replace({auth}, '^[^@]*@', '')"


def url_host_sql(url: str) -> str:
    return (f"lower(regexp_replace(regexp_replace({_no_user_sql(url)}, "
            f"':[0-9]*$', ''), '\\.+$', ''))")


def url_port_sql(url: str) -> str:
    return f"regexp_extract({_no_user_sql(url)}, ':([0-9]+)$', 1)"


def url_path_sql(url: str) -> str:
    return f"regexp_extract(trim({url}), '{_PATH_RE}', 1)"


def url_query_sql(url: str) -> str:
    return f"regexp_extract(trim({url}), '{_QUERY_RE}', 1)"


# -- canonicalization ----------------------------------------------------------

def canonicalize_url(url: Column) -> Column:
    """Deterministic canonical form (see module docstring)."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    path = url_path(url)
    query = url_query(url)
    default = ((scheme == "http") & (port == "80")) | \
        ((scheme == "https") & (port == "443"))
    port_part = F.when((port == "") | default, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(path == "/", F.lit("")).otherwise(path)
    sorted_q = F.array_join(
        F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(query == "", F.lit("")) \
        .otherwise(F.concat(F.lit("?"), sorted_q))
    return F.when(
        host == "", F.lit(None).cast("string")).otherwise(
        F.concat(scheme, F.lit("://"), host, port_part, path_part,
                 query_part))


def canonicalize_url_sql(url: str) -> str:
    scheme = url_scheme_sql(url)
    host = url_host_sql(url)
    port = url_port_sql(url)
    path = url_path_sql(url)
    query = url_query_sql(url)
    default = (f"(({scheme}) = 'http' AND ({port}) = '80') OR "
               f"(({scheme}) = 'https' AND ({port}) = '443')")
    port_part = (f"CASE WHEN ({port}) = '' OR {default} THEN '' "
                 f"ELSE ':' || ({port}) END")
    path_part = f"CASE WHEN ({path}) = '/' THEN '' ELSE ({path}) END"
    sorted_q = (f"array_to_string(list_sort(string_split({query}, '&')), "
                f"'&')")
    query_part = (f"CASE WHEN ({query}) = '' THEN '' "
                  f"ELSE '?' || {sorted_q} END")
    return (f"CASE WHEN ({host}) = '' THEN NULL ELSE "
            f"({scheme}) || '://' || ({host}) || {port_part} || "
            f"{path_part} || {query_part} END")


# -- registrable domain (eTLD+1) -------------------------------------------------

def registrable_domain(host: Column) -> Column:
    """Public-suffix longest-match + one label; unknown TLD → last two
    labels (the PSL prevailing-'*' rule); host with one label → itself.

    Plan shape: split host into labels, build the ≤MAX_SUFFIX_LABELS
    candidate suffixes, test membership in the literal PSL array, take
    the longest hit — all JVM expressions on one row, no join, no UDF.
    """
    labels = F.split(host, "\\.")
    n = F.size(labels)
    cand_idx = F.sequence(F.lit(1), F.least(n, F.lit(MAX_SUFFIX_LABELS)))
    psl = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])
    cands = F.transform(
        cand_idx,
        lambda i: F.array_join(F.slice(labels, n - i + 1, i), "."))
    matched = F.filter(cands, lambda c: F.array_contains(psl, c))
    # candidates are ordered shortest→longest, so the last match wins
    n_suffix = F.when(F.size(matched) > 0,
                      F.size(F.split(F.element_at(matched, -1), "\\."))) \
        .otherwise(F.lit(1))
    take = F.least(n, n_suffix + 1)
    return F.array_join(F.slice(labels, n - take + 1, take), ".")


def registrable_domain_sql(host: str) -> str:
    labels = f"string_split({host}, '.')"
    n = f"len({labels})"
    lits = ", ".join(f"'{s}'" for s in PUBLIC_SUFFIXES)
    cands = (f"list_transform(range(1, least({n}, {MAX_SUFFIX_LABELS}) "
             f"+ 1), i -> array_to_string(list_slice({labels}, "
             f"{n} - i + 1, {n}), '.'))")
    matched = f"list_filter({cands}, c -> list_contains([{lits}], c))"
    n_suffix = (f"CASE WHEN len({matched}) > 0 THEN "
                f"len(string_split(list_extract({matched}, -1), '.')) "
                f"ELSE 1 END")
    take = f"least({n}, ({n_suffix}) + 1)"
    return (f"array_to_string(list_slice({labels}, "
            f"{n} - ({take}) + 1, {n}), '.')")


def url_domain(url: Column) -> Column:
    return registrable_domain(url_host(url))


def url_domain_sql(url: str) -> str:
    return registrable_domain_sql(url_host_sql(url))


# -- per-domain aggregation ------------------------------------------------------

def domain_stats(df: DataFrame, url_col: str = "url",
                 extra_aggs: list[Column] | None = None) -> DataFrame:
    """(domain, n_pages, n_hosts) per registrable domain.

    Algebraic aggregates only → map-side partial aggregation absorbs
    the Zipf head (one partial row per task per domain crosses the
    shuffle). Pass additional algebraic aggregates via ``extra_aggs``.
    """
    url = F.col(url_col)
    # keep the source columns so extra_aggs can reference them; Catalyst
    # column-prunes whatever the aggregates don't touch
    base = df.withColumns({"domain": url_domain(url),
                           "__host": url_host(url)})
    aggs = [F.count("*").alias("n_pages"),
            F.countDistinct("__host").alias("n_hosts")]
    return base.groupBy("domain").agg(*aggs, *(extra_aggs or []))
