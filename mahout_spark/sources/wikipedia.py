"""Wikipedia XML-dump ingest — the reference's `seqwiki` tool.

Reference anchors (studied, not copied):
  integration/.../text/wikipedia/XmlInputFormat.java:46-120 — split a
    dump into <page>...</page> records across HDFS block boundaries;
  WikipediaMapper.java:65-180 — per-record extraction: skip
    '<redirect />' pages, document = inside <text xml:space="preserve">,
    title regex, first matching [[Category:...]] (exact set membership
    or substring containment), HTML-entity unescape, optional
    [[Category:...]] removal, key = /category/title_with_ws_as_underscore;
  WikipediaXmlSplitter.java — chunking is subsumed by Spark input splits.

Spark shape: the record splitting reuses Hadoop's TextInputFormat with a
custom record delimiter (</page>) — exactly the XmlInputFormat trick, so
records never tear at split boundaries and every input split parses in
parallel. Per-record field extraction runs in one Arrow-batched
mapInPandas pass (ingest path, same as sources/seqfile.py / arff.py).
Entity unescape uses Python's html.unescape (the unescapeHtml4 twin).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

START_DOC = '<text xml:space="preserve">'
END_DOC = "</text>"
REDIRECT = "<redirect />"
_TITLE_RE = re.compile(r"<title>(.*)</title>")
_WS_RE = re.compile(r"\s")


def xml_records(spark: SparkSession, path: str,
                start_tag: str = "<page>",
                end_tag: str = "</page>") -> DataFrame:
    """One row per start_tag..end_tag record (XmlInputFormat twin):
    TextInputFormat with record delimiter = end_tag keeps records whole
    across input splits; chunks without a start_tag (inter-record
    noise, the trailing footer) are dropped."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf={"textinputformat.record.delimiter": end_tag})

    def cut(kv):
        chunk = kv[1]
        i = chunk.find(start_tag)
        return [] if i < 0 else [(chunk[i:] + end_tag,)]

    return spark.createDataFrame(rdd.flatMap(cut), "record string")


def _find_category(document: str, categories: list[str],
                   exact_match: bool) -> str:
    """First matching [[Category:...]] (WikipediaMapper.java:134-156):
    exact -> set membership of the lowercased trimmed category;
    inexact -> first input category CONTAINED in it."""
    start = 0
    cats = set(categories)
    while True:
        i = document.find("[[Category:", start)
        if i < 0:
            break
        i += 11
        end = document.find("]]", i)
        if end < 0:
            break
        cat = document[i:end].lower().strip()
        if exact_match:
            if cat in cats:
                return cat
        else:
            for c in categories:
                if c in cat:
                    return c
        start = end
    return "Unknown"


def _remove_categories(document: str) -> str:
    out = []
    start = 0
    while True:
        i = document.find("[[Category:", start)
        if i < 0:
            out.append(document[start:])
            break
        end = document.find("]]", i)
        if end < 0:
            out.append(document[start:])
            break
        out.append(document[start:i])
        start = end + 2
    return "".join(out)


def wikipedia_pages(spark: SparkSession, path: str,
                    categories: list[str] | None = None,
                    exact_match: bool = False,
                    all_pages: bool = True,
                    remove_labels: bool = False) -> DataFrame:
    """(category, doc_key, title, text) per non-redirect page.

    ``all_pages=False`` keeps only pages matching ``categories`` (the
    reference's default mode); doc_key is the Bayes-style
    /category/title_with_whitespace_as_underscores key."""
    import html as _html

    import pandas as pd

    cats = [c.lower().strip() for c in (categories or [])]
    exact, allp, rml = bool(exact_match), bool(all_pages), bool(remove_labels)

    def extract(batches):
        for pdf in batches:
            rows = {"category": [], "doc_key": [], "title": [], "text": []}
            for rec in pdf["record"]:
                if REDIRECT in rec:
                    continue
                s = rec.find(START_DOC)
                if s < 0:
                    continue
                s += len(START_DOC)
                e = rec.find(END_DOC, s)
                if e < 0:
                    continue
                document = rec[s:e]
                m = _TITLE_RE.search(rec)
                title = m.group(1) if m else ""
                cat = _find_category(document, cats, exact)
                if not allp and cat == "Unknown":
                    continue
                document = _html.unescape(document)
                if rml:
                    document = _remove_categories(document)
                key = ("/" + cat.lower() + "/"
                       + _WS_RE.sub("_", title))
                rows["category"].append(cat)
                rows["doc_key"].append(key)
                rows["title"].append(title)
                rows["text"].append(document)
            yield pd.DataFrame(rows)

    return xml_records(spark, path).mapInPandas(
        extract,
        schema="category string, doc_key string, title string, text string")
