"""Wikipedia XML ingest: mapper semantics goldens + split-boundary
robustness of the record-delimiter trick."""

import pytest

from mahout_spark.sources.wikipedia import (wikipedia_pages, xml_records)

WIKI = """<mediawiki>
  <page>
    <title>Alpha Beta</title>
    <revision><text xml:space="preserve">Alpha body &amp; more \
[[Category:Science]] tail</text></revision>
  </page>
  <page>
    <title>Redirected</title>
    <redirect />
    <revision><text xml:space="preserve">#REDIRECT [[Alpha]]\
</text></revision>
  </page>
  <page>
    <title>Gamma</title>
    <revision><text xml:space="preserve">Gamma body \
[[Category:Applied science stuff]] x</text></revision>
  </page>
  <page>
    <title>Delta</title>
    <revision><text xml:space="preserve">No categories here\
</text></revision>
  </page>
</mediawiki>
"""


@pytest.fixture(scope="module")
def wiki_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("wiki") / "dump.xml"
    p.write_text(WIKI)
    return str(p)


def test_all_pages_mode(spark, wiki_path):
    rows = {r["title"]: r for r in
            wikipedia_pages(spark, wiki_path).collect()}
    assert set(rows) == {"Alpha Beta", "Gamma", "Delta"}  # redirect gone
    # no input categories -> everything Unknown
    assert all(r["category"] == "Unknown" for r in rows.values())
    assert rows["Alpha Beta"]["doc_key"] == "/unknown/Alpha_Beta"
    # entities unescaped
    assert "Alpha body & more" in rows["Alpha Beta"]["text"]


def test_category_containment_match(spark, wiki_path):
    rows = {r["title"]: r for r in wikipedia_pages(
        spark, wiki_path, categories=["science"],
        all_pages=False).collect()}
    # 'science' is contained in both 'science' and 'applied science stuff'
    assert set(rows) == {"Alpha Beta", "Gamma"}
    assert rows["Gamma"]["category"] == "science"
    assert rows["Gamma"]["doc_key"] == "/science/Gamma"


def test_exact_match_only(spark, wiki_path):
    rows = {r["title"]: r for r in wikipedia_pages(
        spark, wiki_path, categories=["science"], exact_match=True,
        all_pages=False).collect()}
    assert set(rows) == {"Alpha Beta"}
    assert rows["Alpha Beta"]["category"] == "science"


def test_remove_labels(spark, wiki_path):
    rows = {r["title"]: r["text"] for r in wikipedia_pages(
        spark, wiki_path, categories=["science"], all_pages=False,
        remove_labels=True).collect()}
    assert "[[Category:" not in rows["Alpha Beta"]
    assert "Alpha body & more  tail" == rows["Alpha Beta"]


def test_records_survive_tiny_splits(spark, tmp_path):
    # many pages + a forced small split size: the end-tag record
    # delimiter must keep every page whole across split boundaries
    many = "<mediawiki>" + "".join(
        f"<page><title>T{i}</title><revision>"
        f'<text xml:space="preserve">body {i} word</text>'
        f"</revision></page>" for i in range(200)) + "</mediawiki>"
    p = tmp_path / "many.xml"
    p.write_text(many)
    n_default = xml_records(spark, str(p)).count()
    assert n_default == 200
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("mapreduce.input.fileinputformat.split.maxsize")
    hconf.set("mapreduce.input.fileinputformat.split.maxsize", "512")
    try:
        pages = wikipedia_pages(spark, str(p))
        rows = pages.collect()
        assert len(rows) == 200
        assert {r["title"] for r in rows} == {f"T{i}" for i in range(200)}
    finally:
        if old is None:
            hconf.unset("mapreduce.input.fileinputformat.split.maxsize")
        else:
            hconf.set("mapreduce.input.fileinputformat.split.maxsize", old)
