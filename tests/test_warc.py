"""WARC ingest (sources/warc.py): grammar goldens + Spark table parity."""

import gzip

import pytest

from mahout_spark.sources.warc import (http_payload, parse_warc,
                                       warc_webpages, write_warc)
from mahout_spark.sources.webpages import extract_text, webpages_pandas


def _pages(n, offset=0):
    pdf = webpages_pandas(n + offset).iloc[offset:]
    return [(r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
             bytes(r.html)) for r in pdf.itertuples()]


# -- grammar ---------------------------------------------------------------------


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip(gz):
    pages = _pages(5)
    blob = write_warc(pages, per_record_gzip=gz)
    recs = parse_warc(blob)
    assert [r["type"] for r in recs] == ["warcinfo"] + ["response"] * 5
    got = [(r["url"], r["date"], r["payload"]) for r in recs
           if r["type"] == "response"]
    assert got == pages


def test_writer_deterministic():
    pages = _pages(3)
    assert write_warc(pages, per_record_gzip=True) == \
        write_warc(pages, per_record_gzip=True)


def test_header_continuation_fold():
    blob = write_warc(_pages(1))
    # inject a folded header into the response record
    blob = blob.replace(
        b"WARC-Type: response\r\n",
        b"WARC-Type: response\r\nX-Long: part one\r\n\tpart two\r\n")
    recs = parse_warc(blob)
    assert recs[1]["payload"] == _pages(1)[0][2]


def test_chunked_http_payload():
    body = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    block = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
             + body)
    assert http_payload(block) == b"hello world"


def test_http_payload_headerless_block():
    assert http_payload(b"no header section here") == \
        b"no header section here"


def test_gzip_member_per_record():
    pages = _pages(4)
    blob = write_warc(pages, per_record_gzip=True)
    # each record is its own member: counting gzip magics finds 5
    assert blob.count(b"\x1f\x8b\x08") == 5
    # decompressing only the FIRST member yields only the warcinfo record
    first = gzip.decompress(blob[:blob.find(b"\x1f\x8b\x08", 3)])
    assert parse_warc(first)[0]["type"] == "warcinfo"


def test_truncated_block_raises():
    blob = write_warc(_pages(1))
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(blob[:-30])


def test_non_warc_raises():
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


# -- Spark ingest ------------------------------------------------------------------


def test_warc_webpages_table(spark, tmp_path):
    for i, gz in enumerate([False, True, True]):
        pages = _pages(4, offset=4 * i)
        name = f"seg-{i}.warc" + (".gz" if gz else "")
        (tmp_path / name).write_bytes(
            write_warc(pages, per_record_gzip=gz))
    df = warc_webpages(spark, str(tmp_path)).cache()
    rows = {r.url: r for r in df.collect()}
    ref = webpages_pandas(12)
    assert len(rows) == 12
    for r in ref.itertuples():
        got = rows[r.url]
        assert bytes(got.html) == bytes(r.html)
        # input_hint invariant: byte-identical extracted text per url
        assert got.text == extract_text(bytes(r.html)) == r.text
        assert got.warc_ts == r.warc_ts.to_pydatetime()
        # synthetic tokN text carries no real-language n-grams -> 'und'
        assert got.lang is not None and 2 <= len(got.lang) <= 3
    df.unpersist()


def test_warc_to_sketch_pipeline(spark, tmp_path):
    """North-star path end to end: raw crawl segments -> web-page table
    -> per-partition CMS build -> point estimates within eps*N of exact
    token counts."""
    from pyspark.sql import functions as F

    from mahout_spark.functions.text import explode_tokens
    from mahout_spark.sketch.agg import cms_spec, sketch_by_key
    from mahout_spark.sketch.queries import cms_point_lookup

    pages = _pages(40)
    seg = tmp_path / "crawl"
    seg.mkdir()
    for i in range(4):
        (seg / f"part-{i}.warc.gz").write_bytes(
            write_warc(pages[i::4], per_record_gzip=True))
    docs = warc_webpages(spark, str(seg)).select(
        F.col("url").alias("doc_id"), "text")
    toks = explode_tokens(docs, "doc_id", "text").cache()
    exact = {r.token: r.n for r in
             toks.groupBy("token").agg(F.count("*").alias("n")).collect()}
    n_total = sum(exact.values())

    spec = cms_spec(eps=0.01, delta=0.01, seed=3)
    toks8 = toks.repartition(8).withColumn("g", F.lit("all"))
    sk = sketch_by_key(toks8, ["g"], spec, key_col="token")
    probes = (toks.select("token").distinct().limit(50)
              .withColumn("g", F.lit("all")))
    est = {r.token: r.cms_estimate for r in cms_point_lookup(
        sk, probes, F.xxhash64(F.col("token")),
        join_cols=["g"]).collect()}
    for tok, e in est.items():
        assert exact[tok] <= e <= exact[tok] + 0.01 * n_total
    toks.unpersist()


# -- robustness (review findings) --------------------------------------------------


def test_content_encoding_gzip_payload():
    import gzip as _gz
    html = b"<html><head><title>t</title></head><body><p>b</p></body></html>"
    gz = _gz.compress(html, mtime=0)
    block = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
             + f"Content-Length: {len(gz)}\r\n\r\n".encode() + gz)
    assert http_payload(block) == html


def test_content_encoding_deflate_payload():
    import zlib as _z
    html = b"<p>deflated</p>"
    raw = _z.compressobj(wbits=-15)
    for body in (_z.compress(html),                      # zlib-wrapped
                 raw.compress(html) + raw.flush()):      # raw (quirk)
        block = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
                 + body)
        assert http_payload(block) == html


def test_truncated_warc_gz_raises():
    blob = write_warc(_pages(3), per_record_gzip=True)
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(blob[:-20])


def test_truncated_header_raises():
    blob = write_warc(_pages(1))
    # cut inside the second record's header section
    cut = blob.find(b"WARC-Target-URI")
    with pytest.raises(ValueError, match="header"):
        parse_warc(blob[:cut + 5])


def test_truncated_chunked_body_raises():
    block = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
             b"ff\r\nonly-a-few-bytes")
    with pytest.raises(ValueError, match="chunk"):
        http_payload(block)


def test_warc_date_offset_converted_to_utc(spark, tmp_path):
    url = "https://x.example.com/p"
    blob = write_warc([(url, "2020-06-01T05:00:00+02:00", b"<p>x</p>")])
    (tmp_path / "o.warc").write_bytes(blob)
    from mahout_spark.sources.warc import warc_records
    row = warc_records(spark, str(tmp_path)).collect()[0]
    # +02:00 wall time 05:00 is 03:00 UTC
    assert (row.warc_ts.year, row.warc_ts.hour) == (2020, 3)


def test_iter_warc_skips_block_copy():
    recs = list(__import__("mahout_spark.sources.warc", fromlist=["iter_warc"])
                .iter_warc(write_warc(_pages(1)), keep_block=False))
    assert all("block" not in r for r in recs)
    assert recs[1]["payload"] == _pages(1)[0][2]


def test_warc_export_round_trip(spark, tmp_path):
    from mahout_spark.sources.warc import warc_export

    pdf = webpages_pandas(10)
    df = spark.createDataFrame(pdf[["url", "warc_ts", "html"]]) \
        .repartition(3)
    out = tmp_path / "export"
    n = warc_export(df, str(out))
    assert n == 10
    files = sorted(out.glob("part-*.warc.gz"))
    assert 1 <= len(files) <= 3
    back = {r.url: r for r in warc_webpages(spark, str(out)).collect()}
    assert len(back) == 10
    for r in pdf.itertuples():
        assert bytes(back[r.url].html) == bytes(r.html)
        assert back[r.url].warc_ts == r.warc_ts.to_pydatetime()
