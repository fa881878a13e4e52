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
