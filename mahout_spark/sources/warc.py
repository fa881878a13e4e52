"""WARC (ISO 28500) ingest → the north-rule web-page table.

The north star's input is "Common-Crawl-style web pages in Iceberg"
(BASELINE.json input_hint: url, warc_ts, html, text, lang). Real crawls
arrive as WARC files; this module closes the loop from raw crawl output
to that table without any external library.

Public-spec only (the reference has no web ingest at all — its closest
surface is the Lucene/Wikipedia tools under integration/):

- WARC 1.0/1.1 record grammar (ISO 28500 §4): a ``WARC/x.y`` version
  line, named header fields (with RFC-822-style continuation folding),
  ``Content-Length`` octets of block, then CRLF CRLF.
- The Common-Crawl packaging convention: ``.warc.gz`` files are a
  CONCATENATION of per-record gzip members, so a reader can seek to a
  member and decompress one record; Python's zlib handles the member
  stream with a decompressobj loop.
- HTTP response blocks (``application/http; msgtype=response``): the
  payload starts after the first CRLF CRLF; ``Transfer-Encoding:
  chunked`` bodies are de-chunked per RFC 9112 §7.1.

Spark shape: one WARC file parses inside one executor task
(``binaryFile`` + Arrow-batched ``mapInPandas``) — crawls ship as many
~1 GB segment files, so parallelism follows the existing sharding, the
same per-file ingest contract as sources/mailarchives.py and
sources/seqfile.py. Text extraction runs inside the same batch
(``extract_text`` — the repo's pure byte-identical contract) and
language id is the JVM ``detect_lang`` column expression, so nothing
row-wise touches Python outside the one Arrow pass.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mahout_spark.sources.webpages import extract_text

_CRLF = b"\r\n"
_VERSION_RE = re.compile(rb"^WARC/(\d+\.\d+)$")


# -- low-level record grammar ----------------------------------------------------


def _split_gzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout).
    Raises on a truncated final member — silent partial data would drop
    trailing records from the ingest with no error."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out += d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in .warc.gz")
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def _read_headers(buf: io.BytesIO) -> dict[str, str] | None:
    """Version line + folded header fields; None at clean EOF."""
    line = buf.readline()
    while line in (_CRLF, b"\n"):  # tolerate inter-record padding
        line = buf.readline()
    if not line:
        return None
    m = _VERSION_RE.match(line.rstrip(b"\r\n"))
    if not m:
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    headers: dict[str, str] = {"warc-version": m.group(1).decode()}
    last_key = None
    while True:
        line = buf.readline()
        if line == b"":  # EOF inside the header section
            raise ValueError("truncated WARC record header")
        if line in (_CRLF, b"\n"):
            return headers
        raw = line.rstrip(b"\r\n")
        if raw[:1] in (b" ", b"\t") and last_key:  # continuation fold
            headers[last_key] += " " + raw.strip().decode("utf-8", "replace")
            continue
        name, _, value = raw.partition(b":")
        last_key = name.decode("ascii", "replace").strip().lower()
        headers[last_key] = value.strip().decode("utf-8", "replace")


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked transfer decoding (sizes are hex, chunk
    extensions after ';' ignored, trailers dropped)."""
    out = bytearray()
    buf = io.BytesIO(body)
    while True:
        size_line = buf.readline().rstrip(b"\r\n")
        if not size_line:
            break
        size = int(size_line.split(b";", 1)[0], 16)
        if size == 0:
            break
        chunk = buf.read(size)
        if len(chunk) != size:
            raise ValueError("truncated chunk in chunked HTTP body")
        out += chunk
        buf.read(2)  # chunk-terminating CRLF
    return bytes(out)


def http_payload(block: bytes) -> bytes:
    """Payload of an HTTP message block: bytes after the header section,
    de-chunked when Transfer-Encoding: chunked is declared and inflated
    when Content-Encoding: gzip/x-gzip/deflate is declared (both common
    in real crawl captures; warcio calls this decode_content)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return block  # headerless block — take it whole
    head, body = block[:sep], block[sep + 4:]
    if re.search(rb"(?im)^transfer-encoding:.*\bchunked\b", head):
        body = _dechunk(body)
    m = re.search(rb"(?im)^content-encoding:[ \t]*([a-zA-Z0-9_-]+)", head)
    if m:
        enc = m.group(1).lower()
        if enc in (b"gzip", b"x-gzip"):
            body = zlib.decompress(body, wbits=zlib.MAX_WBITS | 16)
        elif enc == b"deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:  # raw-deflate servers (historic quirk)
                body = zlib.decompress(body, wbits=-zlib.MAX_WBITS)
        # identity / unknown encodings pass through unchanged
    return body


def iter_warc(data: bytes, keep_block: bool = True):
    """Generator over the records of one WARC file (plain or .warc.gz
    bytes) as dicts: ``type``, ``url``, ``date`` (ISO-8601 string or ''),
    ``content_type``, ``payload`` (decoded HTTP body for
    application/http blocks, else the raw block) and — when
    ``keep_block`` — ``block`` (raw bytes). The Spark ingest path passes
    ``keep_block=False`` so a segment's records are not held twice."""
    if data[:2] == b"\x1f\x8b":
        data = _split_gzip_members(data)
    buf = io.BytesIO(data)
    while True:
        headers = _read_headers(buf)
        if headers is None:
            return
        n = int(headers.get("content-length", "0"))
        block = buf.read(n)
        if len(block) != n:
            raise ValueError("truncated WARC block")
        ctype = headers.get("content-type", "")
        payload = (http_payload(block)
                   if ctype.startswith("application/http") else block)
        rec = {
            "type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "content_type": ctype,
            "payload": payload,
        }
        if keep_block:
            rec["block"] = block
        yield rec


def parse_warc(data: bytes) -> list[dict]:
    """All records of one WARC file as a list (see ``iter_warc``)."""
    return list(iter_warc(data))


# -- writer (round-trip tests + export) ------------------------------------------


def _warc_record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    out = bytearray(b"WARC/1.0\r\n")
    for k, v in headers:
        out += f"{k}: {v}".encode("utf-8") + _CRLF
    out += f"Content-Length: {len(block)}".encode() + _CRLF + _CRLF
    out += block + _CRLF + _CRLF
    return bytes(out)


def write_warc(pages: list[tuple[str, str, bytes]],
               per_record_gzip: bool = False,
               software: str = "mahout-spark-warc/1.0") -> bytes:
    """WARC bytes for (url, iso_date, html) pages: one warcinfo record +
    one HTTP response record per page. Record ids are deterministic
    (md5 of url) so re-exports are byte-identical — the repo's
    retry/rerun contract."""

    def rid(tag: str) -> str:
        return f"<urn:md5:{hashlib.md5(tag.encode()).hexdigest()}>"

    info_block = f"software: {software}\r\n".encode()
    chunks = [_warc_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", rid("warcinfo")),
         ("WARC-Date", pages[0][1] if pages else "2020-01-01T00:00:00Z"),
         ("Content-Type", "application/warc-fields")], info_block)]
    for url, date, html in pages:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(html)}\r\n\r\n".encode() + html)
        chunks.append(_warc_record(
            [("WARC-Type", "response"),
             ("WARC-Record-ID", rid(url)),
             ("WARC-Date", date),
             ("WARC-Target-URI", url),
             ("Content-Type", "application/http; msgtype=response")],
            http))
    if per_record_gzip:
        return b"".join(gzip.compress(c, mtime=0) for c in chunks)
    return b"".join(chunks)


# -- Spark ingest -----------------------------------------------------------------


_RECORD_SCHEMA = ("warc_file string, record_type string, url string, "
                  "warc_ts timestamp, content_type string, payload binary, "
                  "text string")


def warc_records(spark: SparkSession, path: str,
                 types: tuple = ("response",)) -> DataFrame:
    """DataFrame[warc_file, record_type, url, warc_ts, content_type,
    payload, text] from a directory of .warc / .warc.gz files — one file
    per task, text extracted in the same Arrow batch."""
    import pandas as pd

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*")
             .load(path))
    keep = set(types)

    def ts(date: str):
        if not date:
            return pd.NaT
        t = pd.Timestamp(date)
        if t.tzinfo is not None:  # convert to UTC, then drop tzinfo
            t = t.tz_convert("UTC").tz_localize(None)
        return t

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for content, fpath in zip(pdf["content"], pdf["path"]):
                for rec in iter_warc(bytes(content), keep_block=False):
                    if keep and rec["type"] not in keep:
                        continue
                    rows.append({
                        "warc_file": fpath,
                        "record_type": rec["type"],
                        "url": rec["url"],
                        "warc_ts": ts(rec["date"]),
                        "content_type": rec["content_type"],
                        "payload": rec["payload"],
                        "text": extract_text(rec["payload"]),
                    })
            yield pd.DataFrame(
                rows, columns=["warc_file", "record_type", "url", "warc_ts",
                               "content_type", "payload", "text"])

    return files.select("content", "path").mapInPandas(
        parse, schema=_RECORD_SCHEMA)


def warc_webpages(spark: SparkSession, path: str) -> DataFrame:
    """The north-rule input table straight from WARC files:

    (url, warc_ts, html, text, lang) — html is the HTTP payload, text
    the byte-identical pure extraction, lang the JVM n-gram detector
    over the extracted text (functions/text.py). Plan: one Arrow pass
    per file, then pure column expressions — no further Python.
    """
    from mahout_spark.functions.text import detect_lang

    recs = warc_records(spark, path, types=("response",))
    return recs.select(
        F.col("url"),
        F.col("warc_ts"),
        F.col("payload").alias("html"),
        F.col("text"),
        detect_lang(F.col("text")).alias("lang"))


def warc_export(df: DataFrame, out_dir: str,
                per_record_gzip: bool = True,
                software: str = "mahout-spark-warc/1.0") -> int:
    """Export a web-page table (url, warc_ts, html) back to WARC —
    the round-trip sink for handing curated corpora to crawl tooling.

    One ``part-<pid>.warc[.gz]`` file per partition, written by the
    executors (mapInPandas — nothing funnels through the driver); file
    contents are a pure function of partition contents (deterministic
    record ids in write_warc), so identical partitioning re-exports
    byte-identical files. Returns the number of records written.
    """
    import pandas as pd  # noqa: F401 (schema side)

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if per_record_gzip else ".warc"

    def dump(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pages, n = [], 0
        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"],
                                     pdf["html"]):
                iso = pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                pages.append((url, iso, bytes(html)))
                n += 1
        if pages:
            path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
            with open(path, "wb") as fh:
                fh.write(write_warc(pages, per_record_gzip=per_record_gzip,
                                    software=software))
        yield pd.DataFrame({"n": [n]})

    counts = (df.select("url", "warc_ts", "html")
              .mapInPandas(dump, schema="n long").collect())
    return int(sum(r["n"] for r in counts))
