"""mbox mail-archive ingest — the reference's `seqmailarchives` tool.

Reference anchors (studied, not copied):
  integration/.../utils/email/MailProcessor.java:42-48 — the five
    header regexes (message boundary ``^From \\S+@\\S.*\\d{4}$``,
    ``message-id``, ``subject``, ``from``, ``references``, ``to``, all
    CASE_INSENSITIVE, whole-line matches) and the line-by-line state
    machine (:84-160): a message OPENS at a ``Message-ID`` line longer
    than 14 chars, CLOSES at the next boundary line (or EOF); the first
    empty line after the id starts the body; non-empty body lines are
    appended with the body separator; quoted-text lines (default
    ``^(\\||>)``) are dropped BEFORE any matching when stripping is on.
  MailProcessor.writeContent:178-188 — output value = each enabled
    header match (or '') + separator, then '\\n' + body; key =
    prefix + '/' + filename + '/' + messageId (generateKey:163).
  MailOptions.java:31-51 — enabled-pattern order FROM, TO, REFS,
    SUBJECT; default separator '\\n', body separator '\\n', quoted
    pattern ``^(\\||>)``.
  SequenceFilesFromMailArchives.java:176-267 — CLI flag wiring.

Faithfully replicated quirks (each pytest-pinned):
  * header matches are taken from EVERY surviving line — including
    body lines — and the last match wins (MailProcessor keeps
    overwriting ``patternResults`` on each ``matcher.matches()``);
  * ``patternResults`` is never cleared between messages, so a message
    missing a header INHERITS the previous message's value within the
    same file (the array is allocated once per file, :92);
  * an unescaped body line shaped like an mbox boundary terminates the
    message early (the reference does no ``>From`` unescaping);
  * the boundary is only consulted while inside a message, so junk
    before the first Message-ID is ignored.

Spark shape: one mbox file parses inside one executor task
(``binaryFile`` source + Arrow-batched ``mapInPandas``) — archives
ship as many per-list/per-month files, so parallelism follows the
existing sharding, the same ingest contract as sources/seqfile.py and
sources/arff.py. The state machine is sequential BY DEFINITION within
a file (the carryover quirk above), so per-file is also the correct
parallel grain, not a limitation.

Java-regex parity: ``\\S``/``\\d`` are compiled as the explicit ASCII
classes ``[^ \\t\\n\\x0b\\f\\r]`` / ``[0-9]`` (Java's defaults) so
Python's unicode-aware classes cannot diverge on exotic whitespace or
digits; lines split on ``\\r\\n|\\r|\\n`` (BufferedReader.readLine
semantics), never ``str.splitlines`` (which also breaks on \\x0b/\\f/
\\u2028).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_JS = r"[ \t\n\x0b\f\r]"      # Java \s
_JNS = r"[^ \t\n\x0b\f\r]"    # Java \S

MESSAGE_START = re.compile(
    r"^From %s+@%s.*[0-9]{4}$" % (_JNS, _JNS), re.IGNORECASE)
MESSAGE_ID_PREFIX = re.compile(r"^message-id: <(.*)>$", re.IGNORECASE)
SUBJECT_PREFIX = re.compile(r"^subject: (.*)$", re.IGNORECASE)
FROM_PREFIX = re.compile(r"^from: (%s.*)$" % _JNS, re.IGNORECASE)
REFS_PREFIX = re.compile(r"^references: (.*)$", re.IGNORECASE)
TO_PREFIX = re.compile(r"^to: (.*)$", re.IGNORECASE)
DEFAULT_QUOTED_TEXT = r"^(\||>)"

#: MailOptions enabled-pattern order (FROM, TO, REFS, SUBJECT)
_FIELD_ORDER = (("from", FROM_PREFIX), ("to", TO_PREFIX),
                ("refs", REFS_PREFIX), ("subject", SUBJECT_PREFIX))

_LINE_SPLIT = re.compile(r"\r\n|\r|\n")


def parse_mbox(text: str, filename: str, prefix: str = "",
               fields: tuple = ("from", "to", "refs", "subject"),
               include_body: bool = True,
               strip_quoted: bool = False,
               quoted_regex: str = DEFAULT_QUOTED_TEXT,
               separator: str = "\n",
               body_separator: str = "\n") -> list[dict]:
    """In-core MailProcessor.parseMboxLineByLine twin: one dict per
    message with the reference's key/value plus the parsed fields.

    ``fields`` selects which headers are captured, in MailOptions'
    fixed FROM/TO/REFS/SUBJECT order regardless of the order given.
    """
    patterns = [(n, rx) for n, rx in _FIELD_ORDER if n in fields]
    quoted_re = re.compile(quoted_regex)
    results: list = [None] * len(patterns)
    body_parts: list[str] = []
    message_id = None
    in_body = False
    out: list[dict] = []

    def emit():
        value = "".join((r if r is not None else "") + separator
                        for r in results)
        value += "\n" + "".join(body_parts)
        row = {"key": "%s/%s/%s" % (prefix, filename, message_id),
               "value": value, "file": filename, "message_id": message_id}
        for (name, _), r in zip(patterns, results):
            row[name] = r
        out.append(row)

    for line in _LINE_SPLIT.split(text):
        if strip_quoted and quoted_re.search(line):
            continue
        for i, (_, rx) in enumerate(patterns):
            m = rx.fullmatch(line)
            if m is not None:
                results[i] = m.group(1)
        if message_id is not None:
            if MESSAGE_START.fullmatch(line):
                emit()
                body_parts = []
                message_id = None
                in_body = False
                # results intentionally NOT cleared (reference quirk)
            elif in_body and include_body:
                if line:
                    body_parts.append(line + body_separator)
            else:
                in_body = line == ""
        elif len(line) > 14:
            m = MESSAGE_ID_PREFIX.fullmatch(line)
            if m is not None:
                message_id = m.group(1)
    if message_id is not None:
        emit()
    return out


def mail_records(spark: SparkSession, path: str, prefix: str = "",
                 fields: tuple = ("from", "to", "refs", "subject"),
                 include_body: bool = True,
                 strip_quoted: bool = False,
                 quoted_regex: str = DEFAULT_QUOTED_TEXT,
                 separator: str = "\n",
                 body_separator: str = "\n",
                 charset: str = "utf-8") -> DataFrame:
    """DataFrame (key, value, file, message_id, <enabled fields>) from
    a directory of mbox files — `seqmailarchives` twin. One file per
    executor task; columns beyond key/value expose the parsed headers
    so downstream vectorization skips the separator re-split the
    reference's FromEmailToDictionaryMapper has to do.
    """
    import pandas as pd

    import os as _os

    field_cols = [n for n, _ in _FIELD_ORDER if n in fields]
    schema = ("key string, value string, file string, message_id string"
              + "".join(", %s string" % c for c in field_cols))
    files = (spark.read.format("binaryFile")
             .option("recursiveFileLookup", "true").load(path))
    # the reference's directory walker appends each nested subdir to the
    # prefix (SequenceFilesFromMailArchives.java:128), so the key is
    # prefix + '/' + path-relative-to-input — reproduced from the
    # binaryFile path
    root_abs = _os.path.abspath(path)

    def parse(batches):
        import gzip
        import os
        from urllib.parse import unquote, urlparse

        for pdf in batches:
            rows = []
            for blob, fpath in zip(pdf["content"], pdf["path"]):
                local = unquote(urlparse(fpath).path)
                rel = os.path.relpath(local, root_abs)
                name = local.rsplit("/", 1)[-1] if rel.startswith(
                    "..") else rel
                raw = bytes(blob)
                if name.endswith(".gz"):
                    # the reference accepts gzipped archives
                    # (MailProcessor class doc; FileLineIterable keys on
                    # the name); generateKey keeps the .gz filename
                    raw = gzip.decompress(raw)
                text = raw.decode(charset, errors="replace")
                rows.extend(parse_mbox(
                    text, name, prefix=prefix, fields=fields,
                    include_body=include_body, strip_quoted=strip_quoted,
                    quoted_regex=quoted_regex, separator=separator,
                    body_separator=body_separator))
            cols = ["key", "value", "file", "message_id"] + field_cols
            yield pd.DataFrame(
                {c: pd.Series([r.get(c) for r in rows], dtype="object")
                 for c in cols})

    return files.select("content", "path").mapInPandas(parse, schema=schema)
