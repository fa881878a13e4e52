"""mbox mail-archive ingest (`seqmailarchives` twin): hand-computed
goldens for the MailProcessor state machine, the reference's
carryover / body-boundary / strip-quoted quirks, gzip + nested-dir
keys, and Spark-vs-in-core parity."""

import gzip
import os

import pytest

from mahout_spark.sources.mailarchives import mail_records, parse_mbox

BOUNDARY1 = "From dev-return-1-a=x.org@x.org Wed Sep 01 21:01:35 2010"
BOUNDARY2 = "From dev-return-2-b=x.org@x.org Wed Sep 01 22:15:02 2010"
BOUNDARY3 = "From dev-return-3-c=x.org@x.org Thu Sep 02 03:44:19 2010"

MBOX = "\n".join([
    BOUNDARY1,
    "Return-Path: <a@x.org>",
    "Message-ID: <msg-one@thor>",
    "From: \"Alice\" <alice@x.org>",
    "To: dev@x.org",
    "Subject: first subject",
    "",
    "body one line one",
    "",
    "> quoted reply line",
    "| piped quote line",
    "body one line two",
    BOUNDARY2,
    "Message-ID: <msg-two@thor>",
    "From: bob@x.org",
    "To: dev@x.org",
    "",
    "second body",
    BOUNDARY3,
    "Message-ID: <msg-three@thor>",
    "From: carol@x.org",
    "To: users@x.org",
    "Subject: third subject",
    "References: <msg-one@thor>",
    "",
    "third body",
    "",
])


def test_golden_subject_body():
    msgs = parse_mbox(MBOX, "f.mbox", prefix="TEST",
                      fields=("subject",), include_body=True,
                      separator="")
    assert [m["message_id"] for m in msgs] == [
        "msg-one@thor", "msg-two@thor", "msg-three@thor"]
    assert msgs[0]["key"] == "TEST/f.mbox/msg-one@thor"
    # value = subject + sep('') + '\n' + each non-empty body line + '\n'
    assert msgs[0]["value"] == ("first subject\n"
                                "body one line one\n"
                                "> quoted reply line\n"
                                "| piped quote line\n"
                                "body one line two\n")
    assert msgs[2]["value"] == "third subject\nthird body\n"


def test_carryover_quirk():
    """patternResults is never cleared between messages
    (MailProcessor.java:92): message two has no Subject header and
    inherits message one's."""
    msgs = parse_mbox(MBOX, "f.mbox", fields=("subject",),
                      include_body=False, separator="")
    assert msgs[1]["subject"] == "first subject"
    assert msgs[1]["value"] == "first subject\n"


def test_field_order_and_separator():
    msgs = parse_mbox(MBOX, "f.mbox",
                      fields=("subject", "from", "to", "refs"),
                      include_body=False, separator="|")
    # MailOptions order is FROM, TO, REFS, SUBJECT regardless of input
    assert msgs[0]["value"] == ('"Alice" <alice@x.org>|dev@x.org|'
                                "|first subject|\n")
    # refs missing in msg 1 -> bare separator; present in msg 3
    assert msgs[2]["value"] == ("carol@x.org|users@x.org|"
                                "<msg-one@thor>|third subject|\n")


def test_strip_quoted():
    msgs = parse_mbox(MBOX, "f.mbox", fields=("subject",),
                      include_body=True, separator="",
                      strip_quoted=True)
    assert msgs[0]["value"] == ("first subject\n"
                                "body one line one\n"
                                "body one line two\n")


def test_unescaped_boundary_in_body_terminates():
    """No >From unescaping in the reference: a body line shaped like an
    mbox boundary ends the message early."""
    text = "\n".join([
        BOUNDARY1,
        "Message-ID: <cut@thor>",
        "Subject: cut",
        "",
        "kept line",
        "From someone@y.org Wed Sep 01 21:01:35 2010",
        "lost line",
    ])
    msgs = parse_mbox(text, "f.mbox", fields=("subject",),
                      include_body=True, separator="")
    assert len(msgs) == 1
    assert msgs[0]["value"] == "cut\nkept line\n"


def test_message_id_length_gate():
    """Lines of length <= 14 are never scanned for a Message-ID
    (MailProcessor.java:139)."""
    text = "\n".join([
        "Message-ID: <>",      # 14 chars -> ignored
        "Subject: no id",
        "",
        "body",
    ])
    assert parse_mbox(text, "f.mbox") == []
    text2 = "Message-ID: <a>\nSubject: s\n\nbody\n"
    msgs = parse_mbox(text2, "f.mbox", fields=("subject",),
                      include_body=True, separator="")
    assert len(msgs) == 1 and msgs[0]["message_id"] == "a"


def test_junk_before_first_message_ignored():
    text = "random preamble\n" + MBOX
    assert len(parse_mbox(text, "f.mbox")) == 3


def test_crlf_lines():
    msgs = parse_mbox(MBOX.replace("\n", "\r\n"), "f.mbox",
                      fields=("subject",), include_body=True,
                      separator="")
    assert len(msgs) == 3
    assert msgs[0]["subject"] == "first subject"


def test_spark_parity_gzip_and_nested_dirs(spark, tmp_path):
    sub = tmp_path / "subdir"
    sub.mkdir()
    (tmp_path / "plain.mbox").write_text(MBOX)
    with gzip.open(sub / "mail-messages.gz", "wt") as f:
        f.write(MBOX)

    df = mail_records(spark, str(tmp_path), prefix="TEST",
                      fields=("from", "subject"), include_body=True,
                      separator="")
    rows = {r["key"]: r.asDict() for r in df.collect()}
    assert len(rows) == 6
    # nested subdirs join the key like the reference's walker
    assert "TEST/subdir/mail-messages.gz/msg-one@thor" in rows
    assert "TEST/plain.mbox/msg-three@thor" in rows

    expected = parse_mbox(MBOX, "plain.mbox", prefix="TEST",
                          fields=("from", "subject"),
                          include_body=True, separator="")
    for exp in expected:
        got = rows[exp["key"]]
        assert got["value"] == exp["value"]
        assert got["subject"] == exp["subject"]
        assert got["from"] == exp["from"]
    # gzipped copy parses to the same values under its own key
    assert (rows["TEST/subdir/mail-messages.gz/msg-two@thor"]["value"]
            == expected[1]["value"])


def test_cli_smoke(spark, tmp_path):
    """seqmail CLI in its own JVM (the job calls spark.stop())."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    (tmp_path / "a.mbox").write_text(MBOX)
    out = tmp_path / "out"
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    res = subprocess.run(
        [sys.executable, "jobs/seqmail.py",
         "--input", str(tmp_path / "a.mbox"), "--output", str(out),
         "--subject", "--body", "--separator", "", "--cpus", "2"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("{")][-1]
    assert json.loads(line)["messages"] == 3
    got = spark.read.parquet(str(out / "chunks"))
    assert got.count() == 3
    assert set(got.columns) == {"key", "value", "file", "message_id",
                                "subject"}
