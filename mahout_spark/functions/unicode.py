"""Unicode hygiene for web corpora: NFC normalization + control-char
scrub.

Web-crawled text mixes precomposed and decomposed code-point sequences
("é" as U+00E9 vs "e"+U+0301); every downstream exact operator in this
repo — line dedup, k-gram span dedup, minhash shingles, token stats —
keys on BYTES, so canonically-equivalent duplicates survive dedup
unless the corpus is normalized first. No reference anchor (the
reference's Lucene analyzers normalize inside the JVM); this is the
curation layer's own front door, applied before any hashing stage.

Two pieces:
- ``nfc_normalize``: canonical composition (Unicode NFC). Spark has no
  built-in normalizer, so this is an Arrow-batched pandas UDF (one
  ``unicodedata.normalize`` per row inside a vectorized batch — the
  sanctioned slow path; it is the ONLY per-row Python in the curation
  pipeline and it is pure map-side, no shuffle). DuckDB twin:
  ``nfc_normalize()`` (utf8proc) — both implement UAX #15 canonical
  composition, bit-equal on every stable code point (pytest-pinned
  across Latin accents, Hangul jamo, combining runs).
- ``strip_control_chars``: C0/C1 controls except tab/newline/CR
  removed — a pure JVM regexp_replace (no UDF) with the identical
  RE2/Java/DuckDB character class.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# C0 except \t \n \r, DEL, C1 — explicit ranges, identical in Java
# regex, RE2 and DuckDB
_CTRL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]"


@F.pandas_udf(StringType())
def _nfc_udf(s):
    import unicodedata

    return s.map(lambda x: None if x is None
                 else unicodedata.normalize("NFC", x))


def nfc_normalize(text: Column) -> Column:
    """Canonical composition (NFC) — Arrow-batched pandas UDF."""
    return _nfc_udf(text)


def nfc_normalize_sql(text: str) -> str:
    return f"nfc_normalize({text})"


def strip_control_chars(text: Column) -> Column:
    """Remove C0/C1 control chars except tab/newline/CR (JVM-side)."""
    return F.regexp_replace(text, _CTRL_CLASS, "")


def strip_control_chars_sql(text: str) -> str:
    return f"regexp_replace({text}, '{_CTRL_CLASS}', '', 'g')"
