"""ARFF ingest — the reference's `arff.vector` tool re-expressed for Spark.

Reference anchors (studied, not copied):
  integration/src/main/java/org/apache/mahout/utils/vectors/arff/
    ARFFVectorIterable.java:75-140  — header parse (relation, attributes,
      types, nominal ordinals, date formats), case-insensitive keywords;
    ARFFIterator.java:48-92        — data rows: sparse `{idx val, ...}`
      vs dense CSV, '?' missing cells skipped;
    ARFFIterator.java:100-142      — quote-aware CSV split (both quote
      styles, backslash escapes);
    MapBackedARFFModel.java:85-175 — value semantics: numeric as-is
      (non-numeric -> NaN), nominal -> ordinal starting at 1, date ->
      epoch millis as double, string -> incremental word id in
      first-encounter order (shared across the whole file).

Semantics preserved exactly, including the 1-based nominal ordinals and
the order-dependent string word map: the sequential `words.put(data,
wordCount++)` becomes min-first-occurrence + rank — bit-identical to
the sequential assignment, but computed distributedly (the rank window
runs over the DISTINCT word table, which is vocabulary-sized, not
corpus-sized; at extreme vocabularies use the global_sorted_rank shape).
Documented divergence: the reference's `isNumeric` uses a localized
NumberFormat (so "1,234" parses as 1234 in an English locale); we accept
exactly the float-literal grammar and map everything else to NaN.

Header parsing is driver-side (headers are tiny); data lines are
distributed via spark.read.text + zipWithIndex (text splits are
offset-ordered, so row ids equal sequential read order), and cell
parsing runs in Arrow-batched mapInPandas — the same ingest shape as
sources/seqfile.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NUMERIC, INTEGER, REAL, STRING, NOMINAL, DATE = (
    "numeric", "integer", "real", "string", "nominal", "date")

_FLOAT_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_DEFAULT_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def split_csv(line: str) -> list[str]:
    """Quote-aware CSV split (ARFFIterator.splitCSV): commas inside
    single- or double-quoted runs don't split; backslash escapes the
    next char; tokens are trimmed."""
    out, sb, esc = [], [], "\0"
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "\\":
            i += 1
            if i < n:
                sb.append(line[i])
        elif c in ("\"", "'"):
            if c == esc:
                esc = "\0"
            elif esc == "\0":
                esc = c
            sb.append(c)
        elif c == "," and esc == "\0":
            out.append("".join(sb).strip())
            sb = []
        else:
            sb.append(c)
        i += 1
    if sb:
        out.append("".join(sb).strip())
    return out


def _remove_quotes(s: str | None) -> str | None:
    if s is None:
        return None
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", "\""):
        s = s[1:-1]
    return s.strip()


@dataclass
class ArffModel:
    relation: str = ""
    labels: list = field(default_factory=list)        # attr names, in order
    types: list = field(default_factory=list)         # per-attr type tag
    nominals: dict = field(default_factory=dict)      # label -> {value: ord}
    date_fmts: dict = field(default_factory=dict)     # idx -> java pattern

    @property
    def n_attrs(self) -> int:
        return len(self.labels)

    def label_bindings(self) -> dict:
        return {lab: i for i, lab in enumerate(self.labels)}


def parse_header(lines) -> tuple[ArffModel, int]:
    """(model, index of the line AFTER @data). Keywords are
    case-insensitive; '%' comments and blanks skipped
    (ARFFVectorIterable.java:75-140)."""
    model = ArffModel()
    for ln, raw in enumerate(lines):
        line = raw.strip()
        if not line or line.startswith("%"):
            continue
        parts = re.split(r"[ \t]+", line, maxsplit=1)
        kw = parts[0].lower()
        if kw == "@relation":
            model.relation = _remove_quotes(parts[1]) if len(parts) > 1 else ""
        elif kw == "@attribute":
            if len(parts) < 2:
                raise ValueError(f"bad @attribute line: {raw!r}")
            attr = re.split(r"[ \t]+", parts[1], maxsplit=1)
            if len(attr) < 2:
                raise ValueError(f"no type for attribute: {parts[1]!r}")
            label = _remove_quotes(attr[0].lower())
            spec = attr[1].strip()
            low = spec.lower()
            idx = len(model.labels)
            if low in (NUMERIC, INTEGER, REAL):
                model.types.append(NUMERIC)
            elif low == STRING:
                model.types.append(STRING)
            elif spec.startswith("{"):
                model.types.append(NOMINAL)
                classes = split_csv(spec[1:spec.rindex("}")])
                model.nominals[label] = {
                    _remove_quotes(c): i + 1           # 1-based, as reference
                    for i, c in enumerate(classes)}
            elif low.startswith(DATE):
                model.types.append(DATE)
                fmt = spec[len(DATE):].strip()
                if fmt.startswith("\"") and fmt.endswith("\""):
                    fmt = fmt[1:-1]
                model.date_fmts[idx] = fmt or _DEFAULT_DATE_FMT
            else:
                raise ValueError(f"invalid attribute type: {spec!r}")
            model.labels.append(label)
        elif kw == "@data":
            return model, ln + 1
    raise ValueError("no @data section found")


_J2P = [("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"), ("dd", "%d"),
        ("HH", "%H"), ("mm", "%M"), ("ss", "%S"), ("'T'", "T"), ("'", "")]


def _java_fmt_to_strptime(fmt: str) -> str:
    for j, p in _J2P:
        fmt = fmt.replace(j, p)
    if "%" not in fmt:
        raise ValueError(f"unsupported date format: {fmt!r}")
    return fmt


def _cell_value(data: str, idx: int, model: ArffModel) -> float:
    """MapBackedARFFModel.getValue for non-string types (strings get
    their ids distributedly)."""
    data = _remove_quotes(data)
    t = model.types[idx]
    if t == NUMERIC:
        return float(data) if _FLOAT_RE.match(data) else float("nan")
    if t == NOMINAL:
        classes = model.nominals[model.labels[idx]]
        if data not in classes:
            raise ValueError(
                f"invalid nominal {data!r} for {model.labels[idx]!r}")
        return float(classes[data])
    if t == DATE:
        from datetime import datetime, timezone

        fmt = _java_fmt_to_strptime(
            model.date_fmts.get(idx, _DEFAULT_DATE_FMT))
        dt = datetime.strptime(data, fmt).replace(tzinfo=timezone.utc)
        return float(int(dt.timestamp() * 1000))       # epoch millis
    raise AssertionError(t)


def _data_lines(spark: SparkSession, path: str):
    """(model, DataFrame of (row_id, line)) — header driver-side, data
    lines distributed with file-order row ids (zipWithIndex over
    offset-ordered text splits == sequential read order)."""
    with open(path, "r", encoding="utf-8") as f:
        head = []
        for line in f:
            head.append(line)
            if line.strip().lower().startswith("@data"):
                break
    model, _ = parse_header(head)
    n_header = len(head)
    lines = (spark.read.text(path).rdd
             .zipWithIndex()
             .filter(lambda t: t[1] >= n_header)
             .map(lambda t: (t[1] - n_header, t[0]["value"])))
    df = spark.createDataFrame(lines, "file_line long, line string")
    data = (df.withColumn("line", F.trim("line"))
            .filter((F.col("line") != "") & ~F.col("line").startswith("%")))
    # single-partition by design: ids follow FILE order of one ARFF file
    # (bounded input), so the unpartitioned window is sequential-safe
    w = Window.orderBy("file_line")
    return model, data.withColumn("row_id", F.row_number().over(w) - 1)


def _read_arff_full(spark: SparkSession, path: str):
    import pandas as pd  # noqa: F401  — executor-side import in closures

    model, data = _data_lines(spark, path)
    mdl = model

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows, cols, raws = [], [], []
            for rid, line in zip(pdf["row_id"], pdf["line"]):
                if line.startswith("{") and line.endswith("}"):
                    for cell in split_csv(line[1:-1]):
                        sp = cell.find(" ")
                        idx = int(cell[:sp].strip())
                        dat = cell[sp:].strip()
                        if dat != "?":
                            rows.append(rid); cols.append(idx)
                            raws.append(dat)
                else:
                    for idx, cell in enumerate(split_csv(line)):
                        if "{" not in cell and cell != "?":
                            rows.append(rid); cols.append(idx)
                            raws.append(cell)
            yield pd.DataFrame({"row_id": rows, "col_id": cols,
                                "raw": raws})

    cells = data.select("row_id", "line").mapInPandas(
        parse, schema="row_id long, col_id int, raw string")
    str_idx = [i for i, t in enumerate(model.types) if t == STRING]
    if str_idx:
        cells = cells.persist()

    def convert(batches):
        for pdf in batches:
            vals = [_cell_value(raw, int(idx), mdl)
                    for idx, raw in zip(pdf["col_id"], pdf["raw"])]
            out = pdf[["row_id", "col_id"]].copy()
            out["value"] = vals
            yield out

    non_str = (cells.filter(~F.col("col_id").isin(str_idx))
               if str_idx else cells)
    triples = non_str.mapInPandas(
        convert, schema="row_id long, col_id int, value double")
    # pandas->Arrow maps NaN to null; convert never emits genuine nulls,
    # so restore the reference's NaN-for-unparseable-numeric semantics
    triples = triples.withColumn(
        "value", F.coalesce(F.col("value"), F.lit(float("nan"))))

    words = spark.createDataFrame([], "word string, word_id double")
    if str_idx:
        sc = (cells.filter(F.col("col_id").isin(str_idx))
              .withColumn("word",
                          F.regexp_replace(F.col("raw"), "[\"\']", "")))
        # sequential words.put(data, wordCount++) == rank of the word's
        # first (row, col) occurrence; the rank window runs over the
        # DISTINCT word table (vocabulary-sized)
        first = (sc.groupBy("word")
                 .agg(F.min(F.struct("row_id", "col_id")).alias("pos")))
        ww = Window.orderBy("pos")
        words = first.select("word", (F.row_number().over(ww) - 1)
                             .cast("double").alias("word_id"))
        str_triples = (sc.join(words, "word")
                       .select("row_id", "col_id",
                               F.col("word_id").alias("value")))
        triples = triples.unionByName(str_triples)
    return model, triples, words


def read_arff(spark: SparkSession, path: str) -> tuple[ArffModel, DataFrame]:
    """Parse an ARFF file into (model, triples): triples are
    (row_id long, col_id int, value double) — the DRM layer's input —
    with '?' cells absent and sparse rows carrying only their set
    indices (dense rows carry every parseable cell, including zeros,
    mirroring DenseVector.setQuick)."""
    model, triples, _ = _read_arff_full(spark, path)
    return model, triples


def read_arff_with_words(spark: SparkSession, path: str):
    """(model, triples, words): like read_arff plus the shared
    first-encounter (word, word_id) dictionary of the STRING attributes
    (MapBackedARFFModel.getWords)."""
    return _read_arff_full(spark, path)
