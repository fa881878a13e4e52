"""Random-forest dataset descriptor — the reference's `mahout describe`.

Studied, not copied — reference anchors:
  mr/.../classifier/df/data/DescriptorUtils.java:43-108 (token grammar:
  I/N/C/L case-insensitive, positive-integer multiplicators expand the
  NEXT token, two consecutive multiplicators are an error),
  DataLoader.java:53-100,184-218 (lines split on "[, ]"; a line is
  dropped when a non-ignored token is '?' or a numerical token fails to
  parse; categorical + non-regression label values are collected),
  Dataset.java:339-365 (.info JSON: one map per COLUMN in file order —
  {"type", "values", "label"}; ignored columns keep a slot),
  tools/Describe.java:44-120 (CLI: --path --file --descriptor
  [--regression]).

Twist vs the reference: it scans sequentially on the driver
(DataLoader's Scanner loop); here the scan is a distributed
spark.read.text + one aggregation — categorical value sets are tiny
(bounded collect), the count is an agg. The reference collects values
into a HashSet so its .info value ORDER is JVM-hash-dependent; ours is
SORTED — deterministic, and Dataset.fromJSON treats values as a set, so
any order round-trips.
"""
from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ATTRS = {"I": "ignored", "N": "numerical", "C": "categorical",
         "L": "label"}


def generate_descriptor(tokens: "list[str] | str") -> list[str]:
    """Expand the user-friendly descriptor ("3 N I 2 C L" ->
    [N N N I C C L]); DescriptorUtils.generateDescriptor semantics."""
    if isinstance(tokens, str):
        tokens = [t for t in tokens.split(" ") if t]
    out: list[str] = []
    mult = 0
    for tok in tokens:
        try:
            n = int(tok)
        except ValueError:
            up = tok.upper()
            if up not in ATTRS:
                raise ValueError(f"Bad Token : {up}")
            out.extend([up] * (mult or 1))
            mult = 0
            continue
        if n <= 0:
            raise ValueError(f"Multiplicator ({n}) must be > 0")
        if mult > 0:
            raise ValueError(
                "A multiplicator cannot be followed by another "
                "multiplicator")
        mult = n
    return out


def describe_dataset(spark: SparkSession, path: str,
                     descriptor: "list[str] | str",
                     regression: bool = False) -> tuple[str, int]:
    """(Dataset .info JSON, n valid rows) for a CSV/space-separated data

    file — `mahout describe` output, computed distributedly."""
    attrs = generate_descriptor(descriptor)
    if sum(a == "L" for a in attrs) != 1:
        raise ValueError("descriptor needs exactly one label (L)")
    lines = spark.read.text(path).filter(F.length("value") > 0)
    toks = lines.select(F.split("value", "[, ]").alias("t"))
    n_attr = len(attrs)
    # the reference CRASHES on a wrong-arity line (DataLoader.java:69
    # checkArgument); distributed jobs drop it instead — documented
    # divergence, the '?'/non-numeric drop rules below are faithful
    valid = toks.filter(F.size("t") == n_attr)
    for i, a in enumerate(attrs):
        if a == "I":
            continue
        col = F.col("t").getItem(i)
        valid = valid.filter(col != "?")
        if a == "N" or (regression and a == "L"):
            # try_cast: ANSI mode makes plain cast THROW on bad input;
            # the reference drops the line (DataLoader.java:89-93)
            valid = valid.filter(col.try_cast("double").isNotNull())
    collect_idx = [i for i, a in enumerate(attrs)
                   if a == "C" or (a == "L" and not regression)]
    aggs = [F.count("*").alias("__n")] + [
        F.array_sort(F.collect_set(F.col("t").getItem(i)))
        .alias(f"__v{i}") for i in collect_idx]
    row = valid.agg(*aggs).collect()[0]
    out = []
    for i, a in enumerate(attrs):
        out.append({
            "type": ATTRS[a],
            "values": list(row[f"__v{i}"]) if i in collect_idx else None,
            "label": a == "L",
        })
    return json.dumps(out), int(row["__n"])


def load_dataset_info(info_json: str) -> list[dict]:
    """Parse a .info JSON back to the per-column attribute maps."""
    return json.loads(info_json)
