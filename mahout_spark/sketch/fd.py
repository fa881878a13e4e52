"""Distributed frequent-directions build over an embedding column.

Shape (identical to sketch/agg.py's two-phase contract): mapInPandas
builds one FD partial per Arrow batch run (per partition), the shuffle
carries only binary blobs keyed by a deterministic salt, applyInPandas
merges each salt group, and the driver folds the ``n_merge`` survivors —
treeAggregate with an explicit fan-in, so driver memory is
O(n_merge · ell · d) regardless of partition count (at 10^5+ partitions
collecting raw partials would be gigabytes; the salt level caps it).

Result: B with 0 ⪯ AᵗA − BᵗB ⪯ (‖A‖F² − ‖B‖F²)·I — the bounded-memory
Gramian for wide matrices where operators/drm.ata's exact d² result no
longer fits. The certified bound ships WITH the sketch (fnorm2 is exact
and merge-exact), so callers can assert their tolerance at runtime."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

from mahout_spark.core.fd import FrequentDirections

_PARTIAL_SCHEMA = StructType([StructField("salt", IntegerType()),
                              StructField("blob", BinaryType())])


def fd_sketch(df: DataFrame, vec_col: str, ell: int,
              dim: int | None = None, n_merge: int = 32,
              batch_rows: int = 4096) -> FrequentDirections:
    """Build one corpus-level FD sketch of the row matrix in ``vec_col``
    (array<float|double>, fixed length). ``dim=`` skips the plan-time
    probe job (same knob as ann.py)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fd = FrequentDirections(ell, dim)
        seen = 0
        for pdf in batches:
            col = pdf[vec_col].values
            for lo in range(0, len(col), batch_rows):
                chunk = np.stack(col[lo:lo + batch_rows])
                fd.update_batch(chunk)
                seen += len(chunk)
        if seen:
            import hashlib

            # salt from sketch content: deterministic, retry-stable
            # (python hash() is per-process salted — never use it here)
            blob = fd.serialize()
            salt = int.from_bytes(hashlib.md5(blob).digest()[:4],
                                  "little") % n_merge
            yield pd.DataFrame({"salt": [salt], "blob": [blob]})

    partials = df.select(vec_col).mapInPandas(build, _PARTIAL_SCHEMA)

    def merge_salt(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in pdf["blob"]:
            s = FrequentDirections.deserialize(bytes(blob))
            acc = s if acc is None else acc.merge(s)
        return pd.DataFrame({"salt": [int(pdf["salt"].iloc[0])],
                             "blob": [acc.serialize()]})

    merged = (partials.groupBy("salt")
              .applyInPandas(merge_salt, _PARTIAL_SCHEMA)
              .collect())
    acc = None
    for row in merged:
        s = FrequentDirections.deserialize(bytes(row["blob"]))
        acc = s if acc is None else acc.merge(s)
    return acc if acc is not None else FrequentDirections(ell, dim)


def fd_ata(df: DataFrame, vec_col: str, ell: int,
           dim: int | None = None) -> tuple[np.ndarray, float]:
    """(BᵗB, certified spectral bound) — approximate Gramian of the
    row matrix plus the ‖AᵗA − BᵗB‖₂ upper bound that came with it."""
    fd = fd_sketch(df, vec_col, ell, dim)
    return fd.ata(), fd.spectral_bound()
