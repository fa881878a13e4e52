"""Catalog abstraction: one table spec, two backends (Iceberg / parquet).

North rule: the production input is an *Iceberg table of Common-Crawl-style
web pages*; this sandbox has no Iceberg runtime jar, so the gate runs the
parquet backend while a real cluster runs Iceberg — **with the identical
schema and partitioning spec, declared once** (SURVEY §7: "--format parquet
is a drop-in").

Design:

- ``TableSpec`` declares schema + partition transforms ONCE. Transforms are
  the Iceberg ones (``days(col)``, ``bucket(N, col)``, ``identity``); the
  parquet backend materializes each transform as a derived partition
  column computed by the SAME definition (UTC day date, murmur-style
  bucket via Spark's hash() — Iceberg's bucket transform is also a
  Murmur3 hash mod N), so files land with the same layout either way and
  partition pruning works identically.
- ``Catalog`` resolves names to backends: ``format='iceberg'`` needs the
  runtime jar (``has_iceberg``); ``format='parquet'`` maps names under a
  root dir; ``format='auto'`` picks Iceberg when available.
- DDL for the Iceberg side is emitted as real ``CREATE TABLE ... USING
  iceberg PARTITIONED BY (...)`` text (testable without the jar).

The web-pages table of the north rule is predeclared as ``WEBPAGES_SPEC``:
(url string, warc_ts timestamp, html binary, text string, lang string),
partitioned by days(warc_ts) + bucket(64, url).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def has_iceberg(spark: SparkSession) -> bool:
    # NB: plain attribute access (spark._jvm.org.apache.iceberg.Table)
    # returns a py4j JavaPackage without raising even when the class is
    # absent — Class.forName is the real probe.
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


@dataclass(frozen=True)
class PartitionField:
    """One Iceberg partition transform: 'identity' | 'days' | 'bucket'."""

    column: str
    transform: str = "identity"
    n: int | None = None  # bucket count

    def ddl(self) -> str:
        if self.transform == "identity":
            return self.column
        if self.transform == "days":
            return f"days({self.column})"
        if self.transform == "bucket":
            return f"bucket({self.n}, {self.column})"
        raise ValueError(self.transform)

    @property
    def derived_name(self) -> str:
        if self.transform == "identity":
            return self.column
        if self.transform == "days":
            return f"{self.column}_day"
        return f"{self.column}_bucket"

    def derived_expr(self) -> F.Column:
        """Parquet-side materialization of the same transform."""
        if self.transform == "identity":
            return F.col(self.column)
        if self.transform == "days":
            return F.to_date(F.col(self.column))
        # Iceberg bucket = (murmur3(v) & Integer.MAX_VALUE) % n; Spark's
        # hash() is the same Murmur3_x86_32 family — matching SHAPE
        # (stable hash mod n), documented as layout-compatible-in-kind
        # rather than bit-identical to Iceberg's transform.
        return F.pmod(F.hash(F.col(self.column)).bitwiseAND(
            F.lit(0x7FFFFFFF)), F.lit(self.n))


@dataclass(frozen=True)
class TableSpec:
    name: str
    schema_ddl: str  # "url string, warc_ts timestamp, ..."
    partitioning: tuple = field(default_factory=tuple)

    def iceberg_ddl(self, catalog_prefix: str = "") -> str:
        ident = f"{catalog_prefix}{self.name}" if catalog_prefix else self.name
        parts = ""
        if self.partitioning:
            parts = (" PARTITIONED BY ("
                     + ", ".join(p.ddl() for p in self.partitioning) + ")")
        return (f"CREATE TABLE IF NOT EXISTS {ident} ({self.schema_ddl}) "
                f"USING iceberg{parts}")

    def partition_cols(self) -> list[str]:
        return [p.derived_name for p in self.partitioning]


WEBPAGES_SPEC = TableSpec(
    name="webpages",
    schema_ddl=("url string, warc_ts timestamp, html binary, text string, "
                "lang string"),
    partitioning=(PartitionField("warc_ts", "days"),
                  PartitionField("url", "bucket", 64)))


class Catalog:
    """Name → table resolution over Iceberg or parquet-dir backends.

    ``format='auto'`` uses Iceberg when the runtime jar is present,
    parquet otherwise; the gate pins ``format='parquet'``.
    """

    def __init__(self, spark: SparkSession, root: str | None = None,
                 fmt: str = "auto", catalog_prefix: str = ""):
        if fmt not in ("auto", "iceberg", "parquet"):
            raise ValueError(fmt)
        if fmt == "auto":
            fmt = "iceberg" if has_iceberg(spark) else "parquet"
        if fmt == "iceberg" and not has_iceberg(spark):
            raise RuntimeError("Iceberg runtime not on the classpath")
        if fmt == "parquet" and root is None:
            raise ValueError("parquet catalog needs a root directory")
        self.spark = spark
        self.fmt = fmt
        self.root = root
        self.catalog_prefix = catalog_prefix

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _ident(self, name: str) -> str:
        return f"{self.catalog_prefix}{name}" if self.catalog_prefix else name

    # -- DDL ---------------------------------------------------------------
    def ensure_table(self, spec: TableSpec) -> None:
        if self.fmt == "iceberg":
            self.spark.sql(spec.iceberg_ddl(self.catalog_prefix))
        # parquet: directories materialize on first write

    # -- IO ------------------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def read_stream(self, name: str, schema_ddl: str) -> DataFrame:
        if self.fmt == "iceberg":
            return (self.spark.readStream.format("iceberg")
                    .load(self._ident(name)))
        return (self.spark.readStream.schema(schema_ddl)
                .parquet(self._path(name)))

    def write(self, df: DataFrame, name_or_spec, mode: str = "append") -> None:
        """Append/overwrite under the spec's partition layout. Both

        backends get the SAME partitioning; the parquet side derives the
        transform columns (dropped again on read-side projection)."""
        spec = (name_or_spec if isinstance(name_or_spec, TableSpec)
                else TableSpec(name=name_or_spec, schema_ddl=""))
        if self.fmt == "iceberg":
            w = df.writeTo(self._ident(spec.name))
            if mode == "append":
                w.append()
            else:
                w.createOrReplace()
            return
        out = df
        pcols = []
        for p in spec.partitioning:
            if p.transform != "identity" or p.column not in df.columns:
                out = out.withColumn(p.derived_name, p.derived_expr())
            pcols.append(p.derived_name)
        w = out.write.mode(mode)
        if pcols:
            w = w.partitionBy(*pcols)
        w.parquet(self._path(spec.name))

    # -- maintenance ---------------------------------------------------------
    def maintenance_sql(self, spec: TableSpec) -> list[str]:
        """The Iceberg housekeeping a production deployment schedules

        (emitted as SQL so the intent is testable without the jar)."""
        ident = self._ident(spec.name)
        return [
            f"CALL system.expire_snapshots(table => '{ident}', "
            f"retain_last => 10)",
            f"CALL system.rewrite_data_files(table => '{ident}')",
            f"CALL system.rewrite_manifests(table => '{ident}')",
        ]


# backwards-compatible helpers (round-1 API)
def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref = 'catalog.db.table' (Iceberg) or a parquet path."""
    if "/" not in ref and has_iceberg(spark):
        return spark.table(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    if "/" not in ref and has_iceberg(df.sparkSession):
        w = df.writeTo(ref)
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)
