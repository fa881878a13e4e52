"""Catalog abstraction: Iceberg when a catalog is configured, parquet

otherwise (SURVEY §7: '--format parquet is a drop-in; schema and
partitioning spec identical'). The north rule names Iceberg tables; this
sandbox has no Iceberg runtime jar, so the abstraction keeps every caller
source-compatible with both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


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
