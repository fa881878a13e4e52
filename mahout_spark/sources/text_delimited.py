"""Text-delimited IndexedDataset IO — the reference CLI's wire format.

Readers/writers for the two shapes the reference supports
(drivers/TextDelimitedReaderWriter.scala; schemas Schema.scala:49-77):

- **elements**: one interaction per line, ``rowID<d>columnID`` or
  ``rowID<d>filter<d>columnID`` (the filter column selects an action type,
  e.g. 'purchase' vs 'view' — ItemSimilarityDriver's -f1/-f2);
- **rows**: ``rowID\\tcol1:score1 col2:score2 ...`` (score omittable).

String IDs stay DataFrame columns end-to-end (the reference's
BiDictionary collect+broadcast, IndexedDatasetSpark.scala:84-101, becomes
a non-event — joins handle it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_elements(spark: SparkSession, path: str,
                  filter_value: str | None = None,
                  delimiter: str = "[,\t ]") -> DataFrame:
    """-> (row_id string, col_id string[, value double]) triples.

    With ``filter_value``, lines are ``row<d>filter<d>item`` and only
    matching rows are kept (ItemSimilarityDriver -f). Without, 2-column
    ``row<d>item`` (value=1.0) or 3-column ``row<d>item<d>value``.
    """
    lines = spark.read.text(path).filter(F.trim("value") != "")
    parts = F.split(F.col("value"), delimiter)
    if filter_value is not None:
        return (lines.select(parts.getItem(0).alias("row_id"),
                             parts.getItem(1).alias("__f"),
                             parts.getItem(2).alias("col_id"))
                .filter(F.col("__f") == filter_value)
                .select("row_id", "col_id")
                .withColumn("value", F.lit(1.0)))
    df = lines.select(parts.alias("__p"))
    return df.select(
        F.col("__p").getItem(0).alias("row_id"),
        F.col("__p").getItem(1).alias("col_id"),
        F.when(F.size("__p") > 2, F.col("__p").getItem(2).cast("double"))
        .otherwise(F.lit(1.0)).alias("value"))


def write_rows(sims: DataFrame, path: str, row: str = "item_a",
               col: str = "item_b", score: str = "llr",
               omit_score: bool = False) -> None:
    """Write ``rowID\\tcol1:score1 col2:score2`` text, scores sorted

    descending per row (TextDelimitedReaderWriter's default write schema).
    """
    if omit_score:
        cell = F.col(col)
    else:
        cell = F.concat_ws(":", F.col(col), F.col(score).cast("string"))
    rows = (sims
            .withColumn("__cell", cell)
            .groupBy(row)
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        (-F.col(score)).alias("s"),
                        F.col("__cell").alias("c")))),
                    lambda x: x["c"]),
                " ").alias("__cells")))
    (rows.select(F.concat_ws("\t", F.col(row), F.col("__cells"))
                 .alias("value"))
     .coalesce(1).write.mode("overwrite").text(path))


def read_rows(spark: SparkSession, path: str) -> DataFrame:
    """Parse rows text back to (row_id, col_id, value) triples."""
    lines = spark.read.text(path).filter(F.trim("value") != "")
    rid = F.split(F.col("value"), "\t").getItem(0)
    cells = F.split(F.split(F.col("value"), "\t").getItem(1), " ")
    return (lines.select(rid.alias("row_id"),
                         F.explode(cells).alias("__cell"))
            .filter(F.col("__cell") != "")
            .select("row_id",
                    F.split(F.col("__cell"), ":").getItem(0).alias("col_id"),
                    F.coalesce(F.split(F.col("__cell"), ":").getItem(1)
                               .cast("double"), F.lit(1.0)).alias("value")))
