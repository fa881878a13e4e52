"""Sources: synthetic web-page table generator + parquet/Iceberg readers."""

from mahout_spark.sources.webpages import (extract_text_udf, generate_webpages,
                                           webpages_pandas)

__all__ = ["generate_webpages", "webpages_pandas", "extract_text_udf"]
