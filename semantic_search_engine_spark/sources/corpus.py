"""Corpus source: Iceberg when available, parquet otherwise.

The north_rule targets an Iceberg table of web pages. This runtime has
no Iceberg catalog jars, so the reader is written against the table
*shape* (input_hint: url, warc_ts, html, text, lang) with the Iceberg
path behind a capability probe — swapping in `spark.table("cat.db.t")`
is a config change, not a code change. Partition pruning / column
pruning / predicate pushdown behave identically over both (Iceberg's
DataSourceV2 scan reports the same pushdown surface the parquet
FileScan does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """``location`` is either an Iceberg table identifier
    (catalog.db.table) or a parquet path."""
    if "/" not in location and iceberg_available(spark):
        df = spark.table(location)
    else:
        df = spark.read.parquet(location)
    missing = [c for c in ("url", "text") if c not in df.columns]
    if missing:
        raise ValueError(f"corpus at {location} missing required columns {missing}")
    return df


def write_corpus(df: DataFrame, location: str, mode: str = "overwrite") -> None:
    if "/" not in location and iceberg_available(df.sparkSession):
        df.writeTo(location).createOrReplace()
    else:
        df.write.mode(mode).parquet(location)
