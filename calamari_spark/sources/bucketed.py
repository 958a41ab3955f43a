"""Bucketed-table helpers: the co-located-join layout for 100 TB joins.

At scale, the documents/media join in the extraction pipeline (and any
fact-fact join) should read from tables bucketed on the join key: both
sides hash-partition into the same N buckets at WRITE time, so the join
needs no shuffle at READ time — the single biggest exchange in the
pipeline disappears. This is the parquet/Hive-bucketing analog of the
Iceberg `bucket(N, key)` partition transform named in SURVEY §4.

Local tests register the tables in the in-memory catalog with an explicit
external path; on a cluster the same code targets the metastore/Iceberg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, path: str, key: str,
                   n_buckets: int = 8) -> None:
    """Write ``df`` as a bucketed+sorted external table on ``key``."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
