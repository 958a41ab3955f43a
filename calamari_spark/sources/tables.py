"""Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).

At cluster scale these would be Iceberg tables (`spark.read.table`); the
sandbox substitutes flat parquet files per scale factor. Filters/projections
on these scans push down to parquet (verified in tests via explain()).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# inferred parquet SCHEMAS per (application, path). Schema inference runs a
# one-task Spark job per spark.read.parquet() call — measured 110-170 ms of
# driver latency per table load at bench SFs, paid by EVERY query for files
# whose schema is fixed for the life of the session. A catalog/Iceberg
# table carries its schema in metadata and skips that job; this cache is
# the flat-parquet analog. It memoizes METADATA only — never data, plans
# or results: every query still lists and scans the parquet files on every
# run (a new file in the directory is picked up; only a schema CHANGE
# within one application would need a new session, which none of the
# fixed-layout tables here ever does).
_SCHEMA_CACHE: dict = {}


def read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, os.path.abspath(path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
