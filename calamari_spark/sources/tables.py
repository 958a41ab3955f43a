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


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
