"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
its DuckDB oracle (column names aligned on both sides).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end interleaved-document extraction on a
    deterministic synthetic corpus (text spans boilerplate-stripped, media
    spans OCR'd, span sequence reassembled in order); falls back to the
    pricing-summary aggregation until the extraction pipeline lands."""
    try:
        from calamari_spark.plans.extraction import flagship_extraction

        return flagship_extraction(spark, "/root/testdata/sf0.001")
    except ImportError:
        from calamari_spark.plans.relational import q1_pricing_summary

        return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from calamari_spark.plans.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from calamari_spark.plans.registry import oracle_sqls

    return oracle_sqls()
