"""Central registry of (spark callable, DuckDB oracle SQL | None) pairs.

The driver contract (`__spark_entry__.py`) exposes these; tests run both
sides at sf0.001/sf0.01 and compare.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: Dict[str, Tuple[QueryFn, Optional[str]]] = {}


def _register_all() -> None:
    from calamari_spark.plans.relational import RELATIONAL_QUERIES
    from calamari_spark.plans.textplans import TEXT_QUERIES
    from calamari_spark.plans.annplans import ANN_QUERIES
    from calamari_spark.plans.dedup import DEDUP_QUERIES

    for group in (RELATIONAL_QUERIES, TEXT_QUERIES, ANN_QUERIES, DEDUP_QUERIES):
        QUERIES.update(group)

    from calamari_spark.plans.extraction import EXTRACTION_QUERIES
    from calamari_spark.plans.mediaplans import MEDIA_QUERIES
    from calamari_spark.plans.evalplans import EVAL_QUERIES
    from calamari_spark.functions.udxf import UDXF_QUERIES

    QUERIES.update(EXTRACTION_QUERIES)
    QUERIES.update(MEDIA_QUERIES)
    QUERIES.update(EVAL_QUERIES)
    QUERIES.update(UDXF_QUERIES)


_register_all()


def spark_queries() -> Dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sqls() -> Dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
