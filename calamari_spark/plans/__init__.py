from calamari_spark.plans.registry import QUERIES, spark_queries, oracle_sqls  # noqa: F401
