from calamari_spark.sources.tables import load_table, register_views, TABLES  # noqa: F401
