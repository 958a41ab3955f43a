"""Every registered query — including rows-only ones — must run and return
a stable schema (the driver executes all of them)."""

import pytest

from calamari_spark.plans.registry import QUERIES

ROWS_ONLY = sorted(name for name, (_, sql) in QUERIES.items() if sql is None)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    fn, _ = QUERIES[name]
    sf = "/root/testdata/sf0.001"
    df = fn(spark, sf)
    assert df.schema.fields
    assert df.count() >= 0
    # deterministic across runs (driver may re-run; retries must agree)
    a = [tuple(str(v) for v in r) for r in df.limit(20).collect()]
    b = [tuple(str(v) for v in r) for r in fn(spark, sf).limit(20).collect()]
    assert a == b
