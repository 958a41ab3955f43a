"""Run every oracle-able query on Spark and DuckDB at sf0.001 and compare
row counts + sorted values — a local replica of the driver's correctness
gate so mismatches surface before the round ends."""

import math

import duckdb
import pytest

from calamari_spark.plans.registry import QUERIES
from calamari_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

ORACLED = sorted(name for name, (_, sql) in QUERIES.items() if sql is not None)


def _duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = f"{v:.6f}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    # extraction oracles embed the committed sf0.01 fixture path (the SF the
    # driver runs oracles at), so their Spark side must run at sf0.01 too
    sf_dir = "/root/testdata/sf0.01" if name.startswith("x_") else SF_DIR
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
