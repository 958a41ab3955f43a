"""The 5x data-scale dataset synthesis (bench_datascale): determinism,
referential integrity within each copy, and decorrelation across copies
(replicas must not be near-duplicates, or the scaling measurement would
charge the engine for a quadratic corpus artifact)."""

import pytest
from pyspark.sql import functions as F

from calamari_spark.plans.bench_datascale import KEY_OFFSET, make_scaled_dir

BASE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("datascale") / "sf_x3")
    return make_scaled_dir(spark, BASE, factor=3, out=out)


def test_row_counts_scale_by_factor_with_fixed_dims(spark, scaled):
    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        base_n = spark.read.parquet(f"{BASE}/{t}.parquet").count()
        assert spark.read.parquet(f"{scaled}/{t}.parquet").count() == 3 * base_n
    for t in ("region", "nation"):
        base_n = spark.read.parquet(f"{BASE}/{t}.parquet").count()
        assert spark.read.parquet(f"{scaled}/{t}.parquet").count() == base_n


def test_referential_integrity_within_each_copy(spark, scaled):
    orders = spark.read.parquet(f"{scaled}/orders.parquet")
    cust = spark.read.parquet(f"{scaled}/customer.parquet")
    dangling = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).count()
    assert dangling == 0
    li = spark.read.parquet(f"{scaled}/lineitem.parquet")
    assert li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").count() == 0


def test_copies_are_decorrelated_not_duplicates(spark, scaled):
    docs = spark.read.parquet(f"{scaled}/documents.parquet")
    base_docs = spark.read.parquet(f"{BASE}/documents.parquet")
    # copy 1 of a document: same id mod offset, text alphabet-rotated —
    # never equal to the base text unless the text has no letters at all
    joined = (
        docs.filter(F.col("doc_id") >= KEY_OFFSET)
        .filter(F.col("doc_id") < 2 * KEY_OFFSET)
        .withColumn("base_id", F.col("doc_id") - KEY_OFFSET)
        .alias("c")
        .join(base_docs.alias("b"), F.col("c.base_id") == F.col("b.doc_id"))
    )
    n_pairs = joined.count()
    n_same = joined.filter(F.col("c.text") == F.col("b.text")).count()
    n_letterless = joined.filter(
        ~F.col("b.text").rlike("[a-z]")
    ).count()
    assert n_pairs == base_docs.count()
    assert n_same == n_letterless  # rotation changed every letterful text
    # embeddings keep their norm but flip signs: same magnitude per slot
    emb = spark.read.parquet(f"{scaled}/embeddings.parquet")
    base_emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    j = (
        emb.filter((F.col("vec_id") >= KEY_OFFSET) & (F.col("vec_id") < 2 * KEY_OFFSET))
        .withColumn("base_id", F.col("vec_id") - KEY_OFFSET)
        .alias("c")
        .join(base_emb.alias("b"), F.col("c.base_id") == F.col("b.vec_id"))
        .select(
            F.max(
                F.aggregate(
                    F.zip_with(
                        "c.embedding", "b.embedding",
                        lambda a, b_: F.abs(F.abs(a) - F.abs(b_)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("max_absdiff"),
            F.sum(
                (
                    F.aggregate(
                        F.zip_with(
                            "c.embedding", "b.embedding", lambda a, b_: F.abs(a - b_)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    > 1e-9
                ).cast("int")
            ).alias("n_flipped"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert j["max_absdiff"] < 1e-5  # magnitudes preserved
    assert j["n_flipped"] == j["n"]  # every (non-degenerate) vector changed


def test_rematerialization_is_value_identical(spark, scaled, tmp_path):
    again = make_scaled_dir(spark, BASE, factor=3, out=str(tmp_path / "x3b"))
    a = spark.read.parquet(f"{scaled}/documents.parquet")
    b = spark.read.parquet(f"{again}/documents.parquet")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
