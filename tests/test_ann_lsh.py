"""LSH embedding near-dup: candidate soundness vs the brute-force truth."""

from pyspark.sql import functions as F

from calamari_spark.plans.annplans import (
    NEARDUP_THRESHOLD,
    _dot,
    _norm,
    q_embedding_neardup_lsh,
)
from calamari_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _brute_pairs(spark):
    emb = load_table(spark, "embeddings", SF)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6),
        )
        .filter(F.col("cosine") >= NEARDUP_THRESHOLD)
        .select("id_a", "id_b", "cosine")
    )


def test_lsh_pairs_are_a_subset_of_brute_force_with_equal_scores(spark):
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in q_embedding_neardup_lsh(spark, SF).collect()}
    truth = {(r["id_a"], r["id_b"]): r["cosine"] for r in _brute_pairs(spark).collect()}
    assert lsh, "LSH must surface pairs at the driver's SF"
    # soundness: every LSH pair is a true pair with the identical score
    for k, v in lsh.items():
        assert k in truth and truth[k] == v
    # recall: the banded scheme finds a meaningful fraction (not ~0)
    recall = len(lsh) / len(truth)
    assert recall >= 0.1, f"recall {recall:.2f} of {len(truth)} true pairs"
