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


def test_neardup_bits_scales_with_corpus():
    """Band width ~log2(n): attestation SFs resolve to the oracle's fixed
    8 bits; larger corpora widen so expected bucket occupancy stays O(1)
    (the property that keeps banded candidate generation linear)."""
    from calamari_spark.plans.annplans import neardup_bits

    assert neardup_bits(500) == 8       # sf0.001 / sf0.01 (oracle scheme)
    assert neardup_bits(1) == 8
    assert neardup_bits(2000) == 9      # sf0.1
    assert neardup_bits(10_000) == 12   # the 5x datascale corpus
    assert neardup_bits(1_000_000) == 18
    # occupancy n / 2^bits stays bounded (~4) as n grows
    for n in (10_000, 10**6, 10**9):
        assert n / 2 ** neardup_bits(n) <= 4.01


def test_oracle_band_width_formula_matches_python():
    """The oracle computes bits from count(*) in SQL; it must agree with
    neardup_bits for every corpus size the oracle's 16-bit pool covers —
    this is what keeps q_embedding_neardup_lsh engine-parity valid at
    SFs beyond the 8-bit floor (e.g. sf0.1's 2000 vectors -> 9 bits)."""
    import duckdb

    from calamari_spark.plans.annplans import (
        NEARDUP_LSH_BITS,
        NEARDUP_ORACLE_BITS_MAX,
        neardup_bits,
    )

    sql = (
        f"SELECT n, least({NEARDUP_ORACLE_BITS_MAX}, greatest({NEARDUP_LSH_BITS}, "
        f"cast(ceil(log2(n)) AS INT) - 2)) AS bits "
        "FROM (SELECT unnest(?) AS n)"
    )
    ns = [1, 2, 500, 1024, 1025, 2000, 2048, 10_000, 100_000, 2**18]
    got = dict(duckdb.sql(sql, params=[ns]).fetchall())
    for n in ns:
        assert got[n] == min(NEARDUP_ORACLE_BITS_MAX, neardup_bits(max(n, 2)))


def test_hyperplane_pool_is_prefix_stable_per_band():
    """Band b's first r planes must not depend on the requested width —
    the contract that lets the oracle embed the full 16-bit pool and
    slice, while Spark generates exactly `bits` planes per band."""
    import numpy as np

    from calamari_spark.plans.annplans import NEARDUP_LSH_BANDS, _hyperplanes

    h8, h12 = _hyperplanes(8), _hyperplanes(12)
    for b in range(NEARDUP_LSH_BANDS):
        np.testing.assert_array_equal(h8[b * 8:(b + 1) * 8], h12[b * 12:b * 12 + 8])
