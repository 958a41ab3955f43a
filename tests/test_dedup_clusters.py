"""Connected-components keeper assignment over near-dup candidate pairs."""

from pyspark.sql import functions as F

from calamari_spark.plans.dedup import connected_components


def _resolve(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = connected_components(df).orderBy("doc_id").collect()
    return {r["doc_id"]: r["keeper"] for r in rows}


def test_transitive_cluster_resolves_to_one_keeper(spark):
    # A-B and B-C: all three must land on keeper A even though (A, C) was
    # never emitted as a pair
    got = _resolve(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_disjoint_clusters_keep_separate_keepers(spark):
    got = _resolve(spark, [(5, 9), (20, 30), (30, 25)])
    assert got == {5: 5, 9: 5, 20: 20, 25: 20, 30: 20}


def test_long_chain_converges(spark):
    # a path graph exercises multi-round label propagation (diameter > 1)
    chain = [(i, i + 1) for i in range(10, 20)]
    got = _resolve(spark, chain)
    assert set(got.values()) == {10}
    assert len(got) == 11


def test_cluster_query_marks_duplicates(spark):
    from calamari_spark.plans.dedup import q_dedup_clusters

    rows = q_dedup_clusters(spark, "/root/testdata/sf0.001").collect()
    assert all(r["is_duplicate"] == (r["doc_id"] != r["keeper"]) for r in rows)
    # every keeper is the min of its cluster
    by_keeper = {}
    for r in rows:
        by_keeper.setdefault(r["keeper"], []).append(r["doc_id"])
    for keeper, members in by_keeper.items():
        assert keeper == min(members)
