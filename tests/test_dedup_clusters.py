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


def test_hot_bucket_star_reduction_preserves_clusters(spark):
    """A 1000-copy duplicate cluster: with the HOT_BUCKET_CAP guard the
    band-bucket join emits star pairs (999 edges) instead of ~500k, and the
    resolved clusters are IDENTICAL to the uncapped full join."""
    from calamari_spark.plans.dedup import minhash_pairs

    texts = [("doc_%06d" % i, "copy copy copy of the same boilerplate page body text")
             for i in range(1000)]
    texts += [("zzz_%03d" % i, f"unique document number {i} with its own words entirely")
              for i in range(5)]
    docs = spark.createDataFrame(texts, "doc_id string, text string")

    capped = minhash_pairs(docs, cap=64).select("doc_a", "doc_b")
    n_capped = capped.count()
    # star reduction: the 1000-clique collapses to 999 edges (one per band,
    # distinct-merged), far below the ~499k of the full self-join
    assert n_capped <= 2000, n_capped

    cc_capped = {r["doc_id"]: r["keeper"] for r in connected_components(capped).collect()}
    full = minhash_pairs(docs, cap=10**9).select("doc_a", "doc_b")
    cc_full = {r["doc_id"]: r["keeper"] for r in connected_components(full).collect()}
    assert cc_capped == cc_full
    assert sum(1 for k in cc_capped.values() if k == "doc_000000") == 1000


def test_durable_materialize_backends_match_local(spark, tmp_path, monkeypatch):
    """The production substitution for localCheckpoint made real: the same
    CC/dedup query must return identical results under the fault-tolerant
    checkpoint() backend and the write-before-reuse parquet backend."""
    from calamari_spark.plans.common import BACKEND_ENV, DURABLE_DIR_ENV
    from calamari_spark.plans.dedup import q_dedup_clusters

    sf = "/root/testdata/sf0.001"
    base = sorted(map(tuple, q_dedup_clusters(spark, sf).collect()))
    monkeypatch.setenv(DURABLE_DIR_ENV, str(tmp_path))
    for backend in ("reliable", "parquet"):
        monkeypatch.setenv(BACKEND_ENV, backend)
        got = sorted(map(tuple, q_dedup_clusters(spark, sf).collect()))
        assert got == base, backend
    # durable intermediates actually landed on the configured storage
    assert any(tmp_path.iterdir())


def test_materialize_rejects_unknown_backend(spark):
    import pandas as pd

    from calamari_spark.plans.common import materialize

    df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="backend"):
        materialize(df, backend="ram")
