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


def _resolve_star(spark, pairs, max_iter=50, stats=None):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = connected_components(df, max_iter=max_iter, algorithm="star",
                                stats=stats).collect()
    return {r["doc_id"]: r["keeper"] for r in rows}


def test_star_matches_minlabel_on_basic_graphs(spark):
    for pairs in ([(1, 2), (2, 3)], [(5, 9), (20, 30), (30, 25)],
                  [(7, 3), (3, 7)], [(2, 1)]):
        assert _resolve_star(spark, pairs) == _resolve(spark, pairs)


def test_star_matches_minlabel_on_random_graphs(spark):
    import random

    rng = random.Random(20260817)
    for trial in range(3):
        n = 60
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _resolve_star(spark, pairs) == _resolve(spark, pairs), trial


def test_star_converges_in_log_rounds_on_a_path(spark):
    """The scale claim made checkable: a 200-node duplicate CHAIN (the
    templated-pagination crawl artifact) costs min-label propagation
    ~diameter rounds — it RAISES at max_iter=25 pointing at star — while
    large-star/small-star contracts it in O(log n) rounds."""
    import math

    import pytest as _pytest

    chain = [(i, i + 1) for i in range(200)]
    stats = {}
    got = _resolve_star(spark, chain, stats=stats)
    assert set(got.values()) == {0} and len(got) == 201
    assert stats["rounds"] <= 2 * math.log2(201) + 4, stats["rounds"]

    with _pytest.raises(RuntimeError, match="star"):
        _resolve(spark, chain)  # minlabel: diameter 200 > max_iter 25


def test_star_preserves_hot_bucket_star_reduction_clusters(spark):
    from calamari_spark.plans.dedup import minhash_pairs

    texts = [("doc_%06d" % i, "copy copy copy of the same boilerplate page body text")
             for i in range(1000)]
    texts += [("zzz_%03d" % i, f"unique document number {i} with its own words entirely")
              for i in range(5)]
    docs = spark.createDataFrame(texts, "doc_id string, text string")
    capped = minhash_pairs(docs, cap=64).select("doc_a", "doc_b")
    star = {r["doc_id"]: r["keeper"]
            for r in connected_components(capped, algorithm="star").collect()}
    minlabel = {r["doc_id"]: r["keeper"]
                for r in connected_components(capped).collect()}
    assert star == minlabel
    assert sum(1 for k in star.values() if k == "doc_000000") == 1000


def test_cc_rejects_unknown_algorithm(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with _pytest.raises(ValueError, match="algorithm"):
        connected_components(df, algorithm="bfs")


def test_parquet_backend_releases_superseded_cc_rounds(spark, tmp_path, monkeypatch):
    """Round-4 ADVICE: under backend=parquet every CC round used to leak one
    uuid-named corpus-sized table. Now superseded rounds are deleted as the
    loop advances; at most the FINAL round's table (still referenced by the
    returned frame) plus the handful of single-shot materializes survive,
    and sweep_materialize_scratch clears those at session end."""
    from calamari_spark.plans.common import (
        BACKEND_ENV,
        DURABLE_DIR_ENV,
        sweep_materialize_scratch,
    )

    monkeypatch.setenv(DURABLE_DIR_ENV, str(tmp_path))
    monkeypatch.setenv(BACKEND_ENV, "parquet")
    chain = [(i, i + 1) for i in range(12)]  # diameter forces many rounds
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    stats = {}
    out = connected_components(df, stats=stats)
    out.collect()
    mats = [p for p in tmp_path.iterdir() if p.name.startswith("mat-")]
    # rounds >= 6; without release this would be ~2 tables per round.
    # Survivors: the final labels table + nothing else from the loop.
    assert stats["rounds"] >= 6
    assert len(mats) <= 2, (stats["rounds"], len(mats))
    swept = sweep_materialize_scratch(spark)
    assert swept == len(mats)
    assert not [p for p in tmp_path.iterdir() if p.name.startswith("mat-")]


def test_cc_release_never_touches_foreign_checkpoints(spark):
    """Round-4 ADVICE: ownership used to be inferred from a global
    getPersistentRDDs() diff, which could attribute a CONCURRENT query's
    localCheckpoint to the CC loop and unpersist it (fatal: no lineage
    fallback). Ownership now comes from the returned frame's own LogicalRDD.
    Simulate the interleaving: a foreign frame checkpointed before/while CC
    runs must still be fully readable afterwards."""
    foreign = spark.range(1000).withColumn("v", F.col("id") * 2).localCheckpoint()
    df = spark.createDataFrame([(i, i + 1) for i in range(8)],
                               "doc_a long, doc_b long")
    connected_components(df).collect()
    connected_components(df, algorithm="star").collect()
    assert foreign.count() == 1000
    assert foreign.agg(F.sum("v")).first()[0] == 999 * 1000


def test_star_two_parent_regression(spark):
    """Review-caught convergence bug: this graph reaches the no-chains
    state {(5,1),(7,1),(3,1),(5,2),(8,2),(4,2)} after one round — node 5
    has TWO parents, bridging roots 1 and 2 — and the old star-forest test
    (chains only) declared convergence there, splitting one component into
    clusters 1 and 2 and emitting node 5 twice. The check now also
    requires the edge set to be a function (one parent per node)."""
    pairs = [(5, 7), (5, 8), (3, 7), (1, 3), (4, 8), (2, 4)]
    star = _resolve_star(spark, pairs)
    assert star == _resolve(spark, pairs)
    assert set(star.values()) == {1}  # one component, min root


def test_star_matches_minlabel_on_sparse_random_graphs(spark):
    """Sparse graphs (|E| ~ |V|) hit the two-parent no-chain intermediate
    state far more often than the dense trials above (~2.3% of small
    random graphs under the old check)."""
    import random

    rng = random.Random(31337)
    for trial in range(6):
        n = rng.choice([10, 16, 24])
        m = int(n * rng.uniform(0.7, 1.2))
        pairs = list({
            (a, b)
            for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(m))
            if a != b
        })
        if not pairs:
            continue
        assert _resolve_star(spark, pairs) == _resolve(spark, pairs), (trial, pairs)


def test_sweep_spares_fresh_foreign_scratch(spark, tmp_path, monkeypatch):
    """Review-caught hazard: the end-of-job sweep used to delete EVERY
    mat-* dir under the shared durable root, including a concurrently
    running job's live intermediates. Now a foreign dir survives until the
    24h TTL; this job's own dirs and aged foreign dirs are removed."""
    import os as _os

    from calamari_spark.plans.common import (
        DURABLE_DIR_ENV,
        sweep_materialize_scratch,
    )

    monkeypatch.setenv(DURABLE_DIR_ENV, str(tmp_path))
    fresh = tmp_path / "mat-other_app_123-deadbeef"
    fresh.mkdir()
    aged = tmp_path / "mat-other_app_456-cafef00d"
    aged.mkdir()
    two_days_ago = __import__("time").time() - 2 * 24 * 3600
    _os.utime(aged, (two_days_ago, two_days_ago))
    own = tmp_path / (
        "mat-" + spark.sparkContext.applicationId.replace("-", "_") + "-ab12"
    )
    own.mkdir()

    removed = sweep_materialize_scratch(spark)
    assert removed == 2  # own + aged foreign
    assert fresh.exists() and not aged.exists() and not own.exists()


def test_exact_substring_detects_misaligned_spans(spark, tmp_path):
    """Regression: a verbatim span repeated at DIFFERENT offsets mod STRIDE
    in two documents must still be detected. The first-cut doc-aligned
    fixed-stride windows missed exactly this (64- vs 70-char prefixes put
    the same span on different 32-char grids -> zero shared windows);
    content-defined anchors fire at the same positions INSIDE the span
    regardless of the surrounding offset."""
    import random

    from calamari_spark.plans.dedup import q_exact_substring

    rng = random.Random(7)

    def salad(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))

    span = salad(400)  # long enough that an anchor inside is ~certain
    rows = [
        (0, salad(64) + span, "en", "synth", 464),
        (1, salad(70) + span, "en", "synth", 470),  # offset differs mod 32
        (2, salad(500), "en", "synth", 500),  # control: no shared span
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in q_exact_substring(spark, str(tmp_path)).collect()
    }
    assert out[0]["n_dup_windows"] > 0, "span at offset 64 not detected"
    assert out[1]["n_dup_windows"] > 0, "span at offset 70 not detected"
    assert out[2]["n_dup_windows"] == 0, "control doc false positive"
