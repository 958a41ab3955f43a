"""Semantics tests for the round-5 graph/pipeline additions: PageRank,
incremental (cross-snapshot) dedup, mixture sampling. Cross-engine value
parity is covered by test_oracle_parity.py (these are SHADOW queries); here
we pin the properties parity alone cannot see."""

import pytest
from pyspark.sql import functions as F

from calamari_spark.plans.graphplans import (
    PR_HUBS,
    PR_ITERS,
    PR_SCALE,
    PR_TOP_N,
    pagerank,
    q_pagerank,
)
from calamari_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_mass_conserved_up_to_floor_loss(spark):
    """Integer floors only ever LOSE mass, at most ~2 units per node per
    round (one from rank DIV outd, one from the damping DIV) — total mass
    must stay within that envelope of SCALE, or the iteration is wrong."""
    docs = load_table(spark, "documents", SF)
    n = docs.count()
    total = pagerank(docs).agg(F.sum("rank")).collect()[0][0]
    max_loss = PR_ITERS * (3 * n + 20)  # generous floor-loss envelope
    assert PR_SCALE - max_loss <= total <= PR_SCALE


def test_pagerank_hubs_dominate(spark):
    """Every d % 3 == 0 page links to hub d % 10, so the ten hubs collect
    ~N/30 inlinks each and must rank above the generic pages (a regular
    graph would converge to a uniform — meaningless — vector; this pins
    that the derived graph actually differentiates)."""
    top = q_pagerank(spark, SF).toPandas()
    assert len(top) == PR_TOP_N
    assert set(range(PR_HUBS)) <= set(top["doc_id"])
    uniform = PR_SCALE // 500
    assert top["pagerank_e12"].min() > uniform  # top-25 all above uniform


def test_pagerank_every_node_has_an_inlink(spark):
    """The oracle's recursive term is a plain join + GROUP BY(dst) — it can
    only emit nodes that HAVE an inbound edge. The predecessor edge
    (d -> d+1 mod N) guarantees full coverage; if the graph derivation
    ever loses it, ranks would silently drop nodes on BOTH engines and
    parity could not catch it."""
    docs = load_table(spark, "documents", SF)
    n = docs.count()
    ranks = pagerank(docs, iters=1)
    assert ranks.count() == n
    assert ranks.select("node").distinct().count() == n


def test_pagerank_power_iteration_converged(spark):
    """By PR_ITERS rounds the rank vector must be stable: two extra rounds
    move no node by more than 0.1% of total mass (otherwise the fixed
    iteration count is reporting a transient, not the stationary rank)."""
    docs = load_table(spark, "documents", SF)
    a = pagerank(docs, iters=PR_ITERS).withColumnRenamed("rank", "ra")
    b = pagerank(docs, iters=PR_ITERS + 2).withColumnRenamed("rank", "rb")
    max_delta = (
        a.join(b, "node")
        .agg(F.max(F.abs(F.col("ra") - F.col("rb"))))
        .collect()[0][0]
    )
    assert max_delta < PR_SCALE // 1000


def test_pagerank_edges_exchange_once_not_per_round(spark):
    """The edge table is hash-partitioned on src and persisted BEFORE the
    rounds; each round's join must reuse that in-memory layout (only the
    rank side + the groupBy exchange per round). Broadcast is disabled so
    the test sees the at-scale sort-merge path, where the reuse matters."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = load_table(spark, "documents", SF)
        n = docs.count()
        nodes = docs.select(F.col("doc_id").alias("node"))
        edges = (
            nodes.select(
                F.col("node").alias("src"),
                F.lit(1).alias("outd"),
                F.pmod(F.col("node") + 1, F.lit(n)).alias("dst"),
            )
            .repartition(F.col("src"))
            .persist()
        )
        edges.count()
        ranks = nodes.select(F.col("node").alias("src"), F.lit(10).alias("rank"))
        one_round = edges.join(ranks, "src").groupBy("dst").agg(F.sum("rank").alias("s"))
        plan = one_round._jdf.queryExecution().executedPlan().toString()
        edges.unpersist()
        assert "InMemoryTableScan" in plan
        # per-round exchanges: ranks side + aggregation. The edge side's
        # REPARTITION_BY_COL lives inside the cached plan (paid once).
        assert plan.count("ENSURE_REQUIREMENTS") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# Incremental dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_recrawls_are_exact(spark):
    from calamari_spark.plans.dedup import (
        INCR_RECRAWL_MOD,
        INCR_WAVE_MOD,
        q_incremental_dedup,
    )

    out = q_incremental_dedup(spark, SF).toPandas()
    docs_n = load_table(spark, "documents", SF).count()
    assert len(out) == len(range(0, docs_n, INCR_WAVE_MOD))
    assert set(out["status"]) <= {"exact", "near", "fresh"}
    # every synthesized unchanged-page recrawl must classify exact
    recrawls = out[out["doc_id"] % INCR_RECRAWL_MOD == 0]
    assert len(recrawls) > 0
    assert (recrawls["status"] == "exact").all()
    # and the wave must NOT be all-exact (fresh path attested too)
    assert (out["status"] == "fresh").any()


def test_incremental_dedup_probes_broadcast_the_wave(spark):
    """The standing snapshot is the 10^12-row side: both membership probes
    must be map-side broadcast joins (the wave's distinct keys build side),
    never a sort-merge that shuffles the snapshot."""
    from calamari_spark.plans.dedup import q_incremental_dedup

    plan = (
        q_incremental_dedup(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # 2 fingerprint probes + 2 band probes, all hinted broadcast
    assert plan.count("BroadcastHashJoin") >= 4


# ---------------------------------------------------------------------------
# Mixture sampling
# ---------------------------------------------------------------------------


def test_mixture_sample_rates_are_thresholds(spark):
    from calamari_spark.plans.pipelineplans import (
        MIX_RATES_BP,
        q_mixture_sample,
    )

    out = q_mixture_sample(spark, SF).toPandas().set_index("lang")
    # rate 10000 = keep everything: exact, not statistical
    assert out.loc["en", "n_kept"] == out.loc["en", "n_docs"]
    # every other language keeps a strict, non-empty subset at this SF
    for lang, bp in MIX_RATES_BP.items():
        row = out.loc[lang]
        assert row["rate_bp"] == bp
        assert 0 <= row["n_kept"] <= row["n_docs"]
        if bp < 10000:
            assert row["n_kept"] < row["n_docs"]
    # kept_chars can never exceed the language's total characters
    docs = load_table(spark, "documents", SF)
    totals = (
        docs.groupBy("lang").agg(F.sum("n_chars").alias("total")).toPandas().set_index("lang")
    )
    for lang in out.index:
        assert out.loc[lang, "kept_chars"] <= totals.loc[lang, "total"]
