"""Link-graph analytics over the corpus: fixed-point PageRank.

The reference engine has no graph surface (Calamari stops at line-level
OCR); this is a training-data-pipeline extension — the standard quality
prior for web corpora is a link-graph centrality score (PageRank over the
crawl's domain/page graph), used to weight or threshold documents before
training.

The corpus has no link table, so the graph is DERIVED deterministically
from the contiguous doc_id space (TESTDATA: doc_id = 0..N-1 at every SF):
page d links to (d+1) % N always, to (7d+1) % N when d is even, and to the
hub page d % 10 when d % 3 == 0. Out-degree varies 1..3 (a closed-form
per-row expression — no out-degree join) and the ten hub pages collect
~N/30 inlinks each, so the stationary ranks genuinely differentiate: a
regular graph would converge to the uniform vector and attest nothing
beyond the iteration plumbing. Every page keeps an inlink (its
predecessor), so the iteration's groupBy(dst) covers all N nodes every
round — which is what lets the oracle's recursive term be a plain
join+GROUP BY with no outer-join-to-nodes step (a recursive CTE may
reference itself only once). Page 0 carries a self-loop (0 % 10 == 0);
both engines treat it as an ordinary edge.

Why fixed-point (integer) arithmetic: float PageRank is NOT cross-engine
reproducible — the per-node inbound sum is order-dependent in the last
ulp, and Spark's shuffle order differs from DuckDB's scan order, so a
float64 pipeline hash-mismatches its own oracle nondeterministically.
Ranks are therefore BIGINT micro-units (SCALE = 1e12): integer sums are
associative-exact, and damping 0.85 is the exact ratio 17/20 applied with
integer division. Both engines floor at the same two points, so the
result is bit-identical by construction, and the quantization error
(<= N * 1 unit per round) is ~1e-9 of total mass — far below any ranking
use. The driver-hash-stable output is the top-25 pages by rank.

Scale shape (the 100 TB story): per iteration ONE shuffle join
(edges x ranks on src — edges are materialized once, carrying each source's
out-degree as a column, and reused across all K rounds) plus one
partial-aggregated groupBy(dst); the contribution rank DIV out_deg is a
per-row map.
Superseded rounds release their storage through the same tracked
materialize handles the connected-components loop uses (dedup.py), so the
loop holds exactly two rank tables at any moment under every backend.

Oracle: DuckDB >= 1.0 supports aggregation in the recursive term of a
recursive CTE, so the ENTIRE K-round iteration runs as one SQL statement —
a genuine cross-engine check of an iterative graph algorithm, not a
golden fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calamari_spark.plans.common import materialize_tracked, release_materialized
from calamari_spark.sources.tables import load_table

PR_SCALE = 10**12        # rank unit: 1e-12 of total mass
PR_ITERS = 8             # fixed rounds (power iteration; diff < 1e-3 by 8)
PR_DAMP_NUM, PR_DAMP_DEN = 17, 20   # damping 0.85 as an exact ratio
PR_HUBS = 10             # pages 0..9 are hubs (every d % 3 == 0 links in)
PR_TOP_N = 25


def pagerank(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """(node, rank) after `iters` fixed-point power-iteration rounds over
    the derived link graph. rank is BIGINT in units of 1e-12."""
    spark = docs.sparkSession
    n = docs.count()  # driver-side scalar (like the CC round counter)
    init = PR_SCALE // n
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN // n

    nodes = docs.select(F.col("doc_id").alias("node"))
    node = F.col("node")
    # null-out conditional edges, drop them with array_compact: out-degree
    # is the compacted size, attached to every edge row so the per-round
    # contribution needs no out-degree join
    dsts = F.array_compact(
        F.array(
            F.pmod(node + 1, F.lit(n)),
            F.when(node % 2 == 0, F.pmod(node * 7 + 1, F.lit(n))),
            F.when(node % 3 == 0, F.pmod(node, F.lit(PR_HUBS))),
        )
    )
    # Edges are referenced once per round. persist() — NOT materialize()'s
    # localCheckpoint — because InMemoryRelation preserves the
    # outputPartitioning while a checkpoint's LogicalRDD does not
    # (measured: the join re-exchanged a checkpointed-and-repartitioned
    # edge table every round; the persisted one is exchanged ONCE at cache
    # build). With edges hash-partitioned on src, each of the K rounds
    # shuffles only the rank table + the groupBy — the edge corpus (the
    # big side: 3 rows/node) stays put. Lineage survives persist, so a
    # lost executor recomputes the cheap derivation instead of failing.
    edges = (
        nodes.select(
            F.col("node").alias("src"),
            F.size(dsts).alias("outd"),
            F.explode(dsts).alias("dst"),
        )
        .repartition(F.col("src"))
        .persist()
    )
    edges.count()  # eager: pay the one-time exchange outside the rounds
    ranks, own_prev = materialize_tracked(
        nodes.withColumn("rank", F.lit(init).cast("long"))
    )
    try:
        for k in range(iters):
            new_ranks = (
                edges.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
                .groupBy("dst")
                # integer contribution sum is order-independent (exactness
                # across engines); out-degree rides on the edge row
                .agg(F.sum(F.expr("rank DIV outd")).alias("s"))
                .select(
                    F.col("dst").alias("node"),
                    (
                        F.lit(base)
                        + F.expr(f"({PR_DAMP_NUM} * s) DIV {PR_DAMP_DEN}")
                    ).cast("long").alias("rank"),
                )
            )
            # r6: intermediate rounds chain LAZILY; only the final round
            # is materialized, so the whole fixed-K iteration executes as
            # ONE job of K chained join+groupBy stages (r5 materialized
            # every round, r6.0 every second round — A/B at sf0.1:
            # 2.50 s -> 2.15 s min going from every-2nd to final-only,
            # with the per-round driver job latency gone). Safe here
            # because K is a small FIXED constant (no convergence action
            # mid-loop, unlike connected_components), integer arithmetic
            # makes the values identical under any grouping, each
            # intermediate is referenced exactly once (nothing recomputes),
            # and stage-level shuffle-file recovery covers executor loss
            # inside the job. Storage discipline improves: no intermediate
            # rank table is ever pinned — only the returned final table.
            if k == iters - 1:
                mat, own_new = materialize_tracked(new_ranks)
                # previous checkpoint is dead weight from here
                # (see _cc_minlabel)
                release_materialized(spark, own_prev)
                ranks, own_prev = mat, own_new
            else:
                ranks = new_ranks
        return ranks
        # the FINAL round's handle stays live — the returned frame is backed
        # by it; bench/job-level sweeps reclaim it (same policy as CC labels)
    finally:
        edges.unpersist()


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank(load_table(spark, "documents", sf_dir))
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(PR_TOP_N)
        .select(F.col("node").alias("doc_id"), F.col("rank").alias("pagerank_e12"))
    )


# DuckDB mirror: the same K rounds as one recursive CTE. `meta.n` is the
# SQL analog of the driver-side count; `// ` is DuckDB integer division
# (floor == trunc here: every operand is positive). The recursive term's
# HUGEINT arithmetic is cast back to BIGINT so the CTE's column type (fixed
# by the initial SELECT) never narrows implicitly.
Q_PAGERANK_SQL = f"""
WITH RECURSIVE
meta AS (SELECT count(*) AS n FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
nd AS (
  SELECT node,
         1 + CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END
           + CASE WHEN node % 3 = 0 THEN 1 ELSE 0 END AS outd
  FROM nodes
),
edges AS (
  SELECT node AS src, outd, (node + 1) % n AS dst FROM nd, meta
  UNION ALL
  SELECT node, outd, (node * 7 + 1) % n FROM nd, meta WHERE node % 2 = 0
  UNION ALL
  SELECT node, outd, node % {PR_HUBS} FROM nd WHERE node % 3 = 0
),
pr AS (
  SELECT 0 AS iter, node, CAST({PR_SCALE} // n AS BIGINT) AS rank
  FROM nodes, meta
  UNION ALL
  SELECT iter + 1, dst AS node,
         CAST(({(PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN} // m.n)
              + ({PR_DAMP_NUM} * sum(rank // outd)) // {PR_DAMP_DEN}
              AS BIGINT) AS rank
  FROM pr JOIN edges ON pr.node = edges.src CROSS JOIN meta m
  WHERE iter < {PR_ITERS}
  GROUP BY iter + 1, dst, m.n
)
SELECT node AS doc_id, rank AS pagerank_e12
FROM pr WHERE iter = {PR_ITERS}
ORDER BY pagerank_e12 DESC, doc_id
LIMIT {PR_TOP_N}
"""


GRAPH_SHADOW_QUERIES = {
    "q_pagerank": (q_pagerank, Q_PAGERANK_SQL),
}
