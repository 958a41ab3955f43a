"""Similarity-search queries over the `embeddings` table.

Brute-force cosine top-k as the oracle-able baseline, plus an LSH-bucketed
variant (random-hyperplane SimHash buckets) as the 100 TB scale path. Dot
products run JVM-side via higher-order functions (zip_with + aggregate) in
double precision with index-order summation so Spark and DuckDB agree
bit-for-bit before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from calamari_spark.sources.tables import load_table

N_QUERY_VECS = 5  # vec_id < 5 act as the query set


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-10 cosine neighbors for each query vector.

    Scale shape: the query set broadcasts (it is tiny by construction);
    the corpus scan streams once; rank is a per-query window over a
    partition that holds only that query's candidates. At 10^12 vectors
    swap the window for a per-partition top-k + merge (same result)."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    from calamari_spark.plans.common import fan_out

    # fan_out: the broadcast join inherits the scan's partitioning, so the
    # HOF dot products would otherwise all run on the single-file scan's
    # one partition
    cand = fan_out(emb, "vec_id").select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.join(F.broadcast(queries))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_emb"), F.col("c_emb")) / (_norm(F.col("q_emb")) * _norm(F.col("c_emb"))),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "cand_id", "rank", F.round("cosine", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


Q_ANN_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS c_emb FROM embeddings),
scored AS (
  SELECT query_id, cand_id,
         list_dot_product(q_emb, c_emb) /
         (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(c_emb, c_emb))) AS cosine
  FROM q, c WHERE cand_id != query_id
),
ranked AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above 0.40 among the first 200
    vectors (bounded so the oracle's O(n^2) stays cheap; the driver's
    synthetic embeddings top out near cosine 0.45, so 0.40 yields a small
    non-empty result set at every SF; the Spark plan is the same join shape
    the LSH variant prunes at scale)."""
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))))
        .filter(F.col("cosine") >= 0.40)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


Q_NEARDUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.emb, b.emb) /
             (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) /
      (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))) >= 0.40
ORDER BY id_a, id_b
"""


NEARDUP_LSH_BANDS = 6   # OR over bands boosts recall
NEARDUP_LSH_BITS = 8    # FLOOR for signs per band; the query uses
                        # neardup_bits(n) ~ log2(corpus) so buckets stay
                        # near-singleton at every SF (3 bits made buckets
                        # of n/8 and 830k candidate pairs from 2000
                        # vectors; fixed 8 bits went quadratic at 10k).
                        # The floor binds for n <= 1024 (neardup_bits(2000)
                        # is already 9); the oracle computes the SAME
                        # count-scaled width in SQL, so parity holds at
                        # every SF, not just below the floor.
NEARDUP_ORACLE_BITS_MAX = 16  # per-band hyperplane pool embedded in the
                              # oracle SQL; covers n <= 2^18 vectors, far
                              # above any attestation SF (Spark itself is
                              # unbounded — the pool is prefix-stable per
                              # band, see _hyperplanes)
NEARDUP_THRESHOLD = 0.40
EMB_DIM = 64


QUANT = 4096  # power of 2: e*QUANT is an EXACT float op in both engines


def neardup_bits(n_vectors: int) -> int:
    """Sign bits per band scaled to the corpus: ~log2(n) keeps EXPECTED
    bucket occupancy O(1), which is what keeps banded candidate generation
    LINEAR in corpus size — with fixed bits the per-bucket self-join grows
    as (n/2^bits)^2 per bucket, i.e. the whole stage goes quadratic (the
    5x data-scale bench measured 11.9x time at 5x data before this).
    The -2 margin trades a little occupancy (~4/bucket) for recall: the
    collision probability per band is p^bits for match probability p, so
    each extra bit costs recall — log2(n) - 2 is the standard
    occupancy/recall balance for banded sign-LSH. The DuckDB oracle
    computes the identical width from count(*) in SQL (greatest(8,
    ceil(log2 n) - 2)) over a prefix-stable hyperplane pool, so engine
    parity holds at every SF by construction rather than only where the
    8-bit floor binds (n <= 1024)."""
    import math

    return max(NEARDUP_LSH_BITS, math.ceil(math.log2(max(n_vectors, 2))) - 2)


def _hyperplanes(bits: int = NEARDUP_LSH_BITS) -> "np.ndarray":
    """Deterministic Rademacher (+/-1) hyperplanes, identical constants in
    the Spark plan and the SQL oracle (a model constant, like IVF
    centroids). +/-1 entries + floor-quantized embeddings make every
    signature bit an exact INTEGER comparison — bit-identical across
    engines and summation orders, so the vectorized numpy path below is
    safe (a float dot's near-zero sign could differ between numpy's
    blocked BLAS sum and DuckDB's sequential sum).

    Each band draws from its OWN seeded stream, so band b's first r
    hyperplanes are identical for every ``bits`` — the oracle embeds the
    full NEARDUP_ORACLE_BITS_MAX pool per band as literal SQL and slices
    the first ``bits`` characters at query time, guaranteeing the two
    engines bucket on the same planes no matter what width the corpus
    count resolves to. Row layout matches the signature UDF: b * bits + r."""
    import numpy as np

    return np.concatenate(
        [
            (
                np.random.RandomState(1000 + b).randint(0, 2, (bits, EMB_DIM)) * 2 - 1
            ).astype(np.int64)
            for b in range(NEARDUP_LSH_BANDS)
        ],
        axis=0,
    )


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: random-hyperplane LSH bucketing.

    Signature bit b = (sum_i h_bi * floor(e_i * 4096) >= 0) with h in
    {-1, +1}: exact integer arithmetic, so Spark computes it in ONE
    Arrow-vectorized pandas UDF (int64 matmul; ~20x faster than the
    higher-order-function chain) while the DuckDB oracle computes the same
    bits as an explicit term sum. A pair is a candidate iff it collides in
    >=1 of the B bands (R bits each) — candidate generation is linear in
    corpus + bucket sizes vs the O(n^2) nested-loop of q_embedding_neardup
    (which remains the bounded exactness demo). Recall < 1 by design; the
    oracle implements the identical banded scheme, so the engines agree
    exactly on which pairs surface."""
    import numpy as np
    import pandas as pd

    from calamari_spark.functions.arrow import series_udf

    emb = load_table(spark, "embeddings", sf_dir)
    # corpus-scaled band width (neardup_bits): one parquet-metadata count
    # up front buys linear candidate generation at every SF.
    # (No fan_out here, deliberately: the signature is ONE vectorized int64
    # matmul per Arrow batch — spreading it across tiny partitions paid
    # more in Python-worker spin-up than the kernel costs; A/B'd 1.3s ->
    # 2.5s at sf0.1. The expensive half of this query is the banded join,
    # which the shuffle parallelizes on its own.)
    bits = neardup_bits(emb.count())
    Ht = _hyperplanes(bits).T  # (EMB_DIM, bands*bits)

    def _sig(s):
        M = np.stack(s.to_numpy()).astype(np.float64)  # float32 -> exact
        Q = np.floor(M * QUANT).astype(np.int64)
        bits = (Q @ Ht) >= 0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    sig_udf = series_udf(_sig, "string")

    # the candidate generation references the bands lineage from several
    # subtrees — without materialization the signature UDF runs once per
    # subtree (same pattern as the MinHash path; see materialize)
    from calamari_spark.plans.common import materialize

    sig = materialize(
        emb.select("vec_id", sig_udf(F.col("embedding")).alias("sig"))
    )
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(
                            "sig", b * bits + 1, bits
                        ).alias("key"),
                    )
                    for b in range(NEARDUP_LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    from calamari_spark.plans.dedup import banded_candidates

    # hot-bucket guard: a degenerate hyperplane bucket (mass-duplicated
    # embeddings) star-reduces instead of exploding O(b^2) — same scheme
    # and cap as the MinHash path, mirrored in the oracle below
    cand = banded_candidates(bands, "vec_id", "id_a", "id_b")

    # candidate scoring: vectorized over pairs, dim-SEQUENTIAL accumulation
    # so the float64 sum order matches DuckDB's list_dot_product exactly
    # (the HOF aggregate chain gives the same bits but ~100us/pair)
    def _cos(ea, eb):
        A = np.stack(ea.to_numpy()).astype(np.float64)
        B = np.stack(eb.to_numpy()).astype(np.float64)
        dot = np.zeros(len(A))
        na = np.zeros(len(A))
        nb = np.zeros(len(A))
        for i in range(A.shape[1]):
            dot += A[:, i] * B[:, i]
            na += A[:, i] * A[:, i]
            nb += B[:, i] * B[:, i]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    cos_udf = series_udf(_cos, "double")

    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cosine_raw", cos_udf(F.col("ea"), F.col("eb")))
        # filter on the RAW cosine (the oracle does too); round for display
        .filter(F.col("cosine_raw") >= NEARDUP_THRESHOLD)
        .select("id_a", "id_b", F.round("cosine_raw", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


def _neardup_lsh_oracle() -> str:
    """Count-scaled band width in pure SQL: the full 16-bit hyperplane
    pool is embedded per band (prefix-stable, see _hyperplanes) and the
    band key is the first ``bits`` characters, with bits computed from
    count(*) exactly as neardup_bits does — parity with the Spark plan at
    every SF, not just where the 8-bit floor binds."""
    H = _hyperplanes(NEARDUP_ORACLE_BITS_MAX)

    def bit_expr(hvec):
        # exact integer sum: +/- floor(e_i * 4096), identical to the numpy
        # int64 matmul in any summation order
        terms = " ".join(
            f"{'+' if h > 0 else '-'} floor(emb[{i + 1}] * {QUANT})"
            for i, h in enumerate(hvec)
        )
        return f"(CASE WHEN (0 {terms}) >= 0 THEN '1' ELSE '0' END)"

    def key_expr(b):
        return "(" + " || ".join(
            bit_expr(H[b * NEARDUP_ORACLE_BITS_MAX + r])
            for r in range(NEARDUP_ORACLE_BITS_MAX)
        ) + ")"

    from calamari_spark.plans.dedup import banded_candidates_sql

    band_rows = ", ".join(f"({b}, {key_expr(b)})" for b in range(NEARDUP_LSH_BANDS))
    return f"""
WITH w AS (
  SELECT least({NEARDUP_ORACLE_BITS_MAX},
               greatest({NEARDUP_LSH_BITS},
                        cast(ceil(log2(count(*))) AS INT) - 2)) AS bits
  FROM embeddings
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
bands AS (
  SELECT vec_id, band, substr(key_full, 1, (SELECT bits FROM w)) AS key
  FROM e, LATERAL (VALUES {band_rows}) AS v(band, key_full)
),
{banded_candidates_sql("vec_id", "id_a", "id_b")}
SELECT id_a, id_b,
       round(list_dot_product(ea.emb, eb.emb) /
             (sqrt(list_dot_product(ea.emb, ea.emb)) * sqrt(list_dot_product(eb.emb, eb.emb))), 6) AS cosine
FROM cand
JOIN e ea ON ea.vec_id = id_a
JOIN e eb ON eb.vec_id = id_b
WHERE list_dot_product(ea.emb, eb.emb) /
      (sqrt(list_dot_product(ea.emb, ea.emb)) * sqrt(list_dot_product(eb.emb, eb.emb))) >= {NEARDUP_THRESHOLD}
ORDER BY id_a, id_b
"""


IVF_CELLS = 8     # coarse centroids = vec_id in [100, 108)
IVF_NPROBE = 2    # cells probed per query
IVF_CENTROID_BASE = 100


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: the 100 TB scale path for q_ann_cosine_topk.

    Build: every vector is assigned to its nearest of ``IVF_CELLS`` coarse
    centroids. The centroids are a tiny model constant (at 100 TB they come
    from a k-means fit), so they enter the plan as a LITERAL array and the
    assignment is a pure per-row map — cosines against all cells as an array
    column, argmax via array_max over (cos, -cent_id) structs. Zero joins
    and zero windows in the build; the only shuffles are the fan_out spread
    of the raw corpus rows ahead of the assignment kernel and the final
    per-query top-k (the round-1 variant shuffled an 8x-exploded corpus
    through a per-vector window).
    Search: each query probes its ``IVF_NPROBE`` nearest cells and ranks
    only those candidates. Recall < 1 by construction — the brute-force
    twin above is the exactness baseline."""
    import math

    import numpy as np

    from calamari_spark.plans.common import fan_out

    emb = load_table(spark, "embeddings", sf_dir)
    # ONE bounded collect fetches the model constant (centroids) AND the
    # tiny query set (r5 collected centroids here and derived the query
    # probes with a second scan + per-row HOF chain)
    const_rows = (
        emb.filter(
            (
                (F.col("vec_id") >= IVF_CENTROID_BASE)
                & (F.col("vec_id") < IVF_CENTROID_BASE + IVF_CELLS)
            )
            | (F.col("vec_id") < N_QUERY_VECS)
        )
        .select("vec_id", "embedding")
        .collect()
    )
    cent_rows = sorted(
        (r for r in const_rows if r["vec_id"] >= IVF_CENTROID_BASE),
        key=lambda r: r["vec_id"],
    )
    cent_ids = [int(r["vec_id"]) for r in cent_rows]
    C = np.array([[float(v) for v in r["embedding"]] for r in cent_rows])
    # index-order python sum, exactly as the r5 literal computed c_norm
    c_norms = np.array(
        [math.sqrt(sum(float(v) ** 2 for v in r["embedding"])) for r in cent_rows]
    )

    # cell-assignment stays the JVM higher-order-function chain of r5: an
    # Arrow/pandas kernel was A/B'd SLOWER here (1.39 s -> 1.65 s at
    # sf0.1) — two extra Python boundary crossings cost more than the
    # interpreted HOF folds save at IVF_CELLS=8 dot products per row, and
    # the pure-JVM plan (zero Python nodes) is the property the plan test
    # guards. _cos_to_cents below is the driver-side twin for the probe
    # derivation only; dim-sequential accumulation matches the HOF left
    # fold bit-for-bit.
    def _cos_to_cents(M: "np.ndarray") -> "np.ndarray":
        dot = np.zeros((len(M), len(cent_ids)))
        nrm = np.zeros(len(M))
        for i in range(M.shape[1]):
            dot += M[:, i : i + 1] * C[:, i][None, :]
            nrm += M[:, i] * M[:, i]
        return dot / (np.sqrt(nrm)[:, None] * c_norms[None, :])

    cents_lit = F.array(
        *[
            F.struct(
                F.lit(cent_ids[k]).alias("cent_id"),
                F.array(*[F.lit(float(v)) for v in cent_rows[k]["embedding"]]).alias("c_emb"),
                F.lit(float(c_norms[k])).alias("c_norm"),
            )
            for k in range(len(cent_ids))
        ]
    )
    # per-row scored cells: struct(neg_cos, cent_id) so array_min ordering
    # = cosine DESC, ties -> lower centroid id
    scored_cells = F.transform(
        cents_lit,
        lambda c: F.struct(
            (-(_dot(F.col("embedding"), c["c_emb"]) / (F.col("e_norm") * c["c_norm"]))).alias("neg_cos"),
            c["cent_id"].alias("cent_id"),
        ),
    )

    # fan_out: the assignment kernel is the expensive per-row map and the
    # scan is single-file. This trades the "zero shuffles until top-k"
    # property for parallelism of the kernel — at 100 TB the input arrives
    # in thousands of files and the repartition collapses to a no-op-cost
    # spread of raw rows.
    assign = (
        fan_out(emb, "vec_id")
        .withColumn("e_norm", _norm(F.col("embedding")))
        .withColumn("cent_id", F.array_min(scored_cells)["cent_id"])
        .select("vec_id", "embedding", "cent_id")
    )

    # r6: nprobe nearest cells per query computed DRIVER-SIDE from the
    # same collected rows (5 query vectors — bounded like the centroids,
    # one collect instead of r5's second scan + per-row HOF sort): sort by
    # (cosine DESC, cent_id ASC), take IVF_NPROBE. _cos_to_cents matches
    # the HOF fold bit-for-bit, so the probe choices are unchanged.
    probe_rows = []
    for r in sorted(
        (r for r in const_rows if r["vec_id"] < N_QUERY_VECS),
        key=lambda r: r["vec_id"],
    ):
        q = np.array([[float(v) for v in r["embedding"]]])
        qcos = _cos_to_cents(q)[0]
        order = np.lexsort((np.array(cent_ids), -qcos))
        for k in order[:IVF_NPROBE]:
            probe_rows.append(
                (int(r["vec_id"]), [float(v) for v in r["embedding"]], cent_ids[k])
            )
    q_cells = spark.createDataFrame(
        probe_rows, "query_id long, q_emb array<double>, cent_id int"
    )

    def cos(a, b):
        return _dot(a, b) / (_norm(a) * _norm(b))

    # broadcast the tiny probe set; the assigned corpus streams through once
    cand = F.broadcast(q_cells).join(
        assign.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e"), "cent_id"),
        "cent_id",
    ).filter(F.col("cand_id") != F.col("query_id"))
    ranked = cand.withColumn("cosine", cos(F.col("q_emb"), F.col("e"))).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
        ),
    )
    return (
        ranked.filter(F.col("rank") <= 10)
        .select("query_id", "cand_id", "rank", F.round("cosine", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )


Q_ANN_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, emb AS c_emb FROM e
  WHERE vec_id >= {IVF_CENTROID_BASE} AND vec_id < {IVF_CENTROID_BASE + IVF_CELLS}
),
assign AS (
  SELECT vec_id, emb, cent_id FROM (
    SELECT e.vec_id, e.emb, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.emb, c.c_emb) /
                      (sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC,
                      c.cent_id
           ) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
q_cells AS (
  SELECT query_id, q_emb, cent_id FROM (
    SELECT a.vec_id AS query_id, a.emb AS q_emb, c.cent_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_dot_product(a.emb, c.c_emb) /
                      (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC,
                      c.cent_id
           ) AS rn
    FROM assign a, cents c
    WHERE a.vec_id < {N_QUERY_VECS}
  ) WHERE rn <= {IVF_NPROBE}
),
ranked AS (
  SELECT q.query_id, a.vec_id AS cand_id,
         list_dot_product(q.q_emb, a.emb) /
         (sqrt(list_dot_product(q.q_emb, q.q_emb)) * sqrt(list_dot_product(a.emb, a.emb))) AS cosine,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_dot_product(q.q_emb, a.emb) /
                    (sqrt(list_dot_product(q.q_emb, q.q_emb)) * sqrt(list_dot_product(a.emb, a.emb))) DESC,
                    a.vec_id
         ) AS rank
  FROM q_cells q JOIN assign a ON a.cent_id = q.cent_id
  WHERE a.vec_id != q.query_id
)
SELECT query_id, cand_id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
"""


ANN_QUERIES = {
    "q_ann_cosine_topk": (q_ann_cosine_topk, Q_ANN_SQL),
    "q_embedding_neardup_lsh": (q_embedding_neardup_lsh, _neardup_lsh_oracle()),
    "q_ann_ivf_topk": (q_ann_ivf_topk, Q_ANN_IVF_SQL),
}

# the bounded O(n^2) exactness demo: its scale semantics are covered by the
# LSH twin + brute-force top-k above, so it cedes its driver slot (50-row
# window) but stays oracle-verified by pytest
ANN_SHADOW_QUERIES = {
    "q_embedding_neardup": (q_embedding_neardup, Q_NEARDUP_SQL),
}
