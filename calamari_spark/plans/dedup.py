"""MinHash-LSH and SimHash near-duplicate detection over `documents`.

Both use md5 as the shared hash primitive because Spark and DuckDB compute
identical md5 hex strings — every stage is therefore DuckDB-oracle-able,
value-for-value. At 10^12 docs these are the standard scale paths:

* MinHash-LSH: shingle -> K min-hashes -> band keys -> bucket join. Only
  docs sharing a band bucket ever meet (candidate generation is linear in
  corpus size + bucket sizes), versus the O(n^2) cross join.
* SimHash: one 16-bit signature per document from word-level md5 bit
  votes; equal-signature buckets are near-dup candidates.

Shingling matches q_ngram_jaccard_pairs (word 3-grams over the regularized
text) so the two methods are comparable on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calamari_spark.plans.common import materialize
from calamari_spark.plans.textplans import _REG_SQL, _regularized_col
from calamari_spark.sources.tables import load_table

N_HASHES = 16     # minhash signature length (Jaccard estimator variance
                  # ~ 1/sqrt(K); 8 was demo-sized)
BAND_ROWS = 2     # rows per LSH band -> N_HASHES/BAND_ROWS bands
MIN_SIM = 0.5     # emit pairs with signature similarity >= this
HOT_BUCKET_CAP = 64  # band buckets above this size are star-reduced


def banded_candidates(bands: DataFrame, id_col: str, out_a: str, out_b: str,
                      cap: int = HOT_BUCKET_CAP) -> DataFrame:
    """Candidate pairs from (id, band, key) rows with a hot-bucket guard.

    Buckets of size <= cap emit every ordered pair; a DEGENERATE bucket
    (mass-duplicated boilerplate: at 10^12 docs one hot band key would
    otherwise make an O(b^2) join partition before distinct — the classic
    skew blow-up that MAX_DF already prevents on the shingle join) instead
    emits STAR pairs to the bucket's min id: b-1 edges, same connected
    components. The star keeps every bucket member reachable from the
    minimum, so downstream cluster resolution (connected_components) is
    unchanged for true duplicate clusters — their pairwise similarity is
    maximal, so the post-join similarity filter passes star edges exactly
    like full edges. Pair-level RECALL above the cap is intentionally
    reduced (b-1 of b(b-1)/2 pairs); the DuckDB oracle implements the
    identical scheme.

    r6 plan: ONE groupBy(band, key) with an in-array pair expansion
    replaces the previous window + materialize + two-sided self-join +
    union (r5 shape: 1 window exchange + an eager localCheckpoint job + 2
    join exchanges; now: 1 exchange + the distinct). Results are
    value-identical (verified exceptAll-empty both directions at sf0.1 and
    on the embedding path, tests/test_dedup_clusters.py). Per-group state
    is the bucket's sorted id array: pair expansion stays <= C(cap,2) per
    normal bucket; the star branch holds one array per degenerate bucket —
    bounded in expectation by band-key entropy and by the exact-dedup pass
    every production pipeline runs first (identical docs never reach LSH),
    whereas the old window shape buffered the same bucket per-partition
    with sorter spill. The cap itself remains the O(b^2) guard."""
    grouped = bands.groupBy("band", "key").agg(
        F.array_sort(F.collect_list(id_col)).alias("ids")
    )
    ids = F.col("ids")
    n = F.size(ids)
    all_pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.transform(
                F.slice(ids, i + 2, n),
                lambda y: F.struct(ids[i].alias("a"), y.alias("b")),
            ),
        )
    )
    star_pairs = F.transform(
        F.slice(ids, 2, n),
        lambda y: F.struct(ids[0].alias("a"), y.alias("b")),
    )
    return (
        grouped.filter(n >= 2)
        .select(
            F.explode(F.when(n <= cap, all_pairs).otherwise(star_pairs)).alias("p")
        )
        .select(F.col("p.a").alias(out_a), F.col("p.b").alias(out_b))
        .distinct()
    )


def banded_candidates_sql(id_col: str, out_a: str, out_b: str,
                          cap: int = HOT_BUCKET_CAP) -> str:
    """The oracle-side mirror of banded_candidates: CTE bodies `bstats` and
    `cand` over an existing `bands(id, band, key)` CTE."""
    return f"""bstats AS (
  SELECT {id_col}, band, key,
         count(*) OVER (PARTITION BY band, key) AS bsize,
         min({id_col}) OVER (PARTITION BY band, key) AS bmin
  FROM bands
),
cand AS (
  SELECT DISTINCT {out_a}, {out_b} FROM (
    SELECT a.{id_col} AS {out_a}, b.{id_col} AS {out_b}
    FROM bstats a JOIN bstats b
      ON a.band = b.band AND a.key = b.key AND a.{id_col} < b.{id_col}
    WHERE a.bsize <= {cap} AND b.bsize <= {cap}
    UNION ALL
    SELECT bmin AS {out_a}, {id_col} AS {out_b} FROM bstats
    WHERE bsize > {cap} AND {id_col} != bmin
  )
)"""


def _shingles_sql(table: str = "documents") -> str:
    return f"""
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
    FROM (SELECT doc_id, string_split({_REG_SQL}, ' ') AS w FROM {table})
    WHERE len(w) >= 3
  )
"""


_SHINGLES_SQL = _shingles_sql()


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """MinHash signature per document (doc_id, h0..h{N_HASHES-1}),
    MATERIALIZED: every consumer references it at least twice (band
    bucketing + both sides of the similarity join; the incremental-dedup
    scan probes it per wave) and the shingle+16-md5 pipeline is the
    expensive half. In a production pipeline this is the table the
    snapshot sink persists once per crawl so later waves never recompute
    it (see q_incremental_dedup).

    r6 plan: the signature is a PURE PER-DOC MAP — each component is
    array_min over the per-doc shingle array's md5s (min over a group ==
    array_min over the same multiset; identical md5 inputs, identical
    binary string ordering — verified exceptAll-empty vs the r5 groupBy
    shape). The r5 shape exploded one row per shingle occurrence and
    shuffled ~50 shingle rows per doc into a 16-column min aggregation;
    now ZERO shuffle and no explode — the signature stage is scan-bound,
    which is exactly what a 10^12-doc signature pass must be. fan_out only
    spreads the scan for kernel parallelism (single-file scans at bench
    SFs)."""
    from calamari_spark.plans.common import fan_out

    words = fan_out(docs, "doc_id").select(
        "doc_id", F.split(_regularized_col(F.col("text")), " ").alias("w")
    )
    return materialize(_signature_frame(words))


def _signature_frame(
    words: DataFrame, carry: tuple = (), keep_all: bool = False
) -> DataFrame:
    """(doc_id, *carry, h0..h15) from a (doc_id, *carry, w) frame of
    pre-split word arrays — the per-doc map shared by minhash_signatures
    and the incremental path. ``keep_all`` keeps docs with no shingle
    (fewer than 3 words) as rows with NULL h columns instead of dropping
    them — the shape the incremental path needs when the SAME materialized
    frame also carries every doc's content fingerprint (shs is NULL there
    and transform/array_min propagate the NULL)."""
    n = F.size("w") - 2
    shingle_arr = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(
            " ", F.col("w")[i], F.col("w")[i + 1], F.col("w")[i + 2]
        ),
    )
    base = words if keep_all else words.filter(n > 0)
    shs = F.when(n > 0, shingle_arr) if keep_all else shingle_arr
    return (
        base.select("doc_id", *carry, shs.alias("shs"))
        .select(
            "doc_id",
            *carry,
            *[
                F.array_min(
                    F.transform(
                        "shs", lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))
                    )
                ).alias(f"h{i}")
                for i in range(N_HASHES)
            ],
        )
    )


def band_keys(sig: DataFrame) -> DataFrame:
    """LSH band keys (doc_id, band, key) from a signature table: band b's
    key is the md5 of its BAND_ROWS consecutive signature components."""
    n_bands = N_HASHES // BAND_ROWS
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col(f"h{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]
                            )
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_pairs(docs: DataFrame, cap: int = HOT_BUCKET_CAP) -> DataFrame:
    """Near-dup pairs via MinHash signatures + banded LSH candidate join.

    Signatures build with ZERO shuffle (per-doc map, see
    minhash_signatures), one shuffle buckets bands into candidate pairs
    (banded_candidates), one joins candidates back to signatures. No cross
    join anywhere, and degenerate band buckets are star-reduced."""
    sig = minhash_signatures(docs)
    bands = band_keys(sig)

    cand = banded_candidates(bands, "doc_id", "doc_a", "doc_b", cap=cap)
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(N_HASHES)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(N_HASHES)])
    matches = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(N_HASHES)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("minhash_sim", F.round(matches / F.lit(N_HASHES), 6))
        .filter(F.col("minhash_sim") >= MIN_SIM)
        .select("doc_a", "doc_b", "minhash_sim")
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the global sort exists only for the driver's deterministic compare;
    # pipeline consumers (connected_components) take the unsorted pairs
    return minhash_pairs(load_table(spark, "documents", sf_dir)).orderBy(
        "doc_a", "doc_b"
    )


def _sig_band_ctes(table: str = "documents") -> str:
    """SQL CTE bodies `shingles`, `sig`, `bands` — the oracle mirror of
    minhash_signatures + band_keys, shared by the pair/cluster oracles and
    the incremental-dedup oracle (which reads a derived `eff` table)."""
    hash_cols = ",\n         ".join(
        f"min(md5('{i}|' || sh)) AS h{i}" for i in range(N_HASHES)
    )
    n_bands = N_HASHES // BAND_ROWS
    band_rows = ", ".join(
        "({b}, md5({key}))".format(
            b=b,
            key=" || '|' || ".join(f"h{b * BAND_ROWS + r}" for r in range(BAND_ROWS)),
        )
        for b in range(n_bands)
    )
    return f"""shingles AS ({_shingles_sql(table)}),
sig AS (
  SELECT doc_id,
         {hash_cols}
  FROM shingles GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band, key
  FROM sig, (VALUES {band_rows}) AS v(band, key)
)"""


def _minhash_parts() -> tuple:
    """(ctes, pair_select) shared by the pair oracle and the cluster oracle."""
    matches = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
    )
    ctes = f"""{_sig_band_ctes()},
{banded_candidates_sql("doc_id", "doc_a", "doc_b")}"""
    pair_select = f"""SELECT doc_a, doc_b,
       round(({matches}) / {N_HASHES}.0, 6) AS minhash_sim
FROM cand
JOIN sig sa ON sa.doc_id = doc_a
JOIN sig sb ON sb.doc_id = doc_b
WHERE ({matches}) / {N_HASHES}.0 >= {MIN_SIM}"""
    return ctes, pair_select


def _minhash_oracle() -> str:
    ctes, pair_select = _minhash_parts()
    return f"""
WITH {ctes}
{pair_select}
ORDER BY doc_a, doc_b
"""


CC_ALGORITHM_ENV = "CALAMARI_SPARK_CC_ALGORITHM"
CC_ALGORITHMS = ("minlabel", "star")


def connected_components(
    pairs: DataFrame,
    max_iter: int = 25,
    algorithm: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve candidate pairs (doc_a, doc_b) to clusters: every member gets
    the cluster's min doc_id as its label.

    Two backends (``algorithm`` arg, else $CALAMARI_SPARK_CC_ALGORITHM,
    default "minlabel"), selectable exactly like the materialize backends:

    * ``minlabel`` — iterative min-label propagation: per round one shuffle
      join (edges x labels) + one groupBy; rounds = graph DIAMETER. The
      oracle-checked reference implementation: for LSH near-dup clusters
      (dense, tiny diameter) it converges in 2-3 rounds, but a pathological
      duplicate CHAIN (templated pagination pages A~B~C~..., a real crawl
      artifact) of length d forces d rounds.
    * ``star`` — alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond", SoCC 2014): same
      join/groupBy primitives per round, but O(log n) rounds regardless of
      diameter — the at-scale backend for 10^12-doc graphs whose shape is
      not under our control.

    Both converge to identical labels (min doc_id per component, equivalence
    tests in tests/test_dedup_clusters.py); convergence is an exact check,
    and non-convergence within ``max_iter`` raises (wrong keepers are worse
    than a failed job). Per-round intermediates are corpus-sized, so every
    round is materialized through materialize_tracked() and the superseded
    round is released — pinned blocks under the local backend, checkpoint /
    parquet FILES under the durable ones (round-4 ADVICE: the parquet
    backend leaked one corpus-sized table per round).

    This is the keeper-assignment step every training-data dedup pipeline
    needs after LSH emits pairs (the reference stops at pair level, so this
    is an LLM-pipeline extension, not reference parity)."""
    import os

    from calamari_spark.plans.common import materialize_tracked, release_materialized

    algorithm = algorithm or os.environ.get(CC_ALGORITHM_ENV, "minlabel")
    if algorithm not in CC_ALGORITHMS:
        raise ValueError(
            f"connected_components algorithm must be one of {CC_ALGORITHMS}, "
            f"got {algorithm!r}"
        )
    spark = pairs.sparkSession

    # symmetrize in ONE subtree (explode of both directions), not a
    # self-union whose two branches would each run the pair pipeline; the
    # materialization also bounds lineage for the iteration below
    edges, edges_handle = materialize_tracked(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    )
    if stats is None:
        stats = {}
    try:
        if algorithm == "star":
            return _cc_star(spark, edges, max_iter, stats)
        return _cc_minlabel(spark, edges, max_iter, stats)
    finally:
        release_materialized(spark, edges_handle)


def _cc_nonconverged(max_iter: int) -> RuntimeError:
    return RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
        " (a duplicate chain longer than max_iter?); raise max_iter"
        " or use algorithm='star' (O(log n) rounds)"
    )


def _cc_minlabel(spark, edges: DataFrame, max_iter: int, stats: dict) -> DataFrame:
    """Min-label propagation over symmetric edges (src, dst); writes the
    executed round count to stats["rounds"]."""
    from calamari_spark.plans.common import (
        materialize_tracked_counting,
        release_materialized,
    )

    # r6: the init labels are NOT materialized — round 1's single
    # materialize job evaluates the distinct-over-materialized-edges
    # subtree twice (both references are cheap block scans), which beats
    # paying a separate localCheckpoint job for a table round 1 supersedes
    # immediately (A/B: 1.18 s -> 1.09 s for the loop at sf0.1).
    # release_materialized(None) is a no-op, so the round-1 release is safe.
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    own_prev = None
    stats["rounds"] = 0
    for _ in range(max_iter):
        stats["rounds"] += 1
        nbr_min = (
            edges.join(
                labels.select(F.col("doc_id").alias("dst"), F.col("label").alias("nbr_label")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_label").alias("min_nbr"))
            .select(F.col("src").alias("doc_id"), "min_nbr")
        )
        new_label = F.least(F.col("label"), F.coalesce("min_nbr", F.col("label")))
        # r6.2: the round's materialize and its convergence count are ONE
        # job (materialize_tracked_counting) — the count is the
        # materializing action under the local backend, halving the loop's
        # per-round job count.
        new_labels, own_new, changed = materialize_tracked_counting(
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                new_label.alias("label"),
                (new_label < F.col("label")).alias("changed"),
            ),
            "changed",
        )
        # the new round is fully materialized by the count above: the
        # previous round's blocks/files are dead weight from here on. The
        # handle releases ONLY what this loop created — ownership is read
        # off the returned frame's own LogicalRDD, never inferred from a
        # global persistent-RDD diff that could swallow a concurrent
        # query's checkpoint.
        release_materialized(spark, own_prev)
        own_prev = own_new
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    else:
        # wrong keepers are worse than a failed job: a cluster whose graph
        # diameter exceeds max_iter would silently keep non-minimal labels
        raise _cc_nonconverged(max_iter)
    return labels.select("doc_id", F.col("label").alias("keeper"))


def _cc_star(spark, edges: DataFrame, max_iter: int, stats: dict) -> DataFrame:
    """Alternating large-star / small-star over symmetric edges (src, dst).

    Per Kiveris et al. (SoCC 2014): large-star hangs every node's LARGER
    neighbors off the minimum of its closed neighborhood; small-star does
    the same for the smaller-or-equal side after orienting edges toward the
    smaller endpoint. Both preserve connectivity exactly, and the alternation
    contracts every component to a single star rooted at its minimum node in
    O(log n) rounds — immune to the chain-shaped graphs that cost min-label
    propagation O(diameter) rounds. Primitives per round are the same as
    minlabel's (one join + one groupBy each), so the 100 TB shuffle story is
    unchanged; only the ROUND COUNT improves.

    Convergence check is exact, not a fingerprint: a canonical edge set
    (u > v) is a star forest iff (a) no edge's target is another edge's
    source (no chains; left_semi on v == u, limit-1 count) AND (b) no
    source appears with two targets (the edge set is a FUNCTION u ->
    parent; groupBy count > 1, limit-1 count). (b) is NOT implied by (a):
    {(5,1),(5,2),...} has no chains yet still bridges roots 1 and 2
    through node 5 — declaring convergence there split one component into
    two clusters and emitted node 5 twice (caught by review; regression
    test test_star_two_parent_regression). With both holds, connectivity
    preservation makes "star forest" equivalent to "every component is one
    star rooted at its min", at which point both operations are no-ops."""
    from calamari_spark.plans.common import materialize_tracked, release_materialized

    # canonical orientation: u = larger endpoint, v = smaller
    und, own_prev = materialize_tracked(
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"),
            F.least("src", "dst").alias("v"),
        )
        .distinct()
    )
    stats["rounds"] = 0
    for _ in range(max_iter):
        stats["rounds"] += 1
        # large-star over the symmetric view: m(x) = min(N(x) ∪ {x});
        # emit (y, m(x)) for every neighbor y > x
        sym = und.select("u", "v").union(
            und.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m_large = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_large, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        # small-star over larger-endpoint orientation: all of a's listed
        # neighbors are < a, so m(a) = min neighbor; re-hang them (and a)
        # off m(a)
        canon = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).distinct()
        m_small = canon.groupBy("u").agg(F.min("v").alias("m"))
        new_und, own_new = materialize_tracked(
            canon.join(m_small, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .union(m_small.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
        )
        release_materialized(spark, own_prev)
        own_prev = own_new
        und = new_und
        # exact star-forest test: no target is also a source AND every
        # source has exactly one target (see docstring; the second check
        # only runs when the first passes — Python `and` short-circuits,
        # so the common not-yet-converged round costs one job as before)
        chained = (
            und.join(
                und.select(F.col("u").alias("v")).distinct(), "v", "left_semi"
            )
            .limit(1)
            .count()
        )
        if chained == 0 and (
            und.groupBy("u")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
            .limit(1)
            .count()
            == 0
        ):
            break
    else:
        raise _cc_nonconverged(max_iter)
    roots = und.select(F.col("v").alias("doc_id")).distinct()
    return (
        und.select(F.col("u").alias("doc_id"), F.col("v").alias("keeper"))
        .union(roots.withColumn("keeper", F.col("doc_id")))
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH pairs -> connected components -> (doc_id, keeper, is_duplicate):
    the materialized keep/drop decision for the dedup pipeline."""
    pairs = minhash_pairs(load_table(spark, "documents", sf_dir)).select(
        "doc_a", "doc_b"
    )
    return (
        connected_components(pairs)
        .withColumn("is_duplicate", F.col("doc_id") != F.col("keeper"))
        .orderBy("doc_id")
    )


def _clusters_oracle() -> str:
    """Transitive closure via a recursive CTE over the same LSH pairs."""
    ctes, pair_select = _minhash_parts()
    return f"""
WITH RECURSIVE {ctes},
pairs AS ({pair_select}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       least(src, min(dst)) AS keeper,
       least(src, min(dst)) != src AS is_duplicate
FROM reach GROUP BY src ORDER BY doc_id
"""


SIMHASH_BITS = 16


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from word-level md5 bit votes: bit j is
    1 iff more (distinct) words vote 1 than 0 at position j. Also carries
    the whole-document md5 fingerprint (q_fingerprint merged here — both
    are per-doc signature columns; the standalone query remains in
    SHADOW_QUERIES).

    r6 plan: PURE PER-DOC MAP. The r5 shape exploded words, ran a global
    distinct (a full shuffle of every word occurrence), a 16-column groupBy
    and a doc_id join; but the distinct is per (doc_id, word), i.e. exactly
    array_distinct of the per-doc word array, and the +/-1 vote sums are
    integer counts over that array — so the whole signature is computable
    per row with ZERO shuffle (verified exceptAll-empty vs the r5 shape).
    One md5+hex-parse per distinct word materializes in the hs array, so
    per-bit votes are shift/mask counts over it. s_j = 2*ones_j - n_words
    is value-identical to summing +/-1 votes. Docs with no non-empty word
    are dropped exactly as the r5 inner join dropped them. fan_out spreads
    the scan (single parquet file at bench SFs = one partition otherwise)."""
    from calamari_spark.plans.common import fan_out

    docs = load_table(spark, "documents", sf_dir)
    clean = _regularized_col(F.col("text"))
    words_arr = F.array_remove(F.array_distinct(F.split(clean, " ")), "")
    h16 = lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("int")  # noqa: E731
    per_doc = fan_out(docs, "doc_id").select(
        "doc_id",
        F.transform(words_arr, h16).alias("hs"),
        F.md5(F.lower(clean)).alias("fingerprint"),
    )
    n = F.size("hs")
    ones = [
        F.size(
            F.filter(
                "hs",
                lambda h: F.shiftright(h, SIMHASH_BITS - 1 - j).bitwiseAND(F.lit(1))
                == 1,
            )
        )
        for j in range(SIMHASH_BITS)
    ]
    simhash = sum(
        ((ones[j] * 2 - n) > 0).cast("int") * F.lit(1 << (SIMHASH_BITS - 1 - j))
        for j in range(SIMHASH_BITS)
    )
    return (
        per_doc.filter(n > 0)
        .select("doc_id", simhash.cast("int").alias("simhash"), "fingerprint")
        .orderBy("doc_id")
    )


def _simhash_oracle() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h16 & {1 << (SIMHASH_BITS - 1 - j)}) > 0 THEN 1 ELSE 0 END) * 2"
        f" - count(*) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << (SIMHASH_BITS - 1 - j)} ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, word
  FROM (SELECT doc_id, unnest(string_split({_REG_SQL}, ' ')) AS word FROM documents)
  WHERE word != ''
),
per_word AS (
  SELECT doc_id, CAST(('0x' || substring(md5(word), 1, 4)) AS INTEGER) AS h16
  FROM words
),
agg AS (SELECT doc_id, {sums} FROM per_word GROUP BY doc_id)
SELECT agg.doc_id, CAST({bits} AS INTEGER) AS simhash,
       md5(lower({_REG_SQL})) AS fingerprint
FROM agg JOIN documents USING (doc_id) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup: new crawl wave vs existing snapshot
# ---------------------------------------------------------------------------
# At 100 TB a corpus is never deduplicated from scratch per crawl: the new
# wave (days of crawling, ~0.1-1% of the snapshot) is checked AGAINST the
# standing snapshot, whose content fingerprints and MinHash signatures were
# persisted when it was built (minhash_signatures is exactly the table the
# snapshot sink stores — see plans/snaptable.py). The corpus has no wave
# column, so waves are DERIVED deterministically: doc_id % 3 == 0 is the
# incoming wave, the rest is the standing snapshot.
#
# The scale-defining property is JOIN DIRECTION: the snapshot side is 10^12
# rows and must never shuffle. Both probes therefore broadcast the SMALL
# side twice — (1) the wave's distinct keys broadcast against the snapshot
# scan (map-side semi-probe, result <= wave size), (2) that result
# broadcasts back against the wave. tests/test_physical_plans.py asserts
# the BroadcastHashJoins and that no Exchange lands on the snapshot scan.

INCR_WAVE_MOD = 3    # doc_id % 3 == 0 -> incoming wave
INCR_RECRAWL_MOD = 21  # wave docs at % 21 == 0 re-captured page doc_id+1
                       # unchanged — guaranteed cross-wave EXACT hits (the
                       # corpus has none at sf0.01, so without this the
                       # 'exact' branch would be dead code to the oracle)


def _recrawl_docs(docs: DataFrame) -> DataFrame:
    """Fixture synthesis (not part of the operator): wave docs at
    doc_id % INCR_RECRAWL_MOD == 0 carry the text of page doc_id+1 — an
    existing-snapshot page (d % 3 == 0 implies d+1 % 3 == 1) — simulating a
    recrawl that captured the page unchanged. The corpus self-join below
    exists ONLY for this derivation; the operator's own probes stay
    broadcast (see the plan test)."""
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("recrawl_text"))
    return docs.join(nxt, "doc_id", "left").select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(INCR_RECRAWL_MOD)) == 0,
            F.coalesce("recrawl_text", "text"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


_INCR_EFF_SQL = f"""
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {INCR_RECRAWL_MOD} = 0
              THEN coalesce(e.text, d.text) ELSE d.text END AS text
  FROM documents d LEFT JOIN documents e ON e.doc_id = d.doc_id + 1
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify each incoming-wave document against the standing snapshot:
    'exact' (content fingerprint already present), 'near' (shares an LSH
    band bucket with a snapshot doc), else 'fresh'. Within-wave duplicates
    are out of scope here — that is the standing q_exact_dedup /
    q_dedup_clusters path run when the wave is folded in."""
    docs = _recrawl_docs(load_table(spark, "documents", sf_dir))
    inc = F.pmod(F.col("doc_id"), F.lit(INCR_WAVE_MOD)) == 0

    # referenced twice (wave + snapshot filters): one regularize+md5 pass.
    # (TWO r6 fusion experiments were A/B'd SLOWER and reverted: (1)
    # staging the regularized TEXT once for both passes — 2.34 s -> 2.97 s
    # at sf0.1, the wide clean-text checkpoint costs more than the second
    # regularize saves; (2) fusing fps + h0..h15 into ONE 18-column
    # materialize via _signature_frame(carry=..., keep_all=True) — jobs
    # drop 21 -> 19 but every one of the ~8 downstream probe subtrees then
    # scans the 64-partition wide blocks, doubling task count 529 -> 1050
    # and costing ~+0.5 s at sf0.1 AND at 5x (interleaved A/B mins
    # 2.98/4.91 s old vs 3.89/5.43 s fused). The narrow few-partition fps
    # table the probes scan 4x is worth more at bench scale than the
    # second regularize pass it costs; at true 100 TB the fused single
    # corpus pass wins, and _signature_frame keeps the carry/keep_all
    # hooks for that configuration.)
    #
    # The fingerprint and signature materializes are INDEPENDENT jobs over
    # the same input, so they are submitted from a 2-thread pool and run
    # CONCURRENTLY (guide §2.6: actions are only sequential because driver
    # code calls them sequentially; the second job's tasks back-fill
    # executors freed by the first's tail). Interleaved A/B at sf0.1:
    # 2.29 s -> 1.82 s min. Values are unaffected — both jobs are
    # deterministic and only their scheduling overlaps.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as pool:
        f_fps = pool.submit(
            materialize,
            docs.select(
                "doc_id",
                F.md5(F.lower(_regularized_col(F.col("text")))).alias("fp"),
                inc.alias("inc"),
            ),
        )
        f_sig = pool.submit(minhash_signatures, docs)
        fps, sig = f_fps.result(), f_sig.result()
    inc_fp, ex_fp = fps.filter(F.col("inc")), fps.filter(~F.col("inc"))
    hit_fps = (
        ex_fp.join(F.broadcast(inc_fp.select("fp").distinct()), "fp", "left_semi")
        .select("fp")
        .distinct()
    )
    exact_ids = inc_fp.join(F.broadcast(hit_fps), "fp", "left_semi").select("doc_id")

    bands = band_keys(sig).withColumn("inc", inc)
    inc_b, ex_b = bands.filter(F.col("inc")), bands.filter(~F.col("inc"))
    hit_keys = (
        ex_b.join(F.broadcast(inc_b.select("band", "key").distinct()), ["band", "key"], "left_semi")
        .select("band", "key")
        .distinct()
    )
    near_ids = (
        inc_b.join(F.broadcast(hit_keys), ["band", "key"], "left_semi")
        .select("doc_id")
        .distinct()
    )

    return (
        fps.filter(F.col("inc"))
        .select("doc_id")
        .join(exact_ids.withColumn("is_exact", F.lit(True)), "doc_id", "left")
        .join(near_ids.withColumn("is_near", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), "exact")
            .when(F.col("is_near"), "near")
            .otherwise("fresh")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


def _incremental_oracle() -> str:
    return f"""
WITH eff AS ({_INCR_EFF_SQL}),
{_sig_band_ctes("eff")},
fps AS (SELECT doc_id, md5(lower({_REG_SQL})) AS fp FROM eff),
exact_hit AS (
  SELECT DISTINCT i.doc_id FROM fps i JOIN fps e ON i.fp = e.fp
  WHERE i.doc_id % {INCR_WAVE_MOD} = 0 AND e.doc_id % {INCR_WAVE_MOD} <> 0
),
near_hit AS (
  SELECT DISTINCT i.doc_id
  FROM bands i JOIN bands e ON i.band = e.band AND i.key = e.key
  WHERE i.doc_id % {INCR_WAVE_MOD} = 0 AND e.doc_id % {INCR_WAVE_MOD} <> 0
)
SELECT d.doc_id,
       CASE WHEN x.doc_id IS NOT NULL THEN 'exact'
            WHEN nh.doc_id IS NOT NULL THEN 'near'
            ELSE 'fresh' END AS status
FROM documents d
LEFT JOIN exact_hit x ON d.doc_id = x.doc_id
LEFT JOIN near_hit nh ON d.doc_id = nh.doc_id
WHERE d.doc_id % {INCR_WAVE_MOD} = 0
ORDER BY d.doc_id
"""


DEDUP_QUERIES = {
    "q_minhash_lsh_pairs": (q_minhash_lsh_pairs, _minhash_oracle()),
    "q_dedup_clusters": (q_dedup_clusters, _clusters_oracle()),
    "q_simhash": (q_simhash, _simhash_oracle()),
}

# ---------------------------------------------------------------------------
# Exact-substring (span-level) dedup
# ---------------------------------------------------------------------------
# The ExactSubstr method (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better") finds VERBATIM spans repeated across
# documents — a different signal from every doc-level family above (a
# boilerplate paragraph inside otherwise-distinct pages never trips
# fingerprint/MinHash/SimHash). The published implementation builds a
# corpus-wide suffix array; the distributed equivalent is
# CONTENT-DEFINED anchored windows (the rsync/CDC chunking idea): a
# position anchors a window iff it starts a word AND a hash of the SEED
# chars there is 0 mod ANCHOR_MOD, so identical spans produce identical
# anchor positions REGARDLESS of where they sit in each document. (A
# first cut used doc-aligned fixed-stride windows; those only match when
# the two copies agree mod stride — a 6-char offset shift silently hides
# every duplicate, which a review counterexample proved. A second cut
# hashed EVERY position; the word-start pre-filter is a short-circuited
# cheap test that cuts hash evaluations ~6x — measured 6.6 s -> see
# BASELINE.md — at the cost of assuming space-tokenizable text, the same
# assumption every text operator in this repo makes.) Detection is
# probabilistic in span length: a repeated span of WINDOW + m extra chars
# contains ~m/6 word starts, each anchoring with probability 1/ANCHOR_MOD
# — P(caught) = 1 - (1 - 1/4)^(m/6), 96% at +64 chars (2x WINDOW), 99.9%
# at +160 (a winnowing argmin would make the guarantee hard at extra
# plan complexity; the published suffix array is exact but not
# distributable). Plan shape at 10^12 docs: one anchor+substr map
# (scan-bound; no fan_out — the exchange that follows repartitions
# anyway), one shuffle on the window key with map-side partial agg, and a
# left-semi probe back — NO pair join, so a hot boilerplate window raises
# one group's count instead of creating a quadratic join partition (the
# skew failure q_ngram_jaccard_pairs needs MAX_DF for). At corpus scale
# the group key would be xxhash64(window) to cut shuffle bytes
# (collision-accepted, as published); the oracled query groups by the raw
# window so cross-engine equality is exact.

SUBSTR_WINDOW = 64     # chars per window
SUBSTR_ANCHOR_MOD = 4  # a word start anchors iff seed-hash % MOD == 0;
                       # expected anchor gap ~ (mean word len + 1) * MOD
SUBSTR_SEED = 4        # chars hashed to decide "does this word start anchor"


def _anchor_hash(t, p):
    """Polynomial hash of the SEED chars at 1-based position p — plain
    31-base arithmetic over code points so Spark and DuckDB compute the
    IDENTICAL value (no engine-internal hash involved). Long arithmetic:
    codepoints can reach 0x10FFFF and 31^3 * 1114111 overflows int32."""
    h = F.ascii(F.substring(t, p, 1)).cast("long")
    for k in range(1, SUBSTR_SEED):
        h = h * 31 + F.ascii(F.substring(t, p + k, 1)).cast("long")
    return h


def q_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    text = _regularized_col(F.col("text"))
    # word-start test first: codegen short-circuits the AND, so the 4-char
    # hash only evaluates at ~1/6 of positions. At p=1 the OR's first arm
    # decides in both engines (Spark substr(t,0,1) clamps to the first char,
    # DuckDB returns '' — either way the p==1 term wins), so the expression
    # is engine-safe without special-casing.
    anchors = F.filter(
        F.sequence(F.lit(1), F.length("t") - SUBSTR_WINDOW + 1),
        lambda p: (
            (p == 1) | (F.substring(F.col("t"), p - 1, 1) == " ")
        )
        & (_anchor_hash(F.col("t"), p) % SUBSTR_ANCHOR_MOD == 0),
    )
    from calamari_spark.plans.common import fan_out

    # r6: the per-doc window dedup is array_distinct BEFORE the explode —
    # a pure map — instead of a global distinct() exchange of every window
    # row (same (doc_id, win) set by construction). fan_out on the scan:
    # the r5 comment assumed "the exchange that follows repartitions
    # anyway", but that exchange runs AFTER the anchor-hash + substring
    # kernel — which therefore executed on the single-file scan's ONE
    # partition (measured 2.09 s -> 0.46 s for the window build at sf0.1).
    wins = (
        fan_out(docs, "doc_id").select("doc_id", text.alias("t"))
        .filter(F.length("t") >= SUBSTR_WINDOW)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        anchors,
                        lambda p: F.substring(F.col("t"), p, SUBSTR_WINDOW),
                    )
                )
            ).alias("win"),
        )
    )
    wins = materialize(wins)  # scanned by the df agg AND the flagged probe
    shared = (
        wins.groupBy("win")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 1)
        .select("win", F.lit(1).alias("s"))
    )
    # r6: ONE per-doc aggregation computes total and duplicated window
    # counts from the shared-flagged rows (count of non-null flags); the
    # r5 shape ran a left_semi probe plus TWO separate groupBy(doc_id)
    # passes over the window table for the same two numbers
    per_doc = (
        wins.join(shared, "win", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.count("s").alias("n_dup_windows"),
        )
    )
    # left join from docs: a doc shorter than WINDOW has ZERO windows and
    # must still appear (n_windows=0, NULL frac) — the repetition-stats
    # inner-join lesson
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
            # 0.0 for "windows but none shared"; NULL only when the doc is
            # too short to have any window at all
            F.round(
                F.coalesce(F.col("n_dup_windows"), F.lit(0)) / F.col("n_windows"), 6
            ).alias("dup_span_frac"),
        )
        .orderBy("doc_id")
    )


# explicit left-fold parenthesization ((a*31+b)*31+c)*31+d — must mirror
# _anchor_hash's fold exactly, not SQL's default a*31 + b*31 + ... precedence
_ANCHOR_HASH_SQL = "CAST(ascii(substr(t, CAST(u.p AS BIGINT), 1)) AS BIGINT)"
for _k in range(1, SUBSTR_SEED):
    _ANCHOR_HASH_SQL = (
        f"(({_ANCHOR_HASH_SQL}) * 31"
        f" + ascii(substr(t, CAST(u.p AS BIGINT) + {_k}, 1)))"
    )

Q_EXACT_SUBSTRING_SQL = f"""
WITH t AS (SELECT doc_id, {_REG_SQL} AS t FROM documents),
wins AS (
  SELECT DISTINCT doc_id,
         substr(t, CAST(u.p AS BIGINT), {SUBSTR_WINDOW}) AS win
  FROM t, UNNEST(range(1, length(t) - {SUBSTR_WINDOW} + 2)) AS u(p)
  WHERE length(t) >= {SUBSTR_WINDOW}
    AND (u.p = 1 OR substr(t, CAST(u.p AS BIGINT) - 1, 1) = ' ')
    AND {_ANCHOR_HASH_SQL} % {SUBSTR_ANCHOR_MOD} = 0
),
shared AS (SELECT win FROM wins GROUP BY win HAVING count(*) > 1),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows FROM wins GROUP BY doc_id),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
  FROM wins WHERE win IN (SELECT win FROM shared) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(tt.n_windows, 0) AS n_windows,
       COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
       round(COALESCE(p.n_dup_windows, 0) / tt.n_windows, 6) AS dup_span_frac
FROM (SELECT doc_id FROM documents) d
LEFT JOIN totals tt ON d.doc_id = tt.doc_id
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


DEDUP_SHADOW_QUERIES = {
    "q_incremental_dedup": (q_incremental_dedup, _incremental_oracle()),
    "q_exact_substring": (q_exact_substring, Q_EXACT_SUBSTRING_SQL),
}
