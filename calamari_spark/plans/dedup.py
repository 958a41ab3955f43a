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

from pyspark.sql import DataFrame, SparkSession, Window as W
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

    Buckets of size <= cap self-join as usual. A DEGENERATE bucket (mass-
    duplicated boilerplate: at 10^12 docs one hot band key otherwise makes
    an O(b^2) join partition before distinct — the classic skew blow-up
    that MAX_DF already prevents on the shingle join) instead emits STAR
    pairs to the bucket's min id: b-1 edges, same connected components.
    The star keeps every bucket member reachable from the minimum, so
    downstream cluster resolution (connected_components) is unchanged for
    true duplicate clusters — their pairwise similarity is maximal, so the
    post-join similarity filter passes star edges exactly like full edges.
    Pair-level RECALL above the cap is intentionally reduced (b-1 of
    b(b-1)/2 pairs); the DuckDB oracle implements the identical scheme.
    Bucket stats come from one window over (band, key) — the same
    partitioning the self-join shuffles to anyway."""
    w = W.partitionBy("band", "key")
    # materialized: referenced by the normal self-join (both sides) AND the
    # star-pair branch — three window executions otherwise (see materialize)
    stats = materialize(
        bands.select(
            F.col(id_col),
            "band",
            "key",
            F.count(F.lit(1)).over(w).alias("bsize"),
            F.min(id_col).over(w).alias("bmin"),
        )
    )
    normal = stats.filter(F.col("bsize") <= cap).select(id_col, "band", "key")
    a, b = normal.alias("a"), normal.alias("b")
    normal_pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(F.col(f"a.{id_col}").alias(out_a), F.col(f"b.{id_col}").alias(out_b))
    star_pairs = stats.filter(
        (F.col("bsize") > cap) & (F.col(id_col) != F.col("bmin"))
    ).select(F.col("bmin").alias(out_a), F.col(id_col).alias(out_b))
    return normal_pairs.unionByName(star_pairs).distinct()


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


def _shingles(docs: DataFrame) -> DataFrame:
    """Word 3-gram shingles, one row per OCCURRENCE — deliberately no
    distinct: the only consumer is the min-hash signature aggregation, and
    min over a multiset equals min over its support, so deduplicating here
    would buy nothing and cost a full shuffle of every shingle row (the
    oracle's DISTINCT is likewise result-neutral)."""
    from calamari_spark.plans.common import fan_out

    # pin the regularize+shingle map's parallelism (see fan_out: a
    # single-file scan otherwise runs the whole kernel on one core); every
    # downstream stage (minhash agg, jaccard join) inherits the spread
    words = fan_out(docs, "doc_id").select(
        "doc_id", F.split(_regularized_col(F.col("text")), " ").alias("w")
    )
    n = F.size("w") - 2
    return (
        words.filter(n > 0)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - 1),
                    lambda i: F.concat_ws(" ", F.col("w")[i], F.col("w")[i + 1], F.col("w")[i + 2]),
                )
            ).alias("sh"),
        )
    )


_SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS sh
  FROM (
    SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
    FROM (SELECT doc_id, string_split({_REG_SQL}, ' ') AS w FROM documents)
    WHERE len(w) >= 3
  )
"""


def minhash_pairs(docs: DataFrame, cap: int = HOT_BUCKET_CAP) -> DataFrame:
    """Near-dup pairs via MinHash signatures + banded LSH candidate join.

    One shuffle builds signatures (groupBy doc), one shuffle buckets bands,
    one joins candidates back to signatures. No cross join anywhere, and
    degenerate band buckets are star-reduced (banded_candidates)."""
    sh = _shingles(docs)

    # referenced by the band bucketing AND both sides of the similarity
    # join — without materialization the shingle+16-md5 pipeline (the
    # expensive half) executes once per subtree (see materialize)
    sig = materialize(
        sh.groupBy("doc_id").agg(
            *[
                F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
                for i in range(N_HASHES)
            ]
        )
    )
    n_bands = N_HASHES // BAND_ROWS
    bands = sig.select(
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


def _minhash_parts() -> tuple:
    """(ctes, pair_select) shared by the pair oracle and the cluster oracle."""
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
    matches = " + ".join(
        f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
    )
    ctes = f"""shingles AS ({_SHINGLES_SQL}),
sig AS (
  SELECT doc_id,
         {hash_cols}
  FROM shingles GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band, key
  FROM sig, (VALUES {band_rows}) AS v(band, key)
),
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


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Resolve candidate pairs (doc_a, doc_b) to clusters: every member gets
    the cluster's min doc_id as its label. Iterative min-label propagation —
    per round, one shuffle join (edges x labels) + one groupBy; rounds =
    graph diameter, which for near-dup clusters is tiny (dup clusters are
    dense). Each round localCheckpoints to cut lineage so the plan stays
    linear at any scale; convergence is an exact no-change fixpoint.

    This is the keeper-assignment step every training-data dedup pipeline
    needs after LSH emits pairs (the reference stops at pair level, so this
    is an LLM-pipeline extension, not reference parity)."""
    # symmetrize in ONE subtree (explode of both directions), not a
    # self-union whose two branches would each run the pair pipeline; the
    # materialization also bounds lineage for the iteration below
    edges = materialize(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    )
    # Each round's labels table is corpus-sized; without explicit release
    # the loop pins R copies in the block manager (at 10^12 docs that is
    # the job's OOM). Track the RDD ids each round's localCheckpoint
    # creates and unpersist ONLY those once the next round has consumed
    # them — never other frames (a foreign localCheckpoint'ed RDD cannot
    # recompute after unpersist, so a blanket sweep would break concurrent
    # queries).
    sc = pairs.sparkSession.sparkContext

    def _pinned_ids():
        try:
            jmap = sc._jvm.scala.collection.JavaConverters.mapAsJavaMapConverter(
                sc._jsc.sc().getPersistentRDDs()
            ).asJava()
            return {e.getKey(): e.getValue() for e in jmap.entrySet()}
        except Exception:
            return {}

    import os

    from calamari_spark.plans.common import BACKEND_ENV

    backend = os.environ.get(BACKEND_ENV, "local")

    def _checkpoint_tracked(df: DataFrame):
        if backend != "local":
            # durable rounds (reliable checkpoint / parquet) live as files,
            # not pinned blocks — nothing to track or release, and a lost
            # executor replays from storage (the 100 TB setting)
            return materialize(df, backend), set()
        before = set(_pinned_ids())
        out = df.localCheckpoint()
        created = {i for i in _pinned_ids() if i not in before}
        return out, created

    def _release(ids) -> None:
        pinned = _pinned_ids()
        for i in ids:
            rdd = pinned.get(i)
            if rdd is not None:
                try:
                    rdd.unpersist(False)
                except Exception:
                    pass

    labels, own_prev = _checkpoint_tracked(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    for _ in range(max_iter):
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
        new_labels, own_new = _checkpoint_tracked(
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                new_label.alias("label"),
                (new_label < F.col("label")).alias("changed"),
            )
        )
        # the new round is materialized (localCheckpoint is eager): the
        # previous round's blocks are dead weight from here on
        _release(own_prev)
        own_prev = own_new
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    else:
        # wrong keepers are worse than a failed job: a cluster whose graph
        # diameter exceeds max_iter would silently keep non-minimal labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
            " (a duplicate chain longer than max_iter?); raise max_iter"
        )
    return labels.select("doc_id", F.col("label").alias("keeper"))


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
    1 iff more (distinct) words vote 1 than 0 at position j. One groupBy.
    Also carries the whole-document md5 fingerprint (q_fingerprint merged
    here — both are per-doc signature columns; the standalone query remains
    in SHADOW_QUERIES), joined back from the doc scan as a pure map —
    broadcast-free because both sides are keyed by doc_id pre-shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    # (no fan_out: the md5/h16 parse runs AFTER the distinct's shuffle, so
    # it is already parallel; spreading the cheap regularize+explode costs
    # an extra exchange for nothing — A/B'd slower at sf0.1)
    words = docs.select(
        "doc_id",
        F.explode(F.split(_regularized_col(F.col("text")), " ")).alias("word"),
    ).filter(F.col("word") != "").distinct()
    # ONE hex parse per word (the md5's first 16 bits as an int) — h16
    # materializes in the pre-aggregate projection, so the md5 runs once
    # per word instead of once per bit; per-bit votes become shift/mask
    # terms inside the aggregate. vote sum s_j = 2*ones_j - n_words is
    # value-identical to summing +/-1 votes.
    h16 = F.conv(F.substring(F.md5(F.col("word")), 1, 4), 16, 10).cast("int")
    per_word = words.select("doc_id", h16.alias("h16"))
    agg = per_word.groupBy("doc_id").agg(
        *[
            (
                F.sum(F.shiftright(F.col("h16"), SIMHASH_BITS - 1 - j).bitwiseAND(F.lit(1))) * 2
                - F.count(F.lit(1))
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    simhash = sum(
        (F.col(f"s{j}") > 0).cast("int") * F.lit(1 << (SIMHASH_BITS - 1 - j))
        for j in range(SIMHASH_BITS)
    )
    fp = docs.select(
        "doc_id", F.md5(F.lower(_regularized_col(F.col("text")))).alias("fingerprint")
    )
    return (
        agg.select("doc_id", simhash.cast("int").alias("simhash"))
        .join(fp, "doc_id")
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


DEDUP_QUERIES = {
    "q_minhash_lsh_pairs": (q_minhash_lsh_pairs, _minhash_oracle()),
    "q_dedup_clusters": (q_dedup_clusters, _clusters_oracle()),
    "q_simhash": (q_simhash, _simhash_oracle()),
}
