"""Training-data-pipeline operators: plan shape at scale + sequential
packing semantics (the cross-engine value check lives in
test_oracle_parity.py, which auto-discovers the three shadow queries)."""

import pandas as pd
from pyspark.sql import functions as F

from calamari_spark.plans.pipelineplans import (
    N_PACK_BUCKETS,
    PACK_SCHEMA,
    PACK_TARGET,
    pack_kernel,
    pack_stream_kernel,
    q_decontaminate,
    q_pack_sequences,
)
from calamari_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_benchmark_set(spark):
    """The benchmark gram set is tiny next to the corpus; at 100 TB the
    probe must be a map-side broadcast hash join, never a corpus shuffle."""
    plan = _plan(q_decontaminate(spark, SF))
    # the shingle-vs-benchmark probe is the corpus-scaled join and must be
    # a broadcast hash probe (bench is explicitly F.broadcast'ed); the
    # final zero-hit restore join is doc_id-keyed and deliberately NOT
    # forced — hits is corpus-scaled in the worst case, so Catalyst picks
    # its strategy by size there
    assert "BroadcastHashJoin" in plan


def test_decontaminate_flags_benchmark_members(spark):
    out = q_decontaminate(spark, SF).toPandas()
    members = out[out.doc_id % 97 == 0]
    assert len(members) > 0
    # every benchmark contributor contains its own gram
    assert bool((members.contaminated).all())
    # and the corpus is not all-contaminated (zero-hit path exercised)
    assert bool((~out.contaminated).any())


def test_pack_sequences_respects_target_and_is_dense(spark):
    out = q_pack_sequences(spark, SF).toPandas()
    # no sequence exceeds the target unless a single doc does
    fill = out.groupby(["bucket", "seq_no"])["n_tokens"].sum()
    docmax = out.groupby(["bucket", "seq_no"])["n_tokens"].max()
    over = fill[fill > PACK_TARGET]
    assert over.empty or (docmax[over.index] >= over).all()
    # offsets are the exclusive running sum within (bucket, seq_no)
    out = out.sort_values("doc_id")
    for _, g in out.groupby(["bucket", "seq_no"]):
        run = 0
        for _, r in g.iterrows():
            assert r["offset"] == run
            run += r["n_tokens"]


def test_pack_overflow_doc_starts_new_sequence(spark):
    """A document bigger than the target occupies its own sequence and the
    next document starts a fresh one — the greedy rule both engines
    implement must hold at the edge the corpus never hits. Drives the SAME
    pack_kernel q_pack_sequences applies, through the same
    groupBy(bucket).applyInPandas shape."""
    df = spark.createDataFrame(
        [(0, "w " * 600), (8, "x " * 10), (16, "y " * 10)],
        "doc_id long, text string",
    )
    toks = df.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(N_PACK_BUCKETS)).cast("int").alias("bucket"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tokens"),
    )
    res = (
        toks.groupBy("bucket")
        .applyInPandas(pack_kernel, PACK_SCHEMA)
        .orderBy("doc_id")
        .toPandas()
    )
    # doc 0 (600 tokens) owns seq 0 alone; docs 8 and 16 pack into seq 1
    assert list(res.seq_no) == [0, 1, 1]
    assert list(res.offset) == [0, 0, 10]

def test_pack_kernel_invariants_random():
    """Property test: for ANY token-length multiset, the greedy pack is
    target-respecting (no sequence over PACK_TARGET unless one doc alone
    is), dense (a new sequence starts only on overflow), and offsets are
    the exclusive running sums."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from calamari_spark.plans.pipelineplans import PACK_TARGET, pack_kernel

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=60))
    def run(lengths):
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(lengths)),
                "bucket": [0] * len(lengths),
                "n_tokens": lengths,
            }
        )
        out = pack_kernel(pdf)
        fills = out.groupby("seq_no")["n_tokens"].sum()

        sizes = out.groupby("seq_no")["n_tokens"].count()
        # target respected unless a single doc alone overflows
        for s in fills.index:
            assert fills[s] <= PACK_TARGET or sizes[s] == 1, (s, fills[s], sizes[s])
        # dense: each sequence after the first begins because the previous
        # could not fit its first doc
        seq_first = out.groupby("seq_no").first()
        prev_fill = None
        for s in sorted(fills.index):
            if prev_fill is not None:
                assert prev_fill + seq_first.loc[s, "n_tokens"] > PACK_TARGET
            prev_fill = fills[s]
        # offsets are exclusive running sums
        for s, g in out.groupby("seq_no"):
            run_sum = 0
            for _, r in g.sort_values("doc_id").iterrows():
                assert r["offset"] == run_sum
                run_sum += r["n_tokens"]

    run()


def test_repetition_stats_keeps_sub_bigram_docs(spark, tmp_path):
    """A 1-word document has zero bigrams; it must still get a quality row
    (n_bigrams=0, NULL top_bigram_frac) in BOTH engines — an inner join
    dropped it identically on both sides, so only this edge test can see
    the hole."""
    import duckdb

    from calamari_spark.plans.pipelineplans import Q_REPETITION_SQL, q_repetition_stats

    docs = spark.createDataFrame(
        [(1, "word"), (2, "a a b b a a b b"), (3, "x y")],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = q_repetition_stats(spark, sf_dir).toPandas().set_index("doc_id")
    assert set(out.index) == {1, 2, 3}
    assert out.loc[1, "n_bigrams"] == 0
    assert pd.isna(out.loc[1, "top_bigram_frac"])
    # doc 2: lines ["a a b b a a b b"] (one 8-word line) -> no dup lines;
    # bigrams: 7 total; "a a"/"a b"/"b b" each appear 2x, "b a" once
    assert out.loc[2, "n_bigrams"] == 7
    assert out.loc[2, "top_bigram_count"] == 2

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    ddf = con.execute(Q_REPETITION_SQL).df().set_index("doc_id")
    assert set(ddf.index) == {1, 2, 3}
    assert ddf.loc[1, "n_bigrams"] == 0
    assert pd.isna(ddf.loc[1, "top_bigram_frac"])


def test_pii_redact_catches_corpus_text_pii(spark, tmp_path):
    """PII inside the document text itself (not just the synthesized
    page suffix) must be counted and redacted identically in both
    engines — including an email whose domain is IP-like and digits that
    must NOT match (version strings, years)."""
    import duckdb

    from calamari_spark.plans.pipelineplans import Q_PII_SQL, q_pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org or 212-555-0142 now"),
            (2, "server 192.168.001.250 at port 8080 since 1999 v2.5"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = q_pii_redact(spark, sf_dir).toPandas().set_index("doc_id")
    # every row carries the 1 synthesized email/phone/ip; doc 1 adds one
    # email + one phone of its own, doc 2 adds one dotted-quad
    assert out.loc[1, "n_emails"] == 2 and out.loc[1, "n_phones"] == 2
    assert out.loc[2, "n_ips"] == 2
    assert out.loc[3, ["n_emails", "n_phones", "n_ips"]].tolist() == [1, 1, 1]
    # "v2.5" / "1999" / "8080" must not be redacted: chars_removed equals
    # exactly the delta of the real matches, which is positive everywhere
    assert (out.chars_removed > 0).all()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    ddf = con.execute(Q_PII_SQL).df().set_index("doc_id")
    for c in ("n_emails", "n_phones", "n_ips", "redacted_md5", "chars_removed"):
        assert ddf[c].tolist() == out[c].tolist(), c


def test_corpus_datacard_known_values(spark, tmp_path):
    """Datacard semantics on a hand-checkable corpus: 4 docs, one exact-dup
    pair, two predicted languages."""
    import duckdb

    from calamari_spark.plans.pipelineplans import (
        _datacard_sql,
        q_corpus_datacard,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat is on a mat today friend", "en"),
            (2, "the cat is on a mat today friend", "en"),  # exact dup of 1
            (3, "el la de gato bonito la casa aqui", "es"),
            (4, "completely unique words without markers", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    out = q_corpus_datacard(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.n_docs == 4
    assert r.n_dup_docs == 2 and abs(r.dup_frac - 0.5) < 1e-9
    assert r.n_langs == 3  # en, es, unknown
    assert r.majority_lang == "en" and abs(r.majority_share - 0.5) < 1e-9
    assert r.total_tokens == 8 * 3 + 5
    assert 0 < r.mean_quality <= 1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    ddf = con.execute(_datacard_sql()).df()
    for c in out.columns:
        assert str(ddf.iloc[0][c]) == str(r[c]), c


def test_pack_stream_matches_whole_bucket_reference(spark):
    """The streaming pack (hash-partition + sort + iterator mapInPandas,
    O(batch) memory) must emit EXACTLY what the whole-bucket reference
    kernel emits — including with Arrow batches forced far smaller than a
    bucket, which proves the (bucket, seq_no, fill) state carries across
    batch boundaries."""
    ref = (
        load_table(spark, "documents", SF)
        .select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(N_PACK_BUCKETS)).cast("int").alias("bucket"),
            F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tokens"),
        )
    )
    # the corpus token column in q_pack_sequences uses the regularizer;
    # compare the full query against itself under tiny batches instead of
    # re-deriving the token counts here
    normal = q_pack_sequences(spark, SF).toPandas()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        tiny = q_pack_sequences(spark, SF).toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert normal.equals(tiny)
    # and the streaming result equals the whole-bucket reference fold,
    # bucket by bucket, on the same token table
    got = (
        ref.repartition(8, "bucket")
        .sortWithinPartitions("bucket", "doc_id")
        .mapInPandas(pack_stream_kernel, PACK_SCHEMA)
        .orderBy("doc_id")
        .toPandas()
    )
    want = (
        ref.groupBy("bucket")
        .applyInPandas(pack_kernel, PACK_SCHEMA)
        .orderBy("doc_id")
        .toPandas()
    )
    assert got.equals(want)


def test_pack_sequences_has_no_group_materialization(spark):
    """The executed plan must stream (MapInPandas over a partition-sorted
    exchange), never materialize a whole bucket as one pandas group
    (FlatMapGroupsInPandas) — the r5 shape that held corpus/8 rows in one
    frame."""
    plan = (
        q_pack_sequences(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" in plan
    assert "Sort" in plan  # the within-partition (bucket, doc_id) sort
