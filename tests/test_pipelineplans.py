"""Training-data-pipeline operators: plan shape at scale + sequential
packing semantics (the cross-engine value check lives in
test_oracle_parity.py, which auto-discovers the three shadow queries)."""

from pyspark.sql import functions as F

from calamari_spark.plans.pipelineplans import (
    N_PACK_BUCKETS,
    PACK_SCHEMA,
    PACK_TARGET,
    pack_kernel,
    q_decontaminate,
    q_pack_sequences,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_benchmark_set(spark):
    """The benchmark gram set is tiny next to the corpus; at 100 TB the
    probe must be a map-side broadcast hash join, never a corpus shuffle."""
    plan = _plan(q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the corpus side must not sort-merge against the benchmark set
    assert "SortMergeJoin" not in plan


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
