"""Shared plan utilities."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

# Backend switch for materialize(); settable per-process (job.py flag) or
# via the environment for test harnesses.
BACKEND_ENV = "CALAMARI_SPARK_MATERIALIZE"
DURABLE_DIR_ENV = "CALAMARI_SPARK_DURABLE_DIR"
MATERIALIZE_BACKENDS = ("local", "reliable", "parquet")


def _durable_dir(spark) -> str:
    """Root for durable intermediates: explicit env var, else the session's
    already-configured checkpoint dir, else a warehouse-adjacent scratch
    dir (single-box default; on a cluster this MUST be shared storage —
    HDFS/object store — which is exactly what the env var / job flag is
    for)."""
    d = os.environ.get(DURABLE_DIR_ENV)
    if d:
        return d
    existing = spark.sparkContext.getCheckpointDir()
    if existing is not None:
        return existing
    return os.path.join(os.getcwd(), "spark-warehouse", "_materialize")


def materialize(df: DataFrame, backend: str | None = None) -> DataFrame:
    """Materialize a frame that downstream plans reference MORE THAN ONCE.

    Spark inserts no ReusedExchange across separate subtrees that contain
    the same logical frame (verified: 0 ReusedExchange in the adaptive
    final plans of the LSH/jaccard/eval queries), so an expensive frame —
    an LSH signature table, a shingle set, a levenshtein map — referenced
    by N subtrees executes N times unless it is materialized first.
    Same-box A/B at sf0.1: q_ngram_jaccard_pairs 9.2s -> 3.9s,
    q_minhash_lsh_pairs 5.3s -> 3.6s.

    Backends (``backend`` arg, else $CALAMARI_SPARK_MATERIALIZE, default
    "local"):

    * ``local`` — ``localCheckpoint``: eager, block-manager storage, NO
      lineage fallback. Right for a single JVM; on a cluster a lost
      executor loses blocks unrecoverably.
    * ``reliable`` — Spark's fault-tolerant ``checkpoint()`` to the
      session checkpoint dir (set from $CALAMARI_SPARK_DURABLE_DIR when
      unset). Survives executor loss/decommissioning; the 100 TB setting.
    * ``parquet`` — write the frame to a durable scratch path and read it
      back (the write-before-band pattern production MinHash pipelines
      use anyway). Strongest: survives driver restart too, and the
      columnar read-back benefits from pruning/pushdown downstream.
    """
    backend = backend or os.environ.get(BACKEND_ENV, "local")
    if backend not in MATERIALIZE_BACKENDS:
        raise ValueError(
            f"materialize backend must be one of {MATERIALIZE_BACKENDS}, "
            f"got {backend!r}"
        )
    if backend == "local":
        return df.localCheckpoint()
    spark = df.sparkSession
    if backend == "reliable":
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(os.path.join(_durable_dir(spark), "ckpt"))
        return df.checkpoint()
    # parquet: one durable intermediate per call, unique path
    path = os.path.join(_durable_dir(spark), f"mat-{uuid.uuid4().hex}")
    df.write.parquet(path)
    return spark.read.parquet(path)


def fan_out(df: DataFrame, *cols: str, per_core: int = 2) -> DataFrame:
    """Explicit hash repartition pinning a compute-bound map stage's
    parallelism to the cluster's cores (same rationale as the OCR stage,
    extraction.recognize_media): a single-file parquet scan arrives as ONE
    partition and a map-only plan never re-spreads it, so an expensive
    per-row kernel (levenshtein, image decode) runs on one core; AQE's
    byte-based coalescing would likewise serialize small-but-expensive
    stages, but user-specified repartitions are exempt. A/B at sf0.1:
    the q_cer_eval levenshtein map 3.48s -> 0.94s on local[32].

    Pass key columns when a deterministic partitioning key exists
    (preferred); bare round-robin otherwise (Spark sorts before
    round-robin repartition, so retries stay deterministic)."""
    n = df.sparkSession.sparkContext.defaultParallelism * per_core
    return df.repartition(n, *cols) if cols else df.repartition(n)
