"""Shared plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a frame that downstream plans reference MORE THAN ONCE.

    Spark inserts no ReusedExchange across separate subtrees that contain
    the same logical frame (verified: 0 ReusedExchange in the adaptive
    final plans of the LSH/jaccard/eval queries), so an expensive frame —
    an LSH signature table, a shingle set, a levenshtein map — referenced
    by N subtrees executes N times unless it is materialized first.
    Same-box A/B at sf0.1: q_ngram_jaccard_pairs 9.2s -> 3.9s,
    q_minhash_lsh_pairs 5.3s -> 3.6s.

    In this single-JVM harness the mechanism is ``localCheckpoint`` (eager,
    block-manager storage, no lineage fallback). On a real cluster with
    executor loss/decommissioning the non-fault-tolerant variant is NOT the
    right tool — there the analog is a durable intermediate (a reliable
    ``checkpoint()`` or writing the signature table to storage before
    banding, which production MinHash pipelines do anyway). This helper is
    the single switch point for that substitution.
    """
    return df.localCheckpoint()
