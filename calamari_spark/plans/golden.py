"""Committed golden-fixture oracles for deterministic-but-not-SQL queries.

Queries whose values are model internals (pinned seeded weights, seeded
stub decoders, recursive LCS alignment) have no independent DuckDB
formula, but their outputs are DETERMINISTIC BY CONSTRUCTION — so the
committed expected output itself is a legitimate oracle:

    oracle = SELECT * FROM read_parquet('fixtures/golden/<name>.parquet')

The fixture is produced once by ``scripts/make_golden.py`` at the driver's
check SF (0.01) and committed; the driver then verifies that the
distributed run reproduces it value-for-value (attesting determinism under
partitioning/retries and the Spark-side plumbing — not OCR quality, which
the GT-derivable oracles cover). Regenerating with the script must be a
no-op diff; the oracle-parity pytest re-runs every one of these per test
run, so drift fails locally first.
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GOLDEN_DIR = os.path.join(REPO_ROOT, "fixtures", "golden")


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.parquet")


def golden_oracle(name: str) -> str:
    return f"SELECT * FROM read_parquet('{golden_path(name)}')"


def write_golden(name: str, pdf) -> str:
    """Write a pandas frame as the committed fixture (single parquet file,
    no Spark part-file layout — DuckDB reads it directly)."""
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = golden_path(name)
    pdf.to_parquet(path, index=False)
    return path
