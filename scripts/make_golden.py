#!/usr/bin/env python
"""Regenerate the committed golden fixtures (fixtures/golden/*.parquet).

Each listed query is deterministic by construction (pinned seeded weights,
seeded stub decoders, deterministic corruption + full tie orders, exact
integer-quantized float aggregation), so running it once at the driver's
check SF and committing the output is a legitimate oracle — the driver and
the oracle-parity pytest then verify every later distributed run reproduces
it value-for-value. Re-running this script must produce a no-op git diff;
a diff means a determinism regression.

Usage: python scripts/make_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"

GOLDEN_QUERIES = [
    "x_extract_cnn",
    "x_ctc_loss",
    "x_confusions",
    "x_avg_confidence",
    "x_multimodal_features",
    # UAX#9 run reversal over a deterministic Latin->Hebrew synthesis: no
    # DuckDB analog exists, but the output is a pure function of the corpus
    "q_bidi_display",
    # wide-schema shadow variants of x_multimodal_features (same seeded stub
    # decode, so the same golden-fixture legitimacy argument applies) and the
    # nested extended-prediction serialization (pinned seeded weights make the
    # positions tree value-deterministic, like x_extract_cnn's logits)
    "x_audio_features",
    "x_video_frames",
    "x_recognize_positions",
]


def main() -> None:
    from calamari_spark.plans.golden import write_golden
    from calamari_spark.plans.registry import QUERIES, SHADOW_QUERIES
    from calamari_spark.session import get_spark

    spark = get_spark("make_golden")
    for name in GOLDEN_QUERIES:
        fn, _ = QUERIES[name] if name in QUERIES else SHADOW_QUERIES[name]
        pdf = fn(spark, SF_DIR).toPandas()
        path = write_golden(name, pdf)
        print(f"{name}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
