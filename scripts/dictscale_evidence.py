#!/usr/bin/env python
"""Dictionary-decode scaling evidence (BASELINE.md): bounded tokenpass and
WBS runtime growth under a REAL-SIZED vocabulary.

Round 4 added the at-scale knobs — ``tokenpass_dictionary(counts, topk)``
bounds the Graves DP, and ``WordLM.from_counts`` builds the WBS LM straight
from count tables — but nothing exercised them past the 37-word fixture
vocab. This script synthesizes a 50k-word vocabulary (deterministic random
words over the codec's letters, zipf-ish counts, GT words included with the
highest counts so decoding stays correct) and measures, on ONE real line
softmax from the committed fixtures:

* token passing per-line time at topk in {37-ish full fixture, 500, 2000,
  8000, 50000}: the DP is O(topk x states x frames) — the table shows the
  linear growth that makes the unbounded mode a per-line scale-killer and
  the topk bound the production setting;
* word-beam search per-line time at vocab sizes {1k, 10k, 50k}: the beam
  is width-capped and the LM serves prefixes from a tree, so growth must
  stay far below linear.

Both decodes must still return the ground truth at EVERY size (the GT words
outrank the distractors) — correctness under distractor load is asserted,
not just speed. Run on an idle box:

    python scripts/dictscale_evidence.py [sf_dir]
"""

from __future__ import annotations

import random
import string
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DISTRACTORS = 50_000


def synth_vocab(base_counts: dict, n_total: int, charset_letters: str) -> dict:
    """base vocab (GT words, highest counts) + deterministic random
    distractor words, zipf-ish counts strictly below the base minimum."""
    rng = random.Random(20260817)
    base_min = min(base_counts.values())
    counts = dict(base_counts)
    while len(counts) < n_total:
        w = "".join(
            rng.choice(charset_letters) for _ in range(rng.randint(3, 10))
        )
        if w not in counts:
            # zipf-ish: rank r gets ~ base_min * 0.99^sqrt(r), always < base
            counts[w] = max(1, int(base_min * 0.5 ** (1 + len(counts) / 20000)))
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    from calamari_spark.plans.extraction import (
        _fixture_glob,
        _get_recognizers,
        load_vocab,
        tokenpass_dictionary,
    )
    from calamari_spark.operators.ctc import (
        WordLM,
        token_passing_decode,
        word_beam_decode,
    )
    from calamari_spark.sources.pngio import decode_png

    media = _fixture_glob(sf_dir, "line_images")
    row = duckdb.sql(
        f"SELECT media_ref, png, gt FROM read_parquet('{media}')"
        " ORDER BY media_ref LIMIT 1"
    ).fetchone()
    ref, png, gt = row
    codec, recs = _get_recognizers(1)
    sm = recs[0].forward_single(decode_png(bytes(png)))  # blank-first [T, C]
    print(f"line {ref!r}: {sm.shape[0]} frames, gt = {gt!r}")

    letters = "".join(c for c in codec.charset if c in string.ascii_lowercase)
    base = load_vocab(sf_dir)
    big = synth_vocab(base, N_DISTRACTORS, letters)

    print("\n| decoder | dictionary | per-line (s) | output == GT |")
    print("|---|---|---|---|")

    for topk in (len(base), 500, 2000, 8000, N_DISTRACTORS):
        vocab = tokenpass_dictionary(big, topk)
        t0 = time.perf_counter()
        out = token_passing_decode(sm, codec.charset, vocab, blank=0)
        dt = time.perf_counter() - t0
        label = f"topk={topk}" + (" (full fixture)" if topk == len(base) else "")
        print(f"| tokenpass | {label} | {dt:.3f} | {out == gt} |")

    # word beam: the first word's softmax slice, exactly as
    # _wordlm_prefix_query slices it (inter-word gaps are blank runs >= 4)
    import numpy as np

    first = gt.split(" ")[0]
    charset = "".join(codec.charset[1:])  # labels 1..N; blank excluded
    word_chars = "".join(c for c in charset if c != " ")
    peaks = np.flatnonzero(sm.argmax(axis=1) != 0)
    hi = sm.shape[0]
    for a, c in zip(peaks, peaks[1:]):
        if c - a >= 4:
            hi = int(a) + 2
            break
    mat = np.concatenate([sm[:hi, 1:], sm[:hi, :1]], axis=1)  # blank-last

    for size in (1000, 10_000, N_DISTRACTORS):
        counts = dict(
            list(sorted(big.items(), key=lambda kv: (-kv[1], kv[0])))[:size]
        )
        counts.update(base)  # GT words always present
        lm = WordLM.from_counts(counts, charset, word_chars)
        t0 = time.perf_counter()
        out = word_beam_decode(mat, charset, lm, beam_width=10, use_ngrams=True)
        dt = time.perf_counter() - t0
        print(f"| word-beam | vocab={len(counts)} | {dt:.3f} | {out == first} |")


if __name__ == "__main__":
    main()
