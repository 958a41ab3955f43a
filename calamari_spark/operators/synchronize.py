"""Recursive multi-text alignment by longest common substring.

Re-derivation of the reference's synchronizer semantics
(reference: calamari_ocr/ocr/dataset/textprocessors/text_synchronizer.py:50-144):
given N sequences, find the longest substring common to all (progressively
intersecting pairwise matches against sequence 0, earliest-position
tie-break), split each sequence into [left | match | right], and recurse on
the non-match flanks. The result is an ordered list of segments; in a
"match" segment all N slices are equal.

Used by the sequence voter, the confidence voter, and the evaluator's
confusion extraction — all per-line, inside Arrow-batched UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence


@dataclass
class Segment:
    """Per text i: slice [starts[i], stops[i]] inclusive, lengths[i] chars."""

    starts: List[int]
    stops: List[int]
    lengths: List[int]
    match: bool = False

    def slice_of(self, texts: Sequence[Sequence], i: int):
        return texts[i][self.starts[i] : self.starts[i] + self.lengths[i]]

    def get_text(self, texts: Sequence[Sequence]) -> list:
        return [self.slice_of(texts, i) for i in range(len(texts))]

    def is_valid(self) -> bool:
        return any(l > 0 for l in self.lengths)


def _longest_common(c1, lo1: int, hi1: int, c2, lo2: int, hi2: int):
    """Longest common substring of c1[lo1..hi1] and c2[lo2..hi2]
    (inclusive bounds). Ties resolve to the earliest start in c1, then the
    earliest in c2 (scan order; only a strictly longer match replaces)."""
    best_len, best1, best2 = 0, 0, 0
    for s1 in range(lo1, hi1 - best_len + 1):
        for s2 in range(lo2, hi2 - best_len + 1):
            if c1[s1] != c2[s2]:
                continue
            i1, i2 = s1 + 1, s2 + 1
            while i1 <= hi1 and i2 <= hi2 and c1[i1] == c2[i2]:
                i1 += 1
                i2 += 1
            if i1 - s1 > best_len:
                best_len, best1, best2 = i1 - s1, s1, s2
    return best_len, best1, best2


def synchronize(texts: Sequence[Sequence]) -> List[Segment]:
    """Align N sequences; returns ordered segments covering all inputs."""
    n = len(texts)
    root = Segment(
        starts=[0] * n,
        stops=[len(t) - 1 for t in texts],
        lengths=[len(t) for t in texts],
    )
    if not root.is_valid():
        return []
    segments = [root]

    def recurse(idx: int) -> None:
        seg = segments[idx]
        if any(l == 0 for l in seg.lengths):
            return
        # progressively intersect: match texts[0]'s window against each
        # other text, narrowing the common substring
        starts = [0] * n
        starts[0] = seg.starts[0]
        length = seg.lengths[0]
        for i in range(1, n):
            length, new0, starts[i] = _longest_common(
                texts[0], starts[0], starts[0] + length - 1,
                texts[i], seg.starts[i], seg.stops[i],
            )
            if length == 0:
                return
            shift = new0 - starts[0]
            if shift > 0:
                for j in range(i):
                    starts[j] += shift
        # split seg into left | match | right
        left = Segment(
            starts=[seg.starts[i] for i in range(n)],
            stops=[starts[i] - 1 for i in range(n)],
            lengths=[starts[i] - seg.starts[i] for i in range(n)],
        )
        right = Segment(
            starts=[starts[i] + length for i in range(n)],
            stops=[seg.stops[i] for i in range(n)],
            lengths=[seg.stops[i] - (starts[i] + length - 1) for i in range(n)],
        )
        seg.starts = starts
        seg.stops = [starts[i] + length - 1 for i in range(n)]
        seg.lengths = [length] * n
        seg.match = True

        pos = segments.index(seg)
        if left.is_valid():
            segments.insert(pos, left)
            pos += 1
        if right.is_valid():
            segments.insert(pos + 1, right)
        if pos - 1 >= 0:
            recurse(pos - 1)
        pos = segments.index(seg)
        if pos + 1 < len(segments):
            recurse(pos + 1)

    recurse(0)
    return segments
