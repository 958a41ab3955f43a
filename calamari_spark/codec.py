"""Charset codec: bidirectional char <-> label mapping with blank at index 0.

Semantics re-derived from the reference codec
(reference: calamari_ocr/ocr/codec.py:54-283): the charset is a sorted list
of distinct characters with the CTC blank inserted as '' at label 0;
``encode``/``decode`` map strings to int label sequences and back;
``extend``/``shrink``/``align`` support transfer-learning charset surgery
(union / difference / both).

In the Spark engine the codec is a tiny driver-side object broadcast into
pandas-UDF closures; it is persisted as JSON next to the model weights.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, List


class Codec:
    def __init__(self, charset: Iterable[str]):
        charset = list(charset)
        if len(charset) == 0:
            raise ValueError("Got empty charset")
        if charset[0] != "":
            charset = [""] + [c for c in charset if c != ""]  # blank first, label 0
        self.charset: List[str] = charset
        self.code2char = {i: c for i, c in enumerate(self.charset)}
        self.char2code = {c: i for i, c in enumerate(self.charset)}

    # -- construction -----------------------------------------------------
    @classmethod
    def from_texts(cls, texts: Iterable[str]) -> "Codec":
        """Distinct-char aggregation over a corpus (the reference computes
        this at training time; reference: calamari_ocr/ocr/codec.py:59-106).
        In Spark this is ``select(explode(split(text,''))).distinct()``; this
        helper is the driver-side equivalent for small fixture corpora."""
        chars = set()
        for t in texts:
            chars.update(t)
        return cls(sorted(chars))

    @classmethod
    def load(cls, path: str | Path) -> "Codec":
        with open(path) as f:
            return cls(json.load(f)["charset"])

    def save(self, path: str | Path) -> None:
        with open(path, "w") as f:
            json.dump({"charset": self.charset}, f, ensure_ascii=False)

    # -- mapping -----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.charset)

    def encode(self, s: str) -> List[int]:
        """Unknown chars are dropped (the reference substitutes via a
        fallback map or raises; for inference-decode paths drop is safe)."""
        return [self.char2code[c] for c in s if c in self.char2code]

    def decode(self, labels: Iterable[int]) -> List[str]:
        return [self.code2char[l] for l in labels]

    # -- charset surgery (set ops; reference: codec.py:195-283) ------------
    def extend(self, other_chars: Iterable[str]) -> List[int]:
        """Union: add unseen chars at the end; returns the new labels."""
        added = []
        for c in other_chars:
            if c not in self.char2code:
                label = len(self.charset)
                self.charset.append(c)
                self.code2char[label] = c
                self.char2code[c] = label
                added.append(label)
        return added

    def shrink(self, keep_chars: Iterable[str]) -> List[int]:
        """Difference: drop chars not in keep set (blank always kept);
        returns list mapping new label -> old label."""
        keep = set(keep_chars)
        new_charset = [c for i, c in enumerate(self.charset) if i == 0 or c in keep]
        mapping = [self.char2code[c] for c in new_charset]
        self.__init__(new_charset)
        return mapping

    def align(self, other_chars: Iterable[str]) -> List[int]:
        """Shrink to the intersection then extend with the new chars."""
        self.shrink(other_chars)
        return self.extend(other_chars)


# 66-char test codec mirroring the reference checkpoint charset shape
# (reference: test/models/best.ckpt.json scenario.data.codec.charset);
# blank '' at 0, then printable subset.
DEFAULT_CHARSET = [""] + list(" '(),-.012479:") + list("ABCDEFGHIJLMNOPRSTUVW") + list(
    "[]"
) + list("abcdefghijklmnopqrstuvwxyz")


def default_codec() -> Codec:
    return Codec(DEFAULT_CHARSET)
