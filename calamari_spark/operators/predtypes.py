"""Prediction data model (reference: calamari_ocr/ocr/predict/params.py:12-60).

Plain dataclasses shaped for Arrow round-tripping: the Spark column type is
an array<struct> tree (no MapType — pandas UDFs handle arrays-of-structs
more robustly than maps).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class PredChar:
    char: str = ""
    label: int = 0
    probability: float = 0.0


@dataclass
class PredPos:
    chars: List[PredChar] = field(default_factory=list)
    local_start: int = 0
    local_end: int = 0
    global_start: int = 0
    global_end: int = 0
    global_start_ext: int = 0
    global_end_ext: int = 0


@dataclass
class Prediction:
    id: str = ""
    sentence: str = ""
    labels: List[int] = field(default_factory=list)
    positions: List[PredPos] = field(default_factory=list)
    logits: Optional[np.ndarray] = None
    total_probability: float = 0.0
    avg_char_probability: float = 0.0
    is_voted_result: bool = False

    def to_row(self) -> dict:
        """Arrow/Spark-friendly nested dict (logits dropped, like the
        reference's .json extended output, scripts/predict.py:160-166)."""
        return {
            "sentence": self.sentence,
            "labels": list(self.labels),
            "avg_char_probability": float(self.avg_char_probability),
            "is_voted_result": bool(self.is_voted_result),
            "positions": [
                {
                    "local_start": p.local_start,
                    "local_end": p.local_end,
                    "global_start": p.global_start,
                    "global_end": p.global_end,
                    "global_start_ext": p.global_start_ext,
                    "global_end_ext": p.global_end_ext,
                    "chars": [
                        {"char": c.char, "label": int(c.label), "probability": float(c.probability)}
                        for c in p.chars
                    ],
                }
                for p in self.positions
            ],
        }


PREDICTION_SPARK_TYPE = (
    "struct<sentence:string, labels:array<int>, avg_char_probability:double,"
    " is_voted_result:boolean,"
    " positions:array<struct<local_start:int, local_end:int, global_start:int,"
    " global_end:int, global_start_ext:int, global_end_ext:int,"
    " chars:array<struct<char:string, label:int, probability:double>>>>>"
)
