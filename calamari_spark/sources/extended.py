"""Extended-prediction sink/scan: the `.pred` / `.json` formats.

Re-derivation of the reference's extended prediction output
(reference: calamari_ocr/scripts/predict.py:151-175 — `.pred` is
zlib-compressed JSON of the Predictions tree, `.json` the same minus
logits; scan at datareader/extended_prediction.py:38-77, which picks the
``voted`` prediction back out).

Spark shape: the nested positions column serializes with native
``to_json`` (logits were never materialized in the column, matching the
"minus logits" rule); the zlib wrap runs in a pandas UDF over the JSON
string column. Round-trip is exact.
"""

from __future__ import annotations

import json
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

# the nested prediction payload type produced by recognize_media
POSITIONS_TYPE = (
    "array<struct<char:string, probability:double, global_start:int,"
    " global_end:int, global_start_ext:int, global_end_ext:int,"
    " alts:array<struct<char:string, probability:double>>>>"
)


def to_extended_json(predictions: DataFrame) -> DataFrame:
    """-> (media_ref, ext_json): the `.json` flavor (native to_json)."""
    payload = F.to_json(
        F.struct(
            F.col("media_ref").alias("id"),
            F.col("sentence"),
            F.col("avg_char_probability"),
            F.col("n_folds"),
            F.col("positions"),
        )
    )
    return predictions.select("media_ref", payload.alias("ext_json"))


@pandas_udf("binary")
def _deflate(s: pd.Series) -> pd.Series:
    return s.map(lambda v: zlib.compress(v.encode("utf-8"), 1) if v is not None else None)


@pandas_udf("string")
def _inflate(b: pd.Series) -> pd.Series:
    return b.map(lambda v: zlib.decompress(bytes(v)).decode("utf-8") if v is not None else None)


def to_extended_pred(predictions: DataFrame) -> DataFrame:
    """-> (media_ref, pred): the zlib `.pred` flavor."""
    j = to_extended_json(predictions)
    return j.select("media_ref", _deflate(F.col("ext_json")).alias("pred"))


def read_extended_pred(preds: DataFrame) -> DataFrame:
    """(media_ref, pred) -> parsed nested columns (the scan side)."""
    schema = (
        "struct<id:string, sentence:string, avg_char_probability:double,"
        f" n_folds:int, positions:{POSITIONS_TYPE}>"
    )
    parsed = preds.select(
        "media_ref", F.from_json(_inflate(F.col("pred")), schema).alias("p")
    )
    return parsed.select(
        "media_ref",
        F.col("p.sentence").alias("sentence"),
        F.col("p.avg_char_probability").alias("avg_char_probability"),
        F.col("p.n_folds").alias("n_folds"),
        F.col("p.positions").alias("positions"),
    )
