"""Codec-embedded transcript container — the HDF5 dataset analog.

Re-derivation of the reference's Hdf5 reader/writer semantics
(reference: calamari_ocr/ocr/dataset/datareader/hdf5/reader.py:47-134):
each container carries its OWN codec (a list of codepoints) and stores
transcripts as variable-length int arrays indexing that codec; reading
decodes ints -> chars through the file's codec, storing predictions
re-encodes chars -> ints via codec.index (raising on unknown chars, like
the reference's list.index). Images ride along as flat arrays + dims
(reader.py:113-124 reshapes on read).

h5py is absent in this environment, so the physical layout is a parquet
directory per container: ``meta.parquet`` (one row: the codec) +
``data.parquet`` (id, transcript int array, optional image bytes + dims).
The decode/encode run JVM-side (transform + element_at over a codec map
literal — the codec is file-level metadata, never a join), so the scan
scales like any parquet scan.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _codec_of(df: DataFrame, text_col: str = "text") -> List[str]:
    """Sorted distinct chars over the container's texts — the embedded
    codec (reference stores codepoints; we keep chars, writing ords)."""
    rows = (
        df.select(F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    return sorted(r["ch"] for r in rows)


def _encode_col(text_col, codec: List[str]):
    """chars -> codec indices, JVM-side. Unknown chars become NULL inside
    the array; callers raise on them like the reference's codec.index."""
    m = F.create_map(*[x for i, c in enumerate(codec) for x in (F.lit(c), F.lit(i))])
    chars = F.filter(F.split(text_col, ""), lambda c: c != F.lit(""))
    return F.transform(chars, lambda c: m[c])


def _decode_col(transcript_col, codec: List[str]):
    """codec indices -> string, JVM-side (reader.py:105,125 semantics)."""
    arr = F.array(*[F.lit(c) for c in codec])
    return F.array_join(
        F.transform(transcript_col, lambda i: F.element_at(arr, i + 1)), ""
    )


def _write_container(encoded: DataFrame, codec: List[str], path: str,
                     err: str, partition_by: Optional[str] = None) -> None:
    """Shared container writer: validate the encoding is lossless (a char
    outside the codec encodes to NULL, matching the reference's ValueError
    from codec.index), then write data + meta. The encoded frame is
    localCheckpoint'ed so its (possibly OCR-heavy) upstream pipeline runs
    ONCE across the validation count and the write."""
    spark = encoded.sparkSession
    encoded = encoded.localCheckpoint()
    n_bad = encoded.filter(F.exists("transcript", lambda v: v.isNull())).count()
    if n_bad:
        raise ValueError(f"{n_bad} {err}")
    writer = encoded.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(os.path.join(path, "data.parquet"))
    meta = spark.createDataFrame([([ord(c) for c in codec],)], "codec array<int>")
    meta.write.mode("overwrite").parquet(os.path.join(path, "meta.parquet"))


def write_h5_container(df: DataFrame, path: str, text_col: str = "text") -> List[str]:
    """(id, text[, image, dims]) -> container directory. Returns the codec."""
    codec = _codec_of(df, text_col)
    encoded = df.withColumn("transcript", _encode_col(F.col(text_col), codec)).drop(
        text_col
    )
    _write_container(encoded, codec, path, "rows contain chars outside the container codec")
    return codec


def write_fold_split(df: DataFrame, path: str, n_folds: int = 5,
                     text_col: str = "text", id_col: str = "id") -> List[str]:
    """Cross-fold split writer (reference: hdf5/hdf5_dataset_writer.py:1-81 +
    cross_fold.py:70-73 — the reference shuffles samples round-robin into
    fold files). Spark shape: deterministic hash fold (retry-stable, no
    global ordering) + one partitionBy(fold_id) write; every fold shares
    the container codec."""
    codec = _codec_of(df, text_col)
    fold = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_folds)).cast("int")
    encoded = (
        df.withColumn("transcript", _encode_col(F.col(text_col), codec))
        .withColumn("fold_id", fold)
        .drop(text_col)
    )
    _write_container(
        encoded, codec, path, "rows contain chars outside the container codec",
        partition_by="fold_id",
    )
    return codec


def read_codec(spark: SparkSession, path: str) -> List[str]:
    row = spark.read.parquet(os.path.join(path, "meta.parquet")).first()
    return [chr(i) for i in row["codec"]]


def read_h5_container(spark: SparkSession, path: str) -> DataFrame:
    """Container -> rows with the transcript decoded through the embedded
    codec (plus whatever other columns the container carries)."""
    codec = read_codec(spark, path)
    data = spark.read.parquet(os.path.join(path, "data.parquet"))
    return data.withColumn("text", _decode_col(F.col("transcript"), codec)).drop(
        "transcript"
    )


def store_predictions(
    predictions: DataFrame,
    src_path: str,
    out_path: str,
    sentence_col: str = "sentence",
) -> None:
    """Store predicted sentences re-encoded through the SOURCE container's
    codec (reference: reader.py:73-89 — the prediction file reuses the
    input file's codec). Sentences with out-of-codec chars fail loudly."""
    codec = read_codec(predictions.sparkSession, src_path)
    encoded = predictions.withColumn(
        "transcript", _encode_col(F.col(sentence_col), codec)
    ).drop(sentence_col)
    _write_container(
        encoded, codec, out_path, "predictions contain chars not in the source codec"
    )
