"""Image + sibling-transcript file pairs (the reference's `FileData` format).

Re-derivation of calamari's file dataset semantics
(reference: calamari_ocr/ocr/dataset/datareader/file.py:95-206): line
images (`<base>.png`) joined to ground-truth texts (`<base>.gt.txt`) by
base name; `keep_files_with_same_file_name` is a semi-join on the base
name (file.py:69-76); predictions store back as `<base>.pred.txt`
(file.py:208-213).

Spark shape: `binaryFile` scans both globs; the base-name equi-join runs
in the engine (broadcast when one side is small); the sink writes one
predictions table partition-parallel instead of one tiny txt per line —
a `to_pred_files` helper still materializes the txt layout for
compatibility with reference tooling.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _base_name(col):
    # strip directory then every extension (reference: split_all_ext)
    fname = F.element_at(F.split(col, "/"), -1)
    return F.regexp_extract(fname, r"^([^.]*)", 1)


def read_file_pairs(
    spark: SparkSession,
    images_glob: str,
    texts_glob: str,
    gt_extension: str = ".gt.txt",
    keep_matched_only: bool = True,
) -> DataFrame:
    """-> (id, png, gt): base-name equi-join of image and transcript scans.

    keep_matched_only=True is an inner join (the reference's
    keep_files_with_same_file_name semi-join); False keeps images without
    GT (left join, gt null) for pure prediction runs."""
    imgs = (
        spark.read.format("binaryFile")
        .load(images_glob)
        .select(_base_name(F.col("path")).alias("id"), F.col("content").alias("png"))
    )
    txts = (
        spark.read.format("binaryFile")
        .load(texts_glob)
        .select(
            _base_name(F.col("path")).alias("id"),
            F.decode(F.col("content"), "UTF-8").alias("gt"),
        )
    )
    how = "inner" if keep_matched_only else "left"
    return imgs.join(txts, "id", how)


def to_pred_files(predictions: DataFrame, out_dir: str,
                  pred_extension: str = ".pred.txt") -> int:
    """Materialize `<id>.pred.txt` files (reference sink layout,
    file.py:208-213). Executor-parallel: each partition writes its own
    files via foreachPartition — no driver collect, so the sink holds at
    any row count (out_dir must be a shared filesystem on a real cluster;
    the scale sink proper is the predictions parquet/Iceberg table)."""
    os.makedirs(out_dir, exist_ok=True)
    n_written = predictions.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows) -> None:
        import os as _os

        _os.makedirs(out_dir, exist_ok=True)
        n = 0
        for r in rows:
            path = _os.path.join(out_dir, r["id"] + pred_extension)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write(r["sentence"])
            _os.replace(tmp, path)  # atomic per file: task retries are safe
            n += 1
        n_written.add(n)

    # count via accumulator: one action, the (possibly OCR-heavy) upstream
    # pipeline executes exactly once
    predictions.select("id", "sentence").foreachPartition(write_partition)
    return n_written.value
