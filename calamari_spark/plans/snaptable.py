"""Append-only snapshot table: an Iceberg-analog commit protocol for the
extraction sink, implemented over plain parquet + JSON manifests.

Why it exists (north rule: "Iceberg tables ... resumable from
checkpoint"): the default sink replaces a re-processed bucket IN PLACE
via dynamic partition overwrite. That is correct for resume, but it (a)
deletes the files a concurrently running reader may be mid-scan on, and
(b) rewrites in place — the operation object stores at 100 TB handle
worst. The snapshot sink never mutates data files:

* every wave writes its output to a fresh uniquely-named directory
  (pure appends — the object-store-friendly write pattern);
* a manifest (``manifest-N.json``) maps bucket -> the data directory
  that currently owns it; committing a wave = writing manifest N+1 that
  replaces just the re-processed buckets' entries;
* the commit primitive is an ATOMIC EXCLUSIVE CREATE of the manifest
  file through the Hadoop FileSystem API (``create(path,
  overwrite=false)``) — two concurrent committers race on the same N and
  exactly one wins; the loser re-reads the head and retries on N+1
  (optimistic concurrency, the Iceberg model);
* readers resolve the manifest with the highest N (or any pinned N for
  TIME TRAVEL) and scan exactly the files it lists — a reader holding
  snapshot S is unaffected by later commits, because nothing S
  references is ever rewritten;
* ``expire_snapshots(keep_last)`` is the garbage collector: drops old
  manifests and deletes data directories no surviving manifest
  references.

On a cluster with the real Iceberg runtime this entire module is
``writeTo(tbl).overwritePartitions()`` + ``VERSION AS OF``; the module
exists so the commit/isolation/time-travel semantics are testable here
and the sink swap is mechanical.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_RE = re.compile(r"^manifest-(\d{9})\.json$")
MAX_COMMIT_RETRIES = 20


def _fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def _write_exclusive(spark, path: str, payload: bytes) -> bool:
    """Atomically create ``path`` with ``payload``; False if it already
    exists (the optimistic-concurrency loss signal). Uses the Hadoop
    ``create(path, overwrite=false)`` primitive so the same code commits
    on HDFS; on S3 the real system would use a conditional PUT."""
    fs, jvm = _fs(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    try:
        out = fs.create(jpath, False)
    except Exception:
        return False
    try:
        out.write(bytearray(payload))
    finally:
        out.close()
    return True


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def list_snapshots(spark: SparkSession, table_dir: str) -> List[int]:
    fs, jvm = _fs(spark, _manifest_dir(table_dir))
    jpath = jvm.org.apache.hadoop.fs.Path(_manifest_dir(table_dir))
    if not fs.exists(jpath):
        return []
    ids = []
    for st in fs.listStatus(jpath):
        m = _MANIFEST_RE.match(st.getPath().getName())
        if m:
            ids.append(int(m.group(1)))
    return sorted(ids)


def _read_manifest(spark, table_dir: str, snapshot_id: int) -> Dict:
    path = os.path.join(
        _manifest_dir(table_dir), f"manifest-{snapshot_id:09d}.json"
    )
    fs, jvm = _fs(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    stream = fs.open(jpath)
    try:
        # slurp JVM-side: py4j passes arrays by value, so a Python-side
        # stream.read(buf) loop would never see the filled bytes
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def snap_write_wave(
    spark: SparkSession,
    table_dir: str,
    wave_df: DataFrame,
    buckets: List[int],
    run_id: str,
) -> Dict[str, str]:
    """Write one wave's output (must carry a ``bucket`` column restricted
    to ``buckets``) into a fresh uniquely-named directory, one subdir per
    bucket. Returns {bucket(str): data path} for snap_commit. Pure
    append: no existing file is touched."""
    wave_dir = os.path.join(_data_dir(table_dir), f"{run_id}-{uuid.uuid4().hex[:8]}")
    wave_df.write.partitionBy("bucket").parquet(wave_dir)
    return {str(int(b)): os.path.join(wave_dir, f"bucket={int(b)}") for b in buckets}


def snap_commit(
    spark: SparkSession,
    table_dir: str,
    replaced: Dict[str, str],
    run_id: str,
) -> int:
    """Commit a new snapshot that re-points the buckets in ``replaced``
    to their new data paths, carrying every other bucket forward from the
    current head. Returns the committed snapshot id. Retries on
    concurrent-commit collisions (exclusive-create lost) by re-reading
    the head — so two jobs committing DIFFERENT buckets both land, in
    some order, without losing either's work."""
    for _ in range(MAX_COMMIT_RETRIES):
        ids = list_snapshots(spark, table_dir)
        head = ids[-1] if ids else 0
        committed: Dict[str, str] = {}
        if head:
            committed = dict(_read_manifest(spark, table_dir, head)["committed"])
        committed.update(replaced)
        manifest = {
            "snapshot_id": head + 1,
            "parent": head or None,
            "run_id": run_id,
            "ts": time.time(),
            "committed": committed,
        }
        path = os.path.join(
            _manifest_dir(table_dir), f"manifest-{head + 1:09d}.json"
        )
        if _write_exclusive(
            spark, path, json.dumps(manifest, sort_keys=True).encode("utf-8")
        ):
            return head + 1
        # lost the race: another committer took this id — merge onto its result
    raise RuntimeError(
        f"snap_commit: lost {MAX_COMMIT_RETRIES} consecutive commit races on "
        f"{table_dir} — either pathological contention or a stuck manifest"
    )


def snap_read(
    spark: SparkSession, table_dir: str, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Scan the table as of ``snapshot_id`` (default: latest). The frame
    is the union of exactly the per-bucket directories the manifest
    lists; later commits never touch those files, so a pinned reader is
    fully isolated (and expired snapshots raise loudly rather than
    half-read)."""
    ids = list_snapshots(spark, table_dir)
    if not ids:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    sid = ids[-1] if snapshot_id is None else snapshot_id
    if sid not in ids:
        raise ValueError(
            f"snapshot {sid} not present under {table_dir} (have {ids}) — "
            "expired by expire_snapshots or never committed"
        )
    manifest = _read_manifest(spark, table_dir, sid)
    if not manifest["committed"]:
        raise ValueError(f"snapshot {sid} commits no buckets")
    return _scan_committed(spark, manifest["committed"])


def _scan_committed(spark: SparkSession, committed: Dict[str, str]) -> DataFrame:
    """Scan {bucket: data path} as one frame. Grouped by owning wave
    directory — one parquet read per LIVE WAVE DIR (Spark re-infers
    ``bucket=N`` as a partition column there), filtered to the buckets
    the manifest still assigns to it, so superseded sibling buckets are
    partition-PRUNED at the scan. A per-bucket read+union would be
    O(buckets) driver-side plan nodes — 10^5 unions at production bucket
    counts; per-wave it is O(live waves), bounded by buckets_per_wave
    batching and snapshot expiry."""
    by_wave: Dict[str, List[int]] = {}
    for bucket, path in sorted(committed.items()):
        by_wave.setdefault(os.path.dirname(path.rstrip("/")), []).append(
            int(bucket)
        )
    parts = [
        spark.read.parquet(wave_dir).filter(F.col("bucket").isin(buckets))
        for wave_dir, buckets in sorted(by_wave.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snap_diff(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: int,
    to_snapshot: Optional[int] = None,
) -> DataFrame:
    """Incremental scan (the Iceberg changelog-read analog): the current
    contents of every bucket whose owning data directory CHANGED between
    ``from_snapshot`` (exclusive) and ``to_snapshot`` (inclusive,
    default latest). Downstream consumers — dedup refresh, index
    rebuild, metric rollups — re-read only re-processed buckets instead
    of the whole table; at 10^12 docs a resume wave touches a handful of
    buckets and the diff is exactly those."""
    ids = list_snapshots(spark, table_dir)
    to_sid = (ids[-1] if ids else 0) if to_snapshot is None else to_snapshot
    for sid in (from_snapshot, to_sid):
        if sid not in ids:
            raise ValueError(
                f"snapshot {sid} not present under {table_dir} (have {ids})"
            )
    old = _read_manifest(spark, table_dir, from_snapshot)["committed"]
    new = _read_manifest(spark, table_dir, to_sid)["committed"]
    changed = {
        b: path for b, path in new.items() if old.get(b) != path
    }
    if not changed:
        return snap_read(spark, table_dir, to_sid).filter(F.lit(False))
    return _scan_committed(spark, changed)


def expire_snapshots(
    spark: SparkSession, table_dir: str, keep_last: int = 2
) -> Dict[str, int]:
    """Garbage collection: keep the newest ``keep_last`` manifests,
    delete the rest, then delete every data directory no surviving
    manifest references. Returns counts. Readers pinned to an expired
    snapshot get a loud ValueError from snap_read, never a partial
    scan."""
    ids = list_snapshots(spark, table_dir)
    drop, keep = ids[:-keep_last], ids[-keep_last:]
    live_dirs = set()
    for sid in keep:
        for path in _read_manifest(spark, table_dir, sid)["committed"].values():
            # ownership unit on disk is the wave dir (parent of bucket=N)
            live_dirs.add(os.path.dirname(path.rstrip("/")))
    fs, jvm = _fs(spark, table_dir)
    removed_manifests = 0
    for sid in drop:
        p = jvm.org.apache.hadoop.fs.Path(
            os.path.join(_manifest_dir(table_dir), f"manifest-{sid:09d}.json")
        )
        if fs.delete(p, False):
            removed_manifests += 1
    removed_data = 0
    data_root = jvm.org.apache.hadoop.fs.Path(_data_dir(table_dir))
    if fs.exists(data_root):
        for st in fs.listStatus(data_root):
            d = st.getPath().toUri().getPath()
            if d not in live_dirs:
                fs.delete(st.getPath(), True)
                removed_data += 1
    return {"manifests": removed_manifests, "data_dirs": removed_data}
