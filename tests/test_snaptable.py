"""Snapshot-table semantics: append-only commits, reader isolation, time
travel, optimistic-concurrency collisions, garbage collection — plus the
extraction job's snapshot sink producing output identical to the default
overwrite sink."""

import json
import os

import pytest
from pyspark.sql import functions as F

from calamari_spark.plans.snaptable import (
    expire_snapshots,
    list_snapshots,
    snap_commit,
    snap_read,
    snap_write_wave,
)


def _wave_df(spark, bucket, values):
    return spark.createDataFrame(
        [(bucket, v) for v in values], "bucket int, v int"
    )


def test_commit_read_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    p1 = snap_write_wave(spark, t, _wave_df(spark, 0, [1, 2]), [0], "runA")
    s1 = snap_commit(spark, t, p1, "runA")
    p2 = snap_write_wave(spark, t, _wave_df(spark, 1, [10]), [1], "runA")
    s2 = snap_commit(spark, t, p2, "runA")
    assert (s1, s2) == (1, 2)

    # latest sees both buckets
    latest = snap_read(spark, t).orderBy("v").collect()
    assert [(r["bucket"], r["v"]) for r in latest] == [(0, 1), (0, 2), (1, 10)]
    # time travel: snapshot 1 predates bucket 1
    old = snap_read(spark, t, 1).orderBy("v").collect()
    assert [(r["bucket"], r["v"]) for r in old] == [(0, 1), (0, 2)]


def test_bucket_rewrite_isolates_pinned_reader(spark, tmp_path):
    """Re-processing a bucket must not disturb a reader pinned to the
    pre-rewrite snapshot — the exact hazard of the in-place overwrite
    sink, and the reason this sink exists."""
    t = str(tmp_path / "tbl")
    snap_commit(
        spark, t, snap_write_wave(spark, t, _wave_df(spark, 0, [1]), [0], "r1"), "r1"
    )
    pinned = snap_read(spark, t, 1)  # lazy plan against snapshot-1 files
    snap_commit(
        spark, t, snap_write_wave(spark, t, _wave_df(spark, 0, [99]), [0], "r2"), "r2"
    )
    # the rewrite landed...
    assert [r["v"] for r in snap_read(spark, t).collect()] == [99]
    # ...and the pinned reader still scans the ORIGINAL files
    assert [r["v"] for r in pinned.collect()] == [1]
    assert [r["v"] for r in snap_read(spark, t, 1).collect()] == [1]


def test_commit_collision_retries_and_merges(spark, tmp_path):
    """Two committers racing on the same head: the loser's retry must
    land on the next id and CARRY the winner's buckets forward (no lost
    update). Simulated by pre-creating the manifest id the first attempt
    would take."""
    t = str(tmp_path / "tbl")
    pa = snap_write_wave(spark, t, _wave_df(spark, 0, [1]), [0], "rA")
    snap_commit(spark, t, pa, "rA")

    # a "concurrent" winner takes snapshot 2, committing bucket 7
    pb = snap_write_wave(spark, t, _wave_df(spark, 7, [70]), [7], "rB")
    mdir = tmp_path / "tbl" / "_manifests"
    winner = {
        "snapshot_id": 2,
        "parent": 1,
        "run_id": "rB",
        "ts": 0.0,
        "committed": {
            **json.loads((mdir / "manifest-000000001.json").read_text())["committed"],
            **pb,
        },
    }
    (mdir / "manifest-000000002.json").write_text(json.dumps(winner))

    # our commit of bucket 3 loses the race on id 2, retries onto id 3
    pc = snap_write_wave(spark, t, _wave_df(spark, 3, [30]), [3], "rC")
    sid = snap_commit(spark, t, pc, "rC")
    assert sid == 3
    rows = {(r["bucket"], r["v"]) for r in snap_read(spark, t).collect()}
    assert rows == {(0, 1), (7, 70), (3, 30)}  # nobody's update lost


def test_expire_snapshots_gc(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i, v in enumerate([1, 2, 3]):
        snap_commit(
            spark, t,
            snap_write_wave(spark, t, _wave_df(spark, 0, [v]), [0], f"r{i}"),
            f"r{i}",
        )
    assert list_snapshots(spark, t) == [1, 2, 3]
    removed = expire_snapshots(spark, t, keep_last=1)
    assert removed == {"manifests": 2, "data_dirs": 2}
    assert list_snapshots(spark, t) == [3]
    # survivor reads fine; expired ids fail loudly, never a partial scan
    assert [r["v"] for r in snap_read(spark, t).collect()] == [3]
    with pytest.raises(ValueError, match="expired"):
        snap_read(spark, t, 1)


def test_extraction_snapshot_sink_matches_overwrite(spark, tmp_path):
    """The flagship job under sink='snapshot' must produce the same
    extracted table as the default sink, one snapshot per wave, resumable
    the same way."""
    from calamari_spark.plans.extraction import load_interleaved
    from calamari_spark.plans.lineage import read_extracted, run_extraction_job

    docs, media = load_interleaved(spark, "/root/testdata/sf0.001")
    o1, o2 = str(tmp_path / "ow"), str(tmp_path / "snap")
    r1 = run_extraction_job(spark, docs, media, o1, n_buckets=4, buckets_per_wave=2)
    r2 = run_extraction_job(
        spark, docs, media, o2, n_buckets=4, buckets_per_wave=2, sink="snapshot"
    )
    assert r1["status"] == r2["status"] == "complete"
    assert list_snapshots(spark, os.path.join(o2, "extracted_snap")) == [1, 2]

    a = read_extracted(spark, o1).select("doc_id", F.to_json("spans").alias("j"))
    b = read_extracted(spark, o2, sink="snapshot").select(
        "doc_id", F.to_json("spans").alias("j")
    )
    assert sorted(a.collect()) == sorted(b.collect())


def test_snap_diff_returns_only_changed_buckets(spark, tmp_path):
    """Incremental scan: after re-processing bucket 0, the diff from the
    pre-rewrite snapshot contains bucket 0's NEW rows and nothing from
    untouched bucket 1; a self-diff is empty with the table schema."""
    from calamari_spark.plans.snaptable import snap_diff

    t = str(tmp_path / "tbl")
    p = snap_write_wave(spark, t, _wave_df(spark, 0, [1, 2]), [0], "r1")
    p.update(snap_write_wave(spark, t, _wave_df(spark, 1, [10]), [1], "r1"))
    snap_commit(spark, t, p, "r1")  # snapshot 1: buckets 0 and 1
    snap_commit(
        spark, t,
        snap_write_wave(spark, t, _wave_df(spark, 0, [99]), [0], "r2"),
        "r2",
    )  # snapshot 2 rewrites bucket 0 only

    d = snap_diff(spark, t, 1).collect()
    assert {(r["bucket"], r["v"]) for r in d} == {(0, 99)}

    empty = snap_diff(spark, t, 2, 2)
    assert empty.count() == 0
    assert set(empty.columns) == {"bucket", "v"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not present"):
        snap_diff(spark, t, 7)


def test_snap_read_scans_per_wave_not_per_bucket(spark, tmp_path):
    """Plan shape: a wave committing 4 buckets must produce ONE parquet
    scan (wave-dir read + bucket partition pruning), not 4 unioned
    per-bucket reads — at production bucket counts a per-bucket union is
    O(buckets) driver-side plan nodes."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(b, b * 10) for b in range(4)], "bucket int, v int"
    )
    snap_commit(
        spark, t, snap_write_wave(spark, t, df, [0, 1, 2, 3], "r1"), "r1"
    )
    plan = snap_read(spark, t)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan
    # and the data still reads back complete
    rows = {(r["bucket"], r["v"]) for r in snap_read(spark, t).collect()}
    assert rows == {(b, b * 10) for b in range(4)}
