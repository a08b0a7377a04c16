"""update_iceberg — single-snapshot merge-on-read UPDATE: one commit
carries a position-delete manifest (masking matched rows in place) AND a
data manifest (their transformed replacements). The opposite cost trade
from Delta's copy-on-write update_delta: O(#matched rows) written, zero
touched-file rewrite."""

import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _mk(spark, tmp_path, name="t", n=20):
    root = str(tmp_path / name)
    iceberg.write_iceberg(
        spark,
        spark.range(n).select(
            "id",
            (F.col("id") % 4).cast("int").alias("grp"),
            (F.col("id") * 10).alias("v"),
        ),
        root,
        format_version=2,
    )
    return root


def test_update_basic_predicate(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.update_iceberg(spark, root, {"v": "v + 1"}, where="grp = 2")
    got = {r.id: r.v for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {i: i * 10 + (1 if i % 4 == 2 else 0) for i in range(20)}


def test_update_is_one_snapshot_and_rewrites_nothing(spark, tmp_path):
    root = _mk(spark, tmp_path)
    data_before = set(os.listdir(os.path.join(root, "data")))
    meta0 = iceberg._load_metadata(root)
    n_snaps = len(meta0.get("snapshots", []))
    iceberg.update_iceberg(spark, root, {"v": "0"}, where="id < 5")
    meta1 = iceberg._load_metadata(root)
    assert len(meta1["snapshots"]) == n_snaps + 1  # ONE new snapshot
    assert meta1["snapshots"][-1]["summary"]["operation"] == "overwrite"
    # pre-existing data files are untouched (merge-on-read, not rewrite)
    after = set(os.listdir(os.path.join(root, "data")))
    assert data_before <= after
    # prior snapshot still reads the PRE-update state (atomicity)
    prior_id = meta0["current-snapshot-id"]
    old = iceberg.read_iceberg(spark, root, snapshot_id=prior_id)
    assert {r.id: r.v for r in old.collect()} == {i: i * 10 for i in range(20)}


def test_update_simultaneous_assignment_swaps(spark, tmp_path):
    root = str(tmp_path / "swap")
    iceberg.write_iceberg(
        spark,
        spark.range(5).select(
            F.col("id").alias("a"), (F.col("id") * 100).alias("b")
        ),
        root,
        format_version=2,
    )
    iceberg.update_iceberg(spark, root, {"a": "b", "b": "a"})
    rows = sorted(
        (r.a, r.b) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert rows == [(i * 100, i) for i in range(5)]


def test_update_composes_with_prior_delete_and_rename(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.delete_iceberg(spark, root, "id = 5")
    iceberg.rename_iceberg_column(root, "v", "speed")
    iceberg.update_iceberg(spark, root, {"speed": "speed * 2"}, where="grp = 1")
    back = iceberg.read_iceberg(spark, root)
    got = {r.id: r.speed for r in back.collect()}
    # id 5 (grp 1) stays deleted; the other grp-1 rows doubled
    assert 5 not in got and len(got) == 19
    assert got == {
        i: i * 10 * (2 if i % 4 == 1 else 1) for i in range(20) if i != 5
    }


def test_update_no_match_commits_noop_snapshot(spark, tmp_path):
    root = _mk(spark, tmp_path)
    sid = iceberg.update_iceberg(spark, root, {"v": "0"}, where="id = 999")
    meta = iceberg._load_metadata(root)
    assert meta["current-snapshot-id"] == sid
    got = {r.id: r.v for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {i: i * 10 for i in range(20)}


def test_update_refusals(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown columns"):
        iceberg.update_iceberg(spark, root, {"zz": "1"})
    with pytest.raises(ValueError, match="empty SET"):
        iceberg.update_iceberg(spark, root, {})
    # v1 tables predate merge-on-read
    v1 = str(tmp_path / "v1")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), v1, format_version=1
    )
    with pytest.raises(NotImplementedError, match="format-version 2"):
        iceberg.update_iceberg(spark, v1, {"id": "0"})


def test_update_partitioned_stays_in_partition(spark, tmp_path):
    """Updating a NON-source column on a partitioned table: replacement
    rows re-derive the same tuple; partition pruning still works."""
    root = str(tmp_path / "part")
    iceberg.write_iceberg(
        spark,
        spark.range(12).select(
            "id", (F.col("id") % 3).cast("int").alias("p"),
            (F.col("id") * 10).alias("v"),
        ),
        root, format_version=2, partition_by=["p"],
    )
    iceberg.update_iceberg(spark, root, {"v": "v + 1"}, where="p = 1")
    got = {r.id: (r.p, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {
        i: (i % 3, i * 10 + (1 if i % 3 == 1 else 0)) for i in range(12)
    }
    rep = iceberg.iceberg_scan_report(root, "p = 0")
    assert rep["skipped_files"] >= 1  # pruning intact post-update


def test_update_partition_source_moves_rows(spark, tmp_path):
    """Updating the partition SOURCE column: replacement rows land in
    their NEW partition (tuple re-derived), reads and pruning agree."""
    root = str(tmp_path / "pmove")
    iceberg.write_iceberg(
        spark,
        spark.range(10).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        root, format_version=2, partition_by=["p"],
    )
    iceberg.update_iceberg(spark, root, {"p": "7"}, where="id < 3")
    back = iceberg.read_iceberg(spark, root)
    assert back.where("p = 7").count() == 3
    assert back.count() == 10
    assert iceberg.read_iceberg(spark, root, where="p = 7").count() == 3
    meta = iceberg._load_metadata(root)
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"


def test_update_partitioned_with_transform(spark, tmp_path):
    """Bucket-transform spec: the replacement rows' bucket is re-derived
    with the writer's murmur3 expression, not copied."""
    root = str(tmp_path / "pbkt")
    iceberg.write_iceberg(
        spark,
        spark.range(20).select("id", (F.col("id") * 10).alias("v")),
        root, format_version=2,
        partition_by=["bucket(4, id)"],
    )
    iceberg.update_iceberg(spark, root, {"v": "v + 5"}, where="id >= 10")
    got = {r.id: r.v for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {i: i * 10 + (5 if i >= 10 else 0) for i in range(20)}


def test_update_then_time_travel_and_incremental(spark, tmp_path):
    root = _mk(spark, tmp_path)
    sid = iceberg.update_iceberg(spark, root, {"v": "v + 7"}, where="id >= 15")
    # the new snapshot's files carry footer stats; a pruned read agrees
    assert iceberg.read_iceberg(spark, root, where="v >= 170").count() == 3
    # snapshot-id time travel to the update's own snapshot
    got = iceberg.read_iceberg(spark, root, snapshot_id=sid)
    assert got.where("id = 15").collect()[0].v == 157
