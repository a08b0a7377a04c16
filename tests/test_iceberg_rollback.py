"""Iceberg ROLLBACK (spec §Snapshots): current-snapshot-id is a pointer;
rollback_iceberg moves it back to a retained snapshot in one metadata
commit — the Iceberg twin of restore_delta. Zero data IO at any scale."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _append(spark, root, lo, hi):
    return iceberg.write_iceberg(
        spark,
        spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
    )


def test_rollback_by_snapshot_id(spark, tmp_path):
    root = str(tmp_path / "t")
    s1 = _append(spark, root, 0, 10)
    _append(spark, root, 10, 25)
    assert iceberg.read_iceberg(spark, root).count() == 25
    made = iceberg.rollback_iceberg(root, snapshot_id=s1)
    assert made == s1
    assert iceberg.read_iceberg(spark, root).count() == 10
    # rolled-past snapshot is still retained: roll forward again
    meta = iceberg._load_metadata(root)
    newest = max(s["snapshot-id"] for s in meta["snapshots"])
    iceberg.rollback_iceberg(root, snapshot_id=newest)
    assert iceberg.read_iceberg(spark, root).count() == 25


def test_rollback_by_ref_and_append_diverges(spark, tmp_path):
    root = str(tmp_path / "r")
    _append(spark, root, 0, 10)
    iceberg.set_iceberg_ref(root, "good")
    _append(spark, root, 10, 20)  # the "bad" write
    iceberg.rollback_iceberg(root, ref="good")
    assert iceberg.read_iceberg(spark, root).count() == 10
    # an append after rollback parents off the restored snapshot
    _append(spark, root, 100, 105)
    assert iceberg.read_iceberg(spark, root).count() == 15
    rows = {r.id for r in iceberg.read_iceberg(spark, root).collect()}
    assert 10 not in rows and 104 in rows


def test_rollback_as_of_ms_and_snapshot_log(spark, tmp_path):
    root = str(tmp_path / "l")
    s1 = _append(spark, root, 0, 5)
    meta = iceberg._load_metadata(root)
    t1 = meta["snapshot-log"][-1]["timestamp-ms"]
    _append(spark, root, 5, 9)
    made = iceberg.rollback_iceberg(root, as_of_ms=t1)
    assert made == s1
    # the log gained a fresh entry pointing at the restored snapshot,
    # so "read as of now" resolves to the restored state
    log = iceberg._load_metadata(root)["snapshot-log"]
    assert log[-1]["snapshot-id"] == s1
    assert log[-1]["timestamp-ms"] >= log[-2]["timestamp-ms"]


def test_rollback_noop_and_failures(spark, tmp_path):
    root = str(tmp_path / "f")
    s1 = _append(spark, root, 0, 5)
    before = iceberg.latest_metadata_path(root)
    assert iceberg.rollback_iceberg(root, snapshot_id=s1) == s1
    # no-op rollback commits nothing
    assert iceberg.latest_metadata_path(root) == before
    with pytest.raises(ValueError, match="exactly one"):
        iceberg.rollback_iceberg(root)
    with pytest.raises(ValueError, match="exactly one"):
        iceberg.rollback_iceberg(root, snapshot_id=s1, ref="x")
    with pytest.raises(ValueError, match="not retained"):
        iceberg.rollback_iceberg(root, snapshot_id=999)
    with pytest.raises(ValueError, match="no snapshot at or before"):
        iceberg.rollback_iceberg(root, as_of_ms=1)


def test_expire_protects_current_after_rollback(spark, tmp_path):
    """Regression: expire keeps the newest-by-id snapshots; after a
    rollback the CURRENT snapshot is an older id and must survive."""
    root = str(tmp_path / "e")
    s1 = _append(spark, root, 0, 10)
    _append(spark, root, 10, 20)
    _append(spark, root, 20, 30)
    iceberg.rollback_iceberg(root, snapshot_id=s1)
    iceberg.expire_iceberg_snapshots(root, keep=1)
    # current snapshot survived expiration and still reads
    assert iceberg.read_iceberg(spark, root).count() == 10
    meta = iceberg._load_metadata(root)
    assert meta["current-snapshot-id"] == s1
    assert any(s["snapshot-id"] == s1 for s in meta["snapshots"])


def test_expire_older_than_window(spark, tmp_path):
    """older_than_ms: snapshots inside the retention window survive even
    beyond `keep`; only genuinely old history expires."""
    root = str(tmp_path / "age")
    _append(spark, root, 0, 5)
    _append(spark, root, 5, 10)
    _append(spark, root, 10, 15)
    # force distinct, deterministic timestamps (appends can land within
    # one millisecond)
    meta = dict(iceberg._load_metadata(root))
    for i, s in enumerate(
        sorted(meta["snapshots"], key=lambda x: x["snapshot-id"])
    ):
        s["timestamp-ms"] = 1_000_000 + i * 1000
    iceberg._swap_metadata(root, meta)
    meta = iceberg._load_metadata(root)
    ts = sorted(s["timestamp-ms"] for s in meta["snapshots"])
    # cutoff between snapshot 1 and 2: only the oldest is expirable
    out = iceberg.expire_iceberg_snapshots(
        root, keep=1, older_than_ms=ts[1]
    )
    assert len(out["snapshots"]) == 1
    left = iceberg._load_metadata(root)["snapshots"]
    assert len(left) == 2
    # cutoff in the future: everything beyond keep expires (floor holds)
    out2 = iceberg.expire_iceberg_snapshots(
        root, keep=1, older_than_ms=ts[-1] + 10_000
    )
    assert len(out2["snapshots"]) == 1
    assert iceberg.read_iceberg(spark, root).count() == 15
