"""FeatureStore on the ICEBERG backend (table_format='iceberg'): the
identical store surface — materialize / incremental / upsert / read /
retract / correct / maintain / serve — over snapshot-summary idempotency,
position-delete retraction, and merge-on-read correction."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.feature_store import FeatureGroup, FeatureStore
from feature_store_ml_spark.io import iceberg


def _rowlocal_group():
    def build(ev):
        return ev.select(
            "user_id",
            F.col("ts").alias("feat_ts"),
            (F.col("value") * 2).alias("double_value"),
        )

    return FeatureGroup(
        name="row_local", keys=("user_id",), ts_col="feat_ts", build=build
    )


def _store(tmp_path):
    fs = FeatureStore(root=str(tmp_path / "fs"), table_format="iceberg")
    fs.register(_rowlocal_group())
    return fs


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double"
    )


def test_bad_format_rejected(tmp_path):
    with pytest.raises(ValueError, match="delta|iceberg"):
        FeatureStore(root=str(tmp_path), table_format="hudi")


def test_materialize_overwrite_idempotent(spark, tmp_path):
    fs = _store(tmp_path)
    b1 = _batch(spark, [(1, datetime(2024, 1, 1), 1.0), (2, datetime(2024, 1, 1), 2.0)])
    fs.materialize(spark, b1, "row_local", run_version=1)
    path = fs.groups["row_local"].table_path(fs.root)
    assert iceberg.is_iceberg_table(path)
    assert fs.read(spark, "row_local").count() == 2
    # full rebuild replaces, not appends
    b2 = _batch(spark, [(3, datetime(2024, 1, 2), 3.0)])
    fs.materialize(spark, b2, "row_local", run_version=2)
    got = {(r.user_id, r.double_value) for r in fs.read(spark, "row_local").collect()}
    assert got == {(3, 6.0)}
    # retried run with the SAME version is a no-op
    fs.materialize(spark, b1, "row_local", run_version=2)
    assert fs.read(spark, "row_local").count() == 1


def test_incremental_and_upsert(spark, tmp_path):
    fs = _store(tmp_path)
    fs.materialize_incremental(
        spark, _batch(spark, [(1, datetime(2024, 1, 1), 1.0)]), "row_local", 1
    )
    fs.materialize_incremental(
        spark, _batch(spark, [(2, datetime(2024, 1, 2), 2.0)]), "row_local", 2
    )
    # replayed run_version appends nothing twice
    fs.materialize_incremental(
        spark, _batch(spark, [(2, datetime(2024, 1, 2), 2.0)]), "row_local", 2
    )
    assert fs.read(spark, "row_local").count() == 2
    fs.materialize_upsert(
        spark,
        _batch(spark, [(1, datetime(2024, 1, 3), 5.0), (3, datetime(2024, 1, 3), 7.0)]),
        "row_local",
        run_version=3,
    )
    got = {(r.user_id, r.double_value) for r in fs.read(spark, "row_local").collect()}
    assert got == {(1, 10.0), (2, 4.0), (3, 14.0)}


def test_retract_correct_and_maintain(spark, tmp_path):
    fs = _store(tmp_path)
    rows = [(i, datetime(2024, 1, 1, i), float(i)) for i in range(1, 6)]
    fs.materialize(spark, _batch(spark, rows), "row_local", run_version=1)
    # GDPR retraction masks via position deletes
    ents = spark.createDataFrame([(2,), (4,)], "user_id long")
    fs.retract(spark, "row_local", ents, run_version=1)
    got = {r.user_id for r in fs.read(spark, "row_local").collect()}
    assert got == {1, 3, 5}
    # retry is a no-op commit (summary stamp)
    fs.retract(spark, "row_local", ents, run_version=1)
    assert {r.user_id for r in fs.read(spark, "row_local").collect()} == {1, 3, 5}
    # correction: non-idempotent SET must not re-apply on retry
    fs.correct(
        spark, "row_local", {"double_value": "double_value + 100"},
        where="user_id = 1", run_version=2,
    )
    fs.correct(
        spark, "row_local", {"double_value": "double_value + 100"},
        where="user_id = 1", run_version=2,
    )
    vals = {r.user_id: r.double_value for r in fs.read(spark, "row_local").collect()}
    assert vals[1] == 102.0
    # maintain: compaction physically applies the position deletes, then
    # expiration drops the pre-compaction history
    path = fs.groups["row_local"].table_path(fs.root)
    meta = iceberg._load_metadata(path)
    cur = meta["current-snapshot-id"]
    assert iceberg._snapshot_content(meta, cur, path)[1]  # deletes live
    out = fs.maintain("row_local", spark)
    assert out["dv_purged"] is True
    assert out["snapshots_expired"] > 0
    meta2 = iceberg._load_metadata(path)
    cur2 = meta2["current-snapshot-id"]
    assert iceberg._snapshot_content(meta2, cur2, path)[1] == []
    assert {r.user_id for r in fs.read(spark, "row_local").collect()} == {1, 3, 5}


def test_serve_point_in_time_on_iceberg(spark, tmp_path):
    fs = _store(tmp_path)
    feats = [
        (1, datetime(2024, 1, 1), 1.0),
        (1, datetime(2024, 1, 3), 3.0),
        (2, datetime(2024, 1, 2), 2.0),
    ]
    fs.materialize(spark, _batch(spark, feats), "row_local", run_version=1)
    labels = spark.createDataFrame(
        [(1, datetime(2024, 1, 2)), (2, datetime(2024, 1, 1))],
        "user_id long, label_ts timestamp_ntz",
    )
    frame = fs.serve(spark, labels, label_ts="label_ts", names=["row_local"])
    got = {(r.user_id, r.double_value) for r in frame.collect()}
    # user 1 sees only the Jan-1 feature (Jan-3 is the future);
    # user 2's feature is not yet available -> null
    assert got == {(1, 2.0), (2, None)}
