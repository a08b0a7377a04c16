"""Delta ROW TRACKING (PROTOCOL.md §Row Tracking): stable row ids —
baseRowId ranges allocated from the delta.rowTracking domain's high
water mark, surviving appends, DV deletes, checkpoint + log cleanup,
COMPACTION, and the row-level DML rewrites (merge/update/replaceWhere
MATERIALIZE the surviving ids through the rewrite — see
test_row_tracking_dml.py for the full DML matrix)."""

import json

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _ids(spark, path):
    return {
        r.id: (r.row_id, r.row_commit_version)
        for r in lakehouse.read_delta_row_ids(spark, path).collect()
    }


def test_create_append_delete_stability(spark, tmp_path):
    t = str(tmp_path / "rt")
    df = spark.range(0, 100).select("id", (F.col("id") % 5).alias("v"))
    lakehouse.write_delta(spark, df, t, row_tracking=True)
    first = _ids(spark, t)
    rids = [rid for rid, _v in first.values()]
    assert len(set(rids)) == 100 and min(rids) == 0 and max(rids) == 99
    # commit version stamped
    assert all(v == 0 for _rid, v in first.values())
    # append: new range above the watermark, old ids unchanged
    lakehouse.write_delta(
        spark,
        spark.range(100, 150).select("id", (F.col("id") % 5).alias("v")),
        t,
        mode="append",
    )
    both = _ids(spark, t)
    assert len(both) == 150
    assert max(r for r, _v in both.values()) == 149
    assert all(both[k] == v for k, v in first.items())
    # DV delete: surviving ids keep their values (holes are fine)
    lakehouse.delete_delta(spark, t, "v = 2")
    post = _ids(spark, t)
    assert len(post) == 120
    assert all(both[k] == v for k, v in post.items())
    # domain watermark tracks the top allocation
    dm = lakehouse._domain_metadata(t)
    assert json.loads(dm["delta.rowTracking"])["rowIdHighWaterMark"] == 149


def test_dml_preserves_ids(spark, tmp_path):
    # merge/update MATERIALIZE surviving ids through the rewrite: kept
    # rows keep (id, version); changed rows keep their id with the DML
    # commit's version; inserts get fresh ids above the watermark
    t = str(tmp_path / "rw")
    df = spark.range(0, 50).select("id", (F.col("id") % 5).alias("v"))
    lakehouse.write_delta(spark, df, t, row_tracking=True)
    before = _ids(spark, t)
    v_upd = lakehouse.update_delta(spark, t, {"v": "9"}, "id = 1")
    mid = _ids(spark, t)
    assert mid[1] == (before[1][0], v_upd)
    assert all(mid[k] == before[k] for k in before if k != 1)
    v_mrg = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(2, 7), (99, 1)], "id long, v long"),
        t,
        keys=["id"],
    )
    after = _ids(spark, t)
    assert after[2] == (before[2][0], v_mrg)  # updated: id kept, new ver
    assert after[99][0] >= 50 and after[99][1] == v_mrg  # fresh insert
    assert all(after[k] == mid[k] for k in mid if k != 2)
    # overwrite is allowed — replaced rows are NEW rows with fresh ids
    lakehouse.write_delta(
        spark,
        spark.range(0, 10).select("id", (F.col("id") % 5).alias("v")),
        t,
        mode="overwrite",
    )
    ids = [r for r, _v in _ids(spark, t).values()]
    assert len(ids) == 10 and min(ids) >= 51  # fresh range, tracking kept


def test_enable_backfill_and_checkpoint_survival(spark, tmp_path):
    t = str(tmp_path / "bf")
    df = spark.range(0, 100).select("id", (F.col("id") % 5).alias("v"))
    lakehouse.write_delta(spark, df, t)
    lakehouse.write_delta(
        spark,
        spark.range(100, 120).select("id", (F.col("id") % 5).alias("v")),
        t,
        mode="append",
    )
    v = lakehouse.enable_delta_row_tracking(spark, t)
    ids = _ids(spark, t)
    rids = [r for r, _v in ids.values()]
    assert len(set(rids)) == 120 and max(rids) == 119
    assert all(cv == v for _r, cv in ids.values())  # backfill version
    # idempotent re-enable
    assert lakehouse.enable_delta_row_tracking(spark, t) >= v
    # classic checkpoint + cleanup: watermark, protocol, baseRowIds live on
    lakehouse.checkpoint_delta(t)
    lakehouse.cleanup_delta_log(t)
    lakehouse.write_delta(
        spark,
        spark.range(120, 130).select("id", (F.col("id") % 5).alias("v")),
        t,
        mode="append",
    )
    rids2 = [r for r, _v in _ids(spark, t).values()]
    assert len(set(rids2)) == 130 and max(rids2) == 129
    proto = lakehouse._current_protocol(t)
    feats = set(proto.get("writerFeatures") or [])
    assert {"rowTracking", "domainMetadata"} <= feats


def test_v2_checkpoint_preserves_domain(spark, tmp_path):
    t = str(tmp_path / "v2")
    df = spark.range(0, 60).select("id")
    lakehouse.write_delta(spark, df, t, row_tracking=True)
    lakehouse.checkpoint_delta(t, v2=True)
    lakehouse.cleanup_delta_log(t)
    lakehouse.write_delta(spark, spark.range(60, 70).select("id"), t,
                          mode="append")
    rids = [r for r, _v in _ids(spark, t).values()]
    assert len(set(rids)) == 70 and max(rids) == 69


def test_checkpoint_carries_real_protocol(spark, tmp_path):
    """Round-7 regression: the checkpoint used to synthesize a protocol,
    silently un-declaring features (identity's v6, constraints) once
    cleanup dropped the JSON that declared them."""
    t = str(tmp_path / "proto")
    lakehouse.write_delta(
        spark,
        spark.range(0, 20).select(F.col("id").alias("k")),
        t,
        identity_columns={"rid": (0, 1)},
    )
    assert lakehouse._current_protocol(t)["minWriterVersion"] == 6
    lakehouse.checkpoint_delta(t)
    lakehouse.cleanup_delta_log(t)
    assert lakehouse._current_protocol(t)["minWriterVersion"] == 6
    # identity generation still works post-cleanup
    lakehouse.write_delta(
        spark,
        spark.range(20, 30).select(F.col("id").alias("k")),
        t,
        mode="append",
    )
    vals = [r["rid"] for r in lakehouse.read_delta(spark, t).collect()]
    assert len(set(vals)) == 30


def test_column_invariants_enforced(spark, tmp_path):
    """Legacy delta.invariants field metadata is writer-enforced."""
    t = str(tmp_path / "inv")
    lakehouse.write_delta(spark, spark.range(1, 10).select("id"), t)
    _adds, meta = lakehouse._replay_log_adds(t)
    sch = json.loads(meta["schemaString"])
    sch["fields"][0]["metadata"] = {
        "delta.invariants": json.dumps(
            {"expression": {"expression": "id > 0"}}
        )
    }
    lakehouse._commit(
        t, [{"metaData": {**meta, "schemaString": json.dumps(sch)}}]
    )
    with pytest.raises(ValueError, match="invariant"):
        lakehouse.write_delta(
            spark, spark.range(-5, 5).select("id"), t, mode="append"
        )
    lakehouse.write_delta(
        spark, spark.range(10, 15).select("id"), t, mode="append"
    )
    assert lakehouse.read_delta(spark, t).count() == 14


def test_in_commit_timestamps(spark, tmp_path):
    """Once delta.enableInCommitTimestamps is set, every commit carries a
    MONOTONIC commitInfo.inCommitTimestamp and timestamp time travel
    prefers it over wall clocks / file mtimes."""
    import os
    import time

    t = str(tmp_path / "ict")
    lakehouse.write_delta(spark, spark.range(0, 10).select("id"), t)   # v0
    lakehouse.alter_delta_properties(
        t, {"delta.enableInCommitTimestamps": "true"}
    )                                                                  # v1
    lakehouse.write_delta(
        spark, spark.range(10, 20).select("id"), t, mode="append"
    )                                                                  # v2
    lakehouse.delete_delta(spark, t, "id = 0")                         # v3
    log = lakehouse._delta_log_dir(t)
    icts = {}
    for v in range(4):
        with open(os.path.join(log, f"{v:020d}.json")) as fh:
            for line in fh:
                a = json.loads(line)
                if "commitInfo" in a and a["commitInfo"].get(
                    "inCommitTimestamp"
                ):
                    icts[v] = a["commitInfo"]["inCommitTimestamp"]
    assert 0 not in icts          # pre-enablement commits unstamped
    assert set(icts) == {1, 2, 3}
    assert icts[1] < icts[2] < icts[3] or (
        icts[1] <= icts[2] <= icts[3]
        and len({icts[1], icts[2], icts[3]}) == 3
    )  # strictly monotonic
    # time travel resolves through the stamped clock
    v = lakehouse.version_as_of_timestamp(t, icts[2])
    assert v == 2
    # foreign ICT tables are writable (feature is in the supported set)
    lakehouse._commit(t, [{"protocol": {
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": ["inCommitTimestamp", "appendOnly", "invariants"],
    }}])
    lakehouse.write_delta(
        spark, spark.range(20, 25).select("id"), t, mode="append"
    )
    assert lakehouse.read_delta(spark, t).count() == 24


def test_compaction_materializes_ids(spark, tmp_path):
    """OPTIMIZE on a row-tracked table preserves every surviving row's id
    by MATERIALIZING it into the rewritten files (spec preservation
    rule) — and purges DVs in the same pass. Recursive compactions stay
    stable; the declared read never exposes the physical id columns."""
    t = str(tmp_path / "mat")
    df = spark.range(0, 200).select("id", (F.col("id") % 5).alias("v"))
    lakehouse.write_delta(spark, df, t, row_tracking=True)
    lakehouse.write_delta(
        spark,
        spark.range(200, 300).select("id", (F.col("id") % 5).alias("v")),
        t,
        mode="append",
    )
    lakehouse.delete_delta(spark, t, "v = 2")
    pre = _ids(spark, t)
    lakehouse.compact_delta(spark, t)
    adds, _meta = lakehouse._replay_log_adds(t)
    assert not any(a.get("deletionVector") for a in adds.values())  # purged
    assert all(a.get("baseRowId") is not None for a in adds.values())
    assert _ids(spark, t) == pre  # ids byte-stable across the rewrite
    # appends keep allocating above the advanced watermark
    lakehouse.write_delta(
        spark,
        spark.range(300, 320).select("id", (F.col("id") % 5).alias("v")),
        t,
        mode="append",
    )
    allids = {k: r for k, (r, _v) in _ids(spark, t).items()}
    assert len(set(allids.values())) == 260
    assert all(v >= 300 for k, v in allids.items() if k >= 300)
    # recursive: compact files that ALREADY carry materialized columns
    lakehouse.delete_delta(spark, t, "v = 4")
    pre2 = _ids(spark, t)
    lakehouse.compact_delta(spark, t)
    assert _ids(spark, t) == pre2
    # the declared-schema read stays clean
    assert lakehouse.read_delta(spark, t).columns == ["id", "v"]


def test_partitioned_compaction_materializes(spark, tmp_path):
    """Per-partition bin-packing on a row-tracked PARTITIONED table keeps
    every surviving id (materialized through the Hive-layout rewrite)."""
    t = str(tmp_path / "prt")
    df = spark.range(0, 300).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") % 7).alias("v")
    )
    lakehouse.write_delta(spark, df, t, row_tracking=True, partition_by=["p"])
    lakehouse.write_delta(
        spark,
        spark.range(300, 400).select(
            "id", (F.col("id") % 3).alias("p"), (F.col("id") % 7).alias("v")
        ),
        t,
        mode="append",
        partition_by=["p"],
    )
    lakehouse.delete_delta(spark, t, "v = 1")
    pre = _ids(spark, t)
    lakehouse.compact_delta(spark, t)
    assert _ids(spark, t) == pre
    adds, _meta = lakehouse._replay_log_adds(t)
    assert not any(a.get("deletionVector") for a in adds.values())


def test_time_traveled_row_ids_diff(spark, tmp_path):
    """row ids are stable ACROSS versions, so joining two time travels on
    row_id is the protocol-level diff row tracking exists for."""
    t = str(tmp_path / "tt")
    lakehouse.write_delta(
        spark, spark.range(0, 50).select("id"), t, row_tracking=True
    )                                                             # v0
    lakehouse.write_delta(
        spark, spark.range(50, 80).select("id"), t, mode="append"
    )                                                             # v1
    lakehouse.delete_delta(spark, t, "id < 5")                    # v2
    old = {
        r.id: r.row_id
        for r in lakehouse.read_delta_row_ids(spark, t, version=0).collect()
    }
    new = {
        r.id: r.row_id
        for r in lakehouse.read_delta_row_ids(spark, t).collect()
    }
    assert len(old) == 50 and len(new) == 75
    assert all(new[k] == v for k, v in old.items() if k in new)
    assert len(set(new.values()) - set(old.values())) == 30  # inserts
    assert len(set(old.values()) - set(new.values())) == 5   # deletes


def test_feature_only_obligation_and_enablement_continuity(spark, tmp_path):
    """The baseRowId obligation follows the protocol FEATURE, not the
    config flag (writes AND compaction assign ids on a feature-active,
    flag-off table); later enablement continues from the existing
    watermark instead of shrinking it."""
    t = str(tmp_path / "fo")
    lakehouse.write_delta(
        spark, spark.range(0, 50).select("id", (F.col("id") % 5).alias("v")), t
    )
    lakehouse._commit(t, [{"protocol": {
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": [
            "rowTracking", "domainMetadata", "appendOnly", "invariants",
        ],
    }}])
    lakehouse.write_delta(
        spark,
        spark.range(50, 80).select("id", (F.col("id") % 5).alias("v")),
        t,
        mode="append",
    )
    adds, _m = lakehouse._replay_log_adds(t)
    assert any(a.get("baseRowId") is not None for a in adds.values())
    lakehouse.compact_delta(spark, t)
    adds2, _m2 = lakehouse._replay_log_adds(t)
    assert all(a.get("baseRowId") is not None for a in adds2.values())
    hwm_before = json.loads(
        lakehouse._domain_metadata(t)["delta.rowTracking"]
    )["rowIdHighWaterMark"]
    lakehouse.enable_delta_row_tracking(spark, t)
    hwm_after = json.loads(
        lakehouse._domain_metadata(t)["delta.rowTracking"]
    )["rowIdHighWaterMark"]
    assert hwm_after >= hwm_before
    ids = [r.row_id for r in lakehouse.read_delta_row_ids(spark, t).collect()]
    assert len(set(ids)) == 80


def test_empty_row_tracked_snapshot(spark, tmp_path):
    t = str(tmp_path / "em")
    lakehouse.write_delta(
        spark, spark.range(0, 10).select("id"), t, row_tracking=True
    )
    lakehouse.write_delta(
        spark, spark.range(0, 0).select("id"), t, mode="overwrite"
    )
    out = lakehouse.read_delta_row_ids(spark, t)
    assert out.count() == 0
    assert out.columns == ["id", "row_id", "row_commit_version"]
