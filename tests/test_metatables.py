"""Metadata tables (io/metatables.py): the lakehouse introspection
surface — snapshots/files/history for Iceberg, DESCRIBE DETAIL + files
for Delta — as DataFrames whose rows must agree with what the readers
actually plan."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg, lakehouse, metatables


def _iceberg_table(spark, tmp_path):
    root = str(tmp_path / "it")
    df = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    iceberg.write_iceberg(spark, df.coalesce(2), root, format_version=2)
    iceberg.write_iceberg(
        spark,
        spark.range(100, 150).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")).coalesce(1),
        root,
        format_version=2,
    )
    iceberg.delete_iceberg(spark, root, "k < 10")
    return root


def test_iceberg_snapshots_table(spark, tmp_path):
    root = _iceberg_table(spark, tmp_path)
    snaps = metatables.iceberg_snapshots(spark, root).orderBy("snapshot_id").collect()
    assert len(snaps) == 3
    assert [s["operation"] for s in snaps] == ["append", "append", "delete"]
    assert snaps[-1]["is_current"] and not snaps[0]["is_current"]
    assert snaps[1]["timestamp_ms"] >= snaps[0]["timestamp_ms"]


def test_iceberg_files_table_matches_scan_plan(spark, tmp_path):
    root = _iceberg_table(spark, tmp_path)
    files = metatables.iceberg_files(spark, root)
    by_content = {r["content"]: r["cnt"] for r in files.groupBy("content").agg(F.count("*").alias("cnt")).collect()}
    assert by_content["data"] == 3
    assert by_content["position_deletes"] == 1
    total_records = (
        files.where("content = 'data'").agg(F.sum("record_count")).collect()[0][0]
    )
    assert total_records == 150  # record_count is pre-delete (merge-on-read)
    # time travel: the first snapshot's files view has no deletes
    first = metatables.iceberg_snapshots(spark, root).orderBy("snapshot_id").first()
    old = metatables.iceberg_files(spark, root, snapshot_id=first["snapshot_id"])
    assert old.where("content != 'data'").count() == 0


def test_iceberg_history_ancestry(spark, tmp_path):
    root = _iceberg_table(spark, tmp_path)
    hist = metatables.iceberg_history(spark, root).orderBy("timestamp_ms").collect()
    assert len(hist) == 3
    assert all(h["is_current_ancestor"] for h in hist)  # linear history


def test_delta_detail_and_files(spark, tmp_path):
    root = str(tmp_path / "dt")
    df = spark.range(0, 100).select(
        (F.col("id") % 4).alias("p"), F.col("id").alias("v")
    )
    lakehouse.write_delta(spark, df, root, partition_by=["p"])
    lakehouse.delete_delta(spark, root, "v = 7")
    detail = metatables.delta_detail(spark, root).collect()[0]
    assert detail["format"] == "parquet"
    assert detail["partitionColumns"] == '["p"]'
    assert detail["numFiles"] >= 4
    assert detail["minReaderVersion"] == 3  # DV table
    files = metatables.delta_files(spark, root)
    assert files.count() == detail["numFiles"]
    assert files.where("has_deletion_vector").count() == 1
    assert files.where("NOT has_stats").count() == 0
    # per-file record counts sum to the PRE-delete total (DV masks at read)
    assert files.agg(F.sum("num_records")).collect()[0][0] == 100
    assert files.where("partitionValues LIKE '%\"p\": \"2\"%'").count() >= 1


def test_delta_files_time_travel(spark, tmp_path):
    root = str(tmp_path / "tt")
    lakehouse.write_delta(spark, spark.range(10).coalesce(1), root)
    lakehouse.write_delta(
        spark, spark.range(10, 20).coalesce(1), root, mode="append"
    )
    assert metatables.delta_files(spark, root, version=0).count() == 1
    assert metatables.delta_files(spark, root).count() == 2


def test_remove_orphan_files(spark, tmp_path):
    """Orphans = files no retained snapshot references; the age guard
    protects in-flight writes; live files are never touched."""
    import os
    import time

    root = str(tmp_path / "orph")
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    iceberg.write_iceberg(spark, df.coalesce(1), root, format_version=2)
    # plant an orphan data file (old) and a fresh one (in-flight)
    old_orphan = os.path.join(root, "data", "orphan-old.parquet")
    new_orphan = os.path.join(root, "data", "orphan-new.parquet")
    df.limit(1).toPandas().to_parquet(old_orphan)
    df.limit(1).toPandas().to_parquet(new_orphan)
    past = time.time() - 7200
    os.utime(old_orphan, (past, past))
    stale_staging = os.path.join(root, "_staging_deadbeef")
    os.makedirs(stale_staging)
    os.utime(stale_staging, (past, past))

    listed = iceberg.remove_orphan_files(root, dry_run=True)
    assert old_orphan in listed and stale_staging in listed
    assert new_orphan not in listed
    assert os.path.exists(old_orphan)  # dry run deletes nothing

    removed = iceberg.remove_orphan_files(root)
    assert old_orphan in removed
    assert not os.path.exists(old_orphan) and not os.path.exists(stale_staging)
    assert os.path.exists(new_orphan)  # age guard
    # the table still reads in full
    assert iceberg.read_iceberg(spark, root).count() == 50


def test_remove_orphan_files_keeps_history_referenced(spark, tmp_path):
    """Files referenced only by an OLD (but retained) snapshot are not
    orphans — time travel to it must keep working."""
    import os
    import time

    root = str(tmp_path / "orph2")
    iceberg.write_iceberg(spark, spark.range(10).coalesce(1), root, format_version=2)
    first_files = set(iceberg._live_data_files(root))
    iceberg.compact_iceberg(spark, root)  # replaces the file set
    # age everything so the guard doesn't mask the decision
    for dirpath, _d, names in os.walk(os.path.join(root, "data")):
        for n in names:
            past = time.time() - 7200
            os.utime(os.path.join(dirpath, n), (past, past))
    removed = iceberg.remove_orphan_files(root)
    assert not (first_files & set(removed)), "history-referenced files removed"
    snaps = metatables.iceberg_snapshots(spark, root).orderBy("snapshot_id").collect()
    old = iceberg.read_iceberg(spark, root, snapshot_id=snaps[0]["snapshot_id"])
    assert old.count() == 10


def test_iceberg_partitions_rollup(spark, tmp_path):
    root = str(tmp_path / "pr")
    df = spark.range(0, 120).select(
        (F.col("id") % 3).cast("long").alias("p"), F.col("id").alias("v")
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, partition_by=["p"])
    parts = metatables.iceberg_partitions(spark, root).collect()
    assert len(parts) == 3
    assert all(r["record_count"] == 40 for r in parts)
    assert all(r["file_count"] >= 1 and r["total_bytes"] > 0 for r in parts)
    keys = {r["partition"] for r in parts}
    assert keys == {'{"p": 0}', '{"p": 1}', '{"p": 2}'}


def test_delta_history_audit_trail(spark, tmp_path):
    from feature_store_ml_spark.io import lakehouse, metatables
    from pyspark.sql import functions as F

    root = str(tmp_path / "hist")
    lakehouse.write_delta(
        spark, spark.range(10).select("id", (F.col("id") * 2).alias("v")), root
    )
    lakehouse.write_delta(
        spark, spark.range(10, 15).select("id", (F.col("id") * 2).alias("v")),
        root, mode="append",
    )
    lakehouse.update_delta(spark, root, {"v": "v + 1"}, where="id = 0")
    lakehouse.delete_delta(spark, root, "id = 1")
    h = metatables.delta_history(spark, root).orderBy("version").collect()
    assert [r.version for r in h] == [0, 1, 2, 3]
    ops = [r.operation for r in h]
    assert ops[2] == "UPDATE" and ops[3] == "DELETE"
    assert all(r.timestamp_ms and r.timestamp_ms > 0 for r in h)
    # append commits add files and remove none; DELETE re-adds with a DV
    assert h[1].n_adds >= 1 and h[1].n_removes == 0
    assert h[3].n_removes >= 1
    import json as _json

    assert _json.loads(h[2].operationParameters)["predicate"] == "id = 0"


def test_iceberg_refs_and_manifests_tables(spark, tmp_path):
    from feature_store_ml_spark.io import iceberg, metatables

    root = str(tmp_path / "rm")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2
    )
    iceberg.set_iceberg_ref(root, "v1", ref_type="tag")
    iceberg.write_iceberg(
        spark, spark.range(5, 9).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg(spark, root, "id = 1")
    refs = {r.name: (r.type, r.retained) for r in
            metatables.iceberg_refs(spark, root).collect()}
    assert refs["v1"] == ("tag", True)
    assert refs["(current)"][0] == "head" and refs["(current)"][1]
    m = metatables.iceberg_manifests(spark, root).collect()
    contents = sorted(r.content for r in m)
    assert "deletes" in contents and contents.count("data") >= 2
    assert all(r.length > 0 for r in m)
