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
