"""Selective overwrite (delta-spark's replaceWhere): atomically replace
exactly the predicate-matched rows — the backfill shape that must never
rewrite the whole table at scale. Copy-on-write, one commit."""

import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse as lh


def _mk(spark, root, part=True):
    df = spark.range(0, 100).select(
        "id",
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    lh.write_delta(spark, df, root, partition_by=["p"] if part else None)
    return df


def test_replace_one_partition_leaves_others_untouched(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    before = {f for f in lh._replay_log(root)[0] if "/p=1/" not in f}
    new = spark.range(1000, 1005).select(
        "id", F.lit(1).alias("p"), F.lit(-1).alias("v")
    )
    lh.overwrite_delta_where(spark, new, root, "p = 1")
    after_files, _ = lh._replay_log(root)
    # every non-p=1 file survived the commit byte-identical (no rewrite)
    assert before <= set(after_files)
    got = lh.read_delta(spark, root)
    assert got.where("p = 1").count() == 5
    assert got.where("p <> 1").count() == 75
    assert got.count() == 80
    assert {r.v for r in got.where("p = 1").collect()} == {-1}


def test_replace_non_partition_predicate_keeps_survivors(spark, tmp_path):
    root = str(tmp_path / "np")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "a", 40)],
        "id int, k string, v int",
    )
    lh.write_delta(spark, df, root)
    new = spark.createDataFrame([(9, "a", 99)], "id int, k string, v int")
    lh.overwrite_delta_where(spark, new, root, "k = 'a'")
    rows = {
        (r.id, r.k, r.v) for r in lh.read_delta(spark, root).collect()
    }
    # NULL-pred row (id=3) is a survivor; both k='a' rows replaced by one
    assert rows == {(2, "b", 20), (3, None, 30), (9, "a", 99)}


def test_source_must_satisfy_predicate(spark, tmp_path):
    root = str(tmp_path / "c")
    _mk(spark, root)
    bad = spark.range(0, 3).select(
        "id", (F.col("id") % 4).alias("p"), F.lit(0).alias("v")
    )
    with pytest.raises(ValueError, match="replaceWhere constraint"):
        lh.overwrite_delta_where(spark, bad, root, "p = 1")
    # empty predicate refused — that is a full overwrite
    with pytest.raises(ValueError, match="empty predicate"):
        lh.overwrite_delta_where(spark, bad, root, "  ")


def test_replace_missing_partition_is_backfill_insert(spark, tmp_path):
    root = str(tmp_path / "b")
    _mk(spark, root)
    new = spark.range(500, 503).select(
        "id", F.lit(9).alias("p"), F.lit(7).alias("v")
    )
    lh.overwrite_delta_where(spark, new, root, "p = 9")
    got = lh.read_delta(spark, root)
    assert got.count() == 103
    assert got.where("p = 9").count() == 3


def test_cdf_emits_delete_and_insert(spark, tmp_path):
    root = str(tmp_path / "cdf")
    df = spark.range(0, 10).select("id", (F.col("id") % 2).alias("p"))
    lh.write_delta(spark, df, root, partition_by=["p"])
    lh.alter_delta_properties(root, {"delta.enableChangeDataFeed": "true"})
    new = spark.range(100, 102).select("id", F.lit(1).alias("p"))
    v = lh.overwrite_delta_where(spark, new, root, "p = 1")
    cdf = lh.read_delta_cdf(spark, root, since_version=v - 1)
    by_type = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"delete": 5, "insert": 2}


def test_txn_idempotent_replay(spark, tmp_path):
    root = str(tmp_path / "txn")
    _mk(spark, root)
    new = spark.range(0, 2).select("id", F.lit(2).alias("p"), F.lit(5).alias("v"))
    v1 = lh.overwrite_delta_where(spark, new, root, "p = 2", txn=("job", 1))
    v2 = lh.overwrite_delta_where(spark, new, root, "p = 2", txn=("job", 1))
    assert v2 == v1  # replay is a no-op
    assert lh.read_delta(spark, root).where("p = 2").count() == 2


def test_append_only_table_refuses(spark, tmp_path):
    root = str(tmp_path / "ao")
    df = spark.range(0, 4).select("id")
    lh.write_delta(spark, df, root)
    lh.alter_delta_properties(root, {"delta.appendOnly": "true"})
    with pytest.raises(ValueError, match="appendOnly"):
        lh.overwrite_delta_where(
            spark, spark.range(0, 1).select("id"), root, "id >= 0"
        )


def test_write_delta_replace_where_delegates(spark, tmp_path):
    """df.write.option('replaceWhere', ...) surface: write_delta with
    mode='overwrite' + replace_where runs the selective-overwrite path."""
    root = str(tmp_path / "wd")
    _mk(spark, root)
    new = spark.range(0, 2).select("id", F.lit(3).alias("p"), F.lit(1).alias("v"))
    lh.write_delta(
        spark, new, root, mode="overwrite", replace_where="p = 3"
    )
    got = lh.read_delta(spark, root)
    assert got.where("p = 3").count() == 2
    assert got.count() == 77
    with pytest.raises(ValueError, match="mode='overwrite'"):
        lh.write_delta(spark, new, root, replace_where="p = 3")
