"""Iceberg selective overwrite (overwrite_iceberg_where): replace the
predicate-matched rows with new data in ONE merge-on-read snapshot —
position-delete manifest + data manifest, operation 'overwrite'."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _mk(spark, root, partition_by=None):
    df = spark.range(0, 100).select(
        "id",
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    iceberg.write_iceberg(
        spark, df, root, format_version=2, partition_by=partition_by
    )


def test_overwrite_partition(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["p"])
    new = spark.range(1000, 1005).select(
        "id", F.lit(1).alias("p"), F.lit(-1).alias("v")
    )
    sid = iceberg.overwrite_iceberg_where(spark, new, root, "p = 1")
    got = iceberg.read_iceberg(spark, root)
    assert got.where("p = 1").count() == 5
    assert got.where("p <> 1").count() == 75
    assert {r.v for r in got.where("p = 1").collect()} == {-1}
    # prior snapshot still reads the old rows (atomic MoR swap)
    meta = iceberg._load_metadata(root)
    prior = next(
        s["parent-snapshot-id"] for s in meta["snapshots"]
        if s["snapshot-id"] == sid
    )
    assert (
        iceberg.read_iceberg(spark, root, snapshot_id=prior)
        .where("p = 1").count() == 25
    )
    op = next(
        s["summary"]["operation"] for s in meta["snapshots"]
        if s["snapshot-id"] == sid
    )
    assert op == "overwrite"


def test_overwrite_non_partition_predicate_null_survives(spark, tmp_path):
    root = str(tmp_path / "np")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "a", 40)],
        "id int, k string, v int",
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    new = spark.createDataFrame([(9, "a", 99)], "id int, k string, v int")
    iceberg.overwrite_iceberg_where(spark, new, root, "k = 'a'")
    rows = {
        (r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    }
    assert rows == {(2, "b", 20), (3, None, 30), (9, "a", 99)}


def test_source_must_satisfy_predicate(spark, tmp_path):
    root = str(tmp_path / "c")
    _mk(spark, root)
    bad = spark.range(0, 3).select(
        "id", (F.col("id") % 4).alias("p"), F.lit(0).alias("v")
    )
    with pytest.raises(ValueError, match="replaceWhere constraint"):
        iceberg.overwrite_iceberg_where(spark, bad, root, "p = 1")
    with pytest.raises(ValueError, match="empty predicate"):
        iceberg.overwrite_iceberg_where(spark, bad, root, " ")


def test_backfill_insert_when_nothing_matches(spark, tmp_path):
    root = str(tmp_path / "b")
    _mk(spark, root, partition_by=["p"])
    new = spark.range(500, 503).select(
        "id", F.lit(9).alias("p"), F.lit(7).alias("v")
    )
    iceberg.overwrite_iceberg_where(spark, new, root, "p = 9")
    got = iceberg.read_iceberg(spark, root)
    assert got.count() == 103
    assert got.where("p = 9").count() == 3


def test_compact_then_reads_identical(spark, tmp_path):
    root = str(tmp_path / "cp")
    _mk(spark, root, partition_by=["p"])
    new = spark.range(1000, 1010).select(
        "id", F.lit(2).alias("p"), F.lit(5).alias("v")
    )
    iceberg.overwrite_iceberg_where(spark, new, root, "p = 2")
    before = sorted(
        (r.id, r.p, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    iceberg.compact_iceberg(spark, root)
    after = sorted(
        (r.id, r.p, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert before == after


def test_compact_applies_declared_sort_order(spark, tmp_path):
    """Compaction restores the declared clustering: after an unsorted
    merge-on-read era, the rewrite's files have near-disjoint bounds on
    the sort column again."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    root = str(tmp_path / "sorted")
    df = spark.range(0, 10000).select(
        (F.col("id") * 37 % 10000).alias("k"), F.col("id").alias("v")
    )
    iceberg.write_iceberg(
        spark, df, root, format_version=2, sort_by=["k"]
    )
    iceberg.delete_iceberg(spark, root, "k % 100 = 0")
    before = sorted((r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect())
    iceberg.compact_iceberg(spark, root, target_file_bytes=16 << 10)
    after = sorted((r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect())
    assert before == after
    # per-file k-ranges are disjoint after the sorted rewrite
    meta = iceberg._load_metadata(root)
    files = iceberg._snapshot_content(
        meta, meta["current-snapshot-id"], root
    )[0]
    assert len(files) > 1
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["k"])["k"].to_pylist()
        ranges.append((min(t), max(t)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
