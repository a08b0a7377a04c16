"""Cross-format conversion (io/convert.py): Delta ⇄ Iceberg as in-place
metadata translation over the same parquet files — the UniForm/XTable
shape. Zero data movement; both formats read identical rows after."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import convert, iceberg, lakehouse


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_to_iceberg_roundtrip(spark, tmp_path):
    root = str(tmp_path / "d2i")
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 4).alias("p"), (F.col("id") * 10).alias("v")
    )
    lakehouse.write_delta(spark, df, root, partition_by=["p"])
    # a second commit so the converter sees multi-commit state
    lakehouse.write_delta(
        spark,
        spark.range(100, 120).select(
            "id", (F.col("id") % 4).alias("p"), F.lit(-1).cast("long").alias("v")
        ),
        root,
        partition_by=["p"],
    )
    convert.convert_delta_to_iceberg(spark, root)
    d = lakehouse.read_delta(spark, root).select("id", "p", "v")
    i = iceberg.read_iceberg(spark, root).select("id", "p", "v")
    assert _rows(d) == _rows(i)
    assert i.count() == 120
    # identity partition carried over: pruning engages on the Iceberg side
    rep = iceberg.iceberg_scan_report(root, "p = 1")
    assert rep["kept_files"] < rep["total_files"]
    # converted table accepts further Iceberg writes
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(999, 1, 7)], "id bigint, p bigint, v bigint"),
        root,
        format_version=2,
        partition_by=["p"],
    )
    assert iceberg.read_iceberg(spark, root).count() == 121


def test_iceberg_to_delta_roundtrip(spark, tmp_path):
    root = str(tmp_path / "i2d")
    df = spark.range(0, 60).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, partition_by=["p"])
    iceberg.write_iceberg(
        spark,
        spark.range(60, 80).select(
            "id", (F.col("id") % 3).alias("p"), F.lit(-5).cast("long").alias("v")
        ),
        root,
        format_version=2,
        partition_by=["p"],
    )
    convert.convert_iceberg_to_delta(spark, root)
    i = iceberg.read_iceberg(spark, root).select("id", "p", "v")
    d = lakehouse.read_delta(spark, root).select("id", "p", "v")
    assert _rows(i) == _rows(d)
    # stats landed: Delta data skipping engages on the converted log
    rep = lakehouse.skipping_report(root, "p = 2")
    assert rep["kept_files"] < rep["total_files"]
    # converted table accepts further Delta writes
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(999, 2, 7)], "id bigint, p bigint, v bigint"),
        root,
        partition_by=["p"],
    )
    assert lakehouse.read_delta(spark, root).count() == 81


def test_refusals(spark, tmp_path):
    # DV'd Delta table refuses until compacted
    dv = str(tmp_path / "dv")
    lakehouse.write_delta(spark, spark.range(0, 50).select("id"), dv)
    lakehouse.delete_delta(spark, dv, "id < 5")
    with pytest.raises(ValueError, match="deletion vectors"):
        convert.convert_delta_to_iceberg(spark, dv)
    lakehouse.compact_delta(spark, dv)
    convert.convert_delta_to_iceberg(spark, dv)
    assert iceberg.read_iceberg(spark, dv).count() == 45
    # double conversion refuses
    with pytest.raises(ValueError, match="already exists"):
        convert.convert_delta_to_iceberg(spark, dv)

    # Iceberg with live position deletes refuses until compacted
    pd = str(tmp_path / "pd")
    iceberg.write_iceberg(
        spark, spark.range(0, 50).select("id"), pd, format_version=2
    )
    iceberg.delete_iceberg(spark, pd, "id < 5")
    with pytest.raises(ValueError, match="delete file"):
        convert.convert_iceberg_to_delta(spark, pd)
    iceberg.compact_iceberg(spark, pd)
    convert.convert_iceberg_to_delta(spark, pd)
    assert lakehouse.read_delta(spark, pd).count() == 45

    # bucket-transform partitions have no Delta equivalent
    bt = str(tmp_path / "bt")
    iceberg.write_iceberg(
        spark,
        spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")),
        bt,
        format_version=2,
        partition_by=["bucket(4, id)"],
    )
    with pytest.raises(NotImplementedError, match="transform"):
        convert.convert_iceberg_to_delta(spark, bt)

    # column-mapped Delta refuses
    cm = str(tmp_path / "cm")
    lakehouse.write_delta(spark, spark.range(0, 5).select("id"), cm)
    lakehouse.enable_delta_column_mapping(spark, cm)
    with pytest.raises(NotImplementedError, match="column-mapped"):
        convert.convert_delta_to_iceberg(spark, cm)


def test_refresh_delta_to_iceberg(spark, tmp_path):
    """refresh=True re-syncs the Iceberg view after new Delta commits:
    one appended snapshot, stable field ids, prior snapshot still
    time-travelable."""
    root = str(tmp_path / "rf")
    lakehouse.write_delta(spark, spark.range(0, 10).select("id"), root)
    s1 = convert.convert_delta_to_iceberg(spark, root)
    lakehouse.write_delta(
        spark, spark.range(10, 25).select("id"), root, mode="append"
    )
    # a mutation that REMOVES files from the live set too
    lakehouse.delete_delta(spark, root, "id < 3")
    lakehouse.compact_delta(spark, root)
    with pytest.raises(ValueError, match="refresh=True"):
        convert.convert_delta_to_iceberg(spark, root)
    s2 = convert.convert_delta_to_iceberg(spark, root, refresh=True)
    assert s2 != s1
    d = sorted(r.id for r in lakehouse.read_delta(spark, root).collect())
    i = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert d == i and len(i) == 22
    # the pre-refresh conversion snapshot still reads its own era
    assert iceberg.read_iceberg(spark, root, snapshot_id=s1).count() == 10
    # field ids stayed stable across the refresh
    fields = iceberg._current_schema(iceberg._load_metadata(root))["fields"]
    assert [f["id"] for f in fields] == [1]


def test_refresh_iceberg_to_delta(spark, tmp_path):
    """refresh=True re-syncs the Delta view after new Iceberg snapshots:
    one diff commit (adds + removes), time travel to the first
    conversion still works."""
    root = str(tmp_path / "rfd")
    iceberg.write_iceberg(
        spark, spark.range(0, 10).select("id"), root, format_version=2
    )
    v0 = convert.convert_iceberg_to_delta(spark, root)
    iceberg.write_iceberg(
        spark, spark.range(10, 25).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg(spark, root, "id < 3")
    iceberg.compact_iceberg(spark, root)  # clears delete files, rewrites
    with pytest.raises(ValueError, match="refresh=True"):
        convert.convert_iceberg_to_delta(spark, root)
    v1 = convert.convert_iceberg_to_delta(spark, root, refresh=True)
    assert v1 > v0
    i = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    d = sorted(r.id for r in lakehouse.read_delta(spark, root).collect())
    assert i == d and len(d) == 22
    # time travel to the first converted version
    assert lakehouse.read_delta(spark, root, version=v0).count() == 10


def test_distributed_stats_path_identical(spark, tmp_path):
    """Above the file-count threshold the footer walk runs as a Spark job;
    forcing it (threshold=1) must produce byte-identical metadata
    decisions: same skipping behavior, same rows."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    df = spark.range(0, 40).select("id", (F.col("id") % 4).alias("p"))
    for root in (a, b):
        lakehouse.write_delta(spark, df, root, partition_by=["p"])
    convert.convert_delta_to_iceberg(spark, a)  # driver loop
    convert.convert_delta_to_iceberg(spark, b, stats_threshold=1)  # Spark job
    ra = iceberg.iceberg_scan_report(a, "p = 2")
    rb = iceberg.iceberg_scan_report(b, "p = 2")
    assert ra == rb and rb["kept_files"] < rb["total_files"]
    assert _rows(iceberg.read_iceberg(spark, a)) == _rows(
        iceberg.read_iceberg(spark, b)
    )
    # reverse direction too
    c = str(tmp_path / "c")
    iceberg.write_iceberg(
        spark, df, c, format_version=2, partition_by=["p"]
    )
    convert.convert_iceberg_to_delta(spark, c, stats_threshold=1)
    rep = lakehouse.skipping_report(c, "p = 1")
    assert rep["kept_files"] < rep["total_files"]
    assert _rows(lakehouse.read_delta(spark, c)) == _rows(
        iceberg.read_iceberg(spark, c)
    )
