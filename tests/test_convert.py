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
