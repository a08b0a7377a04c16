"""Iceberg IDENTITY partitions with DATE sources (spec: partition tuples
hold days-from-epoch ints, Avro date logical type) — write, prune, DML,
and cross-format conversion in both directions."""

import datetime as dt

from pyspark.sql import functions as F

from feature_store_ml_spark.io import convert, iceberg, lakehouse


def _df(spark, n=300, days=5):
    return (
        spark.range(0, n)
        .withColumn(
            "day",
            F.date_add(
                F.lit("2024-01-01").cast("date"), (F.col("id") % days).cast("int")
            ),
        )
        .withColumn("v", F.col("id") * 2)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_identity_date_write_prune_read(spark, tmp_path):
    t = str(tmp_path / "d")
    iceberg.write_iceberg(
        spark, _df(spark), t, format_version=2, partition_by=["day"]
    )
    assert iceberg.read_iceberg(spark, t).count() == 300
    rep = iceberg.iceberg_scan_report(t, "day = DATE'2024-01-03'")
    assert rep["kept_files"] < rep["total_files"]
    got = iceberg.read_iceberg(spark, t, where="day = DATE'2024-01-03'")
    assert got.count() == 60
    assert all(r.day == dt.date(2024, 1, 3) for r in got.collect())
    # manifest tuples hold days ints, not strings
    meta = iceberg._load_metadata(t)
    data, _d = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], t)
    vals = {e["partition"]["day"] for e in data}
    assert all(isinstance(v, int) for v in vals)
    assert iceberg._parse_date_days("2024-01-01") in vals


def test_identity_date_dml(spark, tmp_path):
    t = str(tmp_path / "m")
    iceberg.write_iceberg(
        spark, _df(spark, 100, 3), t, format_version=2, partition_by=["day"]
    )
    src = (
        spark.range(0, 5)
        .withColumn("day", F.lit("2024-01-05").cast("date"))
        .withColumn("v", F.lit(-1).cast("long"))
    )
    iceberg.merge_iceberg(spark, src, t, keys=["id"])  # partition MOVES
    out = iceberg.read_iceberg(spark, t)
    assert out.count() == 100
    assert out.where("day = DATE'2024-01-05'").count() == 5
    iceberg.delete_iceberg(spark, t, "v = -1")
    assert iceberg.read_iceberg(spark, t).count() == 95
    iceberg.update_iceberg(spark, t, {"v": "99"}, "id = 7")
    assert iceberg.read_iceberg(spark, t).where("v = 99").count() == 1


def test_date_partition_conversion_both_ways(spark, tmp_path):
    # Iceberg -> Delta: days ints become ISO partitionValues, skipping on
    i2d = str(tmp_path / "i2d")
    iceberg.write_iceberg(
        spark, _df(spark), i2d, format_version=2, partition_by=["day"]
    )
    convert.convert_iceberg_to_delta(spark, i2d)
    assert _rows(iceberg.read_iceberg(spark, i2d)) == _rows(
        lakehouse.read_delta(spark, i2d)
    )
    rep = lakehouse.skipping_report(i2d, "day = '2024-01-03'")
    assert rep["kept_files"] < rep["total_files"]

    # Delta -> Iceberg: partitioned Delta files OMIT the date column, so
    # the read exercises identity-partition projection from the tuples
    d2i = str(tmp_path / "d2i")
    lakehouse.write_delta(spark, _df(spark), d2i, partition_by=["day"])
    lakehouse.delete_delta(spark, d2i, "v % 4 = 0")  # DVs ride along
    convert.convert_delta_to_iceberg(spark, d2i)
    assert _rows(lakehouse.read_delta(spark, d2i)) == _rows(
        iceberg.read_iceberg(spark, d2i)
    )
    rep2 = iceberg.iceberg_scan_report(d2i, "day = DATE'2024-01-02'")
    assert rep2["kept_files"] < rep2["total_files"]
