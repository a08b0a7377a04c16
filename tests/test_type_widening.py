"""Zero-rewrite ALTER COLUMN TYPE on both open formats (round 6).

Delta: the protocol's TYPE WIDENING table feature — the new metaData
carries the widened schemaString plus a delta.typeChanges history entry,
and the protocol moves to table features (3/7) with typeWidening in both
lists. Iceberg: the spec's §Schema Evolution promotions (int->long,
float->double, decimal precision growth). Both rely on every scan reading
with the DECLARED schema, under which Spark's parquet reader performs the
promotions natively — old (narrow) files are never rewritten.

The reference (a 136-LoC pandas demo, /root/reference/src) has no table
format; this exists for the 100 TB mandate where re-typing a column must
not rewrite 100 TB of parquet.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg, lakehouse


def _delta_int_table(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    lakehouse.write_delta(
        spark,
        spark.range(10).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 2).cast("int").alias("v"),
        ),
        root,
        mode="overwrite",
    )
    return root


# ---------------------------------------------------------------- Delta


def test_delta_widen_int_to_long_reads_old_files(spark, tmp_path):
    root = _delta_int_table(spark, tmp_path)
    data_before = sorted(
        f for f in os.listdir(root) if f.endswith(".parquet")
    )
    lakehouse.widen_delta_column_type(spark, root, "v", "long")
    # zero rewrite: the data files are untouched
    assert sorted(f for f in os.listdir(root) if f.endswith(".parquet")) == data_before
    back = lakehouse.read_delta(spark, root)
    assert dict(back.dtypes)["v"] == "bigint"
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, i * 2) for i in range(10)
    ]


def test_delta_widen_then_append_wide_values(spark, tmp_path):
    root = _delta_int_table(spark, tmp_path)
    lakehouse.widen_delta_column_type(spark, root, "v", "long")
    big = 2**40
    lakehouse.write_delta(
        spark,
        spark.range(10, 12).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") + big).alias("v"),
        ),
        root,
    )
    back = lakehouse.read_delta(spark, root)
    got = sorted((r.k, r.v) for r in back.collect())
    assert got[-1] == (11, 11 + big)
    assert len(got) == 12
    # a stale producer still writing int fails loudly, not silently
    with pytest.raises(ValueError, match="schema mismatch"):
        lakehouse.write_delta(
            spark,
            spark.range(1).select(
                F.col("id").cast("int").alias("k"),
                F.col("id").cast("int").alias("v"),
            ),
            root,
        )


def test_delta_widen_protocol_and_type_changes_metadata(spark, tmp_path):
    root = _delta_int_table(spark, tmp_path)
    lakehouse.widen_delta_column_type(spark, root, "v", "decimal(20,2)")
    proto = lakehouse._current_protocol(root)
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]
    _, meta = lakehouse._replay_log(root)
    fld = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "v"
    )
    assert fld["type"] == "decimal(20,2)"
    assert fld["metadata"]["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "decimal(20,2)"}
    ]
    # our own reader accepts the upgraded protocol (typeWidening is in the
    # supported reader-feature set)
    assert lakehouse.read_delta(spark, root).count() == 10


def test_delta_widen_chain_records_history(spark, tmp_path):
    root = _delta_int_table(spark, tmp_path)
    lakehouse.widen_delta_column_type(spark, root, "v", "long")
    lakehouse.widen_delta_column_type(spark, root, "v", "decimal(22,0)")
    _, meta = lakehouse._replay_log(root)
    fld = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "v"
    )
    assert [c["toType"] for c in fld["metadata"]["delta.typeChanges"]] == [
        "long",
        "decimal(22,0)",
    ]
    assert lakehouse.read_delta(spark, root).agg(F.sum("v")).collect()[0][
        0
    ] == sum(i * 2 for i in range(10))


def test_delta_widen_float_to_double_and_date_to_ntz(spark, tmp_path):
    root = str(tmp_path / "fd")
    lakehouse.write_delta(
        spark,
        spark.range(4).select(
            (F.col("id") + 0.5).cast("float").alias("x"),
            F.to_date(F.lit("2024-03-01")).alias("d"),
        ),
        root,
        mode="overwrite",
    )
    lakehouse.widen_delta_column_type(spark, root, "x", "double")
    lakehouse.widen_delta_column_type(spark, root, "d", "timestamp_ntz")
    back = lakehouse.read_delta(spark, root)
    assert dict(back.dtypes) == {"x": "double", "d": "timestamp_ntz"}
    rows = back.orderBy("x").collect()
    assert rows[0].x == 0.5 and rows[0].d.isoformat() == "2024-03-01T00:00:00"


def test_delta_widen_refuses_narrowing_and_cross_family(spark, tmp_path):
    root = _delta_int_table(spark, tmp_path)
    with pytest.raises(ValueError, match="not a widening"):
        lakehouse.widen_delta_column_type(spark, root, "v", "short")
    with pytest.raises(ValueError, match="not a widening"):
        lakehouse.widen_delta_column_type(spark, root, "v", "string")
    with pytest.raises(ValueError, match="already"):
        lakehouse.widen_delta_column_type(spark, root, "v", "integer")
    with pytest.raises(ValueError, match="no column"):
        lakehouse.widen_delta_column_type(spark, root, "zz", "long")
    # decimal scale may grow only with the integer digits preserved
    lakehouse.widen_delta_column_type(spark, root, "v", "decimal(12,2)")
    with pytest.raises(ValueError, match="not a widening"):
        lakehouse.widen_delta_column_type(spark, root, "v", "decimal(11,2)")


def test_delta_widen_refuses_byte_short_to_decimal(spark, tmp_path):
    """Spec-legal but unreadable: Spark's parquet reader does not promote
    INT(8)/INT(16)-annotated columns to decimal, so admitting the change
    would commit a schema the scanner cannot read back."""
    root = str(tmp_path / "bs")
    lakehouse.write_delta(
        spark,
        spark.range(4).select(F.col("id").cast("short").alias("s")),
        root,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="not a widening"):
        lakehouse.widen_delta_column_type(spark, root, "s", "decimal(10,0)")
    lakehouse.widen_delta_column_type(spark, root, "s", "long")  # fine
    assert [r.s for r in lakehouse.read_delta(spark, root).orderBy("s").collect()] == [
        0, 1, 2, 3,
    ]


def test_delta_widen_refuses_partition_column(spark, tmp_path):
    root = str(tmp_path / "p")
    lakehouse.write_delta(
        spark,
        spark.range(6).select(
            (F.col("id") % 2).cast("int").alias("p"),
            F.col("id").alias("v"),
        ),
        root,
        mode="overwrite",
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partition column"):
        lakehouse.widen_delta_column_type(spark, root, "p", "long")


def test_delta_widen_interops_with_dv_delete_and_skipping(spark, tmp_path):
    root = _delta_int_table(spark, tmp_path)
    lakehouse.widen_delta_column_type(spark, root, "v", "long")
    lakehouse.delete_delta(spark, root, "v = 4")
    back = lakehouse.read_delta(spark, root)
    assert sorted(r.k for r in back.collect()) == [i for i in range(10) if i != 2]
    # data skipping on the widened column: stats were written as int and
    # remain valid bounds for the long-typed predicate
    assert lakehouse.read_delta(spark, root, where="v >= 6").count() == 7


def test_delta_widen_on_column_mapped_table_carries_feature(spark, tmp_path):
    root = str(tmp_path / "cm")
    lakehouse.write_delta(
        spark,
        spark.range(5).select(
            F.col("id").cast("int").alias("a"),
            F.col("id").cast("int").alias("b"),
        ),
        root,
        mode="overwrite",
    )
    lakehouse.rename_delta_column(spark, root, "b", "c")  # upgrades to name mode
    lakehouse.widen_delta_column_type(spark, root, "c", "long")
    proto = lakehouse._current_protocol(root)
    assert "columnMapping" in proto["readerFeatures"]
    assert "typeWidening" in proto["readerFeatures"]
    back = lakehouse.read_delta(spark, root)
    assert dict(back.dtypes)["c"] == "bigint"
    assert sorted((r.a, r.c) for r in back.collect()) == [(i, i) for i in range(5)]


# -------------------------------------------------------------- Iceberg


def _ice_table(spark, tmp_path, name="it"):
    root = str(tmp_path / name)
    iceberg.write_iceberg(
        spark,
        spark.range(10).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 2).cast("int").alias("v"),
        ),
        root,
        format_version=2,
    )
    return root


def test_iceberg_widen_int_to_long_reads_old_files(spark, tmp_path):
    root = _ice_table(spark, tmp_path)
    files_before = sorted(os.listdir(os.path.join(root, "data")))
    iceberg.widen_iceberg_column(root, "v", "long")
    assert sorted(os.listdir(os.path.join(root, "data"))) == files_before
    back = iceberg.read_iceberg(spark, root)
    assert dict(back.dtypes)["v"] == "bigint"
    assert sorted((r.k, r.v) for r in back.collect()) == [
        (i, i * 2) for i in range(10)
    ]


def test_iceberg_widen_then_append_mixes_generations(spark, tmp_path):
    root = _ice_table(spark, tmp_path)
    iceberg.widen_iceberg_column(root, "v", "long")
    big = 2**40
    iceberg.write_iceberg(
        spark,
        spark.range(10, 13).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") + big).alias("v"),
        ),
        root,
        format_version=2,
    )
    back = iceberg.read_iceberg(spark, root)
    got = sorted((r.k, r.v) for r in back.collect())
    assert len(got) == 13 and got[-1] == (12, 12 + big)
    # data skipping still prunes on the widened column: old manifests'
    # 4-byte int bounds decode via the length sniff, new ones are 8-byte
    rep = iceberg.iceberg_scan_report(root, f"v >= {big}")
    assert rep["skipped_files"] >= 1
    assert iceberg.read_iceberg(spark, root, where=f"v >= {big}").count() == 3


def test_iceberg_widen_float_to_double_and_decimal(spark, tmp_path):
    root = str(tmp_path / "fd")
    iceberg.write_iceberg(
        spark,
        spark.range(4).select(
            (F.col("id") + 0.5).cast("float").alias("x"),
            F.col("id").cast("decimal(5,2)").alias("m"),
        ),
        root,
        format_version=2,
    )
    iceberg.widen_iceberg_column(root, "x", "double")
    iceberg.widen_iceberg_column(root, "m", "decimal(12,2)")
    back = iceberg.read_iceberg(spark, root)
    assert dict(back.dtypes) == {"x": "double", "m": "decimal(12,2)"}
    assert back.agg(F.sum("m")).collect()[0][0] == 6


def test_iceberg_widen_refusals(spark, tmp_path):
    root = _ice_table(spark, tmp_path)
    with pytest.raises(ValueError, match="not an allowed"):
        iceberg.widen_iceberg_column(root, "v", "double")  # not in spec's set
    with pytest.raises(ValueError, match="no column"):
        iceberg.widen_iceberg_column(root, "zz", "long")
    iceberg.widen_iceberg_column(root, "v", "long")
    with pytest.raises(ValueError, match="not an allowed"):
        iceberg.widen_iceberg_column(root, "v", "int")  # narrowing
    # decimal scale change is NOT allowed by the iceberg spec
    root2 = str(tmp_path / "dec")
    iceberg.write_iceberg(
        spark,
        spark.range(3).select(F.col("id").cast("decimal(5,2)").alias("m")),
        root2,
        format_version=2,
    )
    with pytest.raises(ValueError, match="not an allowed"):
        iceberg.widen_iceberg_column(root2, "m", "decimal(10,4)")


def test_iceberg_widen_refuses_partition_source(spark, tmp_path):
    root = str(tmp_path / "part")
    iceberg.write_iceberg(
        spark,
        spark.range(6).select(
            (F.col("id") % 2).cast("int").alias("p"),
            F.col("id").alias("v"),
        ),
        root,
        partition_by=["p"],
        format_version=2,
    )
    with pytest.raises(ValueError, match="partition source"):
        iceberg.widen_iceberg_column(root, "p", "long")


def test_decimal_columns_write_without_stats_crash(spark, tmp_path):
    """Regression: pyarrow raises ArrowNotImplementedError materializing
    footer min/max for decimal physical types; the stats collectors must
    fail open (no bounds) instead of failing the WRITE."""
    droot = str(tmp_path / "d_dec")
    lakehouse.write_delta(
        spark,
        spark.range(5).select(
            F.col("id").alias("k"), F.col("id").cast("decimal(7,2)").alias("m")
        ),
        droot,
        mode="overwrite",
    )
    back = lakehouse.read_delta(spark, droot)
    assert back.agg(F.sum("m")).collect()[0][0] == 10
    # non-decimal sibling columns keep their bounds (per-column fail-open)
    adds, _ = lakehouse._replay_log_adds(droot)
    stats = [
        s
        for s in (
            json.loads(a["stats"]) for a in adds.values() if a.get("stats")
        )
        if s.get("numRecords")  # empty split files carry no bounds
    ]
    assert stats and all("k" in s.get("minValues", {}) for s in stats)


def test_iceberg_widen_then_rename_composes(spark, tmp_path):
    root = _ice_table(spark, tmp_path)
    iceberg.widen_iceberg_column(root, "v", "long")
    iceberg.rename_iceberg_column(root, "v", "speed")
    back = iceberg.read_iceberg(spark, root)
    assert dict(back.dtypes)["speed"] == "bigint"
    assert back.agg(F.sum("speed")).collect()[0][0] == sum(
        i * 2 for i in range(10)
    )
