"""Iceberg schema evolution beyond add-on-append (round 6): zero-rewrite
RENAME and DROP via a new schema that preserves field ids, with reads
resolving old files by the footer-stamped field ids."""

import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _mk(spark, tmp_path, name="t", fv=2):
    root = str(tmp_path / name)
    iceberg.write_iceberg(
        spark,
        spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=fv,
    )
    return root


def test_rename_is_metadata_only_and_reads_old_files(spark, tmp_path):
    root = _mk(spark, tmp_path)
    files_before = sorted(
        os.listdir(os.path.join(root, "data"))
    )
    iceberg.rename_iceberg_column(root, "v", "speed")
    assert sorted(os.listdir(os.path.join(root, "data"))) == files_before
    back = iceberg.read_iceberg(spark, root)
    assert back.columns == ["id", "speed"]
    got = sorted((r.id, r.speed) for r in back.collect())
    assert got == [(i, i * 2) for i in range(10)]


def test_rename_then_append_mixes_generations(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.rename_iceberg_column(root, "v", "speed")
    iceberg.write_iceberg(
        spark,
        spark.range(10, 15).select("id", (F.col("id") * 2).alias("speed")),
        root,
        format_version=2,
    )
    back = iceberg.read_iceberg(spark, root)
    got = sorted((r.id, r.speed) for r in back.collect())
    assert got == [(i, i * 2) for i in range(15)]
    # pushdown on the renamed column spans both file generations
    assert back.where("speed >= 20").count() == 5


def test_rename_chain_and_rename_back(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.rename_iceberg_column(root, "v", "a2")
    iceberg.rename_iceberg_column(root, "a2", "a3")
    iceberg.rename_iceberg_column(root, "a3", "v")
    back = iceberg.read_iceberg(spark, root)
    assert back.columns == ["id", "v"]
    assert back.agg(F.sum("v")).collect()[0][0] == sum(i * 2 for i in range(10))


def test_rename_then_row_level_delete(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.rename_iceberg_column(root, "v", "speed")
    iceberg.delete_iceberg(spark, root, "speed = 6")
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(10) if i != 3]


def test_drop_column(spark, tmp_path):
    root = _mk(spark, tmp_path)
    sid = iceberg.drop_iceberg_column(root, "v")
    assert sid >= 1
    back = iceberg.read_iceberg(spark, root)
    assert back.columns == ["id"]
    assert sorted(r.id for r in back.collect()) == list(range(10))
    # dropped id is never reused: evolving again keeps ids monotonic
    meta = iceberg._load_metadata(root)
    cur = iceberg._current_schema(meta)
    assert [f["id"] for f in cur["fields"]] == [1]


def test_drop_refusals(spark, tmp_path):
    root = str(tmp_path / "p")
    iceberg.write_iceberg(
        spark,
        spark.range(10).select("id", (F.col("id") % 2).alias("b")),
        root,
        format_version=2,
        partition_by=["b"],
    )
    with pytest.raises(ValueError, match="partition source"):
        iceberg.drop_iceberg_column(root, "b")
    root2 = _mk(spark, tmp_path, "one")
    iceberg.drop_iceberg_column(root2, "v")
    with pytest.raises(ValueError, match="last column"):
        iceberg.drop_iceberg_column(root2, "id")
    with pytest.raises(ValueError, match="no column"):
        iceberg.rename_iceberg_column(root2, "ghost", "x")
    with pytest.raises(ValueError, match="already exists"):
        iceberg.rename_iceberg_column(root2, "id", "id")


def test_rename_partitioned_source_column(spark, tmp_path):
    """Renaming a partition SOURCE column is legal (specs reference the
    field id, not the name) — pruning still works afterwards."""
    root = str(tmp_path / "ps")
    iceberg.write_iceberg(
        spark,
        spark.range(40).select("id", (F.col("id") % 4).alias("b")),
        root,
        format_version=2,
        partition_by=["b"],
    )
    iceberg.rename_iceberg_column(root, "b", "bucket_col")
    back = iceberg.read_iceberg(spark, root)
    assert sorted(back.columns) == ["bucket_col", "id"]
    assert back.where("bucket_col = 1").count() == 10
    rep = iceberg.iceberg_scan_report(root, "bucket_col = 1")
    assert rep["kept_files"] < rep["total_files"]


def test_stamped_field_ids_in_new_files(spark, tmp_path):
    import pyarrow.parquet as pq

    root = _mk(spark, tmp_path)
    data_dir = os.path.join(root, "data")
    for n in os.listdir(data_dir):
        if not n.endswith(".parquet"):
            continue
        sch = pq.read_schema(os.path.join(data_dir, n))
        fids = {
            f.name: int(f.metadata[b"PARQUET:field_id"])
            for f in sch
            if f.metadata and b"PARQUET:field_id" in f.metadata
        }
        assert fids == {"id": 1, "v": 2}
