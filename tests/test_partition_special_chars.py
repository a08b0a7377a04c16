"""Partition values with URI-special characters ('#', '%', ':', space —
TPC-H's own p_brand is 'Brand#13'): the staging walk must keep Spark's
escaped dir components verbatim, because a raw '#' in a file: URI
truncates at the fragment in every URI consumer (regression: merge into
a p_brand-partitioned table raised 'snapshot references deleted data
files')."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg, lakehouse


SPECIALS = ["Brand#13", "pct%20", "a:b", "sp ace", None]


def _df(spark):
    return spark.createDataFrame(
        [(i, b, i * 10) for i, b in enumerate(SPECIALS)],
        "id int, b string, v int",
    )


def test_iceberg_write_read_special_partition_values(spark, tmp_path):
    root = str(tmp_path / "w")
    iceberg.write_iceberg(
        spark, _df(spark), root, format_version=2, partition_by=["b"]
    )
    got = {(r.id, r.b, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {(i, b, i * 10) for i, b in enumerate(SPECIALS)}
    # manifest partition values are the LOGICAL (unescaped) strings, so
    # partition pruning matches the literal
    assert iceberg.read_iceberg(spark, root, where="b = 'Brand#13'").count() == 1


def test_iceberg_merge_and_update_special_partitions(spark, tmp_path):
    root = str(tmp_path / "m")
    iceberg.write_iceberg(
        spark, _df(spark), root, format_version=2, partition_by=["b"]
    )
    # merge: replace one row inside 'Brand#13', insert a new '#'-value row
    src = spark.createDataFrame(
        [(0, "Brand#13", -1), (9, "New#9", 90)], "id int, b string, v int"
    )
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    got = {(r.id, r.b, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert (0, "Brand#13", -1) in got and (9, "New#9", 90) in got
    assert len(got) == 6
    # update through _stage_data_entry's partitioned staging
    iceberg.update_iceberg(spark, root, {"v": "v + 1"}, where="b = 'New#9'")
    assert iceberg.read_iceberg(spark, root).where("id = 9").collect()[0].v == 91
    # compaction re-stages every partition and must round-trip too
    before = {
        (r.id, r.b, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    }
    iceberg.compact_iceberg(spark, root)
    after = {
        (r.id, r.b, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    }
    assert before == after


def test_localize_survives_raw_fragment_uri(tmp_path):
    # a foreign writer that stamped an UNESCAPED '#' path must still resolve
    d = tmp_path / "data" / "b=Brand#13"
    d.mkdir(parents=True)
    f = d / "x.parquet"
    f.write_bytes(b"")
    got = iceberg._localize(f"file:{f}", str(tmp_path))
    assert got == str(f)


def test_delta_partitioned_special_values_roundtrip(spark, tmp_path):
    root = str(tmp_path / "d")
    lakehouse.write_delta(spark, _df(spark), root, partition_by=["b"])
    got = {(r.id, r.b, r.v) for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {(i, b, i * 10) for i, b in enumerate(SPECIALS)}
    # merge through the partitioned rewrite path
    src = spark.createDataFrame([(0, "Brand#13", -1)], "id int, b string, v int")
    lakehouse.merge_delta(spark, src, root, keys=["id"])
    got = {(r.id, r.v) for r in lakehouse.read_delta(spark, root).collect()}
    assert (0, -1) in got and len(got) == 5


def test_delta_dv_masks_special_partitions(spark, tmp_path):
    """Round-7 regression: _apply_dv_filter joined the RAW driver path
    against the percent-ENCODED _metadata.file_path — on special-char
    partition dirs every masked row silently RESURRECTED (and the DV
    write itself keyed the wrong rel). Covers the literal-'%' dir too
    ('pct%20' Hive-escapes to %25 on disk, double-encodes in the URI)."""
    root = str(tmp_path / "dv")
    lakehouse.write_delta(spark, _df(spark), root, partition_by=["b"])
    lakehouse.delete_delta(spark, root, "id <= 1")  # Brand#13 + pct%20 rows
    got = {(r.id, r.b) for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {(2, "a:b"), (3, "sp ace"), (4, None)}
    # row-tracked sibling: the id-map join decodes the same way
    rt = str(tmp_path / "rt")
    lakehouse.write_delta(
        spark, _df(spark), rt, partition_by=["b"], row_tracking=True
    )
    ids0 = {
        r.id: r.row_id
        for r in lakehouse.read_delta_row_ids(spark, rt).collect()
    }
    assert len(ids0) == 5
    src = spark.createDataFrame([(0, "Brand#13", -1)], "id int, b string, v int")
    vm = lakehouse.merge_delta(spark, src, rt, keys=["id"])
    ids1 = {
        r.id: (r.row_id, r.row_commit_version)
        for r in lakehouse.read_delta_row_ids(spark, rt).collect()
    }
    assert ids1[0] == (ids0[0], vm)
    assert all(ids1[k][0] == ids0[k] for k in ids0)


def test_conversion_carries_deletes_on_special_partitions(spark, tmp_path):
    """Both conversion directions must carry row-level deletes across
    special-char partition dirs (encoded delete-file content vs raw
    manifest/on-disk paths resolve through _localize_decoded)."""
    # iceberg -> delta with pos + equality deletes
    it = str(tmp_path / "i2d")
    iceberg.write_iceberg(
        spark, _df(spark), it, format_version=2, partition_by=["b"]
    )
    iceberg.delete_iceberg(spark, it, "id = 3")
    iceberg.delete_iceberg_equality(
        spark, it, spark.createDataFrame([(0,)], "id int")
    )
    from feature_store_ml_spark.io import convert

    convert.convert_iceberg_to_delta(spark, it)
    i = {(r.id, r.b) for r in iceberg.read_iceberg(spark, it).collect()}
    d = {(r.id, r.b) for r in lakehouse.read_delta(spark, it).collect()}
    assert i == d == {(1, "pct%20"), (2, "a:b"), (4, None)}
    # delta -> iceberg with a DV
    dt = str(tmp_path / "d2i")
    lakehouse.write_delta(spark, _df(spark), dt, partition_by=["b"])
    lakehouse.delete_delta(spark, dt, "id = 1")
    convert.convert_delta_to_iceberg(spark, dt)
    d2 = {r.id for r in lakehouse.read_delta(spark, dt).collect()}
    i2 = {r.id for r in iceberg.read_iceberg(spark, dt).collect()}
    assert d2 == i2 == {0, 2, 3, 4}


def test_conversion_carries_pos_deletes_special_table_root(spark, tmp_path):
    """ADVICE r7: the pos-delete fold joins the delete parquet's
    _metadata.file_path (percent-ENCODED URI) against driver-built raw
    abspaths — a table ROOT with URI-escaped characters made the join
    match nothing and silently dropped every position delete from the
    converted Delta DVs."""
    from feature_store_ml_spark.io import convert

    root = str(tmp_path / "sp ace#dir")
    df = spark.range(0, 60).select("id", (F.col("id") % 3).alias("v"))
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.delete_iceberg(spark, root, "v = 1")
    convert.convert_iceberg_to_delta(spark, root)
    i = {r.id for r in iceberg.read_iceberg(spark, root).collect()}
    d = {r.id for r in lakehouse.read_delta(spark, root).collect()}
    assert i == d and len(d) == 40, "position deletes dropped in conversion"
    adds, _meta = lakehouse._replay_log_adds(root)
    assert any(a.get("deletionVector") for a in adds.values()), (
        "converted table carries no DV — the delete fold matched nothing"
    )
