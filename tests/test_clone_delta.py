"""Shallow CLONE: a zero-copy Delta table whose adds reference the
source's files by absolute path — one metadata commit for any table
size, with copy-on-write isolation for every mutation on the clone."""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _mk(spark, tmp_path, name="src", n=20):
    root = str(tmp_path / name)
    lakehouse.write_delta(
        spark,
        spark.range(n).select(
            "id",
            (F.col("id") % 4).cast("int").alias("grp"),
            (F.col("id") * 10).alias("v"),
        ),
        root,
        mode="overwrite",
    )
    return root


def test_clone_reads_equal_and_copies_nothing(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    lakehouse.clone_delta(spark, src, dst)
    # zero data bytes in the clone dir — only the log
    assert not [f for f in os.listdir(dst) if f.endswith(".parquet")]
    got = sorted(
        (r.id, r.grp, r.v) for r in lakehouse.read_delta(spark, dst).collect()
    )
    assert got == [(i, i % 4, i * 10) for i in range(20)]
    # per-file stats carried: data skipping works on the clone
    assert lakehouse.read_delta(spark, dst, where="id >= 15").count() == 5


def test_clone_mutations_are_isolated_copy_on_write(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    lakehouse.clone_delta(spark, src, dst)
    src_files = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )
    lakehouse.update_delta(spark, dst, {"v": "v + 1"}, where="grp = 1")
    lakehouse.delete_delta(spark, dst, "id = 0")
    # source bytes and source table untouched
    assert sorted(f for f in os.listdir(src) if f.endswith(".parquet")) == src_files
    assert sorted((r.id, r.v) for r in lakehouse.read_delta(spark, src).collect()) == [
        (i, i * 10) for i in range(20)
    ]
    # clone sees its own history
    got = {r.id: r.v for r in lakehouse.read_delta(spark, dst).collect()}
    assert 0 not in got and len(got) == 19
    assert got[1] == 11 and got[5] == 51 and got[2] == 20
    # the update's rewrite cancelled the absolute-path adds it replaced
    # (remove recorded relative to the clone root must reconcile)
    adds, _ = lakehouse._replay_log_adds(dst)
    n_rows = sum(
        json.loads(a["stats"])["numRecords"] for a in adds.values() if a.get("stats")
    )
    assert n_rows >= 19


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    lakehouse.clone_delta(spark, src, dst)
    # rewrite everything on the clone -> every source-referenced add is
    # tombstoned; vacuum must collect only clone-local garbage
    lakehouse.update_delta(spark, dst, {"v": "v + 1"})
    src_files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    doomed = lakehouse.vacuum_delta(dst)
    assert sorted(f for f in os.listdir(src) if f.endswith(".parquet")) == src_files
    assert all(not d.startswith("..") and not os.path.isabs(d) for d in doomed)
    assert lakehouse.read_delta(spark, dst).count() == 20


def test_clone_carries_dv_masks_and_partitioning(spark, tmp_path):
    src = str(tmp_path / "psrc")
    lakehouse.write_delta(
        spark,
        spark.range(12).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        src, mode="overwrite", partition_by=["p"],
    )
    lakehouse.delete_delta(spark, src, "id = 3")
    dst = str(tmp_path / "pdst")
    lakehouse.clone_delta(spark, src, dst)
    back = lakehouse.read_delta(spark, dst)
    assert sorted(r.id for r in back.collect()) == [i for i in range(12) if i != 3]
    assert back.where("p = 1").count() == 5  # partition reconstruction


def test_clone_refusals_and_appends(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    lakehouse.clone_delta(spark, src, dst)
    with pytest.raises(ValueError, match="already a Delta table"):
        lakehouse.clone_delta(spark, src, dst)
    with pytest.raises(ValueError, match="not a Delta table"):
        lakehouse.clone_delta(spark, str(tmp_path / "nope"), dst + "2")
    # appends to the clone land clone-local and read back combined
    lakehouse.write_delta(
        spark,
        spark.range(20, 25).select(
            "id", (F.col("id") % 4).cast("int").alias("grp"),
            (F.col("id") * 10).alias("v"),
        ),
        dst, mode="append",
    )
    assert lakehouse.read_delta(spark, dst).count() == 25
    assert lakehouse.read_delta(spark, src).count() == 20


# --- Iceberg twin -------------------------------------------------------------


def test_clone_iceberg_reads_and_isolated_mutations(spark, tmp_path):
    from feature_store_ml_spark.io import iceberg

    src = str(tmp_path / "isrc")
    iceberg.write_iceberg(
        spark,
        spark.range(15).select("id", (F.col("id") * 10).alias("v")),
        src, format_version=2,
    )
    dst = str(tmp_path / "idst")
    iceberg.clone_iceberg(src, dst)
    assert not os.path.exists(os.path.join(dst, "data"))  # zero bytes copied
    got = sorted((r.id, r.v) for r in iceberg.read_iceberg(spark, dst).collect())
    assert got == [(i, i * 10) for i in range(15)]
    # mutate the CLONE: delete + update + append — source stays untouched
    iceberg.delete_iceberg(spark, dst, "id = 0")
    iceberg.update_iceberg(spark, dst, {"v": "v + 1"}, where="id = 1")
    iceberg.write_iceberg(
        spark,
        spark.range(15, 18).select("id", (F.col("id") * 10).alias("v")),
        dst, format_version=2,
    )
    assert iceberg.read_iceberg(spark, src).count() == 15
    cl = {r.id: r.v for r in iceberg.read_iceberg(spark, dst).collect()}
    assert 0 not in cl and cl[1] == 11 and cl[16] == 160 and len(cl) == 17


def test_clone_iceberg_expire_never_deletes_source_bytes(spark, tmp_path):
    from feature_store_ml_spark.io import iceberg

    src = str(tmp_path / "esrc")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id"), src, format_version=2
    )
    dst = str(tmp_path / "edst")
    iceberg.clone_iceberg(src, dst)
    iceberg.write_iceberg(
        spark, spark.range(10, 20).select("id"), dst, format_version=2
    )
    src_data = sorted(os.listdir(os.path.join(src, "data")))
    src_meta = sorted(os.listdir(os.path.join(src, "metadata")))
    out = iceberg.expire_iceberg_snapshots(dst, keep=1)
    # the expired clone snapshot referenced ONLY source files -> nothing
    # under the clone's root was deletable, and the source is untouched
    assert sorted(os.listdir(os.path.join(src, "data"))) == src_data
    assert sorted(os.listdir(os.path.join(src, "metadata"))) == src_meta
    assert all(f.startswith(os.path.abspath(dst)) for f in out["files"])
    assert iceberg.read_iceberg(spark, dst).count() == 20
    assert iceberg.read_iceberg(spark, src).count() == 10


def test_clone_iceberg_refusals(spark, tmp_path):
    from feature_store_ml_spark.io import iceberg

    src = str(tmp_path / "rsrc")
    iceberg.write_iceberg(
        spark, spark.range(3).select("id"), src, format_version=2
    )
    dst = str(tmp_path / "rdst")
    iceberg.clone_iceberg(src, dst)
    with pytest.raises(ValueError, match="already an Iceberg table"):
        iceberg.clone_iceberg(src, dst)
    with pytest.raises(ValueError, match="not an Iceberg table"):
        iceberg.clone_iceberg(str(tmp_path / "missing"), str(tmp_path / "x"))


def test_clone_carries_row_tracking_watermark(spark, tmp_path):
    # ADVICE r7: the clone must replay the source's domainMetadata —
    # without the delta.rowTracking high-water mark, the first write to
    # the clone re-allocates baseRowId 0..n and silently duplicates the
    # cloned files' row ids
    src = str(tmp_path / "rtsrc")
    lakehouse.write_delta(
        spark,
        spark.range(40).select("id", (F.col("id") % 4).alias("v")),
        src,
        row_tracking=True,
    )
    dst = str(tmp_path / "rtdst")
    lakehouse.clone_delta(spark, src, dst)
    # domain carried verbatim into the clone's v0
    dm = lakehouse._domain_metadata(dst)
    assert json.loads(dm["delta.rowTracking"])["rowIdHighWaterMark"] == 39
    # an append to the clone allocates ABOVE the carried watermark
    lakehouse.write_delta(
        spark,
        spark.range(40, 55).select("id", (F.col("id") % 4).alias("v")),
        dst,
        mode="append",
    )
    rows = lakehouse.read_delta_row_ids(spark, dst).collect()
    rids = [r.row_id for r in rows]
    assert len(rows) == 55 and len(set(rids)) == 55, "row ids must stay unique"
    assert min(rids) == 0 and max(rids) == 54
    # source untouched
    assert lakehouse.read_delta(spark, src).count() == 40
    dm_src = lakehouse._domain_metadata(src)
    assert json.loads(dm_src["delta.rowTracking"])["rowIdHighWaterMark"] == 39
