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
