"""Delta V2 CHECKPOINTS (PROTOCOL.md §V2 Checkpoints): UUID-named
manifest + parquet sidecars under _delta_log/_sidecars/. Read side must
reconstruct the same snapshot a classic checkpoint yields; write side
must produce a manifest whose protocol declares the v2Checkpoint feature
and whose state survives log cleanup."""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _table(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    lakehouse.write_delta(
        spark,
        spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k"),
        root,
    )
    lakehouse.write_delta(
        spark,
        spark.range(100, 120).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        root, mode="append", txn=("app1", 7),
    )
    return root


def test_v2_checkpoint_roundtrip_and_cleanup(spark, tmp_path):
    root = _table(spark, tmp_path)
    expect = sorted((r["k"], r["v"]) for r in lakehouse.read_delta(spark, root).collect())
    v = lakehouse.checkpoint_delta(root, v2=True)
    log = os.path.join(root, "_delta_log")
    manifests = [n for n in os.listdir(log) if ".checkpoint." in n]
    assert len(manifests) == 1
    # UUID-named manifest, sidecar exists
    assert len(manifests[0].split(".")) == 4
    assert len(os.listdir(os.path.join(log, "_sidecars"))) == 1
    lakehouse.cleanup_delta_log(root)
    got = sorted((r["k"], r["v"]) for r in lakehouse.read_delta(spark, root).collect())
    assert got == expect
    # txn survives through the v2 manifest
    assert lakehouse.last_txn_version(root, "app1") == 7
    assert v >= 1


def test_v2_checkpoint_preserves_stats_and_dv(spark, tmp_path):
    root = _table(spark, tmp_path)
    lakehouse.delete_delta(spark, root, "k = 7")
    lakehouse.checkpoint_delta(root, v2=True)
    lakehouse.cleanup_delta_log(root)
    # data skipping still works (stats survived the sidecar)
    rep = lakehouse.skipping_report(root, "k = 50")
    assert rep["kept_files"] < rep["total_files"]
    # DV survived: deleted row stays gone
    assert lakehouse.read_delta(spark, root).where("k = 7").count() == 0
    # manifest protocol declares the features
    adds, _ = lakehouse._replay_log_adds(root)
    assert any(a.get("deletionVector") for a in adds.values())


def test_v2_checkpoint_then_more_commits_replays_tail(spark, tmp_path):
    root = _table(spark, tmp_path)
    lakehouse.checkpoint_delta(root, v2=True)
    lakehouse.write_delta(
        spark, spark.range(200, 210).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        root, mode="append",
    )
    assert lakehouse.read_delta(spark, root).count() == 130


def test_foreign_v2_json_manifest_reads(spark, tmp_path):
    """A v2 manifest written as JSON-lines (the spec's other manifest
    form) with absolute sidecar paths must read too."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "fj")
    lakehouse.write_delta(spark, spark.range(10).coalesce(1), root)
    log = os.path.join(root, "_delta_log")
    adds, meta = lakehouse._replay_log_adds(root)
    side_dir = os.path.join(log, "_sidecars")
    os.makedirs(side_dir, exist_ok=True)
    sc = os.path.join(side_dir, "abs.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            # pyarrow can't infer an EMPTY struct; unpartitioned adds drop
            # the key (readers treat absent as no partitions)
            [{"add": {**a, "partitionValues": None}} for a in adds.values()]
        ),
        sc,
    )
    manifest = {
        "checkpointMetadata": {"version": 0},
    }
    rows = [
        {"checkpointMetadata": {"version": 0}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"metaData": meta},
        {"sidecar": {"path": sc, "sizeInBytes": os.path.getsize(sc),
                     "modificationTime": 0}},
    ]
    with open(os.path.join(log, "00000000000000000000.checkpoint.deadbeef.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.remove(os.path.join(log, "00000000000000000000.json"))
    assert lakehouse.read_delta(spark, root).count() == 10


def test_missing_sidecar_fails_loud(spark, tmp_path):
    root = _table(spark, tmp_path)
    lakehouse.checkpoint_delta(root, v2=True)
    lakehouse.cleanup_delta_log(root)
    side_dir = os.path.join(root, "_delta_log", "_sidecars")
    for n in os.listdir(side_dir):
        os.remove(os.path.join(side_dir, n))
    with pytest.raises(ValueError, match="sidecar"):
        lakehouse.read_delta(spark, root).count()


def test_unknown_reader_feature_still_refused(spark, tmp_path):
    root = _table(spark, tmp_path)
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint", "timestampNtz", "weirdFeature"],
            "writerFeatures": [],
        }}) + "\n")
    with pytest.raises(NotImplementedError, match="weirdFeature"):
        lakehouse.read_delta(spark, root)


def test_cleanup_collects_superseded_v2_manifests_and_sidecars(spark, tmp_path):
    root = _table(spark, tmp_path)
    lakehouse.checkpoint_delta(root, v2=True)
    lakehouse.write_delta(
        spark, spark.range(300, 310).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        root, mode="append",
    )
    lakehouse.checkpoint_delta(root, v2=True)
    log = os.path.join(root, "_delta_log")
    side_dir = os.path.join(log, "_sidecars")
    assert len(os.listdir(side_dir)) == 2  # two checkpoints, two sidecars
    removed = lakehouse.cleanup_delta_log(root)
    assert any(r.startswith("_sidecars/") for r in removed)
    assert len(os.listdir(side_dir)) == 1  # only the retained one
    assert len([n for n in os.listdir(log) if ".checkpoint." in n]) == 1
    assert lakehouse.read_delta(spark, root).count() == 130
