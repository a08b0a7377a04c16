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


def _foreign_json_manifest(spark, tmp_path, name, sidecar_uri=False):
    """Table whose ONLY checkpoint is a JSON-lines v2 manifest at v0 (the
    form delta-kernel writers emit), commit 0 retained."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / name)
    lakehouse.write_delta(spark, spark.range(10).coalesce(1), root)
    log = os.path.join(root, "_delta_log")
    adds, meta = lakehouse._replay_log_adds(root)
    side_dir = os.path.join(log, "_sidecars")
    os.makedirs(side_dir, exist_ok=True)
    sc = os.path.join(side_dir, "abs.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [{"add": {**a, "partitionValues": None}} for a in adds.values()]
        ),
        sc,
    )
    rows = [
        {"checkpointMetadata": {"version": 0}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]}},
        {"metaData": meta},
        {"sidecar": {"path": ("file://" + sc) if sidecar_uri else sc,
                     "sizeInBytes": os.path.getsize(sc),
                     "modificationTime": 0}},
    ]
    with open(os.path.join(log, "00000000000000000000.checkpoint.deadbeef.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return root


def test_cleanup_never_deletes_json_manifest(spark, tmp_path):
    """ADVICE r5 (high): the commit-JSON branch of cleanup matched
    '<v>.checkpoint.<uuid>.json' (20 leading digits + .json) and deleted
    the live manifest together with every commit <= its version — bricking
    foreign-written tables. Manifest must survive; table must still read."""
    root = _foreign_json_manifest(spark, tmp_path, "cl")
    log = os.path.join(root, "_delta_log")
    lakehouse.cleanup_delta_log(root)
    names = os.listdir(log)
    assert "00000000000000000000.checkpoint.deadbeef.json" in names
    assert lakehouse.read_delta(spark, root).count() == 10
    # and its sidecar survived the _sidecars sweep
    assert os.listdir(os.path.join(log, "_sidecars")) == ["abs.parquet"]


def test_sidecar_uri_form_path_reads(spark, tmp_path):
    """ADVICE r5: 'file://...' sidecar paths (what real writers record)
    skipped localization and tripped the corrupt-log guard."""
    root = _foreign_json_manifest(spark, tmp_path, "uri", sidecar_uri=True)
    os.remove(os.path.join(root, "_delta_log", "00000000000000000000.json"))
    assert lakehouse.read_delta(spark, root).count() == 10


def test_changes_and_history_ignore_json_manifest(spark, tmp_path):
    """read_delta_changes / describe_history must not parse a JSON
    manifest as the commit for its version (would silently yield no
    changes)."""
    root = _foreign_json_manifest(spark, tmp_path, "ch")
    lakehouse.write_delta(
        spark, spark.range(10, 15).coalesce(1), root, mode="append"
    )
    got = sorted(
        r.id for r in lakehouse.read_delta_changes(spark, root, 0).collect()
    )
    assert got == [10, 11, 12, 13, 14]
    hist = lakehouse.describe_delta_history(root)
    assert [h["version"] for h in hist] == [1, 0]


def test_compacted_log_files_ignored(spark, tmp_path):
    """'<lo>.<hi>.compacted.json' (log compaction) also starts with 20
    digits; replaying it as commit <lo> would double-apply actions."""
    root = str(tmp_path / "cp")
    lakehouse.write_delta(spark, spark.range(5).coalesce(1), root)
    lakehouse.write_delta(spark, spark.range(5, 9).coalesce(1), root, mode="append")
    log = os.path.join(root, "_delta_log")
    lines = []
    for n in sorted(os.listdir(log)):
        if n.endswith(".json"):
            lines += open(os.path.join(log, n)).read().splitlines()
    with open(os.path.join(log, f"{0:020d}.{1:020d}.compacted.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    assert lakehouse.read_delta(spark, root).count() == 9
    assert [h["version"] for h in lakehouse.describe_delta_history(root)] == [1, 0]
    assert lakehouse._next_version(log) == 2
