"""Delta tables as a streaming SOURCE (streaming/delta_source): tail the
transaction log through a zero-copy spool and a real Structured Streaming
file source, with exactly-once resume via the stream checkpoint."""

import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse
from feature_store_ml_spark.streaming import delta_source


def _append(spark, root, lo, hi):
    lakehouse.write_delta(
        spark,
        spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v")),
        root,
        mode="append" if lakehouse.is_delta_table(root) else "overwrite",
    )


def _run_available(stream_df, out_dir, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tail_then_resume_exactly_once(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _append(spark, root, 0, 50)
    _append(spark, root, 50, 80)

    stream, v = delta_source.stream_from_delta(spark, root, spool)
    assert v == 1
    _run_available(stream, out, ckpt)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(80))

    # two more commits land; re-sync from the checkpointed version and
    # restart with the SAME stream checkpoint: only the new rows arrive
    _append(spark, root, 80, 90)
    _append(spark, root, 90, 95)
    stream2, v2 = delta_source.stream_from_delta(
        spark, root, spool, since_version=v
    )
    assert v2 == 3
    _run_available(stream2, out, ckpt)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(95))  # no duplicates, nothing missed

    # idempotent re-sync: running again adds nothing
    stream3, v3 = delta_source.stream_from_delta(
        spark, root, spool, since_version=v2
    )
    _run_available(stream3, out, ckpt)
    assert spark.read.parquet(out).count() == 95


def test_spool_links_not_copies(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    _append(spark, root, 0, 10)
    delta_source.sync_delta_spool(root, spool)
    entries = sorted(os.listdir(spool))
    assert entries and all(
        os.path.islink(os.path.join(spool, n)) for n in entries
    )
    # names order by commit version so discovery order follows the log
    assert entries == sorted(entries)


def test_compaction_commits_are_invisible(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _append(spark, root, 0, 40)
    _append(spark, root, 40, 60)
    lakehouse.compact_delta(spark, root, target_files=1)
    stream, v = delta_source.stream_from_delta(spark, root, spool)
    _run_available(stream, out, ckpt)
    # compaction rearranged bytes (dataChange=false): the tail must see
    # each row exactly once, from the ORIGINAL commit's files
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(
        range(60)
    )


def test_fail_loud_on_overwrite_dv_partitioned_mapped(spark, tmp_path):
    # overwrite (remove with dataChange) breaks the append-only contract
    root = str(tmp_path / "ow")
    _append(spark, root, 0, 10)
    lakehouse.write_delta(
        spark, spark.range(5).select("id", (F.col("id") * 2).alias("v")),
        root, mode="overwrite",
    )
    with pytest.raises(ValueError, match="append-only"):
        delta_source.sync_delta_spool(root, str(tmp_path / "s1"))

    # deletion vector
    root2 = str(tmp_path / "dv")
    _append(spark, root2, 0, 10)
    lakehouse.delete_delta(spark, root2, "id = 3")
    with pytest.raises(ValueError, match="ill-defined"):
        delta_source.sync_delta_spool(root2, str(tmp_path / "s2"))

    # NAME-mode column mapping streams (round 6) — rename mid-stream and
    # the tail keeps reading both file generations under logical names
    root4 = str(tmp_path / "cm")
    _append(spark, root4, 0, 10)
    lakehouse.rename_delta_column(spark, root4, "v", "w")
    lakehouse.write_delta(
        spark,
        spark.range(10, 12).select("id", (F.col("id") * 2).alias("w")),
        root4, mode="append",
    )
    out4, ckpt4 = str(tmp_path / "o4"), str(tmp_path / "c4")
    stream4, _ = delta_source.stream_from_delta(
        spark, root4, str(tmp_path / "s4")
    )
    _run_available(stream4, out4, ckpt4)
    rows = spark.read.parquet(out4)
    assert sorted(rows.columns) == ["id", "w"]
    assert sorted((r.id, r.w) for r in rows.collect()) == [
        (i, i * 2) for i in range(12)
    ]

    # ID mode streams now (round 8) — covered in
    # test_tail_id_mode_table / test_id_mode_foreign_fids_fail_loud


def test_tail_partitioned_table(spark, tmp_path):
    """PARTITIONED tables stream (round 6): the spool reconstructs
    Hive-layout dirs from each add's authoritative partitionValues, and
    the file source's partition discovery fills the partition columns —
    which never live in the data files on a Delta table."""
    root = str(tmp_path / "part")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        "id",
        (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    lakehouse.write_delta(spark, mk(0, 30), root, partition_by=["p"])
    lakehouse.write_delta(
        spark, mk(30, 50), root, mode="append", partition_by=["p"]
    )
    stream, v = delta_source.stream_from_delta(spark, root, spool)
    assert v == 1
    _run_available(stream, out, ckpt)
    rows = spark.read.parquet(out)
    assert dict(rows.dtypes)["p"] == "int"  # declared type, not inferred
    assert sorted((r.id, r.p, r.v) for r in rows.collect()) == [
        (i, i % 3, i * 2) for i in range(50)
    ]
    # resume picks up commits that open NEW partition-value dirs
    lakehouse.write_delta(
        spark,
        spark.range(50, 60).select(
            "id", F.lit(7).cast("int").alias("p"), (F.col("id") * 2).alias("v")
        ),
        root, mode="append", partition_by=["p"],
    )
    stream2, v2 = delta_source.stream_from_delta(
        spark, root, spool, since_version=v
    )
    _run_available(stream2, out, ckpt)
    assert spark.read.parquet(out).count() == 60
    assert spark.read.parquet(out).where("p = 7").count() == 10


def test_tail_partitioned_null_and_special_values(spark, tmp_path):
    """Null partition values spool as __HIVE_DEFAULT_PARTITION__ and read
    back null; values containing the characters Spark escapes in dir
    names (=, /, :) round-trip through the escaping."""
    root = str(tmp_path / "pnull")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(0, None, 1), (1, "a=b/c:d", 2), (2, "plain", 3)],
        "id long, p string, v long",
    )
    lakehouse.write_delta(spark, df, root, partition_by=["p"])
    stream, _ = delta_source.stream_from_delta(spark, root, spool)
    _run_available(stream, out, ckpt)
    got = sorted(
        (r.id, r.p, r.v) for r in spark.read.parquet(out).collect()
    )
    assert got == [(0, None, 1), (1, "a=b/c:d", 2), (2, "plain", 3)]


def test_tail_partitioned_after_partition_column_rename(spark, tmp_path):
    """Composition: rename the PARTITION column (name-mode mapping), then
    stream — spool dirs carry the stable physical name, the stream
    projects back to the new logical name."""
    root = str(tmp_path / "pren")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lakehouse.write_delta(
        spark,
        spark.range(20).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        root, partition_by=["p"],
    )
    lakehouse.rename_delta_column(spark, root, "p", "bucket")
    lakehouse.write_delta(
        spark,
        spark.range(20, 30).select(
            "id", (F.col("id") % 2).cast("int").alias("bucket")
        ),
        root, mode="append", partition_by=["bucket"],
    )
    stream, _ = delta_source.stream_from_delta(spark, root, spool)
    _run_available(stream, out, ckpt)
    rows = spark.read.parquet(out)
    assert sorted(rows.columns) == ["bucket", "id"]
    assert sorted((r.id, r.bucket) for r in rows.collect()) == [
        (i, i % 2) for i in range(30)
    ]


def test_stream_delta_cdf_partitioned_inserts(spark, tmp_path):
    """CDF tail over a PARTITIONED table: insert commits spool into the
    reconstructed Hive layout under inserts/."""
    root = str(tmp_path / "pcdf")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark,
        spark.range(12).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        root, partition_by=["p"],
    )
    lakehouse.alter_delta_properties(
        root, {"delta.enableChangeDataFeed": "true"}
    )
    lakehouse.write_delta(
        spark,
        spark.range(12, 18).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        root, mode="append", partition_by=["p"],
    )
    from feature_store_ml_spark.streaming import events as sev

    stream, v = delta_source.stream_delta_cdf(spark, root, spool)
    got = sev.run_stream_to_table(spark, stream, mode="append")
    assert sorted((r.id, r.p, r._change_type) for r in got.collect()) == [
        (i, i % 2, "insert") for i in range(18)
    ]


def test_watermark_agg_over_delta_tail(spark, tmp_path):
    """The headline consumption path: tail a feature table into the
    EXISTING watermark machinery (streaming/events.windowed_counts)."""
    from feature_store_ml_spark.streaming import events as sev

    root = str(tmp_path / "feat")
    spool = str(tmp_path / "spool")
    base = spark.range(200).select(
        F.timestamp_micros(
            (F.lit(1_600_000_000_000_000) + F.col("id") * 60_000_000)
        ).alias("ts"),
        (F.col("id") % 3).cast("string").alias("event_type"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    lakehouse.write_delta(spark, base.where("id % 2 = 0"), root)
    lakehouse.write_delta(
        spark, base.where("id % 2 = 1"), root, mode="append"
    )
    stream, _ = delta_source.stream_from_delta(spark, root, spool)
    agg = sev.windowed_counts(stream, "1 hour", "2 hours")
    got = sev.run_stream_to_table(spark, agg, mode="complete")
    batch = (
        base.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert (
        sorted(map(tuple, got.select("window_start", "event_type", "n_events").collect()))
        == sorted(map(tuple, batch.collect()))
    )


# --- Iceberg twin (streaming/iceberg_source) ---------------------------------


def test_iceberg_tail_then_resume(spark, tmp_path):
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "it")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    iceberg.write_iceberg(
        spark, spark.range(40).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2,
    )
    iceberg.write_iceberg(
        spark, spark.range(40, 60).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2,
    )
    stream, snap = iceberg_source.stream_from_iceberg(spark, root, spool)
    _run_available(stream, out, ckpt)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(range(60))

    iceberg.write_iceberg(
        spark, spark.range(60, 70).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2,
    )
    stream2, snap2 = iceberg_source.stream_from_iceberg(
        spark, root, spool, since_snapshot_id=snap
    )
    assert snap2 > snap
    _run_available(stream2, out, ckpt)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(range(70))


def test_iceberg_tail_partitioned_table(spark, tmp_path):
    """Iceberg keeps source columns IN the data files, so partitioned
    tables stream (the Delta tail must refuse these)."""
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "ip")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    iceberg.write_iceberg(
        spark,
        spark.range(30).select("id", (F.col("id") % 3).alias("b")),
        root, format_version=2, partition_by=["b"],
    )
    stream, _ = iceberg_source.stream_from_iceberg(spark, root, spool)
    _run_available(stream, out, ckpt)
    got = sorted((r.id, r.b) for r in spark.read.parquet(out).collect())
    assert got == [(i, i % 3) for i in range(30)]


def test_iceberg_tail_fail_louds(spark, tmp_path):
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    # row-level deletes present
    root = str(tmp_path / "del")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2,
    )
    iceberg.delete_iceberg(spark, root, "id = 3")
    with pytest.raises(ValueError, match="delete files"):
        iceberg_source.sync_iceberg_spool(root, str(tmp_path / "s1"))

    # compaction between checkpoints is INVISIBLE (round 12 — 'replace'
    # snapshots change no rows, like Delta's dataChange:false; formerly
    # a loud history-rewrite refusal): the sync emits exactly the
    # appended rows, never the compacted rewrites
    root2 = str(tmp_path / "cmp")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root2, format_version=2,
    )
    spool2 = str(tmp_path / "s2")
    snap = iceberg_source.sync_iceberg_spool(root2, spool2)
    iceberg.write_iceberg(
        spark, spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")),
        root2, format_version=2,
    )
    iceberg.compact_iceberg(spark, root2)
    iceberg_source.sync_iceberg_spool(
        root2, spool2, since_snapshot_id=snap
    )
    got = sorted(r.id for r in spark.read.parquet(spool2).collect())
    assert got == list(range(20))

    # rename evolution: file source would NULL the renamed column
    root3 = str(tmp_path / "ren")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root3, format_version=2,
    )
    iceberg.rename_iceberg_column(root3, "v", "speed")
    with pytest.raises(NotImplementedError, match="rename evolution"):
        iceberg_source.sync_iceberg_spool(root3, str(tmp_path / "s3"))


def test_iceberg_tail_ignore_deletes(spark, tmp_path):
    """Round 12 (VERDICT r11 item 4): ignore_deletes skips delete-only
    snapshots — their rows are never retracted; later appends still
    flow. Twin of the Delta tail's option."""
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2,
    )
    iceberg.delete_iceberg(spark, root, "id = 3")  # pos/DV delete commit
    iceberg.write_iceberg(
        spark, spark.range(10, 13).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2,
    )
    with pytest.raises(ValueError, match="ignore_deletes"):
        iceberg_source.sync_iceberg_spool(root, spool)
    snap = iceberg_source.sync_iceberg_spool(root, spool, ignore_deletes=True)
    got = sorted(r.id for r in spark.read.parquet(spool).collect())
    # id=3 is NOT retracted (skip contract); appended rows present
    assert got == list(range(13))
    # v3 DV commit under ignore_deletes: same skip
    root3 = str(tmp_path / "t3")
    spool3 = str(tmp_path / "spool3")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root3, format_version=3
    )
    iceberg.delete_iceberg(spark, root3, "id = 1")  # puffin DV commit
    with pytest.raises(ValueError, match="ignore_deletes"):
        iceberg_source.sync_iceberg_spool(root3, spool3)
    iceberg_source.sync_iceberg_spool(root3, spool3, ignore_deletes=True)
    assert sorted(
        r.id for r in spark.read.parquet(spool3).collect()
    ) == [0, 1, 2, 3, 4]


def test_iceberg_tail_ignore_changes(spark, tmp_path):
    """Round 12: ignore_changes re-emits a rewrite snapshot's added
    files (duplicates allowed downstream); replacement files that a
    same-snapshot position delete could mask materialize their LIVE
    rows. ignore_deletes alone refuses a rewrite."""
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2,
    )
    snap0 = iceberg_source.sync_iceberg_spool(root, spool)
    iceberg.update_iceberg(
        spark, root, {"v": "v + 100"}, where="id >= 8"
    )  # rewrite: pos-deletes on old files + replacement files
    with pytest.raises(ValueError, match="ignore_changes"):
        iceberg_source.sync_iceberg_spool(
            root, spool, since_snapshot_id=snap0, ignore_deletes=True
        )
    iceberg_source.sync_iceberg_spool(
        root, spool, since_snapshot_id=snap0, spark=spark,
        ignore_changes=True,
    )
    rows = [(r.id, r.v) for r in spark.read.parquet(spool).collect()]
    # originals all present (never retracted) + updated copies re-emitted
    assert sorted(rows) == sorted(
        [(i, i * 2) for i in range(10)] + [(8, 116), (9, 118)]
    )
    # idempotent: re-sync adds nothing
    iceberg_source.sync_iceberg_spool(
        root, spool, since_snapshot_id=snap0, spark=spark,
        ignore_changes=True,
    )
    assert len(spark.read.parquet(spool).collect()) == 12


# --- CDF streaming source ----------------------------------------------------


def test_stream_delta_cdf_parity_with_batch(spark, tmp_path):
    """The streaming change feed must deliver exactly the rows
    read_delta_cdf reconstructs in batch — inserts from append commits,
    tagged change rows from cdc files — with the right _change_type and
    _commit_version."""
    root = str(tmp_path / "cdf")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark, spark.range(10).select("id", (F.col("id") * 10).alias("v")),
        root,
    )
    lakehouse.alter_delta_properties(
        root, {"delta.enableChangeDataFeed": "true"}
    )
    lakehouse.write_delta(
        spark, spark.range(10, 15).select("id", (F.col("id") * 10).alias("v")),
        root, mode="append",
    )  # v2: inserts
    lakehouse.delete_delta(spark, root, "id = 3")  # v3: delete w/ cdc
    src = spark.createDataFrame(
        [(1, -1), (99, 990)], "id long, v long"
    )
    lakehouse.merge_delta(spark, src, root, keys=["id"])  # v4: update+insert

    stream, v = delta_source.stream_delta_cdf(spark, root, spool, since_version=1)
    assert v == 4
    from feature_store_ml_spark.streaming import events as sev

    got = sev.run_stream_to_table(spark, stream, mode="append")
    batch = lakehouse.read_delta_cdf(spark, root, since_version=1)
    g = sorted(map(tuple, got.select("id", "v", "_change_type", "_commit_version").collect()))
    b = sorted(map(tuple, batch.select("id", "v", "_change_type", "_commit_version").collect()))
    assert g == b
    types = {r["_change_type"] for r in got.collect()}
    assert {"insert", "delete", "update_preimage", "update_postimage"} <= types


def test_stream_delta_cdf_refuses_uncovered_delete(spark, tmp_path):
    """A row-removing commit WITHOUT cdc files cannot stream — fail loud
    with the remediation, never drop mutations silently."""
    root = str(tmp_path / "nocdf")
    lakehouse.write_delta(
        spark, spark.range(10).select("id", (F.col("id") * 10).alias("v")),
        root,
    )
    lakehouse.delete_delta(spark, root, "id = 3")  # CDF not enabled
    with pytest.raises(ValueError, match="enableChangeDataFeed"):
        delta_source.sync_delta_cdf_spool(root, str(tmp_path / "s"))


def test_stream_delta_cdf_resume(spark, tmp_path):
    root = str(tmp_path / "cdfr")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lakehouse.write_delta(
        spark, spark.range(5).select("id", (F.col("id") * 10).alias("v")), root
    )
    stream, v = delta_source.stream_delta_cdf(spark, root, spool)
    _run_available(stream, out, ckpt)
    lakehouse.alter_delta_properties(
        root, {"delta.enableChangeDataFeed": "true"}
    )
    lakehouse.delete_delta(spark, root, "id = 2")
    stream2, v2 = delta_source.stream_delta_cdf(
        spark, root, spool, since_version=v
    )
    _run_available(stream2, out, ckpt)
    rows = spark.read.parquet(out)
    assert rows.where("_change_type = 'insert'").count() == 5
    assert [r.id for r in rows.where("_change_type = 'delete'").collect()] == [2]


def test_prune_spool_retention(spark, tmp_path):
    """Spool links below the committed version are collected; the stream
    resumes correctly afterwards (checkpoint tracks seen paths)."""
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _append(spark, root, 0, 20)
    _append(spark, root, 20, 40)
    stream, v = delta_source.stream_from_delta(spark, root, spool)
    _run_available(stream, out, ckpt)
    # everything consumed and checkpointed through version v: prune below
    n = delta_source.prune_spool(spool, before_version=v)
    assert n >= 1
    _append(spark, root, 40, 50)
    stream2, v2 = delta_source.stream_from_delta(
        spark, root, spool, since_version=v
    )
    _run_available(stream2, out, ckpt)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(50))  # nothing re-delivered, nothing lost
    # partitioned spool prunes through its Hive subdirs too
    proot = str(tmp_path / "p")
    pspool = str(tmp_path / "pspool")
    lakehouse.write_delta(
        spark,
        spark.range(6).select("id", (F.col("id") % 2).cast("int").alias("p")),
        proot, partition_by=["p"],
    )
    lakehouse.write_delta(
        spark,
        spark.range(6, 12).select("id", (F.col("id") % 2).cast("int").alias("p")),
        proot, mode="append", partition_by=["p"],
    )
    delta_source.sync_delta_spool(proot, pspool)
    assert delta_source.prune_spool(pspool, before_version=1) >= 1


def test_stream_delta_cdf_id_mode_materialized(spark, tmp_path):
    """ID-mode tables stream their change feed through the MATERIALIZING
    spool (no file-source schema can span per-footer field-id names):
    a real SS replay matches batch read_delta_cdf from genesis."""
    root = str(tmp_path / "idcdf")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark,
        spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root,
        column_mapping="id",
    )
    lakehouse.write_delta(
        spark,
        spark.range(10, 14).select("id", (F.col("id") * 2).alias("v")),
        root,
        mode="append",
    )
    lakehouse.delete_delta(spark, root, "id < 3")
    stream, v = delta_source.stream_delta_cdf(spark, root, spool)
    from feature_store_ml_spark.streaming import events as sev

    got = sev.run_stream_to_table(spark, stream, mode="append")
    want = lakehouse.read_delta_cdf(spark, root, 0).unionByName(
        lakehouse.read_delta(spark, root, version=0).select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(0).cast("long").alias("_commit_version"),
        )
    )
    key = lambda r: (r.id, r.v, r._change_type, r._commit_version)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert v == lakehouse._next_version(lakehouse._delta_log_dir(root)) - 1
    # resume from the synced version: nothing new => no new change dirs
    stream2, v2 = delta_source.stream_delta_cdf(
        spark, root, spool, since_version=v
    )
    assert v2 == v


def test_tail_id_mode_table(spark, tmp_path):
    """ID-mapped tables stream (round 8): the spool probe pins each file's
    footer fids to the declared physical names, the scan reads the
    physical schema and projects back to logical — rename mid-stream
    included (physicalName is rename-stable in ID mode too)."""
    root = str(tmp_path / "idm8")
    lakehouse.write_delta(
        spark, spark.range(0, 6).select("id", (F.col("id") * 2).alias("v")),
        root, column_mapping="id",
    )
    lakehouse.rename_delta_column(spark, root, "v", "w")
    lakehouse.write_delta(
        spark,
        spark.range(6, 9).select("id", (F.col("id") * 2).alias("w")),
        root, mode="append",
    )
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    stream, v = delta_source.stream_from_delta(
        spark, root, str(tmp_path / "spool")
    )
    _run_available(stream, out, ckpt)
    rows = spark.read.parquet(out)
    assert sorted(rows.columns) == ["id", "w"]
    assert sorted((r.id, r.w) for r in rows.collect()) == [
        (i, i * 2) for i in range(9)
    ]
    # resume tail: append after the first sync, only the delta arrives
    lakehouse.write_delta(
        spark,
        spark.range(9, 11).select("id", (F.col("id") * 2).alias("w")),
        root, mode="append",
    )
    stream2, v2 = delta_source.stream_from_delta(
        spark, root, str(tmp_path / "spool"), since_version=v
    )
    assert v2 > v
    _run_available(stream2, out, ckpt)
    assert sorted(
        (r.id, r.w) for r in spark.read.parquet(out).collect()
    ) == [(i, i * 2) for i in range(11)]


def test_tail_id_mode_partitioned(spark, tmp_path):
    root = str(tmp_path / "idmp")
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 5).alias("v"),
    )
    lakehouse.write_delta(
        spark, df, root, column_mapping="id", partition_by=["p"]
    )
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    stream, _v = delta_source.stream_from_delta(
        spark, root, str(tmp_path / "spool")
    )
    _run_available(stream, out, ckpt)
    rows = spark.read.parquet(out)
    assert sorted(rows.columns) == ["id", "p", "v"]
    assert sorted((r.id, r.p, r.v) for r in rows.collect()) == [
        (i, i % 3, i * 5) for i in range(12)
    ]


def test_id_mode_foreign_fids_fail_loud(spark, tmp_path, monkeypatch):
    """A spool file binding a declared field id to a DIFFERENT physical
    name (foreign rewrite) cannot be spanned by one file-source schema —
    sync must refuse, never return NULL columns."""
    root = str(tmp_path / "idf")
    lakehouse.write_delta(
        spark, spark.range(0, 4).select("id", (F.col("id") * 2).alias("v")),
        root, column_mapping="id",
    )
    # simulate a foreign writer: rewrite one live file with the same fids
    # under different physical column names
    adds, meta = lakehouse._replay_log_adds(root)
    rel = next(iter(adds))
    fids = lakehouse._field_ids(meta)
    src = spark.read.parquet(os.path.join(root, rel))
    phys = lakehouse._physical_names(meta)
    renamed = src.select(
        *[
            F.col(phys[l]).alias(f"foreign_{l}", metadata={"parquet.field.id": fid})
            for l, fid in fids.items()
        ]
    )
    import glob
    import shutil
    import tempfile

    tmp_out = tempfile.mkdtemp()
    renamed.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
    shutil.copyfile(part, os.path.join(root, rel))
    with pytest.raises(NotImplementedError, match="different physical names"):
        delta_source.sync_delta_spool(root, str(tmp_path / "spool"))


def test_iceberg_tail_avro_table_materializes(spark, tmp_path):
    """Round 10: stream_from_iceberg over an AVRO data table — the spool
    sync materializes the rowfmt files into parquet (one distributed
    decode per sync) and the tail-then-resume contract is unchanged."""
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "ia")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    iceberg.write_iceberg(
        spark, spark.range(20).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2, data_format="avro",
    )
    stream, snap = iceberg_source.stream_from_iceberg(spark, root, spool)
    _run_available(stream, out, ckpt)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(range(20))
    # resume: one more avro snapshot, only the delta materializes
    iceberg.write_iceberg(
        spark, spark.range(20, 30).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2, data_format="avro",
    )
    stream2, snap2 = iceberg_source.stream_from_iceberg(
        spark, root, spool, since_snapshot_id=snap
    )
    assert snap2 > snap
    _run_available(stream2, out, ckpt)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == list(range(30))
    # values decoded, not NULL-backfilled
    assert all(r.v == 2 * r.id for r in spark.read.parquet(out).collect())


def test_iceberg_cdf_stream_over_orc_with_update(spark, tmp_path):
    """Round 10: the CDF tail over an ORC table whose history includes a
    merge-on-read UPDATE — rowfmt appends route through the materialize
    leg, the mutation snapshot through read_iceberg_cdf (format-aware)."""
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "ic")
    spool = str(tmp_path / "spool")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string"),
        root, format_version=2, data_format="orc",
    )
    iceberg.update_iceberg(spark, root, {"name": "'X'"}, where="id = 1")
    stream, _ = iceberg_source.stream_iceberg_cdf(spark, root, spool)
    _run_available(stream, out, ckpt)
    rows = {
        (r.id, r.name, r._change_type)
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {
        (1, "a", "insert"),
        (2, "b", "insert"),
        (1, "a", "delete"),
        (1, "X", "insert"),
    }


# ------------------------------------------------ ignoreDeletes/ignoreChanges
# (round 11: the delta-spark streaming-source options, documented
# duplicate/no-retraction semantics; DV'd re-adds materialize live rows)


def test_ignore_deletes_skips_delete_only_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    _append(spark, root, 0, 30)
    _append(spark, root, 30, 40)
    # foreign-writer partition delete: a remove-only commit
    adds, _m = lakehouse._replay_log_adds(root)
    victim = sorted(adds)[-1]
    lakehouse._commit(
        root,
        [
            {"remove": {"path": victim, "dataChange": True,
                        "deletionTimestamp": 1}},
            {"commitInfo": {"timestamp": 1, "operation": "DELETE"}},
        ],
    )
    with pytest.raises(ValueError, match="ignore_deletes"):
        delta_source.sync_delta_spool(root, spool)
    _append(spark, root, 40, 45)
    stream, v = delta_source.stream_from_delta(
        spark, root, spool, ignore_deletes=True
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_available(stream, out, ckpt)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    # deleted rows are NEVER retracted (the documented contract): the
    # stream emitted every appended row, including the removed file's
    assert got == list(range(45))


def test_ignore_changes_reemits_rewritten_files(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark,
        spark.range(0, 30).select("id", (F.col("id") * 2).alias("v")).coalesce(1),
        root, mode="overwrite",
    )
    lakehouse.write_delta(
        spark,
        spark.range(30, 40).select("id", (F.col("id") * 2).alias("v")).coalesce(1),
        root, mode="append",
    )
    lakehouse.update_delta(spark, root, {"v": "v + 1"}, where="id >= 35")
    with pytest.raises(ValueError, match="ignore_changes"):
        delta_source.sync_delta_spool(root, spool)
    stream, _v = delta_source.stream_from_delta(
        spark, root, spool, ignore_changes=True
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_available(stream, out, ckpt)
    from collections import Counter

    got = Counter(r.id for r in spark.read.parquet(out).collect())
    # rows of the rewritten file arrive twice (original emission + the
    # rewrite re-emission) — delta-spark's ignoreChanges duplicates
    assert all(got[i] == 1 for i in range(30))
    assert all(got[i] == 2 for i in range(30, 40))


def test_ignore_changes_materializes_dv_adds(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark,
        spark.range(0, 30).select("id", (F.col("id") * 2).alias("v")).coalesce(1),
        root, mode="overwrite",
    )
    lakehouse.write_delta(
        spark,
        spark.range(30, 40).select("id", (F.col("id") * 2).alias("v")).coalesce(1),
        root, mode="append",
    )
    lakehouse.delete_delta(spark, root, "id >= 38")  # DV attach on file 2
    stream, _v = delta_source.stream_from_delta(
        spark, root, spool, ignore_changes=True
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_available(stream, out, ckpt)
    from collections import Counter

    got = Counter(r.id for r in spark.read.parquet(out).collect())
    assert all(got[i] == 1 for i in range(30))
    # live rows of the DV'd file: original link + materialized live copy
    assert all(got[i] == 2 for i in range(30, 38))
    # DEAD rows appear exactly once (the pre-delete link emission) and
    # are never re-emitted by the materialization
    assert all(got[i] == 1 for i in (38, 39))


def test_dv_materialization_crash_recovery(spark, tmp_path):
    """A sync that died between landing parts and writing the marker must
    not double-land rows on the next sync."""
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    _append(spark, root, 0, 10)
    lakehouse.delete_delta(spark, root, "id >= 8")
    delta_source.sync_delta_spool(
        root, spool, ignore_changes=True, spark=spark
    )
    markers = [n for n in os.listdir(spool) if n.startswith(".mat-")]
    assert len(markers) == 1
    n_parts = sum(
        1 for n in os.listdir(spool) if "-m" in n and n.endswith(".parquet")
    )
    # simulate the crash: marker gone, parts (possibly partial) present
    os.remove(os.path.join(spool, markers[0]))
    delta_source.sync_delta_spool(
        root, spool, ignore_changes=True, spark=spark
    )
    n_parts2 = sum(
        1 for n in os.listdir(spool) if "-m" in n and n.endswith(".parquet")
    )
    assert n_parts2 == n_parts  # swept and redone, not doubled
    assert os.path.exists(os.path.join(spool, markers[0]))


def test_ignore_changes_partitioned_dv(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    df = spark.range(0, 40).select(
        (F.col("id") % 2).cast("string").alias("p"), "id"
    )
    lakehouse.write_delta(spark, df.repartition(1), root, partition_by=["p"])
    lakehouse.delete_delta(spark, root, "id >= 36")
    stream, _v = delta_source.stream_from_delta(
        spark, root, spool, ignore_changes=True
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_available(stream, out, ckpt)
    from collections import Counter

    rows = spark.read.parquet(out).collect()
    got = Counter(r.id for r in rows)
    # partition column backfills from the Hive dir for materialized parts
    assert all(r.p == str(r.id % 2) for r in rows)
    assert all(got[i] == 2 for i in range(36))   # both files DV'd: re-emit
    assert all(got[i] == 1 for i in (36, 37, 38, 39))


def test_stream_delta_cdf_across_rename_materializes(spark, tmp_path):
    """Round 11: a NAME-mapped table whose cdc files predate a rename
    routes through the materialized leg automatically (formerly a loud
    refusal) — parity with the per-commit-resolving batch reader."""
    root = str(tmp_path / "cdf")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark, spark.range(10).select("id", (F.col("id") * 10).alias("v")),
        root,
    )
    lakehouse.alter_delta_properties(
        root, {"delta.enableChangeDataFeed": "true"}
    )
    lakehouse.enable_delta_column_mapping(spark, root)
    lakehouse.delete_delta(spark, root, "id = 3")       # cdc under old name
    lakehouse.rename_delta_column(spark, root, "v", "val")
    src = spark.createDataFrame([(1, -1)], "id long, val long")
    lakehouse.merge_delta(spark, src, root, keys=["id"])  # cdc under new name

    stream, v = delta_source.stream_delta_cdf(spark, root, spool, since_version=2)
    assert os.path.exists(os.path.join(spool, ".cdf-mode"))
    assert open(os.path.join(spool, ".cdf-mode")).read().strip() == "materialized"
    from feature_store_ml_spark.streaming import events as sev

    got = sev.run_stream_to_table(spark, stream, mode="append")
    batch = lakehouse.read_delta_cdf(spark, root, since_version=2)
    g = sorted(map(tuple, got.select(
        "id", "val", "_change_type", "_commit_version").collect()))
    b = sorted(map(tuple, batch.select(
        "id", "val", "_change_type", "_commit_version").collect()))
    assert g == b and g


def test_stream_delta_cdf_spool_mode_is_sticky(spark, tmp_path):
    """A spool synced link-based refuses to silently switch legs when a
    later rename makes materialization necessary."""
    root = str(tmp_path / "cdf")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark, spark.range(10).select("id", (F.col("id") * 10).alias("v")),
        root,
    )
    lakehouse.alter_delta_properties(
        root, {"delta.enableChangeDataFeed": "true"}
    )
    lakehouse.enable_delta_column_mapping(spark, root)
    lakehouse.delete_delta(spark, root, "id = 3")
    stream, v = delta_source.stream_delta_cdf(spark, root, spool)
    assert open(os.path.join(spool, ".cdf-mode")).read().strip() == "plain"
    lakehouse.rename_delta_column(spark, root, "v", "val")
    src = spark.createDataFrame([(1, -1)], "id long, val long")
    lakehouse.merge_delta(spark, src, root, keys=["id"])
    with pytest.raises(ValueError, match="FRESH spool"):
        delta_source.stream_delta_cdf(spark, root, spool, since_version=v)


def test_iceberg_tail_ignores_wap_staged_snapshots(spark, tmp_path):
    """Round-12 review fix: the per-commit walk follows the CURRENT
    snapshot's ancestry — a WAP-staged snapshot (present in metadata,
    not an ancestor) must never leak its unpublished files into the
    spool as phantom rows."""
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2
    )
    iceberg.set_iceberg_ref(root, "audit", ref_type="branch")
    iceberg.write_iceberg(
        spark, spark.range(100, 103).select("id"), root, format_version=2,
        branch="audit",
    )  # staged: NOT on main
    iceberg.write_iceberg(
        spark, spark.range(5, 8).select("id"), root, format_version=2
    )
    iceberg_source.sync_iceberg_spool(root, spool)
    got = sorted(r.id for r in spark.read.parquet(spool).collect())
    assert got == list(range(8)), "staged WAP rows must not leak"


def test_iceberg_tail_survives_compaction_then_expiration(spark, tmp_path):
    """Round-12 review fix: compaction is invisible to the tail, but the
    spool's symlinks to replaced files HARDEN (hard links) so snapshot
    expiration reclaiming the originals cannot dangle the spool."""
    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2
    )
    snap = iceberg_source.sync_iceberg_spool(root, spool)
    iceberg.write_iceberg(
        spark, spark.range(5, 8).select("id"), root, format_version=2
    )
    iceberg.compact_iceberg(spark, root)
    iceberg_source.sync_iceberg_spool(root, spool, since_snapshot_id=snap)
    iceberg.expire_iceberg_snapshots(root, keep=1)
    # every spool entry must still be readable after the originals died
    got = sorted(r.id for r in spark.read.parquet(spool).collect())
    assert got == list(range(8))


def test_delta_cdf_materialized_spans_schema_evolution(spark, tmp_path):
    """Round-12 review fix: the batched materialization null-fills
    columns missing from earlier pending commits (merge_schema added a
    column mid-range) instead of crashing the unionByName."""
    from feature_store_ml_spark.streaming import events as sev

    root = str(tmp_path / "cdf")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark, spark.range(6).select("id", (F.col("id") * 10).alias("v")),
        root,
    )
    lakehouse.alter_delta_properties(
        root, {"delta.enableChangeDataFeed": "true"}
    )
    lakehouse.enable_delta_column_mapping(spark, root)
    lakehouse.delete_delta(spark, root, "id = 3")        # cdc, old schema
    lakehouse.write_delta(
        spark,
        spark.range(6, 8).select(
            "id", (F.col("id") * 10).alias("v"), F.lit(1).alias("extra")
        ),
        root, mode="append", merge_schema=True,          # schema widens
    )
    lakehouse.rename_delta_column(spark, root, "v", "val")  # force
    src = spark.createDataFrame([(1, -1, 9)], "id long, val long, extra int")
    lakehouse.merge_delta(spark, src, root, keys=["id"])    # cdc, new name
    stream, _ = delta_source.stream_delta_cdf(spark, root, spool)
    got = sev.run_stream_to_table(spark, stream, mode="append")
    rows = {(r.id, r.val, r.extra, r._change_type) for r in got.collect()}
    assert (3, 30, None, "delete") in rows       # pre-evolution commit
    assert (6, 60, 1, "insert") in rows          # widened append
    assert (1, -1, 9, "update_postimage") in rows


def test_harden_links_through_symlinked_table_path(spark, tmp_path):
    """Round-12 review fix: hardening compares realpaths, so a table
    addressed through a symlinked path component still hardens its
    spool entries before expiration reclaims the replaced files."""
    import os

    from feature_store_ml_spark.io import iceberg
    from feature_store_ml_spark.streaming import iceberg_source

    real = tmp_path / "realdir"
    real.mkdir()
    link = tmp_path / "lnkdir"
    os.symlink(str(real), str(link))
    root = str(link / "t")
    spool = str(tmp_path / "spool")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2
    )
    snap = iceberg_source.sync_iceberg_spool(root, spool)
    iceberg.write_iceberg(
        spark, spark.range(5, 8).select("id"), root, format_version=2
    )
    iceberg.compact_iceberg(spark, root)
    iceberg_source.sync_iceberg_spool(root, spool, since_snapshot_id=snap)
    iceberg.expire_iceberg_snapshots(root, keep=1)
    got = sorted(r.id for r in spark.read.parquet(spool).collect())
    assert got == list(range(8))


def test_dv_materialization_is_one_job_per_version(spark, tmp_path):
    """Round 13 (VERDICT r12 item 3): a commit masking K files with DVs
    must materialize ALL their live rows in ONE distributed write job
    per version — not K driver-sequential jobs (the Iceberg twin,
    _materialize_rewrites, already batched). Counted by spying on
    DataFrameWriter.parquet during the sync."""
    import unittest.mock as mock

    from pyspark.sql.readwriter import DataFrameWriter

    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark,
        spark.range(0, 40).select("id", (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "id"),
        root,
    )
    # one DELETE touching every file -> ONE commit with 4 DV-masked adds
    lakehouse.delete_delta(spark, root, "id % 10 = 9")
    calls = []
    orig = DataFrameWriter.parquet

    def counting(self, *a, **k):
        calls.append(a[0] if a else k.get("path"))
        return orig(self, *a, **k)

    with mock.patch.object(DataFrameWriter, "parquet", counting):
        delta_source.sync_delta_spool(
            root, spool, ignore_changes=True, spark=spark
        )
    mat_writes = [p for p in calls if ".mat_tmp_" in str(p)]
    assert len(mat_writes) == 1, mat_writes
    # and the batched result is still exactly the live rows
    import glob

    parts = glob.glob(os.path.join(spool, "*-m*.parquet"))
    assert parts
    got = sorted(r.id for r in spark.read.parquet(*parts).collect())
    assert got == [i for i in range(40) if i % 10 != 9]
