"""Iceberg CHANGE-FEED streaming source (stream_iceberg_cdf): appends
symlink zero-copy, mutation snapshots materialize their row diff, and a
real Structured Streaming replay matches the batch read_iceberg_cdf."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg
from feature_store_ml_spark.streaming import events as sev
from feature_store_ml_spark.streaming import iceberg_source


def test_cdf_stream_parity_with_batch(spark, tmp_path):
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    s0 = iceberg.write_iceberg(
        spark,
        spark.range(0, 10).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
    )
    iceberg.write_iceberg(
        spark,
        spark.range(10, 15).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
    )
    # a MERGE (overwrite snapshot: pos-deletes + replacement rows)
    src = spark.createDataFrame([(3, -1), (99, 99)], "id bigint, v bigint")
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    # a row delete
    iceberg.delete_iceberg(spark, root, "id = 7")

    stream, snap = iceberg_source.stream_iceberg_cdf(spark, root, spool)
    got = sev.run_stream_to_table(spark, stream, mode="append")
    want = iceberg.read_iceberg_cdf(spark, root, s0).unionByName(
        # the batch feed is (from, to]; the stream replays from genesis,
        # so add the first snapshot's rows as inserts
        iceberg.read_iceberg(spark, root, snapshot_id=s0).select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(s0).alias("_commit_snapshot_id"),
        )
    )
    key = lambda r: (r.id, r._change_type, r._commit_snapshot_id, r.v)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert snap == iceberg._load_metadata(root)["current-snapshot-id"]


def test_cdf_stream_resume_and_compaction_skipped(spark, tmp_path):
    root = str(tmp_path / "r")
    spool = str(tmp_path / "spool")
    s0 = iceberg.write_iceberg(
        spark, spark.range(0, 6).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg(spark, root, "id = 0")
    _stream, snap = iceberg_source.stream_iceberg_cdf(spark, root, spool)
    # compaction is invisible to the feed
    iceberg.compact_iceberg(spark, root)
    iceberg.write_iceberg(
        spark, spark.range(100, 103).select("id"), root, format_version=2
    )
    stream2, snap2 = iceberg_source.stream_iceberg_cdf(
        spark, root, spool, since_snapshot_id=snap
    )
    got = sev.run_stream_to_table(spark, stream2, mode="append")
    # full spool replay = genesis inserts + the delete + the new appends,
    # with NO rows from the compaction snapshot
    rows = sorted((r.id, r._change_type) for r in got.collect())
    want = sorted(
        [(i, "insert") for i in range(6)]
        + [(0, "delete")]
        + [(i, "insert") for i in (100, 101, 102)]
    )
    assert rows == want
    # expired since-snapshot fails loud
    with pytest.raises(ValueError, match="not an ancestor"):
        iceberg_source.sync_iceberg_cdf_spool(
            spark, root, str(tmp_path / "s2"), since_snapshot_id=12345
        )


def test_cdf_stream_materializes_converted_partition_columns(spark, tmp_path):
    """A Delta->Iceberg converted table's files omit the identity
    partition column; the CDF spool must materialize those snapshots so
    the file source never backfills the column as null."""
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "conv")
    spool = str(tmp_path / "spool")
    lakehouse.write_delta(
        spark,
        spark.range(0, 8).select("id", (F.col("id") % 2).alias("p")),
        root,
        partition_by=["p"],
    )
    convert.convert_delta_to_iceberg(spark, root)
    stream, _ = iceberg_source.stream_iceberg_cdf(spark, root, spool)
    got = sev.run_stream_to_table(spark, stream, mode="append")
    assert sorted((r.id, r.p) for r in got.collect()) == [
        (i, i % 2) for i in range(8)
    ]


def test_v3_dv_cdf_diff_counts_each_dead_row_once(spark, tmp_path):
    """Round-12 regression: a v3 DV delete commit stages ONE puffin file
    whose manifest lists one entry PER referenced data file (same path);
    the CDF diff must visit the physical file once — the bug emitted
    every dead row once per entry (2 files -> 2x deletes)."""
    root = str(tmp_path / "t")
    # several data files so the puffin carries several DV blobs
    iceberg.write_iceberg(
        spark,
        spark.range(0, 100).select("id", (F.col("id") * 2).alias("v"))
        .repartition(4),
        root,
        format_version=3,
    )
    meta = iceberg._load_metadata(root)
    s0 = meta["current-snapshot-id"]
    iceberg.delete_iceberg(spark, root, "id % 10 = 3")
    meta = iceberg._load_metadata(root)
    dels = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)[1]
    assert len(dels) > len({d["path"] for d in dels}), (
        "fixture must exercise entry-per-ref puffin sharing"
    )
    cdf = iceberg.read_iceberg_cdf(spark, root, s0).collect()
    dead = sorted(r.id for r in cdf if r._change_type == "delete")
    assert dead == [i for i in range(100) if i % 10 == 3]


def test_v3_dv_cdf_stream_restart_mid_matrix(spark, tmp_path):
    """Round 12 (VERDICT r11 item 5): a v3 DV mutation matrix consumed
    in TWO stream sessions — sync/checkpoint mid-matrix, mutate more
    (including a superseding DV delete), resume from the checkpointed
    snapshot — unions to exactly the batch feed."""
    root = str(tmp_path / "t")
    spool = str(tmp_path / "spool")
    s0 = iceberg.write_iceberg(
        spark,
        spark.range(0, 60).select("id", (F.col("id") * 2).alias("v"))
        .repartition(3),
        root,
        format_version=3,
    )
    iceberg.delete_iceberg(spark, root, "id < 10")
    # first session: genesis + first DV commit
    stream1, snap1 = iceberg_source.stream_iceberg_cdf(spark, root, spool)
    got1 = sev.run_stream_to_table(spark, stream1, mode="append")
    n1 = got1.count()
    assert n1 == 60 + 10
    # mutate more: MoR update (DV + replacements) and a SUPERSEDING delete
    iceberg.update_iceberg(spark, root, {"v": "v + 1"}, where="id % 7 = 0")
    iceberg.delete_iceberg(spark, root, "id % 9 = 5")
    # second session resumes from the checkpointed snapshot (fresh spool,
    # like a restart that prunes consumed links)
    spool2 = str(tmp_path / "spool2")
    stream2, _ = iceberg_source.stream_iceberg_cdf(
        spark, root, spool2, since_snapshot_id=snap1
    )
    got2 = sev.run_stream_to_table(spark, stream2, mode="append")
    both = got1.unionByName(got2)
    want = iceberg.read_iceberg_cdf(spark, root, s0).unionByName(
        iceberg.read_iceberg(spark, root, snapshot_id=s0).select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(s0).cast("long").alias("_commit_snapshot_id"),
        )
    )
    g = sorted(map(tuple, both.select("id", "v", "_change_type").collect()))
    w = sorted(map(tuple, want.select("id", "v", "_change_type").collect()))
    assert g == w and g


def test_manifest_cache_identical_plans_fewer_reads(spark, tmp_path):
    """_snapshot_scan_plan with a shared _manifest_cache returns plans
    identical to the uncached walk, and the ancestry walk stops
    re-decoding manifests shared between consecutive snapshots
    (ADVICE r12 — first sync over a long history was
    O(snapshots x manifests) driver file reads)."""
    from feature_store_ml_spark.io import avro_lite

    root = str(tmp_path / "mc")
    for lo in range(0, 40, 10):
        iceberg.write_iceberg(
            spark,
            spark.range(lo, lo + 10).select("id", (F.col("id") * 2).alias("v")),
            root,
            format_version=2,
        )
    meta = iceberg._load_metadata(root)
    sids = [s["snapshot-id"] for s in meta["snapshots"]]
    cache: dict = {}
    plain = [iceberg._snapshot_scan_plan(meta, s, root) for s in sids]
    cached = [
        iceberg._snapshot_scan_plan(meta, s, root, _manifest_cache=cache)
        for s in sids
    ]
    assert plain == cached
    # the walk touches every manifest exactly once via the cache
    calls: list[str] = []
    orig = avro_lite.read_container

    def counting(p, *a, **k):
        calls.append(p)
        return orig(p, *a, **k)

    import unittest.mock as mock

    with mock.patch.object(avro_lite, "read_container", counting):
        c2: dict = {}
        for s in sids:
            iceberg._snapshot_scan_plan(meta, s, root, _manifest_cache=c2)
        cached_manifest_reads = sum(
            1 for p in calls if "manifest-list" not in p.replace("snap-", "")
        )
    # uncached: snapshot i replays i+1 manifests -> 1+2+3+4 = 10 decodes;
    # cached: each of the 4 manifests decodes once
    assert len(c2) == 4
    assert cached_manifest_reads <= len(c2) + len(sids)  # manifests + lists
