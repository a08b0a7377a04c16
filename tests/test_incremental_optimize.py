"""Incremental OPTIMIZE (round 11, VERDICT r10 item 6): file-selection
policy + Delta incremental compaction. The contract under test is
O(touched): only files the policy selects are read and rewritten; every
other live file's add action (path, stats, DV state) survives the commit
byte-identical, and table content is unchanged.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse
from feature_store_ml_spark.operators.layout import select_files_for_compaction


# ------------------------------------------------------------- pure policy


def _f(name, size, has_deletes=False, lo=None, hi=None):
    return {"name": name, "size": size, "has_deletes": has_deletes,
            "min": lo, "max": hi}


def test_policy_delete_purge_always_selected():
    sel, why = select_files_for_compaction(
        [_f("a", 1 << 30, has_deletes=True), _f("b", 1 << 30)]
    )
    assert sel == ["a"] and why["a"] == "delete-purge"


def test_policy_lone_small_file_stays():
    sel, _ = select_files_for_compaction(
        [_f("small", 1), _f("big", 1 << 30)], small_file_bytes=1 << 20
    )
    assert sel == []


def test_policy_small_files_merge():
    sel, why = select_files_for_compaction(
        [_f("s1", 1), _f("s2", 2), _f("big", 1 << 30)],
        small_file_bytes=1 << 20,
    )
    assert sel == ["s1", "s2"]
    assert set(why.values()) == {"small-file"}


def test_policy_overlap_components():
    # a[0,10] overlaps b[5,20]; c[30,40] disjoint; d has no bounds
    sel, why = select_files_for_compaction(
        [
            _f("a", 1 << 30, lo=0, hi=10),
            _f("b", 1 << 30, lo=5, hi=20),
            _f("c", 1 << 30, lo=30, hi=40),
            _f("d", 1 << 30),
        ],
        small_file_bytes=1,
    )
    assert sel == ["a", "b"]
    assert why == {"a": "overlap", "b": "overlap"}


def test_policy_transitive_overlap_chain():
    # a[0,10] b[8,20] c[18,30]: one component even though a∩c = ∅
    sel, _ = select_files_for_compaction(
        [
            _f("a", 1 << 30, lo=0, hi=10),
            _f("b", 1 << 30, lo=8, hi=20),
            _f("c", 1 << 30, lo=18, hi=30),
        ],
        small_file_bytes=1,
    )
    assert sel == ["a", "b", "c"]


# --------------------------------------------------------- delta end-to-end


def _live(path):
    adds, _ = lakehouse._replay_log_adds(path)
    return adds


def _mkdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_delta_incremental_rewrites_only_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    lakehouse.write_delta(spark, _mkdf(spark, 0, 100).coalesce(1), path)
    lakehouse.write_delta(spark, _mkdf(spark, 100, 110).coalesce(1), path)
    lakehouse.write_delta(spark, _mkdf(spark, 110, 120).coalesce(1), path)
    before = _live(path)
    sizes = {rel: a["size"] for rel, a in before.items()}
    big = max(sizes, key=sizes.get)
    out = lakehouse.compact_delta_incremental(
        spark, path, small_file_bytes=sizes[big]  # the two tiny appends
    )
    assert sorted(out["rewritten"]) == sorted(set(before) - {big})
    assert out["kept"] == 1
    after = _live(path)
    # the big file's add action is untouched — not rewritten, not re-added
    assert after[big] == before[big]
    assert set(after) == {big, *out["added"]}
    got = lakehouse.read_delta(spark, path).groupBy().agg(
        F.count("*").alias("n"), F.sum("k").alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (120, sum(range(120)))


def test_delta_incremental_noop_when_nothing_selected(spark, tmp_path):
    path = str(tmp_path / "t")
    lakehouse.write_delta(spark, _mkdf(spark, 0, 1000).coalesce(1), path)
    out = lakehouse.compact_delta_incremental(spark, path, small_file_bytes=1)
    assert out["version"] is None and out["rewritten"] == [] and out["kept"] == 1
    assert len(os.listdir(lakehouse._delta_log_dir(path))) == 1  # no commit


def test_delta_incremental_purges_dv(spark, tmp_path):
    path = str(tmp_path / "t")
    lakehouse.write_delta(spark, _mkdf(spark, 0, 100).coalesce(1), path)
    lakehouse.write_delta(spark, _mkdf(spark, 100, 200).coalesce(1), path)
    lakehouse.delete_delta(spark, path, "k >= 190")
    before = _live(path)
    dvd = [rel for rel, a in before.items() if a.get("deletionVector")]
    assert len(dvd) == 1
    out = lakehouse.compact_delta_incremental(spark, path, small_file_bytes=1)
    assert out["rewritten"] == dvd and out["reasons"][dvd[0]] == "delete-purge"
    after = _live(path)
    assert not any(a.get("deletionVector") for a in after.values())
    assert lakehouse.read_delta(spark, path).count() == 190
    # untouched file identical
    keep = (set(before) - set(dvd)).pop()
    assert after[keep] == before[keep]


def test_delta_incremental_overlap_recluster(spark, tmp_path):
    """Three appends with interleaved k-ranges (bounds overlap — k prunes
    nothing) plus one disjoint append. cluster_by=k must rewrite exactly
    the overlapping component into disjoint-bounded files and leave the
    disjoint file untouched."""
    path = str(tmp_path / "t")
    # overlapping trio: evens, odds, thirds over [0, 300)
    lakehouse.write_delta(
        spark, _mkdf(spark, 0, 300).where("k % 2 = 0").coalesce(1), path
    )
    lakehouse.write_delta(
        spark, _mkdf(spark, 0, 300).where("k % 2 = 1").coalesce(1), path
    )
    # disjoint: [1000, 1100)
    lakehouse.write_delta(spark, _mkdf(spark, 1000, 1100).coalesce(1), path)
    before = _live(path)
    disjoint = [
        rel
        for rel, a in before.items()
        if json.loads(a["stats"])["minValues"]["k"] >= 1000
    ]
    assert len(disjoint) == 1
    out = lakehouse.compact_delta_incremental(
        spark, path, small_file_bytes=1, cluster_by=["k"]
    )
    assert sorted(out["rewritten"]) == sorted(set(before) - set(disjoint))
    after = _live(path)
    assert after[disjoint[0]] == before[disjoint[0]]
    # rewritten output carries disjoint k-bounds (recluster restored pruning)
    spans = sorted(
        (
            json.loads(a["stats"])["minValues"]["k"],
            json.loads(a["stats"])["maxValues"]["k"],
        )
        for rel, a in after.items()
        if rel in out["added"]
    )
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"rewritten bounds still overlap: {spans}"
    assert lakehouse.read_delta(spark, path).count() == 400


def test_delta_incremental_partitioned_never_crosses_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("k")
    )
    for lo, hi in [(0, 20), (20, 40)]:  # 2 appends x 2 partitions = 4 files
        lakehouse.write_delta(
            spark,
            df.where((F.col("k") >= lo) & (F.col("k") < hi)).repartition(1),
            path,
            partition_by=["p"],
        )
    out = lakehouse.compact_delta_incremental(spark, path)
    after = _live(path)
    assert out["kept"] == 0 and len(out["added"]) == 2  # one per partition
    parts = {a["partitionValues"]["p"] for a in after.values()}
    assert parts == {"0", "1"}
    got = lakehouse.read_delta(spark, path)
    assert got.count() == 40
    assert got.groupBy("p").count().orderBy("p").collect()[0][1] == 20


def test_delta_incremental_preserves_row_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    lakehouse.write_delta(
        spark, _mkdf(spark, 0, 50).coalesce(1), path, row_tracking=True
    )
    lakehouse.write_delta(spark, _mkdf(spark, 50, 60).coalesce(1), path)
    lakehouse.write_delta(spark, _mkdf(spark, 60, 70).coalesce(1), path)
    ids_before = {
        r.k: r.row_id
        for r in lakehouse.read_delta_row_ids(spark, path).collect()
    }
    out = lakehouse.compact_delta_incremental(spark, path, small_file_bytes=1 << 10)
    assert out["rewritten"], "small appends should have been selected"
    ids_after = {
        r.k: r.row_id
        for r in lakehouse.read_delta_row_ids(spark, path).collect()
    }
    assert ids_after == ids_before


# -------------------------------------------------------- iceberg end-to-end

from feature_store_ml_spark.io import iceberg


def _iplan(path):
    meta = iceberg._load_metadata(path)
    return iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], path)


def _iwrite(spark, path, lo, hi, **kw):
    iceberg.write_iceberg(
        spark,
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1),
        path,
        format_version=2,
        **kw,
    )


def test_iceberg_incremental_rewrites_only_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _iwrite(spark, path, 0, 5000)
    _iwrite(spark, path, 5000, 5010)
    _iwrite(spark, path, 5010, 5020)
    before, _ = _iplan(path)
    sizes = {d["path"]: os.path.getsize(d["path"]) for d in before}
    big = max(sizes, key=sizes.get)
    out = iceberg.compact_iceberg_incremental(
        spark, path, small_file_bytes=sizes[big]
    )
    assert sorted(out["rewritten"]) == sorted(set(sizes) - {big})
    assert out["kept"] == 1
    after, _ = _iplan(path)
    kept = [d for d in after if d["path"] == big]
    assert kept, "big file must survive untouched"
    # carried entry keeps its ORIGINAL sequence number (delete scoping)
    orig = next(d for d in before if d["path"] == big)
    assert kept[0]["seq"] == orig["seq"]
    got = iceberg.read_iceberg(spark, path).agg(
        F.count("*").alias("n"), F.sum("k").alias("s")
    ).collect()[0]
    assert (got.n, got.s) == (5020, sum(range(5020)))
    # prior snapshot still time-travels
    meta = iceberg._load_metadata(path)
    prior = meta["snapshots"][-2]["snapshot-id"]
    assert iceberg.read_iceberg(spark, path, snapshot_id=prior).count() == 5020


def test_iceberg_incremental_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _iwrite(spark, path, 0, 100)
    out = iceberg.compact_iceberg_incremental(spark, path, small_file_bytes=1)
    assert out["snapshot_id"] is None and out["kept"] == 1
    assert len(iceberg._load_metadata(path)["snapshots"]) == 1


def test_iceberg_incremental_carries_delete_masks(spark, tmp_path):
    """Default mode: delete manifests ride forward; kept files stay
    masked, rewritten files were materialized through the mask."""
    path = str(tmp_path / "t")
    _iwrite(spark, path, 0, 5000)      # big (kept)
    _iwrite(spark, path, 5000, 5010)   # small
    _iwrite(spark, path, 5010, 5020)   # small
    iceberg.delete_iceberg(spark, path, "k < 10 OR k >= 5015")  # both legs
    before, _ = _iplan(path)
    big_size = max(os.path.getsize(d["path"]) for d in before)
    out = iceberg.compact_iceberg_incremental(
        spark, path, small_file_bytes=big_size
    )
    assert len(out["rewritten"]) == 2 and out["deletes_purged"] == 0
    _, dels = _iplan(path)
    assert dels, "delete manifests must be carried in default mode"
    ks = {r.k for r in iceberg.read_iceberg(spark, path).select("k").collect()}
    assert ks == set(range(10, 5015))


def test_iceberg_incremental_purge_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    _iwrite(spark, path, 0, 5000)
    _iwrite(spark, path, 5000, 5010)
    iceberg.delete_iceberg(spark, path, "k = 3 OR k = 5005")
    out = iceberg.compact_iceberg_incremental(
        spark, path, small_file_bytes=1, purge_deletes=True
    )
    # every file the delete could apply to was selected; masks folded in
    assert out["deletes_purged"] >= 1
    assert set(out["reasons"].values()) == {"delete-purge"}
    _, dels = _iplan(path)
    assert dels == []
    ks = {r.k for r in iceberg.read_iceberg(spark, path).select("k").collect()}
    assert ks == set(range(5010)) - {3, 5005}


def test_iceberg_incremental_overlap_recluster(spark, tmp_path):
    path = str(tmp_path / "t")
    # overlapping pair on k: evens and odds over [0, 1000)
    iceberg.write_iceberg(
        spark,
        spark.range(0, 1000).where("id % 2 = 0")
        .select(F.col("id").alias("k"), F.lit(1).cast("long").alias("v")).coalesce(1),
        path, format_version=2,
    )
    iceberg.write_iceberg(
        spark,
        spark.range(0, 1000).where("id % 2 = 1")
        .select(F.col("id").alias("k"), F.lit(1).cast("long").alias("v")).coalesce(1),
        path, format_version=2,
    )
    _iwrite(spark, path, 10000, 11000)  # disjoint k-range
    before, _ = _iplan(path)
    out = iceberg.compact_iceberg_incremental(
        spark, path, small_file_bytes=1, cluster_by=["k"]
    )
    assert len(out["rewritten"]) == 2 and out["kept"] == 1
    assert set(out["reasons"].values()) == {"overlap"}
    # new files carry disjoint k-bounds
    meta = iceberg._load_metadata(path)
    after, _ = _iplan(path)
    fid = {f["name"]: f["id"] for f in iceberg._current_schema(meta)["fields"]}["k"]
    spans = []
    for d in after:
        if d["path"] not in out["added"]:
            continue
        lo = iceberg._decode_bound(
            {kv["key"]: kv["value"] for kv in d["lower_bounds"]}[fid], "long"
        )
        hi = iceberg._decode_bound(
            {kv["key"]: kv["value"] for kv in d["upper_bounds"]}[fid], "long"
        )
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) >= 1
    for (l1, h1), (l2, _h2) in zip(spans, spans[1:]):
        assert h1 < l2, f"rewritten bounds still overlap: {spans}"
    assert iceberg.read_iceberg(spark, path).count() == 2000


def test_iceberg_incremental_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        (F.col("id") % 2).alias("grp"), F.col("id").alias("k")
    )
    for lo, hi in [(0, 20), (20, 40)]:
        iceberg.write_iceberg(
            spark,
            df.where((F.col("k") >= lo) & (F.col("k") < hi)).repartition(1),
            path, format_version=2, partition_by=["grp"],
        )
    out = iceberg.compact_iceberg_incremental(spark, path)
    assert out["kept"] == 0 and len(out["added"]) == 2  # one per partition
    after, _ = _iplan(path)
    assert sorted(d["partition"]["grp"] for d in after) == [0, 1]
    assert iceberg.read_iceberg(spark, path).count() == 40


def test_iceberg_incremental_preserves_row_lineage(spark, tmp_path):
    path = str(tmp_path / "t")
    _iwrite(spark, path, 0, 5000, row_lineage=True)
    _iwrite(spark, path, 5000, 5010)
    _iwrite(spark, path, 5010, 5020)
    ids_before = {
        r.k: r._row_id
        for r in iceberg.read_iceberg_row_ids(spark, path).collect()
    }
    before, _ = _iplan(path)
    big_size = max(os.path.getsize(d["path"]) for d in before)
    out = iceberg.compact_iceberg_incremental(
        spark, path, small_file_bytes=big_size
    )
    assert len(out["rewritten"]) == 2
    ids_after = {
        r.k: r._row_id
        for r in iceberg.read_iceberg_row_ids(spark, path).collect()
    }
    assert ids_after == ids_before


# ------------------------------------------------------- clustered tables


def test_cluster_delta_by_roundtrip_and_auto_recluster(spark, tmp_path):
    """CLUSTER BY declares the clustering domain; a plain incremental
    OPTIMIZE then re-clusters overlap components without being told the
    columns. CLUSTER BY NONE stops it."""
    path = str(tmp_path / "t")
    lakehouse.write_delta(
        spark, _mkdf(spark, 0, 300).where("k % 2 = 0").coalesce(1), path
    )
    lakehouse.write_delta(
        spark, _mkdf(spark, 0, 300).where("k % 2 = 1").coalesce(1), path
    )
    lakehouse.write_delta(spark, _mkdf(spark, 1000, 1100).coalesce(1), path)
    lakehouse.cluster_delta_by(spark, path, ["k"])
    assert lakehouse.delta_clustering_columns(path) == ["k"]
    out = lakehouse.compact_delta_incremental(spark, path, small_file_bytes=1)
    assert len(out["rewritten"]) == 2
    assert set(out["reasons"].values()) == {"overlap"}
    assert lakehouse.read_delta(spark, path).count() == 400
    # table still reads under the clustering writer feature
    proto = lakehouse._current_protocol(path)
    assert "clustering" in proto["writerFeatures"]
    # CLUSTER BY NONE: declaration survives, maintenance stops
    lakehouse.cluster_delta_by(spark, path, [])
    assert lakehouse.delta_clustering_columns(path) == []
    out2 = lakehouse.compact_delta_incremental(spark, path, small_file_bytes=1)
    assert out2["version"] is None  # nothing overlaps-selects anymore


def test_cluster_delta_by_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    lakehouse.write_delta(
        spark,
        spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("s")),
        path,
    )
    with pytest.raises(ValueError, match="not in schema"):
        lakehouse.cluster_delta_by(spark, path, ["nope"])
    with pytest.raises(ValueError, match="numeric/temporal"):
        lakehouse.cluster_delta_by(spark, path, ["s"])


def test_clustering_domain_survives_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    lakehouse.write_delta(spark, _mkdf(spark, 0, 10), path)
    lakehouse.cluster_delta_by(spark, path, ["k"])
    lakehouse.checkpoint_delta(path)
    lakehouse.cleanup_delta_log(path)
    assert lakehouse.delta_clustering_columns(path) == ["k"]


def test_iceberg_write_ordered_by_auto_recluster(spark, tmp_path):
    """ALTER ... WRITE ORDERED BY is zero-rewrite; plain incremental
    maintenance then selects overlap components on the declared columns
    and appends apply the order automatically."""
    path = str(tmp_path / "t")
    iceberg.write_iceberg(
        spark,
        spark.range(0, 1000).where("id % 2 = 0")
        .select(F.col("id").alias("k"), F.lit(1).cast("long").alias("v"))
        .coalesce(1),
        path, format_version=2,
    )
    iceberg.write_iceberg(
        spark,
        spark.range(0, 1000).where("id % 2 = 1")
        .select(F.col("id").alias("k"), F.lit(1).cast("long").alias("v"))
        .coalesce(1),
        path, format_version=2,
    )
    files_before = {d["path"] for d in _iplan(path)[0]}
    v = iceberg.set_iceberg_sort_order(path, ["k"])
    assert v > 0
    # zero rewrite: same files
    assert {d["path"] for d in _iplan(path)[0]} == files_before
    out = iceberg.compact_iceberg_incremental(spark, path, small_file_bytes=1)
    assert len(out["rewritten"]) == 2
    assert set(out["reasons"].values()) == {"overlap"}
    assert iceberg.read_iceberg(spark, path).count() == 1000
    # subsequent append applies the declared order without sort_by
    _iwrite(spark, path, 2000, 2100)
    assert iceberg.read_iceberg(spark, path).count() == 1100
    # WRITE UNORDERED stops reclustering
    iceberg.set_iceberg_sort_order(path, [])
    out2 = iceberg.compact_iceberg_incremental(spark, path, small_file_bytes=1)
    assert out2["snapshot_id"] is None


def test_iceberg_sort_order_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    _iwrite(spark, path, 0, 10)
    with pytest.raises(ValueError, match="not in schema"):
        iceberg.set_iceberg_sort_order(path, ["nope"])


def test_compacted_files_stamp_field_ids_rename_survives(spark, tmp_path):
    """REGRESSION (round 13, latent since the compaction round):
    _stage_rewrite_files wrote UNSTAMPED parquet, so a rename AFTER a
    compaction resolved the column by its new name against old-name
    footers and silently read NULL. Compacted files must stamp field
    ids like every other staging path."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "cr")
    iceberg.write_iceberg(
        spark,
        spark.range(6).selectExpr("id", "id * 2 AS v"),
        root,
        format_version=2,
    )
    iceberg.compact_iceberg(spark, root)
    for f in iceberg._live_data_files(root):
        sch = pq.read_schema(f)
        assert all(
            (fl.metadata or {}).get(b"PARQUET:field_id") is not None
            for fl in sch
        ), f
    iceberg.rename_iceberg_column(root, "v", "w")
    got = sorted(
        (r.id, r.w) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(i, i * 2) for i in range(6)]  # was all-NULL w
