"""Iceberg FORMAT-VERSION 3 (round 11): deletion vectors — the marquee
v3 feature — on top of the v2 surface, plus mandatory row lineage and
fail-loud guards for the v3 features this engine does not implement
(column defaults, v3-only types).

Spec anchors: table-spec §Position Delete Files ("v3+ writers must use
deletion vectors; at most one DV per data file; a superseded DV must
leave in the same snapshot"), Puffin `deletion-vector-v1` (Delta-framed
64-bit roaring bitmap, referenced-data-file + cardinality properties).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _mk(spark, root, n=100, **kw):
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return iceberg.write_iceberg(
        spark, df.coalesce(1), root, format_version=3, **kw
    )


def _dv_entries(root):
    meta = iceberg._load_metadata(root)
    _data, dels = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    return [d for d in dels if d.get("referenced_data_file")]


def test_v3_create_is_lineage_mandatory(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, n=10)
    meta = iceberg._load_metadata(root)
    assert meta["format-version"] == 3
    assert "next-row-id" in meta  # spec: row lineage required in v3
    ids = iceberg.read_iceberg_row_ids(spark, root)
    assert ids.select("_row_id").distinct().count() == 10


def test_v3_delete_writes_dv_and_masks(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.delete_iceberg(spark, root, "k >= 90")
    assert iceberg.read_iceberg(spark, root).count() == 90
    dvs = _dv_entries(root)
    assert len(dvs) == 1 and dvs[0]["record_count"] == 10
    assert dvs[0]["path"].endswith(".puffin")


def test_v3_second_delete_merges_one_dv_per_file(spark, tmp_path):
    """v3 invariant: at most one DV per data file — a second delete on
    the same file UNIONS positions and supersedes the old DV in the same
    snapshot."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.delete_iceberg(spark, root, "k >= 90")
    iceberg.delete_iceberg(spark, root, "k < 10")
    assert iceberg.read_iceberg(spark, root).count() == 80
    dvs = _dv_entries(root)
    refs = [d["referenced_data_file"] for d in dvs]
    assert len(refs) == len(set(refs)) == 1
    assert dvs[0]["record_count"] == 20  # merged cardinality
    # time travel: every prior snapshot still reads its own mask
    meta = iceberg._load_metadata(root)
    snaps = [s["snapshot-id"] for s in meta["snapshots"]]
    assert iceberg.read_iceberg(spark, root, snapshot_id=snaps[0]).count() == 100
    assert iceberg.read_iceberg(spark, root, snapshot_id=snaps[1]).count() == 90


def test_v3_update_and_merge(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.update_iceberg(spark, root, {"v": "v + 1"}, where="k < 10")
    got = {r.k: r.v for r in iceberg.read_iceberg(spark, root).collect()}
    assert len(got) == 100 and got[5] == 11 and got[50] == 100
    src = spark.createDataFrame([(5, 999), (200, 400)], "k long, v long")
    iceberg.merge_iceberg(spark, src, root, keys=["k"])
    got = {r.k: r.v for r in iceberg.read_iceberg(spark, root).collect()}
    assert len(got) == 101 and got[5] == 999 and got[200] == 400
    # lineage: k=5 kept its row id across two rewrites
    r5 = [r for r in iceberg.read_iceberg_row_ids(spark, root).collect()
          if r.k == 5][0]
    assert r5._row_id == 5


def test_v3_equality_deletes_compose_with_dvs(spark, tmp_path):
    """Eq-delete manifests ride through DV consolidation untouched."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(5,), (6,)], "k long")
    )
    iceberg.delete_iceberg(spark, root, "k >= 90")
    ks = {r.k for r in iceberg.read_iceberg(spark, root).select("k").collect()}
    assert ks == set(range(90)) - {5, 6}
    meta = iceberg._load_metadata(root)
    _d, dels = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    kinds = sorted(d["kind"] for d in dels)
    assert kinds == ["eq", "pos"]


def test_v3_compaction_folds_dvs(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.delete_iceberg(spark, root, "k % 7 = 0")
    expect = iceberg.read_iceberg(spark, root).count()
    iceberg.compact_iceberg(spark, root)
    assert iceberg.read_iceberg(spark, root).count() == expect
    assert _dv_entries(root) == []


def test_v3_cdf_reports_only_new_positions(spark, tmp_path):
    """The change feed on a merged DV must surface only the NEWLY dead
    rows, not the prior DV's positions again."""
    root = str(tmp_path / "t")
    s0 = _mk(spark, root)
    iceberg.delete_iceberg(spark, root, "k >= 90")
    meta = iceberg._load_metadata(root)
    s1 = meta["current-snapshot-id"]
    iceberg.delete_iceberg(spark, root, "k < 5")
    cdf = iceberg.read_iceberg_cdf(spark, root, s1).collect()
    dead = sorted(r.k for r in cdf if r._change_type == "delete")
    assert dead == [0, 1, 2, 3, 4]
    # full feed from genesis sees both delete sets once each
    cdf_all = iceberg.read_iceberg_cdf(spark, root, s0).collect()
    dead_all = sorted(r.k for r in cdf_all if r._change_type == "delete")
    assert dead_all == [0, 1, 2, 3, 4] + list(range(90, 100))


def test_v3_incremental_compaction_purges_dvs(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.delete_iceberg(spark, root, "k = 3")
    out = iceberg.compact_iceberg_incremental(
        spark, root, small_file_bytes=1, purge_deletes=True
    )
    assert out["deletes_purged"] >= 1
    assert _dv_entries(root) == []
    assert iceberg.read_iceberg(spark, root).count() == 99


def test_v3_convert_to_delta_carries_dv_positions(spark, tmp_path):
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.delete_iceberg(spark, root, "k >= 95 OR k = 7")
    convert.convert_iceberg_to_delta(spark, root)  # in-place UniForm view
    ks = {r.k for r in lakehouse.read_delta(spark, root).select("k").collect()}
    assert ks == set(range(95)) - {7}


def test_v3_reader_guards_fail_loud(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, n=5)
    mp = iceberg.latest_metadata_path(root)
    meta = json.load(open(mp))
    # round 12: a parseable column default no longer refuses — it reads
    # (the field exists in every file here, so the default never fires)
    meta["schemas"][0]["fields"][0]["initial-default"] = 0
    json.dump(meta, open(mp, "w"))
    assert iceberg.read_iceberg(spark, root).count() == 5
    meta["schemas"][0]["fields"][0].pop("initial-default")
    meta["schemas"][0]["fields"][1]["type"] = "timestamptz_ns"
    json.dump(meta, open(mp, "w"))
    with pytest.raises(NotImplementedError, match="timestamptz_ns"):
        iceberg.read_iceberg(spark, root)
    meta["format-version"] = 4
    json.dump(meta, open(mp, "w"))
    with pytest.raises(NotImplementedError, match="format-version 4"):
        iceberg.read_iceberg(spark, root)


def test_v3_uniform_from_delta_dvs_reframe(spark, tmp_path):
    """convert_delta_to_iceberg(format_version=3): Delta DVs re-frame
    into puffin DV blobs bytes-verbatim; the v3 view reads identically,
    carries mandatory lineage, and a refresh keeps the format version."""
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "t")
    lakehouse.write_delta(
        spark,
        spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1),
        root,
    )
    lakehouse.delete_delta(spark, root, "k >= 90 OR k = 7")
    convert.convert_delta_to_iceberg(spark, root, format_version=3)
    meta = iceberg._load_metadata(root)
    assert meta["format-version"] == 3 and "next-row-id" in meta
    ks = {r.k for r in iceberg.read_iceberg(spark, root).select("k").collect()}
    assert ks == set(range(90)) - {7}
    dvs = _dv_entries(root)
    assert dvs and all(d["path"].endswith(".puffin") for d in dvs)
    assert sum(d["record_count"] for d in dvs) == 11
    # lineage columns resolve on the converted view
    ids = iceberg.read_iceberg_row_ids(spark, root)
    assert ids.count() == 89
    assert ids.select("_row_id").distinct().count() == 89
    # refresh after a new Delta commit keeps v3 and stays row-identical
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(500, 1000)], "k long, v long"),
        root, mode="append",
    )
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    meta2 = iceberg._load_metadata(root)
    assert meta2["format-version"] == 3
    assert iceberg.read_iceberg(spark, root).count() == 90
    with pytest.raises(ValueError, match="cannot change"):
        convert.convert_delta_to_iceberg(
            spark, root, refresh=True, format_version=2
        )


def test_v3_uniform_refresh_guard_on_v2_view(spark, tmp_path):
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "t")
    lakehouse.write_delta(
        spark, spark.range(5).select(F.col("id").alias("k")), root
    )
    convert.convert_delta_to_iceberg(spark, root)  # v2 view
    assert iceberg._load_metadata(root)["format-version"] == 2
    with pytest.raises(ValueError, match="cannot change"):
        convert.convert_delta_to_iceberg(
            spark, root, refresh=True, format_version=3
        )


def test_v3_expire_reclaims_superseded_puffin(spark, tmp_path):
    """Superseded DV puffin files (older snapshots only) reclaim on
    expiration; the live snapshot's puffin survives and still masks."""
    import glob

    root = str(tmp_path / "t")
    _mk(spark, root)
    iceberg.delete_iceberg(spark, root, "k >= 95")
    iceberg.delete_iceberg(spark, root, "k < 3")  # supersedes DV 1
    puffins = lambda: sorted(glob.glob(os.path.join(root, "data", "*.puffin")))
    assert len(puffins()) == 2
    out = iceberg.expire_iceberg_snapshots(root, keep=1)
    # the first delete's puffin was only referenced by the expired
    # snapshot — reclaimed; the live merged DV survives
    assert len(puffins()) == 1
    assert any(p.endswith(".puffin") for p in out["files"])
    ks = {r.k for r in iceberg.read_iceberg(spark, root).select("k").collect()}
    assert ks == set(range(3, 95))


def test_equality_delete_write_is_single_pass(spark, tmp_path):
    """Round 13 (VERDICT r12 item 4): the distinct-key count rides the
    staging write as an observed metric — exactly ONE parquet write job
    and NO separate count scan over the keys frame."""
    import unittest.mock as mock

    from pyspark.sql import functions as F
    from pyspark.sql.readwriter import DataFrameWriter

    root = str(tmp_path / "eq1p")
    iceberg.write_iceberg(
        spark,
        spark.range(20).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
    )
    keys = spark.range(20).where("id % 4 = 0").select("id").unionAll(
        spark.range(20).where("id % 4 = 0").select("id")  # dupes to drop
    )
    calls = []
    orig_parquet = DataFrameWriter.parquet
    from pyspark.sql.dataframe import DataFrame as _DF

    orig_count = _DF.count

    def counting_write(self, *a, **k):
        calls.append(("write", a[0] if a else None))
        return orig_parquet(self, *a, **k)

    def counting_count(self):
        calls.append(("count", None))
        return orig_count(self)

    with mock.patch.object(DataFrameWriter, "parquet", counting_write), \
         mock.patch.object(_DF, "count", counting_count):
        iceberg.delete_iceberg_equality(spark, root, keys)
    assert [c for c, _ in calls] == ["write"], calls
    # and the delete still masks exactly the keyed rows
    back = iceberg.read_iceberg(spark, root)
    assert sorted(r.id for r in back.collect()) == [
        i for i in range(20) if i % 4 != 0
    ]
    # manifest record_count carries the DEDUPLICATED key count
    meta = iceberg._load_metadata(root)
    _d, dels = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    assert dels and dels[0]["kind"] == "eq"
