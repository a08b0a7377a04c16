"""Iceberg ROW LINEAGE (spec §Row Lineage — the v3 feature, implemented
over this module's v2 tables; the Iceberg twin of Delta row tracking,
tests/test_row_tracking*.py): stable per-row ids

    _row_id = coalesce(materialized column, file.first_row_id + pos)

surviving appends, UPDATE, MERGE (all clause shapes), position deletes
and compaction — on parquet AND AVRO/ORC data files, which is the point:
the materialized lineage columns carry the spec's reserved field ids and
resolve through the same field-id machinery as user columns in every
container format."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _ids(spark, root):
    return {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in iceberg.read_iceberg_row_ids(spark, root).collect()
    }


def _mk(spark, root, n=12, fmt="parquet", partition_by=None):
    df = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(n)],
        "id long, name string, grp long",
    )
    iceberg.write_iceberg(
        spark, df, root, format_version=2, row_lineage=True,
        data_format=fmt, partition_by=partition_by,
    )


def test_create_append_assigns_disjoint_blocks(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, n=10)
    first = _ids(spark, root)
    rids = [r for r, _s in first.values()]
    assert sorted(rids) == list(range(10))
    assert all(s == 1 for _r, s in first.values())
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame(
            [(i, f"n{i}", i % 3) for i in range(10, 14)],
            "id long, name string, grp long",
        ),
        root,
        format_version=2,
    )
    both = _ids(spark, root)
    assert {k: v for k, v in both.items() if k < 10} == first
    new = [r for k, (r, _s) in both.items() if k >= 10]
    assert sorted(new) == list(range(10, 14))
    assert iceberg._load_metadata(root)["next-row-id"] == 14


@pytest.mark.parametrize("fmt", ["parquet", "avro", "orc"])
def test_dml_lifecycle_preserves_ids(spark, tmp_path, fmt):
    """UPDATE keeps ids and bumps _last_updated; MERGE keeps matched
    ids and assigns fresh ones to inserts; compaction changes NOTHING —
    identically in all three data-file formats."""
    root = str(tmp_path / f"t_{fmt}")
    _mk(spark, root, n=12, fmt=fmt)
    before = _ids(spark, root)
    iceberg.update_iceberg(
        spark, root, {"name": "concat(name, '_u')"}, where="id % 4 = 1"
    )
    after = _ids(spark, root)
    assert {k: r for k, (r, _s) in after.items()} == {
        k: r for k, (r, _s) in before.items()
    }
    upd_seq = iceberg._load_metadata(root)["last-sequence-number"]
    for k, (_r, s) in after.items():
        assert s == (upd_seq if k % 4 == 1 else 1)
    src = spark.createDataFrame(
        [(3, "m3", 0), (99, "m99", 0)], "id long, name string, grp long"
    )
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    merged = _ids(spark, root)
    assert merged[3][0] == before[3][0]
    assert merged[99][0] >= 12  # fresh block, never reused
    assert len({r for r, _s in merged.values()}) == len(merged)  # unique
    pre = _ids(spark, root)
    iceberg.compact_iceberg(spark, root)
    assert _ids(spark, root) == pre
    # plain reads never see the lineage columns
    assert iceberg.read_iceberg(spark, root).columns == ["id", "name", "grp"]


def test_position_delete_leaves_survivor_ids(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, n=10)
    before = _ids(spark, root)
    iceberg.delete_iceberg(spark, root, "id IN (2, 7)")
    after = _ids(spark, root)
    assert set(after) == set(before) - {2, 7}
    assert all(after[k] == before[k] for k in after)


def test_partitioned_update_moves_row_with_identity(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, n=12, partition_by=["grp"])
    before = _ids(spark, root)
    # move id=4 (grp 1) to grp 2: partition flip, id must survive
    iceberg.update_iceberg(spark, root, {"grp": "2"}, where="id = 4")
    after = _ids(spark, root)
    assert after[4][0] == before[4][0]
    got = {
        r.id: r.grp
        for r in iceberg.read_iceberg(spark, root).collect()
    }
    assert got[4] == 2


def test_enable_later_nulls_then_compact_assigns(spark, tmp_path):
    """Files from before enablement read a null _row_id (spec upgrade
    semantics); a compaction rewrite pulls every row into fresh
    id-assigned files."""
    root = str(tmp_path / "t")
    iceberg.write_iceberg(
        spark, spark.range(6).select("id"), root, format_version=2
    )
    with pytest.raises(ValueError, match="row lineage is not enabled"):
        iceberg.read_iceberg_row_ids(spark, root)
    iceberg.enable_iceberg_row_lineage(root)
    ids = _ids(spark, root)
    assert all(r is None for r, _s in ids.values())
    iceberg.compact_iceberg(spark, root)
    ids2 = _ids(spark, root)
    assert sorted(r for r, _s in ids2.values()) == list(range(6))
    assert iceberg._load_metadata(root)["next-row-id"] == 6


def test_time_travel_reads_historic_lineage(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, n=8)
    s1 = iceberg._load_metadata(root)["current-snapshot-id"]
    before = _ids(spark, root)
    iceberg.update_iceberg(spark, root, {"name": "'x'"}, where="id = 2")
    old = {
        r.id: (r._row_id, r._last_updated_sequence_number)
        for r in iceberg.read_iceberg_row_ids(
            spark, root, snapshot_id=s1
        ).collect()
    }
    assert old == before


def test_merge_newer_wins_and_partial_update_keep_identity(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, ver long"
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, row_lineage=True)
    before = _ids(spark, root)
    # newer-wins: id=1 loses (source newer), id=2 keeps (source older)
    src = spark.createDataFrame(
        [(1, "A", 15), (2, "B", 5)], "id long, name string, ver long"
    )
    iceberg.merge_iceberg(spark, src, root, keys=["id"], newer_wins_col="ver")
    after = _ids(spark, root)
    assert after[1][0] == before[1][0] and after[2][0] == before[2][0]
    names = {r.id: r.name for r in iceberg.read_iceberg(spark, root).collect()}
    assert names == {1: "A", 2: "b"}
    # partial update (set_clauses): per-row identity carried
    src2 = spark.createDataFrame([(2, 99)], "id long, bump long")
    iceberg.merge_iceberg(
        spark,
        src2.select(
            "id", F.lit("ignored").alias("name"), F.col("bump").alias("ver")
        ),
        root,
        keys=["id"],
        set_clauses={"ver": "s.ver"},
    )
    after2 = _ids(spark, root)
    assert after2[2][0] == before[2][0]


def test_row_lineage_v1_refuses(spark, tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(NotImplementedError, match="format_version 2"):
        iceberg.write_iceberg(
            spark, spark.range(3).select("id"), root, row_lineage=True
        )


def test_rewrite_manifests_carries_first_row_id(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, n=6)
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame(
            [(6, "n6", 0)], "id long, name string, grp long"
        ),
        root,
        format_version=2,
    )
    before = _ids(spark, root)
    iceberg.rewrite_manifests_iceberg(spark, root, target_entries=1)
    assert _ids(spark, root) == before
