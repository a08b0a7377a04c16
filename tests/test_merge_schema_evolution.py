"""MERGE schema evolution (merge_delta merge_schema=True — Delta's
whenMatched autoMerge): a source feed that grew a new column upserts
without a separate ALTER, the widened schema and the merged files land
in ONE commit, and untouched rows backfill null."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse as lh


def _mk(spark, root, partition_by=None):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, k string, v int"
    )
    lh.write_delta(spark, df, root, partition_by=partition_by)


def test_merge_adds_new_column(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    src = spark.createDataFrame(
        [(2, "B", 99, 0.5), (4, "d", 40, 0.9)],
        "id int, k string, v int, score double",
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        lh.merge_delta(spark, src, root, keys=["id"])
    v = lh.merge_delta(spark, src, root, keys=["id"], merge_schema=True)
    back = lh.read_delta(spark, root)
    assert back.columns == ["id", "k", "v", "score"]
    rows = {(r.id, r.k, r.v, r.score) for r in back.collect()}
    # merged rows carry the new column; kept rows backfill null
    assert rows == {
        (1, "a", 10, None),
        (2, "B", 99, 0.5),
        (3, "c", 30, None),
        (4, "d", 40, 0.9),
    }
    # the widened schema is durable: later appends must carry it
    with pytest.raises(ValueError, match="mismatch"):
        lh.write_delta(
            spark,
            spark.createDataFrame([(9, "z", 1)], "id int, k string, v int"),
            root,
        )
    assert v == lh._next_version(lh._delta_log_dir(root)) - 1


def test_merge_evolution_guards(spark, tmp_path):
    root = str(tmp_path / "g")
    _mk(spark, root)
    # dropping a declared column stays fail-loud even with merge_schema
    drop = spark.createDataFrame([(1, "x")], "id int, k string")
    with pytest.raises(ValueError, match="cannot DROP"):
        lh.merge_delta(spark, drop, root, keys=["id"], merge_schema=True)
    # re-typing stays fail-loud
    retype = spark.createDataFrame(
        [(1, "x", 1.5)], "id int, k string, v double"
    )
    with pytest.raises(ValueError, match="cannot change"):
        lh.merge_delta(spark, retype, root, keys=["id"], merge_schema=True)


def test_merge_evolution_partitioned_and_newer_wins(spark, tmp_path):
    root = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100)], "id int, p string, ts int"
    )
    lh.write_delta(spark, df, root, partition_by=["p"])
    src = spark.createDataFrame(
        [(1, "a", 200, "fresh"), (2, "b", 50, "stale"), (3, "c", 10, "ins")],
        "id int, p string, ts int, tag string",
    )
    lh.merge_delta(
        spark, src, root, keys=["id"], merge_schema=True, newer_wins_col="ts"
    )
    rows = {(r.id, r.ts, r.tag) for r in lh.read_delta(spark, root).collect()}
    # id=1 replaced (newer), id=2 kept with null tag (stale), id=3 inserted
    assert rows == {(1, 200, "fresh"), (2, 100, None), (3, 10, "ins")}


def test_merge_evolution_refused_on_mapped_tables(spark, tmp_path):
    root = str(tmp_path / "m")
    _mk(spark, root)
    lh.enable_delta_column_mapping(spark, root)
    src = spark.createDataFrame(
        [(1, "a", 1, 9)], "id int, k string, v int, extra int"
    )
    with pytest.raises(NotImplementedError, match="column-mapped"):
        lh.merge_delta(spark, src, root, keys=["id"], merge_schema=True)


def test_append_evolution_after_rename_reusing_freed_name(spark, tmp_path):
    """merge_schema append on a MAPPED table must give new columns an
    OPAQUE physicalName (ADVICE r12): a rename keeps the old physical
    name on the renamed field, so re-adding a column under the freed
    logical name with physicalName==logical would put two logical
    fields on ONE physical parquet column — duplicate column on write,
    both logical columns resolving from one physical column on read."""
    import json

    root = str(tmp_path / "rn")
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, a int")
    lh.write_delta(spark, df, root)
    lh.rename_delta_column(spark, root, "a", "b")  # b keeps physical 'a'
    src = spark.createDataFrame([(3, 30, 99)], "id int, b int, a int")
    lh.write_delta(spark, src, root, mode="append", merge_schema=True)
    _live, meta = lh._replay_log(root)
    fields = json.loads(meta["schemaString"])["fields"]
    phys = {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in fields
    }
    assert phys["b"] == "a"  # rename-stable
    assert phys["a"] != "a"  # opaque, NOT the freed name
    assert len(set(phys.values())) == len(phys)  # all unique
    back = lh.read_delta(spark, root)
    rows = {(r.id, r.b, r.a) for r in back.collect()}
    assert rows == {(1, 10, None), (2, 20, None), (3, 30, 99)}
