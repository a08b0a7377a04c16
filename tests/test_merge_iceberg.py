"""Keyed MERGE for Iceberg (merge_iceberg): single-snapshot merge-on-read
upsert/delete-by-key — the Iceberg twin of lakehouse.merge_delta, plus
the streaming upsert sink built on it."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _mk(spark, root, partition_by=None):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, k string, v int"
    )
    iceberg.write_iceberg(
        spark, df, root, format_version=2, partition_by=partition_by
    )


def test_upsert_replaces_and_inserts(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    src = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "id int, k string, v int"
    )
    sid = iceberg.merge_iceberg(spark, src, root, keys=["id"])
    rows = {(r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "d", 40)}
    meta = iceberg._load_metadata(root)
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    assert snap["summary"]["operation"] == "overwrite"
    # prior snapshot unchanged (atomic swap)
    prior = snap["parent-snapshot-id"]
    assert iceberg.read_iceberg(spark, root, snapshot_id=prior).count() == 3


def test_delete_by_key(spark, tmp_path):
    root = str(tmp_path / "d")
    _mk(spark, root)
    src = spark.createDataFrame([(1,), (3,), (9,)], "id int")
    iceberg.merge_iceberg(spark, src, root, keys=["id"], when_matched="delete")
    rows = {(r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {(2, "b", 20)}


def test_newer_wins(spark, tmp_path):
    root = str(tmp_path / "nw")
    df = spark.createDataFrame(
        [(1, 100, "old"), (2, 100, "old")], "id int, ts int, v string"
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    src = spark.createDataFrame(
        [(1, 200, "new"), (2, 50, "stale"), (3, 10, "ins")],
        "id int, ts int, v string",
    )
    iceberg.merge_iceberg(
        spark, src, root, keys=["id"], newer_wins_col="ts"
    )
    rows = {(r.id, r.ts, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    # id=1 replaced (strictly newer), id=2 kept (stale loses), id=3 inserted
    assert rows == {(1, 200, "new"), (2, 100, "old"), (3, 10, "ins")}
    # ties keep target
    tie = spark.createDataFrame([(1, 200, "tie")], "id int, ts int, v string")
    iceberg.merge_iceberg(spark, tie, root, keys=["id"], newer_wins_col="ts")
    rows = {(r.id, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert (1, "new") in rows and (1, "tie") not in rows


def test_partitioned_merge_moves_rows(spark, tmp_path):
    root = str(tmp_path / "p")
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).alias("p"), F.lit(0).alias("v")
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, partition_by=["p"])
    # move id=4 to partition p=1
    src = spark.createDataFrame([(4, 1, 7)], "id bigint, p bigint, v int")
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    got = iceberg.read_iceberg(spark, root)
    assert got.count() == 20
    assert got.where("id = 4").collect()[0].p == 1
    # partition pruning still sees the moved row
    assert iceberg.read_iceberg(spark, root, where="p = 1").where(
        "id = 4"
    ).count() == 1


def test_cardinality_and_schema_checks(spark, tmp_path):
    root = str(tmp_path / "c")
    _mk(spark, root)
    dup = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2)], "id int, k string, v int"
    )
    with pytest.raises(ValueError, match="multiple rows per key"):
        iceberg.merge_iceberg(spark, dup, root, keys=["id"])
    drift = spark.createDataFrame([(1, "x")], "id int, k string")
    with pytest.raises(ValueError, match="schema mismatch"):
        iceberg.merge_iceberg(spark, drift, root, keys=["id"])


def test_first_merge_creates_and_batch_idempotent(spark, tmp_path):
    root = str(tmp_path / "b")
    src = spark.createDataFrame([(1, "a", 10)], "id int, k string, v int")
    s1 = iceberg.merge_iceberg(spark, src, root, keys=["id"], batch=("app", 0))
    # replay of the same batch id is a no-op
    s2 = iceberg.merge_iceberg(spark, src, root, keys=["id"], batch=("app", 0))
    assert s2 == s1
    assert iceberg.read_iceberg(spark, root).count() == 1
    # next batch commits
    src2 = spark.createDataFrame([(1, "a", 99)], "id int, k string, v int")
    iceberg.merge_iceberg(spark, src2, root, keys=["id"], batch=("app", 1))
    assert {r.v for r in iceberg.read_iceberg(spark, root).collect()} == {99}
    with pytest.raises(ValueError, match="cannot delete"):
        iceberg.merge_iceberg(
            spark, src, str(tmp_path / "none"), keys=["id"], when_matched="delete"
        )


def test_null_keys_never_match(spark, tmp_path):
    root = str(tmp_path / "n")
    df = spark.createDataFrame(
        [(None, "a", 1), (2, "b", 2)], "id int, k string, v int"
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    src = spark.createDataFrame([(None, "X", 9)], "id int, k string, v int")
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    rows = {(r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    # null-keyed target row survives; null-keyed source row inserts
    assert rows == {("a", 1), ("b", 2), ("X", 9)}


def test_compact_after_merge_identical(spark, tmp_path):
    root = str(tmp_path / "cp")
    _mk(spark, root)
    src = spark.createDataFrame([(2, "B", 99)], "id int, k string, v int")
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    before = sorted(
        (r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    iceberg.compact_iceberg(spark, root)
    after = sorted(
        (r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert before == after


def test_stream_to_iceberg_upsert_latest_per_key(spark, tmp_path, sf_dir):
    """Streaming feature materialization into ICEBERG: a real Structured
    Streaming replay MERGEs strictly-newer-wins per user — the table ends
    at ONE row per user holding that user's max event timestamp, and a
    rerun with the same checkpoint changes nothing."""
    from feature_store_ml_spark.io import load_table
    from feature_store_ml_spark.streaming import events as ev

    table = str(tmp_path / "latest")
    ckpt = str(tmp_path / "ckpt")
    stream = ev._streaming_events(spark, sf_dir).select("user_id", "ts", "value")
    ev.stream_to_iceberg(
        spark, stream, table, app_id="up1", checkpoint_dir=ckpt,
        mode="upsert", keys=["user_id"], order_col="ts",
    )
    got = iceberg.read_iceberg(spark, table).toPandas()
    assert got.user_id.is_unique
    expected = (
        load_table(spark, sf_dir, "events").groupBy("user_id")
        .agg(F.max("ts").alias("ts")).toPandas()
    )
    merged = got.merge(expected, on="user_id", suffixes=("", "_want"))
    assert len(merged) == len(expected)
    assert (merged.ts == merged.ts_want).all()
    # rerun: same checkpoint => no new batches; table unchanged
    stream2 = ev._streaming_events(spark, sf_dir).select("user_id", "ts", "value")
    again = ev.stream_to_iceberg(
        spark, stream2, table, app_id="up1", checkpoint_dir=ckpt,
        mode="upsert", keys=["user_id"], order_col="ts",
    )
    assert again == []
    assert iceberg.read_iceberg(spark, table).count() == len(expected)
    with pytest.raises(ValueError, match="requires keys"):
        ev.stream_to_iceberg(
            spark, stream2, table, app_id="x", mode="upsert"
        )


def test_merge_schema_evolution(spark, tmp_path):
    """merge_schema=True: the source may append nullable columns — an
    UpdateSchema metadata commit (fresh field ids) then the merge
    snapshot; kept rows backfill null; DROP/retype stay fail-loud."""
    root = str(tmp_path / "ev")
    _mk(spark, root)
    src = spark.createDataFrame(
        [(2, "B", 99, 0.5), (4, "d", 40, 0.9)],
        "id int, k string, v int, score double",
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        iceberg.merge_iceberg(spark, src, root, keys=["id"])
    iceberg.merge_iceberg(spark, src, root, keys=["id"], merge_schema=True)
    back = iceberg.read_iceberg(spark, root)
    assert back.columns == ["id", "k", "v", "score"]
    rows = {(r.id, r.k, r.v, r.score) for r in back.collect()}
    assert rows == {
        (1, "a", 10, None),
        (2, "B", 99, 0.5),
        (3, "c", 30, None),
        (4, "d", 40, 0.9),
    }
    # new column got a fresh, unique field id
    fields = iceberg._current_schema(iceberg._load_metadata(root))["fields"]
    ids = [f["id"] for f in fields]
    assert len(ids) == len(set(ids)) == 4
    # guards
    with pytest.raises(ValueError, match="cannot DROP"):
        iceberg.merge_iceberg(
            spark,
            spark.createDataFrame([(1, "x")], "id int, k string"),
            root, keys=["id"], merge_schema=True,
        )
    with pytest.raises(ValueError, match="cannot change"):
        iceberg.merge_iceberg(
            spark,
            spark.createDataFrame(
                [(1, "x", 1.5, 0.1)], "id int, k string, v double, score double"
            ),
            root, keys=["id"], merge_schema=True,
        )


def test_merge_iceberg_partial_update_set_clauses(spark, tmp_path):
    """set_clauses: the MoR twin of merge_delta's partial update — the
    position-delete mask is identical to whole-row, only the replacement
    rows differ (t./s. pair transform; unassigned columns keep the
    target value; unmatched keys insert whole-row)."""
    root = str(tmp_path / "pu")
    iceberg.write_iceberg(
        spark,
        spark.range(0, 20).select(
            "id", (F.col("id") % 4).alias("v"), F.lit("x").alias("tag")
        ),
        root,
        format_version=2,
    )
    src = spark.createDataFrame(
        [(1, 100, "s"), (2, 200, "s"), (99, 9, "s")], "id long, v long, tag string"
    )
    iceberg.merge_iceberg(
        spark, src, root, keys=["id"], set_clauses={"v": "t.v + s.v"}
    )
    rows = {r.id: (r.v, r.tag) for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows[1] == (101, "x") and rows[2] == (202, "x")
    assert rows[99] == (9, "s")  # whole-row insert
    assert rows[3] == (3, "x") and len(rows) == 21
    # partitioned: transformed rows land back through the shared staging
    # tail (partition moves included)
    p = str(tmp_path / "pp")
    iceberg.write_iceberg(
        spark,
        spark.range(0, 30).select(
            "id", (F.col("id") % 3).alias("p"), (F.col("id") * 1.0).alias("v")
        ),
        p,
        format_version=2,
        partition_by=["p"],
    )
    iceberg.merge_iceberg(
        spark,
        spark.createDataFrame([(4, 1, 0.5), (100, 2, 7.0)], "id long, p long, v double"),
        p,
        keys=["id"],
        set_clauses={"v": "t.v * s.v"},
    )
    got = {r.id: r.v for r in iceberg.read_iceberg(spark, p).collect()}
    assert got[4] == 2.0 and got[100] == 7.0 and len(got) == 31
    # refusals mirror the Delta twin
    with pytest.raises(ValueError, match="unknown"):
        iceberg.merge_iceberg(spark, src, root, keys=["id"], set_clauses={"zz": "1"})
    with pytest.raises(NotImplementedError, match="newer_wins"):
        iceberg.merge_iceberg(
            spark, src, root, keys=["id"],
            set_clauses={"v": "1"}, newer_wins_col="v",
        )
    with pytest.raises(ValueError, match="empty"):
        iceberg.merge_iceberg(spark, src, root, keys=["id"], set_clauses={})


def test_merge_not_matched_by_source_full_sync(spark, tmp_path):
    """whenNotMatchedBySourceDelete, MoR twin (round 8): with no
    condition the merge is a keyed FULL SYNC — the table becomes exactly
    the source, and the stale rows cost only position-delete mask
    entries (no file rewrite)."""
    root = str(tmp_path / "sync")
    _mk(spark, root)
    src = spark.createDataFrame(
        [(2, "B", 99), (4, "d", 40)], "id int, k string, v int"
    )
    import os as _os

    data_files_before = {
        f for f in _os.listdir(_os.path.join(root, "data"))
        if f.endswith(".parquet") and not f.startswith("delete-")
    }
    iceberg.merge_iceberg(
        spark, src, root, keys=["id"], not_matched_by_source="delete"
    )
    rows = {(r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {(2, "B", 99), (4, "d", 40)}
    # MoR: original data files untouched (mask + adds only)
    assert data_files_before <= {
        f for f in _os.listdir(_os.path.join(root, "data"))
        if f.endswith(".parquet") and not f.startswith("delete-")
    }


def test_merge_not_matched_by_source_condition_slice(spark, tmp_path):
    """A condition bounds the sync slice: unmatched rows OUTSIDE it
    survive."""
    root = str(tmp_path / "slice")
    _mk(spark, root)  # ids 1,2,3 with k a,b,c
    src = spark.createDataFrame([(1, "A", 11)], "id int, k string, v int")
    iceberg.merge_iceberg(
        spark,
        src,
        root,
        keys=["id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="k = 'b'",
    )
    rows = {(r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    # 1 updated; 2 (k=b, unmatched, in-slice) deleted; 3 (k=c) survives
    assert rows == {(1, "A", 11), (3, "c", 30)}
    # composes with set_clauses (partial update + slice sync)
    src2 = spark.createDataFrame([(3, "ignored", 90)], "id int, k string, v int")
    iceberg.merge_iceberg(
        spark,
        src2,
        root,
        keys=["id"],
        set_clauses={"v": "s.v + t.v"},
        not_matched_by_source="delete",
        not_matched_by_source_condition="v > 100",
    )
    rows2 = {(r.id, r.k, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    # 3: partial update v=90+30=120, keeps k='c'; 1 (v=11, not >100) survives
    assert rows2 == {(1, "A", 11), (3, "c", 120)}


def test_merge_not_matched_by_source_refusals(spark, tmp_path):
    root = str(tmp_path / "ref")
    _mk(spark, root)
    src = spark.createDataFrame([(1, "A", 1)], "id int, k string, v int")
    with pytest.raises(ValueError, match="supports only"):
        iceberg.merge_iceberg(
            spark, src, root, keys=["id"], not_matched_by_source="insert"
        )
    with pytest.raises(ValueError, match="pairs with"):
        iceberg.merge_iceberg(
            spark, src, root, keys=["id"], when_matched="delete",
            not_matched_by_source="delete",
        )
    with pytest.raises(ValueError, match="requires"):
        iceberg.merge_iceberg(
            spark, src, root, keys=["id"],
            not_matched_by_source_condition="v > 0",
        )
    with pytest.raises(NotImplementedError, match="newer_wins"):
        iceberg.merge_iceberg(
            spark, src, root, keys=["id"], newer_wins_col="v",
            not_matched_by_source="delete",
        )
