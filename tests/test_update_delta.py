"""update_delta — UPDATE ... SET ... WHERE as a copy-on-write commit,
completing the DML triad (merge/delete/update). Same scale discipline as
MERGE: distributed touched-file discovery collecting only file paths,
rewrite of touched files only, partition moves free, CDF pre/post images.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _mk(spark, tmp_path, name="t", n=20):
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


def test_update_basic_predicate(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v = lakehouse.update_delta(spark, root, {"v": "v + 1"}, where="grp = 2")
    assert v == 1
    got = {r.id: r.v for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {i: i * 10 + (1 if i % 4 == 2 else 0) for i in range(20)}


def test_update_simultaneous_assignment_swaps(spark, tmp_path):
    root = str(tmp_path / "swap")
    lakehouse.write_delta(
        spark,
        spark.range(5).select(
            F.col("id").alias("a"), (F.col("id") * 100).alias("b")
        ),
        root,
        mode="overwrite",
    )
    lakehouse.update_delta(spark, root, {"a": "b", "b": "a"})
    rows = sorted(
        (r.a, r.b) for r in lakehouse.read_delta(spark, root).collect()
    )
    assert rows == [(i * 100, i) for i in range(5)]


def test_update_rewrites_only_touched_files(spark, tmp_path):
    root = str(tmp_path / "touch")
    # two commits -> disjoint file sets; predicate hits only the second
    lakehouse.write_delta(
        spark,
        spark.range(10).select("id", (F.col("id") * 10).alias("v")),
        root, mode="overwrite",
    )
    lakehouse.write_delta(
        spark,
        spark.range(100, 110).select("id", (F.col("id") * 10).alias("v")),
        root, mode="append",
    )
    before, _ = lakehouse._replay_log_adds(root)
    v = lakehouse.update_delta(spark, root, {"v": "0"}, where="id >= 100")
    log = lakehouse._delta_log_dir(root)
    with open(os.path.join(log, f"{v:020d}.json")) as fh:
        actions = [json.loads(l) for l in fh if l.strip()]
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    # only files holding id>=100 rows were rewritten
    assert removed and removed < set(before)
    got = {r.id: r.v for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {**{i: i * 10 for i in range(10)}, **{i: 0 for i in range(100, 110)}}


def test_update_moves_rows_across_partitions(spark, tmp_path):
    root = str(tmp_path / "part")
    lakehouse.write_delta(
        spark,
        spark.range(12).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        root, mode="overwrite", partition_by=["p"],
    )
    lakehouse.update_delta(spark, root, {"p": "9"}, where="id < 3")
    back = lakehouse.read_delta(spark, root)
    assert back.where("p = 9").count() == 3
    assert back.count() == 12
    # the moved rows' files physically live under the new partition dir
    adds, _ = lakehouse._replay_log_adds(root)
    nine = [rel for rel, a in adds.items() if a["partitionValues"].get("p") == "9"]
    assert nine and all("p=9" in rel for rel in nine)


def test_update_emits_cdf_pre_and_post_images(spark, tmp_path):
    root = _mk(spark, tmp_path)
    lakehouse.alter_delta_properties(
        root, {"delta.enableChangeDataFeed": "true"}
    )
    v = lakehouse.update_delta(spark, root, {"v": "v + 5"}, where="id = 7")
    cdf = lakehouse.read_delta_cdf(spark, root, since_version=v - 1)
    rows = sorted(
        (r._change_type, r.id, r.v)
        for r in cdf.where("_commit_version = %d" % v).collect()
    )
    assert rows == [("update_postimage", 7, 75), ("update_preimage", 7, 70)]


def test_update_enforces_check_constraints(spark, tmp_path):
    root = _mk(spark, tmp_path)
    lakehouse.add_delta_constraint(spark, root, "v_nonneg", "v >= 0")
    before = lakehouse.read_delta(spark, root).count()
    with pytest.raises(ValueError, match="v_nonneg"):
        lakehouse.update_delta(spark, root, {"v": "-1"}, where="id = 3")
    assert lakehouse.read_delta(spark, root).count() == before
    assert lakehouse.read_delta(spark, root).where("v < 0").count() == 0


def test_update_no_match_commits_noop(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v = lakehouse.update_delta(spark, root, {"v": "0"}, where="id = 999")
    log = lakehouse._delta_log_dir(root)
    with open(os.path.join(log, f"{v:020d}.json")) as fh:
        actions = [json.loads(l) for l in fh if l.strip()]
    assert not any("add" in a or "remove" in a for a in actions)
    assert lakehouse.read_delta(spark, root).where("v = 0").count() == 1  # id 0


def test_update_refuses_append_only_and_unknown_column(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown columns"):
        lakehouse.update_delta(spark, root, {"zz": "1"})
    lakehouse.alter_delta_properties(root, {"delta.appendOnly": "true"})
    with pytest.raises(ValueError, match="appendOnly"):
        lakehouse.update_delta(spark, root, {"v": "0"})


def test_update_on_renamed_column_mapped_table(spark, tmp_path):
    root = _mk(spark, tmp_path)
    lakehouse.rename_delta_column(spark, root, "v", "w")
    lakehouse.update_delta(spark, root, {"w": "w * 2"}, where="grp = 0")
    got = {r.id: r.w for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {i: i * 10 * (2 if i % 4 == 0 else 1) for i in range(20)}


def test_update_never_resurrects_dv_deleted_rows(spark, tmp_path):
    root = _mk(spark, tmp_path)
    lakehouse.delete_delta(spark, root, "id = 5")
    # update EVERY visible row: all files with live rows are rewritten,
    # scanning through the DV filter — the masked row must not come back
    lakehouse.update_delta(spark, root, {"v": "v + 1"})
    back = lakehouse.read_delta(spark, root)
    assert back.where("id = 5").count() == 0
    assert back.count() == 19
    # every rewritten file carries no deletionVector
    adds, _ = lakehouse._replay_log_adds(root)
    assert not any(a.get("deletionVector") for a in adds.values())
    got = {r.id: r.v for r in back.collect()}
    assert got == {i: i * 10 + 1 for i in range(20) if i != 5}


def test_update_txn_handshake_is_idempotent(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v1 = lakehouse.update_delta(
        spark, root, {"v": "v + 1"}, where="id = 0", txn=("app", 1)
    )
    v2 = lakehouse.update_delta(
        spark, root, {"v": "v + 1"}, where="id = 0", txn=("app", 1)
    )
    assert v2 == v1  # retry skipped
    assert lakehouse.read_delta(spark, root).where("id = 0").collect()[0].v == 1


def test_merge_partial_update_set_clauses(spark, tmp_path):
    """merge_delta(set_clauses=): Delta's whenMatchedUpdate(set=...) —
    matched rows transform column-by-column over the t./s. pair,
    unassigned columns keep the target value, unmatched source rows
    insert whole-row; composes with row tracking (1:1 id preservation),
    identity (SET on it refuses) and CDF."""
    root = str(tmp_path / "pu")
    lakehouse.write_delta(
        spark,
        spark.range(0, 20).select(
            "id", (F.col("id") % 4).alias("v"), F.lit("x").alias("tag")
        ),
        root,
    )
    src = spark.createDataFrame(
        [(1, 100, "s"), (2, 200, "s"), (99, 9, "s")], "id long, v long, tag string"
    )
    lakehouse.merge_delta(
        spark, src, root, keys=["id"], set_clauses={"v": "t.v + s.v"}
    )
    rows = {r.id: (r.v, r.tag) for r in lakehouse.read_delta(spark, root).collect()}
    assert rows[1] == (101, "x")  # v updated, tag KEPT
    assert rows[2] == (202, "x")
    assert rows[99] == (9, "s")  # insert is whole-row
    assert rows[3] == (3, "x") and len(rows) == 21

    # row tracking: each transformed row keeps ITS OWN id (1:1 mapping)
    rt = str(tmp_path / "rt")
    lakehouse.write_delta(
        spark,
        spark.range(0, 20).select("id", (F.col("id") % 4).alias("v")),
        rt,
        row_tracking=True,
    )
    before = {
        r.id: (r.row_id, r.row_commit_version)
        for r in lakehouse.read_delta_row_ids(spark, rt).collect()
    }
    vm = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(3, 7)], "id long, v long"),
        rt,
        keys=["id"],
        set_clauses={"v": "s.v"},
    )
    after = {
        r.id: (r.row_id, r.row_commit_version)
        for r in lakehouse.read_delta_row_ids(spark, rt).collect()
    }
    assert after[3] == (before[3][0], vm)
    assert all(after[k] == before[k] for k in after if k != 3)

    # CDF taxonomy
    cdf = str(tmp_path / "cdf")
    lakehouse.write_delta(
        spark, spark.range(0, 10).select("id", (F.col("id") % 2).alias("v")), cdf
    )
    lakehouse.alter_delta_properties(cdf, {"delta.enableChangeDataFeed": "true"})
    v4 = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(1, 10), (50, 5)], "id long, v long"),
        cdf,
        keys=["id"],
        set_clauses={"v": "t.v + s.v"},
    )
    k = {
        (r.id, r.v, r._change_type)
        for r in lakehouse.read_delta_cdf(spark, cdf, since_version=v4 - 1).collect()
    }
    assert {(1, 1, "update_preimage"), (1, 11, "update_postimage"), (50, 5, "insert")} <= k

    # refusals
    with pytest.raises(ValueError, match="empty"):
        lakehouse.merge_delta(spark, src, root, keys=["id"], set_clauses={})
    with pytest.raises(ValueError, match="unknown"):
        lakehouse.merge_delta(
            spark, src, root, keys=["id"], set_clauses={"zz": "1"}
        )
    with pytest.raises(NotImplementedError, match="newer_wins"):
        lakehouse.merge_delta(
            spark, src, root, keys=["id"],
            set_clauses={"v": "1"}, newer_wins_col="v",
        )


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    """whenNotMatchedBySourceDelete: unmatched target rows satisfying the
    condition are deleted (keyed slice sync); no condition = full sync
    (the table becomes exactly the source). Composes with row tracking,
    CDF, and set_clauses."""
    root = str(tmp_path / "nmbs")
    lakehouse.write_delta(
        spark,
        spark.range(0, 20).select(
            "id", (F.col("id") % 4).alias("grp"), (F.col("id") * 10).alias("v")
        ),
        root,
    )
    src = spark.createDataFrame(
        [(1, 1, -1), (5, 1, -5), (101, 1, -101)], "id long, grp long, v long"
    )
    lakehouse.merge_delta(
        spark, src, root, keys=["id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="grp = 1",
    )
    rows = {r.id: (r.grp, r.v) for r in lakehouse.read_delta(spark, root).collect()}
    assert rows[1] == (1, -1) and rows[101] == (1, -101)
    assert 9 not in rows and 13 not in rows and 17 not in rows
    assert rows[2] == (2, 20) and len(rows) == 18  # other groups untouched

    # full sync: no condition
    full = str(tmp_path / "full")
    lakehouse.write_delta(
        spark, spark.range(0, 10).select("id", (F.col("id") % 2).alias("v")), full
    )
    lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(3, 30), (99, 9)], "id long, v long"),
        full,
        keys=["id"],
        not_matched_by_source="delete",
    )
    assert sorted(
        (r.id, r.v) for r in lakehouse.read_delta(spark, full).collect()
    ) == [(3, 30), (99, 9)]

    # row tracking: survivors keep ids, slice-deleted rows leave holes
    rt = str(tmp_path / "rt")
    lakehouse.write_delta(
        spark,
        spark.range(0, 12).select(
            "id", (F.col("id") % 3).alias("grp"), (F.col("id") * 1.0).alias("v")
        ),
        rt,
        row_tracking=True,
    )
    before = {
        r.id: (r.row_id, r.row_commit_version)
        for r in lakehouse.read_delta_row_ids(spark, rt).collect()
    }
    vm = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(0, 0, 9.0)], "id long, grp long, v double"),
        rt,
        keys=["id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="grp = 0",
    )
    after = {
        r.id: (r.row_id, r.row_commit_version)
        for r in lakehouse.read_delta_row_ids(spark, rt).collect()
    }
    assert after[0] == (before[0][0], vm)
    assert {3, 6, 9}.isdisjoint(after)
    assert all(after[k] == before[k] for k in after if k != 0)

    # CDF: slice-deleted rows appear as 'delete'
    cdf = str(tmp_path / "cdf")
    lakehouse.write_delta(
        spark,
        spark.range(0, 8).select(
            "id", (F.col("id") % 2).alias("grp"), F.lit(1).cast("long").alias("v")
        ),
        cdf,
    )
    lakehouse.alter_delta_properties(cdf, {"delta.enableChangeDataFeed": "true"})
    v4 = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(0, 0, 5)], "id long, grp long, v long"),
        cdf,
        keys=["id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="grp = 0",
    )
    k = {
        (r.id, r._change_type)
        for r in lakehouse.read_delta_cdf(spark, cdf, since_version=v4 - 1).collect()
    }
    assert {(0, "update_preimage"), (0, "update_postimage"),
            (2, "delete"), (4, "delete"), (6, "delete")} <= k
    assert not {(1, "delete"), (3, "delete")} & k

    # refusals
    with pytest.raises(ValueError, match="delete"):
        lakehouse.merge_delta(
            spark, src, root, keys=["id"], not_matched_by_source="update"
        )
    with pytest.raises(ValueError, match="requires"):
        lakehouse.merge_delta(
            spark, src, root, keys=["id"],
            not_matched_by_source_condition="grp = 0",
        )
