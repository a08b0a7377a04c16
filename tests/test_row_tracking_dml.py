"""Row-level DML on ROW-TRACKED and IDENTITY Delta tables.

PROTOCOL.md §Row Tracking preservation: a rewrite MATERIALIZES each
surviving row's (row id, commit version) into the new files under the
configured physical column names — kept rows keep both, changed rows
keep their id and pick up the DML commit's version via the fresh-row
rule (materialized version stays NULL), inserted rows are fresh on
both. PROTOCOL.md §Identity Columns, GENERATED ALWAYS: matched rows
keep the target's generated value, inserted rows generate from the
high water mark, which advances in the same commit.

The reference has no mutation surface at all (its only writer is a CSV
dump, /root/reference/src/main.py:15); this matrix exists for the
100 TB feature-store lifecycle, where stable row ids are what CDC
joins and training-example provenance key on across upserts.
"""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _ids(spark, path):
    return {
        r.id: (r.row_id, r.row_commit_version)
        for r in lakehouse.read_delta_row_ids(spark, path).collect()
    }


def test_merge_update_delete_lifecycle(spark, tmp_path):
    t = str(tmp_path / "rt")
    df = spark.range(0, 100).select("id", (F.col("id") % 5).alias("v"))
    lakehouse.write_delta(spark, df, t, row_tracking=True)
    before = _ids(spark, t)

    # upsert: update id=1, insert id=200
    src = spark.createDataFrame([(1, 99), (200, 7)], "id long, v long")
    v = lakehouse.merge_delta(spark, src, t, keys=["id"])
    after = _ids(spark, t)
    assert len(after) == 101
    assert after[1] == (before[1][0], v)  # id preserved, version moved
    assert after[200][0] >= 100 and after[200][1] == v  # fresh insert
    assert all(after[k] == before[k] for k in after if k not in (1, 200))
    rows = {r.id: r.v for r in lakehouse.read_delta(spark, t).collect()}
    assert rows[1] == 99 and rows[200] == 7

    # keyed delete: survivors untouched, holes left behind
    v2 = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(2,)], "id long"),
        t,
        keys=["id"],
        when_matched="delete",
    )
    post = _ids(spark, t)
    assert 2 not in post and len(post) == 100
    assert all(post[k] == after[k] for k in post)

    # UPDATE ... SET ... WHERE
    v3 = lakehouse.update_delta(spark, t, {"v": "v + 1000"}, "id = 3")
    u = _ids(spark, t)
    assert u[3] == (after[3][0], v3)
    assert u[4] == after[4]

    # replaceWhere: survivors keep ids, replacements are fresh rows
    v4 = lakehouse.overwrite_delta_where(
        spark,
        spark.createDataFrame([(500, 2), (501, 2)], "id long, v long"),
        t,
        "v = 2",
    )
    w = _ids(spark, t)
    assert all(w[k] == u[k] for k in w if k not in (500, 501))
    assert w[500][1] == v4 and w[500][0] > max(r for r, _ in u.values()) - 2

    # compaction after the DML chain re-materializes without renumbering
    lakehouse.compact_delta(spark, t, target_files=2)
    assert _ids(spark, t) == w
    assert v < v2 < v3 < v4


def test_merge_newer_wins_preserves_winner_identity(spark, tmp_path):
    t = str(tmp_path / "nw")
    d = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 100)], "id long, val long, ts long"
    )
    lakehouse.write_delta(spark, d, t, row_tracking=True)
    before = _ids(spark, t)
    src = spark.createDataFrame(
        [(1, 11, 200), (2, 21, 50), (3, 30, 75)], "id long, val long, ts long"
    )
    v = lakehouse.merge_delta(spark, src, t, keys=["id"], newer_wins_col="ts")
    after = _ids(spark, t)
    vals = {r.id: r.val for r in lakehouse.read_delta(spark, t).collect()}
    # source won id=1: row id preserved, version is the merge commit
    assert vals[1] == 11 and after[1] == (before[1][0], v)
    # target won id=2 (older source): id AND version untouched
    assert vals[2] == 20 and after[2] == before[2]
    # unmatched source row inserted fresh
    assert vals[3] == 30 and after[3][1] == v


def test_partitioned_merge_moves_keep_ids(spark, tmp_path):
    t = str(tmp_path / "pm")
    df = spark.range(0, 60).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 10).alias("v")
    )
    lakehouse.write_delta(spark, df, t, partition_by=["p"], row_tracking=True)
    before = _ids(spark, t)
    # row 7 MOVES from p=1 to p=2; row 400 inserts
    src = spark.createDataFrame(
        [(7, 2, 777), (400, 0, 4000)], "id long, p long, v long"
    )
    v = lakehouse.merge_delta(spark, src, t, keys=["id"])
    after = _ids(spark, t)
    assert after[7] == (before[7][0], v)  # id survives the partition move
    assert after[400][1] == v
    assert all(after[k] == before[k] for k in after if k not in (7, 400))
    rows = {r.id: (r.p, r.v) for r in lakehouse.read_delta(spark, t).collect()}
    assert rows[7] == (2, 777)


def test_dml_with_change_feed(spark, tmp_path):
    t = str(tmp_path / "cdf")
    lakehouse.write_delta(
        spark,
        spark.range(0, 20).select("id", (F.col("id") % 4).alias("v")),
        t,
        row_tracking=True,
    )
    lakehouse.alter_delta_properties(t, {"delta.enableChangeDataFeed": "true"})
    before = _ids(spark, t)
    v = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(5, 50), (99, 9)], "id long, v long"),
        t,
        keys=["id"],
    )
    assert _ids(spark, t)[5] == (before[5][0], v)
    kinds = {
        (r.id, r._change_type)
        for r in lakehouse.read_delta_cdf(spark, t, since_version=v - 1).collect()
    }
    assert {(5, "update_preimage"), (5, "update_postimage"), (99, "insert")} <= kinds
    v2 = lakehouse.overwrite_delta_where(
        spark, spark.createDataFrame([(300, 2)], "id long, v long"), t, "v = 2"
    )
    a2 = _ids(spark, t)
    assert a2[300][1] == v2 and a2[5] == (before[5][0], v)


def test_feature_only_obligation_on_dml(spark, tmp_path):
    # protocol FEATURE present, enablement flag off: rewritten adds must
    # still carry baseRowId (allocation obligation), while preservation
    # does not apply yet
    t = str(tmp_path / "fo")
    lakehouse.write_delta(
        spark,
        spark.range(0, 10).select("id", F.lit(1).cast("long").alias("v")),
        t,
    )
    lakehouse._commit(
        t,
        [
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": [
                        "rowTracking",
                        "domainMetadata",
                        "appendOnly",
                        "invariants",
                    ],
                }
            },
            {
                "commitInfo": {
                    "timestamp": 0,
                    "operation": "UPGRADE",
                    "operationParameters": {},
                }
            },
        ],
    )
    v = lakehouse.merge_delta(
        spark, spark.createDataFrame([(1, 9)], "id long, v long"), t, keys=["id"]
    )
    adds_map, _ = lakehouse._replay_log_adds(t)
    new_adds = [
        a for a in adds_map.values() if a.get("defaultRowCommitVersion") == v
    ]
    assert new_adds and all(a.get("baseRowId") is not None for a in new_adds)


def test_merge_compact_merge_recursion(spark, tmp_path):
    t = str(tmp_path / "rec")
    lakehouse.write_delta(
        spark,
        spark.range(0, 30).select("id", (F.col("id") % 2).alias("v")),
        t,
        row_tracking=True,
    )
    before = _ids(spark, t)
    lakehouse.merge_delta(
        spark, spark.createDataFrame([(3, 33)], "id long, v long"), t, keys=["id"]
    )
    lakehouse.compact_delta(spark, t, target_files=1)
    lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(4, 44), (77, 7)], "id long, v long"),
        t,
        keys=["id"],
    )
    final = _ids(spark, t)
    assert final[3][0] == before[3][0] and final[4][0] == before[4][0]
    assert 77 in final
    assert len({r for r, _ in final.values()}) == len(final)


def test_merge_never_resurrects_dv_masked_rows(spark, tmp_path):
    t = str(tmp_path / "dv")
    lakehouse.write_delta(
        spark,
        spark.range(0, 40).select("id", (F.col("id") % 4).alias("v")),
        t,
        row_tracking=True,
    )
    lakehouse.delete_delta(spark, t, "v = 0")
    before = _ids(spark, t)
    lakehouse.merge_delta(
        spark, spark.createDataFrame([(1, 11)], "id long, v long"), t, keys=["id"]
    )
    after = _ids(spark, t)
    assert len(after) == 30 and 0 not in after
    assert after[1][0] == before[1][0]


# ---------------------------------------------------------------- identity


def test_identity_merge_upsert(spark, tmp_path):
    t = str(tmp_path / "id")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    lakehouse.write_delta(spark, df, t, identity_columns={"rid": (1, 1)})
    base = {r.k: (r.rid, r.x) for r in lakehouse.read_delta(spark, t).collect()}
    hwm0 = max(v[0] for v in base.values())

    src = spark.createDataFrame([(3, 999), (100, 5)], "k long, x long")
    lakehouse.merge_delta(spark, src, t, keys=["k"])
    now = {r.k: (r.rid, r.x) for r in lakehouse.read_delta(spark, t).collect()}
    assert now[3] == (base[3][0], 999)  # matched keeps its identity
    assert now[100][0] > hwm0 and now[100][1] == 5  # insert generated
    assert all(now[k] == base[k] for k in base if k != 3)
    # HWM advanced in the same commit; the next append continues above it
    _, meta = lakehouse._replay_log_adds(t)
    hwm1 = lakehouse._identity_specs(meta)["rid"][2]
    assert hwm1 >= now[100][0]
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(200, 1)], "k long, x long"),
        t,
        mode="append",
    )
    rids = [r.rid for r in lakehouse.read_delta(spark, t).collect()]
    assert len(set(rids)) == len(rids)


def test_identity_merge_newer_wins_and_delete(spark, tmp_path):
    t = str(tmp_path / "nw")
    d = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 100)], "k long, val long, ts long"
    )
    lakehouse.write_delta(spark, d, t, identity_columns={"rid": (0, 2)})
    base = {r.k: r.rid for r in lakehouse.read_delta(spark, t).collect()}
    src = spark.createDataFrame(
        [(1, 11, 200), (2, 21, 50), (3, 30, 75)], "k long, val long, ts long"
    )
    lakehouse.merge_delta(spark, src, t, keys=["k"], newer_wins_col="ts")
    now = {r.k: (r.rid, r.val) for r in lakehouse.read_delta(spark, t).collect()}
    assert now[1] == (base[1], 11)  # source won, identity preserved
    assert now[2] == (base[2], 20)  # target won
    assert now[3][1] == 30 and now[3][0] % 2 == 0  # generated, step-aligned
    assert now[3][0] not in (base[1], base[2])
    lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(1,)], "k long"),
        t,
        keys=["k"],
        when_matched="delete",
    )
    left = {r.k: r.rid for r in lakehouse.read_delta(spark, t).collect()}
    assert 1 not in left and left[2] == base[2]


def test_identity_update_and_replace_where(spark, tmp_path):
    t = str(tmp_path / "upd")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    lakehouse.write_delta(spark, df, t, identity_columns={"rid": (1, 1)})
    base = {r.k: (r.rid, r.x) for r in lakehouse.read_delta(spark, t).collect()}
    # SET on a non-identity column preserves the generated values
    lakehouse.update_delta(spark, t, {"x": "x + 1"}, "k = 5")
    u = {r.k: (r.rid, r.x) for r in lakehouse.read_delta(spark, t).collect()}
    assert u[5] == (base[5][0], base[5][1] + 1)
    assert all(u[k] == base[k] for k in base if k != 5)
    # replaceWhere: survivors keep values, incoming rows generate
    lakehouse.overwrite_delta_where(
        spark,
        spark.createDataFrame([(300, 42), (301, 42)], "k long, x long"),
        t,
        "x = 42",
    )
    w = {r.k: (r.rid, r.x) for r in lakehouse.read_delta(spark, t).collect()}
    rids = [r for r, _ in w.values()]
    assert len(set(rids)) == len(rids)
    assert w[5] == u[5]
    _, meta = lakehouse._replay_log_adds(t)
    assert lakehouse._identity_specs(meta)["rid"][2] >= max(rids)


def test_identity_cdf_values_match_table(spark, tmp_path):
    # the generated values are pinned (localCheckpoint) so the CDF insert
    # rows record EXACTLY the values the table carries — a recomputation
    # of monotonically_increasing_id would silently diverge
    t = str(tmp_path / "cdfid")
    lakehouse.write_delta(
        spark,
        spark.range(0, 8).select(F.col("id").alias("k"), F.lit(0).cast("long").alias("x")),
        t,
        identity_columns={"rid": (1, 1)},
    )
    lakehouse.alter_delta_properties(t, {"delta.enableChangeDataFeed": "true"})
    v = lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(50, 5), (51, 5)], "k long, x long"),
        t,
        keys=["k"],
    )
    table = {r.k: r.rid for r in lakehouse.read_delta(spark, t).collect()}
    cdf = {
        r.k: r.rid
        for r in lakehouse.read_delta_cdf(spark, t, since_version=v - 1)
        .where(F.col("_change_type") == "insert")
        .collect()
    }
    assert cdf == {50: table[50], 51: table[51]}
