"""Lakehouse read paths (Delta log replay fallback, ORC, JDBC) and the
Kafka source wiring. The delta-spark and kafka jars are absent from this
container, so these tests exercise exactly the degraded paths production
code hits when a jar is missing — plus the pure parse/replay logic that is
jar-independent."""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse, sources
from feature_store_ml_spark.streaming import kafka


# ---------------------------------------------------------------- delta ----


def _write_commit(log_dir, version, actions):
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _make_delta_table(spark, root, n_files=3, remove_file=None):
    """Hand-build a Delta table per the open protocol spec: parquet data
    files + JSON commits with add/remove actions."""
    os.makedirs(root, exist_ok=True)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    paths = []
    for i in range(n_files):
        name = f"part-{i:05d}.parquet"
        spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).toPandas().to_parquet(os.path.join(root, name))
        paths.append(name)
    _write_commit(
        log,
        0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}]
        + [{"add": {"path": p, "dataChange": True}} for p in paths[:2]],
    )
    actions = [{"add": {"path": p, "dataChange": True}} for p in paths[2:]]
    if remove_file is not None:
        actions.append({"remove": {"path": paths[remove_file], "dataChange": True}})
    _write_commit(log, 1, actions)
    return root


def test_delta_fallback_reads_active_snapshot(spark, tmp_path):
    root = _make_delta_table(spark, str(tmp_path / "t"), n_files=3)
    df = lakehouse.read_delta(spark, root)
    assert sorted(r.id for r in df.collect()) == list(range(30))


def test_delta_fallback_honors_remove_actions(spark, tmp_path):
    # file 0 (ids 0..9) is removed in commit 1 — must not appear
    root = _make_delta_table(spark, str(tmp_path / "t"), n_files=3, remove_file=0)
    df = lakehouse.read_delta(spark, root)
    assert sorted(r.id for r in df.collect()) == list(range(10, 30))


def test_delta_fallback_is_a_real_parquet_scan(spark, tmp_path):
    # pushdown/pruning still reach the scan through the fallback
    root = _make_delta_table(spark, str(tmp_path / "t"))
    plan = (
        lakehouse.read_delta(spark, root)
        .where(F.col("id") > 20)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,20)]" in plan


def test_non_delta_dir_rejected(spark, tmp_path):
    os.makedirs(tmp_path / "plain", exist_ok=True)
    with pytest.raises(ValueError, match="not a Delta table"):
        lakehouse.read_delta(spark, str(tmp_path / "plain"))


def test_checkpointed_table_reads_snapshot_plus_tail(spark, tmp_path):
    """Checkpoint parquet (reconciled state) + post-checkpoint JSON commits
    must merge into one snapshot: files added in the checkpoint survive
    unless a later commit removes them, and later adds appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ck")
    os.makedirs(root)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    names = []
    for i in range(3):
        name = f"part-{i:05d}.parquet"
        spark.range(i * 10, (i + 1) * 10).select(F.col("id")).toPandas().to_parquet(
            os.path.join(root, name)
        )
        names.append(name)
    # checkpoint at version 1: protocol + metaData + adds of files 0,1.
    # NB every row carries every action column (pyarrow's from_pylist
    # derives the schema from the first row) — which also matches real
    # checkpoints, where absent actions are null struct cells.
    def _row(**kv):
        base = {"protocol": None, "metaData": None, "add": None, "remove": None}
        base.update(kv)
        return base

    rows = [
        _row(protocol={"minReaderVersion": 1, "minWriterVersion": 2}),
        _row(
            metaData={
                "id": "ck-table",
                "schemaString": json.dumps(
                    {"type": "struct", "fields": [
                        {"name": "id", "type": "long", "nullable": True, "metadata": {}}
                    ]}
                ),
                "partitionColumns": [],
            }
        ),
        _row(add={"path": names[0], "dataChange": True}),
        _row(add={"path": names[1], "dataChange": True}),
    ]
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(log, f"{1:020d}.checkpoint.parquet"),
    )
    # version 2 (after checkpoint): remove file 0, add file 2
    _write_commit(
        log,
        2,
        [
            {"remove": {"path": names[0], "dataChange": True}},
            {"add": {"path": names[2], "dataChange": True}},
        ],
    )
    df = lakehouse.read_delta(spark, root)
    assert sorted(r.id for r in df.collect()) == list(range(10, 30))


def test_checkpoint_unsupported_reader_version_fails_loud(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ck3")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    pq.write_table(
        pa.Table.from_pylist([{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}]),
        os.path.join(log, f"{0:020d}.checkpoint.parquet"),
    )
    with pytest.raises(NotImplementedError, match="minReaderVersion"):
        lakehouse.read_delta(spark, root)


def test_unsupported_reader_version_fails_loud(spark, tmp_path):
    root = str(tmp_path / "t")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    _write_commit(log, 0, [{"protocol": {"minReaderVersion": 3}}])
    with pytest.raises(NotImplementedError, match="minReaderVersion"):
        lakehouse.read_delta(spark, root)


def _make_partitioned_delta_table(spark, root, hive_layout=True):
    """Partitioned Delta table per the protocol: partition values live in
    the directory names (Hive layout) and add.partitionValues — NOT in the
    parquet files themselves."""
    os.makedirs(root, exist_ok=True)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            {"name": "day", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
    adds = []
    for day in (1, 2):
        rel_dir = f"day={day}" if hive_layout else f"d{day}"
        os.makedirs(os.path.join(root, rel_dir), exist_ok=True)
        rel = f"{rel_dir}/part-00000.parquet"
        spark.range(day * 10, day * 10 + 5).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).toPandas().to_parquet(os.path.join(root, rel))
        adds.append(
            {"add": {"path": rel, "partitionValues": {"day": str(day)}, "dataChange": True}}
        )
    _write_commit(
        log,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "test-table",
                    "schemaString": json.dumps(schema),
                    "partitionColumns": ["day"],
                    "format": {"provider": "parquet", "options": {}},
                }
            },
        ]
        + adds,
    )
    return root


def test_partitioned_delta_reconstructs_partition_column(spark, tmp_path):
    """Round-3 ADVICE finding: the fallback used to silently DROP partition
    columns (they live in paths, not files) — wrong schema, no error. A
    Hive-layout table must come back with the partition column, correctly
    typed per the declared schema, in declared column order."""
    root = _make_partitioned_delta_table(spark, str(tmp_path / "p"))
    df = lakehouse.read_delta(spark, root)
    assert df.columns == ["id", "v", "day"]
    assert df.schema["day"].dataType.typeName() == "integer"
    got = {(r.id, r.day) for r in df.collect()}
    assert got == {(i, 1) for i in range(10, 15)} | {(i, 2) for i in range(20, 25)}


def test_partitioned_delta_non_hive_layout_reads(spark, tmp_path):
    """Formerly a fail-loud gap: partitionValues on the add actions are
    the protocol's source of truth, so a non-Hive layout (arbitrary dir
    names) must read identically to the Hive one."""
    root = _make_partitioned_delta_table(
        spark, str(tmp_path / "nh"), hive_layout=False
    )
    df = lakehouse.read_delta(spark, root)
    assert df.columns == ["id", "v", "day"]
    assert df.schema["day"].dataType.typeName() == "integer"
    got = {(r.id, r.day) for r in df.collect()}
    assert got == {(i, 1) for i in range(10, 15)} | {(i, 2) for i in range(20, 25)}


def test_read_table_auto_sniffs_format(spark, tmp_path, sf_dir):
    delta_root = _make_delta_table(spark, str(tmp_path / "d"))
    assert lakehouse.read_table_auto(spark, delta_root).count() == 30
    plain = lakehouse.read_table_auto(spark, f"{sf_dir}/part.parquet")
    assert "p_partkey" in plain.columns


def test_delta_write_create_and_append(spark, tmp_path):
    root = str(tmp_path / "w")
    v0 = lakehouse.write_delta(
        spark, spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v")), root
    )
    assert v0 == 0
    v1 = lakehouse.write_delta(
        spark,
        spark.range(10, 20).select(F.col("id"), (F.col("id") * 2).alias("v")),
        root,
        mode="append",
    )
    assert v1 == 1
    back = lakehouse.read_delta(spark, root)
    assert sorted(r.id for r in back.collect()) == list(range(20))


def test_delta_write_overwrite_retires_old_files(spark, tmp_path):
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(10).select("id"), root)
    lakehouse.write_delta(
        spark, spark.range(100, 105).select("id"), root, mode="overwrite"
    )
    back = lakehouse.read_delta(spark, root)
    assert sorted(r.id for r in back.collect()) == list(range(100, 105))
    # the retired files stay on disk (vacuum's job) but are log-dead
    files, _ = lakehouse._replay_log(root)
    assert all("part-" in f for f in files)


def test_delta_write_commit_is_protocol_shaped(spark, tmp_path):
    """The commit log we emit must carry protocol/metaData/add actions in
    the open-spec shape (so a real delta reader can consume the table)."""
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert "add" in kinds and "commitInfo" in kinds
    meta = actions[1]["metaData"]
    assert meta["partitionColumns"] == []
    assert json.loads(meta["schemaString"])["fields"][0]["name"] == "id"
    add = next(a for a in actions if "add" in a)["add"]
    assert add["size"] > 0 and add["partitionValues"] == {}


def test_delta_append_retries_through_data_conflicts(spark, tmp_path):
    """Optimistic concurrency, Delta's rule: append-vs-append never
    conflicts — a blind append that loses the version race claims the
    next version and lands; a concurrent METADATA change instead fails
    loudly (the append's schema validation is stale)."""
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    # simulate a concurrent committer grabbing version 1 with a DATA commit
    _write_commit(os.path.join(root, "_delta_log"), 1, [{"commitInfo": {}}])
    import unittest.mock as mock

    real_next = lakehouse._next_version
    with mock.patch.object(lakehouse, "_next_version", side_effect=[1, real_next(os.path.join(root, "_delta_log"))]):
        v = lakehouse.write_delta(
            spark, spark.range(5, 8).select("id"), root, mode="append"
        )
    assert v == 2  # retried past the stolen version
    assert lakehouse.read_delta(spark, root).count() == 8
    # concurrent METADATA commit: the retry must refuse
    _write_commit(
        os.path.join(root, "_delta_log"), 3,
        [{"metaData": {"id": "x", "schemaString": "{}",
                       "format": {"provider": "parquet", "options": {}},
                       "partitionColumns": [], "configuration": {}}}],
    )
    log = os.path.join(root, "_delta_log")
    with mock.patch.object(lakehouse, "_next_version", side_effect=[3, 4]):
        with pytest.raises(RuntimeError, match="metadata/protocol"):
            lakehouse._commit_append_with_retry(root, [{"commitInfo": {}}])


def test_delta_txn_makes_writes_idempotent(spark, tmp_path):
    """The protocol txn handshake: re-writing the same (appId, version)
    must be a no-op — the exactly-once guarantee a streaming foreachBatch
    sink depends on when a micro-batch is replayed after a crash."""
    root = str(tmp_path / "w")
    df = spark.range(10).select("id")
    v0 = lakehouse.write_delta(spark, df, root, txn=("appA", 0))
    assert lakehouse.read_delta(spark, root).count() == 10
    # replay of batch 0 (same app, same version): skipped
    v_again = lakehouse.write_delta(spark, df, root, txn=("appA", 0))
    assert v_again == v0
    assert lakehouse.read_delta(spark, root).count() == 10
    # batch 1 goes through; another app's version counter is independent
    lakehouse.write_delta(spark, df, root, txn=("appA", 1))
    lakehouse.write_delta(spark, df, root, txn=("appB", 0))
    assert lakehouse.read_delta(spark, root).count() == 30
    assert lakehouse.last_txn_version(root, "appA") == 1
    assert lakehouse.last_txn_version(root, "appB") == 0


def _read_commit(root, version):
    with open(os.path.join(root, "_delta_log", f"{version:020d}.json")) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    """whenMatchedUpdateAll + whenNotMatchedInsertAll: matched keys get the
    source row, unmatched source keys are inserted, untouched target rows
    survive — one row per key afterwards."""
    root = str(tmp_path / "m")
    base = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    lakehouse.write_delta(spark, base, root)
    src = spark.range(5, 15).select(F.col("id"), F.lit(-1).cast("bigint").alias("v"))
    v = lakehouse.merge_delta(spark, src, root, keys=["id"])
    got = {r.id: r.v for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {**{i: i * 2 for i in range(5)}, **{i: -1 for i in range(5, 15)}}
    ops = [a["commitInfo"]["operation"] for a in _read_commit(root, v) if "commitInfo" in a]
    assert ops == ["MERGE"]


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write at FILE granularity: a merge whose keys live in one
    data file removes/rewrites that file only — the other files keep their
    identity (the property that makes a 1%-of-keys upsert rewrite 1% of a
    100 TB table, not all of it)."""
    root = str(tmp_path / "m")
    a = spark.range(0, 10).select(F.col("id"), F.col("id").alias("v")).coalesce(1)
    b = spark.range(10, 20).select(F.col("id"), F.col("id").alias("v")).coalesce(1)
    lakehouse.write_delta(spark, a, root)
    files_after_a = set(lakehouse._active_files(root))
    lakehouse.write_delta(spark, b, root, mode="append")
    files_b = set(lakehouse._active_files(root)) - files_after_a
    assert len(files_after_a) == 1 and len(files_b) == 1
    src = spark.createDataFrame([(15, -1)], "id long, v long")
    v = lakehouse.merge_delta(spark, src, root, keys=["id"])
    removed = {
        a["remove"]["path"] for a in _read_commit(root, v) if "remove" in a
    }
    assert removed == {os.path.relpath(f, root) for f in files_b}
    assert files_after_a <= set(lakehouse._active_files(root))  # untouched
    got = {r.id: r.v for r in lakehouse.read_delta(spark, root).collect()}
    assert got[15] == -1 and got[14] == 14 and len(got) == 20


def test_merge_delete_by_key(spark, tmp_path):
    root = str(tmp_path / "m")
    base = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    lakehouse.write_delta(spark, base, root)
    doomed = spark.createDataFrame([(3,), (7,), (99,)], "id long")
    lakehouse.merge_delta(spark, doomed, root, keys=["id"], when_matched="delete")
    assert sorted(r.id for r in lakehouse.read_delta(spark, root).collect()) == [
        0, 1, 2, 4, 5, 6, 8, 9,
    ]


def test_merge_duplicate_source_keys_fail_loud(spark, tmp_path):
    """Two source rows matching one target row = order-dependent result;
    same cardinality error real Delta MERGE raises."""
    root = str(tmp_path / "m")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    dup = spark.createDataFrame([(1,), (1,)], "id long")
    with pytest.raises(ValueError, match="multiple rows per key"):
        lakehouse.merge_delta(spark, dup, root, keys=["id"])


def test_merge_txn_idempotent_retry(spark, tmp_path):
    """A retried merge with an already-committed (appId, version) is a
    no-op — the exactly-once handshake shared with write_delta."""
    root = str(tmp_path / "m")
    lakehouse.write_delta(spark, spark.range(10).select(
        F.col("id"), F.lit(0).cast("bigint").alias("v")), root)
    src = spark.createDataFrame([(1, 100)], "id long, v long")
    v1 = lakehouse.merge_delta(spark, src, root, keys=["id"], txn=("up", 1))
    again = lakehouse.merge_delta(
        spark, spark.createDataFrame([(1, 999)], "id long, v long"),
        root, keys=["id"], txn=("up", 1),
    )
    assert again == v1
    got = {r.id: r.v for r in lakehouse.read_delta(spark, root).collect()}
    assert got[1] == 100  # the replayed merge did NOT re-apply
    assert lakehouse.last_txn_version(root, "up") == 1


def test_merge_concurrent_writer_conflict(spark, tmp_path):
    root = str(tmp_path / "m")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    _write_commit(os.path.join(root, "_delta_log"), 1, [{"commitInfo": {}}])
    import unittest.mock as mock

    with mock.patch.object(lakehouse, "_next_version", return_value=1):
        with pytest.raises(RuntimeError, match="committed concurrently"):
            lakehouse.merge_delta(
                spark, spark.createDataFrame([(1,)], "id long"), root, keys=["id"]
            )


def test_merge_schema_mismatch_fails_loud(spark, tmp_path):
    root = str(tmp_path / "m")
    lakehouse.write_delta(
        spark, spark.range(5).select(F.col("id"), F.lit(0.0).alias("v")), root
    )
    drifted = spark.createDataFrame([(1, "oops")], "id long, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        lakehouse.merge_delta(spark, drifted, root, keys=["id"])


def test_merge_delete_nothing_matched_records_txn(spark, tmp_path):
    root = str(tmp_path / "m")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    miss = spark.createDataFrame([(99,)], "id long")
    lakehouse.merge_delta(
        spark, miss, root, keys=["id"], when_matched="delete", txn=("gc", 3)
    )
    assert lakehouse.read_delta(spark, root).count() == 5
    assert lakehouse.last_txn_version(root, "gc") == 3


def test_merge_into_missing_table_creates_on_update_only(spark, tmp_path):
    root = str(tmp_path / "new")
    src = spark.range(3).select(F.col("id"))
    lakehouse.merge_delta(spark, src, root, keys=["id"])  # create
    assert lakehouse.read_delta(spark, root).count() == 3
    with pytest.raises(ValueError, match="non-existent"):
        lakehouse.merge_delta(
            spark, src, str(tmp_path / "absent"), keys=["id"], when_matched="delete"
        )


def test_read_delta_changes_cleaned_history_fails_loud(spark, tmp_path):
    """Commits missing from the JSON log (checkpointed then cleaned) must
    raise, not silently skip their rows."""
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    lakehouse.write_delta(spark, spark.range(5).select("id"), root, mode="append")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root, mode="append")
    os.remove(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="not in the JSON log"):
        lakehouse.read_delta_changes(spark, root, since_version=0)


def test_stream_to_delta_exactly_once(spark, tmp_path, sf_dir):
    """End-to-end: a real Structured Streaming replay materializes into a
    Delta table through the txn-guarded foreachBatch sink; re-running the
    same stream with the SAME checkpoint adds nothing, and a simulated
    batch replay (same batch id) adds nothing."""
    from feature_store_ml_spark.streaming import events as ev

    table = str(tmp_path / "delta_out")
    ckpt = str(tmp_path / "ckpt")
    stream = ev._streaming_events(spark, sf_dir).select("event_id", "user_id", "value")
    batches = ev.stream_to_delta(spark, stream, table, app_id="e2e", checkpoint_dir=ckpt)
    assert batches
    n = lakehouse.read_delta(spark, table).count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # same checkpoint -> source has no new data -> no new batches, no rows
    stream2 = ev._streaming_events(spark, sf_dir).select("event_id", "user_id", "value")
    ev.stream_to_delta(spark, stream2, table, app_id="e2e", checkpoint_dir=ckpt)
    assert lakehouse.read_delta(spark, table).count() == n
    # simulated replay of an already-committed batch id: txn skips it
    some = spark.range(5).select(
        F.col("id").alias("event_id"), F.col("id").alias("user_id"),
        F.col("id").cast("double").alias("value"),
    )
    lakehouse.write_delta(spark, some, table, txn=("e2e", max(batches)))
    assert lakehouse.read_delta(spark, table).count() == n


def test_delta_compact_and_vacuum(spark, tmp_path):
    """Streaming-shaped table (one file per batch) -> OPTIMIZE-style
    compaction (rows identical, fewer files, dataChange:false commit) ->
    vacuum removes the dead bytes and the table still reads clean."""
    root = str(tmp_path / "w")
    for batch in range(5):
        lakehouse.write_delta(
            spark,
            spark.range(batch * 10, batch * 10 + 10).select("id").coalesce(1),
            root,
            txn=("ingest", batch),
        )
    files_before, _ = lakehouse._replay_log(root)
    assert len(files_before) == 5
    v = lakehouse.compact_delta(spark, root, target_files=1)
    files_after, _ = lakehouse._replay_log(root)
    assert len(files_after) == 1
    assert sorted(r.id for r in lakehouse.read_delta(spark, root).collect()) == list(range(50))
    # the compaction commit must be dataChange:false throughout
    with open(os.path.join(root, "_delta_log", f"{v:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" in a or "remove" in a:
                assert (a.get("add") or a.get("remove"))["dataChange"] is False
    # txn history survives compaction (exactly-once bookkeeping intact)
    assert lakehouse.last_txn_version(root, "ingest") == 4
    # vacuum: 5 dead files deleted, live file kept, reads still green
    dead = lakehouse.vacuum_delta(root)
    assert len(dead) == 5
    assert sorted(r.id for r in lakehouse.read_delta(spark, root).collect()) == list(range(50))


def test_delta_incremental_changes(spark, tmp_path):
    """Checkpointed incremental consumption: each run reads only commits
    after the version it last processed; compactions are invisible;
    history rewrites fail loudly."""
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(10).select("id"), root)          # v0
    lakehouse.write_delta(spark, spark.range(10, 20).select("id"), root)      # v1
    v2 = lakehouse.write_delta(spark, spark.range(20, 25).select("id"), root) # v2
    inc = lakehouse.read_delta_changes(spark, root, since_version=0)
    assert sorted(r.id for r in inc.collect()) == list(range(10, 25))
    # nothing new after v2 -> empty frame, correct schema
    empty = lakehouse.read_delta_changes(spark, root, since_version=v2)
    assert empty.count() == 0 and empty.columns == ["id"]
    # compaction commits are dataChange:false -> invisible to incremental
    lakehouse.compact_delta(spark, root)
    assert lakehouse.read_delta_changes(spark, root, since_version=v2).count() == 0
    # an overwrite breaks append-only history -> fail loud
    lakehouse.write_delta(spark, spark.range(3).select("id"), root, mode="overwrite")
    with pytest.raises(ValueError, match="append-only"):
        lakehouse.read_delta_changes(spark, root, since_version=0)


def test_delta_time_travel(spark, tmp_path):
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(10).select("id"), root)           # v0
    lakehouse.write_delta(spark, spark.range(10, 20).select("id"), root)       # v1
    lakehouse.write_delta(spark, spark.range(99, 101).select("id"), root,
                          mode="overwrite")                                    # v2
    assert sorted(r.id for r in lakehouse.read_delta(spark, root, version=0).collect()) == list(range(10))
    assert sorted(r.id for r in lakehouse.read_delta(spark, root, version=1).collect()) == list(range(20))
    assert sorted(r.id for r in lakehouse.read_delta(spark, root).collect()) == [99, 100]
    with pytest.raises(ValueError, match="version 9 not in the log"):
        lakehouse.read_delta(spark, root, version=9)
    # vacuum kills the history -> time travel to v1 must fail loudly
    lakehouse.vacuum_delta(root)
    with pytest.raises(ValueError, match="vacuumed"):
        lakehouse.read_delta(spark, root, version=1).collect()


def test_delta_append_schema_mismatch_fails_loud(spark, tmp_path):
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    drifted = spark.range(5).select(F.col("id"), F.lit("x").alias("extra"))
    with pytest.raises(ValueError, match="append schema mismatch"):
        lakehouse.write_delta(spark, drifted, root, mode="append")
    # overwrite MAY change the schema — and must rewrite metaData to match
    lakehouse.write_delta(spark, drifted, root, mode="overwrite")
    _, meta = lakehouse._replay_log(root)
    names = [f["name"] for f in json.loads(meta["schemaString"])["fields"]]
    assert names == ["id", "extra"]
    assert lakehouse.read_delta(spark, root).columns == ["id", "extra"]


def test_delta_vacuum_dry_run_keeps_files(spark, tmp_path):
    root = str(tmp_path / "w")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    lakehouse.write_delta(spark, spark.range(5).select("id"), root, mode="overwrite")
    would = lakehouse.vacuum_delta(root, dry_run=True)
    assert would
    for name in would:
        assert os.path.exists(os.path.join(root, name))


def test_delta_append_must_repeat_declared_partitioning(spark, tmp_path):
    """Appending to a partitioned table without repeating its declared
    partitioning (or with a different one) must fail — a flat append into
    a Hive-layout table would silently break partition pruning."""
    root = _make_partitioned_delta_table(spark, str(tmp_path / "p"))
    with pytest.raises(ValueError, match="partitionColumns"):
        lakehouse.write_delta(spark, spark.range(5).select("id"), root, mode="append")


# ------------------------------------------------------------------ orc ----


def test_orc_roundtrip(spark, tmp_path):
    df = spark.range(50).select(F.col("id"), (F.col("id") % 7).alias("m"))
    df.write.mode("overwrite").orc(str(tmp_path / "o"))
    back = sources.read_orc(spark, str(tmp_path / "o"))
    assert sorted(r.id for r in back.collect()) == list(range(50))
    plan = (
        back.where(F.col("m") == 3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan  # ORC pushdown works like parquet


# ----------------------------------------------------------------- jdbc ----


def test_jdbc_fails_at_connect_not_import(spark):
    # no driver jar in the image: the reader must build fine and fail with
    # the driver-missing error only when the connection is attempted
    with pytest.raises(Exception, match="(?i)driver|class"):
        sources.read_jdbc(
            spark,
            "jdbc:postgresql://localhost:5432/nope",
            "some_table",
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
        ).count()


# ---------------------------------------------------------------- kafka ----


def test_kafka_jar_absent_raises_informative(spark):
    assert not kafka.kafka_available(spark)
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka.read_kafka_events(spark, "localhost:9092", "events")


def test_parse_event_json_batch_twin(spark):
    msgs = [
        json.dumps(
            {"event_id": i, "ts_us": 1_700_000_000_000_000 + i * 1_000_000,
             "user_id": i % 3, "event_type": "click", "value": float(i), "props": "{}"}
        )
        for i in range(5)
    ]
    raw = spark.createDataFrame(
        [(m.encode("utf-8"),) for m in msgs] + [(b"not json",), (b"{}",)],
        "value binary",
    )
    out = kafka.parse_event_json(raw)
    rows = sorted(out.collect(), key=lambda r: r.event_id)
    # malformed + null-id messages dropped, not fatal
    assert [r.event_id for r in rows] == list(range(5))
    assert rows[0].ts.year == 2023
    assert out.schema["ts"].dataType.typeName() == "timestamp"


def test_parsed_kafka_frame_feeds_windowed_agg(spark):
    """Parity-by-construction check: the parse stage's output schema plugs
    straight into the shared windowed-aggregate expressions."""
    from feature_store_ml_spark.streaming import events as ev

    raw = spark.createDataFrame(
        [
            (
                json.dumps(
                    {"event_id": i, "ts_us": 1_700_000_000_000_000 + i * 60_000_000,
                     "user_id": 1, "event_type": "click" if i % 2 else "view",
                     "value": 1.0, "props": "{}"}
                ).encode(),
            )
            for i in range(120)
        ],
        "value binary",
    )
    out = ev.windowed_counts(kafka.parse_event_json(raw), "1 hour")
    total = out.agg(F.sum("n_events").alias("n")).first().n
    assert total == 120


# ---------------------------------------------------- partitioned writes ----


def test_delta_partitioned_write_read_roundtrip(spark, tmp_path):
    """Hive-layout partitioned write: files land under col=value dirs, add
    actions carry partitionValues, and the fallback reader reconstructs the
    partition column with its declared type and position."""
    root = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(20)], "id long, grp string, v double"
    )
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    back = lakehouse.read_delta(spark, root)
    assert back.columns == ["id", "grp", "v"]
    assert {(r.id, r.grp) for r in back.collect()} == {
        (i, "ab"[i % 2]) for i in range(20)
    }
    adds = [a["add"] for a in _read_commit(root, 0) if "add" in a]
    assert adds and all(a["path"].startswith("grp=") for a in adds)
    assert {a["partitionValues"]["grp"] for a in adds} == {"a", "b"}


def test_delta_partitioned_append_enforces_partitioning(spark, tmp_path):
    root = str(tmp_path / "p")
    df = spark.createDataFrame([(1, "a")], "id long, grp string")
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    lakehouse.write_delta(
        spark, spark.createDataFrame([(2, "b")], "id long, grp string"),
        root, mode="append", partition_by=["grp"],
    )
    assert lakehouse.read_delta(spark, root).count() == 2
    with pytest.raises(ValueError, match="partitionColumns"):
        lakehouse.write_delta(
            spark, spark.createDataFrame([(3, "c")], "id long, grp string"),
            root, mode="append",
        )


def test_delta_partitioned_scan_prunes_partitions(spark, tmp_path):
    """The point of partitioning: a filter on the partition column must
    reach the scan as a PartitionFilter (directory pruning), not a row
    filter over all bytes."""
    root = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(i, "abc"[i % 3]) for i in range(30)], "id long, grp string"
    )
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    q = lakehouse.read_delta(spark, root).where(F.col("grp") == "a")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "grp" in plan.split("PartitionFilters", 1)[1][:200], plan
    assert q.count() == 10


def test_delta_partitioned_null_partition_value(spark, tmp_path):
    root = str(tmp_path / "p")
    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, grp string")
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    adds = [a["add"] for a in _read_commit(root, 0) if "add" in a]
    assert any(a["partitionValues"]["grp"] is None for a in adds)
    back = lakehouse.read_delta(spark, root)
    assert {(r.id, r.grp) for r in back.collect()} == {(1, "a"), (2, None)}


def test_delta_vacuum_reaches_partition_dirs(spark, tmp_path):
    root = str(tmp_path / "p")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, grp string")
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    lakehouse.write_delta(spark, df, root, mode="overwrite", partition_by=["grp"])
    doomed = lakehouse.vacuum_delta(root)
    assert doomed and all("grp=" in d for d in doomed)
    assert lakehouse.read_delta(spark, root).count() == 2  # live set intact


def test_merge_into_partitioned_table_upserts_per_partition(spark, tmp_path):
    """Partitioned MERGE: touched-file discovery and the rewrite go through
    Hive partition reconstruction; rewritten rows land back under their
    col=value dirs with per-file partitionValues, and UNTOUCHED partitions'
    files keep their identity (the 1%-upsert-rewrites-1% property, now per
    partition)."""
    root = str(tmp_path / "pm")
    base = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(20)], "id long, grp string, v double"
    ).coalesce(1)
    lakehouse.write_delta(spark, base, root, partition_by=["grp"])
    files_before = set(lakehouse._active_files(root))
    a_files = {f for f in files_before if "grp=a" in f}
    # source touches only grp=b rows (odd ids) and inserts a new partition
    src = spark.createDataFrame(
        [(1, "b", -1.0), (3, "b", -3.0), (100, "c", 100.0)],
        "id long, grp string, v double",
    )
    v = lakehouse.merge_delta(spark, src, root, keys=["id"])
    got = {r.id: (r.grp, r.v) for r in lakehouse.read_delta(spark, root).collect()}
    assert got[1] == ("b", -1.0) and got[3] == ("b", -3.0)
    assert got[100] == ("c", 100.0) and got[0] == ("a", 0.0) and len(got) == 21
    # grp=a files untouched; adds carry partitionValues and live in part dirs
    assert a_files <= set(lakehouse._active_files(root))
    acts = _read_commit(root, v)
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all("grp=" in a["path"] for a in adds)
    assert {a["partitionValues"]["grp"] for a in adds} <= {"b", "c"}
    removed = {a["remove"]["path"] for a in acts if "remove" in a}
    assert removed and all(p.startswith("grp=b") for p in removed)


def test_merge_partitioned_key_is_partition_column(spark, tmp_path):
    """When a merge key IS the partition column, discovery prunes to the
    matching directories and the rewrite stays per-partition-correct."""
    root = str(tmp_path / "pk")
    base = spark.createDataFrame(
        [(d, i, float(i)) for d in (10, 20, 30) for i in range(5)],
        "day int, id long, v double",
    )
    lakehouse.write_delta(spark, base, root, partition_by=["day"])
    src = spark.createDataFrame([(20, 99, -1.0)], "day int, id long, v double")
    lakehouse.merge_delta(spark, src, root, keys=["day", "id"])
    back = lakehouse.read_delta(spark, root)
    assert back.where("day = 20").count() == 6
    assert back.where("v = -1.0").collect()[0].id == 99


def test_merge_partitioned_row_moves_partitions(spark, tmp_path):
    """Copy-on-write makes partition moves free: a merge that changes a
    row's partition value rewrites it into the new directory and removes
    the old file — no special repartition step."""
    root = str(tmp_path / "pmove")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, grp string")
    lakehouse.write_delta(spark, base, root, partition_by=["grp"])
    src = spark.createDataFrame([(1, "b")], "id long, grp string")
    lakehouse.merge_delta(spark, src, root, keys=["id"])
    got = {r.id: r.grp for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {1: "b", 2: "b"}
    live = lakehouse._active_files(root)
    assert all("grp=b" in f for f in live if "id" not in os.path.basename(f)) or any(
        "grp=b" in f for f in live
    )
    assert not any("grp=a" in f for f in live)


def test_merge_partitioned_delete(spark, tmp_path):
    root = str(tmp_path / "pd")
    base = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(10)], "id long, grp string"
    )
    lakehouse.write_delta(spark, base, root, partition_by=["grp"])
    doomed = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    lakehouse.merge_delta(spark, doomed, root, keys=["id"], when_matched="delete")
    assert sorted(r.id for r in lakehouse.read_delta(spark, root).collect()) == [
        3, 4, 5, 6, 7, 8, 9,
    ]


def test_compact_partitioned_one_file_per_partition(spark, tmp_path):
    """Partitioned OPTIMIZE: many small per-append files collapse to one
    file per partition dir (files never span partitions), rows identical,
    dataChange:false, and partition pruning still works afterwards."""
    root = str(tmp_path / "pc")
    for batch in range(4):
        df = spark.createDataFrame(
            [(batch * 10 + i, "ab"[i % 2]) for i in range(10)], "id long, grp string"
        ).coalesce(1)
        lakehouse.write_delta(
            spark, df, root, mode="append" if batch else "append",
            partition_by=["grp"],
        )
    assert len(lakehouse._active_files(root)) == 8  # 4 appends × 2 partitions
    v = lakehouse.compact_delta(spark, root)
    live = lakehouse._active_files(root)
    by_dir = {}
    for f in live:
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    assert len(by_dir) == 2 and all(len(v) == 1 for v in by_dir.values()), by_dir
    acts = _read_commit(root, v)
    assert all(
        a[k]["dataChange"] is False for a in acts for k in ("add", "remove") if k in a
    )
    adds = [a["add"] for a in acts if "add" in a]
    assert {a["partitionValues"]["grp"] for a in adds} == {"a", "b"}
    back = lakehouse.read_delta(spark, root)
    assert back.count() == 40
    assert back.where(F.col("grp") == "a").count() == 20


def test_compact_partitioned_oversized_partition_splits(spark, tmp_path):
    """A partition bigger than target_file_bytes splits across ceil(bytes/
    target) output files instead of funnelling through one task."""
    root = str(tmp_path / "po")
    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "id long, grp string",
    )
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    big_bytes = sum(
        os.path.getsize(f)
        for f in lakehouse._active_files(root)
        if "grp=big" in f
    )
    lakehouse.compact_delta(spark, root, target_file_bytes=max(1, big_bytes // 3))
    live = lakehouse._active_files(root)
    n_big = sum(1 for f in live if "grp=big" in f)
    n_small = sum(1 for f in live if "grp=small" in f)
    assert n_big >= 2, live
    assert n_small == 1
    assert lakehouse.read_delta(spark, root).count() == 1000


def test_compact_partitioned_zorder_clusters_within_partitions(spark, tmp_path):
    """ZORDER on a partitioned table clusters INSIDE each partition (Delta
    semantics): every output file stays within one partition dir and its
    rows are Morton-ordered, so per-file min/max stats stay tight."""
    root = str(tmp_path / "pz")
    df = spark.range(2000).selectExpr(
        "id % 2 == 0 as even", "id % 100 as x", "cast(id / 20 as long) as y"
    ).select(
        F.when(F.col("even"), "e").otherwise("o").alias("grp"), "x", "y"
    )
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    lakehouse.compact_delta(spark, root, zorder_by=["x", "y"])
    live = lakehouse._active_files(root)
    assert all("grp=" in f for f in live)
    assert lakehouse.read_delta(spark, root).count() == 2000


def test_compact_zorder_preserves_rows_and_clusters(spark, tmp_path):
    """OPTIMIZE ZORDER BY: compaction with zorder_by rewrites the live set
    clustered along the Morton curve — same rows, dataChange:false commit,
    and each output file's per-column min/max span is a fraction of the
    global span on BOTH columns (the property that makes row-group skipping
    work on either predicate)."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "z")
    # two appends of interleaved (x, y) so pre-compaction files span everything
    a = spark.range(0, 1000).selectExpr("id % 100 as x", "cast(id / 10 as long) as y")
    b = spark.range(1000, 2000).selectExpr("id % 100 as x", "cast(id / 10 as long) as y")
    lakehouse.write_delta(spark, a, root)
    lakehouse.write_delta(spark, b, root, mode="append")
    v = lakehouse.compact_delta(spark, root, target_files=4, zorder_by=["x", "y"])
    acts = _read_commit(root, v)
    assert all(
        a[k]["dataChange"] is False for a in acts for k in ("add", "remove") if k in a
    )
    live = lakehouse._active_files(root)
    assert len(live) == 4
    assert lakehouse.read_delta(spark, root).count() == 2000
    # clustering: average per-file span must be well under the global span
    spans = []
    for f in live:
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans.append(((max(xs) - min(xs)) / 99.0 + (max(ys) - min(ys)) / 199.0) / 2)
    assert sum(spans) / len(spans) < 0.8, spans


# ------------------------------------------------- conditional merge ----


def test_merge_newer_wins_condition(spark, tmp_path):
    """whenMatchedUpdateAll(condition='s.ts > t.ts'): strictly-newer source
    rows replace, older/equal ones keep the target, unmatched insert."""
    root = str(tmp_path / "m")
    base = spark.createDataFrame(
        [(1, 10, "t1"), (2, 20, "t2"), (3, 30, "t3")], "id long, ts long, v string"
    )
    lakehouse.write_delta(spark, base, root)
    src = spark.createDataFrame(
        [(1, 15, "s1"), (2, 20, "s2"), (3, 5, "s3"), (4, 1, "s4")],
        "id long, ts long, v string",
    )
    lakehouse.merge_delta(spark, src, root, keys=["id"], newer_wins_col="ts")
    got = {r.id: (r.ts, r.v) for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {
        1: (15, "s1"),  # strictly newer: replaced
        2: (20, "t2"),  # tie: target kept
        3: (30, "t3"),  # older: target kept
        4: (1, "s4"),   # unmatched: inserted
    }


def test_merge_newer_wins_is_order_independent(spark, tmp_path):
    """Applying the same batches in different orders must converge to the
    same latest-per-key table — the property the streaming upsert sink
    relies on when micro-batches are not time-ordered."""
    batches = [
        [(1, 3, "a3"), (2, 1, "b1")],
        [(1, 1, "a1"), (3, 2, "c2")],
        [(1, 2, "a2"), (2, 4, "b4"), (3, 1, "c1")],
    ]
    results = []
    for order in ([0, 1, 2], [2, 0, 1]):
        root = str(tmp_path / f"m{order[0]}{order[1]}")
        for i in order:
            df = spark.createDataFrame(batches[i], "id long, ts long, v string")
            lakehouse.merge_delta(spark, df, root, keys=["id"], newer_wins_col="ts")
        results.append(
            {r.id: (r.ts, r.v) for r in lakehouse.read_delta(spark, root).collect()}
        )
    assert results[0] == results[1] == {1: (3, "a3"), 2: (4, "b4"), 3: (2, "c2")}


def test_merge_newer_wins_requires_update_mode(spark, tmp_path):
    root = str(tmp_path / "m")
    lakehouse.write_delta(spark, spark.range(3).select("id"), root)
    with pytest.raises(ValueError, match="newer_wins_col"):
        lakehouse.merge_delta(
            spark, spark.range(3).select("id"), root, keys=["id"],
            when_matched="delete", newer_wins_col="id",
        )


def test_stream_to_delta_upsert_latest_per_key(spark, tmp_path, sf_dir):
    """Streaming feature materialization: a real Structured Streaming
    replay upserts into a Delta table keyed by user — the table ends at ONE
    row per user holding that user's max event timestamp, regardless of
    micro-batch order, and a rerun with the same checkpoint changes
    nothing."""
    from feature_store_ml_spark.streaming import events as ev

    table = str(tmp_path / "latest")
    ckpt = str(tmp_path / "ckpt")
    stream = ev._streaming_events(spark, sf_dir).select("user_id", "ts", "value")
    ev.stream_to_delta(
        spark, stream, table, app_id="up1", checkpoint_dir=ckpt,
        mode="upsert", keys=["user_id"], order_col="ts",
    )
    got = lakehouse.read_delta(spark, table).toPandas()
    assert got.user_id.is_unique
    from feature_store_ml_spark.io import load_table
    expected = (
        load_table(spark, sf_dir, "events").groupBy("user_id")
        .agg(F.max("ts").alias("ts")).toPandas()
    )
    merged = got.merge(expected, on="user_id", suffixes=("", "_want"))
    assert len(merged) == len(expected)
    assert (merged.ts == merged.ts_want).all()
    # rerun: same checkpoint => no new batches; table unchanged
    stream2 = ev._streaming_events(spark, sf_dir).select("user_id", "ts", "value")
    again = ev.stream_to_delta(
        spark, stream2, table, app_id="up1", checkpoint_dir=ckpt,
        mode="upsert", keys=["user_id"], order_col="ts",
    )
    assert again == []
    assert lakehouse.read_delta(spark, table).count() == len(expected)


# ------------------------------------------------- schema evolution ----


def test_delta_schema_evolution_append(spark, tmp_path):
    """mergeSchema append: a batch with an extra column widens the declared
    schema (metaData re-emitted), and the reader backfills old files with
    null for the new column."""
    root = str(tmp_path / "ev")
    lakehouse.write_delta(
        spark, spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"), root
    )
    batch2 = spark.createDataFrame(
        [(3, 30.0, "new")], "id long, v double, tag string"
    )
    with pytest.raises(ValueError, match="merge_schema"):
        lakehouse.write_delta(spark, batch2, root, mode="append")
    lakehouse.write_delta(spark, batch2, root, mode="append", merge_schema=True)
    back = lakehouse.read_delta(spark, root)
    assert back.columns == ["id", "v", "tag"]
    got = {r.id: r.tag for r in back.collect()}
    assert got == {1: None, 2: None, 3: "new"}
    # the widened schema is now the declared one: plain appends must carry it
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(4, 40.0, "t4")], "id long, v double, tag string"),
        root, mode="append",
    )
    assert lakehouse.read_delta(spark, root).count() == 4


def test_delta_schema_evolution_rejects_drop_and_retype(spark, tmp_path):
    root = str(tmp_path / "ev")
    lakehouse.write_delta(
        spark, spark.createDataFrame([(1, 10.0)], "id long, v double"), root
    )
    with pytest.raises(ValueError, match="DROP"):
        lakehouse.write_delta(
            spark, spark.createDataFrame([(2,)], "id long"), root,
            mode="append", merge_schema=True,
        )
    with pytest.raises(ValueError, match="cannot change column"):
        lakehouse.write_delta(
            spark, spark.createDataFrame([(2, "s")], "id long, v string"), root,
            mode="append", merge_schema=True,
        )


def test_merge_into_evolved_table(spark, tmp_path):
    """MERGE after evolution: touched files written BEFORE the widening
    lack the new column; the rewrite must read them with the declared
    schema (null backfill) instead of crashing or silently dropping it."""
    root = str(tmp_path / "ev")
    lakehouse.write_delta(
        spark, spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"), root
    )
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(3, 30.0, "t3")], "id long, v double, tag string"),
        root, mode="append", merge_schema=True,
    )
    src = spark.createDataFrame(
        [(1, 99.0, "upd"), (4, 44.0, "ins")], "id long, v double, tag string"
    )
    lakehouse.merge_delta(spark, src, root, keys=["id"])
    got = {r.id: (r.v, r.tag) for r in lakehouse.read_delta(spark, root).collect()}
    assert got == {
        1: (99.0, "upd"),
        2: (20.0, None),  # pre-evolution row survives with null backfill
        3: (30.0, "t3"),
        4: (44.0, "ins"),
    }


# --------------------------------------------- checkpoint writer/cleanup ----


def test_checkpoint_write_cleanup_roundtrip(spark, tmp_path):
    """The log-lifecycle loop: commits → checkpoint → JSON cleanup. The
    snapshot, the txn handshake, and the next-version counter must all
    survive on the checkpoint alone."""
    root = str(tmp_path / "ck")
    df = spark.range(10).select("id")
    lakehouse.write_delta(spark, df, root)
    lakehouse.write_delta(spark, df, root, mode="append", txn=("app", 7))
    lakehouse.write_delta(spark, df, root, mode="append")
    v = lakehouse.checkpoint_delta(root)
    assert v == 2
    removed = lakehouse.cleanup_delta_log(root)
    assert [n for n in removed if n.endswith(".json")] == [
        f"{i:020d}.json" for i in range(3)
    ]
    # snapshot intact from checkpoint alone
    assert lakehouse.read_delta(spark, root).count() == 30
    # txn handshake survives cleanup (exactly-once would silently break otherwise)
    assert lakehouse.last_txn_version(root, "app") == 7
    again = lakehouse.write_delta(spark, df, root, mode="append", txn=("app", 7))
    assert again == 7  # still skipped
    assert lakehouse.read_delta(spark, root).count() == 30
    # next commit continues the version sequence (not 0)
    v3 = lakehouse.write_delta(spark, df, root, mode="append")
    assert v3 == 3
    assert lakehouse.read_delta(spark, root).count() == 40


def test_checkpoint_noop_when_nothing_new(spark, tmp_path):
    root = str(tmp_path / "ck")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    v1 = lakehouse.checkpoint_delta(root)
    v2 = lakehouse.checkpoint_delta(root)
    assert v1 == v2 == 0


def test_cleanup_blocks_incremental_into_cleaned_range(spark, tmp_path):
    root = str(tmp_path / "ck")
    df = spark.range(5).select("id")
    lakehouse.write_delta(spark, df, root)
    lakehouse.write_delta(spark, df, root, mode="append")
    lakehouse.checkpoint_delta(root)
    lakehouse.cleanup_delta_log(root)
    lakehouse.write_delta(spark, df, root, mode="append")
    with pytest.raises(ValueError, match="not in the JSON log"):
        lakehouse.read_delta_changes(spark, root, since_version=0)
    # the uncleaned tail still reads incrementally
    inc = lakehouse.read_delta_changes(spark, root, since_version=1)
    assert inc.count() == 5


def test_checkpoint_partitioned_table_preserves_partition_values(spark, tmp_path):
    root = str(tmp_path / "ckp")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(10)], "id long, grp string"
    )
    lakehouse.write_delta(spark, df, root, partition_by=["grp"])
    lakehouse.checkpoint_delta(root)
    lakehouse.cleanup_delta_log(root)
    back = lakehouse.read_delta(spark, root)
    assert {(r.id, r.grp) for r in back.collect()} == {
        (i, "ab"[i % 2]) for i in range(10)
    }


# --------------------------------------------------- non-Hive layouts ----


def _flat_partitioned_table(spark, root, with_dv_target=False):
    """A partitioned Delta table whose data files sit FLAT in the table
    root (no col=value dirs) — partitionValues live only in the log, the
    layout some writers (and object-store renames) produce."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "flat-1", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_json, "partitionColumns": ["p"],
                      "configuration": {}, "createdTime": 0}},
    ]
    for part in (0, 1, 2):
        name = f"flat-{part}.parquet"
        pq.write_table(
            pa.table({"v": pa.array([part * 10 + i for i in range(5)], pa.int64())}),
            os.path.join(root, name),
        )
        actions.append({"add": {
            "path": name, "partitionValues": {"p": str(part)},
            "size": os.path.getsize(os.path.join(root, name)),
            "modificationTime": 0, "dataChange": True,
        }})
    # a NULL partition too
    pq.write_table(
        pa.table({"v": pa.array([99], pa.int64())}), os.path.join(root, "flat-null.parquet")
    )
    actions.append({"add": {
        "path": "flat-null.parquet", "partitionValues": {"p": None},
        "size": os.path.getsize(os.path.join(root, "flat-null.parquet")),
        "modificationTime": 0, "dataChange": True,
    }})
    _write_commit(log, 0, actions)
    return root


def test_non_hive_partition_layout_reads_from_partition_values(spark, tmp_path):
    root = _flat_partitioned_table(spark, str(tmp_path / "flat"))
    df = lakehouse.read_delta(spark, root)
    assert sorted(df.columns) == ["p", "v"]
    got = {(r["p"], r["v"]) for r in df.collect()}
    assert (0, 3) in got and (2, 24) in got and (None, 99) in got
    assert len(got) == 16
    assert df.where("p = 1").count() == 5
    assert df.where("p IS NULL").count() == 1
    # partition-column type follows the declared schema (int, not string)
    assert dict(df.dtypes)["p"] == "int"


def test_non_hive_layout_with_dv_delete(spark, tmp_path):
    root = _flat_partitioned_table(spark, str(tmp_path / "flatdv"))
    lakehouse.delete_delta(spark, root, "v = 13")
    df = lakehouse.read_delta(spark, root)
    assert df.count() == 15 and df.where("v = 13").count() == 0
    # skipping by partition value still engages (no dirs involved)
    rep = lakehouse.skipping_report(root, "p = 2")
    assert rep["kept_files"] < rep["total_files"]


def test_delta_vacuum_retention_window(spark, tmp_path):
    """vacuum_delta(retention_hours=): freshly tombstoned files SURVIVE
    the window so time travel within it keeps working; retention 0
    reclaims them and the travel then fails loudly."""
    root = str(tmp_path / "ret")
    lakehouse.write_delta(spark, spark.range(0, 20).select("id"), root)
    lakehouse.write_delta(
        spark, spark.range(50, 60).select("id"), root, mode="overwrite"
    )
    # inside the window: nothing reclaimed (tombstones are seconds old)
    kept = lakehouse.vacuum_delta(root, retention_hours=24.0)
    assert kept == []
    old = lakehouse.read_delta(spark, root, version=0)
    assert sorted(r.id for r in old.collect()) == list(range(0, 20))
    # dry run at retention 0 names the dead files without removing them
    doomed = lakehouse.vacuum_delta(root, dry_run=True)
    assert doomed
    assert lakehouse.read_delta(spark, root, version=0).count() == 20
    # retention 0 reclaims; current snapshot intact, travel loses files
    gone = lakehouse.vacuum_delta(root)
    assert sorted(gone) == sorted(doomed)
    assert sorted(r.id for r in lakehouse.read_delta(spark, root).collect()) == list(
        range(50, 60)
    )


def test_vacuum_retention_survives_checkpoint_cleanup(spark, tmp_path):
    """ADVICE r7: remove tombstones must ride checkpoints — after
    checkpoint_delta + cleanup_delta_log a freshly-retired file keeps its
    deletionTimestamp, so vacuum(retention_hours>0) still retains it
    instead of falling back to file mtime (its WRITE time) and collecting
    it inside the window."""
    root = str(tmp_path / "ckptret")
    lakehouse.write_delta(spark, spark.range(0, 20).select("id"), root)
    lakehouse.write_delta(
        spark, spark.range(50, 60).select("id"), root, mode="overwrite"
    )
    lakehouse.checkpoint_delta(root)
    lakehouse.cleanup_delta_log(root)
    # the v0 JSON (and its remove replay source) is gone, but the
    # checkpoint carries the tombstone: still inside the window → kept
    assert lakehouse._collect_removes(root), "checkpoint lost the tombstones"
    kept = lakehouse.vacuum_delta(root, retention_hours=24.0)
    assert kept == [], "tombstoned file collected inside the retention window"
    # current snapshot unaffected either way
    assert lakehouse.read_delta(spark, root).count() == 10
    # retention 0 still reclaims the dead bytes
    gone = lakehouse.vacuum_delta(root)
    assert gone
    assert lakehouse.read_delta(spark, root).count() == 10


def test_vacuum_retention_survives_v2_checkpoint_cleanup(spark, tmp_path):
    """Same contract through a V2 checkpoint: tombstones live in the
    sidecar and _collect_removes follows the pointer."""
    root = str(tmp_path / "ckptret2")
    lakehouse.write_delta(spark, spark.range(0, 20).select("id"), root)
    lakehouse.write_delta(
        spark, spark.range(50, 60).select("id"), root, mode="overwrite"
    )
    lakehouse.checkpoint_delta(root, v2=True)
    lakehouse.cleanup_delta_log(root)
    assert lakehouse._collect_removes(root), "v2 checkpoint lost the tombstones"
    assert lakehouse.vacuum_delta(root, retention_hours=24.0) == []
    assert lakehouse.vacuum_delta(root)  # retention 0 reclaims
    assert lakehouse.read_delta(spark, root).count() == 10


def test_auto_checkpoint_interval(spark, tmp_path):
    """delta.checkpointInterval (round 8): every Nth commit checkpoints
    automatically through the shared post-commit hook — bounded log
    replay for streaming sinks with nobody scheduling maintenance."""
    import os as _os

    root = str(tmp_path / "autockpt")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)
    lakehouse.alter_delta_properties(root, {"delta.checkpointInterval": "3"})
    log = lakehouse._delta_log_dir(root)

    def ckpts():
        return sorted(
            n for n in _os.listdir(log) if n.endswith(".checkpoint.parquet")
        )

    assert ckpts() == []
    lakehouse.write_delta(spark, spark.range(5, 8).select("id"), root, mode="append")  # v2
    assert ckpts() == []
    lakehouse.write_delta(spark, spark.range(8, 9).select("id"), root, mode="append")  # v3
    assert ckpts() == [f"{3:020d}.checkpoint.parquet"]
    lakehouse.delete_delta(spark, root, "id = 0")  # v4
    lakehouse.update_delta(spark, root, {"id": "id + 100"}, where="id = 1")  # v5
    lakehouse.write_delta(spark, spark.range(9, 10).select("id"), root, mode="append")  # v6
    assert ckpts() == [
        f"{3:020d}.checkpoint.parquet",
        f"{6:020d}.checkpoint.parquet",
    ]
    # table reads fine through the checkpoints; cleanup stays explicit
    got = sorted(r.id for r in lakehouse.read_delta(spark, root).collect())
    assert got == [2, 3, 4, 5, 6, 7, 8, 9, 101]
    assert len([n for n in _os.listdir(log) if n.endswith(".json")]) == 7
    with pytest.raises(ValueError, match="checkpointInterval"):
        lakehouse.alter_delta_properties(root, {"delta.checkpointInterval": "x"})
        lakehouse.write_delta(spark, spark.range(1).select("id"), root, mode="append")
