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


def test_checkpoint_tables_fail_loud(spark, tmp_path):
    root = _make_delta_table(spark, str(tmp_path / "t"))
    open(
        os.path.join(root, "_delta_log", f"{0:020d}.checkpoint.parquet"), "wb"
    ).close()
    with pytest.raises(NotImplementedError, match="checkpoint"):
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


def test_partitioned_delta_non_hive_layout_fails_loud(spark, tmp_path):
    root = _make_partitioned_delta_table(
        spark, str(tmp_path / "nh"), hive_layout=False
    )
    with pytest.raises(NotImplementedError, match="partition"):
        lakehouse.read_delta(spark, root)


def test_read_table_auto_sniffs_format(spark, tmp_path, sf_dir):
    delta_root = _make_delta_table(spark, str(tmp_path / "d"))
    assert lakehouse.read_table_auto(spark, delta_root).count() == 30
    plain = lakehouse.read_table_auto(spark, f"{sf_dir}/part.parquet")
    assert "p_partkey" in plain.columns


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
