"""Delta COLUMN DEFAULTS (round 12 — PROTOCOL.md §Default Columns,
writer feature allowColumnDefaults): set_delta_column_default stores a
CURRENT_DEFAULT SQL expression in field metadata; appends that omit the
column materialize it (write-time only — reads never substitute, the
deliberate contrast with Iceberg v3 initial-default)."""

import json

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _mk(spark, tmp_path, name="t"):
    root = str(tmp_path / name)
    lakehouse.write_delta(
        spark,
        spark.range(6).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("seed").alias("chan")
        ),
        root,
    )
    return root


def test_write_default_materializes_on_omitting_append(spark, tmp_path):
    root = _mk(spark, tmp_path)
    lakehouse.set_delta_column_default(spark, root, "chan", "'bulk'")
    lakehouse.write_delta(
        spark,
        spark.range(6, 9).select("id", (F.col("id") * 2).alias("v")),
        root,
        mode="append",
    )
    got = {(r.id, r.chan) for r in lakehouse.read_delta(spark, root).collect()}
    want = {(i, "seed") for i in range(6)} | {(i, "bulk") for i in range(6, 9)}
    assert got == want
    # explicit values win over the default
    lakehouse.write_delta(
        spark,
        spark.range(9, 11).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("chan")
        ),
        root,
        mode="append",
    )
    got = {(r.id, r.chan) for r in lakehouse.read_delta(spark, root).collect()}
    assert got == want | {(9, "x"), (10, "x")}


def test_default_expression_not_just_literal(spark, tmp_path):
    root = _mk(spark, tmp_path)
    lakehouse.set_delta_column_default(
        spark, root, "v", "CAST(41 + 1 AS BIGINT)"
    )
    lakehouse.write_delta(
        spark,
        spark.range(6, 8).select("id", F.lit("n").alias("chan")),
        root,
        mode="append",
    )
    got = {(r.id, r.v) for r in lakehouse.read_delta(spark, root).collect()}
    assert {(6, 42), (7, 42)} <= got


def test_protocol_carries_feature_and_reads_never_substitute(spark, tmp_path):
    root = _mk(spark, tmp_path)
    lakehouse.set_delta_column_default(spark, root, "chan", "'bulk'")
    proto = lakehouse._current_protocol(root)
    assert proto["minWriterVersion"] == 7
    assert "allowColumnDefaults" in set(proto.get("writerFeatures") or [])
    _, meta = lakehouse._replay_log_adds(root)
    fld = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "chan"
    )
    assert fld["metadata"]["CURRENT_DEFAULT"] == "'bulk'"
    # a column ADDED after the default was set (merge_schema) has no
    # default; its pre-add rows read null — Delta never backfills
    lakehouse.write_delta(
        spark,
        spark.range(6, 7).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("z").alias("chan"),
            F.lit(1).alias("extra"),
        ),
        root,
        mode="append",
        merge_schema=True,
    )
    rows = {
        (r.id, r.extra)
        for r in lakehouse.read_delta(spark, root).collect()
    }
    assert (6, 1) in rows and (0, None) in rows


def test_drop_default_and_validation(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="no column"):
        lakehouse.set_delta_column_default(spark, root, "nope", "'x'")
    with pytest.raises(Exception):
        # unparseable expression refused at SET time, not at write time
        lakehouse.set_delta_column_default(spark, root, "chan", "not a ( sql")
    lakehouse.set_delta_column_default(spark, root, "chan", "'bulk'")
    lakehouse.set_delta_column_default(spark, root, "chan", None)
    # default dropped: an omitting append now fails the schema check
    with pytest.raises(ValueError, match="schema mismatch"):
        lakehouse.write_delta(
            spark,
            spark.range(6, 7).select("id", (F.col("id") * 2).alias("v")),
            root,
            mode="append",
        )
