"""GENERATED COLUMNS (PROTOCOL.md §Generated Columns): a field whose
metadata carries delta.generationExpression obliges every writer (from
minWriterVersion 4) to compute or VALIDATE the value. This module
validates — appends/merges/updates that would store a value violating
the expression fail before any data commits."""

import json

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _mk_generated(spark, tmp_path, name="g"):
    """Table whose `double_v` column is declared GENERATED AS (v * 2)."""
    root = str(tmp_path / name)
    lakehouse.write_delta(
        spark,
        spark.range(5).select(
            "id", (F.col("id") * 1).alias("v"), (F.col("id") * 2).alias("double_v")
        ),
        root,
        mode="overwrite",
    )
    _, meta = lakehouse._replay_log_adds(root)
    schema = json.loads(meta["schemaString"])
    for f in schema["fields"]:
        if f["name"] == "double_v":
            f["metadata"] = {"delta.generationExpression": "v * 2"}
    lakehouse._commit(
        root,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
            {"metaData": {**meta, "schemaString": json.dumps(schema)}},
            {
                "commitInfo": {
                    "timestamp": 0,
                    "operation": "ADD GENERATION EXPRESSION",
                }
            },
        ],
    )
    return root


def test_append_validates_generated_column(spark, tmp_path):
    root = _mk_generated(spark, tmp_path)
    # a conforming batch appends fine
    lakehouse.write_delta(
        spark,
        spark.range(5, 8).select(
            "id", F.col("id").alias("v"), (F.col("id") * 2).alias("double_v")
        ),
        root,
    )
    assert lakehouse.read_delta(spark, root).count() == 8
    # a violating batch fails loudly, nothing committed
    with pytest.raises(ValueError, match="generation expression"):
        lakehouse.write_delta(
            spark,
            spark.range(8, 9).select(
                "id", F.col("id").alias("v"), (F.col("id") * 3).alias("double_v")
            ),
            root,
        )
    assert lakehouse.read_delta(spark, root).count() == 8


def test_merge_and_update_validate_generated_column(spark, tmp_path):
    root = _mk_generated(spark, tmp_path)
    bad_src = spark.createDataFrame(
        [(0, 10, 99)], "id long, v long, double_v long"
    )
    with pytest.raises(ValueError, match="generation expression"):
        lakehouse.merge_delta(spark, bad_src, root, keys=["id"])
    good_src = spark.createDataFrame(
        [(0, 10, 20)], "id long, v long, double_v long"
    )
    lakehouse.merge_delta(spark, good_src, root, keys=["id"])
    got = {r.id: (r.v, r.double_v) for r in lakehouse.read_delta(spark, root).collect()}
    assert got[0] == (10, 20)
    # UPDATE that breaks the invariant is refused; one that keeps it works
    with pytest.raises(ValueError, match="generation expression"):
        lakehouse.update_delta(spark, root, {"v": "v + 1"}, where="id = 1")
    lakehouse.update_delta(
        spark, root, {"v": "v + 1", "double_v": "(v + 1) * 2"}, where="id = 1"
    )
    got = {r.id: (r.v, r.double_v) for r in lakehouse.read_delta(spark, root).collect()}
    assert got[1] == (2, 4)


def test_generated_columns_writer_feature_accepted(spark, tmp_path):
    """A table declaring generatedColumns at writer v7 is writable now
    that enforcement exists (was a blanket refusal)."""
    root = _mk_generated(spark, tmp_path)
    lakehouse._commit(
        root,
        [
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "readerFeatures": [],
                    "writerFeatures": ["generatedColumns"],
                }
            },
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE"}},
        ],
    )
    lakehouse.write_delta(
        spark,
        spark.range(8, 10).select(
            "id", F.col("id").alias("v"), (F.col("id") * 2).alias("double_v")
        ),
        root,
    )
    assert lakehouse.read_delta(spark, root).count() == 7


def test_enable_column_mapping_standalone(spark, tmp_path):
    """enable_delta_column_mapping: the upgrade WITHOUT a rename —
    physical names freeze at the current logical names, later renames
    are one-commit, appends keep working, and it is idempotent."""
    root = str(tmp_path / "cm")
    lakehouse.write_delta(
        spark,
        spark.range(6).select("id", (F.col("id") * 2).alias("v")),
        root,
        mode="overwrite",
    )
    v1 = lakehouse.enable_delta_column_mapping(spark, root)
    assert lakehouse.enable_delta_column_mapping(spark, root) == v1  # idempotent
    _, meta = lakehouse._replay_log_adds(root)
    assert lakehouse._mapping_mode(meta) == "name"
    assert lakehouse._physical_names(meta) == {"id": "id", "v": "v"}
    proto = lakehouse._current_protocol(root)
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (2, 5)
    # reads unchanged; rename is now zero-rewrite; appends compose
    lakehouse.rename_delta_column(spark, root, "v", "speed")
    lakehouse.write_delta(
        spark,
        spark.range(6, 8).select("id", (F.col("id") * 2).alias("speed")),
        root,
        mode="append",
    )
    got = sorted(
        (r.id, r.speed) for r in lakehouse.read_delta(spark, root).collect()
    )
    assert got == [(i, i * 2) for i in range(8)]
