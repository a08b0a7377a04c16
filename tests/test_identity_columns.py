"""Delta IDENTITY columns (PROTOCOL.md §Identity Columns): GENERATED
ALWAYS long values the writer assigns — unique, step-aligned, gaps
allowed; the high water mark advances in the SAME commit as the data
(derived from the staged files' footer stats)."""

import json

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import lakehouse


def _identity_meta(path, col):
    _adds, meta = lakehouse._replay_log_adds(path)
    for f in json.loads(meta["schemaString"])["fields"]:
        if f["name"] == col:
            return f.get("metadata") or {}
    raise AssertionError(f"no column {col}")


def test_identity_create_append_hwm(spark, tmp_path):
    root = str(tmp_path / "idt")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    lakehouse.write_delta(
        spark, df, root, identity_columns={"rid": (100, 10)}
    )
    out = lakehouse.read_delta(spark, root)
    vals = [r["rid"] for r in out.select("rid").collect()]
    assert len(vals) == 100 and len(set(vals)) == 100  # unique
    assert all(v >= 100 and (v - 100) % 10 == 0 for v in vals)  # aligned
    md = _identity_meta(root, "rid")
    assert md["delta.identity.start"] == 100
    assert md["delta.identity.step"] == 10
    assert md["delta.identity.highWaterMark"] == max(vals)
    # protocol gates at legacy writer v6
    proto = lakehouse._current_protocol(root)
    assert proto["minWriterVersion"] == 6
    # append: fresh values stay unique, above the prior watermark
    lakehouse.write_delta(
        spark,
        spark.range(100, 150).select(F.col("id").alias("k")),
        root,
        mode="append",
    )
    vals2 = [r["rid"] for r in lakehouse.read_delta(spark, root).collect()]
    assert len(vals2) == 150 and len(set(vals2)) == 150
    new_vals = set(vals2) - set(vals)
    assert all(v > max(vals) for v in new_vals)  # watermark respected
    assert _identity_meta(root, "rid")[
        "delta.identity.highWaterMark"
    ] == max(vals2)


def test_identity_negative_step(spark, tmp_path):
    root = str(tmp_path / "neg")
    lakehouse.write_delta(
        spark,
        spark.range(0, 30).select(F.col("id").alias("k")),
        root,
        identity_columns={"rid": (0, -5)},
    )
    lakehouse.write_delta(
        spark,
        spark.range(30, 60).select(F.col("id").alias("k")),
        root,
        mode="append",
    )
    vals = [r["rid"] for r in lakehouse.read_delta(spark, root).collect()]
    assert len(set(vals)) == 60
    assert all(v <= 0 and v % 5 == 0 for v in vals)
    assert _identity_meta(root, "rid")[
        "delta.identity.highWaterMark"
    ] == min(vals)


def test_identity_refusals(spark, tmp_path):
    root = str(tmp_path / "ref")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    lakehouse.write_delta(spark, df, root, identity_columns={"rid": (1, 1)})
    # GENERATED ALWAYS: a batch carrying the column is refused
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        lakehouse.write_delta(
            spark,
            spark.range(10, 20).select(
                F.col("id").alias("k"), F.col("id").alias("rid")
            ),
            root,
            mode="append",
        )
    # DML is implemented (test_row_tracking_dml.py has the matrix), but
    # GENERATED ALWAYS values still cannot come from the user:
    src = spark.createDataFrame([(1, 99)], "k long, rid long")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        lakehouse.merge_delta(spark, src, root, keys=["k"])
    with pytest.raises(ValueError, match="IDENTITY key"):
        lakehouse.merge_delta(spark, src, root, keys=["rid"])
    with pytest.raises(ValueError, match="IDENTITY"):
        lakehouse.update_delta(spark, root, {"rid": "2"}, "k = 1")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        lakehouse.overwrite_delta_where(spark, src, root, "k = 1")
    # declaring identity on an EXISTING table is refused
    plain = str(tmp_path / "plain")
    lakehouse.write_delta(spark, df, plain)
    with pytest.raises(ValueError, match="CREATE"):
        lakehouse.write_delta(
            spark, df, plain, mode="append", identity_columns={"rid": (1, 1)}
        )
    # zero step is refused
    with pytest.raises(ValueError, match="non-zero"):
        lakehouse.write_delta(
            spark, df, str(tmp_path / "z"), identity_columns={"rid": (1, 0)}
        )
    # identity + column mapping not implemented
    with pytest.raises(NotImplementedError, match="identity"):
        lakehouse.write_delta(
            spark,
            df,
            str(tmp_path / "cm"),
            identity_columns={"rid": (1, 1)},
            column_mapping="id",
        )


def test_identity_survives_overwrite_and_delete(spark, tmp_path):
    """Overwrite regenerates (watermark keeps advancing — the spec never
    reuses values); DV delete leaves generation metadata intact."""
    root = str(tmp_path / "ow")
    lakehouse.write_delta(
        spark,
        spark.range(0, 20).select(F.col("id").alias("k")),
        root,
        identity_columns={"rid": (0, 1)},
    )
    first_hwm = _identity_meta(root, "rid")["delta.identity.highWaterMark"]
    lakehouse.write_delta(
        spark,
        spark.range(0, 5).select(F.col("id").alias("k")),
        root,
        mode="overwrite",
    )
    vals = [r["rid"] for r in lakehouse.read_delta(spark, root).collect()]
    assert len(vals) == 5 and all(v > first_hwm for v in vals)
    lakehouse.delete_delta(spark, root, "k = 2")
    assert lakehouse.read_delta(spark, root).count() == 4
    md = _identity_meta(root, "rid")
    assert md["delta.identity.start"] == 0  # metadata intact post-DV


def test_identity_with_schema_evolution(spark, tmp_path):
    """merge_schema appends on an identity table must not clobber the
    evolved schema when the identity metaData re-emits (round-7 review
    fix: the watermark advance rebuilt schemaString from the OLD schema,
    silently dropping the newly added column from the declared schema)."""
    root = str(tmp_path / "ev")
    lakehouse.write_delta(
        spark,
        spark.range(0, 20).select(F.col("id").alias("k")),
        root,
        identity_columns={"rid": (0, 1)},
    )
    lakehouse.write_delta(
        spark,
        spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
        ),
        root,
        mode="append",
        merge_schema=True,
    )
    out = lakehouse.read_delta(spark, root)
    assert set(out.columns) == {"k", "rid", "extra"}
    rows = out.collect()
    assert len({r["rid"] for r in rows}) == 30  # ids still unique
    assert sum(1 for r in rows if r["extra"] is not None) == 10
    md = _identity_meta(root, "rid")
    assert md["delta.identity.highWaterMark"] == max(r["rid"] for r in rows)
