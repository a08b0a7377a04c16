"""Iceberg v3 COLUMN DEFAULT VALUES (round 12 — spec §Default values):
add_iceberg_column(default=) writes initial-default / write-default into
the schema JSON; scans surface initial-default for rows in files that
predate the field (parquet, AVRO and ORC legs alike, keyed by field id);
appends that omit the column materialize write-default; defaults survive
renames and refuse below format-version 3."""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _mk(spark, tmp_path, name="t", fv=3, data_format="parquet"):
    root = str(tmp_path / name)
    iceberg.write_iceberg(
        spark,
        spark.range(8).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=fv,
        data_format=data_format,
    )
    return root


def test_initial_default_backfills_old_files(spark, tmp_path):
    root = _mk(spark, tmp_path)
    files_before = sorted(os.listdir(os.path.join(root, "data")))
    iceberg.add_iceberg_column(root, "chan", "string", default="legacy")
    # metadata-only: zero data files touched
    assert sorted(os.listdir(os.path.join(root, "data"))) == files_before
    back = iceberg.read_iceberg(spark, root)
    assert {r.chan for r in back.collect()} == {"legacy"}


def test_write_default_materializes_on_omitting_append(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.add_iceberg_column(
        root, "chan", "string", default="legacy", write_default="web"
    )
    iceberg.write_iceberg(
        spark,
        spark.range(8, 12).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=3,
    )
    got = {(r.id, r.chan) for r in iceberg.read_iceberg(spark, root).collect()}
    want = {(i, "legacy") for i in range(8)} | {(i, "web") for i in range(8, 12)}
    assert got == want
    # explicit values are untouched by the write-default machinery
    iceberg.write_iceberg(
        spark,
        spark.range(12, 14).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("chan")
        ),
        root,
        format_version=3,
    )
    got = {(r.id, r.chan) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == want | {(12, "x"), (13, "x")}


def test_default_survives_rename(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.add_iceberg_column(root, "score", "long", default=7)
    iceberg.rename_iceberg_column(root, "score", "points")
    back = iceberg.read_iceberg(spark, root)
    assert {r.points for r in back.collect()} == {7}
    fld = next(
        f
        for f in iceberg._current_schema(iceberg._load_metadata(root))["fields"]
        if f["name"] == "points"
    )
    assert fld["initial-default"] == 7 and fld["write-default"] == 7


@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_default_on_rowfmt_files(spark, tmp_path, fmt):
    root = _mk(spark, tmp_path, fv=3, data_format=fmt)
    iceberg.add_iceberg_column(root, "chan", "string", default="old")
    iceberg.add_iceberg_column(root, "score", "double", default=2.5)
    iceberg.write_iceberg(
        spark,
        spark.range(8, 11).select(
            "id",
            (F.col("id") * 2).alias("v"),
            F.lit("new").alias("chan"),
            F.lit(9.0).alias("score"),
        ),
        root,
        format_version=3,
        data_format=fmt,
    )
    got = {
        (r.id, r.chan, r.score)
        for r in iceberg.read_iceberg(spark, root).collect()
    }
    want = {(i, "old", 2.5) for i in range(8)} | {
        (i, "new", 9.0) for i in range(8, 11)
    }
    assert got == want


def test_typed_defaults_roundtrip(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.add_iceberg_column(
        root, "d", "date", default=datetime.date(2020, 1, 2)
    )
    iceberg.add_iceberg_column(
        root,
        "ts",
        "timestamptz",
        default=datetime.datetime(
            2020, 1, 2, 3, 4, 5, tzinfo=datetime.timezone.utc
        ),
    )
    iceberg.add_iceberg_column(root, "dec", "decimal(10,2)", default="12.34")
    iceberg.add_iceberg_column(root, "ok", "boolean", default=True)
    r = iceberg.read_iceberg(spark, root).limit(1).collect()[0]
    assert r.d == datetime.date(2020, 1, 2)
    assert str(r.dec) == "12.34"
    assert r.ok is True
    # the JSON single-value serialization is what landed in the metadata
    flds = {
        f["name"]: f
        for f in iceberg._current_schema(iceberg._load_metadata(root))["fields"]
    }
    assert flds["d"]["initial-default"] == "2020-01-02"
    assert flds["dec"]["initial-default"] == "12.34"
    assert flds["ok"]["initial-default"] is True


def test_default_after_mor_delete(spark, tmp_path):
    # DV-masked files still surface the default for surviving rows
    root = _mk(spark, tmp_path)
    iceberg.delete_iceberg(spark, root, "id % 2 = 0")
    iceberg.add_iceberg_column(root, "chan", "string", default="legacy")
    got = {(r.id, r.chan) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {(i, "legacy") for i in range(8) if i % 2 == 1}


def test_required_column_needs_default_and_v2_refuses(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="REQUIRED column without a default"):
        iceberg.add_iceberg_column(root, "x", "long", required=True)
    iceberg.add_iceberg_column(root, "x", "long", default=1, required=True)
    assert {r.x for r in iceberg.read_iceberg(spark, root).collect()} == {1}
    v2 = _mk(spark, tmp_path, name="v2", fv=2)
    with pytest.raises(ValueError, match="format-version 3"):
        iceberg.add_iceberg_column(v2, "x", "long", default=1)
    # plain add (no default) is fine on v2 and null-backfills
    iceberg.add_iceberg_column(v2, "x", "long")
    assert {r.x for r in iceberg.read_iceberg(spark, v2).collect()} == {None}


def test_malformed_foreign_default_refuses_at_load(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.add_iceberg_column(root, "d", "date", default="2020-01-02")
    mp = iceberg.latest_metadata_path(root)
    with open(mp) as fh:
        meta = json.load(fh)
    for s in meta.get("schemas", []):
        for f in s.get("fields", []):
            if f["name"] == "d":
                f["initial-default"] = "not-a-date"
    if meta.get("schema"):
        for f in meta["schema"].get("fields", []):
            if f["name"] == "d":
                f["initial-default"] = "not-a-date"
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="unparseable column default"):
        iceberg._load_metadata(root)


def test_last_column_id_advances(spark, tmp_path):
    root = _mk(spark, tmp_path)
    before = iceberg._load_metadata(root).get("last-column-id", 0)
    iceberg.add_iceberg_column(root, "x", "long")
    meta = iceberg._load_metadata(root)
    fid = next(
        f["id"]
        for f in iceberg._current_schema(meta)["fields"]
        if f["name"] == "x"
    )
    assert fid > before
    assert meta.get("last-column-id", 0) >= fid


def test_convert_to_delta_refuses_stale_defaulted_files(spark, tmp_path):
    """Round 12: a Delta view cannot express initial-default (its
    readers null-backfill absent columns), so conversion refuses while
    any live file predates a defaulted column — and succeeds once
    compaction rewrites them (the default materializes into the data)."""
    from feature_store_ml_spark.io import convert, lakehouse

    root = _mk(spark, tmp_path)
    iceberg.add_iceberg_column(root, "chan", "string", default="legacy")
    with pytest.raises(NotImplementedError, match="predate defaulted"):
        convert.convert_iceberg_to_delta(spark, root)
    iceberg.compact_iceberg(spark, root)
    convert.convert_iceberg_to_delta(spark, root)
    back = lakehouse.read_delta(spark, root)
    assert {r.chan for r in back.collect()} == {"legacy"}


def test_merge_insert_gets_write_default(spark, tmp_path):
    """A plain-update MERGE whose source omits a defaulted column: the
    spec's write-default obligation applies to its INSERTS; matched rows
    KEEP their value (auto partial-update form). Explicit set_clauses /
    newer_wins paths keep the caller's contract untouched."""
    root = _mk(spark, tmp_path)
    iceberg.add_iceberg_column(
        root, "chan", "string", default="legacy", write_default="web"
    )
    src = spark.createDataFrame([(1, -1), (99, 99)], "id bigint, v bigint")
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    got = {
        (r.id, r.v, r.chan)
        for r in iceberg.read_iceberg(spark, root).collect()
    }
    assert (1, -1, "legacy") in got      # updated, default column kept
    assert (99, 99, "web") in got        # inserted, write-default applied
    assert (0, 0, "legacy") in got       # untouched
    # a source omitting a NON-defaulted column still fails loud
    iceberg.add_iceberg_column(root, "plain", "long")
    with pytest.raises(ValueError, match="schema mismatch"):
        iceberg.merge_iceberg(
            spark,
            spark.createDataFrame([(2, 5)], "id bigint, v bigint"),
            root,
            keys=["id"],
        )


def test_nonfinite_float_default_refused(spark, tmp_path):
    """NaN/Infinity defaults must be refused (ADVICE r12): json.dumps
    would emit non-RFC tokens into *.metadata.json and the spec's JSON
    single-value serialization has no NaN representation — strict
    parsers and foreign readers reject the whole metadata file."""
    root = _mk(spark, tmp_path, name="nf")
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="finite"):
            iceberg.add_iceberg_column(root, "w", "double", default=bad)
        with pytest.raises(ValueError, match="finite"):
            iceberg.add_iceberg_column(root, "w", "float", default=bad)
    # the metadata file must still be strict-JSON parseable afterwards
    iceberg.add_iceberg_column(root, "w", "double", default=1.5)
    assert {r.w for r in iceberg.read_iceberg(spark, root).collect()} == {1.5}
