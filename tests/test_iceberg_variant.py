"""Iceberg v3 VARIANT — READ surface (round 13, spec §Primitive Types +
the parquet-variant binary encoding): Spark-4-written variant parquet
(shredded by default) registers via snapshot_parquet_to_iceberg as a v3
table; scans decode through Spark's native VariantType reader; MoR
deletes, renames (JVM footer fallback — pyarrow cannot parse VARIANT
footers) and time travel work; writes refuse."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import convert, iceberg


def _mk(spark, tmp_path, n=10):
    root = str(tmp_path / "t")
    spark.range(n).selectExpr(
        "id",
        "parse_json(to_json(struct(id AS a, id * 2 AS b, "
        "concat('s', id) AS s))) AS v",
    ).write.parquet(root)
    convert.snapshot_parquet_to_iceberg(spark, root)
    return root


def test_variant_registers_as_v3_and_decodes(spark, tmp_path):
    root = _mk(spark, tmp_path)
    meta = iceberg._load_metadata(root)
    assert meta["format-version"] == 3
    assert meta.get("next-row-id") == 0  # v3: lineage counter present
    fields = iceberg._current_schema(meta)["fields"]
    assert [f["type"] for f in fields] == ["long", "variant"]
    out = iceberg.read_iceberg(spark, root).selectExpr(
        "id",
        "variant_get(v, '$.a', 'bigint') AS a",
        "variant_get(v, '$.s', 'string') AS s",
    )
    assert sorted((r.id, r.a, r.s) for r in out.collect()) == [
        (i, i, f"s{i}") for i in range(10)
    ]
    # the files ARE shredded (Spark 4's default) — this suite pins that
    # the reader handles the shredded layout, not just metadata/value
    import glob

    f = glob.glob(f"{root}/*.parquet")[0]
    blob = open(f, "rb").read()
    flen = int.from_bytes(blob[-8:-4], "little")
    assert b"typed_value" in blob[-(8 + flen):-8]


def test_variant_mor_delete_and_rename(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.delete_iceberg(spark, root, "id = 3")  # v3 -> puffin DV
    iceberg.rename_iceberg_column(root, "v", "payload")
    out = iceberg.read_iceberg(spark, root).selectExpr(
        "id", "variant_get(payload, '$.b', 'bigint') AS b"
    )
    got = sorted((r.id, r.b) for r in out.collect())
    assert got == [(i, i * 2) for i in range(10) if i != 3]


def test_variant_time_travel_and_pruning(spark, tmp_path):
    root = _mk(spark, tmp_path)
    meta = iceberg._load_metadata(root)
    s0 = meta["current-snapshot-id"]
    iceberg.delete_iceberg(spark, root, "id < 5")
    assert iceberg.read_iceberg(spark, root).count() == 5
    assert iceberg.read_iceberg(spark, root, snapshot_id=s0).count() == 10
    # predicate scan works; variant column carries no bounds (fail-open)
    assert iceberg.read_iceberg(spark, root, where="id >= 8").count() == 2


def test_variant_writes_refuse(spark, tmp_path):
    root = _mk(spark, tmp_path)
    df = iceberg.read_iceberg(spark, root).limit(1)
    with pytest.raises((NotImplementedError, ValueError)):
        iceberg.write_iceberg(spark, df, root, format_version=3)
    # CREATE refuses too, with the targeted read-only message
    df2 = spark.range(1).selectExpr("id", "parse_json('1') AS v")
    with pytest.raises(NotImplementedError, match="read-only"):
        iceberg.write_iceberg(
            spark, df2, str(tmp_path / "new"), format_version=3
        )


def test_variant_defaults_stay_refused(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises((NotImplementedError, ValueError)):
        iceberg.add_iceberg_column(root, "w", "variant")


def test_variant_in_v2_metadata_refused(spark, tmp_path):
    """'variant' is a v3-ONLY type (spec §Schemas): a v1/v2 metadata
    file declaring it is spec-invalid foreign/corrupt metadata and must
    refuse at load, not scan fail-open (ADVICE r13)."""
    import json
    import os

    root = _mk(spark, tmp_path)
    meta_dir = os.path.join(root, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    with open(hint) as fh:
        v = fh.read().strip()
    mf = os.path.join(meta_dir, f"v{v}.metadata.json")
    meta = json.load(open(mf))
    meta["format-version"] = 2
    json.dump(meta, open(mf, "w"))
    with pytest.raises(ValueError, match="v3-only type 'variant'"):
        iceberg._load_metadata(root)


def test_variant_zero_row_file_registers_exact(spark, tmp_path):
    """A zero-row variant parquet file (footer pyarrow cannot decode)
    produces no groupBy row in the registration's row-count backfill —
    record_count=0 is EXACT for it, not a silent default (ADVICE r13:
    the missing-key fallback is provably-empty-only now)."""
    root = str(tmp_path / "t0")
    spark.range(10).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    ).repartition(1).write.parquet(root)
    spark.range(0).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    ).repartition(1).write.mode("append").parquet(root)
    convert.snapshot_parquet_to_iceberg(spark, root)
    meta = iceberg._load_metadata(root)
    snap = meta["snapshots"][-1]["snapshot-id"]
    data, _ = iceberg._snapshot_scan_plan(meta, snap, root)
    assert len(data) == 2
    assert iceberg.read_iceberg(spark, root).count() == 10
