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


def test_variant_write_gates(spark, tmp_path):
    """Writes land in round 14 — the remaining gates are the v3-only
    type rule and the parquet-only staging leg."""
    df2 = spark.range(1).selectExpr("id", "parse_json('1') AS v")
    with pytest.raises(ValueError, match="v3-only"):
        iceberg.write_iceberg(
            spark, df2, str(tmp_path / "v2"), format_version=2
        )
    with pytest.raises(NotImplementedError, match="parquet only"):
        iceberg.write_iceberg(
            spark,
            df2,
            str(tmp_path / "avro"),
            format_version=3,
            data_format="avro",
        )


def test_variant_defaults_stay_refused(spark, tmp_path):
    root = _mk(spark, tmp_path)
    # ADD COLUMN variant works (round 14) — defaults on it refuse
    with pytest.raises((NotImplementedError, ValueError)):
        iceberg.add_iceberg_column(root, "w", "variant", default="1")
    iceberg.add_iceberg_column(root, "w", "variant")
    back = iceberg.read_iceberg(spark, root)
    assert back.selectExpr("count(w) AS n").collect()[0].n == 0  # null backfill


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


def test_variant_write_lifecycle(spark, tmp_path):
    """Round 14 (VERDICT r13 item 2): CREATE a v3 variant table through
    write_iceberg, append, MoR DV delete keyed on variant_get, rename,
    post-rename append — every generation decodes."""
    root = str(tmp_path / "w")

    def gen(a, b):
        return spark.range(a, b).selectExpr(
            "id", "parse_json(to_json(struct(id AS a, id * 2 AS b))) AS v"
        )

    iceberg.write_iceberg(spark, gen(0, 10), root, format_version=3)
    meta = iceberg._load_metadata(root)
    assert meta["format-version"] == 3
    assert "next-row-id" in meta  # v3 lineage mandatory
    fields = iceberg._current_schema(meta)["fields"]
    assert [f["type"] for f in fields if f["name"] == "v"] == ["variant"]
    # record_count backfill was exact (pyarrow cannot read the footers):
    # the first snapshot's manifest entries must sum to the 10 rows
    from feature_store_ml_spark.io import avro_lite

    snap = meta["snapshots"][0]
    total = 0
    for e in avro_lite.read_container(
        iceberg._localize(snap["manifest-list"], root)
    ):
        for rec in avro_lite.read_container(
            iceberg._localize(e["manifest_path"], root)
        ):
            total += int(rec["data_file"]["record_count"])
    assert total == 10
    iceberg.write_iceberg(spark, gen(10, 15), root, format_version=3)
    iceberg.delete_iceberg(spark, root, "variant_get(v, '$.a', 'long') % 3 = 0")
    iceberg.rename_iceberg_column(root, "v", "payload")
    back = iceberg.read_iceberg(spark, root)
    keep = [i for i in range(15) if i % 3 != 0]
    got = sorted(
        r.a
        for r in back.selectExpr(
            "variant_get(payload, '$.a', 'long') AS a"
        ).collect()
    )
    assert got == keep
    # post-rename append: footers now carry the NEW name; the merged
    # name mapping plus declared-name fallback must resolve BOTH
    df3 = spark.range(15, 18).selectExpr(
        "id", "parse_json(to_json(struct(id AS a, id * 2 AS b))) AS payload"
    )
    iceberg.write_iceberg(spark, df3, root, format_version=3)
    got = sorted(
        r.a
        for r in iceberg.read_iceberg(spark, root)
        .selectExpr("variant_get(payload, '$.a', 'long') AS a")
        .collect()
    )
    assert got == keep + [15, 16, 17]


def test_variant_write_stamps_name_mapping(spark, tmp_path):
    root = str(tmp_path / "nm")
    df = spark.range(3).selectExpr("id", "parse_json('1') AS v")
    iceberg.write_iceberg(spark, df, root, format_version=3)
    meta = iceberg._load_metadata(root)
    nmap = iceberg._table_name_mapping(meta)
    names = {f["name"]: f["id"] for f in iceberg._current_schema(meta)["fields"]}
    assert nmap[names["v"]] == ["v"]
    # rename then append: the mapping MERGES (old name persists)
    iceberg.rename_iceberg_column(root, "v", "w")
    iceberg.write_iceberg(
        spark,
        spark.range(3, 5).selectExpr("id", "parse_json('2') AS w"),
        root,
        format_version=3,
    )
    nmap = iceberg._table_name_mapping(iceberg._load_metadata(root))
    assert nmap[names["v"]] == ["v", "w"]


def test_variant_evolution_and_update(spark, tmp_path):
    root = str(tmp_path / "evo")
    iceberg.write_iceberg(
        spark, spark.range(5).selectExpr("id"), root, format_version=3
    )
    # merge_schema adds a variant column mid-table
    df2 = spark.range(5, 8).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    )
    iceberg.write_iceberg(spark, df2, root, format_version=3, merge_schema=True)
    back = iceberg.read_iceberg(spark, root)
    assert sorted((r.id, r.v is not None) for r in back.collect()) == [
        (i, i >= 5) for i in range(8)
    ]
    # UPDATE with a variant_get predicate (stages replacement files)
    iceberg.update_iceberg(
        spark, root, {"id": "id + 100"}, "variant_get(v, '$.a', 'long') = 6"
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [0, 1, 2, 3, 4, 5, 7, 106]


def test_variant_convert_then_append(spark, tmp_path):
    """Delta->Iceberg conversion of a variant table is write-capable on
    the Iceberg side afterwards (round 14 upgrade from view-only)."""
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "conv")
    dfd = spark.range(4).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    )
    lakehouse.write_delta(spark, dfd, root)
    convert.convert_delta_to_iceberg(spark, root)
    dfa = spark.range(4, 7).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    )
    iceberg.write_iceberg(spark, dfa, root, format_version=3)
    got = sorted(
        r.a
        for r in iceberg.read_iceberg(spark, root)
        .selectExpr("variant_get(v, '$.a', 'long') AS a")
        .collect()
    )
    assert got == list(range(7))


def test_variant_streaming_spool_materializes(spark, tmp_path):
    """Round 14: the file-source tail over a variant table MATERIALIZES
    its files (pyarrow cannot probe the footers, so symlinks could not
    be proven name-safe); values decode off the spool."""
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "vs")
    spool = str(tmp_path / "spool")
    df = spark.range(8).selectExpr(
        "id", "parse_json(to_json(struct(id AS a))) AS v"
    )
    iceberg.write_iceberg(spark, df, root, format_version=3)
    snap = iceberg_source.sync_iceberg_spool(root, spool, spark=spark)
    assert snap == iceberg._load_metadata(root)["current-snapshot-id"]
    got = spark.read.parquet(spool)
    vals = sorted(
        r.a
        for r in got.selectExpr("variant_get(v, '$.a', 'long') AS a").collect()
    )
    assert vals == list(range(8))
    # idempotent re-sync
    iceberg_source.sync_iceberg_spool(root, spool, spark=spark)
    assert spark.read.parquet(spool).count() == 8
