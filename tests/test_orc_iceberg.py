"""Iceberg ORC data-file support (round 9): write_iceberg(
data_format='orc') staging via pyarrow.orc with iceberg.id field
attributes + write-pass manifest bounds, and the field-id-safe
distributed read path (_read_orc_data). Mirrors the AVRO round-9
surface in tests/test_avro_iceberg.py; the formats share the manifest
stats encoder and the scan prelude."""

import datetime as dt
import os

import pytest

from feature_store_ml_spark.io import iceberg


def test_write_iceberg_orc_roundtrip_and_bounds(spark, tmp_path):
    """write_iceberg(data_format='orc'): executor-side pyarrow.orc
    staging with iceberg.id-stamped fields, per-file stats from the same
    pass (vectorized pyarrow.compute, no ORC footer API needed), manifest
    entries marked ORC — readable back with typed decode, and bounds
    pruning engages exactly like the parquet path."""
    df = spark.createDataFrame(
        [
            (
                i,
                None if i == 5 else f"n{i}",
                dt.date(2024, 1, 1 + i % 3),
                dt.datetime(2024, 1, 1, 0, 0, i),
                i / 4.0,
                i % 2 == 0,
            )
            for i in range(20)
        ],
        "id long, name string, d date, ts timestamp_ntz, v double, flag boolean",
    )
    root = str(tmp_path / "orc_rt")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    back = iceberg.read_iceberg(spark, root)
    assert back.count() == 20
    r = back.where("id = 7").collect()[0]
    assert r.name == "n7"
    assert r.d == dt.date(2024, 1, 2)
    assert r.ts == dt.datetime(2024, 1, 1, 0, 0, 7)
    assert r.v == 1.75 and r.flag is False
    assert back.where("name IS NULL").count() == 1
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)
    assert all(d["format"] == "ORC" for d in data)
    assert all(d.get("lower_bounds") for d in data)
    rep = iceberg.iceberg_scan_report(root, "id >= 1000")
    assert rep["eligible"] and rep["kept_files"] == 0
    # appends compose
    iceberg.write_iceberg(
        spark, df.where("id < 3"), root, format_version=2, data_format="orc"
    )
    assert iceberg.read_iceberg(spark, root).count() == 23


def test_write_iceberg_orc_partitioned_prunes(spark, tmp_path):
    """Identity-partitioned ORC table: typed partition tuples in the
    manifest, partition pruning engages, values roundtrip."""
    df = spark.createDataFrame(
        [(i, f"n{i}", dt.date(2024, 1, 1 + i % 3)) for i in range(30)],
        "id long, name string, d date",
    ).coalesce(2)
    root = str(tmp_path / "orc_part")
    iceberg.write_iceberg(
        spark, df, root, format_version=2, data_format="orc", partition_by=["d"]
    )
    back = iceberg.read_iceberg(spark, root)
    assert back.count() == 30
    rep = iceberg.iceberg_scan_report(root, "d = DATE '2024-01-02'")
    assert rep["eligible"] and 0 < rep["kept_files"] < rep["total_files"]
    got = iceberg.read_iceberg(spark, root, where="d = DATE '2024-01-02'")
    assert got.count() == 10
    assert {r.id % 3 for r in got.collect()} == {1}
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)
    days = {d["partition"]["d"] for d in data}
    assert days == {19723, 19724, 19725}


def test_orc_field_id_resolution_after_rename(spark, tmp_path):
    """ORC columns must resolve by the iceberg.id type attribute, not
    name — after rename_iceberg_column the old files keep the old name
    and a name-based read would silently null the column."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    root = str(tmp_path / "orc_ren")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    iceberg.rename_iceberg_column(root, "name", "label")
    rows = {r.id: r.label for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {1: "a", 2: "b"}
    # and a post-rename ORC generation mixes with the pre-rename one
    df2 = spark.createDataFrame([(3, "c")], "id long, label string")
    iceberg.write_iceberg(spark, df2, root, format_version=2, data_format="orc")
    rows = {r.id: r.label for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}


def test_orc_column_added_after_file_null_fills(spark, tmp_path):
    """An iceberg.id absent from an id-stamped file means the column was
    added AFTER the file — null-fill is provably correct there."""
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    root = str(tmp_path / "orc_evo")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    df2 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, v double")
    iceberg.write_iceberg(
        spark, df2, root, format_version=2, data_format="orc", merge_schema=True
    )
    rows = {r.id: r for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows[1].v is None and rows[2].v == 9.5


def test_orc_missing_column_without_ids_fails_loud(spark, tmp_path):
    """A foreign ORC file without iceberg.id attributes resolves by name
    and must FAIL LOUDLY on a missing declared column (null-filling
    would silently erase a renamed column's data)."""
    import pyarrow as pa
    import pyarrow.orc as orc

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    root = str(tmp_path / "orc_foreign")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    # overwrite the data file with an attribute-less ORC file missing
    # the 'name' column entirely
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)
    target = data[0]["path"]
    orc.write_table(pa.table({"id": pa.array([1], pa.int64())}), target)
    with pytest.raises(Exception, match="absent from an ORC data file"):
        iceberg.read_iceberg(spark, root).collect()


def test_orc_foreign_file_name_resolution_works(spark, tmp_path):
    """A foreign attribute-less ORC file whose names all match the
    declared schema reads by name (the name-mapping escape hatch)."""
    import pyarrow as pa
    import pyarrow.orc as orc

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    root = str(tmp_path / "orc_foreign_ok")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)
    target = data[0]["path"]
    orc.write_table(
        pa.table(
            {"id": pa.array([7], pa.int64()), "name": pa.array(["z"])}
        ),
        target,
    )
    rows = iceberg.read_iceberg(spark, root).collect()
    assert len(rows) == 1 and rows[0].id == 7 and rows[0].name == "z"


def test_orc_delete_lifecycle(spark, tmp_path):
    """Row-level DELETE on an ORC table (round 9): the rowfmt scan emits
    its own (_fp, _ri) row identity — decode order is file order — so
    delete_iceberg's position-delete write works unchanged, the masked
    read applies it, a SECOND delete names ORIGINAL file ordinals (the
    spec contract), and compaction rewrites to clean parquet."""
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "id long, name string"
    )
    root = str(tmp_path / "orc_del")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    iceberg.delete_iceberg(spark, root, "id IN (3, 7)")
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(20) if i not in (3, 7)]
    # second delete: ordinals must reference ORIGINAL file positions
    iceberg.delete_iceberg(spark, root, "id = 11")
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(20) if i not in (3, 7, 11)]
    # predicate pushes into the masked scan
    assert iceberg.read_iceberg(spark, root, where="id >= 10").count() == 9
    # compaction applies the masks and lands parquet
    iceberg.compact_iceberg(spark, root)
    meta = iceberg._load_metadata(root)
    data, dels = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    assert not dels and all(d["format"] == "PARQUET" for d in data)
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(20) if i not in (3, 7, 11)]


def test_orc_equality_delete_on_orc_data(spark, tmp_path):
    """Equality deletes apply to ORC DATA files under the strictly-older
    sequence rule (re-ingested keys live)."""
    root = str(tmp_path / "orc_eq_on_orc")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id"), root, format_version=2,
        data_format="orc",
    )
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(4,)], "id long")
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(10) if i != 4]
    iceberg.write_iceberg(
        spark, spark.createDataFrame([(4,)], "id long"), root,
        format_version=2, data_format="orc",
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == list(range(10))


def test_mixed_format_with_deletes_works(spark, tmp_path):
    """Round 10: deletes on a table MIXING rowfmt and parquet data
    files work — each format group runs its own mask pipeline
    (position deletes key on the target file's path, so each pipeline
    consumes only its own rows) and the legs union at exit."""
    root = str(tmp_path / "orc_mixed_del")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2,
        data_format="orc",
    )
    iceberg.write_iceberg(
        spark, spark.range(5, 10).select("id"), root, format_version=2
    )
    # one commit masking a row in EACH format group
    iceberg.delete_iceberg(spark, root, "id IN (3, 7)")
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [0, 1, 2, 4, 5, 6, 8, 9]


def test_orc_mixed_with_parquet_unpartitioned_unions(spark, tmp_path):
    """Unpartitioned mixed ORC+parquet tables union both subsets."""
    df = spark.createDataFrame([(1, "o")], "id long, name string")
    root = str(tmp_path / "orc_mixed")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(2, "p")], "id long, name string"),
        root,
        format_version=2,
    )
    rows = {r.id: r.name for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {1: "o", 2: "p"}


def test_orc_avro_parquet_three_format_union(spark, tmp_path):
    """One unpartitioned table carrying all three data-file formats reads
    as the union of the three subsets."""
    root = str(tmp_path / "tri")
    mk = lambda i, n: spark.createDataFrame([(i, n)], "id long, name string")
    iceberg.write_iceberg(spark, mk(1, "orc"), root, format_version=2, data_format="orc")
    iceberg.write_iceberg(spark, mk(2, "avro"), root, format_version=2, data_format="avro")
    iceberg.write_iceberg(spark, mk(3, "parquet"), root, format_version=2)
    rows = {r.id: r.name for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {1: "orc", 2: "avro", 3: "parquet"}


def test_orc_compact_rewrites_to_parquet(spark, tmp_path):
    """compact_iceberg reads the ORC table through the masked scan and
    rewrites to parquet — the stated escape hatch for every ORC
    refusal."""
    df = spark.createDataFrame(
        [(i, f"n{i}", i / 2.0) for i in range(12)], "id long, name string, v double"
    )
    root = str(tmp_path / "orc_compact")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    iceberg.compact_iceberg(spark, root)
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)
    assert all(d["format"] == "PARQUET" for d in data)
    back = iceberg.read_iceberg(spark, root)
    assert back.count() == 12
    assert back.where("id = 11").collect()[0].v == 5.5


def test_orc_timestamp_ntz_is_session_tz_independent(spark, tmp_path):
    """ORC plain timestamp is wall-clock: the decoded value must not
    shift with the session timezone (the reason timestamptz refuses)."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 30, 45))], "id long, ts timestamp_ntz"
    )
    root = str(tmp_path / "orc_ntz")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = iceberg.read_iceberg(spark, root).collect()[0].ts
            assert got == dt.datetime(2024, 6, 1, 12, 30, 45), tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_orc_nullable_int_column_roundtrip(spark, tmp_path):
    """Nullable long columns (float64-with-NaN through arrow) survive
    the staging and read coercions losslessly."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 2**40)], "id long, v long"
    )
    root = str(tmp_path / "orc_nullint")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    rows = {r.id: r.v for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {1: 10, 2: None, 3: 2**40}


def test_write_orc_unsupported_type_fails_loud(spark, tmp_path):
    # binary maps to an iceberg primitive but has no ORC encoding in
    # this writer — the format-specific gate must refuse it
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, b binary")
    with pytest.raises(NotImplementedError, match="orc"):
        iceberg.write_iceberg(
            spark, df, str(tmp_path / "orc_bad"), format_version=2,
            data_format="orc",
        )


def test_incremental_analyze_orc_falls_back(spark, tmp_path):
    """incremental ANALYZE over a table with ORC files must fall back to
    the full scan (footer probe would raise ArrowInvalid) and still
    produce correct NDVs."""
    root = str(tmp_path / "orc_analyze")
    df = spark.createDataFrame([(i % 7,) for i in range(50)], "k long")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    iceberg.analyze_iceberg(spark, root, columns=["k"], k=1024)
    df2 = spark.createDataFrame([(100 + i,) for i in range(5)], "k long")
    iceberg.write_iceberg(spark, df2, root, format_version=2, data_format="orc")
    iceberg.analyze_iceberg(spark, root, columns=["k"], k=1024, incremental=True)
    st = iceberg.table_statistics(root)
    assert st["ndv"]["k"] == 12


# --------------------------------------- round 9: ORC position deletes ----


def _transcode_pos_deletes_to_orc(root):
    """Foreign-writer shape (Hive/Trino ORC writers): rewrite every
    position-delete parquet as an ORC file and patch the delete
    manifests to record ORC."""
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    from feature_store_ml_spark.io import avro_lite

    meta = iceberg._load_metadata(root)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    mlist = iceberg._localize(snap["manifest-list"], root)
    swapped = 0
    for e in avro_lite.read_container(mlist):
        if (e.get("content", 0) or 0) != 1:
            continue
        mpath = iceberg._localize(e["manifest_path"], root)
        rows = avro_lite.read_container(mpath)
        changed = False
        for m in rows:
            df_struct = m["data_file"]
            if (df_struct.get("content") or 0) != 1:
                continue
            old = iceberg._localize_decoded(df_struct["file_path"], root)
            t = pq.read_table(old, columns=["file_path", "pos"])
            new = old.rsplit(".", 1)[0] + ".orc"
            orc.write_table(t, new)
            os.unlink(old)
            df_struct["file_path"] = f"file:{new}"
            df_struct["file_format"] = "ORC"
            df_struct["file_size_in_bytes"] = os.path.getsize(new)
            swapped += 1
            changed = True
        if changed:
            avro_lite.write_container(
                mpath, iceberg._manifest_entry_schema(2), rows
            )
    assert swapped, "no position-delete files found to transcode"


def test_orc_position_deletes_mask_rows(spark, tmp_path):
    """ORC position-delete files mask exactly like parquet ones
    (container-magic sniff → pyarrow.orc inside mapInPandas)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "orc_posdel")
    df = spark.range(0, 50).select("id", (F.col("id") * 2).alias("v"))
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.delete_iceberg(spark, root, "id % 9 = 4")
    expected = sorted(i for i in range(50) if i % 9 != 4)
    _transcode_pos_deletes_to_orc(root)
    back = iceberg.read_iceberg(spark, root)
    assert sorted(r.id for r in back.collect()) == expected
    assert back.where("id = 6").collect()[0].v == 12


def test_orc_position_deletes_in_cdf(spark, tmp_path):
    root = str(tmp_path / "orc_posdel_cdf")
    s0 = iceberg.write_iceberg(
        spark, spark.range(10).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg(spark, root, "id IN (2, 8)")
    _transcode_pos_deletes_to_orc(root)
    cdf = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)
    assert {(r.id, r._change_type) for r in cdf.collect()} == {
        (2, "delete"),
        (8, "delete"),
    }


def test_orc_pos_deletes_fold_into_delta_dvs(spark, tmp_path):
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "orc_posdel_conv")
    iceberg.write_iceberg(
        spark, spark.range(0, 30).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg(spark, root, "id IN (1, 17)")
    _transcode_pos_deletes_to_orc(root)
    convert.convert_iceberg_to_delta(spark, root)
    got = sorted(r.id for r in lakehouse.read_delta(spark, root).collect())
    assert got == sorted(set(range(30)) - {1, 17})


def _transcode_eq_deletes_to_orc(root):
    """Rewrite every equality-delete parquet as ORC with iceberg.id
    attributes on RENAMED fields (id-resolution proof), patching the
    delete manifests."""
    import pyarrow as pa
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    from feature_store_ml_spark.io import avro_lite

    meta = iceberg._load_metadata(root)
    fid_of = {
        f["name"]: f["id"]
        for f in iceberg._current_schema(meta).get("fields", [])
    }
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    mlist = iceberg._localize(snap["manifest-list"], root)
    swapped = 0
    for e in avro_lite.read_container(mlist):
        if (e.get("content", 0) or 0) != 1:
            continue
        mpath = iceberg._localize(e["manifest_path"], root)
        rows = avro_lite.read_container(mpath)
        changed = False
        for m in rows:
            df_struct = m["data_file"]
            if (df_struct.get("content") or 0) != 2:
                continue
            old = iceberg._localize_decoded(df_struct["file_path"], root)
            t = pq.read_table(old)
            sch = pa.schema(
                [
                    pa.field(
                        f"foreign_{fld.name}",
                        fld.type,
                        metadata={"iceberg.id": str(fid_of[fld.name])},
                    )
                    for fld in t.schema
                ]
            )
            t2 = t.rename_columns([f"foreign_{n}" for n in t.schema.names])
            t2 = t2.cast(sch)
            new = old.rsplit(".", 1)[0] + ".orc"
            orc.write_table(t2, new)
            os.unlink(old)
            df_struct["file_path"] = f"file:{new}"
            df_struct["file_format"] = "ORC"
            df_struct["file_size_in_bytes"] = os.path.getsize(new)
            swapped += 1
            changed = True
        if changed:
            avro_lite.write_container(
                mpath, iceberg._manifest_entry_schema(2), rows
            )
    assert swapped, "no equality-delete files found to transcode"


def test_orc_equality_deletes_apply(spark, tmp_path):
    """Equality-delete files in ORC apply: keys resolve by the
    iceberg.id attribute from the file's own schema (fields renamed in
    the transcode to prove it)."""
    root = str(tmp_path / "orc_eqdel")
    iceberg.write_iceberg(
        spark, spark.range(12).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(5,), (9,)], "id long")
    )
    _transcode_eq_deletes_to_orc(root)
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(12) if i not in (5, 9)]
    # strictly-older scoping: a re-ingested key lives
    iceberg.write_iceberg(
        spark, spark.createDataFrame([(5,)], "id long"), root,
        format_version=2,
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(12) if i != 9]


# ----------------------------------------- round 9: timestamptz columns ----


def test_timestamptz_roundtrip_both_formats(spark, tmp_path):
    """timestamptz (Spark TimestampType) columns now write and read in
    AVRO and ORC data files: the writer localizes the session wall clock
    back to the UTC instant, the reader hands Spark tz-aware values —
    so the INSTANT is stable no matter which session timezone writes or
    reads. Verified by comparing unix_micros under rotating timezones."""
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for fmt in ("avro", "orc"):
            spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
            df = spark.range(0, 5).select(
                "id",
                F.timestamp_seconds(F.lit(1718000000) + F.col("id")).alias(
                    "tsz"
                ),
            )
            want = [
                r[0]
                for r in df.select(F.unix_micros("tsz")).orderBy("id").collect()
            ]
            root = str(tmp_path / f"tsz_{fmt}")
            iceberg.write_iceberg(
                spark, df, root, format_version=2, data_format=fmt
            )
            # a DIFFERENT session timezone reads the same instants
            for tz in ("UTC", "America/New_York"):
                spark.conf.set("spark.sql.session.timeZone", tz)
                got = [
                    r[0]
                    for r in iceberg.read_iceberg(spark, root)
                    .select(F.unix_micros("tsz"))
                    .orderBy(F.col("tsz"))
                    .collect()
                ]
                assert got == want, (fmt, tz)
            # manifest bounds carried (write-pass stats on the tz column)
            meta = iceberg._load_metadata(root)
            data, _ = iceberg._snapshot_scan_plan(
                meta, meta["current-snapshot-id"], root
            )
            assert all(d.get("lower_bounds") for d in data), fmt
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_timestamptz_null_and_mixed_parquet_union(spark, tmp_path):
    """Nullable timestamptz values survive, and an ORC generation unions
    with a parquet generation carrying the same tsz column."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "tsz_mixed")
    df = spark.createDataFrame(
        [(1, 1718000000), (2, None)], "id long, secs long"
    ).select("id", F.timestamp_seconds("secs").alias("tsz"))
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    df2 = spark.createDataFrame(
        [(3, 1718000555)], "id long, secs long"
    ).select("id", F.timestamp_seconds("secs").alias("tsz"))
    iceberg.write_iceberg(spark, df2, root, format_version=2)
    back = iceberg.read_iceberg(spark, root)
    rows = {
        r.id: r[0]
        for r in back.select(F.unix_micros("tsz"), "id").collect()
    }
    assert rows == {1: 1718000000_000000, 2: None, 3: 1718000555_000000}


def test_mor_dml_on_orc_table_stages_orc_replacements(spark, tmp_path):
    """Round 10: update/merge/overwrite-where on an ORC table stage
    their replacement data files in ORC (resolved by _mor_data_format),
    so the snapshot never mixes formats under delete content — the state
    the round-9 guard refused upfront. Only a genuinely MIXED table
    still refuses (tests/test_rowfmt_dml.py)."""
    root = str(tmp_path / "orc_dml")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(10)], "id long, name string"
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    iceberg.update_iceberg(spark, root, {"name": "'x'"}, where="id = 1")
    iceberg.merge_iceberg(
        spark,
        spark.createDataFrame([(1, "m"), (10, "new")], "id long, name string"),
        root,
        ["id"],
    )
    iceberg.overwrite_iceberg_where(
        spark,
        spark.createDataFrame([(2, "o")], "id long, name string"),
        root,
        "id = 2",
    )
    back = {r.id: r.name for r in iceberg.read_iceberg(spark, root).collect()}
    assert back[1] == "m" and back[2] == "o" and back[10] == "new"
    assert len(back) == 11
    meta = iceberg._load_metadata(root)
    data, dels = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    assert {d["format"] for d in data} == {"ORC"}
    assert dels, "MoR DML must carry position-delete files"
    # compaction still physically drops the masked rows afterwards
    iceberg.compact_iceberg(spark, root)
    assert iceberg.read_iceberg(spark, root).count() == 11


def test_cdf_over_orc_table(spark, tmp_path):
    """read_iceberg_cdf over an ORC data table (round 9): inserts from
    the rowfmt readers, position-delete records joined against the
    readers' own (_fp, _ri) identity, equality deletes against the
    masked rowfmt scan."""
    root = str(tmp_path / "orc_cdf")
    s0 = iceberg.write_iceberg(
        spark, spark.range(10).select("id"), root, format_version=2,
        data_format="orc",
    )
    s1 = iceberg.write_iceberg(
        spark, spark.range(10, 15).select("id"), root, format_version=2,
        data_format="orc",
    )
    s2 = iceberg.delete_iceberg(spark, root, "id IN (3, 12)")
    s3 = iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(3,), (4,)], "id long")
    )
    cdf = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)
    rows = [(r.id, r._change_type, r._commit_snapshot_id) for r in cdf.collect()]
    inserts = {(i, s) for i, t, s in rows if t == "insert"}
    deletes = {(i, s) for i, t, s in rows if t == "delete"}
    assert inserts == {(i, s1) for i in range(10, 15)}
    # id=3 deleted once (position delete at s2); the equality delete at
    # s3 kills only id=4 (3 already masked)
    assert deletes == {(3, s2), (12, s2), (4, s3)}


def test_incremental_changes_over_avro_appends(spark, tmp_path):
    """read_iceberg_changes routes non-parquet added files through the
    rowfmt readers."""
    root = str(tmp_path / "avro_changes")
    s0 = iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2,
        data_format="avro",
    )
    iceberg.write_iceberg(
        spark, spark.range(5, 9).select("id"), root, format_version=2,
        data_format="avro",
    )
    got = sorted(
        r.id for r in iceberg.read_iceberg_changes(spark, root, s0).collect()
    )
    assert got == [5, 6, 7, 8]


def test_convert_rowfmt_to_delta_refuses(spark, tmp_path):
    """The Delta protocol is parquet-only: converting an ORC/AVRO table
    must refuse with the compact escape hatch, not crash in the footer
    harvest."""
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "orc2delta")
    iceberg.write_iceberg(
        spark, spark.range(8).select("id"), root, format_version=2,
        data_format="orc",
    )
    with pytest.raises(NotImplementedError, match="parquet-only"):
        convert.convert_iceberg_to_delta(spark, root)
    # escape hatch: compact to parquet, then convert works
    iceberg.compact_iceberg(spark, root)
    convert.convert_iceberg_to_delta(spark, root)
    assert lakehouse.read_delta(spark, root).count() == 8


def test_bucket_transform_partitioned_orc_prunes(spark, tmp_path):
    """Non-identity (murmur3 bucket) partition transforms compose with
    ORC staging — the derive-column path is format-independent — and
    bucket pruning engages on the point predicate."""
    root = str(tmp_path / "orc_bucket")
    df = spark.createDataFrame(
        [(i, f"n{i % 4}") for i in range(20)], "id long, name string"
    )
    iceberg.write_iceberg(
        spark, df, root, format_version=2, data_format="orc",
        partition_by=["bucket(4, id)"],
    )
    assert iceberg.read_iceberg(spark, root).count() == 20
    rep = iceberg.iceberg_scan_report(root, "id = 7")
    assert rep["eligible"] and rep["kept_files"] < rep["total_files"]
    assert [r.id for r in
            iceberg.read_iceberg(spark, root, where="id = 7").collect()] == [7]


def test_sort_by_composes_with_avro(spark, tmp_path):
    root = str(tmp_path / "avro_sort")
    df = spark.createDataFrame(
        [(i, f"n{i % 4}") for i in range(20)], "id long, name string"
    )
    iceberg.write_iceberg(
        spark, df, root, format_version=2, data_format="avro",
        sort_by=["name", "id"],
    )
    assert iceberg.read_iceberg(spark, root).count() == 20
