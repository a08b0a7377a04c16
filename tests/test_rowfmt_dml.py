"""Round 10: merge-on-read DML on AVRO/ORC Iceberg tables.

Round 9 refused update/merge/overwrite-where on rowfmt tables upfront
(the parquet replacement files would mix with rowfmt data under delete
content and wedge the table). Round 10 removes the wedge at the root:
``_mor_data_format`` resolves the table's OWN live data-file format and
``_stage_data_entry`` stages the replacement files through the same
AVRO/ORC stagers ``write_iceberg(data_format=...)`` uses — same-format
replacements, nothing mixes. Tables that already mix rowfmt and parquet
stage parquet replacements, and mixed tables are first-class readers
(one mask pipeline per format group).

Also covers the round-10 read-side guarantee: the parquet subset of
mixed-format unions (main scan, incremental changes, CDF) resolves
columns by FIELD ID (shared ``_read_parquet_fid``), so a column renamed
before the first rowfmt append still reads real values from pre-rename
parquet files. A write-side append-format guard existed briefly during
round 10 and was REMOVED in the same round — its premise (mixed formats
under delete content being unreadable) died with the mixed-read fix;
``test_mixed_format_lifecycle_with_deletes`` pins the permissive
behavior.
"""

import datetime as dt

import pytest

from feature_store_ml_spark.io import iceberg


def _fmts_and_deletes(root):
    meta = iceberg._load_metadata(root)
    data, dels = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    return {d["format"] for d in data}, dels


@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_update_stages_same_format_replacements(spark, tmp_path, fmt):
    root = str(tmp_path / f"upd_{fmt}")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, v double",
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format=fmt)
    iceberg.update_iceberg(spark, root, {"v": "v + 1"}, where="id <= 2")
    got = sorted(
        (r.id, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(1, 11.0), (2, 21.0), (3, 30.0)]
    fmts, dels = _fmts_and_deletes(root)
    assert fmts == {fmt.upper()}, "replacement files must match table format"
    assert dels, "UPDATE is merge-on-read: position deletes expected"
    # time travel: the prior snapshot still reads the pre-update rows
    meta = iceberg._load_metadata(root)
    first = min(s["snapshot-id"] for s in meta["snapshots"])
    old = sorted(
        (r.id, r.v)
        for r in iceberg.read_iceberg(spark, root, snapshot_id=first).collect()
    )
    assert old == [(1, 10.0), (2, 20.0), (3, 30.0)]


@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_merge_upsert_on_rowfmt_table(spark, tmp_path, fmt):
    root = str(tmp_path / f"mrg_{fmt}")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id int, name string"
        ),
        root,
        format_version=2,
        data_format=fmt,
    )
    src = spark.createDataFrame([(2, "B"), (4, "d")], "id int, name string")
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    got = dict(
        (r.id, r.name) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    fmts, dels = _fmts_and_deletes(root)
    assert fmts == {fmt.upper()}
    assert dels
    # delete-mode merge also works (pure delete commit, no data files)
    iceberg.merge_iceberg(
        spark,
        spark.createDataFrame([(1,)], "id int"),
        root,
        keys=["id"],
        when_matched="delete",
    )
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, root).collect()
    ) == [2, 3, 4]


@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_overwrite_where_on_rowfmt_table(spark, tmp_path, fmt):
    root = str(tmp_path / f"ow_{fmt}")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame(
            [(1, "us"), (2, "eu"), (3, "us")], "id int, region string"
        ),
        root,
        format_version=2,
        data_format=fmt,
    )
    iceberg.overwrite_iceberg_where(
        spark,
        spark.createDataFrame([(9, "us")], "id int, region string"),
        root,
        "region = 'us'",
    )
    got = sorted(
        (r.id, r.region)
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(2, "eu"), (9, "us")]
    fmts, _ = _fmts_and_deletes(root)
    assert fmts == {fmt.upper()}


@pytest.mark.parametrize("fmt", ["avro", "orc"])
def test_full_overwrite_preserves_table_format(spark, tmp_path, fmt):
    root = str(tmp_path / f"full_{fmt}")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, "x")], "id int, s string"),
        root,
        format_version=2,
        data_format=fmt,
    )
    iceberg.overwrite_iceberg(
        spark, spark.createDataFrame([(9, "z")], "id int, s string"), root
    )
    fmts, _ = _fmts_and_deletes(root)
    assert fmts == {fmt.upper()}, "full overwrite keeps the table's format"
    assert [
        (r.id, r.s) for r in iceberg.read_iceberg(spark, root).collect()
    ] == [(9, "z")]


def test_partitioned_avro_update_moves_rows_across_partitions(
    spark, tmp_path
):
    """Updating a partition SOURCE column re-derives the partition tuple
    in the rowfmt stager (per-task tuple split), so the row lands in its
    new partition with a prunable manifest entry."""
    root = str(tmp_path / "part_avro")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame(
            [(1, "us", 1.0), (2, "eu", 2.0), (3, "us", 3.0)],
            "id int, region string, v double",
        ),
        root,
        format_version=2,
        data_format="avro",
        partition_by=["region"],
    )
    iceberg.update_iceberg(spark, root, {"region": "'ap'"}, where="id = 1")
    got = sorted(
        (r.id, r.region)
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(1, "ap"), (2, "eu"), (3, "us")]
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    tuples = {d["partition"].get("region") for d in data}
    assert "ap" in tuples
    # partition pruning still engages on the moved partition
    assert (
        iceberg.read_iceberg(spark, root, where="region = 'ap'").count() == 1
    )


def test_cdf_after_rowfmt_update(spark, tmp_path):
    """read_iceberg_cdf replays an UPDATE on an AVRO table: the masked
    pre-image rows surface as deletes, the replacement AVRO files as
    inserts — _read_any routes both legs format-aware."""
    root = str(tmp_path / "cdf_avro")
    s0 = iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string"),
        root,
        format_version=2,
        data_format="avro",
    )
    s1 = iceberg.update_iceberg(spark, root, {"name": "'X'"}, where="id = 1")
    cdf = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)
    rows = {(r.id, r.name, r._change_type) for r in cdf.collect()}
    assert rows == {(1, "a", "delete"), (1, "X", "insert")}
    assert {r._commit_snapshot_id for r in cdf.collect()} == {s1}


def test_rowfmt_update_roundtrips_timestamptz(spark, tmp_path):
    """The stager localizes session wall clock back to the UTC instant;
    an UPDATE that rewrites rows through reader->stager must preserve
    instants exactly (the round-9 tsz contract, now exercised by DML)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "tsz_upd")
    df = spark.createDataFrame(
        [(1, 1718000000), (2, 1718000555)], "id long, secs long"
    ).select("id", F.timestamp_seconds("secs").alias("tsz"))
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="avro")
    iceberg.update_iceberg(spark, root, {"id": "id + 10"}, where="id = 2")
    got = {
        r.id: r.micros
        for r in iceberg.read_iceberg(spark, root)
        .select("id", F.unix_micros("tsz").alias("micros"))
        .collect()
    }
    assert got == {1: 1718000000_000000, 12: 1718000555_000000}


def test_mixed_format_dml_stages_parquet(spark, tmp_path):
    """Round 10: DML on a table mixing rowfmt and parquet data files
    works — replacements stage as parquet (the normalizing choice) and
    the read path interleaves the per-format mask pipelines."""
    root = str(tmp_path / "mixed")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, "a")], "id int, s string"),
        root,
        format_version=2,
    )
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(2, "b")], "id int, s string"),
        root,
        format_version=2,
        data_format="avro",
    )
    # update a row living in the AVRO generation: pos-delete masks it
    # there, the replacement lands parquet
    iceberg.update_iceberg(spark, root, {"s": "'x'"}, where="id = 2")
    got = {r.id: r.s for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {1: "a", 2: "x"}
    iceberg.merge_iceberg(
        spark,
        spark.createDataFrame([(1, "m"), (3, "n")], "id int, s string"),
        root,
        ["id"],
    )
    got = {r.id: r.s for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {1: "m", 2: "x", 3: "n"}
    fmts, dels = _fmts_and_deletes(root)
    assert fmts == {"AVRO", "PARQUET"} and dels
    # full overwrite NORMALIZES a mixed table (old files all drop out)
    iceberg.overwrite_iceberg(
        spark, spark.createDataFrame([(9, "z")], "id int, s string"), root
    )
    fmts, _ = _fmts_and_deletes(root)
    assert fmts == {"PARQUET"}


def test_mixed_format_lifecycle_with_deletes(spark, tmp_path):
    """Round 10: the full mixed-table lifecycle — position deletes
    masking rows in BOTH format groups from one commit, row identity,
    sequence-scoped equality deletes with re-ingest, cross-format
    appends under live delete content, CDF, pruned reads and compaction.
    (Round 9 refused every shape here; the short-lived append-format
    guard died with the read-side fix.)"""
    root = str(tmp_path / "mx")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"),
        root, format_version=2, data_format="avro",
    )
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(3, "c"), (4, "d")], "id int, v string"),
        root, format_version=2,
    )
    # one pos-delete commit masking a row in EACH format group
    iceberg.delete_iceberg(spark, root, "id IN (1, 3)")
    got = sorted(
        (r.id, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(2, "b"), (4, "d")]
    # row identity surfaces on both legs (narrowed _metadata struct)
    ri = iceberg.read_iceberg(spark, root, with_row_identity=True)
    idents = [
        (r.id, r._metadata.file_path, r._metadata.row_index)
        for r in ri.collect()
    ]
    assert len(idents) == 2 and all(fp for _, fp, _ in idents)
    # equality delete applies to both groups; re-ingest survives
    # (strictly-older rule), landing AVRO under live delete content
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(2,)], "id int")
    )
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, root).collect()
    ) == [4]
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(2, "B2")], "id int, v string"),
        root, format_version=2, data_format="avro",
    )
    got = sorted(
        (r.id, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(2, "B2"), (4, "d")]
    # second delete names original positions; pruned read still fine
    iceberg.delete_iceberg(spark, root, "id = 4")
    assert [
        r.id for r in iceberg.read_iceberg(spark, root, where="id = 2").collect()
    ] == [2]
    # compact normalizes everything to parquet and drops masked rows
    iceberg.compact_iceberg(spark, root)
    fmts, dels = _fmts_and_deletes(root)
    assert fmts == {"PARQUET"} and not dels
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, root).collect()
    ) == [2]


def test_mixed_partitioned_identity_backfill(spark, tmp_path):
    """Round 10: the parquet subset of a mixed PARTITIONED table routes
    through the main scan path, so identity-partition source columns
    omitted from parquet footers backfill from manifest tuples — the
    round-9 fast-union skipped this and refused instead."""
    from feature_store_ml_spark.io import convert as _convert
    from feature_store_ml_spark.io import lakehouse as _lake

    # Delta partitioned table (source columns live in DIRS, not files),
    # converted to Iceberg: the parquet files omit the partition column
    root = str(tmp_path / "delta_src")
    _lake.write_delta(
        spark,
        spark.createDataFrame(
            [(1, "us"), (2, "eu"), (3, "us")], "id int, region string"
        ),
        root,
        partition_by=["region"],
    )
    _convert.convert_delta_to_iceberg(spark, root)  # in place
    # append an AVRO generation -> mixed partitioned table
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(4, "ap")], "id int, region string"),
        root,
        format_version=2,
        partition_by=["region"],
        data_format="avro",
    )
    got = sorted(
        (r.id, r.region)
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(1, "us"), (2, "eu"), (3, "us"), (4, "ap")], (
        "identity backfill must fill the parquet leg's partition column"
    )


def test_mixed_union_resolves_renamed_column_by_field_id(spark, tmp_path):
    """ADVICE round 10: parquet files written BEFORE a rename carry the
    old physical name; the parquet subset of a mixed-format union now
    routes through the shared field-id-grouped read instead of a
    name-based declared-schema read — real values, not silent NULLs.
    Covers the main scan, incremental changes, and the CDF replay."""
    root = str(tmp_path / "renamed")
    s0 = iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(0, "seed")], "id int, name string"),
        root,
        format_version=2,
    )
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string"),
        root,
        format_version=2,
    )
    iceberg.rename_iceberg_column(root, "name", "label")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(3, "c")], "id int, label string"),
        root,
        format_version=2,
        data_format="avro",
    )
    # main scan: pre-rename parquet rows surface real values
    got = {
        r.id: r.label for r in iceberg.read_iceberg(spark, root).collect()
    }
    assert got == {0: "seed", 1: "a", 2: "b", 3: "c"}
    # incremental changes over the mixed added set
    ch = {
        r.id: r.label
        for r in iceberg.read_iceberg_changes(spark, root, s0).collect()
    }
    assert ch == {1: "a", 2: "b", 3: "c"}
    # CDF replay decodes the pre-rename parquet inserts with values
    cdf = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)
    ins = {r.id: r.label for r in cdf.collect() if r._change_type == "insert"}
    assert ins == {1: "a", 2: "b", 3: "c"}


def test_rowfmt_dml_snapshot_isolation_and_exactly_once(spark, tmp_path):
    """The batch=(app, id) handshake dedupes replayed UPDATE commits on
    rowfmt tables exactly as on parquet tables."""
    root = str(tmp_path / "once")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, 0)], "id int, n int"),
        root,
        format_version=2,
        data_format="orc",
    )
    s1 = iceberg.update_iceberg(
        spark, root, {"n": "n + 1"}, where="id = 1", batch=("app", 7)
    )
    s2 = iceberg.update_iceberg(
        spark, root, {"n": "n + 1"}, where="id = 1", batch=("app", 7)
    )
    assert s1 == s2, "replayed batch must not re-apply"
    assert iceberg.read_iceberg(spark, root).collect()[0].n == 1
