"""avro_lite decoder correctness (against hand-computed spec byte vectors,
not just our own writer) and the pure-python Iceberg snapshot reader."""

import io
import json
import os
import zlib

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import avro_lite, iceberg


# ----------------------------------------------------------- avro_lite ----


def test_zigzag_long_spec_vectors():
    """Byte vectors straight from the Avro spec's varint/zigzag table —
    the decoder must agree with the SPEC, independent of our writer."""
    vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
        8192: b"\x80\x80\x01",
    }
    for value, raw in vectors.items():
        assert avro_lite._read_long(io.BytesIO(raw)) == value
        out = io.BytesIO()
        avro_lite._write_long(out, value)
        assert out.getvalue() == raw, value


def test_record_union_array_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "long"}},
            {"name": "d", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": "boolean"},
            {"name": "f", "type": "double"},
        ],
    }
    records = [
        {"a": 1, "b": "x", "c": [1, 2, 3], "d": {"k": "v"}, "e": True, "f": 1.5},
        {"a": -5, "b": None, "c": [], "d": {}, "e": False, "f": -0.25},
    ]
    p = str(tmp_path / "t.avro")
    avro_lite.write_container(p, schema, records)
    assert avro_lite.read_container(p) == records


def test_nested_record_reference_by_name(tmp_path):
    """A named record type used again by name (Iceberg manifests do this
    with the data_file record)."""
    inner = {
        "type": "record",
        "name": "inner",
        "fields": [{"name": "x", "type": "long"}],
    }
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "first", "type": inner},
            {"name": "second", "type": ["null", "inner"]},
        ],
    }
    records = [{"first": {"x": 1}, "second": {"x": 2}}]
    p = str(tmp_path / "n.avro")
    avro_lite.write_container(p, schema, records)
    assert avro_lite.read_container(p) == records


def test_deflate_codec(tmp_path):
    """Hand-assemble a deflate-codec container; the reader must inflate."""
    schema = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    body = io.BytesIO()
    for v in (7, -9):
        avro_lite._write_datum(body, {"a": v}, schema, {})
    comp = zlib.compressobj(wbits=-15)
    payload = comp.compress(body.getvalue()) + comp.flush()
    sync = b"0123456789abcdef"
    p = str(tmp_path / "d.avro")
    with open(p, "wb") as fh:
        fh.write(b"Obj\x01")
        avro_lite._write_long(fh, 2)
        avro_lite._write_bytes(fh, b"avro.schema")
        avro_lite._write_bytes(fh, json.dumps(schema).encode())
        avro_lite._write_bytes(fh, b"avro.codec")
        avro_lite._write_bytes(fh, b"deflate")
        avro_lite._write_long(fh, 0)
        fh.write(sync)
        avro_lite._write_long(fh, 2)
        avro_lite._write_bytes(fh, payload)
        fh.write(sync)
    assert avro_lite.read_container(p) == [{"a": 7}, {"a": -9}]


def test_corrupt_sync_marker_detected(tmp_path):
    schema = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    p = str(tmp_path / "c.avro")
    avro_lite.write_container(p, schema, [{"a": 1}])
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync"):
        avro_lite.read_container(p)


try:
    from hypothesis import given, settings, strategies as st

    _RECORD = st.fixed_dictionaries(
        {
            "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "b": st.one_of(st.none(), st.text(max_size=40)),
            "c": st.lists(
                st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=10
            ),
            "d": st.booleans(),
            "e": st.floats(allow_nan=False, width=64),
        }
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(_RECORD, max_size=25))
    def test_avro_roundtrip_property(tmp_path_factory, records):
        """Any record list survives write->read bit-exactly (zigzag longs at
        both 64-bit extremes, empty arrays, null unions, float payloads)."""
        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
                {"name": "c", "type": {"type": "array", "items": "int"}},
                {"name": "d", "type": "boolean"},
                {"name": "e", "type": "double"},
            ],
        }
        p = str(tmp_path_factory.mktemp("avro") / "t.avro")
        avro_lite.write_container(p, schema, records)
        assert avro_lite.read_container(p) == records

except ImportError:  # hypothesis is in the image; belt-and-braces
    pass


# ------------------------------------------------------------- iceberg ----

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": ["null", "int"]},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": ["null", "int"]},
    ],
}


def _make_iceberg_table(spark, root, deleted_file=None, delete_manifest=False):
    """Hand-build an Iceberg table per the public spec: parquet data files,
    Avro manifest + manifest list, JSON metadata + version hint."""
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    entries = []
    for i in range(3):
        rel = os.path.join(data_dir, f"f{i}.parquet")
        spark.range(i * 10, (i + 1) * 10).select(F.col("id")).toPandas().to_parquet(rel)
        entries.append(
            {
                "status": 2 if i == deleted_file else 1,
                "data_file": {
                    "content": 0,
                    "file_path": f"file:{os.path.abspath(rel)}",
                    "file_format": "PARQUET",
                    "record_count": 10,
                    "file_size_in_bytes": os.path.getsize(rel),
                },
            }
        )
    manifest = os.path.join(meta_dir, "m0.avro")
    avro_lite.write_container(manifest, _MANIFEST_SCHEMA, entries)
    mlist = os.path.join(meta_dir, "snap-1.avro")
    avro_lite.write_container(
        mlist,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": f"file:{os.path.abspath(manifest)}",
                "manifest_length": os.path.getsize(manifest),
                "content": 1 if delete_manifest else 0,
            }
        ],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "t",
        "location": f"file:{os.path.abspath(root)}",
        "current-snapshot-id": 1,
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": f"file:{os.path.abspath(mlist)}"}
        ],
    }
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("2")
    return root


def _make_two_snapshot_table(spark, root, rewrite_history=False):
    """Snapshot 1 = files 0,1 (manifest m0); snapshot 2 = m0 + m1(file 2)
    — the append pattern. With rewrite_history, snapshot 2 instead drops
    m0 (as a compaction would)."""
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)

    def _entry(i, rel):
        return {
            "status": 1,
            "data_file": {
                "content": 0,
                "file_path": f"file:{os.path.abspath(rel)}",
                "file_format": "PARQUET",
                "record_count": 10,
                "file_size_in_bytes": os.path.getsize(rel),
            },
        }

    rels = []
    for i in range(3):
        rel = os.path.join(data_dir, f"f{i}.parquet")
        spark.range(i * 10, (i + 1) * 10).select(F.col("id")).toPandas().to_parquet(rel)
        rels.append(rel)
    m0 = os.path.join(meta_dir, "m0.avro")
    avro_lite.write_container(m0, _MANIFEST_SCHEMA, [_entry(i, rels[i]) for i in (0, 1)])
    m1 = os.path.join(meta_dir, "m1.avro")
    avro_lite.write_container(m1, _MANIFEST_SCHEMA, [_entry(2, rels[2])])

    def _mlist(path, manifests):
        avro_lite.write_container(
            path,
            _MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": f"file:{os.path.abspath(m)}",
                    "manifest_length": os.path.getsize(m),
                    "content": 0,
                }
                for m in manifests
            ],
        )

    s1 = os.path.join(meta_dir, "snap-1.avro")
    _mlist(s1, [m0])
    s2 = os.path.join(meta_dir, "snap-2.avro")
    _mlist(s2, [m1] if rewrite_history else [m0, m1])
    meta = {
        "format-version": 2,
        "table-uuid": "t2",
        "location": f"file:{os.path.abspath(root)}",
        "current-snapshot-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {"schema-id": 0, "type": "struct",
             "fields": [{"id": 1, "name": "id", "type": "long", "required": False}]}
        ],
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": f"file:{os.path.abspath(s1)}"},
            {"snapshot-id": 2, "manifest-list": f"file:{os.path.abspath(s2)}"},
        ],
    }
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("2")
    return root


def test_iceberg_incremental_changes(spark, tmp_path):
    root = _make_two_snapshot_table(spark, str(tmp_path / "t"))
    inc = iceberg.read_iceberg_changes(spark, root, from_snapshot_id=1)
    assert sorted(r.id for r in inc.collect()) == list(range(20, 30))
    # diff of a snapshot against itself: empty frame, declared schema
    empty = iceberg.read_iceberg_changes(spark, root, 2, 2)
    assert empty.count() == 0 and empty.columns == ["id"]


def test_iceberg_incremental_rejects_rewritten_history(spark, tmp_path):
    root = _make_two_snapshot_table(spark, str(tmp_path / "t"), rewrite_history=True)
    with pytest.raises(ValueError, match="history rewritten"):
        iceberg.read_iceberg_changes(spark, root, from_snapshot_id=1)


def test_iceberg_reads_live_snapshot(spark, tmp_path):
    root = _make_iceberg_table(spark, str(tmp_path / "t"))
    df = iceberg.read_iceberg(spark, root)
    assert sorted(r.id for r in df.collect()) == list(range(30))


def test_iceberg_skips_deleted_entries(spark, tmp_path):
    root = _make_iceberg_table(spark, str(tmp_path / "t"), deleted_file=0)
    df = iceberg.read_iceberg(spark, root)
    assert sorted(r.id for r in df.collect()) == list(range(10, 30))


def test_iceberg_corrupt_delete_manifest_fails_loud(spark, tmp_path):
    """A manifest-list entry claiming content=1 (delete manifest) whose
    entries are content=0 DATA files is corrupt metadata — refuse rather
    than double-count or silently skip."""
    root = _make_iceberg_table(spark, str(tmp_path / "t"), delete_manifest=True)
    with pytest.raises(ValueError, match="corrupt metadata"):
        iceberg.read_iceberg(spark, root)


def test_iceberg_relocated_table_resolves_paths(spark, tmp_path):
    """Metadata written with absolute URIs from another machine must still
    resolve after the table directory is moved (URI re-rooting)."""
    import shutil

    orig = _make_iceberg_table(spark, str(tmp_path / "orig"))
    moved = str(tmp_path / "moved")
    shutil.move(orig, moved)
    df = iceberg.read_iceberg(spark, moved)
    assert sorted(r.id for r in df.collect()) == list(range(30))


def test_iceberg_pushdown_reaches_scan(spark, tmp_path):
    root = _make_iceberg_table(spark, str(tmp_path / "t"))
    plan = (
        iceberg.read_iceberg(spark, root)
        .where(F.col("id") > 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,20)]" in plan


def test_non_iceberg_dir_rejected(spark, tmp_path):
    os.makedirs(tmp_path / "x")
    assert not iceberg.is_iceberg_table(str(tmp_path / "x"))
    with pytest.raises(ValueError, match="not an Iceberg table"):
        iceberg.read_iceberg(spark, str(tmp_path / "x"))


# ----------------------------------------------------------- write path ----


@pytest.mark.parametrize("fv", [1, 2])
def test_iceberg_write_read_roundtrip(spark, tmp_path, fv):
    """Read-your-own-write at both format versions: create + two appends,
    every snapshot resolvable through the normal metadata walk."""
    from pyspark.sql import functions as F

    root = str(tmp_path / f"w{fv}")
    a = spark.range(0, 10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    b = spark.range(10, 20).select(F.col("id"), (F.col("id") * 2).alias("v"))
    s1 = iceberg.write_iceberg(spark, a, root, format_version=fv)
    s2 = iceberg.write_iceberg(spark, b, root, format_version=fv)
    assert s2 != s1
    got = {(r.id, r.v) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {(i, i * 2) for i in range(20)}
    meta = iceberg._load_metadata(root)
    assert meta["format-version"] == fv
    assert meta["current-snapshot-id"] == s2
    assert len(meta["snapshots"]) == 2


@pytest.mark.parametrize("fv", [1, 2])
def test_iceberg_write_then_incremental_diff(spark, tmp_path, fv):
    """Snapshot-diff over an ENGINE-written table: the rows added between
    two of our own snapshots come back exactly."""
    from pyspark.sql import functions as F

    root = str(tmp_path / f"w{fv}")
    s1 = iceberg.write_iceberg(
        spark, spark.range(0, 10).select("id"), root, format_version=fv
    )
    iceberg.write_iceberg(
        spark, spark.range(10, 25).select("id"), root, format_version=fv
    )
    inc = iceberg.read_iceberg_changes(spark, root, from_snapshot_id=s1)
    assert sorted(r.id for r in inc.collect()) == list(range(10, 25))


def test_iceberg_write_schema_mismatch_fails_loud(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "w")
    iceberg.write_iceberg(spark, spark.range(5).select("id"), root)
    drifted = spark.range(5).select(F.col("id").cast("int").alias("id"))
    with pytest.raises(ValueError, match="schema mismatch"):
        iceberg.write_iceberg(spark, drifted, root)


def test_iceberg_write_version_conflict_fails_loud(spark, tmp_path):
    import os as _os
    import unittest.mock as mock

    root = str(tmp_path / "w")
    iceberg.write_iceberg(spark, spark.range(5).select("id"), root)
    # simulate a concurrent committer having grabbed v2 already
    with open(_os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        fh.write("{}")
    with pytest.raises(RuntimeError, match="single-writer"):
        iceberg.write_iceberg(spark, spark.range(5).select("id"), root)


def test_iceberg_format_version_drift_rejected(spark, tmp_path):
    root = str(tmp_path / "w")
    iceberg.write_iceberg(spark, spark.range(5).select("id"), root, format_version=1)
    with pytest.raises(ValueError, match="format-version"):
        iceberg.write_iceberg(spark, spark.range(5).select("id"), root, format_version=2)


def test_iceberg_expire_snapshots(spark, tmp_path):
    """Snapshot expiration: old snapshots leave the metadata (their
    manifest lists deleted), the current snapshot still reads every row
    (append-only: data files are shared forward through reused manifests),
    and incremental reads FROM an expired snapshot fail loudly."""
    root = str(tmp_path / "w")
    s1 = iceberg.write_iceberg(spark, spark.range(0, 10).select("id"), root)
    s2 = iceberg.write_iceberg(spark, spark.range(10, 20).select("id"), root)
    s3 = iceberg.write_iceberg(spark, spark.range(20, 30).select("id"), root)
    report = iceberg.expire_iceberg_snapshots(root, keep=1)
    assert report["snapshots"] == [s1, s2]
    assert report["files"]  # the expired snapshots' manifest lists
    meta = iceberg._load_metadata(root)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [s3]
    assert sorted(r.id for r in iceberg.read_iceberg(spark, root).collect()) == list(
        range(30)
    )
    with pytest.raises(ValueError, match="not in metadata"):
        iceberg.read_iceberg_changes(spark, root, from_snapshot_id=s1)


def test_iceberg_expire_keeps_requested_window(spark, tmp_path):
    root = str(tmp_path / "w")
    ids = [
        iceberg.write_iceberg(spark, spark.range(i * 5, (i + 1) * 5).select("id"), root)
        for i in range(4)
    ]
    iceberg.expire_iceberg_snapshots(root, keep=2)
    meta = iceberg._load_metadata(root)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == ids[-2:]
    # diff between the two KEPT snapshots still works
    inc = iceberg.read_iceberg_changes(spark, root, from_snapshot_id=ids[-2])
    assert sorted(r.id for r in inc.collect()) == list(range(15, 20))
    # no-op when nothing to expire
    assert iceberg.expire_iceberg_snapshots(root, keep=5) == {
        "snapshots": [], "files": [], "refs": [],
    }


# ----------------------------------------------------------- time travel ----


def test_iceberg_time_travel_by_snapshot_id(spark, tmp_path):
    """Snapshots are immutable: reading an old snapshot id returns exactly
    the rows live THEN, independent of later appends."""
    root = str(tmp_path / "tt")
    s1 = iceberg.write_iceberg(spark, spark.range(0, 10).select("id"), root)
    s2 = iceberg.write_iceberg(spark, spark.range(10, 20).select("id"), root)
    old = iceberg.read_iceberg(spark, root, snapshot_id=s1)
    assert sorted(r.id for r in old.collect()) == list(range(10))
    cur = iceberg.read_iceberg(spark, root, snapshot_id=s2)
    assert cur.count() == 20
    with pytest.raises(ValueError, match="not in metadata"):
        iceberg.read_iceberg(spark, root, snapshot_id=999)


def test_iceberg_time_travel_as_of_timestamp(spark, tmp_path):
    """as_of_ms resolves through snapshot-log: the newest snapshot at or
    before the timestamp wins; a pre-history timestamp fails loudly."""
    root = str(tmp_path / "tt")
    iceberg.write_iceberg(spark, spark.range(0, 5).select("id"), root)
    iceberg.write_iceberg(spark, spark.range(5, 12).select("id"), root)
    meta = iceberg._load_metadata(root)
    log = meta["snapshot-log"]
    assert len(log) == 2 and log[0]["timestamp-ms"] <= log[1]["timestamp-ms"]
    t1 = log[0]["timestamp-ms"]
    at_first = iceberg.read_iceberg(spark, root, as_of_ms=t1)
    assert at_first.count() in (5, 12)  # ==12 only if both commits share a ms
    now = iceberg.read_iceberg(spark, root, as_of_ms=log[1]["timestamp-ms"] + 10)
    assert now.count() == 12
    with pytest.raises(ValueError, match="older than retained history"):
        iceberg.read_iceberg(spark, root, as_of_ms=t1 - 100000)
    with pytest.raises(ValueError, match="not both"):
        iceberg.read_iceberg(spark, root, snapshot_id=1, as_of_ms=1)


def test_iceberg_expire_blocks_time_travel_into_expired(spark, tmp_path):
    """After expiration, both id-based and timestamp-based travel into the
    dropped range fail loudly (snapshot gone from metadata AND its log
    entries trimmed) instead of silently serving the wrong snapshot."""
    root = str(tmp_path / "tt")
    s1 = iceberg.write_iceberg(spark, spark.range(0, 5).select("id"), root)
    meta_before = iceberg._load_metadata(root)
    t1 = meta_before["snapshot-log"][0]["timestamp-ms"]
    s2 = iceberg.write_iceberg(spark, spark.range(5, 10).select("id"), root)
    iceberg.expire_iceberg_snapshots(root, keep=1)
    with pytest.raises(ValueError, match="not in metadata"):
        iceberg.read_iceberg(spark, root, snapshot_id=s1)
    meta = iceberg._load_metadata(root)
    assert [e["snapshot-id"] for e in meta["snapshot-log"]] == [s2]
    # a timestamp inside the expired range no longer resolves (unless the
    # two commits landed in the same millisecond, in which case it resolves
    # to the kept snapshot — never to the expired one)
    try:
        got = iceberg.read_iceberg(spark, root, as_of_ms=t1)
        assert got.count() == 10
    except ValueError as exc:
        assert "older than retained history" in str(exc)


# ------------------------------------------------------ position deletes ----


def test_iceberg_position_delete_masks_rows(spark, tmp_path):
    """delete_iceberg writes a position-delete parquet + delete manifest;
    the read anti-joins the dead rows; data files stay byte-identical."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "pd")
    iceberg.write_iceberg(
        spark, spark.range(100).select("id", (F.col("id") % 5).alias("v")),
        root, format_version=2,
    )
    data_before = {
        f: os.path.getmtime(f) for f in iceberg._live_data_files(root)
    }
    s = iceberg.delete_iceberg(spark, root, "v = 2")
    assert {
        f: os.path.getmtime(f) for f in iceberg._live_data_files(root)
    } == data_before
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(100) if i % 5 != 2]
    meta = iceberg._load_metadata(root)
    assert meta["current-snapshot-id"] == s
    _, deletes = iceberg._snapshot_content(meta, s, root)
    assert len(deletes) == 1 and deletes[0].endswith(".parquet")


def test_iceberg_deletes_compose_and_append_after_delete(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "pd")
    iceberg.write_iceberg(spark, spark.range(50).select("id"), root,
                          format_version=2)
    iceberg.delete_iceberg(spark, root, "id < 10")
    iceberg.delete_iceberg(spark, root, "id >= 45")   # composes
    iceberg.write_iceberg(spark, spark.range(100, 110).select("id"), root,
                          format_version=2)           # append carries deletes
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == list(range(10, 45)) + list(range(100, 110))
    # delete on the appended rows too
    iceberg.delete_iceberg(spark, root, "id = 105")
    assert 105 not in {r.id for r in iceberg.read_iceberg(spark, root).collect()}


def test_iceberg_delete_nothing_matched_still_commits(spark, tmp_path):
    root = str(tmp_path / "pd")
    iceberg.write_iceberg(spark, spark.range(5).select("id"), root,
                          format_version=2)
    s = iceberg.delete_iceberg(spark, root, "id = 999")
    assert iceberg._load_metadata(root)["current-snapshot-id"] == s
    assert iceberg.read_iceberg(spark, root).count() == 5


def test_iceberg_delete_v1_fails_loud(spark, tmp_path):
    root = str(tmp_path / "pd")
    iceberg.write_iceberg(spark, spark.range(5).select("id"), root,
                          format_version=1)
    with pytest.raises(NotImplementedError, match="format-version 2"):
        iceberg.delete_iceberg(spark, root, "id = 1")


def test_iceberg_incremental_rejects_delete_range(spark, tmp_path):
    """Snapshot-diff across a delete is not append-only — fail loud."""
    root = str(tmp_path / "pd")
    s1 = iceberg.write_iceberg(spark, spark.range(10).select("id"), root,
                               format_version=2)
    s2 = iceberg.write_iceberg(spark, spark.range(10, 20).select("id"), root,
                               format_version=2)
    iceberg.delete_iceberg(spark, root, "id = 3")
    inc = iceberg.read_iceberg_changes(spark, root, from_snapshot_id=s1,
                                       to_snapshot_id=s2)
    assert sorted(r.id for r in inc.collect()) == list(range(10, 20))
    with pytest.raises(ValueError, match="DELETED"):
        iceberg.read_iceberg_changes(spark, root, from_snapshot_id=s2)


def test_iceberg_time_travel_before_delete_sees_all_rows(spark, tmp_path):
    root = str(tmp_path / "pd")
    s1 = iceberg.write_iceberg(spark, spark.range(20).select("id"), root,
                               format_version=2)
    iceberg.delete_iceberg(spark, root, "id < 5")
    assert iceberg.read_iceberg(spark, root).count() == 15
    assert iceberg.read_iceberg(spark, root, snapshot_id=s1).count() == 20


# ------------------------------------------------------ equality deletes ----


def test_iceberg_equality_delete_masks_and_scopes_by_sequence(spark, tmp_path):
    """Equality deletes mask rows in STRICTLY OLDER data files only: keys
    deleted at seq N vanish from earlier appends, but a later re-ingest of
    the same key survives — the spec's sequence-scoping rule, and the whole
    point of equality deletes for erase-then-reingest pipelines."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "eq")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id", (F.col("id") % 3).alias("grp")),
        root, format_version=2,
    )
    doomed = spark.createDataFrame([(2,), (5,)], "id long")
    iceberg.delete_iceberg_equality(spark, root, doomed)
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
    # re-ingest one of the deleted keys: the NEW row must survive
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(5, 99)], "id long, grp long"),
        root, format_version=2,
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [0, 1, 3, 4, 5, 6, 7, 8, 9]
    row5 = [r for r in iceberg.read_iceberg(spark, root).collect() if r.id == 5]
    assert row5[0].grp == 99  # the re-ingested row, not the deleted one


def test_iceberg_equality_delete_multi_column_and_nulls(spark, tmp_path):
    """Multi-column equality keys AND null semantics: a null key cell
    matches null table cells (eqNullSafe), per the spec."""
    root = str(tmp_path / "eqn")
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, None)], "k long, s string"
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    doomed = spark.createDataFrame([(1, "a"), (3, None)], "k long, s string")
    iceberg.delete_iceberg_equality(spark, root, doomed)
    got = {(r.k, r.s) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {(1, "b"), (2, "a")}


def test_iceberg_equality_delete_unknown_column_fails_loud(spark, tmp_path):
    root = str(tmp_path / "eqf")
    iceberg.write_iceberg(spark, spark.range(5).select("id"), root,
                          format_version=2)
    with pytest.raises(ValueError, match="not in the table schema"):
        iceberg.delete_iceberg_equality(
            spark, root, spark.createDataFrame([(1,)], "nope long")
        )


def test_iceberg_equality_and_position_deletes_compose(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "eqp")
    iceberg.write_iceberg(
        spark, spark.range(20).select("id", (F.col("id") % 4).alias("m")),
        root, format_version=2,
    )
    iceberg.delete_iceberg(spark, root, "m = 0")          # position
    iceberg.delete_iceberg_equality(                       # equality
        spark, root, spark.createDataFrame([(7,), (11,)], "id long")
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(20) if i % 4 != 0 and i not in (7, 11)]


# ------------------------------------------------------- streaming sink ----


def test_stream_to_iceberg_exactly_once(spark, tmp_path, sf_dir):
    """Structured Streaming replay into an Iceberg table via the
    snapshot-summary batch handshake: rerun with the same checkpoint adds
    nothing; a simulated replay of a committed batch id is skipped."""
    from feature_store_ml_spark.streaming import events as ev

    table = str(tmp_path / "ice_out")
    ckpt = str(tmp_path / "ckpt")
    stream = ev._streaming_events(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )
    batches = ev.stream_to_iceberg(spark, stream, table, app_id="e2e",
                                   checkpoint_dir=ckpt)
    assert batches
    n = iceberg.read_iceberg(spark, table).count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # rerun, same checkpoint: no new source data -> no new rows
    stream2 = ev._streaming_events(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )
    ev.stream_to_iceberg(spark, stream2, table, app_id="e2e",
                         checkpoint_dir=ckpt)
    assert iceberg.read_iceberg(spark, table).count() == n
    # simulated replay of a committed batch id: summary handshake skips
    some = spark.range(5).select(
        F.col("id").alias("event_id"), F.col("id").alias("user_id"),
        F.col("id").cast("double").alias("value"),
    )
    snap_before = iceberg._load_metadata(table)["current-snapshot-id"]
    got = iceberg.write_iceberg_batch(spark, some, table, "e2e", max(batches))
    assert got == snap_before
    assert iceberg.read_iceberg(spark, table).count() == n
    # a NEW batch id from another app goes through
    iceberg.write_iceberg_batch(spark, some, table, "other", 0)
    assert iceberg.read_iceberg(spark, table).count() == n + 5
    assert iceberg.last_committed_batch(table, "other") == 0
    assert iceberg.last_committed_batch(table, "absent") == -1


# --------------------------------------------------- partitioned writes ----


@pytest.mark.parametrize("fv", [1, 2])
def test_iceberg_partitioned_write_roundtrip(spark, tmp_path, fv):
    """Identity-partitioned write: one partition tuple per data file, the
    source column STAYS in the parquet (Iceberg layout), manifests carry
    the typed partition struct, and reads work unchanged."""
    root = str(tmp_path / f"pw{fv}")
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(20)],
        "id long, grp string, v double",
    )
    s1 = iceberg.write_iceberg(spark, df, root, format_version=fv,
                               partition_by=["grp"])
    back = iceberg.read_iceberg(spark, root)
    assert set(back.columns) == {"id", "grp", "v"}
    assert {(r.id, r.grp) for r in back.collect()} == {
        (i, "ab"[i % 2]) for i in range(20)
    }
    # layout: every data file under a grp=<val> dir holding ONLY that value
    import pyarrow.parquet as pqt

    for f in iceberg._live_data_files(root):
        assert "/data/grp=" in f, f
        vals = set(pqt.read_table(f, columns=["grp"]).column("grp").to_pylist())
        assert len(vals) == 1
        assert f.split("grp=")[1].split("/")[0] == next(iter(vals))
    # manifest partition struct carries the typed value
    meta = iceberg._load_metadata(root)
    spec = meta["partition-specs"][0]
    assert spec["fields"][0]["transform"] == "identity"
    assert spec["fields"][0]["name"] == "grp"
    # append must repeat the partitioning
    more = spark.createDataFrame([(100, "c", 1.0)], "id long, grp string, v double")
    with pytest.raises(ValueError, match="does not match"):
        iceberg.write_iceberg(spark, more, root, format_version=fv)
    s2 = iceberg.write_iceberg(spark, more, root, format_version=fv,
                               partition_by=["grp"])
    assert s2 != s1
    assert iceberg.read_iceberg(spark, root).count() == 21


def test_iceberg_partitioned_int_partition_and_delete(spark, tmp_path):
    """Int partition sources parse back typed; row-level deletes compose
    with partitioned layouts."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "pwi")
    df = spark.range(30).select("id", (F.col("id") % 3).alias("day"))
    iceberg.write_iceberg(spark, df, root, format_version=2,
                          partition_by=["day"])
    manifest_entries = []
    meta = iceberg._load_metadata(root)
    snap = meta["snapshots"][-1]
    for e in iceberg.avro_lite.read_container(
        iceberg._localize(snap["manifest-list"], root)
    ):
        manifest_entries.extend(
            iceberg.avro_lite.read_container(
                iceberg._localize(e["manifest_path"], root)
            )
        )
    pvals = {m["data_file"]["partition"]["day"] for m in manifest_entries}
    assert pvals == {0, 1, 2}  # typed longs, not strings
    iceberg.delete_iceberg(spark, root, "day = 1")
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(30) if i % 3 != 1]


def test_iceberg_partitioned_unsupported_type_fails_loud(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "pwf")
    df = spark.range(5).select("id", F.lit(1.5).alias("x"))
    with pytest.raises(NotImplementedError, match="int/long/string/date only"):
        iceberg.write_iceberg(spark, df, root, partition_by=["x"])


# ------------------------------------------------------------ compaction ----


def test_iceberg_compaction_applies_deletes_and_merges_files(spark, tmp_path):
    """rewrite_data_files: many small append files + accumulated deletes
    collapse to a clean snapshot — same rows, no delete manifests, fewer
    files; expire + dead-file cleanup then reclaims the replaced bytes."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "ic")
    for b in range(3):
        iceberg.write_iceberg(
            spark, spark.range(b * 10, (b + 1) * 10).select("id"),
            root, format_version=2,
        )
    iceberg.delete_iceberg(spark, root, "id % 5 = 0")
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(7,)], "id long")
    )
    expected = sorted(i for i in range(30) if i % 5 != 0 and i != 7)
    n_files_before = len(iceberg._live_data_files(root))
    s = iceberg.compact_iceberg(spark, root)
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == expected
    meta = iceberg._load_metadata(root)
    assert meta["current-snapshot-id"] == s
    data, deletes = iceberg._snapshot_scan_plan(meta, s, root)
    assert not deletes  # delete files gone from the live snapshot
    assert len(data) <= n_files_before
    # appends after compaction still work; time travel to pre-compaction
    # still sees the masked view
    iceberg.write_iceberg(spark, spark.range(100, 105).select("id"), root,
                          format_version=2)
    assert iceberg.read_iceberg(spark, root).count() == len(expected) + 5


def test_iceberg_partitioned_compaction_preserves_layout(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "icp")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, "ab"[i % 2]) for i in range(10)], "id long, grp string"
        )
        iceberg.write_iceberg(spark, df, root, format_version=2,
                              partition_by=["grp"])
    iceberg.delete_iceberg(spark, root, "id < 5")
    iceberg.compact_iceberg(spark, root)
    live = iceberg._live_data_files(root)
    assert live and all("/data/grp=" in f for f in live)
    back = iceberg.read_iceberg(spark, root)
    assert back.count() == 25
    assert set(back.columns) == {"id", "grp"}
    # append must still respect the declared partitioning
    with pytest.raises(ValueError, match="does not match"):
        iceberg.write_iceberg(
            spark, spark.createDataFrame([(999, "c")], "id long, grp string"),
            root, format_version=2,
        )


# ------------------------------------------------------- schema evolution ----


def test_iceberg_schema_evolution_on_append(spark, tmp_path):
    """merge_schema append: a batch may ADD nullable columns; old files
    backfill null through the declared-schema scan; drops/retypes and
    unflagged drift stay fail-loud."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "ev")
    iceberg.write_iceberg(spark, spark.range(5).select("id"), root,
                          format_version=2)
    wider = spark.range(5, 8).select("id", F.lit("x").alias("tag"))
    with pytest.raises(ValueError, match="merge_schema=True"):
        iceberg.write_iceberg(spark, wider, root, format_version=2)
    iceberg.write_iceberg(spark, wider, root, format_version=2,
                          merge_schema=True)
    back = iceberg.read_iceberg(spark, root)
    assert back.columns == ["id", "tag"]
    got = {(r.id, r.tag) for r in back.collect()}
    assert got == {(i, None) for i in range(5)} | {(i, "x") for i in range(5, 8)}
    # the widened schema persists: a plain append now carries both columns
    iceberg.write_iceberg(
        spark, spark.range(8, 9).select("id", F.lit("y").alias("tag")),
        root, format_version=2,
    )
    assert iceberg.read_iceberg(spark, root).count() == 9
    # dropping a column is NOT evolution
    with pytest.raises(ValueError, match="schema mismatch"):
        iceberg.write_iceberg(spark, spark.range(9, 10).select("id"), root,
                              format_version=2, merge_schema=True)


def test_delta_timestamp_time_travel(spark, tmp_path):
    """read_delta(timestamp_ms=...): resolves to the newest commit at or
    before the wall-clock, per delta-spark's timestampAsOf."""
    import json as _json
    import os as _os

    from feature_store_ml_spark.io import lakehouse

    root = str(tmp_path / "tt")
    lakehouse.write_delta(spark, spark.range(5).select("id"), root)      # v0
    lakehouse.write_delta(spark, spark.range(5, 12).select("id"), root,
                          mode="append")                                 # v1
    log = _os.path.join(root, "_delta_log")

    def commit_ts(v):
        with open(_os.path.join(log, f"{v:020d}.json")) as fh:
            for line in fh:
                a = _json.loads(line)
                if "commitInfo" in a:
                    return a["commitInfo"]["timestamp"]

    t0, t1 = commit_ts(0), commit_ts(1)
    assert lakehouse.read_delta(spark, root, timestamp_ms=t0).count() in (5, 12)
    assert lakehouse.read_delta(spark, root, timestamp_ms=t1 + 10).count() == 12
    with pytest.raises(ValueError, match="older than retained history"):
        lakehouse.read_delta(spark, root, timestamp_ms=t0 - 10_000)
    with pytest.raises(ValueError, match="not both"):
        lakehouse.read_delta(spark, root, version=0, timestamp_ms=t0)


# ----------------------------------------------------- row-level feed ----


def test_iceberg_cdf_inserts_and_deletes(spark, tmp_path):
    """read_iceberg_cdf: appends -> inserts; position deletes -> the named
    rows; equality deletes -> matching strictly-older live rows, with
    already-deleted rows never emitted twice."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "icdf")
    s0 = iceberg.write_iceberg(spark, spark.range(10).select("id"), root,
                               format_version=2)
    s1 = iceberg.write_iceberg(spark, spark.range(10, 15).select("id"), root,
                               format_version=2)
    s2 = iceberg.delete_iceberg(spark, root, "id IN (3, 12)")
    s3 = iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(3,), (4,)], "id long")
    )
    cdf = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)
    rows = [(r.id, r._change_type, r._commit_snapshot_id) for r in cdf.collect()]
    inserts = {(i, s) for i, t, s in rows if t == "insert"}
    deletes = {(i, s) for i, t, s in rows if t == "delete"}
    assert inserts == {(i, s1) for i in range(10, 15)}
    # id=3 deleted ONCE (at s2 via position delete); the equality delete
    # at s3 kills only id=4 (3 was already masked)
    assert deletes == {(3, s2), (12, s2), (4, s3)}
    # consuming from s2 sees only the equality delete
    tail = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s2)
    assert [(r.id, r._change_type) for r in tail.collect()] == [(4, "delete")]
    # empty range -> typed empty frame
    empty = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s3)
    assert empty.count() == 0
    assert empty.columns == ["id", "_change_type", "_commit_snapshot_id"]


def test_iceberg_cdf_rejects_compacted_range(spark, tmp_path):
    root = str(tmp_path / "icdf2")
    s0 = iceberg.write_iceberg(spark, spark.range(10).select("id"), root,
                               format_version=2)
    iceberg.write_iceberg(spark, spark.range(10, 20).select("id"), root,
                          format_version=2)
    iceberg.compact_iceberg(spark, root)
    with pytest.raises(ValueError, match="removed data files"):
        iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)


def test_rewrite_manifests_consolidates(spark, tmp_path):
    """rewrite_manifests (round 8): N appends leave N data manifests; one
    rewrite carries every entry verbatim into one manifest — rows, time
    travel, partition pruning bounds and Puffin stats all intact; live
    delete content makes it a stated no-op (sequence scoping)."""
    from feature_store_ml_spark.io import avro_lite

    root = str(tmp_path / "rm")
    for i in range(6):
        iceberg.write_iceberg(
            spark,
            spark.range(i * 100, (i + 1) * 100).select(
                "id", (F.col("id") % 5).cast("int").alias("grp")
            ),
            root,
            format_version=2,
        )
    iceberg.analyze_iceberg(spark, root, columns=["grp"])

    def _n_manifests(r):
        meta = iceberg._load_metadata(r)
        cur = meta["current-snapshot-id"]
        snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur)
        return len(
            avro_lite.read_container(iceberg._localize(snap["manifest-list"], r))
        ), cur

    n0, pre = _n_manifests(root)
    assert n0 == 6
    out = iceberg.rewrite_manifests_iceberg(spark, root)
    assert out == {"before": 6, "after": 1, "snapshot_id": out["snapshot_id"]}
    n1, _cur = _n_manifests(root)
    assert n1 == 1
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == list(range(600))
    # pre-rewrite snapshot still time-travelable
    assert iceberg.read_iceberg(spark, root, snapshot_id=pre).count() == 600
    # bounds carried: skipping still prunes
    rep = iceberg.iceberg_scan_report(root, "id >= 550")
    assert rep["kept_files"] < rep["total_files"]
    # stats carried (content unchanged)
    assert iceberg.table_statistics(root)["ndv"] == {"grp": 5}
    # idempotent-ish: single manifest → no-op
    out2 = iceberg.rewrite_manifests_iceberg(spark, root)
    assert out2["snapshot_id"] is None and out2["after"] == 1
    # round 10: consolidation WITH live deletes — carried entries stamp
    # explicit per-entry sequence numbers, so delete scoping survives
    iceberg.write_iceberg(
        spark,
        spark.range(600, 700).select(
            "id", (F.col("id") % 5).cast("int").alias("grp")
        ),
        root,
        format_version=2,
    )
    iceberg.delete_iceberg(spark, root, "id = 5")
    out3 = iceberg.rewrite_manifests_iceberg(spark, root)
    assert out3["snapshot_id"] is not None and out3["after"] == 1
    assert iceberg.read_iceberg(spark, root).count() == 699


def test_rewrite_manifests_preserves_eq_delete_scoping(spark, tmp_path):
    """Round 10: the sharp edge of cross-sequence consolidation — an
    EQUALITY delete applies only to data files with sequence STRICTLY
    LESS than its own. A re-ingested key in a LATER append must survive
    the merge of its manifest with pre-delete manifests (a naive merge
    under one min/max sequence would resurrect or over-mask)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "rw_eq")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2
    )
    # eq-delete id IN (1, 2) at seq 2
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(1,), (2,)], "id long")
    )
    # re-ingest id=1 at seq 3 (strictly newer -> survives the delete)
    iceberg.write_iceberg(
        spark, spark.createDataFrame([(1,)], "id long"), root,
        format_version=2,
    )
    pre = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert pre == [0, 1, 3, 4]
    out = iceberg.rewrite_manifests_iceberg(spark, root)
    assert out["snapshot_id"] is not None and out["after"] == 1
    post = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert post == pre, (
        "consolidation must not change delete scoping: the re-ingested "
        "row survives, the seq-1 rows stay masked"
    )
    # position delete AFTER consolidation still lands on the right rows
    iceberg.delete_iceberg(spark, root, "id = 4")
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, root).collect()
    ) == [0, 1, 3]


def test_rewrite_manifests_partitioned(spark, tmp_path):
    root = str(tmp_path / "rmp")
    for i in range(3):
        iceberg.write_iceberg(
            spark,
            spark.range(i * 60, (i + 1) * 60).select(
                "id", (F.col("id") % 3).cast("int").alias("p")
            ),
            root,
            format_version=2,
            partition_by=["p"],
        )
    out = iceberg.rewrite_manifests_iceberg(spark, root)
    assert out["before"] == 3 and out["after"] == 1
    got = {(r.id, r.p) for r in iceberg.read_iceberg(spark, root).collect()}
    assert got == {(i, i % 3) for i in range(180)}
    # partition tuples carried: pruning by partition value still engages
    rep = iceberg.iceberg_scan_report(root, "p = 1")
    assert rep["kept_files"] < rep["total_files"]


def _make_avro_data_table(spark, root, mixed=False):
    """Hand-build an Iceberg table whose DATA files are Avro containers
    (the spec allows parquet/avro/orc data) — v2, flat, no deletes."""
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    rec_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "d", "type": ["null", "int"]},    # date: days
            {"name": "ts", "type": ["null", "long"]},  # timestamp: micros
            {"name": "v", "type": "double"},
        ],
    }
    entries = []
    for i in range(3):
        rel = os.path.join(data_dir, f"a{i}.avro")
        rows = [
            {
                "id": i * 10 + j,
                "name": f"r{i*10+j}" if j % 3 else None,
                "d": 19000 + i,
                "ts": (i * 10 + j) * 1_000_000,
                "v": (i * 10 + j) / 4.0,
            }
            for j in range(10)
        ]
        avro_lite.write_container(rel, rec_schema, rows)
        entries.append(
            {
                "status": 1,
                "data_file": {
                    "content": 0,
                    "file_path": f"file:{os.path.abspath(rel)}",
                    "file_format": "AVRO",
                    "record_count": 10,
                    "file_size_in_bytes": os.path.getsize(rel),
                },
            }
        )
    if mixed:
        # the PARQUET side stores NATIVE logical types (real date32 /
        # timestamp columns), unlike avro's physical ints/longs
        import datetime

        rel = os.path.join(data_dir, "p0.parquet")
        spark.createDataFrame(
            [
                (
                    100,
                    "pq",
                    datetime.date(2022, 4, 18),
                    datetime.datetime(2022, 4, 18, 12, 0, 0),
                    9.5,
                )
            ],
            "id long, name string, d date, ts timestamp_ntz, v double",
        ).toPandas().to_parquet(rel, coerce_timestamps="us")
        entries.append(
            {
                "status": 1,
                "data_file": {
                    "content": 0,
                    "file_path": f"file:{os.path.abspath(rel)}",
                    "file_format": "PARQUET",
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(rel),
                },
            }
        )
    manifest = os.path.join(meta_dir, "m0.avro")
    avro_lite.write_container(manifest, _MANIFEST_SCHEMA | {}, entries) if False else None
    # full-fidelity manifest (file_format must survive)
    mschema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": ["null", "int"]},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    avro_lite.write_container(manifest, mschema, entries)
    mlist = os.path.join(meta_dir, "snap-1.avro")
    avro_lite.write_container(
        mlist,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": f"file:{os.path.abspath(manifest)}",
                "manifest_length": os.path.getsize(manifest),
                "content": 0,
            }
        ],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "t-avro",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 1,
        "last-column-id": 5,
        "current-schema-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "name", "required": False, "type": "string"},
                    {"id": 3, "name": "d", "required": False, "type": "date"},
                    {"id": 4, "name": "ts", "required": False, "type": "timestamp"},
                    {"id": 5, "name": "v", "required": False, "type": "double"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1,
                "manifest-list": f"file:{os.path.abspath(mlist)}",
                "summary": {"operation": "append"},
                "schema-id": 0,
                "sequence-number": 1,
            }
        ],
        "snapshot-log": [{"timestamp-ms": 1, "snapshot-id": 1}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return root


def test_read_avro_data_files(spark, tmp_path):
    """AVRO data files (round 8): the spec allows them, foreign writers
    produce them, and read_iceberg scans them distributed through
    avro_lite with declared-schema projection and logical-type decode."""
    import datetime

    root = _make_avro_data_table(spark, str(tmp_path / "avrodata"))
    df = iceberg.read_iceberg(spark, root)
    assert [f.name for f in df.schema.fields] == ["id", "name", "d", "ts", "v"]
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 30
    assert rows[0].name is None and rows[1].name == "r1"
    assert rows[12].d == datetime.date(1970, 1, 1) + datetime.timedelta(days=19001)
    assert rows[12].ts == datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=12)
    assert rows[12].v == 3.0
    # filter applies (no bounds in this hand-built manifest → fail-open scan)
    assert iceberg.read_iceberg(spark, root, where="id >= 25").count() == 5


def test_read_mixed_avro_parquet(spark, tmp_path):
    root = _make_avro_data_table(spark, str(tmp_path / "mixed"), mixed=True)
    df = iceberg.read_iceberg(spark, root)
    assert df.count() == 31
    pq_row = df.where("id = 100").collect()[0]
    assert pq_row.name == "pq" and pq_row.v == 9.5


# ------------------------------------------- round 9: avro write + fid ----


def test_write_iceberg_avro_roundtrip_and_bounds(spark, tmp_path):
    """write_iceberg(data_format='avro'): executor-side avro_lite
    containers with field-id-stamped writer schemas, per-file stats
    collected in the SAME pass (avro has no footer), manifest entries
    marked AVRO — readable back through read_iceberg with logical-type
    decode, and bounds pruning engages exactly like the parquet path."""
    import datetime as dt

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
    root = str(tmp_path / "avro_rt")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="avro")
    back = iceberg.read_iceberg(spark, root)
    assert back.count() == 20
    r = back.where("id = 7").collect()[0]
    assert r.name == "n7"
    assert r.d == dt.date(2024, 1, 2)
    assert r.ts == dt.datetime(2024, 1, 1, 0, 0, 7)
    assert r.v == 1.75 and r.flag is False
    assert back.where("name IS NULL").count() == 1
    # manifest says AVRO and carries write-pass bounds: a dead predicate
    # prunes every file with zero data IO
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)
    assert all(d["format"] == "AVRO" for d in data)
    assert all(d.get("lower_bounds") for d in data)
    rep = iceberg.iceberg_scan_report(root, "id >= 1000")
    assert rep["eligible"] and rep["kept_files"] == 0
    # appends compose
    iceberg.write_iceberg(
        spark, df.where("id < 3"), root, format_version=2, data_format="avro"
    )
    assert iceberg.read_iceberg(spark, root).count() == 23


def test_write_iceberg_avro_partitioned_prunes(spark, tmp_path):
    """Identity-partitioned AVRO table (VERDICT r8 #4): typed partition
    tuples in the manifest, partition pruning engages, values roundtrip."""
    import datetime as dt

    df = spark.createDataFrame(
        [(i, f"n{i}", dt.date(2024, 1, 1 + i % 3)) for i in range(30)],
        "id long, name string, d date",
    ).coalesce(2)
    root = str(tmp_path / "avro_part")
    iceberg.write_iceberg(
        spark, df, root, format_version=2, data_format="avro", partition_by=["d"]
    )
    back = iceberg.read_iceberg(spark, root)
    assert back.count() == 30
    rep = iceberg.iceberg_scan_report(root, "d = DATE '2024-01-02'")
    assert rep["eligible"] and 0 < rep["kept_files"] < rep["total_files"]
    got = iceberg.read_iceberg(spark, root, where="d = DATE '2024-01-02'")
    assert got.count() == 10
    assert {r.id % 3 for r in got.collect()} == {1}
    # tuples are typed (days-from-epoch ints for dates)
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(meta, meta["current-snapshot-id"], root)
    days = {d["partition"]["d"] for d in data}
    assert days == {19723, 19724, 19725}


def test_avro_field_id_resolution_after_rename(spark, tmp_path):
    """ADVICE r8 (medium): AVRO columns must resolve by FIELD ID, not
    name — after rename_iceberg_column the old files keep the old name
    and a name-based read would silently null the column."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    root = str(tmp_path / "avro_ren")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="avro")
    iceberg.rename_iceberg_column(root, "name", "label")
    rows = {r.id: r.label for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows == {1: "a", 2: "b"}


def test_avro_column_added_after_file_null_fills(spark, tmp_path):
    """A field-id absent from a fid-stamped file means the column was
    added AFTER the file — null-fill is provably correct there."""
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    root = str(tmp_path / "avro_evo")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="avro")
    df2 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, v double")
    iceberg.write_iceberg(
        spark, df2, root, format_version=2, data_format="avro", merge_schema=True
    )
    rows = {r.id: r for r in iceberg.read_iceberg(spark, root).collect()}
    assert rows[1].v is None and rows[2].v == 9.5


def _make_avro_identity_omitting_table(spark, root):
    """Foreign-writer shape: identity-partitioned AVRO files that OMIT
    the partition source column (spec §Column Projection) — values must
    reconstruct from the manifest partition tuples."""
    data_dir = os.path.join(root, "data")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    rec_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
        ],
    }
    entries = []
    for i, day in enumerate((19000, 19001)):
        rel = os.path.join(data_dir, f"a{i}.avro")
        avro_lite.write_container(
            rel,
            rec_schema,
            [{"id": i * 10 + j, "name": f"r{j}"} for j in range(5)],
        )
        entries.append(
            {
                "status": 1,
                "data_file": {
                    "content": 0,
                    "file_path": f"file:{os.path.abspath(rel)}",
                    "file_format": "AVRO",
                    "partition": {"d": day},
                    "record_count": 5,
                    "file_size_in_bytes": os.path.getsize(rel),
                },
            }
        )
    mschema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": ["null", "int"]},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {"name": "d", "type": ["null", "int"]}
                                ],
                            },
                        },
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    manifest = os.path.join(meta_dir, "m0.avro")
    avro_lite.write_container(manifest, mschema, entries)
    mlist = os.path.join(meta_dir, "snap-1.avro")
    avro_lite.write_container(
        mlist,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": f"file:{os.path.abspath(manifest)}",
                "manifest_length": os.path.getsize(manifest),
                "content": 0,
            }
        ],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "t-avro-ident",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 1,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "name", "required": False, "type": "string"},
                    {"id": 3, "name": "d", "required": False, "type": "date"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "d",
                        "transform": "identity",
                        "source-id": 3,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1,
                "manifest-list": f"file:{os.path.abspath(mlist)}",
                "summary": {"operation": "append"},
                "schema-id": 0,
                "sequence-number": 1,
            }
        ],
        "snapshot-log": [{"timestamp-ms": 1, "snapshot-id": 1}],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return root


def test_avro_identity_partition_tuple_backfill(spark, tmp_path):
    import datetime as dt

    root = _make_avro_identity_omitting_table(spark, str(tmp_path / "omit"))
    df = iceberg.read_iceberg(spark, root)
    assert [f.name for f in df.schema.fields] == ["id", "name", "d"]
    rows = {r.id: r.d for r in df.collect()}
    assert len(rows) == 10
    epoch = dt.date(1970, 1, 1)
    assert rows[0] == epoch + dt.timedelta(days=19000)
    assert rows[10] == epoch + dt.timedelta(days=19001)
    # pruning through the tuple still engages
    rep = iceberg.iceberg_scan_report(
        root, f"d = DATE '{epoch + dt.timedelta(days=19001)}'"
    )
    assert rep["eligible"] and rep["kept_files"] == 1


def test_avro_missing_column_without_fids_fails_loud(spark, tmp_path):
    """A declared column absent from a NO-field-id avro file cannot be
    proven 'added later' — a foreign rename would read all-NULL, so the
    scan fails loudly instead (ADVICE r8 medium, the fail-loud half)."""
    root = _make_avro_data_table(spark, str(tmp_path / "nofid"))
    # simulate a foreign engine's rename: same field id, new name — the
    # files keep the old name and carry no fid attributes
    mp = iceberg.latest_metadata_path(root)
    meta = json.load(open(mp))
    meta["schemas"][0]["fields"][1]["name"] = "title"
    json.dump(meta, open(mp, "w"))
    with pytest.raises(Exception, match="without field-id"):
        iceberg.read_iceberg(spark, root).collect()


def test_avro_mixed_partitioned_reads_with_backfill(spark, tmp_path):
    """Round 10: a partitioned table mixing AVRO and parquet data files
    reads — the parquet subset routes through the MAIN scan path, whose
    identity-backfill fills partition source columns the files omit
    (the round-9 fast union skipped backfill and refused instead)."""
    import datetime as dt

    root = str(tmp_path / "mixed_part")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1, dt.date(2024, 1, 1))], "id long, d date"),
        root, format_version=2, data_format="avro", partition_by=["d"],
    )
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(2, dt.date(2024, 1, 2))], "id long, d date"),
        root, format_version=2, partition_by=["d"],
    )
    got = sorted(
        (r.id, r.d.isoformat())
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(1, "2024-01-01"), (2, "2024-01-02")]
    # partition pruning still engages across both format groups
    assert (
        iceberg.read_iceberg(spark, root, where="d = DATE'2024-01-02'")
        .count() == 1
    )


def test_write_avro_unsupported_type_fails_loud(spark, tmp_path):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, blob binary")
    with pytest.raises(NotImplementedError, match="no supported avro"):
        iceberg.write_iceberg(
            spark, df, str(tmp_path / "bin"), format_version=2, data_format="avro"
        )


def test_incremental_analyze_avro_falls_back(spark, tmp_path):
    """ADVICE r8 (low): incremental ANALYZE on a table containing AVRO
    data files must fall back to the full reader (the parquet footer
    probe raises ArrowInvalid, not OSError; spark.read.parquet would
    misread the bytes)."""
    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    root = str(tmp_path / "avro_an")
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="avro")
    iceberg.analyze_iceberg(spark, root, columns=["id"])
    df2 = spark.createDataFrame([(i,) for i in range(50, 80)], "id long")
    iceberg.write_iceberg(spark, df2, root, format_version=2, data_format="avro")
    iceberg.analyze_iceberg(spark, root, columns=["id"], incremental=True)
    st = iceberg.table_statistics(root)
    assert st["ndv"]["id"] == 80  # exact-mode sketch over the full table


def test_reanalyze_same_snapshot_unlinks_superseded_puffin(spark, tmp_path):
    """ADVICE r8 (low): re-running ANALYZE on the same snapshot replaces
    the statistics entry — the dereferenced Puffin file must be deleted,
    not leaked forever."""
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    root = str(tmp_path / "rean")
    iceberg.write_iceberg(spark, df, root, format_version=2)
    p1 = iceberg.analyze_iceberg(spark, root, columns=["id"])
    assert os.path.exists(p1)
    p2 = iceberg.analyze_iceberg(spark, root, columns=["id"])
    assert os.path.exists(p2) and not os.path.exists(p1)
    meta = iceberg._load_metadata(root)
    assert len(meta.get("statistics") or []) == 1


# -------------------------------------- round 9: AVRO position deletes ----


_POS_DELETE_SCHEMA = {
    "type": "record",
    "name": "pos_delete",
    "fields": [
        {"name": "file_path", "type": "string", "field-id": 2147483546},
        {"name": "pos", "type": "long", "field-id": 2147483545},
    ],
}


def _transcode_pos_deletes_to_avro(root):
    """Foreign-writer shape (Flink's classic default): rewrite every
    position-delete parquet as an Avro container and patch the delete
    manifests to record AVRO — the table then exercises the read path's
    format gate AND the container sniff."""
    import pyarrow.parquet as pq

    meta = iceberg._load_metadata(root)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    mlist = iceberg._localize(snap["manifest-list"], root)
    swapped = {}
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
            new = old.rsplit(".", 1)[0] + ".avro"
            avro_lite.write_container(
                new,
                _POS_DELETE_SCHEMA,
                [
                    {"file_path": f, "pos": p}
                    for f, p in zip(
                        t.column("file_path").to_pylist(),
                        t.column("pos").to_pylist(),
                    )
                ],
            )
            os.unlink(old)
            df_struct["file_path"] = f"file:{new}"
            df_struct["file_format"] = "AVRO"
            df_struct["file_size_in_bytes"] = os.path.getsize(new)
            swapped[old] = new
            changed = True
        if changed:
            avro_lite.write_container(
                mpath, iceberg._manifest_entry_schema(2), rows
            )
    assert swapped, "no position-delete files found to transcode"
    return swapped


def test_avro_position_deletes_mask_rows(spark, tmp_path):
    """AVRO position-delete files mask exactly like parquet ones: the
    scan-plan gate admits them (content=1), _read_pos_delete_pairs sniffs
    the container magic and decodes distributed via avro_lite."""
    root = str(tmp_path / "avro_posdel")
    df = spark.range(0, 40).select("id", (F.col("id") * 2).alias("v"))
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.write_iceberg(
        spark,
        spark.range(40, 60).select("id", (F.col("id") * 2).alias("v")),
        root,
        format_version=2,
    )
    iceberg.delete_iceberg(spark, root, "id % 7 = 3")
    expected = sorted(
        i for i in range(60) if i % 7 != 3
    )
    _transcode_pos_deletes_to_avro(root)
    back = iceberg.read_iceberg(spark, root)
    got = sorted(r.id for r in back.collect())
    assert got == expected
    assert back.where("id = 11").collect()[0].v == 22


def test_avro_position_deletes_in_cdf(spark, tmp_path):
    """read_iceberg_cdf decodes AVRO position deletes too (the driver
    pairs loop sniffs the magic)."""
    root = str(tmp_path / "avro_posdel_cdf")
    s0 = iceberg.write_iceberg(
        spark, spark.range(10).select("id"), root, format_version=2
    )
    s1 = iceberg.delete_iceberg(spark, root, "id IN (3, 7)")
    _transcode_pos_deletes_to_avro(root)
    cdf = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)
    rows = {(r.id, r._change_type) for r in cdf.collect()}
    assert rows == {(3, "delete"), (7, "delete")}


def test_avro_equality_deletes_apply(spark, tmp_path):
    """Equality-delete files in AVRO apply (round 9): keys resolve by
    FIELD ID from the file's writer schema — the transcoded file even
    RENAMES its field to prove name-independent resolution — and the
    masked read matches the parquet-eq-delete behavior exactly."""
    root = str(tmp_path / "avro_eqdel")
    iceberg.write_iceberg(
        spark, spark.range(10).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(3,)], "id long")
    )
    _transcode_eq_deletes_to_avro(root)
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [i for i in range(10) if i != 3]
    # sequence scoping survives the transcode: re-ingesting the key
    # after the delete lives
    iceberg.write_iceberg(
        spark, spark.createDataFrame([(3,)], "id long"), root,
        format_version=2,
    )
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == list(range(10))


def test_avro_pos_deletes_fold_into_delta_dvs(spark, tmp_path):
    """convert_iceberg_to_delta folds AVRO position deletes into Delta
    deletion vectors (the fold's avro branch emits the source path)."""
    from feature_store_ml_spark.io import convert, lakehouse

    root = str(tmp_path / "avro_posdel_conv")
    df = spark.range(0, 30).select("id", (F.col("id") % 5).alias("v"))
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.delete_iceberg(spark, root, "id IN (4, 9, 25)")
    _transcode_pos_deletes_to_avro(root)
    convert.convert_iceberg_to_delta(spark, root)
    got = sorted(r.id for r in lakehouse.read_delta(spark, root).collect())
    assert got == sorted(set(range(30)) - {4, 9, 25})


_AVRO_EQ_TYPES = {"int64": "long", "string": "string", "double": "double"}


def _transcode_eq_deletes_to_avro(root):
    """Rewrite every equality-delete parquet as an Avro container whose
    fields carry the ORIGINAL field ids but RENAMED names (proving the
    reader resolves by id, not name), patching the delete manifests."""
    import pyarrow.parquet as pq

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
            fields = []
            for fld in t.schema:
                fields.append(
                    {
                        "name": f"foreign_{fld.name}",
                        "type": ["null", _AVRO_EQ_TYPES[str(fld.type)]],
                        "field-id": fid_of[fld.name],
                    }
                )
            schema = {"type": "record", "name": "eq", "fields": fields}
            recs = [
                {f"foreign_{k}": v for k, v in row.items()}
                for row in t.to_pylist()
            ]
            new = old.rsplit(".", 1)[0] + ".avro"
            avro_lite.write_container(new, schema, recs)
            os.unlink(old)
            df_struct["file_path"] = f"file:{new}"
            df_struct["file_format"] = "AVRO"
            df_struct["file_size_in_bytes"] = os.path.getsize(new)
            swapped += 1
            changed = True
        if changed:
            avro_lite.write_container(
                mpath, iceberg._manifest_entry_schema(2), rows
            )
    assert swapped, "no equality-delete files found to transcode"


def test_avro_equality_deletes_in_cdf(spark, tmp_path):
    """read_iceberg_cdf decodes AVRO equality deletes (driver key read,
    field-id resolution)."""
    root = str(tmp_path / "avro_eqdel_cdf")
    s0 = iceberg.write_iceberg(
        spark, spark.range(10).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg_equality(
        spark, root, spark.createDataFrame([(4,), (6,)], "id long")
    )
    _transcode_eq_deletes_to_avro(root)
    cdf = iceberg.read_iceberg_cdf(spark, root, from_snapshot_id=s0)
    assert {(r.id, r._change_type) for r in cdf.collect()} == {
        (4, "delete"),
        (6, "delete"),
    }


def test_avro_delete_lifecycle_with_rename(spark, tmp_path):
    """Row-level DELETE on an AVRO data table, composed with a rename:
    the reader's own (_fp, _ri) identity feeds the position-delete
    writer, and the mask still applies through field-id resolution after
    the rename."""
    root = str(tmp_path / "avro_del")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(15)], "id long, name string"
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="avro")
    iceberg.delete_iceberg(spark, root, "id % 5 = 2")
    iceberg.rename_iceberg_column(root, "name", "label")
    back = iceberg.read_iceberg(spark, root)
    got = sorted((r.id, r.label) for r in back.collect())
    assert got == [(i, f"n{i}") for i in range(15) if i % 5 != 2]


def test_avro_maintenance_lifecycle(spark, tmp_path):
    """Table maintenance composes on AVRO data tables: rewrite_manifests
    carries entries verbatim WITH their file_format, compaction rewrites
    to parquet, and expiration reclaims the superseded avro data files."""
    root = str(tmp_path / "avro_maint")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(8)], "id long, name string"
    )
    for k in range(3):
        iceberg.write_iceberg(
            spark, df.where(f"id % 3 = {k}"), root, format_version=2,
            data_format="avro",
        )
    out = iceberg.rewrite_manifests_iceberg(spark, root)
    assert out["before"] == 3 and out["after"] == 1
    meta = iceberg._load_metadata(root)
    plan, _ = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    assert {d.get("format") for d in plan} == {"AVRO"}, (
        "manifest consolidation must preserve file_format"
    )
    assert iceberg.read_iceberg(spark, root).count() == 8
    iceberg.compact_iceberg(spark, root)
    iceberg.expire_iceberg_snapshots(root, keep=1)
    assert iceberg.read_iceberg(spark, root).count() == 8
    leftover = [
        f
        for f in os.listdir(os.path.join(root, "data"))
        if f.endswith(".avro")
    ]
    assert leftover == [], "expiration must reclaim superseded avro files"


def test_spool_materializes_rowfmt_files(spark, tmp_path):
    """Round 10: the streaming spool MATERIALIZES AVRO/ORC data files
    into parquet (one distributed decode per sync, idempotent markers);
    the metadata-only call shape (no spark) still refuses loudly rather
    than misreading bytes."""
    from feature_store_ml_spark.streaming import iceberg_source

    root = str(tmp_path / "avro_spool")
    iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2,
        data_format="avro",
    )
    with pytest.raises(NotImplementedError, match="materializ"):
        iceberg_source.sync_iceberg_spool(root, str(tmp_path / "spool"))
    spool = str(tmp_path / "spool2")
    snap = iceberg_source.sync_iceberg_spool(root, spool, spark=spark)
    # idempotent: a second sync (same snapshot) adds nothing
    iceberg_source.sync_iceberg_spool(root, spool, spark=spark)
    got = sorted(r.id for r in spark.read.parquet(spool).collect())
    assert got == [0, 1, 2, 3, 4]
    # incremental: a second avro append materializes only the new rows
    iceberg.write_iceberg(
        spark, spark.range(5, 8).select("id"), root, format_version=2,
        data_format="avro",
    )
    iceberg_source.sync_iceberg_spool(root, spool, since_snapshot_id=snap,
                                      spark=spark)
    got = sorted(r.id for r in spark.read.parquet(spool).collect())
    assert got == list(range(8))
    # overlapping re-sync from the beginning must not duplicate rows
    iceberg_source.sync_iceberg_spool(root, spool, spark=spark)
    got = sorted(r.id for r in spark.read.parquet(spool).collect())
    assert got == list(range(8))


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.one_of(st.none(), st.text(max_size=40)),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                st.booleans(),
            ),
            max_size=60,
        ),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_avro_container_roundtrip_property(rows, seed, tmp_path_factory):
        """ANY record batch of (long, nullable string, double, boolean)
        survives the container writer→reader byte-exactly, and the
        block-header record counter agrees without decoding."""
        schema = {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "a", "type": "long", "field-id": 1},
                {"name": "s", "type": ["null", "string"], "field-id": 2},
                {"name": "f", "type": "double", "field-id": 3},
                {"name": "b", "type": "boolean", "field-id": 4},
            ],
        }
        recs = [
            {"a": a, "s": s, "f": f, "b": b} for a, s, f, b in rows
        ]
        p = str(
            tmp_path_factory.mktemp("avro_prop") / f"r{seed}.avro"
        )
        avro_lite.write_container(p, schema, recs)
        wschema, back = avro_lite.read_container_with_schema(p)
        assert back == recs
        assert [f["field-id"] for f in wschema["fields"]] == [1, 2, 3, 4]
        assert avro_lite.count_container_records(p) == len(recs)

except ImportError:
    pass


def test_write_container_columnar_bit_parity():
    """Round 10: the vectorized columnar avro writer produces BYTE-
    IDENTICAL containers to the per-row writer for flat nullable-
    primitive schemas (the Iceberg data-file shape) — same union
    framing, varints, IEEE bytes, single block."""
    import random
    import tempfile

    import numpy as np

    from feature_store_ml_spark.io import avro_lite as A

    schema = {
        "type": "record", "name": "row",
        "fields": [
            {"name": "i", "type": ["null", "int"], "field-id": 1},
            {"name": "l", "type": ["null", "long"], "field-id": 2},
            {"name": "f", "type": ["null", "float"], "field-id": 3},
            {"name": "d", "type": ["null", "double"], "field-id": 4},
            {"name": "b", "type": ["null", "boolean"], "field-id": 5},
            {"name": "s", "type": ["null", "string"], "field-id": 6},
        ],
    }
    rng = random.Random(7)
    recs = [
        {
            "i": None if k % 7 == 0 else rng.randint(-(2**31), 2**31 - 1),
            "l": None if k % 11 == 0 else rng.randint(-(2**62), 2**62),
            "f": None if k % 5 == 0 else rng.uniform(-1e30, 1e30),
            "d": None if k % 13 == 0 else rng.uniform(-1e300, 1e300),
            "b": None if k % 17 == 0 else (k % 2 == 0),
            "s": None if k % 3 == 0 else ("héllo" * (k % 4) + str(k)),
        }
        for k in range(3000)
    ]
    with tempfile.TemporaryDirectory() as d:
        p1, p2 = f"{d}/row.avro", f"{d}/col.avro"
        A.write_container(p1, schema, recs)

        def col(name, prim):
            nulls = np.array([r[name] is None for r in recs])
            if prim in ("int", "long"):
                vals = np.array(
                    [0 if r[name] is None else r[name] for r in recs],
                    dtype=np.int64,
                )
            elif prim in ("float", "double"):
                vals = np.array(
                    [0.0 if r[name] is None else r[name] for r in recs],
                    dtype=np.float64,
                )
            elif prim == "boolean":
                vals = np.array(
                    [bool(r[name]) for r in recs], dtype=bool
                )
            else:
                vals = np.array(
                    ["" if r[name] is None else r[name] for r in recs],
                    dtype=object,
                )
            return (vals, nulls, prim)

        A.write_container_columnar(
            p2, schema,
            [col("i", "int"), col("l", "long"), col("f", "float"),
             col("d", "double"), col("b", "boolean"), col("s", "string")],
        )
        b1 = open(p1, "rb").read()
        b2 = open(p2, "rb").read()
        # record ENCODING is bit-identical; headers differ by exactly one
        # metadata key (the columnar writer's fsml.rowlens sidecar, which
        # makes the columnar READ fully vectorizable). Compare from the
        # sync marker: count + block bytes + trailing sync.
        sync = b"\x00" * 8 + b"avrolite"
        blk1 = b1[b1.index(sync) + 16:]
        blk2 = b2[b2.index(sync) + 16:]
        assert blk1 == blk2, "columnar block must be bit-identical"
        assert b"fsml.rowlens" in b2 and b"fsml.rowlens" not in b1
        assert A.read_container(p2)[1]["s"] == recs[1]["s"]
        # and the columnar READER decodes both files identically
        import struct as _struct

        for src in (p1, p2):
            _sch, cols, total = A.read_container_columnar(src)
            assert total == len(recs)
            for f in ("i", "l", "f", "d", "b", "s"):
                vals, mask = cols[f]
                for i in (0, 1, 5, 7, 11, 13, 17, 2999):
                    exp = recs[i][f]
                    if f == "f" and exp is not None:
                        # float fields store f32: compare the ROUNDED value
                        exp = _struct.unpack("<f", _struct.pack("<f", exp))[0]
                    if exp is None:
                        assert mask[i]
                    else:
                        assert not mask[i] and vals[i] == exp


def test_write_iceberg_avro_deflate_codec(spark, tmp_path):
    """Round 10: write_iceberg(data_format='avro', data_codec='deflate')
    writes spec-codec deflate containers (raw DEFLATE block payloads,
    'avro.codec'='deflate' in the header) — smaller on disk, read back
    identically by both decode paths, delete content unaffected."""
    import os

    from pyspark.sql import functions as F

    rows = spark.range(4000).select(
        "id",
        F.concat(F.lit("padpadpad-"), (F.col("id") % 50).cast("string"))
        .alias("s"),
    )
    root_d = str(tmp_path / "defl")
    root_n = str(tmp_path / "plain")
    iceberg.write_iceberg(
        spark, rows, root_d, format_version=2, data_format="avro",
        data_codec="deflate",
    )
    iceberg.write_iceberg(
        spark, rows, root_n, format_version=2, data_format="avro",
    )

    def _data_bytes(root):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(os.path.join(root, "data"))
            for f in fs
        )

    assert _data_bytes(root_d) < 0.8 * _data_bytes(root_n), (
        "deflate data files should be materially smaller"
    )
    a = sorted((r.id, r.s) for r in iceberg.read_iceberg(spark, root_d).collect())
    b = sorted((r.id, r.s) for r in iceberg.read_iceberg(spark, root_n).collect())
    assert a == b and len(a) == 4000
    # DML still works on the deflate table (decode feeds the identity scan)
    iceberg.delete_iceberg(spark, root_d, "id % 100 = 0")
    assert iceberg.read_iceberg(spark, root_d).count() == 3960
    iceberg.update_iceberg(spark, root_d, {"s": "'X'"}, where="id = 1")
    assert (
        iceberg.read_iceberg(spark, root_d).where("id = 1").collect()[0].s
        == "X"
    )
    # invalid combos refuse
    with pytest.raises(ValueError, match="data_codec"):
        iceberg.write_iceberg(
            spark, rows, str(tmp_path / "bad"), format_version=2,
            data_codec="deflate",
        )


def test_avro_equality_deletes_distributed_decode_and_jumbo_path(
    spark, tmp_path, monkeypatch
):
    """Round 11: non-parquet equality-delete keys decode DISTRIBUTED (no
    driver size bound) and the join strategy follows the file's record
    count — below `_EQ_BROADCAST_MAX_KEYS` the keys carry a broadcast
    hint; above it the SAME read stays hash-exact through an unhinted
    (shuffle) anti-join. The threshold is lowered to force the jumbo leg
    without a multi-GB fixture."""
    root = str(tmp_path / "avro_eqdel_jumbo")
    iceberg.write_iceberg(
        spark, spark.range(50).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg_equality(
        spark,
        root,
        spark.createDataFrame([(i,) for i in range(0, 50, 7)], "id long"),
    )
    _transcode_eq_deletes_to_avro(root)
    expect = [i for i in range(50) if i % 7 != 0]

    # small-file leg: broadcast hint present in the optimized plan
    plan = iceberg.read_iceberg(spark, root)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == expect

    # jumbo leg: force every key set over the bound; result identical,
    # anti-join no longer broadcasts the keys
    monkeypatch.setattr(iceberg, "_EQ_BROADCAST_MAX_KEYS", 0)
    df = iceberg.read_iceberg(spark, root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    got = sorted(r.id for r in df.collect())
    assert got == expect
