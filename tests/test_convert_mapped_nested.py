"""Column-mapped Delta -> Iceberg conversion of NESTED columns (round
14, ADVICE r13 medium): standard delta-spark stamps every nested
StructField with its own delta.columnMapping.id / physicalName and (in
id mode) writes member field ids into the footers. The conversion must
DERIVE the Iceberg member ids from that metadata — fresh ids would
mismatch every footer and read members silently NULL — and the footer
probe must demand MEMBER-level evidence, not just top-level. Tables
mapped only at the top level (this repo's own writer: members stored
under logical names) keep the round-13 fresh-id contract."""

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_ml_spark.io import convert, iceberg, lakehouse


def _foreign_mapped_nested(spark, root, with_member_fids=True, part=False):
    """Hand-craft a standard-delta-spark-style ID-mode table: logical
    schema ``id bigint, s struct<a:bigint, b:string>`` stored under
    physical names col-id / col-s(col-a, col-b), member ids 3/4."""
    os.makedirs(os.path.join(root, "_delta_log"))
    rows = [(i, (i * 10, f"t{i}")) for i in range(8)]
    df = spark.createDataFrame(
        rows, "`col-id` bigint, `col-s` struct<`col-a`:bigint,`col-b`:string>"
    )
    member_md = (
        (lambda fid: {"parquet.field.id": fid})
        if with_member_fids
        else (lambda fid: {})
    )
    stamped = T.StructType(
        [
            T.StructField(
                "col-id", T.LongType(), True,
                metadata={"parquet.field.id": 1},
            ),
            T.StructField(
                "col-s",
                T.StructType(
                    [
                        T.StructField(
                            "col-a", T.LongType(), True,
                            metadata=member_md(3),
                        ),
                        T.StructField(
                            "col-b", T.StringType(), True,
                            metadata=member_md(4),
                        ),
                    ]
                ),
                True,
                metadata={"parquet.field.id": 2},
            ),
        ]
    )
    df = df.to(stamped)
    df.repartition(1).write.mode("append").parquet(root)
    data = [
        f for f in os.listdir(root)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-id",
                },
            },
            {
                "name": "s",
                "type": {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "a",
                            "type": "long",
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 3,
                                "delta.columnMapping.physicalName": "col-a",
                            },
                        },
                        {
                            "name": "b",
                            "type": "string",
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 4,
                                "delta.columnMapping.physicalName": "col-b",
                            },
                        },
                    ],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-s",
                },
            },
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["id"] if part else [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "4",
                },
                "createdTime": 0,
            }
        },
    ] + [
        {
            "add": {
                "path": f,
                "size": os.path.getsize(os.path.join(root, f)),
                "modificationTime": 0,
                "dataChange": True,
                "partitionValues": {},
            }
        }
        for f in data
    ]
    with open(
        os.path.join(root, "_delta_log", "00000000000000000000.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return rows


def test_foreign_mapped_nested_derives_member_ids(spark, tmp_path):
    root = str(tmp_path / "f")
    rows = _foreign_mapped_nested(spark, root)
    convert.convert_delta_to_iceberg(spark, root)
    meta = iceberg._load_metadata(root)
    sch = iceberg._current_schema(meta)
    s_field = next(f for f in sch["fields"] if f["name"] == "s")
    member_ids = {g["name"]: g["id"] for g in s_field["type"]["fields"]}
    # the ids ARE Delta's nested columnMapping ids, never fresh
    assert member_ids == {"a": 3, "b": 4}
    assert (meta.get("properties") or {}).get("fsml.field-id-read") == "true"
    back = iceberg.read_iceberg(spark, root)
    got = sorted((r.id, r.s["a"], r.s["b"]) for r in back.collect())
    assert got == [(i, a, b) for i, (a, b) in rows]
    # PROJECTED member access (the silent-NULL shape) decodes too
    proj = sorted(
        (r.id, r.x)
        for r in back.selectExpr("id", "s.a AS x").collect()
    )
    assert proj == [(i, a) for i, (a, _b) in rows]


def test_foreign_mapped_nested_without_member_fids_refuses(spark, tmp_path):
    """Members stored under physical names with NO footer member ids:
    neither evidence form holds — refuse, never silent NULLs (this was
    the round-13 hole: top-level evidence admitted the file)."""
    root = str(tmp_path / "nofid")
    _foreign_mapped_nested(spark, root, with_member_fids=False)
    with pytest.raises(NotImplementedError, match="MEMBER"):
        convert.convert_delta_to_iceberg(spark, root)


def test_own_mapped_writer_stamps_and_derives(spark, tmp_path):
    """Round 14: this repo's own mapped writer assigns nested member
    columnMapping ids (standard delta-spark shape, physicalName = the
    member's own name) and stamps member field ids into id-mode
    footers — conversion DERIVES those ids and the member-resolving
    read leg engages."""
    root = str(tmp_path / "own")
    df = spark.createDataFrame(
        [(i, (i * 10, f"t{i}")) for i in range(6)],
        "id bigint, s struct<a:bigint,b:string>",
    )
    lakehouse.write_delta(spark, df, root, column_mapping="id")
    _, meta_d = lakehouse._replay_log_adds(root)
    sch = json.loads(meta_d["schemaString"])
    s_f = next(f for f in sch["fields"] if f["name"] == "s")
    mids = {
        g["name"]: g["metadata"]["delta.columnMapping.id"]
        for g in s_f["type"]["fields"]
    }
    assert set(mids) == {"a", "b"} and len(set(mids.values())) == 2
    assert int(
        meta_d["configuration"]["delta.columnMapping.maxColumnId"]
    ) >= max(mids.values())
    convert.convert_delta_to_iceberg(spark, root)
    meta = iceberg._load_metadata(root)
    i_s = next(
        f
        for f in iceberg._current_schema(meta)["fields"]
        if f["name"] == "s"
    )
    assert {g["name"]: g["id"] for g in i_s["type"]["fields"]} == mids
    assert (meta.get("properties") or {}).get("fsml.field-id-read") == "true"
    back = iceberg.read_iceberg(spark, root)
    got = sorted((r.id, r.s["a"]) for r in back.collect())
    assert got == [(i, i * 10) for i in range(6)]


def test_top_only_mapped_foreign_table_keeps_fresh_ids(spark, tmp_path):
    """A mapped table whose Delta metadata carries NO member ids (e.g.
    pre-round-14 tables from this writer): members are stored under
    logical names — fresh member ids + name resolution stay correct
    (the round-13 contract), no read property."""
    root = str(tmp_path / "toponly")
    df = spark.createDataFrame(
        [(i, (i * 10, f"t{i}")) for i in range(6)],
        "id bigint, s struct<a:bigint,b:string>",
    )
    lakehouse.write_delta(spark, df, root, column_mapping="id")
    # strip the member metadata: simulate a top-only-mapped table
    import os

    log = os.path.join(root, "_delta_log", "00000000000000000000.json")
    lines = [json.loads(ln) for ln in open(log)]
    for a in lines:
        md = a.get("metaData")
        if not md:
            continue
        sch = json.loads(md["schemaString"])
        for f in sch["fields"]:
            t = f.get("type")
            if isinstance(t, dict) and t.get("type") == "struct":
                for g in t["fields"]:
                    g["metadata"] = {}
        md["schemaString"] = json.dumps(sch)
    with open(log, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    convert.convert_delta_to_iceberg(spark, root)
    meta = iceberg._load_metadata(root)
    assert (meta.get("properties") or {}).get("fsml.field-id-read") is None
    back = iceberg.read_iceberg(spark, root)
    got = sorted((r.id, r.s["a"]) for r in back.collect())
    assert got == [(i, i * 10) for i in range(6)]


def test_delta_mapped_nested_dml_roundtrip(spark, tmp_path):
    """MERGE + DELETE + rename on an id-mode mapped NESTED Delta table,
    then conversion — every staged generation resolves."""
    root = str(tmp_path / "dml")
    df = spark.createDataFrame(
        [(i, (i * 10, f"t{i}"), [float(i)]) for i in range(6)],
        "id bigint, s struct<n:bigint,t:string>, vec array<double>",
    )
    lakehouse.write_delta(spark, df, root, column_mapping="id")
    src = spark.createDataFrame(
        [(2, (999, "z"), [9.9]), (10, (100, "w"), [1.0])],
        "id bigint, s struct<n:bigint,t:string>, vec array<double>",
    )
    lakehouse.merge_delta(spark, src, root, keys=["id"])
    lakehouse.delete_delta(spark, root, "s.n = 30")
    lakehouse.rename_delta_column(spark, root, "s", "meta")
    want = [(0, 0), (1, 10), (2, 999), (4, 40), (5, 50), (10, 100)]
    got = sorted(
        (r.id, r.meta["n"])
        for r in lakehouse.read_delta(spark, root).collect()
    )
    assert got == want
    convert.convert_delta_to_iceberg(spark, root)
    got_i = sorted(
        (r.id, r.meta["n"])
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got_i == want


def test_mapped_nested_partitioned_refuses(spark, tmp_path):
    root = str(tmp_path / "p")
    _foreign_mapped_nested(spark, root, part=True)
    with pytest.raises(
        (NotImplementedError, ValueError), match="partition|Hive"
    ):
        convert.convert_delta_to_iceberg(spark, root)
