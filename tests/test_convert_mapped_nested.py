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


def test_own_top_mapped_nested_keeps_fresh_ids(spark, tmp_path):
    """This repo's own mapped writer assigns TOP-LEVEL ids only; members
    stay under logical names in the files — fresh member ids + name
    resolution stay correct (round-13 contract), no read property."""
    root = str(tmp_path / "own")
    df = spark.createDataFrame(
        [(i, (i * 10, f"t{i}")) for i in range(6)],
        "id bigint, s struct<a:bigint,b:string>",
    )
    lakehouse.write_delta(spark, df, root, column_mapping="id")
    convert.convert_delta_to_iceberg(spark, root)
    meta = iceberg._load_metadata(root)
    assert (meta.get("properties") or {}).get("fsml.field-id-read") is None
    back = iceberg.read_iceberg(spark, root)
    got = sorted((r.id, r.s["a"]) for r in back.collect())
    assert got == [(i, i * 10) for i in range(6)]


def test_mapped_nested_partitioned_refuses(spark, tmp_path):
    root = str(tmp_path / "p")
    _foreign_mapped_nested(spark, root, part=True)
    with pytest.raises(
        (NotImplementedError, ValueError), match="partition|Hive"
    ):
        convert.convert_delta_to_iceberg(spark, root)
