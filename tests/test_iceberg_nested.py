"""Iceberg NESTED TYPES (round 13 — spec §Schemas: struct/list/map are
first-class, every nested field carries its own unique field id covered
by last-column-id): create/read with declared-schema backfill, zero-
rewrite rename of a nested parent with field-id resolution across file
generations, merge_schema evolution adding nested columns, MoR deletes
and v3 DVs over nested tables, and the fail-louds that stay (avro/orc
staging, defaults on nested, name-mapping nested entries)."""

import json

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import iceberg


def _mk(spark, tmp_path, name="t", fv=2):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], {"a": 1}, (10, "x")),
            (2, [3.0], {"b": 2}, (20, "y")),
        ],
        "id bigint, vec array<double>, m map<string,int>, "
        "s struct<n:int,t:string>",
    )
    iceberg.write_iceberg(spark, df, root, format_version=fv)
    return root


def test_nested_schema_ids_unique_and_covered(spark, tmp_path):
    root = _mk(spark, tmp_path)
    meta = iceberg._load_metadata(root)
    fields = iceberg._current_schema(meta)["fields"]

    ids: list[int] = []

    def walk(t):
        if not isinstance(t, dict):
            return
        if t["type"] == "list":
            ids.append(t["element-id"])
            walk(t["element"])
        elif t["type"] == "map":
            ids.extend([t["key-id"], t["value-id"]])
            walk(t["key"])
            walk(t["value"])
        elif t["type"] == "struct":
            for f in t["fields"]:
                ids.append(f["id"])
                walk(f["type"])

    for f in fields:
        ids.append(f["id"])
        walk(f["type"])
    assert len(ids) == len(set(ids))  # unique across the tree
    assert meta["last-column-id"] == max(ids)
    # spec JSON forms round-trip through strict json
    json.loads(json.dumps(fields))


def test_nested_roundtrip_and_declared_backfill(spark, tmp_path):
    root = _mk(spark, tmp_path)
    back = iceberg.read_iceberg(spark, root)
    rows = sorted(
        (r.id, r.vec, dict(r.m), (r.s.n, r.s.t)) for r in back.collect()
    )
    assert rows == [
        (1, [1.0, 2.0], {"a": 1}, (10, "x")),
        (2, [3.0], {"b": 2}, (20, "y")),
    ]
    # merge_schema evolution ADDS a nested column; old files backfill null
    df2 = spark.createDataFrame(
        [(3, [4.0], {"c": 3}, (30, "z"), [("k", 1.5)])],
        "id bigint, vec array<double>, m map<string,int>, "
        "s struct<n:int,t:string>, extra array<struct<k:string,v:double>>",
    )
    iceberg.write_iceberg(
        spark, df2, root, format_version=2, merge_schema=True
    )
    meta = iceberg._load_metadata(root)
    fields = iceberg._current_schema(meta)["fields"]
    assert [f["name"] for f in fields][-1] == "extra"
    # the added column's nested ids are fresh (past every prior id)
    assert meta["last-column-id"] == iceberg._max_field_id(fields)
    got = {
        r.id: r.extra
        for r in iceberg.read_iceberg(spark, root).collect()
    }
    assert got[1] is None and got[2] is None
    assert [(e.k, e.v) for e in got[3]] == [("k", 1.5)]


def test_nested_parent_rename_resolves_across_generations(spark, tmp_path):
    """Rename the list-typed column, append post-rename, read: the old
    files carry the OLD physical name and resolve by footer field id."""
    root = _mk(spark, tmp_path)
    iceberg.rename_iceberg_column(root, "vec", "embedding")
    df2 = spark.createDataFrame(
        [(3, [4.0, 5.0], {"c": 3}, (30, "z"))],
        "id bigint, embedding array<double>, m map<string,int>, "
        "s struct<n:int,t:string>",
    )
    iceberg.write_iceberg(spark, df2, root, format_version=2)
    back = iceberg.read_iceberg(spark, root)
    assert sorted((r.id, r.embedding) for r in back.collect()) == [
        (1, [1.0, 2.0]),
        (2, [3.0]),
        (3, [4.0, 5.0]),
    ]


def test_nested_mor_delete_and_merge(spark, tmp_path):
    root = _mk(spark, tmp_path)
    iceberg.delete_iceberg(spark, root, "id = 1")
    src = spark.createDataFrame(
        [(2, [9.9], {"u": 9}, (99, "up")), (7, [7.0], {"n": 7}, (70, "new"))],
        "id bigint, vec array<double>, m map<string,int>, "
        "s struct<n:int,t:string>",
    )
    iceberg.merge_iceberg(spark, src, root, keys=["id"])
    rows = sorted(
        (r.id, r.vec, r.s.t)
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert rows == [(2, [9.9], "up"), (7, [7.0], "new")]


def test_nested_v3_dv_and_lineage(spark, tmp_path):
    root = str(tmp_path / "v3")
    df = spark.createDataFrame(
        [(i, [float(i), float(i * 2)]) for i in range(8)],
        "id bigint, vec array<double>",
    )
    s0 = iceberg.write_iceberg(spark, df, root, format_version=3)
    iceberg.delete_iceberg(spark, root, "id = 3")  # puffin DV on v3
    back = iceberg.read_iceberg(spark, root)
    assert sorted(r.id for r in back.collect()) == [0, 1, 2, 4, 5, 6, 7]
    cdf = iceberg.read_iceberg_cdf(spark, root, s0)
    assert {r._change_type for r in cdf.collect()} == {"delete"}
    lin = iceberg.read_iceberg_row_ids(spark, root)
    got = {r.id: r._row_id for r in lin.collect()}
    assert sorted(got.values()) == [0, 1, 2, 4, 5, 6, 7]  # 3's id retired


def test_nested_compaction_and_time_travel(spark, tmp_path):
    root = _mk(spark, tmp_path)
    meta0 = iceberg._load_metadata(root)
    s0 = meta0["current-snapshot-id"]
    df2 = spark.createDataFrame(
        [(3, [7.0], {"d": 4}, (40, "w"))],
        "id bigint, vec array<double>, m map<string,int>, "
        "s struct<n:int,t:string>",
    )
    iceberg.write_iceberg(spark, df2, root, format_version=2)
    iceberg.compact_iceberg(spark, root)
    assert iceberg.read_iceberg(spark, root).count() == 3
    assert iceberg.read_iceberg(spark, root, snapshot_id=s0).count() == 2


def test_nested_partitioned_with_pruning(spark, tmp_path):
    root = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(i, i % 3, [float(i)]) for i in range(9)],
        "id bigint, p bigint, vec array<double>",
    )
    iceberg.write_iceberg(spark, df, root, partition_by=["p"])
    out = iceberg.read_iceberg(spark, root, where="p = 1")
    assert sorted(r.id for r in out.collect()) == [1, 4, 7]
    # skipping report: nested column carries no bounds, pruner fails open
    rep = iceberg.iceberg_scan_report(root, "id > 100")
    assert rep["kept_files"] + rep["skipped_files"] == rep["total_files"]


def test_nested_stays_refused_where_it_must(spark, tmp_path):
    root = _mk(spark, tmp_path)
    # nested ADD COLUMN lands in round 14 — DEFAULTS on nested refuse
    # (spec §Default values forbids them)
    with pytest.raises(NotImplementedError, match="Default values"):
        iceberg.add_iceberg_column(root, "nn", "list<double>", default="[]")
    # PRIMITIVE columns alongside nested ones must add fine, with
    # an id past every nested id
    iceberg.add_iceberg_column(root, "flag", "string")
    meta = iceberg._load_metadata(root)
    fields = iceberg._current_schema(meta)["fields"]
    flag = next(f for f in fields if f["name"] == "flag")
    assert flag["id"] > iceberg._max_field_id(fields[:-1])
    assert {r.flag for r in iceberg.read_iceberg(spark, root).collect()} == {
        None
    }
    # AVRO/ORC staging of struct/list lands in round 14 — temporal
    # members inside nested still refuse on both legs (no
    # physical-conversion matrix there; use parquet)
    df2 = spark.createDataFrame(
        [(1, (__import__("datetime").datetime(2024, 1, 1),))],
        "id bigint, s struct<ts:timestamp>",
    )
    with pytest.raises(NotImplementedError, match="nested"):
        iceberg.write_iceberg(
            spark, df2, str(tmp_path / "avro_ts"), data_format="avro"
        )
    with pytest.raises(NotImplementedError, match="nested"):
        iceberg.write_iceberg(
            spark, df2, str(tmp_path / "orc_ts"), data_format="orc"
        )


def test_nested_name_mapping_top_level(spark, tmp_path):
    """Name mapping on a table WITH nested columns: top-level entries
    resolve field-id-less files; nested inner fields resolve by name
    within the column (spec §Column Projection)."""
    root = _mk(spark, tmp_path)
    iceberg.set_iceberg_name_mapping(root)
    meta = iceberg._load_metadata(root)
    nmap = iceberg._table_name_mapping(meta)
    assert set(nmap) == {1, 2, 3, 4}  # one entry per top-level field
    back = iceberg.read_iceberg(spark, root)
    assert back.count() == 2


def test_equality_delete_refuses_nested_and_float_keys(spark, tmp_path):
    """spec §Identifier Field IDs: equality fields must be primitive and
    never float/double — fail loud instead of writing a delete file
    foreign readers compare undefined."""
    root = str(tmp_path / "eqg")
    df = spark.createDataFrame(
        [(1, 1.5, [1.0]), (2, 2.5, [2.0])],
        "id bigint, score double, vec array<double>",
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    with pytest.raises(ValueError, match="nested"):
        iceberg.delete_iceberg_equality(spark, root, df.select("vec"))
    with pytest.raises(ValueError, match="float/double"):
        iceberg.delete_iceberg_equality(spark, root, df.select("score"))
    iceberg.delete_iceberg_equality(spark, root, df.where("id=1").select("id"))
    assert [r.id for r in iceberg.read_iceberg(spark, root).collect()] == [2]


def test_add_nested_column_lifecycle(spark, tmp_path):
    """Round 14 (VERDICT r13 item 5): ADD COLUMN of nested types — fresh
    unique ids covered by last-column-id, null backfill on old files,
    appends carry values."""
    root = str(tmp_path / "addc")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, t string")
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.add_iceberg_column(root, "geo", "struct<lat:double, lon:double>")
    iceberg.add_iceberg_column(root, "tags", "list<string>")
    iceberg.add_iceberg_column(
        root, "deep", "struct<g:struct<x:long>, ys:list<decimal(10,2)>>"
    )
    meta = iceberg._load_metadata(root)
    sch = iceberg._current_schema(meta)
    ids = []

    def walk(t):
        if isinstance(t, dict):
            for k in ("element-id", "key-id", "value-id"):
                if k in t:
                    ids.append(t[k])
            for f in t.get("fields", []):
                ids.append(f["id"])
                walk(f.get("type"))

    for f in sch["fields"]:
        ids.append(f["id"])
        walk(f.get("type"))
    assert len(set(ids)) == len(ids)  # unique across the whole tree
    assert meta["last-column-id"] >= max(ids)
    back = iceberg.read_iceberg(spark, root)
    assert sorted((r.id, r.geo, r.tags) for r in back.collect()) == [
        (1, None, None),
        (2, None, None),
    ]
    df2 = spark.createDataFrame(
        [(3, "z", (1.5, 2.5), ["a"], ((9,), [None]))],
        "id bigint, t string, geo struct<lat:double,lon:double>, "
        "tags array<string>, "
        "deep struct<g:struct<x:bigint>, ys:array<decimal(10,2)>>",
    )
    iceberg.write_iceberg(spark, df2, root, format_version=2)
    r3 = next(
        r for r in iceberg.read_iceberg(spark, root).collect() if r.id == 3
    )
    assert r3.geo["lat"] == 1.5 and r3.deep["g"]["x"] == 9


def test_add_nested_column_fail_louds(spark, tmp_path):
    root = str(tmp_path / "addf")
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(1,)], "id bigint"),
        root,
        format_version=3,
    )
    with pytest.raises(NotImplementedError, match="Default values"):
        iceberg.add_iceberg_column(
            root, "s", "struct<a:long>", default='{"1": 0}'
        )
    with pytest.raises(ValueError, match="REQUIRED"):
        iceberg.add_iceberg_column(root, "s", "struct<a:long>", required=True)
    with pytest.raises((ValueError, NotImplementedError)):
        iceberg.add_iceberg_column(root, "s", "struct<a:unknowntype>")
    with pytest.raises(ValueError, match="trailing|expected"):
        iceberg.add_iceberg_column(root, "s", "struct<a:long> x")


def test_primitive_defaults_beside_nested_columns(spark, tmp_path):
    """Primitive column defaults must keep working on a table that ALSO
    carries nested columns (VERDICT r13 item 5 done-criterion)."""
    root = str(tmp_path / "dflt")
    df = spark.createDataFrame(
        [(1, (10, "a")), (2, (20, "b"))],
        "id bigint, s struct<n:bigint,t:string>",
    )
    iceberg.write_iceberg(spark, df, root, format_version=3)
    iceberg.add_iceberg_column(root, "region", "string", default="emea")
    iceberg.add_iceberg_column(root, "extra", "struct<w:long>")
    back = iceberg.read_iceberg(spark, root)
    rows = sorted(
        (r.id, r.s["n"], r.region, r.extra) for r in back.collect()
    )
    # old files: primitive default surfaces, nested column backfills null
    assert rows == [(1, 10, "emea", None), (2, 20, "emea", None)]
    df2 = spark.createDataFrame(
        [(3, (30, "c"), "apac", (7,))],
        "id bigint, s struct<n:bigint,t:string>, region string, "
        "extra struct<w:bigint>",
    )
    iceberg.write_iceberg(spark, df2, root, format_version=3)
    rows = sorted(
        (r.id, r.s["n"], r.region, r.extra["w"] if r.extra else None)
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert rows == [(1, 10, "emea", None), (2, 20, "emea", None), (3, 30, "apac", 7)]


def test_avro_nested_lifecycle(spark, tmp_path):
    """Round 14 (VERDICT r13 item 6): struct/list columns stage as AVRO
    records/arrays (spec Appendix A) with member field-id attributes —
    write, rename, MoR delete, UPDATE (same-format replacement staging)
    all compose; values round-trip exactly."""
    root = str(tmp_path / "av")
    df = spark.createDataFrame(
        [
            (
                i,
                (i * 10, f"t{i}"),
                [float(i), i + 0.5],
                None if i == 2 else (i, f"u{i}"),
            )
            for i in range(6)
        ],
        "id bigint, s struct<n:bigint,t:string>, vec array<double>, "
        "u struct<a:bigint,b:string>",
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="avro")
    back = iceberg.read_iceberg(spark, root)
    rows = sorted(
        (r.id, r.s["n"], list(r.vec), r.u) for r in back.collect()
    )
    assert rows == [
        (i, i * 10, [float(i), i + 0.5], None if i == 2 else (i, f"u{i}"))
        for i in range(6)
    ]
    # rename: old avro files resolve the struct by field-id attribute
    iceberg.rename_iceberg_column(root, "s", "meta")
    back = iceberg.read_iceberg(spark, root)
    assert sorted((r.id, r.meta["n"]) for r in back.collect()) == [
        (i, i * 10) for i in range(6)
    ]
    # MoR delete + UPDATE over the nested avro table
    iceberg.delete_iceberg(spark, root, "id = 1")
    iceberg.update_iceberg(spark, root, {"id": "id + 100"}, "meta.n = 40")
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [0, 2, 3, 5, 104]
    # the replacement files are AVRO (same-format staging), not parquet
    import glob

    assert glob.glob(f"{root}/data/*.avro")
    # deep nesting round-trips too (struct-of-struct, list-of-struct
    # members stay name-resolved inside)
    root2 = str(tmp_path / "deep")
    df2 = spark.createDataFrame(
        [(1, ((7, "x"), [1.0]))],
        "id bigint, d struct<g:struct<w:bigint,t:string>, ys:array<double>>",
    )
    iceberg.write_iceberg(
        spark, df2, root2, format_version=2, data_format="avro"
    )
    r = iceberg.read_iceberg(spark, root2).collect()[0]
    assert r.d["g"]["w"] == 7 and list(r.d["ys"]) == [1.0]


def test_orc_nested_lifecycle(spark, tmp_path):
    """Round 14: struct/list columns stage natively as ORC nested types
    (iceberg.id attributes per member) — write, rename, MoR delete,
    UPDATE compose; values round-trip exactly."""
    import glob

    root = str(tmp_path / "orcn")
    df = spark.createDataFrame(
        [
            (i, (i * 10, f"t{i}"), [float(i)], None if i == 2 else (i,))
            for i in range(6)
        ],
        "id bigint, s struct<n:bigint,t:string>, vec array<double>, "
        "u struct<a:bigint>",
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, data_format="orc")
    back = iceberg.read_iceberg(spark, root)
    rows = sorted((r.id, r.s["n"], list(r.vec), r.u) for r in back.collect())
    assert rows == [
        (i, i * 10, [float(i)], None if i == 2 else (i,)) for i in range(6)
    ]
    iceberg.rename_iceberg_column(root, "s", "meta")
    iceberg.delete_iceberg(spark, root, "id = 1")
    iceberg.update_iceberg(spark, root, {"id": "id + 100"}, "meta.n = 40")
    got = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert got == [0, 2, 3, 5, 104]
    assert glob.glob(f"{root}/data/*.orc")  # same-format staging


def test_widen_nested_member(spark, tmp_path):
    """Round 14: ALTER COLUMN TYPE on a struct MEMBER by dotted path —
    zero-rewrite; narrow files promote at the parquet leaf, wide
    appends compose, projected access works across generations."""
    root = str(tmp_path / "wn")
    df = spark.createDataFrame(
        [(1, (5, 1.5)), (2, (7, 2.5))], "id bigint, s struct<n:int, x:float>"
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    files_before = set(iceberg._live_data_files(root))
    iceberg.widen_iceberg_column(root, "s.n", "long")
    iceberg.widen_iceberg_column(root, "s.x", "double")
    assert set(iceberg._live_data_files(root)) == files_before
    df2 = spark.createDataFrame(
        [(3, (2**40, 3.5))], "id bigint, s struct<n:bigint, x:double>"
    )
    iceberg.write_iceberg(spark, df2, root, format_version=2)
    back = iceberg.read_iceberg(spark, root)
    assert sorted((r.id, r.s["n"]) for r in back.collect()) == [
        (1, 5), (2, 7), (3, 2**40),
    ]
    proj = back.selectExpr("id", "s.n AS v")
    assert sorted((r.id, r.v) for r in proj.collect()) == [
        (1, 5), (2, 7), (3, 2**40),
    ]
    # fail-louds: whole container, non-promotion, bad path
    with pytest.raises(NotImplementedError, match="CONTAINER"):
        iceberg.widen_iceberg_column(root, "s", "long")
    with pytest.raises(ValueError, match="not an allowed"):
        iceberg.widen_iceberg_column(root, "s.x", "string")
    with pytest.raises(ValueError, match="no column"):
        iceberg.widen_iceberg_column(root, "s.zz", "long")
