"""Cross-format conversion (io/convert.py): Delta ⇄ Iceberg as in-place
metadata translation over the same parquet files — the UniForm/XTable
shape. Zero data movement; both formats read identical rows after."""

import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import convert, iceberg, lakehouse


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_to_iceberg_roundtrip(spark, tmp_path):
    root = str(tmp_path / "d2i")
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 4).alias("p"), (F.col("id") * 10).alias("v")
    )
    lakehouse.write_delta(spark, df, root, partition_by=["p"])
    # a second commit so the converter sees multi-commit state
    lakehouse.write_delta(
        spark,
        spark.range(100, 120).select(
            "id", (F.col("id") % 4).alias("p"), F.lit(-1).cast("long").alias("v")
        ),
        root,
        partition_by=["p"],
    )
    convert.convert_delta_to_iceberg(spark, root)
    d = lakehouse.read_delta(spark, root).select("id", "p", "v")
    i = iceberg.read_iceberg(spark, root).select("id", "p", "v")
    assert _rows(d) == _rows(i)
    assert i.count() == 120
    # identity partition carried over: pruning engages on the Iceberg side
    rep = iceberg.iceberg_scan_report(root, "p = 1")
    assert rep["kept_files"] < rep["total_files"]
    # converted table accepts further Iceberg writes
    iceberg.write_iceberg(
        spark,
        spark.createDataFrame([(999, 1, 7)], "id bigint, p bigint, v bigint"),
        root,
        format_version=2,
        partition_by=["p"],
    )
    assert iceberg.read_iceberg(spark, root).count() == 121


def test_iceberg_to_delta_roundtrip(spark, tmp_path):
    root = str(tmp_path / "i2d")
    df = spark.range(0, 60).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") * 2).alias("v")
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, partition_by=["p"])
    iceberg.write_iceberg(
        spark,
        spark.range(60, 80).select(
            "id", (F.col("id") % 3).alias("p"), F.lit(-5).cast("long").alias("v")
        ),
        root,
        format_version=2,
        partition_by=["p"],
    )
    convert.convert_iceberg_to_delta(spark, root)
    i = iceberg.read_iceberg(spark, root).select("id", "p", "v")
    d = lakehouse.read_delta(spark, root).select("id", "p", "v")
    assert _rows(i) == _rows(d)
    # stats landed: Delta data skipping engages on the converted log
    rep = lakehouse.skipping_report(root, "p = 2")
    assert rep["kept_files"] < rep["total_files"]
    # converted table accepts further Delta writes
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(999, 2, 7)], "id bigint, p bigint, v bigint"),
        root,
        partition_by=["p"],
    )
    assert lakehouse.read_delta(spark, root).count() == 81


def test_refusals(spark, tmp_path):
    # DV'd Delta table CONVERTS (round 7): DVs become position deletes
    dv = str(tmp_path / "dv")
    lakehouse.write_delta(spark, spark.range(0, 50).select("id"), dv)
    lakehouse.delete_delta(spark, dv, "id < 5")
    convert.convert_delta_to_iceberg(spark, dv)
    assert iceberg.read_iceberg(spark, dv).count() == 45
    # double conversion refuses
    with pytest.raises(ValueError, match="already exists"):
        convert.convert_delta_to_iceberg(spark, dv)

    # Iceberg position deletes CONVERT (become Delta deletion vectors)
    pd = str(tmp_path / "pd")
    iceberg.write_iceberg(
        spark, spark.range(0, 50).select("id"), pd, format_version=2
    )
    iceberg.delete_iceberg(spark, pd, "id < 5")
    convert.convert_iceberg_to_delta(spark, pd)
    assert lakehouse.read_delta(spark, pd).count() == 45

    # EQUALITY deletes RESOLVE to position masks (survivor-complement
    # path) — no compaction required
    eqt = str(tmp_path / "eq")
    iceberg.write_iceberg(
        spark, spark.range(0, 50).select("id"), eqt, format_version=2
    )
    iceberg.delete_iceberg_equality(
        spark, eqt, spark.range(0, 5).select("id")
    )
    convert.convert_iceberg_to_delta(spark, eqt)
    assert lakehouse.read_delta(spark, eqt).count() == 45

    # bucket-transform partitions convert by DROPPING the derived field
    # (the source column is physically present in the data files)
    bt = str(tmp_path / "bt")
    iceberg.write_iceberg(
        spark,
        spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")),
        bt,
        format_version=2,
        partition_by=["bucket(4, id)"],
    )
    convert.convert_iceberg_to_delta(spark, bt)
    _adds, meta = lakehouse._replay_log_adds(bt)
    assert (meta.get("partitionColumns") or []) == []
    assert lakehouse.read_delta(spark, bt).count() == 20

    # partitioned + column-mapped Delta CONVERTS (round 7, third
    # session): physical-keyed partitionValues map back through the
    # mapping into logical Iceberg spec fields
    cmp_ = str(tmp_path / "cmp")
    lakehouse.write_delta(
        spark,
        spark.range(0, 10).select(
            "id", (F.col("id") % 2).cast("int").alias("p")
        ),
        cmp_,
        partition_by=["p"],
    )
    lakehouse.enable_delta_column_mapping(spark, cmp_)
    convert.convert_delta_to_iceberg(spark, cmp_)
    assert _rows(
        iceberg.read_iceberg(spark, cmp_).select("id", "p")
    ) == _rows(lakehouse.read_delta(spark, cmp_).select("id", "p"))


def test_refresh_delta_to_iceberg(spark, tmp_path):
    """refresh=True re-syncs the Iceberg view after new Delta commits:
    one appended snapshot, stable field ids, prior snapshot still
    time-travelable."""
    root = str(tmp_path / "rf")
    lakehouse.write_delta(spark, spark.range(0, 10).select("id"), root)
    s1 = convert.convert_delta_to_iceberg(spark, root)
    lakehouse.write_delta(
        spark, spark.range(10, 25).select("id"), root, mode="append"
    )
    # a mutation that REMOVES files from the live set too
    lakehouse.delete_delta(spark, root, "id < 3")
    lakehouse.compact_delta(spark, root)
    with pytest.raises(ValueError, match="refresh=True"):
        convert.convert_delta_to_iceberg(spark, root)
    s2 = convert.convert_delta_to_iceberg(spark, root, refresh=True)
    assert s2 != s1
    d = sorted(r.id for r in lakehouse.read_delta(spark, root).collect())
    i = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    assert d == i and len(i) == 22
    # the pre-refresh conversion snapshot still reads its own era
    assert iceberg.read_iceberg(spark, root, snapshot_id=s1).count() == 10
    # field ids stayed stable across the refresh
    fields = iceberg._current_schema(iceberg._load_metadata(root))["fields"]
    assert [f["id"] for f in fields] == [1]


def test_refresh_iceberg_to_delta(spark, tmp_path):
    """refresh=True re-syncs the Delta view after new Iceberg snapshots:
    one diff commit (adds + removes), time travel to the first
    conversion still works."""
    root = str(tmp_path / "rfd")
    iceberg.write_iceberg(
        spark, spark.range(0, 10).select("id"), root, format_version=2
    )
    v0 = convert.convert_iceberg_to_delta(spark, root)
    iceberg.write_iceberg(
        spark, spark.range(10, 25).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg(spark, root, "id < 3")
    iceberg.compact_iceberg(spark, root)  # clears delete files, rewrites
    with pytest.raises(ValueError, match="refresh=True"):
        convert.convert_iceberg_to_delta(spark, root)
    v1 = convert.convert_iceberg_to_delta(spark, root, refresh=True)
    assert v1 > v0
    i = sorted(r.id for r in iceberg.read_iceberg(spark, root).collect())
    d = sorted(r.id for r in lakehouse.read_delta(spark, root).collect())
    assert i == d and len(d) == 22
    # time travel to the first converted version
    assert lakehouse.read_delta(spark, root, version=v0).count() == 10


def test_distributed_stats_path_identical(spark, tmp_path):
    """Above the file-count threshold the footer walk runs as a Spark job;
    forcing it (threshold=1) must produce byte-identical metadata
    decisions: same skipping behavior, same rows."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    df = spark.range(0, 40).select("id", (F.col("id") % 4).alias("p"))
    for root in (a, b):
        lakehouse.write_delta(spark, df, root, partition_by=["p"])
    convert.convert_delta_to_iceberg(spark, a)  # driver loop
    convert.convert_delta_to_iceberg(spark, b, stats_threshold=1)  # Spark job
    ra = iceberg.iceberg_scan_report(a, "p = 2")
    rb = iceberg.iceberg_scan_report(b, "p = 2")
    assert ra == rb and rb["kept_files"] < rb["total_files"]
    assert _rows(iceberg.read_iceberg(spark, a)) == _rows(
        iceberg.read_iceberg(spark, b)
    )
    # reverse direction too
    c = str(tmp_path / "c")
    iceberg.write_iceberg(
        spark, df, c, format_version=2, partition_by=["p"]
    )
    convert.convert_iceberg_to_delta(spark, c, stats_threshold=1)
    rep = lakehouse.skipping_report(c, "p = 1")
    assert rep["kept_files"] < rep["total_files"]
    assert _rows(lakehouse.read_delta(spark, c)) == _rows(
        iceberg.read_iceberg(spark, c)
    )


# ------------------------------------------- row-level delete carry ----


def test_delta_dv_to_iceberg_pos_deletes(spark, tmp_path):
    """Live deletion vectors convert to position-delete files: both views
    mask the same rows, no data bytes rewritten, and a Delta-side vacuum
    leaves the Iceberg metadata space alone."""
    root = str(tmp_path / "dvc")
    df = spark.range(0, 300).select(
        "id", (F.col("id") % 3).alias("p"), (F.col("id") % 7).alias("v")
    )
    lakehouse.write_delta(spark, df, root, partition_by=["p"])
    lakehouse.delete_delta(spark, root, "v = 2")
    lakehouse.delete_delta(spark, root, "id < 10")  # composed DVs
    before = {
        rel: a["size"] for rel, a in lakehouse._replay_log_adds(root)[0].items()
    }
    convert.convert_delta_to_iceberg(spark, root)
    after = {
        rel: a["size"] for rel, a in lakehouse._replay_log_adds(root)[0].items()
    }
    assert before == after  # zero data movement
    d = lakehouse.read_delta(spark, root).select("id", "p", "v")
    i = iceberg.read_iceberg(spark, root).select("id", "p", "v")
    assert _rows(d) == _rows(i)
    assert i.count() == sum(
        1 for x in range(300) if x % 7 != 2 and x >= 10
    )
    # the snapshot carries a DELETE manifest
    meta = iceberg._load_metadata(root)
    _data, deletes = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    assert deletes and all(e["kind"] == "pos" for e in deletes)
    # Delta-side vacuum must not sweep the Iceberg metadata space
    doomed = lakehouse.vacuum_delta(root, dry_run=True)
    assert not any("metadata/" in p for p in doomed)
    # refresh after MORE deletes stays consistent
    lakehouse.delete_delta(spark, root, "v = 5")
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    assert _rows(lakehouse.read_delta(spark, root).select("id")) == _rows(
        iceberg.read_iceberg(spark, root).select("id")
    )


def test_iceberg_pos_deletes_to_delta_dv(spark, tmp_path):
    """Live position deletes convert to Delta deletion vectors,
    SEQUENCE-SCOPED: rows re-ingested after the delete stay alive, and a
    refresh re-adds only files whose mask actually changed."""
    root = str(tmp_path / "pdc")
    df = spark.range(0, 300).select("id", (F.col("id") % 7).alias("v"))
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.delete_iceberg(spark, root, "v = 3")
    iceberg.delete_iceberg(spark, root, "id < 10")
    convert.convert_iceberg_to_delta(spark, root)
    i = iceberg.read_iceberg(spark, root).select("id", "v")
    d = lakehouse.read_delta(spark, root).select("id", "v")
    assert _rows(i) == _rows(d)
    adds, _meta = lakehouse._replay_log_adds(root)
    assert any(a.get("deletionVector") for a in adds.values())
    # protocol advertises the feature
    proto = lakehouse._current_protocol(root)
    assert "deletionVectors" in (proto.get("readerFeatures") or [])
    # refresh: a delete touching only the TAIL file(s), plus an append —
    # files whose mask did not change must not be re-added
    iceberg.delete_iceberg(spark, root, "id >= 295 AND id < 300")
    iceberg.write_iceberg_batch(
        spark,
        spark.range(300, 350).select("id", (F.col("id") % 7).alias("v")),
        root,
        "appmore",
        1,
    )
    v_delta = convert.convert_iceberg_to_delta(spark, root, refresh=True)
    i2 = iceberg.read_iceberg(spark, root).select("id", "v")
    d2 = lakehouse.read_delta(spark, root).select("id", "v")
    assert _rows(i2) == _rows(d2)
    assert d2.where("id >= 295 AND id < 300").count() == 0
    assert d2.where("id >= 300").count() == 50  # post-delete appends live
    # the refresh commit re-adds only changed-mask + new files: files
    # whose DV is byte-identical are not touched
    log = lakehouse._delta_log_dir(root)
    import json as _json
    import os as _os

    with open(_os.path.join(log, f"{v_delta:020d}.json")) as fh:
        acts = [_json.loads(x) for x in fh if x.strip()]
    readds = [a for a in acts if "add" in a]
    total_live = len(lakehouse._replay_log_adds(root)[0])
    assert 0 < len(readds) < total_live


def test_column_mapped_conversion(spark, tmp_path):
    """Column-mapped Delta converts: columnMapping ids become Iceberg
    field ids, renames resolve by footer fid, stats stay keyed right so
    pruning engages on the mapped column."""
    root = str(tmp_path / "cmc")
    df = spark.range(0, 200).select("id", (F.col("id") % 10).alias("v"))
    lakehouse.write_delta(spark, df, root, column_mapping="id")
    lakehouse.rename_delta_column(spark, root, "v", "val")
    convert.convert_delta_to_iceberg(spark, root)
    d = lakehouse.read_delta(spark, root).select("id", "val")
    i = iceberg.read_iceberg(spark, root).select("id", "val")
    assert _rows(d) == _rows(i)
    # field ids in the iceberg schema == the delta columnMapping ids
    sch = iceberg._current_schema(iceberg._load_metadata(root))
    ids = {f["name"]: f["id"] for f in sch["fields"]}
    assert ids == {"id": 1, "val": 2}
    # stats keyed by fid: bounds-based pruning works on the logical name
    rep = iceberg.iceberg_scan_report(root, "id < 5")
    assert rep["kept_files"] < rep["total_files"]

    # name-mode enabled post-hoc, NO rename: logical==physical, converts
    nm = str(tmp_path / "nm")
    lakehouse.write_delta(spark, df, nm)
    lakehouse.enable_delta_column_mapping(spark, nm)
    convert.convert_delta_to_iceberg(spark, nm)
    assert _rows(lakehouse.read_delta(spark, nm)) == _rows(
        iceberg.read_iceberg(spark, nm)
    )

    # name-mode + rename with pre-mapping (fid-less) files: the Iceberg
    # side could not resolve them — fail loud, never silent nulls
    nr = str(tmp_path / "nr")
    lakehouse.write_delta(spark, df, nr)
    lakehouse.enable_delta_column_mapping(spark, nr)
    lakehouse.rename_delta_column(spark, nr, "v", "val")
    with pytest.raises(NotImplementedError, match="resolve"):
        convert.convert_delta_to_iceberg(spark, nr)


def test_rename_preserves_id_mode_mapping(spark, tmp_path):
    """Round-7 regression: renaming a column on an ID-mode table must not
    clobber the mapping (mode flip + physicalName overwrite nulled every
    read)."""
    root = str(tmp_path / "ren")
    df = spark.range(0, 50).select("id", (F.col("id") % 5).alias("v"))
    lakehouse.write_delta(spark, df, root, column_mapping="id")
    lakehouse.rename_delta_column(spark, root, "v", "val")
    _adds, meta = lakehouse._replay_log_adds(root)
    conf = meta.get("configuration") or {}
    assert conf.get("delta.columnMapping.mode") == "id"
    import json as _json

    fields = _json.loads(meta["schemaString"])["fields"]
    phys = {
        f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
        for f in fields
    }
    assert phys["val"].startswith("col-")  # original physical name kept
    r = lakehouse.read_delta(spark, root)
    assert r.where("id is null").count() == 0
    assert r.where("val = 4").count() == 10
    # appends after the rename still work and resolve
    lakehouse.write_delta(
        spark,
        spark.range(50, 60).select("id", (F.col("id") % 5).alias("val")),
        root,
        mode="append",
    )
    assert lakehouse.read_delta(spark, root).count() == 60


def test_vacuum_protects_converted_pos_deletes(spark, tmp_path):
    """Round-7 regression: Delta-side vacuum on an iceberg→delta converted
    table must not sweep the Iceberg view's position-delete parquet under
    data/ (they are not Delta adds, but a retained snapshot needs them)."""
    root = str(tmp_path / "vp")
    iceberg.write_iceberg(
        spark, spark.range(0, 100).select("id"), root, format_version=2
    )
    iceberg.delete_iceberg(spark, root, "id < 10")
    convert.convert_iceberg_to_delta(spark, root)
    before = iceberg.read_iceberg(spark, root).count()
    doomed = lakehouse.vacuum_delta(root)
    assert not any("delete-" in p for p in doomed)
    assert iceberg.read_iceberg(spark, root).count() == before == 90
    assert lakehouse.read_delta(spark, root).count() == 90


def test_iceberg_eq_deletes_to_delta_dv(spark, tmp_path):
    """EQUALITY deletes convert by survivor-complement resolution: the
    key-scoped lazy mask becomes per-file position DVs, inheriting the
    read path's strictly-older sequence scoping (re-ingested keys stay
    alive) and composing with live POSITION deletes in one pass."""
    root = str(tmp_path / "eqc")
    df = spark.range(0, 200).select("id", (F.col("id") % 7).alias("v"))
    iceberg.write_iceberg(spark, df, root, format_version=2)
    # equality delete on a key set, position delete on a predicate
    iceberg.delete_iceberg_equality(
        spark, root, spark.range(0, 30).select("id")
    )
    iceberg.delete_iceberg(spark, root, "v = 5")
    # RE-INGEST some deleted keys AFTER the equality delete: the
    # strictly-older rule keeps the new copies alive
    iceberg.write_iceberg_batch(
        spark,
        spark.range(0, 10).select("id", (F.col("id") % 7).alias("v")),
        root,
        "reingest",
        1,
    )
    convert.convert_iceberg_to_delta(spark, root)
    i = iceberg.read_iceberg(spark, root).select("id", "v")
    d = lakehouse.read_delta(spark, root).select("id", "v")
    assert _rows(i) == _rows(d)
    # the re-ingested keys are visible exactly once (v=5 rows excluded
    # by the position delete only in the ORIGINAL file generation — the
    # re-ingested batch appended after it, so its v=5 rows live)
    alive = {r.id for r in d.collect()}
    assert set(range(0, 10)) <= alive
    assert not (set(range(10, 30)) & alive)
    # DVs landed on the Delta side
    adds, _ = lakehouse._replay_log_adds(root)
    assert any(a.get("deletionVector") for a in adds.values())
    # refresh after ANOTHER equality delete re-resolves the masks
    iceberg.delete_iceberg_equality(
        spark, root, spark.range(100, 120).select("id")
    )
    convert.convert_iceberg_to_delta(spark, root, refresh=True)
    i2 = iceberg.read_iceberg(spark, root).select("id", "v")
    d2 = lakehouse.read_delta(spark, root).select("id", "v")
    assert _rows(i2) == _rows(d2)
    assert d2.where("id >= 100 AND id < 120").count() == 0


def test_partitioned_mapped_conversion(spark, tmp_path):
    """Partitioned + ID-mode column-mapped Delta converts: the adds'
    PHYSICAL-keyed partitionValues map back to logical Iceberg identity
    spec fields (source-id = the columnMapping id), renamed partition
    and data columns resolve by footer fid, pruning engages on the
    renamed partition dimension, and a refresh carries new commits."""
    root = str(tmp_path / "pmc")
    df = spark.range(0, 120).select(
        "id", (F.col("id") % 4).alias("p"), (F.col("id") * 3).alias("v")
    )
    lakehouse.write_delta(
        spark, df, root, partition_by=["p"], column_mapping="id"
    )
    lakehouse.rename_delta_column(spark, root, "v", "val")
    lakehouse.rename_delta_column(spark, root, "p", "bucket")
    # append AFTER the renames: files stage under frozen physical names
    lakehouse.write_delta(
        spark,
        spark.range(120, 140).select(
            "id", (F.col("id") % 4).alias("bucket"),
            (F.col("id") * 3).alias("val"),
        ),
        root,
        mode="append",
        partition_by=["bucket"],
    )
    convert.convert_delta_to_iceberg(spark, root)
    d = lakehouse.read_delta(spark, root).select("id", "bucket", "val")
    i = iceberg.read_iceberg(spark, root).select("id", "bucket", "val")
    assert _rows(d) == _rows(i)
    # manifest tuples drive pruning on the renamed partition column
    rep = iceberg.iceberg_scan_report(root, "bucket = 2")
    assert rep["kept_files"] < rep["total_files"]
    n2 = iceberg.read_iceberg(spark, root, where="bucket = 2").count()
    assert n2 == d.where("bucket = 2").count() > 0
    # refresh after another mapped append
    lakehouse.write_delta(
        spark,
        spark.range(140, 150).select(
            "id", (F.col("id") % 4).alias("bucket"),
            (F.col("id") * 3).alias("val"),
        ),
        root,
        mode="append",
        partition_by=["bucket"],
    )
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    assert _rows(
        lakehouse.read_delta(spark, root).select("id", "bucket", "val")
    ) == _rows(
        iceberg.read_iceberg(spark, root).select("id", "bucket", "val")
    )


def test_uniform_auto_sync(spark, tmp_path):
    """delta.universalFormat.enabledFormats=iceberg: every committed
    mutation refreshes the Iceberg view in the same call (UniForm's
    per-commit shape); unsetting the property pins the view."""
    root = str(tmp_path / "uni")
    lakehouse.write_delta(
        spark, spark.range(0, 30).select("id", (F.col("id") % 3).alias("v")), root
    )
    lakehouse.alter_delta_properties(
        root, {"delta.universalFormat.enabledFormats": "iceberg"}
    )
    lakehouse.write_delta(
        spark,
        spark.range(30, 40).select("id", (F.col("id") % 3).alias("v")),
        root,
        mode="append",
    )
    assert iceberg.is_iceberg_table(root)
    assert iceberg.read_iceberg(spark, root).count() == 40
    lakehouse.merge_delta(
        spark,
        spark.createDataFrame([(1, 99), (100, 1)], "id long, v long"),
        root,
        keys=["id"],
    )
    lakehouse.delete_delta(spark, root, "v = 0")
    lakehouse.update_delta(spark, root, {"v": "v * 10"}, "id = 2")
    lakehouse.compact_delta(spark, root, target_files=1)
    lakehouse.overwrite_delta_where(
        spark, spark.createDataFrame([(500, 20)], "id long, v long"), root, "v = 20"
    )
    d = _rows(lakehouse.read_delta(spark, root).select("id", "v"))
    i = _rows(iceberg.read_iceberg(spark, root).select("id", "v"))
    assert d == i and d
    # restore rolls the view back too
    lakehouse.restore_delta(spark, root, 2)
    assert _rows(lakehouse.read_delta(spark, root).select("id", "v")) == _rows(
        iceberg.read_iceberg(spark, root).select("id", "v")
    )
    # property unset: the iceberg view pins at its last synced snapshot
    lakehouse.alter_delta_properties(
        root, {"delta.universalFormat.enabledFormats": None}
    )
    pinned = iceberg._load_metadata(root)["current-snapshot-id"]
    lakehouse.write_delta(
        spark,
        spark.range(900, 910).select("id", F.lit(0).cast("long").alias("v")),
        root,
        mode="append",
    )
    assert iceberg._load_metadata(root)["current-snapshot-id"] == pinned


def test_refresh_harvests_only_new_files(spark, tmp_path, monkeypatch):
    """Incremental refresh (the per-commit UniForm sync path): data-file
    entries already in the prior Iceberg snapshot carry over verbatim, so
    the footer harvest touches only files new since the last conversion —
    a DV-only change harvests nothing."""
    root = str(tmp_path / "inc")
    harvested = []
    orig = convert._harvest_one
    monkeypatch.setattr(
        convert, "_harvest_one", lambda p, f: (harvested.append(p), orig(p, f))[1]
    )
    lakehouse.write_delta(
        spark,
        spark.range(0, 40).select(
            "id", (F.col("id") % 4).alias("p"), (F.col("id") * 2).alias("v")
        ),
        root,
        partition_by=["p"],
    )
    convert.convert_delta_to_iceberg(spark, root)
    n_initial = len(harvested)
    harvested.clear()
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(100, 0, 1)], "id long, p long, v long"),
        root,
        mode="append",
        partition_by=["p"],
    )
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    assert 0 < len(harvested) < n_initial
    assert _rows(lakehouse.read_delta(spark, root).select("id", "v")) == _rows(
        iceberg.read_iceberg(spark, root).select("id", "v")
    )
    # carried bounds + partition tuples keep pruning alive
    rep = iceberg.iceberg_scan_report(root, "p = 2")
    assert rep["kept_files"] < rep["total_files"]
    # DV-only change: zero footers touched, mask still carried
    harvested.clear()
    lakehouse.delete_delta(spark, root, "v = 4")
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    assert harvested == []
    d = _rows(lakehouse.read_delta(spark, root).select("id"))
    assert d == _rows(iceberg.read_iceberg(spark, root).select("id"))
    assert (2,) not in d


def test_refresh_after_type_widening_reharvests(spark, tmp_path):
    """Carried bounds are serialized under the FIELD'S TYPE — a widening
    between conversions forces a full re-harvest so pruning on the
    widened column stays sound instead of deserializing stale 4-byte
    bounds as garbage longs."""
    root = str(tmp_path / "wid")
    lakehouse.write_delta(
        spark,
        spark.range(0, 30).select(
            F.col("id").cast("int").alias("id"), (F.col("id") * 2).alias("v")
        ),
        root,
    )
    convert.convert_delta_to_iceberg(spark, root)
    lakehouse.widen_delta_column_type(spark, root, "id", "long")
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(100, 1)], "id long, v long"),
        root,
        mode="append",
    )
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    assert _rows(lakehouse.read_delta(spark, root).select("id", "v")) == _rows(
        iceberg.read_iceberg(spark, root).select("id", "v")
    )
    assert iceberg.read_iceberg(spark, root, where="id >= 100").count() == 1
    assert iceberg.read_iceberg(spark, root, where="id < 5").count() == 5


def _manifest_paths(root):
    meta = iceberg._load_metadata(root)
    cur = meta["current-snapshot-id"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur)
    from feature_store_ml_spark.io import avro_lite

    out = []
    for e in avro_lite.read_container(iceberg._localize(snap["manifest-list"], root)):
        out.append(
            (
                os.path.basename(iceberg._localize(e["manifest_path"], root)),
                int(e.get("content", 0) or 0),
                int(e.get("sequence_number", 0) or 0),
            )
        )
    return sorted(out)


def test_refresh_reuses_prior_manifest_files(spark, tmp_path):
    """VERDICT r7 item 4: an append-only sync must reuse the prior
    snapshot's manifest FILES verbatim (not re-list carried entries into a
    new manifest) — a 1-file append writes one 1-entry manifest and never
    touches prior manifests; a DV-only sync carries the data manifests and
    regenerates only the delete side."""
    from feature_store_ml_spark.io import avro_lite

    root = str(tmp_path / "mreuse")
    lakehouse.write_delta(
        spark,
        spark.range(0, 60).select("id", (F.col("id") * 3).alias("v")),
        root,
    )
    convert.convert_delta_to_iceberg(spark, root)
    m0 = _manifest_paths(root)
    assert len(m0) == 1 and m0[0][1] == 0
    # 1-file append → the prior data manifest rides verbatim, the new
    # manifest holds exactly the one new entry at the NEW sequence
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(1000, 1)], "id long, v long").repartition(1),
        root,
        mode="append",
    )
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    m1 = _manifest_paths(root)
    names1 = {n for n, _c, _s in m1}
    assert m0[0][0] in names1, "prior manifest file not reused"
    new_mfs = [n for n, c, s in m1 if n != m0[0][0] and c == 0]
    assert len(new_mfs) == 1
    rows = avro_lite.read_container(
        os.path.join(root, "metadata", new_mfs[0])
    )
    assert len(rows) == 1, "append manifest must hold only the new file"
    # carried entry keeps its ORIGINAL sequence; the new one is above it
    seq_by_name = {n: s for n, _c, s in m1}
    assert seq_by_name[m0[0][0]] < seq_by_name[new_mfs[0]]
    assert _rows(lakehouse.read_delta(spark, root).select("id", "v")) == _rows(
        iceberg.read_iceberg(spark, root).select("id", "v")
    )
    # DV-only commit: both data manifests carry; a delete manifest appears
    lakehouse.delete_delta(spark, root, "id = 3")
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    m2 = _manifest_paths(root)
    data2 = {n for n, c, _s in m2 if c == 0}
    assert data2 == names1, "DV-only sync must not rewrite data manifests"
    assert any(c == 1 for _n, c, _s in m2)
    # and an UNCHANGED-DV sync carries the delete manifest verbatim too
    del2 = {n for n, c, _s in m2 if c == 1}
    lakehouse.write_delta(
        spark,
        spark.createDataFrame([(2000, 2)], "id long, v long").repartition(1),
        root,
        mode="append",
    )
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    m3 = _manifest_paths(root)
    assert {n for n, c, _s in m3 if c == 1} == del2, (
        "unchanged DVs must carry their delete manifest verbatim"
    )
    got = _rows(iceberg.read_iceberg(spark, root).select("id", "v"))
    assert got == _rows(lakehouse.read_delta(spark, root).select("id", "v"))
    assert (3, 9) not in got and (2000, 2) in got
    # non-additive change (compaction removes files) falls back to the
    # full rewrite and stays correct
    lakehouse.compact_delta(spark, root)
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    m4 = _manifest_paths(root)
    assert all(n not in names1 for n, c, _s in m4 if c == 0), (
        "removed files must force a fresh manifest set"
    )
    assert _rows(iceberg.read_iceberg(spark, root).select("id", "v")) == got


def test_rewrite_commit_sync_is_incremental(spark, tmp_path):
    """VERDICT r8 item 3: a REWRITE commit's UniForm sync (merge/update/
    compact remove files) must carry every untouched prior manifest
    verbatim and rewrite ONLY the manifests referencing a removed file —
    with survivors keeping their ORIGINAL sequence numbers so carried
    position-delete manifests scope exactly as before."""
    from feature_store_ml_spark.io import avro_lite

    root = str(tmp_path / "rwinc")
    # three separate appends of TWO files each → three 2-entry data
    # manifests after three syncs
    for lo in (0, 100, 200):
        lakehouse.write_delta(
            spark,
            spark.range(lo, lo + 50)
            .select("id", (F.col("id") * 2).alias("v"))
            .repartition(2),
            root,
            mode="append" if lo else "overwrite",
        )
        convert.convert_delta_to_iceberg(spark, root, refresh=lo > 0)
    m0 = _manifest_paths(root)
    assert len([n for n, c, _s in m0 if c == 0]) == 3
    # DV-delete a row in a range the later update won't touch — the
    # delete manifest must survive the rewrite sync untouched
    lakehouse.delete_delta(spark, root, "id = 7")
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    m1 = _manifest_paths(root)
    del1 = {n for n, c, _s in m1 if c == 1}
    assert del1, "DV sync must produce a delete manifest"
    # pick ONE data file of the 200-range manifest and UPDATE exactly its
    # rows (ids living outside the DV'd file): one file removed + one
    # added, ONE manifest rewritten with one survivor, two carried
    target_mf = None
    target_ids = None
    for n, c, _s in m1:
        if c != 0:
            continue
        rows = avro_lite.read_container(os.path.join(root, "metadata", n))
        fpaths = [
            iceberg._localize_decoded(r["data_file"]["file_path"], root)
            for r in rows
        ]
        ids0 = {r.id for r in spark.read.parquet(fpaths[0]).collect()}
        if ids0 and all(i >= 200 for i in ids0):
            target_mf, target_ids = n, sorted(ids0)
            break
    assert target_mf is not None and target_ids
    lakehouse.update_delta(
        spark,
        root,
        {"v": "v + 1"},
        where=f"id in ({', '.join(map(str, target_ids))})",
    )
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    m2 = _manifest_paths(root)
    names0 = {n for n, c, _s in m1 if c == 0}
    names2 = {n for n, c, _s in m2 if c == 0}
    carried = names0 & names2
    assert len(carried) == 2 and target_mf not in carried, (
        f"exactly the two untouched manifests must carry verbatim: "
        f"{names0} -> {names2}"
    )
    # the rewritten manifest keeps the ORIGINAL sequence number (delete
    # scoping), holds only the survivor; the added file's manifest gets
    # the new sequence
    seq_by_name1 = {n: s for n, c, s in m1 if c == 0}
    seq_by_name2 = {n: s for n, c, s in m2 if c == 0}
    new_mfs = sorted(names2 - names0)
    old_seqs = set(seq_by_name1.values())
    rewritten = [n for n in new_mfs if seq_by_name2[n] in old_seqs]
    fresh = [n for n in new_mfs if seq_by_name2[n] not in old_seqs]
    assert len(rewritten) == 1 and len(fresh) == 1
    assert seq_by_name2[rewritten[0]] == seq_by_name1[target_mf]
    surv_rows = avro_lite.read_container(
        os.path.join(root, "metadata", rewritten[0])
    )
    assert len(surv_rows) == 1
    # the carried DELETE manifest rides verbatim (dv-state unchanged)
    assert {n for n, c, _s in m2 if c == 1} == del1
    # and the DV'd row stays masked, the update applied, both formats agree
    ice = _rows(iceberg.read_iceberg(spark, root).select("id", "v"))
    dlt = _rows(lakehouse.read_delta(spark, root).select("id", "v"))
    assert ice == dlt
    assert len(ice) == 149  # 150 - 1 DV'd
    tset = set(target_ids)
    assert all(v == (2 * i + 1 if i in tset else 2 * i) for i, v in ice)


def test_compact_sync_drops_whole_manifests(spark, tmp_path):
    """A compaction that replaces EVERY file still syncs incrementally:
    all prior data manifests vanish (no survivors), one new manifest
    holds the compacted files, and the view stays identical."""
    root = str(tmp_path / "cmpinc")
    for lo in (0, 100):
        lakehouse.write_delta(
            spark,
            spark.range(lo, lo + 40)
            .select("id", (F.col("id") % 5).alias("v"))
            .repartition(2),
            root,
            mode="append" if lo else "overwrite",
        )
        convert.convert_delta_to_iceberg(spark, root, refresh=lo > 0)
    names_before = {n for n, c, _s in _manifest_paths(root) if c == 0}
    lakehouse.compact_delta(spark, root)
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    m = _manifest_paths(root)
    names_after = {n for n, c, _s in m if c == 0}
    assert not (names_before & names_after), (
        "every prior manifest lost all members — none may carry"
    )
    assert _rows(iceberg.read_iceberg(spark, root).select("id", "v")) == _rows(
        lakehouse.read_delta(spark, root).select("id", "v")
    )


# ------------------------------------------------- parquet dir -> Iceberg
# (round 12): the snapshot/migrate procedure — register in place, stamp
# name mapping so the fid-less originals survive renames.


def test_snapshot_parquet_registers_in_place(spark, tmp_path):
    root = str(tmp_path / "plain")
    spark.range(20).select(
        "id", (F.col("id") * 2.0).alias("v")
    ).repartition(3).write.parquet(root)
    convert.snapshot_parquet_to_iceberg(spark, root)
    back = iceberg.read_iceberg(spark, root)
    assert sorted(r.id for r in back.collect()) == list(range(20))
    # name mapping was stamped: a rename keeps the fid-less originals
    iceberg.rename_iceberg_column(root, "v", "speed")
    got = sorted(
        (r.id, r.speed) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(i, i * 2.0) for i in range(20)]
    # the registered table is a full citizen: append + MoR delete
    iceberg.write_iceberg(
        spark,
        spark.range(20, 23).select("id", (F.col("id") * 2.0).alias("speed")),
        root,
        format_version=2,
    )
    iceberg.delete_iceberg(spark, root, "id = 5")
    assert iceberg.read_iceberg(spark, root).count() == 22
    # harvested footer bounds drive file pruning from day one
    rep = iceberg.iceberg_scan_report(root, "id > 1000000")
    assert rep["skipped_files"] >= rep["total_files"] - 1


def test_snapshot_parquet_refusals(spark, tmp_path):
    # already iceberg
    root = str(tmp_path / "ice")
    iceberg.write_iceberg(
        spark, spark.range(3).select("id"), root, format_version=2
    )
    with pytest.raises(ValueError, match="already an Iceberg"):
        convert.snapshot_parquet_to_iceberg(spark, root)
    # delta
    root2 = str(tmp_path / "dl")
    lakehouse.write_delta(spark, spark.range(3).select("id"), root2)
    with pytest.raises(ValueError, match="Delta table"):
        convert.snapshot_parquet_to_iceberg(spark, root2)
    # non-hive subdirectory
    root3 = str(tmp_path / "odd")
    spark.range(3).select("id").write.parquet(os.path.join(root3, "plain_subdir"))
    with pytest.raises(NotImplementedError, match="key=value"):
        convert.snapshot_parquet_to_iceberg(spark, root3)


def test_snapshot_hive_partitioned_registers_with_backfill(spark, tmp_path):
    """Hive key=value layouts register: directory components become an
    identity spec, tuples land typed in the manifest entries, reads
    backfill the partition columns (the files never stored them), and
    the tuples drive partition pruning."""
    root = str(tmp_path / "hive")
    spark.range(20).select(
        "id",
        (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") * 2.0).alias("v"),
    ).write.partitionBy("p").parquet(root)
    convert.snapshot_parquet_to_iceberg(spark, root)
    got = sorted(
        (r.id, r.p, r.v) for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(i, i % 3, i * 2.0) for i in range(20)]
    rep = iceberg.iceberg_scan_report(root, "p = 1")
    assert rep["skipped_files"] > 0
    # rename a data column: mapping + partition backfill coexist
    iceberg.rename_iceberg_column(root, "v", "speed")
    assert iceberg.read_iceberg(spark, root, where="p = 2").count() == len(
        [i for i in range(20) if i % 3 == 2]
    )


def test_snapshot_hive_partitioned_date_and_null(spark, tmp_path):
    root = str(tmp_path / "hive2")
    df = spark.createDataFrame(
        [(0, "2024-01-02", 1.0), (1, "2024-01-03", 2.0), (2, None, 3.0)],
        "id long, d string, v double",
    ).select("id", F.col("d").cast("date").alias("d"), "v")
    df.write.partitionBy("d").parquet(root)
    convert.snapshot_parquet_to_iceberg(spark, root)
    got = sorted(
        (r.id, str(r.d), r.v)
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [
        (0, "2024-01-02", 1.0),
        (1, "2024-01-03", 2.0),
        (2, "None", 3.0),
    ]


def test_snapshot_refuses_heterogeneous_schemas(spark, tmp_path):
    """Round-12 review fix: a directory mixing file schemas must refuse
    — Spark's inferred schema would silently null-fill the narrower
    files (and the stamped name mapping makes that invisible forever)."""
    root = str(tmp_path / "mixed")
    os.makedirs(root)
    spark.range(3).select("id", (F.col("id") * 2.0).alias("v")).coalesce(
        1
    ).write.mode("append").parquet(root)
    spark.range(3, 6).select("id").coalesce(1).write.mode("append").parquet(
        root
    )
    with pytest.raises(ValueError, match="heterogeneous"):
        convert.snapshot_parquet_to_iceberg(spark, root)


def test_cdf_ignores_wap_staged_snapshots(spark, tmp_path):
    """Round-12 review fix: read_iceberg_cdf walks the ancestry chain —
    a WAP-staged snapshot between from/to neither crashes the diff nor
    leaks phantom inserts; an off-chain endpoint fails loud."""
    root = str(tmp_path / "wap")
    s0 = iceberg.write_iceberg(
        spark, spark.range(5).select("id"), root, format_version=2
    )
    iceberg.set_iceberg_ref(root, "audit", ref_type="branch")
    staged = iceberg.write_iceberg(
        spark, spark.range(100, 103).select("id"), root, format_version=2,
        branch="audit",
    )
    iceberg.delete_iceberg(spark, root, "id = 3")
    cdf = iceberg.read_iceberg_cdf(spark, root, s0).collect()
    assert sorted((r.id, r._change_type) for r in cdf) == [(3, "delete")]
    with pytest.raises(ValueError, match="not an ancestor"):
        iceberg.read_iceberg_cdf(spark, root, staged)


def test_convert_nested_delta_to_iceberg_with_dv(spark, tmp_path):
    """Round 13: a Delta table with struct/list/map columns converts to
    an Iceberg v3 view — nested fields get fresh unique ids covered by
    last-column-id, a Delta-side DV delete translates on refresh, and
    the nested ids are STABLE across re-syncs (nested identity is
    per-inner-field)."""
    root = str(tmp_path / "nc")
    df = spark.createDataFrame(
        [(i, [float(i)], {"k": i}, (i * 10, f"t{i}")) for i in range(8)],
        "id bigint, vec array<double>, m map<string,int>, "
        "s struct<n:bigint,t:string>",
    )
    lakehouse.write_delta(spark, df, root)
    convert.convert_delta_to_iceberg(spark, root, format_version=3)
    meta = iceberg._load_metadata(root)
    fields = iceberg._current_schema(meta)["fields"]
    assert meta["last-column-id"] == iceberg._max_field_id(fields)
    got = sorted(
        (r.id, r.vec, r.s.n)
        for r in iceberg.read_iceberg(spark, root).collect()
    )
    assert got == [(i, [float(i)], i * 10) for i in range(8)]
    lakehouse.delete_delta(spark, root, "id = 2")  # Delta DV
    convert.convert_delta_to_iceberg(spark, root, refresh=True)
    meta2 = iceberg._load_metadata(root)
    assert iceberg._current_schema(meta2)["fields"] == fields  # ids stable
    assert sorted(
        r.id for r in iceberg.read_iceberg(spark, root).collect()
    ) == [0, 1, 3, 4, 5, 6, 7]


def test_uniform_auto_sync_nested(spark, tmp_path):
    """UniForm on a nested table: per-commit refresh keeps the Iceberg
    view in lockstep, nested rows intact."""
    root = str(tmp_path / "unin")
    df = spark.range(0, 10).selectExpr(
        "id", "array(cast(id as double), 2.0 * id) AS vec"
    )
    lakehouse.write_delta(spark, df, root)
    lakehouse.alter_delta_properties(
        root, {"delta.universalFormat.enabledFormats": "iceberg"}
    )
    lakehouse.write_delta(
        spark,
        spark.range(10, 15).selectExpr(
            "id", "array(cast(id as double)) AS vec"
        ),
        root,
        mode="append",
    )
    assert iceberg.is_iceberg_table(root)
    back = iceberg.read_iceberg(spark, root)
    vals = {r.id: r.vec for r in back.collect()}
    assert len(vals) == 15 and vals[3] == [3.0, 6.0] and vals[12] == [12.0]


def test_convert_nested_iceberg_to_delta(spark, tmp_path):
    """Round 13, other direction: a nested Iceberg table (with a MoR
    delete) converts to a Delta view — _declared_spark_schema expresses
    the nested StructType and the position deletes carry."""
    root = str(tmp_path / "i2d")
    df = spark.createDataFrame(
        [(i, [float(i)], (i * 10, f"t{i}")) for i in range(6)],
        "id bigint, vec array<double>, s struct<n:bigint,t:string>",
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.delete_iceberg(spark, root, "id = 4")
    convert.convert_iceberg_to_delta(spark, root)
    got = sorted(
        (r.id, r.vec, r.s.n)
        for r in lakehouse.read_delta(spark, root).collect()
    )
    assert got == [(i, [float(i)], i * 10) for i in (0, 1, 2, 3, 5)]
