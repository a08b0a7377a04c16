"""Iceberg manifest column bounds + scan-planning data skipping.

Contract: ``read_iceberg(path, where=p)`` returns EXACTLY the rows of
``read_iceberg(path).filter(p)`` while the scan plan drops files whose
manifest stats (identity-partition tuple, lower/upper bounds, null
counts) prove the predicate dead — and fails open everywhere else.
"""

import datetime
import os

import pytest
from pyspark.sql import Row, functions as F

from feature_store_ml_spark.io import avro_lite, iceberg, skipping


def _clustered(spark, tmp_path, fv=2, name="t"):
    root = str(tmp_path / f"{name}_v{fv}")
    df = (
        spark.range(0, 1000)
        .select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") % 7).cast("int").alias("m"),
            F.concat(F.lit("s"), F.format_string("%04d", F.col("id"))).alias("s"),
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
            (F.col("id").cast("double") / 10.0).alias("x"),
        )
        .repartitionByRange(10, "k")
    )
    iceberg.write_iceberg(spark, df, root, format_version=fv)
    return root


def _manifest_entries(root):
    meta = iceberg._load_metadata(root)
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    out = []
    for e in avro_lite.read_container(iceberg._localize(snap["manifest-list"], root)):
        out.extend(avro_lite.read_container(iceberg._localize(e["manifest_path"], root)))
    return out


# ------------------------------------------------------------ write side


@pytest.mark.parametrize("fv", [1, 2])
def test_manifest_entries_carry_bounds(spark, tmp_path, fv):
    root = _clustered(spark, tmp_path, fv=fv)
    entries = _manifest_entries(root)
    assert len(entries) == 10
    meta = iceberg._load_metadata(root)
    fields = iceberg._current_schema(meta)["fields"]
    fid = {f["name"]: f["id"] for f in fields}
    typ = {f["name"]: f["type"] for f in fields}
    for e in entries:
        df_struct = e["data_file"]
        lo = {kv["key"]: kv["value"] for kv in df_struct["lower_bounds"]}
        hi = {kv["key"]: kv["value"] for kv in df_struct["upper_bounds"]}
        nv = {kv["key"]: kv["value"] for kv in df_struct["null_value_counts"]}
        for col in ("k", "m", "s", "d", "x"):
            lo_v = iceberg._decode_bound(lo[fid[col]], typ[col])
            hi_v = iceberg._decode_bound(hi[fid[col]], typ[col])
            assert lo_v <= hi_v
            assert nv[fid[col]] == 0
        # long bounds are the actual per-file extremes
        assert 0 <= iceberg._decode_bound(lo[fid["k"]], "long")
        assert iceberg._decode_bound(hi[fid["k"]], "long") <= 999


def test_bound_codec_roundtrip():
    cases = [
        (42, "int"),
        (-1, "int"),
        (1 << 40, "long"),
        (3.5, "float"),
        (-2.25, "double"),
        (True, "boolean"),
        (False, "boolean"),
        ("héllo", "string"),
        (datetime.date(2024, 3, 1), "date"),
        (datetime.datetime(2024, 3, 1, 12, 30, 0, 123456), "timestamptz"),
    ]
    for v, t in cases:
        b = iceberg._encode_bound(v, t)
        assert b is not None, (v, t)
        assert iceberg._decode_bound(b, t) == v, (v, t)
    assert iceberg._encode_bound(float("nan"), "double") is None
    assert iceberg._encode_bound("x" * 300, "string") is None


# ------------------------------------------------------------- read side


@pytest.mark.parametrize("fv", [1, 2])
def test_point_lookup_prunes(spark, tmp_path, fv):
    root = _clustered(spark, tmp_path, fv=fv)
    rep = iceberg.iceberg_scan_report(root, "k = 437")
    assert rep["eligible"] and rep["total_files"] == 10 and rep["kept_files"] == 1
    got = iceberg.read_iceberg(spark, root, where="k = 437").collect()
    assert len(got) == 1 and got[0]["m"] == 437 % 7


def test_predicate_families_match_filter(spark, tmp_path):
    root = _clustered(spark, tmp_path)
    base = iceberg.read_iceberg(spark, root)
    for pred in [
        "k >= 850 AND m < 5",
        "s = 's0042'",
        "s LIKE 's09%'",
        "d > DATE '2026-06-01'",
        "x BETWEEN 10.0 AND 12.0",
        "k IN (3, 503, 997)",
    ]:
        rep = iceberg.iceberg_scan_report(root, pred)
        assert rep["kept_files"] < rep["total_files"], f"no pruning for {pred}"
        expect = sorted(r["k"] for r in base.filter(pred).collect())
        got = sorted(
            r["k"] for r in iceberg.read_iceberg(spark, root, where=pred).collect()
        )
        assert got == expect and len(got) > 0, pred


def test_ineligible_fails_open(spark, tmp_path):
    root = _clustered(spark, tmp_path)
    pred = "k = 3 OR k = 997"
    rep = iceberg.iceberg_scan_report(root, pred)
    assert not rep["eligible"] and rep["kept_files"] == rep["total_files"]
    got = sorted(r["k"] for r in iceberg.read_iceberg(spark, root, where=pred).collect())
    assert got == [3, 997]


def test_empty_prune_returns_schema_only(spark, tmp_path):
    root = _clustered(spark, tmp_path)
    df = iceberg.read_iceberg(spark, root, where="k > 5000")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "m", "s", "d", "x"]


def test_identity_partition_pruning(spark, tmp_path):
    root = str(tmp_path / "parted")
    df = spark.range(0, 200).select(
        (F.col("id") % 4).cast("long").alias("p"), F.col("id").alias("v")
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, partition_by=["p"])
    rep = iceberg.iceberg_scan_report(root, "p = 2 AND v < 100")
    assert rep["kept_files"] < rep["total_files"]
    expect = sorted(
        r["v"]
        for r in iceberg.read_iceberg(spark, root).filter("p = 2 AND v < 100").collect()
    )
    got = sorted(
        r["v"]
        for r in iceberg.read_iceberg(spark, root, where="p = 2 AND v < 100").collect()
    )
    assert got == expect and len(got) > 0


def test_skipping_composes_with_position_deletes(spark, tmp_path):
    root = _clustered(spark, tmp_path)
    iceberg.delete_iceberg(spark, root, "k = 437")
    assert iceberg.read_iceberg(spark, root, where="k = 437").count() == 0
    got = iceberg.read_iceberg(spark, root, where="k BETWEEN 436 AND 438").collect()
    assert sorted(r["k"] for r in got) == [436, 438]


def test_compaction_refreshes_stats(spark, tmp_path):
    root = _clustered(spark, tmp_path)
    iceberg.delete_iceberg(spark, root, "k < 500")
    iceberg.compact_iceberg(spark, root)
    rep = iceberg.iceberg_scan_report(root, "k = 600")
    assert rep["kept_files"] < max(rep["total_files"], 2) or rep["total_files"] == 1
    got = iceberg.read_iceberg(spark, root, where="k = 600").collect()
    assert len(got) == 1
    # deleted range really is gone and its bounds no longer admit it
    assert iceberg.read_iceberg(spark, root, where="k = 100").count() == 0


def test_entries_without_stats_fail_open(spark, tmp_path):
    """Entries from writers that never recorded bounds keep every file."""
    root = _clustered(spark, tmp_path)
    meta = iceberg._load_metadata(root)
    data, _ = iceberg._snapshot_scan_plan(
        meta, meta["current-snapshot-id"], root
    )
    stripped = [
        {**d, "lower_bounds": None, "upper_bounds": None,
         "null_value_counts": None, "record_count": None}
        for d in data
    ]
    kept, skipped = iceberg._prune_data_entries(stripped, meta, "k = 437")
    assert skipped == 0 and len(kept) == len(data)


# ----------------------------------------------------- partition transforms


def test_murmur3_sql_matches_python_reference(spark):
    """The JVM expression tree must equal the spec hash (python reference
    pinned to the spec's published vectors) on positives, negatives, and
    extremes."""
    assert iceberg.murmur3_32_long(34) == 2017239379  # spec Appendix B
    vals = [0, 1, -1, 34, -34, 2**31, -(2**31), 2**62, -(2**62), 123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", iceberg._murmur3_long_col(F.col("v")).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == iceberg.murmur3_32_long(v), v


def _transform_table(spark, tmp_path, fv=2, name="tt"):
    root = str(tmp_path / f"{name}_v{fv}")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("grp"), (F.col("id") % 5).cast("string")).alias("s"),
        (
            F.lit(datetime.datetime(2024, 1, 1))
            + F.make_interval(hours=F.col("id"))
        ).cast("timestamp_ntz").alias("ts"),
        (F.col("id").cast("double") / 7.0).alias("x"),
    )
    iceberg.write_iceberg(
        spark, df, root, format_version=fv,
        partition_by=["day(ts)", "bucket(8, k)", "truncate(3, s)"],
    )
    return root, df


@pytest.mark.parametrize("fv", [1, 2])
def test_transform_write_roundtrip(spark, tmp_path, fv):
    root, df = _transform_table(spark, tmp_path, fv=fv)
    got = iceberg.read_iceberg(spark, root)
    assert sorted(got.columns) == ["k", "s", "ts", "x"]
    assert got.count() == 1000
    assert sorted(r["k"] for r in got.collect()) == list(range(1000))
    # declared spec records the transforms
    meta = iceberg._load_metadata(root)
    spec = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in spec] == ["day", "bucket[8]", "truncate[3]"]


def test_transform_partition_values_are_typed_and_correct(spark, tmp_path):
    root, _df = _transform_table(spark, tmp_path)
    entries = _manifest_entries(root)
    for e in entries:
        pv = e["data_file"]["partition"]
        day, bucket, trunc = pv["ts_day"], pv["k_bucket"], pv["s_trunc"]
        # 2024-01-01 is day 19723 since epoch; 1000 hours spans 42 days
        assert 19723 <= day <= 19723 + 42
        assert 0 <= bucket < 8
        assert trunc == "grp"  # truncate(3) of "grpN"
    # one file per (day, bucket, trunc) tuple, and bucket values match the
    # spec hash of the file's own keys
    import pyarrow.parquet as pq
    for e in entries:
        f = iceberg._localize(e["data_file"]["file_path"], root)
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        want = e["data_file"]["partition"]["k_bucket"]
        assert all(
            (iceberg.murmur3_32_long(k) & 0x7FFFFFFF) % 8 == want for k in ks
        )


def test_day_transform_pruning(spark, tmp_path):
    root, df = _transform_table(spark, tmp_path)
    pred = "ts >= TIMESTAMP '2024-02-01 00:00:00'"
    rep = iceberg.iceberg_scan_report(root, pred)
    assert rep["eligible"] and rep["kept_files"] < rep["total_files"]
    expect = sorted(r["k"] for r in iceberg.read_iceberg(spark, root).filter(pred).collect())
    got = sorted(r["k"] for r in iceberg.read_iceberg(spark, root, where=pred).collect())
    assert got == expect and len(got) > 0


def test_bucket_transform_pruning(spark, tmp_path):
    root, df = _transform_table(spark, tmp_path)
    pred = "k = 437"
    rep = iceberg.iceberg_scan_report(root, pred)
    # bucket(8) keeps ~1/8 of files; day() contributes nothing for a k-pred
    assert rep["kept_files"] < rep["total_files"]
    got = iceberg.read_iceberg(spark, root, where=pred).collect()
    assert len(got) == 1 and got[0]["k"] == 437
    # IN over two buckets
    pred = "k IN (3, 500)"
    got = sorted(r["k"] for r in iceberg.read_iceberg(spark, root, where=pred).collect())
    assert got == [3, 500]


def test_truncate_transform_pruning(spark, tmp_path):
    root = str(tmp_path / "trunc")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("alpha")).otherwise(F.lit("beta")),
            F.col("id").cast("string"),
        ).alias("s"),
    )
    iceberg.write_iceberg(spark, df, root, format_version=2,
                          partition_by=["truncate(4, s)"])
    pred = "s LIKE 'beta%'"
    rep = iceberg.iceberg_scan_report(root, pred)
    assert rep["kept_files"] < rep["total_files"]
    got = iceberg.read_iceberg(spark, root, where=pred).count()
    assert got == 200
    # int truncate
    root2 = str(tmp_path / "trunc_int")
    iceberg.write_iceberg(
        spark, df.select("k"), root2, format_version=2,
        partition_by=["truncate(100, k)"],
    )
    rep = iceberg.iceberg_scan_report(root2, "k BETWEEN 150 AND 180")
    assert rep["kept_files"] == 1
    assert iceberg.read_iceberg(spark, root2, where="k BETWEEN 150 AND 180").count() == 31


def test_transform_append_spec_enforced(spark, tmp_path):
    root, df = _transform_table(spark, tmp_path)
    more = df.limit(10)
    with pytest.raises(ValueError, match="does not match"):
        iceberg.write_iceberg(
            spark, more, root, format_version=2,
            partition_by=["day(ts)", "bucket(4, k)", "truncate(3, s)"],
        )
    iceberg.write_iceberg(
        spark, more, root, format_version=2,
        partition_by=["day(ts)", "bucket(8, k)", "truncate(3, s)"],
    )
    assert iceberg.read_iceberg(spark, root).count() == 1010


def test_compaction_preserves_transform_layout(spark, tmp_path):
    root, df = _transform_table(spark, tmp_path)
    iceberg.delete_iceberg(spark, root, "k < 100")
    expect = sorted(
        r["k"] for r in iceberg.read_iceberg(spark, root).collect()
    )
    iceberg.compact_iceberg(spark, root)
    got = sorted(r["k"] for r in iceberg.read_iceberg(spark, root).collect())
    assert got == expect == list(range(100, 1000))
    meta = iceberg._load_metadata(root)
    spec = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in spec] == ["day", "bucket[8]", "truncate[3]"]
    # pruning still works on the compacted table
    rep = iceberg.iceberg_scan_report(root, "k = 437")
    assert rep["kept_files"] < max(rep["total_files"], 2) or rep["total_files"] == 1


def test_string_bucket_write_and_prune(spark, tmp_path):
    """bucket(N, string_col): the variable-length murmur3 as a JVM
    expression — spec vector pinned, partition values match the python
    reference per file, equality predicates prune by re-hashing."""
    assert iceberg.murmur3_32_string("iceberg") == 1210000089  # spec vector
    root = str(tmp_path / "sb")
    df = spark.range(0, 300).select(
        F.concat(F.lit("user_"), (F.col("id") % 40).cast("string")).alias("s"),
        F.col("id").alias("v"),
    )
    iceberg.write_iceberg(spark, df, root, format_version=2,
                          partition_by=["bucket(8, s)"])
    # every file's bucket value matches the reference hash of its rows
    import pyarrow.parquet as pq
    for e in _manifest_entries(root):
        want = e["data_file"]["partition"]["s_bucket"]
        f = iceberg._localize(e["data_file"]["file_path"], root)
        ss = pq.read_table(f, columns=["s"]).column("s").to_pylist()
        assert all(
            (iceberg.murmur3_32_string(x) & 0x7FFFFFFF) % 8 == want for x in ss
        )
    pred = "s = 'user_17'"
    rep = iceberg.iceberg_scan_report(root, pred)
    assert rep["kept_files"] < rep["total_files"]
    got = iceberg.read_iceberg(spark, root, where=pred)
    assert got.count() == 8 and got.select("s").distinct().count() == 1  # ids 17,57,...,297
    # IN across two buckets
    got2 = iceberg.read_iceberg(spark, root, where="s IN ('user_3', 'user_21')")
    assert got2.count() == 15 and got2.select("s").distinct().count() == 2


def test_string_murmur_jvm_matches_reference(spark):
    vals = ["", "a", "ab", "abc", "abcd", "abcde", "iceberg",
            "h\u00e9llo w\u00f6rld", "\u65e5\u672c\u8a9e", "x" * 100]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select(
            "s", iceberg._murmur3_string_col(F.col("s")).alias("h")
        ).collect()
    }
    for v in vals:
        assert got[v] == iceberg.murmur3_32_string(v), repr(v)


def test_non_utc_session_fails_open_on_ltz(spark, tmp_path):
    """Outside UTC, LTZ-timestamp conjuncts must be dropped (fail open),
    never evaluated in the wrong frame."""
    from feature_store_ml_spark.io import skipping as sk

    conj = sk.parse_conjuncts("ts > TIMESTAMP '2024-01-01 00:00:00' AND k = 3")
    types = {"ts": "timestamp", "k": "long"}
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        safe = sk.tz_safe_conjuncts(conj, types)
        assert [c[0] for c in safe] == ["k"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert len(sk.tz_safe_conjuncts(conj, types)) == 2  # UTC again: all kept


def test_ntz_timestamp_bucket_write_and_prune(spark, tmp_path):
    """bucket(N, ntz): wall-clock micros key, timezone-independent —
    per-file partition values match the python reference and a point
    predicate prunes by re-hashing the literal."""
    root = str(tmp_path / "ntzb")
    df = spark.range(0, 200).select(
        (
            F.lit(datetime.datetime(2024, 1, 1))
            + F.make_interval(mins=F.col("id") % 24, secs=F.col("id") % 7)
        ).cast("timestamp_ntz").alias("ts"),
        F.col("id").alias("v"),
    )
    iceberg.write_iceberg(spark, df, root, format_version=2,
                          partition_by=["bucket(8, ts)"])
    import pyarrow.parquet as pq
    epoch = datetime.datetime(1970, 1, 1)
    for e in _manifest_entries(root):
        want = e["data_file"]["partition"]["ts_bucket"]
        f = iceberg._localize(e["data_file"]["file_path"], root)
        for t in pq.read_table(f, columns=["ts"]).column("ts").to_pylist():
            d = t - epoch
            micros = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            assert (iceberg.murmur3_32_long(micros) & 0x7FFFFFFF) % 8 == want
    pred = "ts = TIMESTAMP '2024-01-01 00:05:05'"  # id pattern: min 5, sec 5
    rep = iceberg.iceberg_scan_report(root, pred)
    assert rep["kept_files"] < rep["total_files"]
    got = iceberg.read_iceberg(spark, root, where=pred)
    expect = iceberg.read_iceberg(spark, root).filter(pred).count()
    assert got.count() == expect > 0


def test_sort_order_declared_and_applied(spark, tmp_path):
    """write_iceberg(sort_by=...): the order lands in sort-orders metadata,
    the data is range-distributed + locally sorted (near-disjoint file
    bounds), and appends apply the declared order automatically — so the
    manifest-bounds pruner skips most files on sorted-column predicates."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from feature_store_ml_spark.io import iceberg

    root = str(tmp_path / "sorted")
    shuffled = (
        spark.range(20000)
        .select((F.xxhash64("id") % 100000).alias("k"), F.col("id").alias("v"))
        .repartition(8)
    )
    iceberg.write_iceberg(
        spark, shuffled, root, format_version=2, sort_by=["k"]
    )
    meta = iceberg._load_metadata(root)
    assert meta["default-sort-order-id"] == 1
    order = next(o for o in meta["sort-orders"] if o["order-id"] == 1)
    assert [f["transform"] for f in order["fields"]] == ["identity"]
    # every data file is internally sorted on k
    data_dir = os.path.join(root, "data")
    files = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert len(files) > 1
    col = pq.read_table(os.path.join(data_dir, files[0]), columns=["k"])["k"].to_pylist()
    assert col == sorted(col)
    # range distribution -> narrow predicates prune most files
    rep = iceberg.iceberg_scan_report(root, "k = 0")
    assert rep["skipped_files"] >= len(files) - 1
    # append WITHOUT sort_by applies the declared order; pruning persists
    iceberg.write_iceberg(
        spark,
        spark.range(20000, 25000).select(
            (F.xxhash64("id") % 100000).alias("k"), F.col("id").alias("v")
        ),
        root,
        format_version=2,
    )
    total = len([f for f in os.listdir(data_dir) if f.endswith(".parquet")])
    rep2 = iceberg.iceberg_scan_report(root, "k = 0")
    assert rep2["skipped_files"] >= total - 2
    # results identical to an unsorted write (order is layout, not truth)
    assert iceberg.read_iceberg(spark, root).count() == 25000


def test_sort_order_append_mismatch_fails(spark, tmp_path):
    from pyspark.sql import functions as F

    from feature_store_ml_spark.io import iceberg

    root = str(tmp_path / "mm")
    iceberg.write_iceberg(
        spark,
        spark.range(10).select("id", (F.col("id") * 2).alias("v")),
        root, format_version=2, sort_by=["id"],
    )
    with pytest.raises(ValueError, match="declared sort order"):
        iceberg.write_iceberg(
            spark,
            spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")),
            root, format_version=2, sort_by=["v"],
        )
    with pytest.raises(ValueError, match="not in batch"):
        iceberg.write_iceberg(
            spark, spark.range(3).select("id"), str(tmp_path / "x"),
            format_version=2, sort_by=["zz"],
        )
