"""Puffin statistics (Iceberg spec "Puffin file format" + §Table
Statistics): container round-trip, KMV theta sketch exact/estimation/merge
behavior, analyze_iceberg metadata wiring, survival across commits, and
the planner payoff — NDV-driven broadcast without a user hint."""

import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark import plans
from feature_store_ml_spark.io import iceberg, puffin


# ------------------------------------------------------------- sketch ----


def test_sketch_exact_mode_roundtrip():
    sk = puffin.ThetaSketch.from_smallest_hashes(list(range(100, 400, 3)), k=4096)
    assert sk.estimate == 100
    back = puffin.ThetaSketch.deserialize(sk.serialize())
    assert back.retained == sk.retained and back.theta_long == sk.theta_long
    assert back.estimate == 100


def test_sketch_empty_roundtrip():
    sk = puffin.ThetaSketch.from_smallest_hashes([], k=16)
    assert sk.is_empty and sk.estimate == 0
    back = puffin.ThetaSketch.deserialize(sk.serialize())
    assert back.is_empty and back.estimate == 0


def test_sketch_estimation_mode_accuracy():
    # k=256 over 10_000 uniform hashes: KMV relative error ~ 1/sqrt(k-1),
    # so 3 sigma ≈ 19% — assert a loose 25% band, deterministic input
    import random

    rng = random.Random(7)
    n = 10_000
    # uniform over the sketch's full [0, 2^63) hash domain — KMV's
    # estimator is calibrated to it
    hashes = rng.sample(range(1, 1 << 63), n)
    sk = puffin.ThetaSketch.from_smallest_hashes(sorted(hashes)[:257], k=256)
    assert sk.theta_long < (1 << 63)  # estimation mode engaged
    assert abs(sk.estimate - n) / n < 0.25
    back = puffin.ThetaSketch.deserialize(sk.serialize())
    assert back.estimate == sk.estimate


def test_sketch_merge_union():
    a = puffin.ThetaSketch.from_smallest_hashes([1, 5, 9], k=64)
    b = puffin.ThetaSketch.from_smallest_hashes([5, 7, 11], k=64)
    u = a.merge(b)
    assert u.estimate == 5  # {1,5,7,9,11}


# ---------------------------------------------------------- container ----


def test_puffin_container_roundtrip(tmp_path):
    p = str(tmp_path / "s.puffin")
    sk = puffin.ThetaSketch.from_smallest_hashes([3, 1, 2], k=8)
    info = puffin.write_puffin(
        p,
        [
            (
                {
                    "type": puffin.BLOB_TYPE_THETA,
                    "fields": [1],
                    "snapshot-id": 42,
                    "sequence-number": 1,
                    "properties": {"ndv": "3"},
                },
                sk.serialize(),
            )
        ],
        properties={"created-by": "test"},
    )
    assert info["file-size-in-bytes"] == os.path.getsize(p)
    blobs, props = puffin.read_puffin(p)
    assert props == {"created-by": "test"}
    assert len(blobs) == 1 and blobs[0]["snapshot-id"] == 42
    assert puffin.ThetaSketch.deserialize(blobs[0]["payload"]).estimate == 3


def test_puffin_bad_magic_fails(tmp_path):
    p = str(tmp_path / "bad.puffin")
    with open(p, "wb") as fh:
        fh.write(b"NOPE" + b"\x00" * 20)
    with pytest.raises(ValueError, match="bad magic"):
        puffin.read_puffin(p)


# ------------------------------------------------------- analyze wiring ----


def _mk_table(spark, tmp_path, name="t", n=5000):
    root = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).cast("int").alias("grp"),
        (F.col("id") % 97).cast("int").alias("code"),
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    return root


def test_analyze_iceberg_exact_ndv(spark, tmp_path):
    root = _mk_table(spark, tmp_path)
    pp = iceberg.analyze_iceberg(spark, root, columns=["grp", "code"])
    assert os.path.exists(pp) and pp.endswith(".stats.puffin")
    st = iceberg.table_statistics(root)
    assert st["row_count"] == 5000
    # below k → exact mode → exact NDV
    assert st["ndv"] == {"grp": 7, "code": 97}
    assert st["stats_snapshot_id"] is not None
    # sketches readable and mergeable
    sks = iceberg.read_statistics_sketches(root)
    assert sks["grp"].estimate == 7
    assert sks["grp"].merge(sks["code"]).estimate >= 97


def test_analyze_high_cardinality_estimation(spark, tmp_path):
    root = _mk_table(spark, tmp_path, name="hc", n=60_000)
    iceberg.analyze_iceberg(spark, root, columns=["id"], k=512)
    st = iceberg.table_statistics(root)
    assert abs(st["ndv"]["id"] - 60_000) / 60_000 < 0.2


def test_stats_survive_appends_but_marked_stale(spark, tmp_path):
    root = _mk_table(spark, tmp_path, name="ap")
    iceberg.analyze_iceberg(spark, root, columns=["grp"])
    df2 = spark.range(5000, 6000).select(
        "id",
        (F.col("id") % 7).cast("int").alias("grp"),
        (F.col("id") % 97).cast("int").alias("code"),
    )
    iceberg.write_iceberg(spark, df2, root, format_version=2)
    meta = iceberg._load_metadata(root)
    # the entry survives the commit (statistics list carried)...
    assert meta.get("statistics"), "statistics list dropped by append"
    st = iceberg.table_statistics(root)
    # ...but no longer matches the current snapshot: callers see UNKNOWN,
    # never a silently-stale number
    assert st["ndv"] == {} and st["stats_snapshot_id"] is None
    assert st["row_count"] == 6000
    # re-analyze refreshes; old snapshot's entry is replaced not duplicated
    iceberg.analyze_iceberg(spark, root, columns=["grp"])
    st2 = iceberg.table_statistics(root)
    assert st2["ndv"] == {"grp": 7}


def test_analyze_unknown_column_fails(spark, tmp_path):
    root = _mk_table(spark, tmp_path, name="uc", n=100)
    with pytest.raises(ValueError, match="unknown columns"):
        iceberg.analyze_iceberg(spark, root, columns=["nope"])


# --------------------------------------------------------- planner payoff ----


def test_stats_drive_broadcast_without_hint(spark, tmp_path):
    """The VERDICT bar: with the broadcast threshold BELOW the table's raw
    file size, a plain read joins by shuffle; the Puffin-NDV estimate of
    the equality-filtered scan lands under the threshold and flips the
    join to BroadcastHashJoin — no user hint anywhere."""
    dim = _mk_table(spark, tmp_path, name="dim", n=50_000)
    iceberg.analyze_iceberg(spark, dim, columns=["id", "grp", "code"])
    fact = spark.range(200_000).select(
        (F.col("id") % 50_000).alias("fk"), (F.col("id") * 2).alias("m")
    )
    st = iceberg.table_statistics(dim)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # threshold strictly between est-filtered size and raw file size
        thr = max(64 * 1024, int(st["total_file_bytes"] // 4))
        assert st["total_file_bytes"] > thr
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))
        plain = fact.join(
            iceberg.read_iceberg(spark, dim).where(F.col("code") == 3),
            F.col("fk") == F.col("id"),
        )
        assert "BroadcastHashJoin" not in plain._jdf.queryExecution().executedPlan().toString()
        scan, est = plans.iceberg_scan_with_stats(spark, dim, {"code": 3})
        assert est["known"] and est["broadcast"]
        assert est["est_bytes"] < thr < est["raw_bytes"]
        joined = fact.join(scan, F.col("fk") == F.col("id"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # and the result is right: 50_000/97≈516 ids with code 3, 4 fact rows each
        n_dim = 50_000 // 97 + (1 if 3 < 50_000 % 97 else 0)
        assert joined.count() == n_dim * 4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unknown_ndv_never_guesses_small(spark, tmp_path):
    root = _mk_table(spark, tmp_path, name="nk", n=5000)
    iceberg.analyze_iceberg(spark, root, columns=["grp"])
    # 'code' was not analyzed: estimate must fall back to full size
    est = plans.estimate_equality_scan(
        iceberg.table_statistics(root), ["code"]
    )
    assert not est["known"] and est["est_rows"] == 5000


def test_size_bytes_parser():
    assert plans._size_bytes("10MB") == 10 << 20
    assert plans._size_bytes("64k") == 64 << 10
    assert plans._size_bytes("1048576b") == 1 << 20
    assert plans._size_bytes("-1") == -1


# ----------------------------------------------------- incremental ANALYZE ----


def test_incremental_analyze_scans_only_new_files(spark, tmp_path, monkeypatch):
    """analyze_iceberg(incremental=True): sketches over ONLY the appended
    files union with the stored ones — NDV exact-correct for the union,
    and the sketch pass never touches pre-stats files."""
    root = str(tmp_path / "inc")
    df1 = spark.range(0, 3000).select(
        "id", (F.col("id") % 10).cast("int").alias("grp")
    )
    iceberg.write_iceberg(spark, df1, root, format_version=2)
    iceberg.analyze_iceberg(spark, root, columns=["grp"])
    # spy on which parquet files the sketch pass reads
    scanned = []
    orig = puffin.column_sketches

    def spy2(df, columns, k=puffin.DEFAULT_K):
        try:
            files = [
                r.f for r in df.select(
                    F.col("_metadata.file_path").alias("f")
                ).distinct().collect()
            ]
        except Exception:
            files = ["<unresolvable>"]
        scanned.append(files)
        return orig(df, columns, k=k)

    monkeypatch.setattr(puffin, "column_sketches", spy2)
    # append rows carrying 5 NEW grp values (10..14) plus overlap
    df2 = spark.range(3000, 4200).select(
        "id", (F.col("id") % 15).cast("int").alias("grp")
    )
    iceberg.write_iceberg(spark, df2, root, format_version=2)
    n_files_before = len(iceberg._live_data_files(root))
    pp = iceberg.analyze_iceberg(spark, root, columns=["grp"], incremental=True)
    assert os.path.exists(pp)
    st = iceberg.table_statistics(root)
    assert st["ndv"] == {"grp": 15}, "union NDV must cover old+new values"
    assert st["row_count"] == 4200
    # the sketch pass saw only the appended files
    assert len(scanned) == 1
    seen = {os.path.basename(f) for f in scanned[0]}
    all_files = {os.path.basename(f) for f in iceberg._live_data_files(root)}
    assert seen and seen < all_files, (
        f"incremental pass read {len(seen)}/{len(all_files)} files — "
        "expected a strict subset (new files only)"
    )
    assert n_files_before == len(all_files)


def test_incremental_analyze_falls_back_on_delete(spark, tmp_path):
    """Row-level deletes shrink NDV — the union path must refuse and the
    full scan take over (correct numbers either way)."""
    root = str(tmp_path / "incdel")
    df = spark.range(0, 1000).select(
        "id", (F.col("id") % 8).cast("int").alias("grp")
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.analyze_iceberg(spark, root, columns=["grp"])
    iceberg.delete_iceberg(spark, root, "grp = 7")
    assert iceberg._incremental_sketches(
        spark, root, iceberg._load_metadata(root), ["grp"], 4096
    ) is None
    iceberg.analyze_iceberg(spark, root, columns=["grp"], incremental=True)
    assert iceberg.table_statistics(root)["ndv"] == {"grp": 7}


def test_incremental_analyze_no_prior_column_falls_back(spark, tmp_path):
    root = str(tmp_path / "incmiss")
    df = spark.range(0, 500).select(
        "id", (F.col("id") % 4).cast("int").alias("grp")
    )
    iceberg.write_iceberg(spark, df, root, format_version=2)
    iceberg.analyze_iceberg(spark, root, columns=["grp"])
    iceberg.write_iceberg(
        spark,
        spark.range(500, 600).select(
            "id", (F.col("id") % 4).cast("int").alias("grp")
        ),
        root,
        format_version=2,
    )
    # 'id' was never analyzed: merge path refuses, full scan still right
    iceberg.analyze_iceberg(
        spark, root, columns=["grp", "id"], incremental=True
    )
    st = iceberg.table_statistics(root)
    assert st["ndv"]["grp"] == 4 and st["ndv"]["id"] == 600


def test_compaction_carries_stats_forward(spark, tmp_path):
    """A pure rearrangement preserves content: the Puffin entry re-keys to
    the compaction snapshot for free; expiring the OLD snapshot must not
    delete the shared Puffin file; a delete-folding compaction does NOT
    carry (rows changed)."""
    root = _mk_table(spark, tmp_path, name="cstat", n=4000)
    iceberg.write_iceberg(
        spark,
        spark.range(4000, 5000).select(
            "id", (F.col("id") % 7).cast("int").alias("grp"),
            (F.col("id") % 97).cast("int").alias("code"),
        ),
        root, format_version=2,
    )
    iceberg.analyze_iceberg(spark, root, columns=["grp"])
    iceberg.compact_iceberg(spark, root)
    st = iceberg.table_statistics(root)
    assert st["ndv"] == {"grp": 7}, "stats must ride a pure compaction"
    # expire the pre-compaction snapshots: the shared Puffin file survives
    out = iceberg.expire_iceberg_snapshots(root, keep=1)
    assert out["snapshots"]
    st2 = iceberg.table_statistics(root)
    assert st2["ndv"] == {"grp": 7}
    sks = iceberg.read_statistics_sketches(root)
    assert sks["grp"].estimate == 7  # file still readable
    # delete-folding compaction: no carry (stale entry stays on old snap)
    iceberg.delete_iceberg(spark, root, "grp = 6")
    iceberg.compact_iceberg(spark, root)
    st3 = iceberg.table_statistics(root)
    assert st3["ndv"] == {}, "content-changing compaction must not carry"


# -------------------------------------------------------- Delta ANALYZE ----


def test_analyze_delta_and_staleness(spark, tmp_path):
    from feature_store_ml_spark.io import lakehouse

    root = str(tmp_path / "dstat")
    lakehouse.write_delta(
        spark,
        spark.range(4000).select(
            "id", (F.col("id") % 9).cast("int").alias("grp")
        ),
        root,
    )
    pp = lakehouse.analyze_delta(spark, root, columns=["grp"])
    assert os.path.exists(pp) and "_delta_log/_stats" in pp.replace(os.sep, "/")
    st = lakehouse.delta_table_statistics(root)
    assert st["row_count"] == 4000 and st["ndv"] == {"grp": 9}
    assert st["stats_version"] == 0
    # any later commit reads as UNKNOWN, never silently stale
    lakehouse.write_delta(
        spark,
        spark.range(4000, 4100).select(
            "id", (F.col("id") % 9).cast("int").alias("grp")
        ),
        root,
        mode="append",
    )
    st2 = lakehouse.delta_table_statistics(root)
    assert st2["ndv"] == {} and st2["stats_version"] is None
    assert st2["row_count"] == 4100


def test_analyze_delta_incremental_union(spark, tmp_path, monkeypatch):
    from feature_store_ml_spark.io import lakehouse

    root = str(tmp_path / "dinc")
    lakehouse.write_delta(
        spark,
        spark.range(3000).select(
            "id", (F.col("id") % 10).cast("int").alias("grp")
        ),
        root,
    )
    lakehouse.analyze_delta(spark, root, columns=["grp"])
    lakehouse.write_delta(
        spark,
        spark.range(3000, 4200).select(
            "id", (F.col("id") % 15).cast("int").alias("grp")
        ),
        root,
        mode="append",
    )
    scanned = []
    orig = puffin.column_sketches

    def spy(df, columns, k=puffin.DEFAULT_K):
        files = [
            r.f
            for r in df.select(
                F.col("_metadata.file_path").alias("f")
            ).distinct().collect()
        ]
        scanned.append(files)
        return orig(df, columns, k=k)

    monkeypatch.setattr(puffin, "column_sketches", spy)
    lakehouse.analyze_delta(spark, root, columns=["grp"], incremental=True)
    st = lakehouse.delta_table_statistics(root)
    assert st["ndv"] == {"grp": 15}
    adds, _m = lakehouse._replay_log_adds(root)
    assert len(scanned) == 1 and 0 < len(scanned[0]) < len(adds), (
        "incremental pass must read a strict subset (new files only)"
    )
    # a DELETE (DV) breaks additivity: falls back to full, still right
    lakehouse.delete_delta(spark, root, "grp = 14")
    lakehouse.analyze_delta(spark, root, columns=["grp"], incremental=True)
    assert lakehouse.delta_table_statistics(root)["ndv"] == {"grp": 14}


def test_delta_stats_drive_broadcast(spark, tmp_path):
    from feature_store_ml_spark.io import lakehouse

    root = str(tmp_path / "dbc")
    lakehouse.write_delta(
        spark,
        spark.range(50_000).select(
            "id", (F.col("id") % 97).cast("int").alias("code")
        ),
        root,
    )
    lakehouse.analyze_delta(spark, root, columns=["code"])
    st = lakehouse.delta_table_statistics(root)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        thr = max(64 * 1024, int(st["total_file_bytes"] // 4))
        assert st["total_file_bytes"] > thr
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))
        scan, est = plans.delta_scan_with_stats(spark, root, {"code": 3})
        assert est["known"] and est["broadcast"]
        fact = spark.range(100_000).select((F.col("id") % 50_000).alias("fk"))
        joined = fact.join(scan, F.col("fk") == F.col("id"))
        assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_clone_drops_stats_domain(spark, tmp_path):
    from feature_store_ml_spark.io import lakehouse

    src = str(tmp_path / "csrc")
    lakehouse.write_delta(
        spark,
        spark.range(100).select("id", (F.col("id") % 5).alias("grp")),
        src,
    )
    lakehouse.analyze_delta(spark, src, columns=["grp"])
    dst = str(tmp_path / "cdst")
    lakehouse.clone_delta(spark, src, dst)
    # version-keyed to the source's log: must NOT read as fresh on the
    # clone's own numbering
    assert lakehouse.delta_table_statistics(dst)["ndv"] == {}
    assert lakehouse._stats_domain(dst) is None


def test_delta_stats_survive_checkpoint_cleanup(spark, tmp_path):
    from feature_store_ml_spark.io import lakehouse

    root = str(tmp_path / "dckpt")
    lakehouse.write_delta(
        spark,
        spark.range(500).select("id", (F.col("id") % 5).alias("grp")),
        root,
    )
    lakehouse.analyze_delta(spark, root, columns=["grp"])
    lakehouse.checkpoint_delta(root)
    lakehouse.cleanup_delta_log(root)
    st = lakehouse.delta_table_statistics(root)
    assert st["ndv"] == {"grp": 5}, "stats domain must ride the checkpoint"


def test_row_counts_subtract_delete_masks(spark, tmp_path):
    """table_statistics row counts reflect LIVE rows: Delta subtracts DV
    cardinality, Iceberg subtracts position-delete record counts."""
    from feature_store_ml_spark.io import lakehouse

    d = str(tmp_path / "dvrows")
    lakehouse.write_delta(
        spark,
        spark.range(1000).select("id", (F.col("id") % 4).alias("grp")),
        d,
    )
    lakehouse.delete_delta(spark, d, "grp = 0")
    assert lakehouse.delta_table_statistics(d)["row_count"] == 750

    i = str(tmp_path / "posrows")
    iceberg.write_iceberg(
        spark,
        spark.range(1000).select("id", (F.col("id") % 4).alias("grp")),
        i,
        format_version=2,
    )
    iceberg.delete_iceberg(spark, i, "grp = 1")
    assert iceberg.table_statistics(i)["row_count"] == 750


# ------------------------------------------------ join-cardinality estimate ----


def test_sketch_intersection_and_join_estimate(spark, tmp_path):
    """Sketch-based join cardinality sees KEY OVERLAP: two tables whose
    key domains half-overlap estimate ~|overlap|·fanout, while disjoint
    domains estimate ~0 — the case System-R math gets catastrophically
    wrong."""
    from feature_store_ml_spark.io import lakehouse

    a = str(tmp_path / "ja")
    b = str(tmp_path / "jb")
    # A keys 0..1999 (2 rows each), B keys 1000..2999 (3 rows each):
    # overlap 1000 keys -> true join rows = 1000 * 2 * 3 = 6000
    lakehouse.write_delta(
        spark,
        spark.range(4000).select((F.col("id") % 2000).alias("k")),
        a,
    )
    lakehouse.write_delta(
        spark,
        spark.range(3000).select((F.col("id") % 1000 + 1000).alias("k")),
        b,
    )
    lakehouse.analyze_delta(spark, a, columns=["k"], k=8192)
    lakehouse.analyze_delta(spark, b, columns=["k"], k=8192)
    est = plans.estimate_join_rows(
        lakehouse.delta_table_statistics(a),
        lakehouse.delta_table_statistics(b),
        ("k", "k"),
        lakehouse.read_delta_statistics_sketches(a),
        lakehouse.read_delta_statistics_sketches(b),
    )
    assert est["method"] == "sketch"
    assert est["key_overlap"] == 1000  # exact mode: overlap is exact
    assert abs(est["est_rows"] - 6000) < 1
    # true join size agrees
    true = (
        lakehouse.read_delta(spark, a)
        .join(lakehouse.read_delta(spark, b), "k")
        .count()
    )
    assert true == 6000
    # disjoint domains: sketch sees ~0 where System-R would say 4000*3000/2000
    c = str(tmp_path / "jc")
    lakehouse.write_delta(
        spark,
        spark.range(3000).select((F.col("id") % 1000 + 50_000).alias("k")),
        c,
    )
    lakehouse.analyze_delta(spark, c, columns=["k"], k=8192)
    est2 = plans.estimate_join_rows(
        lakehouse.delta_table_statistics(a),
        lakehouse.delta_table_statistics(c),
        ("k", "k"),
        lakehouse.read_delta_statistics_sketches(a),
        lakehouse.read_delta_statistics_sketches(c),
    )
    assert est2["est_rows"] == 0 and est2["key_overlap"] == 0
    # System-R fallback when a sketch is missing
    est3 = plans.estimate_join_rows(
        lakehouse.delta_table_statistics(a),
        lakehouse.delta_table_statistics(b),
        ("k", "k"),
    )
    assert est3["method"] == "system-r"
    assert abs(est3["est_rows"] - 4000 * 3000 / 2000) < 1


def test_cross_format_join_estimate(spark, tmp_path):
    """Delta ⋈ Iceberg estimates compose (same xxhash64 key space)."""
    from feature_store_ml_spark.io import lakehouse

    d = str(tmp_path / "xd")
    i = str(tmp_path / "xi")
    lakehouse.write_delta(
        spark, spark.range(2000).select((F.col("id") % 500).alias("k")), d
    )
    iceberg.write_iceberg(
        spark,
        spark.range(1000).select((F.col("id") % 250).alias("k")),
        i,
        format_version=2,
    )
    lakehouse.analyze_delta(spark, d, columns=["k"])
    iceberg.analyze_iceberg(spark, i, columns=["k"])
    est = plans.estimate_join_rows(
        lakehouse.delta_table_statistics(d),
        iceberg.table_statistics(i),
        ("k", "k"),
        lakehouse.read_delta_statistics_sketches(d),
        iceberg.read_statistics_sketches(i),
    )
    # keys 0..249 overlap fully: 250 * (2000/500) * (1000/250) = 4000
    assert est["method"] == "sketch" and est["key_overlap"] == 250
    assert abs(est["est_rows"] - 4000) < 1


def test_analyze_delta_declares_domain_metadata_feature(spark, tmp_path):
    """Emitting a domainMetadata action requires DECLARING the writer
    feature (spec) — analyze upgrades the protocol once, in-commit."""
    from feature_store_ml_spark.io import lakehouse

    root = str(tmp_path / "dproto")
    lakehouse.write_delta(
        spark, spark.range(100).select("id", (F.col("id") % 3).alias("g")), root
    )
    assert "domainMetadata" not in (
        lakehouse._current_protocol(root).get("writerFeatures") or []
    )
    lakehouse.analyze_delta(spark, root, columns=["g"])
    proto = lakehouse._current_protocol(root)
    assert proto["minWriterVersion"] == 7
    assert "domainMetadata" in proto["writerFeatures"]
    # second analyze: no duplicate upgrade needed, still green
    lakehouse.analyze_delta(spark, root, columns=["g"])
    assert lakehouse.delta_table_statistics(root)["ndv"] == {"g": 3}


# ------------------------------------------------------------ properties ----

try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=(1 << 63) - 1),
            max_size=200,
        ),
        k=st.integers(min_value=1, max_value=64),
    )
    def test_sketch_roundtrip_property(vals, k):
        """ANY sketch (empty/exact/estimation) survives serialize →
        deserialize with retained set, theta and estimate intact."""
        sk = puffin.ThetaSketch.from_smallest_hashes(vals, k=k)
        back = puffin.ThetaSketch.deserialize(sk.serialize())
        assert back.retained == sk.retained
        assert back.theta_long == sk.theta_long
        assert back.estimate == sk.estimate

    @settings(max_examples=40, deadline=None)
    @given(
        a=st.sets(st.integers(min_value=1, max_value=(1 << 63) - 1), max_size=80),
        b=st.sets(st.integers(min_value=1, max_value=(1 << 63) - 1), max_size=80),
    )
    def test_sketch_set_algebra_exact_property(a, b):
        """In exact mode (everything below k) merge IS union and
        intersect IS intersection — set algebra, not approximation."""
        sa = puffin.ThetaSketch.from_smallest_hashes(sorted(a), k=256)
        sb = puffin.ThetaSketch.from_smallest_hashes(sorted(b), k=256)
        assert sa.merge(sb).estimate == len(a | b)
        assert sa.intersect(sb).estimate == len(a & b)

except ImportError:  # hypothesis is in the image; belt-and-braces
    pass


def test_analyze_delta_on_mapped_table(spark, tmp_path):
    """ANALYZE composes with NAME-mode column mapping: the full-scan path
    reads through the logical projection (post-rename), and the protocol
    upgrade carries the columnMapping feature forward."""
    from feature_store_ml_spark.io import lakehouse

    root = str(tmp_path / "cmstat")
    lakehouse.write_delta(
        spark,
        spark.range(200).select("id", (F.col("id") % 4).alias("g")),
        root,
        column_mapping="name",
    )
    lakehouse.rename_delta_column(spark, root, "g", "grp")
    lakehouse.analyze_delta(spark, root, columns=["grp"])
    st = lakehouse.delta_table_statistics(root)
    assert st["ndv"] == {"grp": 4} and st["row_count"] == 200
    proto = lakehouse._current_protocol(root)
    assert proto["minWriterVersion"] == 7
    assert {"columnMapping", "domainMetadata"} <= set(proto["writerFeatures"])
    assert lakehouse.read_delta(spark, root).count() == 200
    # incremental refuses on mapped tables (raw new-file scan can't
    # resolve physical names) — full scan fallback stays correct
    lakehouse.write_delta(
        spark,
        spark.range(200, 300).select("id", (F.col("id") % 5).alias("grp")),
        root,
        mode="append",
    )
    lakehouse.analyze_delta(spark, root, columns=["grp"], incremental=True)
    assert lakehouse.delta_table_statistics(root)["ndv"] == {"grp": 5}


def test_analyze_iceberg_partitioned_and_masked(spark, tmp_path):
    """ANALYZE goes through the full reader, so identity-partition
    backfill and delete masks are respected: NDV counts SURVIVING rows'
    values, partition columns analyze too."""
    root = str(tmp_path / "pmask")
    df = spark.range(900).select(
        "id",
        (F.col("id") % 3).cast("int").alias("p"),
        (F.col("id") % 11).cast("int").alias("code"),
    )
    iceberg.write_iceberg(spark, df, root, format_version=2, partition_by=["p"])
    iceberg.delete_iceberg(spark, root, "code = 10")
    iceberg.analyze_iceberg(spark, root, columns=["p", "code"])
    st = iceberg.table_statistics(root)
    assert st["ndv"] == {"p": 3, "code": 10}, "masked value must not count"
    # incremental falls back on partitioned tables (identity backfill
    # needs the full reader) — and stays correct
    iceberg.write_iceberg(
        spark,
        spark.range(900, 1000).select(
            "id", (F.col("id") % 5).cast("int").alias("p"),
            (F.col("id") % 11).cast("int").alias("code"),
        ),
        root, format_version=2, partition_by=["p"],
    )
    assert iceberg._incremental_sketches(
        spark, root, iceberg._load_metadata(root), ["p"], 4096
    ) is None
    iceberg.analyze_iceberg(spark, root, columns=["p"], incremental=True)
    assert iceberg.table_statistics(root)["ndv"] == {"p": 5}
