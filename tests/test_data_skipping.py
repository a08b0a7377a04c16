"""Per-file stats + data skipping (io/skipping.py + read_delta(where=)).

The contract under test: ``read_delta(path, where=p)`` returns EXACTLY the
rows of ``read_delta(path).filter(p)`` while scanning a strict subset of
files whenever stats prove files dead — and never guesses: predicates the
evaluator can't prove keep every file.
"""

import datetime
import json
import math
import os

import pytest
from pyspark.sql import Row, functions as F

from feature_store_ml_spark.io import lakehouse, skipping


def _adds(path):
    """All live add actions from the log, {relpath: add}."""
    adds, _meta = lakehouse._replay_log_adds(path)
    return adds


def _clustered_table(spark, tmp_path, name="t"):
    """A Delta table whose files are range-clustered on `k` (10 files,
    k in [0, 1000)) — the layout data skipping is built for."""
    root = str(tmp_path / name)
    df = (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("m"),
            F.concat(F.lit("s"), F.format_string("%04d", F.col("id"))).alias("s"),
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        )
        .repartitionByRange(10, "k")
    )
    lakehouse.write_delta(spark, df, root)
    return root


# ------------------------------------------------------------- stats write


def test_write_collects_per_file_stats(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    adds = _adds(root)
    assert len(adds) == 10
    total = 0
    for a in adds.values():
        assert "stats" in a, "every add action should carry stats"
        st = json.loads(a["stats"])
        total += st["numRecords"]
        assert st["minValues"]["k"] <= st["maxValues"]["k"]
        assert st["nullCount"]["k"] == 0
        # string + date bounds present too
        assert st["minValues"]["s"].startswith("s")
        datetime.date.fromisoformat(st["minValues"]["d"])
    assert total == 1000


def test_stats_bounds_match_data(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    for rel, a in _adds(root).items():
        st = json.loads(a["stats"])
        pdf = spark.read.parquet(os.path.join(root, rel)).toPandas()
        assert st["minValues"]["k"] == pdf["k"].min()
        assert st["maxValues"]["k"] == pdf["k"].max()
        assert st["numRecords"] == len(pdf)


def test_merge_and_compact_rewrites_carry_stats(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    upd = spark.createDataFrame([Row(k=5, m=99, s="zzz", d=datetime.date(2030, 1, 1))])
    lakehouse.merge_delta(spark, upd, root, keys=["k"])
    assert all("stats" in a for a in _adds(root).values())
    lakehouse.compact_delta(spark, root)
    assert all("stats" in a for a in _adds(root).values())


# ------------------------------------------------------------- pruning


def test_point_lookup_skips_most_files(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    rep = lakehouse.skipping_report(root, "k = 437")
    assert rep["eligible"]
    assert rep["total_files"] == 10
    assert rep["kept_files"] == 1
    got = lakehouse.read_delta(spark, root, where="k = 437").collect()
    assert len(got) == 1 and got[0]["m"] == 437 % 7


def test_range_predicate_prunes_and_matches_filter(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    pred = "k >= 850 AND m < 5"
    rep = lakehouse.skipping_report(root, pred)
    assert 1 <= rep["kept_files"] <= 3
    expect = sorted(
        r["k"] for r in lakehouse.read_delta(spark, root).filter(pred).collect()
    )
    got = sorted(r["k"] for r in lakehouse.read_delta(spark, root, where=pred).collect())
    assert got == expect and len(got) > 0


def test_between_in_string_date_predicates(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    cases = [
        "k BETWEEN 100 AND 120",
        "k IN (3, 503, 997)",
        "s = 's0042'",
        "s LIKE 's09%'",
        "d > DATE '2026-06-01'",
        "d = '2024-02-01'",
    ]
    base = lakehouse.read_delta(spark, root)
    for pred in cases:
        rep = lakehouse.skipping_report(root, pred)
        assert rep["eligible"], pred
        assert rep["kept_files"] < rep["total_files"], f"no pruning for {pred}"
        expect = sorted(r["k"] for r in base.filter(pred).collect())
        got = sorted(
            r["k"] for r in lakehouse.read_delta(spark, root, where=pred).collect()
        )
        assert got == expect, pred
        assert len(got) > 0, f"degenerate case: {pred}"


def test_ineligible_predicates_fail_open(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    base = lakehouse.read_delta(spark, root)
    for pred in [
        "k = 3 OR k = 997",          # top-level OR
        "k + 1 = 4",                  # expression on the column
        "upper(s) = 'S0042'",         # function call
        "m != 2",                     # can't prune a mixed file
    ]:
        rep = lakehouse.skipping_report(root, pred)
        expect = sorted(r["k"] for r in base.filter(pred).collect())
        got = sorted(
            r["k"] for r in lakehouse.read_delta(spark, root, where=pred).collect()
        )
        assert got == expect, pred
        if not rep["eligible"]:
            assert rep["kept_files"] == rep["total_files"]


def test_unparseable_conjunct_is_ignored_but_parseable_one_prunes(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    pred = "k < 100 AND pmod(m, 3) = 1"
    rep = lakehouse.skipping_report(root, pred)
    assert rep["eligible"] and rep["kept_files"] == 1
    expect = sorted(
        r["k"] for r in lakehouse.read_delta(spark, root).filter(pred).collect()
    )
    got = sorted(r["k"] for r in lakehouse.read_delta(spark, root, where=pred).collect())
    assert got == expect and len(got) > 0


def test_empty_prune_returns_schema_only_frame(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    df = lakehouse.read_delta(spark, root, where="k > 5000")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "m", "s", "d"]


def test_all_equal_file_pruned_on_not_equal(spark, tmp_path):
    root = str(tmp_path / "alleq")
    one = spark.createDataFrame([Row(a=7, b="x"), Row(a=7, b="y")]).coalesce(1)
    two = spark.createDataFrame([Row(a=9, b="z")]).coalesce(1)
    lakehouse.write_delta(spark, one, root)
    lakehouse.write_delta(spark, two, root)
    rep = lakehouse.skipping_report(root, "a != 7")
    assert rep["kept_files"] == 1 and rep["skipped_files"] == 1
    assert [r["a"] for r in lakehouse.read_delta(spark, root, where="a != 7").collect()] == [9]


def test_null_semantics(spark, tmp_path):
    root = str(tmp_path / "nulls")
    no_nulls = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")]).coalesce(1)
    all_null = spark.createDataFrame(
        [Row(a=None, b="n1"), Row(a=None, b="n2")],
        schema=no_nulls.schema,
    ).coalesce(1)
    lakehouse.write_delta(spark, no_nulls, root)
    lakehouse.write_delta(spark, all_null, root)
    # IS NULL skips the no-null file; IS NOT NULL skips the all-null file
    assert lakehouse.skipping_report(root, "a IS NULL")["kept_files"] == 1
    assert lakehouse.skipping_report(root, "a IS NOT NULL")["kept_files"] == 1
    # comparisons never match an all-null file
    assert lakehouse.skipping_report(root, "a >= 1")["kept_files"] == 1
    got = sorted(
        r["b"] for r in lakehouse.read_delta(spark, root, where="a IS NULL").collect()
    )
    assert got == ["n1", "n2"]


def test_partition_value_pruning_without_stats(spark, tmp_path):
    """Partition-column conjuncts prune from partitionValues alone —
    exact, not bounds-based."""
    root = str(tmp_path / "parted")
    df = spark.range(0, 100).select(
        (F.col("id") % 4).alias("p"), F.col("id").alias("v")
    )
    lakehouse.write_delta(spark, df, root, partition_by=["p"])
    rep = lakehouse.skipping_report(root, "p = 2 AND v < 50")
    assert rep["kept_files"] < rep["total_files"]
    expect = sorted(
        r["v"]
        for r in lakehouse.read_delta(spark, root).filter("p = 2 AND v < 50").collect()
    )
    got = sorted(
        r["v"]
        for r in lakehouse.read_delta(spark, root, where="p = 2 AND v < 50").collect()
    )
    assert got == expect and len(got) > 0


def test_stats_survive_checkpoint_and_log_cleanup(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    lakehouse.checkpoint_delta(root)
    lakehouse.cleanup_delta_log(root)
    rep = lakehouse.skipping_report(root, "k = 437")
    assert rep["kept_files"] == 1, "stats lost through checkpoint"
    got = lakehouse.read_delta(spark, root, where="k = 437").collect()
    assert len(got) == 1


def test_skipping_composes_with_column_rename(spark, tmp_path):
    """After a zero-rewrite RENAME the logical predicate column maps to the
    physical stats key."""
    root = str(tmp_path / "renamed")
    df = spark.range(0, 100).select(F.col("id").alias("a"), (F.col("id") * 2).alias("b"))
    lakehouse.write_delta(spark, df.repartitionByRange(4, "a"), root)
    lakehouse.rename_delta_column(spark, root, "a", "key")
    rep = lakehouse.skipping_report(root, "key < 25")
    assert rep["kept_files"] == 1
    got = sorted(r["key"] for r in lakehouse.read_delta(spark, root, where="key < 25").collect())
    assert got == list(range(25))


def test_skipping_composes_with_deletion_vectors(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    lakehouse.delete_delta(spark, root, "k = 437")
    assert lakehouse.read_delta(spark, root, where="k = 437").count() == 0
    got = lakehouse.read_delta(spark, root, where="k BETWEEN 436 AND 438").collect()
    assert sorted(r["k"] for r in got) == [436, 438]


def test_time_travel_with_where(spark, tmp_path):
    root = _clustered_table(spark, tmp_path)
    lakehouse.delete_delta(spark, root, "k = 437")
    assert lakehouse.read_delta(spark, root, version=0, where="k = 437").count() == 1


def test_nan_bounds_are_dropped(spark, tmp_path):
    root = str(tmp_path / "nan")
    df = spark.createDataFrame(
        [Row(x=1.0), Row(x=float("nan")), Row(x=3.0)]
    ).coalesce(1)
    lakehouse.write_delta(spark, df, root)
    (a,) = _adds(root).values()
    st = json.loads(a["stats"])
    mins = st.get("minValues", {})
    maxs = st.get("maxValues", {})
    for bound in (mins.get("x"), maxs.get("x")):
        assert bound is None or not math.isnan(bound)
    # either way the read stays correct
    assert lakehouse.read_delta(spark, root, where="x > 2").count() >= 1


# --------------------------------------------------------- parser unit


def test_parse_conjuncts_shapes():
    assert skipping.parse_conjuncts("a = 1 AND b < 'x'") == [
        ("a", "=", ("num", 1)),
        ("b", "<", ("str", "x")),
    ]
    assert skipping.parse_conjuncts("a BETWEEN 1 AND 5") == [
        ("a", ">=", ("num", 1)),
        ("a", "<=", ("num", 5)),
    ]
    assert skipping.parse_conjuncts("a IN (1, 2)") == [
        ("a", "in", [("num", 1), ("num", 2)])
    ]
    assert skipping.parse_conjuncts("a IS NOT NULL") == [("a", "notnull", None)]
    assert skipping.parse_conjuncts("s LIKE 'ab%'") == [("s", "prefix", ("str", "ab"))]
    assert skipping.parse_conjuncts("a = 1 OR b = 2") is None
    assert skipping.parse_conjuncts("f(a) = 1") is None
    assert skipping.parse_conjuncts("(a = 1) AND b = 2") == [
        ("a", "=", ("num", 1)),
        ("b", "=", ("num", 2)),
    ]
    # escaped quote inside a string literal
    assert skipping.parse_conjuncts("s = 'it''s'") == [("s", "=", ("str", "it's"))]


def test_string_truncation_keeps_min_only():
    long = "z" * 300
    assert skipping._json_stat_value(long, is_min=True) == "z" * 256
    assert skipping._json_stat_value(long, is_min=False) is None


def test_zorder_compaction_enables_two_dimensional_skipping(spark, tmp_path):
    """Z-order + per-file stats = multi-dimensional pruning: after
    OPTIMIZE ZORDER BY (a, b), a predicate on EITHER dimension skips
    files — the scale story SCALE.md claims, pinned here."""
    root = str(tmp_path / "zorder")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"),
        F.floor(F.col("id") / 64).alias("b"),
        F.col("id").alias("v"),
    )
    # deliberately scrambled layout: neither column clusters naturally
    lakehouse.write_delta(spark, df.repartition(8), root)
    before_a = lakehouse.skipping_report(root, "a = 7")
    lakehouse.compact_delta(spark, root, target_file_bytes=8 * 1024, zorder_by=["a", "b"])
    after_a = lakehouse.skipping_report(root, "a = 7")
    after_b = lakehouse.skipping_report(root, "b = 50")
    assert after_a["total_files"] > 4, "compaction should keep several files"
    # scrambled: a=7 appears in every file; z-ordered: most files skip
    assert before_a["kept_files"] == before_a["total_files"]
    assert after_a["kept_files"] < after_a["total_files"]
    assert after_b["kept_files"] < after_b["total_files"]
    got = sorted(
        r["v"] for r in lakehouse.read_delta(spark, root, where="a = 7").collect()
    )
    assert got == sorted(range(7, 4096, 64))
