"""Mergeable sketches (E4 extension) and declarative data-quality rules."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import load_table
from feature_store_ml_spark.operators import quality as Q
from feature_store_ml_spark.operators import sketches


def test_hll_rollup_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.distinct_rollup(ev, "user_id", ["event_type"], time_col="ts")
    merged = {
        r.event_type: r.approx_distinct
        for r in sketches.merge_estimate(daily, ["event_type"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(merged[et] - n) / n < 0.05, (et, merged[et], n)
    # row counts are exact (carried alongside the sketches)
    n_rows = {
        r.event_type: r.n_rows
        for r in sketches.merge_estimate(daily, ["event_type"]).collect()
    }
    exact_rows = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert n_rows == exact_rows


def test_hll_merge_consistency(spark, sf_dir):
    """Merging daily sketches must estimate like sketching all-at-once —
    the algebraic property that makes persisted sketches usable."""
    ev = load_table(spark, sf_dir, "events")
    daily = sketches.distinct_rollup(ev, "user_id", ["event_type"], time_col="ts")
    merged = {
        r.event_type: r.approx_distinct
        for r in sketches.merge_estimate(daily, ["event_type"]).collect()
    }
    single = {
        r.event_type: r.oneshot
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("oneshot"))
        .collect()
    }
    assert merged == single  # identical lg_k → identical registers → equal


def test_theta_overlap_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    r = sketches.overlap_estimate(ev, "user_id", "event_type", "click", "view").first()
    assert r.n_intersect <= min(r.n_a, r.n_b) + 1
    assert max(r.n_a, r.n_b) - 1 <= r.n_union <= r.n_a + r.n_b + 1
    # inclusion-exclusion within sketch error
    assert abs((r.n_a + r.n_b - r.n_intersect) - r.n_union) / r.n_union < 0.05
    # clicks and views genuinely overlap in this corpus
    assert r.n_intersect > 0


def test_quality_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "x@y.com"),
            (2, -5.0, "B", "nope"),          # range + set violations
            (2, 200.0, "A", "z@w.org"),      # dup id + range violation
            (None, 50.0, "C", None),         # null id, set violation, null email
        ],
        "id long, v double, flag string, email string",
    )
    dim = spark.createDataFrame([("A",), ("B",)], "flag string")
    rules = [
        Q.not_null("id"),
        Q.in_range("v", 0.0, 100.0),
        Q.in_set("flag", ["A", "B"]),
        Q.matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
        Q.unique("id"),
        Q.ref_exists("flag", dim, "flag"),
    ]
    out = {r.rule: (r.n_violations, r.n_rows) for r in Q.validate(df, rules).collect()}
    assert out["not_null_id"] == (1, 4)
    assert out["in_range_v"] == (2, 4)
    assert out["in_set_flag"] == (1, 4)       # 'C'
    assert out["matches_email"] == (2, 4)     # 'nope' and the null
    assert out["unique_id"] == (2, 4)         # both rows of the dup key
    assert out["ref_flag"] == (1, 4)          # 'C' has no dim row (nulls don't join)


def test_quality_single_pass_plan(spark, sf_dir):
    """All row-local rules must share ONE aggregate over ONE scan."""
    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        Q.not_null("l_orderkey"),
        Q.in_range("l_discount", 0.0, 0.05),
        Q.in_set("l_returnflag", ["A", "N", "R"]),
    ]
    plan = Q.validate(li, rules)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1


def test_drift_psi(spark):
    from feature_store_ml_spark.operators import quality as Q

    import math

    import pytest
    from pyspark.sql import functions as F

    base = spark.range(0, 100).select((F.col("id") % 10).cast("double").alias("x"))
    # identical distributions -> every PSI term is exactly 0
    same = Q.drift_psi(base, base, "x", [3.0, 6.0]).collect()
    assert [r.bin for r in same] == [0, 1, 2]
    assert all(r.psi_term == 0.0 for r in same)
    assert abs(sum(r.p_base for r in same) - 1.0) < 1e-6
    # a shifted current distribution scores positive; empty bins are
    # Laplace-smoothed (no inf/nan even when a side has zero rows there)
    cur = spark.range(0, 100).select(F.lit(9.0).alias("x"))
    shifted = Q.drift_psi(base, cur, "x", [3.0, 6.0]).collect()
    total = sum(r.psi_term for r in shifted)
    assert total > 0.25
    assert all(math.isfinite(r.psi_term) for r in shifted)
    # hand-check one smoothed proportion: cur has 0 rows below 3.0
    p0 = next(r for r in shifted if r.bin == 0)
    assert abs(p0.p_cur - 1.0 / 103.0) < 1e-6
    # NULLs are excluded, not a bin
    with_null = base.unionByName(
        spark.range(0, 50).select(F.lit(None).cast("double").alias("x"))
    )
    nn = Q.drift_psi(with_null, base, "x", [3.0, 6.0]).collect()
    assert all(r.psi_term == 0.0 for r in nn)  # same non-null distribution
    # refusals
    with pytest.raises(ValueError, match="ascending"):
        Q.drift_psi(base, base, "x", [6.0, 3.0])
    with pytest.raises(ValueError, match="ascending"):
        Q.drift_psi(base, base, "x", [])
