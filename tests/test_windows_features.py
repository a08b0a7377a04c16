"""Window compositions and feature-store operators on micro-fixtures."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.operators import features, windows


def ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_top_k_per_group_ties(spark):
    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2), ("g", 3, 3), ("h", 9, 4)],
        "grp string, score int, id int",
    )
    out = windows.top_k_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id")], k=2
    ).toPandas()
    g = out[out.grp == "g"].sort_values("rn")
    assert list(g.id) == [1, 2]  # tie on score broken by id
    assert list(out[out.grp == "h"].id) == [4]


def test_sessionize_gap(spark):
    rows = [
        (1, ts(0), 1),
        (1, ts(10), 2),   # same session (10 min gap)
        (1, ts(50), 3),   # new session (40 min gap > 30)
        (2, ts(0), 4),    # separate user
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")
    out = windows.sessionize(df, "user_id", "ts", tiebreak="event_id").toPandas()
    sessions = dict(zip(out.event_id, out.session_id))
    assert sessions[1] == sessions[2] == 1
    assert sessions[3] == 2
    assert sessions[4] == 1


def test_rolling_features_window_boundary(spark):
    rows = [
        (1, ts(0), 10.0, 1),
        (1, ts(30), 20.0, 2),
        (1, dt.datetime(2024, 1, 1, 1, 0), 30.0, 3),  # exactly 3600s after first
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double, event_id long")
    out = features.rolling_features(df, trailing_seconds=3600).toPandas()
    got = dict(zip(out.event_id, out.n_trailing))
    assert got[1] == 1
    assert got[2] == 2
    assert got[3] == 3  # boundary inclusive: event at exactly -3600s counts


def test_forward_fill(spark):
    rows = [(1, 1, None), (1, 2, 5.0), (1, 3, None), (1, 4, None), (2, 1, None)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = features.forward_fill(df, ["k"], "t", ["v"]).toPandas()
    byrow = {(r.k, r.t): r.v for r in out.itertuples()}
    assert byrow[(1, 1)] is None or byrow[(1, 1)] != byrow[(1, 1)]  # NaN before first obs
    assert byrow[(1, 3)] == 5.0 and byrow[(1, 4)] == 5.0
    import math
    assert math.isnan(byrow[(2, 1)]) or byrow[(2, 1)] is None  # other key untouched


def test_point_in_time_no_future_leakage(spark):
    labels = spark.createDataFrame(
        [(1, ts(30), 100)], "user_id long, ts timestamp_ntz, label_id long"
    )
    feats = spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(31), 999.0)],
        "user_id long, feat_ts timestamp_ntz, feat double",
    )
    out = features.point_in_time_join(
        labels, feats, keys=["user_id"], label_ts="ts", feature_ts="feat_ts"
    ).toPandas()
    assert out.feat.iloc[0] == 1.0  # NOT the future value 999


def test_resample_ffill_known(spark):
    from datetime import datetime
    from feature_store_ml_spark.operators import features as FE

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 10.0),
        (1, datetime(2024, 1, 1, 2, 15), 20.0),
        (1, datetime(2024, 1, 1, 5, 0), 30.0),   # exactly on a grid point
        (2, datetime(2024, 1, 1, 1, 45), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.grid_ts.hour): r.value
        for r in FE.resample_ffill(df, ["user_id"], "ts", ["value"], "1 hour").collect()
    }
    # user 1: grid 00..05; 00:00 precedes first obs -> null
    assert out[(1, 0)] is None
    assert out[(1, 1)] == 10.0 and out[(1, 2)] == 10.0
    assert out[(1, 3)] == 20.0 and out[(1, 4)] == 20.0
    assert out[(1, 5)] == 30.0  # same-instant observation is visible
    # user 2: grid only spans its own range (01:00..01:45)
    assert out[(2, 1)] is None
    assert len([k for k in out if k[0] == 2]) == 1


def test_resample_grid_backfill_stable(spark):
    """Epoch-aligned grid: prepending EARLIER observations must leave every
    previously-emitted grid point in place (only extend the grid backward).
    A min(ts)-anchored grid fails this with any step that isn't a divisor
    of the truncation unit — here 90 minutes."""
    from datetime import datetime
    from feature_store_ml_spark.operators import features as FE

    base = [
        (1, datetime(2024, 1, 1, 3, 40), 1.0),
        (1, datetime(2024, 1, 1, 9, 10), 2.0),
    ]
    df = spark.createDataFrame(base, "user_id long, ts timestamp, value double")
    g1 = {r.grid_ts for r in FE.resample_grid(df, ["user_id"], "ts", "90 minutes").collect()}

    earlier = [(1, datetime(2024, 1, 1, 0, 55), 0.5)] + base
    df2 = spark.createDataFrame(earlier, "user_id long, ts timestamp, value double")
    g2 = {r.grid_ts for r in FE.resample_grid(df2, ["user_id"], "ts", "90 minutes").collect()}

    assert g1 <= g2, sorted(g1 - g2)
    # and the points really are epoch multiples of 90 min
    for t in g2:
        assert (t.hour * 60 + t.minute) % 90 == 0 and t.second == 0


def test_resample_step_unit_rejects_variable_units(spark):
    import pytest as _pytest
    from feature_store_ml_spark.operators import features as FE

    with _pytest.raises(ValueError):
        FE._step_micros("1 month")


def test_resample_single_shuffle(spark, sf_dir):
    from feature_store_ml_spark.io import load_table
    from feature_store_ml_spark.operators import features as FE

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    plan = (
        FE.resample_ffill(ev, ["user_id"], "ts", ["value"], "1 day")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # grid agg + window fill both hash-partition on user_id; the window
    # must not introduce a range exchange of the unioned data
    assert "Exchange rangepartitioning" not in plan


def test_resample_interpolate_known(spark):
    from datetime import datetime
    from feature_store_ml_spark.operators import features as FE

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 10.0),   # exactly on grid
        (1, datetime(2024, 1, 1, 2, 0), 30.0),   # exactly on grid
        (1, datetime(2024, 1, 1, 3, 30), 60.0),  # between grid points
        (2, datetime(2024, 1, 1, 0, 30), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.grid_ts.hour): r.value
        for r in FE.resample_interpolate(
            df, ["user_id"], "ts", ["value"], "1 hour"
        ).collect()
    }
    # exact-time observations win verbatim
    assert out[(1, 0)] == 10.0 and out[(1, 2)] == 30.0
    # linear blend halfway between (0:00, 10) and (2:00, 30)
    assert out[(1, 1)] == 20.0
    # 3:00 sits 2/3 of the way from (2:00, 30) to (3:30, 60) -> 50
    assert abs(out[(1, 3)] - 50.0) < 1e-9
    # user 2's single grid point (0:00) precedes its only obs: no bracket
    assert out[(2, 0)] is None


def test_scd2_history(spark):
    """SCD2: runs of equal attribute values collapse to one version with a
    half-open validity interval; null-safe change detection; deterministic
    equal-timestamp ordering."""
    T = dt.datetime
    rows = [
        # key 1: A(0h), A(1h no-op), B(2h), B(3h no-op), A(4h) -> 3 versions
        (1, T(2024, 1, 1, 0), "A"),
        (1, T(2024, 1, 1, 1), "A"),
        (1, T(2024, 1, 1, 2), "B"),
        (1, T(2024, 1, 1, 3), "B"),
        (1, T(2024, 1, 1, 4), "A"),
        # key 2: null -> null (no-op, null-safe) -> C
        (2, T(2024, 1, 1, 0), None),
        (2, T(2024, 1, 1, 1), None),
        (2, T(2024, 1, 1, 2), "C"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, attr string")
    out = {
        (r.k, r.effective_from): (r.attr, r.effective_to, r.is_current)
        for r in features.scd2_history(df, ["k"], "ts").collect()
    }
    assert len(out) == 5
    assert out[(1, T(2024, 1, 1, 0))] == ("A", T(2024, 1, 1, 2), 0)
    assert out[(1, T(2024, 1, 1, 2))] == ("B", T(2024, 1, 1, 4), 0)
    assert out[(1, T(2024, 1, 1, 4))] == ("A", None, 1)
    assert out[(2, T(2024, 1, 1, 0))] == (None, T(2024, 1, 1, 2), 0)
    assert out[(2, T(2024, 1, 1, 2))] == ("C", None, 1)
    # intervals tile: as-of lookups land in exactly one version
    hist = features.scd2_history(df, ["k"], "ts")
    probe = spark.createDataFrame(
        [(1, T(2024, 1, 1, 2, 30))], "k long, at timestamp"
    )
    got = probe.join(hist, "k").where(
        (F.col("effective_from") <= F.col("at"))
        & (F.col("effective_to").isNull() | (F.col("at") < F.col("effective_to")))
    )
    assert [(r.attr) for r in got.collect()] == ["B"]
    # multiple attrs default + explicit subset
    df2 = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0), "A", 1.0), (1, T(2024, 1, 1, 1), "A", 2.0)],
        "k long, ts timestamp, a string, v double",
    )
    assert features.scd2_history(df2, ["k"], "ts").count() == 2  # v changed
    assert features.scd2_history(df2, ["k"], "ts", attrs=["a"]).count() == 1
    with pytest.raises(ValueError, match="attribute"):
        features.scd2_history(
            df2.select("k", "ts"), ["k"], "ts"
        )
