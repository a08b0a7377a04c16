"""As-of join unit tests on micro-fixtures (FIXTURES.md §A4) — semantics
checked against pandas.merge_asof, the de-facto reference implementation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.operators.asof import asof_join


def make_frames(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, 1),
            ("a", 20, 2),
            ("a", 5, 3),
            ("b", 15, 4),
            ("c", 7, 5),  # key with no right rows at all
        ],
        "k string, ts long, left_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", 8, 100.0),
            ("a", 10, 200.0),  # equal-ts: must match inclusively
            ("a", 18, 300.0),
            ("b", 99, 400.0),  # only AFTER b's left row
        ],
        "k string, ts long, px double",
    )
    return left, right


def test_backward_basic(spark):
    left, right = make_frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts").toPandas()
    got = {r.left_id: r.px for r in out.itertuples()}
    assert got[1] == 200.0  # ts=10 matches right ts=10 (inclusive)
    assert got[2] == 300.0  # ts=20 -> latest right at 18
    assert pd.isna(got[3])  # ts=5 -> nothing at or before
    assert pd.isna(got[4])  # b's only right row is in the future
    assert pd.isna(got[5])  # no right rows for key c
    assert len(out) == 5  # left join: every left row survives


def test_forward(spark):
    left, right = make_frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", direction="forward").toPandas()
    got = {r.left_id: r.px for r in out.itertuples()}
    assert got[1] == 200.0  # inclusive at equal ts
    assert pd.isna(got[2])  # nothing at/after 20 for key a... right has 18 only
    assert got[3] == 100.0  # ts=5 -> next right at 8
    assert got[4] == 400.0


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_tiebreak_greatest_wins(spark, direction):
    """Duplicate (key, ts) right rows: the greatest right_tiebreak value must
    win in BOTH directions (forward regression: desc tie ordering picked the
    smallest)."""
    left = spark.createDataFrame([("a", 10, 1)], "k string, ts long, left_id int")
    right = spark.createDataFrame(
        [
            ("a", 10, 1, 111.0),
            ("a", 10, 3, 333.0),  # greatest seq → must be the match
            ("a", 10, 2, 222.0),
        ],
        "k string, ts long, seq int, px double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", direction=direction, right_tiebreak="seq"
    ).toPandas()
    assert out.px.iloc[0] == 333.0
    assert out.seq.iloc[0] == 3


def test_tolerance(spark):
    left, right = make_frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", tolerance_expr="2"
    ).toPandas()
    got = {r.left_id: r.px for r in out.itertuples()}
    assert got[1] == 200.0  # distance 0 <= 2
    assert got[2] == 300.0  # distance 2 <= 2
    assert pd.isna(got[3])


def test_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof."""
    import numpy as np

    rng = np.random.RandomState(7)
    left_pd = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], 200),
            "ts": rng.randint(0, 1000, 200).astype("int64"),
            "lid": np.arange(200),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], 150),
            "ts": rng.randint(0, 1000, 150).astype("int64"),
            "val": rng.randn(150).round(3),
        }
    ).drop_duplicates(["k", "ts"])

    expected = pd.merge_asof(
        left_pd.sort_values(["ts", "lid"]),
        right_pd.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lid")

    out = (
        asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            on="k",
            left_ts="ts",
        )
        .toPandas()
        .sort_values("lid")
    )
    lhs = out.set_index("lid")["val"]
    rhs = expected.set_index("lid")["val"]
    pd.testing.assert_series_equal(lhs, rhs, check_exact=True)


def test_payload_null_not_backfilled(spark):
    """A null INSIDE the matched right row must stay null — not fall back to
    an older row's value (struct-payload atomicity)."""
    left = spark.createDataFrame([("a", 30, 1)], "k string, ts long, left_id int")
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, None)], "k string, ts long, px double"
    )
    out = asof_join(left, right, on="k", left_ts="ts").toPandas()
    assert pd.isna(out.px.iloc[0])  # matched row (ts=20) has null px
    assert out.ts_right.iloc[0] == 20
