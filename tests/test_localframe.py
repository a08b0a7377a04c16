"""localframe: the Arrow-built local frame must be value- and
type-identical to the RDD construction path it replaces, fall back
cleanly on anything Arrow can't represent, and keep session-timezone
timestamps OFF the Arrow path (naive-datetime interpretation diverges
under a non-UTC session — the driver-robustness mode)."""

import datetime
import decimal

from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from feature_store_ml_spark.localframe import (
    _arrow_local_df,
    _has_session_tz_timestamp,
    local_rows_df,
)


def _rdd_df(spark, rows, schema):
    rdd = spark.sparkContext.parallelize(rows, max(1, min(len(rows), 2)))
    return spark.createDataFrame(rdd, schema)


CASES = [
    (
        [("a", 1, 2.5, True, b"xy"), ("b", None, None, None, None)],
        "s string, l long, d double, b boolean, bin binary",
    ),
    (
        [(datetime.date(2020, 1, 2),), (None,)],
        "dt date",
    ),
    ([(decimal.Decimal("123.4500"),), (None,)], "x decimal(10,4)"),
    ([([1, 2, 3],), ([],), (None,)], "a array<long>"),
    ([{"a": 1, "b": "z"}, {"a": None, "b": None}], "a long, b string"),
]


def test_arrow_path_matches_rdd_path(spark):
    for rows, schema in CASES:
        a = _arrow_local_df(spark, list(rows), schema)
        assert a is not None, f"arrow path refused {schema!r}"
        r = _rdd_df(spark, list(rows), schema)
        assert a.schema == r.schema, schema
        assert sorted(map(tuple, a.collect()), key=str) == sorted(
            map(tuple, r.collect()), key=str
        ), schema


def test_arrow_path_plans_local_table_scan(spark):
    df = _arrow_local_df(spark, [("p", 1)], "s string, n long")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "Scan ExistingRDD" not in plan


def test_empty_frame(spark):
    df = local_rows_df(spark, [], "p string, n long")
    assert df.collect() == []
    assert [f.name for f in df.schema.fields] == ["p", "n"]


def test_session_tz_timestamp_stays_off_arrow(spark):
    st = StructType([StructField("ts", TimestampType())])
    assert _has_session_tz_timestamp(st)
    assert _has_session_tz_timestamp(
        StructType([StructField("a", ArrayType(TimestampType()))])
    )
    assert not _has_session_tz_timestamp(
        StructType([StructField("s", StringType()), StructField("n", LongType())])
    )
    # the public entry still produces a correct frame via the RDD path
    # (order-insensitive: collect() order is not contractual)
    rows = [(datetime.datetime(2021, 3, 4, 5, 6, 7),), (None,)]
    df = local_rows_df(spark, rows, "ts timestamp")
    got = sorted((r[0] for r in df.collect()), key=str)
    assert got == sorted(
        [datetime.datetime(2021, 3, 4, 5, 6, 7), None], key=str
    )


def test_non_nullable_schema_stays_off_arrow(spark):
    # pa.array would silently accept None for a nullable=False field; the
    # RDD path's verifySchema rejects it — so such schemas must refuse
    # the Arrow path to keep the two constructions behavior-identical
    st = StructType([StructField("s", StringType(), nullable=False)])
    assert _arrow_local_df(spark, [("a",)], st) is None
    nested = StructType(
        [
            StructField(
                "a", ArrayType(LongType(), containsNull=False), nullable=True
            )
        ]
    )
    assert _arrow_local_df(spark, [([1, 2],)], nested) is None
    # and the public entry still evaluates correctly via the RDD path
    df = local_rows_df(spark, [("a",), ("b",)], st)
    assert sorted(r[0] for r in df.collect()) == ["a", "b"]


def test_value_mismatch_falls_back_or_raises_consistently(spark):
    # a row narrower than the schema must not silently misalign
    df = local_rows_df(spark, [("only",)], "s string, n long", slices=1)
    # RDD fallback path raises at evaluation (schema/value arity mismatch)
    import pytest as _pytest

    with _pytest.raises(Exception):
        df.collect()
