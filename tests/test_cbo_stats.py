"""CBO statistics: external-table registration, ANALYZE, and the resulting
optimizer behavior (stats-driven broadcast without an explicit hint)."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark import plans


@pytest.fixture(scope="module")
def cbo_tables(spark, sf_dir):
    names = plans.register_external_tables(
        spark, sf_dir, ["nation", "region", "customer", "orders"]
    )
    plans.analyze_tables(
        spark,
        names,
        columns={
            "cbo.orders": ["o_custkey"],
            "cbo.customer": ["c_custkey", "c_nationkey"],
        },
    )
    plans.enable_cbo(spark)
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_stats_recorded(spark, cbo_tables):
    st = plans.table_stats(spark, "cbo.orders")
    assert "statistics" in st
    assert "rows" in st["statistics"]  # e.g. "424999 bytes, 15000 rows"


def test_stats_drive_broadcast_without_hint(spark, cbo_tables):
    # no broadcast() hint anywhere: the analyzed rowCount/sizeInBytes of
    # nation (25 rows) must put it under the broadcast threshold
    df = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n
        FROM cbo.orders JOIN cbo.customer ON o_custkey = c_custkey
                    JOIN cbo.nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_column_stats_present(spark, cbo_tables):
    rows = spark.sql("DESCRIBE EXTENDED cbo.customer c_custkey").collect()
    kv = {r.info_name: r.info_value for r in rows}
    assert kv.get("distinct_count") not in (None, "NULL")


def test_with_metrics_single_scan(spark, sf_dir):
    """Observation metrics ride the caller's action: one job, one scan,
    metrics ready afterwards."""
    from pyspark.sql import functions as F
    from feature_store_ml_spark.io import load_table
    from feature_store_ml_spark import plans

    li = load_table(spark, sf_dir, "lineitem")
    df, obs = plans.with_metrics(
        li,
        "ingest",
        F.count("*").alias("rows_in"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("high_discount"),
        F.min("l_shipdate").alias("first_ship"),
    )
    out = df.where(F.col("l_quantity") > 10).groupBy("l_returnflag").count().collect()
    assert len(out) > 0
    m = obs.get
    assert m["rows_in"] == li.count()
    assert 0 < m["high_discount"] < m["rows_in"]
    assert m["first_ship"] is not None
