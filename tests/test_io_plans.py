"""IO round-trips and physical-plan shape assertions (the 'did Catalyst do
what the design assumes' checks: pushdown, pruning, broadcast)."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark import queries as catalog
from feature_store_ml_spark.io import sources
from feature_store_ml_spark import schemas


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("bucket"), F.rand(1).alias("v")
    )
    sources.write_parquet(df, str(tmp_path / "t"), partition_by=["bucket"])
    back = spark.read.parquet(str(tmp_path / "t"))
    assert back.count() == 100
    # partition pruning: scanning one bucket must only list that directory
    plan = back.where(F.col("bucket") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double")
    sources.write_csv(df, str(tmp_path / "c"))
    back = sources.read_csv(
        spark, str(tmp_path / "c"), "id long, s string, v double"
    )
    key = lambda r: r.id
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, arr array<double>")
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    back = sources.read_json(spark, str(tmp_path / "j"), "id long, arr array<double>")
    assert back.first().arr == [1.0, 2.0]


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = catalog.queries()["e2_filter_project"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan


def test_column_pruning(spark, sf_dir):
    df = catalog.queries()["e2_filter_project"](spark, sf_dir)
    plan = _plan(df)
    # ReadSchema must not include unprojected, unfiltered columns
    assert "l_tax" not in plan.split("ReadSchema")[1][:400]


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = catalog.queries()["e3_join_broadcast"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_topk_uses_take_ordered(spark, sf_dir):
    df = catalog.queries()["e6_topk"](spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)


def test_schema_contract_all_tables(spark, sf_dir):
    for name in schemas.TABLES:
        df = sources.load_table(spark, sf_dir, name)
        assert df.columns == [f.name for f in schemas.TABLES[name]]
