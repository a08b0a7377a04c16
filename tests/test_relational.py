"""Bucketed co-located joins and salted skew joins."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import load_table
from feature_store_ml_spark.operators import relational


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    relational.write_bucketed(li, "li_b", "l_orderkey", 8)
    relational.write_bucketed(o, "o_b", "o_orderkey", 8)
    j = spark.table("li_b").join(
        spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    # disable broadcast so the bucketing (not a broadcast) avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffles
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_q11_reuses_exchange(spark, sf_dir):
    """q11's per-part aggregate and grand total must share ONE lineitem
    scan+shuffle: AQE dedups the identical aggregate subtree via exchange
    reuse at runtime. If this regresses the fact table is scanned twice."""
    from feature_store_ml_spark import queries as Q

    df = Q.queries()["q11_important_parts"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """With bloom-filter pruning enabled and a selective filter on the
    orders side of a shuffle join, the lineitem side must gain a
    might_contain(bloom) predicate BELOW the join — rows that cannot join
    die at the scan instead of crossing the shuffle."""
    from feature_store_ml_spark.io import load_table

    relational.enable_runtime_bloom_filters(
        spark, application_side_scan_threshold="0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:800]
        assert "bloom_filter_agg" in plan
        # and the result is identical to the unfiltered-planner join
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's first line of defense against join skew is AQE's
    runtime skew split (salting is the fallback for skew beyond it): with
    a 90%-one-key fact table, the executed sort-merge join must carry the
    skew=true marker, i.e. the hot partition was subdivided at runtime.
    Thresholds are lowered so local-scale data exhibits the behavior."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "10KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = fact.join(dim, "k")
        # collect() (not count()) so THIS df's own AQE execution finalizes
        assert len(j.collect()) == 200_000
        plan = (
            j._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert "skew=true" in plan, plan[:600]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_matches_plain_join(spark):
    # skewed fact: 90% of rows share key 1
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("rowid"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("payload"))
    plain = fact.join(dim, "k").select("rowid", "payload")
    salted = relational.salted_join(fact, dim, "k").select("rowid", "payload")
    a = sorted(plain.collect(), key=lambda r: r.rowid)
    b = sorted(salted.collect(), key=lambda r: r.rowid)
    assert a == b
