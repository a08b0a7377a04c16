"""Catalog smoke: every registered query runs at sf0.001 with a stable,
non-degenerate result. (Value correctness is the DuckDB oracle gate's job —
tools/check_oracle.py; this guards against runtime regressions at the
contract surface.)"""

import pytest

from feature_store_ml_spark import queries as catalog

ALL = sorted(catalog.queries())
# model-fitting queries are slow; keep one representative
SLOW_ML = {"r10_accuracy", "r11_class_report"}


@pytest.mark.parametrize("name", [n for n in ALL if n not in SLOW_ML])
def test_query_runs(spark, sf_dir, name):
    df = catalog.queries()[name](spark, sf_dir)
    rows = df.limit(20000).collect()
    assert len(df.columns) > 0
    assert len(rows) > 0, f"{name} returned no rows at sf0.001"


def test_ml_query_runs(spark, sf_dir):
    df = catalog.queries()["r10_accuracy"](spark, sf_dir)
    row = df.first()
    assert 0.0 <= row.accuracy <= 1.0


def test_oracle_keys_subset(spark):
    assert set(catalog.oracle_sql()) <= set(catalog.queries())


def test_property_rank_bounds(spark, sf_dir):
    """SURVEY §5.4: window rank within [1, k]."""
    out = catalog.queries()["e6_topk_per_group"](spark, sf_dir).toPandas()
    assert out.rn.between(1, 5).all()
    assert (out.groupby("c_nationkey").rn.max() <= 5).all()


def test_property_dedup_subset(spark, sf_dir):
    """Dedup output ids are a subset of input ids; fingerprints unique."""
    out = catalog.queries()["e9_dedup_exact"](spark, sf_dir).toPandas()
    assert out.fingerprint.is_unique
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    assert set(out.doc_id) <= set(src.doc_id)


def test_sql_over_tables_cross_format(spark, tmp_path):
    """One SQL statement spanning a Delta view, an Iceberg view, and bare
    parquet — each resolved through the format sniffer."""
    from feature_store_ml_spark.io import iceberg, lakehouse, sources
    from pyspark.sql import functions as F

    droot, iroot, proot = (
        str(tmp_path / "d"), str(tmp_path / "i"), str(tmp_path / "p")
    )
    lakehouse.write_delta(
        spark, spark.range(10).select("id", (F.col("id") % 3).alias("k")), droot
    )
    lakehouse.delete_delta(spark, droot, "id = 9")
    iceberg.write_iceberg(
        spark,
        spark.range(3).select(
            F.col("id").alias("k"), F.concat(F.lit("g"), F.col("id")).alias("name")
        ),
        iroot, format_version=2,
    )
    spark.range(10).select("id", (F.col("id") * 2).alias("w")).write.parquet(proot)
    out = sources.sql_over_tables(
        spark,
        {"d": droot, "i": iroot, "p": proot},
        """
        SELECT i.name, COUNT(*) AS n, SUM(p.w) AS sw
        FROM d JOIN i ON d.k = i.k JOIN p ON p.id = d.id
        GROUP BY i.name
        """,
    )
    got = {r.name: (r.n, r.sw) for r in out.collect()}
    # k=0 ids are 0,3,6,9; id 9 (w=18) was DV-deleted from the delta side
    assert got == {"g0": (3, 0 + 6 + 12), "g1": (3, 2 + 8 + 14), "g2": (3, 4 + 10 + 16)}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no tables"):
        sources.sql_over_tables(spark, {}, "SELECT 1")
