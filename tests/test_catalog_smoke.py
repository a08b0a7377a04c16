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
