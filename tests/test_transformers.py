"""MLlib feature-transformer pipeline tests."""

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.io import load_table
from feature_store_ml_spark.ml import transformers


def test_customer_features(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    model, feats = transformers.customer_features(c)
    out = feats.toPandas()
    assert len(out) == c.count()
    # indexer: dense 0..4 (5 segments), 0 = most frequent
    assert set(out.segment_idx) == {0, 1, 2, 3, 4}
    # scaler: z-scores mean ~0, std ~1
    assert abs(out.acctbal_scaled.mean()) < 0.01
    assert abs(out.acctbal_scaled.std() - 1.0) < 0.01
    # bucketizer respects split points
    bal = c.toPandas().set_index("c_custkey").c_acctbal
    sample = out.set_index("c_custkey").head(50)
    for ck, row in sample.iterrows():
        b = bal[ck]
        expected = 0 if b < 0 else 1 if b < 2500 else 2 if b < 5000 else 3 if b < 7500 else 4
        assert row.acctbal_bucket == expected
    # quantile discretizer: 4 roughly equal bins
    sizes = out.groupby("acctbal_quartile").size()
    assert len(sizes) == 4
    assert sizes.min() > 0.15 * len(out)


def test_pipeline_persistence_roundtrip(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer")
    model, feats = transformers.customer_features(c)
    path = str(tmp_path / "pipeline_model")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(path)
    again = reloaded.transform(c).count()
    assert again == c.count()
