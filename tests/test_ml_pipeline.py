"""Reference-parity pipeline tests (SURVEY.md §5.2): determinism by seed,
metric sanity vs the reference's recorded accuracy=1.0, sink round-trips."""

import json
import os

import pytest
from pyspark.sql import functions as F

from feature_store_ml_spark.ml import pipeline, profile


def test_generator_deterministic(spark):
    a = pipeline.generate_features(spark, 200, seed=42).toPandas()
    b = pipeline.generate_features(spark, 200, seed=42).toPandas()
    assert a.equals(b)
    c = pipeline.generate_features(spark, 200, seed=7).toPandas()
    assert not a.equals(c)


def test_generator_shape(spark):
    df = pipeline.generate_features(spark, 100)
    assert len(df.columns) == 21  # 20 features + target, like the reference
    assert df.count() == 100
    assert set(r.target for r in df.select("target").distinct().collect()) == {0, 1}


def test_train_accuracy_high(spark):
    """Reference records accuracy 1.0 on its 100-row set
    (/root/reference/model_runs/run_info.json:1); our separated-gaussian
    generator should be nearly as easy."""
    feats = pipeline.generate_features(spark, 500, seed=42)
    _, scored, acc, report = pipeline.train_and_evaluate(feats, seed=42)
    assert acc >= 0.9
    rep = report.toPandas().set_index("class")
    assert set(rep.index) == {0, 1}
    assert (rep[["precision", "recall", "f1"]] >= 0.8).all().all()
    assert rep.support.sum() == scored.count()


def test_training_summary_detach_succeeds_on_this_spark(spark):
    """The observation-poisoning immunity (ml/pipeline.py::
    _drop_training_summary) depends on the package-private
    ``trainingSummary_$eq`` setter existing in this Spark build. The detach
    is best-effort-with-warning at runtime; HERE it must actually succeed —
    if Spark renames the member, this test (not a prod serialization crash)
    is the signal."""
    import warnings

    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    feats = pipeline.generate_features(spark, 50, seed=1)
    assembled = VectorAssembler(
        inputCols=pipeline.FEATURE_COLS, outputCol="features"
    ).transform(feats)
    model = RandomForestClassifier(
        labelCol="target", featuresCol="features", numTrees=2, seed=1
    ).fit(assembled)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any detach warning -> failure
        assert pipeline._drop_training_summary(model) is True
    assert not model.hasSummary


def test_split_fractions(spark):
    feats = pipeline.generate_features(spark, 2000, seed=42)
    train, test = feats.randomSplit([0.8, 0.2], seed=42)
    frac = test.count() / 2000
    assert 0.15 < frac < 0.25


def test_full_pipeline_sinks(spark, tmp_path):
    info = pipeline.run_pipeline(spark, str(tmp_path), n_rows=200, seed=42)
    assert os.path.exists(info["feature_store_path"])
    assert os.path.exists(info["model_path"])
    preds = spark.read.parquet(info["predictions_path"])
    assert preds.columns == ["Actual", "Predicted"]
    assert preds.count() > 0
    with open(os.path.join(str(tmp_path), "model_runs", "run_info.json")) as f:
        assert json.load(f)["accuracy"] == info["accuracy"]


def test_histogram_counts(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("x"))
    out = profile.histogram(df, "x", nbins=10).toPandas().sort_values("bin")
    assert list(out.n) == [10] * 10
    assert out.bin_lo.iloc[0] == 0.0 and out.bin_hi.iloc[-1] == 99.0


def test_histogram_empty_and_all_null_input(spark):
    """Empty / all-null columns must return an empty histogram frame, not
    TypeError on the undefined (NULL) min/max bounds."""
    empty = spark.createDataFrame([], "x double")
    nulls = spark.createDataFrame([(None,), (None,)], "x double")
    for df in (empty, nulls):
        h = profile.histogram(df, "x")
        assert h.count() == 0
        assert h.columns == ["bin", "bin_lo", "bin_hi", "n"]
        k = profile.histogram_kde(df, "x")
        assert k.count() == 0
        assert k.columns == ["bin", "bin_lo", "bin_hi", "n", "density"]


def test_correlation_identity_and_sign(spark):
    df = spark.range(50).select(
        F.col("id").cast("double").alias("a"),
        (-F.col("id").cast("double")).alias("b"),
    )
    out = profile.correlation_matrix(df, ["a", "b"]).toPandas()
    got = {(r.col_a, r.col_b): r.corr for r in out.itertuples()}
    assert got[("a", "a")] == 1.0
    assert got[("a", "b")] == -1.0


def test_summary_stats(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    row = profile.summary_stats(df, ["x"]).first()
    assert row.n == 10 and row.min == 0.0 and row.max == 9.0 and row.mean == 4.5
