"""Reference-parity ML pipeline (SURVEY.md §2A R1–R14), Spark-native.

Mirrors the reference's dataflow end to end —
synthetic source (/root/reference/src/data_generation.py:5-7)
→ feature-store write (/root/reference/src/main.py:14-15)
→ split + RandomForest + metrics (/root/reference/src/model_training.py:5-14)
→ model / predictions / run-info sinks (/root/reference/src/model_saving.py:5-14)
— with each step on its idiomatic Spark primitive: seeded distributed
generator instead of sklearn's make_classification, parquet feature store
instead of CSV, ``randomSplit`` instead of train_test_split, MLlib
RandomForestClassifier instead of sklearn's, and SQL-expressible metrics
(accuracy as avg(pred==label); per-class report from a confusion groupBy).

Scale: the generator is ``spark.range(n)`` + seeded ``randn`` — rows are
synthesized on executors, so n can be 10^12 without driver involvement.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.ml.classification import RandomForestClassificationModel, RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import N_FEATURES

FEATURE_COLS = [f"feature_{i}" for i in range(N_FEATURES)]


def generate_features(
    spark: SparkSession, n_rows: int = 100, n_features: int = N_FEATURES, seed: int = 42
) -> DataFrame:
    """Distributed synthetic classification dataset (R1–R3 analog).

    Informative structure like make_classification's: features 0/1 are
    class-separated gaussians, features 2..11 are seeded noise, 12..19 are
    redundant linear combos. The label comes first (seeded bernoulli), the
    informative features are conditioned on it — so a classifier can learn
    it (reference records accuracy 1.0 on its version;
    /root/reference/model_runs/run_info.json:1).
    """
    df = spark.range(n_rows).withColumn(
        "target", (F.rand(seed) > 0.5).cast("int")
    )
    center = F.when(F.col("target") == 1, 2.0).otherwise(-2.0)
    df = df.withColumn("feature_0", F.randn(seed + 100) + center)
    df = df.withColumn("feature_1", F.randn(seed + 101) - center)
    for i in range(2, n_features - 8):
        df = df.withColumn(f"feature_{i}", F.randn(seed + 100 + i))
    for j, i in enumerate(range(n_features - 8, n_features)):
        df = df.withColumn(
            f"feature_{i}",
            0.5 * F.col(f"feature_{j % 2}") + 0.5 * F.col(f"feature_{j + 2}"),
        )
    return df.select(*FEATURE_COLS, "target")


def _drop_training_summary(model) -> bool:
    """Detach the JVM-side training summary from a fitted MLlib model.

    We never read the summary (metrics are recomputed SQL-side below), but it
    pins ``predictions.sparkSession`` into the model object, and the model is
    captured whole in the prediction UDF's task closure. Classic
    ``SparkSession.observationManager`` is a LAZY val of a non-serializable
    class: it stays null (and harmless) until the first ``Dataset.observe``
    in the session initializes it, after which serializing the session —
    i.e. running ``model.transform(...)`` on a summary-bearing model — throws
    ``NotSerializableException: ObservationManager``. Dropping the unused
    summary removes the session from the closure graph entirely, so the
    pipeline is immune to Observation use anywhere else in the session.

    The Scala member is ``private[classification] var trainingSummary`` —
    package-private, which is public in bytecode, so the generated
    ``trainingSummary_$eq`` setter is reachable from py4j. Best-effort: on a
    Spark build where the member moved, we keep the summary (only costs
    compatibility with sessions that used observe) — but WARN, because the
    observation-poisoning bug silently returns with it; returns whether the
    detach happened so tests can pin it on the current Spark build.
    """
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm
        scala_none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        getattr(model._java_obj, "trainingSummary_$eq")(scala_none)
        return True
    except Exception as exc:
        import warnings

        warnings.warn(
            "trainingSummary detach failed "
            f"({type(exc).__name__}: {exc}); model.transform will raise "
            "NotSerializableException in sessions that used Dataset.observe",
            RuntimeWarning,
            stacklevel=2,
        )
        return False


def train_and_evaluate(
    features: DataFrame, seed: int = 42, num_trees: int = 100
) -> tuple[RandomForestClassificationModel, DataFrame, float, DataFrame]:
    """R7–R11: split, fit, predict, metrics.

    Returns (model, scored_test_df, accuracy, per_class_report_df).
    Spark's randomSplit is per-row Bernoulli (not exact-count like sklearn's
    train_test_split — SURVEY.md §7 risk register), so tests assert
    fractions/determinism, not membership.
    """
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features")
    train, test = features.randomSplit([0.8, 0.2], seed=seed)
    rf = RandomForestClassifier(
        labelCol="target", featuresCol="features", numTrees=num_trees, seed=seed
    )
    model = rf.fit(assembler.transform(train))
    _drop_training_summary(model)
    scored = model.transform(assembler.transform(test))
    accuracy = (
        scored.select(
            F.avg((F.col("prediction") == F.col("target")).cast("int")).alias("acc")
        ).first()["acc"]
    )
    report = classification_report(scored)
    return model, scored, float(accuracy), report


def classification_report(scored: DataFrame, label_col: str = "target") -> DataFrame:
    """R11: per-class precision/recall/F1/support from confusion counts —
    one groupBy, SQL-expressible (oracle-checkable given a predictions
    table)."""
    pred = F.col("prediction").cast("int")
    cm = scored.groupBy(pred.alias("class")).agg(
        F.count("*").alias("predicted_n"),
        F.sum((F.col(label_col) == pred).cast("int")).alias("tp"),
    )
    actual = scored.groupBy(F.col(label_col).alias("class")).agg(
        F.count("*").alias("support")
    )
    rep = (
        cm.join(actual, "class", "full")
        .fillna(0, subset=["predicted_n", "tp", "support"])
        .select(
            "class",
            F.when(F.col("predicted_n") > 0, F.col("tp") / F.col("predicted_n"))
            .otherwise(0.0)
            .alias("precision"),
            F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
            .otherwise(0.0)
            .alias("recall"),
            "support",
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(0.0),
        )
    )
    return rep


@dataclass
class RunPaths:
    root: str

    @property
    def feature_store(self) -> str:
        return os.path.join(self.root, "feature_store", "features.parquet")

    @property
    def model(self) -> str:
        return os.path.join(self.root, "model_runs", "random_forest")

    @property
    def predictions(self) -> str:
        return os.path.join(self.root, "model_runs", "predictions.parquet")

    @property
    def performance_metrics(self) -> str:
        return os.path.join(self.root, "model_runs", "performance_metrics.parquet")

    @property
    def run_info(self) -> str:
        return os.path.join(self.root, "model_runs", "run_info.json")


def run_pipeline(spark: SparkSession, out_root: str, n_rows: int = 100, seed: int = 42) -> dict:
    """R18: the full orchestrated pipeline (reference main(),
    /root/reference/src/main.py:7-45), returning the run-info record."""
    paths = RunPaths(out_root)
    features = generate_features(spark, n_rows=n_rows, seed=seed)
    features.write.mode("overwrite").parquet(paths.feature_store)

    features = spark.read.parquet(paths.feature_store)
    model, scored, accuracy, report = train_and_evaluate(features, seed=seed)

    model.write().overwrite().save(paths.model)
    scored.select(
        F.col("target").alias("Actual"),
        F.col("prediction").cast("int").alias("Predicted"),
    ).write.mode("overwrite").parquet(paths.predictions)
    # R11 sink: the classification report (reference writes it into
    # performance_metrics; /root/reference/src/main.py:31-38 records the path)
    report.write.mode("overwrite").parquet(paths.performance_metrics)

    run_info = {
        "model_type": "RandomForestClassifier",
        "model_path": paths.model,
        "feature_store_path": paths.feature_store,
        "accuracy": accuracy,
        "predictions_path": paths.predictions,
        "performance_metrics_path": paths.performance_metrics,
    }
    os.makedirs(os.path.dirname(paths.run_info), exist_ok=True)
    with open(paths.run_info, "w") as f:
        json.dump(run_info, f)
    return run_info
