"""MLlib feature-transformer surface — the "feature transformers" half of
the driver north star (BASELINE.json:6 "DataFrame ETL + MLlib feature
transformers").

The reference's only feature engineering is naming columns
(/root/reference/src/data_generation.py:6); this module supplies the real
feature-store transformer stack on MLlib Pipelines: StringIndexer (category
→ index), StandardScaler (z-score), Bucketizer (explicit bins),
QuantileDiscretizer (quantile bins). All fit/transform steps are
distributed; fitted pipelines persist via MLlib's native writer (same
mechanism as the model sink, SURVEY.md §1.4).

``customer_features`` returns PLAIN columns (vector outputs unpacked via
vector_to_array) so results are directly comparable to the SQL twin the
oracle checks (queries.py::e15_feature_transformers).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    Bucketizer,
    QuantileDiscretizer,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACCTBAL_SPLITS = [float("-inf"), 0.0, 2500.0, 5000.0, 7500.0, float("inf")]


def build_customer_pipeline() -> Pipeline:
    return Pipeline(
        stages=[
            StringIndexer(
                inputCol="c_mktsegment",
                outputCol="segment_idx",
                stringOrderType="frequencyDesc",
            ),
            VectorAssembler(inputCols=["c_acctbal"], outputCol="_acctbal_vec"),
            StandardScaler(
                inputCol="_acctbal_vec",
                outputCol="_acctbal_scaled_vec",
                withMean=True,
                withStd=True,
            ),
            Bucketizer(
                splits=ACCTBAL_SPLITS,
                inputCol="c_acctbal",
                outputCol="acctbal_bucket",
            ),
            QuantileDiscretizer(
                numBuckets=4, inputCol="c_acctbal", outputCol="acctbal_quartile",
                relativeError=0.0,
            ),
        ]
    )


def customer_features(customer: DataFrame) -> tuple[PipelineModel, DataFrame]:
    """Fit + transform the customer feature pipeline; unpack vectors to
    plain columns."""
    model = build_customer_pipeline().fit(customer)
    out = model.transform(customer).select(
        "c_custkey",
        F.col("segment_idx").cast("int").alias("segment_idx"),
        # round 4, not 6: MLlib's fit computes mean/std with float partial
        # aggregation (partition-order dependent in the last ulps); a wider
        # rounding margin keeps the z-scores partition-invariant
        F.round(vector_to_array("_acctbal_scaled_vec")[0], 4).alias("acctbal_scaled"),
        F.col("acctbal_bucket").cast("int").alias("acctbal_bucket"),
        F.col("acctbal_quartile").cast("int").alias("acctbal_quartile"),
    )
    return model, out
