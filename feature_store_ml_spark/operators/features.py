"""Feature-store operators — SURVEY.md §2B E12.

This is the 'feature store' in the engine's name, generalizing the
reference's static feature table (/root/reference/feature_store/features.csv,
written at /root/reference/src/main.py:15) into time-correct, continuously
computable features over an event stream:

- tumbling/hopping window features  (F.window — streaming-compatible exprs)
- rolling (trailing range) features (Window.rangeBetween)
- point-in-time-correct feature join (as-of; no label leakage)
- forward-fill backfill              (last ignorenulls over time window)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_join


def tumbling_features(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Per (key, tumbling window) aggregate features. The same expression
    runs under Structured Streaming with a watermark (streaming/events.py) —
    batch/stream parity by construction."""
    keys = keys or ["event_type"]
    return (
        events.groupBy(F.window(ts_col, window_len).alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal accumulation: a double sum is partition-order
            # dependent, so results would vary with parallelism (and drift
            # from the streaming twin, which also sums decimal)
            F.sum(F.col(value_col).cast("decimal(30,8)")).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def rolling_features(
    events: DataFrame,
    trailing_seconds: int = 3600,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Trailing-window features per event: aggregates over the key's events
    in (ts - trailing, ts]. One shuffle on the key; rangeBetween over the
    epoch-cast timestamp."""
    sec = F.col(ts_col).cast("timestamp").cast("double")
    w = (
        Window.partitionBy(key_col)
        .orderBy(sec)
        .rangeBetween(-trailing_seconds, 0)
    )
    return events.select(
        "*",
        F.count("*").over(w).alias("n_trailing"),
        F.sum(value_col).over(w).alias("sum_trailing"),
        F.avg(value_col).over(w).alias("avg_trailing"),
    )


def point_in_time_join(
    labels: DataFrame,
    features: DataFrame,
    keys: list[str],
    label_ts: str,
    feature_ts: str,
    tolerance_expr: str | None = None,
) -> DataFrame:
    """Point-in-time-correct enrichment: each label row gets the latest
    feature row at-or-before its timestamp — never a future value (no label
    leakage). This is THE feature-store serving-prep primitive."""
    return asof_join(
        labels,
        features,
        on=keys,
        left_ts=label_ts,
        right_ts=feature_ts,
        direction="backward",
        tolerance_expr=tolerance_expr,
    )


def forward_fill(
    df: DataFrame, keys: list[str], ts_col: str, cols: list[str]
) -> DataFrame:
    """Backfill: carry the last non-null observation forward per key."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
