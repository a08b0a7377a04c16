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


_STEP_UNIT_SECONDS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800
}


def _step_micros(step: str) -> int:
    """Parse a fixed-length step ('1 hour', '90 minutes', '1 day') to µs.
    Variable-length units (month, year) are rejected: an epoch-aligned grid
    needs a constant step."""
    parts = step.strip().lower().split()
    n, unit = (1, parts[0]) if len(parts) == 1 else (int(parts[0]), parts[1])
    unit = unit.rstrip("s")
    if unit not in _STEP_UNIT_SECONDS:
        raise ValueError(
            f"resample step {step!r}: unit must be one of {sorted(_STEP_UNIT_SECONDS)}"
        )
    return n * _STEP_UNIT_SECONDS[unit] * 1_000_000


def resample_grid(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-key regular time grid spanning each key's observed range:
    (keys..., grid_ts). Built with sequence()+explode — one row per grid
    point, generated distributed (no driver-side date math).

    Grid points are EPOCH-ALIGNED: each is an exact multiple of ``step``
    since 1970-01-01, with the per-key start = the largest such multiple ≤
    the key's min(ts). Anchoring to the observed min instead (previous
    formulation) makes every grid point a function of whichever row happens
    to arrive first — prepending one earlier observation in a backfill
    shifts the entire grid and invalidates previously-materialized feature
    rows. Epoch alignment keeps existing grid points fixed under any data
    arrival order; new data only ever extends the grid."""
    step_us = _step_micros(step)
    dt = df.schema[ts_col].dataType.simpleString()
    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_min"), F.max(ts_col).alias("_hi")
    )
    # floor(_min to an epoch multiple of step), in pure wall-clock µs
    # arithmetic (timestampdiff/timestampadd) — no session-timezone pass.
    bounds = bounds.withColumn(
        "_lo",
        F.expr(
            f"timestampadd(MICROSECOND, "
            f"-(timestampdiff(MICROSECOND, cast('1970-01-01' as {dt}), _min) % {step_us}), "
            f"_min)"
        ),
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
        ).alias("grid_ts"),
    )


def resample_ffill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    cols: list[str],
    step: str = "1 hour",
) -> DataFrame:
    """Resample irregular observations onto a regular grid, carrying the
    last observation at-or-before each grid point forward (the feature-store
    serving semantic: 'value as of HH:00'). Implementation: union grid rows
    with observations, one per-key window sort, last(ignorenulls) over the
    preceding frame, keep grid rows — ONE shuffle on the key, no
    range-join blow-up (same union-window trick as the as-of join,
    operators/asof.py)."""
    grid = resample_grid(df, keys, ts_col, step)
    g = grid.select(
        *keys,
        F.col("grid_ts").alias(ts_col),
        F.lit(1).alias("_is_grid"),
        *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in cols],
    )
    obs = df.select(
        *keys, ts_col, F.lit(0).alias("_is_grid"), *cols
    )
    # observations sort BEFORE the grid row at equal ts (_is_grid ascending
    # puts obs first => last() at a grid point sees a same-instant obs)
    unioned = obs.unionByName(g)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("_is_grid"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *keys,
        F.col(ts_col),
        F.col("_is_grid"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in cols],
    )
    return filled.where(F.col("_is_grid") == 1).drop("_is_grid").withColumnRenamed(
        ts_col, "grid_ts"
    )


def resample_interpolate(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    cols: list[str],
    step: str = "1 hour",
) -> DataFrame:
    """LINEAR interpolation onto the epoch-aligned grid: each grid value
    is prev + (next - prev) * elapsed-fraction between the two bracketing
    observations (per key, per column). A same-instant observation wins
    verbatim (fraction 0); grid points missing a bracket on either side
    stay NULL — interpolation, never extrapolation. Column types promote
    to double.

    Same single-shuffle union-window shape as resample_ffill (no range
    join): the bracketing pass is two window projections —
    last/first(ignorenulls) over the preceding/following frames — all
    JVM-side. The following frame never sees a same-instant observation
    (observations sort before grid rows at equal ts), so the next-ts is
    strictly greater and the fraction's denominator cannot be zero."""
    grid = resample_grid(df, keys, ts_col, step)
    g = grid.select(
        *keys,
        F.col("grid_ts").alias(ts_col),
        F.lit(1).alias("_is_grid"),
        *[F.lit(None).cast("double").alias(c) for c in cols],
    )
    obs = df.select(
        *keys,
        ts_col,
        F.lit(0).alias("_is_grid"),
        *[F.col(c).cast("double").alias(c) for c in cols],
    )
    unioned = obs.unionByName(g)
    order = [F.col(ts_col), F.col("_is_grid")]
    wp = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # wall-clock µs since epoch via timestampdiff — works for timestamp
    # AND timestamp_ntz (unix_micros rejects ntz), no session-tz pass
    dtname = df.schema[ts_col].dataType.simpleString()
    t_us = F.expr(
        f"timestampdiff(MICROSECOND, cast('1970-01-01' as {dtname}), {ts_col})"
    )
    sel = [*keys, F.col(ts_col), F.col("_is_grid")]
    for c in cols:
        pv = F.last(c, ignorenulls=True).over(wp)
        pt = F.last(
            F.when(F.col(c).isNotNull(), t_us), ignorenulls=True
        ).over(wp)
        nv = F.first(c, ignorenulls=True).over(wf)
        nt = F.first(
            F.when(F.col(c).isNotNull(), t_us), ignorenulls=True
        ).over(wf)
        frac = (t_us - pt).cast("double") / (nt - pt).cast("double")
        sel.append(
            F.when(pt == t_us, pv)
            .when(pv.isNotNull() & nv.isNotNull(), pv + (nv - pv) * frac)
            .alias(c)
        )
    return (
        unioned.select(*sel)
        .where(F.col("_is_grid") == 1)
        .drop("_is_grid")
        .withColumnRenamed(ts_col, "grid_ts")
    )


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    attrs: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a keyed, timestamped
    change feed — the WRITE-side twin of point_in_time_join: one output
    row per (key, version) with a half-open [effective_from, effective_to)
    validity interval and an is_current flag (effective_to null). The
    reference's feature table is a single static snapshot
    (/root/reference/src/main.py:15); SCD2 is what a dimension becomes
    when every change must stay joinable as-of any training timestamp.

    Semantics:
    - consecutive rows whose ``attrs`` are IDENTICAL (null-safe) collapse —
      a no-op change never opens a new version;
    - ``attrs`` defaults to every non-key, non-timestamp column;
    - rows are ordered by (ts, *attrs) within each key, so equal-timestamp
      rows resolve DETERMINISTICALLY (and exact duplicates collapse);
    - is_current is emitted as 0/1 long (engine-portable hashing).

    Scale shape: exactly ONE shuffle on ``keys`` — the change-detection
    lag, the version filter, and the effective_to lead all run over the
    same partitioning (Catalyst reuses the exchange; the filter between
    the two window passes never re-partitions). State per key is the
    version chain, never the raw feed."""
    from functools import reduce

    if not keys:
        raise ValueError("scd2_history: at least one key column required")
    attrs = attrs or [c for c in changes.columns if c not in (*keys, ts_col)]
    if not attrs:
        raise ValueError("scd2_history: no attribute columns to track")
    order = [F.col(ts_col).asc(), *[F.col(a).asc() for a in attrs]]
    w = Window.partitionBy(*keys).orderBy(*order)
    opens = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in attrs],
    ) | F.lag(ts_col).over(w).isNull()
    w2 = Window.partitionBy(*keys).orderBy(
        F.col("effective_from").asc(), *[F.col(a).asc() for a in attrs]
    )
    return (
        changes.select(*keys, ts_col, *attrs)
        .withColumn("_open", opens)
        .where(F.col("_open"))
        .drop("_open")
        .withColumnRenamed(ts_col, "effective_from")
        .withColumn("effective_to", F.lead("effective_from").over(w2))
        .withColumn(
            "is_current",
            F.when(F.col("effective_to").isNull(), 1).otherwise(0).cast("long"),
        )
    )
