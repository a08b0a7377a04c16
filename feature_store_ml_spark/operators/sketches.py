"""Mergeable distinct-count sketches — the pre-aggregation algebra for
100 TB rollups.

Exact COUNT(DISTINCT) does not compose: yesterday's count plus today's
count is not the union's count, so every report window needs a full
re-scan. Sketches fix this algebraically: HyperLogLog (Flajolet et al.
2007; Heule et al. 2013 HLL++) and theta sketches (Dasgupta et al. 2016,
the Apache DataSketches line) are tiny fixed-size summaries that UNION
losslessly — build one sketch per (bucket, key-group) at ingest, persist
them, and answer any window/rollup later by merging sketches instead of
rescanning data. Theta additionally supports intersection/difference
(audience-overlap queries HLL cannot answer).

Spark 4 ships both families as built-in JVM aggregates
(`hll_sketch_agg`/`hll_union_agg`, `theta_sketch_agg`/
`theta_intersection_agg`, …) — everything here is expression-only
composition of those; error bounds are the published ~1.04/√(2^lg_k) for
HLL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_rollup(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    time_col: str | None = None,
    bucket: str = "day",
    lg_k: int = 12,
) -> DataFrame:
    """Build per-(group, time-bucket) HLL sketches of ``key_col`` — the
    ingest-time half of the pattern. The output is small (2^lg_k bytes per
    cell, ~4 KB at lg_k=12) and is what you PERSIST; every later rollup
    merges these instead of touching raw data."""
    keys = [F.col(c) for c in group_cols]
    if time_col is not None:
        keys.append(F.date_trunc(bucket, F.col(time_col)).alias("bucket_start"))
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def merge_estimate(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Roll sketches UP to coarser groups: union-merge per group, then
    estimate. This is the query-time half — it reads only sketches, so a
    year-over-any-dimension distinct count is a few thousand 4 KB merges,
    not a 100 TB scan."""
    return (
        sketches.groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def overlap_estimate(
    df: DataFrame,
    key_col: str,
    cohort_col: str,
    cohort_a: str,
    cohort_b: str,
    lg_k: int = 12,
) -> DataFrame:
    """Theta-sketch set algebra: |A|, |B|, |A∩B|, |A∪B| of the key sets of
    two cohorts in one pass — the audience-overlap query HLL cannot answer
    (HLL unions only; theta intersects). Returns one row of estimates."""
    sk = df.where(F.col(cohort_col).isin([cohort_a, cohort_b])).agg(
        F.theta_sketch_agg(
            F.when(F.col(cohort_col) == cohort_a, F.col(key_col)), F.lit(lg_k)
        ).alias("sk_a"),
        F.theta_sketch_agg(
            F.when(F.col(cohort_col) == cohort_b, F.col(key_col)), F.lit(lg_k)
        ).alias("sk_b"),
    )
    return sk.select(
        F.round(F.theta_sketch_estimate(F.col("sk_a")), 1).alias("n_a"),
        F.round(F.theta_sketch_estimate(F.col("sk_b")), 1).alias("n_b"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection(F.col("sk_a"), F.col("sk_b"))), 1
        ).alias("n_intersect"),
        F.round(
            F.theta_sketch_estimate(F.theta_union(F.col("sk_a"), F.col("sk_b"))), 1
        ).alias("n_union"),
    )
