"""Profile API — the engine's answer to the reference's EDA module
(R15–R17; /root/reference/src/data_exploration.py). Instead of matplotlib
windows, every profile op returns a DataFrame (computation, not
presentation — SURVEY.md §2A R19 note).
"""

from __future__ import annotations

from ..localframe import local_rows_df

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(df: DataFrame, col: str, nbins: int = 10) -> DataFrame:
    """Fixed-width histogram (R16 analog of sns.histplot,
    /root/reference/src/data_exploration.py:16-17).

    Two jobs: an exact min/max aggregate, then one groupBy on the bin id —
    both fully distributed, no driver-side data. The max value is clamped
    into the last bin (right-closed top edge).

    Empty / all-null column: returns an empty frame with the histogram
    schema (min/max aggregate over zero rows yields NULL bounds — there is
    no bin range to define).
    """
    lo, hi = df.select(F.min(col), F.max(col)).first()
    if lo is None or hi is None:
        return local_rows_df(df.sparkSession, 
            [], "bin int, bin_lo double, bin_hi double, n long"
        )
    width = (hi - lo) / nbins or 1.0
    bin_id = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(nbins - 1)
    ).cast("int")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            "n",
        )
    )


def histogram_kde(
    df: DataFrame, col: str, nbins: int = 10, bandwidth: float | None = None
) -> DataFrame:
    """Histogram WITH the Gaussian-KDE overlay evaluated at each bin
    midpoint — the full R16 semantics (`sns.histplot(..., kde=True)`,
    /root/reference/src/data_exploration.py:16-17) in one result:
    (bin, bin_lo, bin_hi, n, density).

    Plan: the min/max aggregate (one tiny job) fixes the bin edges; the bin
    counts are one groupBy pass; the KDE curve is ONE wide aggregate row
    (one density aggregate per midpoint, map-side combined) cross-joined
    back to the 10-row histogram — the curve lookup is `array(d_0..d_k)[bin]`
    against a broadcast single row, so no extra shuffle at any scale.
    """
    import math

    lo, hi = df.select(F.min(col), F.max(col)).first()
    if lo is None or hi is None:  # empty / all-null column: no bin range
        return local_rows_df(df.sparkSession, 
            [], "bin int, bin_lo double, bin_hi double, n long, density double"
        )
    width = (hi - lo) / nbins or 1.0
    if bandwidth is None:
        bandwidth = width  # Scott-ish default: smooth at bin resolution
    hist = histogram(df, col, nbins)
    mids = [lo + (b + 0.5) * width for b in range(nbins)]
    inv = 1.0 / (bandwidth * math.sqrt(2.0 * math.pi))
    wide = (
        df.where(F.col(col).isNotNull())
        .agg(
            *[
                F.round(
                    F.avg(
                        F.exp(-F.pow((F.lit(m) - F.col(col)) / F.lit(bandwidth), 2) / 2)
                    )
                    * inv,
                    8,
                ).alias(f"d_{i}")
                for i, m in enumerate(mids)
            ]
        )
        .select(F.array(*[F.col(f"d_{i}") for i in range(nbins)]).alias("_d"))
    )
    return hist.crossJoin(F.broadcast(wide)).select(
        "bin", "bin_lo", "bin_hi", "n", F.col("_d")[F.col("bin")].alias("density")
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation (R17 analog of features_df.corr(),
    /root/reference/src/data_exploration.py:33), as a long-form DataFrame
    (col_a, col_b, corr).

    All C(n,2) corr aggregates run in ONE job/projection — a single pass
    over the data, matching ml.stat.Correlation's efficiency while staying
    SQL-expressible for the oracle.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    aggs = [
        F.round(F.corr(a, b), 4).alias(f"{a}__{b}") for a, b in pairs
    ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs
    )
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_expr}) as (col_a, col_b, corr)"
    )


def summary_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column count/mean/stddev/min/max in one pass (R19 profile).

    mean/std are derived from EXACT decimal sums (Σx, Σx²) rather than
    float avg/stddev aggregates: float accumulation is partition-order
    dependent, so the same query on the same data can round differently
    under a different parallelism — unacceptable for a correctness-gated
    profile. sqrt((Σx² - (Σx)²/n)/(n-1)) on exact sums is deterministic.
    (No catastrophic cancellation risk at these column scales; a shifted
    formulation would be the fix if a column ever needed it.)
    """
    aggs = []
    for c in cols:
        s1 = F.expr(f"cast(cast(sum(cast({c} as decimal(30,8))) as string) as double)")
        s2 = F.expr(
            f"cast(cast(sum(cast({c} * {c} as decimal(38,10))) as string) as double)"
        )
        n = F.count(c)
        aggs += [
            n.alias(f"{c}__count"),
            F.round(s1 / n, 6).alias(f"{c}__mean"),
            F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 6).alias(f"{c}__std"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `{c}__count`, `{c}__mean`, `{c}__std`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column, n, mean, std, min, max)"
    )


def kde(df: DataFrame, col: str, grid: list[float], bandwidth: float) -> DataFrame:
    """Gaussian kernel density estimate evaluated at fixed grid points
    (R16's KDE overlay, /root/reference/src/data_exploration.py:16-17
    `kde=True`) — as ONE aggregate pass: density(g) = avg(K((g-x)/h))/h.

    Expression-only (no RDD KernelDensity, no driver sample): each grid
    point is an aggregate column, so the whole curve costs a single
    map-side-combined scan regardless of data size.
    """
    import math

    inv = 1.0 / (bandwidth * math.sqrt(2.0 * math.pi))
    aggs = [
        F.round(
            F.avg(
                F.exp(
                    -F.pow((F.lit(g) - F.col(col)) / F.lit(bandwidth), 2) / 2
                )
            )
            * inv,
            8,
        ).alias(f"d_{i}")
        for i, g in enumerate(grid)
    ]
    wide = df.where(F.col(col).isNotNull()).agg(*aggs)
    # NB: a bare 10000.0 literal parses as DECIMAL in Spark SQL — cast.
    stack = ", ".join(f"cast({g!r} as double), `d_{i}`" for i, g in enumerate(grid))
    return wide.selectExpr(f"stack({len(grid)}, {stack}) as (x, density)")
