"""Window-function compositions — SURVEY.md §2B E5/E6.

Pure built-ins; each helper exists to pin down deterministic tie-breaking
(required for oracle comparison) and the scale notes below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number.

    Scale: one shuffle on ``partition_by``; Spark's WindowExec applies a
    rank-limit pushdown (WindowGroupLimit, Spark ≥3.5) so each map task keeps
    only k rows per group before the shuffle — this stays cheap even when a
    group has millions of rows. Callers must make ``order_by`` a TOTAL order
    (include a unique key last) or the selected rows are nondeterministic.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "INTERVAL 30 MINUTES",
    session_col: str = "session_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap``.

    Classic lag + conditional cumsum — one shuffle on the user key. The
    streaming twin is ``F.session_window`` (streaming/events.py).
    ``tiebreak``: unique column ordering equal timestamps (determinism).
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    new_session = (
        prev.isNull() | (F.col(ts_col) > prev + F.expr(gap))
    ).cast("int")
    return df.withColumn(
        session_col, F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
