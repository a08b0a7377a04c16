"""As-of (nearest-timestamp) join — SURVEY.md §2B E3/E12.

Spark SQL has no native ASOF JOIN (DuckDB does — used as the oracle). The
naive formulation is a range join (``l.ts >= r.ts``) followed by
``row_number() = 1``, which Catalyst can only execute as a broadcast
nested-loop or a cartesian product per key — O(|L|·|R|) per key and
catastrophic at 100 TB.

This implementation is the *union-window* algorithm: tag both sides, union
them, and take, per key ordered by timestamp, the last right-side payload at
or before each left row:

    cost = ONE shuffle of |L| + |R| rows on the join key
           + a sort within each partition (which the shuffle's
             sort-merge machinery largely pays for anyway)

No row explosion, no per-key quadratic work, skew handled by AQE the same
way any single wide shuffle is. This is the same strategy Flink's
temporal-table join and kdb's ``aj`` use internally.

Semantics match ``pandas.merge_asof(direction='backward'/'forward')`` and
DuckDB ``ASOF JOIN`` (backward): for each left row, the single right row
with the greatest ``right_ts <= left_ts`` (backward) or smallest
``right_ts >= left_ts`` (forward). Equal timestamps match (inclusive). Left
rows with no candidate get nulls (left-outer semantics).

Right side should be unique per (key, ts); if not, pass ``right_tiebreak``
(a column name) — the candidate with the greatest tiebreak value wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_TIE = "__asof_tie"
_PAYLOAD = "__asof_payload"
_LEFT = "__asof_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    right_tiebreak: str | None = None,
    tolerance_expr: str | None = None,
) -> DataFrame:
    """Left as-of join; returns all left columns plus the matched right row's
    non-key columns (right ts included, renamed with ``suffix`` on clashes).

    tolerance_expr: optional SQL interval bound, e.g. ``"INTERVAL 1 HOUR"``
    — matches further than that from the left ts are nulled out (pandas
    ``tolerance=`` semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts

    payload_cols = [c for c in right.columns if c not in keys]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }

    # Right rows carry their payload as ONE struct so the window's
    # last(ignorenulls) treats the whole row atomically — a null inside the
    # payload must not fall back to an older row's value for that column.
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias(_TIE),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
        F.lit(None).alias(_LEFT),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(0).alias(_TIE),
        F.lit(None).alias(_PAYLOAD),
        F.struct(*[F.col(c) for c in left.columns]).alias(_LEFT),
    )
    # Align the lazily-typed null literals: build unioned schema explicitly.
    r = r.withColumn(_LEFT, F.lit(None).cast(l.schema[_LEFT].dataType))
    l = l.withColumn(_PAYLOAD, F.lit(None).cast(r.schema[_PAYLOAD].dataType))
    u = r.unionByName(l)

    if direction == "backward":
        # rights sort before lefts at equal ts (side 0 < 1) → inclusive match;
        # among equal-ts rights the greatest tiebreak sorts last → wins.
        order = [F.col(_TS).asc_nulls_first(), F.col(_SIDE).asc(), F.col(_TIE).asc()]
    else:
        # rows scan in ts-desc order, so the nearest right at-or-after the
        # left row is the LAST right seen; among equal-ts rights the greatest
        # tiebreak must sort last (asc, same as backward) so last() wins it.
        order = [F.col(_TS).desc_nulls_last(), F.col(_SIDE).asc(), F.col(_TIE).asc()]

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)).where(
        F.col(_SIDE) == 1
    )

    if tolerance_expr:
        bound = (
            F.col(_TS) - F.expr(tolerance_expr)
            if direction == "backward"
            else F.col(_TS) + F.expr(tolerance_expr)
        )
        within = (
            (F.col(f"{_PAYLOAD}.{right_ts}") >= bound)
            if direction == "backward"
            else (F.col(f"{_PAYLOAD}.{right_ts}") <= bound)
        )
        matched = matched.withColumn(
            _PAYLOAD, F.when(within, F.col(_PAYLOAD)).otherwise(F.lit(None))
        )

    out = matched.select(
        *[F.col(f"{_LEFT}.{c}").alias(c) for c in left.columns],
        *[F.col(f"{_PAYLOAD}.{c}").alias(out_names[c]) for c in payload_cols],
    )
    return out
