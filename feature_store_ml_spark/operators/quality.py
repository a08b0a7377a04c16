"""Declarative data-quality validation — the feature-store admission gate.

A feature store ingesting 100 TB/day cannot eyeball data; it declares
expectations and measures violations (the pattern popularized by Great
Expectations and Deequ — Schelter et al., VLDB 2018, "Automating Large-Scale
Data Quality Verification"). This is the Spark-expression core of that idea:
each rule compiles to a conditional-count aggregate, ALL rules evaluate in
ONE pass over the table (a single agg projection — adding a rule adds a
column, not a scan), and referential-integrity rules compile to broadcast
anti-join counts against the (dimension-sized) referenced keys.

Rules (all pure column logic, no UDFs):
- ``not_null(col)``
- ``unique(col)``        — duplicate-key count (one extra agg on the key)
- ``in_range(col, lo, hi)``
- ``in_set(col, values)``
- ``matches(col, regex)``
- ``ref_exists(col, dim_df, dim_col)`` — FK violations via left anti join
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    kind: str
    col: str
    args: dict[str, Any] = field(default_factory=dict)


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", "not_null", col)


def unique(col: str) -> Rule:
    return Rule(f"unique_{col}", "unique", col)


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"in_range_{col}", "in_range", col, {"lo": lo, "hi": hi})


def in_set(col: str, values: list) -> Rule:
    return Rule(f"in_set_{col}", "in_set", col, {"values": values})


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"matches_{col}", "matches", col, {"pattern": pattern})


def ref_exists(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(f"ref_{col}", "ref_exists", col, {"dim": dim, "dim_col": dim_col})


def _violation(rule: Rule) -> Column:
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_range":
        lo, hi = rule.args["lo"], rule.args["hi"]
        return c.isNull() | (c < lo) | (c > hi)
    if rule.kind == "in_set":
        return c.isNull() | ~c.isin(rule.args["values"])
    if rule.kind == "matches":
        return c.isNull() | ~c.rlike(rule.args["pattern"])
    raise ValueError(f"unknown rule kind {rule.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, n_violations, n_rows) — one row
    per rule, zero rows of raw data moved to the driver. Row-local rules
    share one aggregate pass; each ``unique`` adds one agg on its key; each
    ``ref_exists`` adds one anti-join count (broadcast when the dimension
    is small, which referenced key sets are)."""
    n_rows = F.count("*")
    aggs, extra = [], []
    for r in rules:
        if r.kind == "unique":
            dups = (
                df.groupBy(r.col)
                .agg(F.count("*").alias("_c"))
                .where(F.col("_c") > 1)
                .agg(
                    F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            extra.append(dups)
        elif r.kind == "ref_exists":
            dim = r.args["dim"].select(F.col(r.args["dim_col"]).alias(r.col)).distinct()
            miss = (
                df.join(F.broadcast(dim), r.col, "left_anti")
                .agg(F.count("*").cast("long").alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            extra.append(miss)
        else:
            aggs.append(
                F.sum(_violation(r).cast("long")).cast("long").alias(r.name)
            )
    # 1-row total, cross-joined (broadcast) everywhere it's needed — the
    # plan stays lazy; no driver-side count() action.
    tot = df.agg(n_rows.cast("long").alias("n_rows"))
    parts = []
    if aggs:
        wide = df.agg(*aggs, n_rows.cast("long").alias("n_rows"))
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.col(r.name).alias("n_violations"),
                        )
                        for r in rules
                        if r.kind not in ("unique", "ref_exists")
                    ]
                )
            ).alias("kv"),
            F.col("n_rows"),
        ).select("kv.rule", "kv.n_violations", "n_rows")
        parts.append(stacked)
    for e in extra:
        parts.append(e.crossJoin(F.broadcast(tot)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def drift_psi(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    breaks: list[float],
) -> DataFrame:
    """Population Stability Index per bin — THE standard drift score for a
    serving feature against its training distribution (rule of thumb:
    total PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 retrain).
    The reference pipeline trains on a single static CSV
    (/root/reference/src/main.py:15); at 100 TB the training snapshot and
    the serving stream are separate tables whose agreement must be
    MEASURED, not assumed.

    ``breaks`` are explicit ascending cut points: bin k holds values in
    [breaks[k-1], breaks[k]) with open tails (k=0 below the first break,
    k=len(breaks) at-or-above the last) — explicit breaks make the
    binning a pure comparison chain, IEEE-identical across engines
    (derived equal-width edges would put boundary values at the mercy of
    each engine's width_bucket arithmetic). NULLs are excluded.
    Proportions are Laplace-smoothed ((count+1) / (n+n_bins)) so an empty
    bin can never yield an infinite log ratio.

    Output: one row per bin with p_base, p_cur and the PSI term
    (p_cur - p_base) * ln(p_cur / p_base), each rounded to 6 dp (the
    cross-engine float discipline); sum psi_term for the headline score.
    Each input is aggregated in ONE pass (conditional-count projection —
    same shape as validate()); the join of n_bins+1 rows broadcasts."""
    if not breaks or sorted(breaks) != list(breaks):
        raise ValueError("drift_psi: breaks must be a non-empty ascending list")
    n_bins = len(breaks) + 1

    def _binned(df: DataFrame, p_name: str) -> DataFrame:
        x = F.col(col)
        bin_id = sum(
            (F.when(x >= F.lit(float(b)), 1).otherwise(0) for b in breaks),
            F.lit(0),
        )
        counts = (
            df.where(x.isNotNull())
            .select(bin_id.alias("_b"))
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.when(F.col("_b") == k, 1).otherwise(0)).alias(
                        f"_c{k}"
                    )
                    for k in range(n_bins)
                ],
            )
        )
        stacked = counts.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("long").alias("bin"),
                            (
                                (F.col(f"_c{k}") + F.lit(1)).cast("double")
                                / (F.col("_n") + F.lit(n_bins)).cast("double")
                            ).alias(p_name),
                        )
                        for k in range(n_bins)
                    ]
                )
            ).alias("kv")
        )
        return stacked.select("kv.bin", f"kv.{p_name}")

    b = _binned(baseline, "p_base")
    c = _binned(current, "p_cur")
    return (
        b.join(F.broadcast(c), "bin")
        .select(
            "bin",
            F.round("p_base", 6).alias("p_base"),
            F.round("p_cur", 6).alias("p_cur"),
            F.round(
                (F.col("p_cur") - F.col("p_base"))
                * F.log(F.col("p_cur") / F.col("p_base")),
                6,
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )
