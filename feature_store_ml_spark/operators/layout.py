"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

Parquet row-group pruning works off per-column min/max statistics; a corpus
sorted on one column skips beautifully on that column and not at all on any
other. Interleaving the bits of several columns' ranks (a Morton / Z-order
curve — the technique behind Delta Lake's OPTIMIZE ZORDER BY and
Databricks/Iceberg clustering, published in Morton 1966 and the UB-tree
papers) gives every participating column *partial* locality: a range
predicate on ANY z-ordered column prunes ~(1 - 1/2^bits_share) of
row groups instead of none.

Scale shape: one tiny min/max aggregate (broadcast back, no collect), one
stateless per-row bit-interleave projection (whole-stage codegen — it's all
shifts and ORs), then ONE repartitionByRange+sort on the z-key — the same
cost as any global sort, which a 100 TB table pays once at write time and
amortizes over every subsequent scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_BITS = 20  # 3 cols × 20 bits = 60 bits < signed-long range


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave k pre-scaled [0, 2^bits) integer columns into one
    long: output bit (b*k + i) = bit b of column i. Pure shift/and/or
    expression tree (k*bits terms), no UDF, no shuffle."""
    k = len(scaled)
    terms = [
        F.shiftleft(F.shiftright(col, b).bitwiseAND(F.lit(1)), b * k + i)
        for b in range(bits)
        for i, col in enumerate(scaled)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), terms).alias("_zkey")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Append a ``_zkey`` Morton key over ``cols`` (numeric). Ranks are
    min/max-scaled to ``bits`` bits per column from a single one-row
    aggregate that broadcasts back into the plan — no driver collect, plan
    stays lazy."""
    if not 1 <= bits <= _MAX_BITS:
        raise ValueError(f"bits must be in [1, {_MAX_BITS}]")
    if not cols:
        raise ValueError("need at least one column")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_max_{c}") for c in cols],
    )
    top = (1 << bits) - 1
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        scaled.append(
            F.least(
                F.floor((F.col(c).cast("double") - lo) / span * (top + 1)).cast("long"),
                F.lit(top),
            )
        )
    return with_stats.select(*df.columns, _interleave(scaled, bits))


def select_files_for_compaction(
    files: list[dict],
    small_file_bytes: int = 32 << 20,
    min_group: int = 2,
) -> tuple[list[str], dict[str, str]]:
    """Incremental-OPTIMIZE file-selection policy (liquid-clustering-style
    maintenance: cost O(touched files), never a whole-partition rewrite).
    Pure metadata function shared by the Delta and Iceberg incremental
    compactors — each ``files`` entry describes ONE data file of ONE
    partition:

        {"name": str, "size": int,
         "has_deletes": bool,              # live DV / pos / eq content
         "min": number|None, "max": number|None}  # clustering-key bounds

    Selection rules, in priority order:

    1. DELETE PURGE — a file carrying live delete content is always
       selected (rewriting it folds the mask in and retires the delete).
    2. SMALL-FILE MERGE — files under ``small_file_bytes`` are selected
       when at least ``min_group`` of them exist in the partition; a lone
       small file stays (rewriting it alone buys nothing).
    3. OVERLAP-BOUND RECLUSTER — when clustering bounds are present,
       files whose [min, max] intervals intersect form interval-graph
       components; every component of ≥2 files is selected (their ranges
       shadow each other, so predicates on the clustering key cannot
       prune any of them — rewriting the component restores disjoint
       bounds). Files without bounds never join a component.

    Returns (selected names sorted, name -> reason). Callers group files
    per partition BEFORE calling — files never merge across partitions.
    """
    reasons: dict[str, str] = {}
    for f in files:
        if f.get("has_deletes"):
            reasons[f["name"]] = "delete-purge"
    small = [
        f["name"]
        for f in files
        if f["size"] < small_file_bytes and f["name"] not in reasons
    ]
    n_small_total = sum(1 for f in files if f["size"] < small_file_bytes)
    if n_small_total >= min_group:
        for n in small:
            reasons[n] = "small-file"
    bounded = sorted(
        (f for f in files if f.get("min") is not None and f.get("max") is not None),
        key=lambda f: (f["min"], f["max"], f["name"]),
    )
    comp: list[dict] = []
    comp_max = None
    for f in bounded + [None]:
        if f is not None and comp and f["min"] <= comp_max:
            comp.append(f)
            comp_max = max(comp_max, f["max"])
            continue
        if len(comp) >= 2:
            for m in comp:
                reasons.setdefault(m["name"], "overlap")
        comp = [f] if f is not None else []
        comp_max = f["max"] if f is not None else None
    return sorted(reasons), reasons


def zorder_layout(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 12
) -> DataFrame:
    """Cluster rows along the Z-curve: range-partition then sort by the
    Morton key, drop the key. Writing the result as parquet yields row
    groups whose min/max stats are tight on EVERY column in ``cols`` —
    the write-time layout step that makes multi-dimension predicate
    pushdown actually skip IO at read time."""
    keyed = zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(n_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
