"""Cost-based-optimizer (CBO) statistics surface — SURVEY.md §2B stretch.

AQE covers runtime re-planning from OBSERVED shuffle sizes; table/column
statistics cover the decisions AQE can't reach because they happen before
any stage runs: initial join strategy (broadcast vs shuffle before the
first exchange materializes), join REORDERING of 3+ tables, and
size-estimate propagation through filters. At 100 TB, `ANALYZE TABLE` after
each batch load is what keeps a star join from ever materializing a fact ×
fact shuffle that AQE then has to rescue.

Statistics live in the catalog, so they require catalog TABLES (external,
pointing at the existing parquet — a metadata-only operation), not temp
views. `register_external_tables` + `analyze_tables` is the one-time setup;
`table_stats` reads back what the optimizer will use.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import schemas


def register_external_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None,
    database: str = "cbo",
) -> list[str]:
    """Register the corpus parquet files as EXTERNAL catalog tables (no data
    movement — the files stay where they are). Idempotent.

    Tables are qualified into their own ``database``: statistics only attach
    to catalog tables, and an unqualified name would be shadowed by any
    same-named TEMP VIEW in the session (temp views win name resolution),
    which breaks ANALYZE with a views-unsupported error."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    out = []
    for name in names or list(schemas.TABLES):
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {database}.{name} USING parquet "
            f"LOCATION '{sf_dir}/{name}.parquet'"
        )
        out.append(f"{database}.{name}")
    return out


def analyze_tables(
    spark: SparkSession,
    names: list[str],
    columns: dict[str, list[str]] | None = None,
) -> None:
    """ANALYZE TABLE COMPUTE STATISTICS (+ per-column NDV/min/max/null-count
    histograms for the join/filter keys in ``columns``).

    Table-level stats (sizeInBytes, rowCount) feed broadcast decisions and
    join reordering; column-level stats feed filter-selectivity estimates —
    without them every predicate is guessed at a fixed default selectivity.
    One full scan per ANALYZE: schedule it with (not after) ingestion.
    """
    for name in names:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        for col in (columns or {}).get(name, []):
            spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {col}")


def enable_cbo(spark: SparkSession) -> None:
    """Turn on the cost-based optimizer + stats-driven join reordering.
    (Runtime-settable confs; harmless if already set.)"""
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")


def table_stats(spark: SparkSession, name: str) -> dict[str, str]:
    """The optimizer-visible statistics for a catalog table."""
    rows = spark.sql(f"DESCRIBE EXTENDED {name}").collect()
    out = {}
    for r in rows:
        if r.col_name == "Statistics":
            out["statistics"] = r.data_type
    return out


def with_metrics(df, name: str, *metrics):
    """Attach zero-cost pipeline metrics to a DataFrame via the Observation
    API: the metric aggregates are computed AS A SIDE EFFECT of whatever
    action the caller runs — no second scan, no extra job. This is how a
    production ingest reports rows-in / rows-dropped / quality tallies at
    100 TB without paying for a monitoring pass.

    Returns (df, observation); read ``observation.get`` AFTER an action.
    Metrics must be aggregate expressions (count/sum/min/max...).
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs


# ----------------------------------------------------- Iceberg (Puffin) ----


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark byte-size conf string ('10MB', '64k', '-1', '1048576b')."""
    s = str(conf_val).strip().lower()
    mult = 1
    for suffix, m in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s) * mult)


def estimate_equality_scan(stats: dict, eq_cols: list[str]) -> dict:
    """CBO FilterEstimation for path-based Iceberg scans: with per-column
    NDV from the table's Puffin statistics (iceberg.table_statistics), an
    equality predicate on a column keeps ~1/ndv of the rows, predicates
    multiply (independence assumption — the same one catalog CBO makes).
    Returns {"est_rows", "est_bytes", "known"}; known=False when any
    filtered column has no NDV (the caller must NOT guess small — an
    unknown column means file-size estimation, i.e. no reduction)."""
    rows = float(stats.get("row_count") or 0)
    sel = 1.0
    known = True
    for c in eq_cols:
        ndv = (stats.get("ndv") or {}).get(c)
        if not ndv:
            known = False
            continue
        sel *= 1.0 / float(ndv)
    est_rows = rows * (sel if known else 1.0)
    est_bytes = est_rows * float(stats.get("avg_row_bytes") or 0.0)
    return {"est_rows": est_rows, "est_bytes": est_bytes, "known": known}


def iceberg_scan_with_stats(spark, path: str, eq_filters: dict):
    """Read an Iceberg table, apply equality filters, and let the table's
    Puffin NDV statistics drive the broadcast decision the way catalog
    CBO stats do for ANALYZEd tables: when the estimated post-filter size
    lands under spark.sql.autoBroadcastJoinThreshold the scan is marked
    broadcastable, even though the files' raw size (all Spark can see for
    a path-based read without statistics) is far above it. Returns
    (DataFrame, estimate-dict with "broadcast": bool) — joins built on the
    returned frame get a BroadcastHashJoin with NO user-supplied hint.

    At 100 TB this is the difference between shuffling a fact table to
    join a filtered-to-a-handful dimension slice and shipping those few
    rows to every executor."""
    from pyspark.sql import functions as F

    from .io import iceberg

    stats = iceberg.table_statistics(path)
    est = estimate_equality_scan(stats, list(eq_filters))
    df = iceberg.read_iceberg(spark, path)
    return _apply_stats_scan(spark, df, stats, est, eq_filters)


def delta_scan_with_stats(spark, path: str, eq_filters: dict):
    """The Delta twin of iceberg_scan_with_stats: NDV comes from
    lakehouse.analyze_delta's fsml.statistics domain (fresh only while
    the table is still at the ANALYZEd version), row counts/sizes from
    the live adds' per-file stats. Same contract: (DataFrame,
    estimate-dict with "broadcast")."""
    from .io import lakehouse

    stats = lakehouse.delta_table_statistics(path)
    est = estimate_equality_scan(stats, list(eq_filters))
    df = lakehouse.read_delta(spark, path)
    return _apply_stats_scan(spark, df, stats, est, eq_filters)


def _apply_stats_scan(spark, df, stats, est, eq_filters):
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    for c, v in eq_filters.items():
        # pass a Column for type-sensitive literals (TIMESTAMP_NTZ etc. —
        # a naive-datetime lit would shift under a non-UTC session)
        df = df.where(F.col(c) == (v if isinstance(v, Column) else F.lit(v)))
    threshold = _size_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    )
    est["threshold_bytes"] = threshold
    est["raw_bytes"] = stats.get("total_file_bytes") or 0
    est["broadcast"] = bool(
        est["known"] and threshold > 0 and est["est_bytes"] < threshold
    )
    if est["broadcast"]:
        df = F.broadcast(df)
    return df, est


def estimate_join_rows(
    left_stats: dict,
    right_stats: dict,
    on: "tuple[str, str]",
    left_sketches: dict | None = None,
    right_sketches: dict | None = None,
) -> dict:
    """Equi-join CARDINALITY estimate from table statistics — the number
    CBO join reordering runs on. Two estimators, best-available wins:

    - **sketch**: with both sides' theta sketches for the join keys
      (iceberg.read_statistics_sketches / lakehouse.read_delta_
      statistics_sketches), the KEY OVERLAP is estimated by sketch
      INTERSECTION — |A∩B| · (rowsL/ndvL) · (rowsR/ndvR). This sees what
      NDV math can't: two columns with a million distinct values each and
      ZERO overlap estimate ~0, not rowsL·rowsR/10⁶.
    - **system-r**: the classic containment assumption,
      rowsL · rowsR / max(ndvL, ndvR), when either sketch is missing.

    Returns {"est_rows", "method", "key_overlap"} (key_overlap only from
    the sketch path). Both sides hash keys with the same xxhash64, so
    cross-format (Delta⋈Iceberg) estimates compose."""
    lcol, rcol = on
    rows_l = float(left_stats.get("row_count") or 0)
    rows_r = float(right_stats.get("row_count") or 0)
    ndv_l = (left_stats.get("ndv") or {}).get(lcol)
    ndv_r = (right_stats.get("ndv") or {}).get(rcol)
    sk_l = (left_sketches or {}).get(lcol)
    sk_r = (right_sketches or {}).get(rcol)
    if sk_l is not None and sk_r is not None and ndv_l and ndv_r:
        overlap = sk_l.intersect(sk_r).estimate
        return {
            "est_rows": overlap * (rows_l / ndv_l) * (rows_r / ndv_r),
            "method": "sketch",
            "key_overlap": overlap,
        }
    if ndv_l and ndv_r:
        return {
            "est_rows": rows_l * rows_r / max(ndv_l, ndv_r),
            "method": "system-r",
            "key_overlap": None,
        }
    return {"est_rows": rows_l * rows_r, "method": "cross", "key_overlap": None}
