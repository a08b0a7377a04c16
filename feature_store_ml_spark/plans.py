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
