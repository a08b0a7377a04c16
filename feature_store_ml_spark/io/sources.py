"""Sources and sinks (SURVEY.md §2B E1).

The reference's only IO is a CSV write (/root/reference/src/main.py:15) and
joblib/JSON sinks (/root/reference/src/model_saving.py:6-14). Here parquet is
the default interchange format — columnar, splittable, schema-full, and the
only format where Catalyst's predicate pushdown / column pruning reach the
scan. CSV/JSON are kept as explicit-schema compatibility paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_SIZE_SUFFIX = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}


def _parse_bytes(conf_value: str, default: int = 128 << 20) -> int:
    """Parse a Spark byte-size conf ('134217728', '128m', '128MB', '1g')
    the way Spark's JavaUtils.byteStringAsBytes does; fall back to
    ``default`` on anything unparseable rather than raising mid-plan."""
    s = conf_value.strip().lower()
    try:
        if s.endswith("b") and not s[:-1].isdigit():
            s = s[:-1]  # 'mb' / 'kb' → 'm' / 'k'
        if s and s[-1] in _SIZE_SUFFIX:
            return int(s[:-1]) * _SIZE_SUFFIX[s[-1]]
        return int(s.rstrip("b") or default)
    except (ValueError, TypeError):
        return default


def _events_ts_to_ntz(observed_dtype: str):
    """Normalize events.ts to µs-precision TIMESTAMP_NTZ regardless of the
    corpus generation's on-disk physical type (the test corpus has shipped
    both INT64 TIMESTAMP(NANOS) — read as ``bigint`` under ``nanosAsLong`` —
    and native ``timestamp[us]``). Dispatch on the OBSERVED Spark dtype, not
    an assumption about the file:

    - ``bigint``: raw nanos → NTZ via pure interval arithmetic.
      (timestamp_micros(..).cast('timestamp_ntz') would go through the
      SESSION TIMEZONE and shift values under a non-UTC session.)
    - ``timestamp_ntz``: already the contract type — pass through.
    - ``timestamp``: session-tz-tagged; under a pinned-UTC session the cast
      is wall-clock-preserving. Accepted for robustness.
    """
    if observed_dtype == "bigint":
        return F.expr(
            "cast('1970-01-01' as timestamp_ntz) + make_dt_interval("
            "cast(ts div 86400000000000 as int), 0, 0, "
            "cast((ts % 86400000000000) div 1000 as double) / 1000000.0)"
        )
    if observed_dtype in ("timestamp_ntz", "timestamp"):
        return F.col("ts").cast("timestamp_ntz")
    raise TypeError(
        f"events.ts: unsupported on-disk type {observed_dtype!r}; "
        "expected bigint (legacy nanos) or timestamp[_ntz]"
    )


#: bytes of input per task for the ``parallelize`` fan-out. Sizing the
#: fan-out by the table's bytes (guide §2.2) instead of the core count
#: keeps tiny tables from paying `defaultParallelism` near-empty tasks:
#: measured on the 594 KB documents table at 32 cores, a 32-way fan-out
#: ran the downstream JVM aggregations ~1.5x SLOWER than an 8-10-way one
#: (per-task fixed cost > compute), and the 8-core driver run saw the
#: same plan — i.e. the old width was core-count-derived overhead, not
#: parallelism. CPU-bound Python codec paths opt out via ``wide=True``.
PARALLELIZE_TARGET_BYTES = 64 * 1024


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    parallelize: bool = False,
    wide: bool = False,
) -> DataFrame:
    """Load one of the standard tables with its declared schema.

    The declared schema is applied post-scan via column casts only where the
    parquet physical type differs (e.g. events.ts is INT64(ns) on disk and
    Spark reads it natively); parquet self-describes, so we read without
    inference and verify names match the contract in ``schemas.TABLES``.

    ``parallelize``: a parquet scan can't split below a row group, so a
    table written as one fat row group (this corpus) pins every downstream
    map-side stage to ONE task no matter how many cores exist. When the
    scan yields far fewer partitions than the cluster has slots, insert a
    round-robin repartition — predicates and column pruning still push
    below the exchange, so the shuffle carries only filtered/pruned rows.
    The width is sized by the table's BYTES (PARALLELIZE_TARGET_BYTES per
    task, capped at the slot count); ``wide=True`` requests the full slot
    count instead — for downstream per-row work that dwarfs the bytes
    (the pure-Python image codecs), where a task per slot is the right
    shape no matter how small the input is (guide §4). On production
    multi-file tables (100 TB = thousands of row groups) the condition
    is false and this is a no-op.
    """
    if name not in schemas.TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {sorted(schemas.TABLES)}")
    if name == "events":
        # Older corpus generations store events.ts as INT64 TIMESTAMP(NANOS),
        # which Spark's reader rejects outright without this legacy conf. It
        # is a no-op for native timestamp[us] files, so set it defensively —
        # the DRIVER's verify harness supplies its own vanilla session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    expected = [f.name for f in schemas.TABLES[name]]
    if df.columns != expected:
        raise ValueError(f"{name}: schema drift — got {df.columns}, expected {expected}")
    if name == "events":
        df = df.withColumn("ts", _events_ts_to_ntz(dict(df.dtypes)["ts"]))
    if parallelize:
        par = spark.sparkContext.defaultParallelism
        # file-size heuristic instead of df.rdd.getNumPartitions(): the RDD
        # bridge costs a full planning round-trip per call; a stat() is free.
        # A table under maxPartitionBytes scans as ~1 partition.
        try:
            n_bytes = os.path.getsize(f"{sf_dir}/{name}.parquet")
        except OSError:
            n_bytes = None
        max_part = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        if n_bytes is not None and n_bytes / max_part < max(2, par // 4):
            n_parts = (
                par
                if wide
                else min(par, max(2, -(-n_bytes // PARALLELIZE_TARGET_BYTES)))
            )
            df = df.repartition(n_parts)
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL surface."""
    for name in names or list(schemas.TABLES):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_over_tables(
    spark: SparkSession, tables: dict[str, str], query: str
) -> DataFrame:
    """CROSS-FORMAT SQL federation: register each ``name -> path`` as a
    temp view through the format sniffer (Delta via the log replay,
    Iceberg via the metadata walk, bare parquet directly) and run one
    Spark SQL statement over all of them — joins spanning a Delta feature
    table and an Iceberg dimension work like any two tables. The views
    are lazy logical plans: snapshot resolution happens at registration,
    scan planning (pushdown, pruning, DV/delete-file masking) at action
    time, all through the same plans the per-format readers build. Views
    stay registered (the returned DataFrame references them); re-calling
    with the same names re-resolves to the tables' CURRENT snapshots."""
    from .lakehouse import read_table_auto

    if not tables:
        raise ValueError("sql_over_tables: no tables given")
    for name, path in tables.items():
        read_table_auto(spark, path).createOrReplaceTempView(name)
    return spark.sql(query)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV scan with a declared schema (never inferSchema in production —
    inference is a full extra pass over 100 TB)."""
    return spark.read.option("header", True).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Default sink. ``partition_by`` enables partition pruning for readers
    (e.g. feature-store outputs partitioned by date bucket, SURVEY.md §4)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    """Reference-parity CSV export (/root/reference/src/main.py:15)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown properties as parquet."""
    return spark.read.orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """JDBC scan. Without partitioning options a JDBC read is ONE task —
    always pass (partition_column, bounds, num_partitions) for any table
    that matters. No JDBC driver jars ship in this image; the call fails at
    connect time, not import time, so it is safely stubbed for tests."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
