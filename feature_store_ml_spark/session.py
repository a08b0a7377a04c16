"""SparkSession factory tuned for both local testing and cluster scale.

The settings here are the scale-critical defaults; on a real 1000-executor
cluster only ``shuffle.partitions`` (sized to ~128 MB per task of shuffle
data) and memory knobs change — the plan-shaping configs (AQE, skew join,
broadcast threshold) carry over unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Local test parallelism; the driver runs bench with SPARK_GRAFT_CPUS.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "feature_store_ml_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Scale rationale per config:
    - AQE on: runtime re-planning coalesces small shuffle partitions and
      switches sort-merge → broadcast when post-filter sizes allow; the skew
      flags split hot partitions so one straggler task doesn't gate a stage.
    - ``shuffle.partitions`` ≈ cores locally; at 100 TB you size it to
      total-shuffle-bytes / 128MB and let AQE coalesce down.
    - Arrow on: every pandas_udf / toPandas crosses JVM↔Python in columnar
      batches instead of pickled rows.
    - Session timezone pinned UTC so timestamp semantics match the DuckDB
      oracle and are cluster-location-independent.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size post-shuffle partitions by BYTES (advisoryPartitionSizeInBytes,
        # Spark default 64m) instead of stopping coalescing at the core count:
        # parallelismFirst=true (the Spark default) exists to avoid surprises
        # when first enabling AQE and the docs themselves recommend false.
        # With it true, every tiny internal shuffle (DML staging, CDF diffs,
        # metadata joins) fans out to `cpus` near-empty tasks AND every staged
        # write then lands `cpus` near-empty files that downstream scans pay
        # per-file open cost for (guide §2.2, §6). Sizing by bytes is
        # scale-correct: at 100 TB the same setting yields advisory-sized
        # (not fewer) partitions, and it is core-count-independent, so the
        # driver's reduced-core scaling run measures the same plan.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # Let AQE re-plan CACHED frames too (off by default for
        # output-partitioning compat only — SPARK-38389): without it every
        # persisted frame (MERGE cardinality checks, DELETE pair staging)
        # materializes at the static shuffle.partitions count, walling off
        # the byte-sized coalescing above. No engine path depends on
        # cached output partitioning; at scale this coalesces cached
        # intermediates to advisory-sized partitions exactly like
        # uncached ones.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS); Spark's reader
        # has no ns timestamp type, so read as long and convert in io.sources.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # INT64 micros, not the legacy INT96: INT96 timestamps carry NO
        # parquet column statistics (data skipping and row-group pruning
        # go blind on every timestamp column) and Iceberg's spec forbids
        # them outright. Spark only defaults to INT96 for Hive/Impala
        # compat this engine doesn't need.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
