"""Join strategy helpers beyond Catalyst defaults — SURVEY.md §2B E3.

Catalyst + AQE already pick broadcast vs sort-merge vs shuffle-hash and
split skewed partitions (session.py enables both). Two techniques still
need explicit engine support:

- ``bucketed_tables``: co-located joins. Writing both fact tables bucketed
  on the join key lets every later join/agg on that key run with ZERO
  shuffles — the 100 TB pattern for repeatedly-joined fact tables.
- ``salted_join``: pre-AQE skew handling for keys so hot that even AQE's
  partition splitting leaves a straggler (or when AQE is off, e.g. inside
  streaming). Explodes the dimension side k ways, salts the fact side.
- ``enable_runtime_bloom_filters``: runtime row-level semi-join pruning.
  When a selective filter sits on one side of a shuffle join, Catalyst
  builds a bloom filter of that side's join keys and injects
  ``might_contain(...)`` into the OTHER side's scan — rows that cannot
  join are dropped at the scan, before the shuffle. At 100 TB this is the
  difference between shuffling the whole fact table and shuffling the few
  percent that survive the dimension filter. Off by default in Spark;
  the thresholds below make it fire for warehouse-shaped plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32
) -> None:
    """Persist as a bucketed managed table: later equi-joins/aggs on
    ``bucket_col`` between tables bucketed the same way need no exchange."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact rows get a random salt in [0, k);
    the (smaller) dim side is exploded k ways so every (key, salt) bucket
    joins. Shuffle load for a hot key spreads across k partitions at the
    cost of k× the dim side — the standard trade when one key holds >1/k
    of the data. Results are identical to the plain join (salt is internal)
    for ``how`` in ('inner', 'left'); 'right'/'full' would emit each
    unmatched dim row k times (it exists k ways pre-join), so those modes
    are rejected rather than silently wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "exploded dim side duplicates unmatched rows under right/full"
        )
    salted_fact = fact.withColumn(
        "__salt", (F.rand(42) * salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def enable_runtime_bloom_filters(
    spark: SparkSession,
    creation_side_threshold: str = "100MB",
    application_side_scan_threshold: str = "10GB",
) -> None:
    """Turn on Catalyst's runtime bloom-filter join pruning (module doc).

    ``creation_side_threshold``: max estimated size of the FILTERED side a
    bloom filter will be built from (building costs one pass over it).
    ``application_side_scan_threshold``: min scan size of the pruned side —
    below this the shuffle is cheap enough that the filter isn't worth its
    build. Defaults suit a warehouse where dims are ≤100 MB filtered and
    facts are ≥10 GB; local tests lower the application threshold because
    the corpus is tiny. Runtime-settable, harmless to call repeatedly.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_side_threshold,
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        application_side_scan_threshold,
    )
