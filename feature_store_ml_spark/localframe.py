"""Small driver-side DataFrames with bounded task fan-out.

``spark.createDataFrame(<local rows>)`` parallelizes the rows into
``defaultParallelism`` slices — on a 32-core master that is 32 near-empty
partitions, and every *action* that re-evaluates the frame schedules 32
tasks, each paying a Python-worker round trip (the local rows are pickled
Python objects, so the ExistingRDD conversion runs in Python workers).
Measured on this harness: a 2-row frame costs ~1.6 s per action at 32
slices vs ~0.4 s at one slice. Engine-internal metadata frames (file
lists, path mappings, DV blob tables, single-row results) are evaluated
once per downstream job, so the waste multiplies across a DML lifecycle.

``local_rows_df`` is the drop-in replacement: explicit slice count,
defaulting to one slice per 10k rows. This is NOT a local[32] tune — the
rows here are driver-held metadata (O(#files) at most), and on a real
cluster the same single-digit slice count is correct: the fan-out for
heavy work happens in the explicit ``repartition(n)`` the heavy paths
already apply downstream of these frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: rows per slice before adding parallelism — local metadata rows are
#: tiny; slicing exists only to bound single-task memory, not for speed
_ROWS_PER_SLICE = 10_000


def local_rows_df(
    spark: SparkSession,
    rows,
    schema,
    slices: int | None = None,
) -> DataFrame:
    """``createDataFrame`` for small driver-side row lists with an
    explicit, small slice count (see module docstring)."""
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # 0-row frames: one empty slice, not defaultParallelism of them
        rdd = spark.sparkContext.parallelize([], 1)
        return spark.createDataFrame(rdd, schema)
    n = slices or max(1, len(rows) // _ROWS_PER_SLICE)
    rdd = spark.sparkContext.parallelize(rows, n)
    return spark.createDataFrame(rdd, schema)
