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

``local_rows_df`` goes one step further than an explicit slice count
(the round-15 first cut): when the row values convert cleanly to Arrow,
the frame is built as a ``pyarrow.Table`` and handed to
``createDataFrame``, which plans it as a pure-JVM ``LocalTableScan`` —
ZERO Python tasks per downstream action (measured ~0.13 s vs ~0.27 s
per action for the one-slice RDD form, and no Python-worker occupancy).
Anything Arrow cannot represent falls back to the RDD path with an
explicit small slice count. This is NOT a local[32] tune — the rows
here are driver-held metadata (O(#files) at most), and the fan-out for
heavy work happens in the explicit ``repartition(n)`` the heavy paths
already apply downstream of these frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession

#: rows per slice before adding parallelism — local metadata rows are
#: tiny; slicing exists only to bound single-task memory, not for speed
_ROWS_PER_SLICE = 10_000


#: DDL string -> StructType memo: _parse_datatype_string costs a py4j
#: round trip per call and the engine re-uses a small set of schema
#: strings (file lists, DV tables, pair maps) on every DML commit
_DDL_CACHE: dict[str, object] = {}


def _as_struct_type(spark: SparkSession, schema):
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        return schema
    if isinstance(schema, str):
        st = _DDL_CACHE.get(schema)
        if st is None:
            from pyspark.sql.types import _parse_datatype_string

            st = _parse_datatype_string(schema)
            _DDL_CACHE[schema] = st
        return st
    return None


def _has_session_tz_timestamp(dt) -> bool:
    """True when the type tree contains a session-timezone TIMESTAMP:
    the RDD path interprets naive datetimes in the SESSION timezone while
    the Arrow path pins them to UTC — divergent under a non-UTC session
    (the driver-robustness mode), so such frames keep the RDD path."""
    from pyspark.sql.types import (
        ArrayType,
        MapType,
        StructType,
        TimestampType,
    )

    if isinstance(dt, TimestampType):
        return True
    if isinstance(dt, StructType):
        return any(_has_session_tz_timestamp(f.dataType) for f in dt.fields)
    if isinstance(dt, ArrayType):
        return _has_session_tz_timestamp(dt.elementType)
    if isinstance(dt, MapType):
        return _has_session_tz_timestamp(dt.keyType) or _has_session_tz_timestamp(
            dt.valueType
        )
    return False


def _any_non_nullable(dt) -> bool:
    """True when the type tree declares any non-nullable member: the RDD
    path verifies nullability (createDataFrame verifySchema) while
    ``pa.array`` accepts None regardless, so such schemas keep the RDD
    path — the two construction paths must stay behavior-identical."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, StructType):
        return any(
            (not f.nullable) or _any_non_nullable(f.dataType)
            for f in dt.fields
        )
    if isinstance(dt, ArrayType):
        return (not dt.containsNull) or _any_non_nullable(dt.elementType)
    if isinstance(dt, MapType):
        return (
            (not dt.valueContainsNull)
            or _any_non_nullable(dt.keyType)
            or _any_non_nullable(dt.valueType)
        )
    return False


def _arrow_local_df(spark: SparkSession, rows: list, schema) -> "DataFrame | None":
    """Build the frame as a pyarrow Table (JVM LocalTableScan, no Python
    tasks at evaluation time) — None when the schema or the values do
    not convert exactly (caller falls back to the RDD path)."""
    try:
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema
    except ImportError:
        return None

    st = _as_struct_type(spark, schema)
    if st is None or _has_session_tz_timestamp(st) or _any_non_nullable(st):
        return None
    try:
        arrow_schema = to_arrow_schema(st)
        names = [f.name for f in st.fields]
        cols: list[list] = [[] for _ in names]
        for r in rows:
            if isinstance(r, dict):
                for i, n in enumerate(names):
                    cols[i].append(r.get(n))
            elif isinstance(r, Row):
                d = r.asDict()
                for i, n in enumerate(names):
                    cols[i].append(d.get(n))
            else:
                if len(r) != len(names):
                    return None
                for i, v in enumerate(r):
                    cols[i].append(v)
        arrays = [
            pa.array(c, type=arrow_schema.field(i).type)
            for i, c in enumerate(cols)
        ]
        tbl = pa.Table.from_arrays(arrays, schema=arrow_schema)
        return spark.createDataFrame(tbl, schema=st)
    except (pa.ArrowException, ValueError, TypeError, OverflowError):
        # expected conversion misses (values outside the Arrow type's
        # domain, unrepresentable nesting) — the RDD path handles them.
        # Anything else (a pyarrow install problem, a to_arrow_schema
        # regression) propagates: a silent blanket fallback would let the
        # LocalTableScan optimization quietly stop applying.
        return None


def local_rows_df(
    spark: SparkSession,
    rows,
    schema,
    slices: int | None = None,
) -> DataFrame:
    """``createDataFrame`` for small driver-side row lists, planned as a
    JVM LocalTableScan when possible, else an RDD with an explicit,
    small slice count (see module docstring)."""
    rows = rows if isinstance(rows, list) else list(rows)
    df = _arrow_local_df(spark, rows, schema)
    if df is not None:
        return df
    if not rows:
        # 0-row frames: one empty slice, not defaultParallelism of them
        rdd = spark.sparkContext.parallelize([], 1)
        return spark.createDataFrame(rdd, schema)
    n = slices or max(1, len(rows) // _ROWS_PER_SLICE)
    rdd = spark.sparkContext.parallelize(rows, n)
    return spark.createDataFrame(rdd, schema)
