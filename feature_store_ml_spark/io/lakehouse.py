"""Lakehouse-format read paths (SURVEY.md §2B E1 stretch).

The reference has no lakehouse surface (its only IO is CSV/joblib,
/root/reference/src/main.py:15, model_saving.py:6-14); this module exists for
the 100 TB north star, where tables live in Delta Lake / Iceberg rather than
bare parquet directories.

The container ships no delta-spark / iceberg-spark jars, so `read_delta`
degrades gracefully: when `format("delta")` is unavailable it falls back to a
pure-python reader of the OPEN-SPEC Delta transaction log (the protocol is
published at https://github.com/delta-io/delta/blob/master/PROTOCOL.md —
JSON commit files under `_delta_log/` carrying `add` / `remove` actions with
data-file paths relative to the table root) and scans the resulting active
parquet file set with the normal parquet reader. Predicate pushdown, column
pruning and partition pruning all still apply — the fallback only resolves
WHICH files are live; the scan itself is a first-class parquet scan.

Limitations of the fallback (documented, fail-loud):
- JSON commits only; parquet checkpoint files (`*.checkpoint.parquet`) are
  not parsed. Tables whose older commits were compacted into a checkpoint
  raise rather than silently returning a partial snapshot.
- No time travel / versionAsOf (reads latest), no deletion vectors, no
  column mapping. Tables using those reader features raise via the
  protocol's `minReaderVersion` guard.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MAX_SUPPORTED_READER_VERSION = 1


def _delta_log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def is_delta_table(path: str) -> bool:
    """A directory is a Delta table iff it has a `_delta_log` dir with at
    least one version file — same probe DeltaTable.isDeltaTable uses."""
    log = _delta_log_dir(path)
    if not os.path.isdir(log):
        return False
    return any(name.endswith(".json") or ".checkpoint." in name for name in os.listdir(log))


def _replay_log(path: str) -> tuple[list[str], dict]:
    """Replay the Delta JSON commit log; return (live data-file paths,
    last metaData action).

    Actions are replayed in version order; `add` inserts a path, `remove`
    retires it (last action wins, per PROTOCOL.md action reconciliation).
    """
    log = _delta_log_dir(path)
    versions = sorted(
        name for name in os.listdir(log) if name.endswith(".json") and name[:20].isdigit()
    )
    if not versions:
        raise ValueError(f"{path}: _delta_log contains no JSON commits")
    if any(".checkpoint." in name for name in os.listdir(log)):
        raise NotImplementedError(
            f"{path}: table has checkpoint files; the pure-python fallback "
            "replays JSON commits only — read this table with the delta-spark "
            "package on the classpath"
        )
    live: dict[str, None] = {}
    meta: dict = {}
    for name in versions:
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    v = action["protocol"].get("minReaderVersion", 1)
                    if v > _MAX_SUPPORTED_READER_VERSION:
                        raise NotImplementedError(
                            f"{path}: minReaderVersion={v} needs reader features "
                            "(deletion vectors / column mapping) the fallback "
                            "does not implement"
                        )
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    live[action["add"]["path"]] = None
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    return [os.path.join(path, p) for p in live], meta


def _active_files(path: str) -> list[str]:
    return _replay_log(path)[0]


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Read a Delta table: native `format("delta")` when the jar is present,
    else the pure-python log replay + parquet scan fallback.

    An empty snapshot (all files removed) still returns a DataFrame with the
    table schema when the native reader is available; the fallback raises —
    parquet needs at least one file to carry a schema.
    """
    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table (no _delta_log)")
    try:
        return spark.read.format("delta").load(path)
    except Exception as exc:  # jar absent → DATA_SOURCE_NOT_FOUND at plan time
        if "DATA_SOURCE_NOT_FOUND" not in str(exc) and "Failed to find" not in str(exc):
            raise
    files, meta = _replay_log(path)
    if not files:
        raise ValueError(
            f"{path}: snapshot is empty and the parquet fallback cannot "
            "produce a schema-only DataFrame"
        )
    part_cols = meta.get("partitionColumns") or []
    if not part_cols:
        return spark.read.parquet(*files)
    # Partitioned table: partition values live in file PATHS (Hive layout)
    # or the log's add.partitionValues, NOT in the parquet files — a bare
    # multi-file read would silently return a schema MISSING those columns.
    # When the layout is Hive-style (delta-spark's writer default), a
    # basePath read recovers them; otherwise fail loudly rather than hand
    # back the wrong schema.
    rel = [os.path.relpath(f, path) for f in files]
    hive_style = all(
        all(f"{c}=" in r.split(os.sep)[i] for i, c in enumerate(part_cols))
        for r in rel
        if len(r.split(os.sep)) > len(part_cols)
    ) and all(len(r.split(os.sep)) > len(part_cols) for r in rel)
    if not hive_style:
        raise NotImplementedError(
            f"{path}: partitioned Delta table ({part_cols}) without "
            "Hive-style directory layout — the fallback cannot reconstruct "
            "partition columns; read with delta-spark on the classpath"
        )
    df = spark.read.option("basePath", path).parquet(*files)
    # align column order and partition-column types with the declared schema
    # (directory-derived values are type-INFERRED and land at the end)
    try:
        schema = json.loads(meta["schemaString"])
        names = [f["name"] for f in schema["fields"]]
        types = {f["name"]: f["type"] for f in schema["fields"]}
        from pyspark.sql import functions as F

        return df.select(
            *[
                F.col(c).cast(types[c]).alias(c) if c in part_cols and isinstance(types[c], str) else F.col(c)
                for c in names
            ]
        )
    except (KeyError, ValueError, TypeError):
        return df


def read_table_auto(spark: SparkSession, path: str) -> DataFrame:
    """Format sniffer: Delta if `_delta_log` is present, bare parquet
    otherwise — lets pipeline code take a path of either layout."""
    if is_delta_table(path):
        return read_delta(spark, path)
    return spark.read.parquet(path)
