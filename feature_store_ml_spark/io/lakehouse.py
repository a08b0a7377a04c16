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


def _active_files(path: str) -> list[str]:
    """Replay the Delta JSON commit log and return live data-file paths.

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
                elif "add" in action:
                    live[action["add"]["path"]] = None
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    return [os.path.join(path, p) for p in live]


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
    files = _active_files(path)
    if not files:
        raise ValueError(
            f"{path}: snapshot is empty and the parquet fallback cannot "
            "produce a schema-only DataFrame"
        )
    return spark.read.parquet(*files)


def read_table_auto(spark: SparkSession, path: str) -> DataFrame:
    """Format sniffer: Delta if `_delta_log` is present, bare parquet
    otherwise — lets pipeline code take a path of either layout."""
    if is_delta_table(path):
        return read_delta(spark, path)
    return spark.read.parquet(path)
