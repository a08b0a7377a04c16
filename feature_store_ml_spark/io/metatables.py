"""Metadata TABLES — the lakehouse introspection surface (Iceberg's
``table$snapshots`` / ``table$files`` / ``table$history`` / Delta's
``DESCRIBE DETAIL``) as plain DataFrames.

Operationally these are how a 100 TB table is run: snapshot growth drives
expiration schedules, the files view shows small-file pressure (feeds the
compaction decision), history is the audit trail. Everything here is
driver-side metadata already parsed by the readers — wrapped into
DataFrames so the rest of a pipeline can join/filter/aggregate it like
any other table.

All functions return eagerly-materialized local DataFrames (the metadata
is O(#snapshots + #files) driver rows by construction — the same rows any
engine's metadata table materializes for planning)."""

from __future__ import annotations

from ..localframe import local_rows_df

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "iceberg_snapshots",
    "iceberg_files",
    "iceberg_partitions",
    "iceberg_history",
    "iceberg_refs",
    "iceberg_manifests",
    "delta_history",
    "delta_detail",
    "delta_files",
]


def iceberg_snapshots(spark: SparkSession, path: str) -> DataFrame:
    """The ``$snapshots`` metadata table: one row per retained snapshot —
    (snapshot_id, parent_id, timestamp_ms, operation, sequence_number,
    summary JSON)."""
    from . import iceberg

    meta = iceberg._load_metadata(path)
    rows = [
        {
            "snapshot_id": s["snapshot-id"],
            "parent_id": s.get("parent-snapshot-id"),
            "timestamp_ms": s.get("timestamp-ms"),
            "operation": (s.get("summary") or {}).get("operation"),
            "sequence_number": s.get("sequence-number"),
            "summary": json.dumps(s.get("summary") or {}, sort_keys=True),
            "is_current": s["snapshot-id"] == meta.get("current-snapshot-id"),
        }
        for s in meta.get("snapshots", [])
    ]
    schema = (
        "snapshot_id long, parent_id long, timestamp_ms long, operation string, "
        "sequence_number long, summary string, is_current boolean"
    )
    return local_rows_df(spark, rows, schema)


def iceberg_files(spark: SparkSession, path: str, snapshot_id: int | None = None) -> DataFrame:
    """The ``$files`` metadata table: one row per live data/delete file of
    a snapshot — (file_path, content, record_count, file_size_in_bytes,
    sequence_number, partition JSON). Small-file pressure shows up as
    record_count/file_size percentiles; feed it to compact_iceberg."""
    from . import iceberg

    meta = iceberg._load_metadata(path)
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError(f"{path}: table has no current snapshot")
    data, deletes = iceberg._snapshot_scan_plan(meta, snapshot_id, path)
    rows = []
    for d in data:
        rows.append(
            {
                "file_path": d["path"],
                "content": "data",
                "record_count": d.get("record_count"),
                "file_size_in_bytes": (
                    os.path.getsize(d["path"]) if os.path.exists(d["path"]) else None
                ),
                "sequence_number": d.get("seq"),
                "partition": json.dumps(d.get("partition") or {}, sort_keys=True),
            }
        )
    for d in deletes:
        rows.append(
            {
                "file_path": d["path"],
                "content": "position_deletes" if d["kind"] == "pos" else "equality_deletes",
                "record_count": None,
                "file_size_in_bytes": (
                    os.path.getsize(d["path"]) if os.path.exists(d["path"]) else None
                ),
                "sequence_number": d.get("seq"),
                "partition": "{}",
            }
        )
    schema = (
        "file_path string, content string, record_count long, "
        "file_size_in_bytes long, sequence_number long, partition string"
    )
    return local_rows_df(spark, rows, schema)


def iceberg_partitions(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The ``$partitions`` metadata table: per-partition rollup of the
    files view — (partition JSON, file_count, record_count, total_bytes).
    The operational view behind compaction targeting (small-file pressure
    concentrates in hot partitions) and skew diagnosis."""
    from pyspark.sql import functions as F

    files = iceberg_files(spark, path, snapshot_id=snapshot_id)
    return (
        files.where(F.col("content") == "data")
        .groupBy("partition")
        .agg(
            F.count("*").alias("file_count"),
            F.sum("record_count").alias("record_count"),
            F.sum("file_size_in_bytes").alias("total_bytes"),
        )
    )


def iceberg_history(spark: SparkSession, path: str) -> DataFrame:
    """The ``$history`` metadata table: the snapshot-log — (timestamp_ms,
    snapshot_id, is_current_ancestor). Time travel resolves against
    exactly these rows."""
    from . import iceberg

    meta = iceberg._load_metadata(path)
    current = meta.get("current-snapshot-id")
    parents = {
        s["snapshot-id"]: s.get("parent-snapshot-id")
        for s in meta.get("snapshots", [])
    }
    ancestors = set()
    node = current
    while node is not None and node not in ancestors:
        ancestors.add(node)
        node = parents.get(node)
    rows = [
        {
            "timestamp_ms": e.get("timestamp-ms"),
            "snapshot_id": e.get("snapshot-id"),
            "is_current_ancestor": e.get("snapshot-id") in ancestors,
        }
        for e in meta.get("snapshot-log", [])
    ]
    return local_rows_df(spark, 
        rows, "timestamp_ms long, snapshot_id long, is_current_ancestor boolean"
    )


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """Delta's ``DESCRIBE HISTORY``: one row per retained JSON commit —
    (version, timestamp_ms, operation, operationParameters JSON,
    n_adds, n_removes). The audit trail the log IS; timestamp prefers
    commitInfo.inCommitTimestamp when the writer recorded it, mirroring
    timestamp time travel. Commits cleaned after checkpointing are
    absent — same retention honesty as everywhere else."""
    import os

    from . import lakehouse

    log = lakehouse._delta_log_dir(path)
    rows = []
    for name in sorted(os.listdir(log)):
        if not lakehouse._is_commit_json(name):
            continue
        v = int(name[:20])
        op, params, ts = None, None, None
        n_adds = n_removes = 0
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "commitInfo" in action:
                    ci = action["commitInfo"]
                    op = ci.get("operation")
                    params = json.dumps(
                        ci.get("operationParameters") or {}, sort_keys=True
                    )
                    ts = ci.get("inCommitTimestamp") or ci.get("timestamp")
                elif "add" in action and action["add"].get("dataChange", True):
                    n_adds += 1
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    n_removes += 1
        if ts is None:
            ts = int(os.path.getmtime(os.path.join(log, name)) * 1000)
        rows.append(
            {
                "version": v,
                "timestamp_ms": ts,
                "operation": op,
                "operationParameters": params,
                "n_adds": n_adds,
                "n_removes": n_removes,
            }
        )
    return local_rows_df(spark, 
        rows,
        "version long, timestamp_ms long, operation string, "
        "operationParameters string, n_adds int, n_removes int",
    )


def delta_detail(spark: SparkSession, path: str) -> DataFrame:
    """Delta's ``DESCRIBE DETAIL``: one row of table-level facts —
    (format, id, name, partitionColumns, numFiles, sizeInBytes,
    properties, minReaderVersion, minWriterVersion)."""
    from . import lakehouse

    adds, meta = lakehouse._replay_log_adds(path)
    protocol = lakehouse._current_protocol(path)
    row = {
        "format": (meta.get("format") or {}).get("provider", "parquet"),
        "id": meta.get("id"),
        "name": meta.get("name"),
        "partitionColumns": json.dumps(meta.get("partitionColumns") or []),
        "numFiles": len(adds),
        "sizeInBytes": sum(a.get("size", 0) for a in adds.values()),
        "properties": json.dumps(meta.get("configuration") or {}, sort_keys=True),
        "minReaderVersion": protocol.get("minReaderVersion"),
        "minWriterVersion": protocol.get("minWriterVersion"),
    }
    schema = (
        "format string, id string, name string, partitionColumns string, "
        "numFiles long, sizeInBytes long, properties string, "
        "minReaderVersion int, minWriterVersion int"
    )
    return local_rows_df(spark, [row], schema)


def delta_files(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """One row per live file of a Delta snapshot — (path, size_bytes,
    num_records, has_deletion_vector, partitionValues JSON, stats
    present). num_records comes from the add action's stats; files
    committed without stats show null."""
    from . import lakehouse

    adds, _meta = lakehouse._replay_log_adds(path, max_version=version)
    rows = []
    for rel, a in adds.items():
        st = a.get("stats")
        num = None
        if st:
            try:
                num = (json.loads(st) if isinstance(st, str) else st).get("numRecords")
            except (ValueError, TypeError):
                num = None
        rows.append(
            {
                "path": rel,
                "size_bytes": a.get("size"),
                "num_records": num,
                "has_deletion_vector": bool(a.get("deletionVector")),
                "partitionValues": json.dumps(
                    a.get("partitionValues") or {}, sort_keys=True
                ),
                "has_stats": st is not None,
            }
        )
    schema = (
        "path string, size_bytes long, num_records long, "
        "has_deletion_vector boolean, partitionValues string, has_stats boolean"
    )
    return local_rows_df(spark, rows, schema)


def iceberg_refs(spark: SparkSession, path: str) -> DataFrame:
    """The ``$refs`` metadata table: one row per named ref (tags pin
    training sets, branches are movable pointers), plus the implicit
    current-snapshot row — the view an expiration schedule consults to
    see what is protected."""
    from . import iceberg

    meta = iceberg._load_metadata(path)
    retained = {s["snapshot-id"] for s in meta.get("snapshots", [])}
    rows = [
        {
            "name": name,
            "type": r.get("type"),
            "snapshot_id": r.get("snapshot-id"),
            "retained": r.get("snapshot-id") in retained,
        }
        for name, r in sorted((meta.get("refs") or {}).items())
    ]
    cur = meta.get("current-snapshot-id")
    if cur not in (None, -1):
        rows.append(
            {
                "name": "(current)",
                "type": "head",
                "snapshot_id": cur,
                "retained": cur in retained,
            }
        )
    schema = "name string, type string, snapshot_id long, retained boolean"
    return local_rows_df(spark, rows, schema)


def iceberg_manifests(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """The ``$manifests`` metadata table: one row per manifest in a
    snapshot's manifest list — (path, length, content data|deletes,
    sequence_number, added_snapshot_id). Manifest counts and sizes drive
    the rewrite-manifests decision on tables with many small commits."""
    from . import avro_lite, iceberg

    meta = iceberg._load_metadata(path)
    sid = (
        snapshot_id
        if snapshot_id is not None
        else meta.get("current-snapshot-id")
    )
    snap = next(
        (s for s in meta.get("snapshots", []) if s["snapshot-id"] == sid),
        None,
    )
    if snap is None:
        raise ValueError(f"{path}: snapshot {sid} not in metadata")
    rows = [
        {
            "path": e.get("manifest_path"),
            "length": e.get("manifest_length"),
            "content": "deletes" if (e.get("content") or 0) == 1 else "data",
            "sequence_number": e.get("sequence_number"),
            "added_snapshot_id": e.get("added_snapshot_id"),
        }
        for e in avro_lite.read_container(
            iceberg._localize(snap["manifest-list"], path)
        )
    ]
    schema = (
        "path string, length long, content string, sequence_number long, "
        "added_snapshot_id long"
    )
    return local_rows_df(spark, rows, schema)
