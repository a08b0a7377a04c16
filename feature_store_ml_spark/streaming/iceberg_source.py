"""Iceberg tables as a Structured Streaming SOURCE — the Iceberg twin of
streaming/delta_source (round 6). Same design: ``sync_iceberg_spool``
walks the snapshot history (via the manifest-list diff machinery
``read_iceberg_changes`` uses, with the same append-only fail-louds) and
links each newly committed data file into a spool directory consumed by a
plain ``readStream.parquet`` file source. Zero-copy: the spool holds
symlinks (metadata); data files are scanned in place by the distributed
parquet source. Because Iceberg keeps the SOURCE columns inside the data
files (unlike Hive/Delta directory layouts), PARTITIONED tables stream
too — nothing needs path reconstruction.

Fail-loud boundaries: history rewrites (files gone between snapshots),
any row-level delete files (a spool scan would resurrect masked rows),
and schema-evolved tables whose staged footers no longer match the
current column names (a name-based file-source read would NULL renamed
columns silently — the batch reader handles this via field-id grouping,
a file source cannot).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from ..io import iceberg as _ice


def sync_iceberg_spool(
    path: str, spool_dir: str, since_snapshot_id: int | None = None
) -> int:
    """Link data files committed after ``since_snapshot_id`` (None = from
    the beginning) into ``spool_dir``; return the current snapshot id to
    checkpoint for the next sync. Idempotent (deterministic link names,
    existing links skipped)."""
    meta = _ice._load_metadata(path)
    cur = meta.get("current-snapshot-id")
    if cur in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    new, new_deletes = _ice._snapshot_content(meta, cur, path)
    if new_deletes:
        raise ValueError(
            f"{path}: snapshot {cur} carries row-level delete files — "
            "tailing an append-only stream off this table would resurrect "
            "masked rows; compact (rewrite_data_files) first"
        )
    if since_snapshot_id is not None and since_snapshot_id != -1:
        if since_snapshot_id == cur:
            return cur
        old, _old_deletes = _ice._snapshot_content(
            meta, since_snapshot_id, path
        )
        gone = set(old) - set(new)
        if gone:
            raise ValueError(
                f"{path}: {len(gone)} files live at snapshot "
                f"{since_snapshot_id} are gone at {cur} — history "
                "rewritten (compaction/overwrite); the stream is "
                "ill-defined, restart from a full snapshot"
            )
        added = [f for f in new if f not in set(old)]
    else:
        added = list(new)
    added_local = [
        urlparse(f).path if urlparse(f).scheme in ("", "file") else f
        for f in added
    ]
    if any("://" in f for f in added_local):
        raise NotImplementedError(
            f"{path}: spool links need local paths; found object-store URIs"
        )
    _check_footers_match_schema(meta, added_local, path)
    os.makedirs(spool_dir, exist_ok=True)
    # snapshot ids are monotone (max+1 allocation), so prefixing with the
    # sync's snapshot id keeps discovery order aligned with commit order
    # across syncs; within one sync the sorted basenames are stable
    for i, src in enumerate(sorted(added_local)):
        link = os.path.join(
            spool_dir, f"{cur:020d}-{i:05d}-{os.path.basename(src)}"
        )
        if not os.path.lexists(link):
            os.symlink(os.path.abspath(src), link)
    return cur


def _check_footers_match_schema(
    meta: dict, files: list[str], path: str
) -> None:
    """Refuse to spool files whose footer column names no longer match the
    CURRENT schema (rename evolution): the file source resolves by NAME,
    so a renamed column would silently read as NULL. The batch reader
    (read_iceberg) handles these via field-id grouping — point users
    there."""
    from ..io.lakehouse import _group_files_by_field_ids

    cur = _ice._current_schema(meta)
    want = {
        f["id"]: f["name"] for f in cur.get("fields", []) if "id" in f
    }
    if not want:
        return
    for phys_by_fid, gfiles in _group_files_by_field_ids(files):
        for fid, phys in phys_by_fid.items():
            if fid in want and want[fid] != phys:
                raise NotImplementedError(
                    f"{path}: file {os.path.basename(gfiles[0])} stores "
                    f"field {fid} as {phys!r} but the current schema "
                    f"names it {want[fid]!r} (rename evolution) — the "
                    "file-source tail resolves by name; use batch "
                    "read_iceberg (field-id resolution) instead"
                )


def stream_from_iceberg(
    spark: SparkSession,
    path: str,
    spool_dir: str,
    since_snapshot_id: int | None = None,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, int]:
    """Tail an append-only Iceberg table as a real Structured Streaming
    DataFrame. Returns ``(streaming_df, synced_snapshot_id)`` — checkpoint
    the snapshot id alongside the sink and pass it back to resume."""
    snap = sync_iceberg_spool(path, spool_dir, since_snapshot_id)
    meta = _ice._load_metadata(path)
    schema = _ice._declared_spark_schema(meta)
    if schema is None:
        raise ValueError(
            f"{path}: table schema has types outside the reader's "
            "primitive mapping — cannot derive a streaming schema"
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(spool_dir), snap
