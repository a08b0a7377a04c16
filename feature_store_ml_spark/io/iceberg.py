"""Pure-python Apache Iceberg v1/v2 metadata reader (SURVEY.md §2B E1
stretch — the reference has no lakehouse surface; this exists for the
100 TB north star where tables live behind a table format).

No iceberg-spark jar and no pyiceberg ship in this container, so the
snapshot is resolved from the PUBLIC table spec
(https://iceberg.apache.org/spec/) directly:

    metadata/vN.metadata.json   -> current snapshot, schema
    snapshot's manifest list    -> manifest file paths        (Avro)
    each manifest               -> data_file entries + status (Avro)

Avro parsing is `avro_lite` (driver-side, metadata-sized — the identical
material every Iceberg reader's planning phase parses). The surviving data
files are parquet and are scanned with the normal DISTRIBUTED reader, so
pushdown/pruning/codegen all apply; identity-partition source columns are
physically present in Iceberg data files (unlike Hive/Delta layouts), so
no path-based schema reconstruction is needed.

Fail-loud limits: format-version ≤ 2, no delete files (merge-on-read),
parquet data files only, reads the CURRENT snapshot (no time travel).
"""

from __future__ import annotations

import json
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from . import avro_lite

#: manifest-entry status values, per spec
_STATUS_DELETED = 2


def _localize(uri: str, table_root: str) -> str:
    """Iceberg metadata stores absolute URIs from the WRITER's filesystem
    (file:/..., s3://...). Re-root file/relative paths under the table dir
    so a relocated (copied) table still resolves; object-store URIs pass
    through untouched for the actual cluster's filesystem to handle."""
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        path = parsed.path or uri
        if os.path.exists(path):
            return path
        # relocated table: graft the metadata/ or data/ tail under table_root
        for marker in ("metadata", "data"):
            token = f"/{marker}/"
            if token in path:
                cand = os.path.join(table_root, marker, path.split(token, 1)[1])
                if os.path.exists(cand):
                    return cand
        return path
    return uri


def latest_metadata_path(table_root: str) -> str:
    """Resolve the current metadata JSON: version-hint.text when present
    (HadoopCatalog convention), else the highest vN/N-uuid metadata file."""
    meta_dir = os.path.join(table_root, "metadata")
    if not os.path.isdir(meta_dir):
        raise ValueError(f"{table_root}: no metadata/ dir — not an Iceberg table")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        for name in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            p = os.path.join(meta_dir, name)
            if os.path.exists(p):
                return p
    candidates = [
        n for n in os.listdir(meta_dir) if n.endswith(".metadata.json")
    ]
    if not candidates:
        raise ValueError(f"{table_root}: metadata/ has no *.metadata.json")

    def _version(name: str) -> int:
        head = name.split(".metadata.json")[0].lstrip("v").split("-")[0]
        return int(head) if head.isdigit() else -1

    return os.path.join(meta_dir, max(candidates, key=_version))


def is_iceberg_table(path: str) -> bool:
    try:
        latest_metadata_path(path)
        return True
    except ValueError:
        return False


def _load_metadata(table_root: str) -> dict:
    with open(latest_metadata_path(table_root)) as fh:
        meta = json.load(fh)
    fv = meta.get("format-version", 1)
    if fv > 2:
        raise NotImplementedError(f"{table_root}: iceberg format-version {fv} > 2")
    return meta


def _snapshot_files(meta: dict, snap_id: int, table_root: str) -> list[str]:
    """Live parquet data-file paths of one snapshot (manifest-list walk)."""
    snapshots = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    snap = snapshots.get(snap_id)
    if snap is None:
        raise ValueError(f"{table_root}: snapshot {snap_id} not in metadata")
    manifest_list = _localize(snap["manifest-list"], table_root)
    files: list[str] = []
    for entry in avro_lite.read_container(manifest_list):
        manifest_path = _localize(entry["manifest_path"], table_root)
        content = entry.get("content", 0) or 0
        if content == 1:
            raise NotImplementedError(
                f"{table_root}: DELETE manifests (merge-on-read v2 tables) "
                "are not supported — compact the table or read with the "
                "iceberg-spark runtime"
            )
        for m in avro_lite.read_container(manifest_path):
            if m.get("status") == _STATUS_DELETED:
                continue
            df_struct = m["data_file"]
            if (df_struct.get("content") or 0) != 0:
                raise NotImplementedError(
                    f"{table_root}: delete data_file entries are not supported"
                )
            fmt = (df_struct.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"{table_root}: {fmt} data files unsupported (parquet only)"
                )
            files.append(_localize(df_struct["file_path"], table_root))
    return files


def _live_data_files(table_root: str) -> list[str]:
    """Live parquet data-file paths of the CURRENT snapshot."""
    meta = _load_metadata(table_root)
    snap_id = meta.get("current-snapshot-id")
    if snap_id in (None, -1):
        return []
    return _snapshot_files(meta, snap_id, table_root)


def read_iceberg_changes(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Incremental consumption: rows in data files that joined the table
    between two snapshots (``from`` exclusive → ``to``/current inclusive) —
    the Iceberg twin of ``lakehouse.read_delta_changes``; checkpoint the
    snapshot id you processed, read only the diff next run.

    Append-only discipline enforced: if a file live at ``from`` is gone at
    ``to``, history was rewritten (compaction/delete) and the diff no
    longer equals "new rows" — fail loudly, re-read the snapshot."""
    meta = _load_metadata(path)
    to_id = to_snapshot_id if to_snapshot_id is not None else meta.get(
        "current-snapshot-id"
    )
    old = set(_snapshot_files(meta, from_snapshot_id, path))
    new = _snapshot_files(meta, to_id, path)
    gone = old - set(new)
    if gone:
        raise ValueError(
            f"{path}: {len(gone)} files live at snapshot {from_snapshot_id} "
            f"are gone at {to_id} — history rewritten; incremental read is "
            "ill-defined, re-read the full snapshot"
        )
    added = [f for f in new if f not in old]
    if not added:
        # empty frame with the table schema (declared in metadata json)
        from pyspark.sql.types import StructType

        schema_field = meta.get("schemas")
        current = None
        if schema_field:
            sid = meta.get("current-schema-id", 0)
            current = next((s for s in schema_field if s.get("schema-id") == sid), None)
        current = current or meta.get("schema")
        if current is None:
            raise ValueError(f"{path}: no new files and no declared schema")
        # iceberg primitive names -> spark JSON type names
        tmap = {"int": "integer", "timestamp": "timestamp_ntz", "timestamptz": "timestamp"}
        spark_fields = []
        for f in current["fields"]:
            t = f["type"]
            if not isinstance(t, str):
                raise NotImplementedError(
                    f"{path}: nested iceberg type in empty-diff schema: {t}"
                )
            spark_fields.append(
                {
                    "name": f["name"],
                    "type": tmap.get(t, t),
                    "nullable": not f.get("required", False),
                    "metadata": {},
                }
            )
        return spark.createDataFrame(
            [], StructType.fromJson({"type": "struct", "fields": spark_fields})
        )
    return spark.read.parquet(*added)


def read_iceberg(spark: SparkSession, path: str) -> DataFrame:
    """Read an Iceberg table: native `format("iceberg")` when a runtime jar
    is on the classpath, else the pure-python metadata walk + distributed
    parquet scan of the live file set."""
    try:
        return spark.read.format("iceberg").load(path)
    except Exception as exc:
        if "DATA_SOURCE_NOT_FOUND" not in str(exc) and "Failed to find" not in str(exc):
            raise
    files = _live_data_files(path)
    if not files:
        raise ValueError(
            f"{path}: current snapshot is empty — parquet fallback cannot "
            "produce a schema-only DataFrame"
        )
    return spark.read.parquet(*files)
