"""Cross-format table conversion — metadata-only, zero data movement.

A Delta table and an Iceberg table are both "parquet files + a metadata
layer"; converting between them is writing the OTHER format's metadata
over the SAME files (the published Delta-UniForm / Apache XTable shape).
Cost is O(#files) driver-side footer/metadata work at any data size —
nothing is rewritten, so a 100 TB table converts in seconds.

Both converters are ONE-SHOT snapshots of the current table state: the
source format's log remains authoritative, and writes made through it
afterwards are NOT reflected in the converted metadata (re-run to
refresh, exactly like UniForm's per-commit metadata generation).

Fail-loud boundaries (state the other format cannot express faithfully):
- live row-level deletes (Delta deletion vectors / Iceberg delete files)
  — compact first, then convert;
- Delta column mapping (parquet carries physical names Iceberg field-id
  resolution knows nothing about without per-file id stamps);
- non-identity Iceberg partition transforms (Delta has no transform
  vocabulary);
- identity partition sources outside the writer's int/long/string set.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from . import avro_lite, iceberg, lakehouse, skipping


#: above this live-file count the converters' footer walk (stats, row
#: counts, sizes) runs as a Spark job instead of a driver loop — the same
#: crossover discipline as prune_adds_auto's distributed scan planning
_DISTRIBUTED_STATS_THRESHOLD = 10_000


def _gather_file_stats(
    spark: SparkSession,
    paths: list[str],
    fields: list[dict],
    threshold: int,
) -> dict:
    """Per-file footer harvest for conversion: {abs_path: (num_rows,
    size_bytes, iceberg_stats_maps, delta_stats_json)}. Driver loop below
    ``threshold`` files; above it, one Arrow-batched Spark job (each file
    is independent footer IO — embarrassingly parallel), with results
    pickled per file because the Iceberg bounds are raw bytes."""

    def one(p: str):
        import os as _os

        import pyarrow.parquet as _pq

        n = _pq.ParquetFile(p).metadata.num_rows
        return (
            int(n),
            _os.path.getsize(p),
            iceberg._file_stats_maps(p, fields),
            skipping.collect_file_stats(p),
        )

    if len(paths) < threshold:
        return {p: one(p) for p in paths}

    import base64
    import pickle

    flds = list(fields)

    def batch(it):
        import pandas as pd

        from feature_store_ml_spark.io import iceberg as _i
        from feature_store_ml_spark.io import skipping as _sk

        for pdf in it:
            blobs = []
            for p in pdf["path"]:
                import os as _os

                import pyarrow.parquet as _pq

                n = _pq.ParquetFile(p).metadata.num_rows
                v = (
                    int(n),
                    _os.path.getsize(p),
                    _i._file_stats_maps(p, flds),
                    _sk.collect_file_stats(p),
                )
                blobs.append(
                    base64.b64encode(pickle.dumps((p, v))).decode()
                )
            yield pd.DataFrame({"blob": blobs})

    n_parts = max(32, len(paths) // 2000)
    rows = (
        spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(n_parts)
        .mapInPandas(batch, "blob string")
        .collect()
    )
    out = {}
    for r in rows:
        p, v = pickle.loads(base64.b64decode(r["blob"]))
        out[p] = v
    return out


def convert_delta_to_iceberg(
    spark: SparkSession, path: str, refresh: bool = False,
    stats_threshold: int = _DISTRIBUTED_STATS_THRESHOLD,
) -> int:
    """Write Iceberg metadata (``metadata/`` + manifests) over a Delta
    table's CURRENT live file set, in place — after this, the same
    directory reads as either format (`read_delta` and `read_iceberg`
    return identical rows). ``refresh=True`` re-syncs an already
    converted table after NEW Delta commits (the per-commit UniForm
    shape): the next metadata version appends one snapshot holding the
    current live set, field ids stay STABLE by column name, and prior
    Iceberg snapshots remain time-travelable. Returns the snapshot id."""
    import time as _time
    import uuid

    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType

    if not lakehouse.is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    prior_ice: dict | None = None
    if os.path.exists(os.path.join(path, "metadata")):
        if not refresh:
            raise ValueError(
                f"{path}: metadata/ already exists — pass refresh=True to "
                "re-sync the Iceberg view after new Delta commits"
            )
        prior_ice = iceberg._load_metadata(path)
    adds_map, meta = lakehouse._replay_log_adds(path)
    if not meta.get("schemaString"):
        raise ValueError(f"{path}: table declares no schema")
    conf = meta.get("configuration") or {}
    if conf.get("delta.columnMapping.mode") in ("name", "id"):
        raise NotImplementedError(
            f"{path}: column-mapped Delta tables cannot convert — parquet "
            "carries physical names the Iceberg schema would not resolve"
        )
    dv_files = [r for r, a in adds_map.items() if a.get("deletionVector")]
    if dv_files:
        raise ValueError(
            f"{path}: {len(dv_files)} file(s) carry live deletion vectors "
            "— run compact_delta first so the converted snapshot cannot "
            "resurrect deleted rows"
        )
    declared = StructType.fromJson(json.loads(meta["schemaString"]))
    prior_fid: dict[str, int] = {}
    if prior_ice is not None:
        prior_fid = {
            f["name"]: f["id"]
            for f in iceberg._current_schema(prior_ice).get("fields", [])
            if "id" in f
        }
    next_id = max(prior_fid.values(), default=0)
    fields = []
    for f in declared.fields:
        ice_t = iceberg._spark_to_ice_type(f.dataType.simpleString())
        if ice_t is None:
            raise NotImplementedError(
                f"{path}: column {f.name!r} has spark type "
                f"{f.dataType.simpleString()!r} with no iceberg primitive "
                "mapping in this writer"
            )
        if f.name in prior_fid:
            fid_val = prior_fid[f.name]  # column identity survives refresh
        else:
            next_id += 1
            fid_val = next_id
        fields.append(
            {"id": fid_val, "name": f.name, "required": False, "type": ice_t}
        )
    fid = {f["name"]: f["id"] for f in fields}
    ice_type = {f["name"]: f["type"] for f in fields}
    part_cols = meta.get("partitionColumns") or []
    for c in part_cols:
        if c not in fid:
            raise ValueError(f"{path}: partition column {c!r} not in schema")
        if ice_type[c] not in iceberg._PARTITION_PARSERS:
            raise NotImplementedError(
                f"{path}: identity partition source type {ice_type[c]!r} "
                "unsupported (int/long/string only)"
            )
    spec_fields = [
        {
            "name": c,
            "transform": "identity",
            "source-id": fid[c],
            "field-id": 1000 + i,
        }
        for i, c in enumerate(part_cols)
    ]

    def _pval(c: str, v):
        if v is None:
            return None
        return int(v) if ice_type[c] in ("int", "long") else str(v)

    entries = []
    now_ms = int(_time.time() * 1000)
    if prior_ice is not None and prior_ice.get("snapshots"):
        snap_id = max(s["snapshot-id"] for s in prior_ice["snapshots"]) + 1
        seq = (prior_ice.get("last-sequence-number", 0) or 0) + 1
    else:
        snap_id = now_ms
        seq = 1
    ordered_adds = sorted(adds_map.items())
    for rel, _add in ordered_adds:
        if not os.path.exists(os.path.join(path, rel)):
            raise ValueError(f"{path}: live file missing on disk: {rel}")
    harvest = _gather_file_stats(
        spark,
        [os.path.join(path, rel) for rel, _ in ordered_adds],
        fields,
        stats_threshold,
    )
    for rel, add in ordered_adds:
        abs_p = os.path.join(path, rel)
        n_rows_h, size_h, ice_stats, _dstats = harvest[abs_p]
        stats = {}
        try:
            stats = json.loads(add.get("stats") or "{}")
        except (TypeError, ValueError):
            pass
        n_rows = stats.get("numRecords")
        if n_rows is None:
            n_rows = n_rows_h
        pvals = {
            c: _pval(c, (add.get("partitionValues") or {}).get(c))
            for c in part_cols
        }
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snap_id,
                "data_file": {
                    "content": 0,
                    "file_path": f"file:{abs_p}",
                    "file_format": "PARQUET",
                    "partition": pvals,
                    "record_count": int(n_rows),
                    "file_size_in_bytes": int(add.get("size") or size_h),
                    **ice_stats,
                },
            }
        )
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    partition_fields = [
        {"name": c, "type": ["null", ice_type[c]]} for c in part_cols
    ]
    manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    avro_lite.write_container(
        manifest, iceberg._manifest_entry_schema(2, partition_fields), entries
    )
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
    mf_schema = iceberg._manifest_file_schema(2)
    keep = {f["name"] for f in mf_schema["fields"]}
    entry = {
        "manifest_path": f"file:{manifest}",
        "manifest_length": os.path.getsize(manifest),
        "partition_spec_id": 0,
        "added_snapshot_id": snap_id,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
    }
    avro_lite.write_container(
        mlist, mf_schema, [{k: entry.get(k, 0) for k in keep}]
    )
    if prior_ice is not None:
        # REFRESH: next metadata version appends one 'replace'-style
        # snapshot (manifest list holds only the new manifest — the
        # current view IS the Delta live set); prior snapshots stay
        # time-travelable; a changed schema gets a fresh schema-id with
        # STABLE field ids by name
        prior_schemas = list(prior_ice.get("schemas") or [])
        prior_sid = prior_ice.get("current-schema-id", 0)
        prior_cur = iceberg._current_schema(prior_ice)
        same = [
            (f["name"], f["type"], f.get("id"))
            for f in prior_cur.get("fields", [])
        ] == [(f["name"], f["type"], f["id"]) for f in fields]
        if same:
            schemas, schema_id = prior_schemas, prior_sid
        else:
            schema_id = max(
                (s.get("schema-id", 0) for s in prior_schemas), default=0
            ) + 1
            schemas = prior_schemas + [
                {"schema-id": schema_id, "type": "struct", "fields": fields}
            ]
        snapshot = {
            "snapshot-id": snap_id,
            "parent-snapshot-id": prior_ice.get("current-snapshot-id"),
            "timestamp-ms": now_ms,
            "manifest-list": f"file:{mlist}",
            "summary": {"operation": "overwrite", "converted-from": "delta"},
            "schema-id": schema_id,
            "sequence-number": seq,
        }
        ice_meta = dict(prior_ice)
        ice_meta.update(
            {
                "last-updated-ms": now_ms,
                "last-column-id": max(f["id"] for f in fields),
                "schemas": schemas,
                "current-schema-id": schema_id,
                "current-snapshot-id": snap_id,
                "snapshots": list(prior_ice.get("snapshots") or [])
                + [snapshot],
                "snapshot-log": list(prior_ice.get("snapshot-log") or [])
                + [{"timestamp-ms": now_ms, "snapshot-id": snap_id}],
                "last-sequence-number": seq,
            }
        )
        if "schema" in ice_meta:
            ice_meta["schema"] = {"type": "struct", "fields": fields}
        iceberg._swap_metadata(path, ice_meta)
        return snap_id
    snapshot = {
        "snapshot-id": snap_id,
        "timestamp-ms": now_ms,
        "manifest-list": f"file:{mlist}",
        "summary": {"operation": "append", "converted-from": "delta"},
        "schema-id": 0,
        "sequence-number": seq,
    }
    ice_meta = {
        "format-version": 2,
        "table-uuid": str(__import__("uuid").uuid4()),
        "location": path,
        "last-updated-ms": now_ms,
        "last-column-id": max((f["id"] for f in fields), default=0),
        "schemas": [{"schema-id": 0, "type": "struct", "fields": fields}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 999 + len(spec_fields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {},
        "current-snapshot-id": snap_id,
        "snapshots": [snapshot],
        "snapshot-log": [{"timestamp-ms": now_ms, "snapshot-id": snap_id}],
        "last-sequence-number": 1,
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(ice_meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return snap_id


def convert_iceberg_to_delta(
    spark: SparkSession, path: str, refresh: bool = False,
    stats_threshold: int = _DISTRIBUTED_STATS_THRESHOLD,
) -> int:
    """Write a Delta log (``_delta_log/``) over an Iceberg table's CURRENT
    live file set, in place — the reverse direction. ``refresh=True``
    re-syncs an already converted table after NEW Iceberg snapshots: one
    Delta commit carrying the file-set diff (removes for files no longer
    live, adds for new ones) plus a re-emitted metaData when the schema
    changed — the same diff shape restore_delta commits. Returns the
    committed Delta version."""
    import time as _time

    from pyspark.sql.types import StructType  # noqa: F401  (doc symmetry)

    if not iceberg.is_iceberg_table(path):
        raise ValueError(f"{path}: not an Iceberg table")
    log_dir = os.path.join(path, "_delta_log")
    prior_delta = os.path.exists(log_dir)
    if prior_delta and not refresh:
        raise ValueError(
            f"{path}: _delta_log/ already exists — pass refresh=True to "
            "re-sync the Delta view after new Iceberg snapshots"
        )
    meta = iceberg._load_metadata(path)
    cur = meta.get("current-snapshot-id")
    if cur in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    data, deletes = iceberg._snapshot_scan_plan(meta, cur, path)
    if deletes:
        raise ValueError(
            f"{path}: {len(deletes)} live delete file(s) — run "
            "compact_iceberg first so the converted snapshot cannot "
            "resurrect deleted rows"
        )
    declared = iceberg._declared_spark_schema(meta)
    if declared is None:
        raise NotImplementedError(
            f"{path}: table schema holds types outside the primitive "
            "bridge — cannot express it as a Delta schemaString"
        )
    spec = next(
        (
            s
            for s in meta.get("partition-specs") or []
            if s.get("spec-id") == meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    fid_to_name = iceberg._field_id_map(meta)
    part_cols = []
    for pf in spec.get("fields") or []:
        t, _p = iceberg._parse_transform_spec_name(pf.get("transform", "identity"))
        if t != "identity":
            raise NotImplementedError(
                f"{path}: partition transform {pf.get('transform')!r} has "
                "no Delta equivalent — only identity partitions convert"
            )
        part_cols.append(fid_to_name.get(pf.get("source-id"), pf["name"]))
    root_abs = os.path.abspath(path)
    now_ms = int(_time.time() * 1000)
    prior_adds: dict[str, dict] = {}
    actions: list[dict] = []
    if prior_delta:
        prior_adds, prior_meta = lakehouse._replay_log_adds(path)
        same_meta = (
            prior_meta.get("schemaString") == declared.json()
            and (prior_meta.get("partitionColumns") or []) == part_cols
        )
        if not same_meta:
            actions.append(
                {
                    "metaData": {
                        **prior_meta,
                        "schemaString": declared.json(),
                        "partitionColumns": part_cols,
                    }
                }
            )
    else:
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": str(__import__("uuid").uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": declared.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                    "createdTime": now_ms,
                }
            },
        ]
    live_rels: set[str] = set()
    ordered = sorted(data, key=lambda e: e["path"])
    need_stats: list[str] = []
    for d in ordered:
        abs_p = os.path.abspath(d["path"])
        if not abs_p.startswith(root_abs + os.sep):
            raise NotImplementedError(
                f"{path}: data file outside the table root ({abs_p}) — "
                "a shallow clone's absolute references have no relative "
                "Delta path; convert the source table instead"
            )
        if not os.path.exists(abs_p):
            raise ValueError(f"{path}: live file missing on disk: {abs_p}")
        rel = os.path.relpath(abs_p, root_abs).replace(os.sep, "/")
        if rel not in prior_adds:
            need_stats.append(abs_p)
    harvest = _gather_file_stats(spark, need_stats, [], stats_threshold)
    for d in ordered:
        abs_p = os.path.abspath(d["path"])
        rel = os.path.relpath(abs_p, root_abs).replace(os.sep, "/")
        live_rels.add(rel)
        if rel in prior_adds:
            continue  # already live in the Delta view — no re-add
        _n, size_h, _ice, dstats = harvest[abs_p]
        pvals = {
            c: (None if v is None else str(v))
            for c, v in (d.get("partition") or {}).items()
        }
        add = {
            "path": rel,
            "partitionValues": {c: pvals.get(c) for c in part_cols},
            "size": size_h,
            "modificationTime": now_ms,
            "dataChange": True,
        }
        if dstats is not None:
            add["stats"] = dstats
        actions.append({"add": add})
    for rel in sorted(set(prior_adds) - live_rels):
        actions.append(
            {
                "remove": {
                    "path": rel,
                    "dataChange": True,
                    "deletionTimestamp": now_ms,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "CONVERT",
                "operationParameters": {"sourceFormat": "iceberg"},
            }
        }
    )
    if prior_delta:
        return lakehouse._commit(path, actions)
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, separators=(",", ":")) + "\n")
    return 0
