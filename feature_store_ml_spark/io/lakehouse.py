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

The fallback reader supports time travel (version + timestamp), deletion
vectors, column mapping (BOTH name and ID mode, partitioned included),
CHECK constraints, checkpoints (classic AND v2Checkpoints — a checkpoint
is itself parquet holding the reconciled action state, parsed driver-side
with pyarrow, then later JSON commits are replayed on top), change feeds,
non-Hive partition layouts (add-action partitionValues are authoritative),
row tracking, identity columns, type widening, constraints, clones, and
per-file stats-based data skipping (io/skipping.py).

Remaining fail-loud refusals (each raises via the protocol guard or an
explicit NotImplementedError rather than returning wrong rows; the
canonical inventory lives in STATUS.md "Remaining loud refusals" and
tests/test_header_drift.py keeps this header honest): byte/short ->
decimal type widening; MERGE on IDENTITY key columns / SET on an
identity column; row tracking or identity columns combined with column
mapping; writer features beyond the supported protocol versions.
"""

from __future__ import annotations

from ..localframe import local_rows_df

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from . import nativesrc as _nativesrc
from . import skipping

_MAX_SUPPORTED_READER_VERSION = 1


class _FallbackWriter(Exception):
    """Control-flow sentinel: route write_delta straight to the
    pure-python log writer (native delta jar path not applicable)."""


def _delta_log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _is_commit_json(name: str) -> bool:
    """True iff ``name`` is a Delta commit file (``<20-digit version>.json``
    exactly, per PROTOCOL.md). Deliberately a fullmatch: V2-checkpoint JSON
    manifests (``<v>.checkpoint.<uuid>.json``) and log-compaction files
    (``<lo>.<hi>.compacted.json``) both start with 20 digits and end in
    ``.json``, and treating either as a commit mis-replays — or, in
    ``cleanup_delta_log``, deletes — live metadata on foreign-written
    tables."""
    return bool(_COMMIT_JSON_RE.fullmatch(name))


_COMMIT_JSON_RE = re.compile(r"\d{20}\.json")


def is_delta_table(path: str) -> bool:
    """A directory is a Delta table iff it has a `_delta_log` dir with at
    least one version file — same probe DeltaTable.isDeltaTable uses."""
    log = _delta_log_dir(path)
    if not os.path.isdir(log):
        return False
    return any(name.endswith(".json") or ".checkpoint." in name for name in os.listdir(log))


def _latest_checkpoint(log: str) -> tuple[int, list[str]]:
    """Locate the newest checkpoint: returns (version, manifest files).
    Handles single-file ``<v>.checkpoint.parquet``, multi-part
    ``<v>.checkpoint.<i>.<n>.parquet``, and V2 UUID-named
    ``<v>.checkpoint.<uuid>.{parquet,json}`` manifests (whose sidecars
    are resolved during replay). (-1, []) when none exist."""
    parts: dict[int, list[str]] = {}
    for name in os.listdir(log):
        if ".checkpoint." not in name or not (
            name.endswith(".parquet") or name.endswith(".json")
        ):
            continue
        head = name.split(".checkpoint.", 1)[0]
        if head.isdigit():
            parts.setdefault(int(head), []).append(name)
    if not parts:
        return -1, []
    v = max(parts)
    return v, sorted(os.path.join(log, n) for n in parts[v])


#: reader features the fallback actually implements; a protocol action
#: demanding anything else fails loudly (minReaderVersion 3 lists its
#: features explicitly, per PROTOCOL.md §Table Features)
_SUPPORTED_READER_FEATURES = {
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
    # timestampNtz: the fallback reads with the DECLARED schema, and Spark
    # handles timestamp_ntz natively — nothing extra to implement
    "timestampNtz",
    # vacuumProtocolCheck: constrains VACUUM implementations, not reads;
    # by spec a reader supports it by doing nothing special at read time
    "vacuumProtocolCheck",
    # typeWidening: files written before an ALTER COLUMN TYPE keep the
    # narrow physical type; every scan in this module reads with the
    # DECLARED schema, and Spark 4's parquet reader performs the spec's
    # widening promotions (int->long/double, float->double, decimal
    # precision/scale growth, int->decimal, date->timestamp_ntz) inside
    # the vectorized reader — verified empirically, no extra work here
    "typeWidening",
    # variantType (round 13): scans read with the DECLARED schema and
    # Spark 4's native VariantType parquet reader decodes the binary
    # encoding (shredded and unshredded alike) — nothing extra here
    "variantType",
}


def _check_protocol(path: str, protocol: dict) -> None:
    v = protocol.get("minReaderVersion", 1) or 1
    if v <= _MAX_SUPPORTED_READER_VERSION:
        return
    if v == 2:
        # reader v2 = column mapping may be present; the scan handles NAME
        # mode and fails loudly on ID mode (parquet field-id matching)
        return
    if v == 3 and protocol.get("readerFeatures") is not None:
        unsupported = set(protocol["readerFeatures"]) - _SUPPORTED_READER_FEATURES
        if not unsupported:
            return
        raise NotImplementedError(
            f"{path}: reader features {sorted(unsupported)} are not "
            "implemented in the fallback"
        )
    # v==3 without a readerFeatures list is out-of-spec (the list is
    # mandatory at that version) — refuse rather than guess
    raise NotImplementedError(
        f"{path}: minReaderVersion={v} needs reader features "
        "(column mapping / v2 checkpoints / ...) the fallback does not implement"
    )


def _replay_checkpoint(files: list[str], path: str) -> tuple[dict, dict]:
    """Load a checkpoint's reconciled state driver-side with pyarrow —
    CLASSIC (single/multipart parquet of action structs) and V2
    (PROTOCOL.md §V2 Checkpoints: a json-or-parquet MANIFEST carrying
    checkpointMetadata + `sidecar` pointers to parquet files under
    ``_delta_log/_sidecars/`` that hold the file actions). Metadata-only
    and O(#files + #sidecars) — the same driver work any Delta reader's
    snapshot build does. Returns (live relpath -> add action, metaData)."""
    import pyarrow.parquet as pq

    log = _delta_log_dir(path)
    live: dict[str, dict] = {}
    meta: dict = {}

    def _rows(f: str) -> list[dict]:
        if f.endswith(".json"):  # v2 manifests may be JSON-lines
            with open(f, encoding="utf-8") as fh:
                return [json.loads(line) for line in fh if line.strip()]
        return pq.read_table(f).to_pylist()

    def _fold(row: dict) -> None:
        nonlocal meta
        protocol = row.get("protocol")
        if protocol and protocol.get("minReaderVersion") is not None:
            _check_protocol(path, protocol)
        md = row.get("metaData")
        if md and md.get("id") is not None:
            meta = {k: v for k, v in md.items() if v is not None}
        add = row.get("add")
        if add and add.get("path") is not None:
            add = {k: v for k, v in add.items() if v is not None}
            if add.get("deletionVector"):
                add["deletionVector"] = {
                    k: v
                    for k, v in add["deletionVector"].items()
                    if v is not None
                }
            live[add["path"]] = add
        # remove actions in a checkpoint are vacuum tombstones — the
        # add set is already reconciled; nothing to subtract.
        sc = row.get("sidecar")
        if sc and sc.get("path"):
            sp = sc["path"]
            # real Delta writers record URI-form paths ("file:///..."); strip
            # a file: scheme before the local existence check so valid tables
            # don't trip the corrupt-log guard (mirrors iceberg._localize)
            if sp.startswith("file:"):
                from urllib.parse import urlparse

                sp = urlparse(sp).path or sp
            if "://" not in sp and not os.path.isabs(sp):
                sp = os.path.join(log, "_sidecars", sp)
            if not os.path.exists(sp):
                raise ValueError(
                    f"{path}: v2 checkpoint references missing sidecar "
                    f"{os.path.basename(sp)} — the log is corrupt or "
                    "partially cleaned"
                )
            for srow in pq.read_table(sp).to_pylist():
                _fold(srow)

    for f in files:
        for row in _rows(f):
            _fold(row)
    return live, meta


def _replay_log_adds(
    path: str, max_version: int | None = None
) -> tuple[dict, dict]:
    """Replay the Delta transaction log; return (live relpath -> add
    action, last metaData action). The full add action is kept because a
    file's DELETION VECTOR rides on it — "last add per path wins"
    reconciliation means a DV update is just a re-add of the same path.

    Snapshot = newest checkpoint (reconciled parquet state) + JSON commits
    AFTER it, replayed in version order; `add` inserts a path, `remove`
    retires it (last action wins, per PROTOCOL.md action reconciliation).
    ``max_version`` stops the replay at that commit (time travel); a
    checkpoint NEWER than max_version cannot be used (its state already
    contains later commits), so the full JSON history must still exist —
    fail-loud otherwise.
    """
    log = _delta_log_dir(path)
    ckpt_version, ckpt_files = _latest_checkpoint(log)
    if max_version is not None and ckpt_version > max_version:
        ckpt_version, ckpt_files = -1, []  # replay from JSON only
    live: dict[str, dict] = {}
    meta: dict = {}
    if ckpt_files:
        live, meta = _replay_checkpoint(ckpt_files, path)
    all_json = sorted(
        name
        for name in os.listdir(log)
        if _is_commit_json(name)
    )
    if max_version is not None:
        if not any(int(n[:20]) == max_version for n in all_json):
            raise ValueError(
                f"{path}: version {max_version} not in the log "
                f"(earliest JSON commit: {all_json[0][:20] if all_json else 'none'})"
            )
        if all_json and int(all_json[0][:20]) > 0 and not ckpt_files:
            raise ValueError(
                f"{path}: cannot time-travel to {max_version} — commits "
                "before the retained checkpoint were cleaned up"
            )
    versions = [
        name
        for name in all_json
        if int(name[:20]) > ckpt_version
        and (max_version is None or int(name[:20]) <= max_version)
    ]
    if not versions and not ckpt_files:
        raise ValueError(f"{path}: _delta_log contains no JSON commits")
    for name in versions:
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    _check_protocol(path, action["protocol"])
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    p = action["remove"]["path"]
                    if p in live:
                        live.pop(p)
                    else:
                        # a SHALLOW CLONE's adds carry absolute source
                        # paths while a later rewrite records its removes
                        # relative to the clone root ('../src/...') —
                        # reconcile by resolved identity, not string
                        # equality, or the clone's mutation would
                        # duplicate rows
                        want = os.path.normpath(os.path.join(path, p))
                        for k in list(live):
                            if os.path.normpath(os.path.join(path, k)) == want:
                                live.pop(k)
                                break
    return live, meta


def _replay_log(path: str, max_version: int | None = None) -> tuple[list[str], dict]:
    """(live absolute data-file paths, last metaData) — the path-only view
    of _replay_log_adds for callers that don't need per-add details."""
    adds, meta = _replay_log_adds(path, max_version)
    return [os.path.join(path, p) for p in adds], meta


def _active_files(path: str) -> list[str]:
    return _replay_log(path)[0]


def _mapping_mode(meta: dict) -> str | None:
    """The table's column-mapping mode: None (unmapped), 'name' (match
    parquet columns by recorded physicalName) or 'id' (match by parquet
    field id). Unknown modes fail loudly."""
    mode = (meta.get("configuration") or {}).get("delta.columnMapping.mode")
    if not mode or mode == "none":
        return None
    if mode not in ("name", "id"):
        raise NotImplementedError(
            f"column mapping mode {mode!r} is not implemented"
        )
    return mode


def _column_mapping(meta: dict) -> dict[str, str] | None:
    """Logical -> physical column-name map when the table uses COLUMN
    MAPPING (PROTOCOL.md §Column Mapping) in NAME mode: parquet files
    store opaque physical names recorded in each schema field's
    ``delta.columnMapping.physicalName`` metadata, which is what makes
    zero-rewrite RENAME possible. None when the table is unmapped or in
    ID mode (handled by field-id matching in the scan instead)."""
    mode = _mapping_mode(meta)
    if mode != "name":
        return None
    schema = json.loads(meta["schemaString"])
    out: dict[str, str] = {}
    for f in schema["fields"]:
        phys = (f.get("metadata") or {}).get("delta.columnMapping.physicalName")
        if not phys:
            raise ValueError(
                f"column mapping is 'name' but field {f['name']!r} has no "
                "physicalName metadata — corrupt table metadata"
            )
        out[f["name"]] = phys
    return out


def _assign_nested_mapping_ids(type_json, ctr) -> None:
    """Walk a Delta JSON type assigning ``delta.columnMapping.id`` +
    ``physicalName`` to every nested StructField (round 14 — standard
    delta-spark stamps nested members too, and the Delta→Iceberg
    conversion derives Iceberg member ids from exactly this metadata).
    Member physicalName stays the member's OWN name: this writer never
    physically renames members, so files keep logical member names and
    name-resolution reads stay correct; only TOP-level columns get
    opaque physical names."""
    if not isinstance(type_json, dict):
        return
    if type_json.get("type") == "struct":
        for f in type_json.get("fields", []):
            md = dict(f.get("metadata") or {})
            md["delta.columnMapping.id"] = next(ctr)
            md["delta.columnMapping.physicalName"] = f["name"]
            f["metadata"] = md
            _assign_nested_mapping_ids(f.get("type"), ctr)
    elif type_json.get("type") == "array":
        _assign_nested_mapping_ids(type_json.get("elementType"), ctr)
    elif type_json.get("type") == "map":
        _assign_nested_mapping_ids(type_json.get("keyType"), ctr)
        _assign_nested_mapping_ids(type_json.get("valueType"), ctr)


def _field_ids(meta: dict) -> dict[str, int]:
    """Logical name -> delta.columnMapping.id for an ID-mode table."""
    schema = json.loads(meta["schemaString"])
    out: dict[str, int] = {}
    for f in schema["fields"]:
        fid = (f.get("metadata") or {}).get("delta.columnMapping.id")
        if fid is None:
            raise ValueError(
                f"column mapping is 'id' but field {f['name']!r} has no "
                "columnMapping.id metadata — corrupt table metadata"
            )
        out[f["name"]] = int(fid)
    return out


def _physical_names(meta: dict) -> dict[str, str]:
    """Logical -> physicalName for a mapped table in EITHER mode (the spec
    records physicalName in both; ID mode merely resolves data columns by
    field id — partition directories and partitionValues still carry the
    physical names)."""
    schema = json.loads(meta["schemaString"])
    return {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in schema["fields"]
    }


def _stage_partition_names(meta: dict) -> dict[str, str]:
    """Logical -> the name a STAGING write's partition dirs must carry:
    physicalName when the table is column-mapped in EITHER mode (ID-mode
    partition directories and partitionValues use physical names exactly
    like name mode — resolving by field id is a data-column concept),
    identity otherwise. ``_column_mapping(meta) or {}`` is WRONG here: it
    deliberately returns None for ID mode, which left ID-mode partitioned
    DML staging under logical names that don't exist in the physical
    frame."""
    if meta.get("schemaString") and _mapping_mode(meta):
        return _physical_names(meta)
    return {}


def _manifest_rows(f: str, log: str, follow_sidecars: bool = False):
    """Action rows of one checkpoint manifest file — parquet or the V2
    JSON-lines form (both are legal manifests; callers that assumed
    parquet crashed on foreign kernel-written tables). With
    ``follow_sidecars`` the referenced sidecar files' rows are appended —
    the spec keeps protocol/metaData in the manifest proper but allows
    add/remove/txn to live in sidecars."""
    import pyarrow.parquet as pq

    if f.endswith(".json"):
        with open(f, encoding="utf-8") as fh:
            rows = [json.loads(line) for line in fh if line.strip()]
    else:
        rows = pq.read_table(f).to_pylist()
    if follow_sidecars:
        for row in list(rows):
            sc = row.get("sidecar")
            if sc and sc.get("path"):
                sp = sc["path"]
                if sp.startswith("file:"):
                    from urllib.parse import urlparse

                    sp = urlparse(sp).path or sp
                if "://" not in sp and not os.path.isabs(sp):
                    sp = os.path.join(log, "_sidecars", sp)
                if os.path.exists(sp):
                    rows.extend(pq.read_table(sp).to_pylist())
    return rows


#: above this file count, the footer fid-map probe runs as ONE Spark job
#: (mapInPandas over the paths) instead of a sequential driver loop —
#: the engine's last serial-driver scaling cliff on ID-mode / renamed /
#: defaulted-table scans (VERDICT r13 item 1). MEASURED on this harness
#: (local[32], warm page cache, 5k tiny files): the driver loop probes
#: ~24k local footers/s; the job costs ~0.7 s warm / ~3.4 s first-use
#: before its 32-way fan-out bites — local crossover lands around
#: 10-15k files, so a 10^6-file snapshot (the 100 TB case) probes ~15x
#: faster distributed. On an OBJECT STORE each footer is a network RTT
#: and the crossover drops orders of magnitude — callers there should
#: pass a much lower ``threshold``. Same threshold class as
#: skipping.DISTRIBUTED_PRUNE_THRESHOLD.
DISTRIBUTED_FOOTER_THRESHOLD = 10_000


def _footer_probe_one(
    path: str, nested: bool = False
) -> "tuple[dict[int, str] | None, list[str] | None]":
    """(field-id -> physical-name map, top-level column names) of ONE
    parquet footer — both ``None`` when pyarrow cannot decode the footer
    at all (VARIANT Thrift logical type, pyarrow 16). One footer read
    serves both consumers: the fid grouping AND the name-subset check
    streaming's ``_footers_mismatch_schema`` runs (which used to re-read
    every unstamped footer sequentially on the driver). ``nested=True``
    walks the full struct tree (the inner-rename resolution needs member
    ids); default is top-level only. Shared VERBATIM by the driver loop
    and the distributed mapInPandas branch so the two paths cannot
    drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # open via OSFile when the path is plain-local: read_schema(path)
    # pays a filesystem-resolution round per call (~1/3 of the probe,
    # measured 64us -> 42us per footer). Paths the OSFile cannot open
    # (URIs, object stores) fall back to the resolving form — only a
    # failed PARSE may classify a footer unreadable.
    try:
        fh = pa.OSFile(path, "rb")
    except Exception:
        try:
            schema = pq.read_schema(path)
        except Exception:
            return None, None
    else:
        try:
            with fh:
                schema = pq.read_schema(fh)
        except Exception:
            return None, None
    out: dict[int, str] = {}

    def walk(field):
        fid = (field.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            out[int(fid)] = field.name
        t = field.type
        if nested and hasattr(t, "num_fields"):
            for i in range(t.num_fields):
                walk(t.field(i))

    for f in schema:
        walk(f)
    return out, list(schema.names)


def _footer_fid_map(path: str, nested: bool = False) -> "dict[int, str] | None":
    """field-id -> physical-name map of ONE parquet footer; ``None`` when
    pyarrow cannot decode the footer (see _footer_probe_one)."""
    return _footer_probe_one(path, nested)[0]


def _footer_fid_maps(
    files: list[str],
    spark=None,
    nested: bool = False,
    threshold: "int | None" = None,
    with_names: bool = False,
):
    """{path: fid->name map | None(unreadable footer)} for every file —
    or, with ``with_names=True``, {path: (fid map | None, top-level
    column names | None)} from the SAME single footer read per file.
    Sequential driver loop below ``threshold`` files; above it (and with
    a session to use), ONE Arrow-batched Spark job — each file is an
    independent footer read, embarrassingly parallel. Job/driver
    agreement is property-tested (tests/test_footer_probe.py)."""
    limit = DISTRIBUTED_FOOTER_THRESHOLD if threshold is None else threshold
    if spark is None or len(files) <= limit:
        if with_names:
            return {f: _footer_probe_one(f, nested) for f in files}
        return {f: _footer_fid_map(f, nested) for f in files}

    nested_flag = bool(nested)

    def _probe(batches):
        import pandas as pd

        from feature_store_ml_spark.io.lakehouse import (
            _footer_probe_one as _m,
        )

        for pdf in batches:
            blobs = []
            nameblobs = []
            for pth in pdf["path"]:
                m, names = _m(pth, nested_flag)
                blobs.append(
                    None
                    if m is None
                    else json.dumps({str(k): v for k, v in m.items()})
                )
                nameblobs.append(
                    None if names is None else json.dumps(names)
                )
            yield pd.DataFrame(
                {"path": pdf["path"], "fids": blobs, "names": nameblobs}
            )

    n_parts = max(32, len(files) // 2000)
    pdf = (
        local_rows_df(spark, [(f,) for f in files], "path string")
        .repartition(n_parts)
        .mapInPandas(_probe, "path string, fids string, names string")
        # Arrow-batched transfer: row-pickle collect() costs ~30us/row of
        # driver-side deserialization at 10^5-file counts
        .toPandas()
    )
    out: dict = {}
    for pth, fj, nj in zip(pdf["path"], pdf["fids"], pdf["names"]):
        fids = (
            None
            if fj is None
            else {int(k): v for k, v in json.loads(fj).items()}
        )
        if with_names:
            out[pth] = (fids, None if nj is None else json.loads(nj))
        else:
            out[pth] = fids
    missing = [f for f in files if f not in out]
    if missing:
        raise RuntimeError(
            f"footer probe job returned no row for {len(missing)} files "
            f"(first: {missing[0]!r}) — path round-trip mismatch"
        )
    return out


def _group_files_by_field_ids(
    files: list[str],
    spark=None,
    nested: bool = False,
    threshold: "int | None" = None,
) -> list[tuple[dict[int, str], list[str]]]:
    """Read each parquet footer and group files by their
    field-id -> physical-column-name mapping. ID-mode tables resolve
    columns by field id, and a renamed column means files written at
    different times carry DIFFERENT physical names for the same id — one
    schema cannot describe them all, so the scan reads one group per
    distinct mapping and unions. The probe is a driver loop below
    DISTRIBUTED_FOOTER_THRESHOLD files and one Spark job above it (pass
    ``spark``); footers pyarrow cannot decode (VARIANT Thrift logical
    type) group as unstamped — they resolve by declared name, the same
    contract as pre-stamping writers."""
    maps = _footer_fid_maps(files, spark=spark, nested=nested, threshold=threshold)
    groups: dict[tuple, tuple[dict[int, str], list[str]]] = {}
    for f in files:
        phys_by_fid = maps[f] or {}
        key = tuple(sorted(phys_by_fid.items()))
        if key in groups:
            groups[key][1].append(f)
        else:
            groups[key] = (phys_by_fid, [f])
    return list(groups.values())


def _nested_spark_types():
    from pyspark.sql import types as T

    return (T.StructType, T.ArrayType, T.MapType)


def _to_physical(df: DataFrame, meta: dict) -> DataFrame:
    """Rename a LOGICAL-named frame to the table's physical column names
    before a staging write (no-op for unmapped tables) — data files must
    always carry physical names or every rename-so-far would corrupt.
    ID-mode tables additionally stamp every staged column with its
    ``parquet.field.id`` (via alias metadata — Spark's parquet writer
    copies it into the footer under fieldId.write.enabled, default on),
    so id-matched readers resolve the new files no matter what physical
    names they carry."""
    from pyspark.sql import functions as F

    if meta and meta.get("schemaString") and _mapping_mode(meta) == "id":
        fids = _field_ids(meta)
        mapping = _physical_names(meta)
        delta_fields = {
            f["name"]: f
            for f in json.loads(meta["schemaString"])["fields"]
        }
        if any(
            isinstance(f.dataType, _nested_spark_types())
            for f in df.schema.fields
        ):
            # NESTED columns (round 14): member ids stamp via df.to()
            # — alias metadata covers only top level; Spark's
            # fieldId.write copies nested StructField metadata into the
            # footers (the Iceberg stamp's twin), which is what lets
            # the Delta->Iceberg conversion prove member resolution
            from pyspark.sql import types as T

            def _stamped(spark_dt, delta_t):
                if isinstance(spark_dt, T.StructType) and isinstance(
                    delta_t, dict
                ):
                    by = {
                        g["name"]: g for g in delta_t.get("fields", [])
                    }
                    out = []
                    for sf in spark_dt.fields:
                        g = by.get(sf.name) or {}
                        gmd = g.get("metadata") or {}
                        mid = gmd.get("delta.columnMapping.id")
                        out.append(
                            T.StructField(
                                gmd.get(
                                    "delta.columnMapping.physicalName",
                                    sf.name,
                                ),
                                _stamped(sf.dataType, g.get("type")),
                                sf.nullable,
                                metadata={"parquet.field.id": int(mid)}
                                if mid is not None
                                else {},
                            )
                        )
                    return T.StructType(out)
                if isinstance(spark_dt, T.ArrayType) and isinstance(
                    delta_t, dict
                ):
                    return T.ArrayType(
                        _stamped(
                            spark_dt.elementType, delta_t.get("elementType")
                        ),
                        spark_dt.containsNull,
                    )
                if isinstance(spark_dt, T.MapType) and isinstance(
                    delta_t, dict
                ):
                    return T.MapType(
                        _stamped(spark_dt.keyType, delta_t.get("keyType")),
                        _stamped(
                            spark_dt.valueType, delta_t.get("valueType")
                        ),
                        spark_dt.valueContainsNull,
                    )
                return spark_dt

            fields = []
            for f in df.schema.fields:
                d = delta_fields.get(f.name) or {}
                fields.append(
                    T.StructField(
                        mapping.get(f.name, f.name),
                        _stamped(f.dataType, d.get("type")),
                        f.nullable,
                        metadata={"parquet.field.id": fids[f.name]}
                        if f.name in fids
                        else {},
                    )
                )
            # df.to() matches BY NAME — rename to physical first, then
            # attach the id metadata (a direct .to() with renamed
            # fields silently null-fills every column). TOP-level ids
            # ride the alias (df.to only applies metadata to columns it
            # REBUILDS — a plain long passes through and would lose its
            # id); nested member ids ride the .to().
            renamed = df.select(
                *[
                    F.col(c).alias(
                        mapping.get(c, c),
                        metadata={"parquet.field.id": fids[c]}
                        if c in fids
                        else {},
                    )
                    for c in df.columns
                ]
            )
            return renamed.to(T.StructType(fields))
        return df.select(
            *[
                F.col(c).alias(
                    mapping.get(c, c),
                    metadata={"parquet.field.id": fids[c]},
                )
                for c in df.columns
            ]
        )
    mapping = _column_mapping(meta)
    if not mapping:
        return df
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


#: writer features this module actually implements/enforces; a table
#: demanding anything else is refused BEFORE any bytes change
_SUPPORTED_WRITER_FEATURES = {
    "appendOnly",
    "checkConstraints",
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
    "typeWidening",
    # generatedColumns: every write path validates batches against
    # delta.generationExpression (_enforce_generated) per the spec's
    # compute-or-validate writer obligation
    "generatedColumns",
    # variantType (round 13): writers stage variant through Spark's own
    # parquet writer (the binary encoding is Spark's), and every write
    # path validates batches against the declared schema as usual
    "variantType",
    # identityColumns: appends GENERATE values (delta.identity.* field
    # metadata; high water mark advanced in the same commit from the
    # staged files' footer stats) — see write_delta(identity_columns=)
    "identityColumns",
    # invariants: legacy column-level NOT-violate expressions
    # (delta.invariants field metadata) — enforced by _enforce_constraints
    # on every write path, same probe as CHECK constraints
    "invariants",
    # allowColumnDefaults: CURRENT_DEFAULT field metadata — appends that
    # omit the column materialize the expression (_apply_write_defaults);
    # write-time only per spec, reads never substitute
    "allowColumnDefaults",
    # changeDataFeed: _write_change_data emits _change_data files on every
    # mutation when delta.enableChangeDataFeed=true; read_delta_cdf reads
    "changeDataFeed",
    # rowTracking + domainMetadata: stable row ids assigned at write time
    # (baseRowId + domain high water mark); see write_delta(row_tracking=)
    # and read_delta_row_ids. Rewriting operations that would need
    # MATERIALIZED row ids fail loudly instead (_check_write_allowed).
    "rowTracking",
    "domainMetadata",
    # inCommitTimestamp: _try_commit stamps a monotonic commitInfo
    # timestamp on every commit once the table enables it; time travel
    # prefers it over file mtimes (version_as_of_timestamp)
    "inCommitTimestamp",
    # clustering: the spec lets a writer ADD files without clustering
    # them as long as the delta.clustering domain metadata is preserved —
    # ours survives commits (separate actions) and checkpoints
    # (_domain_metadata carry); OPTIMIZE simply doesn't re-cluster
    "clustering",
}

#: features implied by each legacy writer version (PROTOCOL.md §Table
#: Features: upgrading to v7 must enumerate what the old version implied)
_LEGACY_WRITER_FEATURES = {
    2: ("appendOnly", "invariants"),
    3: ("checkConstraints",),
    4: ("changeDataFeed", "generatedColumns"),
    5: ("columnMapping",),
    6: ("identityColumns",),
}


def _protocol_as_features(proto: dict) -> tuple[set, set]:
    """(readerFeatures, writerFeatures) equivalent to ``proto`` — legacy
    versions expand to their implied feature lists; v7 lists pass
    through. Used when an operation must re-emit the protocol in table-
    features form without silently un-declaring active features."""
    rv = proto.get("minReaderVersion", 1) or 1
    wv = proto.get("minWriterVersion", 2) or 2
    if wv >= 7:
        return (
            set(proto.get("readerFeatures") or []),
            set(proto.get("writerFeatures") or []),
        )
    w: set = set()
    for v in range(2, min(wv, 6) + 1):
        w.update(_LEGACY_WRITER_FEATURES.get(v, ()))
    r = {"columnMapping"} if rv >= 2 else set()
    return r, w
_MAX_SUPPORTED_WRITER_VERSION = 6  # v6 = identity columns (implemented);
#                                    v7 = table features (list-checked above)


def _check_write_allowed(path: str, meta: dict, operation: str) -> dict:
    """Refuse to WRITE a table whose protocol demands writer behavior this
    module does not implement — writing anyway could silently violate an
    invariant some other reader depends on. Also enforces the behaviors we
    DO implement: ``delta.appendOnly`` tables reject every row-removing
    operation (overwrite / merge / delete / restore), per the spec.
    ``operation`` ∈ {append, overwrite, merge, delete, restore, optimize,
    metadata}. Returns the table's current protocol so callers that need
    it (row-tracking obligation checks) don't replay the log twice."""
    proto = _current_protocol(path)
    v = proto.get("minWriterVersion", 2) or 2
    if v == 7:
        unsupported = set(proto.get("writerFeatures") or []) - _SUPPORTED_WRITER_FEATURES
        if unsupported:
            raise NotImplementedError(
                f"{path}: writer features {sorted(unsupported)} are not "
                "implemented — refusing to write"
            )
    elif v > _MAX_SUPPORTED_WRITER_VERSION:
        raise NotImplementedError(
            f"{path}: minWriterVersion={v} demands writer behavior this "
            "module does not implement — refusing to write"
        )
    if (meta.get("configuration") or {}).get("delta.appendOnly") == "true":
        if operation in (
            "overwrite", "merge", "delete", "restore", "update", "replaceWhere",
        ):
            raise ValueError(
                f"{path}: table is delta.appendOnly=true — {operation} "
                "would remove rows; only appends are allowed"
            )
    # row-tracked and identity tables accept merge/update/replaceWhere:
    # the DML rewrites MATERIALIZE surviving row ids (same preservation
    # rule as compact_delta) and preserve/generate identity values — each
    # operation enforces its own residual constraints (e.g. a source
    # batch carrying a GENERATED ALWAYS column still refuses there)
    return proto


def _current_protocol(path: str) -> dict:
    """The table's latest protocol action (checkpoint + JSON tail replay —
    last wins). Defaults to the base 1/2 when none was ever written."""
    log = _delta_log_dir(path)
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    ckpt_version, ckpt_files = _latest_checkpoint(log)
    if ckpt_files:
        for f in ckpt_files:
            for row in _manifest_rows(f, log):
                p = row.get("protocol")
                if p and p.get("minReaderVersion") is not None:
                    proto = {k: v for k, v in p.items() if v is not None}
    for name in sorted(os.listdir(log)):
        if not (_is_commit_json(name)):
            continue
        if int(name[:20]) <= ckpt_version:
            continue
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    action = json.loads(line)
                    if "protocol" in action:
                        proto = action["protocol"]
    return proto


def _enforce_constraints(df: DataFrame, meta: dict, path: str) -> None:
    """Validate a batch against the table's CHECK constraints
    (PROTOCOL.md §CHECK Constraints: ``delta.constraints.<name>`` entries
    in metaData.configuration, writer-enforced). Delta semantics: a row
    passes when the expression is TRUE **or NULL**; only FALSE violates —
    so the probe filters on ``expr == false`` (null-safe by construction:
    a null comparison is null, and `where` drops it).

    One early-exit probe job per constraint (``limit(1)``): the first
    violating row aborts the write BEFORE any data is staged. Batches are
    the small side of an incremental pipeline; full-scan enforcement is
    what every constrained writer pays."""
    from pyspark.sql import functions as F

    conf = meta.get("configuration") or {}
    for key, expr in sorted(conf.items()):
        if not key.startswith("delta.constraints."):
            continue
        name = key[len("delta.constraints."):]
        bad = df.where(F.expr(expr) == F.lit(False)).limit(1).collect()
        if bad:
            raise ValueError(
                f"{path}: CHECK constraint {name!r} ({expr}) violated by "
                f"e.g. {bad[0].asDict()}"
            )
    # legacy column INVARIANTS (PROTOCOL.md §Column Invariants:
    # ``delta.invariants`` field metadata, writer-enforced from
    # minWriterVersion 2) — same FALSE-only-violates probe
    if meta.get("schemaString"):
        for f0 in json.loads(meta["schemaString"]).get("fields", []):
            inv = (f0.get("metadata") or {}).get("delta.invariants")
            if not inv:
                continue
            try:
                expr = json.loads(inv)["expression"]["expression"]
            except (TypeError, ValueError, KeyError):
                raise ValueError(
                    f"{path}: unparseable delta.invariants metadata on "
                    f"column {f0['name']!r}: {inv!r}"
                )
            bad = df.where(F.expr(expr) == F.lit(False)).limit(1).collect()
            if bad:
                raise ValueError(
                    f"{path}: column invariant on {f0['name']!r} ({expr}) "
                    f"violated by e.g. {bad[0].asDict()}"
                )


def _enforce_generated(df: DataFrame, meta: dict, path: str) -> None:
    """Validate a batch against GENERATED COLUMNS (PROTOCOL.md §Generated
    Columns: ``delta.generationExpression`` in a field's metadata,
    writer-enforced from minWriterVersion 4). The spec lets a writer
    either compute the value or validate a provided one — this module
    validates: every row's stored value must null-safely equal the
    expression over that row, probed with the same early-exit limit(1)
    pattern as CHECK constraints. Without this, appending to a
    foreign-created table with generated columns would silently commit
    rows that violate the generation invariant every other reader
    assumes."""
    from pyspark.sql import functions as F

    if not meta.get("schemaString"):
        return
    for fld in json.loads(meta["schemaString"]).get("fields", []):
        expr = (fld.get("metadata") or {}).get("delta.generationExpression")
        if not expr:
            continue
        name = fld["name"]
        bad = (
            df.where(~F.col(name).eqNullSafe(F.expr(expr)))
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"{path}: generated column {name!r} violates its "
                f"generation expression ({expr}) on e.g. {bad[0].asDict()}"
            )


def add_delta_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> int:
    """ALTER TABLE ... ADD CONSTRAINT ... CHECK (expr): record a CHECK
    constraint in metaData.configuration (the protocol's
    ``delta.constraints.<name>`` key) after validating that EVERY existing
    row already satisfies it (one distributed scan — the same full
    validation real Delta runs, because a constraint that existing data
    violates would make the table unreadable-as-declared). Subsequent
    appends and merges enforce it batch-by-batch and fail loudly.

    Bumps minWriterVersion to 3 (the protocol version that introduces
    writer-enforced constraints) so foreign writers that do not understand
    enforcement refuse to write rather than corrupt."""
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    adds_map, meta = _replay_log_adds(path)
    conf = dict(meta.get("configuration") or {})
    key = f"delta.constraints.{name}"
    if key in conf:
        raise ValueError(f"{path}: constraint {name!r} already exists")
    files = [os.path.join(path, p) for p in adds_map]
    if files:
        current = _scan_files(spark, path, files, meta, adds_map)
        _enforce_constraints(
            current, {"configuration": {key: expr}}, path
        )
    conf[key] = expr
    now_ms = int(_time.time() * 1000)
    # protocol: only UPGRADE (constraints need writer >= 3); a table
    # already on table features (7) declares checkConstraints there instead
    proto = _current_protocol(path)
    if proto.get("minWriterVersion", 2) >= 7:
        wf = sorted(set(proto.get("writerFeatures") or []) | {"checkConstraints"})
        new_proto = {**proto, "writerFeatures": wf}
    else:
        new_proto = {
            **proto,
            "minWriterVersion": max(proto.get("minWriterVersion", 2), 3),
        }
    return _commit(
        path,
        [
            {"protocol": new_proto},
            {"metaData": {**meta, "configuration": conf}},
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "ADD CONSTRAINT",
                    "operationParameters": {"name": name, "expr": expr},
                }
            },
        ],
    )


def drop_delta_constraint(path: str, name: str) -> int:
    """ALTER TABLE ... DROP CONSTRAINT: remove the configuration entry
    (missing name fails loudly — a silent no-op would let a typo leave the
    constraint enforced)."""
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    conf = dict(meta.get("configuration") or {})
    key = f"delta.constraints.{name}"
    if key not in conf:
        raise ValueError(f"{path}: no constraint {name!r}")
    del conf[key]
    now_ms = int(_time.time() * 1000)
    return _commit(
        path,
        [
            {"metaData": {**meta, "configuration": conf}},
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "DROP CONSTRAINT",
                    "operationParameters": {"name": name},
                }
            },
        ],
    )


def alter_delta_properties(path: str, props: dict) -> int:
    """ALTER TABLE ... SET TBLPROPERTIES: merge ``props`` into
    metaData.configuration (None value = unset). The switchboard for
    behavior flags — ``delta.appendOnly``, ``delta.enableChangeDataFeed``,
    constraint entries are managed by their own APIs."""
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    conf = dict(meta.get("configuration") or {})
    for k, v in props.items():
        if v is None:
            conf.pop(k, None)
        else:
            conf[k] = str(v)
    now_ms = int(_time.time() * 1000)
    return _commit(
        path,
        [
            {"metaData": {**meta, "configuration": conf}},
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "SET TBLPROPERTIES",
                    "operationParameters": {"properties": json.dumps(props)},
                }
            },
        ],
    )


def set_delta_column_default(
    spark: SparkSession, path: str, col: str, default_sql: "str | None"
) -> int:
    """ALTER COLUMN ... SET DEFAULT (PROTOCOL.md §Default Columns,
    writer feature ``allowColumnDefaults``): store ``default_sql`` as
    the field's ``CURRENT_DEFAULT`` metadata — the SQL expression a
    writer MUST materialize when an insert omits the column. Delta
    defaults are WRITE-time only (the deliberate contrast with Iceberg
    v3's initial-default): existing rows are NOT backfilled and reads
    never substitute, which is exactly why the protocol allows SET
    DEFAULT only on existing columns, never ADD COLUMN ... DEFAULT.
    ``default_sql=None`` drops the default. The commit upgrades the
    protocol to table-features form carrying ``allowColumnDefaults``
    (legacy versions expand first — never un-declares active features).
    Returns the committed version."""
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    schema = json.loads(meta["schemaString"])
    target = next(
        (f for f in schema.get("fields", []) if f["name"] == col), None
    )
    if target is None:
        raise ValueError(
            f"{path}: no column {col!r} "
            f"(have {[f['name'] for f in schema.get('fields', [])]})"
        )
    md = dict(target.get("metadata") or {})
    if default_sql is None:
        md.pop("CURRENT_DEFAULT", None)
    else:
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        # validate NOW: the expression must parse AND survive the cast
        # to the column's type. Under non-ANSI mode a mistyped default
        # casts to null silently, so assert the probed value is
        # non-null — a null default is pointless anyway (drop it with
        # default_sql=None instead)
        probe = spark.range(1).select(
            F.expr(default_sql).cast(
                StructType.fromJson(
                    {"type": "struct", "fields": [target]}
                ).fields[0].dataType
            )
        )
        if probe.collect()[0][0] is None:  # one local row
            raise ValueError(
                f"{path}: default {default_sql!r} for column {col!r} "
                f"evaluates to null under the column's type "
                f"{target['type']!r} — a mistyped default would make "
                "every omitting writer silently materialize NULL"
            )
        md["CURRENT_DEFAULT"] = default_sql
    target["metadata"] = md
    proto = _current_protocol(path)
    r0, w0 = _protocol_as_features(proto)
    actions: list[dict] = []
    if default_sql is not None and "allowColumnDefaults" not in w0:
        pa: dict = {
            "minReaderVersion": proto.get("minReaderVersion", 1) or 1,
            "minWriterVersion": 7,
            "writerFeatures": sorted(w0 | {"allowColumnDefaults"}),
        }
        if pa["minReaderVersion"] >= 3:
            pa["readerFeatures"] = sorted(r0)
        actions.append({"protocol": pa})
    now_ms = int(_time.time() * 1000)
    actions += [
        {
            "metaData": {
                **{k: v for k, v in meta.items() if k != "schemaString"},
                "schemaString": json.dumps(schema),
            }
        },
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "ALTER COLUMN",
                "operationParameters": {
                    "column": col,
                    "default": default_sql,
                },
            }
        },
    ]
    return _commit(path, actions)


def _apply_write_defaults(df: DataFrame, meta: dict, declared) -> DataFrame:
    """Materialize ``CURRENT_DEFAULT`` expressions for declared columns
    the batch omits (the spec's writer obligation under
    allowColumnDefaults), restoring declared column order so the
    positional schema check stays meaningful. No-op when every declared
    column is present."""
    from pyspark.sql import functions as F

    schema = json.loads(meta["schemaString"])
    have = set(df.columns)
    missing = [
        f
        for f in schema.get("fields", [])
        if f["name"] not in have
        and (f.get("metadata") or {}).get("CURRENT_DEFAULT") is not None
    ]
    if not missing:
        return df
    dtypes = {f.name: f.dataType for f in declared.fields}
    for f in missing:
        df = df.withColumn(
            f["name"],
            F.expr((f["metadata"])["CURRENT_DEFAULT"]).cast(
                dtypes[f["name"]]
            ),
        )
    order = [f["name"] for f in schema.get("fields", [])]
    in_order = set(order)
    return df.select(
        *[n for n in order if n in set(df.columns)],
        *[c for c in df.columns if c not in in_order],
    )


def _cdf_enabled(meta: dict) -> bool:
    return (meta.get("configuration") or {}).get(
        "delta.enableChangeDataFeed"
    ) == "true"


def _write_change_data(
    spark: SparkSession, path: str, change_df: DataFrame, now_ms: int
) -> list[dict]:
    """Stage a change-data frame (table columns + ``_change_type``) into
    ``_change_data/`` and return the protocol's ``cdc`` actions. CDC files
    are NOT part of the table's data (underscore dir — vacuum and scans
    skip them); they exist solely for change-feed readers, exactly like
    delta-spark's _change_data layout."""
    import uuid

    cdc_dir = os.path.join(path, "_change_data")
    os.makedirs(cdc_dir, exist_ok=True)
    staging = os.path.join(path, f"_staging_cdc_{uuid.uuid4().hex[:12]}")
    change_df.write.parquet(staging)
    actions: list[dict] = []
    import shutil

    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        src = os.path.join(staging, name)
        if os.path.getsize(src) == 0:
            continue
        final_rel = os.path.join("_change_data", f"cdc-{uuid.uuid4().hex}.parquet")
        os.rename(src, os.path.join(path, final_rel))
        actions.append(
            {
                "cdc": {
                    "path": final_rel.replace(os.sep, "/"),
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(path, final_rel)),
                    "dataChange": False,
                }
            }
        )
    shutil.rmtree(staging)
    return actions


def _resolve_dv_path(path: str, desc: dict) -> str:
    """Absolute path of a DV descriptor's bin file (storageType u or p).
    For 'u' the file name derives from the Z85-encoded UUID in
    pathOrInlineDv (PROTOCOL.md: `deletion_vector_<uuid>.bin`, under an
    optional 2-char prefix directory)."""
    import uuid as _uuid

    from . import roaring

    st = desc.get("storageType", "u")
    poi = desc["pathOrInlineDv"]
    if st == "p":
        return poi
    prefix, enc = poi[:-20], poi[-20:]
    u = _uuid.UUID(bytes=roaring.z85_decode(enc))
    parts = [path] + ([prefix] if prefix else []) + [f"deletion_vector_{u}.bin"]
    return os.path.join(*parts)


def _dv_bytes(path: str, desc: dict) -> bytes:
    """Raw serialized bitmap bytes of a deletionVector descriptor.
    Driver-side but BITMAP-sized (roaring-compressed, KBs even for
    millions of rows) — never the exploded position list."""
    from . import roaring

    st = desc.get("storageType", "u")
    if st == "i":
        # Z85 works in 4-byte blocks; writers zero-pad the bitmap to
        # alignment and sizeInBytes records the true length (same trick as
        # delta-spark's Base85 codec)
        return roaring.z85_decode(desc["pathOrInlineDv"])[: desc["sizeInBytes"]]
    if st in ("u", "p"):
        dv_file = _resolve_dv_path(path, desc)
        with open(dv_file, "rb") as fh:
            buf = fh.read()
        return roaring.read_dv_blob(buf, desc["offset"], desc["sizeInBytes"])
    raise NotImplementedError(f"{path}: deletion vector storageType {st!r}")


def _dv_positions(path: str, desc: dict) -> list[int]:
    """Decode a deletionVector descriptor into its deleted row indexes.
    Driver-side, metadata-sized (a DV is a compressed bitmap, KBs–MBs) —
    the same planning work every DV-aware reader does."""
    from . import roaring

    positions = roaring.deserialize_positions(_dv_bytes(path, desc))
    if desc.get("cardinality") is not None and len(positions) != desc["cardinality"]:
        raise ValueError(
            f"{path}: deletion vector cardinality mismatch — descriptor says "
            f"{desc['cardinality']}, bitmap holds {len(positions)}"
        )
    return positions


def _apply_dv_filter(
    spark: SparkSession, path: str, df: DataFrame, files: list[str], adds: dict
) -> DataFrame:
    """Filter out rows masked by deletion vectors: anti-join the scan
    (tagged with the hidden `_metadata` file-path/row-index columns)
    against the decoded deleted positions.

    Scale shape: the positions side is metadata-sized (bitmaps decode
    driver-side, exactly like any reader's DV planning) and is explicitly
    broadcast, so the DATA scan stays a JVM-side codegen'd anti-join — no
    Python in the row path, no shuffle of the table. Engines that push DV
    masks into the parquet reader do strictly less work per row, but the
    plan shape (scan + broadcast anti-join) is the same memory-safe one at
    any table size."""
    from pyspark.sql import functions as F

    rel_by_abs = {os.path.join(path, rel): a for rel, a in adds.items()}
    blobs: list[tuple[str, bytes, int]] = []
    for f in files:
        desc = (rel_by_abs.get(f) or {}).get("deletionVector")
        if not desc:
            continue
        uri = "file:" + os.path.abspath(f)  # _metadata.file_path format
        blobs.append((uri, _dv_bytes(path, desc), int(desc.get("cardinality") or -1)))
    if not blobs:
        return df
    # ship the COMPRESSED bitmaps (one row per DV'd file) and explode to
    # positions on the executors — a mass delete's position set never
    # materializes on the driver (round 6; mirrors the write side's
    # executor-side bitmap construction). Join unhinted: AQE broadcasts
    # small position sets and shuffles genuinely huge ones.
    bdf = local_rows_df(spark, blobs, "_dv_fp string, _dv_blob binary, _dv_card long")

    def _explode(batches):
        import pandas as pd

        from feature_store_ml_spark.io import roaring as _roaring

        for pdf in batches:
            for uri, blob, card in zip(
                pdf["_dv_fp"], pdf["_dv_blob"], pdf["_dv_card"]
            ):
                pos = _roaring.deserialize_positions(bytes(blob))
                if card >= 0 and len(pos) != card:
                    raise ValueError(
                        f"deletion vector cardinality mismatch for {uri}: "
                        f"descriptor says {card}, bitmap holds {len(pos)}"
                    )
                yield pd.DataFrame(
                    {
                        "_dv_fp": pd.Series([uri] * len(pos), dtype="object"),
                        "_dv_ri": pd.Series(pos, dtype="int64"),
                    }
                )

    deleted = bdf.mapInPandas(_explode, "_dv_fp string, _dv_ri long")
    # join strategy from the DESCRIPTORS' total cardinality (known driver
    # metadata): the common small-delete case broadcasts explicitly — an
    # unhinted join would shuffle the full table scan before AQE converts
    # to broadcast, a real cost at 100 TB; a genuinely mass delete
    # (>5M masked rows) skips the hint and lets AQE shuffle both sides.
    total_card = sum(c for _, _, c in blobs if c > 0)
    if total_card and total_card <= 5_000_000:
        deleted = F.broadcast(deleted)
    # decoded: the blob map keys on RAW on-disk paths while
    # _metadata.file_path arrives percent-encoded — joining raw would
    # silently RESURRECT every masked row in a special-char partition dir
    tagged = df.withColumn("_fp", _decoded_file_path(files)).withColumn(
        "_ri", F.col("_metadata.row_index")
    )
    kept = tagged.join(
        deleted,
        (F.col("_fp") == F.col("_dv_fp")) & (F.col("_ri") == F.col("_dv_ri")),
        "left_anti",
    )
    return kept.drop("_fp", "_ri")


def _scan_files(
    spark: SparkSession,
    path: str,
    files: list[str],
    meta: dict,
    adds: dict | None = None,
    with_metadata: bool = False,
) -> DataFrame:
    """Scan a SUBSET of a snapshot's data files with the table's declared
    schema — the one scan primitive every fallback path (full read, MERGE
    rewrite, compaction) shares.

    Unpartitioned: a declared-schema parquet read, so files written before
    a schema evolution backfill the added columns with null (delta-spark's
    semantics) instead of silently adopting the first file's schema.

    Partitioned: partition values come from Hive directory components via
    ``basePath`` reconstruction (the single-scan fast path), or — when
    the layout is NOT Hive-style — from the add actions' authoritative
    ``partitionValues`` (one scan per distinct tuple, unioned).

    ``with_metadata=True`` materializes the hidden ``_metadata`` struct
    as a REAL column before any join/union so position-level consumers
    (DV delete discovery, the change feed's bitmap diff) can keep
    referencing ``_metadata.file_path``/``row_index`` even on plans where
    the hidden column is no longer resolvable (unions).
    """
    from pyspark.sql import functions as F

    part_cols = meta.get("partitionColumns") or []

    def _mat(df: DataFrame) -> DataFrame:
        return df.select("*", F.col("_metadata")) if with_metadata else df

    def _dv(df: DataFrame) -> DataFrame:
        if adds and any(a.get("deletionVector") for a in adds.values()):
            return _apply_dv_filter(spark, path, df, files, adds)
        return df

    def _keep_meta(cols: list) -> list:
        return cols + [F.col("_metadata")] if with_metadata else cols

    mapping = _column_mapping(meta) if meta.get("schemaString") else None
    mode = _mapping_mode(meta) if meta.get("schemaString") else None
    if mode == "id":
        # ID mode: data columns resolve by field id, but partition dirs /
        # partitionValues / staged files still use the physical names
        mapping = _physical_names(meta)
    if mode == "id" and part_cols:
        # partition values come from the add actions (authoritative) and
        # data columns resolve by field id per file group — the non-Hive
        # scan path already unions per-partition-tuple scans, and its
        # ID-aware branch sub-groups by footer field ids
        return _scan_non_hive(
            spark, path, files, meta, adds, mapping, part_cols, with_metadata
        )
    if not part_cols:
        if meta.get("schemaString"):
            from pyspark.sql.types import StructField, StructType

            declared = StructType.fromJson(json.loads(meta["schemaString"]))
            if mode == "id":
                # ID mode: parquet columns match by FIELD ID, not name.
                # Spark's own resolution needs the session-wide conf
                # spark.sql.parquet.fieldId.read.enabled, which (a) leaks
                # into unrelated reads and (b) silently returns NULLs if a
                # later read runs after the conf is restored (conf is read
                # at ACTION time, verified empirically). Instead resolve
                # field ids ourselves: read each footer (same O(#files)
                # driver metadata pass the stats reader does), group files
                # by their fid->physical-name mapping, scan each group
                # with its physical schema, rename to logical, union.
                fids = _field_ids(meta)
                groups = _group_files_by_field_ids(files, spark=spark)
                parts_out = []
                for phys_by_fid, gfiles in groups:
                    # fallback for a file lacking the fid (written before
                    # the column was added): the declared physicalName —
                    # absent there too, parquet fills the column NULL
                    src = {
                        f.name: phys_by_fid.get(
                            fids[f.name],
                            (mapping or {}).get(f.name, f.name),
                        )
                        for f in declared.fields
                    }
                    physical = StructType(
                        [
                            StructField(src[f.name], f.dataType, f.nullable)
                            for f in declared.fields
                        ]
                    )
                    # DV-filter per group BEFORE the rename projection and
                    # union — _metadata is only resolvable on a scan-level
                    # plan (unions break it); positions for other groups'
                    # files simply never match the anti-join
                    gdf = _dv(_mat(spark.read.schema(physical).parquet(*gfiles)))
                    parts_out.append(
                        gdf.select(
                            *_keep_meta(
                                [
                                    F.col(src[f.name]).alias(f.name)
                                    for f in declared.fields
                                ]
                            )
                        )
                    )
                out = parts_out[0]
                for p in parts_out[1:]:
                    out = out.unionByName(p)
                return out
            if mapping:
                # files carry PHYSICAL names: read with the physical
                # schema, mask DVs, then project back to logical names
                physical = StructType(
                    [
                        StructField(mapping[f.name], f.dataType, f.nullable)
                        for f in declared.fields
                    ]
                )
                df = _dv(_mat(spark.read.schema(physical).parquet(*files)))
                return df.select(
                    *_keep_meta(
                        [
                            F.col(mapping[f.name]).alias(f.name)
                            for f in declared.fields
                        ]
                    )
                )
            return _dv(_mat(spark.read.schema(declared).parquet(*files)))
        return _dv(_mat(spark.read.parquet(*files)))
    # partition DIRECTORIES (and the values reconstructed from them) carry
    # PHYSICAL names on a column-mapped table — files never change when a
    # column is renamed, and neither do the dirs they sit in
    phys_parts = [
        (mapping or {}).get(c, c) for c in part_cols
    ]
    rel = [os.path.relpath(f, path) for f in files]
    hive_style = all(
        all(f"{c}=" in r.split(os.sep)[i] for i, c in enumerate(phys_parts))
        for r in rel
        if len(r.split(os.sep)) > len(phys_parts)
    ) and all(len(r.split(os.sep)) > len(phys_parts) for r in rel)
    if not hive_style:
        # per the protocol the add actions' partitionValues are
        # AUTHORITATIVE — Hive-style dir naming is only a convention.
        # Reconstruct from the log: group the scanned files by partition
        # tuple, read each group with the data schema plus its tuple as
        # literals, and union. One scan-plan per DISTINCT tuple among the
        # scanned files — fine into the thousands of partitions; the
        # basePath fast path below handles the conventional layout in a
        # single scan.
        return _scan_non_hive(
            spark, path, files, meta, adds, mapping, part_cols, with_metadata
        )
    # read through the DECLARED schema (physical names when mapped) rather
    # than inference: inference picks one file's footer, so a mix of pre-
    # and post-evolution files would silently null a late-added column,
    # and a widened column would surface its old narrow type. The explicit
    # schema backfills missing columns as null and promotes narrow files,
    # the same contract as the unpartitioned spark.read.schema path;
    # partition-dir values parse straight to their declared types.
    try:
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST

        declared_st = _ST.fromJson(json.loads(meta["schemaString"]))
        phys_st = _ST(
            [
                _SF((mapping or {}).get(f.name, f.name), f.dataType, True)
                for f in declared_st.fields
            ]
        )
        names = [f.name for f in declared_st.fields]
    except (KeyError, ValueError, TypeError):
        if mapping:
            raise  # a mapped table MUST project back to logical names
        return _dv(_mat(spark.read.option("basePath", path).parquet(*files)))
    df = _dv(
        _mat(
            spark.read.schema(phys_st).option("basePath", path).parquet(*files)
        )
    )
    return df.select(
        *_keep_meta([F.col((mapping or {}).get(c, c)).alias(c) for c in names])
    )


def _scan_non_hive(
    spark: SparkSession,
    path: str,
    files: list[str],
    meta: dict,
    adds: dict | None,
    mapping: dict[str, str] | None,
    part_cols: list[str],
    with_metadata: bool = False,
) -> DataFrame:
    """Partitioned scan for NON-Hive directory layouts: partition values
    come from the add actions (the protocol's source of truth), not the
    paths. Files sharing a partition tuple share one scan; per-group DV
    masks apply before the union; data columns project physical→logical
    when the table is column-mapped."""
    from functools import reduce

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    if not adds:
        raise ValueError(
            f"{path}: non-Hive partitioned scan needs the snapshot's add "
            "actions to recover partitionValues"
        )
    schema = json.loads(meta["schemaString"])
    declared = StructType.fromJson(schema)
    types = {f["name"]: f["type"] for f in schema["fields"]}
    data_fields = [f for f in declared.fields if f.name not in part_cols]
    physical = StructType(
        [
            StructField((mapping or {}).get(f.name, f.name), f.dataType, f.nullable)
            for f in data_fields
        ]
    )
    groups: dict[tuple, list[str]] = {}
    pv_by_key: dict[tuple, dict] = {}
    def _add_for(f: str) -> dict | None:
        a = adds.get(os.path.relpath(f, path).replace(os.sep, "/"))
        if a is None:
            # SHALLOW CLONE adds key by absolute source path, not a
            # clone-relative one — resolve by the file's own abs path
            a = adds.get(os.path.normpath(f).replace(os.sep, "/"))
        return a

    for f in files:
        relp = os.path.relpath(f, path).replace(os.sep, "/")
        a = _add_for(f)
        if a is None:
            raise ValueError(f"{path}: no add action for scanned file {relp}")
        pv = a.get("partitionValues") or {}
        # null-safe, order-stable group key ('' marks null, '=' prefixes
        # real values so null and empty-string stay distinct)
        key = tuple(
            sorted((k, "" if v is None else "=" + v) for k, v in pv.items())
        )
        groups.setdefault(key, []).append(f)
        pv_by_key[key] = pv
    mode = _mapping_mode(meta) if meta.get("schemaString") else None
    fids = _field_ids(meta) if mode == "id" else {}

    def _one_scan(phys_schema, sfiles, rename_from):
        """One scan branch: read physical, materialize _metadata if asked,
        DV-mask pre-rename, project to the group-canonical physical names
        so unions align."""
        sg = spark.read.schema(phys_schema).parquet(*sfiles)
        if with_metadata:
            # materialize BEFORE the union — the hidden column is not
            # resolvable afterwards
            sg = sg.select("*", F.col("_metadata"))
        # key by the add's OWN recorded path (absolute for clone-
        # referenced files) so the DV filter's join(path, key) resolves
        sub_adds = {a["path"]: a for a in map(_add_for, sfiles) if a}
        if any(a.get("deletionVector") for a in sub_adds.values()):
            sg = _apply_dv_filter(spark, path, sg, sfiles, sub_adds)
        if rename_from is not None:
            cols = [
                F.col(rename_from[f.name]).alias(
                    (mapping or {}).get(f.name, f.name)
                )
                for f in data_fields
            ]
            if with_metadata:
                cols.append(F.col("_metadata"))
            sg = sg.select(*cols)
        return sg

    branches = []
    for key, group_files in sorted(groups.items()):
        if mode == "id":
            # ID mode: column identity is the FIELD ID in each file's
            # footer — files written across renames carry different
            # physical names; sub-group per distinct footer mapping
            subs = []
            for phys_by_fid, sfiles in _group_files_by_field_ids(
                group_files, spark=spark
            ):
                src_name = {
                    f.name: phys_by_fid.get(
                        fids[f.name], (mapping or {}).get(f.name, f.name)
                    )
                    for f in data_fields
                }
                phys_schema = StructType(
                    [
                        StructField(src_name[f.name], f.dataType, f.nullable)
                        for f in data_fields
                    ]
                )
                subs.append(_one_scan(phys_schema, sfiles, src_name))
            g = reduce(lambda a, b: a.unionByName(b), subs)
        else:
            g = _one_scan(physical, group_files, None)
        pv = pv_by_key[key]
        for c in part_cols:
            phys_c = (mapping or {}).get(c, c)
            raw = pv.get(phys_c, pv.get(c))
            t = types[c] if isinstance(types.get(c), str) else "string"
            g = g.withColumn(
                phys_c,
                F.lit(raw).cast(t) if raw is not None else F.lit(None).cast(t),
            )
        branches.append(g)
    df = reduce(lambda a, b: a.unionByName(b), branches)
    out_cols = [
        F.col((mapping or {}).get(f["name"], f["name"])).alias(f["name"])
        for f in schema["fields"]
    ]
    if with_metadata:
        out_cols.append(F.col("_metadata"))
    return df.select(*out_cols)


def _promote_staged(
    staging: str, path: str, now_ms: int, data_change: bool
) -> list[dict]:
    """Move a staging dir's parquet files into the table root under unique
    names, PRESERVING Hive partition dirs, and return the matching ``add``
    actions (per-file partitionValues parsed from the directory components).
    Driver-side, O(#files) renames — the same metadata work any Delta
    writer's commit phase does. Zero-byte files are dropped (an empty
    rewrite partition produces no add)."""
    import shutil
    import uuid

    adds: list[dict] = []
    for dirpath, _dirnames, filenames in sorted(os.walk(staging)):
        rel_dir = os.path.relpath(dirpath, staging)
        rel_dir = "" if rel_dir == "." else rel_dir
        for name in sorted(filenames):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, name)
            if os.path.getsize(src) == 0:
                continue
            final_rel = os.path.join(rel_dir, f"part-{uuid.uuid4().hex}.parquet")
            size = os.path.getsize(src)
            os.makedirs(
                os.path.dirname(os.path.join(path, final_rel)) or path, exist_ok=True
            )
            os.rename(src, os.path.join(path, final_rel))
            add = {
                "path": final_rel.replace(os.sep, "/"),
                "partitionValues": _hive_partition_values(rel_dir),
                "size": size,
                "modificationTime": now_ms,
                "dataChange": data_change,
            }
            # per-file stats (PROTOCOL.md §Per-file-Statistics): fold the
            # parquet FOOTER's row-group bounds into the add action so
            # selective reads skip whole files before any data IO. A
            # footer read is KBs — same O(#files) driver cost as the
            # renames above; absent stats just mean no skipping.
            stats = skipping.collect_file_stats(os.path.join(path, final_rel))
            if stats is not None:
                add["stats"] = stats
            adds.append({"add": add})
    shutil.rmtree(staging)  # _SUCCESS, .crc files, emptied partition dirs
    return adds


def version_as_of_timestamp(path: str, ts_ms: int) -> int:
    """Resolve timestamp-based time travel to a commit version: the
    NEWEST commit whose commitInfo timestamp is <= ``ts_ms`` (delta-spark's
    timestampAsOf rule). Resolution needs the JSON history — commits
    cleaned after checkpointing fail loudly via the normal time-travel
    guard downstream; a timestamp before the earliest retained commit
    raises here."""
    log = _delta_log_dir(path)
    best = None
    for name in sorted(os.listdir(log)):
        if not (_is_commit_json(name)):
            continue
        v = int(name[:20])
        commit_ts = None
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "commitInfo" in action and action["commitInfo"].get("timestamp"):
                    ci = action["commitInfo"]
                    # tables with the inCommitTimestamp feature record the
                    # AUTHORITATIVE (monotonic) clock there; the spec says
                    # timestamp-based time travel must prefer it over the
                    # best-effort wall-clock `timestamp`
                    commit_ts = ci.get("inCommitTimestamp") or ci["timestamp"]
                    break
        if commit_ts is None:
            commit_ts = int(os.path.getmtime(os.path.join(log, name)) * 1000)
        if commit_ts <= ts_ms:
            best = v if best is None else max(best, v)
    if best is None:
        raise ValueError(
            f"{path}: no commit at or before timestamp {ts_ms} — older than "
            "retained history (or the log was cleaned)"
        )
    return best


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
    where: str | None = None,
) -> DataFrame:
    """Read a Delta table: native `format("delta")` when the jar is present,
    else the pure-python log replay + parquet scan fallback.

    Time travel: ``version`` reads the snapshot AS OF that commit;
    ``timestamp_ms`` resolves to the newest commit at or before that
    wall-clock (delta-spark's timestampAsOf) and reads it. Both require
    the JSON history back to the target; vacuumed-file or cleaned-log
    reads fail loudly rather than returning a partial snapshot.

    ``where`` (a SQL predicate string) enables DATA SKIPPING: before the
    scan is planned, files whose per-file stats (min/max/nullCount, stored
    on the add actions) prove the predicate cannot match are dropped from
    the file list entirely — the selective-read mechanism that turns a
    100 TB scan into megabytes on a clustered layout. The predicate is
    ALSO applied as a normal filter, so results are identical to
    ``read_delta(...).filter(where)``; skipping only removes provably-dead
    IO and fails open (keeps files) on anything its evaluator cannot
    prove. Native reads get delta-spark's own skipping via the same
    filter.

    An empty snapshot (all files removed) still returns a DataFrame with the
    table schema when the native reader is available; the fallback raises —
    parquet needs at least one file to carry a schema — EXCEPT when data
    skipping pruned every file, where the declared schema is known and an
    empty frame is returned.
    """
    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table (no _delta_log)")
    if version is not None and timestamp_ms is not None:
        raise ValueError("read_delta: pass version OR timestamp_ms, not both")
    if timestamp_ms is not None:
        version = version_as_of_timestamp(path, timestamp_ms)
    if not _nativesrc.known_absent(spark, "delta"):
        try:
            reader = spark.read.format("delta")
            if version is not None:
                reader = reader.option("versionAsOf", str(version))
            native = reader.load(path)
            return native.filter(where) if where else native
        except Exception as exc:  # jar absent → DATA_SOURCE_NOT_FOUND at plan time
            if (
                "DATA_SOURCE_NOT_FOUND" not in str(exc)
                and "Failed to find" not in str(exc)
            ):
                raise
            # remember the classification so later calls skip the doomed
            # attempt (a JVM exception round trip each, see io/nativesrc)
            # — but only on the PRECISE missing-source signature; the
            # broad match above stays one-shot
            if _nativesrc.is_source_not_found(exc):
                _nativesrc.mark_absent(spark, "delta")
    adds, meta = _replay_log_adds(path, max_version=version)
    if where:
        # dispatches to a distributed mapInPandas evaluation above
        # DISTRIBUTED_PRUNE_THRESHOLD files — planning a 10^6-file
        # snapshot must not serialize on one driver core
        adds, _skipped = skipping.prune_adds_auto(spark, adds, meta, where)
        if not adds and meta.get("schemaString"):
            from pyspark.sql.types import StructType

            declared = StructType.fromJson(json.loads(meta["schemaString"]))
            return local_rows_df(spark, [], declared)
    files = [os.path.join(path, p) for p in adds]
    if not files:
        raise ValueError(
            f"{path}: snapshot is empty and the parquet fallback cannot "
            "produce a schema-only DataFrame"
        )
    if version is not None:
        # fail at plan time if a time-traveled file was vacuumed, instead
        # of a mid-scan FileNotFound
        gone = [f for f in files if not os.path.exists(f)]
        if gone:
            raise ValueError(
                f"{path}: snapshot v{version} references vacuumed files "
                f"(e.g. {os.path.basename(gone[0])}) — history is gone"
            )
    # Unpartitioned: declared-schema read (schema-evolution backfill).
    # Partitioned: partition values live in file PATHS (Hive layout), NOT in
    # the parquet files — _scan_files reconstructs them via basePath and
    # casts them to the declared schema, failing loudly on non-Hive layouts.
    # Files with deletion vectors get their masked rows anti-joined out.
    df = _scan_files(spark, path, files, meta, adds)
    return df.filter(where) if where else df


def skipping_report(path: str, where: str, version: int | None = None) -> dict:
    """Dry-run the data-skipping planner: how many files (and bytes) would
    a ``read_delta(..., where=...)`` scan vs the full snapshot? Driver-side
    metadata only — nothing is read or scanned. Keys: ``total_files``,
    ``kept_files``, ``skipped_files``, ``total_bytes``, ``kept_bytes``,
    ``eligible`` (False when the predicate shape disables skipping)."""
    adds, meta = _replay_log_adds(path, max_version=version)
    kept, skipped = skipping.prune_adds(adds, meta, where)
    return {
        "total_files": len(adds),
        "kept_files": len(kept),
        "skipped_files": skipped,
        "total_bytes": sum(a.get("size", 0) for a in adds.values()),
        "kept_bytes": sum(a.get("size", 0) for a in kept.values()),
        "eligible": skipping.parse_conjuncts(where) is not None,
    }


def read_table_auto(spark: SparkSession, path: str) -> DataFrame:
    """Format sniffer: Delta if `_delta_log` is present, Iceberg if a
    `metadata/*.metadata.json` is, bare parquet otherwise — lets pipeline
    code take a path of any of the three layouts."""
    if is_delta_table(path):
        return read_delta(spark, path)
    from . import iceberg

    if iceberg.is_iceberg_table(path):
        return iceberg.read_iceberg(spark, path)
    return spark.read.parquet(path)


def read_delta_changes(
    spark: SparkSession, path: str, since_version: int, to_version: int | None = None
) -> DataFrame:
    """Incremental consumption: the rows ADDED by commits in
    ``(since_version, to_version]`` — the "process only data that arrived
    since my last run" primitive an incremental feature/training pipeline
    checkpoints on (store the version you processed; next run reads the
    delta, not the table).

    Append-only discipline is enforced: if any commit in the range REMOVES
    files with ``dataChange: true`` (an overwrite/delete rewrote history),
    incremental reading is ill-defined and this raises — re-read the full
    snapshot instead. Compaction commits (``dataChange: false``) are
    invisible here, exactly like Delta CDF treats them.
    """
    log = _delta_log_dir(path)
    all_json = sorted(
        name
        for name in os.listdir(log)
        if _is_commit_json(name)
    )
    hi = to_version if to_version is not None else (
        int(all_json[-1][:20]) if all_json else -1
    )
    # Every version in (since_version, hi] must still exist as a JSON commit:
    # checkpointed-then-cleaned commits would otherwise be SILENTLY skipped
    # (this scanner reads JSON only) and the incremental read would miss
    # rows. Same fail-loud contract as the time-travel path.
    have = {int(n[:20]) for n in all_json}
    gone = sorted(set(range(since_version + 1, hi + 1)) - have)
    if gone:
        raise ValueError(
            f"{path}: commits {gone[:5]}{'...' if len(gone) > 5 else ''} in "
            f"({since_version}, {hi}] are not in the JSON log (cleaned up "
            "after checkpointing, or never committed) — the incremental "
            "read would silently miss their rows; re-read the full snapshot"
        )
    added: list[str] = []
    for name in all_json:
        v = int(name[:20])
        if v <= since_version or v > hi:
            continue
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("dataChange", True):
                    if action["add"].get("deletionVector"):
                        raise ValueError(
                            f"{path}: commit {v} attached a deletion vector "
                            "(row-level DELETE) — the append-only "
                            "incremental read is ill-defined; re-read the "
                            "full snapshot"
                        )
                    added.append(os.path.join(path, action["add"]["path"]))
                elif "remove" in action and action["remove"].get("dataChange", True):
                    raise ValueError(
                        f"{path}: commit {v} removed data files "
                        "(overwrite/delete) — the append-only incremental "
                        "read is ill-defined; re-read the full snapshot"
                    )
    if not added:
        # nothing new: empty frame with the TABLE schema, so downstream
        # unions/writes stay well-typed without a special case
        from pyspark.sql.types import StructType

        _, meta = _replay_log(path)
        if not meta.get("schemaString"):
            raise ValueError(f"{path}: no new files and no declared schema")
        return local_rows_df(spark, 
            [], StructType.fromJson(json.loads(meta["schemaString"]))
        )
    return spark.read.parquet(*added)


def compact_delta(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    target_file_bytes: int = 128 << 20,
    zorder_by: list[str] | None = None,
) -> int:
    """OPTIMIZE-style bin-packing compaction: rewrite the table's live data
    files into ``target_files`` larger ones and commit remove(old)+add(new)
    with ``dataChange: false`` (the protocol's marker that a commit
    rearranges bytes without changing rows — streaming readers skip it).

    ``target_files`` defaults to ceil(live bytes / target_file_bytes) —
    sized from the DATA, because the write parallelism equals the output
    file count (one task per file): pinning it to a small constant on a
    big table would funnel the rewrite through a handful of tasks.

    THE maintenance operation for streaming ingest: a foreachBatch sink
    writes one file per micro-batch, and a day of 1-minute batches is 1440
    tiny files whose per-file open/footer cost dominates scans. Run
    compaction on a schedule (or when live-file count crosses a threshold)
    — readers before/after see identical rows.

    ``zorder_by``: OPTIMIZE ZORDER BY — instead of plain bin-packing, the
    rewrite clusters rows along the Morton curve over the given (numeric)
    columns (operators/layout.zorder_layout: one range-partition sort), so
    the compacted files carry tight min/max stats on EVERY listed column
    and multi-dimension predicates skip whole files at scan time. Same
    commit shape (dataChange: false) — readers see identical rows, faster.

    PARTITIONED tables compact per partition (Delta's OPTIMIZE semantics —
    files never span partitions): each Hive dir's live files are rewritten
    to ceil(dir bytes / target_file_bytes) outputs. All partition rows
    hash-route to one task (`repartition(n, *part_cols)`), so the common
    partition collapses to ONE file; oversized partitions get a salt column
    so they split across tasks instead of bottlenecking one. With
    ``zorder_by`` the rows are additionally Morton-sorted WITHIN each
    partition (`sortWithinPartitions(part_cols + _zkey)`) — Delta's ZORDER
    clusters inside partitions, never across them.

    The rewrite itself is a distributed read+write of the live set; only
    renames and the commit append touch the driver. Returns the committed
    version.
    """
    import uuid
    import time as _time

    from pyspark.sql import functions as F

    adds_map, meta = _replay_log_adds(path)
    _proto = _check_write_allowed(path, meta, "optimize")
    files = [os.path.join(path, p) for p in adds_map]
    part_cols = meta.get("partitionColumns") or []
    if not files:
        raise ValueError(f"{path}: nothing to compact (empty snapshot)")
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    # DV-masked rows are filtered here, so compaction doubles as a DV
    # PURGE: the rewritten files carry no deletionVector and the dead rows
    # are physically gone (delta-spark's REORG TABLE ... APPLY (PURGE))
    # the baseRowId OBLIGATION follows the protocol FEATURE (same rule as
    # write_delta); id PRESERVATION via materialization only applies once
    # delta.enableRowTracking is actually on
    mats = _rt_materialization(meta, path)
    rt = mats is not None or "rowTracking" in (
        _proto.get("writerFeatures") or []
    )
    if mats is not None:
        mat_id, mat_ver = mats
        # ROW-TRACKED rewrite: every surviving row's id and commit version
        # are MATERIALIZED into the new files under the configured
        # physical names (spec §Row Tracking preservation) — the fresh-row
        # rule no longer applies to them, so ids survive any repacking
        live = (
            _scan_with_row_ids(spark, path, meta, adds_map)
            .withColumnRenamed("row_id", mat_id)
            .withColumnRenamed("row_commit_version", mat_ver)
        )
    else:
        live = _scan_files(spark, path, files, meta, adds_map)
    if not part_cols:
        if target_files is None:
            total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
            target_files = max(1, -(-total // target_file_bytes))
        if zorder_by:
            from ..operators.layout import zorder_layout

            rewritten = zorder_layout(live, zorder_by, target_files)
        else:
            rewritten = live.coalesce(target_files)
        _to_physical(rewritten, meta).write.parquet(staging)
    else:
        # per-partition bin-packing: dir stats come free from the driver's
        # file list (the same O(#files) metadata the log replay already
        # holds) — no extra Spark job to size the rewrite
        dir_bytes: dict[str, int] = {}
        for f in files:
            rel_dir = os.path.dirname(os.path.relpath(f, path))
            dir_bytes[rel_dir] = dir_bytes.get(rel_dir, 0) + (
                os.path.getsize(f) if os.path.exists(f) else 0
            )
        n_out = {d: max(1, -(-b // target_file_bytes)) for d, b in dir_bytes.items()}
        target_files = sum(n_out.values())
        oversized = {d: n for d, n in n_out.items() if n > 1}
        if oversized:
            # salt ONLY the oversized partitions so they spread across
            # `n` tasks; a when-chain over the (few) hot dirs beats a join
            # — if most partitions were oversized, per-partition targets
            # would all be 1 at a sane target_file_bytes anyway
            salt = F.lit(0)
            _sm = _stage_partition_names(meta)
            for rel_dir, n in oversized.items():
                # dir components carry PHYSICAL names on a mapped table;
                # `live` (via _scan_files) carries logical ones
                vals = _hive_partition_values(rel_dir)
                cond = F.lit(True)
                for c in part_cols:
                    v = vals.get(_sm.get(c, c))
                    cond = cond & (
                        F.col(c).isNull()
                        if v is None
                        else (F.col(c).cast("string") == F.lit(v))
                    )
                salt = F.when(
                    cond,
                    F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n)),
                ).otherwise(salt)
            routed = live.withColumn("_salt", salt).repartition(
                target_files, *part_cols, "_salt"
            )
        else:
            routed = live.repartition(target_files, *part_cols)
        if zorder_by:
            from ..operators.layout import zorder_key

            routed = zorder_key(routed.drop("_zkey", "_salt"), zorder_by)
            routed = routed.sortWithinPartitions(*part_cols, "_zkey").drop("_zkey")
        else:
            routed = routed.drop("_salt")
        _m = _stage_partition_names(meta)
        _to_physical(routed, meta).write.partitionBy(
            *[_m.get(c, c) for c in part_cols]
        ).parquet(staging)
    now_ms = int(_time.time() * 1000)
    adds = _promote_staged(staging, path, now_ms, data_change=False)
    actions = (
        [
            {
                "remove": {
                    "path": os.path.relpath(f, path),
                    "dataChange": False,
                    "deletionTimestamp": now_ms,
                }
            }
            for f in files
        ]
        + adds
        + [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "OPTIMIZE",
                    "operationParameters": {"targetFiles": str(target_files)},
                }
            }
        ]
    )
    if rt:
        # rewritten adds still need baseRowId (spec: required on every
        # add once the feature is active) — fresh ranges from the domain
        # watermark; the materialized columns carry the real ids
        return _uniform_sync(
            spark, path, meta, _commit_row_tracked(path, actions, adds, "compaction")
        )
    return _uniform_sync(spark, path, meta, _commit(path, actions))


def compact_delta_incremental(
    spark: SparkSession,
    path: str,
    small_file_bytes: int = 32 << 20,
    target_file_bytes: int = 128 << 20,
    cluster_by: list[str] | None = None,
    min_group: int = 2,
) -> dict:
    """INCREMENTAL OPTIMIZE (round 11, VERDICT r10 item 6): rewrite only
    the files a maintenance pass should touch — liquid-clustering-style
    file selection instead of ``compact_delta``'s whole-snapshot rewrite,
    so the cost of keeping a 100 TB table healthy is O(touched files),
    not O(table).

    Selection per partition (operators/layout.select_files_for_compaction):
    DV'd files (purge), small files with a merge partner, and — when
    ``cluster_by`` is given — interval-graph components of files whose
    min/max bounds on ``cluster_by[0]`` overlap (their stats shadow each
    other, so the clustering key prunes nothing until they are rewritten
    disjoint). Selected rows are re-clustered along the Morton curve over
    ``cluster_by`` within their partitions; unselected files are NOT read,
    NOT rewritten, and keep their add actions untouched.

    Commit shape is OPTIMIZE's: remove(selected) + add(new) with
    ``dataChange: false``. Returns ``{"version", "rewritten", "added",
    "kept"}`` — ``rewritten``/``added`` are table-relative paths,
    ``kept`` the untouched live-file count (the O(touched) proof the
    tests pin)."""
    import time as _time
    import uuid

    from pyspark.sql import functions as F

    from ..operators.layout import select_files_for_compaction, zorder_key

    adds_map, meta = _replay_log_adds(path)
    _proto = _check_write_allowed(path, meta, "optimize")
    part_cols = meta.get("partitionColumns") or []
    if not adds_map:
        raise ValueError(f"{path}: nothing to compact (empty snapshot)")
    if cluster_by is None:
        # CLUSTERED TABLE (cluster_delta_by): plain OPTIMIZE calls pick
        # up the declared clustering columns — the liquid-clustering
        # maintenance loop needs no per-call configuration
        cluster_by = delta_clustering_columns(path) or None

    stat_col = None
    if cluster_by:
        mapping = _column_mapping(meta) if meta.get("schemaString") else None
        stat_col = (mapping or {}).get(cluster_by[0], cluster_by[0])

    def _bound(rel: str, which: str):
        stats = adds_map[rel].get("stats")
        if not stats or stat_col is None:
            return None
        v = (json.loads(stats).get(which) or {}).get(stat_col)
        return v if isinstance(v, (int, float)) and not isinstance(v, bool) else None

    groups: dict[tuple, list[str]] = {}
    for rel, a in adds_map.items():
        key = tuple(sorted((a.get("partitionValues") or {}).items()))
        groups.setdefault(key, []).append(rel)
    selected: list[str] = []
    reasons: dict[str, str] = {}
    for rels in groups.values():
        infos = [
            {
                "name": rel,
                "size": int(adds_map[rel].get("size") or 0),
                "has_deletes": bool(adds_map[rel].get("deletionVector")),
                "min": _bound(rel, "minValues"),
                "max": _bound(rel, "maxValues"),
            }
            for rel in rels
        ]
        sel, why = select_files_for_compaction(infos, small_file_bytes, min_group)
        selected.extend(sel)
        reasons.update(why)
    if not selected:
        return {
            "version": None,
            "rewritten": [],
            "added": [],
            "kept": len(adds_map),
            "reasons": {},
        }

    sel_adds = {rel: adds_map[rel] for rel in selected}
    sel_files = [os.path.join(path, rel) for rel in selected]
    mats = _rt_materialization(meta, path)
    rt = mats is not None or "rowTracking" in (_proto.get("writerFeatures") or [])
    if mats is not None:
        mat_id, mat_ver = mats
        live = (
            _scan_with_row_ids(spark, path, meta, sel_adds)
            .withColumnRenamed("row_id", mat_id)
            .withColumnRenamed("row_commit_version", mat_ver)
        )
    else:
        live = _scan_files(spark, path, sel_files, meta, sel_adds)

    total = sum(int(adds_map[rel].get("size") or 0) for rel in selected)
    n_out = max(1, -(-total // target_file_bytes))
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    if part_cols:
        routed = live.repartition(n_out, *part_cols)
        if cluster_by:
            routed = zorder_key(routed, cluster_by)
            routed = routed.sortWithinPartitions(*part_cols, "_zkey").drop("_zkey")
        _m = _stage_partition_names(meta)
        _to_physical(routed, meta).write.partitionBy(
            *[_m.get(c, c) for c in part_cols]
        ).parquet(staging)
    else:
        if cluster_by:
            from ..operators.layout import zorder_layout

            rewritten_df = zorder_layout(live, cluster_by, n_out)
        else:
            rewritten_df = live.coalesce(n_out)
        _to_physical(rewritten_df, meta).write.parquet(staging)
    now_ms = int(_time.time() * 1000)
    adds = _promote_staged(staging, path, now_ms, data_change=False)
    actions = (
        [
            {
                "remove": {
                    "path": rel,
                    "dataChange": False,
                    "deletionTimestamp": now_ms,
                }
            }
            for rel in sorted(selected)
        ]
        + adds
        + [
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "OPTIMIZE",
                    "operationParameters": {
                        "incremental": "true",
                        "selectedFiles": str(len(selected)),
                        **(
                            {"zOrderBy": json.dumps(cluster_by)}
                            if cluster_by
                            else {}
                        ),
                    },
                }
            }
        ]
    )
    if rt:
        version = _uniform_sync(
            spark,
            path,
            meta,
            _commit_row_tracked(path, actions, adds, "compaction"),
        )
    else:
        version = _uniform_sync(spark, path, meta, _commit(path, actions))
    return {
        "version": version,
        "rewritten": sorted(selected),
        "added": [a["add"]["path"] for a in adds],
        "kept": len(adds_map) - len(selected),
        "reasons": reasons,
    }


_CLUSTERING_DOMAIN = "delta.clustering"


def cluster_delta_by(spark: SparkSession, path: str, cols: list[str]) -> int:
    """ALTER TABLE ... CLUSTER BY — Delta's CLUSTERED TABLE declaration
    (PROTOCOL.md §Clustered Table): record the clustering columns in the
    ``delta.clustering`` DOMAIN METADATA (PHYSICAL names on mapped
    tables, per spec) and declare the ``clustering`` + ``domainMetadata``
    writer features. Per spec, writers may keep ADDING files without
    clustering them as long as the domain survives — which it does here
    through commits, checkpoints and log cleanup — and maintenance
    re-clusters incrementally: ``compact_delta_incremental`` defaults its
    ``cluster_by`` to these columns, so plain OPTIMIZE calls on a
    clustered table target overlap-bound components and restore the
    declared layout at O(touched) cost (the liquid-clustering loop).

    ``cols=[]`` is CLUSTER BY NONE: the declaration stays, maintenance
    stops re-clustering. Columns must exist and be numeric/temporal (the
    Morton key is numeric — same contract as OPTIMIZE ZORDER BY).
    Returns the committed version."""
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    if cols:
        from pyspark.sql.types import StructType

        declared = StructType.fromJson(json.loads(meta["schemaString"]))
        by_name = {f.name: f.dataType.typeName() for f in declared.fields}
        missing = [c for c in cols if c not in by_name]
        if missing:
            raise ValueError(f"{path}: clustering columns not in schema: {missing}")
        bad = [
            c for c in cols
            if by_name[c] not in (
                "byte", "short", "integer", "long", "float", "double",
                "decimal", "date", "timestamp", "timestamp_ntz",
            ) and not by_name[c].startswith("decimal")
        ]
        if bad:
            raise ValueError(
                f"{path}: clustering needs numeric/temporal columns, got "
                f"{[(c, by_name[c]) for c in bad]}"
            )
    mapping = _column_mapping(meta) if meta.get("schemaString") else None
    physical = [(mapping or {}).get(c, c) for c in cols]
    proto = _current_protocol(path)
    r0, w0 = _protocol_as_features(proto)
    new_proto = {
        "minReaderVersion": max(proto.get("minReaderVersion", 1) or 1, 1),
        "minWriterVersion": 7,
        **({"readerFeatures": sorted(r0)} if (proto.get("minReaderVersion", 1) or 1) >= 3 else {}),
        "writerFeatures": sorted(w0 | {"clustering", "domainMetadata"}),
    }
    now_ms = int(_time.time() * 1000)
    return _commit(
        path,
        [
            {"protocol": new_proto},
            {
                "domainMetadata": {
                    "domain": _CLUSTERING_DOMAIN,
                    "configuration": json.dumps(
                        {"clusteringColumns": [[c] for c in physical]}
                    ),
                    "removed": False,
                }
            },
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "CLUSTER BY",
                    "operationParameters": {"columns": json.dumps(cols)},
                }
            },
        ],
    )


def delta_clustering_columns(path: str) -> list[str]:
    """The table's declared clustering columns (LOGICAL names), [] when
    the table is not clustered (or CLUSTER BY NONE)."""
    cfg = _domain_metadata(path).get(_CLUSTERING_DOMAIN)
    if not cfg:
        return []
    physical = [c[0] for c in json.loads(cfg).get("clusteringColumns") or []]
    if not physical:
        return []
    _, meta = _replay_log_adds(path)
    mapping = _column_mapping(meta) if meta.get("schemaString") else None
    if mapping:
        back = {p: l for l, p in mapping.items()}
        return [back.get(p, p) for p in physical]
    return physical


def vacuum_delta(
    path: str, dry_run: bool = False, retention_hours: float = 0.0
) -> list[str]:
    """Delete data files no commit references anymore (the tombstones left
    by overwrites and compactions). Without vacuum a streaming+OPTIMIZE
    table grows without bound — the LOG stays small but dead bytes pile up.

    ``retention_hours`` (delta-spark's VACUUM ... RETAIN semantics,
    default 0 = reclaim everything dead now): a tombstoned file whose
    remove action's ``deletionTimestamp`` is newer than the cutoff
    SURVIVES, so time travel to any version retired within the window —
    and any in-flight query pinned to one — keeps its files; only
    history older than the window loses bytes. Orphans that no commit
    ever referenced (crashed staging dirs) fall back to file mtime.
    Production multi-reader deployments keep days here; the
    single-writer default matches this module's reader. Returns the
    deleted (or would-delete, under ``dry_run``) paths.
    """
    import time as _time

    cutoff_ms = (
        (_time.time() - retention_hours * 3600.0) * 1000.0
        if retention_hours > 0
        else None
    )
    tombstone_ms: dict[str, int] = {}
    if cutoff_ms is not None:
        # latest remove timestamp per path — checkpoint remove rows (the
        # spec carries unexpired tombstones through reconciliation exactly
        # for this) plus the retained JSON tail, so checkpoint +
        # cleanup_delta_log never strips a recent tombstone's age
        tombstone_ms = _collect_removes(path)

    def _retained(rel: str, full: str) -> bool:
        if cutoff_ms is None:
            return False
        ts = tombstone_ms.get(rel)
        if ts is None:  # orphan — no commit ever referenced it
            try:
                ts = int(os.path.getmtime(full) * 1000)
            except OSError:
                return False
        return ts >= cutoff_ms

    adds_map, _ = _replay_log_adds(path)
    live_names = set(adds_map)
    # DV bin files referenced by live adds must survive; orphaned ones
    # (their file was rewritten/compacted away) are dead bytes like any
    # tombstoned parquet
    live_dv_bins = {
        os.path.relpath(_resolve_dv_path(path, a["deletionVector"]), path)
        for a in adds_map.values()
        if a.get("deletionVector", {}).get("storageType") == "u"
    }
    # a CONVERTED dual-format table carries an Iceberg metadata/ dir whose
    # manifests reference files this log knows nothing about — the
    # metadata dir itself, AND (iceberg→delta direction) position-delete
    # parquet living under data/ next to shared data files. Vacuuming
    # either would corrupt the Iceberg view, so every file a retained
    # Iceberg snapshot references is exempt (metadata-sized manifest walk;
    # Iceberg's own expire/orphan actions reclaim that side's dead bytes).
    ice_dir = os.path.join(path, "metadata")
    skip_ice = os.path.isdir(ice_dir) and (
        os.path.exists(os.path.join(ice_dir, "version-hint.text"))
        or any(n.endswith(".metadata.json") for n in os.listdir(ice_dir))
    )
    ice_live: set[str] = set()
    if skip_ice:
        from . import avro_lite as _avro
        from . import iceberg as _ice

        try:
            _meta = _ice._load_metadata(path)
            for snap in _meta.get("snapshots", []):
                mlist = _ice._localize(snap["manifest-list"], path)
                for entry in _avro.read_container(mlist):
                    mp = _ice._localize(entry["manifest_path"], path)
                    for m in _avro.read_container(mp):
                        ice_live.add(
                            os.path.realpath(
                                _ice._localize(
                                    m["data_file"]["file_path"], path
                                )
                            )
                        )
        except (OSError, ValueError, KeyError):
            raise ValueError(
                f"{path}: table carries an Iceberg view whose metadata "
                "could not be walked — refusing to vacuum blind"
            )
    doomed: list[str] = []
    for dirpath, dirnames, filenames in os.walk(path):
        # metadata/staging/checkpoint dirs are not data space (Hive
        # partition dirs are col=value, never underscore-prefixed)
        dirnames[:] = [d for d in dirnames if not d.startswith("_")]
        if dirpath == path and skip_ice:
            dirnames[:] = [d for d in dirnames if d != "metadata"]
        for name in filenames:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, path)
            if (
                name.endswith(".parquet")
                and rel not in live_names
                and os.path.realpath(full) not in ice_live
                and not _retained(rel, full)
            ):
                doomed.append(rel)
            elif (
                name.startswith("deletion_vector_")
                and name.endswith(".bin")
                and rel not in live_dv_bins
                and not _retained(rel, full)
            ):
                doomed.append(rel)
    if not dry_run:
        for rel in doomed:
            os.remove(os.path.join(path, rel))
    return sorted(doomed)


# --------------------------------------------------------------- writer ----


def _next_version(log: str) -> int:
    versions = [
        int(name[:20])
        for name in os.listdir(log)
        if _is_commit_json(name)
    ]
    # after log cleanup the checkpoint may be the newest version marker —
    # without it the next commit would restart at 0 and corrupt the table
    ckpt_version, _ = _latest_checkpoint(log)
    versions.append(ckpt_version)
    newest = max(versions)
    return newest + 1 if newest >= 0 else 0


def _collect_txns(path: str) -> dict[str, int]:
    """Latest `txn` version per appId, reconciled from the newest
    checkpoint (which preserves txn actions — PROTOCOL.md requires it,
    else log cleanup would silently reset the exactly-once handshake) plus
    the JSON commits after it."""
    log = _delta_log_dir(path)
    best: dict[str, int] = {}
    ckpt_version, ckpt_files = _latest_checkpoint(log)
    if ckpt_files:
        for f in ckpt_files:
            for row in _manifest_rows(f, log, follow_sidecars=True):
                t = row.get("txn")
                if t and t.get("appId") is not None:
                    best[t["appId"]] = max(
                        best.get(t["appId"], -1), int(t.get("version", -1))
                    )
    for name in sorted(os.listdir(log)):
        if not (_is_commit_json(name)):
            continue
        if int(name[:20]) <= ckpt_version:
            continue
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                txn = action.get("txn")
                if txn and txn.get("appId") is not None:
                    best[txn["appId"]] = max(
                        best.get(txn["appId"], -1), int(txn.get("version", -1))
                    )
    return best


def _collect_removes(path: str) -> dict[str, int]:
    """Latest remove ``deletionTimestamp`` per tombstoned path: the newest
    checkpoint's remove rows plus the JSON tail (a later re-add cancels
    the tombstone). PROTOCOL.md checkpoint reconciliation keeps unexpired
    remove actions exactly so VACUUM retention survives log cleanup —
    without them a recently-retired file would lose its tombstone age and
    fall back to file mtime (its WRITE time), getting collected inside
    the retention window. Metadata-sized."""
    log = _delta_log_dir(path)
    out: dict[str, int] = {}
    ckpt_version, ckpt_files = _latest_checkpoint(log)
    for f in ckpt_files:
        for row in _manifest_rows(f, log, follow_sidecars=True):
            rm = row.get("remove")
            if rm and rm.get("path") is not None:
                out[rm["path"]] = int(rm.get("deletionTimestamp") or 0)
    for name in sorted(os.listdir(log)):
        if not _is_commit_json(name) or int(name[:20]) <= ckpt_version:
            continue
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("path"):
                    out.pop(action["add"]["path"], None)
                elif "remove" in action and action["remove"].get("path"):
                    out[action["remove"]["path"]] = int(
                        action["remove"].get("deletionTimestamp") or 0
                    )
    return out


def _domain_metadata(path: str) -> dict[str, str]:
    """domain -> configuration JSON string (PROTOCOL.md §Domain Metadata):
    newest checkpoint's domain rows plus the JSON tail, LAST action per
    domain wins, a removed domain drops out. Metadata-sized — the same
    replay pass the snapshot build already does."""
    log = _delta_log_dir(path)
    out: dict[str, str] = {}

    def _fold(dm) -> None:
        if not dm or dm.get("domain") is None:
            return
        if dm.get("removed"):
            out.pop(dm["domain"], None)
        else:
            out[dm["domain"]] = dm.get("configuration")

    ckpt_version, ckpt_files = _latest_checkpoint(log)
    for f in ckpt_files:
        for row in _manifest_rows(f, log, follow_sidecars=True):
            _fold(row.get("domainMetadata"))
    for name in sorted(os.listdir(log)):
        if not _is_commit_json(name):
            continue
        if int(name[:20]) <= ckpt_version:
            continue
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _fold(json.loads(line).get("domainMetadata"))
    return out


def last_txn_version(path: str, app_id: str) -> int:
    """Highest committed `txn` version for ``app_id`` in the table's log
    (-1 when none): the Delta protocol's idempotent-writer handshake —
    a streaming sink records (appId, batchId) in each commit and skips
    batches it already wrote. Survives checkpoint + log cleanup (txn state
    is carried into checkpoints)."""
    if not is_delta_table(path):
        return -1
    return _collect_txns(path).get(app_id, -1)


def checkpoint_delta(path: str, v2: bool = False) -> int:
    """Write a checkpoint of the CURRENT snapshot (PROTOCOL.md
    §checkpoints): one ``<v>.checkpoint.parquet`` holding the reconciled
    action state — protocol, metaData, every live `add` (with its
    partitionValues, re-derived from the Hive path), and the latest `txn`
    per appId — plus the ``_last_checkpoint`` pointer real readers consult.

    This bounds log-replay cost: a streaming sink committing once a minute
    accumulates 1440 JSON commits a day, and every snapshot build replays
    all of them; after a checkpoint, readers parse ONE parquet plus the
    JSON tail. Pair with ``cleanup_delta_log`` to actually drop the old
    JSON files. Driver-side and O(#live files + #apps) — the same
    materialization every Delta writer's checkpointing does.

    ``v2=True`` writes a V2 CHECKPOINT (PROTOCOL.md §V2 Checkpoints): a
    UUID-named manifest ``<v>.checkpoint.<uuid>.parquet`` carrying
    checkpointMetadata + protocol + metaData + txns and a ``sidecar``
    pointer, with the file actions in a parquet SIDECAR under
    ``_delta_log/_sidecars/``. Why the format exists at scale: the
    manifest stays tiny and sidecars are immutable, so an incremental
    checkpointer can reuse unchanged sidecar files instead of rewriting
    the whole state each time (this writer emits one sidecar — the
    simplest valid form). The manifest's protocol row declares the
    ``v2Checkpoint`` reader feature, carrying existing features forward.

    Returns the checkpointed version. No-op (returns the existing
    checkpoint version) when nothing was committed since the last one.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    log = _delta_log_dir(path)
    ckpt_version, _ = _latest_checkpoint(log)
    json_versions = [
        int(n[:20])
        for n in os.listdir(log)
        if _is_commit_json(n)
    ]
    if not json_versions or max(json_versions) <= ckpt_version:
        return ckpt_version  # nothing new since the last checkpoint
    version = max(json_versions)
    adds_map, meta = _replay_log_adds(path)
    txns = _collect_txns(path)
    domains = _domain_metadata(path)
    # unexpired tombstones ride along (PROTOCOL.md checkpoint
    # reconciliation): a remove whose file is still on disk keeps its
    # deletionTimestamp through log cleanup, so vacuum retention_hours
    # can still honor it; already-vacuumed tombstones drop out here
    removes = {
        p: ts
        for p, ts in _collect_removes(path).items()
        if p not in adds_map and os.path.exists(os.path.join(path, p))
    }
    has_dv = any(a.get("deletionVector") for a in adds_map.values())
    base = {
        "protocol": None,
        "metaData": None,
        "add": None,
        "txn": None,
        "domainMetadata": None,
    }
    if removes:
        # from_pylist infers the schema from the first row's keys — the
        # column must exist on every row or the tombstones silently drop
        base["remove"] = None
    # the checkpoint must carry the table's ACTUAL protocol — synthesizing
    # one here silently un-declared active features (column mapping's
    # reader gate, constraints, identity's v6) once cleanup dropped the
    # JSON commit that declared them
    protocol = _current_protocol(path)
    rows: list[dict] = [{**base, "protocol": protocol}]
    if meta:
        # configuration MUST survive: it carries the column-mapping mode —
        # dropping it would make post-cleanup reads look up LOGICAL names
        # in physically-named files and return all-null columns
        keep = ("id", "name", "description", "schemaString",
                "partitionColumns", "createdTime", "configuration")
        md = {k: meta[k] for k in keep if k in meta and meta[k]}
        # parquet cannot hold empty structs; keep format as provider-only
        provider = (meta.get("format") or {}).get("provider", "parquet")
        md["format"] = {"provider": provider}
        rows.append({**base, "metaData": md})
    for app_id, v in sorted(txns.items()):
        rows.append({**base, "txn": {"appId": app_id, "version": v}})
    for domain, cfg in sorted(domains.items()):
        # domain metadata must survive checkpoint + cleanup (it carries
        # e.g. the row-tracking high water mark — losing it would make
        # the next append reissue row ids)
        rows.append(
            {
                **base,
                "domainMetadata": {
                    "domain": domain,
                    "configuration": cfg,
                    "removed": False,
                },
            }
        )
    now_ms = int(__import__("time").time() * 1000)
    for rel, a in adds_map.items():
        f = os.path.join(path, rel)
        add_row = {
            "path": rel.replace(os.sep, "/"),
            # None (not {}) when unpartitioned: parquet rejects
            # empty structs; readers treat absent as no partitions
            "partitionValues": _hive_partition_values(
                os.path.dirname(rel)
            ) or None,
            "size": os.path.getsize(f) if os.path.exists(f) else 0,
            "modificationTime": now_ms,
            "dataChange": True,
            # stats must survive checkpoint + log cleanup, or data
            # skipping silently stops working once the JSON tail is gone
            "stats": a.get("stats"),
            # row-tracking identity rides on the adds — dropping it would
            # reassign every row id at the next replay
            "baseRowId": a.get("baseRowId"),
            "defaultRowCommitVersion": a.get("defaultRowCommitVersion"),
        }
        if has_dv:
            # deletion vectors must survive checkpoint + log cleanup, or
            # deleted rows would RESURRECT once the JSON commits are gone;
            # normalized to a fixed key set so pyarrow infers one struct
            d = a.get("deletionVector")
            add_row["deletionVector"] = (
                {
                    "storageType": d.get("storageType"),
                    "pathOrInlineDv": d.get("pathOrInlineDv"),
                    "offset": d.get("offset"),
                    "sizeInBytes": d.get("sizeInBytes"),
                    "cardinality": d.get("cardinality"),
                }
                if d
                else None
            )
        rows.append({**base, "add": add_row})
    for p, ts in sorted(removes.items()):
        # from_pylist fills the 'remove' key as null on every other row
        rows.append(
            {
                **base,
                "remove": {
                    "path": p.replace(os.sep, "/"),
                    "deletionTimestamp": ts,
                    "dataChange": True,
                },
            }
        )
    if not v2:
        pq.write_table(
            pa.Table.from_pylist(rows),
            os.path.join(log, f"{version:020d}.checkpoint.parquet"),
        )
        with open(os.path.join(log, "_last_checkpoint"), "w", encoding="utf-8") as fh:
            json.dump({"version": version, "size": len(rows)}, fh)
        return version

    # ---- V2: sidecar with the file actions, UUID-named manifest ----
    import uuid as _uuid

    sidecar_dir = os.path.join(log, "_sidecars")
    os.makedirs(sidecar_dir, exist_ok=True)
    # file actions (adds AND remove tombstones) belong in the sidecar;
    # the manifest keeps only the table-level head rows
    add_rows = [
        {"add": r.get("add"), "remove": r.get("remove")}
        for r in rows
        if r.get("add") is not None or r.get("remove") is not None
    ]
    head_rows = [
        r for r in rows if r.get("add") is None and r.get("remove") is None
    ]
    sc_name = f"{_uuid.uuid4().hex}.parquet"
    sc_path = os.path.join(sidecar_dir, sc_name)
    pq.write_table(pa.Table.from_pylist(add_rows or [{"add": None}]), sc_path)
    # the manifest protocol must DECLARE v2Checkpoint, carrying every
    # feature the table already uses forward — legacy versions expand to
    # their implied feature lists (mapping mode, constraints, identity);
    # DV descriptors ride on the adds
    r0, w0 = _protocol_as_features(protocol)
    if has_dv:
        r0.add("deletionVectors")
        w0.add("deletionVectors")
    v2_protocol = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": sorted(r0 | {"v2Checkpoint"}),
        "writerFeatures": sorted(w0 | {"v2Checkpoint"}),
    }
    base2 = {
        "checkpointMetadata": None,
        "sidecar": None,
        "protocol": None,
        "metaData": None,
        "txn": None,
        "domainMetadata": None,
    }
    manifest_rows = [{**base2, "checkpointMetadata": {"version": version}}]
    for r in head_rows:
        row = {**base2}
        if r.get("protocol") is not None:
            row["protocol"] = v2_protocol
        for k in ("metaData", "txn", "domainMetadata"):
            if r.get(k) is not None:
                row[k] = r[k]
        manifest_rows.append(row)
    manifest_rows.append(
        {
            **base2,
            "sidecar": {
                "path": sc_name,
                "sizeInBytes": os.path.getsize(sc_path),
                "modificationTime": now_ms,
            },
        }
    )
    pq.write_table(
        pa.Table.from_pylist(manifest_rows),
        os.path.join(log, f"{version:020d}.checkpoint.{_uuid.uuid4().hex}.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    return version


def cleanup_delta_log(path: str) -> list[str]:
    """Delete JSON commits already captured by the newest checkpoint (and
    superseded older checkpoints). The forward path stays intact — readers
    resolve checkpoint + JSON tail; incremental reads and time travel into
    the cleaned range FAIL LOUDLY (read_delta_changes' contiguity check,
    the time-travel guard) instead of returning partial history. Returns
    the deleted file names."""
    log = _delta_log_dir(path)
    ckpt_version, ckpt_files = _latest_checkpoint(log)
    if ckpt_version < 0:
        return []
    doomed = [
        n
        for n in os.listdir(log)
        if (_is_commit_json(n) and int(n[:20]) <= ckpt_version)
        or (
            ".checkpoint." in n
            and (n.endswith(".parquet") or n.endswith(".json"))
            and os.path.join(log, n) not in ckpt_files
        )
    ]
    # sidecars referenced by the RETAINED checkpoint manifests stay;
    # anything else under _sidecars is debris from superseded v2
    # checkpoints and would otherwise accumulate forever
    side_dir = os.path.join(log, "_sidecars")
    if os.path.isdir(side_dir):
        live_sidecars: set[str] = set()
        for f in ckpt_files:
            for row in _manifest_rows(f, log):
                sc = row.get("sidecar")
                if sc and sc.get("path"):
                    live_sidecars.add(os.path.basename(sc["path"]))
        for n in os.listdir(side_dir):
            if n not in live_sidecars:
                doomed.append(os.path.join("_sidecars", n))
    for n in doomed:
        os.remove(os.path.join(log, n))
    return sorted(doomed)


def _assign_identity(
    df: DataFrame, id_specs: "dict[str, tuple[int, int, int | None]]", path: str
) -> DataFrame:
    """Generate values for IDENTITY columns (PROTOCOL.md §Identity
    Columns, GENERATED ALWAYS): value = base + step * m where m is the
    batch's ``monotonically_increasing_id`` — unique and step-aligned
    with gaps (the spec allows gaps; contiguity would need a global
    row_number shuffle), base = start on first write, highWaterMark +
    step afterwards. A batch that already carries the column is refused
    (ALWAYS forbids explicit inserts)."""
    from pyspark.sql import functions as F

    for c, (st, sp, hwm) in id_specs.items():
        if c in df.columns:
            raise ValueError(
                f"{path}: identity column {c!r} is GENERATED ALWAYS — "
                "the batch must not supply it"
            )
        base = st if hwm is None else hwm + sp
        df = df.withColumn(
            c,
            (
                F.lit(int(base)).cast("long")
                + F.lit(int(sp)).cast("long")
                * F.monotonically_increasing_id()
            ).cast("long"),
        )
    return df


def _advance_identity_schema(
    id_specs: "dict[str, tuple[int, int, int | None]]",
    base_schema: dict,
    adds: "list[dict]",
) -> str:
    """Fold the staged files' footer stats into each identity column's
    ``delta.identity.highWaterMark`` and return the updated schemaString
    — the HWM advances in the SAME commit as the data, with zero extra
    jobs (the stats describe what was actually written; step > 0 reads
    maxValues, step < 0 minValues)."""
    for f in base_schema.get("fields", []):
        c = f["name"]
        if c not in id_specs:
            continue
        st, sp, hwm = id_specs[c]
        md = dict(f.get("metadata") or {})
        md.setdefault("delta.identity.start", int(st))
        md.setdefault("delta.identity.step", int(sp))
        md.setdefault("delta.identity.allowExplicitInsert", False)
        ext = hwm
        n_new_rows = 0
        advanced = False
        for a in adds:
            try:
                stats = json.loads(a["add"].get("stats") or "{}")
            except (TypeError, ValueError):
                stats = {}
            n_new_rows += int(stats.get("numRecords") or 0)
            for side in ("minValues", "maxValues"):
                v = (stats.get(side) or {}).get(c)
                if v is None:
                    continue
                v = int(v)
                # misalignment = generation arithmetic overflowed int64
                # (monotonically_increasing_id reaches ~2^53 at extreme
                # partition counts; step*m can wrap silently) — corrupt
                # ids must never commit
                if (v - st) % sp != 0 or (v < st if sp > 0 else v > st):
                    raise ValueError(
                        f"identity column {c!r}: generated value {v} is "
                        f"not step-aligned from start {st} (step {sp}) — "
                        "int64 overflow in generation; reduce the step "
                        "or the partition count"
                    )
                if side == ("maxValues" if sp > 0 else "minValues"):
                    advanced = True
                    ext = (
                        v
                        if ext is None
                        else (max(ext, v) if sp > 0 else min(ext, v))
                    )
        if n_new_rows > 0 and not advanced:
            # stats collection fails open, but the identity watermark must
            # not: committing without advancing it would re-issue the same
            # values on the next append
            raise ValueError(
                f"identity column {c!r}: staged files carry no usable "
                "footer bounds — high water mark cannot advance; refusing "
                "to commit values that the next append would duplicate"
            )
        if ext is not None:
            md["delta.identity.highWaterMark"] = int(ext)
        f["metadata"] = md
    return json.dumps(base_schema)


def _allocate_base_row_ids(path: str, adds: "list[dict]") -> dict:
    """Assign contiguous ``baseRowId`` ranges to ``adds`` (in place) from
    the delta.rowTracking domain's high water mark, sized by each staged
    file's stats/footer row count, and return the domainMetadata action
    advancing the mark. ``defaultRowCommitVersion`` is patched by the
    caller once the commit version is known. Shared by write_delta and
    compact_delta so the allocation rule cannot diverge."""
    import pyarrow.parquet as _pq

    dm = _domain_metadata(path)
    try:
        nxt = int(
            json.loads(dm.get("delta.rowTracking") or "{}").get(
                "rowIdHighWaterMark", -1
            )
        ) + 1
    except (TypeError, ValueError):
        raise ValueError(
            f"{path}: unparseable delta.rowTracking domain metadata"
        )
    for a in adds:
        try:
            n = int(
                json.loads(a["add"].get("stats") or "{}").get("numRecords")
            )
        except (TypeError, ValueError):
            n = _pq.ParquetFile(
                os.path.join(path, a["add"]["path"])
            ).metadata.num_rows
        a["add"]["baseRowId"] = nxt
        nxt += n
    return {
        "domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": nxt - 1}),
            "removed": False,
        }
    }


#: characters URI encoding never touches (RFC 3986 unreserved + path
#: separators): a path made only of these encodes to ITSELF, so the raw
#: _metadata.file_path column already equals "file:" + abspath
_URI_CLEAN = re.compile(r"^[A-Za-z0-9/._~-]*$")


def _uniform_sync(
    spark: SparkSession, path: str, meta: dict, version: int
) -> int:
    """UniForm-style metadata sync: when the table sets
    ``delta.universalFormat.enabledFormats`` to include ``iceberg``, every
    committed mutation re-generates the Iceberg view of the new snapshot
    so the same directory keeps reading as either format — the per-commit
    shape of Delta UniForm, implemented as a converter refresh. The
    refresh is INCREMENTAL for every commit shape (round 9): append-only
    and DV-only commits carry the prior manifests verbatim; rewrite
    commits (merge/update/compact/replaceWhere) carry untouched
    manifests and rewrite only the ones referencing a removed file, so
    per-commit write cost is O(files in touched manifests + adds), not
    O(#table-files). Only a schema/spec/type change since the prior sync
    falls back to the full single-manifest rebuild. A sync failure surfaces
    AFTER the Delta commit: the Delta table is valid and the error says
    the Iceberg view is stale — UniForm's own convert-on-commit error
    surface. Zero cost when the property is unset.

    Also the shared POST-COMMIT hook: ``delta.checkpointInterval``
    (delta-spark's auto-checkpoint property, round 8) writes a checkpoint
    after every Nth commit, so a streaming sink committing once a minute
    keeps its log-replay cost bounded without anyone remembering to run
    checkpoint_delta — log CLEANUP stays explicit (it deliberately
    destroys time travel into the cleaned range)."""
    conf = meta.get("configuration") or {}
    try:
        interval = int(conf.get("delta.checkpointInterval") or 0)
    except (TypeError, ValueError):
        raise ValueError(
            f"{path}: non-integer delta.checkpointInterval "
            f"{conf.get('delta.checkpointInterval')!r}"
        )
    if interval > 0 and version > 0 and version % interval == 0:
        checkpoint_delta(path)
    fmts = conf.get("delta.universalFormat.enabledFormats", "")
    if "iceberg" not in [f.strip() for f in fmts.split(",")]:
        return version
    from . import convert as _convert
    from . import iceberg as _ice

    _convert.convert_delta_to_iceberg(
        spark, path, refresh=_ice.is_iceberg_table(path)
    )
    return version


def _decoded_file_path(paths: "list[str] | None" = None):
    """``_metadata.file_path`` is a percent-ENCODED URI; driver-built
    broadcast maps key on the RAW on-disk path ("file:" + abspath). One
    decode restores the exact on-disk bytes — a literal '%' in a dir name
    (Spark's own Hive escaping writes them, e.g. value 'x=y' becomes dir
    'p=x%3Dy') always arrives double-encoded as %25. ``url_decode`` is
    form-decoding (a bare '+' would become a space), so literal plus
    signs are pre-protected. Joining the raw column instead silently
    matches NOTHING on special-char partition values.

    ``paths``: the candidate file set, when the caller holds it — if
    every path is URI-clean (unreserved chars only), encoding is the
    identity and the raw column is returned, skipping the per-row
    regexp+decode on the common hot path."""
    from pyspark.sql import functions as F

    if paths is not None and all(_URI_CLEAN.match(p) for p in paths):
        return F.col("_metadata.file_path")
    return F.url_decode(
        F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
    )


def _commit_row_tracked(
    path: str, actions: list[dict], adds: "list[dict]", operation: str
) -> int:
    """Single-attempt commit for a snapshot-rewriting operation on a
    row-tracked table: allocate fresh ``baseRowId`` ranges for the staged
    adds (the spec requires one on every add while the feature is
    active), stamp ``defaultRowCommitVersion`` with the commit version,
    and refuse blind retries — a re-run must re-read the snapshot, or the
    retried allocation would duplicate ranges. ``actions`` must end with
    the commitInfo action; the domainMetadata watermark advance is
    inserted just before it. Shared by compact_delta and the DML
    rewrites (merge/update/replaceWhere) so the rule cannot diverge."""
    actions.insert(len(actions) - 1, _allocate_base_row_ids(path, adds))
    log = _delta_log_dir(path)
    version = _next_version(log)
    for a in adds:
        a["add"]["defaultRowCommitVersion"] = version
    if not _try_commit(log, version, actions, path):
        raise RuntimeError(
            f"{path}: version {version} was committed concurrently — "
            f"re-run the {operation} against the new snapshot"
        )
    return version


def _rt_materialization(meta: dict, path: str) -> "tuple[str, str] | None":
    """The (row-id, row-commit-version) MATERIALIZED physical column names
    when id preservation applies (``delta.enableRowTracking`` is actually
    on), else None. The allocation OBLIGATION is broader — it follows the
    protocol feature even while the flag is off — and is checked
    separately by each caller (spec §Row Tracking)."""
    conf = meta.get("configuration") or {}
    if conf.get("delta.enableRowTracking") != "true":
        return None
    mat_id = conf.get("delta.rowTracking.materializedRowIdColumnName")
    mat_ver = conf.get(
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    )
    if not (mat_id and mat_ver):
        raise ValueError(
            f"{path}: row tracking enabled but the materialized column "
            "names are not configured — corrupt table properties"
        )
    return mat_id, mat_ver


def _identity_specs(meta: dict) -> "dict[str, tuple[int, int, int | None]]":
    """IDENTITY column specs declared in the table schema
    (``delta.identity.*`` field metadata, PROTOCOL.md §Identity Columns):
    column -> (start, step, highWaterMark | None before the first
    generated value commits)."""
    out: dict[str, tuple[int, int, int | None]] = {}
    if not meta.get("schemaString"):
        return out
    for f in json.loads(meta["schemaString"]).get("fields", []):
        md = f.get("metadata") or {}
        if "delta.identity.start" in md:
            out[f["name"]] = (
                int(md["delta.identity.start"]),
                int(md.get("delta.identity.step", 1)),
                (
                    int(md["delta.identity.highWaterMark"])
                    if "delta.identity.highWaterMark" in md
                    else None
                ),
            )
    return out


def _hive_partition_values(rel_dir: str) -> dict[str, str | None]:
    """Parse Hive-style directory components (``k=v/k2=v2``) into the
    protocol's partitionValues map. Values are URL-unescaped (Spark escapes
    special chars when writing dir names); the Hive null sentinel maps to
    JSON null, as the spec requires."""
    from urllib.parse import unquote

    out: dict[str, str | None] = {}
    for comp in rel_dir.split(os.sep):
        if not comp or "=" not in comp:
            continue
        k, v = comp.split("=", 1)
        out[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return out


def write_delta(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    txn: tuple[str, int] | None = None,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    column_mapping: str | None = None,
    replace_where: str | None = None,
    identity_columns: dict[str, tuple[int, int]] | None = None,
    row_tracking: bool = False,
) -> int:
    """Write a DataFrame to a Delta table via the open commit protocol:
    parquet data files + one JSON commit carrying `add` (and, on overwrite,
    `remove`) actions. Native `format("delta")` when the jar is present;
    otherwise a pure-python log append that both this module's fallback
    reader and any real Delta reader can consume (minReader/WriterVersion
    1/2, no advanced table features).

    Returns the committed version number.

    Scale/correctness notes:
    - The DATA write is a normal distributed ``df.write.parquet`` into a
      staging dir — executors do all the IO; only the file RENAMES and the
      commit append run on the driver (O(#files), metadata-only — the same
      work any Delta writer's driver does).
    - Readers never see a partial write: data files are invisible until the
      commit JSON appears, and the commit is written to a temp name then
      atomically renamed (same-filesystem ``os.rename``).
    - SINGLE WRITER assumption, fail-loud: if the target version file
      already exists at rename time the commit raises instead of clobbering
      — real multi-writer Delta needs a coordinated log store (the
      LogStore/commit-coordinator protocol), which a filesystem rename
      cannot provide on eventually-consistent object stores.
    - ``partition_by``: Hive-layout partitioned write — data files land
      under ``col=value/`` dirs with per-file `partitionValues` in the add
      actions (the protocol's partition bookkeeping), so both this
      module's reader (basePath reconstruction) and real Delta readers
      prune partitions. Appends must repeat the table's declared
      partitioning — changing it requires overwrite.
    - ``txn``: optional (app_id, version) recorded as a protocol `txn`
      action. When the table already holds a txn for this app at ≥ this
      version, the write is SKIPPED (returns that committed version) —
      the exactly-once handshake a streaming foreachBatch sink relies on
      to make micro-batch retries idempotent.
    """
    import uuid

    if mode not in ("append", "overwrite"):
        raise ValueError(f"write_delta: mode must be append|overwrite, got {mode!r}")
    if replace_where is not None:
        # delta-spark's df.write.option("replaceWhere", ...) surface:
        # a SELECTIVE overwrite delegates to the dedicated backfill path
        if mode != "overwrite":
            raise ValueError(
                "write_delta: replace_where requires mode='overwrite'"
            )
        if not is_delta_table(path):
            raise ValueError(
                f"{path}: replace_where targets an existing table — "
                "create it with a plain write first"
            )
        return overwrite_delta_where(spark, df, path, replace_where, txn=txn)
    cm_meta: dict | None = None
    if column_mapping is not None:
        # CREATE a column-mapped table (both modes): every field gets a
        # stable delta.columnMapping.id and an opaque physicalName; files
        # are staged under physical names (ID mode additionally stamps
        # parquet field ids — see _to_physical). Creation-time only, like
        # delta-spark: retrofitting ID mapping onto existing files would
        # need a footer rewrite.
        if column_mapping not in ("name", "id"):
            raise ValueError(
                f"write_delta: column_mapping must be name|id, got "
                f"{column_mapping!r}"
            )
        if is_delta_table(path):
            raise NotImplementedError(
                f"{path}: column_mapping can only be set when CREATING a "
                "table (use rename_delta_column to upgrade an existing "
                "table to name mode)"
            )
        sch = json.loads(df.schema.json())
        import itertools as _it

        _cm_ctr = _it.count(1)
        for fld in sch["fields"]:
            md = dict(fld.get("metadata") or {})
            md["delta.columnMapping.id"] = next(_cm_ctr)
            md["delta.columnMapping.physicalName"] = f"col-{uuid.uuid4().hex[:8]}"
            fld["metadata"] = md
            # nested members get ids too (depth-first, standard
            # delta-spark shape) — see _assign_nested_mapping_ids
            _assign_nested_mapping_ids(fld.get("type"), _cm_ctr)
        _cm_max = next(_cm_ctr) - 1
        cm_meta = {
            "schemaString": json.dumps(sch),
            "configuration": {
                "delta.columnMapping.mode": column_mapping,
                "delta.columnMapping.maxColumnId": str(_cm_max),
            },
        }
    if txn is not None:
        app_id, txn_version = txn
        committed = last_txn_version(path, app_id)
        if committed >= txn_version:
            return committed
    try:
        if (
            cm_meta is not None
            or identity_columns is not None
            or row_tracking
            or _nativesrc.known_absent(spark, "delta")
        ):
            raise _FallbackWriter()  # native option plumbing not wired
        writer = df.write.format("delta").mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if txn is not None:
            # record the (appId, version) handshake natively too — without
            # these options a delta-spark deployment would re-apply retried
            # micro-batches (at-least-once), silently breaking the
            # exactly-once contract stream_to_delta documents.
            writer = writer.option("txnAppId", txn[0]).option(
                "txnVersion", str(txn[1])
            )
        writer.save(path)
        return _next_version(_delta_log_dir(path)) - 1
    except _FallbackWriter:
        pass
    except Exception as exc:
        if "DATA_SOURCE_NOT_FOUND" not in str(exc) and "Failed to find" not in str(exc):
            raise
        # memoize only the PRECISE missing-source signature (the broad
        # match above stays one-shot — see io/nativesrc)
        if _nativesrc.is_source_not_found(exc):
            _nativesrc.mark_absent(spark, "delta")

    os.makedirs(path, exist_ok=True)
    log = _delta_log_dir(path)
    os.makedirs(log, exist_ok=True)
    existing = is_delta_table(path)
    prior_files: list[str] = []
    table_meta: dict = {}
    evolved_schema_json: str | None = None
    # IDENTITY COLUMNS (PROTOCOL.md §Identity Columns): GENERATED ALWAYS
    # long columns the writer assigns. Values are base + step*m where m
    # is the batch's monotonically_increasing_id — unique and
    # step-aligned with gaps (the spec allows gaps; contiguity would
    # need a global row_number shuffle). The high water mark advances in
    # the SAME commit, derived from the staged files' footer stats —
    # zero extra jobs and immune to nondeterministic sources (the stats
    # describe what was actually written).
    id_specs: dict[str, tuple[int, int, int | None]] = {}
    if identity_columns:
        if existing:
            raise ValueError(
                f"{path}: identity columns are declared at CREATE — the "
                "table already exists"
            )
        if column_mapping is not None:
            raise NotImplementedError(
                "write_delta: identity + column mapping is not implemented"
            )
        for c, (st, sp) in identity_columns.items():
            if int(sp) == 0:
                raise ValueError("write_delta: identity step must be non-zero")
            id_specs[c] = (int(st), int(sp), None)
    # ROW TRACKING (PROTOCOL.md §Row Tracking): stable row ids assigned
    # at write time — each add carries baseRowId (its rows' ids are
    # baseRowId + position) and defaultRowCommitVersion; the allocation
    # high water mark lives in the delta.rowTracking DOMAIN METADATA and
    # advances in the same commit.
    if row_tracking:
        if existing:
            raise ValueError(
                f"{path}: row tracking is declared at CREATE — use "
                "enable_delta_row_tracking for an existing table"
            )
        if column_mapping is not None:
            raise NotImplementedError(
                "write_delta: row_tracking + column mapping is not "
                "implemented"
            )
    table_proto: dict = {}
    if existing:
        prior_live, meta = _replay_log(path)
        table_meta = meta
        table_proto = _check_write_allowed(path, meta, mode)
        id_specs.update(_identity_specs(meta))
        if id_specs:
            df = _assign_identity(df, id_specs, path)
        _enforce_constraints(df, meta, path)
        _enforce_generated(df, meta, path)
        declared_parts = meta.get("partitionColumns") or []
        if mode == "append" and declared_parts != (partition_by or []):
            raise ValueError(
                f"{path}: append partitioning {partition_by or []} does not "
                f"match the table's declared partitionColumns "
                f"{declared_parts}; repartitioning requires mode='overwrite'"
            )
        if mode == "append" and meta.get("schemaString"):
            # Delta validates appends against the table schema — without
            # this, a drifted producer writes files the declared schema
            # cannot read back (silent corruption). With ``merge_schema``
            # (Delta's mergeSchema) the batch may ADD nullable columns:
            # the commit re-emits metaData with the widened schema and the
            # reader backfills old files with null. Dropping or re-typing
            # a column stays fail-loud either way.
            from pyspark.sql.types import StructField, StructType

            declared = StructType.fromJson(json.loads(meta["schemaString"]))
            # COLUMN DEFAULTS (PROTOCOL.md §Default Columns): a batch may
            # omit a column carrying CURRENT_DEFAULT — the writer
            # materializes the expression, then the ordinary check runs
            df = _apply_write_defaults(df, meta, declared)
            got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
            want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
            if got != want and not merge_schema:
                raise ValueError(
                    f"{path}: append schema mismatch — table declares "
                    f"{want}, batch carries {got}; pass merge_schema=True "
                    "to add columns, or rewrite via mode='overwrite'"
                )
            if got != want:
                if partition_by:
                    raise NotImplementedError(
                        f"{path}: schema evolution on a partitioned append "
                        "is not implemented"
                    )
                got_map = dict(got)
                for n, t in want:
                    if n not in got_map:
                        raise ValueError(
                            f"{path}: schema evolution cannot DROP column "
                            f"{n!r} — the batch must carry every declared column"
                        )
                    if got_map[n] != t:
                        raise ValueError(
                            f"{path}: schema evolution cannot change column "
                            f"{n!r} from {t} to {got_map[n]}"
                        )
                declared_names = {n for n, _ in want}
                new_fields = [
                    StructField(f.name, f.dataType, True)
                    for f in df.schema.fields
                    if f.name not in declared_names
                ]
                evolved = StructType(list(declared.fields) + new_fields)
                df = df.select(*[fld.name for fld in evolved.fields])
                if _mapping_mode(meta) in ("name", "id"):
                    # a MAPPED table's new columns need physicalName +
                    # columnMapping.id metadata or the table's own
                    # validator (and any real reader) refuses it as
                    # corrupt; fresh ids come off the recorded max
                    ev = json.loads(evolved.json())
                    conf0 = dict(meta.get("configuration") or {})
                    prior_fields = {
                        f["name"]: f
                        for f in json.loads(meta["schemaString"])["fields"]
                    }
                    # fresh ids start past BOTH the recorded HWM and
                    # every existing field's id — a foreign writer that
                    # omitted maxColumnId must not cause id collisions
                    # (two logical names on one parquet field id reads
                    # the wrong column silently in id mode)
                    def _all_cm_ids(fields_json):
                        out = []

                        def walk_t(t):
                            if not isinstance(t, dict):
                                return
                            if t.get("type") == "struct":
                                for g in t.get("fields", []):
                                    out.append(
                                        int(
                                            (g.get("metadata") or {}).get(
                                                "delta.columnMapping.id", 0
                                            )
                                        )
                                    )
                                    walk_t(g.get("type"))
                            elif t.get("type") == "array":
                                walk_t(t.get("elementType"))
                            elif t.get("type") == "map":
                                walk_t(t.get("keyType"))
                                walk_t(t.get("valueType"))

                        for f in fields_json:
                            out.append(
                                int(
                                    (f.get("metadata") or {}).get(
                                        "delta.columnMapping.id", 0
                                    )
                                )
                            )
                            walk_t(f.get("type"))
                        return out

                    # NESTED member ids count toward the HWM too (round
                    # 14): a fresh id colliding with a live member id
                    # reads the wrong column silently in id mode
                    next_id = max(
                        [int(conf0.get("delta.columnMapping.maxColumnId", 0))]
                        + _all_cm_ids(list(prior_fields.values()))
                    )
                    used_phys = {
                        (f.get("metadata") or {}).get(
                            "delta.columnMapping.physicalName"
                        )
                        for f in prior_fields.values()
                    }
                    for fld in ev["fields"]:
                        if fld["name"] in prior_fields:
                            fld["metadata"] = prior_fields[fld["name"]].get(
                                "metadata"
                            ) or {}
                            continue
                        next_id += 1
                        # opaque physical name, like the create path: a
                        # rename keeps the OLD physicalName on the renamed
                        # field, so re-using the freed logical name here
                        # with physicalName==logical would put two fields
                        # on one physical column (duplicate parquet column
                        # on write; both logical columns reading one
                        # physical column in name mode)
                        phys = f"col-{uuid.uuid4().hex[:8]}"
                        while phys in used_phys:  # pragma: no cover
                            phys = f"col-{uuid.uuid4().hex[:8]}"
                        used_phys.add(phys)
                        fld["metadata"] = {
                            **(fld.get("metadata") or {}),
                            "delta.columnMapping.physicalName": phys,
                            "delta.columnMapping.id": next_id,
                        }
                        import itertools as _it2

                        _nctr = _it2.count(next_id + 1)
                        _assign_nested_mapping_ids(fld.get("type"), _nctr)
                        next_id = next(_nctr) - 1
                    conf0["delta.columnMapping.maxColumnId"] = str(next_id)
                    evolved_schema_json = json.dumps(ev)
                    # downstream staging (_to_physical) and the metaData
                    # re-emit must all see the evolved MAPPED schema
                    meta = {
                        **meta,
                        "schemaString": evolved_schema_json,
                        "configuration": conf0,
                    }
                    table_meta = meta
                else:
                    evolved_schema_json = evolved.json()
        if mode == "overwrite":
            prior_files = [os.path.relpath(f, path) for f in prior_live]
    elif id_specs:
        df = _assign_identity(df, id_specs, path)  # table creation

    # 1. distributed data write into a staging dir (Hive layout when
    #    partitioned — executors write straight into col=value/ dirs)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    # overwrite of an EXISTING column-mapped table keeps the mapping (the
    # configuration is preserved below, so the files must stay physical
    # and the schemaString mapped — staging logical names here would
    # orphan the mapping and null every subsequent read); a schema change
    # through that path is refused
    mapped_overwrite = bool(
        existing
        and mode == "overwrite"
        and cm_meta is None
        and table_meta.get("schemaString")
        and _mapping_mode(table_meta)
    )
    if mapped_overwrite:
        from pyspark.sql.types import StructType as _ST

        _declared = _ST.fromJson(json.loads(table_meta["schemaString"]))
        if [
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        ] != [
            (f.name, f.dataType.simpleString()) for f in _declared.fields
        ]:
            raise NotImplementedError(
                f"{path}: overwrite of a column-mapped table with a "
                "DIFFERENT schema is not implemented — the batch must "
                "match the declared logical schema so files stage under "
                "the existing physical names"
            )
    # append to (or mapped-overwrite of) a column-mapped table stages
    # PHYSICAL names
    if cm_meta is not None:
        staged_df = _to_physical(df, cm_meta)
    elif mode == "append" or mapped_overwrite:
        staged_df = _to_physical(df, table_meta)
    else:
        staged_df = df
    stage_writer = staged_df.write
    if partition_by:
        # a mapped table's partition DIRS carry physical names — stage
        # under them so the layout survives partition-column renames
        if cm_meta is not None:
            stage_mapping = _physical_names(cm_meta)
        elif (
            (mode == "append" or mapped_overwrite)
            and existing
            and table_meta.get("schemaString")
            and _mapping_mode(table_meta)
        ):
            # physicalName map covers BOTH mapping modes (ID included —
            # _column_mapping deliberately returns None for it)
            stage_mapping = _physical_names(table_meta)
        else:
            stage_mapping = {}
        stage_writer = stage_writer.partitionBy(
            *[stage_mapping.get(c, c) for c in partition_by]
        )
    stage_writer.parquet(staging)
    # 2. driver-side metadata: move data files into the table root under
    #    unique names (uuid prefix — two concurrent stages can't collide),
    #    preserving partition dirs; each add records its partitionValues
    import time as _time

    now_ms = int(_time.time() * 1000)
    adds = _promote_staged(staging, path, now_ms, data_change=True)

    # identity high-water-mark advance, SAME commit as the data (from the
    # staged footers' stats — no extra jobs); base schema is the table's
    # declared one when it exists (metadata survives), else the batch's
    identity_schema_json: str | None = None
    if id_specs:
        # base schema precedence: an evolved schema (merge_schema append)
        # must win — rebuilding from the OLD table schema here would
        # silently drop the newly added columns from the declared schema;
        # an overwrite follows the batch (which _assign_identity already
        # extended with the identity columns, and _advance re-seeds their
        # delta.identity.* metadata from id_specs)
        if evolved_schema_json is not None:
            _base = evolved_schema_json
        elif existing and mode != "overwrite" and table_meta.get("schemaString"):
            _base = table_meta["schemaString"]
        else:
            _base = df.schema.json()
        identity_schema_json = _advance_identity_schema(
            id_specs, json.loads(_base), adds
        )

    # row-id allocation: contiguous baseRowId ranges from the domain's
    # high water mark, sized by each staged file's footer row count —
    # driver-side O(#files) metadata, advanced in the SAME commit.
    # The OBLIGATION is tied to the protocol FEATURE, not the config
    # flag (spec: a writer supporting rowTracking must assign baseRowId
    # on every add even while delta.enableRowTracking is off)
    rt_enabled = row_tracking or (
        existing
        and (
            (table_meta.get("configuration") or {}).get(
                "delta.enableRowTracking"
            )
            == "true"
            or "rowTracking" in (table_proto.get("writerFeatures") or [])
        )
    )
    rt_domain_action: dict | None = None
    if rt_enabled and adds:
        # defaultRowCommitVersion patched with the real version at commit
        # time below
        rt_domain_action = _allocate_base_row_ids(path, adds)

    def _schema_has_variant(schema_json: str) -> bool:
        """True when any (possibly nested) field is VariantType —
        PROTOCOL.md §Variant Data Type gates such tables behind the
        `variantType` reader+writer feature; emitting them under a
        legacy protocol lets a non-variant reader misread the column as
        a plain struct."""

        def walk(t) -> bool:
            if t == "variant":
                return True
            if isinstance(t, dict):
                k = t.get("type")
                if k == "variant":
                    return True
                if k == "struct":
                    return any(walk(f.get("type")) for f in t.get("fields", []))
                if k == "array":
                    return walk(t.get("elementType"))
                if k == "map":
                    return walk(t.get("keyType")) or walk(t.get("valueType"))
            return False

        sch = json.loads(schema_json)
        return any(walk(f.get("type")) for f in sch.get("fields", []))

    # 3. commit: protocol+metaData on table creation; metaData re-emitted on
    #    overwrite (an overwrite may change the schema — real readers take
    #    the LAST metaData action, so this keeps them agreeing with the
    #    files); removes on overwrite
    actions: list[dict] = []
    if not existing:
        if cm_meta is not None:
            # column mapping's protocol gate (PROTOCOL.md §Column Mapping)
            actions.append(
                {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
            )
        elif row_tracking:
            # row tracking needs table features (v7): expand the legacy
            # base the table would otherwise gate at, then add the
            # rowTracking + domainMetadata pair
            _r0, _w0 = _protocol_as_features(
                {
                    "minReaderVersion": 1,
                    "minWriterVersion": 6 if id_specs else 2,
                }
            )
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": sorted(
                            _w0 | {"rowTracking", "domainMetadata"}
                        ),
                    }
                }
            )
        else:
            # identity columns gate at legacy writer v6, per the spec
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 6 if id_specs else 2,
                    }
                }
            )
    if not existing or mode == "overwrite":
        if cm_meta is not None:
            _cfg = cm_meta["configuration"]
        elif existing:
            # an overwrite replaces DATA, not table properties: resetting
            # the configuration would silently disable CDF / constraints /
            # row tracking / ICT while the protocol still advertises them
            _cfg = table_meta.get("configuration") or {}
        else:
            _cfg = {}
        if row_tracking and not existing:
            _cfg = {
                **_cfg,
                "delta.enableRowTracking": "true",
                # names reserved for REWRITTEN files' materialized ids
                # (this writer refuses such rewrites; real engines read
                # these properties to find the physical columns)
                "delta.rowTracking.materializedRowIdColumnName":
                    f"_row-id-col-{uuid.uuid4()}",
                "delta.rowTracking.materializedRowCommitVersionColumnName":
                    f"_row-commit-version-col-{uuid.uuid4()}",
            }
        actions.append(
            {
                "metaData": {
                    "id": table_meta.get("id") or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": (
                        identity_schema_json
                        if identity_schema_json is not None
                        else cm_meta["schemaString"]
                        if cm_meta is not None
                        # mapped overwrite: the MAPPED schema survives
                        # (files staged physical above)
                        else table_meta["schemaString"]
                        if mapped_overwrite
                        else df.schema.json()
                    ),
                    "partitionColumns": list(partition_by or []),
                    "configuration": _cfg,
                    "createdTime": now_ms,
                }
            }
        )
    elif identity_schema_json is not None:
        # plain append to an identity table: re-emit metaData carrying the
        # advanced highWaterMark (schema itself is unchanged)
        actions.append(
            {
                "metaData": {
                    "id": table_meta.get("id") or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": identity_schema_json,
                    "partitionColumns": table_meta.get("partitionColumns")
                    or [],
                    "configuration": table_meta.get("configuration") or {},
                    "createdTime": table_meta.get("createdTime") or now_ms,
                }
            }
        )
    elif evolved_schema_json is not None:
        # schema evolution: re-emit metaData with the widened schema (same
        # table id) — readers take the LAST metaData action
        actions.append(
            {
                "metaData": {
                    "id": table_meta.get("id") or str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": evolved_schema_json,
                    "partitionColumns": table_meta.get("partitionColumns") or [],
                    "configuration": table_meta.get("configuration") or {},
                    "createdTime": table_meta.get("createdTime") or now_ms,
                }
            }
        )
    # VARIANT protocol gate (PROTOCOL.md §Variant Data Type): when this
    # commit's effective schema carries a variant column and the protocol
    # (whatever base this write chose above, or the table's current one)
    # does not yet declare the feature, upgrade to table-features form
    # with variantType on BOTH lists in the same commit
    _schema_now = next(
        (a["metaData"]["schemaString"] for a in actions if "metaData" in a),
        table_meta.get("schemaString") if existing else df.schema.json(),
    )
    if _schema_now and _schema_has_variant(_schema_now):
        _base = next(
            (a["protocol"] for a in actions if "protocol" in a),
            _current_protocol(path) if existing else
            {"minReaderVersion": 1, "minWriterVersion": 2},
        )
        _r, _w = _protocol_as_features(_base)
        if "variantType" not in _w or "variantType" not in _r:
            pa = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(_r | {"variantType"}),
                "writerFeatures": sorted(_w | {"variantType"}),
            }
            actions = [a for a in actions if "protocol" not in a]
            actions.insert(0, {"protocol": pa})
    if txn is not None:
        actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]), "lastUpdated": now_ms}}
        )
    actions.extend(
        {"remove": {"path": p, "dataChange": True, "deletionTimestamp": now_ms}}
        for p in prior_files
    )
    actions.extend(adds)
    if rt_domain_action is not None:
        actions.append(rt_domain_action)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
            }
        }
    )
    if rt_enabled and adds:
        # SINGLE-ATTEMPT commit: losing a race means the row-id range was
        # allocated against a stale high water mark — a blind retry would
        # duplicate row ids; the caller re-runs and reallocates
        version = _next_version(log)
        for a in adds:
            a["add"]["defaultRowCommitVersion"] = version
        if not _try_commit(log, version, actions, path):
            raise RuntimeError(
                f"{path}: version {version} was committed concurrently — "
                "row-id allocation is stale; re-run the write"
            )
        return _uniform_sync(spark, path, table_meta, version)
    if mode == "append" and existing:
        # blind appends ride optimistic concurrency (append-vs-append
        # never conflicts, per Delta's conflict-resolution rules); table
        # creation and overwrites keep single-attempt semantics
        return _uniform_sync(
            spark, path, table_meta, _commit_append_with_retry(path, actions)
        )
    version = _next_version(log)
    if not _try_commit(log, version, actions, path):
        raise RuntimeError(
            f"{path}: version {version} was committed concurrently — "
            "recompute from the new snapshot and retry"
        )
    return _uniform_sync(spark, path, table_meta, version)


def _maybe_stamp_ict(log: str, version: int, actions: list[dict]) -> None:
    """IN-COMMIT TIMESTAMPS (PROTOCOL.md §In-Commit Timestamps): when the
    table has the feature active, every commit's commitInfo must carry a
    MONOTONIC ``inCommitTimestamp`` (file mtimes drift under copies; the
    best-effort ``timestamp`` may go backwards). Active = this commit's
    metaData enables it, or the previous commit carries one (the cheap
    continuation signal — one small JSON read, no extra replay). Stamps
    actions IN PLACE with max(now, previous + 1)."""
    import time as _time

    enabled = any(
        ((a.get("metaData") or {}).get("configuration") or {}).get(
            "delta.enableInCommitTimestamps"
        )
        == "true"
        for a in actions
    )
    prev_ict = None
    if version > 0:
        prev = os.path.join(log, f"{version - 1:020d}.json")
        if os.path.exists(prev):
            try:
                with open(prev, encoding="utf-8") as fh:
                    for line in fh:
                        # substring pre-filter: a 50k-add commit must not
                        # pay a json.loads per action on EVERY subsequent
                        # commit just to learn ICT is off
                        if (
                            "inCommitTimestamp" not in line
                            and "enableInCommitTimestamps" not in line
                        ):
                            continue
                        line = line.strip()
                        if not line:
                            continue
                        a = json.loads(line)
                        ci = a.get("commitInfo")
                        if ci and ci.get("inCommitTimestamp") is not None:
                            prev_ict = int(ci["inCommitTimestamp"])
                        md = a.get("metaData")
                        if md and (md.get("configuration") or {}).get(
                            "delta.enableInCommitTimestamps"
                        ) == "true":
                            enabled = True
            except (OSError, ValueError):
                pass
        else:
            # prev JSON cleaned after a checkpoint: the enablement signal
            # survives in the checkpoint's metaData configuration
            try:
                _v, ckpt_files = _latest_checkpoint(log)
                for f in ckpt_files:
                    for row in _manifest_rows(f, log, follow_sidecars=False):
                        md = row.get("metaData")
                        if md and (md.get("configuration") or {}).get(
                            "delta.enableInCommitTimestamps"
                        ) == "true":
                            enabled = True
            except (OSError, ValueError):
                pass
    if not enabled and prev_ict is None:
        return
    ict = max(int(_time.time() * 1000), (prev_ict or 0) + 1)
    stamped = False
    for a in actions:
        if "commitInfo" in a:
            a["commitInfo"]["inCommitTimestamp"] = ict
            stamped = True
    if not stamped:
        actions.append(
            {"commitInfo": {"timestamp": ict, "inCommitTimestamp": ict}}
        )


def _try_commit(log: str, version: int, actions: list[dict], path: str) -> bool:
    """Attempt to claim exactly ``version``: write a temp file, then
    ``os.link`` it to the final name — link fails with EEXIST when the
    version was taken, making the claim ATOMIC (the old exists-then-rename
    dance had a window where two writers could both pass the check and
    silently clobber). Returns False on a lost race."""
    import uuid

    _maybe_stamp_ict(log, version, actions)
    tmp_commit = os.path.join(log, f".{version:020d}.json.{uuid.uuid4().hex[:8]}.tmp")
    final_commit = os.path.join(log, f"{version:020d}.json")
    with open(tmp_commit, "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    try:
        os.link(tmp_commit, final_commit)
    except FileExistsError:
        os.remove(tmp_commit)
        return False
    os.remove(tmp_commit)
    return True


def _commit(path: str, actions: list[dict]) -> int:
    """Append one commit to the log; loses every race (single-writer
    semantics for transactions with read dependencies — merge, delete,
    restore, metadata — where a concurrent commit invalidates the
    snapshot the actions were computed from)."""
    log = _delta_log_dir(path)
    version = _next_version(log)
    if not _try_commit(log, version, actions, path):
        raise RuntimeError(
            f"{path}: version {version} was committed concurrently — "
            "recompute from the new snapshot and retry"
        )
    return version


def _commit_append_with_retry(
    path: str, actions: list[dict], max_retries: int = 20
) -> int:
    """Commit a BLIND APPEND under optimistic concurrency (Delta's
    conflict-resolution rule: append-vs-append never conflicts). On a lost
    race, inspect the commits that won: if any changed metaData or
    protocol, the append's schema validation is stale — fail loudly for
    the caller to re-validate; plain data commits (other appends, deletes,
    optimize) are disjoint with an append, so just claim the next version
    and try again."""
    log = _delta_log_dir(path)
    version = _next_version(log)
    for _ in range(max_retries):
        if _try_commit(log, version, actions, path):
            return version
        new_version = _next_version(log)
        for v in range(version, new_version):
            with open(os.path.join(log, f"{v:020d}.json"), encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "metaData" in action or "protocol" in action:
                        raise RuntimeError(
                            f"{path}: concurrent commit {v} changed table "
                            "metadata/protocol — the append's validation "
                            "is stale; re-run the write"
                        )
        version = new_version
    raise RuntimeError(
        f"{path}: could not claim a log version after {max_retries} "
        "conflicts — pathological write contention"
    )


def merge_delta(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    when_matched: str = "update",
    txn: tuple[str, int] | None = None,
    newer_wins_col: str | None = None,
    merge_schema: bool = False,
    set_clauses: "dict[str, str] | None" = None,
    not_matched_by_source: str | None = None,
    not_matched_by_source_condition: str | None = None,
) -> int:
    """Keyed MERGE — the Delta table's mutation primitive (upsert / delete
    by key), implemented the way every copy-on-write Delta engine does it:
    rewrite ONLY the data files that contain matched keys, and commit the
    swap as `remove`(touched) + `add`(rewritten) actions (PROTOCOL.md —
    a MERGE is just an atomic file-set substitution in the log).

    Semantics:
    - ``when_matched='update'``: target rows whose ``keys`` appear in
      ``source`` are REPLACED by the source row (whole-row update); source
      rows with no match are INSERTED. This is
      ``whenMatchedUpdateAll + whenNotMatchedInsertAll`` — the canonical
      feature-store write ("upsert latest feature values per entity").
    - ``when_matched='delete'``: matched target rows are deleted; unmatched
      source rows are ignored (only ``keys`` columns of ``source`` are
      read). The GDPR-erasure / retention shape.
    - NULL keys never match (SQL join semantics): a null-keyed target row
      is never updated or deleted.
    - ``source`` must be UNIQUE per ``keys`` — two source rows matching one
      target row make the result order-dependent, so that raises (the same
      cardinality error real Delta MERGE throws).
    - ``newer_wins_col`` (update mode only): CONDITIONAL update — a matched
      target row is replaced only when the source row is STRICTLY newer on
      this column (ties keep the target), i.e. Delta's
      ``whenMatchedUpdateAll(condition="s.ts > t.ts")``. This makes
      repeated merges ORDER-INDEPENDENT: applying batches in any order
      converges to the same latest-per-key table — the property a
      streaming upsert sink needs when micro-batches are not time-ordered.
    - ``set_clauses`` (update mode only): PARTIAL update — Delta's
      ``whenMatchedUpdate(set={...})``. Each matched target row is
      TRANSFORMED column-by-column: assigned columns evaluate their SQL
      expression against the joined pair (``t.col`` = target value,
      ``s.col`` = source value), unassigned columns keep the target's
      value; unmatched source rows still INSERT whole-row. The shape for
      "update only the price, keep the audit columns". Mutually exclusive
      with ``newer_wins_col``; source stays unique-per-key (each target
      row pairs with exactly one source row, duplicate-keyed target rows
      each update independently).
    - ``not_matched_by_source='delete'`` (update mode only): Delta's
      third clause, ``whenNotMatchedBySourceDelete(condition=...)`` —
      target rows whose keys do NOT appear in the source are DELETED
      when they satisfy ``not_matched_by_source_condition`` (a SQL
      predicate over target columns; None deletes every unmatched row,
      which makes the merge a keyed FULL SYNC: the table becomes exactly
      the source). The "sync this dimension slice" shape. Scale note:
      with a condition, touched-file discovery adds one predicate scan
      (files holding candidate rows rewrite even when their rows all
      survive — a correct superset); without one, every live file
      rewrites, the honest cost of a full sync.

    Scale shape (how this survives 100 TB):
    - Touched-file discovery is a distributed semi-join of the live file
      set against the (typically small) source key set, using the parquet
      ``_metadata.file_path`` column — AQE broadcasts the key side. Only
      the DISTINCT matched file paths reach the driver: O(#touched files),
      metadata-sized, never rows.
    - The rewrite reads ONLY touched files (anti-join out the matched keys,
      union the source) — a daily upsert touching 1% of files rewrites 1%
      of the table, not all of it.
    - The commit is the same atomic rename + single-writer conflict check
      as write_delta; ``txn`` gives the identical idempotent-retry
      handshake (a retried merge with a committed (app_id, version) is a
      no-op returning the committed version).

    Partitioned tables merge per partition: touched-file discovery and the
    rewrite go through the Hive-layout partition reconstruction, the
    rewritten rows land back under their ``col=value/`` dirs with per-file
    partitionValues, and a row whose partition value CHANGES in the source
    simply lands in its new directory (copy-on-write makes partition moves
    free). When a key IS a partition column, Spark prunes the discovery
    scan to matching directories before reading a byte.

    Returns the committed version. Fail-loud: schema drift on update,
    duplicate source keys.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(
            f"merge_delta: when_matched must be update|delete, got {when_matched!r}"
        )
    if newer_wins_col is not None and when_matched != "update":
        raise ValueError("merge_delta: newer_wins_col requires when_matched='update'")
    if newer_wins_col is not None and newer_wins_col not in source.columns:
        raise ValueError(
            f"merge_delta: newer_wins_col {newer_wins_col!r} not in source columns"
        )
    if set_clauses is not None:
        if when_matched != "update":
            raise ValueError(
                "merge_delta: set_clauses requires when_matched='update'"
            )
        if newer_wins_col is not None:
            raise NotImplementedError(
                "merge_delta: set_clauses + newer_wins_col is not "
                "implemented — conditional partial update needs per-row "
                "winner attribution through the SET projection"
            )
        if not set_clauses:
            raise ValueError("merge_delta: empty set_clauses")
    if not_matched_by_source is not None:
        if not_matched_by_source != "delete":
            raise ValueError(
                "merge_delta: not_matched_by_source supports only "
                f"'delete', got {not_matched_by_source!r}"
            )
        if when_matched != "update":
            raise ValueError(
                "merge_delta: not_matched_by_source pairs with "
                "when_matched='update' (the full-sync idiom)"
            )
        if newer_wins_col is not None:
            raise NotImplementedError(
                "merge_delta: not_matched_by_source + newer_wins_col is "
                "not implemented"
            )
    elif not_matched_by_source_condition is not None:
        raise ValueError(
            "merge_delta: not_matched_by_source_condition requires "
            "not_matched_by_source='delete'"
        )
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"merge_delta: source is missing key columns {missing}")
    if txn is not None:
        committed = last_txn_version(path, txn[0])
        if committed >= txn[1]:
            return committed
    if not is_delta_table(path):
        if when_matched == "delete":
            raise ValueError(f"{path}: cannot delete from a non-existent table")
        # first merge into an empty location is a plain create
        return write_delta(spark, source, path, mode="append", txn=txn)

    try:  # native MERGE when delta-spark is importable (jar on classpath)
        from delta.tables import DeltaTable  # type: ignore

        if txn is not None:
            raise NotImplementedError(
                "merge_delta: the native DeltaTable merge builder cannot "
                "record a txn action — retry idempotency would silently "
                "degrade; drop txn or use the fallback writer"
            )
        if merge_schema:
            raise NotImplementedError(
                "merge_delta: schema evolution through the native builder "
                "needs spark.databricks.delta.schema.autoMerge.enabled — "
                "set it and drop merge_schema, or use the fallback writer"
            )
        if set_clauses is not None:
            raise NotImplementedError(
                "merge_delta: set_clauses through the native builder is "
                "not wired — use whenMatchedUpdate directly, or the "
                "fallback writer"
            )
        if not_matched_by_source is not None:
            raise NotImplementedError(
                "merge_delta: not_matched_by_source through the native "
                "builder is not wired — use whenNotMatchedBySourceDelete "
                "directly, or the fallback writer"
            )
        tgt = DeltaTable.forPath(spark, path)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        m = tgt.alias("t").merge(source.alias("s"), cond)
        if when_matched == "update":
            upd_cond = (
                f"s.{newer_wins_col} > t.{newer_wins_col}"
                if newer_wins_col is not None
                else None
            )
            m.whenMatchedUpdateAll(condition=upd_cond).whenNotMatchedInsertAll().execute()
        else:
            m.whenMatchedDelete().execute()
        return _next_version(_delta_log_dir(path)) - 1
    except ImportError:
        pass

    from pyspark.sql import functions as F

    adds_map, meta = _replay_log_adds(path)
    proto = _check_write_allowed(path, meta, "merge")
    id_specs = _identity_specs(meta)
    if id_specs:
        # GENERATED ALWAYS: the source must not supply identity values —
        # matched rows KEEP the target's value (attached by key inside
        # the rewrite), inserts are generated from the high water mark
        bad_keys = sorted(set(id_specs) & set(keys))
        if bad_keys:
            # checked before the carried-column refusal below — a key must
            # be in the source, so this is the message a key-merge deserves
            raise ValueError(
                f"merge_delta: cannot merge on IDENTITY key(s) {bad_keys} "
                "— matching on a GENERATED ALWAYS column would require "
                "the source to carry it; merge on a natural key instead"
            )
        carried = sorted(set(id_specs) & set(source.columns))
        if carried:
            raise ValueError(
                f"{path}: identity column(s) {carried} are GENERATED "
                "ALWAYS — the merge source must not supply them (matched "
                "rows keep the target's value; inserted rows are "
                "generated)"
            )
    if newer_wins_col is not None and _cdf_enabled(meta):
        raise NotImplementedError(
            f"{path}: conditional (newer-wins) merge with "
            "delta.enableChangeDataFeed is not implemented — the win/lose "
            "taxonomy needs per-row winner attribution"
        )
    files = [os.path.join(path, p) for p in adds_map]
    from pyspark.sql.types import StructType

    declared = StructType.fromJson(json.loads(meta["schemaString"]))
    table_cols = [f.name for f in declared.fields]
    if set_clauses is not None:
        unknown = sorted(c for c in set_clauses if c not in table_cols)
        if unknown:
            raise ValueError(
                f"{path}: SET targets unknown columns {unknown} "
                f"(have {table_cols})"
            )
        bad_id = sorted(set(set_clauses) & set(id_specs))
        if bad_id:
            raise ValueError(
                f"{path}: SET targets IDENTITY column(s) {bad_id} — "
                "GENERATED ALWAYS values cannot be assigned"
            )
    evolved_meta: dict | None = None
    if when_matched == "update":
        got = [(f.name, f.dataType.simpleString()) for f in source.schema.fields]
        # identity columns are excluded from the expected source shape —
        # the source is REQUIRED not to carry them (checked above)
        want = [
            (f.name, f.dataType.simpleString())
            for f in declared.fields
            if f.name not in id_specs
        ]
        if got != want and not merge_schema:
            raise ValueError(
                f"{path}: merge source schema mismatch — table declares "
                f"{want}, source carries {got}; pass merge_schema=True to "
                "add columns (Delta's MERGE autoMerge)"
            )
        if got != want:
            # MERGE schema evolution, same contract as write_delta's
            # mergeSchema append: the source may APPEND nullable columns
            # (declared columns must all be present, types unchanged);
            # untouched/kept rows backfill null via the evolved reader
            from pyspark.sql.types import StructField

            if _mapping_mode(meta):
                raise NotImplementedError(
                    f"{path}: MERGE schema evolution on a column-mapped "
                    "table is not implemented (new columns need field-id "
                    "and physical-name assignment)"
                )
            got_map = dict(got)
            for n, t in want:
                if n not in got_map:
                    raise ValueError(
                        f"{path}: merge schema evolution cannot DROP column "
                        f"{n!r} — the source must carry every declared column"
                    )
                if got_map[n] != t:
                    raise ValueError(
                        f"{path}: merge schema evolution cannot change "
                        f"column {n!r} from {t} to {got_map[n]}"
                    )
            declared_names = {n for n, _ in want}
            new_fields = [
                StructField(f.name, f.dataType, True)
                for f in source.schema.fields
                if f.name not in declared_names
            ]
            declared = StructType(list(declared.fields) + new_fields)
            table_cols = [f.name for f in declared.fields]
            source = source.select(
                *[c for c in table_cols if c not in id_specs]
            )
            evolved_meta = {**meta, "schemaString": declared.json()}
            meta = evolved_meta
        if not id_specs:
            # identity tables enforce AFTER the rewrite attaches the
            # generated/preserved identity values (a constraint may
            # reference the identity column the source cannot carry)
            _enforce_constraints(source, meta, path)
            _enforce_generated(source, meta, path)

    # One aggregation serves both the cardinality check and the key set
    # (distinct by construction), persisted because it probes the target
    # twice (semi-join discovery, anti-join rewrite) — without the persist
    # a derived source would recompute per action.
    key_counts = source.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n")).persist()
    try:
        dup = key_counts.where(F.col("_n") > 1).limit(1).count()
        if dup:
            raise ValueError(
                "merge_delta: source has multiple rows per key — the merge "
                "result would be order-dependent (same error as Delta's "
                "MERGE cardinality check); de-duplicate the source first"
            )
        src_keys = key_counts.select(*keys)
        return _merge_rewrite(
            spark, source, path, keys, when_matched, txn, files, declared,
            src_keys, newer_wins_col, meta, adds_map, evolved_meta, proto,
            set_clauses, not_matched_by_source, not_matched_by_source_condition,
        )
    finally:
        key_counts.unpersist()


def _merge_rewrite(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    when_matched: str,
    txn: tuple[str, int] | None,
    files: list[str],
    declared,  # StructType — files are read with it so post-evolution
    src_keys: DataFrame,  # tables backfill missing columns as null
    newer_wins_col: str | None = None,
    meta: dict | None = None,
    adds_map: dict | None = None,
    evolved_meta: dict | None = None,
    proto: dict | None = None,
    set_clauses: "dict[str, str] | None" = None,
    not_matched_by_source: str | None = None,
    not_matched_by_source_condition: str | None = None,
) -> int:
    from pyspark.sql import functions as F

    meta = meta or {}
    part_cols = meta.get("partitionColumns") or []
    table_cols = [f.name for f in declared.fields]
    declared_types = {f.name: f.dataType for f in declared.fields}
    # row-tracked tables: surviving/updated rows get their ids
    # MATERIALIZED through the rewrite (spec §Row Tracking preservation —
    # same rule as compact_delta); the allocation obligation follows the
    # protocol feature even while the enablement flag is off
    mats = _rt_materialization(meta, path)
    rt_obligation = mats is not None or "rowTracking" in (
        (proto or {}).get("writerFeatures") or []
    )
    id_specs = _identity_specs(meta)
    if not files:
        touched_abs: list[str] = []
    else:
        from urllib.parse import unquote, urlparse

        # Touched-file discovery through the ONE shared scan primitive:
        # _scan_files resolves every table shape correctly — declared-
        # schema reads (schema evolution backfill), name-mode physical
        # names, ID-mode field-id footer grouping (a raw declared read of
        # ID-mode files nulls every key and the merge silently inserts
        # everything), Hive and non-Hive partition layouts (a key may BE
        # a partition column), and DV masks (a file whose only matching
        # rows are already deleted is not touched). with_metadata
        # materializes file_path before any union, keys cast to their
        # declared types so the semi-join matches the source exactly.
        target = _scan_files(
            spark, path, files, meta, adds_map, with_metadata=True
        ).select(
            *[F.col(k).cast(declared_types[k]).alias(k) for k in keys],
            F.col("_metadata.file_path").alias("_fp"),
        )
        touched_abs = [
            unquote(urlparse(r["_fp"]).path)
            for r in (
                target.join(src_keys, on=list(keys), how="left_semi")
                .select("_fp")
                .distinct()
                .collect()  # O(#touched files) — driver metadata, never rows
            )
        ]

    nmbs_cond = None
    if not_matched_by_source == "delete":
        # whenNotMatchedBySourceDelete: unmatched target rows satisfying
        # the condition are dropped — files holding CANDIDATE rows join
        # the touched set (a correct superset: a file whose candidates
        # all turn out matched just rewrites unchanged). No condition =
        # full sync: every live file rewrites, the honest cost.
        nmbs_cond = (
            F.coalesce(F.expr(not_matched_by_source_condition), F.lit(False))
            if not_matched_by_source_condition
            else F.lit(True)
        )
        if files and not_matched_by_source_condition is None:
            touched_abs = sorted(set(files))
        elif files:
            from urllib.parse import unquote as _uq
            from urllib.parse import urlparse as _up

            cand = [
                _uq(_up(r["_fp"]).path)
                for r in (
                    _scan_files(
                        spark, path, files, meta, adds_map, with_metadata=True
                    )
                    .where(nmbs_cond)
                    .select(F.col("_metadata.file_path").alias("_fp"))
                    .distinct()
                    .collect()
                )
            ]
            touched_abs = sorted(set(touched_abs) | set(cand))

    def _scan_touched() -> DataFrame:
        # DV-masked rows are filtered out, so a rewrite never resurrects
        # deleted rows (the rewritten file carries no deletionVector)
        return _scan_files(spark, path, touched_abs, meta, adds_map).select(
            *table_cols
        )

    def _scan_touched_ids() -> DataFrame:
        # touched files with their stable (row_id, row_commit_version) —
        # same DV masking as _scan_touched, plus the broadcast id map
        rels = [
            os.path.relpath(f, path).replace(os.sep, "/") for f in touched_abs
        ]
        return _scan_with_row_ids(
            spark, path, meta, {r: (adds_map or {})[r] for r in rels}
        )

    if id_specs and when_matched == "update":
        # IDENTITY attachment: matched keys inherit the target's value
        # (min over duplicate-keyed target rows — deterministic when the
        # whole-row replacement collapses them), unmatched source rows
        # generate fresh step-aligned values from the high water mark.
        # Downstream (rewrite union, CDF taxonomy, window) then sees a
        # source carrying the full declared schema.
        idc = sorted(id_specs)
        if touched_abs:
            matched_ids = (
                _scan_touched()
                .join(src_keys, on=list(keys), how="left_semi")
                .groupBy(*keys)
                .agg(*[F.min(c).alias(c) for c in idc])
            )
            source = source.join(matched_ids, on=list(keys), how="left")
        else:
            for c in idc:
                source = source.withColumn(c, F.lit(None).cast("long"))
        for c in idc:
            st, sp, hwm = id_specs[c]
            base = st if hwm is None else hwm + sp
            source = source.withColumn(
                c,
                F.coalesce(
                    F.col(c),
                    (
                        F.lit(int(base)).cast("long")
                        + F.lit(int(sp)).cast("long")
                        * F.monotonically_increasing_id()
                    ).cast("long"),
                ),
            )
        # pin the generated values: monotonically_increasing_id is
        # recomputation-unstable, and the source feeds MULTIPLE actions
        # (staging write, CDF insert rows, constraint probes) that must
        # all see the SAME identity values
        source = source.select(*table_cols).localCheckpoint()
        _enforce_constraints(source, meta, path)
        _enforce_generated(source, meta, path)

    cdf = _cdf_enabled(meta)
    change_rows: DataFrame | None = None
    if when_matched == "update" and set_clauses is not None:
        # PARTIAL update (whenMatchedUpdate(set=...)): each matched target
        # row joins its (unique-per-key) source row and transforms
        # column-by-column — assigned columns evaluate their expression
        # over the t./s. pair, unassigned columns keep the target value;
        # unmatched source rows insert whole-row. Same one-key-shuffle
        # rewrite as the whole-row path, plus the matched⋈source join
        # (bounded by touched-file rows; the source side is the small one
        # and AQE broadcasts it).
        _null_l = F.lit(None).cast("long")
        out_cols = list(table_cols)
        if mats is not None:
            mat_id, mat_ver = mats
            out_cols += [mat_id, mat_ver]
        src_cols = source.select(*table_cols).alias("s")
        proj = [
            (
                F.expr(set_clauses[c]).cast(declared_types[c]).alias(c)
                if c in set_clauses
                else F.col(f"t.{c}").alias(c)
            )
            for c in table_cols
        ]
        if touched_abs:
            tgt = _scan_touched_ids() if mats is not None else _scan_touched()
            matched_t = tgt.join(src_keys, on=list(keys), how="left_semi")
            kept_t = tgt.join(src_keys, on=list(keys), how="left_anti")
            if nmbs_cond is not None:
                kept_t = kept_t.where(~nmbs_cond)
            pairs = matched_t.alias("t").join(
                src_cols,
                [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
                "inner",
            )
            if mats is not None:
                # 1:1 row mapping — each transformed row keeps ITS OWN id,
                # version moves to this commit via the fresh-row rule
                updated = pairs.select(
                    *proj,
                    F.col("t.row_id").alias(mat_id),
                    _null_l.alias(mat_ver),
                )
                kept = kept_t.select(
                    *table_cols,
                    F.col("row_id").alias(mat_id),
                    F.col("row_commit_version").alias(mat_ver),
                )
            else:
                updated = pairs.select(*proj)
                kept = kept_t.select(*table_cols)
            matched_keys = matched_t.select(*keys).distinct()
            ins = source.select(*table_cols).join(
                matched_keys, on=list(keys), how="left_anti"
            )
            if mats is not None:
                ins = ins.withColumn(mat_id, _null_l).withColumn(
                    mat_ver, _null_l
                )
            # transformed rows are NEW values — enforce like update_delta
            _enforce_constraints(updated.select(*table_cols), meta, path)
            _enforce_generated(updated.select(*table_cols), meta, path)
            new_rows = kept.unionByName(updated).unionByName(ins)
            if cdf:
                pre = _scan_touched().join(
                    src_keys, on=list(keys), how="left_semi"
                ).withColumn("_change_type", F.lit("update_preimage"))
                post = updated.select(*table_cols).withColumn(
                    "_change_type", F.lit("update_postimage")
                )
                ins_c = source.select(*table_cols).join(
                    matched_keys, on=list(keys), how="left_anti"
                ).withColumn("_change_type", F.lit("insert"))
                change_rows = pre.unionByName(post).unionByName(ins_c)
                if nmbs_cond is not None:
                    change_rows = change_rows.unionByName(
                        _scan_touched()
                        .join(src_keys, on=list(keys), how="left_anti")
                        .where(nmbs_cond)
                        .withColumn("_change_type", F.lit("delete"))
                    )
        else:
            new_rows = source.select(*table_cols)
            if mats is not None:
                new_rows = new_rows.withColumn(mat_id, _null_l).withColumn(
                    mat_ver, _null_l
                )
            if cdf:
                change_rows = source.select(*table_cols).withColumn(
                    "_change_type", F.lit("insert")
                )
    elif when_matched == "update" and newer_wins_col is None:
        if mats is not None:
            # kept rows carry their (id, version) materialized; UPDATED
            # rows keep the matched target's row id (min over duplicate-
            # keyed target rows) with a NULL version — the fresh-row rule
            # stamps them with THIS commit's version, which is exactly
            # "last changed here"; inserts are fresh on both
            mat_id, mat_ver = mats
            _null_l = F.lit(None).cast("long")
            src_rows = source.select(*table_cols)
            if touched_abs:
                tgt_ids = _scan_touched_ids()
                kept_src = tgt_ids.join(
                    src_keys, on=list(keys), how="left_anti"
                )
                if nmbs_cond is not None:
                    kept_src = kept_src.where(~nmbs_cond)
                kept_m = kept_src.select(
                    *table_cols,
                    F.col("row_id").alias(mat_id),
                    F.col("row_commit_version").alias(mat_ver),
                )
                id_map = (
                    tgt_ids.join(src_keys, on=list(keys), how="left_semi")
                    .groupBy(*keys)
                    .agg(F.min("row_id").alias(mat_id))
                )
                new_rows = kept_m.unionByName(
                    src_rows.join(id_map, on=list(keys), how="left")
                    .withColumn(mat_ver, _null_l)
                    .select(*table_cols, mat_id, mat_ver)
                )
            else:
                new_rows = src_rows.withColumn(mat_id, _null_l).withColumn(
                    mat_ver, _null_l
                )
        else:
            new_rows = source.select(*table_cols)
            if touched_abs:
                kept = _scan_touched().join(
                    src_keys, on=list(keys), how="left_anti"
                )
                if nmbs_cond is not None:
                    kept = kept.where(~nmbs_cond)
                new_rows = kept.select(*table_cols).unionByName(new_rows)
        if cdf:
            # change-data rows, delta-spark's MERGE taxonomy: matched
            # target rows -> update_preimage, their replacements ->
            # update_postimage, unmatched source rows -> insert
            if touched_abs:
                matched_tgt = _scan_touched().join(
                    src_keys, on=list(keys), how="left_semi"
                )
                matched_keys = matched_tgt.select(*keys).distinct()
                pre = matched_tgt.withColumn(
                    "_change_type", F.lit("update_preimage")
                )
                post = source.select(*table_cols).join(
                    matched_keys, on=list(keys), how="left_semi"
                ).withColumn("_change_type", F.lit("update_postimage"))
                ins = source.select(*table_cols).join(
                    matched_keys, on=list(keys), how="left_anti"
                ).withColumn("_change_type", F.lit("insert"))
                change_rows = pre.unionByName(post).unionByName(ins)
                if nmbs_cond is not None:
                    change_rows = change_rows.unionByName(
                        _scan_touched()
                        .join(src_keys, on=list(keys), how="left_anti")
                        .where(nmbs_cond)
                        .withColumn("_change_type", F.lit("delete"))
                    )
            else:
                change_rows = source.select(*table_cols).withColumn(
                    "_change_type", F.lit("insert")
                )
    elif when_matched == "update":
        # conditional update (strictly-newer wins, ties keep target): the
        # matched subset is decided by a per-key window over target∪source
        # — one shuffle on keys, bounded by the touched-file row count.
        # Unmatched target rows bypass the window untouched.
        from pyspark.sql import Window

        out_cols = list(table_cols)
        if mats is not None:
            # target rows enter the window with their (id, version)
            # materialized; source rows carry the matched target's row id
            # (preserved on a source win) and a NULL version (stamped
            # with this commit by the fresh-row rule). A target win keeps
            # both untouched — the row did not change.
            mat_id, mat_ver = mats
            _null_l = F.lit(None).cast("long")
            out_cols += [mat_id, mat_ver]
        src_tagged = source.select(*table_cols)
        if touched_abs:
            if mats is not None:
                tgt = _scan_touched_ids().select(
                    *table_cols,
                    F.col("row_id").alias(mat_id),
                    F.col("row_commit_version").alias(mat_ver),
                )
            else:
                tgt = _scan_touched()
            matched_tgt = tgt.join(src_keys, on=list(keys), how="left_semi")
            unmatched_tgt = tgt.join(src_keys, on=list(keys), how="left_anti")
            if mats is not None:
                id_map = matched_tgt.groupBy(*keys).agg(
                    F.min(mat_id).alias(mat_id)
                )
                src_tagged = (
                    src_tagged.join(id_map, on=list(keys), how="left")
                    .withColumn(mat_ver, _null_l)
                    .select(*out_cols)
                )
            cand = matched_tgt.withColumn("_src", F.lit(0)).unionByName(
                src_tagged.withColumn("_src", F.lit(1))
            )
        else:
            unmatched_tgt = None
            if mats is not None:
                src_tagged = src_tagged.withColumn(
                    mat_id, _null_l
                ).withColumn(mat_ver, _null_l)
            cand = src_tagged.withColumn("_src", F.lit(1))
        w = Window.partitionBy(*keys).orderBy(
            F.col(newer_wins_col).desc(), F.col("_src").asc()
        )
        winners = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(*out_cols)
        )
        new_rows = (
            winners if unmatched_tgt is None else unmatched_tgt.unionByName(winners)
        )
    else:
        if not touched_abs:
            # nothing matched: no file changes; still record txn if asked
            if txn is not None:
                now_ms = int(__import__("time").time() * 1000)
                return _commit(
                    path,
                    [
                        {"txn": {"appId": txn[0], "version": int(txn[1]),
                                 "lastUpdated": now_ms}},
                        {"commitInfo": {"timestamp": now_ms, "operation": "MERGE",
                                        "operationParameters": {"matched": "0"}}},
                    ],
                )
            return _next_version(_delta_log_dir(path)) - 1
        if mats is not None:
            mat_id, mat_ver = mats
            new_rows = _scan_touched_ids().join(
                src_keys, on=list(keys), how="left_anti"
            ).select(
                *table_cols,
                F.col("row_id").alias(mat_id),
                F.col("row_commit_version").alias(mat_ver),
            )
        else:
            new_rows = _scan_touched().join(
                src_keys, on=list(keys), how="left_anti"
            )
        if cdf:
            change_rows = _scan_touched().join(
                src_keys, on=list(keys), how="left_semi"
            ).withColumn("_change_type", F.lit("delete"))

    import uuid
    import time as _time

    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    stage_writer = _to_physical(new_rows, meta).write
    if part_cols:
        _m = _stage_partition_names(meta)
        stage_writer = stage_writer.partitionBy(
            *[_m.get(c, c) for c in part_cols]
        )
    stage_writer.parquet(staging)
    now_ms = int(_time.time() * 1000)
    adds = _promote_staged(staging, path, now_ms, data_change=True)
    cdc_actions = (
        _write_change_data(spark, path, change_rows, now_ms)
        if change_rows is not None
        else []
    )

    actions: list[dict] = []
    meta_action: dict | None = evolved_meta
    if id_specs and when_matched == "update" and adds:
        # identity high-water-mark advance rides the SAME commit, from
        # the staged footers' stats (kept rows keep the mark where it is
        # — the fold is monotonic); composes with schema evolution by
        # advancing the evolved schema
        base_meta = meta_action or meta
        meta_action = {
            **base_meta,
            "schemaString": _advance_identity_schema(
                id_specs, json.loads(base_meta["schemaString"]), adds
            ),
        }
    if meta_action is not None:
        # schema evolution rides the same commit: readers take the LAST
        # metaData action, so the widened schema and the merged files
        # become visible atomically
        actions.append({"metaData": meta_action})
    if txn is not None:
        actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]), "lastUpdated": now_ms}}
        )
    actions.extend(
        {
            "remove": {
                "path": os.path.relpath(f, path).replace(os.sep, "/"),
                "dataChange": True,
                "deletionTimestamp": now_ms,
            }
        }
        for f in touched_abs
    )
    actions.extend(adds)
    actions.extend(cdc_actions)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "MERGE",
                "operationParameters": {
                    "predicate": " AND ".join(f"t.{k} = s.{k}" for k in keys),
                    "matchedAction": when_matched,
                },
            }
        }
    )
    if rt_obligation:
        return _uniform_sync(
            spark, path, meta, _commit_row_tracked(path, actions, adds, "merge")
        )
    return _uniform_sync(spark, path, meta, _commit(path, actions))


def _dv_descriptors(
    path: str,
    rows: "list[tuple[str, bytes, int]]",
    inline_threshold: int = 512,
) -> dict[str, dict]:
    """(rel path, serialized bitmap bytes, cardinality) rows -> a
    deletionVector descriptor per file (PROTOCOL.md §Deletion Vector
    Descriptor Schema): small bitmaps travel Z85-INLINE in the descriptor
    (storageType 'i'); larger ones append to ONE shared
    ``deletion_vector_<uuid>.bin`` under the table root (storageType 'u',
    per-blob offset framing). Shared by ``delete_delta`` and the
    cross-format converter's pos-delete translation."""
    import uuid as _uuid

    from . import roaring

    new_descs: dict[str, dict] = {}
    bin_blobs: list[bytes] = []  # (appended sequentially to one shared file)
    bin_offsets: dict[str, int] = {}
    bin_pos = 1  # byte 0 is the format-version marker
    for rel, data, card in sorted(rows):
        if len(data) < inline_threshold:
            padded = data + b"\x00" * (-len(data) % 4)  # Z85 needs 4-blocks
            new_descs[rel] = {
                "storageType": "i",
                "pathOrInlineDv": roaring.z85_encode(padded),
                "sizeInBytes": len(data),
                "cardinality": card,
            }
        else:
            blob = roaring.frame_dv_blob(data)
            bin_offsets[rel] = bin_pos
            bin_blobs.append(blob)
            new_descs[rel] = {
                "storageType": "u",
                "sizeInBytes": len(data),
                "cardinality": card,
                "offset": bin_pos,
                # pathOrInlineDv filled below once the file uuid exists
            }
            bin_pos += len(blob)
    if bin_blobs:
        dv_uuid = _uuid.uuid4()
        enc = roaring.z85_encode(dv_uuid.bytes)
        with open(os.path.join(path, f"deletion_vector_{dv_uuid}.bin"), "wb") as fh:
            fh.write(b"\x01")
            for blob in bin_blobs:
                fh.write(blob)
        for rel in bin_offsets:
            new_descs[rel]["pathOrInlineDv"] = enc
    return new_descs


def delete_delta(
    spark: SparkSession,
    path: str,
    predicate: str,
    txn: tuple[str, int] | None = None,
    inline_threshold: int = 512,
) -> int:
    """Row-level DELETE via DELETION VECTORS (PROTOCOL.md §Deletion
    Vectors) — the merge-on-read alternative to copy-on-write: instead of
    rewriting every file that contains a matching row, each touched file
    gets a roaring bitmap of its deleted row indexes, and readers mask
    those rows at scan time. The write cost is proportional to the number
    of DELETED rows (bitmap bytes), not the number of touched FILE bytes —
    the right trade for small, frequent deletes (GDPR erasure, bad-record
    retraction) on files that are mostly kept.

    Mechanics, per the open spec:
    - matching (file, row_index) pairs are found by a distributed scan of
      the hidden ``_metadata`` columns with ``predicate`` — pushdown
      applies, untouched files are never opened row-by-row;
    - per touched file, new positions are UNIONED with the file's existing
      DV (repeated deletes compose), serialized as a portable 64-bit
      RoaringBitmapArray (io/roaring), and stored Z85-INLINE in the
      descriptor when small (< ``inline_threshold`` bytes) or in a shared
      ``deletion_vector_<uuid>.bin`` file otherwise (storageType 'i'/'u');
    - the commit re-adds each touched path with its deletionVector
      descriptor (+ remove of the old entry) and upgrades the protocol to
      minReaderVersion 3 / minWriterVersion 7 with the deletionVectors
      reader+writer feature — real Delta readers see a spec-correct table,
      pre-DV readers correctly refuse;
    - ``compact_delta`` doubles as the PURGE: it scans DV-filtered and
      rewrites clean files; ``vacuum_delta`` removes orphaned .bin files.

    Driver cost is O(#deleted rows) to build the bitmaps — inherent to DV
    writing (every engine materializes the bitmap somewhere); for MASS
    deletes use ``merge_delta(when_matched='delete')`` (copy-on-write) or
    an overwrite instead. Returns the committed version; ``txn`` gives the
    same idempotent-retry handshake as write_delta/merge_delta.
    """
    import time as _time
    import uuid as _uuid

    from pyspark.sql import functions as F

    from . import roaring

    if txn is not None:
        committed = last_txn_version(path, txn[0])
        if committed >= txn[1]:
            return committed
    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    adds_map, meta = _replay_log_adds(path)
    _check_write_allowed(path, meta, "delete")
    files = [os.path.join(path, p) for p in adds_map]
    if not files:
        raise ValueError(f"{path}: snapshot is empty — nothing to delete")

    # distributed predicate evaluation over the DV-filtered scan (rows
    # already deleted can't match twice), then EXECUTOR-SIDE bitmap
    # construction: groupBy(file) + applyInPandas serializes one roaring
    # bitmap per touched file on the executors, already unioned with the
    # file's existing DV (repeated deletes compose). The driver collects
    # O(#touched files) compact blobs — never O(#matched rows) positions —
    # so a mass delete (GDPR erasure of a heavy entity on a 100 TB table)
    # cannot OOM the driver. Per-group memory is bounded by one file's
    # row count (~10^7 for a 1 GB file), normal executor-task scale.
    scan = _scan_files(spark, path, files, meta, adds_map, with_metadata=True)
    matched_df = (
        scan.withColumn("_fp", F.col("_metadata.file_path"))
        .withColumn("_ri", F.col("_metadata.row_index"))
        .where(predicate)
        .select("_fp", "_ri")
    )
    # closure state is metadata-sized: table root + descriptors of files
    # that ALREADY carry a DV (usually few); rel paths derive from the
    # file URI by prefix-stripping, no O(#files) dict is shipped
    root_abs = os.path.abspath(path)
    old_dv_descs = {
        rel: a["deletionVector"]
        for rel, a in adds_map.items()
        if a.get("deletionVector")
    }

    def _build_file_dv(pdf):
        import pandas as pd  # noqa: F401 (worker-side)

        from feature_store_ml_spark.io import roaring as _roaring
        from feature_store_ml_spark.io.lakehouse import _dv_positions as _dvp

        from urllib.parse import unquote

        uri = pdf["_fp"].iloc[0]
        p = uri[5:] if uri.startswith("file:") else uri
        # the URI is percent-encoded; adds_map keys (and the on-disk
        # layout) are raw bytes — one unquote restores them exactly
        # (a literal '%' in a Hive-escaped dir always arrives as %25)
        rel = os.path.relpath(unquote(p), root_abs)
        positions = pdf["_ri"].astype("int64").tolist()
        old = old_dv_descs.get(rel)
        if old:
            positions = positions + _dvp(root_abs, old)
        data = _roaring.serialize_positions(positions)
        return pd.DataFrame(
            {"rel": [rel], "dv": [data], "card": [len(set(positions))]}
        )

    matched = (
        matched_df.groupBy("_fp")
        .applyInPandas(_build_file_dv, schema="rel string, dv binary, card long")
        .collect()
    )
    now_ms = int(_time.time() * 1000)
    cdc_actions: list[dict] = []
    if matched and _cdf_enabled(meta):
        # with the change feed enabled, record the deleted ROWS explicitly
        # (one extra filtered scan) so feed readers get them from
        # _change_data instead of reconstructing bitmap diffs
        cdc_actions = _write_change_data(
            spark,
            path,
            _scan_files(spark, path, files, meta, adds_map)
            .where(predicate)
            .withColumn("_change_type", F.lit("delete")),
            now_ms,
        )
    if not matched:
        actions: list[dict] = []
        if txn is not None:
            actions.append(
                {"txn": {"appId": txn[0], "version": int(txn[1]),
                         "lastUpdated": now_ms}}
            )
        actions.append(
            {"commitInfo": {"timestamp": now_ms, "operation": "DELETE",
                            "operationParameters": {"predicate": predicate,
                                                    "matched": "0"}}}
        )
        return _commit(path, actions)

    for row in matched:
        if row["rel"] not in adds_map:
            raise RuntimeError(
                f"{path}: matched file {row['rel']} not in snapshot"
            )
    new_descs = _dv_descriptors(
        path,
        [(r["rel"], bytes(r["dv"]), int(r["card"])) for r in matched],
        inline_threshold,
    )

    # protocol upgrade to table features, CARRYING the table's existing
    # features forward — legacy versions EXPAND to their implied lists
    # (v6 implies identityColumns, v5 columnMapping in either mode, ...);
    # dropping one would un-declare an active feature
    proto = _current_protocol(path)
    r0, w0 = _protocol_as_features(proto)
    reader_feats = r0 | {"deletionVectors"}
    writer_feats = w0 | {"deletionVectors"}
    if any(
        k.startswith("delta.constraints.")
        for k in (meta.get("configuration") or {})
    ):
        writer_feats.add("checkConstraints")
    if (meta.get("configuration") or {}).get("delta.columnMapping.mode") in (
        "name",
        "id",
    ):
        reader_feats.add("columnMapping")
        writer_feats.add("columnMapping")
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(reader_feats),
                "writerFeatures": sorted(writer_feats),
            }
        }
    ]
    if txn is not None:
        actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]), "lastUpdated": now_ms}}
        )
    for rel, desc in new_descs.items():
        old = adds_map[rel]
        actions.append(
            {"remove": {"path": rel, "dataChange": True,
                        "deletionTimestamp": now_ms}}
        )
        add = {
            "path": rel,
            "partitionValues": old.get("partitionValues") or {},
            "size": old.get("size")
            or os.path.getsize(os.path.join(path, rel)),
            "modificationTime": now_ms,
            "dataChange": True,
            "deletionVector": desc,
        }
        # row-tracking identity survives a DV delete — the file's bytes
        # (and hence its rows' baseRowId-relative positions) are untouched
        for k in ("baseRowId", "defaultRowCommitVersion"):
            if old.get(k) is not None:
                add[k] = old[k]
        # the file's bytes are untouched, so its stats remain valid
        # (bounds are conservative over the DV-masked rows) — dropping
        # them would silently turn data skipping off for every file a
        # delete ever touched
        if old.get("stats") is not None:
            add["stats"] = old["stats"]
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "DELETE",
                "operationParameters": {"predicate": predicate},
            }
        }
    )
    actions.extend(cdc_actions)
    return _uniform_sync(spark, path, meta, _commit(path, actions))


def clone_delta(spark: SparkSession, src: str, dst: str) -> int:
    """SHALLOW CLONE: create a new Delta table at ``dst`` whose add
    actions reference ``src``'s CURRENT data files by absolute path (the
    protocol allows absolute paths in ``add.path``) — zero bytes copied,
    one metadata commit, however large the source. The canonical dev/test
    workflow: experiment destructively against a 100 TB table for the
    cost of its metadata.

    Isolation semantics, same as delta-spark's shallow clone:
    - the clone starts at version 0 with the source's schema, partitioning,
      configuration, per-file stats (data skipping keeps working) and
      deletion vectors (masked rows stay masked);
    - writes to the clone are copy-on-write INTO the clone's directory —
      a MERGE/DELETE/UPDATE rewrites touched source-referenced files as
      clone-local ones, never touching the source;
    - vacuum on the clone only walks the clone's own directory, so
      source bytes are never collected from the clone side. The flip
      side is real: VACUUM ON THE SOURCE can collect files the clone
      still references (the documented shallow-clone hazard).
    Fail-loud: dst already a Delta table, src not one."""
    import time as _time

    if not is_delta_table(src):
        raise ValueError(f"{src}: not a Delta table")
    if is_delta_table(dst):
        raise ValueError(f"{dst}: already a Delta table — clone refuses to overwrite")
    adds, meta = _replay_log_adds(src)
    _check_protocol(dst, proto := _current_protocol(src))
    now_ms = int(_time.time() * 1000)
    os.makedirs(dst, exist_ok=True)
    os.makedirs(_delta_log_dir(dst), exist_ok=True)
    actions: list[dict] = [{"protocol": proto}]
    actions.append(
        {
            "metaData": {
                **meta,
                "id": __import__("uuid").uuid4().hex,
                "createdTime": now_ms,
            }
        }
    )
    src_abs = os.path.abspath(src)
    for rel, a in adds.items():
        clone_add = dict(a)
        clone_add["path"] = os.path.join(src_abs, rel).replace(os.sep, "/")
        # an inline or src-relative DV stays readable: 'u'-storage DV
        # paths resolve against the TABLE root, so re-root them absolute
        dv = clone_add.get("deletionVector")
        if dv and dv.get("storageType") == "u":
            clone_add["deletionVector"] = {
                **dv,
                "storageType": "p",
                "pathOrInlineDv": _resolve_dv_path(src_abs, dv),
                "offset": dv.get("offset", 1),
            }
        actions.append({"add": clone_add})
    # carry the source's live domain metadata (PROTOCOL.md §Domain
    # Metadata) into the clone's v0 commit — critically the
    # delta.rowTracking high-water mark: without it the clone's first
    # _allocate_base_row_ids would restart at 0 and hand out baseRowId
    # ranges that collide with the cloned files' ids
    for domain, conf_json in sorted(_domain_metadata(src).items()):
        if domain == _STATS_DOMAIN:
            # the stats pointer is keyed to the SOURCE's commit version
            # and its Puffin file lives in the source's _delta_log — in
            # the clone's fresh numbering it would read as fresh forever;
            # drop it (re-ANALYZE on the clone is cheap)
            continue
        actions.append(
            {
                "domainMetadata": {
                    "domain": domain,
                    "configuration": conf_json,
                    "removed": False,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "CLONE",
                "operationParameters": {"source": src_abs, "isShallow": "true"},
            }
        }
    )
    return _commit(dst, actions)


def update_delta(
    spark: SparkSession,
    path: str,
    set: dict[str, str],
    where: str | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """UPDATE ... SET ... WHERE as a copy-on-write commit — the third leg
    of the DML triad beside merge_delta and delete_delta. ``set`` maps
    column names to SQL expressions evaluated against the PRE-update row
    (simultaneous assignment, one projection — ``SET a = b, b = a`` swaps).

    Scale shape, same as MERGE: touched-file discovery is a distributed
    scan filtered by the predicate, collecting only the DISTINCT file
    paths (O(#touched files) driver metadata, never rows); only those
    files are rewritten, with matched rows transformed and unmatched
    neighbors copied through. Partition moves are free (an update to a
    partition column stages the row into its new directory). DV-masked
    rows never resurrect: the rewrite scans through the DV filter and the
    rewritten files carry no deletionVector. CHECK constraints are
    enforced on the post-update rows before any data is staged; the
    change feed gets update_preimage/update_postimage rows when
    delta.enableChangeDataFeed is set. ``txn`` is the same exactly-once
    (appId, version) handshake write_delta documents.

    A predicate matching nothing commits only the operation record (no
    removes/adds), mirroring merge_delta's no-op commit."""
    import time as _time
    import uuid
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    if not set:
        raise ValueError("update_delta: empty SET clause")
    if txn is not None:
        committed = last_txn_version(path, txn[0])
        if committed >= txn[1]:
            return committed
    files_abs, meta = _replay_log(path)
    adds_map, _ = _replay_log_adds(path)
    proto = _check_write_allowed(path, meta, "update")
    if not meta.get("schemaString"):
        raise ValueError(f"{path}: table declares no schema")
    declared = StructType.fromJson(json.loads(meta["schemaString"]))
    table_cols = [f.name for f in declared.fields]
    declared_types = {f.name: f.dataType for f in declared.fields}
    unknown = sorted(c for c in set if c not in table_cols)
    if unknown:
        raise ValueError(
            f"{path}: SET references unknown columns {unknown} "
            f"(have {table_cols})"
        )
    id_specs = _identity_specs(meta)
    bad_identity = sorted(c for c in set if c in id_specs)
    if bad_identity:
        raise ValueError(
            f"{path}: SET targets IDENTITY column(s) {bad_identity} — "
            "GENERATED ALWAYS values cannot be assigned; rewritten rows "
            "keep their generated values"
        )
    mats = _rt_materialization(meta, path)
    rt_obligation = mats is not None or "rowTracking" in (
        proto.get("writerFeatures") or []
    )
    part_cols = meta.get("partitionColumns") or []
    pred = where or "true"
    now_ms = int(_time.time() * 1000)

    touched_abs: list[str] = []
    if files_abs:
        scan = _scan_files(
            spark, path, files_abs, meta, adds_map, with_metadata=True
        )
        touched_abs = [
            unquote(urlparse(r["_fp"]).path)
            for r in (
                scan.where(F.expr(pred))
                .select(F.col("_metadata.file_path").alias("_fp"))
                .distinct()
                .collect()  # O(#touched files) — metadata, never rows
            )
        ]
    base_actions: list[dict] = []
    if txn is not None:
        base_actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]), "lastUpdated": now_ms}}
        )
    info = {
        "commitInfo": {
            "timestamp": now_ms,
            "operation": "UPDATE",
            "operationParameters": {"predicate": pred},
        }
    }
    if not touched_abs:
        return _commit(path, base_actions + [info])

    def _scan_touched() -> DataFrame:
        return _scan_files(spark, path, touched_abs, meta, adds_map).select(
            *table_cols
        )

    assigns = {
        c: F.when(F.expr(pred), F.expr(e).cast(declared_types[c])).otherwise(
            F.col(c)
        )
        for c, e in set.items()
    }
    out_cols = list(table_cols)
    if mats is not None:
        # materialize ids through the rewrite: every row keeps its row id;
        # rows the predicate matched get a NULL commit version (the
        # fresh-row rule stamps this commit — "last changed here"), the
        # copied-through neighbors keep theirs. All expressions evaluate
        # against the PRE-update projection (withColumns is simultaneous).
        mat_id, mat_ver = mats
        out_cols += [mat_id, mat_ver]
        rels = [
            os.path.relpath(f, path).replace(os.sep, "/") for f in touched_abs
        ]
        scan0 = _scan_with_row_ids(
            spark, path, meta, {r: adds_map[r] for r in rels}
        )
        assigns = {
            **assigns,
            mat_id: F.col("row_id"),
            mat_ver: F.when(
                F.expr(pred), F.lit(None).cast("long")
            ).otherwise(F.col("row_commit_version")),
        }
        new_rows = scan0.withColumns(assigns).select(*out_cols)
    else:
        new_rows = _scan_touched().withColumns(assigns).select(*table_cols)
    _enforce_constraints(new_rows, meta, path)
    _enforce_generated(new_rows, meta, path)
    change_rows: DataFrame | None = None
    if _cdf_enabled(meta):
        matched = _scan_touched().where(F.expr(pred))
        pre = matched.withColumn("_change_type", F.lit("update_preimage"))
        post = (
            matched.withColumns(
                {c: F.expr(e).cast(declared_types[c]) for c, e in set.items()}
            )
            .select(*table_cols)
            .withColumn("_change_type", F.lit("update_postimage"))
        )
        change_rows = pre.unionByName(post)

    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    stage_writer = _to_physical(new_rows, meta).write
    if part_cols:
        _m = _stage_partition_names(meta)
        stage_writer = stage_writer.partitionBy(
            *[_m.get(c, c) for c in part_cols]
        )
    stage_writer.parquet(staging)
    adds = _promote_staged(staging, path, now_ms, data_change=True)
    cdc_actions = (
        _write_change_data(spark, path, change_rows, now_ms)
        if change_rows is not None
        else []
    )
    actions = list(base_actions)
    actions.extend(
        {
            "remove": {
                "path": os.path.relpath(f, path).replace(os.sep, "/"),
                "dataChange": True,
                "deletionTimestamp": now_ms,
            }
        }
        for f in touched_abs
    )
    actions.extend(adds)
    actions.extend(cdc_actions)
    actions.append(info)
    if rt_obligation:
        return _uniform_sync(
            spark, path, meta, _commit_row_tracked(path, actions, adds, "update")
        )
    return _uniform_sync(spark, path, meta, _commit(path, actions))


def overwrite_delta_where(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    where: str,
    txn: tuple[str, int] | None = None,
) -> int:
    """Selective overwrite — delta-spark's ``replaceWhere``: atomically
    replace exactly the rows matching ``where`` with ``source``, the
    canonical BACKFILL shape ("recompute yesterday's partition") that at
    100 TB must never rewrite the table. Copy-on-write, one commit:

    - every ``source`` row must satisfy ``where`` (fail-loud probe job,
      the same constraint real Delta enforces) — otherwise the operation
      would not be idempotent on re-run;
    - touched-file discovery is the distributed ``_metadata.file_path``
      semi-join (O(#touched files) driver metadata, never rows); files
      whose rows ALL miss the predicate are untouched, partially-matched
      files are rewritten with their surviving (non-matching, DV-visible)
      rows copied through;
    - survivors + new rows stage together (partition moves free), CHECK
      constraints and generated columns enforced on the incoming rows,
      change feed gets delete+insert rows when CDF is on;
    - NULL predicate rows are survivors (SQL WHERE semantics: NULL is
      not matched, so they are not replaced).

    ``txn`` is the exactly-once (appId, version) handshake. Returns the
    committed version. Table must exist (use write_delta to create)."""
    import time as _time
    import uuid
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    if not is_delta_table(path):
        raise ValueError(
            f"{path}: not a Delta table — overwrite_delta_where replaces "
            "rows in an existing table; create with write_delta first"
        )
    if not where or not str(where).strip():
        raise ValueError(
            "overwrite_delta_where: empty predicate — a full-table "
            "overwrite is write_delta(mode='overwrite')"
        )
    if txn is not None:
        committed = last_txn_version(path, txn[0])
        if committed >= txn[1]:
            return committed
    files_abs, meta = _replay_log(path)
    adds_map, _ = _replay_log_adds(path)
    proto = _check_write_allowed(path, meta, "replaceWhere")
    if not meta.get("schemaString"):
        raise ValueError(f"{path}: table declares no schema")
    declared = StructType.fromJson(json.loads(meta["schemaString"]))
    table_cols = [f.name for f in declared.fields]
    id_specs = _identity_specs(meta)
    mats = _rt_materialization(meta, path)
    rt_obligation = mats is not None or "rowTracking" in (
        proto.get("writerFeatures") or []
    )
    if id_specs:
        # incoming rows are NEW rows: GENERATED ALWAYS identity values are
        # generated here (a source carrying the column is refused inside);
        # surviving rows copy their existing values through the rewrite
        source = _assign_identity(source, id_specs, path)
    missing = sorted(set(table_cols) - set(source.columns))
    if missing:
        raise ValueError(
            f"{path}: source is missing table columns {missing}"
        )
    source = source.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in declared.fields]
    )
    if id_specs:
        # pin the generated values: monotonically_increasing_id is
        # recomputation-unstable, and the source feeds multiple actions
        # (constraint probe, staging write, CDF insert rows)
        source = source.localCheckpoint()
    matched_cond = F.coalesce(F.expr(where), F.lit(False))
    # the replaceWhere CONSTRAINT: incoming rows must all match
    stray = source.where(~matched_cond).limit(1).collect()
    if stray:
        raise ValueError(
            f"{path}: replaceWhere constraint violated — a source row does "
            f"not satisfy {where!r} (e.g. {stray[0].asDict()})"
        )
    _enforce_constraints(source, meta, path)
    _enforce_generated(source, meta, path)
    part_cols = meta.get("partitionColumns") or []
    now_ms = int(_time.time() * 1000)

    touched_abs: list[str] = []
    if files_abs:
        scan = _scan_files(
            spark, path, files_abs, meta, adds_map, with_metadata=True
        )
        touched_abs = [
            unquote(urlparse(r["_fp"]).path)
            for r in (
                scan.where(matched_cond)
                .select(F.col("_metadata.file_path").alias("_fp"))
                .distinct()
                .collect()  # O(#touched files) — metadata, never rows
            )
        ]
    base_actions: list[dict] = []
    if txn is not None:
        base_actions.append(
            {"txn": {"appId": txn[0], "version": int(txn[1]), "lastUpdated": now_ms}}
        )
    info = {
        "commitInfo": {
            "timestamp": now_ms,
            "operation": "WRITE",
            "operationParameters": {"mode": "Overwrite", "predicate": where},
        }
    }

    def _scan_touched() -> DataFrame:
        return _scan_files(spark, path, touched_abs, meta, adds_map).select(
            *table_cols
        )

    new_rows = source
    if mats is not None:
        # replaced rows are NEW rows (fresh ids via the fresh-row rule);
        # survivors of partially-matched files copy through with their
        # (id, version) MATERIALIZED so they never renumber
        mat_id, mat_ver = mats
        _null_l = F.lit(None).cast("long")
        new_rows = source.withColumn(mat_id, _null_l).withColumn(
            mat_ver, _null_l
        )
        if touched_abs:
            rels = [
                os.path.relpath(f, path).replace(os.sep, "/")
                for f in touched_abs
            ]
            surv = (
                _scan_with_row_ids(
                    spark, path, meta, {r: adds_map[r] for r in rels}
                )
                .where(~matched_cond)
                .select(
                    *table_cols,
                    F.col("row_id").alias(mat_id),
                    F.col("row_commit_version").alias(mat_ver),
                )
            )
            new_rows = surv.unionByName(new_rows)
    elif touched_abs:
        new_rows = _scan_touched().where(~matched_cond).unionByName(source)
    change_rows: DataFrame | None = None
    if _cdf_enabled(meta):
        deleted = (
            _scan_touched().where(matched_cond)
            if touched_abs
            else source.limit(0)
        )
        change_rows = deleted.withColumn(
            "_change_type", F.lit("delete")
        ).unionByName(source.withColumn("_change_type", F.lit("insert")))

    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    stage_writer = _to_physical(new_rows, meta).write
    if part_cols:
        _m = _stage_partition_names(meta)
        stage_writer = stage_writer.partitionBy(
            *[_m.get(c, c) for c in part_cols]
        )
    stage_writer.parquet(staging)
    adds = _promote_staged(staging, path, now_ms, data_change=True)
    cdc_actions = (
        _write_change_data(spark, path, change_rows, now_ms)
        if change_rows is not None
        else []
    )
    actions = list(base_actions)
    actions.extend(
        {
            "remove": {
                "path": os.path.relpath(f, path).replace(os.sep, "/"),
                "dataChange": True,
                "deletionTimestamp": now_ms,
            }
        }
        for f in touched_abs
    )
    actions.extend(adds)
    actions.extend(cdc_actions)
    if id_specs and adds:
        # the staged files mix survivors (values at-or-below the mark)
        # with freshly generated rows — the fold is monotonic, so the
        # high water mark advances exactly by what generation added
        actions.insert(
            0,
            {
                "metaData": {
                    **meta,
                    "schemaString": _advance_identity_schema(
                        id_specs, json.loads(meta["schemaString"]), adds
                    ),
                }
            },
        )
    actions.append(info)
    if rt_obligation:
        return _uniform_sync(
            spark, path, meta,
            _commit_row_tracked(path, actions, adds, "replaceWhere"),
        )
    return _uniform_sync(spark, path, meta, _commit(path, actions))


def enable_delta_column_mapping(spark: SparkSession, path: str) -> int:
    """ALTER the table onto NAME-mode column mapping without renaming
    anything — the standalone form of the upgrade the first
    rename/drop performs implicitly: every field gets
    ``delta.columnMapping.physicalName`` = its current name (what the
    existing files already carry) and a stable id; protocol moves to
    2/5. After this, renames/drops are one-commit metadata operations
    and new files stage under the frozen physical names. Idempotent:
    an already-mapped table returns its current version unchanged."""
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    conf = dict(meta.get("configuration") or {})
    if conf.get("delta.columnMapping.mode") in ("name", "id"):
        return _next_version(_delta_log_dir(path)) - 1
    schema = json.loads(meta["schemaString"])
    import itertools as _it

    _ctr = _it.count(int(conf.get("delta.columnMapping.maxColumnId", 0)) + 1)
    for f in schema["fields"]:
        md = dict(f.get("metadata") or {})
        md["delta.columnMapping.physicalName"] = f["name"]
        md["delta.columnMapping.id"] = next(_ctr)
        f["metadata"] = md
        # nested members upgrade too (physicalName = own name — that is
        # what the existing files carry)
        _assign_nested_mapping_ids(f.get("type"), _ctr)
    max_id = next(_ctr) - 1
    conf["delta.columnMapping.mode"] = "name"
    conf["delta.columnMapping.maxColumnId"] = str(max_id)
    now_ms = int(_time.time() * 1000)
    return _commit(
        path,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    **{
                        k: v
                        for k, v in meta.items()
                        if k not in ("schemaString", "configuration")
                    },
                    "schemaString": json.dumps(schema),
                    "configuration": conf,
                }
            },
            {
                "commitInfo": {
                    "timestamp": now_ms,
                    "operation": "UPGRADE COLUMN MAPPING",
                    "operationParameters": {"mode": "name"},
                }
            },
        ],
    )


def rename_delta_column(spark: SparkSession, path: str, old: str, new: str) -> int:
    """ZERO-REWRITE column rename via COLUMN MAPPING (PROTOCOL.md §Column
    Mapping, name mode) — the operation that motivates the feature: without
    mapping, renaming a column on a 100 TB table means rewriting 100 TB of
    parquet; with it, the rename is ONE metadata commit.

    First rename on an unmapped table upgrades it in the same commit:
    every field gets ``delta.columnMapping.physicalName`` = its CURRENT
    name (what the existing files already carry — no data changes) and a
    stable ``delta.columnMapping.id``; the configuration records
    ``delta.columnMapping.mode = name`` and the protocol moves to
    minReaderVersion 2 / minWriterVersion 5 (the column-mapping gate real
    readers check). The rename itself then only changes the LOGICAL field
    name — the physical name pins the data.

    Subsequent writes (append/merge/compact) translate logical -> physical
    at the staging boundary (``_to_physical``), so new files always carry
    physical names. Partitioned tables work too: partition DIRECTORIES
    and ``partitionValues`` keep physical names (renaming a partition
    column never moves a file), while ``partitionColumns`` follows the
    logical name. Fail-loud: unknown column, name collision, columns
    referenced by CHECK constraints.
    """
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if old not in names:
        raise ValueError(f"{path}: no column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"{path}: column {new!r} already exists")
    conf = dict(meta.get("configuration") or {})
    # a CHECK constraint stores its expression as TEXT referencing column
    # names — renaming a referenced column would leave the expression
    # stale and break every subsequent write; refuse upfront (the same
    # rule delta-spark enforces)
    import re as _re

    for key, expr in conf.items():
        if key.startswith("delta.constraints.") and _re.search(
            rf"\b{_re.escape(old)}\b", expr
        ):
            raise ValueError(
                f"{path}: column {old!r} is referenced by CHECK constraint "
                f"{key[len('delta.constraints.'):]!r} ({expr}) — drop the "
                "constraint first, rename, then re-add it on the new name"
            )
    # an ALREADY-mapped table (either mode) keeps its mapping verbatim —
    # overwriting physicalName/id here would orphan the real physical
    # columns the files carry and silently null every read (round-7 fix;
    # ID-mode renames resolve by field id, nothing else changes)
    mapped = conf.get("delta.columnMapping.mode") in ("name", "id")
    max_id = int(conf.get("delta.columnMapping.maxColumnId", 0))
    for i, f in enumerate(schema["fields"], start=1):
        md = dict(f.get("metadata") or {})
        if not mapped:
            # upgrade: physical name = the name the files already carry
            md["delta.columnMapping.physicalName"] = f["name"]
            md["delta.columnMapping.id"] = i
            max_id = max(max_id, i)
        if f["name"] == old:
            f["name"] = new
        f["metadata"] = md
    if not mapped:
        conf["delta.columnMapping.mode"] = "name"
        conf["delta.columnMapping.maxColumnId"] = str(max_id)
    # renaming a PARTITION column only changes its LOGICAL name: the
    # metaData's partitionColumns list follows, while the physicalName
    # pins the existing `old=value/` directory layout and partitionValues
    part_cols = [
        new if c == old else c for c in (meta.get("partitionColumns") or [])
    ]
    now_ms = int(_time.time() * 1000)
    actions: list[dict] = []
    if not mapped:
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": 2,
                    "minWriterVersion": 5,
                }
            }
        )
    actions.append(
        {
            "metaData": {
                **{
                    k: v
                    for k, v in meta.items()
                    if k not in ("schemaString", "configuration", "partitionColumns")
                },
                "schemaString": json.dumps(schema),
                "configuration": conf,
                "partitionColumns": part_cols,
            }
        }
    )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "RENAME COLUMN",
                "operationParameters": {"from": old, "to": new},
            }
        }
    )
    return _commit(path, actions)


def drop_delta_column(spark: SparkSession, path: str, name: str) -> int:
    """ZERO-REWRITE column drop via COLUMN MAPPING — the Delta twin of
    ``drop_iceberg_column`` (round 6): the new metaData simply omits the
    field; files keep the bytes until natural compaction rewrites them.
    Column mapping is REQUIRED (delta-spark enforces the same): without
    it, re-adding a same-named column later would resurrect the old
    values out of the untouched files — so an unmapped table is upgraded
    to name mode in this commit, exactly like the first rename, and the
    dropped field's columnMapping.id is never reused (maxColumnId stays).
    Fail-loud: unknown column, partition column, last column, columns
    referenced by CHECK constraints."""
    import re as _re
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if name not in names:
        raise ValueError(f"{path}: no column {name!r} (have {names})")
    if len(names) == 1:
        raise ValueError(f"{path}: cannot drop the last column {name!r}")
    if name in (meta.get("partitionColumns") or []):
        raise ValueError(
            f"{path}: {name!r} is a partition column — repartition via "
            "overwrite instead of dropping"
        )
    conf = dict(meta.get("configuration") or {})
    for key, expr in conf.items():
        if key.startswith("delta.constraints.") and _re.search(
            rf"\b{_re.escape(name)}\b", expr
        ):
            raise ValueError(
                f"{path}: column {name!r} is referenced by CHECK constraint "
                f"{key[len('delta.constraints.'):]!r} ({expr}) — drop the "
                "constraint first"
            )
    mapped = conf.get("delta.columnMapping.mode") == "name"
    if conf.get("delta.columnMapping.mode") == "id":
        mapped = True  # ID mode already has stable ids/physical names
    max_id = int(conf.get("delta.columnMapping.maxColumnId", 0))
    kept_fields = []
    for i, f in enumerate(schema["fields"], start=1):
        md = dict(f.get("metadata") or {})
        if not mapped:
            md["delta.columnMapping.physicalName"] = f["name"]
            md["delta.columnMapping.id"] = i
            max_id = max(max_id, i)
        f["metadata"] = md
        if f["name"] != name:
            kept_fields.append(f)
    schema["fields"] = kept_fields
    if not mapped:
        conf["delta.columnMapping.mode"] = "name"
    conf["delta.columnMapping.maxColumnId"] = str(
        max(max_id, int(conf.get("delta.columnMapping.maxColumnId", 0)))
    )
    now_ms = int(_time.time() * 1000)
    actions: list[dict] = []
    if not mapped:
        actions.append(
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
        )
    actions.append(
        {
            "metaData": {
                **{
                    k: v
                    for k, v in meta.items()
                    if k not in ("schemaString", "configuration")
                },
                "schemaString": json.dumps(schema),
                "configuration": conf,
            }
        }
    )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "DROP COLUMN",
                "operationParameters": {"column": name},
            }
        }
    )
    return _commit(path, actions)


#: PROTOCOL.md §Type Widening — the promotions a widened column may take,
#: keyed by the schemaString's Spark-JSON type names. Every pair here is
#: also a promotion Spark 4's parquet reader performs when scanning an old
#: (narrow) file under the new declared schema, so reads need no rewrite.
_INT_WIDENINGS: dict[str, set[str]] = {
    "byte": {"short", "integer", "long", "double"},
    "short": {"integer", "long", "double"},
    "integer": {"long", "double"},
    "long": set(),
    "float": {"double"},
    "date": {"timestamp_ntz"},
}
#: minimum integer digits (precision - scale) for an int-family column to
#: widen into a decimal without overflow, per the spec's table. byte and
#: short are ABSENT although the spec allows them: Spark's parquet reader
#: promotes int32/int64 physical columns to decimal but refuses the
#: INT(8)/INT(16)-annotated forms (verified empirically) — admitting the
#: change would commit a schema the scanner cannot read back
_MIN_DECIMAL_DIGITS = {"integer": 10, "long": 20}
_DECIMAL_RE = re.compile(r"decimal\((\d+),(\d+)\)")


def _widening_ok(frm: str, to: str) -> bool:
    """True iff changing a column's type ``frm`` -> ``to`` is one of the
    protocol's allowed WIDENING promotions (never loses information)."""
    if to in _INT_WIDENINGS.get(frm, set()):
        return True
    m_to = _DECIMAL_RE.fullmatch(to)
    if not m_to:
        return False
    p2, s2 = int(m_to.group(1)), int(m_to.group(2))
    if frm in _MIN_DECIMAL_DIGITS:
        return p2 - s2 >= _MIN_DECIMAL_DIGITS[frm]
    m_frm = _DECIMAL_RE.fullmatch(frm)
    if not m_frm:
        return False
    p1, s1 = int(m_frm.group(1)), int(m_frm.group(2))
    # decimal(p,s) -> decimal(p + k1, s + k2) with k1 >= k2 >= 0: integer
    # digits and scale may each grow, neither may shrink
    return s2 >= s1 and p2 - s2 >= p1 - s1


def widen_delta_column_type(
    spark: SparkSession, path: str, column: str, new_type: str
) -> int:
    """ALTER COLUMN ... TYPE as a ZERO-REWRITE metadata commit via the
    protocol's TYPE WIDENING table feature (PROTOCOL.md §Type Widening) —
    without it, growing an int column on a 100 TB table means rewriting
    100 TB of parquet; with it, the change is ONE commit and existing
    files keep their narrow physical type.

    Mechanics, per spec: the new metaData carries the WIDENED type in
    schemaString plus a ``delta.typeChanges`` history entry in the
    field's metadata ({"fromType", "toType"}), and the protocol moves to
    table features (3/7) with ``typeWidening`` in BOTH feature lists,
    carrying the table's existing features forward. Readers then scan old
    files under the declared (wide) schema — Spark's parquet reader
    performs every promotion this function admits (verified for
    int-family -> long/double/decimal, float -> double, decimal
    precision/scale growth, date -> timestamp_ntz). Per-file stats stay
    valid: widening preserves numeric order, so min/max bounds written
    under the narrow type still bound the widened column.

    Fail-loud: unknown column, non-widening change (narrowing or
    cross-family), partition columns (their values are serialized into
    directory names and partitionValues under the OLD type's formatting —
    delta-spark refuses these too). Appends after the change must carry
    the widened type (write_delta's append check enforces the declared
    schema, so a stale producer fails loudly instead of corrupting)."""
    import time as _time

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = _replay_log_adds(path)
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    if column not in names:
        raise ValueError(f"{path}: no column {column!r} (have {names})")
    if column in (meta.get("partitionColumns") or []):
        raise ValueError(
            f"{path}: {column!r} is a partition column — its values are "
            "serialized into directory names under the current type; "
            "repartition via overwrite instead of widening"
        )
    new_type = new_type.strip().lower().replace(" ", "")
    for f in schema["fields"]:
        if f["name"] != column:
            continue
        old_type = f["type"]
        if not isinstance(old_type, str):
            raise NotImplementedError(
                f"{path}: {column!r} is a nested type — widening nested "
                "fields is not implemented"
            )
        if old_type == new_type:
            raise ValueError(f"{path}: {column!r} is already {new_type}")
        if not _widening_ok(old_type, new_type):
            raise ValueError(
                f"{path}: {old_type} -> {new_type} is not a widening "
                "promotion (narrowing and cross-family changes require a "
                "rewrite via mode='overwrite')"
            )
        f["type"] = new_type
        md = dict(f.get("metadata") or {})
        changes = list(md.get("delta.typeChanges") or [])
        changes.append({"fromType": old_type, "toType": new_type})
        md["delta.typeChanges"] = changes
        f["metadata"] = md
    conf = dict(meta.get("configuration") or {})
    conf["delta.enableTypeWidening"] = "true"
    # protocol upgrade to table features, carrying existing/implied
    # features forward (same discipline as the deletion-vector upgrade:
    # dropping an active feature from the lists would un-declare it)
    proto = _current_protocol(path)
    r0, w0 = _protocol_as_features(proto)  # legacy versions expand
    reader_feats = r0 | {"typeWidening"}
    writer_feats = w0 | {"typeWidening"}
    if any(k.startswith("delta.constraints.") for k in conf) or proto.get(
        "minWriterVersion", 2
    ) >= 3:
        writer_feats.add("checkConstraints")
    if _mapping_mode(meta):
        reader_feats.add("columnMapping")
        writer_feats.add("columnMapping")
    now_ms = int(_time.time() * 1000)
    actions: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(reader_feats),
                "writerFeatures": sorted(writer_feats),
            }
        },
        {
            "metaData": {
                **{
                    k: v
                    for k, v in meta.items()
                    if k not in ("schemaString", "configuration")
                },
                "schemaString": json.dumps(schema),
                "configuration": conf,
            }
        },
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "CHANGE COLUMN",
                "operationParameters": {"column": column, "type": new_type},
            }
        },
    ]
    return _commit(path, actions)


def _historic_logical_to_current(path: str, meta: dict) -> dict[str, str]:
    """OLD logical column name -> CURRENT logical name, via the stable
    physical names: fold every metaData action in the log (checkpoint +
    JSON commits), map each historical field's logical name to its
    physicalName (pre-mapping schemas: physical == logical), then
    physical -> current logical. Metadata-sized — the same replay pass
    the snapshot build walks. Used to resolve cdc files written before a
    rename."""
    mode = _mapping_mode(meta) if meta.get("schemaString") else None
    if mode == "name":
        phys_to_cur = {p: l for l, p in (_column_mapping(meta) or {}).items()}
    elif mode == "id":
        phys_to_cur = {p: l for l, p in _physical_names(meta).items()}
    else:
        return {}
    out: dict[str, str] = {}

    def _fold(md) -> None:
        if not md or not md.get("schemaString"):
            return
        sch = json.loads(md["schemaString"])
        for f in sch.get("fields", []):
            phys = (
                (f.get("metadata") or {}).get("delta.columnMapping.physicalName")
                or f["name"]
            )
            cur = phys_to_cur.get(phys)
            if cur is not None:
                out[f["name"]] = cur

    log = _delta_log_dir(path)
    ckpt_version, ckpt_files = _latest_checkpoint(log)
    for fpath in ckpt_files:
        for row in _manifest_rows(fpath, log, follow_sidecars=True):
            _fold(row.get("metaData"))
    for name in sorted(os.listdir(log)):
        if not _is_commit_json(name):
            continue
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _fold(json.loads(line).get("metaData"))
    return out


def read_delta_cdf(
    spark: SparkSession, path: str, since_version: int, to_version: int | None = None
) -> DataFrame:
    """ROW-LEVEL change feed for ``(since_version, to_version]`` — the
    table's columns plus ``_change_type`` ('insert' | 'delete') and
    ``_commit_version``. The incremental primitive for a downstream
    pipeline that must APPLY deletes (GDPR propagation, feature
    retraction), where the adds-only ``read_delta_changes`` refuses.

    What is derivable WITHOUT change-data files, and how:
    - append commits: every row of the added files is an 'insert' at that
      version (the files are read as written — later deletion vectors do
      not retroactively edit an earlier commit's change set);
    - deletion-vector DELETE commits (remove+re-add of the same paths
      with a new DV): the deleted rows are exactly the positions in the
      NEW bitmap minus the path's previous bitmap — a per-commit DV diff,
      recovered by an inner join of the file scan against the diffed
      positions;
    - dataChange:false commits (OPTIMIZE/checkpoint shuffles): invisible,
      as in Delta CDF.

    A commit that REWRITES data files (overwrite, copy-on-write MERGE)
    cannot be row-diffed from the log alone — real Delta emits
    ``_change_data`` files for those; this reader FAILS LOUDLY rather
    than guessing. Scale shape: per-commit file lists and DV bitmaps are
    driver metadata; row materialization is distributed scans + broadcast
    position joins, one pair per changed commit.
    """
    from pyspark.sql import functions as F

    log = _delta_log_dir(path)
    all_json = sorted(
        n for n in os.listdir(log) if _is_commit_json(n)
    )
    hi = to_version if to_version is not None else (
        int(all_json[-1][:20]) if all_json else -1
    )
    have = {int(n[:20]) for n in all_json}
    gone = sorted(set(range(since_version + 1, hi + 1)) - have)
    if gone:
        raise ValueError(
            f"{path}: commits {gone[:5]}{'...' if len(gone) > 5 else ''} in "
            f"({since_version}, {hi}] are not in the JSON log — the change "
            "feed would be incomplete"
        )
    # DV state AS OF since_version (what each path's bitmap looked like
    # before the range) — bitmaps diff against this, then roll forward
    base_adds, _ = _replay_log_adds(path, max_version=since_version)
    dv_state: dict[str, dict | None] = {
        rel: a.get("deletionVector") for rel, a in base_adds.items()
    }
    _, meta = _replay_log_adds(path, max_version=hi if hi >= 0 else None)

    inserts: list[tuple[int, list[str]]] = []          # (version, files)
    deletes: list[tuple[int, str, list[int]]] = []     # (version, file, positions)
    cdc_files: list[tuple[int, list[str]]] = []        # (version, cdc parquet)
    for name in all_json:
        v = int(name[:20])
        if v <= since_version or v > hi:
            continue
        adds_v: list[dict] = []
        removes_v: list[dict] = []
        cdc_v: list[str] = []
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("dataChange", True):
                    adds_v.append(action["add"])
                elif "remove" in action and action["remove"].get("dataChange", True):
                    removes_v.append(action["remove"])
                elif "cdc" in action:
                    cdc_v.append(os.path.join(path, action["cdc"]["path"]))
        if cdc_v:
            # the writer recorded the changes explicitly (_change_data) —
            # authoritative for ANY commit shape, incl. merge rewrites;
            # roll the DV/file state forward and move on
            cdc_files.append((v, cdc_v))
            for r in removes_v:
                dv_state.pop(r["path"], None)
            for a in adds_v:
                dv_state[a["path"]] = a.get("deletionVector")
            continue
        if not adds_v and not removes_v:
            continue
        dv_adds = {a["path"]: a for a in adds_v if a.get("deletionVector")}
        removed_paths = {r["path"] for r in removes_v}
        if removed_paths and removed_paths == set(dv_adds) and len(adds_v) == len(dv_adds):
            # DV DELETE commit: diff each path's bitmap
            for rel, a in dv_adds.items():
                new_pos = set(_dv_positions(path, a["deletionVector"]))
                old_desc = dv_state.get(rel)
                old_pos = set(_dv_positions(path, old_desc)) if old_desc else set()
                fresh = sorted(new_pos - old_pos)
                if fresh:
                    deletes.append((v, os.path.join(path, rel), fresh))
                dv_state[rel] = a["deletionVector"]
        elif not removed_paths:
            files = [os.path.join(path, a["path"]) for a in adds_v]
            inserts.append((v, files))
            for a in adds_v:
                dv_state[a["path"]] = a.get("deletionVector")
        else:
            raise ValueError(
                f"{path}: commit {v} rewrote data files (overwrite/merge) — "
                "row-level changes are not derivable without change-data "
                "files; re-read the full snapshot"
            )

    all_files = (
        [f for _, fs in inserts for f in fs]
        + [f for _, f, _ in deletes]
        + [f for _, fs in cdc_files for f in fs]
    )
    missing = [f for f in all_files if not os.path.exists(f)]
    if missing:
        raise ValueError(
            f"{path}: changed files were vacuumed (e.g. "
            f"{os.path.basename(missing[0])}) — history is gone"
        )

    from pyspark.sql.types import StructType

    parts: list[DataFrame] = []
    _hist_map: "dict[str, str] | None" = None
    cur_names = (
        {f.name for f in StructType.fromJson(json.loads(meta["schemaString"])).fields}
        if meta.get("schemaString")
        else set()
    ) | {"_change_type"}
    for v, fs in cdc_files:
        df_cdc = spark.read.parquet(*fs)
        unknown = set(df_cdc.columns) - cur_names
        if unknown:
            # cdc files carry the LOGICAL names current at their commit;
            # after a rename those names are orphans. Physical names are
            # stable, so replay the log's metaData history once and map
            # old-logical -> physical -> current-logical (round 11 —
            # formerly a refusal in the streaming tail and a silent
            # unionByName failure here).
            if _hist_map is None:
                _hist_map = _historic_logical_to_current(path, meta)
            unresolvable = [c for c in sorted(unknown) if c not in _hist_map]
            if unresolvable:
                raise ValueError(
                    f"{path}: cdc file columns {unresolvable} resolve to "
                    "no current column through the log's schema history — "
                    "commits before the retained checkpoint were cleaned?"
                )
            df_cdc = df_cdc.select(
                *[F.col(c).alias(_hist_map.get(c, c)) for c in df_cdc.columns]
            )
        parts.append(
            df_cdc.withColumn("_commit_version", F.lit(v).cast("long"))
        )
    for v, files in inserts:
        parts.append(
            _scan_files(spark, path, files, meta)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(v).cast("long"))
        )
    if deletes:
        # the commit version rides WITH each (file, position) pair — one
        # file can be deleted-from at several versions in the range
        del_pairs = [
            ("file:" + os.path.abspath(f), p, v)
            for v, f, positions in deletes
            for p in positions
        ]
        pos_df = local_rows_df(spark, 
            del_pairs, "_dv_fp string, _dv_ri long, _commit_version long"
        )
        del_files = sorted({f for _, f, _ in deletes})
        scan = _scan_files(spark, path, del_files, meta, with_metadata=True)
        # decoded: del_pairs key on raw on-disk paths (see _decoded_file_path)
        tagged = scan.withColumn("_fp", _decoded_file_path(del_files)).withColumn(
            "_ri", F.col("_metadata.row_index")
        )
        dead = (
            tagged.join(
                F.broadcast(pos_df),
                (F.col("_fp") == F.col("_dv_fp")) & (F.col("_ri") == F.col("_dv_ri")),
                "inner",
            )
            .withColumn("_change_type", F.lit("delete"))
            .drop("_fp", "_ri", "_dv_fp", "_dv_ri", "_metadata")
        )
        cols = [c for c in dead.columns if c not in ("_change_type", "_commit_version")]
        parts.append(dead.select(*cols, "_change_type", "_commit_version"))

    if not parts:
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        if not meta.get("schemaString"):
            raise ValueError(f"{path}: no changes and no declared schema")
        declared = StructType.fromJson(json.loads(meta["schemaString"]))
        empty = StructType(
            list(declared.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )
        return local_rows_df(spark, [], empty)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def enable_delta_row_tracking(spark: SparkSession, path: str) -> int:
    """Turn ROW TRACKING on for an existing table (PROTOCOL.md §Row
    Tracking) in ONE metadata commit: every live ``add`` is re-issued
    with a contiguous ``baseRowId`` range (``dataChange=False`` — no
    bytes move), the protocol upgrades to writer v7 with the
    rowTracking + domainMetadata features (legacy features expanded, not
    dropped), the configuration gains ``delta.enableRowTracking`` plus
    the reserved materialized-column names, and the ``delta.rowTracking``
    domain records the allocation high water mark. Backfilled files'
    ``defaultRowCommitVersion`` is this commit's version (their original
    versions are not tracked per-add — the spec's backfill rule).

    Driver cost: O(#files) footer row counts (the same metadata pass
    stats collection does). Returns the committed version."""
    import time as _time
    import uuid as _uuid

    import pyarrow.parquet as pq

    adds_map, meta = _replay_log_adds(path)
    _check_write_allowed(path, meta, "metadata")
    conf = dict(meta.get("configuration") or {})
    log = _delta_log_dir(path)
    if conf.get("delta.enableRowTracking") == "true":
        return _next_version(log) - 1
    if _mapping_mode(meta):
        raise NotImplementedError(
            f"{path}: row tracking on a column-mapped table is not "
            "implemented"
        )
    proto = _current_protocol(path)
    r0, w0 = _protocol_as_features(proto)
    new_proto: dict = {
        "minReaderVersion": proto.get("minReaderVersion", 1) or 1,
        "minWriterVersion": 7,
        "writerFeatures": sorted(w0 | {"rowTracking", "domainMetadata"}),
    }
    if (proto.get("minReaderVersion") or 1) >= 3:
        new_proto["readerFeatures"] = sorted(r0)
    conf["delta.enableRowTracking"] = "true"
    conf["delta.rowTracking.materializedRowIdColumnName"] = (
        f"_row-id-col-{_uuid.uuid4()}"
    )
    conf["delta.rowTracking.materializedRowCommitVersionColumnName"] = (
        f"_row-commit-version-col-{_uuid.uuid4()}"
    )
    now_ms = int(_time.time() * 1000)
    actions: list[dict] = [
        {"protocol": new_proto},
        {
            "metaData": {
                **{k: v for k, v in meta.items() if k != "configuration"},
                "configuration": conf,
            }
        },
    ]
    # files written while the FEATURE was active (flag off) already carry
    # baseRowId — keep their ranges and continue from the existing
    # watermark; shrinking it would violate the monotonic-mark rule
    dm0 = _domain_metadata(path)
    try:
        nxt = int(
            json.loads(dm0.get("delta.rowTracking") or "{}").get(
                "rowIdHighWaterMark", -1
            )
        ) + 1
    except (TypeError, ValueError):
        raise ValueError(
            f"{path}: unparseable delta.rowTracking domain metadata"
        )
    backfills: list[dict] = []
    for rel in sorted(adds_map):
        if adds_map[rel].get("baseRowId") is not None:
            continue  # allocated pre-enablement, range stays
        a = dict(adds_map[rel])
        try:
            n = int(json.loads(a.get("stats") or "{}").get("numRecords"))
        except (TypeError, ValueError):
            n = pq.ParquetFile(os.path.join(path, rel)).metadata.num_rows
        a["baseRowId"] = nxt
        a["dataChange"] = False
        a["modificationTime"] = a.get("modificationTime") or now_ms
        nxt += n
        backfills.append(a)
        actions.append({"add": a})
    actions.append(
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": nxt - 1}),
                "removed": False,
            }
        }
    )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "ENABLE ROW TRACKING",
                "operationParameters": {},
            }
        }
    )
    version = _next_version(log)
    for a in backfills:
        a["defaultRowCommitVersion"] = version
    if not _try_commit(log, version, actions, path):
        raise RuntimeError(
            f"{path}: version {version} was committed concurrently — "
            "re-run enablement against the new snapshot"
        )
    return version


def _scan_with_row_ids(
    spark: SparkSession, path: str, meta: dict, adds_map: dict
) -> DataFrame:
    """Declared columns + ``row_id`` / ``row_commit_version`` for a
    row-tracked snapshot, handling BOTH file generations per the spec's
    precedence: files carrying the MATERIALIZED physical columns (our
    compaction rewrites, or a foreign engine's) read them, null entries
    and fresh files fall back to ``baseRowId + physical row index`` /
    ``defaultRowCommitVersion``. DV masks apply in both branches (the
    materialized branch scans through _scan_files with the schema
    extended by the two physical columns, so descriptor resolution is
    shared). One O(#files) footer probe to split the generations — the
    same metadata pass stats collection pays."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    import pyarrow.parquet as pq

    if _mapping_mode(meta):
        raise NotImplementedError(
            f"{path}: reading row ids from a COLUMN-MAPPED row-tracked "
            "table is not implemented (this writer refuses the combo; "
            "the table is foreign)"
        )
    conf = meta.get("configuration") or {}
    mat_id = conf.get("delta.rowTracking.materializedRowIdColumnName")
    mat_ver = conf.get(
        "delta.rowTracking.materializedRowCommitVersionColumnName"
    )
    declared = StructType.fromJson(json.loads(meta["schemaString"]))
    plain: list[str] = []
    mat: list[str] = []
    rows = []
    for rel, a in sorted(adds_map.items()):
        f = os.path.join(path, rel)
        if a.get("baseRowId") is None:
            raise ValueError(
                f"{path}: live file {rel} lacks baseRowId — row tracking "
                "metadata is incomplete (foreign writer without the "
                "feature?)"
            )
        names = set(pq.read_schema(f).names)
        (mat if (mat_id and mat_id in names) else plain).append(f)
        rcv = a.get("defaultRowCommitVersion")
        rows.append(
            (
                "file:" + os.path.abspath(f),
                int(a["baseRowId"]),
                -1 if rcv is None else int(rcv),  # 0 is a real version
            )
        )
    m = local_rows_df(spark, rows, "_rt_fp string, _rt_base long, _rt_ver long")
    branches = []
    if plain:
        s = _scan_files(spark, path, plain, meta, adds_map, with_metadata=True)
        branches.append(
            s.withColumn("_mr", F.lit(None).cast("long")).withColumn(
                "_mv", F.lit(None).cast("long")
            )
        )
    if mat:
        phys = StructType(
            list(declared.fields)
            + [
                StructField(mat_id, LongType(), True),
                StructField(mat_ver, LongType(), True),
            ]
        )
        meta_ext = {**meta, "schemaString": phys.json()}
        s = _scan_files(spark, path, mat, meta_ext, adds_map, with_metadata=True)
        branches.append(
            s.withColumnRenamed(mat_id, "_mr").withColumnRenamed(
                mat_ver, "_mv"
            )
        )
    if not branches:  # empty snapshot (e.g. overwritten with zero rows)
        return local_rows_df(spark, 
            [],
            StructType(
                list(declared.fields)
                + [
                    StructField("row_id", LongType(), True),
                    StructField("row_commit_version", LongType(), True),
                ]
            ),
        )
    from functools import reduce as _reduce

    scan = _reduce(lambda a, b: a.unionByName(b), branches)
    return (
        scan.withColumn("_fp0", _decoded_file_path(plain + mat))
        .withColumn("_ri0", F.col("_metadata.row_index"))
        .join(F.broadcast(m), F.col("_fp0") == F.col("_rt_fp"))
        .withColumn(
            "row_id", F.coalesce(F.col("_mr"), F.col("_rt_base") + F.col("_ri0"))
        )
        .withColumn(
            "row_commit_version", F.coalesce(F.col("_mv"), F.col("_rt_ver"))
        )
        .drop(
            "_fp0", "_ri0", "_rt_fp", "_rt_base", "_rt_ver",
            "_mr", "_mv", "_metadata",
        )
    )


def read_delta_row_ids(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a ROW-TRACKED table with its stable ``row_id`` and
    ``row_commit_version`` columns: fresh files compute
    ``baseRowId + physical row index`` / ``defaultRowCommitVersion``;
    rewritten files (compaction) carry the ids MATERIALIZED and read
    them back. DV-masked rows simply leave holes — the surviving rows'
    ids never move, which is the whole point (CDC joins,
    training-example provenance, feature lineage all key on it).

    The (file -> baseRowId) map is metadata-sized and broadcast; the id
    arithmetic is a JVM-side projection over the hidden ``_metadata``
    columns — no Python, no shuffle. ``version`` time-travels: row ids
    are STABLE across versions, so joining two travels on row_id is the
    protocol-level diff row tracking exists for."""
    adds_map, meta = _replay_log_adds(path, max_version=version)
    conf = meta.get("configuration") or {}
    if conf.get("delta.enableRowTracking") != "true":
        raise ValueError(
            f"{path}: table does not have row tracking enabled — "
            "enable_delta_row_tracking(path) first"
        )
    return _scan_with_row_ids(spark, path, meta, adds_map)


def describe_delta_history(path: str) -> list[dict]:
    """DESCRIBE HISTORY: one dict per commit (newest first) with version,
    timestamp, operation and operationParameters — the audit view every
    mutation debugging session starts from. Driver-side JSON scan of the
    retained log (checkpoint-cleaned commits are simply absent, as in
    delta-spark after log retention)."""
    log = _delta_log_dir(path)
    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    out: list[dict] = []
    for name in sorted(os.listdir(log), reverse=True):
        if not (_is_commit_json(name)):
            continue
        v = int(name[:20])
        info: dict = {"version": v, "timestamp": None, "operation": None,
                      "operationParameters": {}}
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                ci = action.get("commitInfo")
                if ci:
                    info["timestamp"] = ci.get("timestamp")
                    info["operation"] = ci.get("operation")
                    info["operationParameters"] = ci.get("operationParameters") or {}
                    break
        out.append(info)
    return out


def restore_delta(spark: SparkSession, path: str, version: int) -> int:
    """RESTORE TABLE ... TO VERSION AS OF: make the CURRENT snapshot equal
    an old one again, as a NEW commit (history is append-only — a restore
    never rewrites the log, so the mistake and its correction both stay
    auditable). The commit is the file-set diff: remove every live file
    the target snapshot lacks, re-add every target file not currently
    live (with its partitionValues and deletion vector exactly as they
    were). Fails loudly when the target's files were vacuumed — then the
    data is physically gone and no metadata operation can bring it back.

    Also re-emits the target snapshot's metaData when it differs (schema
    or configuration rolled back too — restoring to before a widening
    restores the narrow schema, like delta-spark). Driver-side metadata
    only; returns the committed version.
    """
    import time as _time

    target_adds, target_meta = _replay_log_adds(path, max_version=version)
    current_adds, current_meta = _replay_log_adds(path)
    _check_write_allowed(path, current_meta, "restore")
    gone = [
        rel for rel in target_adds if not os.path.exists(os.path.join(path, rel))
    ]
    # DV bin files the target snapshot referenced must survive too
    gone += [
        a["deletionVector"]["pathOrInlineDv"]
        for a in target_adds.values()
        if a.get("deletionVector", {}).get("storageType") == "u"
        and not os.path.exists(_resolve_dv_path(path, a["deletionVector"]))
    ]
    if gone:
        raise ValueError(
            f"{path}: cannot restore to v{version} — {len(gone)} of its "
            f"files were vacuumed (e.g. {os.path.basename(gone[0])})"
        )
    now_ms = int(_time.time() * 1000)
    actions: list[dict] = []
    if (
        target_meta.get("schemaString") != current_meta.get("schemaString")
        or (target_meta.get("configuration") or {})
        != (current_meta.get("configuration") or {})
        or (target_meta.get("partitionColumns") or [])
        != (current_meta.get("partitionColumns") or [])
    ):
        actions.append({"metaData": target_meta})
    for rel in current_adds:
        if rel not in target_adds or current_adds[rel].get("deletionVector") != target_adds[rel].get("deletionVector"):
            actions.append(
                {"remove": {"path": rel, "dataChange": True,
                            "deletionTimestamp": now_ms}}
            )
    for rel, add in target_adds.items():
        if rel not in current_adds or current_adds[rel].get("deletionVector") != add.get("deletionVector"):
            actions.append({"add": {**add, "modificationTime": now_ms,
                                    "dataChange": True}})
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "RESTORE",
                "operationParameters": {"version": str(version)},
            }
        }
    )
    # post-restore configuration is the TARGET's (metaData rolls back too)
    return _uniform_sync(spark, path, target_meta, _commit(path, actions))


# ------------------------------------------------------------ statistics ----

#: engine-namespaced domain holding the table's statistics pointer
#: (PROTOCOL.md §Domain Metadata allows engine-specific domains)
_STATS_DOMAIN = "fsml.statistics"


def analyze_delta(
    spark: SparkSession,
    path: str,
    columns: "list[str] | None" = None,
    k: int = 4096,
    incremental: bool = False,
) -> str:
    """ANALYZE for path-based Delta tables — the twin of
    iceberg.analyze_iceberg: per-column NDV theta sketches (io/puffin,
    one distinct+TakeOrdered pass per column) written to a Puffin file
    under ``_delta_log/_stats/`` and registered in the ``fsml.statistics``
    DOMAIN METADATA (the protocol's slot for engine state — it rides
    checkpoints, clones and log replay like delta.rowTracking does).
    Delta has no statistics-file slot of its own, so the pointer lives in
    a namespaced domain; readers that don't know the domain ignore it.

    Freshness is keyed to the COMMIT VERSION analyzed:
    delta_table_statistics returns the NDVs only while the table is
    still at that version — any later commit reads as UNKNOWN, never as
    a silently-stale number. ``incremental=True`` re-analyzes cheaply
    after appends: files added since the analyzed version sketch alone
    and UNION with the stored sketches (falls back to the full scan on
    removes/DV changes, cleaned history, mapped/partitioned tables, or a
    column with no prior sketch). Returns the Puffin file path."""
    import uuid as _uuid

    from . import puffin

    if not is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    adds_map, meta = _replay_log_adds(path)
    if not meta.get("schemaString"):
        raise ValueError(f"{path}: table declares no schema")
    version = _next_version(_delta_log_dir(path)) - 1
    declared = [
        f["name"] for f in json.loads(meta["schemaString"])["fields"]
    ]
    if columns is None:
        columns = declared
    unknown = [c for c in columns if c not in declared]
    if unknown:
        raise ValueError(f"{path}: analyze of unknown columns {unknown}")
    sketches = None
    if incremental:
        sketches = _incremental_delta_sketches(
            spark, path, meta, adds_map, columns, k
        )
    if sketches is None:
        sketches = puffin.column_sketches(read_delta(spark, path), columns, k=k)
    stats_dir = os.path.join(_delta_log_dir(path), "_stats")
    os.makedirs(stats_dir, exist_ok=True)
    puffin_path = os.path.join(
        stats_dir, f"{version:020d}-{_uuid.uuid4().hex[:12]}.stats.puffin"
    )
    blobs = [
        (
            {
                "type": puffin.BLOB_TYPE_THETA,
                "fields": [declared.index(c) + 1],
                "snapshot-id": version,
                "sequence-number": version,
                "properties": {"ndv": str(sk.estimate), "column": c},
            },
            sk.serialize(),
        )
        for c, sk in sketches.items()
    ]
    puffin.write_puffin(
        puffin_path, blobs, properties={"created-by": "feature_store_ml_spark"}
    )
    domain = {
        "version": version,
        "path": os.path.relpath(puffin_path, path).replace(os.sep, "/"),
        "ndv": {c: sk.estimate for c, sk in sketches.items()},
    }
    actions: list[dict] = []
    # emitting a domainMetadata action requires the table to DECLARE the
    # domainMetadata writer feature (PROTOCOL.md §Domain Metadata) — a
    # foreign writer that doesn't see the feature could legally drop the
    # domain at its next checkpoint. Upgrade in the same commit, once.
    proto = _current_protocol(path)
    if "domainMetadata" not in (proto.get("writerFeatures") or []):
        r0, w0 = _protocol_as_features(proto)
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": proto.get("minReaderVersion", 1),
                    "minWriterVersion": 7,
                    **(
                        {"readerFeatures": sorted(r0)}
                        if proto.get("minReaderVersion", 1) >= 3
                        else {}
                    ),
                    "writerFeatures": sorted(w0 | {"domainMetadata"}),
                }
            }
        )
    _commit(
        path,
        actions
        + [
            {
                "domainMetadata": {
                    "domain": _STATS_DOMAIN,
                    "configuration": json.dumps(domain),
                    "removed": False,
                }
            },
            {
                "commitInfo": {
                    "timestamp": int(__import__("time").time() * 1000),
                    "operation": "ANALYZE",
                    "operationParameters": {"columns": ",".join(columns)},
                }
            },
        ],
    )
    return puffin_path


def _stats_domain(path: str) -> dict | None:
    raw = _domain_metadata(path).get(_STATS_DOMAIN)
    if not raw:
        return None
    try:
        return json.loads(raw)
    except (TypeError, ValueError):
        return None


def delta_table_statistics(path: str) -> dict:
    """Planner-facing statistics for a Delta table — same shape as
    iceberg.table_statistics: {"row_count", "total_file_bytes",
    "avg_row_bytes", "ndv", "stats_version"}. Row count/bytes come from
    the live adds' per-file stats (metadata-only); NDV comes from the
    fsml.statistics domain and is returned only while the table is still
    at the ANALYZEd version + the stats commit itself (an ANALYZE commit
    obviously doesn't invalidate its own numbers)."""
    adds_map, _meta = _replay_log_adds(path)
    rows = 0
    size = 0
    for rel, a in adds_map.items():
        try:
            rows += int(json.loads(a.get("stats") or "{}").get("numRecords") or 0)
        except (TypeError, ValueError):
            pass
        # numRecords counts PHYSICAL rows; a deletion vector masks some —
        # its cardinality rides the descriptor, so live rows stay exact
        dv = a.get("deletionVector")
        if dv and dv.get("cardinality"):
            rows -= int(dv["cardinality"])
        size += int(a.get("size") or 0)
    dom = _stats_domain(path)
    ndv: dict[str, int] = {}
    stats_version = None
    if dom is not None:
        cur = _next_version(_delta_log_dir(path)) - 1
        # fresh while nothing landed after the ANALYZE commit (which is
        # dom version + 1, the commit that recorded the domain)
        if cur <= int(dom.get("version", -1)) + 1:
            ndv = {c: int(v) for c, v in (dom.get("ndv") or {}).items()}
            stats_version = int(dom["version"])
    return {
        "row_count": rows,
        "total_file_bytes": size,
        "avg_row_bytes": (size / rows) if rows else 0.0,
        "ndv": ndv,
        "stats_version": stats_version,
    }


def read_delta_statistics_sketches(path: str) -> dict:
    """{column: ThetaSketch} from the fsml.statistics domain's Puffin
    file (whatever its freshness — callers merge or inspect)."""
    from . import puffin

    dom = _stats_domain(path)
    if dom is None:
        return {}
    blobs, _props = puffin.read_puffin(os.path.join(path, dom["path"]))
    out = {}
    for bm in blobs:
        if bm.get("type") != puffin.BLOB_TYPE_THETA:
            continue
        c = (bm.get("properties") or {}).get("column")
        if c:
            out[c] = puffin.ThetaSketch.deserialize(bm["payload"])
    return out


def _incremental_delta_sketches(spark, path, meta, adds_map, columns, k):
    """Merge path of analyze_delta(incremental=True): sketch ONLY files
    added since the analyzed version, union with stored sketches. None
    (→ full scan) on: no prior stats, mapped/partitioned table, cleaned
    history, any remove/DV change since, or a missing prior column."""
    from . import puffin

    dom = _stats_domain(path)
    if dom is None:
        return None
    if _mapping_mode(meta) or (meta.get("partitionColumns") or []):
        return None
    prior = read_delta_statistics_sketches(path)
    if any(c not in prior for c in columns):
        return None
    since = int(dom.get("version", -1))
    log = _delta_log_dir(path)
    cur = _next_version(log) - 1
    have = {
        int(n[:20]) for n in os.listdir(log) if _is_commit_json(n)
    }
    needed = set(range(since + 1, cur + 1))
    if not needed <= have:
        return None  # cleaned history: can't prove additivity
    new_rels: list[str] = []
    for v in sorted(needed):
        with open(os.path.join(log, f"{v:020d}.json"), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    return None  # rows left: union cannot shrink
                if "add" in action and action["add"].get("dataChange", True):
                    if action["add"].get("deletionVector"):
                        return None
                    new_rels.append(action["add"]["path"])
    new_files = sorted(
        os.path.join(path, r) for r in set(new_rels) if r in adds_map
    )
    if not new_files:
        return {c: prior[c] for c in columns}
    fresh = puffin.column_sketches(
        spark.read.parquet(*new_files), columns, k=k
    )
    return {c: prior[c].merge(fresh[c]) for c in columns}
