"""Pure-python Apache Iceberg v1/v2/v3 metadata reader (SURVEY.md §2B E1
stretch — the reference has no lakehouse surface; this exists for the
100 TB north star where tables live behind a table format).

No iceberg-spark jar and no pyiceberg ship in this container, so the
snapshot is resolved from the PUBLIC table spec
(https://iceberg.apache.org/spec/) directly:

    metadata/vN.metadata.json   -> current snapshot, schema
    snapshot's manifest list    -> manifest file paths        (Avro)
    each manifest               -> data_file entries + status (Avro)

Avro parsing is `avro_lite` (driver-side, metadata-sized — the identical
material every Iceberg reader's planning phase parses). Data files in
ALL THREE spec formats — parquet, AVRO and ORC, mixed freely within one
table — scan DISTRIBUTED (parquet natively with pushdown/pruning/codegen;
AVRO/ORC through mapInPandas container readers with field-id resolution),
and every DML/maintenance verb works across them: merge-on-read UPDATE/
MERGE/overwrite-where stage same-format replacements, POSITION deletes
(delete_iceberg) and sequence-scoped EQUALITY deletes
(delete_iceberg_equality) read-mask and write in any format (equality-
delete keys decode DISTRIBUTED, no driver size bound), row lineage
(spec §Row Lineage, the v3 model) assigns and preserves stable row ids
through rewrites in every format. Identity-partition source columns are
physically present in Iceberg data files (unlike Hive/Delta layouts), so
no path-based schema reconstruction is needed; files that omit them
(conversions) backfill from manifest partition tuples. Time travel reads
any RETAINED snapshot (by id or as-of timestamp via the snapshot-log);
expired history fails loudly.

Format-version 3 (round 11): DELETION VECTORS — row-level deletes land
as puffin `deletion-vector-v1` blobs (Delta-framed roaring bitmaps, one
per data file, unioned + superseded-in-same-snapshot per spec) across
DELETE/UPDATE/MERGE/overwrite-where, with row lineage mandatory; v2
tables keep writing position-delete files unchanged.

Nested types (round 13): struct/list/map are first-class on the parquet
leg — spec JSON schema forms with per-nested-field ids (covered by
last-column-id), declared-schema reads, zero-rewrite rename of nested
parents via footer field-id resolution, merge_schema evolution adding
nested columns, MoR deletes/DVs over nested tables. Manifests carry no
bounds for nested fields (spec-optional; the pruner fails open).

v3 VARIANT has the FULL WRITE SURFACE (round 14; reads landed in round
13): write_iceberg(format_version=3) stages Spark's spec-shredded
variant parquet (CREATE / append / merge_schema evolution / UPDATE /
MERGE / MoR DV deletes), with record_counts backfilled in one
distributed job and a name mapping merged on every commit — pyarrow
cannot parse VARIANT footers, so renames resolve via mapped names with
a JVM footer fallback. Existing variant parquet still registers via
snapshot_parquet_to_iceberg; scans decode through Spark's VariantType
reader (variant_get / cast to string). Variant WRITES refuse (the commit phase needs
footer readbacks pyarrow cannot do).

Remaining fail-loud refusals (canonical inventory: STATUS.md "Remaining
loud refusals", kept honest by tests/test_header_drift.py): metadata
format-version 4+; v3-only types (timestamptz_ns/geometry); AVRO/ORC
staging of variant columns and defaults on variant (the parquet write
surface lands in round 14);
column DEFAULTS on nested/variant types (spec §Default values forbids
them; add_iceberg_column of nested types itself lands in round 14);
temporal/decimal members and map columns on the AVRO/ORC nested
staging legs (struct/list stage as records/arrays resp. native ORC
nested types since round 14); nested entries in a foreign name
mapping; inner renames on non-parquet data files, on tables with
column defaults, or when a live file lacks member field ids (compact
first — struct-member renames land in round 13, ANY-depth dotted
paths in round 14, via rename_iceberg_nested_field; the file-source
streaming tail of inner-renamed tables materializes since round 14);
write_iceberg(branch='main') and schema evolution through a side
branch; zoneless wall-clock ORC files declared timestamptz.
"""

from __future__ import annotations

from ..localframe import local_rows_df

import json
import os
import re
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from . import avro_lite
from . import nativesrc as _nativesrc

#: manifest-entry status values, per spec
_STATUS_DELETED = 2


def _localize(uri: str, table_root: str) -> str:
    """Iceberg metadata stores absolute URIs from the WRITER's filesystem
    (file:/..., s3://...). Re-root file/relative paths under the table dir
    so a relocated (copied) table still resolves; object-store URIs pass
    through untouched for the actual cluster's filesystem to handle."""
    if uri.startswith("file:") or "://" not in uri:
        # strip the scheme by hand: urlparse would truncate a raw '#' or
        # '?' in the path (URI fragment/query), and writers that stamp
        # unescaped local paths (including old versions of this one) are
        # in the wild
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        if path.startswith("///"):
            path = path[2:]
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


def _local_path(p: str) -> str:
    """file:-or-raw path → local filesystem path, FRAGMENT-SAFE: urlparse
    on a raw on-disk path truncates at '#'/'?' (URI fragment/query), so a
    table root like 'sp ace#dir' would resolve to a nonexistent prefix.
    Strips the scheme by hand — the same rule as _localize, minus the
    relocation graft. Non-file schemes pass through untouched."""
    if p.startswith("file:"):
        p = p[len("file:"):]
        if p.startswith("///"):
            p = p[2:]
    return p


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
    if fv > 3:
        raise NotImplementedError(f"{table_root}: iceberg format-version {fv} > 3")
    if fv == 3:
        # v3 support (rounds 11-12): deletion vectors + row lineage +
        # column DEFAULT VALUES + the v2 surface. Guard the v3 features
        # this reader does NOT implement, loudly, before any scan could
        # go silently wrong: v3-only types (timestamptz_ns / variant /
        # geometry...). Column defaults are validated at load — a
        # default this module cannot parse (nested type, malformed JSON
        # single-value) must refuse here, not surface null mid-scan.
        for s in meta.get("schemas") or ([meta["schema"]] if meta.get("schema") else []):
            for f in s.get("fields", []):
                if "initial-default" in f or "write-default" in f:
                    for k in ("initial-default", "write-default"):
                        if k in f and f[k] is not None:
                            _default_parse(f.get("type"), f[k], f.get("name"))
                t = f.get("type")
                # 'variant' is READABLE since round 13 (Spark's native
                # VariantType decodes the binary encoding; shredded
                # layouts fail loud at scan); defaults on variant stay
                # refused via _default_parse above
                if isinstance(t, str) and (
                    t.endswith("_ns") or t in ("geometry", "geography", "unknown")
                ):
                    raise NotImplementedError(
                        f"{table_root}: v3 type {t!r} on field "
                        f"{f.get('name')!r} is outside this reader's "
                        "primitive mapping"
                    )
    else:
        # 'variant' is a v3-ONLY type (spec §Schemas): a v1/v2 metadata
        # file declaring it is spec-invalid (foreign/corrupt metadata) —
        # refuse rather than scan fail-open (ADVICE r13)
        def _has_variant(t) -> bool:
            if t == "variant":
                return True
            if isinstance(t, dict):
                return any(
                    _has_variant(t.get(k))
                    for k in ("element", "key", "value")
                    if k in t
                ) or any(
                    _has_variant(f2.get("type"))
                    for f2 in t.get("fields", [])
                )
            return False

        for s in meta.get("schemas") or (
            [meta["schema"]] if meta.get("schema") else []
        ):
            for f in s.get("fields", []):
                if _has_variant(f.get("type")):
                    raise ValueError(
                        f"{table_root}: field {f.get('name')!r} declares "
                        f"the v3-only type 'variant' in a format-version "
                        f"{fv} metadata file — spec-invalid; refuse"
                    )
    return meta


def _snapshot_scan_plan(
    meta: dict,
    snap_id: int,
    table_root: str,
    _manifest_cache: dict | None = None,
) -> tuple[list[dict], list[dict]]:
    """The planning-phase view of one snapshot (manifest-list walk):
    ``(data, deletes)`` where each data entry is ``{path, seq}`` and each
    delete entry is ``{path, seq, kind: 'pos'|'eq', equality_ids}``.

    Sequence numbers come from the manifest-list entry (v2; entries
    inherit their manifest's — our writer and most engines write one
    manifest per commit) and matter for DELETE SCOPING, per spec:
    position deletes apply to data files with sequence <= theirs (same
    commit allowed); EQUALITY deletes apply only to data files with
    sequence STRICTLY LESS — a re-ingested row with the same key after
    the delete stays alive."""
    snapshots = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    snap = snapshots.get(snap_id)
    if snap is None:
        raise ValueError(f"{table_root}: snapshot {snap_id} not in metadata")
    manifest_list = _localize(snap["manifest-list"], table_root)
    data: list[dict] = []
    deletes: list[dict] = []
    for entry in avro_lite.read_container(manifest_list):
        manifest_path = _localize(entry["manifest_path"], table_root)
        is_delete_manifest = (entry.get("content", 0) or 0) == 1
        mseq = entry.get("sequence_number") or 0
        # manifests are IMMUTABLE once written, so a caller walking many
        # snapshots (CDF diffs, streaming syncs) may pass a dict to
        # memoize the avro decode — consecutive snapshots share most of
        # their manifests, turning an O(snapshots × manifests) walk into
        # O(distinct manifests) file reads
        if _manifest_cache is not None:
            rows = _manifest_cache.get(manifest_path)
            if rows is None:
                rows = list(avro_lite.read_container(manifest_path))
                _manifest_cache[manifest_path] = rows
        else:
            rows = avro_lite.read_container(manifest_path)
        for m in rows:
            if m.get("status") == _STATUS_DELETED:
                continue
            # spec inheritance: an entry's explicit sequence_number wins;
            # null inherits the manifest-list entry's (rewrite_manifests
            # stamps explicit seqs when consolidating across commits)
            _eseq = m.get("sequence_number")
            mseq_e = int(_eseq) if _eseq is not None else mseq
            df_struct = m["data_file"]
            content = df_struct.get("content") or 0
            fmt = (df_struct.get("file_format") or "PARQUET").upper()
            if fmt == "PUFFIN" and is_delete_manifest and content == 1:
                # v3 DELETION VECTOR (spec §Position Delete Files: "v3+
                # tables must use deletion vectors"): a puffin blob of
                # roaring-serialized positions for ONE data file. The
                # entry keeps kind 'pos' — every consumer funnels delete
                # PATHS into the shared readers, which sniff the puffin
                # magic and decode blobs to (file_path, pos) pairs.
                deletes.append(
                    {
                        "path": _localize(df_struct["file_path"], table_root),
                        "seq": (
                            int(m["sequence_number"])
                            if m.get("sequence_number") is not None
                            else mseq
                        ),
                        "kind": "pos",
                        "equality_ids": None,
                        "record_count": df_struct.get("record_count"),
                        "referenced_data_file": df_struct.get(
                            "referenced_data_file"
                        ),
                        "content_offset": df_struct.get("content_offset"),
                        "content_size_in_bytes": df_struct.get(
                            "content_size_in_bytes"
                        ),
                    }
                )
                continue
            if fmt not in ("PARQUET", "AVRO", "ORC"):
                # AVRO DATA files read through the shipped avro_lite
                # container reader (round 8), ORC through pyarrow.orc
                # (round 9); AVRO/ORC POSITION deletes decode through the
                # same readers and EQUALITY deletes through
                # _read_eq_delete_keys (round 9 — both sniff the
                # container magic)
                raise NotImplementedError(
                    f"{table_root}: {fmt} "
                    f"{'delete' if is_delete_manifest else 'data'} files "
                    "unsupported (parquet/avro/orc only)"
                )
            p = _localize(df_struct["file_path"], table_root)
            if is_delete_manifest:
                if content == 1:
                    deletes.append(
                        {"path": p, "seq": mseq_e, "kind": "pos",
                         "equality_ids": None,
                         "record_count": df_struct.get("record_count")}
                    )
                elif content == 2:
                    deletes.append(
                        {
                            "path": p,
                            "seq": mseq_e,
                            "kind": "eq",
                            "equality_ids": df_struct.get("equality_ids") or [],
                        }
                    )
                else:
                    raise ValueError(
                        f"{table_root}: DELETE manifest entry with "
                        f"content={content} — corrupt metadata (a delete "
                        "manifest may only hold delete files)"
                    )
            elif content == 0:
                data.append(
                    {
                        "path": p,
                        "seq": mseq_e,
                        "format": fmt,
                        # v3 row lineage (spec §Row Lineage): the id of
                        # this file's first row; None for files written
                        # before lineage was enabled (their rows read a
                        # null _row_id, per spec)
                        "first_row_id": df_struct.get("first_row_id"),
                        # planning-phase skipping inputs (absent in entries
                        # from writers that don't record them — fail open)
                        "partition": df_struct.get("partition") or {},
                        "record_count": df_struct.get("record_count"),
                        "null_value_counts": df_struct.get("null_value_counts"),
                        "lower_bounds": df_struct.get("lower_bounds"),
                        "upper_bounds": df_struct.get("upper_bounds"),
                    }
                )
            else:
                raise ValueError(
                    f"{table_root}: DATA manifest entry with content="
                    f"{content} — corrupt metadata"
                )
    return data, deletes


def _snapshot_content(
    meta: dict,
    snap_id: int,
    table_root: str,
    _manifest_cache: dict | None = None,
) -> tuple[list[str], list[str]]:
    """(data file paths, delete file paths) of one snapshot — the
    path-only view of _snapshot_scan_plan."""
    data, deletes = _snapshot_scan_plan(
        meta, snap_id, table_root, _manifest_cache=_manifest_cache
    )
    return [d["path"] for d in data], [d["path"] for d in deletes]


def _snapshot_files(meta: dict, snap_id: int, table_root: str) -> list[str]:
    """Live parquet data-file paths of one snapshot (manifest-list walk)."""
    return _snapshot_content(meta, snap_id, table_root)[0]


def _live_data_files(table_root: str) -> list[str]:
    """Live parquet data-file paths of the CURRENT snapshot."""
    meta = _load_metadata(table_root)
    snap_id = meta.get("current-snapshot-id")
    if snap_id in (None, -1):
        return []
    return _snapshot_files(meta, snap_id, table_root)


#: iceberg primitive -> spark JSON type name (inverse of the writer map)
_ICEBERG_TO_SPARK = {
    "int": "integer",
    "long": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz",
}


def _ice_to_spark_type(t) -> str | None:
    """Iceberg primitive type string -> Spark JSON type name, including
    parameterized decimals (``decimal(P, S)`` — java Iceberg serializes
    with a space, this module without; both parse). None when unmapped."""
    if not isinstance(t, str):
        return None
    hit = _ICEBERG_TO_SPARK.get(t)
    if hit is not None:
        return hit
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return None


def _spark_to_ice_type(t: str) -> str | None:
    """Spark simpleString type name -> Iceberg primitive, decimals
    included. None when unmapped."""
    hit = _SPARK_TO_ICEBERG.get(t)
    if hit is not None:
        return hit
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return None


# --------------------------------------------------------- nested types ----
# (spec §Schemas: struct/list/map are first-class; every nested field —
# struct member, list element, map key/value — carries its OWN field id,
# unique across the whole schema and covered by last-column-id)


def _ice_type_has_variant(t) -> bool:
    """True when an Iceberg type (str or nested dict form) contains the
    v3-only ``variant`` type anywhere in its tree."""
    if t == "variant":
        return True
    if isinstance(t, dict):
        return any(
            _ice_type_has_variant(t.get(k))
            for k in ("element", "key", "value")
            if k in t
        ) or any(_ice_type_has_variant(f.get("type")) for f in t.get("fields", []))
    return False


def _spark_schema_has_variant(dt) -> bool:
    """True when a Spark DataType tree contains VariantType anywhere."""
    from pyspark.sql import types as T

    if isinstance(dt, T.VariantType):
        return True
    if isinstance(dt, T.StructType):
        return any(_spark_schema_has_variant(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _spark_schema_has_variant(dt.elementType)
    if isinstance(dt, T.MapType):
        return _spark_schema_has_variant(dt.keyType) or _spark_schema_has_variant(
            dt.valueType
        )
    return False


def _spark_dt_to_ice(dt, alloc=None, variant_ok=False):
    """Spark DataType -> Iceberg type (str for primitives, dict for
    struct/list/map per the spec's JSON schema forms). ``alloc`` is a
    zero-arg fresh-field-id allocator used for NESTED ids (struct member
    / element-id / key-id / value-id); the CALLER assigns top-level ids.
    With ``alloc=None`` ids are omitted — the id-free form
    ``_ice_type_fingerprint`` compares. Fail-loud on unmappable types.

    ``variant_ok``: VariantType maps to the spec's v3 ``variant`` only
    when the caller is on a v3 surface (write_iceberg with
    format_version=3 — round 14; registration/conversion paths — round
    13). The default refuses so v1/v2 writers cannot emit a type their
    format version forbids."""
    from pyspark.sql import types as T

    if isinstance(dt, T.VariantType):
        if variant_ok:
            return "variant"
        raise NotImplementedError(
            "variant is a v3-only iceberg type — pass format_version=3 "
            "to write_iceberg (writes land in round 14), or register "
            "existing variant parquet via snapshot_parquet_to_iceberg"
        )
    if isinstance(dt, T.ArrayType):
        eid = alloc() if alloc else None
        out = {
            "type": "list",
            "element-required": not dt.containsNull,
            "element": _spark_dt_to_ice(dt.elementType, alloc, variant_ok),
        }
        if eid is not None:
            out["element-id"] = eid
        return out
    if isinstance(dt, T.MapType):
        kid = alloc() if alloc else None
        vid = alloc() if alloc else None
        out = {
            "type": "map",
            "key": _spark_dt_to_ice(dt.keyType, alloc, variant_ok),
            "value-required": not dt.valueContainsNull,
            "value": _spark_dt_to_ice(dt.valueType, alloc, variant_ok),
        }
        if kid is not None:
            out["key-id"] = kid
            out["value-id"] = vid
        return out
    if isinstance(dt, T.StructType):
        # direct members get ids BEFORE their own nested types are
        # visited (java Iceberg's assignFreshIds order)
        fids = [alloc() if alloc else None for _ in dt.fields]
        fields = []
        for f, fid in zip(dt.fields, fids):
            entry = {
                "name": f.name,
                "required": not f.nullable,
                "type": _spark_dt_to_ice(f.dataType, alloc, variant_ok),
            }
            if fid is not None:
                entry["id"] = fid
            fields.append(entry)
        return {"type": "struct", "fields": fields}
    prim = _spark_to_ice_type(dt.simpleString())
    if prim is None:
        raise NotImplementedError(
            f"write_iceberg: spark type {dt.simpleString()!r} has no "
            "iceberg mapping in this writer"
        )
    return prim


def _ice_type_to_spark_json(t):
    """Iceberg type (str or nested dict) -> Spark JSON type value (the
    form StructType.fromJson consumes), recursing through struct/list/
    map. None when any leaf is unmapped (v3-only types etc.) — callers
    fall back exactly as for flat schemas."""
    if isinstance(t, str):
        if t == "variant":
            # v3 variant (round 13, READ surface): Spark 4 has a native
            # VariantType whose parquet reader decodes the binary
            # encoding — the declared-schema scan rides it; extraction
            # via variant_get / cast to string
            return "variant"
        return _ice_to_spark_type(t)
    if not isinstance(t, dict):
        return None
    kind = t.get("type")
    if kind == "list":
        el = _ice_type_to_spark_json(t.get("element"))
        if el is None:
            return None
        return {
            "type": "array",
            "elementType": el,
            "containsNull": not t.get("element-required", False),
        }
    if kind == "map":
        k = _ice_type_to_spark_json(t.get("key"))
        v = _ice_type_to_spark_json(t.get("value"))
        if k is None or v is None:
            return None
        return {
            "type": "map",
            "keyType": k,
            "valueType": v,
            "valueContainsNull": not t.get("value-required", False),
        }
    if kind == "struct":
        fields = []
        for f in t.get("fields", []):
            ft = _ice_type_to_spark_json(f.get("type"))
            if ft is None:
                return None
            fields.append(
                {
                    "name": f["name"],
                    "type": ft,
                    "nullable": not f.get("required", False),
                    "metadata": {},
                }
            )
        return {"type": "struct", "fields": fields}
    return None


def _ice_type_fingerprint(t):
    """Canonical ID-FREE form of an Iceberg type for schema comparison
    (append checks): ids are table-assigned identity the batch cannot
    know, and required-ness is not compared — matching the flat path's
    name+type leniency (Spark frames default to nullable)."""
    if isinstance(t, str):
        return t
    if not isinstance(t, dict):
        return ("?", repr(t))
    kind = t.get("type")
    if kind == "list":
        return ("list", _ice_type_fingerprint(t.get("element")))
    if kind == "map":
        return (
            "map",
            _ice_type_fingerprint(t.get("key")),
            _ice_type_fingerprint(t.get("value")),
        )
    if kind == "struct":
        return (
            "struct",
            tuple(
                (f["name"], _ice_type_fingerprint(f.get("type")))
                for f in t.get("fields", [])
            ),
        )
    return ("?", repr(t))


def _spark_dt_fingerprint(dt):
    """Fingerprint of a Spark DataType in the same id-free space as
    ``_ice_type_fingerprint`` — None when unmappable (so comparisons
    report a mismatch instead of raising mid-check)."""
    try:
        return _ice_type_fingerprint(
            _spark_dt_to_ice(dt, None, variant_ok=True)
        )
    except NotImplementedError:
        return None


def _with_nested_field_ids(spark_dt, ice_t):
    """Mirror ``spark_dt`` with ``parquet.field.id`` metadata attached to
    every STRUCT member, walked in lockstep with the Iceberg type tree.
    List element / map key/value ids have no Spark metadata slot — the
    spec's ids for them exist only in the table schema (elements are not
    renamable, so id resolution is never needed there)."""
    from pyspark.sql import types as T

    if (
        isinstance(spark_dt, T.StructType)
        and isinstance(ice_t, dict)
        and ice_t.get("type") == "struct"
    ):
        by = {f["name"]: f for f in ice_t.get("fields", [])}
        out = []
        for f in spark_dt.fields:
            e = by.get(f.name)
            md = (
                {"parquet.field.id": e["id"]}
                if e is not None and "id" in e
                else {}
            )
            out.append(
                T.StructField(
                    f.name,
                    _with_nested_field_ids(
                        f.dataType, e.get("type") if e else None
                    ),
                    f.nullable,
                    metadata=md,
                )
            )
        return T.StructType(out)
    if (
        isinstance(spark_dt, T.ArrayType)
        and isinstance(ice_t, dict)
        and ice_t.get("type") == "list"
    ):
        return T.ArrayType(
            _with_nested_field_ids(spark_dt.elementType, ice_t.get("element")),
            spark_dt.containsNull,
        )
    if (
        isinstance(spark_dt, T.MapType)
        and isinstance(ice_t, dict)
        and ice_t.get("type") == "map"
    ):
        return T.MapType(
            _with_nested_field_ids(spark_dt.keyType, ice_t.get("key")),
            _with_nested_field_ids(spark_dt.valueType, ice_t.get("value")),
            spark_dt.valueContainsNull,
        )
    return spark_dt


def _stamp_field_ids(df: DataFrame, ice_fields: list[dict]) -> DataFrame:
    """Stamp every data column's FIELD ID into the parquet footers
    (Spark's fieldId.write, default on) — the spec requires it and the
    reader's rename-safe resolution depends on it. Flat schemas keep the
    round-5 alias-metadata path (byte-identical output); schemas with
    nested columns go through ``df.to(...)`` so STRUCT MEMBER ids land in
    the footers too (round 13 — what makes inner-field renames
    resolvable)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    by = {f["name"]: f for f in ice_fields}
    if not any(isinstance(f.get("type"), dict) for f in ice_fields):
        return df.select(
            *[
                F.col(c).alias(
                    c, metadata={"parquet.field.id": by[c]["id"]}
                )
                if c in by and "id" in by[c]
                else F.col(c)
                for c in df.columns
            ]
        )
    fields = []
    for f in df.schema.fields:
        e = by.get(f.name)
        md = {"parquet.field.id": e["id"]} if e and "id" in e else {}
        fields.append(
            T.StructField(
                f.name,
                _with_nested_field_ids(
                    f.dataType, e.get("type") if e else None
                ),
                f.nullable,
                metadata=md,
            )
        )
    return df.to(T.StructType(fields))


def _max_field_id(fields: list[dict]) -> int:
    """Max field id across a schema INCLUDING nested struct member /
    element / key / value ids — the number last-column-id must cover
    (a foreign writer draws fresh ids from it; missing a nested id
    means a later add collides with a live nested field)."""

    def _of_type(t) -> int:
        if not isinstance(t, dict):
            return 0
        kind = t.get("type")
        if kind == "list":
            return max(t.get("element-id") or 0, _of_type(t.get("element")))
        if kind == "map":
            return max(
                t.get("key-id") or 0,
                t.get("value-id") or 0,
                _of_type(t.get("key")),
                _of_type(t.get("value")),
            )
        if kind == "struct":
            return max(
                (
                    max(f.get("id") or 0, _of_type(f.get("type")))
                    for f in t.get("fields", [])
                ),
                default=0,
            )
        return 0

    return max(
        (
            max(f.get("id") or 0, _of_type(f.get("type")))
            for f in fields
        ),
        default=0,
    )


def _default_json(ice_type: str, v):
    """Python value -> the spec's JSON single-value serialization
    (spec §Appendix D: JSON single-value serialization) for storage in a
    field's ``initial-default`` / ``write-default``. Fail-loud on types
    outside the primitive mapping — a default this module cannot later
    parse must never be written."""
    import datetime as _dt
    import decimal as _decimal

    if v is None:
        raise ValueError("column default cannot be null (omit it instead)")
    t = (ice_type or "").strip()
    if t == "boolean":
        if not isinstance(v, bool):
            raise ValueError(f"boolean default must be a bool, got {v!r}")
        return v
    if t in ("int", "long"):
        if not isinstance(v, int) or isinstance(v, bool):
            raise ValueError(f"{t} default must be an int, got {v!r}")
        return v
    if t in ("float", "double"):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(f"{t} default must be numeric, got {v!r}")
        import math as _math

        if not _math.isfinite(float(v)):
            # json.dumps would emit NaN/Infinity tokens, which RFC 8259
            # forbids and the spec's single-value serialization (Appendix
            # D) has no representation for — foreign readers would reject
            # the metadata file outright
            raise ValueError(
                f"{t} default must be finite, got {v!r} (the spec's JSON "
                "single-value serialization cannot represent NaN/Infinity)"
            )
        return float(v)
    if t == "string":
        if not isinstance(v, str):
            raise ValueError(f"string default must be a str, got {v!r}")
        return v
    if t == "date":
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return v.isoformat()
        if isinstance(v, str):
            _dt.date.fromisoformat(v)
            return v
        raise ValueError(f"date default must be a date or ISO str, got {v!r}")
    if t in ("timestamp", "timestamptz"):
        if isinstance(v, _dt.datetime):
            if t == "timestamptz":
                if v.tzinfo is None:
                    raise ValueError(
                        "timestamptz default must be timezone-aware"
                    )
                v = v.astimezone(_dt.timezone.utc)
                return v.isoformat()
            if v.tzinfo is not None:
                raise ValueError("timestamp (ntz) default must be naive")
            return v.isoformat()
        if isinstance(v, str):
            _dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
            return v
        raise ValueError(
            f"{t} default must be a datetime or ISO str, got {v!r}"
        )
    if re.fullmatch(r"decimal\(\d+,\s*\d+\)", t):
        return str(_decimal.Decimal(str(v)))
    if t == "binary" or t.startswith("fixed"):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex().upper()
        if isinstance(v, str):
            bytes.fromhex(v)
            return v.upper()
        raise ValueError(f"{t} default must be bytes or hex str, got {v!r}")
    raise NotImplementedError(
        f"column default on iceberg type {ice_type!r} is outside this "
        "module's primitive mapping"
    )


def _default_parse(ice_type, j, name=None):
    """JSON single-value -> python value (the inverse of
    :func:`_default_json`), typed for ``F.lit(...).cast(declared)``.
    Raises with the field name on anything outside the primitive
    mapping, so `_load_metadata` refuses a foreign table whose default
    this reader would otherwise silently mangle."""
    import datetime as _dt
    import decimal as _decimal

    ctx = f" (field {name!r})" if name else ""
    t = (ice_type or "") if isinstance(ice_type, str) else ""
    try:
        if t == "boolean":
            return bool(j)
        if t in ("int", "long"):
            return int(j)
        if t in ("float", "double"):
            return float(j)
        if t == "string":
            return str(j)
        if t == "date":
            return _dt.date.fromisoformat(j)
        if t == "timestamp":
            return _dt.datetime.fromisoformat(j)
        if t == "timestamptz":
            dt = _dt.datetime.fromisoformat(str(j).replace("Z", "+00:00"))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=_dt.timezone.utc)
            return dt.astimezone(_dt.timezone.utc)
        if re.fullmatch(r"decimal\(\d+,\s*\d+\)", t):
            return _decimal.Decimal(str(j))
        if t == "binary" or t.startswith("fixed"):
            return bytes.fromhex(str(j))
    except (ValueError, TypeError, _decimal.InvalidOperation) as e:
        raise ValueError(
            f"unparseable column default {j!r} for iceberg type "
            f"{ice_type!r}{ctx}: {e}"
        ) from None
    raise NotImplementedError(
        f"column default on iceberg type {ice_type!r}{ctx} is outside "
        "this reader's primitive mapping"
    )


def _default_phys(ice_type, j):
    """JSON single-value -> the PHYSICAL encoding the rowfmt scan legs
    traffic in before their per-kind decode (days int for dates, micros
    for timestamps, UTC micros for timestamptz; everything else is
    already physical)."""
    import datetime as _dt

    def _micros(td: "_dt.timedelta") -> int:
        # integer arithmetic, NOT total_seconds()*1e6: the float form
        # loses sub-microsecond bits past ~2^53 µs (~1987 already) —
        # caught by the round-trip property test
        return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds

    v = _default_parse(ice_type, j)
    if ice_type == "date":
        return (v - _dt.date(1970, 1, 1)).days
    if ice_type == "timestamp":
        return _micros(v - _dt.datetime(1970, 1, 1))
    if ice_type == "timestamptz":
        return _micros(v - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc))
    return v


def _schema_defaults(meta: dict) -> dict[int, tuple[str, str, object]]:
    """``field-id -> (name, ice_type, initial-default JSON)`` for every
    CURRENT-schema field carrying an ``initial-default`` (spec §Default
    values, v3): the constant a scan must surface for rows in data files
    written before the field existed. Values are validated here
    (``_default_parse``) so every consumer fails loudly on a default
    outside the primitive mapping instead of surfacing null."""
    out: dict[int, tuple[str, str, object]] = {}
    for f in _current_schema(meta).get("fields", []):
        if f.get("initial-default") is not None:
            _default_parse(f.get("type"), f["initial-default"], f.get("name"))
            out[f["id"]] = (f["name"], f.get("type"), f["initial-default"])
    return out


def _ancestry_chain(meta: dict) -> list[dict]:
    """The CURRENT snapshot's ancestry, root first — the main-line
    commit sequence. Walking ``meta['snapshots']`` sorted by
    (sequence-number, id) is wrong twice over: WAP leaves staged
    non-ancestor snapshots in the list (their files were never
    published), and foreign v1 tables may allocate arbitrary snapshot
    ids with no sequence numbers — only the parent-snapshot-id chain is
    authoritative commit order."""
    by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    cur = meta.get("current-snapshot-id")
    chain: list[dict] = []
    seen: set[int] = set()
    while cur is not None and cur != -1 and cur in by_id:
        if cur in seen:
            raise ValueError(
                f"snapshot ancestry cycle at {cur} — corrupt metadata"
            )
        seen.add(cur)
        snap = by_id[cur]
        chain.append(snap)
        cur = snap.get("parent-snapshot-id")
    chain.reverse()
    return chain


def _table_name_mapping(meta: dict) -> dict[int, list[str]]:
    """Parsed ``schema.name-mapping.default`` (spec §Name Mapping
    Serialization): field-id -> candidate physical names, the escape
    hatch for resolving data files WITHOUT field ids (Hive migrations,
    foreign writers). Flat fields only — a nested entry refuses, this
    module's whole schema surface is flat. Entries without a field-id
    are legal per spec (explicitly unmapped names) and skip."""
    raw = (meta.get("properties") or {}).get("schema.name-mapping.default")
    if not raw:
        return {}
    out: dict[int, list[str]] = {}
    for e in json.loads(raw):
        if e.get("fields"):
            raise NotImplementedError(
                "nested name-mapping entries are outside this module's "
                "flat schema surface"
            )
        fid = e.get("field-id")
        if fid is None:
            continue
        out[int(fid)] = [str(n) for n in (e.get("names") or [])]
    return out


def set_iceberg_name_mapping(path: str) -> int:
    """Stamp (or refresh) ``schema.name-mapping.default`` from the
    CURRENT schema — the migration-prep step real engines' snapshot/
    migrate procedures perform so field-id-less files (Hive layouts,
    plain ``spark.write.parquet`` output) resolve by mapped name instead
    of silently null-filling after a rename. Each field's candidate
    list MERGES its current name into any existing entry (old names
    persist, so files written under pre-rename names keep resolving).
    Metadata-only commit; returns the new metadata version."""
    meta = _load_metadata(path)
    cur = _current_schema(meta)
    existing = _table_name_mapping(meta)
    entries = []
    for f in cur.get("fields", []):
        names = list(dict.fromkeys(existing.get(f["id"], []) + [f["name"]]))
        entries.append({"field-id": f["id"], "names": names})
    props = dict(meta.get("properties") or {})
    props["schema.name-mapping.default"] = json.dumps(entries)
    meta["properties"] = props
    return _swap_metadata(path, meta)


def _declared_spark_schema(meta: dict):
    """The table's CURRENT schema as a Spark StructType — struct/list/map
    included (round 13) — or None when it contains a type this mapping
    doesn't cover (v3-only variant/geometry, ...): callers fall back to
    parquet inference then. Reading with the declared schema is what
    makes SCHEMA EVOLUTION work: files written before a column was added
    backfill null instead of the scan adopting whichever file's schema
    comes first."""
    sid = meta.get("current-schema-id", 0)
    schema = next(
        (s for s in meta.get("schemas", []) if s.get("schema-id") == sid),
        meta.get("schema"),
    )
    if not schema:
        return None
    fields = []
    for f in schema.get("fields", []):
        spark_t = _ice_type_to_spark_json(f.get("type"))
        if spark_t is None:
            return None
        fields.append(
            {
                "name": f["name"],
                "type": spark_t,
                "nullable": not f.get("required", False),
                "metadata": {},
            }
        )
    from pyspark.sql.types import StructType

    return StructType.fromJson({"type": "struct", "fields": fields})


def _decoded_meta_path(paths: "list[str] | None" = None):
    """``_metadata.file_path`` as the RAW on-disk path: the column arrives
    percent-ENCODED (Spark's own Hive escaping writes literal '%' into
    special-char partition dir names, which the URI then double-encodes as
    %25, so ONE decode always restores the exact bytes). ``url_decode`` is
    form-decoding — a bare '+' would become a space — so literal plus
    signs are pre-protected. Joining the raw column against driver-built
    on-disk paths instead silently matches NOTHING on special-char
    partition values. ``paths``: when the caller holds the scanned file
    set and every path is URI-clean (unreserved chars only), encoding is
    the identity and the raw column is returned — the common hot path
    skips the per-row regexp+decode."""
    from pyspark.sql import functions as F

    from .lakehouse import _URI_CLEAN

    if paths is not None and all(_URI_CLEAN.match(p) for p in paths):
        return F.col("_metadata.file_path")
    return F.url_decode(
        F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
    )


def _localize_decoded(raw: str, table_root: str) -> str:
    """_localize, then percent-decode when the literal path is absent on
    disk: position-delete content written from ``_metadata.file_path``
    arrives URI-encoded, while manifests (and the cross-format converter)
    record raw on-disk bytes — this resolves either form to the on-disk
    path that ``_decoded_meta_path`` tags scans with."""
    loc = _localize(raw, table_root)
    if not os.path.exists(loc):
        from urllib.parse import unquote

        dec = unquote(loc)
        if os.path.exists(dec):
            return dec
    return loc


def _apply_position_deletes(
    spark: SparkSession,
    table_root: str,
    df: DataFrame,
    delete_files: list[str],
    data_paths: "list[str] | None" = None,
) -> DataFrame:
    """Mask rows named by POSITION DELETE files (spec: parquet of
    (file_path, pos) pairs): anti-join the scan's hidden `_metadata`
    file/row identity against the delete entries.

    The delete parquets are read driver-side with pyarrow because their
    file_path column stores the WRITER's URIs — each distinct path is
    re-rooted through _localize so a relocated table still masks
    correctly, then normalized to the `file:<abs>` form Spark's
    _metadata.file_path reports. Delete files are metadata-sized (they
    name dead rows, not carry them); the positions side is explicitly
    broadcast so the data scan stays a JVM-side anti-join."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    tagged = df.withColumn("_fp", _decoded_meta_path(data_paths)).withColumn(
        "_ri", F.col("_metadata.row_index")
    )
    return _join_out_positions(spark, table_root, tagged, delete_files).drop(
        "_fp", "_ri"
    )


def _field_id_map(meta: dict) -> dict[int, str]:
    """Field id -> column name from the current schema (equality delete
    files reference columns by FIELD ID, which survives renames)."""
    sid = meta.get("current-schema-id", 0)
    schema = None
    for s in meta.get("schemas", []):
        if s.get("schema-id") == sid:
            schema = s
            break
    schema = schema or meta.get("schema") or {}
    return {
        f["id"]: f["name"] for f in schema.get("fields", []) if "id" in f
    }


def _delete_files_by_fmt(delete_files: list[str]) -> dict[str, list[str]]:
    """{'parquet'|'avro'|'orc': paths} by container magic — 4 driver-side
    bytes per delete file, O(#delete files). Position deletes are
    format-agnostic in the spec: Flink's classic default emits Avro,
    Hive/Trino ORC writers emit ORC, ours are parquet."""
    out: dict[str, list[str]] = {
        "parquet": [], "avro": [], "orc": [], "puffin": [],
    }
    for f in delete_files:
        with open(f, "rb") as fh:
            magic = fh.read(4)
        if magic == b"Obj\x01":
            out["avro"].append(f)
        elif magic[:3] == b"ORC":
            out["orc"].append(f)
        elif magic == b"PFA1":
            # v3 DELETION VECTORS: puffin container of per-data-file
            # roaring bitmaps (deletion-vector-v1 blobs)
            out["puffin"].append(f)
        else:
            out["parquet"].append(f)
    return out


def _read_pos_delete_pairs(spark: SparkSession, delete_files: list[str]):
    """(file_path, pos) rows of position-delete files, DISTRIBUTED —
    parquet via the native scan, Avro containers via avro_lite and ORC
    via pyarrow.orc, both inside mapInPandas (one task per path batch;
    the pairs never hit the driver). Mixed sets union."""
    by_fmt = _delete_files_by_fmt(delete_files)
    parts = []
    if by_fmt["parquet"]:
        # explicit schema: position-delete files carry the spec-fixed
        # (file_path string, pos long) pair, so schema inference — a
        # footer-reading driver job per MoR read — measures nothing
        parts.append(
            spark.read.schema("file_path string, pos bigint")
            .parquet(*by_fmt["parquet"])
            .select("file_path", "pos")
        )

    def _mapped(paths, batches_fn):
        return (
            local_rows_df(spark, [(p,) for p in paths], "path string")
            .repartition(min(len(paths), 64))
            .mapInPandas(batches_fn, "file_path string, pos long")
        )

    if by_fmt["avro"]:

        def _avro_batches(it):
            import pandas as _pd

            from feature_store_ml_spark.io import avro_lite as _avro

            for pdf in it:
                for p in pdf["path"]:
                    # flat (file_path, pos) schema — take the columnar
                    # decode (vectorized for sidecar files, compiled
                    # scan otherwise); row decode only for exotic
                    # foreign shapes
                    try:
                        _sch, cols_, _n = _avro.read_container_columnar(p)
                        fp, fp_null = cols_["file_path"]
                        pos, pos_null = cols_["pos"]
                        if fp_null.any() or pos_null.any():
                            raise ValueError("null in position-delete row")
                        yield _pd.DataFrame(
                            {"file_path": fp, "pos": pos}
                        )
                    except (ValueError, KeyError):
                        rows = _avro.read_container(p)
                        yield _pd.DataFrame(
                            {
                                "file_path": [
                                    str(r["file_path"]) for r in rows
                                ],
                                "pos": [int(r["pos"]) for r in rows],
                            }
                        )

        parts.append(_mapped(by_fmt["avro"], _avro_batches))
    if by_fmt["orc"]:

        def _orc_batches(it):
            import pyarrow.orc as _orc

            for pdf in it:
                for p in pdf["path"]:
                    t = _orc.ORCFile(p).read(columns=["file_path", "pos"])
                    yield t.to_pandas()

        parts.append(_mapped(by_fmt["orc"], _orc_batches))
    if by_fmt["puffin"]:

        def _puffin_batches(it):
            import pandas as _pd

            from feature_store_ml_spark.io import puffin as _puf
            from feature_store_ml_spark.io import roaring as _roar

            for pdf in it:
                for p in pdf["path"]:
                    fps: list[str] = []
                    poss: list[int] = []
                    blobs, _props = _puf.read_puffin(p)
                    for b in blobs:
                        if b.get("type") != _puf.BLOB_TYPE_DV:
                            continue
                        ref = (b.get("properties") or {}).get(
                            "referenced-data-file"
                        )
                        if not ref:
                            raise ValueError(
                                f"{p}: deletion-vector blob without "
                                "referenced-data-file property"
                            )
                        positions = _roar.deserialize_positions(
                            _roar.read_dv_blob(b["payload"], 0, None)
                        )
                        fps.extend([ref] * len(positions))
                        poss.extend(positions)
                    yield _pd.DataFrame({"file_path": fps, "pos": poss})

        parts.append(_mapped(by_fmt["puffin"], _puffin_batches))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_eq_delete_keys(
    spark: SparkSession,
    dfile: str,
    cols: list[str],
    fids: list[int],
    schema,
    prefix: str = "_eq_",
):
    """DISTINCT key tuples of one EQUALITY-delete file, columns aliased
    ``{prefix}{logical_name}`` and typed like the data scan (``schema`` =
    the scan's StructType). Parquet scans natively; AVRO/ORC eq-delete
    files (foreign upsert writers — Flink CDC emits Avro) decode
    DISTRIBUTED inside mapInPandas (round 11 — the rows never hit the
    driver, so there is no size bound), resolving columns by FIELD ID
    from the file's own schema (rename-safe) with a fail-loud name
    fallback. AVRO logical types arrive physical (days ints / micros
    longs) and convert per the declared column type; ORC arrives typed.

    The returned frame carries a BROADCAST hint when the file's
    record count (container metadata, no data read) is at most
    ``_EQ_BROADCAST_MAX_KEYS`` — the common CDC case, keeping the
    data side shuffle-free; a jumbo key set is left unhinted so the
    anti-join shuffles both sides on the key columns instead of
    OOMing the executors with a giant broadcast table."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    with open(dfile, "rb") as fh:
        magic = fh.read(4)
    if magic != b"Obj\x01" and magic[:3] != b"ORC":
        keys = (
            spark.read.parquet(dfile)
            .select(*[F.col(c).alias(f"{prefix}{c}") for c in cols])
            .distinct()
        )
        return _hint_eq_keys(keys, dfile, magic)
    if schema is None:
        raise NotImplementedError(
            f"{dfile}: non-parquet equality-delete files need a declared "
            "table schema to type their keys"
        )
    dtypes = {c: schema[c].dataType for c in cols}
    out_schema = StructType(
        [StructField(f"{prefix}{c}", dtypes[c], True) for c in cols]
    )
    kind = "avro" if magic == b"Obj\x01" else "orc"
    #: per-column conversion tag shipped to the executor (DataType objects
    #: pickle fine, but tags keep the closure tiny and version-proof)
    tags = [_eq_type_tag(dtypes[c]) for c in cols]
    cols_l, fids_l, prefix_l = list(cols), list(fids), prefix

    def _decode(it):
        import datetime as _dt

        import pandas as _pd

        def _typed_list(vals, tag):
            if tag == "date":
                return [
                    None
                    if v is None
                    else _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
                    for v in vals
                ]
            if tag == "ts":
                return [
                    None
                    if v is None
                    else (
                        v.to_pydatetime()
                        if hasattr(v, "to_pydatetime")
                        else _dt.datetime(1970, 1, 1)
                        + _dt.timedelta(microseconds=int(v))
                    )
                    for v in vals
                ]
            if tag == "tstz":
                return [
                    None
                    if v is None
                    else (
                        v.to_pydatetime()
                        if hasattr(v, "to_pydatetime")
                        else _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                        + _dt.timedelta(microseconds=int(v))
                    )
                    for v in vals
                ]
            return list(vals)

        for pdf in it:
            for p in pdf["path"]:
                if kind == "avro":
                    from feature_store_ml_spark.io import avro_lite as _avro

                    wschema, rows = _avro.read_container_with_schema(p)
                    name_by_fid = {
                        f["field-id"]: f["name"]
                        for f in (wschema.get("fields") or [])
                        if isinstance(f.get("field-id"), int)
                    }

                    def _get(r, c, fid):
                        if fid in name_by_fid:
                            return r.get(name_by_fid[fid])
                        if c in r:
                            return r[c]
                        raise ValueError(
                            f"{p}: equality-delete column {c!r} (field id "
                            f"{fid}) absent from the AVRO file"
                        )

                    raw = {
                        c: [_get(r, c, fid) for r in rows]
                        for c, fid in zip(cols_l, fids_l)
                    }
                else:
                    import pyarrow.orc as _pa_orc

                    tbl = _pa_orc.ORCFile(p).read()
                    name_by_fid = {}
                    for fld in tbl.schema:
                        raw_id = (fld.metadata or {}).get(b"iceberg.id")
                        if raw_id is not None:
                            name_by_fid[int(raw_id)] = fld.name

                    def _col(c, fid):
                        if fid in name_by_fid:
                            return tbl[name_by_fid[fid]]
                        if c in tbl.schema.names:
                            return tbl[c]
                        raise ValueError(
                            f"{p}: equality-delete column {c!r} (field id "
                            f"{fid}) absent from the ORC file"
                        )

                    raw = {
                        c: _col(c, fid).to_pylist()
                        for c, fid in zip(cols_l, fids_l)
                    }
                yield _pd.DataFrame(
                    {
                        f"{prefix_l}{c}": _pd.Series(
                            _typed_list(raw[c], tag), dtype=object
                        )
                        for c, tag in zip(cols_l, tags)
                    },
                    columns=[f"{prefix_l}{c}" for c in cols_l],
                )

    keys = (
        local_rows_df(spark, 
            [(os.path.abspath(dfile),)], "path string"
        )
        .mapInPandas(_decode, out_schema)
        .distinct()
    )
    return _hint_eq_keys(keys, dfile, magic)


#: broadcast an eq-delete key set only below this many records — above
#: it the anti-join shuffles both sides on the key columns instead
_EQ_BROADCAST_MAX_KEYS = 4_000_000


def _eq_type_tag(t) -> str | None:
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if isinstance(t, DateType):
        return "date"
    if isinstance(t, TimestampNTZType):
        return "ts"
    if isinstance(t, TimestampType):
        return "tstz"
    return None


def _hint_eq_keys(keys, dfile: str, magic: bytes):
    """Attach a broadcast hint iff the delete file's record count (from
    container METADATA — avro block headers / ORC footer / parquet
    footer, no data read) is small enough to replicate. Consumers join
    the returned frame plainly; the strategy decision lives here, next
    to the decode."""
    from pyspark.sql import functions as F

    try:
        if magic == b"Obj\x01":
            n = avro_lite.count_container_records(dfile)
        elif magic[:3] == b"ORC":
            import pyarrow.orc as _pa_orc

            n = _pa_orc.ORCFile(dfile).nrows
        else:
            import pyarrow.parquet as _pq

            n = _pq.ParquetFile(dfile).metadata.num_rows
    except Exception:
        n = None  # unreadable metadata: err toward the shuffle join
    if n is not None and n <= _EQ_BROADCAST_MAX_KEYS:
        return F.broadcast(keys)
    return keys


def _join_out_positions(
    spark: SparkSession, table_root: str, tagged: DataFrame, delete_files: list[str]
) -> DataFrame:
    """Anti-join a scan already tagged with (_fp, _ri) against the
    position-delete pairs — DISTRIBUTED (round 6): the delete parquets are
    read by Spark, never collected, so a mass delete's position set costs
    the driver O(#distinct data files) path strings, not O(#deleted rows)
    pairs (the write side stopped collecting rows in the same round; the
    read side must not reintroduce the bottleneck).

    Path fix-up still happens on the driver, but only over the DISTINCT
    ``file_path`` values (bounded by the snapshot's file count — the same
    metadata the planner already holds): each writer-recorded URI is
    re-rooted through _localize and normalized to the ``file:<abs>`` form
    Spark's _metadata.file_path reports, then shipped back as a small
    broadcast mapping joined onto the delete rows. The positions side is
    left unhinted so AQE picks broadcast for small delete sets and a
    shuffle join for genuinely huge ones."""
    from pyspark.sql import functions as F

    import pyarrow.orc as _pa_orc
    import pyarrow.parquet as pq

    from . import puffin as _puf

    del_df = _read_pos_delete_pairs(spark, delete_files)
    _by = _delete_files_by_fmt(delete_files)
    #: puffin footers are read ONCE driver-side and serve both the
    #: distinct-path set and the cardinality sum below
    _puffin_blobs = {
        f: [
            b
            for b in _puf.read_puffin(f)[0]
            if b.get("type") == _puf.BLOB_TYPE_DV
        ]
        for f in _by["puffin"]
    }
    if not (_by["parquet"] or _by["avro"] or _by["orc"]):
        # ALL-puffin delete set (v3 DV tables): the referenced data file
        # of every DV blob is right in the puffin metadata the driver
        # already parses for cardinality — no Spark job needed for the
        # distinct-path mapping (formerly a distinct().collect() per
        # MoR read, 2-3 AQE stage-jobs each)
        refs = set()
        for f, blobs in _puffin_blobs.items():
            for b in blobs:
                ref = (b.get("properties") or {}).get(
                    "referenced-data-file"
                )
                if not ref:
                    raise ValueError(
                        f"{f}: deletion-vector blob without "
                        "referenced-data-file property"
                    )
                refs.add(ref)
        distinct_paths = sorted(refs)
    else:
        distinct_paths = [
            r["file_path"]
            for r in del_df.select("file_path").distinct().collect()
        ]
    if not distinct_paths:
        return tagged
    mapping = [
        (raw, "file:" + os.path.abspath(_localize_decoded(raw, table_root)))
        for raw in distinct_paths
    ]
    map_df = local_rows_df(spark, mapping, "_raw_fp string, _del_fp string")
    deleted = del_df.join(
        F.broadcast(map_df), del_df["file_path"] == F.col("_raw_fp")
    ).select("_del_fp", F.col("pos").alias("_del_pos"))
    # join strategy from the delete files' FOOTER row counts (O(#delete
    # files) driver metadata): small delete sets broadcast explicitly so
    # the data scan is never shuffled; mass deletes leave the choice to
    # AQE (shuffle join) rather than OOM a forced broadcast.
    total_rows = (
        sum(pq.ParquetFile(f).metadata.num_rows for f in _by["parquet"])
        + sum(avro_lite.count_container_records(f) for f in _by["avro"])
        + sum(_pa_orc.ORCFile(f).nrows for f in _by["orc"])
        + sum(
            int((b.get("properties") or {}).get("cardinality", 0))
            for blobs in _puffin_blobs.values()
            for b in blobs
        )
    )
    if total_rows <= 5_000_000:
        deleted = F.broadcast(deleted)
    return tagged.join(
        deleted,
        (F.col("_fp") == F.col("_del_fp")) & (F.col("_ri") == F.col("_del_pos")),
        "left_anti",
    )


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
    old, old_deletes = _snapshot_content(meta, from_snapshot_id, path)
    old = set(old)
    new, new_deletes = _snapshot_content(meta, to_id, path)
    gone = old - set(new)
    if gone:
        raise ValueError(
            f"{path}: {len(gone)} files live at snapshot {from_snapshot_id} "
            f"are gone at {to_id} — history rewritten; incremental read is "
            "ill-defined, re-read the full snapshot"
        )
    if set(new_deletes) != set(old_deletes):
        raise ValueError(
            f"{path}: position-delete files changed between snapshots "
            f"{from_snapshot_id} and {to_id} — rows were DELETED, the "
            "append-only incremental read is ill-defined; re-read the "
            "full snapshot"
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
        spark_fields = []
        for f in current["fields"]:
            t = _ice_type_to_spark_json(f["type"])
            if t is None:
                raise NotImplementedError(
                    f"{path}: unmappable iceberg type in empty-diff "
                    f"schema: {f['type']}"
                )
            spark_fields.append(
                {
                    "name": f["name"],
                    "type": t,
                    "nullable": not f.get("required", False),
                    "metadata": {},
                }
            )
        return local_rows_df(spark, 
            [], StructType.fromJson({"type": "struct", "fields": spark_fields})
        )
    # route non-parquet added files through the rowfmt readers (round 9)
    to_plan, _dels = _snapshot_scan_plan(meta, to_id, path)
    entry_by_path = {d["path"]: d for d in to_plan}
    rowfmt = {"AVRO": [], "ORC": []}
    pq_added = []
    for p in added:
        fmt = (entry_by_path.get(p, {}).get("format")) or "PARQUET"
        if fmt in rowfmt:
            rowfmt[fmt].append(entry_by_path[p])
        else:
            pq_added.append(p)
    if not (rowfmt["AVRO"] or rowfmt["ORC"]):
        return spark.read.parquet(*added)
    declared = _declared_spark_schema(meta)
    if declared is None:
        raise NotImplementedError(
            f"{path}: incremental read over non-parquet data files needs "
            "a declared schema"
        )
    parts = []
    if pq_added:
        # field-id grouping, same rename-safety as the main scan leg
        parts.append(_read_parquet_fid(spark, pq_added, declared, meta))
    if rowfmt["AVRO"]:
        parts.append(_read_avro_data(spark, rowfmt["AVRO"], declared, meta))
    if rowfmt["ORC"]:
        parts.append(_read_orc_data(spark, rowfmt["ORC"], declared, meta))
    out = parts[0]
    for g in parts[1:]:
        out = out.unionByName(g)
    return out


# ---------------------------------------------------------------- writer ----
# Append/create path: parquet data files + Avro manifest + manifest list +
# a new metadata.json version, all per the public table spec. Same division
# of labor as every Iceberg writer: executors write the data (distributed
# df.write.parquet), the driver writes O(#files) metadata.

#: spark simpleString -> iceberg primitive (spec §Schemas)
_SPARK_TO_ICEBERG = {
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}


def _iceberg_fields(df: DataFrame, variant_ok: bool = False) -> list[dict]:
    """Fresh-id Iceberg schema fields for a CREATE: top-level columns get
    ids 1..N (flat tables stay byte-identical with earlier rounds), then
    nested struct/list/map ids allocate from N+1 in field order,
    depth-first — every id unique across the tree (spec §Schemas).
    ``variant_ok`` is the registration-path escape (see _spark_dt_to_ice)."""
    import itertools as _it

    n = len(df.schema.fields)
    counter = _it.count(n + 1)

    def alloc() -> int:
        return next(counter)

    out = []
    for i, f in enumerate(df.schema.fields, start=1):
        try:
            ice_t = _spark_dt_to_ice(f.dataType, alloc, variant_ok=variant_ok)
        except NotImplementedError as exc:
            if "variant" in str(exc):
                raise  # the targeted read-only message, column context moot
            raise NotImplementedError(
                f"write_iceberg: spark type {f.dataType.simpleString()!r} "
                f"(column {f.name!r}) has no iceberg mapping in this writer"
            ) from None
        out.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": ice_t,
            }
        )
    return out


def _kv_map_schema(rec_name: str, value_type: str) -> dict:
    """Iceberg's Avro encoding of an int-keyed map (Avro maps only take
    string keys): array of {key, value} records, spec's k/v record names."""
    return {
        "type": "array",
        "items": {
            "type": "record",
            "name": rec_name,
            "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": value_type},
            ],
        },
    }


def _manifest_entry_schema(fv: int, partition_fields: list | None = None) -> dict:
    data_file_fields = [
        {"name": "file_path", "type": "string"},
        {"name": "file_format", "type": "string"},
        {
            "name": "partition",
            "type": {
                "type": "record",
                "name": "r102",
                "fields": list(partition_fields or []),
            },
        },
        {"name": "record_count", "type": "long"},
        {"name": "file_size_in_bytes", "type": "long"},
        # per-file column statistics (spec §Manifests fields 110/125/128),
        # the scan planner's FILE-SKIPPING input: null counts by field id,
        # and single-value-serialized (Appendix D) lower/upper bounds
        {"name": "null_value_counts", "type": ["null", _kv_map_schema("k117_v118", "long")]},
        {"name": "lower_bounds", "type": ["null", _kv_map_schema("k126_v127", "bytes")]},
        {"name": "upper_bounds", "type": ["null", _kv_map_schema("k129_v130", "bytes")]},
    ]
    if fv == 1:
        data_file_fields.append({"name": "block_size_in_bytes", "type": "long"})
    else:
        data_file_fields.insert(0, {"name": "content", "type": "int"})
        # field ids an EQUALITY delete file matches on (spec §Equality
        # Delete Files); null for data files and position deletes
        data_file_fields.append(
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int"}],
            }
        )
        # v3 row lineage (spec §Row Lineage, data_file field
        # `first_row_id`): id assigned to the file's first row at
        # commit; null until lineage is enabled (avro schema
        # resolution: readers of older manifests simply never see the
        # key, writers fill None for carried entries that predate it)
        data_file_fields.append(
            {"name": "first_row_id", "type": ["null", "long"]}
        )
    if fv >= 3:
        # v3 DELETION VECTORS (spec data_file fields 143-145): the
        # referenced data file, and where the DV blob lives inside the
        # puffin container; null on data files and equality deletes
        data_file_fields.extend(
            [
                {"name": "referenced_data_file", "type": ["null", "string"]},
                {"name": "content_offset", "type": ["null", "long"]},
                {"name": "content_size_in_bytes", "type": ["null", "long"]},
            ]
        )
    entry_fields = [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
    ]
    if fv >= 2:
        # spec §Manifests field 3: per-entry data sequence number —
        # null means INHERIT the manifest-list entry's (our writers
        # leave it null on ADDED entries); rewrite_manifests stamps it
        # EXPLICITLY on carried entries so consolidation across commits
        # preserves delete scoping (round 10)
        entry_fields.append(
            {"name": "sequence_number", "type": ["null", "long"]}
        )
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": entry_fields + [
            {
                "name": "data_file",
                "type": {"type": "record", "name": "r2", "fields": data_file_fields},
            },
        ],
    }


def _manifest_file_schema(fv: int) -> dict:
    fields = [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ]
    if fv >= 2:
        fields[3:3] = [
            {"name": "content", "type": "int"},
            {"name": "sequence_number", "type": "long"},
            {"name": "min_sequence_number", "type": "long"},
        ]
    return {"type": "record", "name": "manifest_file", "fields": fields}


# ---------------------------------------------------------------- row lineage
# Iceberg v3 ROW LINEAGE (spec §Row Lineage), the table-format twin of
# Delta's row tracking (io/lakehouse _commit_row_tracked): every row gets
# a STABLE id that survives DML rewrites. The id of a row is
#   coalesce(materialized `_row_id` column, file.first_row_id + position)
# and its last-modified stamp is
#   coalesce(materialized `_last_updated_sequence_number`, file data seq).
# Commits allocate `first_row_id` blocks to new data files from the
# table-level `next-row-id` counter (advanced by record_count per file —
# ids "wasted" on rows that carry a materialized value are never reused,
# per spec); rewrites that CARRY rows (UPDATE/MERGE replacements,
# compaction) materialize the surviving rows' ids as physical columns
# under the spec's reserved field ids, which is what makes lineage work
# on AVRO/ORC data files too — the rowfmt readers resolve the
# materialized columns by field id exactly like any other column.
# Enabled via write_iceberg(row_lineage=True) at creation or
# enable_iceberg_row_lineage() later; files from before enablement read
# a null _row_id (spec upgrade semantics).

_ROW_ID_COL = "_row_id"
_LAST_UPD_COL = "_last_updated_sequence_number"
#: reserved field ids, spec §Reserved field ids (v3 additions)
_ROW_ID_FID = 2147483540
_LAST_UPD_FID = 2147483539


def _lineage_field_dicts(cols: "list[str] | None" = None) -> list[dict]:
    """Iceberg field dicts for the lineage metadata columns (optional
    longs under reserved ids) — appended to schemas wherever the scan or
    the DML stagers must treat them as ordinary columns."""
    all_ = [
        {"id": _ROW_ID_FID, "name": _ROW_ID_COL, "required": False,
         "type": "long"},
        {"id": _LAST_UPD_FID, "name": _LAST_UPD_COL, "required": False,
         "type": "long"},
    ]
    if cols is None:
        return all_
    return [f for f in all_ if f["name"] in cols]


def _lineage_enabled(meta: dict) -> bool:
    return "next-row-id" in meta


def _lineage_meta(meta: dict) -> dict:
    """A shallow metadata copy whose CURRENT schema carries the lineage
    columns — handing this to the scan legs makes field-id resolution,
    null backfill and type decode treat `_row_id` /
    `_last_updated_sequence_number` like any declared column (files
    without them, or without the reserved ids, read null)."""
    sid = meta.get("current-schema-id", 0)
    out = dict(meta)
    out["schemas"] = [
        (
            {**s, "fields": list(s.get("fields", [])) + _lineage_field_dicts()}
            if s.get("schema-id") == sid
            else s
        )
        for s in meta.get("schemas", [])
    ]
    if meta.get("schema"):
        out["schema"] = {
            **meta["schema"],
            "fields": list(meta["schema"].get("fields", []))
            + _lineage_field_dicts(),
        }
    return out


def _assign_first_row_ids(next_rid: int, manifest_records: list[dict]) -> int:
    """Allocate `first_row_id` blocks to ADDED data-file records that
    don't already carry one (spec §Row Lineage assignment: the block is
    the file's record_count; carried entries keep theirs). Mutates the
    records in place; returns the advanced next-row-id."""
    for m in manifest_records:
        dfs = m.get("data_file") or {}
        if (dfs.get("content") or 0) != 0:
            continue
        if dfs.get("first_row_id") is not None:
            continue
        dfs["first_row_id"] = next_rid
        next_rid += int(dfs.get("record_count") or 0)
    return next_rid


#: iceberg primitive -> python parser for identity-partition dir values
def _parse_date_days(s: str) -> int:
    """Hive partition-dir date value ('2024-01-02') -> the days-from-epoch
    int the Iceberg spec stores in manifest partition tuples."""
    import datetime as _dt

    return (_dt.date.fromisoformat(s) - _dt.date(1970, 1, 1)).days


def _days_to_iso(v) -> str:
    """Inverse of _parse_date_days (manifest tuple -> ISO date string)."""
    import datetime as _dt

    return (_dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))).isoformat()


_PARTITION_PARSERS = {
    "int": int,
    "long": int,
    "string": str,
    "date": _parse_date_days,
}


def _avro_partition_type(t: str):
    """Avro schema type for one partition tuple field — date rides as the
    spec's int + date logical type."""
    return {"type": "int", "logicalType": "date"} if t == "date" else t


# ---------------------------------------------------------------------------
# partition transforms (spec §Partition Transforms + Appendix B)
# ---------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def murmur3_32_bytes(data: bytes) -> int:
    """32-bit Murmur3 (x86, seed 0) over arbitrary bytes — the reference
    implementation both JVM expression forms are verified against.
    Matches the spec's published vectors: the 8-byte LE form of 34 hashes
    to 2017239379; UTF-8 'iceberg' hashes to 1210000089."""
    import struct

    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = 0

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _M32

    nblocks = len(data) // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & _M32
        k = rotl(k, 15)
        k = (k * c2) & _M32
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4:]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & _M32
        k = rotl(k, 15)
        k = (k * c2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def murmur3_32_long(v: int) -> int:
    """Murmur3 of a long's 8-byte little-endian serialization — the form
    int, long, date, time and timestamp all bucket through (Appendix B)."""
    import struct

    return murmur3_32_bytes(struct.pack("<Q", v & 0xFFFFFFFFFFFFFFFF))


def murmur3_32_string(s: str) -> int:
    """Murmur3 of a string's UTF-8 bytes (Appendix B's string form)."""
    return murmur3_32_bytes(s.encode("utf-8"))


def _murmur3_long_col(col):
    """The SAME hash as ``murmur3_32_long`` but as a Spark COLUMN — JVM
    evaluation, no Python in the write path. Each Murmur round references
    its state several times, so a naive chained-Column build duplicates
    the whole subtree per reference and the expression grows EXPONENTIALLY
    (big enough to trip janino's generated-class splitting). Instead the
    two 4-byte blocks fold through ``F.aggregate``, whose lambda variables
    are true let-bindings: state references are leaf nodes and the tree
    stays ~constant-size. The ``finish`` lambda hosts the final avalanche
    for the same reason."""
    from pyspark.sql import functions as F

    M = F.lit(_M32)

    def mul32(a, c):
        # 32-bit modular multiply that never exceeds 2^49 in a signed
        # 64-bit long (ANSI mode would raise on a full 32×32 product):
        # split `a` into 16-bit halves — a*c ≡ al*c + ((ah*c mod 2^16)<<16)
        al = a.bitwiseAND(F.lit(0xFFFF))
        ah = F.shiftright(a, 16)
        return (
            (al * F.lit(c))
            + F.shiftleft((ah * F.lit(c)).bitwiseAND(F.lit(0xFFFF)), 16)
        ).bitwiseAND(M)

    def rotl(a, r):
        # `a` is masked to [0, 2^32) in a 64-bit long, so the arithmetic
        # shiftright is equivalent to a logical one
        return (
            F.shiftleft(a, r).bitwiseOR(F.shiftright(a, 32 - r))
        ).bitwiseAND(M)

    v = col.cast("long")
    blocks = F.array(
        v.bitwiseAND(M), F.shiftright(v, 32).bitwiseAND(M)
    )

    def _round(h, k):
        k = mul32(k, 0xCC9E2D51)
        k = rotl(k, 15)
        k = mul32(k, 0x1B873593)
        h = h.bitwiseXOR(k)
        h = rotl(h, 13)
        return (mul32(h, 5) + F.lit(0xE6546B64)).bitwiseAND(M)

    def _avalanche(h):
        h = h.bitwiseXOR(F.lit(8))  # key length
        h = h.bitwiseXOR(F.shiftright(h, 16))
        h = mul32(h, 0x85EBCA6B)
        h = h.bitwiseXOR(F.shiftright(h, 13))
        h = mul32(h, 0xC2B2AE35)
        return h.bitwiseXOR(F.shiftright(h, 16))

    return F.aggregate(blocks, F.lit(0).cast("long"), _round, _avalanche)


def _murmur3_string_col(col):
    """Murmur3 of a string's UTF-8 bytes as a Spark COLUMN — the
    VARIABLE-length hash, still entirely JVM-side: the value is hex-encoded
    (two chars per byte), 4-byte blocks fold through ``F.aggregate``
    (lambda let-bindings keep the tree constant-size, as in the long
    form), and the 0–3 tail bytes + length-xor + avalanche run in the
    finish lambda with conditionals. Byte extraction is
    ``conv(substr(hex, 2i+1, 2), 16, 10)`` — string surgery the codegen
    handles fine. NULL hashes to NULL (transform(null) = null partition)."""
    from pyspark.sql import functions as F

    M = F.lit(_M32)

    def mul32(a, c):
        al = a.bitwiseAND(F.lit(0xFFFF))
        ah = F.shiftright(a, 16)
        return (
            (al * F.lit(c))
            + F.shiftleft((ah * F.lit(c)).bitwiseAND(F.lit(0xFFFF)), 16)
        ).bitwiseAND(M)

    def rotl(a, r):
        return (
            F.shiftleft(a, r).bitwiseOR(F.shiftright(a, 32 - r))
        ).bitwiseAND(M)

    hexs = F.hex(F.encode(col, "UTF-8"))
    nbytes = (F.length(hexs) / F.lit(2)).cast("long")
    nblocks = F.floor(nbytes / F.lit(4)).cast("long")

    def byte_at(i):
        # i: 0-based byte index (Column) -> that byte's value as a long
        return F.conv(
            hexs.substr((i * F.lit(2) + F.lit(1)).cast("int"), F.lit(2)), 16, 10
        ).cast("long")

    def _round(h, j):
        base = j * F.lit(4)
        k = (
            byte_at(base)
            + F.shiftleft(byte_at(base + F.lit(1)), 8)
            + F.shiftleft(byte_at(base + F.lit(2)), 16)
            + F.shiftleft(byte_at(base + F.lit(3)), 24)
        )
        k = mul32(k, 0xCC9E2D51)
        k = rotl(k, 15)
        k = mul32(k, 0x1B873593)
        h = h.bitwiseXOR(k)
        h = rotl(h, 13)
        return (mul32(h, 5) + F.lit(0xE6546B64)).bitwiseAND(M)

    def _finish(h):
        t = nbytes - nblocks * F.lit(4)  # 0..3 tail bytes
        tb = nblocks * F.lit(4)
        k1 = (
            F.when(t > 0, byte_at(tb)).otherwise(F.lit(0))
            + F.when(t > 1, F.shiftleft(byte_at(tb + F.lit(1)), 8)).otherwise(F.lit(0))
            + F.when(t > 2, F.shiftleft(byte_at(tb + F.lit(2)), 16)).otherwise(F.lit(0))
        )
        k1 = mul32(k1, 0xCC9E2D51)
        k1 = rotl(k1, 15)
        k1 = mul32(k1, 0x1B873593)
        h = F.when(t > 0, h.bitwiseXOR(k1)).otherwise(h)
        h = h.bitwiseXOR(nbytes)
        h = h.bitwiseXOR(F.shiftright(h, 16))
        h = mul32(h, 0x85EBCA6B)
        h = h.bitwiseXOR(F.shiftright(h, 13))
        h = mul32(h, 0xC2B2AE35)
        return h.bitwiseXOR(F.shiftright(h, 16))

    blocks = F.when(
        nblocks > 0,
        F.sequence(F.lit(0).cast("long"), nblocks - F.lit(1)),
    ).otherwise(F.array().cast("array<long>"))
    return F.aggregate(blocks, F.lit(0).cast("long"), _round, _finish)


#: source iceberg types each transform accepts
_TIME_TRANSFORM_SOURCES = {"date", "timestamp", "timestamptz"}
_BUCKET_SOURCES = {"int", "long", "date", "timestamp", "timestamptz", "string"}
_TRUNCATE_SOURCES = {"int", "long", "string"}

def parse_partition_field(spec: str) -> dict:
    """Parse one partition-spec string — ``col``, ``identity(col)``,
    ``year(col)``, ``month(col)``, ``day(col)``, ``hour(col)``,
    ``bucket(N, col)``, ``truncate(W, col)`` — into
    {transform, source, param, name}. Names follow Iceberg's conventions
    (``col_day``, ``col_bucket``, ``col_trunc``...)."""
    import re

    s = spec.strip()
    m = re.fullmatch(r"([A-Za-z_][\w]*)", s)
    if m:
        return {"transform": "identity", "source": s, "param": None, "name": s}
    m = re.fullmatch(r"(identity|year|month|day|hour)\s*\(\s*([\w]+)\s*\)", s)
    if m:
        t, col = m.group(1), m.group(2)
        name = col if t == "identity" else f"{col}_{t}"
        return {"transform": t, "source": col, "param": None, "name": name}
    m = re.fullmatch(r"(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([\w]+)\s*\)", s)
    if m:
        t, n, col = m.group(1), int(m.group(2)), m.group(3)
        if n <= 0:
            raise ValueError(f"partition transform {s!r}: width/count must be > 0")
        return {
            "transform": t,
            "source": col,
            "param": n,
            "name": f"{col}_{'bucket' if t == 'bucket' else 'trunc'}",
        }
    raise ValueError(
        f"unparseable partition field {spec!r} — expected col, identity(col), "
        "year/month/day/hour(col), bucket(N, col) or truncate(W, col)"
    )


def _transform_spec_name(f: dict) -> str:
    """The transform string recorded in table metadata (spec JSON form:
    ``bucket[16]``, ``truncate[4]``, ``day``...)."""
    if f["transform"] in ("bucket", "truncate"):
        return f"{f['transform']}[{f['param']}]"
    return f["transform"]


def _parse_transform_spec_name(s: str) -> tuple[str, int | None]:
    """Inverse of _transform_spec_name: 'bucket[16]' -> ('bucket', 16)."""
    import re

    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", s)
    if m:
        return m.group(1), int(m.group(2))
    return s, None


def _derive_partition_col(f: dict, ice_source_type: str):
    """The Spark COLUMN deriving a partition value from its source column
    — all JVM-side expressions (codegen), no Python in the write path.
    Returns (column, result_iceberg_type)."""
    from pyspark.sql import functions as F

    t, col, p = f["transform"], F.col(f["source"]), f["param"]
    if t == "identity":
        if ice_source_type not in _PARTITION_PARSERS:
            raise NotImplementedError(
                f"identity partition source type {ice_source_type!r} "
                "unsupported (int/long/string/date only)"
            )
        return col, ice_source_type
    if t in ("year", "month", "day", "hour"):
        if ice_source_type not in _TIME_TRANSFORM_SOURCES:
            raise ValueError(
                f"{t}() needs a date/timestamp source, got {ice_source_type!r}"
            )
        if ice_source_type == "timestamptz":
            # spec: timestamptz transforms bucket the UTC INSTANT. Spark's
            # calendar functions (year/month/to_date) render in the
            # SESSION timezone — wrong outside UTC — so derive from
            # unix_micros (timezone-independent) and do calendar math on
            # the UTC date
            micros = F.unix_micros(col)
            days = F.floor(micros / F.lit(86_400_000_000))
            utc_date = F.date_add(F.lit("1970-01-01").cast("date"), days.cast("int"))
            if t == "hour":
                return F.floor(micros / F.lit(3_600_000_000)).cast("int"), "int"
            cal = utc_date
        else:
            # date and timestamp_ntz are wall-clock values: Spark's
            # calendar functions on them are timezone-independent
            if t == "hour":
                if ice_source_type == "date":
                    raise ValueError("hour() needs a timestamp source, not date")
                days = F.datediff(
                    F.to_date(col), F.lit("1970-01-01").cast("date")
                ).cast("long")
                return (days * F.lit(24) + F.hour(col)).cast("int"), "int"
            cal = F.to_date(col)
        if t == "year":
            return (F.year(cal) - F.lit(1970)).cast("int"), "int"
        if t == "month":
            return (
                (F.year(cal) - F.lit(1970)) * F.lit(12) + F.month(cal) - F.lit(1)
            ).cast("int"), "int"
        return F.datediff(cal, F.lit("1970-01-01").cast("date")).cast("int"), "int"
    if t == "bucket":
        if ice_source_type not in _BUCKET_SOURCES:
            raise NotImplementedError(
                f"bucket() over {ice_source_type!r} is not implemented"
            )
        if ice_source_type == "string":
            return F.pmod(
                _murmur3_string_col(col).bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(p)
            ).cast("int"), "int"
        if ice_source_type == "date":
            key = F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
        elif ice_source_type == "timestamptz":
            key = F.unix_micros(col)
        elif ice_source_type == "timestamp":
            # ntz buckets its WALL-CLOCK micros: calendar functions on an
            # ntz value are timezone-independent, and date_format SSSSSS
            # surfaces the microsecond fraction — no unix_* involved
            days = F.datediff(
                F.to_date(col), F.lit("1970-01-01").cast("date")
            ).cast("long")
            key = (
                days * F.lit(86_400)
                + F.hour(col) * F.lit(3_600)
                + F.minute(col) * F.lit(60)
                + F.second(col)
            ) * F.lit(1_000_000) + F.date_format(col, "SSSSSS").cast("long")
        else:
            key = col.cast("long")
        return F.pmod(
            _murmur3_long_col(key).bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(p)
        ).cast("int"), "int"
    if t == "truncate":
        if ice_source_type not in _TRUNCATE_SOURCES:
            raise NotImplementedError(
                f"truncate() over {ice_source_type!r} is not implemented"
            )
        if ice_source_type == "string":
            return F.substring(col, 1, p), "string"
        return (col - F.pmod(col, F.lit(p))).cast(
            "int" if ice_source_type == "int" else "long"
        ), ice_source_type
    raise ValueError(f"unknown transform {t!r}")

def _encode_bound(v, ice_type: str) -> bytes | None:
    """Binary single-value serialization (spec Appendix D) for manifest
    bounds. None when the (value, type) pair has no safe encoding — the
    entry simply omits that bound and skipping fails open."""
    import datetime as dt
    import math
    import struct

    if v is None:
        return None
    try:
        if ice_type == "int":
            return struct.pack("<i", v)
        if ice_type == "long":
            return struct.pack("<q", v)
        if ice_type == "float":
            return None if math.isnan(v) else struct.pack("<f", v)
        if ice_type == "double":
            return None if math.isnan(v) else struct.pack("<d", v)
        if ice_type == "boolean":
            return b"\x01" if v else b"\x00"
        if ice_type == "string":
            if not isinstance(v, str) or len(v) > 256:
                return None  # truncated string bounds need char-surgery; skip
            return v.encode("utf-8")
        if ice_type == "date":
            if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
                return struct.pack("<i", (v - dt.date(1970, 1, 1)).days)
            return None
        if ice_type in ("timestamp", "timestamptz"):
            if isinstance(v, dt.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
                delta = v - dt.datetime(1970, 1, 1)
                micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
                return struct.pack("<q", micros)
            return None
    except (struct.error, TypeError, OverflowError):
        return None
    return None


def _decode_bound(b: bytes, ice_type: str):
    """Inverse of _encode_bound; None when undecodable (fail open)."""
    import datetime as dt
    import struct

    if b is None:
        return None
    try:
        if ice_type == "int":
            return struct.unpack("<i", b)[0]
        if ice_type == "long":
            # a 4-byte buffer under a long column is a bound written
            # BEFORE the column was widened int -> long (widen_iceberg_
            # column never rewrites manifests); the narrow encoding is
            # unambiguous, and decoding it keeps data skipping alive on
            # widened columns instead of failing open
            if len(b) == 4:
                return struct.unpack("<i", b)[0]
            return struct.unpack("<q", b)[0]
        if ice_type == "float":
            return struct.unpack("<f", b)[0]
        if ice_type == "double":
            if len(b) == 4:  # pre-widening float bound, as above
                return struct.unpack("<f", b)[0]
            return struct.unpack("<d", b)[0]
        if ice_type == "boolean":
            return b != b"\x00"
        if ice_type == "string":
            return b.decode("utf-8")
        if ice_type == "date":
            return dt.date(1970, 1, 1) + dt.timedelta(days=struct.unpack("<i", b)[0])
        if ice_type in ("timestamp", "timestamptz"):
            return dt.datetime(1970, 1, 1) + dt.timedelta(
                microseconds=struct.unpack("<q", b)[0]
            )
    except (struct.error, ValueError, UnicodeDecodeError):
        return None
    return None


#: bytes of estimated input per partitioned-staging writer task. The
#: hash-distribute before a partitionBy write (write.distribution-mode=
#: hash, guide §6) needs enough tasks to parallelize writer setup and
#: the write bytes, and no more: a core-count fan-out (round 15) made
#: every tiny DML staging pay a `defaultParallelism`-task shuffle —
#: core-count-proportional by construction (the r15 driver bench ran
#: e1_iceberg_merge 2x slower at 32 cores than at 8). 1 MiB/task with a
#: floor of 4 keeps multi-value writer setup parallel (N=1 serializes
#: ~5 ms/file of writer open/commit; measured +0.5-0.7 s on the ~25-56
#: value lifecycle writes) while staying core-count-independent below
#: the slot cap. At scale the estimate exceeds the cap and this is
#: exactly the old slot-count fan-out.
_STAGE_FANOUT_TARGET_BYTES = 1 << 20


def _stage_fanout(df: DataFrame) -> int:
    """Partition count for the pre-partitionBy hash distribution, sized
    by the frame's Catalyst size estimate (guide §2.2: partition by
    data, not cores). Falls back to the slot count when the estimate is
    unavailable. Any N keeps the one-file-per-partition-value layout:
    hash distribution sends each partition tuple to exactly one task."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return par
    return min(par, max(4, -(-est // _STAGE_FANOUT_TARGET_BYTES)))


def _pq_num_rows_or_none(path: str) -> "int | None":
    """Footer row count via pyarrow, or None when the footer cannot be
    decoded (VARIANT Thrift logical type, pyarrow 16) — callers backfill
    through _backfill_unreadable_rowcounts in ONE distributed job."""
    import pyarrow.parquet as pq

    try:
        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return None


def _backfill_unreadable_rowcounts(
    spark: SparkSession,
    data_files: "list[tuple[str, int | None, int, dict]]",
) -> "list[tuple[str, int, int, dict]]":
    """Replace ``None`` row counts (footers pyarrow cannot decode —
    VARIANT logical type) with exact counts from ONE distributed count
    job over all such files, never per-file. Every groupBy key must
    normalize into the counted set (a mismatch means Spark's
    _metadata.file_path and the driver-built path diverge — recording 0
    would be silent corruption); a counted file with no group row is
    provably empty, so 0 is exact for it."""
    uncounted = [f for f, rows, _s, _p in data_files if rows is None]
    if not uncounted:
        return data_files
    from urllib.parse import urlparse as _up

    nc_abs = {os.path.abspath(f) for f in uncounted}
    counted: dict[str, int] = {}
    for r in (
        spark.read.parquet(*uncounted)
        .groupBy(_decoded_meta_path(None).alias("_p"))
        .count()
        .collect()
    ):
        pr = _up(r["_p"])
        key = os.path.abspath(pr.path if pr.scheme in ("", "file") else r["_p"])
        if key not in nc_abs:
            raise ValueError(
                f"row-count backfill saw file path {r['_p']!r} that does "
                "not normalize to any staged file — path-normalization "
                "mismatch; refusing to record record_count=0"
            )
        counted[key] = int(r["count"])
    return [
        (
            f,
            counted.get(os.path.abspath(f), 0) if rows is None else rows,
            sz,
            pv,
        )
        for f, rows, sz, pv in data_files
    ]


def _file_stats_maps(file_path: str, fields: list[dict]) -> dict:
    """Fold one data file's parquet-footer statistics into the manifest's
    field-id-keyed stats maps (null_value_counts / lower_bounds /
    upper_bounds). Footer-only — KBs of metadata read driver-side in the
    commit phase, exactly where the O(#files) renames already happen; a
    cluster writer computes the same numbers executor-side during the
    write. Empty dict when the footer is unreadable."""
    from . import skipping

    raw = skipping.footer_column_stats(file_path)
    if raw is None:
        return {}
    _num_rows, cols = raw
    by_name = {f["name"]: f for f in fields}
    nvc: list[dict] = []
    lo: list[dict] = []
    hi: list[dict] = []
    for name, entry in cols.items():
        f = by_name.get(name)
        if f is None or not isinstance(f.get("type"), str):
            continue
        fid, ice_type = f["id"], f["type"]
        if entry["nulls"] is not None:
            nvc.append({"key": fid, "value": entry["nulls"]})
        b_lo = _encode_bound(entry["min"], ice_type)
        b_hi = _encode_bound(entry["max"], ice_type)
        if b_lo is not None:
            lo.append({"key": fid, "value": b_lo})
        if b_hi is not None:
            hi.append({"key": fid, "value": b_hi})
    out: dict = {}
    if nvc:
        out["null_value_counts"] = nvc
    if lo:
        out["lower_bounds"] = lo
    if hi:
        out["upper_bounds"] = hi
    return out


#: iceberg primitive -> avro schema for DATA files (spec §Avro: date is
#: int days, timestamp(ntz) is long micros with the LOCAL logical type —
#: adjust-to-utc=false — so foreign readers keep the wall clock)
_ICE_TO_AVRO_DATA = {
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "local-timestamp-micros"},
    # adjust-to-utc=true: the INSTANT in UTC micros (spec Avro mapping)
    "timestamptz": {"type": "long", "logicalType": "timestamp-micros"},
}


def _stage_avro_data(
    spark,
    df: DataFrame,
    staging: str,
    ice_fields: list[dict],
    partition_by: list[str],
    derive_cols: dict,
    codec: str = "null",
) -> list[dict]:
    """Executor-side AVRO data-file staging for ``write_iceberg(
    data_format='avro')``: one ``mapInPandas`` pass writes spec-encoded
    Avro containers (field-id attributes stamped on every record field —
    the Avro twin of the parquet footer fid stamp, so rename-safe
    readers resolve columns by id) and computes per-file column
    statistics IN THE SAME PASS (null counts + min/max in the physical
    encoding) — the parquet path gets these from footers; Avro has no
    footer, so the write itself is the only free place to collect them.

    Returns O(#files) metadata rows ``{path, rows, size, pvals, stats}``
    (pvals = raw partition key strings by field name; stats = per-column
    [nulls, min, max] physical values). Payload bytes never touch the
    driver. Partitioned batches split per partition tuple inside each
    task, preserving the one-tuple-per-file invariant without a shuffle
    (same shape as the parquet path's ``partitionBy``)."""
    import json as _json

    from pyspark.sql import functions as F

    def _avro_nested_type(t, hint: str):
        """Iceberg NESTED type -> Avro data schema (round 14, VERDICT
        r13 item 6; spec Appendix A Avro mapping): struct -> record with
        ``field-id`` per member, list -> array with ``element-id``.
        Temporal/decimal types INSIDE nested refuse (their physical
        conversion matrix is parquet's job — use parquet); map staging
        refuses (the spec's key-value record form is unimplemented)."""
        if isinstance(t, str):
            at = _ICE_TO_AVRO_DATA.get(t)
            if at is None or not isinstance(at, str):
                raise NotImplementedError(
                    f"write_iceberg(data_format='avro'): nested member "
                    f"{hint!r} of type {t!r} has no supported avro "
                    "encoding inside a nested column (use parquet)"
                )
            return at
        if isinstance(t, dict) and t.get("type") == "struct":
            return {
                "type": "record",
                "name": f"r_{hint}",
                "fields": [
                    {
                        "name": g["name"],
                        "type": [
                            "null",
                            _avro_nested_type(
                                g["type"], f"{hint}_{g['name']}"
                            ),
                        ],
                        "field-id": g["id"],
                        "default": None,
                    }
                    for g in t.get("fields", [])
                ],
            }
        if isinstance(t, dict) and t.get("type") == "list":
            out = {
                "type": "array",
                "items": ["null", _avro_nested_type(t["element"], f"{hint}_el")],
            }
            if t.get("element-id") is not None:
                out["element-id"] = t["element-id"]
            return out
        raise NotImplementedError(
            f"write_iceberg(data_format='avro'): column {hint!r} of type "
            f"{t!r} has no supported avro data encoding (use parquet)"
        )

    avro_fields = []
    phys_kind: dict[str, object] = {}
    for f in ice_fields:
        t = f.get("type")
        if isinstance(t, str):
            at = _ICE_TO_AVRO_DATA.get(t)
            if at is None:
                raise NotImplementedError(
                    f"write_iceberg(data_format='avro'): column "
                    f"{f.get('name')!r} of type {t!r} has no supported "
                    "avro data encoding (use parquet)"
                )
        else:
            # struct/list stage as record/array (round 14); kind is the
            # ICE TYPE DICT — the row encoder recurses on it
            at = _avro_nested_type(t, f["name"])
        avro_fields.append(
            {"name": f["name"], "type": ["null", at], "field-id": f["id"]}
        )
        phys_kind[f["name"]] = t
    wschema = {"type": "record", "name": "row", "fields": avro_fields}
    wschema_json = _json.dumps(wschema)
    #: timestamptz columns arrive in the worker as tz-NAIVE wall clock in
    #: the SESSION timezone — the instant is recovered by localizing here
    sess_tz = spark.conf.get("spark.sql.session.timeZone") or "UTC"
    cols = [f["name"] for f in ice_fields]
    pcols = [f"_p_{n}" for n in partition_by]
    if partition_by:
        df = df.select(
            "*",
            *[
                derive_cols[n].cast("string").alias(f"_p_{n}")
                for n in partition_by
            ],
        )

    def _write_batches(it):
        import datetime as _dt
        import os as _os
        import uuid as _uuid

        import pandas as _pd

        from feature_store_ml_spark.io import avro_lite as _avro

        pdfs = [pdf for pdf in it if len(pdf)]
        out_rows = []
        if pdfs:
            full = _pd.concat(pdfs, ignore_index=True)
            if pcols:
                groups = full.groupby(pcols, dropna=False, sort=False)
                parts = [
                    (keys if isinstance(keys, tuple) else (keys,), g)
                    for keys, g in groups
                ]
            else:
                parts = [((), full)]
            import numpy as _np

            epoch_d = _dt.date(1970, 1, 1)
            epoch_ts = _dt.datetime(1970, 1, 1)
            schema = _json.loads(wschema_json)
            _PRIM_OF = {
                "int": "int", "long": "long", "date": "int",
                "timestamp": "long", "timestamptz": "long",
                "float": "float", "double": "double",
                "boolean": "boolean", "string": "string",
            }

            def _as_ns_unit(dtv):
                """Pin a datetime series to ns resolution before taking
                the int64 view: pandas 2.x may hand mapInPandas a
                datetime64[us] series, and ``astype('int64')`` on that
                would be off by 1000x. Out-of-ns-range values raise
                OutOfBoundsDatetime, handing the row to the
                unit-independent timedelta fallback (same contract as
                before)."""
                try:
                    return dtv.dt.as_unit("ns")
                except AttributeError:
                    return dtv  # pandas<2: always ns already

            def _encode_columnar(g, fname):
                """Batch encode (round 10): vectorized physical
                conversion + numpy-scatter avro block assembly —
                bit-identical to the row path, ~10x cheaper. Stats come
                from the same vector pass. Raises OutOfBoundsDatetime
                for dates the ns spine can't hold (the row fallback
                keeps pure-python timedelta math for those)."""
                n = len(g)
                stats: dict = {}
                columns = []
                for c in cols:
                    s = g[c]
                    k = phys_kind[c]
                    nulls = s.isna().to_numpy()
                    nn = ~nulls
                    prim = _PRIM_OF[k]
                    smin = smax = None
                    if k == "date":
                        vals = _np.zeros(n, dtype=_np.int64)
                        if nn.any():
                            dtv = _as_ns_unit(_pd.to_datetime(s[nn]))
                            vals[nn] = (
                                dtv.astype("int64").to_numpy()
                                // 86_400_000_000_000
                            )
                    elif k == "timestamp":
                        vals = _np.zeros(n, dtype=_np.int64)
                        if nn.any():
                            dtv = _as_ns_unit(_pd.to_datetime(s[nn]))
                            vals[nn] = (
                                dtv.astype("int64").to_numpy() // 1_000
                            )
                    elif k == "timestamptz":
                        # session-wall-clock -> UTC instant micros
                        vals = _np.zeros(n, dtype=_np.int64)
                        if nn.any():
                            dtv = _as_ns_unit(
                                _pd.to_datetime(s[nn]).dt.tz_localize(
                                    sess_tz
                                )
                            )
                            vals[nn] = (
                                dtv.astype("int64").to_numpy() // 1_000
                            )
                    elif k in ("int", "long"):
                        vals = _np.zeros(n, dtype=_np.int64)
                        if nn.any():
                            vals[nn] = s[nn].astype("int64").to_numpy()
                    elif k in ("float", "double"):
                        vals = _np.zeros(n, dtype=_np.float64)
                        if nn.any():
                            vals[nn] = s[nn].astype("float64").to_numpy()
                    elif k == "boolean":
                        vals = _np.zeros(n, dtype=bool)
                        if nn.any():
                            vals[nn] = s[nn].astype(bool).to_numpy()
                    else:  # string
                        vals = _np.array(
                            ["" if isn else str(v)
                             for v, isn in zip(s.to_numpy(), nulls)],
                            dtype=object,
                        )
                    if nn.any():
                        if prim == "string":
                            live = vals[nn]
                            smin, smax = min(live), max(live)
                        else:
                            live = vals[nn]
                            cast = (
                                float if prim in ("float", "double")
                                else (bool if prim == "boolean" else int)
                            )
                            smin, smax = cast(live.min()), cast(live.max())
                    stats[c] = [int(nulls.sum()), smin, smax]
                    columns.append((vals, nulls, prim))
                _avro.write_container_columnar(
                    fname, schema, columns, codec=codec
                )
                return n, stats

            def _encode_rows(g, fname):
                """Row fallback: pure-python timedelta math holds every
                date/timestamp the type allows (the vector path's ns
                spine caps at year 2262)."""
                records = []
                stats = {c: [0, None, None] for c in cols}

                def _nested_py(v, t):
                    """Arrow/pandas cell -> avro datum for a nested
                    column: struct arrives as a dict, list as a numpy
                    array/list; members convert per their primitive
                    kind, recursively."""
                    if v is None:
                        return None
                    if isinstance(t, str):
                        if not isinstance(v, (list, _np.ndarray, dict)) and _pd.isna(v):
                            return None
                        if t in ("int", "long"):
                            return int(v)
                        if t in ("float", "double"):
                            return float(v)
                        if t == "boolean":
                            return bool(v)
                        return str(v)
                    if t.get("type") == "struct":
                        if not isinstance(v, dict):
                            v = v.asDict() if hasattr(v, "asDict") else dict(v)
                        return {
                            g["name"]: _nested_py(v.get(g["name"]), g["type"])
                            for g in t.get("fields", [])
                        }
                    return [_nested_py(x, t["element"]) for x in v]

                for row in g[cols].itertuples(index=False, name=None):
                    rec = {}
                    for c, v in zip(cols, row):
                        k = phys_kind[c]
                        if isinstance(k, dict):
                            # nested column: null check must not isna()
                            # an array cell (ambiguous truth value)
                            if v is None or (
                                not isinstance(v, (list, _np.ndarray, dict))
                                and _pd.isna(v)
                            ):
                                rec[c] = None
                                stats[c][0] += 1
                            else:
                                rec[c] = _nested_py(v, k)
                            continue
                        if v is None or _pd.isna(v):
                            rec[c] = None
                            stats[c][0] += 1
                            continue
                        if k == "date":
                            v = (
                                v.date() if isinstance(v, _dt.datetime) else v
                            )
                            v = (v - epoch_d).days
                        elif k == "timestamp":
                            ts = v.to_pydatetime() if hasattr(
                                v, "to_pydatetime"
                            ) else v
                            delta = ts - epoch_ts
                            v = (
                                delta.days * 86_400 + delta.seconds
                            ) * 1_000_000 + delta.microseconds
                        elif k == "timestamptz":
                            v = (
                                _pd.Timestamp(v)
                                .tz_localize(sess_tz)
                                .value // 1_000
                            )
                        elif k in ("int", "long"):
                            v = int(v)
                        elif k in ("float", "double"):
                            v = float(v)
                        elif k == "boolean":
                            v = bool(v)
                        else:
                            v = str(v)
                        rec[c] = v
                        s = stats[c]
                        if s[1] is None or v < s[1]:
                            s[1] = v
                        if s[2] is None or v > s[2]:
                            s[2] = v
                    records.append(rec)
                _avro.write_container(fname, schema, records)
                return len(records), stats

            _has_nested = any(
                isinstance(k, dict) for k in phys_kind.values()
            )
            for keys, g in parts:
                fname = _os.path.join(
                    staging, f"{_uuid.uuid4().hex}.avro"
                )
                if _has_nested:
                    # nested columns take the generic row encoder (the
                    # columnar path's numpy spine is flat-only); nested
                    # stats stay [nulls, None, None] — manifests carry
                    # no bounds for nested fields (spec-optional)
                    n_rows, stats = _encode_rows(g, fname)
                else:
                    try:
                        n_rows, stats = _encode_columnar(g, fname)
                    except (
                        _pd.errors.OutOfBoundsDatetime,
                        OverflowError,
                    ):
                        n_rows, stats = _encode_rows(g, fname)
                pvals = {
                    n: (None if _pd.isna(kv) else kv)
                    for n, kv in zip(partition_by, keys)
                }
                out_rows.append(
                    (
                        fname,
                        n_rows,
                        _os.path.getsize(fname),
                        _json.dumps(pvals),
                        _json.dumps(stats),
                    )
                )
        yield _pd.DataFrame(
            out_rows, columns=["path", "rows", "size", "pvals", "stats"]
        )

    os.makedirs(staging, exist_ok=True)
    res = df.mapInPandas(
        _write_batches,
        "path string, rows long, size long, pvals string, stats string",
    ).collect()  # O(#files) metadata rows — payloads stay executor-side
    return [
        {
            "path": r["path"],
            "rows": int(r["rows"]),
            "size": int(r["size"]),
            "pvals": _json.loads(r["pvals"]),
            "stats": _json.loads(r["stats"]),
        }
        for r in res
    ]


#: iceberg primitive -> pyarrow type for ORC data files. ORC `timestamp`
#: is the wall-clock (local) variant — the NTZ twin of parquet's
#: isAdjustedToUTC=false — so micros survive any session timezone.
_ICE_TO_PA_ORC = {
    "int": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "boolean": "bool",
    "string": "string",
    "date": "date32",
    "timestamp": "timestamp_us",
    "timestamptz": "timestamp_us_utc",
}


def _pa_orc_nested_type(t):
    """Iceberg NESTED type -> pyarrow type for ORC staging (round 14):
    struct -> pa.struct with ``iceberg.id`` metadata per member (the
    attribute the Iceberg ORC spec mandates; pyarrow round-trips it),
    list -> pa.list_ with the element id. Members limited to the simple
    primitives — temporal/decimal members and maps refuse at the driver
    before the job launches."""
    import pyarrow as pa

    if isinstance(t, str):
        return {
            "int": pa.int32(),
            "long": pa.int64(),
            "float": pa.float32(),
            "double": pa.float64(),
            "boolean": pa.bool_(),
            "string": pa.string(),
        }[t]
    if t.get("type") == "struct":
        return pa.struct(
            [
                pa.field(
                    g["name"],
                    _pa_orc_nested_type(g["type"]),
                    metadata={"iceberg.id": str(g["id"])}
                    if g.get("id") is not None
                    else None,
                )
                for g in t.get("fields", [])
            ]
        )
    return pa.list_(
        pa.field(
            "element",
            _pa_orc_nested_type(t["element"]),
            metadata={"iceberg.id": str(t["element-id"])}
            if t.get("element-id") is not None
            else None,
        )
    )


def _pa_orc_type(name: str):
    import pyarrow as pa

    return {
        "int32": pa.int32(),
        "int64": pa.int64(),
        "float32": pa.float32(),
        "float64": pa.float64(),
        "bool": pa.bool_(),
        "string": pa.string(),
        "date32": pa.date32(),
        "timestamp_us": pa.timestamp("us"),
        "timestamp_us_utc": pa.timestamp("us", tz="UTC"),
    }[name]


def _stage_orc_data(
    spark,
    df: DataFrame,
    staging: str,
    ice_fields: list[dict],
    partition_by: list[str],
    derive_cols: dict,
) -> list[dict]:
    """Executor-side ORC data-file staging for ``write_iceberg(
    data_format='orc')`` — the arrow-native sibling of
    :func:`_stage_avro_data` with the same output contract
    (``{path, rows, size, pvals, stats}``; stats = per-column
    [nulls, min, max] PHYSICAL triples, so :func:`_avro_stats_maps`
    encodes the manifest bounds for both formats).

    Field identity: every arrow field carries ``iceberg.id`` metadata,
    which pyarrow round-trips as an ORC type attribute — the exact
    mechanism the Iceberg ORC spec mandates — so reads resolve columns
    by id (rename-safe), like the parquet footer stamp. Column stats
    come from vectorized ``pyarrow.compute`` over the staged table (no
    python row loop); payload bytes never touch the driver."""
    import json as _json

    from pyspark.sql import functions as F

    def _check_orc_nested(t, hint: str):
        if isinstance(t, str):
            if t not in (
                "int", "long", "float", "double", "boolean", "string"
            ):
                raise NotImplementedError(
                    f"write_iceberg(data_format='orc'): nested member "
                    f"{hint!r} of type {t!r} has no supported orc "
                    "encoding inside a nested column (use parquet)"
                )
            return
        if isinstance(t, dict) and t.get("type") == "struct":
            for g in t.get("fields", []):
                _check_orc_nested(g["type"], f"{hint}.{g['name']}")
            return
        if isinstance(t, dict) and t.get("type") == "list":
            _check_orc_nested(t["element"], f"{hint}.element")
            return
        raise NotImplementedError(
            f"write_iceberg(data_format='orc'): column {hint!r} of type "
            f"{t!r} has no supported orc data encoding (use parquet)"
        )

    pa_kinds: dict[str, object] = {}
    for f in ice_fields:
        t = f.get("type")
        if isinstance(t, str):
            k = _ICE_TO_PA_ORC.get(t)
            if k is None:
                raise NotImplementedError(
                    f"write_iceberg(data_format='orc'): column "
                    f"{f.get('name')!r} of type {t!r} has no supported "
                    "orc data encoding (use parquet)"
                )
        else:
            # struct/list stage natively via pyarrow (round 14); the
            # kind slot carries the ICE TYPE DICT for the worker builder
            _check_orc_nested(t, f["name"])
            k = t
        pa_kinds[f["name"]] = k
    field_meta = _json.dumps(
        [[f["name"], pa_kinds[f["name"]], f["id"]] for f in ice_fields]
    )
    #: timestamptz arrives tz-NAIVE in the session timezone (see the avro
    #: stager); localized to UTC before the arrow cast
    sess_tz = spark.conf.get("spark.sql.session.timeZone") or "UTC"
    cols = [f["name"] for f in ice_fields]
    pcols = [f"_p_{n}" for n in partition_by]
    if partition_by:
        df = df.select(
            "*",
            *[
                derive_cols[n].cast("string").alias(f"_p_{n}")
                for n in partition_by
            ],
        )

    def _write_batches(it):
        import datetime as _dt
        import os as _os
        import uuid as _uuid

        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.compute as _pc
        import pyarrow.orc as _orc

        spec = _json.loads(field_meta)
        schema = _pa.schema(
            [
                _pa.field(
                    n,
                    _pa_orc_type(k)
                    if isinstance(k, str)
                    else _pa_orc_nested_type(k),
                    metadata={"iceberg.id": str(fid)},
                )
                for n, k, fid in spec
            ]
        )
        epoch_d = _dt.date(1970, 1, 1)
        epoch_ts = _dt.datetime(1970, 1, 1)

        def _phys(v, kind):
            if v is None:
                return None
            if kind == "date32":
                return (v - epoch_d).days
            if kind == "timestamp_us":
                ts = v.to_pydatetime() if hasattr(v, "to_pydatetime") else v
                d = ts - epoch_ts
                return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            if kind == "timestamp_us_utc":
                return _pd.Timestamp(v).value // 1_000  # ns UTC -> micros
            return v

        pdfs = [pdf for pdf in it if len(pdf)]
        out_rows = []
        if pdfs:
            full = _pd.concat(pdfs, ignore_index=True)
            if pcols:
                groups = full.groupby(pcols, dropna=False, sort=False)
                parts = [
                    (keys if isinstance(keys, tuple) else (keys,), g)
                    for keys, g in groups
                ]
            else:
                parts = [((), full)]
            for keys, g in parts:
                g = g[cols]
                tsz_cols = [n for n, k, _f in spec if k == "timestamp_us_utc"]
                if tsz_cols:
                    g = g.copy()
                    for n in tsz_cols:
                        g[n] = (
                            _pd.to_datetime(g[n])
                            .dt.tz_localize(sess_tz)
                            .dt.tz_convert("UTC")
                        )
                tbl = _pa.Table.from_pandas(
                    g, schema=schema, preserve_index=False
                )
                stats = {}
                for n, k, _fid in spec:
                    arr = tbl[n]
                    nulls = arr.null_count
                    if nulls == len(arr) or not isinstance(k, str):
                        # nested: null count only — manifests carry no
                        # bounds for nested fields (spec-optional)
                        stats[n] = [nulls, None, None]
                        continue
                    mm = _pc.min_max(arr)
                    stats[n] = [
                        nulls,
                        _phys(mm["min"].as_py(), k),
                        _phys(mm["max"].as_py(), k),
                    ]
                fname = _os.path.join(staging, f"{_uuid.uuid4().hex}.orc")
                _orc.write_table(tbl, fname)
                pvals = {
                    n: (None if _pd.isna(kv) else kv)
                    for n, kv in zip(partition_by, keys)
                }
                out_rows.append(
                    (
                        fname,
                        len(tbl),
                        _os.path.getsize(fname),
                        _json.dumps(pvals),
                        _json.dumps(stats),
                    )
                )
        yield _pd.DataFrame(
            out_rows, columns=["path", "rows", "size", "pvals", "stats"]
        )

    os.makedirs(staging, exist_ok=True)
    res = df.mapInPandas(
        _write_batches,
        "path string, rows long, size long, pvals string, stats string",
    ).collect()  # O(#files) metadata rows — payloads stay executor-side
    return [
        {
            "path": r["path"],
            "rows": int(r["rows"]),
            "size": int(r["size"]),
            "pvals": _json.loads(r["pvals"]),
            "stats": _json.loads(r["stats"]),
        }
        for r in res
    ]


def _avro_stats_maps(stats: dict, fields: list[dict]) -> dict:
    """Manifest stats maps from an avro or orc staging pass's physical
    [nulls, min, max] triples — the footerless-format twin of
    ``_file_stats_maps`` (which reads parquet footers). Physical values
    convert back to their typed form (days -> date, micros -> naive
    datetime) before the spec's binary single-value bound encoding."""
    import datetime as dt

    by_name = {f["name"]: f for f in fields}
    nvc: list[dict] = []
    lo: list[dict] = []
    hi: list[dict] = []
    for name, (nulls, mn, mx) in stats.items():
        f = by_name.get(name)
        if f is None or not isinstance(f.get("type"), str):
            continue
        fid, t = f["id"], f["type"]

        def _typed(v):
            if v is None:
                return None
            if t == "date":
                return dt.date(1970, 1, 1) + dt.timedelta(days=int(v))
            if t in ("timestamp", "timestamptz"):
                # timestamptz physical micros are UTC; the naive result
                # is the UTC wall clock, which _encode_bound treats as
                # already-UTC micros
                return dt.datetime(1970, 1, 1) + dt.timedelta(
                    microseconds=int(v)
                )
            return v

        nvc.append({"key": fid, "value": int(nulls)})
        b_lo = _encode_bound(_typed(mn), t)
        b_hi = _encode_bound(_typed(mx), t)
        if b_lo is not None:
            lo.append({"key": fid, "value": b_lo})
        if b_hi is not None:
            hi.append({"key": fid, "value": b_hi})
    out: dict = {}
    if nvc:
        out["null_value_counts"] = nvc
    if lo:
        out["lower_bounds"] = lo
    if hi:
        out["upper_bounds"] = hi
    return out


def _merged_variant_name_mapping(prior_meta: dict, fields: list[dict]) -> dict:
    """Table properties with ``schema.name-mapping.default`` refreshed
    from the CURRENT top-level names, merging any existing entry's
    candidates (old names persist so pre-rename files keep resolving) —
    the write-path twin of set_iceberg_name_mapping, folded into the
    same commit."""
    existing_map = _table_name_mapping(prior_meta) if prior_meta else {}
    entries = [
        {
            "field-id": f["id"],
            "names": list(
                dict.fromkeys(existing_map.get(f["id"], []) + [f["name"]])
            ),
        }
        for f in fields
        if "id" in f
    ]
    props = dict((prior_meta or {}).get("properties") or {})
    props["schema.name-mapping.default"] = json.dumps(entries)
    return props


def write_iceberg(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    format_version: int = 1,
    summary_props: dict | None = None,
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    sort_by: list[str] | None = None,
    branch: str | None = None,
    data_format: str = "parquet",
    data_codec: str = "null",
    row_lineage: bool = False,
) -> int:
    """Append ``df`` to an Iceberg table at ``path`` (creating the table on
    first write), per the public spec: new parquet data files under
    ``data/``, one Avro manifest of ADDED entries, a manifest list carrying
    the prior snapshot's manifests plus the new one, and a new
    ``vN.metadata.json`` with the snapshot appended — readable by this
    module's reader AND any real Iceberg reader (format-version 1 or 2).

    ``partition_by``: partition-spec fields (spec §Partition Transforms):
    ``"col"`` / ``"identity(col)"``, the time transforms ``year/month/
    day/hour(ts)``, ``bucket(N, col)`` (spec-exact Murmur3 of the 8-byte
    long form, evaluated as a JVM expression tree — hashLong(34) ==
    2017239379 per Appendix B), and ``truncate(W, col)``. Data files land
    under ``data/<field>=<value>/`` dirs, each holding exactly one
    partition tuple, recorded TYPED in the manifest's per-file
    ``partition`` struct and declared in ``partition-specs``. Unlike
    Hive/Delta layouts, the SOURCE COLUMNS STAY IN THE DATA FILES, so
    reads need no path reconstruction — partition values exist for
    pruning (scan planning derives source-column bounds from each file's
    partition tuple; see read_iceberg(where=)). The
    one-partition-per-file invariant comes from staging through a derived
    string key (``partitionBy`` on the derivation keeps the source column
    in the file). Appends must repeat the declared partitioning.

    ``branch``: append to a named BRANCH ref instead of main — the
    write-audit half of WRITE-AUDIT-PUBLISH (spec §Refs): the new
    snapshot parents off the branch head and only the branch pointer
    moves; ``current-snapshot-id`` and the main ``snapshot-log`` are
    untouched, so production readers never see unaudited rows. Validate
    through ``read_iceberg(ref=...)``, then publish with
    ``fast_forward_iceberg``. The branch must exist (``set_iceberg_ref``)
    and schema evolution through a side branch is refused (the schema is
    TABLE-level state — evolving it from a branch would change main's
    view before publish).

    Returns the new snapshot id. Scale/correctness shape mirrors
    lakehouse.write_delta: distributed data write, driver-side O(#files)
    metadata, atomic rename commit with a single-writer version conflict
    check (real multi-writer Iceberg swaps metadata pointers through a
    catalog's atomic compare-and-swap; a filesystem rename is the
    HadoopCatalog equivalent).
    """
    import time as _time
    import uuid

    import pyarrow.parquet as pq

    if format_version not in (1, 2, 3):
        raise ValueError(
            f"write_iceberg: format_version must be 1|2|3, got {format_version}"
        )
    if format_version >= 3:
        # v3 makes row lineage MANDATORY (spec §Row Lineage: "Row
        # lineage is required in v3") — the writer simply enables it
        row_lineage = True
    data_format = (data_format or "parquet").lower()
    if data_format not in ("parquet", "avro", "orc"):
        raise ValueError(
            f"write_iceberg: data_format must be parquet|avro|orc, got {data_format!r}"
        )
    data_codec = (data_codec or "null").lower()
    if data_codec not in ("null", "deflate"):
        raise ValueError(
            f"write_iceberg: data_codec must be null|deflate, got {data_codec!r}"
        )
    if data_codec != "null" and data_format != "avro":
        raise ValueError(
            "write_iceberg: data_codec applies to data_format='avro' "
            "(parquet/orc compression rides their own writers)"
        )
    if row_lineage and format_version < 2:
        raise NotImplementedError(
            "write_iceberg: row_lineage needs format_version 2 "
            "(lineage composes with merge-on-read DML)"
        )
    # VARIANT writes (round 14, VERDICT r13 item 2): Spark's own writer
    # emits spec-shredded variant parquet, so staging is ordinary — the
    # gates are the v3-only type rule and the parquet-only staging leg;
    # footer handling rides _pq_num_rows_or_none + the one-job backfill
    # (pyarrow cannot parse VARIANT footers) and a merged name mapping
    # (stamped below) keeps renames resolvable
    _variant_write = _spark_schema_has_variant(df.schema)
    if _variant_write and format_version < 3:
        raise ValueError(
            "write_iceberg: variant is a v3-only type (spec §Primitive "
            "Types) — pass format_version=3"
        )
    if _variant_write and data_format != "parquet":
        raise NotImplementedError(
            "write_iceberg: variant columns stage as parquet only "
            "(Spark's shredded variant writer); AVRO/ORC staging of "
            "variant is not implemented"
        )
    pfields = [parse_partition_field(s) for s in (partition_by or [])]
    partition_by = [f["name"] for f in pfields]
    if len(set(partition_by)) != len(partition_by):
        raise ValueError(
            f"write_iceberg: duplicate partition field names {partition_by}"
        )
    missing = [f["source"] for f in pfields if f["source"] not in df.columns]
    if missing:
        raise ValueError(f"write_iceberg: partition source columns {missing} not in batch")
    bad_sort = [c for c in (sort_by or []) if c not in df.columns]
    if bad_sort:
        raise ValueError(f"write_iceberg: sort columns {bad_sort} not in batch")
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    existing = is_iceberg_table(path)
    prior_meta: dict = {}
    prior_version = 0
    declared: dict = {}
    if branch is not None:
        if branch == "main":
            raise ValueError(
                "write_iceberg: branch='main' is the table head — write "
                "without branch (a refs entry named 'main' must mirror "
                "current-snapshot-id, never diverge from it)"
            )
        if not existing:
            raise ValueError(
                f"{path}: branch={branch!r} write into a non-existent "
                "table — create the table (write to main) and "
                "set_iceberg_ref first"
            )
        if merge_schema:
            raise NotImplementedError(
                "write_iceberg: schema evolution through a side branch is "
                "not implemented — the schema is table-level state; "
                "evolve on main"
            )
    if existing:
        mp = latest_metadata_path(path)
        with open(mp) as fh:
            prior_meta = json.load(fh)
        fv = prior_meta.get("format-version", 1)
        if fv != format_version:
            raise ValueError(
                f"{path}: table is format-version {fv}, append requested {format_version}"
            )
        # Appends may mix data-file formats freely, with or without live
        # delete content: the read path (round 10) runs one mask
        # pipeline per format group — position deletes key on the target
        # file's path and equality deletes broadcast into every group
        # under the same sequence rule — so a parquet append onto an
        # AVRO table with deletes reads correctly. (Round 9 refused this
        # mix at read; the short-lived write-side guard died with it.)
        spec = next(
            (
                s
                for s in prior_meta.get("partition-specs") or []
                if s.get("spec-id") == prior_meta.get("default-spec-id", 0)
            ),
            {"fields": []},
        )
        prior_fid_to_name = {
            f["id"]: f["name"]
            for f in (
                next(
                    (
                        s
                        for s in prior_meta.get("schemas", [])
                        if s.get("schema-id") == prior_meta.get("current-schema-id", 0)
                    ),
                    prior_meta.get("schema") or {"fields": []},
                ).get("fields", [])
            )
        }
        declared_fields = []
        for f in spec.get("fields") or []:
            t, p = _parse_transform_spec_name(f.get("transform", "identity"))
            declared_fields.append(
                {
                    "transform": t,
                    "source": prior_fid_to_name.get(f.get("source-id"), f["name"]),
                    "param": p,
                    "name": f["name"],
                }
            )
        want = [
            (f["transform"], f["source"], f["param"], f["name"]) for f in declared_fields
        ]
        got_spec = [
            (f["transform"], f["source"], f["param"], f["name"]) for f in pfields
        ]
        if want != got_spec:
            raise ValueError(
                f"{path}: append partitioning {got_spec} does not match "
                f"the table's declared partitioning {want}"
            )
        head = os.path.basename(mp).split(".metadata.json")[0].lstrip("v").split("-")[0]
        prior_version = int(head) if head.isdigit() else 0
        sid = prior_meta.get("current-schema-id", 0)
        declared = next(
            (s for s in prior_meta.get("schemas", []) if s.get("schema-id") == sid),
            prior_meta.get("schema"),
        )
        if declared is None:
            raise ValueError(f"{path}: no declared schema in table metadata")
        # compare in the id-free fingerprint space: nested batch types
        # carry no field ids (table-assigned identity), and the flat
        # comparison was name+type anyway
        want = [
            (f["name"], _ice_type_fingerprint(f["type"]))
            for f in declared["fields"]
        ]
        got = [
            (f.name, _spark_dt_fingerprint(f.dataType))
            for f in df.schema.fields
        ]
        # WRITE-DEFAULT (spec §Default values, v3): a batch may omit a
        # column carrying write-default — the writer materializes the
        # constant into the data files (the spec's "assign the default"
        # obligation), then the ordinary schema check runs on the
        # completed frame. Column order is restored to the declared
        # order so positional comparison below stays meaningful.
        _missing_wd = [
            f
            for f in declared["fields"]
            if f.get("write-default") is not None
            and f["name"] not in set(df.columns)
        ]
        if _missing_wd:
            from pyspark.sql import functions as _F

            for f in _missing_wd:
                df = df.withColumn(
                    f["name"],
                    _F.lit(
                        _default_parse(
                            f["type"], f["write-default"], f["name"]
                        )
                    ).cast(_ice_to_spark_type(f["type"])),
                )
            order = [f["name"] for f in declared["fields"]]
            df = df.select(
                *[n for n in order if n in set(df.columns)],
                *[c for c in df.columns if c not in set(order)],
            )
            got = [
                (f.name, _spark_dt_fingerprint(f.dataType))
                for f in df.schema.fields
            ]
        if got != want and merge_schema and got[: len(want)] == want:
            # SCHEMA EVOLUTION (add-only): the batch carries every declared
            # column in order plus new nullable ones at the end — widen the
            # declared schema with fresh field ids (nested member ids
            # allocate from the same counter, past every live id incl.
            # nested — _max_field_id); the reader's declared-schema scan
            # backfills old files with null
            import itertools as _it

            _ctr = _it.count(
                max(
                    _max_field_id(declared["fields"]),
                    prior_meta.get("last-column-id", 0) or 0,
                )
                + 1
            )

            def _alloc() -> int:
                return next(_ctr)

            new_fields = []
            for f in df.schema.fields[len(want):]:
                fid = _alloc()
                try:
                    ice_t = _spark_dt_to_ice(
                        f.dataType, _alloc, variant_ok=(format_version == 3)
                    )
                except NotImplementedError:
                    raise ValueError(
                        f"{path}: evolution adds column {f.name!r} with an "
                        "unmappable spark type"
                    ) from None
                new_fields.append(
                    {
                        "id": fid,
                        "name": f.name,
                        "required": False,
                        "type": ice_t,
                    }
                )
            declared = {
                **declared,
                "fields": list(declared["fields"]) + new_fields,
            }
        elif got != want:
            raise ValueError(
                f"{path}: append schema mismatch — table declares {want}, "
                f"batch carries {got}"
                + ("" if merge_schema else "; pass merge_schema=True to add columns")
            )
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    # result iceberg type per partition FIELD (for the manifest partition
    # struct and the dir-value parsers) + the deriving column expression
    part_types: dict[str, str] = {}
    derive_cols: dict[str, object] = {}
    if pfields:
        spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for f in pfields:
            src_ice = _SPARK_TO_ICEBERG.get(spark_types[f["source"]])
            if src_ice is None:
                raise NotImplementedError(
                    f"write_iceberg: partition source type "
                    f"{spark_types[f['source']]!r} has no iceberg mapping"
                )
            col, result_type = _derive_partition_col(f, src_ice)
            part_types[f["name"]] = result_type
            derive_cols[f["name"]] = col

    # 1. distributed data write, then driver-side move into data/.
    #    Partitioned: stage through DERIVED string keys (_p_<field>) so
    #    partitionBy splits files per partition tuple while the SOURCE
    #    columns stay in the parquet (Iceberg's layout, unlike Hive's).
    #    Transform derivation is all JVM expressions (time bucketing,
    #    codegen'd murmur3, truncation) — zero Python in the write path.
    import shutil

    from pyspark.sql import functions as F
    from urllib.parse import unquote

    # SORT ORDER (spec §Sorting): declared at CREATE in sort-orders /
    # default-sort-order-id; every append APPLIES the declared order —
    # range distribution + local sort (the write.distribution-mode=range
    # recipe), which makes per-file column bounds near-disjoint so the
    # manifest-bounds pruner skips most files on sorted-column predicates.
    # One extra shuffle per write, paid exactly when the table asked for
    # clustering.
    sort_cols = list(sort_by or [])
    if existing:
        orders = prior_meta.get("sort-orders") or []
        dsid = prior_meta.get("default-sort-order-id", 0)
        cur_order = next(
            (o for o in orders if o.get("order-id") == dsid), None
        )
        declared_sort = None
        if cur_order and cur_order.get("fields"):
            id_to_name = _field_id_map(prior_meta)
            declared_sort = [
                id_to_name.get(f.get("source-id"))
                for f in cur_order["fields"]
                if f.get("transform") == "identity"
            ]
        if sort_by and declared_sort != list(sort_by):
            raise ValueError(
                f"write_iceberg: sort_by {list(sort_by)} differs from the "
                f"table's declared sort order {declared_sort} — the order "
                "is declared at CREATE; appends apply it automatically"
            )
        sort_cols = [c for c in (declared_sort or []) if c in df.columns]
    if sort_cols:
        # explicit partition count = the batch's own parallelism: a
        # range-distributed write keeps its task fan-out (an unhinted
        # exchange would let AQE coalesce a small batch to one giant
        # file, defeating both parallelism and per-file bound tightness)
        n_parts = max(df.rdd.getNumPartitions(), 1)
        df = df.repartitionByRange(n_parts, *sort_cols).sortWithinPartitions(
            *sort_cols
        )

    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    # stamp field ids (top-level AND struct members) into the footers —
    # the spec requires it, and rename-safe resolution depends on it
    df = _stamp_field_ids(
        df,
        declared["fields"]
        if existing
        else _iceberg_fields(df, variant_ok=(format_version == 3)),
    )
    # (abs path, rows, bytes, partition value dict)
    data_files: list[tuple[str, int, int, dict]] = []
    #: avro-staged files carry their stats from the write pass itself
    #: (no footer to read back); keyed by final path
    avro_stats: dict[str, dict] = {}
    if data_format in ("avro", "orc"):
        from urllib.parse import quote as _quote

        _fields_now = declared["fields"] if existing else _iceberg_fields(df)
        _stage = _stage_avro_data if data_format == "avro" else _stage_orc_data
        staged_meta = _stage(
            spark, df, staging, _fields_now, partition_by, derive_cols,
            **({"codec": data_codec} if data_format == "avro" else {}),
        )
        for fm in staged_meta:
            raw = fm["pvals"]
            pvals = {
                c: (
                    None
                    if raw.get(c) is None
                    else _PARTITION_PARSERS[part_types[c]](raw[c])
                )
                for c in partition_by
            }
            if partition_by:
                sub = os.path.join(
                    data_dir,
                    *[
                        f"{c}="
                        + (
                            "__HIVE_DEFAULT_PARTITION__"
                            if raw.get(c) is None
                            # quote() the component: a raw '#' or '%'
                            # truncates/misparses in every file: URI
                            # consumer (same reason the parquet path
                            # keeps Spark's own escaped dirs)
                            else _quote(str(raw[c]), safe="")
                        )
                        for c in partition_by
                    ],
                )
                os.makedirs(sub, exist_ok=True)
            else:
                sub = data_dir
            final = os.path.join(sub, os.path.basename(fm["path"]))
            os.rename(fm["path"], final)
            data_files.append((final, fm["rows"], fm["size"], pvals))
            avro_stats[final] = _avro_stats_maps(fm["stats"], _fields_now)
        shutil.rmtree(staging)
    elif partition_by:
        staged = df.select(
            "*",
            *[
                derive_cols[n].cast("string").alias(f"_p_{n}")
                for n in partition_by
            ],
        )
        # write.distribution-mode=hash (Iceberg spark-writes docs, guide
        # §6): cluster rows by partition tuple before the partitioned
        # write so tasks write whole partitions in PARALLEL — an
        # unclustered input (often 1 scan task) otherwise opens a writer
        # per partition value serially (measured: a ~900-value
        # day-transform write was one 4 s task). Explicit N (the
        # cluster's slot count — core-count-derived, not a constant) so
        # AQE's byte-based coalescing doesn't collapse the fan-out: the
        # bottleneck here is per-FILE writer setup, not bytes. Each
        # partition value still lands in exactly one task, so the
        # 1-file-per-partition layout is unchanged.
        staged = staged.repartition(
            _stage_fanout(staged), *[f"_p_{c}" for c in partition_by]
        )
        staged.write.partitionBy(*[f"_p_{c}" for c in partition_by]).parquet(staging)
    else:
        df.write.parquet(staging)
    for dirpath, _dirnames, filenames in sorted(os.walk(staging)):
        rel_dir = os.path.relpath(dirpath, staging)
        rel_dir = "" if rel_dir == "." else rel_dir
        pvals: dict = {}
        for comp in rel_dir.split(os.sep):
            if "=" not in comp:
                continue
            k, v = comp.split("=", 1)
            c = k[len("_p_"):]
            pvals[c] = (
                None
                if v == "__HIVE_DEFAULT_PARTITION__"
                else _PARTITION_PARSERS[part_types[c]](unquote(v))
            )
        for name in sorted(filenames):
            if not name.endswith(".parquet"):
                continue
            if partition_by:
                # keep Spark's OWN escaped dir components (Brand#13 stages
                # as Brand%2313): composing dirs from the parsed value
                # would re-introduce URI-special chars ('#' truncates at
                # the fragment in every file: URI consumer)
                sub = os.path.join(
                    data_dir,
                    *[
                        comp[len("_p_"):]
                        for comp in rel_dir.split(os.sep)
                        if "=" in comp
                    ],
                )
                os.makedirs(sub, exist_ok=True)
            else:
                sub = data_dir
            final = os.path.join(sub, f"{uuid.uuid4().hex}.parquet")
            os.rename(os.path.join(dirpath, name), final)
            data_files.append(
                (
                    final,
                    _pq_num_rows_or_none(final),
                    os.path.getsize(final),
                    dict(pvals),
                )
            )
    shutil.rmtree(staging, ignore_errors=True)  # already gone for avro
    # variant footers are opaque to pyarrow: one distributed count job
    # backfills exact record_counts for them (never per-file)
    data_files = _backfill_unreadable_rowcounts(spark, data_files)

    now_ms = int(_time.time() * 1000)
    snapshots = list(prior_meta.get("snapshots", []))
    snap_id = max((s["snapshot-id"] for s in snapshots), default=0) + 1
    seq = (prior_meta.get("last-sequence-number", 0) or 0) + 1

    # 2. manifest of ADDED entries (partition struct typed per the spec),
    #    each carrying footer-derived column stats for scan-time skipping
    fields = (
        declared["fields"]
        if existing
        else _iceberg_fields(df, variant_ok=(format_version == 3))
    )
    partition_fields = [
        {"name": c, "type": ["null", _avro_partition_type(part_types[c])]}
        for c in partition_by
    ]
    manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    _records = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snap_id,
            "data_file": {
                **({"content": 0} if format_version >= 2 else {}),
                "file_path": f"file:{f}",
                "file_format": data_format.upper(),
                "partition": pvals,
                "record_count": rows,
                "file_size_in_bytes": size,
                **({"block_size_in_bytes": 1 << 26} if format_version == 1 else {}),
                **(
                    avro_stats[f]
                    if f in avro_stats
                    else _file_stats_maps(f, fields)
                ),
            },
        }
        for f, rows, size, pvals in data_files
    ]
    _lineage = row_lineage or _lineage_enabled(prior_meta)
    _next_rid = int(prior_meta.get("next-row-id", 0))
    _first_rid = _next_rid
    if _lineage:
        _next_rid = _assign_first_row_ids(_next_rid, _records)
    avro_lite.write_container(
        manifest,
        _manifest_entry_schema(format_version, partition_fields),
        _records,
    )

    # 3. manifest list: BASE snapshot's manifests + the new one — the
    #    base is the branch head for a branch write, else main
    prior_manifests: list[dict] = []
    if branch is not None:
        refs0 = prior_meta.get("refs") or {}
        if branch not in refs0:
            raise ValueError(
                f"{path}: no branch {branch!r} "
                f"(have {sorted(refs0) or 'none'}) — set_iceberg_ref first"
            )
        if refs0[branch].get("type") != "branch":
            raise ValueError(
                f"{path}: ref {branch!r} is a TAG — tags pin history and "
                "are immutable; write to a branch"
            )
        cur = refs0[branch]["snapshot-id"]
    else:
        cur = prior_meta.get("current-snapshot-id")
    if cur not in (None, -1) and snapshots:
        prior_snap = next(s for s in snapshots if s["snapshot-id"] == cur)
        for e in avro_lite.read_container(_localize(prior_snap["manifest-list"], path)):
            prior_manifests.append(e)
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
    new_entry = {
        "manifest_path": f"file:{manifest}",
        "manifest_length": os.path.getsize(manifest),
        "partition_spec_id": 0,
        "added_snapshot_id": snap_id,
    }
    if format_version >= 2:
        new_entry.update(content=0, sequence_number=seq, min_sequence_number=seq)
    mf_schema = _manifest_file_schema(format_version)
    keep = {f["name"] for f in mf_schema["fields"]}
    avro_lite.write_container(
        mlist,
        mf_schema,
        [{k: e.get(k, 0) for k in keep} for e in prior_manifests] + [new_entry],
    )

    # 4. new metadata version, committed by atomic rename (single-writer)
    # a branch write parents off the BRANCH head (cur resolved above)
    _parent = cur if branch is not None else prior_meta.get("current-snapshot-id")
    snapshot = {
        "snapshot-id": snap_id,
        **(
            {"parent-snapshot-id": _parent}
            if _parent not in (None, -1)
            else {}
        ),
        "timestamp-ms": now_ms,
        "manifest-list": f"file:{mlist}",
        # summary_props: writer bookkeeping in the snapshot summary (the
        # spec's string-map) — e.g. a streaming sink's (app, batch) stamp
        "summary": {"operation": "append", **(summary_props or {})},
        "schema-id": 0,
        # v3 row lineage: the snapshot's first assigned row id
        **({"first-row-id": _first_rid} if _lineage else {}),
    }
    if format_version >= 2:
        snapshot["sequence-number"] = seq
    name_to_fid = {f["name"]: f.get("id", i) for i, f in enumerate(fields, start=1)}
    spec_fields = [
        {
            "name": f["name"],
            "transform": _transform_spec_name(f),
            "source-id": name_to_fid[f["source"]],
            "field-id": 1000 + i,
        }
        for i, f in enumerate(pfields)
    ]
    meta = {
        "format-version": format_version,
        "table-uuid": prior_meta.get("table-uuid") or str(uuid.uuid4()),
        "location": path,
        "last-updated-ms": now_ms,
        # covers NESTED ids too (struct member / element / key / value) —
        # the allocator foreign writers draw fresh ids from
        "last-column-id": max(
            _max_field_id(fields),
            len(fields),
            prior_meta.get("last-column-id", 0) or 0,
        ),
        "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 999 + len(spec_fields),
        "default-sort-order-id": (
            1
            if (not existing and sort_cols)
            else prior_meta.get("default-sort-order-id", 0)
        ),
        "sort-orders": (
            [
                {
                    "order-id": 1,
                    "fields": [
                        {
                            "transform": "identity",
                            "source-id": name_to_fid[c],
                            "direction": "asc",
                            "null-order": "nulls-first",
                        }
                        for c in sort_cols
                    ],
                }
            ]
            if (not existing and sort_cols)
            else prior_meta.get("sort-orders")
            or [{"order-id": 0, "fields": []}]
        ),
        # properties and refs are durable table state — an append that
        # dropped them would silently un-tag snapshots / reset config.
        # Variant tables additionally merge a NAME MAPPING (spec §Name
        # Mapping) on every write: their footers are opaque to pyarrow,
        # so THIS module's reader cannot fid-group them after a rename —
        # the JVM-footer-name fallback resolves through the mapping
        # instead (old names persist across renames by the merge).
        "properties": (
            _merged_variant_name_mapping(prior_meta, fields)
            if any(_ice_type_has_variant(f["type"]) for f in fields)
            else prior_meta.get("properties") or {}
        ),
        # a branch write moves ONLY the branch pointer: main
        # (current-snapshot-id) and its snapshot-log are untouched, so
        # time travel and production reads never see unpublished rows
        "current-snapshot-id": (
            prior_meta.get("current-snapshot-id", -1)
            if branch is not None
            else snap_id
        ),
        "snapshots": snapshots + [snapshot],
        # the (timestamp -> snapshot) history time travel resolves against
        "snapshot-log": (
            list(prior_meta.get("snapshot-log", []))
            if branch is not None
            else list(prior_meta.get("snapshot-log", []))
            + [{"timestamp-ms": now_ms, "snapshot-id": snap_id}]
        ),
        **(
            {
                "refs": {
                    **(prior_meta.get("refs") or {}),
                    branch: {"snapshot-id": snap_id, "type": "branch"},
                }
            }
            if branch is not None
            else (
                {"refs": prior_meta["refs"]} if prior_meta.get("refs") else {}
            )
        ),
        # statistics files (Puffin) are per-snapshot durable state — a
        # write that dropped the list would orphan every sketch; readers
        # match entries by snapshot-id so stale ones are visible as such
        **(
            {"statistics": prior_meta["statistics"]}
            if prior_meta.get("statistics")
            else {}
        ),
    }
    if format_version >= 2:
        meta["last-sequence-number"] = seq
    else:
        # v1 readers may look at the legacy singular fields
        meta["schema"] = {"type": "struct", "fields": fields}
        meta["partition-spec"] = spec_fields
    if _lineage:
        meta["next-row-id"] = _next_rid
    new_version = prior_version + 1
    final_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
    tmp = os.path.join(meta_dir, f".v{new_version}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    if os.path.exists(final_path):
        os.remove(tmp)
        raise RuntimeError(
            f"{path}: metadata v{new_version} was committed concurrently — "
            "this writer is single-writer (a catalog CAS is the multi-writer path)"
        )
    os.rename(tmp, final_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_version))
    return snap_id


def _swap_metadata(path: str, meta: dict) -> int:
    """Commit a mutated metadata dict as the next version by atomic
    rename (single-writer conflict check) and update version-hint.
    Returns the new version number."""
    import uuid

    mp = latest_metadata_path(path)
    head = os.path.basename(mp).split(".metadata.json")[0].lstrip("v").split("-")[0]
    prior_version = int(head) if head.isdigit() else 0
    meta_dir = os.path.join(path, "metadata")
    new_version = prior_version + 1
    final_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
    tmp = os.path.join(meta_dir, f".v{new_version}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    if os.path.exists(final_path):
        os.remove(tmp)
        raise RuntimeError(
            f"{path}: metadata v{new_version} was committed concurrently"
        )
    os.rename(tmp, final_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_version))
    return new_version


def _declared_sort_cols(meta: dict) -> list[str]:
    """Identity columns of the table's default sort order, [] when
    unsorted — the Iceberg clustering declaration."""
    orders = meta.get("sort-orders") or []
    dsid = meta.get("default-sort-order-id", 0)
    cur = next((o for o in orders if o.get("order-id") == dsid), None)
    if not cur or not cur.get("fields"):
        return []
    id_to_name = _field_id_map(meta)
    return [
        c
        for c in (
            id_to_name.get(f.get("source-id"))
            for f in cur["fields"]
            if f.get("transform") == "identity"
        )
        if c
    ]


def set_iceberg_sort_order(path: str, cols: list[str]) -> int:
    """ALTER TABLE ... WRITE ORDERED BY (spec §Sorting) — the Iceberg
    twin of ``lakehouse.cluster_delta_by``: append a new sort order over
    ``cols`` (identity, asc, nulls-first) and make it the default. ZERO
    data rewrite — existing files keep their layout; subsequent appends
    apply the order (write_iceberg's range-distribute + local-sort leg),
    and ``compact_iceberg_incremental`` defaults both its overlap
    SELECTION and its recluster layout to these columns, so plain
    maintenance calls converge the table toward the declared clustering
    at O(touched) cost. ``cols=[]`` is WRITE UNORDERED (points the
    default at the empty order). Returns the new metadata version."""
    import time as _time

    if not is_iceberg_table(path):
        raise ValueError(f"{path}: not an Iceberg table")
    meta = _load_metadata(path)
    orders = list(meta.get("sort-orders") or [])
    if cols:
        name_to_fid = {
            f["name"]: f["id"] for f in _current_schema(meta).get("fields", [])
        }
        missing = [c for c in cols if c not in name_to_fid]
        if missing:
            raise ValueError(f"{path}: sort columns not in schema: {missing}")
        new_id = max((o.get("order-id", 0) for o in orders), default=0) + 1
        orders.append(
            {
                "order-id": new_id,
                "fields": [
                    {
                        "transform": "identity",
                        "source-id": name_to_fid[c],
                        "direction": "asc",
                        "null-order": "nulls-first",
                    }
                    for c in cols
                ],
            }
        )
    else:
        new_id = 0
        if not any(o.get("order-id") == 0 for o in orders):
            orders.insert(0, {"order-id": 0, "fields": []})
    meta2 = {
        **meta,
        "sort-orders": orders,
        "default-sort-order-id": new_id,
        "last-updated-ms": int(_time.time() * 1000),
    }
    return _swap_metadata(path, meta2)


def set_iceberg_ref(
    path: str,
    name: str,
    snapshot_id: int | None = None,
    ref_type: str = "tag",
    max_ref_age_ms: int | None = None,
) -> int:
    """Create or move a named REF (spec §Refs): a TAG pins a snapshot as
    durable history ("the v2024.08 training set"), a BRANCH is a movable
    pointer. One metadata commit; the snapshot itself is untouched.
    Refs PROTECT their snapshots from expire_iceberg_snapshots — tagging
    is how a snapshot outlives retention, per the spec's
    retention-policy model. Defaults to the current snapshot.

    ``max_ref_age_ms`` (spec ``max-ref-age-ms``, round 8): the retention
    policy for the REF ITSELF — when the referenced snapshot is older
    than this at expiration time, expire_iceberg_snapshots drops the ref
    first and the snapshot falls under the normal policy. This is what
    lets WAP audit branches and nightly tags garbage-collect on their own
    schedule instead of pinning history forever; ``main`` never ages out,
    per the spec. Returns the referenced snapshot id."""
    if ref_type not in ("tag", "branch"):
        raise ValueError(
            f"set_iceberg_ref: ref_type must be tag|branch, got {ref_type!r}"
        )
    if max_ref_age_ms is not None and max_ref_age_ms <= 0:
        raise ValueError("set_iceberg_ref: max_ref_age_ms must be positive")
    import time as _time

    meta = _load_metadata(path)
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    if sid in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot to reference")
    if not any(s["snapshot-id"] == sid for s in meta.get("snapshots", [])):
        raise ValueError(
            f"{path}: snapshot {sid} does not exist (expired or never "
            "committed) — a ref must point at retained history"
        )
    meta = dict(meta)
    refs = dict(meta.get("refs") or {})
    refs[name] = {"snapshot-id": sid, "type": ref_type}
    if max_ref_age_ms is not None:
        refs[name]["max-ref-age-ms"] = int(max_ref_age_ms)
    meta["refs"] = refs
    meta["last-updated-ms"] = int(_time.time() * 1000)
    _swap_metadata(path, meta)
    return sid


def drop_iceberg_ref(path: str, name: str) -> None:
    """Remove a named ref; its snapshot becomes expirable again."""
    import time as _time

    meta = _load_metadata(path)
    refs = dict(meta.get("refs") or {})
    if name not in refs:
        raise ValueError(
            f"{path}: no ref {name!r} (have {sorted(refs) or 'none'})"
        )
    del refs[name]
    meta = dict(meta)
    meta["refs"] = refs
    meta["last-updated-ms"] = int(_time.time() * 1000)
    _swap_metadata(path, meta)


def fast_forward_iceberg(path: str, target: str, source: str) -> int:
    """PUBLISH (the third WAP step, spec §Refs): fast-forward ref
    ``target`` — or the literal ``"main"`` — to ``source``'s head,
    permitted only when the target head is an ANCESTOR of the source
    head (parent-snapshot-id chain walk): a fast-forward never discards
    commits, so independently-advanced (diverged) refs refuse — rebase
    by re-writing the audit branch, or rollback main first. Moving main
    updates ``current-snapshot-id`` AND appends a snapshot-log entry so
    timestamp time travel resolves "now" to the published state. One
    metadata commit, zero data IO. Returns the new head snapshot id."""
    import time as _time

    meta = _load_metadata(path)
    refs = dict(meta.get("refs") or {})
    src_head = resolve_iceberg_ref(meta, source)
    if target == "main":
        tgt_head = meta.get("current-snapshot-id")
        tgt_head = None if tgt_head in (None, -1) else tgt_head
    else:
        if target not in refs:
            raise ValueError(
                f"{path}: no ref {target!r} (have {sorted(refs) or 'none'})"
            )
        if refs[target].get("type") != "branch":
            raise ValueError(
                f"{path}: ref {target!r} is a TAG — tags pin history and "
                "cannot be fast-forwarded"
            )
        tgt_head = refs[target]["snapshot-id"]
    if tgt_head == src_head:
        return src_head  # already published — idempotent no-op
    by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if src_head not in by_id:
        raise ValueError(
            f"{path}: source head {src_head} is not a retained snapshot"
        )
    node: int | None = src_head
    ok = tgt_head is None
    seen: set = set()
    while not ok and node is not None and node not in seen:
        seen.add(node)
        node = by_id.get(node, {}).get("parent-snapshot-id")
        ok = node == tgt_head
    if not ok:
        raise ValueError(
            f"{path}: {target!r} (head {tgt_head}) is not an ancestor of "
            f"{source!r} (head {src_head}) — the refs diverged; "
            "fast-forward would discard commits"
        )
    now_ms = int(_time.time() * 1000)
    meta = dict(meta)
    if target == "main":
        meta["current-snapshot-id"] = src_head
        meta["snapshot-log"] = list(meta.get("snapshot-log") or []) + [
            {"timestamp-ms": now_ms, "snapshot-id": src_head}
        ]
        if refs.get("main"):
            refs["main"] = {"snapshot-id": src_head, "type": "branch"}
    else:
        refs[target] = {"snapshot-id": src_head, "type": "branch"}
    if refs:
        meta["refs"] = refs
    meta["last-updated-ms"] = now_ms
    _swap_metadata(path, meta)
    return src_head


def resolve_iceberg_ref(meta: dict, ref: str) -> int:
    """Ref name -> snapshot id, fail-loud on unknown names."""
    refs = meta.get("refs") or {}
    if ref not in refs:
        raise ValueError(
            f"unknown ref {ref!r} (have {sorted(refs) or 'none'})"
        )
    return refs[ref]["snapshot-id"]


def rollback_iceberg(
    path: str,
    snapshot_id: int | None = None,
    ref: str | None = None,
    as_of_ms: int | None = None,
) -> int:
    """ROLLBACK: make a RETAINED older snapshot current again — Iceberg's
    twin of ``restore_delta`` (spec §Snapshots: the current snapshot is
    just the ``current-snapshot-id`` pointer; moving it is one metadata
    commit, zero data IO at any table size). The rolled-past snapshots
    stay in ``snapshots`` (auditable, re-rollback-able) until expiration;
    the ``snapshot-log`` gains a fresh entry so timestamp time travel
    resolves "now" to the restored state, exactly as the spec's
    (timestamp → snapshot) history requires.

    Target selection (exactly one): ``snapshot_id``, a ``ref`` name
    (tag or branch — "roll back to the v2024.08 training set"), or
    ``as_of_ms`` (newest snapshot-log entry at or before that time).
    Fail-loud when the target was expired — then its manifests are gone
    and no pointer move can bring the data back. A no-op rollback (target
    already current) returns without committing. Returns the snapshot id
    made current.
    """
    import time as _time

    chosen = [v is not None for v in (snapshot_id, ref, as_of_ms)]
    if sum(chosen) != 1:
        raise ValueError(
            "rollback_iceberg: pass exactly one of snapshot_id | ref | as_of_ms"
        )
    meta = _load_metadata(path)
    if ref is not None:
        snapshot_id = resolve_iceberg_ref(meta, ref)
    elif as_of_ms is not None:
        log = meta.get("snapshot-log") or []
        eligible = [e for e in log if e["timestamp-ms"] <= as_of_ms]
        if not eligible:
            raise ValueError(
                f"{path}: no snapshot at or before {as_of_ms} in the snapshot-log"
            )
        snapshot_id = max(eligible, key=lambda e: e["timestamp-ms"])["snapshot-id"]
    retained = {s["snapshot-id"] for s in meta.get("snapshots", [])}
    if snapshot_id not in retained:
        raise ValueError(
            f"{path}: snapshot {snapshot_id} is not retained (expired or "
            "never committed) — rollback needs its manifests to still exist"
        )
    if meta.get("current-snapshot-id") == snapshot_id:
        return snapshot_id
    meta = dict(meta)
    meta["current-snapshot-id"] = snapshot_id
    meta["snapshot-log"] = list(meta.get("snapshot-log") or []) + [
        {"timestamp-ms": int(_time.time() * 1000), "snapshot-id": snapshot_id}
    ]
    meta["last-updated-ms"] = int(_time.time() * 1000)
    _swap_metadata(path, meta)
    return snapshot_id


def clone_iceberg(src: str, dst: str) -> int:
    """SHALLOW CLONE an Iceberg table: Iceberg metadata references
    manifests and data files by ABSOLUTE URI, so a clone is one new
    metadata file — the source's snapshots/schemas/specs/refs under a
    fresh table-uuid and location. Zero bytes copied, any table size.

    Isolation: appends/deletes/updates on the clone write THEIR manifests
    and data under the clone's own directories (every writer stages into
    ``location``); expire_iceberg_snapshots and remove_orphan_files are
    root-guarded — maintenance on the clone can only delete bytes under
    the clone's root, never the source's (the mirror hazard — expiring
    SOURCE history the clone still references — is the documented
    shallow-clone trade, same as Delta's). Fail-loud: dst exists, src not
    an Iceberg table. Returns the clone's current snapshot id."""
    import time as _time
    import uuid

    if not is_iceberg_table(src):
        raise ValueError(f"{src}: not an Iceberg table")
    if os.path.exists(os.path.join(dst, "metadata")):
        raise ValueError(f"{dst}: already an Iceberg table — clone refuses")
    meta = dict(_load_metadata(src))
    src_abs = os.path.abspath(src)
    # re-root every RELATIVE manifest-list reference (this module writes
    # absolute file: URIs, but be robust to relative ones)
    for s in meta.get("snapshots", []):
        ml = s.get("manifest-list", "")
        if ml and "://" not in ml and not ml.startswith(("file:", os.sep)):
            s["manifest-list"] = f"file:{os.path.join(src_abs, ml)}"
    meta["table-uuid"] = str(uuid.uuid4())
    meta["location"] = dst
    meta["last-updated-ms"] = int(_time.time() * 1000)
    meta_dir = os.path.join(dst, "metadata")
    os.makedirs(meta_dir)
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    cur = meta.get("current-snapshot-id")
    return cur if cur not in (None, -1) else -1


def expire_iceberg_snapshots(
    path: str, keep: int = 1, older_than_ms: int | None = None
) -> dict[str, list[str]]:
    """Snapshot expiration — Iceberg's table-maintenance twin of Delta
    vacuum + log cleanup: keep only the newest ``keep`` snapshots, write a
    new metadata version without the expired ones, and delete every file
    only they referenced (their manifest lists, manifests, and data files
    not live in any kept snapshot). Without this, an append-every-minute
    table accumulates unbounded metadata AND unbounded dead data bytes.

    ``older_than_ms`` mirrors the real action's ``expire_older_than``: a
    snapshot is only expirable when its timestamp is strictly below the
    cutoff, so ``keep`` becomes the floor ("retain at least N, and
    nothing newer than the retention window goes away").

    Driver-side and metadata-sized (same walk the reader does); the
    deletes are local-filesystem here, object-store deletes in production.
    Incremental reads FROM an expired snapshot fail loudly afterwards
    (snapshot id no longer in metadata) — same honesty contract as the
    Delta cleanup path. Returns {"snapshots": [...ids], "files": [...]}.
    """
    import time as _time
    import uuid

    meta = _load_metadata(path)
    snapshots = sorted(meta.get("snapshots", []), key=lambda s: s["snapshot-id"])
    if keep < 1:
        raise ValueError("expire_iceberg_snapshots: keep must be >= 1")
    # --- per-ref retention (spec §Refs, max-ref-age-ms; round 8) ---
    # a ref whose referenced snapshot is older than the ref's own
    # max-ref-age-ms ages OUT here, before protection is computed: the
    # ref disappears from the new metadata and its snapshot falls under
    # the normal keep/older_than policy. This is how WAP audit branches
    # and nightly tags expire on their own schedule; 'main' never ages.
    now_ms = int(_time.time() * 1000)
    _sn_by_id = {s["snapshot-id"]: s for s in snapshots}
    aged_refs: list[str] = []
    live_refs: dict = {}
    for _rname, _r in (meta.get("refs") or {}).items():
        _cap = _r.get("max-ref-age-ms")
        _snap = _sn_by_id.get(_r.get("snapshot-id"))
        if (
            _rname != "main"
            and _cap is not None
            and _snap is not None
            and now_ms - int(_snap.get("timestamp-ms") or now_ms) > int(_cap)
        ):
            aged_refs.append(_rname)
        else:
            live_refs[_rname] = _r
    if aged_refs:
        meta = dict(meta)
        meta["refs"] = live_refs

    def _finish_no_expire() -> dict:
        # nothing to expire, but aged-out refs still commit their removal
        if aged_refs:
            _swap_metadata(path, meta)
        return {"snapshots": [], "files": [], "refs": aged_refs}

    if len(snapshots) <= keep:
        return _finish_no_expire()
    kept, expired = snapshots[-keep:], snapshots[:-keep]
    if older_than_ms is not None:
        young = [
            s for s in expired if s.get("timestamp-ms", 0) >= older_than_ms
        ]
        if young:
            kept = young + kept
            expired = [s for s in expired if s not in young]
            if not expired:
                return _finish_no_expire()
    # REFS protect their snapshots (spec §Refs retention): a tagged or
    # branched snapshot survives expiration until the ref is dropped —
    # tagging IS the mechanism for keeping a training-set snapshot alive
    ref_ids = {
        r.get("snapshot-id") for r in (meta.get("refs") or {}).values()
    }
    # a BRANCH additionally protects its UNPUBLISHED ancestor chain (the
    # commits not reachable from main): fast_forward_iceberg proves
    # ancestry by walking parent ids, and expiring an intermediate audit
    # commit would break the publish of work in progress. Shared
    # (already-published) history expires under the normal policy, so the
    # protection is bounded by the branch's own unmerged length.
    _by_id = {s["snapshot-id"]: s for s in snapshots}

    def _chain(head):
        seen: set = set()
        while head in _by_id and head not in seen:
            seen.add(head)
            head = _by_id[head].get("parent-snapshot-id")
        return seen

    _main_chain = _chain(meta.get("current-snapshot-id"))
    for _r in (meta.get("refs") or {}).values():
        if _r.get("type") == "branch":
            ref_ids |= _chain(_r.get("snapshot-id")) - _main_chain
    # the CURRENT snapshot is always protected: after a rollback it can be
    # an OLDER id than the newest `keep`, and expiring it would leave
    # current-snapshot-id dangling (unreadable table)
    ref_ids.add(meta.get("current-snapshot-id"))
    protected = [s for s in expired if s["snapshot-id"] in ref_ids]
    if protected:
        expired = [s for s in expired if s["snapshot-id"] not in ref_ids]
        kept = protected + kept
        if not expired:
            return _finish_no_expire()

    def _snapshot_refs(snap: dict) -> tuple[set[str], set[str]]:
        """(metadata files, data files) one snapshot references."""
        mlist = _localize(snap["manifest-list"], path)
        meta_files, data_files = {mlist}, set()
        for entry in avro_lite.read_container(mlist):
            mp = _localize(entry["manifest_path"], path)
            meta_files.add(mp)
            for m in avro_lite.read_container(mp):
                if m.get("status") != _STATUS_DELETED:
                    data_files.add(_localize(m["data_file"]["file_path"], path))
        return meta_files, data_files

    kept_meta: set[str] = set()
    kept_data: set[str] = set()
    for s in kept:
        mf, df_ = _snapshot_refs(s)
        kept_meta |= mf
        kept_data |= df_
    doomed_files: set[str] = set()
    for s in expired:
        mf, df_ = _snapshot_refs(s)
        doomed_files |= (mf - kept_meta) | (df_ - kept_data)

    # new metadata version: kept snapshots only (atomic rename commit)
    mp = latest_metadata_path(path)
    head = os.path.basename(mp).split(".metadata.json")[0].lstrip("v").split("-")[0]
    prior_version = int(head) if head.isdigit() else 0
    meta["snapshots"] = kept
    kept_ids = {s["snapshot-id"] for s in kept}
    if meta.get("snapshot-log"):
        # spec: the log may only reference retained snapshots
        meta["snapshot-log"] = [
            e for e in meta["snapshot-log"] if e["snapshot-id"] in kept_ids
        ]
    if meta.get("statistics"):
        # Puffin statistics ride their snapshot: entries for expired
        # snapshots drop from the metadata and their files join the
        # delete set (they are this table's bytes, never shared)
        dropped_stats = [
            e
            for e in meta["statistics"]
            if e.get("snapshot-id") not in kept_ids
        ]
        meta["statistics"] = [
            e
            for e in meta["statistics"]
            if e.get("snapshot-id") in kept_ids
        ]
        # compaction re-keys entries onto the SAME Puffin file — only
        # delete a file no kept entry still references
        kept_stats = {
            _localize(e["statistics-path"], path)
            for e in meta["statistics"]
        }
        for e in dropped_stats:
            p = _localize(e["statistics-path"], path)
            if p not in kept_stats:
                doomed_files.add(p)
    meta_dir = os.path.join(path, "metadata")
    new_version = prior_version + 1
    final_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
    tmp = os.path.join(meta_dir, f".v{new_version}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    if os.path.exists(final_path):
        os.remove(tmp)
        raise RuntimeError(
            f"{path}: metadata v{new_version} was committed concurrently"
        )
    os.rename(tmp, final_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_version))
    # a SHALLOW CLONE's snapshots reference the SOURCE's manifests and
    # data by absolute path — expiration on the clone may only delete
    # bytes under its OWN root, never reach into the source table
    root = os.path.abspath(path)
    deletable = [
        f
        for f in sorted(doomed_files)
        if os.path.commonpath([root, os.path.abspath(f)]) == root
    ]
    for f in deletable:
        if os.path.exists(f):
            os.remove(f)
    return {
        "snapshots": [s["snapshot-id"] for s in expired],
        "files": deletable,
        "refs": aged_refs,
    }


def remove_orphan_files(
    path: str, older_than_ms: int | None = None, dry_run: bool = False
) -> list[str]:
    """Iceberg's ``remove_orphan_files`` maintenance action: delete files
    under the table location that NO retained snapshot references —
    leftovers of crashed writes (staged parquet that never made a commit,
    abandoned ``_staging_*`` dirs). Complements snapshot expiration,
    which only collects files that expired snapshots DID reference.

    ``older_than_ms`` (epoch millis) guards in-flight writes: files newer
    than the cutoff are kept even when unreferenced — the same guard the
    real action enforces, because a concurrent writer's staged files are
    indistinguishable from orphans until its commit lands. Default: one
    hour ago. ``dry_run`` lists without deleting. Driver-side,
    O(#files + #snapshot refs) — metadata work, no data reads."""
    import shutil
    import time as _time

    if not is_iceberg_table(path):
        raise ValueError(f"{path}: not an Iceberg table")
    cutoff = (
        older_than_ms
        if older_than_ms is not None
        else int(_time.time() * 1000) - 3_600_000
    )
    meta = _load_metadata(path)
    live: set[str] = set()
    for snap in meta.get("snapshots", []):
        mlist = _localize(snap["manifest-list"], path)
        live.add(os.path.realpath(mlist))
        for entry in avro_lite.read_container(mlist):
            mp = _localize(entry["manifest_path"], path)
            live.add(os.path.realpath(mp))
            for m in avro_lite.read_container(mp):
                live.add(
                    os.path.realpath(_localize(m["data_file"]["file_path"], path))
                )
    # deletion-vector/extra blobs under the table root never appear in
    # manifests for iceberg; only data/ and stray staging dirs are swept
    orphans: list[str] = []
    data_dir = os.path.join(path, "data")
    if os.path.isdir(data_dir):
        for dirpath, _dirs, names in os.walk(data_dir):
            for n in names:
                f = os.path.join(dirpath, n)
                if os.path.realpath(f) in live:
                    continue
                if os.path.getmtime(f) * 1000 >= cutoff:
                    continue
                orphans.append(f)
    stray_dirs = [
        os.path.join(path, d)
        for d in os.listdir(path)
        if d.startswith("_staging_")
        and os.path.getmtime(os.path.join(path, d)) * 1000 < cutoff
    ]
    if not dry_run:
        for f in orphans:
            os.remove(f)
        for d in stray_dirs:
            shutil.rmtree(d, ignore_errors=True)
    return sorted(orphans + stray_dirs)


def _current_schema(meta: dict) -> dict:
    sid = meta.get("current-schema-id", 0)
    return next(
        (s for s in meta.get("schemas", []) if s.get("schema-id") == sid),
        meta.get("schema") or {},
    )


def _prune_data_entries(
    data: list[dict], meta: dict, where: str
) -> tuple[list[dict], int]:
    """Scan-planning file pruning (spec §Scan Planning): drop data files
    whose manifest stats (identity-partition tuple, lower/upper bounds,
    null counts) prove the predicate cannot match. Each entry is rendered
    into the Delta-shaped stats dict and evaluated by io/skipping's
    conservative conjunct evaluator — one evaluator, both formats, same
    fail-open guarantees. Returns (kept, skipped_count)."""
    from . import skipping

    conjuncts = skipping.parse_conjuncts(where)
    if not conjuncts:
        return data, 0
    fields = [
        f for f in _current_schema(meta).get("fields", [])
        if isinstance(f.get("type"), str)
    ]
    if not fields:
        return data, 0
    fid_to_field = {f["id"]: f for f in fields}
    schema_types = {
        f["name"]: _ICEBERG_TO_SPARK[f["type"]]
        for f in fields
        if f["type"] in _ICEBERG_TO_SPARK
    }
    # LTZ-timestamp conjuncts mix timezone frames outside a UTC session;
    # drop them (fail open) rather than risk pruning a live file
    conjuncts = skipping.tz_safe_conjuncts(conjuncts, schema_types)
    if not conjuncts:
        return data, 0
    spec = next(
        (
            s
            for s in meta.get("partition-specs") or []
            if s.get("spec-id") == meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    fid_to_name = {f["id"]: f["name"] for f in fields}
    parsed_spec = []
    for f in spec.get("fields") or []:
        t, p = _parse_transform_spec_name(f.get("transform", "identity"))
        parsed_spec.append(
            {
                "transform": t,
                "source": fid_to_name.get(f.get("source-id"), f["name"]),
                "param": p,
                "name": f["name"],
            }
        )
    part_cols = [f["name"] for f in parsed_spec if f["transform"] == "identity"]
    transform_fields = [f for f in parsed_spec if f["transform"] != "identity"]
    ice_type = {f["name"]: f["type"] for f in fields}

    def _kv(entry_list):
        return {kv["key"]: kv["value"] for kv in (entry_list or [])}

    def _transform_bounds(pf: dict, v):
        """(lo, hi) SOURCE-column bounds implied by one partition value —
        JSON-style values for the shared evaluator; None bound = unknown."""
        try:
            return _transform_bounds_unguarded(pf, v)
        except (ValueError, OverflowError, TypeError):
            # corrupt / far-future partition value (e.g. a year ordinal
            # outside datetime's range): fail OPEN — unknown bounds keep
            # the file, matching the pruner's conservative contract
            return None, None

    def _transform_bounds_unguarded(pf: dict, v):
        import datetime as dt

        t, w, src_t = pf["transform"], pf["param"], ice_type.get(pf["source"])
        if t in ("year", "month", "day", "hour"):
            if t == "year":
                lo_ts = dt.datetime(1970 + v, 1, 1)
                hi_ts = dt.datetime(1971 + v, 1, 1) - dt.timedelta(microseconds=1)
            elif t == "month":
                y, m = 1970 + v // 12, v % 12 + 1
                lo_ts = dt.datetime(y, m, 1)
                y2, m2 = (y + 1, 1) if m == 12 else (y, m + 1)
                hi_ts = dt.datetime(y2, m2, 1) - dt.timedelta(microseconds=1)
            elif t == "day":
                lo_ts = dt.datetime(1970, 1, 1) + dt.timedelta(days=v)
                hi_ts = lo_ts + dt.timedelta(days=1, microseconds=-1)
            else:
                lo_ts = dt.datetime(1970, 1, 1) + dt.timedelta(hours=v)
                hi_ts = lo_ts + dt.timedelta(hours=1, microseconds=-1)
            if src_t == "date":
                return lo_ts.date().isoformat(), hi_ts.date().isoformat()
            return (
                lo_ts.isoformat(sep=" ", timespec="microseconds"),
                hi_ts.isoformat(sep=" ", timespec="microseconds"),
            )
        if t == "truncate":
            if src_t == "string":
                return v, None  # prefix: a valid min; max needs char surgery
            return v, v + w - 1
        return None, None  # bucket: no interval form (handled separately)

    def _bucket_hash(litval, domain: str):
        """The Iceberg bucket hash of a coerced literal (the unsigned
        murmur value pre-modulo), or None when un-hashable."""
        import datetime as dt

        if domain == "str":
            return murmur3_32_string(litval)
        if domain == "num":
            return murmur3_32_long(litval) if isinstance(litval, int) else None
        if domain == "date":
            return murmur3_32_long((litval - dt.date(1970, 1, 1)).days)
        if domain == "ts":
            delta = litval - dt.datetime(1970, 1, 1)
            micros = (
                delta.days * 86_400 + delta.seconds
            ) * 1_000_000 + delta.microseconds
            return murmur3_32_long(micros)
        return None

    def _bucket_may_match(d: dict) -> bool:
        """False when a bucket partition value refutes an equality/IN
        conjunct on the bucket's SOURCE column."""
        pv = d.get("partition") or {}
        for pf in transform_fields:
            if pf["transform"] != "bucket" or pf["name"] not in pv:
                continue
            bucket_v = pv[pf["name"]]
            if bucket_v is None:
                continue
            src = pf["source"]
            spark_t = schema_types.get(src)
            if spark_t is None:
                continue
            for col, op, lit in conjuncts:
                if col != src or op not in ("=", "in"):
                    continue
                lits = lit if op == "in" else [lit]
                verdicts = []
                for lt in lits:
                    from . import skipping as _sk

                    c = _sk._coerce(lt[0], lt[1], spark_t)
                    hv = _bucket_hash(c[0], c[1]) if c else None
                    if hv is None:
                        verdicts.append(True)  # un-hashable literal: keep
                        continue
                    verdicts.append(
                        (hv & 0x7FFFFFFF) % pf["param"] == bucket_v
                    )
                if not any(verdicts):
                    return False
        return True

    def _as_add(d: dict) -> dict:
        mins: dict = {}
        maxs: dict = {}
        nulls: dict = {}
        for fid, n in _kv(d.get("null_value_counts")).items():
            f = fid_to_field.get(fid)
            if f is not None:
                nulls[f["name"]] = n
        for target, raw_map, is_min in (
            (mins, _kv(d.get("lower_bounds")), True),
            (maxs, _kv(d.get("upper_bounds")), False),
        ):
            for fid, b in raw_map.items():
                f = fid_to_field.get(fid)
                if f is None:
                    continue
                v = _decode_bound(b, f["type"])
                j = skipping._json_stat_value(v, is_min=is_min)
                if j is not None:
                    target[f["name"]] = j
        # a TRANSFORM partition value implies SOURCE-column bounds for the
        # whole file (one partition tuple per file): day(ts)=19722 means
        # every ts is inside that day. Real footer bounds are tighter, so
        # they win when present; a NULL partition value means every source
        # value in the file is null.
        pv_raw = d.get("partition") or {}
        for pf in transform_fields:
            if pf["name"] not in pv_raw:
                continue
            v = pv_raw[pf["name"]]
            src = pf["source"]
            if v is None:
                if d.get("record_count") is not None and src not in nulls:
                    nulls[src] = d["record_count"]
                continue
            lo, hi = _transform_bounds(pf, v)
            if lo is not None and src not in mins:
                mins[src] = lo
            if hi is not None and src not in maxs:
                maxs[src] = hi
        stats: dict = {}
        if d.get("record_count") is not None:
            stats["numRecords"] = d["record_count"]
        if mins:
            stats["minValues"] = mins
        if maxs:
            stats["maxValues"] = maxs
        if nulls:
            stats["nullCount"] = nulls
        pv = {
            c: (
                None
                if v is None
                # identity DATE tuples hold days-from-epoch ints; the
                # shared evaluator compares date columns in ISO form
                else _days_to_iso(v)
                if ice_type.get(c) == "date"
                else str(v)
            )
            for c, v in (d.get("partition") or {}).items()
        }
        return {"stats": stats or None, "partitionValues": pv}

    _compiled = skipping.compile_conjuncts(conjuncts, schema_types, part_cols)
    kept = [
        d
        for d in data
        if skipping._compiled_may_match(_compiled, _as_add(d))
        and _bucket_may_match(d)
    ]
    return kept, len(data) - len(kept)


def iceberg_scan_report(
    path: str, where: str, snapshot_id: int | None = None
) -> dict:
    """Dry-run the Iceberg scan-planning pruner — the twin of
    lakehouse.skipping_report. Driver-side metadata only."""
    from . import skipping

    meta = _load_metadata(path)
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError(f"{path}: table has no current snapshot")
    data, _deletes = _snapshot_scan_plan(meta, snapshot_id, path)
    kept, skipped = _prune_data_entries(data, meta, where)
    return {
        "total_files": len(data),
        "kept_files": len(kept),
        "skipped_files": skipped,
        "eligible": skipping.parse_conjuncts(where) is not None,
    }


def _read_nested_renamed(
    spark: SparkSession,
    paths: list[str],
    declared,
    meta: dict,
    want_meta: bool,
) -> DataFrame:
    """Scan leg for tables after an INNER struct-member rename
    (rename_iceberg_nested_field): group files by their footers' full
    fid -> physical-name map (members included), scan each group under
    the group's PHYSICAL schema, and rebuild renamed structs
    RECURSIVELY (any depth — round 14) back to declared member names.
    Null structs stay null at every level (the rebuild is guarded — a
    bare F.struct would turn them into rows of nulls)."""
    from functools import reduce as _reduce

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    from .lakehouse import _footer_fid_maps

    ice_by_name = {
        f["name"]: f for f in _current_schema(meta).get("fields", [])
    }

    # FULL-tree fid maps (struct members included) — driver loop below
    # the threshold, one Spark job above it (VERDICT r13 item 1: this
    # was the scan path's last O(#files) sequential driver loop)
    fmaps = _footer_fid_maps(paths, spark=spark, nested=True)
    groups: dict[tuple, list[str]] = {}
    maps: dict[tuple, dict[int, str]] = {}
    for p in paths:
        m = fmaps[p]
        if m is None:
            raise NotImplementedError(
                f"{p}: footer is unreadable (VARIANT logical type?) — "
                "inner-rename resolution needs its member field ids"
            )
        k = tuple(sorted(m.items()))
        groups.setdefault(k, []).append(p)
        maps[k] = m

    def _phys_and_expr(spark_t, ice_t, m, col_expr):
        """Recursive rebuild (round 14 — VERDICT r13 item 3): returns
        ``(physical_dataType, rebuilt_expr, diverged)`` for one member.
        Structs recurse to ANY depth — each member's physical name comes
        from the group's fid map, a renamed subtree rebuilds back to
        declared names, and the null-struct guard applies at EVERY level
        (a bare F.struct turns a null struct into a row of nulls).
        Non-struct types pass through: list elements and map entries
        have no names, so they cannot diverge."""
        if (
            isinstance(ice_t, dict)
            and ice_t.get("type") == "struct"
            and isinstance(spark_t, StructType)
        ):
            by_inner = {g2["name"]: g2 for g2 in ice_t.get("fields", [])}
            phys_members: list[StructField] = []
            member_exprs = []
            div = False
            for sf in spark_t.fields:
                ie = by_inner.get(sf.name) or {}
                ip = m.get(ie.get("id"), sf.name)
                pdt, e, d = _phys_and_expr(
                    sf.dataType, ie.get("type"), m, col_expr.getField(ip)
                )
                div = div or d or ip != sf.name
                phys_members.append(StructField(ip, pdt, sf.nullable))
                member_exprs.append(e.alias(sf.name))
            if div:
                rebuilt = F.when(col_expr.isNull(), F.lit(None)).otherwise(
                    F.struct(*member_exprs)
                )
            else:
                rebuilt = col_expr
            return StructType(phys_members), rebuilt, div
        return spark_t, col_expr, False

    branches = []
    for k, gfiles in sorted(groups.items()):
        m = maps[k]
        phys_fields: list[StructField] = []
        exprs = []
        for f in declared.fields:
            e = ice_by_name.get(f.name) or {}
            top_phys = m.get(e.get("id"), f.name)
            pdt, expr, diverged = _phys_and_expr(
                f.dataType, e.get("type"), m, F.col(top_phys)
            )
            phys_fields.append(StructField(top_phys, pdt, f.nullable))
            if diverged or top_phys != f.name:
                exprs.append(expr.alias(f.name))
            else:
                exprs.append(F.col(top_phys))
        g = spark.read.schema(StructType(phys_fields)).parquet(*gfiles)
        cols = list(exprs)
        if want_meta:
            cols.append(F.col("_metadata"))
        branches.append(g.select(*cols))
    return _reduce(lambda a, b: a.unionByName(b), branches)


def _read_parquet_fid(
    spark: SparkSession,
    paths: list[str],
    declared,
    meta: dict,
    want_meta: bool = False,
) -> DataFrame:
    """FIELD-ID-resolved parquet read — the ONE parquet scan leg shared by
    the main snapshot scan, the parquet subset of mixed-format unions,
    incremental change reads and the CDF replay (spec: column identity is
    the field id; after a rename, old files carry the OLD name and a
    name-based ``spark.read.schema(declared)`` silently backfills NULL).
    Files are grouped by their footer's fid->name mapping (O(#files)
    driver footer reads, the same pass manifest-stats planning does);
    each group scans under its own physical schema and projects to the
    current names. Footers without field ids (pre-stamping writers) fall
    back to name resolution, per the spec's name-mapping escape hatch.
    ``want_meta`` materializes ``_metadata`` as a real column BEFORE any
    union (hidden-column resolution does not survive unions)."""
    from functools import reduce as _reduce

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    from .lakehouse import _group_files_by_field_ids

    fid_of = {
        f["name"]: f.get("id") for f in _current_schema(meta).get("fields", [])
    }
    # COLUMN DEFAULTS (spec §Default values, v3): a field with
    # initial-default surfaces the constant — not null — for rows in
    # files written before the field existed. Per footer group the
    # evidence is the field id: stamped footers missing the id provably
    # predate the column; unstamped footers are probed by physical NAME
    # (one extra driver footer read, paid only on defaulted tables).
    dflt_lit = {
        name: _default_parse(ice_t, j, name)
        for _fid, (name, ice_t, j) in _schema_defaults(meta).items()
    }

    def _plain(ps):
        g = (
            spark.read.schema(declared).parquet(*ps)
            if declared is not None
            else spark.read.parquet(*ps)
        )
        return g.select("*", F.col("_metadata")) if want_meta else g

    # _local_path, not urlparse: a raw '#' in the table root would
    # truncate at the fragment and footer-group a nonexistent file
    local = [_local_path(p) for p in paths]
    _fid_read = (
        meta.get("properties") or {}
    ).get("fsml.field-id-read") == "true"
    if _fid_read and (
        declared is None
        or any(urlparse(p).scheme not in ("", "file") for p in paths)
    ):
        # the property marks name resolution as UNSAFE (an inner rename
        # happened — pre-rename files carry old member names, so a
        # name-based scan silently reads NULL struct members). If the
        # member-resolving branch cannot run, refuse; never fall
        # through to _plain/name resolution (ADVICE r13).
        raise NotImplementedError(
            "table requires field-id member resolution "
            "(fsml.field-id-read) but the scan cannot run it: "
            + (
                "declared schema is unmappable"
                if declared is None
                else "non-local path scheme"
            )
        )
    if _fid_read:
        # INNER-RENAME RESOLUTION (round 13, rename_iceberg_nested_field):
        # files are grouped by their footers' FULL fid -> physical-name
        # map (struct members included — the rename commit proved every
        # live file stamps them), each group scans under a PHYSICAL
        # schema derived from that map, and a RECURSIVE struct rebuild
        # projects members back to declared names at any depth. All name-based
        # mechanics — no fieldId.read session conf, whose id metadata
        # Spark's nested-schema pruning silently DROPS (measured:
        # projected inner fields read null under it).
        if dflt_lit:
            raise NotImplementedError(
                "inner-renamed tables cannot combine with column "
                f"defaults (defaults on {sorted(dflt_lit)})"
            )
        return _read_nested_renamed(
            spark, local, declared, meta, want_meta
        )
    if declared is None or any(
        urlparse(p).scheme not in ("", "file") for p in paths
    ):
        if dflt_lit:
            raise NotImplementedError(
                "iceberg column defaults require a declared-schema local "
                f"scan (defaults on {sorted(dflt_lit)}; declared="
                f"{'mapped' if declared is not None else 'unmappable'})"
            )
        return _plain(paths)

    def _branch(gfiles, src, use_default):
        """One scan branch: read non-default fields under the group's
        physical names, project defaults as typed literals."""
        if not use_default and all(
            src[f.name] == f.name for f in declared.fields
        ):
            return _plain(gfiles)
        physical = StructType(
            [
                StructField(src[f.name], f.dataType, f.nullable)
                for f in declared.fields
                if f.name not in use_default
            ]
        )
        g = spark.read.schema(physical).parquet(*gfiles)
        cols = [
            F.lit(dflt_lit[f.name]).cast(f.dataType).alias(f.name)
            if f.name in use_default
            else F.col(src[f.name]).alias(f.name)
            for f in declared.fields
        ]
        if want_meta:
            cols.append(F.col("_metadata"))
        return g.select(*cols)

    nmap = _table_name_mapping(meta)
    branches = []
    for phys_by_fid, gfiles in _group_files_by_field_ids(local, spark=spark):
        if phys_by_fid or not (nmap or dflt_lit):
            subgroups = [(phys_by_fid, gfiles)]
        else:
            # unstamped footers with a NAME MAPPING and/or declared
            # defaults: derive each file's fid -> physical-name map from
            # its footer names (spec §Column Projection: mapped names
            # resolve like field ids; absent fids prove the file
            # predates the column, so defaults apply) and sub-group by
            # it — files sharing a map scan as one stamped-style branch
            import pyarrow.parquet as _pq

            sub: dict[tuple, list[str]] = {}
            for gf in gfiles:
                try:
                    fnames = set(_pq.read_schema(gf).names)
                except Exception:
                    # VARIANT-footer files (pyarrow 16 can't parse the
                    # logical type): the JVM footer reader can — a
                    # driver-side schema probe, no job. Falling back to
                    # "no evidence" instead would resolve by declared
                    # name and silently NULL renamed columns.
                    fnames = set(spark.read.parquet(gf).schema.names)
                if nmap:
                    m = {}
                    for fid, cands in nmap.items():
                        hit = next((n for n in cands if n in fnames), None)
                        if hit is not None:
                            m[fid] = hit
                else:
                    # defaults only, no mapping: name-identity evidence
                    m = {
                        fid_of[f.name]: f.name
                        for f in declared.fields
                        if fid_of.get(f.name) is not None
                        and f.name in fnames
                    }
                sub.setdefault(tuple(sorted(m.items())), []).append(gf)
            subgroups = [(dict(k), v) for k, v in sub.items()]
        for pbf, gf2 in subgroups:
            src = {
                f.name: (
                    pbf.get(fid_of[f.name], f.name)
                    if fid_of.get(f.name) is not None and pbf
                    else f.name
                )
                for f in declared.fields
            }
            use_default = {
                f.name
                for f in declared.fields
                if f.name in dflt_lit
                and pbf
                and fid_of.get(f.name) is not None
                and fid_of[f.name] not in pbf
            }
            branches.append(_branch(gf2, src, use_default))
    return _reduce(lambda a, b: a.unionByName(b), branches)


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    where: str | None = None,
    with_row_identity: bool = False,
    ref: str | None = None,
    _lineage_cols: bool = False,
    _only_paths: "set[str] | None" = None,
) -> DataFrame:
    """Read an Iceberg table: native `format("iceberg")` when a runtime jar
    is on the classpath, else the pure-python metadata walk + distributed
    parquet scan of the live file set.

    Time travel (spec §Snapshots — snapshots are immutable, so reading an
    old one is just planning its file list):

    - ``snapshot_id``: read exactly that snapshot. An EXPIRED snapshot
      (dropped by expire_iceberg_snapshots) fails loudly rather than
      silently serving the current one.
    - ``as_of_ms``: read the snapshot current AS OF that wall-clock — the
      newest entry in ``snapshot-log`` with ``timestamp-ms <= as_of_ms``
      (Iceberg's own timestamp resolution rule). A timestamp older than
      retained history fails loudly.

    Both map onto the native reader's ``snapshot-id`` / ``as-of-timestamp``
    options when the jar is present.

    ``where`` (a SQL predicate string) enables scan-planning DATA
    SKIPPING: identity-partition tuples and the manifests' per-file
    lower/upper bounds (written by this module's writers from parquet
    footers) prune files the predicate provably cannot match BEFORE any
    data IO. Results are identical to ``read_iceberg(...).filter(where)``
    — the predicate is also applied as a normal filter, and the pruner
    fails open on anything it cannot prove (see io/skipping.py, the
    shared evaluator). ``iceberg_scan_report`` dry-runs the pruning.
    """
    if ref is not None:
        # named TAG/BRANCH (spec §Refs): resolve to its snapshot before
        # either read path — 'read the production tag' is the canonical
        # reproducible-training-set consumption
        if snapshot_id is not None or as_of_ms is not None:
            raise ValueError(
                "read_iceberg: pass ref OR snapshot_id/as_of_ms, not both"
            )
        snapshot_id = resolve_iceberg_ref(_load_metadata(path), ref)
    if snapshot_id is not None and as_of_ms is not None:
        raise ValueError("read_iceberg: pass snapshot_id OR as_of_ms, not both")
    if (
        not _lineage_cols
        and _only_paths is None
        and not _nativesrc.known_absent(spark, "iceberg")
    ):
        # lineage scans skip the native-jar attempt: the materialized
        # lineage columns resolve through OUR field-id machinery;
        # subset scans (_only_paths — incremental compaction's selected
        # set) have no native equivalent either
        try:
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            if as_of_ms is not None:
                reader = reader.option("as-of-timestamp", str(as_of_ms))
            native = reader.load(path)
            if with_row_identity:
                from pyspark.sql import functions as F

                native = native.select("*", F.col("_metadata"))
            return native.filter(where) if where else native
        except Exception as exc:
            if (
                "DATA_SOURCE_NOT_FOUND" not in str(exc)
                and "Failed to find" not in str(exc)
            ):
                raise
            # each doomed attempt costs a JVM exception round trip
            # (~0.15-0.4 s); remember the classification for this
            # application so only the first read pays it — memoized on
            # the PRECISE signature only (see io/nativesrc)
            if _nativesrc.is_source_not_found(exc):
                _nativesrc.mark_absent(spark, "iceberg")
    if snapshot_id is not None or as_of_ms is not None:
        meta = _load_metadata(path)
        if as_of_ms is not None:
            # snapshot-log is the authoritative (timestamp -> snapshot)
            # history; fall back to the snapshots' own timestamp-ms when a
            # writer omitted the log
            log = meta.get("snapshot-log") or [
                {"timestamp-ms": s.get("timestamp-ms"), "snapshot-id": s["snapshot-id"]}
                for s in meta.get("snapshots", [])
                if s.get("timestamp-ms") is not None
            ]
            eligible = [e for e in log if e["timestamp-ms"] <= as_of_ms]
            if not eligible:
                raise ValueError(
                    f"{path}: no snapshot at or before timestamp {as_of_ms} "
                    "— older than retained history (or the log is empty)"
                )
            snapshot_id = max(eligible, key=lambda e: e["timestamp-ms"])["snapshot-id"]
    else:
        meta = _load_metadata(path)
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError(f"{path}: table has no current snapshot")
    if _lineage_cols:
        # lineage columns become declared columns for THIS scan: field-id
        # resolution surfaces materialized values, every other file reads
        # null (the read twin of the DML materialization)
        meta = _lineage_meta(meta)
    data, deletes = _snapshot_scan_plan(meta, snapshot_id, path)
    if _only_paths is not None:
        # SUBSET scan (incremental compaction): plan only the named data
        # files; delete masks still apply in full, so the rows produced
        # are exactly the live rows of those files
        data = [d for d in data if d["path"] in _only_paths]
        if not data:
            empty_schema = _declared_spark_schema(meta)
            if empty_schema is not None:
                from pyspark.sql.types import LongType, StringType

                if _lineage_cols:
                    empty_schema = empty_schema.add(
                        "_row_id", LongType()
                    ).add("_last_updated_sequence_number", LongType())
                return local_rows_df(spark, [], empty_schema)
            raise ValueError(f"{path}: _only_paths matched no data files")
    if where:
        # scan-planning DATA SKIPPING: manifest partition tuples + column
        # bounds prune files before any data IO; the predicate is also
        # applied as a normal filter below, so pruning only removes
        # provably-dead reads (identical results to .filter(where))
        data, _skipped = _prune_data_entries(data, meta, where)
        if not data:
            empty_schema = _declared_spark_schema(meta)
            if empty_schema is not None:
                return local_rows_df(spark, [], empty_schema)
    files = [d["path"] for d in data]
    if not files:
        raise ValueError(
            f"{path}: snapshot is empty — parquet fallback cannot "
            "produce a schema-only DataFrame"
        )
    gone = [f for f in files if urlparse(f).scheme in ("", "file") and not os.path.exists(f)]
    if gone:
        raise ValueError(
            f"{path}: snapshot references deleted data files (e.g. "
            f"{os.path.basename(gone[0])}) — history was expired"
        )
    declared = _declared_spark_schema(meta)
    rowfmt_entries: dict[str, list] = {"AVRO": [], "ORC": []}
    unknown_fmt = set()
    for d in data:
        f = d.get("format") or "PARQUET"
        if f in rowfmt_entries:
            rowfmt_entries[f].append(d)
        elif f != "PARQUET":
            unknown_fmt.add(f)
    if unknown_fmt:
        raise NotImplementedError(
            f"{path}: unsupported data-file format(s) {sorted(unknown_fmt)}"
        )
    rowfmt_union = None
    if rowfmt_entries["AVRO"] or rowfmt_entries["ORC"]:
        # NON-PARQUET DATA FILES (AVRO round 8, ORC round 9; partitions +
        # field-id resolution round 9): scanned distributed inside
        # mapInPandas (one task per path batch, payloads never hit the
        # driver) — avro via the shipped pure-python avro_lite reader,
        # orc via pyarrow.orc. Columns resolve by FIELD ID against each
        # file's writer schema (avro field-id attributes / orc iceberg.id
        # type attributes — rename-safe, like the parquet path);
        # identity-partition source columns a file omits backfill from
        # its manifest partition tuple. DELETE content applies (round 9):
        # the readers emit (_fp, _ri) row identity themselves — decode
        # order IS file order, no parquet _metadata needed — position
        # deletes anti-join those, equality deletes apply per-sequence
        # branch under the strictly-older rule.
        #
        # MIXED tables (round 10): the two mask pipelines run
        # independently — position-delete rows key on the TARGET file's
        # path, so each pipeline's anti-join consumes only its own
        # files' rows and the other side's rows simply never match;
        # equality deletes broadcast into both under the same
        # strictly-older sequence rule. The parquet subset falls through
        # to the main path below (field-id reads, identity backfill,
        # per-sequence masks) and the two legs union at exit.
        _fmts = "+".join(k for k, v in rowfmt_entries.items() if v)
        if declared is None:
            raise NotImplementedError(
                f"{path}: {_fmts} data files need a declared schema"
            )
        if deletes or with_row_identity:
            from functools import reduce as _red

            from pyspark.sql import functions as F

            eq = [d for d in deletes if d["kind"] == "eq"]
            pos = [d["path"] for d in deletes if d["kind"] == "pos"]
            id_to_name = _field_id_map(meta)
            want_pos = bool(pos) or with_row_identity
            by_seq: dict[int, dict] = {}
            for fmtk in ("AVRO", "ORC"):
                for d in rowfmt_entries[fmtk]:
                    by_seq.setdefault(
                        d["seq"], {"AVRO": [], "ORC": []}
                    )[fmtk].append(d)
            branches = []
            for seq, groups in sorted(by_seq.items()):
                subs = []
                if groups["AVRO"]:
                    subs.append(
                        _read_avro_data(
                            spark, groups["AVRO"], declared, meta,
                            want_pos=want_pos,
                        )
                    )
                if groups["ORC"]:
                    subs.append(
                        _read_orc_data(
                            spark, groups["ORC"], declared, meta,
                            want_pos=want_pos,
                        )
                    )
                g = _red(lambda a, b: a.unionByName(b), subs)
                for d in eq:
                    if d["seq"] <= seq:
                        continue  # strictly-older: same/newer data lives
                    try:
                        cols = [id_to_name[i] for i in d["equality_ids"]]
                    except KeyError as exc:
                        raise ValueError(
                            f"{path}: equality delete references unknown "
                            f"field id {exc} — schema drift"
                        ) from None
                    keys = _read_eq_delete_keys(
                        spark, d["path"], cols, d["equality_ids"], declared
                    )
                    cond = _red(
                        lambda a, b: a & b,
                        [g[c].eqNullSafe(F.col(f"_eq_{c}")) for c in cols],
                    )
                    g = g.join(keys, cond, "left_anti")
                branches.append(g)
            out = _red(lambda a, b: a.unionByName(b), branches)
            if pos:
                out = _join_out_positions(spark, path, out, pos)
            if with_row_identity:
                # a REAL _metadata(file_path,row_index) struct from the
                # readers' own identity — delete writers and CDF position
                # consumers work unchanged on rowfmt tables. Ordinals are
                # assigned at decode (pre-mask), so a second delete names
                # original file positions, as the spec requires.
                out = out.select(
                    *[f.name for f in declared.fields],
                    F.struct(
                        F.col("_fp").alias("file_path"),
                        F.col("_ri").alias("row_index"),
                    ).alias("_metadata"),
                )
            elif want_pos:
                out = out.drop("_fp", "_ri")
            rowfmt_union = out
        else:
            outs = []
            if rowfmt_entries["AVRO"]:
                outs.append(
                    _read_avro_data(
                        spark, rowfmt_entries["AVRO"], declared, meta
                    )
                )
            if rowfmt_entries["ORC"]:
                outs.append(
                    _read_orc_data(
                        spark, rowfmt_entries["ORC"], declared, meta
                    )
                )
            out = outs[0]
            for o in outs[1:]:
                out = out.unionByName(o)
            rowfmt_union = out
        # the parquet subset (if any) falls through to the main path —
        # field-id resolution, identity backfill and the per-sequence
        # mask pipeline all apply to it exactly as for a pure-parquet
        # table; the rowfmt leg unions back in at exit
        data = [
            d for d in data if (d.get("format") or "PARQUET") == "PARQUET"
        ]
        files = [d["path"] for d in data]
        if not files:
            return (
                rowfmt_union.filter(where) if where else rowfmt_union
            )
    def _read(paths: list[str], want_meta: bool = False) -> DataFrame:
        """Field-id-resolved parquet read — see :func:`_read_parquet_fid`
        (shared with the mixed-format union, incremental changes and the
        CDF replay, so a rename is resolved identically on every leg)."""
        return _read_parquet_fid(spark, paths, declared, meta, want_meta)

    # IDENTITY PARTITION VALUES FROM METADATA (spec §Column Projection):
    # a data file may omit an identity-partitioned source column (Delta
    # conversions and Hive-style foreign writers do); its values then come
    # from the manifest partition tuple. Detection is an O(#files) local
    # footer-schema probe (the same pass field-id grouping already pays);
    # injection is one broadcast join of a (file -> tuple) map, coalesced
    # into the declared column — never a per-partition scan explosion.
    part_backfill: dict[str, dict] = {}
    if declared is not None and all(
        urlparse(p).scheme in ("", "file") for p in files
    ):
        _spec = next(
            (
                s
                for s in meta.get("partition-specs") or []
                if s.get("spec-id") == meta.get("default-spec-id", 0)
            ),
            {"fields": []},
        )
        _f2n = _field_id_map(meta)
        ident = {
            pf["name"]: _f2n.get(pf.get("source-id"), pf["name"])
            for pf in _spec.get("fields") or []
            if _parse_transform_spec_name(pf.get("transform", "identity"))[0]
            == "identity"
        }
        if ident:
            import pyarrow.parquet as _pq

            # join key: the SHORTEST path suffix unique across the
            # snapshot's files (a bare basename collides when one task
            # writes the same part-file name into several partition dirs)
            locals_ = [_local_path(d["path"]) for d in data]
            suffix_k = 0
            for k in range(1, 6):
                keys = {"/".join(lp.split("/")[-k:]) for lp in locals_}
                if len(keys) == len(locals_):
                    suffix_k = k
                    break
            _src_type = {
                f["name"]: f["type"]
                for f in _current_schema(meta).get("fields", [])
            }
            for d, lp in zip(data, locals_):
                try:
                    have = set(_pq.read_schema(lp).names)
                except Exception:
                    continue
                miss = []
                for pname, src in ident.items():
                    if src in have:
                        continue
                    v = (d.get("partition") or {}).get(pname)
                    if v is not None and _src_type.get(src) == "date":
                        # manifest tuple holds days-from-epoch; the LUT
                        # column is a real DateType
                        import datetime as _dt

                        v = _dt.date(1970, 1, 1) + _dt.timedelta(
                            days=int(v)
                        )
                    miss.append((src, v))
                if miss and suffix_k:
                    part_backfill["/".join(lp.split("/")[-suffix_k:])] = dict(
                        miss
                    )

    def _with_rowfmt(df):
        """Union the rowfmt mask leg into the parquet leg (mixed tables,
        round 10). With row identity, the parquet ``_metadata`` hidden
        struct (7 fields) is narrowed to the (file_path, row_index)
        struct the rowfmt readers synthesize — the only fields any
        identity consumer (delete writers, CDF position joins, compact)
        reads — so the union is type-stable."""
        if rowfmt_union is None:
            return df
        if with_row_identity:
            from pyspark.sql import functions as F

            df = df.select(
                *[f.name for f in declared.fields],
                F.struct(
                    F.col("_metadata.file_path").alias("file_path"),
                    F.col("_metadata.row_index").alias("row_index"),
                ).alias("_metadata"),
            )
        return df.unionByName(rowfmt_union)

    pos = [d["path"] for d in deletes if d["kind"] == "pos"]
    eq = [d for d in deletes if d["kind"] == "eq"]
    if not eq:
        df = _read(
            files,
            want_meta=bool(pos) or with_row_identity or bool(part_backfill),
        )
        if part_backfill:
            from pyspark.sql import functions as F
            from pyspark.sql.types import (
                StringType,
                StructField,
                StructType,
            )

            cols = sorted({c for m in part_backfill.values() for c in m})
            dtypes = {f.name: f.dataType for f in declared.fields}
            rows = [
                (fn, *[m.get(c) for c in cols])
                for fn, m in part_backfill.items()
            ]
            lut = local_rows_df(spark, 
                rows,
                StructType(
                    [StructField("_pb_file", StringType(), False)]
                    + [StructField(f"_pb_{c}", dtypes[c], True) for c in cols]
                ),
            )
            key = F.array_join(
                F.slice(
                    # decoded: the lut keys come from manifest paths (raw
                    # on-disk bytes); the URI form would miss on
                    # special-char partition dirs
                    F.split(_decoded_meta_path(files), "/"),
                    -suffix_k,
                    suffix_k,
                ),
                "/",
            )
            df = df.join(
                F.broadcast(lut), key == F.col("_pb_file"), "left"
            )
            df = df.withColumns(
                {c: F.coalesce(F.col(c), F.col(f"_pb_{c}")) for c in cols}
            ).drop("_pb_file", *[f"_pb_{c}" for c in cols])
            if not (bool(pos) or with_row_identity):
                df = df.drop("_metadata")
                df = df.select(*[f.name for f in declared.fields])
        if pos:
            df = _apply_position_deletes(spark, path, df, pos, files)
            if not with_row_identity:
                df = df.drop("_metadata")
        df = _with_rowfmt(df)
        return df.filter(where) if where else df
    # EQUALITY deletes are sequence-scoped (strictly older data only), so
    # the scan unions one branch per distinct data sequence number, each
    # anti-joined against exactly the delete sets that apply to it. The
    # branch count equals the number of retained append commits —
    # planning-phase metadata, not data volume; every anti-join side is a
    # small broadcast of key values.
    from functools import reduce

    from pyspark.sql import functions as F

    id_to_name = _field_id_map(meta)
    by_seq: dict[int, list[str]] = {}
    for d in data:
        by_seq.setdefault(d["seq"], []).append(d["path"])
    branches = []
    for seq, paths in sorted(by_seq.items()):
        g = _read(paths, want_meta=bool(pos) or with_row_identity)
        if pos:
            g = g.withColumn("_fp", _decoded_meta_path(paths)).withColumn(
                "_ri", F.col("_metadata.row_index")
            )
        for d in eq:
            if d["seq"] <= seq:
                continue  # strictly-older rule: same/newer data survives
            try:
                cols = [id_to_name[i] for i in d["equality_ids"]]
            except KeyError as exc:
                raise ValueError(
                    f"{path}: equality delete references unknown field id "
                    f"{exc} — schema drift"
                ) from None
            keys = _read_eq_delete_keys(
                spark, d["path"], cols, d["equality_ids"], g.schema
            )
            cond = reduce(
                lambda a, b: a & b,
                [g[c].eqNullSafe(F.col(f"_eq_{c}")) for c in cols],
            )
            g = g.join(keys, cond, "left_anti")
        branches.append(g)
    df = reduce(lambda a, b: a.unionByName(b), branches)
    if pos:
        df = _join_out_positions(spark, path, df, pos).drop("_fp", "_ri")
    if not with_row_identity and "_metadata" in df.columns:
        df = df.drop("_metadata")
    df = _with_rowfmt(df)
    return df.filter(where) if where else df


def enable_iceberg_row_lineage(path: str) -> int:
    """Turn on ROW LINEAGE for an existing v2 table (spec §Row Lineage —
    the v3 feature, implemented here over v2 metadata): stamps
    ``next-row-id`` so every subsequent commit allocates stable row-id
    blocks to its new data files. Rows in files written BEFORE enabling
    read a null ``_row_id`` until a rewrite (compact_iceberg) assigns
    them ids — the spec's upgrade semantics; enabling at creation
    (``write_iceberg(row_lineage=True)``) gives every row an id from the
    start. Returns the new metadata version."""
    meta = _load_metadata(path)
    if meta.get("format-version", 1) < 2:
        raise NotImplementedError(
            f"{path}: row lineage needs format-version 2"
        )
    if _lineage_enabled(meta):
        head = (
            os.path.basename(latest_metadata_path(path))
            .split(".metadata.json")[0]
            .lstrip("v")
            .split("-")[0]
        )
        return int(head) if head.isdigit() else 0
    meta["next-row-id"] = 0
    return _swap_metadata(path, meta)


def read_iceberg_row_ids(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    keep_identity: bool = False,
    _only_paths: "set[str] | None" = None,
) -> DataFrame:
    """The delete-masked scan plus the two ROW-LINEAGE metadata columns
    (spec §Row Lineage; the Iceberg twin of
    ``lakehouse.read_delta_row_ids``):

    - ``_row_id``: coalesce(materialized column, file.first_row_id +
      position) — stable across UPDATE/MERGE/compaction because rewrites
      MATERIALIZE surviving ids; null for rows in files from before
      lineage was enabled.
    - ``_last_updated_sequence_number``: coalesce(materialized column,
      file's data sequence number) — the commit that last touched the
      row.

    Works on parquet, AVRO and ORC data files alike: the materialized
    columns carry the spec's reserved field ids and resolve through the
    same field-id machinery as user columns. The per-file
    (first_row_id, seq) map is driver-built O(#files) — the same
    planning metadata every scan walks — and broadcast-joined on the
    row's file identity, so the data path stays fully distributed.
    ``keep_identity`` retains the ``_metadata`` struct for callers that
    also need (file, position) identity."""
    from pyspark.sql import functions as F

    meta = _load_metadata(path)
    if not _lineage_enabled(meta):
        raise ValueError(
            f"{path}: row lineage is not enabled — "
            "write_iceberg(row_lineage=True) at creation or "
            "enable_iceberg_row_lineage(path) first"
        )
    df = read_iceberg(
        spark, path, snapshot_id=snapshot_id, as_of_ms=as_of_ms,
        with_row_identity=True, _lineage_cols=True, _only_paths=_only_paths,
    )
    sid = snapshot_id
    if sid is None and as_of_ms is None:
        sid = meta.get("current-snapshot-id")
    elif sid is None:
        log = meta.get("snapshot-log") or []
        eligible = [e for e in log if e["timestamp-ms"] <= as_of_ms]
        if not eligible:
            raise ValueError(f"{path}: no snapshot at or before {as_of_ms}")
        sid = max(eligible, key=lambda e: e["timestamp-ms"])["snapshot-id"]
    plan, _dels = _snapshot_scan_plan(meta, sid, path)
    mapping = [
        (
            "file:" + os.path.abspath(_localize_decoded(d["path"], path)),
            d.get("first_row_id"),
            int(d["seq"]),
        )
        for d in plan
    ]
    m = local_rows_df(spark, 
        mapping, "_l_fp string, _l_first long, _l_seq long"
    )
    out = (
        df.join(
            F.broadcast(m),
            _decoded_meta_path([p for p, _f, _s in mapping])
            == F.col("_l_fp"),
            "left",
        )
        .withColumn(
            _ROW_ID_COL,
            F.coalesce(
                F.col(_ROW_ID_COL),
                F.col("_l_first") + F.col("_metadata.row_index"),
            ),
        )
        .withColumn(
            _LAST_UPD_COL, F.coalesce(F.col(_LAST_UPD_COL), F.col("_l_seq"))
        )
        .drop("_l_fp", "_l_first", "_l_seq")
    )
    return out if keep_identity else out.drop("_metadata")


def _commit_delete_snapshot(
    path: str,
    prior_meta: dict,
    prior_version: int,
    snap_id: int,
    seq: int,
    now_ms: int,
    del_entry: dict | list[dict] | None,
    operation: str = "delete",
    summary_props: dict | None = None,
    replace: bool = False,
    drop_manifests: "set[str] | None" = None,
) -> int:
    """Shared commit tail for the row-level mutations (both delete
    flavors, and UPDATE's combined delete+data snapshot): build the
    manifest list (prior entries + the new manifest entries, when rows
    matched), append the snapshot + snapshot-log, bump
    last-sequence-number, and swap the metadata version by atomic rename
    (single-writer conflict check). ``del_entry`` is the new
    manifest-list entry (or a list of them — UPDATE commits a delete
    manifest AND a data manifest in ONE snapshot), or None for a
    no-match mutation (the snapshot reuses the prior manifest list).
    ``drop_manifests``: prior manifest-list entries whose (localized)
    manifest_path is in this set are NOT carried — the v3 deletion-vector
    rule that a superseded DV must leave in the same snapshot (its
    manifest is absorbed into the new consolidated one)."""
    import uuid

    meta_dir = os.path.join(path, "metadata")
    cur = prior_meta["current-snapshot-id"]
    prior_snap = next(
        s for s in prior_meta["snapshots"] if s["snapshot-id"] == cur
    )
    new_entries = (
        del_entry if isinstance(del_entry, list)
        else [del_entry] if del_entry is not None
        else []
    )
    # row lineage: a staged data entry carries the advanced next-row-id
    # (ids were assigned when its manifest was written); the commit
    # advances the table counter atomically with the snapshot
    _next_rid = None
    for e in new_entries:
        v = e.pop("_fsml_next_row_id", None)
        if v is not None:
            if _next_rid is not None:
                # two data manifests staged off the same base counter
                # would hold OVERLAPPING id blocks — every commit shape
                # stages at most one (update/merge/overwrite-where)
                raise RuntimeError(
                    f"{path}: multiple data manifests carry row-id "
                    "assignments in one commit — staging bug"
                )
            _next_rid = v
    if new_entries or replace:
        # replace=True: the manifest list holds ONLY the new entries —
        # the full-overwrite / compaction shape; prior snapshots still
        # reference their own manifest lists untouched
        prior_manifests = (
            []
            if replace
            else list(
                avro_lite.read_container(
                    _localize(prior_snap["manifest-list"], path)
                )
            )
        )
        if drop_manifests:
            prior_manifests = [
                e
                for e in prior_manifests
                if _localize(e["manifest_path"], path) not in drop_manifests
            ]
        mlist = os.path.join(meta_dir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
        mf_schema = _manifest_file_schema(2)
        keep = {f["name"] for f in mf_schema["fields"]}
        avro_lite.write_container(
            mlist,
            mf_schema,
            [{k: e.get(k, 0) for k in keep} for e in prior_manifests]
            + [{k: e.get(k, 0) for k in keep} for e in new_entries],
        )
        manifest_list_uri = f"file:{mlist}"
    else:
        manifest_list_uri = prior_snap["manifest-list"]
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": cur,
        "timestamp-ms": now_ms,
        "manifest-list": manifest_list_uri,
        "summary": {"operation": operation, **(summary_props or {})},
        "schema-id": prior_meta.get("current-schema-id", 0),
        "sequence-number": seq,
        **(
            {"first-row-id": int(prior_meta.get("next-row-id", 0))}
            if _lineage_enabled(prior_meta)
            else {}
        ),
    }
    meta = dict(prior_meta)
    if _next_rid is not None:
        meta["next-row-id"] = _next_rid
    meta["last-updated-ms"] = now_ms
    meta["current-snapshot-id"] = snap_id
    meta["snapshots"] = list(prior_meta.get("snapshots", [])) + [snapshot]
    meta["last-sequence-number"] = seq
    meta["snapshot-log"] = list(prior_meta.get("snapshot-log", [])) + [
        {"timestamp-ms": now_ms, "snapshot-id": snap_id}
    ]
    new_version = prior_version + 1
    final_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
    tmp = os.path.join(meta_dir, f".v{new_version}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    if os.path.exists(final_path):
        os.remove(tmp)
        raise RuntimeError(f"{path}: metadata v{new_version} was committed concurrently")
    os.rename(tmp, final_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_version))
    return snap_id


def _prepare_delete(path: str) -> tuple[dict, int, int, int]:
    """(prior_meta, prior_version, new snap_id, new seq) for a row-level
    delete; fail-loud on v1 tables (they predate merge-on-read)."""
    if not is_iceberg_table(path):
        raise ValueError(f"{path}: not an Iceberg table")
    mp = latest_metadata_path(path)
    with open(mp) as fh:
        prior_meta = json.load(fh)
    if prior_meta.get("format-version", 1) < 2:
        raise NotImplementedError(
            f"{path}: row-level deletes need format-version 2 (v1 tables "
            "predate merge-on-read) — rewrite via overwrite instead"
        )
    if prior_meta.get("current-snapshot-id") in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    head = os.path.basename(mp).split(".metadata.json")[0].lstrip("v").split("-")[0]
    prior_version = int(head) if head.isdigit() else 0
    snap_id = max(s["snapshot-id"] for s in prior_meta.get("snapshots", [])) + 1
    seq = (prior_meta.get("last-sequence-number", 0) or 0) + 1
    return prior_meta, prior_version, snap_id, seq


def _delete_manifest_entry(
    meta_dir: str, snap_id: int, seq: int, del_files: list[tuple[str, int]],
    equality_ids: list[int] | None,
) -> dict:
    """Write the DELETE manifest (content=1 position / content=2 equality;
    one entry per delete file — a distributed delete write may emit
    several) and return its manifest-list entry."""
    import uuid

    manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-d0.avro")
    avro_lite.write_container(
        manifest,
        _manifest_entry_schema(2),
        [
            {
                "status": 1,  # ADDED
                "snapshot_id": snap_id,
                "data_file": {
                    "content": 2 if equality_ids else 1,
                    "file_path": f"file:{del_file}",
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(del_file),
                    "equality_ids": equality_ids,
                },
            }
            for del_file, n_rows in del_files
        ],
    )
    return {
        "manifest_path": f"file:{manifest}",
        "manifest_length": os.path.getsize(manifest),
        "partition_spec_id": 0,
        "added_snapshot_id": snap_id,
        "content": 1,  # delete manifest
        "sequence_number": seq,
        "min_sequence_number": seq,
    }


def _stage_dv_delete(
    spark: SparkSession,
    path: str,
    prior_meta: dict,
    matched_df: DataFrame,
    snap_id: int,
    seq: int,
) -> "tuple[dict | None, set[str]]":
    """v3 DELETION-VECTOR staging (spec §Position Delete Files: "v3+
    writers must use deletion vectors, one per data file; a superseded
    DV must leave in the same snapshot"): turn matched ``(file_path,
    pos)`` pairs into ONE puffin file holding one ``deletion-vector-v1``
    blob per touched data file — each blob the Delta-framed 64-bit
    roaring bitmap, UNIONED with the file's existing DV when one lives —
    plus a CONSOLIDATED delete manifest carrying every untouched live DV
    entry (status EXISTING, explicit sequence). Returns
    ``(manifest-list entry | None, manifest paths to drop)``.

    Scale shape: bitmap construction is distributed (applyInPandas per
    touched file); the driver collects O(#touched files) framed blobs —
    bitmap bytes, the same bound as the Delta DV writer — and every
    untouched DV entry is carried as metadata, zero data IO."""
    import uuid

    from pyspark.sql import functions as F

    from . import puffin as _puf
    from . import roaring as _roar

    def _per_file(key, pdf):
        import pandas as _pd

        from feature_store_ml_spark.io import roaring as _r

        data = _r.serialize_positions([int(p) for p in pdf["pos"]])
        return _pd.DataFrame(
            {
                "file_path": [key[0]],
                "dv": [_r.frame_dv_blob(data)],
                "card": [int(pdf["pos"].nunique())],
            }
        )

    new_dvs = {
        r["file_path"]: (bytes(r["dv"]), int(r["card"]))
        for r in matched_df.groupBy("file_path")
        .applyInPandas(_per_file, "file_path string, dv binary, card long")
        .collect()  # O(#touched files) rows, bitmap-sized payloads
    }
    if not new_dvs:
        return None, set()

    def _norm(raw: str) -> str:
        return "file:" + os.path.abspath(_localize_decoded(raw, path))

    cur = prior_meta["current-snapshot-id"]
    prior_snap = next(
        s for s in prior_meta["snapshots"] if s["snapshot-id"] == cur
    )
    ml_entries = avro_lite.read_container(
        _localize(prior_snap["manifest-list"], path)
    )
    touched = {_norm(p) for p in new_dvs}
    drop: set[str] = set()
    carried: list[dict] = []  # (entries from absorbed manifests)
    superseded: dict[str, dict] = {}  # norm ref -> old DV data_file struct
    for e in ml_entries:
        if (e.get("content", 0) or 0) != 1:
            continue
        mpath = _localize(e["manifest_path"], path)
        entries = [
            m
            for m in avro_lite.read_container(mpath)
            if m.get("status") != _STATUS_DELETED
        ]
        has_dv = any(
            (m["data_file"].get("file_format") or "").upper() == "PUFFIN"
            for m in entries
        )
        if not has_dv:
            continue  # eq-delete manifest: rides forward untouched
        drop.add(mpath)
        mseq = int(e.get("sequence_number") or 0)
        for m in entries:
            dfs = m["data_file"]
            eseq = (
                int(m["sequence_number"])
                if m.get("sequence_number") is not None
                else mseq
            )
            is_dv = (dfs.get("file_format") or "").upper() == "PUFFIN"
            ref = _norm(dfs.get("referenced_data_file") or "") if is_dv else None
            if is_dv and ref in touched:
                superseded[ref] = dfs  # merged below, not carried
                continue
            carried.append(
                {
                    "status": 0,
                    "snapshot_id": m.get("snapshot_id") or cur,
                    "sequence_number": eseq,
                    "data_file": dfs,
                }
            )
    # merge superseded DVs into the new bitmaps (driver-side union of
    # bitmap-sized payloads)
    blobs: list[tuple[dict, bytes]] = []
    cards: dict[str, int] = {}
    for raw, (framed, card) in sorted(new_dvs.items()):
        positions = _roar.deserialize_positions(_roar.read_dv_blob(framed, 0, None))
        old = superseded.get(_norm(raw))
        if old is not None:
            with open(_localize_decoded(old["file_path"], path), "rb") as fh:
                buf = fh.read()
            positions = sorted(
                set(positions)
                | set(
                    _roar.deserialize_positions(
                        # content_size_in_bytes is the FRAMED blob length
                        # (size prefix + data + CRC); the stored dataSize
                        # + CRC check inside read_dv_blob validate it
                        _roar.read_dv_blob(
                            buf, int(old.get("content_offset") or 0), None
                        )
                    )
                )
            )
        payload = _roar.frame_dv_blob(_roar.serialize_positions(positions))
        cards[raw] = len(positions)
        blobs.append(
            (
                {
                    "type": _puf.BLOB_TYPE_DV,
                    "fields": [],
                    "snapshot-id": snap_id,
                    "sequence-number": seq,
                    "properties": {
                        "referenced-data-file": raw,
                        "cardinality": str(len(positions)),
                    },
                },
                payload,
            )
        )
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    dv_file = os.path.join(data_dir, f"delete-{uuid.uuid4().hex}.puffin")
    info = _puf.write_puffin(dv_file, blobs)
    meta_dir = os.path.join(path, "metadata")
    new_entries = [
        {
            "status": 1,
            "snapshot_id": snap_id,
            "data_file": {
                "content": 1,
                "file_path": f"file:{dv_file}",
                "file_format": "PUFFIN",
                "partition": {},
                "record_count": cards[bm["properties"]["referenced-data-file"]],
                "file_size_in_bytes": info["file-size-in-bytes"],
                "equality_ids": None,
                "referenced_data_file": bm["properties"]["referenced-data-file"],
                "content_offset": bm["offset"],
                "content_size_in_bytes": bm["length"],
            },
        }
        for bm in info["blob-metadata"]
    ]
    manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    avro_lite.write_container(
        manifest, _manifest_entry_schema(3), new_entries + carried
    )
    min_seq = min([seq] + [c["sequence_number"] for c in carried])
    return (
        {
            "manifest_path": f"file:{manifest}",
            "manifest_length": os.path.getsize(manifest),
            "partition_spec_id": 0,
            "added_snapshot_id": snap_id,
            "content": 1,
            "sequence_number": seq,
            "min_sequence_number": min_seq,
        },
        drop,
    )


def _stage_position_deletes(
    spark: SparkSession,
    path: str,
    prior_meta: dict,
    pairs_df: DataFrame,
    snap_id: int,
    seq: int,
) -> "tuple[dict | None, set[str]]":
    """Delete-content staging shared by every row-level mutation
    (DELETE/UPDATE/MERGE/overwrite-where): v2 tables get the
    spec-ordered parquet position-delete files (distributed write, the
    pairs never reach the driver); v3 tables get DELETION VECTORS
    (_stage_dv_delete — puffin blobs, superseded DVs absorbed). Returns
    ``(delete manifest-list entry | None, manifest paths to drop)`` —
    thread the drop set into _commit_delete_snapshot."""
    import shutil
    import uuid

    import pyarrow.parquet as pq

    if prior_meta.get("format-version", 1) >= 3:
        return _stage_dv_delete(spark, path, prior_meta, pairs_df, snap_id, seq)
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    staging = os.path.join(data_dir, f"_staging_{uuid.uuid4().hex[:12]}")
    # persist the matched pairs: repartitionByRange runs a SAMPLING pass
    # before the shuffle, and without the cache that pass re-executes the
    # full delete-filtered MoR scan feeding pairs_df — two table scans
    # per DELETE instead of one. The cached rows are the (path, pos)
    # pairs only: O(#deleted rows) of strings+longs, the same bound the
    # distributed delete write already accepts shuffling.
    pairs_df = pairs_df.persist()
    try:
        (
            pairs_df.repartitionByRange("file_path", "pos")
            .sortWithinPartitions("file_path", "pos")
            .write.parquet(staging)
        )
    finally:
        pairs_df.unpersist()
    run = uuid.uuid4().hex
    del_files: list[tuple[str, int]] = []
    for i, part in enumerate(
        sorted(n for n in os.listdir(staging) if n.endswith(".parquet"))
    ):
        src = os.path.join(staging, part)
        n_rows = pq.ParquetFile(src).metadata.num_rows
        if n_rows == 0:
            continue
        dst = os.path.join(data_dir, f"delete-{run}-{i}.parquet")
        os.rename(src, dst)
        del_files.append((dst, n_rows))
    shutil.rmtree(staging)
    if not del_files:
        return None, set()
    return _delete_manifest_entry(meta_dir, snap_id, seq, del_files, None), set()


def _stage_delete_and_data(
    spark: SparkSession,
    path: str,
    prior_meta: dict,
    pairs_df: DataFrame,
    adds_df: "DataFrame | None",
    snap_id: int,
    seq: int,
    data_format: str = "parquet",
) -> "tuple[tuple[dict | None, set[str]], dict | None]":
    """Stage a mutation's TWO halves — the delete content and the
    replacement data files — CONCURRENTLY from two driver threads
    (guide §2.6: actions are only sequential because the driver calls
    them sequentially). The halves are independent: both derive from the
    caller's (persisted) matched scan, whose cache fill the block
    manager serializes per partition, so the scan computes once and the
    second staging reads it from cache while the first's driver-side
    manifest/footer work proceeds — the driver-side half of one staging
    overlaps the cluster-side half of the other. File names are
    uuid-fresh and the manifests are disjoint, so the commit sees
    exactly what the sequential order produced. Returns
    ``((del_entry, dv_drops), data_entry)``."""
    if adds_df is None:
        return (
            _stage_position_deletes(
                spark, path, prior_meta, pairs_df, snap_id, seq
            ),
            None,
        )
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_del = pool.submit(
            inheritable_thread_target(
                lambda: _stage_position_deletes(
                    spark, path, prior_meta, pairs_df, snap_id, seq
                )
            )
        )
        f_data = pool.submit(
            inheritable_thread_target(
                lambda: _stage_data_entry(
                    path, prior_meta, adds_df, snap_id, seq,
                    data_format=data_format,
                )
            )
        )
        return f_del.result(), f_data.result()


def delete_iceberg(
    spark: SparkSession,
    path: str,
    predicate: str,
    batch: tuple[str, int] | None = None,
) -> int:
    """Row-level DELETE via POSITION DELETE FILES (spec §Row-level deletes,
    merge-on-read) — Iceberg v2's twin of Delta deletion vectors: instead
    of rewriting matched data files, the commit adds a parquet file of
    ``(file_path, pos)`` pairs naming the dead rows plus a DELETE manifest
    (content=1 in the manifest list), and readers anti-join the positions
    at scan time. Write cost is O(#deleted rows), not touched-file bytes.

    Mechanics: the predicate is evaluated over the current snapshot's
    DELETE-FILTERED scan (hidden ``_metadata`` columns give the file/row
    identity; rows already deleted cannot match twice); the new position
    delete file lands under ``data/`` sorted by (file_path, pos) as the
    spec requires, the prior snapshot's manifests carry forward, and the
    new snapshot commits with the next sequence number by atomic rename.

    v2 tables only (v1 predates row-level deletes — fail-loud).
    ``batch=(app_id, batch_id)`` is the summary-stamped exactly-once
    handshake (same as merge_iceberg). Returns the new snapshot id.
    """
    import time as _time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    if batch is not None and last_committed_batch(path, batch[0]) >= batch[1]:
        return _load_metadata(path)["current-snapshot-id"]
    prior_meta, prior_version, snap_id, seq = _prepare_delete(path)
    # DISTRIBUTED position-delete write: the matched (file_path, pos)
    # pairs never reach the driver — Spark range-partitions them by
    # (file_path, pos) and writes each slice sorted (the spec's required
    # order holds per delete file AND globally across them). AQE
    # coalesces a small delete to one output file; a mass delete (GDPR
    # erasure of a heavy entity on a 100 TB table) fans out. The driver
    # reads only O(#delete files) parquet footers for record counts.
    import shutil

    matched_df = (
        read_iceberg(spark, path, with_row_identity=True)
        .withColumn("_fp", F.col("_metadata.file_path"))
        .withColumn("_ri", F.col("_metadata.row_index"))
        .where(predicate)
        .select(
            F.col("_fp").alias("file_path"),
            F.col("_ri").cast("long").alias("pos"),
        )
    )
    now_ms = int(_time.time() * 1000)
    # v2: spec-ordered parquet position-delete files; v3: DELETION
    # VECTORS (puffin blobs, superseded DVs absorbed) — shared staging
    del_entry, drops = _stage_position_deletes(
        spark, path, prior_meta, matched_df, snap_id, seq
    )
    return _commit_delete_snapshot(
        path, prior_meta, prior_version, snap_id, seq, now_ms, del_entry,
        summary_props=(
            {"spark.app-id": batch[0], "spark.batch-id": str(batch[1])}
            if batch is not None
            else None
        ),
        drop_manifests=drops,
    )


def delete_iceberg_equality(
    spark: SparkSession, path: str, keys: DataFrame
) -> int:
    """Row-level DELETE via EQUALITY DELETE FILES (spec §Equality Delete
    Files): ``keys`` is a DataFrame whose columns name the equality columns
    and whose rows are the values to delete — e.g. a one-column frame of
    user ids for a GDPR erasure. The delete file stores the VALUES (not
    positions), referenced by FIELD ID so it survives renames, and is
    SEQUENCE-SCOPED: it masks only rows in data files with a strictly
    smaller sequence number, so re-ingesting one of the keys later
    resurrects nothing and the new row lives. That property — "erase this
    key everywhere as of now, without blocking future writes of it" — is
    what position deletes cannot express without knowing every (file, row).

    The keys frame is deduplicated and written as one parquet delete file
    under ``data/`` (distributed write of a metadata-sized set); commit
    shape matches delete_iceberg. Null key values match null cells
    (eqNullSafe), per the spec's equality semantics. Fail-loud: unknown
    columns, v1 tables. Returns the new snapshot id.
    """
    import shutil
    import time as _time
    import uuid

    prior_meta, prior_version, snap_id, seq = _prepare_delete(path)
    name_to_id = {v: k for k, v in _field_id_map(prior_meta).items()}
    missing = [c for c in keys.columns if c not in name_to_id]
    if missing:
        raise ValueError(
            f"{path}: equality-delete columns {missing} not in the table "
            f"schema (have {sorted(name_to_id)})"
        )
    # spec §Identifier Field IDs (equality fields share the rules):
    # primitive, and never float/double — NaN/-0.0 equality is
    # engine-dependent, and nested comparison is undefined for foreign
    # readers
    _type_of = {
        f["name"]: f["type"]
        for f in _current_schema(prior_meta).get("fields", [])
    }
    for c in keys.columns:
        t = _type_of.get(c)
        if not isinstance(t, str):
            raise ValueError(
                f"{path}: equality-delete column {c!r} is a nested type "
                f"({t and t.get('type')}) — the spec restricts equality "
                "fields to primitives (use delete_iceberg with a "
                "predicate, or merge_iceberg's position-delete path)"
            )
        if t in ("float", "double"):
            raise ValueError(
                f"{path}: equality-delete column {c!r} is {t} — the spec "
                "forbids float/double equality fields (NaN/-0.0 equality "
                "is engine-dependent)"
            )
    equality_ids = [name_to_id[c] for c in keys.columns]
    now_ms = int(_time.time() * 1000)
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    staging = os.path.join(data_dir, f"_staging_{uuid.uuid4().hex[:12]}")
    # SINGLE PASS (round 13, VERDICT r12 item 4): the distinct-key count
    # rides the staging write as an observed metric — a separate count()
    # re-ran the whole distinct shuffle just for one number (the same
    # pattern r12 applied to IVF append)
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    distinct = keys.distinct().observe(obs, F.count(F.lit(1)).alias("n"))
    distinct.coalesce(1).write.parquet(staging)
    part = next(
        n for n in sorted(os.listdir(staging)) if n.endswith(".parquet")
    )
    n_rows = int(obs.get["n"])
    del_file = os.path.join(data_dir, f"eq-delete-{uuid.uuid4().hex}.parquet")
    os.rename(os.path.join(staging, part), del_file)
    shutil.rmtree(staging)
    del_entry = _delete_manifest_entry(
        meta_dir, snap_id, seq, [(del_file, n_rows)], equality_ids
    )
    return _commit_delete_snapshot(
        path, prior_meta, prior_version, snap_id, seq, now_ms, del_entry
    )


def _stage_data_entry(
    path: str,
    prior_meta: dict,
    rows: "DataFrame",
    snap_id: int,
    seq: int,
    data_format: str = "parquet",
) -> dict | None:
    """Stage ``rows`` (logical table columns) as new data files under the
    table's declared partition layout and return the manifest-list entry
    for their ADDED-status data manifest — the shared write tail of every
    single-snapshot row mutation (UPDATE, MERGE adds, selective
    overwrite). ``data_format`` is the table's own live format (resolved
    by :func:`_mor_data_format`), so DML on an AVRO/ORC table stages
    same-format replacements and never mixes formats under delete
    content. Parquet: field ids stamped into footers (rename-safe),
    per-file stats folded from footers. AVRO/ORC: the write_iceberg
    stagers (field-id-stamped container schemas, stats collected in the
    write pass — no footer to fold from). Partition tuples re-derived
    with the writer's own transform expressions (JVM-side) either way.
    Returns None when ``rows`` staged no files (empty input)."""
    import shutil
    import uuid
    from urllib.parse import unquote as _unquote

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    cur_schema = _current_schema(prior_meta)
    # row lineage: replacement rows may carry materialized `_row_id` /
    # `_last_updated_sequence_number` — staged as ordinary nullable longs
    # under the spec's reserved field ids, in EVERY data format (the
    # read side resolves them by field id like any other column)
    _lin_present = [
        f for f in _lineage_field_dicts()
        if f["name"] in rows.columns
    ]
    staged_fields = list(cur_schema.get("fields", [])) + _lin_present
    cur_schema = {**cur_schema, "fields": staged_fields}
    names = [f["name"] for f in cur_schema.get("fields", [])]
    rows = _stamp_field_ids(
        rows.select(*names), cur_schema["fields"]
    )
    spec = next(
        (
            s
            for s in prior_meta.get("partition-specs", [])
            if s.get("spec-id") == prior_meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    pfields_parsed: list[dict] = []
    if spec.get("fields"):
        fid_to_name = _field_id_map(prior_meta)
        ice_type_of = {f["name"]: f.get("type") for f in cur_schema["fields"]}
        for pf in spec["fields"]:
            t, p = _parse_transform_spec_name(pf.get("transform", "identity"))
            source = fid_to_name.get(pf.get("source-id"), pf["name"])
            col, rtype = _derive_partition_col(
                {"transform": t, "source": source, "param": p,
                 "name": pf["name"]},
                ice_type_of.get(source),
            )
            pfields_parsed.append({"name": pf["name"], "col": col, "rtype": rtype})
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    rtype_of = {c["name"]: c["rtype"] for c in pfields_parsed}
    data_files: list[tuple[str, int, int, dict]] = []
    rowfmt_stats: dict[str, dict] = {}
    if data_format in ("avro", "orc"):
        from urllib.parse import quote as _quote_c

        _stage = _stage_avro_data if data_format == "avro" else _stage_orc_data
        staged_meta = _stage(
            rows.sparkSession,
            rows,
            staging,
            cur_schema["fields"],
            [c["name"] for c in pfields_parsed],
            {c["name"]: c["col"] for c in pfields_parsed},
        )
        for fm in staged_meta:
            raw = fm["pvals"]
            pvals = {
                c["name"]: (
                    None
                    if raw.get(c["name"]) is None
                    else _PARTITION_PARSERS[c["rtype"]](raw[c["name"]])
                )
                for c in pfields_parsed
            }
            if pfields_parsed:
                # quote() each component — same escaping contract as
                # write_iceberg's rowfmt branch (a raw '#'/'%' truncates
                # or misparses in every file: URI consumer)
                sub = os.path.join(
                    data_dir,
                    *[
                        f"{c['name']}="
                        + (
                            "__HIVE_DEFAULT_PARTITION__"
                            if raw.get(c["name"]) is None
                            else _quote_c(str(raw[c["name"]]), safe="")
                        )
                        for c in pfields_parsed
                    ],
                )
                os.makedirs(sub, exist_ok=True)
            else:
                sub = data_dir
            final = os.path.join(sub, os.path.basename(fm["path"]))
            os.rename(fm["path"], final)
            data_files.append((final, fm["rows"], fm["size"], pvals))
            rowfmt_stats[final] = _avro_stats_maps(
                fm["stats"], cur_schema["fields"]
            )
        shutil.rmtree(staging, ignore_errors=True)
    elif pfields_parsed:
        # hash-distribute by partition tuple before the partitioned
        # write (write.distribution-mode=hash — same rationale and
        # layout-invariance as the write_iceberg staging write)
        _sel = rows.select(
            "*",
            *[
                c["col"].cast("string").alias(f"_p_{c['name']}")
                for c in pfields_parsed
            ],
        )
        (
            _sel.repartition(
                _stage_fanout(_sel),
                *[f"_p_{c['name']}" for c in pfields_parsed],
            )
            .write.partitionBy(*[f"_p_{c['name']}" for c in pfields_parsed])
            .parquet(staging)
        )
    else:
        rows.write.parquet(staging)
    for dirpath, _dirnames, filenames in sorted(os.walk(staging)):
        rel_dir = os.path.relpath(dirpath, staging)
        rel_dir = "" if rel_dir == "." else rel_dir
        pvals: dict = {}
        for comp in rel_dir.split(os.sep):
            if "=" not in comp:
                continue
            k, v = comp.split("=", 1)
            c = k[len("_p_"):]
            pvals[c] = (
                None
                if v == "__HIVE_DEFAULT_PARTITION__"
                else _PARTITION_PARSERS[rtype_of[c]](_unquote(v))
            )
        for name in sorted(filenames):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, name)
            n_rows = _pq_num_rows_or_none(src)
            if n_rows == 0:
                continue
            if pfields_parsed:
                # keep Spark's escaped dir components (see write_iceberg)
                sub = os.path.join(
                    data_dir,
                    *[
                        comp[len("_p_"):]
                        for comp in rel_dir.split(os.sep)
                        if "=" in comp
                    ],
                )
                os.makedirs(sub, exist_ok=True)
            else:
                sub = data_dir
            final = os.path.join(sub, f"{uuid.uuid4().hex}.parquet")
            os.rename(src, final)
            data_files.append(
                (final, n_rows, os.path.getsize(final), dict(pvals))
            )
    shutil.rmtree(staging, ignore_errors=True)  # already gone for rowfmt
    # variant footers (unreadable to pyarrow) backfill counts in one job;
    # zero-row stragglers among them drop here instead of at the walk
    if any(n is None for _f, n, _s, _p in data_files):
        data_files = _backfill_unreadable_rowcounts(
            rows.sparkSession, data_files
        )
        for f, n_rows_f, _sz, _pv in list(data_files):
            if n_rows_f == 0:
                os.remove(f)
        data_files = [e for e in data_files if e[1] != 0]
    if not data_files:
        return None
    partition_fields = [
        {"name": c["name"], "type": ["null", _avro_partition_type(c["rtype"])]}
        for c in pfields_parsed
    ]
    manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    _records = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snap_id,
            "data_file": {
                "content": 0,
                "file_path": f"file:{f}",
                "file_format": data_format.upper(),
                "partition": pvals,
                "record_count": rows_n,
                "file_size_in_bytes": size,
                **(
                    rowfmt_stats[f]
                    if f in rowfmt_stats
                    else _file_stats_maps(f, cur_schema["fields"])
                ),
            },
        }
        for f, rows_n, size, pvals in data_files
    ]
    _next_rid = None
    if _lineage_enabled(prior_meta):
        _next_rid = _assign_first_row_ids(
            int(prior_meta.get("next-row-id", 0)), _records
        )
    avro_lite.write_container(
        manifest, _manifest_entry_schema(2, partition_fields), _records
    )
    return {
        "manifest_path": f"file:{manifest}",
        "manifest_length": os.path.getsize(manifest),
        "partition_spec_id": prior_meta.get("default-spec-id", 0),
        "added_snapshot_id": snap_id,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        # consumed (and stripped) by _commit_delete_snapshot — the
        # commit must advance the table-level next-row-id atomically
        # with the snapshot that references these assignments
        **({"_fsml_next_row_id": _next_rid} if _next_rid is not None else {}),
    }


def _mor_data_format(spark_unused, path: str, op: str) -> str:
    """Resolve the data-file format merge-on-read DML stages its
    replacement files in: the table's OWN live format ('parquet', 'avro'
    or 'orc'), so update/merge/overwrite-where on an AVRO/ORC table add
    same-format data files and the table keeps ONE format. A table that
    already mixes rowfmt and parquet data files stages parquet — the
    round-10 read path interleaves delete masks across format groups
    correctly, so mixing is a non-event; parquet is simply the format
    the rest of the ecosystem (conversion, streaming symlink tail)
    prefers, and compact_iceberg normalizes the mix on demand."""
    if not is_iceberg_table(path):
        return "parquet"  # first MERGE creates the table — parquet default
    meta = _load_metadata(path)
    cur = meta.get("current-snapshot-id")
    if cur in (None, -1):
        return "parquet"
    data, _dels = _snapshot_scan_plan(meta, cur, path)
    fmts = {(d.get("format") or "PARQUET") for d in data}
    if len(fmts) == 1:
        return fmts.pop().lower()
    return "parquet"


def update_iceberg(
    spark: SparkSession,
    path: str,
    set: dict[str, str],
    where: str | None = None,
    batch: tuple[str, int] | None = None,
) -> int:
    """UPDATE ... SET ... WHERE in ONE snapshot, merge-on-read style —
    the Iceberg twin of lakehouse.update_delta. The commit carries TWO
    new manifests: a POSITION DELETE manifest masking the matched rows in
    their existing files (write cost O(#matched rows), no touched-file
    rewrite — the opposite trade from Delta's copy-on-write UPDATE) and a
    DATA manifest adding files that hold the transformed versions of
    those rows. Readers of the new snapshot anti-join the dead positions
    and scan the replacements; readers of the prior snapshot see the
    pre-update table — atomicity a delete-commit-then-append-commit pair
    cannot give. Assignments are simultaneous (one projection over the
    pre-update row). The pos-delete file cannot name rows of the new data
    files (it references only pre-existing file paths), so the shared
    sequence number is safe.

    PARTITIONED tables work: each replacement row's partition tuple is
    re-derived with the writer's own transform expressions (JVM-side),
    so updating a partition SOURCE column moves the row to its new
    partition — the data manifest carries the spec-typed partition
    structs and stays prunable. Fail-loud: v2 tables only
    (merge-on-read) and unknown SET columns. A predicate matching
    nothing commits a no-op snapshot. Returns the new snapshot id."""
    import shutil
    import time as _time
    import uuid

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    if not set:
        raise ValueError("update_iceberg: empty SET clause")
    #: replacement files stage in the table's OWN format (AVRO/ORC tables
    #: get same-format files — no mixing under the delete content)
    _dml_fmt = _mor_data_format(spark, path, "update_iceberg")
    # summary-stamped exactly-once handshake: an UPDATE whose SET is not
    # idempotent by effect (v = v + 1) must not re-apply on a retried run
    if batch is not None and last_committed_batch(path, batch[0]) >= batch[1]:
        return _load_metadata(path)["current-snapshot-id"]
    _upd_summary = (
        {"spark.app-id": batch[0], "spark.batch-id": str(batch[1])}
        if batch is not None
        else None
    )
    prior_meta, prior_version, snap_id, seq = _prepare_delete(path)
    spec = next(
        (
            s
            for s in prior_meta.get("partition-specs", [])
            if s.get("spec-id") == prior_meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    cur_schema = _current_schema(prior_meta)
    names = [f["name"] for f in cur_schema.get("fields", [])]
    unknown = sorted(c for c in set if c not in names)
    if unknown:
        raise ValueError(
            f"{path}: SET references unknown columns {unknown} (have {names})"
        )
    declared = _declared_spark_schema(prior_meta)
    if declared is None:
        raise NotImplementedError(
            f"{path}: table schema holds types outside the primitive "
            "bridge — UPDATE cannot re-stage it faithfully"
        )
    declared_types = {f.name: f.dataType for f in declared.fields}
    pred = where or "true"

    _lineage = _lineage_enabled(prior_meta)
    matched = (
        (
            # lineage tables: the matched rows' CURRENT ids ride along so
            # the replacement files can materialize them (id stability
            # through UPDATE — spec §Row Lineage; the updated rows' new
            # _last_updated_sequence_number is the replacement file's own
            # seq, so it inherits un-materialized)
            read_iceberg_row_ids(spark, path, keep_identity=True)
            if _lineage
            else read_iceberg(spark, path, with_row_identity=True)
        )
        .where(pred)
        .withColumn("_fp", F.col("_metadata.file_path"))
        .withColumn("_ri", F.col("_metadata.row_index"))
    ).persist()  # probed twice: position-delete write + transformed rows
    try:
        now_ms = int(_time.time() * 1000)
        meta_dir = os.path.join(path, "metadata")
        data_dir = os.path.join(path, "data")
        os.makedirs(data_dir, exist_ok=True)

        # the two staged halves, CONCURRENT (guide §2.6; both read the
        # persisted `matched` scan — see _stage_delete_and_data):
        # 1. delete content for the matched rows: v2 position-delete
        #    files / v3 deletion vectors — distributed either way, the
        #    matched positions never reach the driver (v3 collects only
        #    O(#touched files) bitmap blobs)
        # 2. transformed rows as new data files — the shared staging tail
        #    (field-id stamping, partition re-derivation, stats) lives in
        #    _stage_data_entry; an update to a partition SOURCE column
        #    moves the row to its new partition
        updated = matched.withColumns(
            {c: F.expr(e).cast(declared_types[c]) for c, e in set.items()}
        ).select(*names, *([_ROW_ID_COL] if _lineage else []))
        (del_entry, _dv_drops), data_entry = _stage_delete_and_data(
            spark, path, prior_meta,
            matched.select(
                F.col("_fp").alias("file_path"),
                F.col("_ri").cast("long").alias("pos"),
            ),
            updated, snap_id, seq, data_format=_dml_fmt,
        )
        if del_entry is None:
            # nothing matched — the adds side staged nothing either (both
            # derive from the same empty matched scan): no-op snapshot
            return _commit_delete_snapshot(
                path, prior_meta, prior_version, snap_id, seq, now_ms,
                None, operation="overwrite", summary_props=_upd_summary,
            )
        return _commit_delete_snapshot(
            path, prior_meta, prior_version, snap_id, seq, now_ms,
            [del_entry] + ([data_entry] if data_entry else []),
            operation="overwrite", summary_props=_upd_summary,
            drop_manifests=_dv_drops,
        )
    finally:
        matched.unpersist()


def overwrite_iceberg(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    batch: tuple[str, int] | None = None,
) -> int:
    """Full-table OVERWRITE in one snapshot (operation 'overwrite'): the
    new manifest list holds ONLY the replacement data manifest, so the
    current view is exactly ``df`` while every prior snapshot still reads
    its own file set — the Iceberg twin of write_delta(mode='overwrite').
    Creates the table (v2) when absent; the declared schema must match
    (evolve first for schema changes). ``batch=(app_id, batch_id)`` is
    the summary-stamped exactly-once handshake. Returns the snapshot id."""
    import time as _time

    from pyspark.sql import functions as F

    summary_props = (
        {"spark.app-id": batch[0], "spark.batch-id": str(batch[1])}
        if batch is not None
        else None
    )
    if not is_iceberg_table(path):
        return write_iceberg(
            spark, df, path, format_version=2, summary_props=summary_props
        )
    if batch is not None and last_committed_batch(path, batch[0]) >= batch[1]:
        return _load_metadata(path)["current-snapshot-id"]
    prior_meta, prior_version, snap_id, seq = _prepare_delete(path)
    declared = _declared_spark_schema(prior_meta)
    if declared is None:
        raise NotImplementedError(
            f"{path}: table schema holds types outside the primitive "
            "bridge — overwrite cannot stage replacements faithfully"
        )
    names = [f.name for f in declared.fields]
    missing = sorted(set(names) - set(df.columns))
    if missing:
        raise ValueError(f"{path}: source is missing table columns {missing}")
    df = df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in declared.fields]
    )
    now_ms = int(_time.time() * 1000)
    # preserve the table's own data-file format (an AVRO table stays
    # AVRO across a full overwrite); a MIXED table normalizes to parquet
    # — the old files all drop out of the current view
    _ow_fmt = _mor_data_format(spark, path, "overwrite_iceberg")
    data_entry = _stage_data_entry(
        path, prior_meta, df, snap_id, seq, data_format=_ow_fmt
    )
    return _commit_delete_snapshot(
        path, prior_meta, prior_version, snap_id, seq, now_ms,
        [data_entry] if data_entry else None,
        operation="overwrite", summary_props=summary_props, replace=True,
    )


def overwrite_iceberg_where(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    where: str,
) -> int:
    """Selective overwrite — the Iceberg twin of
    ``lakehouse.overwrite_delta_where`` (delta-spark's replaceWhere) and
    of Iceberg's own ``overwritePartitions``/``overwrite(expr)`` API:
    atomically replace exactly the rows matching ``where`` with
    ``source``, in ONE snapshot (operation 'overwrite'). Merge-on-read
    shape, the opposite trade from the Delta twin's copy-on-write: the
    commit carries a POSITION DELETE manifest masking the matched rows
    (write cost O(#matched rows), positions never reach the driver) and
    a DATA manifest adding the replacement files — readers of the new
    snapshot anti-join the dead positions, readers of the prior snapshot
    see the old rows. Pair with ``compact_iceberg`` to physically drop
    the masked rows.

    Same contract as the Delta twin: every ``source`` row must satisfy
    ``where`` (fail-loud probe — re-running the backfill must be
    idempotent), NULL-predicate rows survive, a predicate matching no
    existing rows is a backfill-insert. v2 tables only. Returns the new
    snapshot id."""
    import shutil
    import time as _time
    import uuid

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    _dml_fmt = _mor_data_format(spark, path, "overwrite_iceberg_where")
    if not where or not str(where).strip():
        raise ValueError(
            "overwrite_iceberg_where: empty predicate — a full-table "
            "overwrite is write_iceberg(mode='overwrite')"
        )
    prior_meta, prior_version, snap_id, seq = _prepare_delete(path)
    cur_schema = _current_schema(prior_meta)
    names = [f["name"] for f in cur_schema.get("fields", [])]
    declared = _declared_spark_schema(prior_meta)
    if declared is None:
        raise NotImplementedError(
            f"{path}: table schema holds types outside the primitive "
            "bridge — overwrite cannot stage replacements faithfully"
        )
    missing = sorted(set(names) - set(source.columns))
    if missing:
        raise ValueError(f"{path}: source is missing table columns {missing}")
    source = source.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in declared.fields]
    )
    matched_cond = F.coalesce(F.expr(where), F.lit(False))
    stray = source.where(~matched_cond).limit(1).collect()
    if stray:
        raise ValueError(
            f"{path}: replaceWhere constraint violated — a source row does "
            f"not satisfy {where!r} (e.g. {stray[0].asDict()})"
        )
    now_ms = int(_time.time() * 1000)
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)

    # 1. delete content for the matched rows (v2 position-delete files /
    #    v3 deletion vectors; same shape as delete_iceberg / update_iceberg)
    matched = (
        read_iceberg(spark, path, with_row_identity=True)
        .where(matched_cond)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").cast("long").alias("pos"),
        )
    )
    del_entry, _dv_drops = _stage_position_deletes(
        spark, path, prior_meta, matched, snap_id, seq
    )

    # 2. the replacement rows (no-match case still ADDS: backfilling an
    #    absent partition is an insert)
    data_entry = _stage_data_entry(
        path, prior_meta, source, snap_id, seq, data_format=_dml_fmt
    )
    entries = [e for e in (del_entry, data_entry) if e]
    return _commit_delete_snapshot(
        path, prior_meta, prior_version, snap_id, seq, now_ms,
        entries or None, operation="overwrite", drop_manifests=_dv_drops,
    )


def merge_iceberg(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    when_matched: str = "update",
    newer_wins_col: str | None = None,
    batch: tuple[str, int] | None = None,
    merge_schema: bool = False,
    set_clauses: "dict[str, str] | None" = None,
    not_matched_by_source: "str | None" = None,
    not_matched_by_source_condition: "str | None" = None,
) -> int:
    """Keyed MERGE for Iceberg — the twin of ``lakehouse.merge_delta``
    (upsert / delete by key), merge-on-read in ONE snapshot: a position-
    delete manifest masks the superseded target rows and a data manifest
    adds the winners, so the swap is atomic (operation 'overwrite', the
    summary real Iceberg engines stamp on MERGE). Write cost is
    O(#matched rows + #source rows) — no touched-file rewrite, the
    opposite trade from the Delta twin's copy-on-write; pair with
    ``compact_iceberg`` to physically drop masked rows.

    Semantics match merge_delta exactly:
    - ``when_matched='update'``: matched target rows are replaced by the
      source row, unmatched source rows inserted (UpdateAll+InsertAll).
    - ``when_matched='delete'``: matched target rows deleted, unmatched
      source rows ignored.
    - ``newer_wins_col`` (update only): a matched target row survives
      unless the source is STRICTLY newer; per key one winner (ties keep
      the target) — order-independent, so replayed micro-batches
      converge to the global latest row per key.
    - ``set_clauses`` (update only, exclusive with ``newer_wins_col``):
      PARTIAL update, the twin of ``merge_delta(set_clauses=)`` —
      matched rows transform column-by-column over the joined ``t.``/
      ``s.`` pair (unassigned columns keep the target value), unmatched
      source rows insert whole-row. In MoR terms: the position-delete
      mask is identical to the whole-row path; only the replacement
      rows differ.
    - ``not_matched_by_source='delete'`` (update only, round 8): the
      third MERGE clause, twin of ``merge_delta(not_matched_by_source=
      'delete')`` — target rows whose keys do NOT appear in the source
      are DELETED when they satisfy
      ``not_matched_by_source_condition`` (None deletes every unmatched
      row: keyed FULL SYNC). MoR shape: the stale rows simply join the
      position-delete mask — no extra file rewrite at all, which makes
      the Iceberg full sync O(#masked rows) where the Delta twin
      rewrites every live file.
    - NULL keys never match; duplicate source keys raise the same
      cardinality error as Delta MERGE.

    ``batch=(app_id, batch_id)`` is the summary-stamped exactly-once
    handshake (same as write_iceberg_batch): a replayed batch the log
    already holds returns without committing. First merge into an empty
    location creates the table (v2). Returns the new snapshot id."""
    import shutil
    import time as _time
    import uuid

    import pyarrow.parquet as pq
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    _dml_fmt = _mor_data_format(spark, path, "merge_iceberg")
    if when_matched not in ("update", "delete"):
        raise ValueError(
            f"merge_iceberg: when_matched must be update|delete, got {when_matched!r}"
        )
    if newer_wins_col is not None and when_matched != "update":
        raise ValueError("merge_iceberg: newer_wins_col requires when_matched='update'")
    if newer_wins_col is not None and newer_wins_col not in source.columns:
        raise ValueError(
            f"merge_iceberg: newer_wins_col {newer_wins_col!r} not in source columns"
        )
    if set_clauses is not None:
        if when_matched != "update":
            raise ValueError(
                "merge_iceberg: set_clauses requires when_matched='update'"
            )
        if newer_wins_col is not None:
            raise NotImplementedError(
                "merge_iceberg: set_clauses + newer_wins_col is not "
                "implemented — conditional partial update needs per-row "
                "winner attribution through the SET projection"
            )
        if not set_clauses:
            raise ValueError("merge_iceberg: empty set_clauses")
    if not_matched_by_source is not None:
        if not_matched_by_source != "delete":
            raise ValueError(
                "merge_iceberg: not_matched_by_source supports only "
                f"'delete', got {not_matched_by_source!r}"
            )
        if when_matched != "update":
            raise ValueError(
                "merge_iceberg: not_matched_by_source pairs with "
                "when_matched='update' (the full-sync idiom)"
            )
        if newer_wins_col is not None:
            raise NotImplementedError(
                "merge_iceberg: not_matched_by_source + newer_wins_col "
                "is not implemented"
            )
    elif not_matched_by_source_condition is not None:
        raise ValueError(
            "merge_iceberg: not_matched_by_source_condition requires "
            "not_matched_by_source='delete'"
        )
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"merge_iceberg: source is missing key columns {missing}")
    if batch is not None and last_committed_batch(path, batch[0]) >= batch[1]:
        return _load_metadata(path)["current-snapshot-id"]
    summary_props = (
        {"spark.app-id": batch[0], "spark.batch-id": str(batch[1])}
        if batch is not None
        else None
    )
    if not is_iceberg_table(path):
        if when_matched == "delete":
            raise ValueError(f"{path}: cannot delete from a non-existent table")
        return write_iceberg(
            spark, source, path, format_version=2, summary_props=summary_props
        )
    if merge_schema and when_matched == "update":
        # MERGE schema evolution, the twin of merge_delta(merge_schema=True):
        # the source may APPEND nullable columns. Spec-clean two-commit
        # shape (an UpdateSchema metadata commit, then the merge snapshot):
        # new columns get FRESH field ids, kept rows backfill null via the
        # declared-schema scan, DROP/retype stay fail-loud.
        meta0 = _load_metadata(path)
        cur0 = _current_schema(meta0)
        want0 = [
            (f["name"], _ice_type_fingerprint(f["type"]))
            for f in cur0["fields"]
        ]
        by_name0 = {f.name: f for f in source.schema.fields}
        got0 = [
            (f.name, _spark_dt_fingerprint(f.dataType))
            for f in source.schema.fields
        ]
        if got0 != want0:
            got_map = dict(got0)
            for n, t in want0:
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
            declared_names = {n for n, _ in want0}
            new_cols = [n for n, _ in got0 if n not in declared_names]
            import itertools as _it

            _ctr0 = _it.count(
                max(
                    _max_field_id(cur0["fields"]),
                    meta0.get("last-column-id", 0) or 0,
                )
                + 1
            )

            def _alloc0() -> int:
                return next(_ctr0)

            added_fields0 = []
            for n in new_cols:
                fid = _alloc0()
                try:
                    ice_t = _spark_dt_to_ice(by_name0[n].dataType, _alloc0)
                except NotImplementedError:
                    raise ValueError(
                        f"{path}: evolution adds column {n!r} with an "
                        "unmappable spark type"
                    ) from None
                added_fields0.append(
                    {"id": fid, "name": n, "required": False, "type": ice_t}
                )
            _commit_schema_evolution(
                path, list(cur0["fields"]) + added_fields0
            )
            source = source.select(*[n for n, _ in want0], *new_cols)
    prior_meta, prior_version, snap_id, seq = _prepare_delete(path)
    cur_schema = _current_schema(prior_meta)
    names = [f["name"] for f in cur_schema.get("fields", [])]
    declared = _declared_spark_schema(prior_meta)
    if declared is None:
        raise NotImplementedError(
            f"{path}: table schema holds types outside the primitive "
            "bridge — MERGE cannot stage replacements faithfully"
        )
    if when_matched == "update":
        # WRITE-DEFAULT columns a plain-update source omits (spec
        # §Default values: a MERGE insert is an insert): inserts get the
        # constant, matched rows KEEP the target's value — expressed as
        # the partial-update form over the source's own columns. Only on
        # the plain path; explicit set_clauses / newer_wins semantics
        # stay the caller's contract, everything else keeps failing loud.
        _src_have = set(source.columns)
        _missing = [
            f
            for f in cur_schema.get("fields", [])
            if f["name"] not in _src_have
        ]
        _wd = [f for f in _missing if f.get("write-default") is not None]
        if (
            _wd
            and len(_wd) == len(_missing)
            and set_clauses is None
            and newer_wins_col is None
        ):
            set_clauses = {
                c: f"s.{c}" for c in source.columns if c not in keys
            }
            dtypes = {f.name: f.dataType for f in declared.fields}
            for f in _wd:
                source = source.withColumn(
                    f["name"],
                    F.lit(
                        _default_parse(f["type"], f["write-default"], f["name"])
                    ).cast(dtypes[f["name"]]),
                )
            source = source.select(*[f.name for f in declared.fields])
        got = [(f.name, f.dataType.simpleString()) for f in source.schema.fields]
        want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
        if got != want:
            raise ValueError(
                f"{path}: merge source schema mismatch — table declares "
                f"{want}, source carries {got}; pass merge_schema=True to "
                "add columns"
            )

    key_counts = source.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n")).persist()
    try:
        if key_counts.where(F.col("_n") > 1).limit(1).count():
            raise ValueError(
                "merge_iceberg: source has multiple rows per key — the merge "
                "result would be order-dependent (same error as Delta's "
                "MERGE cardinality check); de-duplicate the source first"
            )
        src_keys = key_counts.select(*keys)
        _lineage = _lineage_enabled(prior_meta)
        target = (
            (
                # lineage tables: matched target ids ride along so the
                # replacement rows keep their identity (spec §Row
                # Lineage preservation through MERGE)
                read_iceberg_row_ids(spark, path, keep_identity=True)
                if _lineage
                else read_iceberg(spark, path, with_row_identity=True)
            )
            .withColumn("_fp", F.col("_metadata.file_path"))
            .withColumn("_ri", F.col("_metadata.row_index").cast("long"))
        )

        def _carry_ids(adds, matched_target):
            """LEFT-join the matched target rows' ids onto the
            replacement rows by key: a matched source row keeps the
            target row's `_row_id` (min over duplicate target keys —
            deterministic), an unmatched insert gets null and draws a
            fresh id from its file's first_row_id block."""
            if not _lineage or adds is None:
                return adds
            tgt_ids = matched_target.groupBy(*keys).agg(
                F.min(F.col(_ROW_ID_COL)).alias(_ROW_ID_COL)
            )
            return adds.join(tgt_ids, on=list(keys), how="left")
        if when_matched == "delete":
            dead = target.join(src_keys, on=list(keys), how="left_semi")
            adds_df = None
        elif set_clauses is not None:
            # PARTIAL update: the mask is the same as whole-row; the
            # replacement rows transform column-by-column over the
            # t./s. pair (unassigned columns keep the target value),
            # plus whole-row inserts for unmatched source keys
            unknown = sorted(c for c in set_clauses if c not in names)
            if unknown:
                raise ValueError(
                    f"{path}: SET targets unknown columns {unknown} "
                    f"(have {names})"
                )
            dead = target.join(src_keys, on=list(keys), how="left_semi")
            dtypes = {f.name: f.dataType for f in declared.fields}
            proj = [
                (
                    F.expr(set_clauses[c]).cast(dtypes[c]).alias(c)
                    if c in set_clauses
                    else F.col(f"t.{c}").alias(c)
                )
                for c in names
            ]
            pairs = dead.alias("t").join(
                source.select(*names).alias("s"),
                [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys],
                "inner",
            )
            matched_keys = dead.select(*keys).distinct()
            if _lineage:
                # partial update pairs each matched target row with its
                # source — identity carries PER ROW, not per key
                proj.append(F.col(f"t.{_ROW_ID_COL}").alias(_ROW_ID_COL))
            inserts = source.select(*names).join(
                matched_keys, on=list(keys), how="left_anti"
            )
            if _lineage:
                inserts = inserts.withColumn(
                    _ROW_ID_COL, F.lit(None).cast("long")
                )
            adds_df = pairs.select(*proj).unionByName(inserts)
        elif newer_wins_col is None:
            dead = target.join(src_keys, on=list(keys), how="left_semi")
            adds_df = _carry_ids(source.select(*names), dead)
        else:
            # strictly-newer wins, one winner per key (ties keep target):
            # matched target rows ∪ source rows through a per-key window —
            # one shuffle on keys, same plan shape as the Delta twin
            matched_tgt = target.join(src_keys, on=list(keys), how="left_semi")
            cand = matched_tgt.select(
                *names, F.lit(0).alias("_src"), "_fp", "_ri"
            ).unionByName(
                source.select(
                    *names,
                    F.lit(1).alias("_src"),
                    F.lit(None).cast("string").alias("_fp"),
                    F.lit(None).cast("long").alias("_ri"),
                )
            )
            w = Window.partitionBy(*keys).orderBy(
                F.col(newer_wins_col).desc(),
                F.col("_src").asc(),
                F.col("_fp").asc_nulls_last(),
                F.col("_ri").asc_nulls_last(),
            )
            ranked = cand.withColumn("_rn", F.row_number().over(w)).persist()
            dead = ranked.where((F.col("_rn") > 1) & (F.col("_src") == 0))
            adds_df = _carry_ids(
                ranked.where(
                    (F.col("_rn") == 1) & (F.col("_src") == 1)
                ).select(*names),
                matched_tgt,
            )
        if not_matched_by_source == "delete":
            # third clause: UNMATCHED target rows satisfying the condition
            # join the position-delete mask (and are never re-added) — in
            # MoR terms the sync costs only their mask entries
            stale = target.join(src_keys, on=list(keys), how="left_anti")
            if not_matched_by_source_condition is not None:
                stale = stale.where(not_matched_by_source_condition)
            dead = dead.select(*target.columns).unionByName(
                stale.select(*target.columns)
            )

        now_ms = int(_time.time() * 1000)
        # both staged halves run concurrently (guide §2.6 — see
        # _stage_delete_and_data); `dead` and `adds_df` derive from the
        # same persisted frames, which the block manager fills once
        (del_entry, _dv_drops), data_entry = _stage_delete_and_data(
            spark, path, prior_meta,
            dead.select(
                F.col("_fp").alias("file_path"),
                F.col("_ri").cast("long").alias("pos"),
            ),
            adds_df, snap_id, seq, data_format=_dml_fmt,
        )
        entries = [e for e in (del_entry, data_entry) if e]
        return _commit_delete_snapshot(
            path, prior_meta, prior_version, snap_id, seq, now_ms,
            entries or None, operation="overwrite",
            summary_props=summary_props, drop_manifests=_dv_drops,
        )
    finally:
        key_counts.unpersist()
        try:
            ranked.unpersist()
        except NameError:
            pass


def last_committed_batch(path: str, app_id: str) -> int:
    """Highest micro-batch id ``app_id`` has committed into this table's
    snapshot summaries (-1 when none): Iceberg's equivalent of the Delta
    `txn` handshake. Iceberg has no txn action, but snapshot summaries are
    an arbitrary string map the spec preserves forever (and expiration
    only drops whole snapshots, never rewrites summaries of kept ones) —
    so a streaming sink stamps each append with its (app, batch) and skips
    replays the way delta-spark's commit coordinator does."""
    if not is_iceberg_table(path):
        return -1
    meta = _load_metadata(path)
    best = -1
    for s in meta.get("snapshots", []):
        summ = s.get("summary") or {}
        if summ.get("spark.app-id") == app_id and "spark.batch-id" in summ:
            best = max(best, int(summ["spark.batch-id"]))
    return best


def write_iceberg_batch(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    app_id: str,
    batch_id: int,
    format_version: int = 2,
) -> int:
    """Idempotent micro-batch append: skip (returning the current snapshot)
    when this (app_id, batch_id) is already stamped in a snapshot summary
    — the write a foreachBatch sink retries safely."""
    if last_committed_batch(path, app_id) >= batch_id:
        return _load_metadata(path)["current-snapshot-id"]
    return write_iceberg(
        spark, df, path, format_version=format_version,
        summary_props={"spark.app-id": app_id, "spark.batch-id": str(batch_id)},
    )


def _stage_rewrite_files(
    live,
    prior_meta: dict,
    path: str,
    staging: str,
    n_out: int,
    spec: dict,
    sort_override: "list[str] | None" = None,
) -> tuple[list[tuple[str, int, int, dict]], dict[str, str]]:
    """Shared data-file staging for snapshot rewrites (full and
    incremental compaction): write ``live`` into right-sized parquet
    files preserving the table's declared partition layout (each
    transform value RE-DERIVED from its source column) and sort order,
    rename into ``data/``, and return (``[(final_path, rows, size,
    partition_tuple)]``, partition result types by name)."""
    import shutil
    import uuid
    from urllib.parse import unquote

    import pyarrow.parquet as pq

    schema = _current_schema(prior_meta)
    # stamp field ids on the REWRITTEN files (round 13 — this was the
    # one staging path that didn't, a LATENT WRONG ANSWER: compacted
    # files carried no ids, so the next rename resolved the column by
    # its new name against old-name footers and silently read NULL;
    # regression-tested in tests/test_iceberg_inner_rename.py and
    # test_incremental_optimize.py)
    _stampable = {f["name"] for f in schema.get("fields", [])}
    live = _stamp_field_ids(
        live,
        list(schema.get("fields", []))
        + [
            f
            for f in _lineage_field_dicts()
            if f["name"] in set(live.columns) - _stampable
        ],
    )
    type_by_name = {f["name"]: f["type"] for f in schema.get("fields", [])}
    fid_to_name = {f["id"]: f["name"] for f in schema.get("fields", [])}
    part_cols = [f["name"] for f in spec.get("fields") or []]
    data_dir = os.path.join(path, "data")
    # reconstruct the spec's transform fields and RE-DERIVE each partition
    # value from its source column (identity, time transforms, bucket,
    # truncate) — the rewrite must preserve the declared layout exactly
    part_types: dict[str, str] = {}
    derive_cols: dict[str, object] = {}
    for f in spec.get("fields") or []:
        t, p = _parse_transform_spec_name(f.get("transform", "identity"))
        pf = {
            "transform": t,
            "source": fid_to_name.get(f.get("source-id"), f["name"]),
            "param": p,
            "name": f["name"],
        }
        col, result_type = _derive_partition_col(pf, type_by_name[pf["source"]])
        part_types[f["name"]] = result_type
        derive_cols[f["name"]] = col
    # apply the table's DECLARED sort order to the rewrite (the real
    # rewrite_data_files contract): compaction restores clustering that
    # merge-on-read mutations eroded, so per-file bounds stay prunable
    sort_cols: list[str] = []
    if sort_override:
        # caller-directed reclustering (incremental compaction's
        # cluster_by): range-cluster the rewritten subset on these
        # columns instead of the declared order
        sort_cols = [c for c in sort_override if c in live.columns]
    _orders = prior_meta.get("sort-orders") or []
    _dsid = prior_meta.get("default-sort-order-id", 0)
    _cur_order = next(
        (o for o in _orders if o.get("order-id") == _dsid), None
    )
    if not sort_cols and _cur_order and _cur_order.get("fields"):
        _id_to_name = _field_id_map(prior_meta)
        sort_cols = [
            c
            for c in (
                _id_to_name.get(f.get("source-id"))
                for f in _cur_order["fields"]
                if f.get("transform") == "identity"
            )
            if c in live.columns
        ]
    if part_cols:
        staged = live.select(
            "*",
            *[derive_cols[n].cast("string").alias(f"_p_{n}") for n in part_cols],
        ).repartition(max(n_out, 1), *[f"_p_{c}" for c in part_cols])
        if sort_cols:
            staged = staged.sortWithinPartitions(
                *[f"_p_{c}" for c in part_cols], *sort_cols
            )
        staged.write.partitionBy(*[f"_p_{c}" for c in part_cols]).parquet(staging)
    elif sort_cols:
        live.repartitionByRange(max(n_out, 1), *sort_cols).sortWithinPartitions(
            *sort_cols
        ).write.parquet(staging)
    else:
        live.coalesce(n_out).write.parquet(staging)

    new_files: list[tuple[str, int, int, dict]] = []
    for dirpath, _dirnames, filenames in sorted(os.walk(staging)):
        rel_dir = os.path.relpath(dirpath, staging)
        rel_dir = "" if rel_dir == "." else rel_dir
        pvals: dict = {}
        for comp in rel_dir.split(os.sep):
            if "=" not in comp:
                continue
            k, v = comp.split("=", 1)
            c = k[len("_p_"):]
            pvals[c] = (
                None
                if v == "__HIVE_DEFAULT_PARTITION__"
                else _PARTITION_PARSERS[part_types[c]](unquote(v))
            )
        for name in sorted(filenames):
            if not name.endswith(".parquet"):
                continue
            if part_cols:
                # keep Spark's escaped dir components (see write_iceberg)
                sub = os.path.join(
                    data_dir,
                    *[
                        comp[len("_p_"):]
                        for comp in rel_dir.split(os.sep)
                        if "=" in comp
                    ],
                )
                os.makedirs(sub, exist_ok=True)
            else:
                sub = data_dir
            final = os.path.join(sub, f"{uuid.uuid4().hex}.parquet")
            os.rename(os.path.join(dirpath, name), final)
            new_files.append(
                (
                    final,
                    _pq_num_rows_or_none(final),
                    os.path.getsize(final),
                    dict(pvals),
                )
            )
    shutil.rmtree(staging)
    # variant footers (unreadable to pyarrow): one job backfills counts
    new_files = _backfill_unreadable_rowcounts(live.sparkSession, new_files)
    return new_files, part_types


def compact_iceberg(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """REWRITE the current snapshot into clean, right-sized data files —
    Iceberg's rewrite_data_files maintenance action: merges small
    append files AND physically applies accumulated position/equality
    deletes (the new files carry the masked scan's rows, no delete
    manifests survive). Pair with expire_iceberg_snapshots to actually
    drop the replaced files; without this, a merge-on-read table's scan
    cost grows with every delete forever.

    The new snapshot's manifest REPLACES all priors (operation
    'replace'); readers before/after see identical rows. Unpartitioned
    rewrite (partitioned tables keep their declared layout via a
    partition-preserving rewrite). Returns the new snapshot id.
    """
    import time as _time
    import uuid

    import pyarrow.parquet as pq

    if not is_iceberg_table(path):
        raise ValueError(f"{path}: not an Iceberg table")
    mp = latest_metadata_path(path)
    with open(mp) as fh:
        prior_meta = json.load(fh)
    fv = prior_meta.get("format-version", 1)
    cur = prior_meta.get("current-snapshot-id")
    if cur in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    head = os.path.basename(mp).split(".metadata.json")[0].lstrip("v").split("-")[0]
    prior_version = int(head) if head.isdigit() else 0
    spec = next(
        (
            s
            for s in prior_meta.get("partition-specs") or []
            if s.get("spec-id") == prior_meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    part_cols = [f["name"] for f in spec.get("fields") or []]

    _lineage = _lineage_enabled(prior_meta)
    live = (
        # lineage tables: compaction MATERIALIZES every surviving row's
        # id AND last-updated sequence into the rewritten files (the
        # new files get a new seq, so inheriting would falsely stamp
        # every row as touched by the compaction — spec §Row Lineage)
        read_iceberg_row_ids(spark, path)
        if _lineage
        else read_iceberg(spark, path)  # delete-masked scan
    )
    data_files_meta = _snapshot_content(prior_meta, cur, path)[0]
    total = sum(os.path.getsize(f) for f in data_files_meta if os.path.exists(f))
    n_out = max(1, -(-total // target_file_bytes))

    data_dir = os.path.join(path, "data")
    meta_dir = os.path.join(path, "metadata")
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    now_ms = int(_time.time() * 1000)
    snap_id = max(s["snapshot-id"] for s in prior_meta.get("snapshots", [])) + 1
    seq = (prior_meta.get("last-sequence-number", 0) or 0) + 1

    new_files, part_types = _stage_rewrite_files(
        live, prior_meta, path, staging, n_out, spec
    )
    schema = _current_schema(prior_meta)

    partition_fields = [
        {"name": c, "type": ["null", _avro_partition_type(part_types[c])]}
        for c in part_cols
    ]
    manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    _records = [
        {
            "status": 1,
            "snapshot_id": snap_id,
            "data_file": {
                **({"content": 0} if fv >= 2 else {}),
                "file_path": f"file:{f}",
                "file_format": "PARQUET",
                "partition": pvals,
                "record_count": rows,
                "file_size_in_bytes": size,
                **({"block_size_in_bytes": 1 << 26} if fv == 1 else {}),
                # compacted files get FRESH stats — tighter bounds than
                # any of the inputs they merged
                **_file_stats_maps(f, schema.get("fields", [])),
            },
        }
        for f, rows, size, pvals in new_files
    ]
    _next_rid = int(prior_meta.get("next-row-id", 0))
    _first_rid = _next_rid
    if _lineage:
        # fresh blocks for the rewritten files; every surviving row
        # carries a MATERIALIZED id that wins over the block, exactly as
        # the spec prescribes for rewrites
        _next_rid = _assign_first_row_ids(_next_rid, _records)
    avro_lite.write_container(
        manifest, _manifest_entry_schema(fv, partition_fields), _records
    )
    # manifest list holds ONLY the rewrite manifest — the replacement
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
    mf_schema = _manifest_file_schema(fv)
    keep = {f["name"] for f in mf_schema["fields"]}
    new_entry = {
        "manifest_path": f"file:{manifest}",
        "manifest_length": os.path.getsize(manifest),
        "partition_spec_id": 0,
        "added_snapshot_id": snap_id,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
    }
    avro_lite.write_container(mlist, mf_schema, [{k: new_entry.get(k, 0) for k in keep}])
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": cur,
        "timestamp-ms": now_ms,
        "manifest-list": f"file:{mlist}",
        "summary": {"operation": "replace"},
        "schema-id": prior_meta.get("current-schema-id", 0),
        **({"first-row-id": _first_rid} if _lineage else {}),
    }
    if fv >= 2:
        snapshot["sequence-number"] = seq
    meta = dict(prior_meta)
    if _lineage:
        meta["next-row-id"] = _next_rid
    meta["last-updated-ms"] = now_ms
    meta["current-snapshot-id"] = snap_id
    meta["snapshots"] = list(prior_meta.get("snapshots", [])) + [snapshot]
    if fv >= 2:
        meta["last-sequence-number"] = seq
    meta["snapshot-log"] = list(prior_meta.get("snapshot-log", [])) + [
        {"timestamp-ms": now_ms, "snapshot-id": snap_id}
    ]
    # a pure rearrangement (no delete content folded in) preserves table
    # CONTENT exactly, so the prior snapshot's Puffin NDV sketches stay
    # correct: the statistics entry rides forward re-keyed to the new
    # snapshot — zero-cost ANALYZE maintenance across compactions. When
    # deletes were applied, rows changed and the old entry stays keyed
    # to the old snapshot (visible as stale, never silently wrong).
    _, _prior_deletes = _snapshot_scan_plan(prior_meta, cur, path)
    if not _prior_deletes:
        carried_stats = [
            {**e, "snapshot-id": snap_id}
            for e in prior_meta.get("statistics") or []
            if e.get("snapshot-id") == cur
        ]
        if carried_stats:
            meta["statistics"] = (
                list(prior_meta.get("statistics") or []) + carried_stats
            )
    new_version = prior_version + 1
    final_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
    tmp = os.path.join(meta_dir, f".v{new_version}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    if os.path.exists(final_path):
        os.remove(tmp)
        raise RuntimeError(f"{path}: metadata v{new_version} was committed concurrently")
    os.rename(tmp, final_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_version))
    return snap_id


def compact_iceberg_incremental(
    spark: SparkSession,
    path: str,
    small_file_bytes: int = 32 << 20,
    target_file_bytes: int = 128 << 20,
    cluster_by: "list[str] | None" = None,
    min_group: int = 2,
    purge_deletes: bool = False,
) -> dict:
    """INCREMENTAL rewrite_data_files (round 11, VERDICT r10 item 6) —
    the Iceberg twin of ``lakehouse.compact_delta_incremental``: rewrite
    only the files the selection policy targets instead of
    ``compact_iceberg``'s whole-snapshot rewrite, so maintenance cost is
    O(touched files). Untouched files' manifest entries are CARRIED
    verbatim (status EXISTING with explicit per-entry sequence numbers —
    the same honesty contract as ``rewrite_manifests_iceberg``), so
    delete scoping over kept files is unchanged.

    Selection per partition tuple (operators/layout.
    select_files_for_compaction): small files with a merge partner and —
    when ``cluster_by`` is given — interval-graph components of files
    whose manifest lower/upper bounds on ``cluster_by[0]`` overlap. The
    rewritten subset is range-clustered on ``cluster_by``, restoring
    disjoint bounds so the manifest pruner can skip again.

    Delete files: by default they are carried forward untouched — the
    rewritten files take the new snapshot's sequence number, above every
    existing delete, and their rows were materialized through the masked
    scan, so semantics are exact. With ``purge_deletes=True`` every data
    file any live delete could apply to (sequence scoping) is ALSO
    selected, and the delete manifests are dropped from the new snapshot
    — the incremental twin of compact_iceberg's fold-in.

    Replacement files are written as PARQUET regardless of source format
    (mixed-format tables are first-class readers here). Returns
    ``{"snapshot_id", "rewritten", "added", "kept", "reasons",
    "deletes_purged"}``; ``snapshot_id`` None = nothing selected, no
    commit."""
    import time as _time
    import uuid

    from ..operators.layout import select_files_for_compaction

    if not is_iceberg_table(path):
        raise ValueError(f"{path}: not an Iceberg table")
    prior_meta = _load_metadata(path)
    fv = prior_meta.get("format-version", 1)
    cur = prior_meta.get("current-snapshot-id")
    if cur in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    data, deletes = _snapshot_scan_plan(prior_meta, cur, path)
    if cluster_by is None:
        # SORTED TABLE (set_iceberg_sort_order / sort_by at CREATE):
        # plain maintenance calls pick up the declared clustering
        cluster_by = _declared_sort_cols(prior_meta) or None

    fields = _current_schema(prior_meta).get("fields", [])
    fid_by_name = {f["name"]: f["id"] for f in fields}
    ice_type = {f["name"]: f["type"] for f in fields}
    ckey_fid = ckey_type = None
    if cluster_by:
        missing = [c for c in cluster_by if c not in fid_by_name]
        if missing:
            raise ValueError(f"{path}: cluster_by columns not in schema: {missing}")
        ckey_fid = fid_by_name[cluster_by[0]]
        ckey_type = ice_type[cluster_by[0]]

    def _kv(entry_list):
        return {kv["key"]: kv["value"] for kv in (entry_list or [])}

    def _bound(d: dict, which: str):
        if ckey_fid is None:
            return None
        v = _decode_bound(_kv(d.get(which)).get(ckey_fid), ckey_type)
        return v if isinstance(v, (int, float)) and not isinstance(v, bool) else None

    def _applies(d: dict, f: dict) -> bool:
        return f["seq"] <= d["seq"] if d["kind"] == "pos" else f["seq"] < d["seq"]

    groups: dict[str, list[dict]] = {}
    for f in data:
        groups.setdefault(
            json.dumps(f.get("partition") or {}, sort_keys=True, default=str), []
        ).append(f)
    selected: set[str] = set()
    reasons: dict[str, str] = {}
    for members in groups.values():
        infos = [
            {
                "name": f["path"],
                "size": (
                    os.path.getsize(f["path"]) if os.path.exists(f["path"]) else 0
                ),
                "has_deletes": purge_deletes
                and any(_applies(d, f) for d in deletes),
                "min": _bound(f, "lower_bounds"),
                "max": _bound(f, "upper_bounds"),
            }
            for f in members
        ]
        sel, why = select_files_for_compaction(infos, small_file_bytes, min_group)
        selected.update(sel)
        reasons.update(why)
    if not selected:
        return {
            "snapshot_id": None,
            "rewritten": [],
            "added": [],
            "kept": len(data),
            "reasons": {},
            "deletes_purged": 0,
        }

    _lineage = _lineage_enabled(prior_meta)
    live = (
        read_iceberg_row_ids(spark, path, _only_paths=selected)
        if _lineage
        else read_iceberg(spark, path, _only_paths=selected)
    )
    total = sum(os.path.getsize(p) for p in selected if os.path.exists(p))
    n_out = max(1, -(-total // target_file_bytes))
    spec = next(
        (
            s
            for s in prior_meta.get("partition-specs") or []
            if s.get("spec-id") == prior_meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    meta_dir = os.path.join(path, "metadata")
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    now_ms = int(_time.time() * 1000)
    snap_id = max(s["snapshot-id"] for s in prior_meta.get("snapshots", [])) + 1
    seq = (prior_meta.get("last-sequence-number", 0) or 0) + 1
    new_files, part_types = _stage_rewrite_files(
        live, prior_meta, path, staging, n_out, spec, sort_override=cluster_by
    )
    schema = _current_schema(prior_meta)
    part_cols = [f["name"] for f in spec.get("fields") or []]
    partition_fields = [
        {"name": c, "type": ["null", _avro_partition_type(part_types[c])]}
        for c in part_cols
    ]
    added_manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
    added_records = [
        {
            "status": 1,
            "snapshot_id": snap_id,
            "data_file": {
                **({"content": 0} if fv >= 2 else {}),
                "file_path": f"file:{f}",
                "file_format": "PARQUET",
                "partition": pvals,
                "record_count": rows,
                "file_size_in_bytes": size,
                **({"block_size_in_bytes": 1 << 26} if fv == 1 else {}),
                **_file_stats_maps(f, schema.get("fields", [])),
            },
        }
        for f, rows, size, pvals in new_files
    ]
    _next_rid = int(prior_meta.get("next-row-id", 0))
    _first_rid = _next_rid
    if _lineage:
        _next_rid = _assign_first_row_ids(_next_rid, added_records)
    avro_lite.write_container(
        added_manifest, _manifest_entry_schema(fv, partition_fields), added_records
    )
    mf_schema = _manifest_file_schema(fv)
    keep_fields = {f["name"] for f in mf_schema["fields"]}
    new_ml: list[dict] = [
        {
            "manifest_path": f"file:{added_manifest}",
            "manifest_length": os.path.getsize(added_manifest),
            "partition_spec_id": prior_meta.get("default-spec-id", 0),
            "added_snapshot_id": snap_id,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
        }
    ]
    # carry every kept data entry (status EXISTING, explicit seq — same
    # contract as rewrite_manifests_iceberg) and drop replaced ones
    prior_snap = next(
        s for s in prior_meta["snapshots"] if s["snapshot-id"] == cur
    )
    ml_entries = avro_lite.read_container(_localize(prior_snap["manifest-list"], path))
    kept_entries: list[dict] = []
    min_kept_seq = None
    for e in ml_entries:
        if (e.get("content", 0) or 0) != 0:
            continue
        mseq = int(e.get("sequence_number") or 0)
        for m in avro_lite.read_container(_localize(e["manifest_path"], path)):
            if m.get("status") == _STATUS_DELETED:
                continue
            p = _localize(m["data_file"]["file_path"], path)
            if p in selected:
                continue
            _eseq = m.get("sequence_number")
            eseq = int(_eseq) if _eseq is not None else mseq
            min_kept_seq = eseq if min_kept_seq is None else min(min_kept_seq, eseq)
            kept_entries.append(
                {
                    "status": 0,
                    "snapshot_id": m.get("snapshot_id") or cur,
                    **({"sequence_number": eseq} if fv >= 2 else {}),
                    # data_file carried VERBATIM — bounds, counts,
                    # partition tuple, format AND first_row_id (lineage
                    # blocks of kept files must not move)
                    "data_file": m["data_file"],
                }
            )
    if kept_entries:
        kept_manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m1.avro")
        avro_lite.write_container(
            kept_manifest, _manifest_entry_schema(fv, partition_fields), kept_entries
        )
        new_ml.append(
            {
                "manifest_path": f"file:{kept_manifest}",
                "manifest_length": os.path.getsize(kept_manifest),
                "partition_spec_id": prior_meta.get("default-spec-id", 0),
                "added_snapshot_id": snap_id,
                "content": 0,
                "sequence_number": min_kept_seq or seq,
                "min_sequence_number": min_kept_seq or seq,
            }
        )
    deletes_purged = 0
    if purge_deletes:
        deletes_purged = sum(
            1 for e in ml_entries if (e.get("content", 0) or 0) == 1
        )
    else:
        # delete manifests ride forward verbatim: kept files keep their
        # masks; rewritten files carry the new (higher) sequence, above
        # every existing delete's scope
        new_ml.extend(e for e in ml_entries if (e.get("content", 0) or 0) == 1)
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
    avro_lite.write_container(
        mlist, mf_schema, [{k: e.get(k, 0) for k in keep_fields} for e in new_ml]
    )
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": cur,
        "timestamp-ms": now_ms,
        "manifest-list": f"file:{mlist}",
        "summary": {
            "operation": "replace",
            "incremental": "true",
            "rewritten-data-files": str(len(selected)),
            "kept-data-files": str(len(kept_entries)),
            **({"removed-delete-manifests": str(deletes_purged)}
               if deletes_purged else {}),
        },
        "schema-id": prior_meta.get("current-schema-id", 0),
        **({"first-row-id": _first_rid} if _lineage else {}),
    }
    if fv >= 2:
        snapshot["sequence-number"] = seq
    meta2 = dict(prior_meta)
    if _lineage:
        meta2["next-row-id"] = _next_rid
    meta2["last-updated-ms"] = now_ms
    meta2["current-snapshot-id"] = snap_id
    meta2["snapshots"] = list(prior_meta.get("snapshots", [])) + [snapshot]
    if fv >= 2:
        meta2["last-sequence-number"] = seq
    meta2["snapshot-log"] = list(prior_meta.get("snapshot-log", [])) + [
        {"timestamp-ms": now_ms, "snapshot-id": snap_id}
    ]
    # pure rearrangement preserves content, so NDV statistics ride
    # forward — but only when no delete content was in play (same
    # conservative rule as compact_iceberg)
    if not deletes:
        carried_stats = [
            {**e, "snapshot-id": snap_id}
            for e in prior_meta.get("statistics") or []
            if e.get("snapshot-id") == cur
        ]
        if carried_stats:
            meta2["statistics"] = (
                list(prior_meta.get("statistics") or []) + carried_stats
            )
    _swap_metadata(path, meta2)
    return {
        "snapshot_id": snap_id,
        "rewritten": sorted(selected),
        "added": [f for f, _r, _s, _p in new_files],
        "kept": len(kept_entries),
        "reasons": reasons,
        "deletes_purged": deletes_purged,
    }


def read_iceberg_cdf(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """ROW-LEVEL change feed between two snapshots — the Iceberg twin of
    ``lakehouse.read_delta_cdf``: table columns plus ``_change_type``
    ('insert' | 'delete') and ``_commit_snapshot_id``.

    Derivable from metadata alone, per snapshot in ``(from, to]`` ordered
    by sequence number:
    - new DATA files -> their rows as 'insert' at that snapshot;
    - new POSITION delete files -> the named (file, pos) rows as 'delete';
    - new EQUALITY delete files -> the matching rows in STRICTLY-OLDER
      data files that were still live (not already masked) as 'delete'.
    A snapshot that REMOVES data files (compaction/expire rewrote history)
    fails loudly — replaced files make row diffs ambiguous.

    Scale shape mirrors the Delta feed: per-snapshot file lists are driver
    metadata; inserts are plain scans; position deletes one broadcast
    position join; equality deletes one broadcast semi-join per delete
    file over the files it can affect.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    meta = _load_metadata(path)
    to_id = to_snapshot_id if to_snapshot_id is not None else meta.get(
        "current-snapshot-id"
    )
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if from_snapshot_id not in snaps or to_id not in snaps:
        missing = [i for i in (from_snapshot_id, to_id) if i not in snaps]
        raise ValueError(f"{path}: snapshot {missing[0]} not in metadata")
    # ANCESTRY order (round 12): the raw snapshot list sorted by
    # sequence number interleaves WAP-staged non-ancestor snapshots —
    # their unpublished files would surface as phantom inserts (or the
    # diff would spuriously see removals). Only the parent chain is
    # commit order. Both endpoints must live on it.
    ordered = _ancestry_chain(meta)
    chain_ids = {s["snapshot-id"] for s in ordered}
    off_chain = [
        i for i in (from_snapshot_id, to_id) if i not in chain_ids
    ]
    if off_chain:
        raise ValueError(
            f"{path}: snapshot {off_chain[0]} is not an ancestor of the "
            "current snapshot (staged branch or rolled-back history) — "
            "the change feed is defined over the main line only"
        )
    from_idx = next(
        i for i, s in enumerate(ordered) if s["snapshot-id"] == from_snapshot_id
    )
    to_idx = next(i for i, s in enumerate(ordered) if s["snapshot-id"] == to_id)
    if to_idx < from_idx:
        raise ValueError(f"{path}: to-snapshot predates from-snapshot")

    declared = _declared_spark_schema(meta)

    def _read_any(entries, want_pos: bool = False):
        """Format-aware scan of data-file ENTRIES (parquet native,
        AVRO/ORC through the rowfmt readers — round 9); ``want_pos``
        tags every row with its (_fp, _ri) identity: parquet from the
        hidden _metadata, rowfmt from the readers' own decode-order
        ordinals."""
        groups: dict[str, list] = {"PARQUET": [], "AVRO": [], "ORC": []}
        for d in entries:
            groups[d.get("format") or "PARQUET"].append(d)
        parts_ = []
        if groups["PARQUET"]:
            paths_ = [d["path"] for d in groups["PARQUET"]]
            # field-id grouping, same rename-safety as the main scan leg;
            # _metadata is materialized pre-union when positions are
            # wanted (hidden-column resolution does not survive unions)
            g = _read_parquet_fid(
                spark, paths_, declared, meta, want_meta=want_pos
            )
            if want_pos:
                g = (
                    g.withColumn("_fp", _decoded_meta_path(paths_))
                    .withColumn("_ri", F.col("_metadata.row_index"))
                    .drop("_metadata")
                )
            parts_.append(g)
        for fmtk, reader in (
            ("AVRO", _read_avro_data),
            ("ORC", _read_orc_data),
        ):
            if not groups[fmtk]:
                continue
            if declared is None:
                raise NotImplementedError(
                    f"{path}: change feed over {fmtk} data files needs a "
                    "declared schema"
                )
            parts_.append(
                reader(spark, groups[fmtk], declared, meta, want_pos=want_pos)
            )
        out = parts_[0]
        for g2 in parts_[1:]:
            out = out.unionByName(g2)
        return out

    id_to_name = _field_id_map(meta)
    # one manifest-decode memo for the whole ancestry walk: consecutive
    # snapshots share most manifests (ADVICE r12 — the per-snapshot full
    # replay was O(snapshots × manifests) driver file reads)
    mcache: dict = {}
    prev_data, prev_deletes = _snapshot_scan_plan(
        meta, ordered[from_idx]["snapshot-id"], path, _manifest_cache=mcache
    )
    prev_data_map = {d["path"]: d for d in prev_data}
    prev_delete_set = {d["path"] for d in prev_deletes}
    parts: list[DataFrame] = []
    for s in ordered[from_idx + 1 : to_idx + 1]:
        sid = s["snapshot-id"]
        data, deletes = _snapshot_scan_plan(
            meta, sid, path, _manifest_cache=mcache
        )
        data_map = {d["path"]: d for d in data}
        gone = set(prev_data_map) - set(data_map)
        if gone:
            raise ValueError(
                f"{path}: snapshot {sid} removed data files (compaction/"
                "rewrite) — row-level changes are not derivable; re-read "
                "the snapshot"
            )
        new_data = [p for p in data_map if p not in prev_data_map]
        if new_data:
            parts.append(
                _read_any([data_map[p] for p in new_data])
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_snapshot_id", F.lit(sid).cast("long"))
            )
        new_deletes = [d for d in deletes if d["path"] not in prev_delete_set]
        # one puffin file carries DV blobs for MANY data files and the
        # manifest lists one entry PER referenced file, all sharing the
        # path — visit each physical file once or every dead row in it
        # is emitted once per entry (the inner join below multiplies,
        # unlike the read path's idempotent anti-join)
        pos_new = list(
            dict.fromkeys(
                d["path"] for d in new_deletes if d["kind"] == "pos"
            )
        )
        if pos_new:
            # the named rows themselves are the delete records
            merged_map = {**prev_data_map, **data_map}
            tagged = _read_any(
                [merged_map[p] for p in sorted(merged_map)], want_pos=True
            )
            # (the feed needs the COMPLEMENT of the read-path's anti-join:
            # an inner join against the named positions)
            import pyarrow.parquet as pq

            pairs = []
            # v3 DVs: a merged deletion vector carries the file's PRIOR
            # positions too — the feed must report only the NEW ones, so
            # subtract the previous snapshot's DV per referenced file
            _prior_dv_pos: dict[str, set] = {}

            def _dv_positions_of(entry_path: str) -> "dict[str, list[int]]":
                from . import puffin as _puf
                from . import roaring as _roar

                out: dict[str, list[int]] = {}
                blobs, _props = _puf.read_puffin(entry_path)
                for b in blobs:
                    if b.get("type") != _puf.BLOB_TYPE_DV:
                        continue
                    ref = (b.get("properties") or {}).get(
                        "referenced-data-file"
                    )
                    out[
                        "file:"
                        + os.path.abspath(_localize_decoded(ref, path))
                    ] = _roar.deserialize_positions(
                        _roar.read_dv_blob(b["payload"], 0, None)
                    )
                return out

            for x in prev_deletes:
                if x["kind"] == "pos" and x.get("referenced_data_file"):
                    for uri, poss in _dv_positions_of(x["path"]).items():
                        _prior_dv_pos.setdefault(uri, set()).update(poss)
            for dfile in pos_new:
                with open(dfile, "rb") as _fh:
                    _magic = _fh.read(4)
                if _magic == b"PFA1":
                    for uri, poss in _dv_positions_of(dfile).items():
                        prior = _prior_dv_pos.get(uri, set())
                        pairs.extend(
                            (uri, p_) for p_ in poss if p_ not in prior
                        )
                    continue
                if _magic == b"Obj\x01":
                    # foreign AVRO position deletes (round 9)
                    _rows = avro_lite.read_container(dfile)
                    fps = [str(r["file_path"]) for r in _rows]
                    poss = [int(r["pos"]) for r in _rows]
                else:
                    if _magic[:3] == b"ORC":
                        import pyarrow.orc as _pa_orc

                        t = _pa_orc.ORCFile(dfile).read(
                            columns=["file_path", "pos"]
                        )
                    else:
                        t = pq.read_table(dfile, columns=["file_path", "pos"])
                    fps = t.column("file_path").to_pylist()
                    poss = t.column("pos").to_pylist()
                cache: dict[str, str] = {}
                for raw, p_ in zip(fps, poss):
                    uri = cache.get(raw)
                    if uri is None:
                        uri = "file:" + os.path.abspath(
                            _localize_decoded(raw, path)
                        )
                        cache[raw] = uri
                    pairs.append((uri, p_))
            if pairs:
                pos_df = local_rows_df(spark, pairs, "_del_fp string, _del_pos long")
                dead_rows = (
                    tagged.join(
                        F.broadcast(pos_df),
                        (F.col("_fp") == F.col("_del_fp"))
                        & (F.col("_ri") == F.col("_del_pos")),
                        "inner",
                    )
                    .drop("_fp", "_ri", "_del_fp", "_del_pos")
                    .withColumn("_change_type", F.lit("delete"))
                    .withColumn("_commit_snapshot_id", F.lit(sid).cast("long"))
                )
                parts.append(dead_rows)
        for d in new_deletes:
            if d["kind"] != "eq":
                continue
            cols = [id_to_name[i] for i in d["equality_ids"]]
            keys = _read_eq_delete_keys(
                spark, d["path"], cols, d["equality_ids"], declared
            )
            # affected: rows of data files strictly older than the delete
            # that were STILL LIVE at the previous snapshot (apply the
            # previous snapshot's masks so a doubly-deleted row isn't
            # emitted twice)
            older = [
                p for p, dd in prev_data_map.items() if dd["seq"] < d["seq"]
            ]
            if not older:
                continue
            prev_pos = [x["path"] for x in prev_deletes if x["kind"] == "pos"]
            g = _read_any(
                [prev_data_map[p] for p in older], want_pos=bool(prev_pos)
            )
            if prev_pos:
                g = _join_out_positions(spark, path, g, prev_pos).drop("_fp", "_ri")
            for x in prev_deletes:
                if x["kind"] != "eq":
                    continue
                pcols = [id_to_name[i] for i in x["equality_ids"]]
                pkeys = _read_eq_delete_keys(
                    spark, x["path"], pcols, x["equality_ids"], declared,
                    prefix="_pq_",
                )
                cond = reduce(
                    lambda a, b: a & b,
                    [g[c].eqNullSafe(F.col(f"_pq_{c}")) for c in pcols],
                )
                g = g.join(pkeys, cond, "left_anti")
            cond = reduce(
                lambda a, b: a & b,
                [g[c].eqNullSafe(F.col(f"_eq_{c}")) for c in cols],
            )
            dead_rows = (
                g.join(keys, cond, "left_semi")
                .withColumn("_change_type", F.lit("delete"))
                .withColumn("_commit_snapshot_id", F.lit(sid).cast("long"))
            )
            parts.append(dead_rows)
        prev_data_map, prev_deletes, prev_delete_set = (
            data_map,
            deletes,
            {d["path"] for d in deletes},
        )

    if not parts:
        if declared is None:
            raise ValueError(f"{path}: no changes and no mappable schema")
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        empty = StructType(
            list(declared.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_snapshot_id", LongType(), False),
            ]
        )
        return local_rows_df(spark, [], empty)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _commit_schema_evolution(
    path: str,
    new_fields: list[dict],
    extra_properties: "dict[str, str] | None" = None,
) -> int:
    """Shared commit tail for metadata-only schema changes: append a new
    schema (fresh schema-id, field ids PRESERVED — ids are the spec's
    column identity and must never be reused), point current-schema-id at
    it, and swap the metadata version by atomic rename. No snapshot is
    added — data files are untouched; that is the point. Returns the new
    schema id."""
    import time as _time
    import uuid

    mp = latest_metadata_path(path)
    with open(mp) as fh:
        meta = json.load(fh)
    head = os.path.basename(mp).split(".metadata.json")[0].lstrip("v").split("-")[0]
    prior_version = int(head) if head.isdigit() else 0
    schemas = list(meta.get("schemas", []))
    if not schemas and meta.get("schema"):
        schemas = [{**meta["schema"], "schema-id": meta.get("current-schema-id", 0)}]
    new_sid = max((s.get("schema-id", 0) for s in schemas), default=0) + 1
    schemas.append({"schema-id": new_sid, "type": "struct", "fields": new_fields})
    meta["schemas"] = schemas
    meta["current-schema-id"] = new_sid
    meta["last-updated-ms"] = int(_time.time() * 1000)
    # last-column-id is the allocator foreign writers draw fresh ids
    # from — keep it ≥ every id this evolution introduced, nested
    # member/element/key/value ids included
    meta["last-column-id"] = max(
        meta.get("last-column-id", 0), _max_field_id(new_fields)
    )
    if extra_properties:
        meta["properties"] = {
            **(meta.get("properties") or {}),
            **extra_properties,
        }
    if "schema" in meta:
        # keep the v1 legacy singular field in lockstep — popping it would
        # break readers that only look there
        meta["schema"] = {"type": "struct", "fields": new_fields}
    meta_dir = os.path.join(path, "metadata")
    new_version = prior_version + 1
    final_path = os.path.join(meta_dir, f"v{new_version}.metadata.json")
    tmp = os.path.join(meta_dir, f".v{new_version}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    if os.path.exists(final_path):
        os.remove(tmp)
        raise RuntimeError(
            f"{path}: metadata v{new_version} was committed concurrently"
        )
    os.rename(tmp, final_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(new_version))
    return new_sid


def rename_iceberg_column(path: str, old: str, new: str) -> int:
    """ZERO-REWRITE column rename (spec §Schema Evolution): a rename is one
    metadata commit — the new schema keeps every FIELD ID and changes only
    the display name. Old data files keep the old parquet column name;
    reads stay correct because read_iceberg resolves columns by the field
    id stamped in each footer (falling back to names for pre-stamping
    files, which by construction still carry the creation-time name...
    those files resolve correctly only until the first rename — hence the
    writer stamps ids on every file it stages). Returns the new schema id.

    The reference (a 136-LoC pandas demo, /root/reference/src) has no
    table format at all; this exists for the 100 TB mandate where
    renaming a column must not rewrite 100 TB of parquet."""
    meta = _load_metadata(path)
    cur = _current_schema(meta)
    names = [f["name"] for f in cur.get("fields", [])]
    if old not in names:
        raise ValueError(f"{path}: no column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"{path}: column {new!r} already exists")
    new_fields = [
        {**f, "name": new} if f["name"] == old else dict(f)
        for f in cur["fields"]
    ]
    return _commit_schema_evolution(path, new_fields)


def rename_iceberg_nested_field(
    path: str, column: str, old: str, new: str
) -> int:
    """ZERO-REWRITE rename of a STRUCT MEMBER (spec §Schema Evolution —
    nested field ids are column identity exactly like top-level ones):
    ``rename_iceberg_nested_field(t, "s", "n", "count")`` renames
    ``s.n`` to ``s.count`` in one metadata commit. ``column`` accepts a
    DOTTED member path for structs below the first level (round 14):
    ``rename_iceberg_nested_field(t, "address.geo", "lat", "latitude")``
    renames ``address.geo.lat`` — every path component must be a struct.

    Resolution contract (round 13): after an inner rename, name-based
    struct access would silently NULL the member on pre-rename files, so
    the commit stamps the ``fsml.field-id-read`` table property and
    every scan from then on goes through ``_read_nested_renamed``: files
    group by their footers' full fid -> physical-name map (struct
    members included), each group scans under its PHYSICAL schema, and
    renamed structs rebuild RECURSIVELY back to declared member names.
    (Spark's own ``fieldId.read`` matcher was rejected: its
    nested-schema pruning drops the id metadata and silently nulls
    projected members — measured.) That resolution is only sound when
    every live data file actually CARRIES the member's id, so this
    commit first probes every live parquet footer and fail-louds on any
    file missing the id of ANY struct field on the path or the renamed
    member itself (files staged before round 13 stamped only top-level
    ids — run ``compact_iceberg`` to rewrite them, then rename).
    Non-parquet data files and tables carrying column defaults
    refuse."""
    import pyarrow.parquet as pq

    meta = _load_metadata(path)
    cur = _current_schema(meta)
    parts = column.split(".")
    node = None
    t = None
    path_ids: list[int] = []  # struct field ids along the dotted path
    fields_here = cur.get("fields", [])
    for depth, comp in enumerate(parts):
        node = next(
            (f for f in fields_here if f["name"] == comp), None
        )
        if node is None:
            where = ".".join(parts[:depth]) or "top level"
            raise ValueError(
                f"{path}: no column {comp!r} at {where} "
                f"(have {[f['name'] for f in fields_here]})"
            )
        path_ids.append(node.get("id"))
        t = node.get("type")
        if not (isinstance(t, dict) and t.get("type") == "struct"):
            raise ValueError(
                f"{path}: {'.'.join(parts[: depth + 1])!r} is not a "
                "struct — inner renames apply to struct members (list "
                "elements and map entries have no names)"
            )
        fields_here = t.get("fields", [])
    inner_names = [f["name"] for f in t.get("fields", [])]
    if old not in inner_names:
        raise ValueError(
            f"{path}: no member {column}.{old!r} (have {inner_names})"
        )
    if new in inner_names:
        raise ValueError(f"{path}: member {column}.{new!r} already exists")
    inner = next(f for f in t["fields"] if f["name"] == old)
    if _schema_defaults(meta):
        raise NotImplementedError(
            f"{path}: inner renames on a table with column defaults are "
            "not implemented (field-id reads cannot combine with the "
            "defaults' footer-evidence machinery)"
        )
    # every live file must carry the ids of the full path AND the
    # renamed member — otherwise field-id reads (the only sound
    # resolution after this rename) would error or null the member
    cur_sid = meta.get("current-snapshot-id")
    if cur_sid not in (None, -1):
        data, _dels = _snapshot_scan_plan(meta, cur_sid, path)
        inner_id = inner.get("id")
        for d in data:
            if (d.get("format") or "PARQUET") != "PARQUET":
                raise NotImplementedError(
                    f"{path}: inner renames on {d.get('format')} data "
                    "files are not implemented (parquet only)"
                )
            lp = _local_path(d["path"])
            try:
                sch = pq.read_schema(lp)
            except Exception as exc:
                raise NotImplementedError(
                    f"{lp}: footer is unreadable (VARIANT logical type?) — "
                    "inner renames require probing every live file's member "
                    "ids and this footer cannot be parsed by pyarrow; "
                    "compact the table to readable footers first"
                ) from exc

            def _child_by_fid(container, fid_want, name_fallback):
                """container: a schema (top) or a struct type node."""
                kids = (
                    list(container)
                    if not hasattr(container, "num_fields")
                    else [
                        container.field(i)
                        for i in range(container.num_fields)
                    ]
                )
                for fld in kids:
                    fid = (fld.metadata or {}).get(b"PARQUET:field_id")
                    if fid is not None and int(fid) == fid_want:
                        return fld
                if name_fallback is not None:
                    return next(
                        (f2 for f2 in kids if f2.name == name_fallback),
                        None,
                    )
                return None

            # walk the dotted path down the footer; only the TOP level
            # may fall back to name (pre-stamping files stamped nothing
            # below it — those fail the leaf check and refuse)
            holder = _child_by_fid(sch, path_ids[0], parts[0])
            ok_path = holder is not None
            for fid_want in path_ids[1:]:
                if holder is None or not hasattr(
                    holder.type, "num_fields"
                ):
                    ok_path = False
                    break
                holder = _child_by_fid(holder.type, fid_want, None)
                ok_path = ok_path and holder is not None
            ok = False
            if (
                ok_path
                and holder is not None
                and hasattr(holder.type, "num_fields")
            ):
                ok = (
                    _child_by_fid(holder.type, inner_id, None) is not None
                )
            if not ok:
                raise NotImplementedError(
                    f"{path}: data file {os.path.basename(lp)} does not "
                    f"stamp the field id of {column}.{old} — field-id "
                    "reads cannot resolve it after the rename; run "
                    "compact_iceberg first (rewrites stamp member ids), "
                    "then rename"
                )

    def _rebuild(fields_at, depth) -> list:
        out = []
        for f in fields_at:
            if f["name"] != parts[depth]:
                out.append(dict(f))
                continue
            ft = f["type"]
            if depth == len(parts) - 1:
                new_inner = [
                    {**g, "name": new} if g["name"] == old else dict(g)
                    for g in ft["fields"]
                ]
            else:
                new_inner = _rebuild(ft["fields"], depth + 1)
            out.append({**f, "type": {**ft, "fields": new_inner}})
        return out

    new_fields = _rebuild(cur["fields"], 0)
    return _commit_schema_evolution(
        path, new_fields, extra_properties={"fsml.field-id-read": "true"}
    )


def drop_iceberg_column(path: str, name: str) -> int:
    """ZERO-REWRITE column drop (spec §Schema Evolution): the new schema
    simply omits the field; its id is never reused (ids are append-only
    identity). Data files keep the bytes — they become dead weight until
    natural compaction rewrites them, exactly like real Iceberg.
    Fail-loud when a partition spec still derives from the column (the
    spec forbids dropping a field a spec references) or when it is the
    last column. Returns the new schema id."""
    meta = _load_metadata(path)
    cur = _current_schema(meta)
    doomed = next(
        (f for f in cur.get("fields", []) if f["name"] == name), None
    )
    if doomed is None:
        raise ValueError(
            f"{path}: no column {name!r} "
            f"(have {[f['name'] for f in cur.get('fields', [])]})"
        )
    if len(cur.get("fields", [])) == 1:
        raise ValueError(f"{path}: cannot drop the last column {name!r}")
    fid = doomed.get("id")
    for spec in meta.get("partition-specs", []):
        for pf in spec.get("fields", []):
            if pf.get("source-id") == fid:
                raise ValueError(
                    f"{path}: column {name!r} (field id {fid}) is a "
                    f"partition source of spec {spec.get('spec-id')} — "
                    "drop the spec first"
                )
    new_fields = [dict(f) for f in cur["fields"] if f["name"] != name]
    return _commit_schema_evolution(path, new_fields)


_ICE_DECIMAL_RE = re.compile(r"decimal\((\d+),\s*(\d+)\)")


def _ice_widening_ok(frm: str, to: str) -> bool:
    """The spec's §Schema Evolution type-promotion table (v2): int ->
    long, float -> double, decimal(P,S) -> decimal(P',S) with P' > P and
    the SAME scale — deliberately narrower than Delta's typeWidening set."""
    if (frm, to) in (("int", "long"), ("float", "double")):
        return True
    m1, m2 = _ICE_DECIMAL_RE.fullmatch(frm or ""), _ICE_DECIMAL_RE.fullmatch(to or "")
    if m1 and m2:
        return int(m2.group(2)) == int(m1.group(2)) and int(m2.group(1)) > int(
            m1.group(1)
        )
    return False


def widen_iceberg_column(path: str, name: str, new_type: str) -> int:
    """ALTER COLUMN ... TYPE as a ZERO-REWRITE metadata commit (spec
    §Schema Evolution, type promotion): the new schema keeps the field ID
    and widens only the type — int -> long, float -> double, or
    decimal(P,S) -> decimal(P',S) with larger precision, exactly the
    spec's allowed set. Old data files keep the narrow physical type;
    read_iceberg scans every file group under the DECLARED schema (built
    from current types), and Spark's parquet reader performs these
    promotions natively — so a widened table reads correctly with no
    data rewrite. Manifest column bounds written before the change stay
    usable for data skipping (_decode_bound length-sniffs the narrow
    encoding). Returns the new schema id.

    ``name`` accepts a DOTTED struct-member path (round 14):
    ``widen_iceberg_column(t, "s.n", "long")`` widens the member —
    nested field ids are column identity like top-level ones, and
    Spark's parquet reader performs leaf promotions at any nesting.

    Fail-loud: unknown column, non-promotion change, widening a whole
    nested container, and columns any partition spec derives from (new
    manifests would encode the partition struct under the wide type
    while old ones carry the narrow type — a rewrite-free ambiguity
    this module refuses rather than papers over)."""
    meta = _load_metadata(path)
    cur = _current_schema(meta)
    parts = name.split(".")
    fields_here = cur.get("fields", [])
    target = None
    for depth, comp in enumerate(parts):
        target = next(
            (f for f in fields_here if f["name"] == comp), None
        )
        if target is None:
            where = ".".join(parts[:depth]) or "top level"
            raise ValueError(
                f"{path}: no column {comp!r} at {where} "
                f"(have {[f['name'] for f in fields_here]})"
            )
        if depth < len(parts) - 1:
            t = target.get("type")
            if not (isinstance(t, dict) and t.get("type") == "struct"):
                raise ValueError(
                    f"{path}: {'.'.join(parts[: depth + 1])!r} is not a "
                    "struct — dotted widening paths walk struct members"
                )
            fields_here = t.get("fields", [])
    new_type = new_type.strip().lower().replace(" ", "")
    old_type = target.get("type")
    if not isinstance(old_type, str):
        raise NotImplementedError(
            f"{path}: {name!r} is a nested CONTAINER — widening applies "
            "to primitive fields (address a struct member by its dotted "
            "path)"
        )
    if old_type == new_type:
        raise ValueError(f"{path}: {name!r} is already {new_type}")
    if not _ice_widening_ok(old_type, new_type):
        raise ValueError(
            f"{path}: {old_type} -> {new_type} is not an allowed type "
            "promotion (spec permits int->long, float->double, and "
            "decimal precision growth at the same scale)"
        )
    fid = target.get("id")
    for spec in meta.get("partition-specs", []):
        for pf in spec.get("fields", []):
            if pf.get("source-id") == fid:
                raise ValueError(
                    f"{path}: column {name!r} (field id {fid}) is a "
                    f"partition source of spec {spec.get('spec-id')} — "
                    "widening it would fork the manifests' partition "
                    "struct encoding; rewrite via overwrite instead"
                )

    def _widen(fields_at, depth) -> list:
        out = []
        for f in fields_at:
            if f["name"] != parts[depth]:
                out.append(dict(f))
            elif depth == len(parts) - 1:
                out.append({**f, "type": new_type})
            else:
                ft = f["type"]
                out.append(
                    {
                        **f,
                        "type": {
                            **ft,
                            "fields": _widen(ft["fields"], depth + 1),
                        },
                    }
                )
        return out

    return _commit_schema_evolution(path, _widen(cur["fields"], 0))


def _parse_ice_type_string(src: str, alloc):
    """Parse an Iceberg type STRING — primitives plus the spec's nested
    forms ``struct<name:type,...>`` / ``list<type>`` /
    ``map<key,value>`` — into the metadata JSON type (str for
    primitives, dict with FRESH ids from ``alloc`` for nested
    member/element/key/value). Round 14: ADD COLUMN struct<...> is
    ordinary DDL for a foreign catalog user."""
    text = src.strip()
    pos = 0

    def peek():
        return text[pos] if pos < len(text) else ""

    def skip_ws():
        nonlocal pos
        while pos < len(text) and text[pos] in " \t":
            pos += 1

    def parse_type():
        nonlocal pos
        skip_ws()
        start = pos
        while pos < len(text) and (text[pos].isalnum() or text[pos] == "_"):
            pos += 1
        word = text[start:pos].lower()
        skip_ws()
        if word == "struct":
            if peek() != "<":
                raise ValueError(f"{src!r}: struct needs <...> at {pos}")
            pos += 1
            fields = []
            while True:
                skip_ws()
                nstart = pos
                while pos < len(text) and (
                    text[pos].isalnum() or text[pos] in "_-"
                ):
                    pos += 1
                fname = text[nstart:pos]
                if not fname:
                    raise ValueError(
                        f"{src!r}: expected member name at {pos}"
                    )
                skip_ws()
                if peek() != ":":
                    raise ValueError(f"{src!r}: expected ':' at {pos}")
                pos += 1
                # java order: the member id is assigned BEFORE its own
                # nested type's ids (assignFreshIds)
                fid = alloc()
                ftype = parse_type()
                fields.append(
                    {
                        "id": fid,
                        "name": fname,
                        "required": False,
                        "type": ftype,
                    }
                )
                skip_ws()
                if peek() == ",":
                    pos += 1
                    continue
                if peek() == ">":
                    pos += 1
                    break
                raise ValueError(f"{src!r}: expected ',' or '>' at {pos}")
            return {"type": "struct", "fields": fields}
        if word == "list":
            if peek() != "<":
                raise ValueError(f"{src!r}: list needs <...> at {pos}")
            pos += 1
            eid = alloc()
            el = parse_type()
            skip_ws()
            if peek() != ">":
                raise ValueError(f"{src!r}: expected '>' at {pos}")
            pos += 1
            return {
                "type": "list",
                "element-id": eid,
                "element-required": False,
                "element": el,
            }
        if word == "map":
            if peek() != "<":
                raise ValueError(f"{src!r}: map needs <...> at {pos}")
            pos += 1
            kid = alloc()
            vid = alloc()
            k = parse_type()
            skip_ws()
            if peek() != ",":
                raise ValueError(f"{src!r}: expected ',' at {pos}")
            pos += 1
            v = parse_type()
            skip_ws()
            if peek() != ">":
                raise ValueError(f"{src!r}: expected '>' at {pos}")
            pos += 1
            return {
                "type": "map",
                "key-id": kid,
                "key": k,
                "value-id": vid,
                "value-required": False,
                "value": v,
            }
        # primitive (decimal(p,s) / fixed[n] carry a parenthesized tail)
        if peek() and peek() in "([":
            close = ")" if peek() == "(" else "]"
            pstart = pos
            while pos < len(text) and text[pos] != close:
                pos += 1
            if pos >= len(text):
                raise ValueError(f"{src!r}: unterminated {close!r}")
            pos += 1
            word = (word + text[pstart:pos]).replace(" ", "")
        if _ice_to_spark_type(word) is None and word != "variant":
            raise NotImplementedError(
                f"iceberg type {word!r} is outside this module's mapping"
            )
        return word

    out = parse_type()
    skip_ws()
    if pos != len(text):
        raise ValueError(f"{src!r}: trailing input at {pos}")
    return out


def add_iceberg_column(
    path: str,
    name: str,
    ice_type: str,
    default=None,
    write_default=None,
    required: bool = False,
    doc: str | None = None,
) -> int:
    """ALTER TABLE ADD COLUMN as a ZERO-REWRITE metadata commit (spec
    §Schema Evolution + §Default values): the new schema appends a field
    with a FRESH id; no data file changes. With ``default=``, the field
    carries both ``initial-default`` (the constant scans surface for
    rows in files that predate the column — the v3 alternative to
    rewriting 100 TB of parquet to backfill a constant) and
    ``write-default`` (the value a writer that omits the column
    materializes — ``write_default=`` overrides it when the two should
    differ, the spec allows that), serialized per the spec's JSON
    single-value rules.

    ``ice_type`` accepts primitives AND the spec's nested forms
    (round 14): ``struct<name:type,...>`` / ``list<type>`` /
    ``map<key,value>``, nested arbitrarily — member/element/key/value
    ids allocate fresh past last-column-id (java assignFreshIds order)
    and the commit keeps last-column-id covering them.

    Fail-loud: defaults on a table below format-version 3 (the spec
    gates them on v3), defaults on NESTED or variant types (spec
    §Default values forbids them), ``required=True`` without a default
    (existing files would have no value for a required field),
    duplicate names, unmappable types. Returns the new schema id."""
    meta = _load_metadata(path)
    cur = _current_schema(meta)
    names = [f["name"] for f in cur.get("fields", [])]
    if name in names:
        raise ValueError(f"{path}: column {name!r} already exists")
    fv = meta.get("format-version", 1)
    import itertools as _it

    _base_id = max(
        _max_field_id(cur.get("fields", [])),
        meta.get("last-column-id", 0) or 0,
    )
    # the TOP id allocates first, nested member/element/key/value ids
    # after it (java assignFreshIds order); _commit_schema_evolution
    # covers them all in last-column-id
    _ctr = _it.count(_base_id + 2)
    parsed_type = _parse_ice_type_string(ice_type, lambda: next(_ctr))
    if isinstance(parsed_type, dict):
        # NESTED add-column (round 14, VERDICT r13 item 5)
        if _ice_type_has_variant(parsed_type):
            if fv < 3:
                raise ValueError(
                    f"{path}: variant is a v3-only type (table is v{fv})"
                )
        if default is not None or write_default is not None:
            raise NotImplementedError(
                f"{path}: defaults on nested types are not supported "
                "(spec §Default values: 'Default values are not "
                "supported for... nested types')"
            )
        if required:
            raise ValueError(
                f"{path}: adding a REQUIRED column without a default "
                "would leave existing files with no value for it"
            )
        field = {
            "id": _base_id + 1,
            "name": name,
            "required": False,
            "type": parsed_type,
        }
        if doc:
            field["doc"] = doc
        new_fields = [dict(f) for f in cur["fields"]] + [field]
        return _commit_schema_evolution(path, new_fields)
    ice_type = parsed_type
    if ice_type == "variant":
        if fv < 3:
            raise ValueError(
                f"{path}: variant is a v3-only type (table is v{fv})"
            )
        if default is not None or write_default is not None:
            raise NotImplementedError(
                f"{path}: defaults on variant are not supported"
            )
    if write_default is not None and default is None:
        raise ValueError(
            f"{path}: write_default without default (initial-default) — "
            "pass default= too; existing files would otherwise surface "
            "null while new omitting writers surface the constant"
        )
    if default is not None and fv < 3:
        raise ValueError(
            f"{path}: column defaults require format-version 3 "
            f"(table is v{fv}) — the spec gates initial-default on v3"
        )
    if required and default is None:
        raise ValueError(
            f"{path}: adding a REQUIRED column without a default would "
            "leave existing files with no value for it (spec: new "
            "required fields must carry initial-default)"
        )
    field: dict = {
        "id": _base_id + 1,
        "name": name,
        "required": bool(required),
        "type": ice_type,
    }
    if doc:
        field["doc"] = doc
    if default is not None:
        field["initial-default"] = _default_json(ice_type, default)
        field["write-default"] = _default_json(
            ice_type, write_default if write_default is not None else default
        )
    new_fields = [dict(f) for f in cur["fields"]] + [field]
    return _commit_schema_evolution(path, new_fields)


# ------------------------------------------------------------ statistics ----


def analyze_iceberg(
    spark,
    path: str,
    columns: "list[str] | None" = None,
    k: int = 4096,
    incremental: bool = False,
) -> str:
    """ANALYZE the CURRENT snapshot: compute a per-column NDV theta sketch
    (io/puffin.column_sketches — one shuffle-bounded distinct+TakeOrdered
    pass per column, ≤ k+1 longs collected each), write them into one
    Puffin statistics file under metadata/, and register it in the table
    metadata's ``statistics`` list (spec §Table Statistics) keyed by
    snapshot-id. Re-analyzing the same snapshot replaces its entry; stats
    for other snapshots are kept (readers match by snapshot-id, so stale
    entries are visible as stale rather than silently wrong). Returns the
    Puffin file path.

    100 TB shape: identical to ANALYZE TABLE ... FOR COLUMNS — scheduled
    with ingestion, one scan per analyzed column, driver state O(k) per
    column. The NDV rides blob properties["ndv"] (the field engines
    actually consult); the sketch payload keeps estimates mergeable.

    ``incremental=True`` is where mergeability pays: when a prior
    statistics entry exists for an ANCESTOR snapshot and the change since
    is purely additive (every file of the stats snapshot still live),
    only the files ADDED since are scanned and their sketches UNION with
    the stored ones — a nightly re-analyze of an append-only 100 TB fact
    table then costs one pass over the day's files, not the table. Falls
    back to the full scan (and says so via the return path, not
    silently wrong numbers) when the table is column-mapped/partitioned
    (new-file scan can't be taken raw), a requested column has no prior
    sketch, or files were removed (a KMV union cannot shrink)."""
    import uuid as _uuid

    from . import puffin

    meta = _load_metadata(path)
    snap_id = meta.get("current-snapshot-id")
    if snap_id in (None, -1):
        raise ValueError(f"{path}: no current snapshot to analyze")
    seq = int(meta.get("last-sequence-number") or 0)
    fid_of = {
        f["name"]: f["id"] for f in _current_schema(meta).get("fields", [])
    }
    if columns is None:
        columns = list(fid_of)
    unknown = [c for c in columns if c not in fid_of]
    if unknown:
        raise ValueError(f"{path}: analyze of unknown columns {unknown}")
    sketches = None
    if incremental:
        sketches = _incremental_sketches(spark, path, meta, columns, k)
    if sketches is None:
        df = read_iceberg(spark, path)
        sketches = puffin.column_sketches(df, columns, k=k)
    blobs = [
        (
            {
                "type": puffin.BLOB_TYPE_THETA,
                "fields": [fid_of[c]],
                "snapshot-id": snap_id,
                "sequence-number": seq,
                "properties": {"ndv": str(sk.estimate)},
            },
            sk.serialize(),
        )
        for c, sk in sketches.items()
    ]
    meta_dir = os.path.join(path, "metadata")
    puffin_path = os.path.join(
        meta_dir, f"{snap_id}-{_uuid.uuid4().hex[:12]}.stats.puffin"
    )
    info = puffin.write_puffin(
        puffin_path, blobs, properties={"created-by": "feature_store_ml_spark"}
    )
    entry = {
        "snapshot-id": snap_id,
        "statistics-path": f"file:{puffin_path}",
        "file-size-in-bytes": info["file-size-in-bytes"],
        "file-footer-size-in-bytes": info["file-footer-size-in-bytes"],
        "blob-metadata": info["blob-metadata"],
    }
    meta2 = dict(meta)
    kept = [
        e
        for e in (meta.get("statistics") or [])
        if e.get("snapshot-id") != snap_id
    ]
    superseded = [
        e
        for e in (meta.get("statistics") or [])
        if e.get("snapshot-id") == snap_id
    ]
    meta2["statistics"] = kept + [entry]
    _swap_metadata(path, meta2)
    # a re-ANALYZE of the same snapshot REPLACED its entry: the old
    # Puffin file is no longer referenced by anything and expiration
    # only reclaims files of entries still present — unlink it now
    # (unless another entry shares the path)
    live_paths = {e.get("statistics-path") for e in kept}
    live_paths.add(entry["statistics-path"])
    for e in superseded:
        sp = e.get("statistics-path")
        if sp and sp not in live_paths:
            try:
                os.unlink(_local_path(sp))
            except OSError:
                pass
    return puffin_path


def table_statistics(path: str) -> dict:
    """Planner-facing statistics of the CURRENT snapshot:
    ``{"row_count", "total_file_bytes", "avg_row_bytes", "ndv": {col: n},
    "stats_snapshot_id"}``. row_count/file bytes come from the manifest
    record counts (metadata-only, no data IO); NDV comes from the current
    snapshot's Puffin entry — ``ndv`` is empty when the snapshot was never
    analyzed (callers must treat absence as "unknown", not zero)."""
    meta = _load_metadata(path)
    snap_id = meta.get("current-snapshot-id")
    if snap_id in (None, -1):
        return {"row_count": 0, "total_file_bytes": 0,
                "avg_row_bytes": 0.0, "ndv": {}, "stats_snapshot_id": None}
    data, _deletes = _snapshot_scan_plan(meta, snap_id, path)
    rows = sum(int(d.get("record_count") or 0) for d in data)
    # position deletes mask one row each (their manifest record_count):
    # subtract for a live-row ESTIMATE — exact unless a position is
    # deleted twice across files or sequence scoping exempts a newer
    # data file, both rare; equality deletes can't be counted without
    # evaluating them, so they are ignored here (planning estimate)
    rows -= sum(
        int(d.get("record_count") or 0)
        for d in _deletes
        if d.get("kind") == "pos"
    )
    rows = max(0, rows)
    size = 0
    for d in data:
        try:
            size += os.path.getsize(d["path"])
        except OSError:
            pass
    ndv: dict[str, int] = {}
    stats_sid = None
    fid_to_name = {
        f["id"]: f["name"] for f in _current_schema(meta).get("fields", [])
    }
    for e in meta.get("statistics") or []:
        if e.get("snapshot-id") != snap_id:
            continue
        stats_sid = snap_id
        for bm in e.get("blob-metadata") or []:
            if bm.get("type") != "apache-datasketches-theta-v1":
                continue
            fids = bm.get("fields") or []
            name = fid_to_name.get(fids[0]) if len(fids) == 1 else None
            est = (bm.get("properties") or {}).get("ndv")
            if name is not None and est is not None:
                ndv[name] = int(est)
    return {
        "row_count": rows,
        "total_file_bytes": size,
        "avg_row_bytes": (size / rows) if rows else 0.0,
        "ndv": ndv,
        "stats_snapshot_id": stats_sid,
    }


def read_statistics_sketches(path: str) -> dict:
    """{column: ThetaSketch} for the current snapshot's Puffin file —
    the mergeable form, for cross-table or incremental NDV math."""
    from . import puffin

    meta = _load_metadata(path)
    snap_id = meta.get("current-snapshot-id")
    fid_to_name = {
        f["id"]: f["name"] for f in _current_schema(meta).get("fields", [])
    }
    out: dict = {}
    for e in meta.get("statistics") or []:
        if e.get("snapshot-id") != snap_id:
            continue
        blobs, _props = puffin.read_puffin(
            _localize(e["statistics-path"], path)
        )
        for bm in blobs:
            if bm.get("type") != puffin.BLOB_TYPE_THETA:
                continue
            fids = bm.get("fields") or []
            name = fid_to_name.get(fids[0]) if len(fids) == 1 else None
            if name is not None:
                out[name] = puffin.ThetaSketch.deserialize(bm["payload"])
    return out


def _incremental_sketches(spark, path, meta, columns, k):
    """The merge path of analyze_iceberg(incremental=True): sketches over
    ONLY the files added since the newest ancestor statistics entry,
    unioned with the stored sketches. Returns None whenever the
    preconditions fail (caller falls back to the full scan):
    column-mapped or partitioned table (a raw scan of the new files
    cannot resolve/backfill columns), no ancestor stats, non-additive
    change, or a requested column lacking a prior sketch."""
    from . import puffin

    specs = {
        s.get("spec-id"): s.get("fields")
        for s in (meta.get("partition-specs") or [])
    }
    if specs.get(meta.get("default-spec-id", 0)):
        return None  # identity backfill needs the full reader
    # newest stats entry on the current snapshot's ancestor chain
    by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    chain = []
    head = meta.get("current-snapshot-id")
    seen = set()
    while head in by_id and head not in seen:
        seen.add(head)
        chain.append(head)
        head = by_id[head].get("parent-snapshot-id")
    entries = {
        e.get("snapshot-id"): e for e in (meta.get("statistics") or [])
    }
    stats_sid = next((sid for sid in chain if sid in entries), None)
    if stats_sid is None or stats_sid == meta.get("current-snapshot-id"):
        return None
    prior_files = set(_snapshot_files(meta, stats_sid, path))
    cur_data, cur_deletes = _snapshot_scan_plan(
        meta, meta["current-snapshot-id"], path
    )
    if cur_deletes:
        return None  # row-level deletes shrink NDV; union cannot
    if any((d.get("format") or "PARQUET") != "PARQUET" for d in cur_data):
        # non-parquet data files: the footer probe below raises
        # ArrowInvalid (not OSError) and spark.read.parquet would misread
        # the bytes anyway — fall back to the full reader, which routes
        # AVRO through avro_lite
        return None
    cur_files = {d["path"] for d in cur_data}
    if not prior_files <= cur_files:
        return None  # files removed since the stats snapshot
    # prior sketches, under the CURRENT schema's names
    fid_to_name = {
        f["id"]: f["name"] for f in _current_schema(meta).get("fields", [])
    }
    prior: dict = {}
    blobs, _props = puffin.read_puffin(
        _localize(entries[stats_sid]["statistics-path"], path)
    )
    for bm in blobs:
        if bm.get("type") != puffin.BLOB_TYPE_THETA:
            continue
        fids = bm.get("fields") or []
        name = fid_to_name.get(fids[0]) if len(fids) == 1 else None
        if name is not None:
            prior[name] = puffin.ThetaSketch.deserialize(bm["payload"])
    if any(c not in prior for c in columns):
        return None
    new_files = sorted(cur_files - prior_files)
    if not new_files:
        return {c: prior[c] for c in columns}
    # the raw scan resolves columns BY NAME: a file written before a
    # rename carries the old name and would sketch nulls — probe footers
    # (O(#new files), driver) and fall back to the full reader if any
    # new file lacks a requested column
    import pyarrow.parquet as _pq

    for f in new_files:
        try:
            names = set(_pq.read_schema(f).names)
        except OSError:
            return None
        if not set(columns) <= names:
            return None
    fresh = puffin.column_sketches(
        spark.read.parquet(*new_files), columns, k=k
    )
    return {c: prior[c].merge(fresh[c]) for c in columns}


def rewrite_manifests_iceberg(
    spark, path: str, target_entries: int = 100_000
) -> dict:
    """Iceberg's ``rewrite_manifests`` maintenance action: consolidate the
    current snapshot's DATA manifests into ⌈entries/target_entries⌉ new
    ones — entries carried VERBATIM (bounds, counts, partition tuples,
    original snapshot ids; status EXISTING per spec), zero data IO. Scan
    planning walks O(#manifests) files, and an append-only stream (or the
    UniForm incremental sync, which adds one manifest per commit by
    design) grows that linearly — this is the periodic bound, exactly
    like checkpoint_delta bounds Delta's JSON replay.

    Sequence-number honesty (round 10): position/equality-delete scoping
    compares each data file's sequence number, so carried entries are
    stamped with an EXPLICIT per-entry ``sequence_number`` (spec
    §Manifests field 3 — null inherits the manifest-list entry's, a
    non-null value wins) taken from their source manifest. Consolidation
    is therefore safe WITH live delete manifests: data manifests of any
    mix of sequences merge, delete manifests carry over verbatim under
    their original sequence, and every mask applies to exactly the same
    files afterwards. Returns {"before", "after", "snapshot_id"}
    (snapshot_id None when nothing was rewritten — fewer than two data
    manifests). Prior snapshots stay time-travelable;
    expire_iceberg_snapshots reclaims the old manifest files once their
    snapshots age out."""
    import time as _time
    import uuid as _uuid

    if not is_iceberg_table(path):
        raise ValueError(f"{path}: not an Iceberg table")
    meta = _load_metadata(path)
    cur = meta.get("current-snapshot-id")
    if cur in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == cur)
    ml_entries = avro_lite.read_container(_localize(snap["manifest-list"], path))
    data_ml = [e for e in ml_entries if e.get("content", 0) == 0]
    delete_ml = [e for e in ml_entries if e.get("content", 0) == 1]
    if len(data_ml) <= 1:
        return {"before": len(data_ml), "after": len(data_ml),
                "snapshot_id": None}
    fv = meta.get("format-version", 1)
    entries: list[dict] = []
    min_seq = None
    for e in data_ml:
        mseq = int(e.get("sequence_number") or 0)
        min_seq = mseq if min_seq is None else min(min_seq, mseq)
        for m in avro_lite.read_container(_localize(e["manifest_path"], path)):
            if m.get("status") == _STATUS_DELETED:
                continue
            _eseq = m.get("sequence_number")
            entries.append(
                {
                    "status": 0,  # EXISTING: carried, not added here
                    "snapshot_id": m.get("snapshot_id") or cur,
                    # explicit per-entry seq (source manifest's, unless
                    # the entry already carried its own) — delete
                    # scoping survives the cross-sequence merge
                    **(
                        {
                            "sequence_number": (
                                int(_eseq) if _eseq is not None else mseq
                            )
                        }
                        if fv >= 2
                        else {}
                    ),
                    "data_file": m["data_file"],
                }
            )
    spec = next(
        (
            s
            for s in meta.get("partition-specs") or []
            if s.get("spec-id") == meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    fid_to_type = {
        f["id"]: f["type"] for f in _current_schema(meta).get("fields", [])
    }

    def _rtype(pf: dict) -> str:
        # transform result types per spec: identity/truncate keep the
        # source type; year/month/day/hour and bucket produce int
        kind, _p = _parse_transform_spec_name(pf.get("transform", "identity"))
        if kind in ("identity", "truncate"):
            return fid_to_type.get(pf.get("source-id"), "string")
        return "int"

    partition_fields = [
        {"name": pf["name"], "type": ["null", _avro_partition_type(_rtype(pf))]}
        for pf in spec.get("fields") or []
    ]
    meta_dir = os.path.join(path, "metadata")
    now_ms = int(_time.time() * 1000)
    snap_id = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    seq = int(meta.get("last-sequence-number") or 0) + 1 if fv >= 2 else 0
    n_out = max(1, -(-len(entries) // target_entries))
    chunk = -(-len(entries) // n_out)
    new_ml = []
    for i in range(n_out):
        part = entries[i * chunk : (i + 1) * chunk]
        if not part:
            continue
        mf = os.path.join(meta_dir, f"{_uuid.uuid4().hex}-m{i}.avro")
        avro_lite.write_container(
            mf, _manifest_entry_schema(fv, partition_fields), part
        )
        new_ml.append(
            {
                "manifest_path": f"file:{mf}",
                "manifest_length": os.path.getsize(mf),
                "partition_spec_id": meta.get("default-spec-id", 0),
                "added_snapshot_id": snap_id,
                "content": 0,
                # every carried entry stamps its OWN sequence number, so
                # the list-entry seq is only the inheritance default for
                # (nonexistent) null entries; min_sequence_number records
                # the true floor for planning honesty
                "sequence_number": min_seq or seq,
                "min_sequence_number": min_seq or seq,
            }
        )
    n_data_created = len(new_ml)
    # live DELETE manifests carry over verbatim under their original
    # sequence numbers — consolidation touches only data manifests
    new_ml.extend(delete_ml)
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-{_uuid.uuid4().hex}.avro")
    mf_schema = _manifest_file_schema(fv)
    keep = {f["name"] for f in mf_schema["fields"]}
    avro_lite.write_container(
        mlist, mf_schema, [{k: e.get(k, 0) for k in keep} for e in new_ml]
    )
    snapshot = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": cur,
        "timestamp-ms": now_ms,
        "manifest-list": f"file:{mlist}",
        "summary": {
            "operation": "replace",
            "manifests-replaced": str(len(data_ml)),
            "manifests-created": str(n_data_created),
            "manifests-kept": str(len(delete_ml)),
        },
        "schema-id": meta.get("current-schema-id", 0),
    }
    if fv >= 2:
        snapshot["sequence-number"] = seq
    meta2 = dict(meta)
    meta2["last-updated-ms"] = now_ms
    meta2["current-snapshot-id"] = snap_id
    meta2["snapshots"] = list(meta.get("snapshots", [])) + [snapshot]
    if fv >= 2:
        meta2["last-sequence-number"] = seq
    meta2["snapshot-log"] = list(meta.get("snapshot-log", [])) + [
        {"timestamp-ms": now_ms, "snapshot-id": snap_id}
    ]
    # content unchanged: the statistics entry rides forward (same rule as
    # pure compaction)
    carried = [
        {**e, "snapshot-id": snap_id}
        for e in meta.get("statistics") or []
        if e.get("snapshot-id") == cur
    ]
    if carried:
        meta2["statistics"] = list(meta.get("statistics") or []) + carried
    _swap_metadata(path, meta2)
    return {"before": len(data_ml), "after": n_data_created,
            "snapshot_id": snap_id}


def _rowfmt_scan_prelude(declared, meta, entries: list[dict], fmt: str):
    """Shared resolution plan for non-parquet data-file scans (AVRO/ORC):
    declared column names, decode kinds (by declared Spark type),
    name -> field-id map from the current schema, and the per-file
    identity-partition backfill tuples (PHYSICAL encoding — days ints
    for dates, micros for timestamps — straight from the manifest
    partition tuple) serialized as JSON for the worker side.
    timestamptz decodes as the UTC INSTANT (kind 'tsz' — tz-aware
    pandas values survive the arrow boundary with the instant intact,
    session-timezone-independent; round 9)."""
    import json as _json

    from pyspark.sql.types import (
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        TimestampNTZType,
        TimestampType,
    )

    names = [f.name for f in declared.fields]
    kinds = {}
    for f in declared.fields:
        if isinstance(f.dataType, DateType):
            kinds[f.name] = "date"
        elif isinstance(f.dataType, TimestampType):
            kinds[f.name] = "tsz"
        elif isinstance(f.dataType, TimestampNTZType):
            kinds[f.name] = "ts"
        elif isinstance(f.dataType, IntegerType):
            kinds[f.name] = "i32"
        elif isinstance(f.dataType, LongType):
            kinds[f.name] = "i64"
        elif isinstance(f.dataType, (DoubleType, FloatType)):
            kinds[f.name] = "f"
    fid_of = {
        f["name"]: f.get("id")
        for f in _current_schema(meta).get("fields", [])
    }
    # identity-partition tuple backfill: field name in the tuple ->
    # declared SOURCE column name (via source-id; values stay physical)
    fid_to_name = {v: k for k, v in fid_of.items() if v is not None}
    spec0 = next(
        (
            s
            for s in meta.get("partition-specs") or []
            if s.get("spec-id") == meta.get("default-spec-id", 0)
        ),
        {"fields": []},
    )
    ident_src = {
        pf["name"]: fid_to_name.get(pf.get("source-id"))
        for pf in (spec0.get("fields") or [])
        if pf.get("transform") == "identity"
        and fid_to_name.get(pf.get("source-id")) is not None
    }
    backfill_json = {}
    for e in entries:
        tup = {
            ident_src[k]: v
            for k, v in (e.get("partition") or {}).items()
            if k in ident_src
        }
        backfill_json[e["path"]] = _json.dumps(tup)
    # COLUMN DEFAULTS (spec §Default values, v3) in PHYSICAL encoding —
    # the legs substitute these where a fid-stamped file provably
    # predates the column, and the shared per-kind decode (or the ORC
    # leg's typed backfill) converts them exactly like manifest-tuple
    # backfill values
    default_phys = {
        name: _default_phys(ice_t, j)
        for _fid, (name, ice_t, j) in _schema_defaults(meta).items()
    }
    return names, kinds, fid_of, backfill_json, default_phys, _table_name_mapping(meta)


def _read_avro_data(
    spark, entries: list[dict], declared, meta: dict, want_pos: bool = False
):
    """Distributed scan of AVRO data files via the shipped avro_lite
    container reader: one mapInPandas over the scan-plan entries, each
    task decodes its files and projects to the DECLARED schema.

    Column resolution mirrors the parquet path's FIELD-ID contract
    (spec: column identity is the field id, not the name): each file's
    WRITER schema is read alongside its records, and a declared column
    resolves to the file field carrying its id — so files written before
    a rename (ours or a foreign engine's) still surface real values.
    When the id is absent from a file that DOES stamp field-ids, the
    column was provably added after the file and null-fills; files
    without field-ids fall back to name resolution and FAIL LOUDLY on a
    missing declared column (null-filling there would silently erase a
    renamed column's data). Identity-partitioned files may omit their
    partition source column entirely (spec §Column Projection — Hive
    layouts and Delta conversions do); values backfill from the
    manifest partition tuple, which already holds the physical encoding
    (days ints for dates, micros for timestamps).

    Iceberg logical types decode per the declared column type: date =
    days-from-epoch int, timestamp = micros long (NTZ — wall clock,
    timezone-independent), timestamptz = UTC-instant micros long (kind
    'tsz' — decoded tz-AWARE UTC so Spark renders the correct instant in
    the session zone; the stager wrote the same physical micros)."""
    import json as _json

    names, kinds, fid_of, backfill_json, default_phys, nmap = (
        _rowfmt_scan_prelude(declared, meta, entries, "AVRO")
    )
    # nested columns pass through the generic row decoder (round 14) —
    # but temporal/decimal members would arrive as raw physical ints
    # with no conversion leg; refuse loudly (our writer never stages
    # them; this guards foreign files)
    from pyspark.sql.types import (
        ArrayType as _AT,
        DateType as _DT,
        DecimalType as _DecT,
        MapType as _MT,
        StructType as _ST,
        TimestampNTZType as _TNT,
        TimestampType as _TT,
    )

    def _nested_unscannable(dt, top: bool):
        if isinstance(dt, _ST):
            return any(
                _nested_unscannable(f.dataType, False) for f in dt.fields
            )
        if isinstance(dt, _AT):
            return _nested_unscannable(dt.elementType, False)
        if isinstance(dt, _MT):
            return _nested_unscannable(dt.keyType, False) or (
                _nested_unscannable(dt.valueType, False)
            )
        return not top and isinstance(dt, (_DT, _TT, _TNT, _DecT))

    for f in declared.fields:
        if isinstance(f.dataType, (_ST, _AT, _MT)) and _nested_unscannable(
            f.dataType, True
        ):
            raise NotImplementedError(
                f"AVRO scan of nested column {f.name!r}: temporal/"
                "decimal members have no physical-decode leg "
                "(rewrite to parquet via compact_iceberg)"
            )
    out_schema, out_names = _rowfmt_out_schema(declared, want_pos)

    def _batches(it):
        import datetime as _dt
        import os as _os

        import pandas as _pd

        from feature_store_ml_spark.io import avro_lite as _avro

        for pdf in it:
            for p, bf_raw in zip(pdf["path"], pdf["backfill"]):
                # columnar fast path (round 10): vectorized numpy decode
                # — our own files carry the fsml.rowlens sidecar and
                # skip the per-record walk entirely; flat foreign files
                # take the compiled scalar scan; anything non-flat falls
                # back to the generic row decoder below
                try:
                    wschema, ccols, ntotal = _avro.read_container_columnar(p)
                    raw = _pd.DataFrame(index=_pd.RangeIndex(ntotal))
                    for cname, (cvals, cmask) in ccols.items():
                        if cmask.any() and cvals.dtype != object:
                            arr = cvals.astype(object)
                            arr[cmask] = None
                            raw[cname] = arr
                        else:
                            raw[cname] = cvals
                except ValueError:
                    wschema, rows = _avro.read_container_with_schema(p)
                    raw = _pd.DataFrame(rows) if rows else _pd.DataFrame()
                backfill = _json.loads(bf_raw)
                wfields = wschema.get("fields") or []
                name_by_fid = {
                    f["field-id"]: f["name"]
                    for f in wfields
                    if isinstance(f.get("field-id"), int)
                }
                file_names = {f["name"] for f in wfields}
                if not name_by_fid and nmap:
                    # spec §Name Mapping: fid-less files resolve through
                    # the table's mapped candidate names
                    name_by_fid = {
                        fid: hit
                        for fid, cands in nmap.items()
                        for hit in [
                            next((n for n in cands if n in file_names), None)
                        ]
                        if hit is not None
                    }
                out = _pd.DataFrame(index=raw.index)
                for n in names:
                    fid = fid_of.get(n)
                    if name_by_fid:
                        # field-id resolution (rename-safe)
                        if fid in name_by_fid:
                            out[n] = raw[name_by_fid[fid]]
                        elif n in backfill:
                            out[n] = backfill[n]
                        else:
                            # id absent from a fid-stamped file: the
                            # column was added AFTER the file was
                            # written — its initial-default (or null)
                            out[n] = default_phys.get(n)
                    elif n in file_names:
                        out[n] = raw[n]
                    elif n in backfill:
                        out[n] = backfill[n]
                    elif n in ("_row_id", "_last_updated_sequence_number"):
                        # reserved lineage columns can never have been
                        # renamed — absence simply means not materialized
                        out[n] = None
                    else:
                        raise ValueError(
                            f"{p}: declared column {n!r} absent from an "
                            "AVRO data file without field-id attributes "
                            "— cannot prove it was added after the file "
                            "(a renamed column would silently read NULL);"
                            " rewrite to parquet via compact_iceberg"
                        )
                for n, kind in kinds.items():
                    col = out[n]
                    if kind == "date":
                        out[n] = col.map(
                            lambda v: None
                            if v is None
                            else _dt.date(1970, 1, 1)
                            + _dt.timedelta(days=int(v))
                        )
                    elif kind == "ts":
                        out[n] = _pd.to_datetime(col, unit="us")
                    elif kind == "tsz":
                        # UTC instant micros -> tz-aware (instant-stable
                        # across session timezones)
                        out[n] = _pd.to_datetime(col, unit="us", utc=True)
                    elif kind in ("i32", "i64"):
                        out[n] = col.astype(
                            "Int32" if kind == "i32" else "Int64"
                        )
                    elif kind == "f":
                        out[n] = col.astype("float64")
                if want_pos:
                    # row identity WITHOUT parquet _metadata: decode
                    # order is file order, so the ordinal IS the
                    # position-delete `pos`
                    out["_fp"] = f"file:{_os.path.abspath(p)}"
                    out["_ri"] = _pd.array(
                        range(len(out)), dtype="Int64"
                    )
                yield out[out_names]

    paths = [e["path"] for e in entries]
    pdf = local_rows_df(spark, 
        [(p, backfill_json[p]) for p in paths], "path string, backfill string"
    ).repartition(min(len(paths), 64))
    return pdf.mapInPandas(_batches, out_schema)


def _rowfmt_out_schema(declared, want_pos: bool):
    """(schema, column names) for a rowfmt scan — declared plus the
    (_fp, _ri) row-identity pair when the caller masks deletes."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    if not want_pos:
        return declared, [f.name for f in declared.fields]
    schema = StructType(
        list(declared.fields)
        + [StructField("_fp", StringType()), StructField("_ri", LongType())]
    )
    return schema, [f.name for f in declared.fields] + ["_fp", "_ri"]


def _read_orc_data(
    spark, entries: list[dict], declared, meta: dict, want_pos: bool = False
):
    """Distributed scan of ORC data files via ``pyarrow.orc`` inside
    mapInPandas — the arrow-native sibling of :func:`_read_avro_data`
    with the identical resolution contract: columns resolve by FIELD ID
    against each file's schema (the ``iceberg.id`` type attribute, which
    pyarrow round-trips as arrow field metadata — the mechanism the
    Iceberg ORC spec mandates); an id absent from an id-stamped file
    means the column was added after the file and null-fills; files
    without the attribute fall back to name resolution and FAIL LOUDLY
    on a missing declared column. Identity-partition source columns a
    file omits backfill from the manifest partition tuple (physical
    encoding, decoded per declared type here). ORC's plain ``timestamp``
    is the wall-clock NTZ variant, so decode is session-timezone-
    independent; a declared timestamptz column decodes as the UTC
    instant (kind 'tsz' — tz-aware UTC), REQUIRING the file to carry a
    zone-aware arrow type (instant-preserving); a zoneless wall-clock
    ORC file declared timestamptz still refuses at decode, since the
    instant is unrecoverable."""
    import json as _json

    names, kinds, fid_of, backfill_json, default_phys, nmap = (
        _rowfmt_scan_prelude(declared, meta, entries, "ORC")
    )
    out_schema, out_names = _rowfmt_out_schema(declared, want_pos)

    def _batches(it):
        import datetime as _dt
        import os as _os

        import pandas as _pd
        import pyarrow.orc as _orc

        epoch_d = _dt.date(1970, 1, 1)

        def _bf_typed(n, v):
            # backfill values arrive in PHYSICAL encoding; file values
            # arrive typed from arrow — decode backfill to match
            if v is None:
                return None
            k = kinds.get(n)
            if k == "date":
                return epoch_d + _dt.timedelta(days=int(v))
            if k == "ts":
                return _pd.Timestamp(int(v), unit="us")
            if k == "tsz":
                return _pd.Timestamp(int(v), unit="us", tz="UTC")
            return v

        for pdf in it:
            for p, bf_raw in zip(pdf["path"], pdf["backfill"]):
                tbl = _orc.ORCFile(p).read()
                backfill = _json.loads(bf_raw)
                name_by_fid = {}
                for fld in tbl.schema:
                    md = fld.metadata or {}
                    raw_id = md.get(b"iceberg.id")
                    if raw_id is not None:
                        try:
                            name_by_fid[int(raw_id)] = fld.name
                        except ValueError:
                            pass
                file_names = set(tbl.schema.names)
                if not name_by_fid and nmap:
                    # spec §Name Mapping: fid-less files resolve through
                    # the table's mapped candidate names
                    name_by_fid = {
                        fid: hit
                        for fid, cands in nmap.items()
                        for hit in [
                            next((n for n in cands if n in file_names), None)
                        ]
                        if hit is not None
                    }
                raw = tbl.to_pandas()
                out = _pd.DataFrame(index=raw.index)
                for n in names:
                    fid = fid_of.get(n)
                    if name_by_fid:
                        # field-id resolution (rename-safe)
                        if fid in name_by_fid:
                            out[n] = raw[name_by_fid[fid]]
                        elif n in backfill:
                            out[n] = _bf_typed(n, backfill[n])
                        else:
                            # id absent from an id-stamped file: the
                            # column was added AFTER the file was
                            # written — its initial-default (or null)
                            out[n] = _bf_typed(n, default_phys.get(n))
                    elif n in file_names:
                        out[n] = raw[n]
                    elif n in backfill:
                        out[n] = _bf_typed(n, backfill[n])
                    elif n in ("_row_id", "_last_updated_sequence_number"):
                        # reserved lineage columns can never have been
                        # renamed — absence simply means not materialized
                        out[n] = None
                    else:
                        raise ValueError(
                            f"{p}: declared column {n!r} absent from an "
                            "ORC data file without iceberg.id attributes "
                            "— cannot prove it was added after the file "
                            "(a renamed column would silently read NULL);"
                            " rewrite to parquet via compact_iceberg"
                        )
                for n, kind in kinds.items():
                    col = out[n]
                    if kind in ("i32", "i64"):
                        # int columns with nulls arrive float64 from arrow
                        out[n] = col.astype(
                            "Int32" if kind == "i32" else "Int64"
                        )
                    elif kind == "f":
                        out[n] = col.astype("float64")
                    elif kind == "ts":
                        # datetime64[ns] from arrow; normalizes backfill
                        # Timestamp scalars too
                        out[n] = _pd.to_datetime(col)
                    elif kind == "tsz":
                        norm = _pd.to_datetime(col)
                        if getattr(norm.dt, "tz", None) is None and len(
                            norm.dropna()
                        ):
                            # the file stored wall-clock TIMESTAMP but the
                            # table declares timestamptz: localizing here
                            # would guess an offset — refuse
                            raise ValueError(
                                f"{p}: timestamptz column {n!r} stored as "
                                "wall-clock ORC TIMESTAMP (no zone) — "
                                "cannot recover the instant"
                            )
                        out[n] = (
                            norm.dt.tz_convert("UTC")
                            if getattr(norm.dt, "tz", None) is not None
                            else norm
                        )
                    # date: typed datetime.date objects already
                if want_pos:
                    out["_fp"] = f"file:{_os.path.abspath(p)}"
                    out["_ri"] = _pd.array(range(len(out)), dtype="Int64")
                yield out[out_names]

    paths = [e["path"] for e in entries]
    pdf = local_rows_df(spark, 
        [(p, backfill_json[p]) for p in paths], "path string, backfill string"
    ).repartition(min(len(paths), 64))
    return pdf.mapInPandas(_batches, out_schema)
