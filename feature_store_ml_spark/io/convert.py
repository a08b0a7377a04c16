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

Row-level deletes CONVERT (round 7): live Delta deletion vectors become
Iceberg position-delete files and live Iceberg position deletes become
Delta DVs — both are (file, row-ordinal) masks, so the translation is
metadata-sized and exact (bitmaps/pairs move, data bytes never do).
Position work stays executor-side in both directions, mirroring
delete_delta / delete_iceberg's write discipline. EQUALITY deletes
(Delta has no key-scoped lazy mask) RESOLVE to positions instead: the
survivor-complement path (_deletes_to_bitmaps_via_survivors) reuses
read_iceberg's own scan semantics and costs one extra table scan,
paid only when equality content is live.

Column-mapped Delta tables CONVERT too (round 7), partitioned included:
the columnMapping ids become the Iceberg field ids, physical-keyed
partitionValues map back to logical spec fields, and only files that
carry neither footer field ids nor the logical column names refuse
(per-file probe; partition columns are exempt — Hive layout keeps them
out of the data files and the Iceberg read reconstructs them from the
manifest tuples).

Fail-loud boundaries (state the other format cannot express faithfully):
- identity partition sources outside the writer's int/long/string/date
  set.

Non-identity Iceberg partition transforms (bucket/truncate/year/...)
convert by DROPPING the derived partition field: the source column is
physically present in every data file (only identity sources may be
omitted, per spec §Column Projection), so the Delta side reads it
normally and per-file stats keep data skipping alive; the table converts
as unpartitioned on that dimension.
"""

from __future__ import annotations

from ..localframe import local_rows_df

import json
import os
from urllib.parse import unquote

from pyspark.sql import SparkSession

from . import avro_lite, iceberg, lakehouse, skipping


#: above this live-file count the converters' footer walk (stats, row
#: counts, sizes) runs as a Spark job instead of a driver loop — the same
#: crossover discipline as prune_adds_auto's distributed scan planning
_DISTRIBUTED_STATS_THRESHOLD = 10_000


def _harvest_one(p: str, fields: list) -> tuple:
    """One file's footer harvest — shared verbatim by the driver loop and
    the distributed mapInPandas branch of _gather_file_stats so the two
    paths cannot drift (they differ only above the file-count threshold,
    exactly where tests rarely look)."""
    import os as _os

    import pyarrow.parquet as _pq

    try:
        pf = _pq.ParquetFile(p)
    except Exception:
        # footers pyarrow cannot decode (VARIANT Thrift logical type,
        # pyarrow 16): the caller backfills row counts via one Spark job
        # and column names via the JVM footer reader; no bounds (the
        # pruner fails open)
        return (None, _os.path.getsize(p), {}, None, (None, ()))
    sch = pf.schema_arrow
    fids = sorted(
        int((fld.metadata or {}).get(b"PARQUET:field_id"))
        for fld in sch
        if (fld.metadata or {}).get(b"PARQUET:field_id") is not None
    )
    return (
        int(pf.metadata.num_rows),
        _os.path.getsize(p),
        iceberg._file_stats_maps(p, fields),
        skipping.collect_file_stats(p),
        (tuple(sch.names), tuple(fids)),
    )


def _delta_nested_ids(fields_json: list) -> list[int]:
    """Every delta.columnMapping.id in a Delta schema JSON, walked
    recursively through struct members (list/map inner nodes are not
    StructFields and carry none)."""
    out: list[int] = []

    def walk_type(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f0 in t.get("fields", []):
                    md = f0.get("metadata") or {}
                    if md.get("delta.columnMapping.id") is not None:
                        out.append(int(md["delta.columnMapping.id"]))
                    walk_type(f0.get("type"))
            elif t.get("type") == "array":
                walk_type(t.get("elementType"))
            elif t.get("type") == "map":
                walk_type(t.get("keyType"))
                walk_type(t.get("valueType"))

    for f0 in fields_json:
        md = f0.get("metadata") or {}
        if md.get("delta.columnMapping.id") is not None:
            out.append(int(md["delta.columnMapping.id"]))
        walk_type(f0.get("type"))
    return out


def _spark_contains_struct(dt) -> bool:
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return True
    if isinstance(dt, T.ArrayType):
        return _spark_contains_struct(dt.elementType)
    if isinstance(dt, T.MapType):
        return _spark_contains_struct(dt.keyType) or _spark_contains_struct(
            dt.valueType
        )
    return False


def _mapped_ice_type(spark_dt, delta_t, alloc, where: str, derived: list):
    """Iceberg type for a column of a COLUMN-MAPPED Delta table (ADVICE
    r13, round 14): struct member ids come from the members' OWN
    delta.columnMapping.id when the Delta metadata carries one —
    standard delta-spark stamps one per nested StructField and (in id
    mode) writes it into the parquet footers, so deriving FRESH member
    ids there would declare an Iceberg schema whose ids mismatch every
    footer and silently NULL the members for any id-resolving reader;
    ``derived`` gets a True appended so the caller stamps the
    member-resolving read property. Members WITHOUT metadata ids (this
    repo's own mapped writer: top-level mapping only, members stored
    under logical names) allocate fresh ids and resolve by name — the
    round-13 contract, still validated per file by the logical-path
    probe. list/map inner nodes are not StructFields and carry no Delta
    id — they allocate fresh (no footer conflict: Spark has no metadata
    slot for them either). A list/map CARRYING a struct with
    metadata-mapped members refuses: members inside containers are
    stored under physical names and the reader has no container-level
    rebuild leg."""
    from pyspark.sql import types as T

    if isinstance(spark_dt, T.StructType):
        by = {
            f0["name"]: f0
            for f0 in (
                delta_t.get("fields", []) if isinstance(delta_t, dict) else []
            )
        }
        out = []
        for sf in spark_dt.fields:
            f0 = by.get(sf.name) or {}
            md = f0.get("metadata") or {}
            mid = md.get("delta.columnMapping.id")
            if mid is not None:
                derived.append(True)
            out.append(
                {
                    "id": int(mid) if mid is not None else alloc(),
                    "name": sf.name,
                    "required": not sf.nullable,
                    "type": _mapped_ice_type(
                        sf.dataType,
                        f0.get("type"),
                        alloc,
                        f"{where}.{sf.name}",
                        derived,
                    ),
                }
            )
        return {"type": "struct", "fields": out}
    if isinstance(spark_dt, (T.ArrayType, T.MapType)):
        if _delta_nested_ids_in_type(delta_t):
            raise NotImplementedError(
                f"mapped column {where}: a list/map carrying a "
                "metadata-mapped struct has no member-resolution leg on "
                "the read side — unsupported under column mapping"
            )
        return iceberg._spark_dt_to_ice(spark_dt, alloc, variant_ok=True)
    return iceberg._spark_dt_to_ice(spark_dt, None, variant_ok=True)


def _delta_nested_ids_in_type(t) -> list[int]:
    """delta.columnMapping.ids anywhere inside one Delta JSON TYPE value
    (struct members walked recursively through containers)."""
    if isinstance(t, dict) and t.get("type") == "struct":
        return _delta_nested_ids(t.get("fields", []))
    if isinstance(t, dict) and t.get("type") == "array":
        return _delta_nested_ids_in_type(t.get("elementType"))
    if isinstance(t, dict) and t.get("type") == "map":
        return _delta_nested_ids_in_type(
            t.get("keyType")
        ) + _delta_nested_ids_in_type(t.get("valueType"))
    return []


def _ice_struct_member_ids(t, part: bool = False) -> list[int]:
    """All struct-member ids in an Iceberg type tree (the footer-evidence
    set for mapped nested columns; list/map inner ids excluded — footers
    never stamp them)."""
    out: list[int] = []
    if isinstance(t, dict) and t.get("type") == "struct":
        for f in t.get("fields", []):
            if "id" in f:
                out.append(f["id"])
            out.extend(_ice_struct_member_ids(f.get("type")))
    return out


def _member_evidence_ok(sch, ice_fields: list, part_cols: list) -> bool:
    """MIRROR of the read-side member resolution, run as the conversion
    probe: for every declared struct column, locate the TOP node in the
    footer by field id (falling back to the logical name), then each
    member under it by ITS field id (falling back to its logical name),
    recursively. A member resolvable by neither would read silently
    NULL — the caller refuses the file."""

    def _fid(field):
        v = (field.metadata or {}).get(b"PARQUET:field_id")
        return None if v is None else int(v)

    def _child(container, want_id, want_name):
        kids = (
            [container.field(i) for i in range(container.num_fields)]
            if hasattr(container, "num_fields")
            else list(container)
        )
        hit = next((k for k in kids if _fid(k) == want_id), None)
        if hit is None:
            hit = next((k for k in kids if k.name == want_name), None)
        return hit

    def _members_ok(node_type, ice_t) -> bool:
        if not (isinstance(ice_t, dict) and ice_t.get("type") == "struct"):
            return True
        if not hasattr(node_type, "num_fields"):
            return False
        for g in ice_t.get("fields", []):
            m = _child(node_type, g.get("id"), g["name"])
            if m is None:
                return False
            if not _members_ok(m.type, g.get("type")):
                return False
        return True

    for f in ice_fields:
        if f["name"] in part_cols:
            continue
        if not (
            isinstance(f["type"], dict) and f["type"].get("type") == "struct"
        ):
            continue
        top = _child(sch, f.get("id"), f["name"])
        if top is None or not _members_ok(top.type, f["type"]):
            return False
    return True


def _gather_file_stats(
    spark: SparkSession,
    paths: list[str],
    fields: list[dict],
    threshold: int,
) -> dict:
    """Per-file footer harvest for conversion: {abs_path: (num_rows,
    size_bytes, iceberg_stats_maps, delta_stats_json, footer_probe)} with
    ``footer_probe = (column_names, field_ids)`` — the resolution evidence
    the column-mapping path needs. Driver loop below ``threshold`` files;
    above it, one Arrow-batched Spark job (each file is independent footer
    IO — embarrassingly parallel), with results pickled per file because
    the Iceberg bounds are raw bytes."""

    if len(paths) < threshold:
        return {p: _harvest_one(p, fields) for p in paths}

    import base64
    import pickle

    flds = list(fields)

    def batch(it):
        import pandas as pd

        from feature_store_ml_spark.io.convert import _harvest_one as _h1

        for pdf in it:
            blobs = []
            for p in pdf["path"]:
                blobs.append(
                    base64.b64encode(
                        pickle.dumps((p, _h1(p, flds)))
                    ).decode()
                )
            yield pd.DataFrame({"blob": blobs})

    n_parts = max(32, len(paths) // 2000)
    rows = (
        local_rows_df(spark, [(p,) for p in paths], "path string")
        .repartition(n_parts)
        .mapInPandas(batch, "blob string")
        .collect()
    )
    out = {}
    for r in rows:
        p, v = pickle.loads(base64.b64decode(r["blob"]))
        out[p] = v
    return out


def _write_pos_deletes(
    spark: SparkSession, table_root: str, meta_dir: str, dv_descs: dict
) -> list:
    """Translate live Delta deletion vectors into Iceberg POSITION DELETE
    parquet (spec §Position Delete Files): ship the COMPRESSED bitmaps to
    the executors (one row per DV'd file), explode to (file_path, pos)
    there, and write globally sorted — the driver never materializes a
    position list, mirroring delete_iceberg's write discipline. Files
    land under ``metadata/`` (never the data space the two format views
    share; vacuum_delta skips a converted table's metadata dir) as
    ``pos-delete-*.parquet``. Returns [(abs_path, n_rows)]."""
    import shutil
    import uuid as _uuid

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F  # noqa: F401

    blobs = [
        (
            "file:" + os.path.abspath(os.path.join(table_root, rel)),
            lakehouse._dv_bytes(table_root, desc),
        )
        for rel, desc in sorted(dv_descs.items())
    ]
    bdf = local_rows_df(spark, blobs, "file_path string, dv binary")

    def _expand(batches):
        import pandas as pd

        from feature_store_ml_spark.io import roaring as _roaring

        for pdf in batches:
            for uri, blob in zip(pdf["file_path"], pdf["dv"]):
                pos = _roaring.deserialize_positions(bytes(blob))
                yield pd.DataFrame(
                    {"file_path": uri, "pos": pd.array(pos, dtype="int64")}
                )

    pairs = bdf.repartition(max(1, min(len(blobs), 32)), "file_path").mapInPandas(
        _expand, "file_path string, pos long"
    )
    staging = os.path.join(meta_dir, f"_staging_{_uuid.uuid4().hex[:12]}")
    (
        pairs.repartitionByRange("file_path", "pos")
        .sortWithinPartitions("file_path", "pos")
        .write.parquet(staging)
    )
    del_files: list = []
    run = _uuid.uuid4().hex
    for i, part in enumerate(
        sorted(n for n in os.listdir(staging) if n.endswith(".parquet"))
    ):
        src = os.path.join(staging, part)
        n_rows = pq.ParquetFile(src).metadata.num_rows
        if n_rows == 0:
            continue
        dst = os.path.join(meta_dir, f"pos-delete-{run}-{i}.parquet")
        os.rename(src, dst)
        del_files.append((dst, n_rows))
    shutil.rmtree(staging)
    return del_files


def _pos_deletes_to_bitmaps(
    spark: SparkSession,
    table_root: str,
    data: list,
    deletes: list,
    root_abs: str,
) -> dict:
    """Fold live Iceberg position-delete files into one roaring bitmap per
    data file, SEQUENCE-SCOPED per spec (a position delete applies only
    to data files with sequence <= its own): Spark reads the delete
    parquets, writer URIs re-root driver-side over the DISTINCT paths
    only, the (file -> data seq) map joins broadcast, and each file's
    bitmap serializes executor-side via groupBy+applyInPandas — the
    driver collects O(#DV'd files) compressed blobs, never positions
    (delete_delta's write discipline). Returns {rel: (bytes, card)}."""
    from pyspark.sql import functions as F

    del_rows = [
        ("file:" + os.path.abspath(d["path"]), int(d["seq"] or 0))
        for d in deletes
    ]
    # _decoded_meta_path, not raw _metadata.file_path: the column arrives
    # percent-ENCODED, while del_rows is built from raw driver abspaths —
    # a special-char table root would make the _src join match nothing
    # and silently drop every position delete from the converted DVs
    _by_fmt = iceberg._delete_files_by_fmt([d["path"] for d in deletes])
    raw = None
    if _by_fmt["parquet"]:
        raw = spark.read.parquet(*_by_fmt["parquet"]).select(
            "file_path",
            "pos",
            iceberg._decoded_meta_path(_by_fmt["parquet"]).alias("_src"),
        )
    if _by_fmt["avro"] or _by_fmt["orc"]:
        # foreign AVRO/ORC position deletes (round 9): the source path is
        # emitted directly (it IS the driver abspath del_rows keys on)

        def _rowfmt_batches(it):
            import os as _os

            import pandas as _pd

            from feature_store_ml_spark.io import avro_lite as _avro

            for pdf in it:
                for p in pdf["path"]:
                    with open(p, "rb") as fh:
                        is_avro = fh.read(4) == b"Obj\x01"
                    if is_avro:
                        rows = _avro.read_container(p)
                        fps = [str(r["file_path"]) for r in rows]
                        poss = [int(r["pos"]) for r in rows]
                    else:
                        import pyarrow.orc as _pa_orc

                        t = _pa_orc.ORCFile(p).read(
                            columns=["file_path", "pos"]
                        )
                        fps = t.column("file_path").to_pylist()
                        poss = [int(x) for x in t.column("pos").to_pylist()]
                    yield _pd.DataFrame(
                        {
                            "file_path": fps,
                            "pos": poss,
                            "_src": [f"file:{_os.path.abspath(p)}"]
                            * len(fps),
                        }
                    )

        _nf = _by_fmt["avro"] + _by_fmt["orc"]
        fmt_raw = (
            local_rows_df(spark, [(p,) for p in _nf], "path string")
            .repartition(min(len(_nf), 64))
            .mapInPandas(
                _rowfmt_batches, "file_path string, pos long, _src string"
            )
        )
        raw = fmt_raw if raw is None else raw.unionByName(fmt_raw)
    if _by_fmt.get("puffin"):
        # v3 DELETION VECTORS: decode each puffin blob to the referenced
        # file's positions (round 11) — the conversion then re-encodes
        # them as Delta DVs like any other position content

        def _puffin_batches(it):
            import os as _os

            import pandas as _pd

            from feature_store_ml_spark.io import puffin as _puf
            from feature_store_ml_spark.io import roaring as _roar

            for pdf in it:
                for p in pdf["path"]:
                    fps, poss = [], []
                    blobs, _props = _puf.read_puffin(p)
                    for b in blobs:
                        if b.get("type") != _puf.BLOB_TYPE_DV:
                            continue
                        ref = (b.get("properties") or {}).get(
                            "referenced-data-file"
                        )
                        pp = _roar.deserialize_positions(
                            _roar.read_dv_blob(b["payload"], 0, None)
                        )
                        fps.extend([ref] * len(pp))
                        poss.extend(pp)
                    yield _pd.DataFrame(
                        {
                            "file_path": fps,
                            "pos": poss,
                            "_src": [f"file:{_os.path.abspath(p)}"]
                            * len(fps),
                        }
                    )

        _pf = _by_fmt["puffin"]
        pf_raw = (
            local_rows_df(spark, [(p,) for p in _pf], "path string")
            .repartition(min(len(_pf), 64))
            .mapInPandas(
                _puffin_batches, "file_path string, pos long, _src string"
            )
        )
        raw = pf_raw if raw is None else raw.unionByName(pf_raw)
    src_df = local_rows_df(spark, del_rows, "_src2 string, _del_seq long")
    distinct = [
        r["file_path"] for r in raw.select("file_path").distinct().collect()
    ]
    mapping = []
    for u in distinct:
        # _localize_decoded: delete-file content is URI-encoded (written
        # from _metadata.file_path) while the data entries' rel keys are
        # raw on-disk bytes — an undecoded path would silently drop every
        # delete in a special-char partition dir
        ab = os.path.abspath(iceberg._localize_decoded(u, table_root))
        mapping.append((u, os.path.relpath(ab, root_abs).replace(os.sep, "/")))
    map_df = local_rows_df(spark, mapping, "_raw string, _rel string")
    dseq_df = local_rows_df(spark, 
        [
            (
                os.path.relpath(os.path.abspath(d["path"]), root_abs).replace(
                    os.sep, "/"
                ),
                int(d["seq"] or 0),
            )
            for d in data
        ],
        "_rel2 string, _data_seq long",
    )
    pairs = (
        raw.join(F.broadcast(src_df), raw["_src"] == F.col("_src2"))
        .join(F.broadcast(map_df), raw["file_path"] == F.col("_raw"))
        .join(F.broadcast(dseq_df), F.col("_rel") == F.col("_rel2"))
        .where(F.col("_del_seq") >= F.col("_data_seq"))
        .select(F.col("_rel").alias("rel"), F.col("pos").cast("long").alias("pos"))
    )

    return _pairs_to_blobs(pairs)


def _pairs_to_blobs(pairs: "DataFrame") -> dict:
    """(rel, pos) pairs -> {rel: (serialized roaring bytes, cardinality)}:
    one bitmap per file serialized EXECUTOR-side via groupBy+applyInPandas;
    the driver collects O(#DV'd files) compressed blobs, never positions
    (delete_delta's write discipline)."""

    def _ser(pdf):
        import pandas as pd

        from feature_store_ml_spark.io import roaring as _roaring

        rel = pdf["rel"].iloc[0]
        positions = sorted(set(pdf["pos"].astype("int64").tolist()))
        blob = _roaring.serialize_positions(positions)
        return pd.DataFrame(
            {"rel": [rel], "dv": [blob], "card": [len(positions)]}
        )

    rows = (
        pairs.groupBy("rel")
        .applyInPandas(_ser, "rel string, dv binary, card long")
        .collect()
    )
    return {r["rel"]: (bytes(r["dv"]), int(r["card"])) for r in rows}


def _deletes_to_bitmaps_via_survivors(
    spark: SparkSession, table_root: str, data: list, root_abs: str
) -> dict:
    """Fold ALL live delete content — position AND equality files — into
    one roaring bitmap per data file by COMPLEMENT: the survivor set
    comes from ``read_iceberg``'s own scan (which already implements the
    spec's sequence scoping — strictly-older for equality, at-or-older
    for position — rename-stable field-id resolution, and
    identity-partition projection backfill, so there is no second
    implementation of equality semantics to drift), and every physical
    position absent from it is deleted.

    The position universe is SYNTHESIZED from footer row counts
    (``sequence(0, n-1)`` exploded per file — no data-column IO, and no
    mixed-physical-schema union read across rename generations); the
    survivor scan prunes to the _metadata columns plus whatever equality
    columns its anti-joins need (Catalyst column pruning). One full-table
    scan plus one anti-join shuffle — paid exactly when equality deletes
    are present; the pos-only fold (_pos_deletes_to_bitmaps) stays the
    cheap path. Returns {rel: (bytes, card)}."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    rows = []
    for d in data:
        ab = os.path.abspath(d["path"])
        n = pq.ParquetFile(ab).metadata.num_rows
        if n:
            rows.append(
                (
                    "file:" + ab,
                    os.path.relpath(ab, root_abs).replace(os.sep, "/"),
                    int(n),
                )
            )
    if not rows:
        return {}
    universe = (
        local_rows_df(spark, rows, "_fp string, _rel string, _n long")
        .select(
            "_fp",
            "_rel",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_ri"),
        )
    )
    survivors = iceberg.read_iceberg(
        spark, table_root, with_row_identity=True
    ).select(
        # decoded: the universe keys on RAW on-disk paths while
        # _metadata.file_path arrives percent-encoded (special-char
        # partition dirs would otherwise match nothing — masking every
        # row of those files as deleted)
        lakehouse._decoded_file_path(
            [os.path.abspath(d["path"]) for d in data]
        ).alias("_fp"),
        F.col("_metadata.row_index").alias("_ri"),
    )
    pairs = universe.join(survivors, ["_fp", "_ri"], "left_anti").select(
        F.col("_rel").alias("rel"), F.col("_ri").cast("long").alias("pos")
    )
    return _pairs_to_blobs(pairs)


def convert_delta_to_iceberg(
    spark: SparkSession, path: str, refresh: bool = False,
    stats_threshold: int = _DISTRIBUTED_STATS_THRESHOLD,
    format_version: "int | None" = None,
) -> int:
    """Write Iceberg metadata (``metadata/`` + manifests) over a Delta
    table's CURRENT live file set, in place — after this, the same
    directory reads as either format (`read_delta` and `read_iceberg`
    return identical rows). ``refresh=True`` re-syncs an already
    converted table after NEW Delta commits (the per-commit UniForm
    shape): the next metadata version appends one snapshot holding the
    current live set, field ids stay STABLE by column name, and prior
    Iceberg snapshots remain time-travelable. Returns the snapshot id.

    ``format_version=3`` (round 11) emits an Iceberg v3 view: live Delta
    DELETION VECTORS translate to puffin ``deletion-vector-v1`` blobs by
    a straight bytes re-frame — Delta DV data and Iceberg v3 DV payloads
    share the same 64-bit roaring serialization, so the translation is
    O(bitmap bytes) with ZERO position decode — and data files receive
    ``first_row_id`` blocks (v3's mandatory row lineage). A refresh
    keeps the table's established format version; asking for a different
    one fails loud."""
    import time as _time
    import uuid

    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType

    if not lakehouse.is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    if format_version not in (None, 2, 3):
        raise ValueError(
            f"convert_delta_to_iceberg: format_version must be 2|3, got "
            f"{format_version}"
        )
    prior_ice: dict | None = None
    if os.path.exists(os.path.join(path, "metadata")):
        if not refresh:
            raise ValueError(
                f"{path}: metadata/ already exists — pass refresh=True to "
                "re-sync the Iceberg view after new Delta commits"
            )
        prior_ice = iceberg._load_metadata(path)
        prior_fv = prior_ice.get("format-version", 2)
        if format_version is not None and format_version != prior_fv:
            raise ValueError(
                f"{path}: Iceberg view is format-version {prior_fv}; a "
                f"refresh cannot change it to {format_version}"
            )
        format_version = prior_fv
        _fv_defaulted = False
    else:
        _fv_defaulted = format_version is None
        format_version = format_version or 2
    adds_map, meta = lakehouse._replay_log_adds(path)
    if not meta.get("schemaString"):
        raise ValueError(f"{path}: table declares no schema")
    conf = meta.get("configuration") or {}  # noqa: F841 (mapping below)
    mapping_mode = lakehouse._mapping_mode(meta)
    cm_ids: dict[str, int] = {}
    phys: dict[str, str] = {}
    if mapping_mode:
        # COLUMN-MAPPED tables convert (round 7): Delta's columnMapping
        # ids ARE the Iceberg field ids (both are rename-stable column
        # identity), logical names go in the Iceberg schema, and each
        # live file must be resolvable — by footer field ids (ID-mode
        # writes stamp them) or by logical-name fallback (pre-mapping
        # files whose physical names still equal the logical ones).
        # Checked per file from the harvest's footer probe below.
        # PARTITIONED mapped tables convert too (round 7, third session):
        # the adds' partitionValues are keyed by PHYSICAL name (Hive dir
        # components) while metaData.partitionColumns holds logical names
        # — the tuple lookup below maps through the physicalName, and the
        # footer probe exempts partition columns (Hive layout never
        # stores them in the data files; the Iceberg side reconstructs
        # them from the manifest tuples via identity projection
        # backfill, spec §Column Projection).
        for f0 in json.loads(meta["schemaString"])["fields"]:
            md = f0.get("metadata") or {}
            if md.get("delta.columnMapping.id") is None:
                raise NotImplementedError(
                    f"{path}: mapped field {f0['name']!r} lacks "
                    "delta.columnMapping.id — no stable Iceberg field id "
                    "can be derived"
                )
            cm_ids[f0["name"]] = int(md["delta.columnMapping.id"])
            phys[f0["name"]] = md.get(
                "delta.columnMapping.physicalName", f0["name"]
            )
    # raw Delta field JSON by name: mapped NESTED columns derive their
    # member ids from the members' own columnMapping metadata (round 14,
    # ADVICE r13 — fresh member ids would mismatch every id-mode footer)
    _delta_json_by_name = {
        f0["name"]: f0 for f0 in json.loads(meta["schemaString"])["fields"]
    }
    _all_delta_ids = (
        _delta_nested_ids(list(_delta_json_by_name.values()))
        if mapping_mode
        else []
    )
    # live deletion vectors CONVERT: each DV becomes position-delete rows
    # in the new snapshot's delete manifest (below) — deleted rows stay
    # masked on the Iceberg side without rewriting a byte of data
    dv_descs = {
        rel: a["deletionVector"]
        for rel, a in adds_map.items()
        if a.get("deletionVector")
    }
    declared = StructType.fromJson(json.loads(meta["schemaString"]))
    prior_field_by_name: dict[str, dict] = {}
    if prior_ice is not None:
        prior_field_by_name = {
            f["name"]: f
            for f in iceberg._current_schema(prior_ice).get("fields", [])
            if "id" in f
        }
    # fresh ids (top-level AND nested member/element/key/value — round 13)
    # allocate past every id any prior view or the column mapping holds
    import itertools as _it

    _ctr = _it.count(
        max(
            iceberg._max_field_id(list(prior_field_by_name.values())),
            max(cm_ids.values(), default=0),
            max(_all_delta_ids, default=0),
        )
        + 1
    )

    def _alloc() -> int:
        return next(_ctr)

    fields = []
    #: True entries appended when a struct member id was DERIVED from
    #: Delta's nested columnMapping metadata (physical member names in
    #: the files -> the member-resolving read property must be stamped)
    _derived_member_ids: list = []
    for f in declared.fields:
        prior_f = prior_field_by_name.get(f.name)
        # variant_ok: conversion registers EXISTING files (Spark wrote
        # them) — the Iceberg view of a Delta variant table is read-only
        # on the Iceberg side anyway
        try:
            want_fp = iceberg._ice_type_fingerprint(
                iceberg._spark_dt_to_ice(f.dataType, None, variant_ok=True)
            )
        except NotImplementedError:
            want_fp = None
        if want_fp is None:
            raise NotImplementedError(
                f"{path}: column {f.name!r} has spark type "
                f"{f.dataType.simpleString()!r} with no iceberg "
                "mapping in this writer"
            )
        if (
            prior_f is not None
            and iceberg._ice_type_fingerprint(prior_f["type"]) == want_fp
        ):
            # refresh: the prior field's FULL type dict carries over, so
            # NESTED ids stay stable across re-syncs (nested identity is
            # per-inner-field, not just the top-level id)
            ice_t = prior_f["type"]
        elif mapping_mode:
            # mapped tables: struct member ids come from Delta's nested
            # columnMapping metadata when present, never fresh for
            # metadata-mapped members (ADVICE r13)
            ice_t = _mapped_ice_type(
                f.dataType,
                (_delta_json_by_name.get(f.name) or {}).get("type"),
                _alloc,
                f"{path}:{f.name}",
                _derived_member_ids,
            )
        else:
            try:
                ice_t = iceberg._spark_dt_to_ice(
                    f.dataType, _alloc, variant_ok=True
                )
            except NotImplementedError:
                raise NotImplementedError(
                    f"{path}: column {f.name!r} has spark type "
                    f"{f.dataType.simpleString()!r} with no iceberg "
                    "mapping in this writer"
                ) from None
        if mapping_mode:
            fid_val = cm_ids[f.name]  # the mapping ids ARE the identity
        elif prior_f is not None:
            fid_val = prior_f["id"]  # column identity survives refresh
        else:
            fid_val = _alloc()
        fields.append(
            {"id": fid_val, "name": f.name, "required": False, "type": ice_t}
        )
    # variant is a v3-only Iceberg type: a fresh conversion of a variant
    # Delta table defaults to a v3 view; an EXPLICIT format_version=2 (or
    # an existing v2 view on refresh) fails loud instead of emitting
    # metadata foreign v2 readers reject
    def _is_var(t) -> bool:
        if t == "variant":
            return True
        if isinstance(t, dict):
            return any(
                _is_var(v)
                for k, v in t.items()
                if k in ("element", "key", "value")
            ) or any(
                _is_var(f2.get("type")) for f2 in t.get("fields", [])
            )
        return False

    if any(_is_var(f["type"]) for f in fields):
        if format_version < 3 and _fv_defaulted:
            format_version = 3
        elif format_version < 3:
            raise ValueError(
                f"{path}: the table carries a variant column — the "
                "Iceberg view must be format_version 3 (variant is a "
                "v3-only type)"
            )
    fid = {f["name"]: f["id"] for f in fields}
    ice_type = {f["name"]: f["type"] for f in fields}
    part_cols = meta.get("partitionColumns") or []
    #: metadata-derived member ids present -> files store members under
    #: PHYSICAL names; scans must go through the member-resolving leg
    _mapped_nested = bool(_derived_member_ids)
    #: any struct under mapping at all -> the probe validates member
    #: evidence per file (fid OR full logical paths)
    _probe_nested = bool(mapping_mode) and any(
        isinstance(f["type"], dict) and f["type"].get("type") == "struct"
        for f in fields
    )
    if _mapped_nested and part_cols:
        raise NotImplementedError(
            f"{path}: column-mapped AND partitioned AND nested with "
            "metadata-mapped members — the member-resolving scan leg "
            "does not compose with Hive-layout partition "
            "reconstruction; unsupported"
        )
    for c in part_cols:
        if c not in fid:
            raise ValueError(f"{path}: partition column {c!r} not in schema")
        if ice_type[c] not in iceberg._PARTITION_PARSERS:
            raise NotImplementedError(
                f"{path}: identity partition source type {ice_type[c]!r} "
                "unsupported (int/long/string/date only)"
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
        t = ice_type[c]
        if t in ("int", "long"):
            return int(v)
        if t == "date":  # Delta stores ISO strings; Iceberg days ints
            return iceberg._parse_date_days(str(v))
        return str(v)

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
    # INCREMENTAL refresh (the per-commit UniForm sync path): data-file
    # entries already present in the prior Iceberg snapshot carry over
    # VERBATIM — their bounds, counts and sizes were folded once and the
    # bytes have not moved — so the footer harvest (the O(#files) IO of
    # a sync) touches only files NEW since the last conversion. Carried
    # files also skip the column-mapping resolution probe: they resolved
    # when first converted, and files never change in place.
    prior_entries: dict[str, dict] = {}
    _types_stable = True
    if prior_ice is not None:
        # bounds bytes are serialized UNDER THE FIELD'S TYPE (spec
        # Appendix D): after a type widening the carried 4-byte int
        # bounds would deserialize as garbage under the widened field —
        # any type change since the prior conversion forces a full
        # re-harvest (rename-only changes keep the fid->type map stable)
        _prior_types = {
            f["id"]: f["type"]
            for f in iceberg._current_schema(prior_ice).get("fields", [])
            if isinstance(f.get("type"), str)
        }
        _types_stable = all(
            _prior_types.get(f["id"]) == f["type"] for f in fields
        )
    #: prior manifest-list DATA rows with their member paths — the unit
    #: of incremental carry (a manifest untouched by this commit's
    #: removals rides the new manifest list verbatim, never reread or
    #: rewritten); delete rows carry by dv-state fingerprint
    prior_data_rows: list[tuple[dict, set]] = []
    prior_delete_rows: list[dict] = []
    prior_dv_state = None
    if prior_ice is not None and prior_ice.get("snapshots") and _types_stable:
        _pcur = prior_ice.get("current-snapshot-id")
        _psnap = next(
            (s for s in prior_ice["snapshots"] if s["snapshot-id"] == _pcur),
            None,
        )
        if _psnap is not None:
            prior_dv_state = (_psnap.get("summary") or {}).get(
                "delta-dv-state"
            )
            for _e in avro_lite.read_container(
                iceberg._localize(_psnap["manifest-list"], path)
            ):
                if (_e.get("content", 0) or 0) == 1:
                    # delete manifest: contents regenerate from live DVs
                    # (or carry verbatim on dv-state match) — no need to
                    # decode its entries
                    prior_delete_rows.append(dict(_e))
                    continue
                _mpaths: set = set()
                for _m in avro_lite.read_container(
                    iceberg._localize(_e["manifest_path"], path)
                ):
                    _df = _m.get("data_file") or {}
                    if _df.get("content", 0) != 0:
                        continue
                    _ap = os.path.abspath(
                        iceberg._localize_decoded(_df["file_path"], path)
                    )
                    prior_entries[_ap] = _df
                    _mpaths.add(_ap)
                prior_data_rows.append((dict(_e), _mpaths))
    # stats fold by FOOTER column name — physical names on mapped tables
    stats_fields = (
        [{**f, "name": phys[f["name"]]} for f in fields]
        if mapping_mode
        else fields
    )
    harvest = _gather_file_stats(
        spark,
        [
            os.path.join(path, rel)
            for rel, _ in ordered_adds
            if os.path.abspath(os.path.join(path, rel)) not in prior_entries
        ],
        stats_fields,
        stats_threshold,
    )
    if mapping_mode:
        # partition columns are exempt from the probe: Hive-layout data
        # files never store them (values live in the dir names and the
        # manifest tuples; the Iceberg read reconstructs them via
        # identity projection backfill)
        want_ids = {i for c, i in cm_ids.items() if c not in part_cols}
        logical = {f["name"] for f in fields if f["name"] not in part_cols}
        # MEMBER-level evidence (round 14, ADVICE r13): top-level ids
        # prove nothing about struct members — a standard id-mode
        # delta-spark table stores members under PHYSICAL names, and
        # admitting it on top-level evidence alone read members silently
        # NULL. Each new file must carry the member field ids (one
        # nested footer probe, distributed above the threshold) or the
        # full LOGICAL member paths (pre-mapping files).
        member_ids: set = set()
        if _probe_nested:
            for f in fields:
                if f["name"] in part_cols:
                    continue
                member_ids.update(_ice_struct_member_ids(f["type"]))
            from .lakehouse import _footer_fid_maps as _ffm

            _new_files = [
                os.path.join(path, rel)
                for rel, _ in ordered_adds
                if os.path.abspath(os.path.join(path, rel))
                not in prior_entries
            ]
            _nested_maps = _ffm(_new_files, spark=spark, nested=True)
        for rel, _add in ordered_adds:
            abs_p0 = os.path.join(path, rel)
            if os.path.abspath(abs_p0) in prior_entries:
                continue  # resolved at first conversion; bytes unchanged
            names, fids = harvest[abs_p0][4]
            if names is None:
                raise NotImplementedError(
                    f"{path}: footer of {rel} is unreadable (VARIANT "
                    "logical type?) — mapped-table conversion needs the "
                    "footer's resolution evidence"
                )
            if not (want_ids <= set(fids) or logical <= set(names)):
                raise NotImplementedError(
                    f"{path}: file {rel} carries neither the mapped field "
                    "ids nor the logical column names — the Iceberg side "
                    "could not resolve its columns; rewrite it (compact) "
                    "first"
                )
            if _probe_nested:
                nm = _nested_maps.get(abs_p0) or {}
                if member_ids and member_ids <= set(nm.keys()):
                    continue  # full member fid resolution (fast path —
                    # no extra footer read; the nested map came from the
                    # distributed probe)
                import pyarrow.parquet as _pq2

                try:
                    ok = _member_evidence_ok(
                        _pq2.read_schema(abs_p0), fields, part_cols
                    )
                except Exception:
                    ok = False
                if ok:
                    continue  # per-level fid-or-logical-name resolution
                raise NotImplementedError(
                    f"{path}: file {rel} cannot resolve every struct "
                    "MEMBER (neither member field ids nor member names "
                    "match the schema) — members would read silently "
                    "NULL; rewrite it (compact) first"
                )
    # ---- per-commit incremental sync (the real UniForm action shape) ----
    # When the Delta change since the prior conversion is PURELY additive
    # (no file removed, schema/spec/type map unchanged), the prior
    # snapshot's manifest FILES are still a correct description of the
    # carried live set — manifests are immutable, so the new snapshot's
    # manifest list reuses them verbatim and a new manifest is written
    # for ONLY the files added since. A 1-file streaming append then
    # costs one 1-entry manifest + one manifest list + one metadata json,
    # regardless of table size; prior manifests are never reread or
    # rewritten. DV-only commits (delete_delta re-adds the same path with
    # a new DV) carry the data manifests verbatim too and regenerate just
    # the delete side, keyed by a dv-state fingerprint in the snapshot
    # summary. Anything non-additive falls back to the full single-
    # manifest rewrite below (always correct).
    import hashlib as _hashlib

    live_abs = {
        os.path.abspath(os.path.join(path, rel)) for rel, _ in ordered_adds
    }
    removed_since = set(prior_entries) - live_abs if prior_entries else set()
    dv_state = _hashlib.sha1(
        json.dumps(
            sorted(
                (
                    rel,
                    d.get("storageType"),
                    d.get("pathOrInlineDv"),
                    int(d.get("offset") or 0),
                    int(d.get("cardinality") or 0),
                )
                for rel, d in dv_descs.items()
            )
        ).encode()
    ).hexdigest()
    schema_same_inc = prior_ice is not None and [
        (f["name"], f["type"], f.get("id"))
        for f in iceberg._current_schema(prior_ice).get("fields", [])
    ] == [(f["name"], f["type"], f["id"]) for f in fields]
    _prior_specs = {
        s.get("spec-id"): s.get("fields")
        for s in (prior_ice.get("partition-specs") or [])
    } if prior_ice is not None else {}
    spec_same_inc = prior_ice is not None and _prior_specs.get(
        prior_ice.get("default-spec-id", 0)
    ) == spec_fields
    _carry_ok = bool(
        prior_ice is not None
        and prior_ice.get("snapshots")
        and _types_stable
        and schema_same_inc
        and spec_same_inc
    )
    incremental = _carry_ok and not removed_since
    # REWRITE commits (merge/update/compact/replaceWhere remove files):
    # carry every prior manifest whose members are all still live, and
    # rewrite ONLY the manifests that reference a removed file (their
    # survivors re-emit under the ORIGINAL row sequence number, so
    # carried position deletes keep scoping exactly as before). Write
    # cost per commit drops from O(#table-files) to O(files in touched
    # manifests + adds).
    incremental_rm = _carry_ok and bool(removed_since)
    # row-count backfill for footers pyarrow cannot decode (VARIANT
    # logical type) when the Delta add also lacks numRecords stats: ONE
    # distributed count job over ALL such files, never per-file
    _need_count: list[str] = []
    for rel, add in ordered_adds:
        abs_p = os.path.join(path, rel)
        if os.path.abspath(abs_p) in prior_entries:
            continue
        if harvest[abs_p][0] is not None:
            continue
        try:
            if json.loads(add.get("stats") or "{}").get("numRecords") is not None:
                continue
        except (TypeError, ValueError):
            pass
        _need_count.append(abs_p)
    _counted: dict[str, int] = {}
    if _need_count:
        from urllib.parse import urlparse as _up

        _nc_abs = {os.path.abspath(p) for p in _need_count}
        for r in (
            spark.read.parquet(*_need_count)
            .groupBy(iceberg._decoded_meta_path(None).alias("_p"))
            .count()
            .collect()
        ):
            pr = _up(r["_p"])
            key = os.path.abspath(
                pr.path if pr.scheme in ("", "file") else r["_p"]
            )
            if key not in _nc_abs:
                # same hazard as the snapshot-registration twin: a group
                # key outside the counted set is a path-normalization
                # mismatch, and the zero-row membership fallback below
                # would silently record 0 for a real file
                raise ValueError(
                    f"{path}: row-count backfill saw file path "
                    f"{r['_p']!r} that does not normalize to any counted "
                    "file — path-normalization mismatch; refusing"
                )
            _counted[key] = int(r["count"])
    for rel, add in ordered_adds:
        abs_p = os.path.join(path, rel)
        carried = prior_entries.get(os.path.abspath(abs_p))
        if carried is not None:
            if incremental or incremental_rm:
                continue  # rides its prior (or rewritten) manifest file
            entries.append(
                {"status": 1, "snapshot_id": snap_id, "data_file": carried}
            )
            continue
        n_rows_h, size_h, ice_stats, _dstats, _probe = harvest[abs_p]
        stats = {}
        try:
            stats = json.loads(add.get("stats") or "{}")
        except (TypeError, ValueError):
            pass
        n_rows = stats.get("numRecords")
        if n_rows is None:
            n_rows = n_rows_h
        if n_rows is None:
            n_rows = _counted.get(os.path.abspath(abs_p))
        if n_rows is None:
            # a zero-row file produces no groupBy row — distinguish from
            # a genuinely uncounted one by membership
            if os.path.abspath(abs_p) in {
                os.path.abspath(p) for p in _need_count
            }:
                n_rows = 0
            else:
                raise NotImplementedError(
                    f"{path}: footer of {rel} is unreadable and no row "
                    "count could be derived — cannot record an exact "
                    "record_count"
                )
        pvals = {
            # add-side tuples are keyed by PHYSICAL name on mapped tables
            c: _pval(c, (add.get("partitionValues") or {}).get(phys.get(c, c)))
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
        {"name": c, "type": ["null", iceberg._avro_partition_type(ice_type[c])]}
        for c in part_cols
    ]
    mlist = os.path.join(meta_dir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
    mf_schema = iceberg._manifest_file_schema(2)
    keep = {f["name"] for f in mf_schema["fields"]}
    # carried manifest-list rows keep their recorded sequence numbers and
    # added_snapshot_id: new data files get seq > any carried delete's
    # seq, so old position deletes never leak onto post-append files
    ml_entries: list[dict] = []
    if incremental:
        ml_entries = [row for row, _paths in prior_data_rows]
    elif incremental_rm:
        for row, mpaths in prior_data_rows:
            if not (mpaths & removed_since):
                ml_entries.append(row)  # untouched — carried verbatim
                continue
            survivors = [p for p in sorted(mpaths) if p not in removed_since]
            if not survivors:
                continue  # whole manifest removed
            mf_rw = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
            avro_lite.write_container(
                mf_rw,
                iceberg._manifest_entry_schema(format_version, partition_fields),
                [
                    {
                        "status": 1,
                        "snapshot_id": snap_id,
                        "data_file": prior_entries[p],
                    }
                    for p in survivors
                ],
            )
            ml_entries.append(
                {
                    "manifest_path": f"file:{mf_rw}",
                    "manifest_length": os.path.getsize(mf_rw),
                    "partition_spec_id": row.get("partition_spec_id", 0),
                    "added_snapshot_id": snap_id,
                    "content": 0,
                    # survivors keep their ORIGINAL sequence so carried
                    # delete manifests scope exactly as before
                    "sequence_number": row.get("sequence_number", 0),
                    "min_sequence_number": row.get(
                        "min_sequence_number", row.get("sequence_number", 0)
                    ),
                }
            )
    _next_rid = int((prior_ice or {}).get("next-row-id", 0) or 0)
    if entries or not (incremental or incremental_rm):
        if format_version >= 3:
            # v3 row lineage is mandatory: every converted data file gets
            # a first_row_id block from the table counter
            _next_rid = iceberg._assign_first_row_ids(_next_rid, entries)
        manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
        avro_lite.write_container(
            manifest,
            iceberg._manifest_entry_schema(format_version, partition_fields),
            entries,
        )
        ml_entries.append(
            {
                "manifest_path": f"file:{manifest}",
                "manifest_length": os.path.getsize(manifest),
                "partition_spec_id": 0,
                "added_snapshot_id": snap_id,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
            }
        )
    if (
        (incremental or incremental_rm)
        and prior_dv_state is not None
        and dv_state == prior_dv_state
    ):
        # every DV unchanged since the prior sync: its delete files and
        # manifests describe the same masks — carry them verbatim (safe
        # under incremental_rm too: rewritten data manifests keep their
        # original sequence numbers, so delete scoping is unchanged)
        ml_entries.extend(prior_delete_rows)
    elif dv_descs and format_version >= 3:
        # v3 target: Delta DVs re-frame into puffin deletion-vector-v1
        # blobs BYTES-VERBATIM (same roaring serialization both sides) —
        # O(bitmap bytes), zero position decode
        from . import puffin as _puf
        from . import roaring as _roar

        blobs = []
        dv_entries = []
        dv_file = os.path.join(meta_dir, f"dv-{uuid.uuid4().hex}.puffin")
        for rel, desc in sorted(dv_descs.items()):
            uri = "file:" + os.path.abspath(os.path.join(path, rel))
            payload = _roar.frame_dv_blob(lakehouse._dv_bytes(path, desc))
            blobs.append(
                (
                    {
                        "type": _puf.BLOB_TYPE_DV,
                        "fields": [],
                        "snapshot-id": snap_id,
                        "sequence-number": seq,
                        "properties": {
                            "referenced-data-file": uri,
                            "cardinality": str(desc.get("cardinality") or 0),
                        },
                    },
                    payload,
                )
            )
        info = _puf.write_puffin(dv_file, blobs)
        for bm in info["blob-metadata"]:
            dv_entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "data_file": {
                        "content": 1,
                        "file_path": f"file:{dv_file}",
                        "file_format": "PUFFIN",
                        "partition": {},
                        "record_count": int(
                            bm["properties"]["cardinality"]
                        ),
                        "file_size_in_bytes": info["file-size-in-bytes"],
                        "equality_ids": None,
                        "referenced_data_file": bm["properties"][
                            "referenced-data-file"
                        ],
                        "content_offset": bm["offset"],
                        "content_size_in_bytes": bm["length"],
                    },
                }
            )
        dv_manifest = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m1.avro")
        avro_lite.write_container(
            dv_manifest, iceberg._manifest_entry_schema(3), dv_entries
        )
        ml_entries.append(
            {
                "manifest_path": f"file:{dv_manifest}",
                "manifest_length": os.path.getsize(dv_manifest),
                "partition_spec_id": 0,
                "added_snapshot_id": snap_id,
                "content": 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
            }
        )
    elif dv_descs:
        # pos deletes at the SAME sequence as the data manifest: the spec
        # scopes position deletes to data files with seq <= theirs, so a
        # one-snapshot (data + delete) conversion masks correctly (and at
        # or above every CARRIED data file's older seq on the
        # incremental path)
        del_files = _write_pos_deletes(spark, path, meta_dir, dv_descs)
        if del_files:
            ml_entries.append(
                iceberg._delete_manifest_entry(
                    meta_dir, snap_id, seq, del_files, None
                )
            )
    avro_lite.write_container(
        mlist, mf_schema, [{k: e.get(k, 0) for k in keep} for e in ml_entries]
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
            "summary": {
                "operation": "overwrite",
                "converted-from": "delta",
                # dv-state fingerprint: the next sync carries the delete
                # manifests verbatim iff this matches its own DV set
                "delta-dv-state": dv_state,
            },
            "schema-id": schema_id,
            "sequence-number": seq,
        }
        ice_meta = dict(prior_ice)
        ice_meta.update(
            {
                "last-updated-ms": now_ms,
                "last-column-id": max(
                    iceberg._max_field_id(fields),
                    prior_ice.get("last-column-id", 0) or 0,
                ),
                "schemas": schemas,
                "current-schema-id": schema_id,
                "current-snapshot-id": snap_id,
                "snapshots": list(prior_ice.get("snapshots") or [])
                + [snapshot],
                "snapshot-log": list(prior_ice.get("snapshot-log") or [])
                + [{"timestamp-ms": now_ms, "snapshot-id": snap_id}],
                "last-sequence-number": seq,
                **(
                    {"next-row-id": _next_rid}
                    if format_version >= 3
                    else {}
                ),
            }
        )
        if "schema" in ice_meta:
            ice_meta["schema"] = {"type": "struct", "fields": fields}
        if _mapped_nested:
            ice_meta["properties"] = {
                **(ice_meta.get("properties") or {}),
                "fsml.field-id-read": "true",
            }
        iceberg._swap_metadata(path, ice_meta)
        return snap_id
    snapshot = {
        "snapshot-id": snap_id,
        "timestamp-ms": now_ms,
        "manifest-list": f"file:{mlist}",
        "summary": {
            "operation": "append",
            "converted-from": "delta",
            "delta-dv-state": dv_state,
        },
        "schema-id": 0,
        "sequence-number": seq,
    }
    ice_meta = {
        "format-version": format_version,
        **({"next-row-id": _next_rid} if format_version >= 3 else {}),
        "table-uuid": str(__import__("uuid").uuid4()),
        "location": path,
        "last-updated-ms": now_ms,
        "last-column-id": iceberg._max_field_id(fields),
        "schemas": [{"schema-id": 0, "type": "struct", "fields": fields}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 999 + len(spec_fields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        # mapped nested tables: members resolve ONLY by footer field id
        # (physical member names) — route every scan through the
        # member-resolving leg, same contract as inner renames
        "properties": (
            {"fsml.field-id-read": "true"} if _mapped_nested else {}
        ),
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


def snapshot_parquet_to_iceberg(
    spark: SparkSession,
    path: str,
    stats_threshold: int = _DISTRIBUTED_STATS_THRESHOLD,
) -> int:
    """Register a plain parquet DIRECTORY as an Iceberg table IN PLACE —
    the ecosystem's ``snapshot``/``migrate`` procedure: zero data
    movement, one manifest referencing the existing files with
    footer-harvested column bounds (so data skipping works from day
    one), the schema inferred from the files with fresh field ids, and
    ``schema.name-mapping.default`` stamped in the same commit — the
    files carry NO field ids, so the mapping is what keeps them
    resolvable through every future rename (spec §Name Mapping;
    without it the first rename would silently null the column on the
    migrated files). After this, write_iceberg appends, DML and
    maintenance all work; the original files are never rewritten.

    HIVE-PARTITIONED layouts register too: ``key=value`` directory
    components become an IDENTITY partition spec, each file's tuple is
    recorded TYPED in its manifest entry (physical encoding — days
    ints for dates), and reads backfill the partition columns from the
    tuples (spec §Column Projection — the files never stored them).
    Partition value types come from Spark's own partition inference,
    restricted to the identity set this writer supports
    (int/long/string/date); anything else fails loud."""
    import time as _time
    import uuid as _uuid

    if iceberg.is_iceberg_table(path):
        raise ValueError(f"{path}: already an Iceberg table")
    if lakehouse.is_delta_table(path):
        raise ValueError(
            f"{path}: a Delta table — use convert_delta_to_iceberg"
        )
    files: list[str] = []
    for dirpath, dirs, fnames in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        files.extend(
            os.path.abspath(os.path.join(dirpath, n))
            for n in fnames
            if n.endswith(".parquet") and not n.startswith((".", "_"))
        )
    files.sort()
    if not files:
        raise ValueError(f"{path}: no parquet files to register")
    root_abs = os.path.abspath(path)

    def _dir_tuple(p: str) -> dict:
        out = {}
        rel = os.path.relpath(os.path.dirname(p), root_abs)
        for comp in () if rel == "." else rel.split(os.sep):
            if "=" not in comp:
                raise NotImplementedError(
                    f"{path}: directory component {comp!r} is not "
                    "key=value Hive layout — cannot derive partition "
                    "values"
                )
            k, v = comp.split("=", 1)
            out[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
        return out

    raw_tuples = {p: _dir_tuple(p) for p in files}
    part_cols = sorted({k for t in raw_tuples.values() for k in t})
    for p, t in raw_tuples.items():
        if sorted(t) != part_cols:
            raise ValueError(
                f"{path}: inconsistent partition depth at "
                f"{os.path.relpath(p, root_abs)} (have {sorted(t)}, "
                f"expected {part_cols})"
            )
    df = spark.read.parquet(path)  # partition columns inferred + typed
    # variant_ok: registration admits files Spark already wrote — the
    # v3 'variant' type lands in the schema; scans decode it through
    # Spark's native VariantType (write_iceberg writes variant directly
    # at format_version=3 since round 14)
    fields = iceberg._iceberg_fields(df, variant_ok=True)
    fid_of = {f["name"]: f["id"] for f in fields}
    ice_of = {f["name"]: f["type"] for f in fields}
    if any(f["type"] == "variant" for f in fields):
        meta_fv = 3  # variant is a v3-only type (spec §Primitive Types)
    else:
        meta_fv = 2
    parsers = {}
    for c in part_cols:
        t = ice_of.get(c)
        if t not in iceberg._PARTITION_PARSERS:
            raise NotImplementedError(
                f"{path}: partition column {c!r} inferred as {t!r} — "
                "identity partition sources support "
                f"{sorted(iceberg._PARTITION_PARSERS)}"
            )
        parsers[c] = (
            lambda v, _p=iceberg._PARTITION_PARSERS[t]: None
            if v is None
            else _p(v)
        )
    data_fields = [f for f in fields if f["name"] not in set(part_cols)]
    harvest = _gather_file_stats(spark, files, data_fields, stats_threshold)
    # footers pyarrow could not decode (VARIANT logical type): backfill
    # the column-name probe via the JVM footer reader (driver-side, no
    # job) and the row counts via ONE distributed job over all such
    # files — never one job per file
    bad = [p for p in files if harvest[p][0] is None]
    if bad:
        from urllib.parse import urlparse as _up

        counts_rows = (
            spark.read.parquet(*bad)
            .groupBy(iceberg._decoded_meta_path(None).alias("_p"))
            .count()
            .collect()
        )
        bad_abs = {os.path.abspath(p) for p in bad}
        counts = {}
        for r in counts_rows:
            raw = r["_p"]
            pr = _up(raw)
            key = os.path.abspath(
                pr.path if pr.scheme in ("", "file") else raw
            )
            if key not in bad_abs:
                # a group key that maps OUTSIDE the counted set means
                # Spark's _metadata.file_path and the driver-built path
                # normalize differently (symlinked table root, alternate
                # mount) — recording 0 for the real file would be a
                # silent wrong record_count (ADVICE r13)
                raise ValueError(
                    f"{path}: row-count backfill saw file path {raw!r} "
                    "that does not normalize to any counted file — "
                    "path-normalization mismatch; refusing to record "
                    "record_count=0"
                )
            counts[key] = r["count"]
        for p in bad:
            names = tuple(spark.read.parquet(p).schema.names)
            harvest[p] = (
                # every group row provably mapped into the counted set
                # above, so a missing key here means the file produced
                # no groupBy row at all — it is empty; 0 is exact
                int(counts.get(os.path.abspath(p), 0)),
                harvest[p][1],
                {},
                None,
                (names, ()),
            )
    # every file must carry EXACTLY the data columns: Spark's inferred
    # schema would silently null-fill a narrower file (and the stamped
    # name mapping makes that backfill invisible forever), or silently
    # DROP a wider file's extra column — both are fail-loud here, using
    # the footer probe the harvest already paid for
    want_cols = {f["name"] for f in data_fields}
    for f in files:
        got_cols = set(harvest[f][4][0])
        if got_cols != want_cols:
            rel = os.path.relpath(f, root_abs)
            raise ValueError(
                f"{path}: file {rel} carries columns {sorted(got_cols)} "
                f"but the directory's inferred schema is "
                f"{sorted(want_cols)} — heterogeneous-schema directories "
                "would register with silent null backfill; unify the "
                "files first"
            )
    snap_id = 1
    now_ms = int(_time.time() * 1000)
    entries = []
    for p in files:
        n_rows, size, ice_stats, _dstats, _probe = harvest[p]
        entries.append(
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "content": 0,
                    "file_path": f"file:{p}",
                    "file_format": "PARQUET",
                    "partition": {
                        c: parsers[c](raw_tuples[p].get(c))
                        for c in part_cols
                    },
                    "record_count": int(n_rows),
                    "file_size_in_bytes": int(size),
                    **ice_stats,
                },
            }
        )
    ice_type = {
        f["name"]: f["type"] for f in fields if f["name"] in set(part_cols)
    }
    partition_fields = [
        {
            "name": c,
            "type": ["null", iceberg._avro_partition_type(ice_type[c])],
        }
        for c in part_cols
    ]
    spec_fields = [
        {
            "name": c,
            "transform": "identity",
            "source-id": fid_of[c],
            "field-id": 1000 + i,
        }
        for i, c in enumerate(part_cols)
    ]
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    manifest = os.path.join(meta_dir, f"{_uuid.uuid4().hex}-m0.avro")
    avro_lite.write_container(
        manifest,
        iceberg._manifest_entry_schema(2, partition_fields or None),
        entries,
    )
    mlist = os.path.join(
        meta_dir, f"snap-{snap_id}-{_uuid.uuid4().hex}.avro"
    )
    mf_schema = iceberg._manifest_file_schema(2)
    keep = {f["name"] for f in mf_schema["fields"]}
    ml_row = {
        "manifest_path": f"file:{manifest}",
        "manifest_length": os.path.getsize(manifest),
        "partition_spec_id": 0,
        "added_snapshot_id": snap_id,
        "content": 0,
        "sequence_number": 1,
        "min_sequence_number": 1,
    }
    avro_lite.write_container(
        mlist, mf_schema, [{k: ml_row.get(k, 0) for k in keep}]
    )
    name_mapping = [
        {"field-id": f["id"], "names": [f["name"]]} for f in data_fields
    ]
    # NOTE: this initial-metadata shape mirrors convert_delta_to_iceberg's
    # fresh-table branch above — change them together (same spec contract:
    # last-partition-id = 999+len(spec), v1 + version-hint protocol)
    ice_meta = {
        "format-version": meta_fv,
        "table-uuid": str(_uuid.uuid4()),
        "location": path,
        "last-updated-ms": now_ms,
        "last-column-id": max(
            iceberg._max_field_id(fields), len(fields)
        ),
        "schemas": [{"schema-id": 0, "type": "struct", "fields": fields}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 999 + len(spec_fields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        # v3 (variant tables): row lineage is mandatory — the counter
        # starts at 0; the registered files carry no first_row_id and
        # read null _row_id (the spec's upgrade semantics), future
        # appends assign from here
        **({"next-row-id": 0} if meta_fv >= 3 else {}),
        "properties": {
            "schema.name-mapping.default": json.dumps(name_mapping)
        },
        "current-snapshot-id": snap_id,
        "snapshots": [
            {
                "snapshot-id": snap_id,
                "timestamp-ms": now_ms,
                "manifest-list": f"file:{mlist}",
                "summary": {
                    "operation": "append",
                    "converted-from": "parquet",
                },
                "schema-id": 0,
                "sequence-number": 1,
            }
        ],
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
    _nonpq = {
        d.get("format")
        for d in data
        if (d.get("format") or "PARQUET") != "PARQUET"
    }
    if _nonpq:
        # the Delta protocol is parquet-only: registering these files in
        # a _delta_log would make every Delta reader misread them
        raise NotImplementedError(
            f"{path}: cannot convert a table with {sorted(_nonpq)} data "
            "files to Delta (the Delta protocol is parquet-only) — "
            "rewrite to parquet via compact_iceberg first"
        )
    eq = [d for d in deletes if d["kind"] == "eq"]
    declared = iceberg._declared_spark_schema(meta)
    if declared is None:
        raise NotImplementedError(
            f"{path}: table schema holds types outside the primitive "
            "bridge — cannot express it as a Delta schemaString"
        )
    # v3 COLUMN DEFAULTS (round 12): Delta has no initial-default read
    # semantics — a Delta reader null-backfills a column absent from a
    # file's footer. Refuse ONLY when a live file actually predates a
    # defaulted column (footer probe, the same O(#files) pass the
    # field-id grouping pays); a defaulted table whose files all carry
    # the column converts fine.
    _dflt = iceberg._schema_defaults(meta)
    if _dflt:
        import pyarrow.parquet as _pq

        from .lakehouse import _group_files_by_field_ids

        _live_local = [iceberg._local_path(d["path"]) for d in data]
        for _phys_by_fid, _gfiles in _group_files_by_field_ids(
            _live_local, spark=spark
        ):
            if _phys_by_fid:
                _missing = sorted(
                    name
                    for fid, (name, _t, _j) in _dflt.items()
                    if fid not in _phys_by_fid
                )
            else:
                _missing_set: set = set()
                for g in _gfiles:  # one footer read per file
                    _names = set(_pq.read_schema(g).names)
                    _missing_set.update(
                        name
                        for _fid, (name, _t, _j) in _dflt.items()
                        if name not in _names
                    )
                _missing = sorted(_missing_set)
            if _missing:
                raise NotImplementedError(
                    f"{path}: live data files predate defaulted columns "
                    f"{_missing} — a Delta view would surface null where "
                    "the Iceberg spec says the default; rewrite them "
                    "(compact_iceberg) before converting"
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
            # Delta has no transform vocabulary, but none is needed: the
            # SOURCE column is physically present in every data file (only
            # identity sources may be omitted, spec §Column Projection),
            # so the derived field simply drops — the Delta view reads the
            # source column normally and per-file stats keep skipping on
            continue
        part_cols.append(fid_to_name.get(pf.get("source-id"), pf["name"]))
    ice_types_by_name = {
        f["name"]: f["type"]
        for f in iceberg._current_schema(meta).get("fields", [])
        if isinstance(f.get("type"), str)
    }
    root_abs = os.path.abspath(path)
    now_ms = int(_time.time() * 1000)
    # live row-level deletes fold into one roaring bitmap per data file
    # (executor-side, sequence-scoped) and become Delta DELETION VECTORS
    # on the re-added entries — no data rewrite, deleted rows stay masked.
    # Position-only content uses the cheap fold (reads just the delete
    # parquets); EQUALITY deletes have no Delta key-scoped equivalent, so
    # their presence switches to the survivor-complement path (one extra
    # table scan) which resolves BOTH kinds to positions at once.
    dv_blobs: dict[str, tuple[bytes, int]] = {}
    if eq:
        dv_blobs = _deletes_to_bitmaps_via_survivors(spark, path, data, root_abs)
    elif deletes:
        dv_blobs = _pos_deletes_to_bitmaps(spark, path, data, deletes, root_abs)
    prior_adds: dict[str, dict] = {}
    actions: list[dict] = []
    if prior_delta:
        prior_adds, prior_meta = lakehouse._replay_log_adds(path)
        if dv_blobs:
            proto = lakehouse._current_protocol(path)
            if "deletionVectors" not in set(proto.get("readerFeatures") or []):
                # legacy prior protocols expand to their implied feature
                # lists — emitting bare v7 lists would silently un-declare
                # active features (the checkpoint bug's twin)
                r0, w0 = lakehouse._protocol_as_features(proto)
                actions.append(
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": sorted(
                                r0 | {"deletionVectors"}
                            ),
                            "writerFeatures": sorted(
                                w0 | {"deletionVectors"}
                            ),
                        }
                    }
                )
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
            (
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors"],
                        "writerFeatures": ["deletionVectors"],
                    }
                }
                if dv_blobs
                else {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            ),
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
    rel_of: list[tuple[str, str, dict]] = []
    need_add: dict[str, bool] = {}
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
        rel_of.append((rel, abs_p, d))
        if rel not in prior_adds:
            need_add[rel] = True
            need_stats.append(abs_p)
        else:
            # already live in the Delta view — re-add only when the
            # delete mask changed (bitmap bytes are deterministic for a
            # position set, so byte equality is exact)
            old_desc = prior_adds[rel].get("deletionVector")
            new_blob = dv_blobs.get(rel)
            need_add[rel] = not (
                (old_desc is None and new_blob is None)
                or (
                    old_desc is not None
                    and new_blob is not None
                    and lakehouse._dv_bytes(path, old_desc) == new_blob[0]
                )
            )
    descs = (
        lakehouse._dv_descriptors(
            path,
            [
                (rel, blob, card)
                for rel, (blob, card) in dv_blobs.items()
                if need_add.get(rel)
            ],
        )
        if dv_blobs
        else {}
    )
    harvest = _gather_file_stats(spark, need_stats, [], stats_threshold)
    for rel, abs_p, d in rel_of:
        live_rels.add(rel)
        if not need_add[rel]:
            continue
        prior = prior_adds.get(rel)
        if prior is not None:
            # same bytes, new mask: remove + re-add carrying the prior
            # entry's size/stats (bounds stay conservative over the mask)
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "dataChange": True,
                        "deletionTimestamp": now_ms,
                    }
                }
            )
            add = {
                "path": rel,
                "partitionValues": {
                    c: (prior.get("partitionValues") or {}).get(c)
                    for c in part_cols
                },
                "size": prior.get("size") or os.path.getsize(abs_p),
                "modificationTime": now_ms,
                "dataChange": True,
            }
            if prior.get("stats") is not None:
                add["stats"] = prior["stats"]
        else:
            _n, size_h, _ice, dstats, _probe = harvest[abs_p]
            pvals = {
                c: (
                    None
                    if v is None
                    # Iceberg date tuples are days ints; Delta
                    # partitionValues carry ISO strings
                    else iceberg._days_to_iso(v)
                    if ice_types_by_name.get(c) == "date"
                    else str(v)
                )
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
        if rel in descs:
            add["deletionVector"] = descs[rel]
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
