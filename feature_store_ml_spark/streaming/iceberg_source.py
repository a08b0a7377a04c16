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

AVRO/ORC data files (round 10) cannot feed a parquet file stream in
place; the sync MATERIALIZES their rows into the spool as parquet —
one distributed decode pass per sync through the batch rowfmt readers,
idempotent via per-source-file markers. The CDF spool does the same by
routing rowfmt appends through its existing materialization leg.

Fail-loud boundaries: row-removing or rewriting snapshots on the PLAIN
tail fail loud by DEFAULT — ``ignore_deletes`` / ``ignore_changes``
(round 12, twin of delta_source's options) opt into delta-spark's
documented skip / re-emit semantics, with 'replace' (compaction)
snapshots invisible like Delta's ``dataChange: false`` (the CDF tail
retracts rows properly instead); and schema-evolved tables whose staged
footers no longer match the current column names (a name-based
file-source read would NULL renamed columns silently — the batch reader
handles this via field-id grouping, a file source cannot).
"""

from __future__ import annotations

import json as _json
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from ..io import iceberg as _ice


def sync_iceberg_spool(
    path: str,
    spool_dir: str,
    since_snapshot_id: int | None = None,
    spark: SparkSession | None = None,
    ignore_deletes: bool = False,
    ignore_changes: bool = False,
) -> int:
    """Link data files committed after ``since_snapshot_id`` (None = from
    the beginning) into ``spool_dir``; return the current snapshot id to
    checkpoint for the next sync. Idempotent (deterministic link names,
    existing links skipped). Walks the snapshot history PER COMMIT in
    sequence order (round 12 — formerly one endpoint diff), so each
    snapshot's operation classifies it exactly like the Delta twin's
    per-version walk:

    - pure APPEND snapshots link their added files;
    - 'replace' snapshots (compaction — rewrite_data_files) change no
      rows by contract and are INVISIBLE under every setting, like
      Delta's ``dataChange: false`` commits (formerly a loud refusal);
    - a snapshot that ONLY removes rows (delete files or whole-file
      removes, no adds) fails loud by default; ``ignore_deletes=True``
      SKIPS it — its rows are simply never retracted downstream
      (delta-spark's ignoreDeletes contract);
    - a snapshot that REWRITES files (UPDATE/MERGE/overwrite:
      removes + adds) fails loud by default; ``ignore_changes=True``
      (implies ignore_deletes) re-emits its added files in full, so
      downstream must tolerate duplicates of surviving rows
      (the ignoreChanges contract). Added files that a live
      position-delete/DV could mask at that snapshot are MATERIALIZED
      as their live rows instead of linked (nothing in a file source
      would apply the mask) — one batched distributed job per sync,
      crash-safe via the ``_inflight.json`` ledger.

    PARQUET files symlink (zero-copy). AVRO/ORC data files (round 10)
    cannot feed a parquet file stream byte-for-byte, so they MATERIALIZE:
    one distributed pass per sync decodes the new rowfmt files through
    the batch rowfmt readers (field-id-resolved) and writes their rows as
    parquet into the spool — cost O(new rows), once, executor-side.
    Per-source-file markers under ``<spool>/.materialized/`` make the
    conversion idempotent across re-syncs and overlapping checkpoints.
    Materialization needs a SparkSession; the metadata-only call shape
    (``spark=None``) keeps refusing loudly."""
    meta = _ice._load_metadata(path)
    cur = meta.get("current-snapshot-id")
    if cur in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    if ignore_changes:
        ignore_deletes = True
    # ANCESTRY chain, not the raw snapshot list: WAP leaves staged
    # non-ancestor snapshots in metadata (their files were never
    # published — linking them would feed phantom rows), and foreign v1
    # tables may allocate arbitrary ids with no sequence numbers
    ordered = _ice._ancestry_chain(meta)
    os.makedirs(spool_dir, exist_ok=True)
    seen_since = since_snapshot_id is None or since_snapshot_id == -1
    prev = None
    #: previous ancestor's (data paths, delete paths), carried forward
    #: so each snapshot's manifests replay ONCE per sync, not twice
    prev_content: "tuple[list[str], list[str]] | None" = None
    rowfmt_batch: list[dict] = []
    rewrite_batch: list[tuple[int, list[str]]] = []

    def _link_parquet(sid: int, entries: list[dict]) -> None:
        locals_ = []
        for e in entries:
            f = e["path"]
            f = urlparse(f).path if urlparse(f).scheme in ("", "file") else f
            if "://" in f:
                raise NotImplementedError(
                    f"{path}: spool links need local paths; found "
                    "object-store URIs"
                )
            # magic sniff stays as the fail-loud for mislabeled
            # manifests: a linked non-parquet file would be misread
            # byte-for-byte
            with open(f, "rb") as fh:
                magic = fh.read(4)
            if magic != b"PAR1":
                raise NotImplementedError(
                    f"{path}: data file {os.path.basename(f)} is labeled "
                    "PARQUET in its manifest but does not start with "
                    "PAR1 — refusing to spool a mislabeled file"
                )
            locals_.append(f)
        if locals_ and _footers_mismatch_schema(meta, locals_, path, spark):
            # inner-renamed / renamed / variant footers: a symlink would
            # name-resolve wrong — MATERIALIZE these files' rows through
            # the batch reader instead (round 14; rides the rewrite
            # materializer's crash-safe ledger)
            if spark is None:
                raise NotImplementedError(
                    f"{path}: files need name-safe materialization into "
                    "the spool (rename evolution / variant footers) — "
                    "pass spark= (or use stream_from_iceberg)"
                )
            # crash-replay guard: a PRE-rename sync may already have
            # symlinked some of these files for this sid — materializing
            # them again would duplicate their rows. Skip exactly the
            # ones whose deterministic link name exists.
            by_src = {src: e for e, src in zip(entries, locals_)}
            todo_paths = []
            for i, src in enumerate(sorted(locals_)):
                link = os.path.join(
                    spool_dir,
                    f"{sid:020d}-{i:05d}-{os.path.basename(src)}",
                )
                if not os.path.lexists(link):
                    todo_paths.append(by_src[src]["path"])
            if todo_paths:
                rewrite_batch.append((sid, todo_paths))
            return
        # snapshot ids are monotone (max+1 allocation), so prefixing
        # with the owning snapshot id keeps discovery order aligned
        # with commit order; within one snapshot sorted basenames are
        # stable
        for i, src in enumerate(sorted(locals_)):
            link = os.path.join(
                spool_dir, f"{sid:020d}-{i:05d}-{os.path.basename(src)}"
            )
            if not os.path.lexists(link):
                os.symlink(os.path.abspath(src), link)

    # one manifest-decode memo across the whole ancestry walk (ADVICE
    # r12): manifests are immutable and consecutive snapshots share most
    # of theirs, so a first sync over a long history no longer replays
    # every snapshot's full manifest list from disk
    mcache: dict = {}
    for snap in ordered:
        sid = snap["snapshot-id"]
        if not seen_since:
            if sid == since_snapshot_id:
                seen_since = True
            prev = snap
            prev_content = None
            continue
        op = (snap.get("summary") or {}).get("operation", "append")
        if prev_content is None and prev is not None:
            prev_content = _ice._snapshot_content(
                meta, prev["snapshot-id"], path, _manifest_cache=mcache
            )
        p_data, p_del = prev_content if prev_content is not None else ([], [])
        s_plan, s_del_plan = _ice._snapshot_scan_plan(
            meta, sid, path, _manifest_cache=mcache
        )
        s_data = [d["path"] for d in s_plan]
        prev_set = set(p_data)
        if op == "replace":
            # compaction: rows identical by contract — emit nothing,
            # but HARDEN any spool symlink pointing at a replaced file:
            # snapshot expiration may physically delete the originals
            # later, and a dangling link kills the consumer mid-stream
            _harden_links(spool_dir, prev_set - set(s_data))
            prev = snap
            prev_content = (s_data, [d["path"] for d in s_del_plan])
            continue
        added = [d for d in s_plan if d["path"] not in prev_set]
        removed = bool(prev_set - set(s_data))
        new_deletes = {d["path"] for d in s_del_plan} - set(p_del)
        if removed or new_deletes:
            if prev is None:
                raise ValueError(
                    f"{path}: first snapshot {sid} carries delete "
                    "content — corrupt history"
                )
            if not added:
                if ignore_deletes:
                    prev = snap
                    prev_content = (
                        s_data, [d["path"] for d in s_del_plan]
                    )
                    continue  # delete-only commit, skipped by contract
                raise ValueError(
                    f"{path}: snapshot {sid} removed rows (delete "
                    "files / whole-file deletes) — tailing an "
                    "append-only stream off this table is ill-defined; "
                    "pass ignore_deletes=True to skip delete-only "
                    "commits (their rows are never retracted)"
                )
            if not ignore_changes:
                raise ValueError(
                    f"{path}: snapshot {sid} rewrote data files "
                    "(update/merge/overwrite) — tailing an append-only "
                    "stream off this table is ill-defined; pass "
                    "ignore_changes=True to re-emit rewritten files "
                    "(downstream must tolerate duplicates)"
                )
            # re-emit semantics: link added files in full; files a live
            # position-delete could mask at THIS snapshot materialize
            # their live rows instead (eq-deletes only reach files with
            # a LOWER sequence, so same-commit adds are out of range)
            refs: set[str] = set()
            unknown_pos_refs = False
            for d in s_del_plan:
                if d.get("kind") != "pos":
                    continue
                r = d.get("referenced_data_file")
                if r is None:
                    unknown_pos_refs = True
                else:
                    refs.add(r)
            masked = [
                e for e in added
                if unknown_pos_refs or e["path"] in refs
            ]
            if masked:
                if spark is None:
                    raise NotImplementedError(
                        f"{path}: snapshot {sid} adds files that carry "
                        "live delete masks — materializing their live "
                        "rows needs spark= (or use stream_from_iceberg)"
                    )
                rewrite_batch.append((sid, [e["path"] for e in masked]))
                masked_set = {e["path"] for e in masked}
                added = [e for e in added if e["path"] not in masked_set]
        pq_entries = [
            e for e in added if (e.get("format") or "PARQUET") == "PARQUET"
        ]
        rowfmt_entries = [
            e for e in added if (e.get("format") or "PARQUET") != "PARQUET"
        ]
        if rowfmt_entries and spark is None:
            raise NotImplementedError(
                f"{path}: {len(rowfmt_entries)} non-parquet data files "
                "need materialization into the parquet spool — pass "
                "spark= (or use stream_from_iceberg, which does), or "
                "compact_iceberg to parquet first"
            )
        _link_parquet(sid, pq_entries)
        rowfmt_batch.extend(rowfmt_entries)
        prev = snap
        prev_content = (s_data, [d["path"] for d in s_del_plan])
    if not seen_since:
        raise ValueError(
            f"{path}: snapshot {since_snapshot_id} is not an ancestor "
            "of the current snapshot (expired history, or a rolled-back "
            "/ staged branch) — restart from a full snapshot"
        )
    if rowfmt_batch:
        _materialize_rowfmt(spark, path, meta, spool_dir, cur, rowfmt_batch)
    if rewrite_batch:
        _materialize_rewrites(spark, path, spool_dir, rewrite_batch)
    return cur


def _harden_links(spool_dir: str, replaced: set) -> None:
    """Turn spool SYMLINKS whose targets a compaction just replaced into
    HARD links (fallback: byte copies across filesystems): the replaced
    originals stay live on disk only until snapshot expiration reclaims
    them, and a dangling symlink would kill a restarted consumer
    mid-stream. Hard links pin the inode at zero copy; the spool's
    retention (prune_spool) is what eventually releases the bytes.
    O(#links) readlink scan, paid only on replace snapshots."""
    import shutil

    if not replaced:
        return
    # realpath, not abspath: the link-side comparison below uses
    # os.path.realpath, and a symlinked component in the TABLE path
    # (symlinked data mounts, macOS /tmp) would otherwise make every
    # membership check miss and silently skip the hardening
    targets = {
        os.path.realpath(
            urlparse(p).path if urlparse(p).scheme in ("", "file") else p
        )
        for p in replaced
    }
    for dirpath, _dirs, names in os.walk(spool_dir):
        if os.path.basename(dirpath).startswith("."):
            continue
        for n in names:
            link = os.path.join(dirpath, n)
            if not os.path.islink(link):
                continue
            tgt = os.path.realpath(link)
            if tgt not in targets or not os.path.exists(tgt):
                continue
            tmp = link + ".hard"
            try:
                os.link(tgt, tmp)
            except OSError:
                shutil.copy2(tgt, tmp)
            os.replace(tmp, link)


def _materialize_rewrites(
    spark: SparkSession,
    path: str,
    spool_dir: str,
    batch: list[tuple[int, list[str]]],
) -> None:
    """Live rows of rewrite-snapshot added files, each read with its
    delete masks applied AT ITS OWN snapshot (``read_iceberg`` subset
    scan) — what delta-spark's ignoreChanges emits when a rewritten file
    carries a DV. All pending snapshots union into ONE distributed job
    per sync; publication rides the same crash-safe ledger as the
    rowfmt decode (``_publish_parts``), keyed ``rewrite-<sid>.done``."""
    from functools import reduce as _reduce

    mark_dir = os.path.join(spool_dir, ".materialized")
    os.makedirs(mark_dir, exist_ok=True)
    _recover_partial_materialization(spool_dir, mark_dir)
    todo = [
        (sid, paths)
        for sid, paths in batch
        if not os.path.exists(os.path.join(mark_dir, f"rewrite-{sid}.done"))
    ]
    if not todo:
        return
    dfs = [
        _ice.read_iceberg(spark, path, snapshot_id=sid, _only_paths=set(paths))
        for sid, paths in todo
    ]
    df = _stamp_fids(
        _reduce(lambda a, b: a.unionByName(b), dfs),
        _ice._load_metadata(path),
    )
    hi = max(sid for sid, _ in todo)
    _publish_parts(
        spool_dir,
        mark_dir,
        df,
        f"{hi:020d}-r",
        [f"rewrite-{sid}" for sid, _ in todo],
    )


def _materialize_rowfmt(
    spark: SparkSession,
    path: str,
    meta: dict,
    spool_dir: str,
    cur: int,
    entries: list[dict],
) -> None:
    """Decode not-yet-materialized AVRO/ORC data-file ENTRIES through the
    batch rowfmt readers (ONE distributed mapInPandas pass per format —
    field-id-resolved, identity-partition backfill included) and land
    their rows as parquet in the spool. A zero-byte marker per SOURCE
    basename under ``<spool>/.materialized/`` is the idempotency ledger:
    re-syncs and checkpoint overlaps skip already-converted files instead
    of duplicating rows (symlinks get this for free from lexists).

    CRASH SAFETY (round 11): output parts land in the flat spool one
    rename at a time, so a bare rename loop would leave a crash window
    where some rows are live but no ``.done`` marker exists — the next
    sync would re-materialize every todo file and DUPLICATE the already
    landed rows. Publication is therefore two-phase: an ``_inflight.json``
    ledger (itself published by atomic replace, and invisible to the file
    source under the dot-dir) records the exact tmp-part -> spool-name
    plan plus the source basenames BEFORE the first rename;
    :func:`_recover_partial_materialization` replays an interrupted plan
    to completion (renames are idempotent against the recorded names) and
    only then writes the source markers, so every source file's rows land
    exactly once no matter where the previous process died."""
    mark_dir = os.path.join(spool_dir, ".materialized")
    os.makedirs(mark_dir, exist_ok=True)
    _recover_partial_materialization(spool_dir, mark_dir)
    todo = [
        e
        for e in entries
        if not os.path.exists(
            os.path.join(mark_dir, os.path.basename(e["path"]) + ".done")
        )
    ]
    if not todo:
        return
    declared = _ice._declared_spark_schema(meta)
    if declared is None:
        raise ValueError(
            f"{path}: table schema has types outside the reader's "
            "primitive mapping — cannot materialize a streaming spool"
        )
    groups: dict[str, list[dict]] = {"AVRO": [], "ORC": []}
    for e in todo:
        groups[e["format"]].append(e)
    parts = []
    if groups["AVRO"]:
        parts.append(_ice._read_avro_data(spark, groups["AVRO"], declared, meta))
    if groups["ORC"]:
        parts.append(_ice._read_orc_data(spark, groups["ORC"], declared, meta))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df = _stamp_fids(df, meta)
    # the 'm' segment sorts materialized output after same-sync
    # symlinks; discovery order within a sync is not semantic
    _publish_parts(
        spool_dir,
        mark_dir,
        df,
        f"{cur:020d}-m",
        [os.path.basename(e["path"]) for e in todo],
    )


def _stamp_fids(df, meta: dict):
    """Stamp each column's Iceberg FIELD ID into the staged parquet
    footers (alias metadata -> footer, like the table writer does):
    spooled symlinks carry footer field ids, and Spark's field-id read
    refuses a scan that mixes id-carrying and id-less files — the
    materialized parts must match."""
    from pyspark.sql import functions as F

    fids = {
        f["name"]: f["id"]
        for f in _ice._current_schema(meta).get("fields", [])
        if "id" in f
    }
    return df.select(
        *[
            F.col(c).alias(c, metadata={"parquet.field.id": fids[c]})
            if c in fids
            else F.col(c)
            for c in df.columns
        ]
    )


def _publish_parts(
    spool_dir: str, mark_dir: str, df, prefix: str, sources: list[str]
) -> None:
    """Two-phase crash-safe publication of ``df``'s parquet parts into
    the flat spool under ``<prefix><k>-<part>`` names, committing
    ``<source>.done`` markers only after every rename (the
    ``_inflight.json`` ledger protocol — see
    :func:`_materialize_rowfmt`). Shared by the rowfmt decode leg and
    the ignore_changes rewrite leg."""
    import shutil
    import uuid

    tmp = os.path.join(spool_dir, f"_tmp_{uuid.uuid4().hex[:8]}")
    df.write.parquet(tmp)
    plan = [
        (name, f"{prefix}{k:05d}-{name}")
        for k, name in enumerate(
            n for n in sorted(os.listdir(tmp)) if n.endswith(".parquet")
        )
    ]
    ledger = {
        "tmp": os.path.basename(tmp),
        "parts": plan,
        "sources": sources,
    }
    ledger_path = os.path.join(mark_dir, "_inflight.json")
    ltmp = ledger_path + ".tmp"
    with open(ltmp, "w") as fh:
        _json.dump(ledger, fh)
    os.replace(ltmp, ledger_path)  # publish the plan before any rename
    for name, dest in plan:
        os.rename(os.path.join(tmp, name), os.path.join(spool_dir, dest))
    shutil.rmtree(tmp)
    for src_name in ledger["sources"]:
        with open(os.path.join(mark_dir, src_name + ".done"), "w"):
            pass
    os.remove(ledger_path)


def _recover_partial_materialization(spool_dir: str, mark_dir: str) -> None:
    """Replay an interrupted :func:`_materialize_rowfmt` publication. If
    an ``_inflight.json`` ledger exists, a previous process died after
    committing to the plan: finish the remaining tmp->spool renames (each
    is present in exactly one of the two places), write the source
    markers, drop the ledger. Without a ledger, any ``_tmp_*`` directory
    is pre-commit garbage whose rows never became visible — delete it and
    let the normal todo pass redo the work."""
    import shutil

    ledger_path = os.path.join(mark_dir, "_inflight.json")
    if not os.path.exists(ledger_path):
        for name in os.listdir(spool_dir):
            if name.startswith("_tmp_"):
                shutil.rmtree(
                    os.path.join(spool_dir, name), ignore_errors=True
                )
        return
    with open(ledger_path) as fh:
        ledger = _json.load(fh)
    tmp = os.path.join(spool_dir, ledger["tmp"])
    for name, dest in ledger["parts"]:
        dpath = os.path.join(spool_dir, dest)
        if os.path.exists(dpath):
            continue
        spath = os.path.join(tmp, name)
        if not os.path.exists(spath):
            raise RuntimeError(
                f"{spool_dir}: in-flight materialization part {name!r} is "
                f"missing from both the staging dir and the spool — the "
                "spool was externally modified; rebuild it from scratch"
            )
        os.rename(spath, dpath)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    for src_name in ledger["sources"]:
        with open(os.path.join(mark_dir, src_name + ".done"), "w"):
            pass
    os.remove(ledger_path)


def _footers_mismatch_schema(
    meta: dict, files: list[str], path: str, spark=None, probes=None
) -> bool:
    """True when linking these parquet files into a NAME-resolving file
    source would silently misread them: the table had an inner
    struct-member rename (fsml.field-id-read — member names diverge
    somewhere in history), a file stores a renamed top-level column
    under its old physical name, or a footer is unreadable to pyarrow
    (VARIANT). Round 14 (VERDICT r13 item 7): callers MATERIALIZE such
    files through the batch reader (field-id / member resolution,
    current declared names) into spool parquet instead of refusing."""
    from ..io.lakehouse import _footer_fid_maps

    if (meta.get("properties") or {}).get("fsml.field-id-read") == "true":
        return True
    cur = _ice._current_schema(meta)
    want = {
        f["id"]: f["name"] for f in cur.get("fields", []) if "id" in f
    }
    if not want:
        return False
    # ONE footer read per file yields both the fid map and the top-level
    # names (ADVICE r14: the name-subset check used to re-read every
    # unstamped footer sequentially on the driver right after the fid
    # probe had parsed it — reintroducing the O(#files) serial loop the
    # distributed probe exists to remove). Callers that need the same
    # probe for their own checks pass it in via ``probes``.
    if probes is None:
        probes = _footer_fid_maps(files, spark=spark, with_names=True)
    want_names = set(want.values())
    for f in files:
        phys_by_fid, names = probes[f]
        if not phys_by_fid:
            # unstamped OR unreadable (variant) footers: prove each one
            # readable and carrying the current names; otherwise
            # materialize (never silent-null)
            if names is None or not want_names <= set(names):
                return True
            continue
        for fid, phys in phys_by_fid.items():
            if fid in want and want[fid] != phys:
                return True
    return False


def stream_from_iceberg(
    spark: SparkSession,
    path: str,
    spool_dir: str,
    since_snapshot_id: int | None = None,
    max_files_per_trigger: int | None = None,
    ignore_deletes: bool = False,
    ignore_changes: bool = False,
) -> tuple[DataFrame, int]:
    """Tail an append-only Iceberg table as a real Structured Streaming
    DataFrame. Returns ``(streaming_df, synced_snapshot_id)`` — checkpoint
    the snapshot id alongside the sink and pass it back to resume.
    ``ignore_deletes`` / ``ignore_changes`` carry delta-spark's
    documented mutation-tolerance semantics (see sync_iceberg_spool)."""
    snap = sync_iceberg_spool(
        path,
        spool_dir,
        since_snapshot_id,
        spark=spark,
        ignore_deletes=ignore_deletes,
        ignore_changes=ignore_changes,
    )
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


def sync_iceberg_cdf_spool(
    spark: SparkSession,
    path: str,
    spool_dir: str,
    since_snapshot_id: int | None = None,
) -> int:
    """CHANGE-FEED spool sync — the mutation-tolerant Iceberg tail (the
    plain spool refuses tables with delete files), twin of
    ``delta_source.sync_delta_cdf_spool``. Per snapshot after
    ``since_snapshot_id``, in commit (sequence) order:

    - pure APPEND snapshots symlink their added data files into
      ``<spool>/inserts/`` (every row is an insert — zero copy);
    - MUTATION snapshots ('overwrite'/'delete': MERGE, UPDATE, row
      deletes, selective overwrite) MATERIALIZE their row-level diff via
      ``read_iceberg_cdf`` into ``<spool>/changes/`` — cost O(changed
      rows), once per snapshot, because a position-delete file names
      (file, pos) pairs a file source cannot express as rows;
    - 'replace' snapshots (compaction) change no rows and are skipped;
    - appended files missing a declared column in their footers
      (identity-partition conversions) also materialize, so the file
      source never backfills a partition column as null.

    Link/dir names carry the snapshot's zero-padded SEQUENCE number (the
    commit order) plus its id, so ``stream_iceberg_cdf`` surfaces
    ``_commit_snapshot_id`` from the path for inserts. Idempotent.
    Returns the current snapshot id to checkpoint."""
    from .delta_source import _publish_cdf_batch, _recover_cdf_batch

    meta = _ice._load_metadata(path)
    cur = meta.get("current-snapshot-id")
    if cur in (None, -1):
        raise ValueError(f"{path}: table has no current snapshot")
    declared = _ice._declared_spark_schema(meta)
    if declared is None:
        raise ValueError(
            f"{path}: table schema has types outside the reader's "
            "primitive mapping — cannot derive a streaming schema"
        )
    want_names = {f.name for f in declared.fields}
    # ancestry chain, not the raw snapshot list (WAP staged snapshots,
    # foreign v1 id allocation) — same contract as the plain tail
    ordered = _ice._ancestry_chain(meta)
    ins_dir = os.path.join(spool_dir, "inserts")
    chg_dir = os.path.join(spool_dir, "changes")
    os.makedirs(ins_dir, exist_ok=True)
    os.makedirs(chg_dir, exist_ok=True)
    _recover_cdf_batch(chg_dir)
    seen_since = since_snapshot_id is None or since_snapshot_id == -1
    prev = None
    #: previous ancestor's (data paths, delete paths), carried forward
    #: so each snapshot's manifests replay ONCE per sync, not twice
    prev_content: "tuple[list[str], list[str]] | None" = None
    #: pending materializations, published in ONE distributed job per
    #: sync (round 12 — formerly one job per snapshot; the per-commit
    #: scheduling constant dominated the CDF-stream pins)
    batch: list = []
    # shared manifest-decode memo for the walk (see the plain-tail twin)
    mcache: dict = {}
    for snap in ordered:
        sid = snap["snapshot-id"]
        if not seen_since:
            if sid == since_snapshot_id:
                seen_since = True
            prev = snap
            prev_content = None
            continue
        seq = snap.get("sequence-number", 0) or 0
        op = (snap.get("summary") or {}).get("operation", "append")
        if prev_content is None and prev is not None:
            prev_content = _ice._snapshot_content(
                meta, prev["snapshot-id"], path, _manifest_cache=mcache
            )
        p_data, p_del = prev_content if prev_content is not None else ([], [])
        s_plan, s_del_plan = _ice._snapshot_scan_plan(
            meta, sid, path, _manifest_cache=mcache
        )
        s_data = [d["path"] for d in s_plan]
        prev_set = set(p_data)
        if op == "replace":
            # compaction: rows identical by contract — harden symlinks
            # whose targets the replace superseded (expiration may
            # reclaim them later)
            _harden_links(spool_dir, prev_set - set(s_data))
            prev = snap
            prev_content = (s_data, [d["path"] for d in s_del_plan])
            continue
        s_fmt = {d["path"]: (d.get("format") or "PARQUET") for d in s_plan}
        s_del = [d["path"] for d in s_del_plan]
        new_deletes = set(s_del) - set(p_del)
        added = [f for f in s_data if f not in prev_set]
        added_local = [
            urlparse(f).path if urlparse(f).scheme in ("", "file") else f
            for f in added
        ]
        materialize = bool(new_deletes)
        if not materialize and any(s_fmt[f] != "PARQUET" for f in added):
            # AVRO/ORC appends (round 10): a parquet file stream cannot
            # scan them in place — materialize the snapshot's rows once,
            # through the format-aware CDF reader
            materialize = True
        if not materialize and added_local:
            # ONE footer probe serves both checks (the mismatch test and
            # the projected-partition-column test) — formerly each file's
            # footer was read twice, serially, per sync
            from ..io.lakehouse import _footer_fid_maps as _probe_all

            probes = _probe_all(added_local, spark=spark, with_names=True)
            if _footers_mismatch_schema(
                meta, added_local, path, spark, probes=probes
            ):
                materialize = True  # rename evolution / variant footers
            else:
                for f in added_local:
                    fnames = probes[f][1]
                    if fnames is None:
                        materialize = True  # unreadable footer (VARIANT)
                        break
                    if not want_names <= set(fnames):
                        materialize = True  # partition cols in metadata
                        break
        if materialize:
            key = f"{seq:020d}-{sid}"
            covered = os.path.exists(
                os.path.join(chg_dir, key)
            ) or os.path.exists(os.path.join(chg_dir, f".covered-{key}"))
            if not covered:
                if prev is None and new_deletes:
                    raise ValueError(
                        f"{path}: first snapshot {sid} carries delete "
                        "files — corrupt history"
                    )
                if prev is None:
                    # genesis snapshot whose files omit metadata-projected
                    # columns: its whole content is the insert set
                    from pyspark.sql import functions as F

                    rows = _ice.read_iceberg(
                        spark, path, snapshot_id=sid
                    ).select(
                        "*",
                        F.lit("insert").alias("_change_type"),
                        F.lit(sid).cast("long").alias("_commit_snapshot_id"),
                    )
                else:
                    rows = _ice.read_iceberg_cdf(
                        spark, path, prev["snapshot-id"], sid
                    )
                batch.append((key, rows))
        else:
            for i, src in enumerate(sorted(added_local)):
                link = os.path.join(
                    ins_dir,
                    f"{seq:020d}-{sid}-{i:05d}-{os.path.basename(src)}",
                )
                if not os.path.lexists(link):
                    os.symlink(os.path.abspath(src), link)
        prev = snap
        prev_content = (s_data, s_del)
    if not seen_since:
        raise ValueError(
            f"{path}: snapshot {since_snapshot_id} is not an ancestor "
            "of the current snapshot (expired history, or a rolled-back "
            "/ staged branch) — restart from a full snapshot"
        )
    if batch:
        from functools import reduce as _reduce

        # schema may evolve INSIDE the pending range (merge_schema adds a
        # column mid-history): null-fill the missing columns exactly
        # like the fixed-schema per-commit reader used to
        df = _reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            [r for _k, r in batch],
        )
        _publish_cdf_batch(
            chg_dir, df, batch[-1][0], [k for k, _r in batch]
        )
    return cur


def stream_iceberg_cdf(
    spark: SparkSession,
    path: str,
    spool_dir: str,
    since_snapshot_id: int | None = None,
) -> tuple[DataFrame, int]:
    """Tail an Iceberg table's CHANGE FEED as a streaming DataFrame:
    table columns plus ``_change_type`` ('insert' | 'delete') and
    ``_commit_snapshot_id`` — the online twin of ``read_iceberg_cdf``
    and the Iceberg twin of ``delta_source.stream_delta_cdf``, feeding a
    downstream that must APPLY mutations (feature retraction, GDPR
    propagation). Returns ``(streaming_df, synced_snapshot_id)``."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType

    snap = sync_iceberg_cdf_spool(spark, path, spool_dir, since_snapshot_id)
    meta = _ice._load_metadata(path)
    declared = _ice._declared_spark_schema(meta)
    sid_from_path = F.regexp_extract(
        F.col("_metadata.file_path"), r"/\d{20}-(\d+)-\d{5}-", 1
    ).cast("long")
    ins = (
        spark.readStream.schema(declared)
        .parquet(os.path.join(spool_dir, "inserts"))
        .select(
            "*",
            F.lit("insert").alias("_change_type"),
            sid_from_path.alias("_commit_snapshot_id"),
        )
    )
    chg_schema = (
        declared.add("_change_type", StringType())
        .add("_commit_snapshot_id", LongType())
    )
    chg = spark.readStream.schema(chg_schema).option(
        "recursiveFileLookup", "true"
    ).parquet(os.path.join(spool_dir, "changes"))
    return ins.unionByName(chg), snap
