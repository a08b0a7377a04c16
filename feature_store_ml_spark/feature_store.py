"""Feature-group registry: define → materialize → serve.

The reference project's "feature store" is one CSV written once
(/root/reference/src/main.py:14-15). This module is that concept grown to
what the name implies at scale, composed ENTIRELY from primitives that
already exist in this repo — nothing here invents new execution machinery:

- a ``FeatureGroup`` declares keys, an event-time column, and a build
  function (DataFrame in → feature DataFrame out);
- ``materialize`` writes the group to a Delta table through the
  protocol-compliant writer (io/lakehouse.py), stamping a ``txn``
  (group-name, run-version) so re-running a failed job is idempotent;
- ``materialize_incremental`` appends only features built from NEW source
  rows (read_delta_changes semantics on the source) — the daily-batch
  pattern;
- ``serve`` point-in-time-joins a label frame against any number of
  groups (operators/features.point_in_time_join — the leak-free as-of
  machinery), returning the training frame.

Scale shape: each materialization is one distributed build + one
lakehouse commit; serving is one co-shuffle per feature group
(union-window as-of, never a range product). Offline/online symmetry
beyond this module's scope: the same build functions run under
Structured Streaming via streaming/events.stream_to_delta /
stream_to_iceberg.

``FeatureStore(table_format='iceberg')`` runs the identical surface over
the Iceberg writer family (overwrite_iceberg / write_iceberg_batch /
merge_iceberg / delete_iceberg / update_iceberg), with snapshot-summary
(app, batch) stamps supplying the same idempotent-retry contract the
Delta txn action gives.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .io import iceberg, lakehouse
from .operators import features as FE


@dataclass(frozen=True)
class FeatureGroup:
    """A named, versioned feature definition.

    ``build``: (source DataFrame) -> feature DataFrame containing ``keys``,
    ``ts_col`` (the availability timestamp — when serving may SEE the row),
    and the feature columns. ``version`` participates in the table path so
    a changed definition materializes beside, not over, its predecessor.
    """

    name: str
    keys: tuple[str, ...]
    ts_col: str
    build: Callable[[DataFrame], DataFrame]
    version: int = 1
    description: str = ""

    def table_path(self, root: str) -> str:
        return f"{root}/{self.name}_v{self.version}"

    def validate(self, df: DataFrame) -> DataFrame:
        missing = [c for c in (*self.keys, self.ts_col) if c not in df.columns]
        if missing:
            raise ValueError(
                f"feature group {self.name!r}: build output is missing "
                f"declared columns {missing} (got {df.columns})"
            )
        return df


@dataclass
class FeatureStore:
    """Registry + materialization root. Groups are registered once and
    addressed by name everywhere else.

    ``table_format`` selects the lakehouse backend for every group table:
    'delta' (the default — txn-action idempotency, deletion-vector
    retraction, copy-on-write correction) or 'iceberg' (snapshot-summary
    idempotency, position-delete retraction, merge-on-read correction).
    The store surface is identical on both; only the open format under it
    changes."""

    root: str
    groups: dict[str, FeatureGroup] = field(default_factory=dict)
    table_format: str = "delta"

    def __post_init__(self) -> None:
        if self.table_format not in ("delta", "iceberg"):
            raise ValueError(
                f"FeatureStore: table_format must be delta|iceberg, "
                f"got {self.table_format!r}"
            )

    @property
    def _is_iceberg(self) -> bool:
        return self.table_format == "iceberg"

    def register(self, group: FeatureGroup) -> FeatureGroup:
        if group.name in self.groups:
            raise ValueError(f"feature group {group.name!r} already registered")
        self.groups[group.name] = group
        return group

    def materialize(
        self, spark: SparkSession, source: DataFrame, name: str, run_version: int = 0
    ) -> str:
        """Full rebuild: overwrite the group's table with features built
        from ``source``. The txn stamp makes a retried run a no-op."""
        g = self.groups[name]
        path = g.table_path(self.root)
        out = g.validate(g.build(source))
        if self._is_iceberg:
            iceberg.overwrite_iceberg(
                spark, out, path, batch=(f"fs::{g.name}", run_version)
            )
            return path
        committed = lakehouse.last_txn_version(path, f"fs::{g.name}")
        if committed >= run_version:
            return path  # this run already landed — idempotent retry
        lakehouse.write_delta(
            spark, out, path, mode="overwrite", txn=(f"fs::{g.name}", run_version)
        )
        return path

    def materialize_incremental(
        self, spark: SparkSession, new_rows: DataFrame, name: str, run_version: int
    ) -> str:
        """Append features built from NEW source rows only (caller supplies
        them — e.g. via lakehouse.read_delta_changes on the source table or
        a streaming micro-batch). Idempotent per ``run_version``: the daily
        batch that crashes after commit and reruns appends nothing twice.

        Correctness contract: the build function must be PER-ROW-LOCAL over
        its input slice (projections, filters, row-local derivations).
        Cross-row aggregates over a slice would silently differ from a full
        rebuild — groups needing history belong in ``materialize``.
        """
        g = self.groups[name]
        path = g.table_path(self.root)
        out = g.validate(g.build(new_rows))
        if self._is_iceberg:
            iceberg.write_iceberg_batch(
                spark, out, path, f"fs::{g.name}", run_version
            )
            return path
        lakehouse.write_delta(
            spark, out, path, mode="append", txn=(f"fs::{g.name}", run_version)
        )
        return path

    def materialize_upsert(
        self, spark: SparkSession, source: DataFrame, name: str, run_version: int
    ) -> str:
        """Keyed mutation — the feature store's canonical write: upsert the
        LATEST feature value per entity key. Unlike ``materialize`` (full
        table rewrite) or ``materialize_incremental`` (append-only, dedup
        deferred to read time), this keeps the table at one row per key:
        the batch is reduced to its newest row per key (by ``ts_col``, ties
        broken by content hash so reruns are deterministic), then MERGEd —
        matched entities updated in place, new entities inserted — via the
        protocol-compliant copy-on-write merge (io/lakehouse.merge_delta),
        which rewrites only the data files containing matched keys.

        Idempotent per ``run_version`` through the same txn handshake as
        the other materializers: a retried run whose merge already
        committed is a no-op.
        """
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        g = self.groups[name]
        path = g.table_path(self.root)
        out = g.validate(g.build(source))
        w = Window.partitionBy(*g.keys).orderBy(
            F.col(g.ts_col).desc(), F.xxhash64(*out.columns).desc()
        )
        latest = (
            out.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        if self._is_iceberg:
            iceberg.merge_iceberg(
                spark,
                latest,
                path,
                keys=list(g.keys),
                batch=(f"fs::{g.name}", run_version),
            )
            return path
        lakehouse.merge_delta(
            spark,
            latest,
            path,
            keys=list(g.keys),
            txn=(f"fs::{g.name}", run_version),
        )
        return path

    def read(
        self, spark: SparkSession, name: str, where: str | None = None
    ) -> DataFrame:
        """Read a group's materialized table. ``where`` engages per-file
        DATA SKIPPING (lakehouse.read_delta): on a time-clustered
        materialization, a training read bounded to a date range plans
        only the matching files — the difference between scanning a
        feature table and scanning a feature table's last week."""
        path = self.groups[name].table_path(self.root)
        if self._is_iceberg:
            return iceberg.read_iceberg(spark, path, where=where)
        return lakehouse.read_delta(spark, path, where=where)

    def retract(
        self,
        spark: SparkSession,
        name: str,
        entities: DataFrame,
        run_version: int | None = None,
        max_entities: int = 100_000,
    ) -> int:
        """ENTITY ERASURE — the GDPR/right-to-be-forgotten primitive a
        feature store must have: remove every stored feature row for the
        given entities from the group's table, WITHOUT rewriting the
        table (deletion vectors — write cost scales with the erased rows,
        read-side serving masks them immediately). ``entities`` carries
        exactly the group's key columns; ``run_version`` gives the same
        idempotent-retry stamp as materialization. Subsequent
        ``maintain`` runs purge the masked bytes physically (compaction
        drops the bitmaps, vacuum deletes the tombstones) — erasure
        becomes physical on the maintenance schedule, as privacy
        processes expect. Returns the committed version."""
        g = self.groups[name]
        if sorted(entities.columns) != sorted(g.keys):
            raise ValueError(
                f"feature group {name!r}: retraction frame must carry "
                f"exactly the key columns {list(g.keys)} (got {entities.columns})"
            )
        path = g.table_path(self.root)
        # the entity set is collected to build the delete predicate — cap
        # it FAIL-LOUD (mirrors cosine_topk_pandas.max_queries) so an
        # unbounded keys frame can't OOM the driver; erasure requests
        # name entities, they do not stream millions. The per-row DELETE
        # underneath is executor-side regardless (delete_delta builds
        # bitmaps on executors), so the cap governs predicate size only.
        rows = entities.distinct().limit(max_entities + 1).collect()
        if len(rows) > max_entities:
            raise ValueError(
                f"feature group {name!r}: retraction set exceeds "
                f"max_entities={max_entities}; split the erasure into "
                "batches or raise max_entities explicitly"
            )
        if not rows:
            raise ValueError(f"feature group {name!r}: empty retraction set")
        # keys-in-set predicate (retraction sets are small — an erasure
        # request names entities, it does not stream millions)
        def _lit(v):
            if v is None:
                return "NULL"
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return repr(v)

        if len(g.keys) == 1:
            k = g.keys[0]
            pred = f"{k} IN ({', '.join(_lit(r[k]) for r in rows)})"
        else:
            tuples = [
                "(" + " AND ".join(f"{k} <=> {_lit(r[k])}" for k in g.keys) + ")"
                for r in rows
            ]
            pred = " OR ".join(tuples)
        if self._is_iceberg:
            return iceberg.delete_iceberg(
                spark, path, pred,
                batch=(
                    (f"fs-retract::{g.name}", run_version)
                    if run_version is not None
                    else None
                ),
            )
        txn = (f"fs-retract::{g.name}", run_version) if run_version is not None else None
        return lakehouse.delete_delta(spark, path, pred, txn=txn)

    def correct(
        self,
        spark: SparkSession,
        name: str,
        set: dict[str, str],
        where: str,
        run_version: int | None = None,
    ) -> int:
        """Targeted FEATURE CORRECTION — "this feature was computed wrong
        for this slice; fix it in place": UPDATE ... SET ... WHERE on the
        group's table (lakehouse.update_delta — copy-on-write, only files
        holding matched rows rewrite, CDF pre/post images when the feed
        is on). Key columns cannot be corrected (entity identity is
        immutable — upsert/retract are the key-level operations).
        ``run_version`` gives the same idempotent-retry txn stamp as
        materialization. Returns the committed version."""
        g = self.groups[name]
        bad = sorted(k for k in set if k in g.keys)
        if bad:
            raise ValueError(
                f"feature group {name!r}: cannot correct key columns {bad} "
                "— retract and re-materialize instead"
            )
        txn = (
            (f"fs-correct::{g.name}", run_version)
            if run_version is not None
            else None
        )
        if self._is_iceberg:
            return iceberg.update_iceberg(
                spark, g.table_path(self.root), set, where=where, batch=txn
            )
        return lakehouse.update_delta(
            spark, g.table_path(self.root), set, where=where, txn=txn
        )

    def maintain(self, name: str, spark: SparkSession | None = None) -> dict:
        """Table maintenance for one group — the scheduled job a streaming
        or daily materialization needs to stay healthy: PURGE deletion
        vectors left by retractions (compaction rewrites masked files
        clean — this is the step that turns logical erasure into physical
        erasure, so it runs whenever DVs exist and ``spark`` is provided),
        checkpoint the log (bounds snapshot-build cost), drop the JSON
        commits the checkpoint captured, and vacuum dead data files
        (upsert/overwrite tombstones + orphaned DV bitmaps). Returns what
        was done."""
        path = self.groups[name].table_path(self.root)
        purged = False
        if self._is_iceberg:
            # Iceberg maintenance triad: compaction physically applies
            # position deletes (retraction becomes physical erasure),
            # snapshot expiration bounds metadata + drops dead bytes,
            # orphan removal sweeps crashed-write leftovers
            if spark is not None:
                meta0 = iceberg._load_metadata(path)
                cur = meta0.get("current-snapshot-id")
                if cur not in (None, -1) and iceberg._snapshot_content(
                    meta0, cur, path
                )[1]:  # live delete files present
                    iceberg.compact_iceberg(spark, path)
                    purged = True
            expired = iceberg.expire_iceberg_snapshots(path, keep=1)
            orphans = iceberg.remove_orphan_files(path)
            return {
                "dv_purged": purged,
                "snapshots_expired": len(expired["snapshots"]),
                "log_files_removed": len(expired["files"]),
                "data_files_removed": len(orphans),
            }
        if spark is not None:
            adds, _ = lakehouse._replay_log_adds(path)
            if any(a.get("deletionVector") for a in adds.values()):
                lakehouse.compact_delta(spark, path)
                purged = True
        version = lakehouse.checkpoint_delta(path)
        cleaned = lakehouse.cleanup_delta_log(path)
        vacuumed = lakehouse.vacuum_delta(path)
        return {
            "dv_purged": purged,
            "checkpoint_version": version,
            "log_files_removed": cleaned,
            "data_files_removed": vacuumed,
        }

    def serve(
        self,
        spark: SparkSession,
        labels: DataFrame,
        label_ts: str,
        names: list[str] | None = None,
    ) -> DataFrame:
        """Training-frame assembly: point-in-time join the label frame
        against each requested group AS OF the label timestamp — each
        group's features enter as of their own availability column, so no
        group can leak the future regardless of cadence differences."""
        out = labels
        for name in names or list(self.groups):
            g = self.groups[name]
            feats = self.read(spark, name)
            out = FE.point_in_time_join(
                out,
                feats,
                keys=list(g.keys),
                label_ts=label_ts,
                feature_ts=g.ts_col,
            ).drop(g.ts_col)
        return out
