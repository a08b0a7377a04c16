"""Structured Streaming twins of the event aggregations — SURVEY.md §2B E13.

Batch/stream parity by construction: the windowed-aggregate EXPRESSIONS are
shared with operators.features.tumbling_features; only the source
(readStream) and sink (memory table for tests; kafka/files in production)
differ. Watermarks bound state so a 100 TB/day stream's window state stays
O(windows-in-flight), not O(history).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS

#: state-store shuffle partitions for the bounded streaming replays.
#: Structured Streaming never re-plans with AQE, so a stateful stage runs
#: at the session's raw ``spark.sql.shuffle.partitions`` — which this
#: engine sizes to the core count for BATCH plans (where AQE coalesces by
#: bytes). For streams that raw value is core-count-proportional pure
#: overhead: every micro-batch pays one state-store (checkpoint delta
#: file, commit, restore) per partition, and the partition count is
#: frozen into the checkpoint at the first batch. Real deployments size
#: state partitions by expected state bytes, not cores (the count cannot
#: change without a checkpoint reset). The replays here carry well under
#: one advisory partition (64 MB) of state per key-group; 8 partitions
#: bounds per-batch state-store overhead while keeping the stateful
#: stage parallel. Production streams override via env.
STREAM_SHUFFLE_PARTITIONS = int(
    os.environ.get("FSML_STREAM_SHUFFLE_PARTITIONS", "8")
)


def _streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table as a bounded stream (one file).

    The readStream schema is DERIVED from the batch file's footer (one cheap
    batch-scan plan, no data read) rather than hard-coded — the corpus has
    shipped ts as both INT64 TIMESTAMP(NANOS) (reads as ``bigint`` under
    ``nanosAsLong``) and native ``timestamp[us]`` (reads as timestamp_ntz),
    and a stale hard-coded ``ts long`` silently misparses the µs corpus
    ~1000× compressed. Either generation is normalized to a watermark-able
    TIMESTAMP whose UTC wall-clock equals the batch path's NTZ readings.
    """
    # Defensive for driver-supplied vanilla sessions: legacy-nanos files need
    # the conf (no-op for µs files), and the watermark/window path goes
    # through TimestampType whose rendering depends on the session timezone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    df = (
        spark.readStream.schema(batch_schema)
        # FileStreamSource takes a directory; glob-filter to the events file.
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_dtype = dict((f.name, f.dataType.simpleString()) for f in batch_schema)["ts"]
    if ts_dtype == "bigint":  # legacy nanos
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # timestamp_ntz (or timestamp): session tz is pinned UTC, so the cast is
    # wall-clock-preserving and matches the batch path's NTZ values.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum per event_type with a watermark: late rows
    beyond the watermark are dropped and window state is evicted — the
    bounded-state requirement for unbounded input."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact decimal accumulation → order/batch-independent result
            F.sum(F.col("value").cast("decimal(30,8)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-key semantics: drop duplicate event_ids
    arriving within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming deduplication: replay events and emit each
    (user_id, event_type) key once via dropDuplicatesWithinWatermark — the
    bounded-state streaming dedup (state evicts once the watermark passes a
    key's last sighting + horizon, so memory is O(keys-in-horizon), not
    O(stream)). The horizon here exceeds the corpus' 30-day span, making the
    result exactly DISTINCT(user_id, event_type) — the oracle — while still
    exercising the real stateful operator. Only key columns are emitted:
    WHICH physical row survives depends on micro-batch arrival order and is
    not part of the operator's contract."""
    ev = _streaming_events(spark, sf_dir).select("ts", "user_id", "event_type")
    deduped = (
        ev.withWatermark("ts", "45 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_stream_to_table(spark, deduped, mode="append")


def run_stream_to_table(spark: SparkSession, streaming_df: DataFrame, mode: str = "append") -> DataFrame:
    """Drive a (bounded) streaming query to completion through a memory sink
    and return the materialized result as a batch DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    # Pin the stream's state-partition count for the query's lifetime
    # (see STREAM_SHUFFLE_PARTITIONS) and restore the session value for
    # the batch plans that follow. The conf is read when each micro-batch
    # is planned, i.e. strictly before awaitTermination returns.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
    )
    try:
        q = (
            streaming_df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def stream_window_counts(spark: SparkSession, sf_dir: str, window_len: str = "1 hour") -> DataFrame:
    """End-to-end: replayed stream → watermarked tumbling agg → memory sink.
    Returns the same rows the batch tumbling_features query produces (the
    oracle SQL is the batch formulation)."""
    # complete mode: append mode would withhold windows the watermark hasn't
    # closed when the bounded replay ends (the last <watermark> hours).
    out = run_stream_to_table(
        spark, windowed_counts(_streaming_events(spark, sf_dir), window_len), mode="complete"
    )
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "1 hour",
    horizon_minutes: int = 30,
) -> DataFrame:
    """Stream-stream inner join: each left event pairs with right events for
    the same user in the trailing ``horizon_minutes`` (view→click style
    attribution).

    Both sides are watermarked and the join condition bounds event time in
    BOTH directions — that is what lets Spark evict buffered state: a right
    row can be dropped once the left watermark passes right.ts + horizon,
    so state is O(events in horizon), not O(stream). An unbounded condition
    would buffer both streams forever and is the classic stream-join OOM.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("l_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
    )
    joined = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {horizon_minutes} MINUTES")),
    )
    return joined.select(
        "l_id",
        "r_id",
        F.col("l_user").alias("user_id"),
        (F.unix_micros(F.col("l_ts")) - F.unix_micros(F.col("r_ts"))).alias("gap_us"),
    )


def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end stream-stream join run: clicks joined to the user's views
    in the preceding 30 min, replayed through a real Structured Streaming
    query. The batch oracle is the identical range join in SQL."""
    ev = _streaming_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click")
    views = ev.where(F.col("event_type") == "view")
    out = run_stream_to_table(
        spark, stream_stream_interval_join(clicks, views), mode="append"
    )
    return out.select("l_id", "r_id", "user_id", "gap_us")


def ewma_per_user(
    events: DataFrame,
    alpha: float = 0.3,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful streaming operator: exponentially-weighted moving
    average of ``value`` per user, via applyInPandasWithState.

    State per user = (last_ewma, n_seen) — O(1) per key regardless of
    stream length; the watermark bounds how long idle keys are retained.
    Emits one row per input event with the updated EWMA. This is the
    escape hatch for semantics Spark's built-in windowed aggs can't
    express (recursive per-event state).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, event_id long, ewma double, n_seen long"
    state_schema = "ewma double, n_seen long"

    def ewma_scan(values: "np.ndarray", e0: float | None) -> "np.ndarray":
        """Vectorized EWMA recurrence via the closed form
        e_i = β^i (e_0 + α Σ_{j≤i} β^(-j) v_j), evaluated in chunks sized so
        β^(-chunk) stays far from double overflow (the β^(-j) growth is the
        standard numerical hazard of this formulation). Within a chunk it is
        one cumsum + two multiplies — no per-row Python."""
        beta = 1.0 - alpha
        out = np.empty(len(values), dtype=np.float64)
        start = 0
        if e0 is None:
            if len(values) == 0:
                return out
            out[0] = e0 = float(values[0])  # first event seeds the series
            start = 1
        if beta <= 0.0:  # alpha == 1: ewma is just the value
            out[start:] = values[start:]
            return out
        # keep beta**-chunk below ~1e200: chunk ≈ 200·ln10 / -ln(beta)
        chunk = int(np.clip(460.0 / max(-np.log(beta), 1e-9), 1, 65536))
        e = float(e0)
        for s in range(start, len(values), chunk):
            v = values[s : s + chunk]
            j = np.arange(1, len(v) + 1, dtype=np.float64)
            bpow = beta**j
            out[s : s + len(v)] = bpow * (e + alpha * np.cumsum(v / bpow))
            e = out[s + len(v) - 1]
        return out

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            ewma, n_seen = state.get
        else:
            ewma, n_seen = None, 0
        # concat THEN sort: the group's rows may arrive split across chunks,
        # and the recurrence needs one global (ts, event_id) order.
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((ewma, n_seen))
            yield pd.DataFrame(
                {"user_id": [], "event_id": [], "ewma": [], "n_seen": []}
            )
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values(["ts", "event_id"])
        vals = pdf["value"].to_numpy(np.float64)
        e_arr = ewma_scan(vals, ewma)
        n_arr = n_seen + np.arange(1, len(vals) + 1, dtype=np.int64)
        state.update((float(e_arr[-1]), int(n_seen + len(vals))))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": pdf["event_id"].to_numpy(),
                "ewma": e_arr,
                "n_seen": n_arr,
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_ewma(spark: SparkSession, sf_dir: str, alpha: float = 0.3) -> DataFrame:
    """End-to-end stateful streaming run of the per-user EWMA."""
    return run_stream_to_table(
        spark, ewma_per_user(_streaming_events(spark, sf_dir), alpha=alpha)
    )


def merge_session_batch(ts_us, vals, open_state, gap_us):
    """Pure session algebra shared by the transformWithState processor and
    its unit tests (testable without the protobuf-gated streaming runtime).

    ``ts_us``: sorted event times (µs int64 array); ``vals``: values;
    ``open_state``: (start, last, n, vsum) carried from prior batches or
    None. Returns (closed_sessions, new_open_state) where closed sessions
    are every gap-delimited run except the newest, each as
    (start, last, n, vsum)."""
    import numpy as np

    brk = np.flatnonzero(np.diff(ts_us) > gap_us) + 1
    seg_starts = np.concatenate(([0], brk))
    seg_ends = np.concatenate((brk, [len(ts_us)]))
    sessions = [
        (int(ts_us[i]), int(ts_us[j - 1]), int(j - i), float(vals[i:j].sum()))
        for i, j in zip(seg_starts, seg_ends)
    ]
    if open_state is not None:
        st, la, n, vs = open_state
        first = sessions[0]
        if first[0] - la <= gap_us:  # batch head extends the open session
            sessions[0] = (st, first[1], n + first[2], vs + first[3])
        else:  # open session closed by a later event
            sessions.insert(0, (st, la, n, vs))
    return sessions[:-1], sessions[-1]


def tws_available() -> bool:
    """Spark 4's transformWithState exchanges state over protobuf; the
    ``google.protobuf`` package does not ship in this image, so the operator
    is environment-gated exactly like the Kafka source (no broker) and the
    JPEG codecs (no Pillow): full implementation, loud failure, probe for
    tests."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def tws_user_sessions(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    delay_minutes: int = 1,
    chunks: int = 4,
) -> DataFrame:
    """Per-user sessionization as a CUSTOM stateful operator on Spark 4's
    arbitrary-state API (``transformWithStateInPandas``): a typed ValueState
    holds each user's open session; an EVENT-TIME TIMER closes it when the
    watermark passes last_event + gap. This is the escape hatch beyond
    ``session_window`` aggregation — imperative state transitions, multiple
    state variables, and timer-driven emission that windowed aggs cannot
    express (the same API family a production feature-store uses for
    "emit the session feature vector the moment the session closes").

    The replay is MULTI-BATCH by construction: the events table is sliced
    into ``chunks`` time-ordered parquet files replayed one per micro-batch
    (maxFilesPerTrigger=1), so the watermark genuinely advances batch over
    batch and mid-stream timers actually fire — not a single-batch
    simulation.

    Emission contract (what the DuckDB oracle mirrors exactly):
    - a session followed by a later event of the same user is emitted when
      that event arrives (closed by gap);
    - each user's LAST session is emitted iff its timer expired, i.e.
      session_end + gap ≤ max(ts) − watermark_delay; later finals stay in
      state when the bounded replay ends (their timers never fire) and are
      excluded from the oracle by the same predicate.

    State is O(1) per active user (one open session + one timer); the
    processor's per-batch work is a vectorized numpy boundary scan, no
    per-row Python.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the protobuf package "
            "(google.protobuf) for its state-server protocol; it is not "
            "installed in this image. Install protobuf (bundled with any "
            "real Spark 4 deployment) to run the transformWithState "
            "operators — the implementation below is complete and the "
            "replay harness is exercised by tests up to the gated point."
        )

    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = gap_minutes * 60_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )

    def _emit(user_id, start_us, last_us, n, vsum) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.to_datetime(start_us, unit="us")],
                "session_end": [pd.to_datetime(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [round(float(vsum), 6)],
            }
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.open = handle.getValueState(
                "open_session", "start long, last long, n long, vsum double"
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            frames = [pdf for pdf in rows if len(pdf)]
            if not frames:
                return
            (user_id,) = key
            pdf = pd.concat(frames, ignore_index=True).sort_values("ts")
            ts = pdf["ts"].to_numpy("datetime64[us]").astype("int64")
            vals = pdf["value"].to_numpy(np.float64)
            prior = tuple(self.open.get()) if self.open.exists() else None
            closed, open_now = merge_session_batch(ts, vals, prior, gap_us)
            for st, la, n, vs in closed:
                yield _emit(user_id, st, la, n, vs)
            st, la, n, vs = open_now
            self.open.update((st, la, n, vs))
            # single active timer per key at last+gap (event-time ms)
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(la // 1000 + gap_minutes * 60_000)

        def handleExpiredTimer(
            self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
        ):
            if self.open.exists():
                (user_id,) = key
                st, la, n, vs = self.open.get()
                self.open.clear()
                yield _emit(user_id, st, la, n, vs)

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB state store (runtime-settable;
    # the default HDFS-backed provider rejects the operator).
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from ..io import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    span_us = int((hi - lo).total_seconds() * 1_000_000) + 1
    replay_dir = tempfile.mkdtemp(prefix="tws_replay_")
    try:
        # time-ordered chunk files -> one micro-batch each (FileStreamSource
        # consumes oldest-modified first; chunks are written in ts order).
        # Each chunk is Spark-written to a staging dir, then its part file
        # is moved up as a PLAIN file: the file stream source lists data
        # FILES only and skips Spark's directory-shaped parquet output.
        import glob
        import os

        for i in range(chunks):
            a = lo + pd.Timedelta(microseconds=i * span_us // chunks)
            b = lo + pd.Timedelta(microseconds=(i + 1) * span_us // chunks)
            staging = f"{replay_dir}/_stage{i:02d}"
            ev.where((F.col("ts") >= F.lit(a)) & (F.col("ts") < F.lit(b))).coalesce(
                1
            ).write.parquet(staging)
            (part,) = glob.glob(f"{staging}/part-*.parquet")
            os.rename(part, f"{replay_dir}/chunk{i:02d}.parquet")
            shutil.rmtree(staging, ignore_errors=True)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp_ntz, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(replay_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        sessions = (
            stream.withWatermark("ts", f"{delay_minutes} minutes")
            .groupBy("user_id")
            .transformWithStateInPandas(
                SessionProcessor(),
                outputStructType=out_schema,
                outputMode="Append",
                timeMode="EventTime",
            )
        )
        out = run_stream_to_table(spark, sessions, mode="append")
        return out.select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "sum_value",
        )
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)


def run_stream_foreach_batch_idempotent(
    spark: SparkSession, streaming_df: DataFrame, out_dir: str
) -> list[int]:
    """Exactly-once file sink via foreachBatch: each micro-batch overwrites
    its OWN directory ``epoch=<batch_id>`` — Spark replays a failed batch
    under the SAME batch id, so a retry overwrites its partial output
    instead of appending a duplicate (the documented idempotent-foreachBatch
    recipe; the built-in file sink gets this from its commit log, but
    foreachBatch is what you use when the target is a JDBC table, a Delta
    MERGE, or any store needing custom write logic).

    Returns the processed batch ids. Bounded replay (availableNow) for
    tests; the function body is what a production continuous query runs.
    """
    import uuid as _uuid

    seen: list[int] = []

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={batch_id}")

    q = (
        streaming_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", f"{out_dir}/_checkpoint_{_uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return seen


def stream_to_delta(
    spark: SparkSession,
    streaming_df: DataFrame,
    table_path: str,
    app_id: str,
    checkpoint_dir: str | None = None,
    mode: str = "append",
    keys: list[str] | None = None,
    order_col: str | None = None,
) -> list[int]:
    """Exactly-once streaming → Delta sink via foreachBatch + the Delta
    protocol's `txn` handshake: every micro-batch commit records
    (app_id, batch_id); Spark replays a failed batch under the SAME id, and
    ``write_delta`` skips any batch the log already holds — so a crash
    between "data written" and "checkpoint advanced" cannot duplicate rows.
    This is the real recipe for streaming feature materialization into a
    lakehouse table (the built-in file sink's commit log gives the same
    guarantee for plain files; Delta gets it from txn actions).

    Bounded replay (availableNow) for tests; returns processed batch ids.

    The default checkpoint location is STABLE per (table, app_id):
    a fresh-random default would restart batch ids at 0 on the next
    invocation, and the txn skip (committed >= batch_id) would then
    silently drop every new batch — data loss reported as success. Pass
    ``checkpoint_dir`` explicitly only as the same-pairing it replaces.

    ``mode="upsert"`` (requires ``keys`` + ``order_col``): each micro-batch
    is reduced to its newest row per key (by ``order_col``, content-hash
    tie-break) and MERGEd with strictly-newer-wins semantics
    (lakehouse.merge_delta newer_wins_col) instead of appended. Because
    the conditional merge is order-independent, the table converges to the
    GLOBAL latest row per key even though the replay's micro-batches are
    file-ordered, not time-ordered — the streaming feature-materialization
    shape ("current value per entity"), with the same per-batch txn
    exactly-once guarantee.
    """
    from ..io.lakehouse import merge_delta, write_delta

    if mode not in ("append", "upsert"):
        raise ValueError(f"stream_to_delta: mode must be append|upsert, got {mode!r}")
    if mode == "upsert" and (not keys or not order_col):
        raise ValueError("stream_to_delta: upsert mode requires keys and order_col")

    seen: list[int] = []

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        if mode == "upsert":
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(
                F.col(order_col).desc(), F.xxhash64(*batch_df.columns).desc()
            )
            latest = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            merge_delta(
                batch_df.sparkSession,
                latest,
                table_path,
                keys=list(keys),
                txn=(app_id, batch_id),
                newer_wins_col=order_col,
            )
            return
        write_delta(
            batch_df.sparkSession,
            batch_df,
            table_path,
            mode="append",
            txn=(app_id, batch_id),
        )

    ckpt = checkpoint_dir or f"{table_path}/_checkpoint_{app_id}"
    q = (
        streaming_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return seen


def stream_to_iceberg(
    spark: SparkSession,
    streaming_df: DataFrame,
    table_path: str,
    app_id: str,
    checkpoint_dir: str | None = None,
    mode: str = "append",
    keys: list[str] | None = None,
    order_col: str | None = None,
) -> list[int]:
    """Exactly-once streaming → ICEBERG sink: foreachBatch + idempotent
    batch appends. Iceberg has no Delta-style `txn` action, so the
    handshake lives in the snapshot SUMMARY (the spec's free-form string
    map, preserved for a snapshot's whole lifetime):
    ``io.iceberg.write_iceberg_batch`` stamps each append with
    (app_id, batch_id) and SKIPS any batch a snapshot already carries —
    a micro-batch replayed after a crash between "data committed" and
    "checkpoint advanced" appends nothing twice. Same stable-checkpoint
    discipline as stream_to_delta (a fresh-random checkpoint default
    would reset batch ids and silently drop batches via the skip).

    Bounded replay (availableNow) for tests; returns processed batch ids.

    ``mode="upsert"`` (requires ``keys`` + ``order_col``): each micro-batch
    reduces to its newest row per key and MERGEs strictly-newer-wins
    (io.iceberg.merge_iceberg) instead of appending — the same
    order-independent convergence contract as stream_to_delta's upsert
    mode, with the batch-id handshake carried in the snapshot summary.
    """
    from ..io.iceberg import merge_iceberg, write_iceberg_batch

    if mode not in ("append", "upsert"):
        raise ValueError(f"stream_to_iceberg: mode must be append|upsert, got {mode!r}")
    if mode == "upsert" and (not keys or not order_col):
        raise ValueError("stream_to_iceberg: upsert mode requires keys and order_col")

    seen: list[int] = []

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        seen.append(batch_id)
        if mode == "upsert":
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(
                F.col(order_col).desc(), F.xxhash64(*batch_df.columns).desc()
            )
            latest = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn")
            )
            merge_iceberg(
                batch_df.sparkSession,
                latest,
                table_path,
                keys=list(keys),
                newer_wins_col=order_col,
                batch=(app_id, batch_id),
            )
            return
        write_iceberg_batch(
            batch_df.sparkSession, batch_df, table_path, app_id, batch_id
        )

    import os as _os

    ckpt = checkpoint_dir or _os.path.join(
        table_path, f"_checkpoint_{app_id}"
    )
    q = (
        streaming_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return seen


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — the workhorse streaming pattern: each incoming
    event is enriched against a STATIC (batch) dimension, here the user's
    historical profile (event count + lifetime exact-decimal value sum)
    precomputed from the same corpus. The static side needs no watermark
    and no state: Spark plans it as an ordinary (broadcast when small)
    join against each micro-batch, so the streaming state is zero — this
    is why reference-data enrichment belongs in a stream-static join, not
    a stream-stream one. Output: one enriched row per event above the
    user's historical mean."""
    from ..io import load_table

    batch = load_table(spark, sf_dir, "events")
    profile = batch.groupBy("user_id").agg(
        F.count("*").alias("n_hist"),
        F.expr(
            "cast(cast(sum(cast(value as decimal(30,8))) as string) as double)"
        ).alias("hist_sum"),
    )
    ev = _streaming_events(spark, sf_dir).select("event_id", "user_id", "value")
    enriched = ev.join(profile, "user_id").where(
        F.col("value") > F.col("hist_sum") / F.col("n_hist")
    )
    out = run_stream_to_table(
        spark,
        enriched.select("event_id", "user_id", "value", "n_hist", "hist_sum"),
        mode="append",
    )
    return out
