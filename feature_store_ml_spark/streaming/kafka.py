"""Kafka-style streaming source wiring — SURVEY.md §2B E13 stretch.

The reference has no streaming surface at all; this exists for the 100 TB
north star, where the events table arrives as a Kafka topic rather than
parquet replay. The container ships no spark-sql-kafka jar, so the source is
behind an explicit availability probe: `kafka_available()` / a loud
RuntimeError at build time, never a confusing DATA_SOURCE_NOT_FOUND deep in
an action.

Design: the Kafka-specific part is ONLY `readStream.format("kafka")` plus
key/value deserialization. Everything downstream (watermark, windowed aggs,
stateful EWMA) is shared verbatim with streaming.events — the parse stage
`parse_event_json` is a pure DataFrame→DataFrame function, so it is unit
tested on a batch frame without any broker, and the streaming twin is
parity-by-construction (same pattern as events.windowed_counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The JSON wire schema for one event on the topic. `ts` travels as epoch
# micros (Kafka messages should never carry raw nanos: the parquet nanos
# quirk is a property of this corpus' files, not of the wire format).
EVENT_WIRE_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, "
    "value double, props string"
)


def kafka_available(spark: SparkSession) -> bool:
    """True iff the spark-sql-kafka data source is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def parse_event_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Deserialize a Kafka `value` (binary JSON) column into typed event
    rows. Pure column expressions — works identically on a streaming frame
    from the Kafka source and a batch frame in tests.

    Malformed messages surface as NULL event_id rows (from_json is
    PERMISSIVE) and are filtered — at 100 TB a poison message must not kill
    the query; route `_corrupt`s to a dead-letter sink instead if they must
    be audited."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), EVENT_WIRE_SCHEMA).alias("e")
    )
    return (
        parsed.select("e.*")
        .where(F.col("event_id").isNotNull())
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )


def read_kafka_events(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming events source from a Kafka topic.

    `max_offsets_per_trigger` is the backpressure knob — at production volume
    an unbounded first micro-batch (reading the whole topic backlog) is the
    classic first-deploy outage; cap it so batch size stays proportional to
    cluster capacity."""
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka is not on the classpath; add the "
            "org.apache.spark:spark-sql-kafka-0-10 package (matching your "
            "Spark version) via spark.jars.packages, or use "
            "streaming.events for file-replay sources"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        # never silently drop a whole partition's history on broker GC
        .option("failOnDataLoss", "true")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_event_json(reader.load())
