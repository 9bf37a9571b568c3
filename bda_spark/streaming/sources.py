"""Streaming tick sources (SURVEY.md §2.1 S1/S2/S8, §2.8 F2, §2.9 T9).

Production source is Kafka (reference:
Deliverable_3/stream_from_kafka_to_cassandra.py:35-45,
NEW_train_offset_3_10min.py:94-105); tests and local runs replay the
same JSON tick records from a directory of text files. Both paths go
through ONE decode function (CAST value AS STRING -> from_json ->
data.*), so a file replay exercises exactly the production plan.

Rate control uses ``maxOffsetsPerTrigger`` — the Structured Streaming
knob; the reference set legacy DStream backpressure confs that are
no-ops under Structured Streaming (reference: joined_streams.py:16-18,
SURVEY §2.9 T9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TICK_SCHEMA


def decode_ticks(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S2/F2: JSON value bytes -> typed tick columns via the fixed
    13-field schema. Malformed records decode to an all-null struct
    (PERMISSIVE mode) and are dropped by the ingest gate
    (functions.cleaning.validate_ticks), not by a crash."""
    return (
        raw.select(F.col(value_col).cast("string").alias("json"))
        .select(F.from_json(F.col("json"), TICK_SCHEMA).alias("data"))
        .select("data.*")
    )


def encode_ticks(ticks: DataFrame, key_col: str | None = "symbol") -> DataFrame:
    """Inverse of ``decode_ticks``: typed tick columns -> Kafka record
    frame (key, value), value = ``to_json(struct(<13 tick fields>))``
    in schema order — JVM-side, the D1 discipline (the reference's
    producers built the JSON in Python per record,
    yfinance_stream.py:89-108). Keying by symbol makes Kafka hash every
    symbol's records to one partition, preserving per-symbol order for
    downstream consumers — the property the reference's dual-topic
    split (one topic per feed) was approximating."""
    value = F.to_json(
        F.struct(*[F.col(f.name) for f in TICK_SCHEMA.fields])
    ).alias("value")
    if key_col is None:
        return ticks.select(value)
    return ticks.select(F.col(key_col).cast("string").alias("key"), value)


def write_tick_stream(
    ticks: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = "symbol",
    available_now: bool = False,
    processing_time: str | None = None,
):
    """S12 producer twin of ``kafka_tick_stream``: encode the typed
    tick stream and publish it to a Kafka topic through Spark's own
    exactly-once-per-checkpoint streaming sink (replaces the
    reference's driver-side KafkaProducer loops,
    yfinance_stream.py:89-108 / xtb_stream.py:91-105 — per-record
    Python sends with no checkpointing, so a crashed producer replayed
    or dropped arbitrary spans). Returns the StreamingQuery. Not
    exercisable in the broker-less test container; the env-gated
    round-trip test (tests/test_kafka_integration.py) verifies
    produce -> consume ≡ the file twin wherever a broker exists."""
    writer = (
        encode_ticks(ticks, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def write_ticks_batch(
    ticks: DataFrame,
    brokers: str,
    topic: str,
    key_col: str | None = "symbol",
) -> None:
    """Batch flavor of the producer: land a finite tick frame (a
    backtest capture, a generator run) on a topic in one job — the
    shape the reference's simulated feeds used a Python send-loop for
    (yfinance_stream.py:118-139)."""
    (
        encode_ticks(ticks, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )


def kafka_tick_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1: Kafka source -> decoded ticks. Not exercisable in the test
    container (no broker / kafka package); the decode plan it feeds is
    covered by the file-replay twin below."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return decode_ticks(reader.load())


def file_replay_tick_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka stand-in: stream JSON-lines files from a directory (each
    line = one Kafka record value). ``maxFilesPerTrigger`` is the
    file-source analog of maxOffsetsPerTrigger."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return decode_ticks(reader.text(directory))


def read_csv_ticks(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a captured tick stream from CSV with the explicit
    13-field schema — the reference lands whole Kafka topics as exactly
    this shape for offline analysis (reference:
    Deliverable_3/kafka_messages.csv — header
    ``symbol,timestamp,...,trading_activity``). Explicit schema (no
    inferSchema pass over the files), header row skipped, malformed
    lines become all-null rows (PERMISSIVE) and are dropped by the same
    ingest gate as every other tick path
    (functions.cleaning.validate_ticks) — CSV is just a third encoding
    in front of the one decode/validate pipeline."""
    return (
        spark.read.schema(TICK_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def csv_replay_tick_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``read_csv_ticks``: replay captured CSV files
    through Structured Streaming, so a historical capture can drive the
    same TickPipeline a live Kafka feed does (backtesting shape)."""
    reader = spark.readStream.schema(TICK_SCHEMA).option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(directory)


def dedup_ticks_within_watermark(
    ticks: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Exactly-once tick semantics under at-least-once delivery: drop
    records repeating a (symbol, timestamp) key within the watermark
    horizon — Kafka redelivery and replayed files produce exactly such
    duplicates (the reference's consumers would double-count them,
    NEW_train_offset_3_10min.py ingests raw). ``dropDuplicatesWithinWatermark``
    holds O(keys seen per watermark window) state instead of the
    unbounded all-time key set plain ``dropDuplicates`` would keep —
    the only dedup shape that survives an infinite stream."""
    from ..functions.timeutils import event_time_from_millis

    return (
        ticks.withColumn("event_time", event_time_from_millis("timestamp"))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["symbol", "timestamp"])
    )


def console_sink(df: DataFrame, mode: str = "append", available_now: bool = False):
    """S8: debug console sink (reference: stream_preprocessing.ipynb
    cells 5,8). ``available_now=True`` drains the source once and stops
    (deterministic debugging replay)."""
    writer = df.writeStream.outputMode(mode).format("console")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
