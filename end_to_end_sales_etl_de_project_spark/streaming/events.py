"""Structured Streaming over the events table.

The reference is batch-by-cron with a hand-rolled exactly-once ledger
(``/root/reference/src/staging/staging.py:51-113``, SURVEY §2.9) and
lists "real-time processing with Kafka" as an unchecked future
enhancement (``README.md:258``). This module is that future, done the
Spark way: file-source streams with checkpointed exactly-once progress
(the ledger becomes the checkpoint), watermarked event-time windows for
late data, and native session windows.

The aggregation bodies are shared with the batch plans
(``plans/events.py``) — same groupBy expressions — and a test pins
batch ≡ streaming on the same input.

Scale notes: watermark bounds state (late rows beyond it are dropped);
``maxFilesPerTrigger`` bounds per-batch work during backfill; state
store is RocksDB-able via conf on a real cluster — nothing here is
local-mode-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.functions.scalar import money


def read_events_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-source stream over an events parquet directory.

    Schema is taken from a batch peek (explicit schema is mandatory for
    streaming sources); the nanosecond `ts` is read as long and
    truncated to microseconds exactly as the batch loader does.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(src_dir)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # µs-NTZ parquet (e.g. written by other engines): interpret as
        # UTC instants — watermarks require TIMESTAMP (LTZ).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour counts per event type (streaming twin
    of ``e01_tumbling_hourly``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked sliding 1h/30m window (twin of e02)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Watermarked per-user session windows (twin of e03)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a streaming aggregation over all currently-available input
    synchronously and return the sink table as a DataFrame (test/smoke
    harness; production sinks are parquet/kafka via ``writeStream``)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def start_checkpointed_ingestion(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Exactly-once file ingestion: stream parquet files from ``src_dir``
    into ``dest_dir`` with progress tracked in ``checkpoint_dir``.

    This replaces the reference's entire staging-table state machine
    (START/COMPLETED rows, crash check, idempotency filter —
    ``src/staging/staging.py``): already-committed files are never
    reprocessed across restarts, partially-processed batches replay —
    the same guarantees, from the checkpoint log instead of hand-rolled
    SQL. Returns the started StreamingQuery; callers stop it.
    """
    events = read_events_stream(spark, src_dir, max_files_per_trigger)
    return (
        events.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup by event_id with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps each id's state only until
    the watermark passes it — the streaming twin of the batch exact
    dedup (``operators/dedup.py``): re-delivered events (at-least-once
    sources) are emitted once, and state does not grow with the stream.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
