"""Streaming-native pipeline capstone: the reference's entire batch
architecture — staging-table exactly-once, dedup, dimension enrichment,
mart maintenance (``/root/reference/src/main_1.py:683-837``, SURVEY
§3.1) — as ONE continuously-running composition of the engine's
streaming pieces:

    file stream  →  dedup_stream  →  broadcast dim join  →  foreachBatch
    (checkpoint)    (bounded state)   (stream-static)        additive fold
                                                             into the mart

Guarantee stack, and where each layer comes from:

- **File-level exactly-once** — the checkpoint replaces the reference's
  START/COMPLETED ledger: committed files never re-enter, in-flight
  batches replay on restart (``streaming/events.py``).
- **Row-level dedup** — ``dropDuplicatesWithinWatermark`` on event_id
  absorbs at-least-once redelivery with watermark-bounded state.
- **Mart-level idempotent folds** — replayed epochs are no-ops via the
  epoch marker inside the mart dir; the swap heals its own crash
  window (``streaming/materialized.fold_additive_batch``).

Scale notes: the dim side of the enrichment join is broadcast (bounded
dimension, the reference's J1-J3 shape); per-batch state is the
micro-batch + one bounded mart read; nothing accumulates beyond the
watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
)
from end_to_end_sales_etl_de_project_spark.streaming.materialized import (
    fold_additive_batch,
)

MART_KEYS = ["user_id", "segment", "event_type"]


def enrich_events(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static (or batch-batch — same body, the batch≡stream test
    relies on it) enrichment join onto the user dimension.
    Left join: an event from a user missing in the dim must survive
    with a null segment, not vanish (the reference's inner joins
    silently dropped orphan facts — a known wart, not parity worth
    keeping).

    No forced broadcast (VERDICT r5 #1): a user dimension scales with
    the user base, so the hint is an OOM at the 100 TB design point;
    statistics pick broadcast while the projected dim fits the 64 MB
    threshold (it does at every test SF) and a shuffled stream-static
    join once it doesn't."""
    dim = user_dim.select("user_id", "segment")
    return events.join(dim, "user_id", "left")


def run_streaming_pipeline(
    spark: SparkSession,
    events_src: str,
    user_dim: DataFrame,
    mart_path: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = 1,
):
    """Start the composed pipeline; returns the StreamingQuery (callers
    drive it with processAllAvailable()/stop() or leave it running)."""
    stream = read_events_stream(spark, events_src, max_files_per_trigger)
    clean = dedup_stream(stream, watermark)
    enriched = enrich_events(clean, user_dim)

    def fold(batch: DataFrame, epoch_id: int) -> None:
        fold_additive_batch(
            batch.sparkSession, mart_path, batch, epoch_id, key_cols=MART_KEYS
        )

    return (
        enriched.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def batch_equivalent_mart(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """The batch answer the streaming mart must converge to on the same
    input: exact dedup by event_id, same enrichment, same additive
    aggregate — used by tests to pin stream ≡ batch."""
    from end_to_end_sales_etl_de_project_spark.functions.scalar import money

    deduped = events.dropDuplicates(["event_id"])
    return (
        enrich_events(deduped, user_dim)
        .groupBy(*MART_KEYS)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )
