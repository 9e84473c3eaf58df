"""Streaming pipeline capstone: checkpointed ingestion + dedup +
broadcast enrichment + additive mart folds, surviving restart,
redelivery, and a crash between the fold's two renames — the streaming
form of the reference's whole staging-table architecture."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.sources.tables import load_table
from end_to_end_sales_etl_de_project_spark.streaming.pipeline import (
    batch_equivalent_mart,
    run_streaming_pipeline,
)

from tests.test_streaming import events_src, tmpdir  # noqa: F401  (fixtures)


def _user_dim(spark, events):
    """Deterministic user dimension covering MOST users — the uncovered
    remainder pins the left-join (orphan events must keep a null
    segment, not vanish)."""
    return (
        events.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 7 != 0)
        .withColumn("segment", F.concat(F.lit("seg-"), F.col("user_id") % 3))
    )


def _mart_rows(spark, mart_path):
    return {
        (r.user_id, r.segment, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(mart_path).collect()
    }


def test_pipeline_restart_redelivery_and_crash(spark, sf_dir, events_src, tmpdir):  # noqa: F811
    events = load_table(spark, sf_dir, "events")
    dim = _user_dim(spark, events)
    mart, ckpt = f"{tmpdir}/mart", f"{tmpdir}/ckpt-pipeline"

    # run 1: ingest the landing zone
    q = run_streaming_pipeline(spark, events_src, dim, mart, ckpt)
    q.processAllAvailable()
    q.stop()

    expected = {
        (r.user_id, r.segment, r.event_type): (r.n_events, r.total_value)
        for r in batch_equivalent_mart(events, dim).collect()
    }
    assert _mart_rows(spark, mart) == expected

    # orphan users really flow through with null segment
    assert any(seg is None for (_, seg, _) in expected)

    # crash window: the next fold's swap died between its two renames
    os.rename(mart, mart + ".bak")

    # run 2 (restart, same checkpoint): the whole landing file is
    # REDELIVERED — at-least-once source behavior
    shutil.copy(f"{events_src}/events-000.parquet", f"{events_src}/events-dup.parquet")
    q = run_streaming_pipeline(spark, events_src, dim, mart, ckpt)
    q.processAllAvailable()
    q.stop()

    # mart healed from .bak, duplicates all dropped: totals unchanged
    assert _mart_rows(spark, mart) == expected
    assert not os.path.exists(mart + ".bak")
