"""Ordered-sequence operators: gaps-and-islands streaks and the
distributed sweep-line (two-level prefix sum).

Both exist because the naive SQL forms are sequential or quadratic:
``count(distinct) OVER`` / interval self-joins don't survive 100 TB,
and a single global ``SUM() OVER (ORDER BY t)`` is one sorted
partition. These decompositions compute identical numbers with bounded
per-partition work; ``tests/test_properties.py`` pins equivalence to
in-Python sequential references on random inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def streak_islands(
    days: DataFrame, key_col: str = "user_id", day_col: str = "d"
) -> DataFrame:
    """Collapse a distinct (key, day) table into one row per
    consecutive-day run: (key, anchor, streak_len).

    The island key ``day - row_number`` is constant exactly within a
    consecutive run. The window sorts each key's DAY rows (≤ calendar
    span), never the raw fact — callers must pass an already-distinct
    day table.
    """
    w = Window.partitionBy(key_col).orderBy(day_col)
    return (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", F.date_sub(F.col(day_col), F.col("rn")))
        .groupBy(key_col, "anchor")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )


def swept_peaks(
    pts: DataFrame,
    t_col: str = "t",
    delta_col: str = "delta",
    bucket_s: int = 3600,
) -> DataFrame:
    """Per-bucket PEAK of the running sum of +1/-1 sweep deltas —
    identical numbers to the sequential ``SUM(delta) OVER (ORDER BY t,
    delta ROWS UNBOUNDED PRECEDING)`` followed by a per-bucket MAX, but
    computed as a distributed two-level prefix sum:

    1. per-bucket delta totals, cumulated over the tiny bucket spine
       (the ONLY unpartitioned window, |buckets| rows);
    2. the within-bucket running sum, windowed per bucket partition.

    The global running value at any point is prior-buckets offset +
    within-bucket prefix, because time is monotone in (bucket, t).
    Ends sort before starts at equal t (delta asc) so touching
    intervals never double-count. Returns (bucket_s, peak) with the
    bucket column named ``hour_s`` for the default hour bucket.
    """
    bucket = (F.col(t_col) - F.col(t_col) % F.lit(bucket_s)).alias("hour_s")
    pts = pts.withColumn("hour_s", bucket)
    bucket_tot = pts.groupBy("hour_s").agg(F.sum(delta_col).alias("bucket_delta"))
    w_spine = Window.orderBy("hour_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bucket_tot.withColumn(
        "offset", F.sum("bucket_delta").over(w_spine) - F.col("bucket_delta")
    ).select("hour_s", "offset")
    w_in = (
        Window.partitionBy("hour_s")
        .orderBy(t_col, delta_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("run", F.sum(delta_col).over(w_in))
        .join(F.broadcast(offsets), "hour_s")
        .withColumn("live", F.col("run") + F.col("offset"))
        .groupBy("hour_s")
        .agg(F.max("live").cast("bigint").alias("peak_concurrency"))
    )
