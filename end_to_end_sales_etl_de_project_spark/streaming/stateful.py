"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful processing; this is the engine's
extension point for operators Spark's built-in windows can't express
(SURVEY §7 step 8). The example operator maintains per-user lifetime
counters (event count, value sum, last-seen timestamp) across
micro-batches and emits the updated profile each time a user appears —
a CDC-style running rollup.

State is partitioned by the group key, so it scales horizontally with
executors; per-group state is O(1). Timeouts evict idle users.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user lifetime rollup, updated per micro-batch.

    ``events`` must be a streaming DataFrame with (user_id, ts, value).

    The update function is defined as a closure so cloudpickle ships it
    BY VALUE to executor Python workers — a module-level function would
    be pickled by reference and require this package on every worker's
    PYTHONPATH (true of all Pandas-UDF-backed operators in this engine).
    """

    def update_user_profile(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import pandas as pd  # noqa: F811 — resolved on the worker

        (user_id,) = key
        # money accumulates as integer CENTS in state — a float running
        # total would drift across millions of micro-batches and diverge
        # from the exact decimal rollups elsewhere in the engine
        n, total_cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int((pdf["value"] * 100).round().astype("int64").sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, total_cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
