"""Processing ledger: the reference's staging/audit table as DataFrame
operations over a parquet table.

Reference behavior (``/root/reference/src/staging/staging.py`` +
``src/main_1.py:45-86``): a MySQL table
``(file_name, file_location, created_date, status)`` with status in
{START, COMPLETED}; three operations — crash check (any file stuck in
START ⇒ abort), idempotency filter (COMPLETED files are skipped),
insert START / update COMPLETED. Cursor SQL with f-string interpolation
(an injection wart, staging.py:42) and a None-return bug on the empty
case (main_1.py:242-247) — both fixed here by construction.

Implementation: an append-only parquet event log; current state =
latest event per file (window by event time). Append-only makes every
transition atomic at the file level (no read-modify-write), which is
exactly what object stores give you at scale; compaction is a normal
maintenance job. For streaming ingestion the same guarantees come from
Structured Streaming checkpoints (``streaming/events.py``) — this
ledger is the batch-mode equivalent.
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from end_to_end_sales_etl_de_project_spark.config import STATUS_COMPLETED, STATUS_START

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("file_location", T.StringType()),
        T.StructField("created_date", T.TimestampType()),
        T.StructField("status", T.StringType()),
        T.StructField("seq", T.LongType()),  # monotonic per append batch
    ]
)


class Ledger:
    """Parquet-backed append-only processing ledger."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- reads ---------------------------------------------------------

    def _recover(self) -> None:
        """A compact() that died between its two renames leaves the log
        only in .bak; without this restore, events() would return an
        empty frame and the crash check + idempotency filter would
        silently wave through double-processing."""
        bak = self.path + ".bak"
        if not os.path.exists(self.path) and os.path.exists(bak):
            os.rename(bak, self.path)

    def events(self) -> DataFrame:
        self._recover()
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)

    def current_state(self) -> DataFrame:
        """Latest status per file_name (window top-1 by seq; equal-seq
        ties — possible only in pre-fix ledgers — resolve to COMPLETED,
        the safe direction for idempotency)."""
        w = Window.partitionBy("file_name").orderBy(F.col("seq").desc(), F.col("status").asc())
        return (
            self.events()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def stuck_in_start(self, file_names: list[str] | None = None) -> list[str]:
        """Crash check (main_1.py:45-86): files whose latest status is
        START. A non-empty result means a previous run died mid-flight.

        ``file_names=None`` checks the WHOLE ledger — the correct scope
        for a pipeline preflight: a crashed run may have already
        archived its inputs out of the landing dir, so filtering by
        currently-present files would wave the crash through."""
        state = self.current_state().filter(F.col("status") == STATUS_START)
        if file_names is not None:
            if not file_names:
                return []
            state = state.filter(F.col("file_name").isin(file_names))
        return sorted(r["file_name"] for r in state.select("file_name").collect())

    def split_processed(self, file_names: list[str]) -> tuple[list[str], list[str]]:
        """Idempotency filter (staging.py:51-113): returns
        (to_process, already_completed). Always returns two lists —
        never None (the reference's empty-case bug)."""
        if not file_names:
            return [], []
        completed = {
            r["file_name"]
            for r in self.current_state()
            .filter(
                F.col("file_name").isin(file_names)
                & (F.col("status") == STATUS_COMPLETED)
            )
            .select("file_name")
            .collect()
        }
        to_process = [f for f in file_names if f not in completed]
        done = [f for f in file_names if f in completed]
        return to_process, done

    # -- writes --------------------------------------------------------

    def _max_seq(self) -> int | None:
        """Max existing seq from parquet FOOTER statistics — O(files)
        driver-side metadata reads instead of a Spark job scanning
        every append (the control-plane cost that grew per append;
        compact() still bounds file count for long-lived ledgers).
        Falls back to the full scan if any footer lacks seq stats."""
        self._recover()
        if not os.path.exists(self.path):
            return None
        try:
            import pyarrow.parquet as pq

            mx: int | None = None
            for name in os.listdir(self.path):
                if not name.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(self.path, name)).metadata
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["seq"]
                for rg in range(md.num_row_groups):
                    stats = md.row_group(rg).column(idx).statistics
                    if stats is None or not stats.has_min_max:
                        raise ValueError(f"no seq stats in {name}")
                    mx = stats.max if mx is None else max(mx, stats.max)
            return mx
        except Exception:
            return self.events().agg(F.max("seq")).collect()[0][0]

    def _append(self, records: list[tuple[str, str, str]]) -> None:
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        # seq must be strictly monotonic per ledger even across clock
        # steps (NTP backwards jump, sub-quantum appends) — otherwise
        # current_state's latest-event ranking could tie/flip between a
        # START and its COMPLETED. Anchor on max(existing)+1.
        clock_us = int(_dt.datetime.now(_dt.timezone.utc).timestamp() * 1_000_000)
        prev = self._max_seq()
        seq = max(clock_us, (prev or 0) + 1)
        rows = [
            (name, loc, now, status, seq + i)
            for i, (name, loc, status) in enumerate(records)
        ]
        df = self.spark.createDataFrame(rows, LEDGER_SCHEMA)
        # one file per append batch: tiny control-plane writes must not
        # fan out into per-partition files
        df.coalesce(1).write.mode("append").parquet(self.path)

    def mark_start(self, files: dict[str, str]) -> None:
        """files: name → location. Reference staging.py:13-28."""
        if files:
            self._append([(n, loc, STATUS_START) for n, loc in files.items()])

    def mark_completed(self, file_names: list[str]) -> None:
        """Reference staging.py:31-48 (UPDATE → append here)."""
        if file_names:
            self._append([(n, "", STATUS_COMPLETED) for n in file_names])

    # -- maintenance ---------------------------------------------------

    def compact(self) -> int:
        """Fold the append-only event log down to one event per file
        (the latest). Routine maintenance for long-lived ledgers —
        state reads stay O(live files) instead of O(all appends).
        Returns the number of retained rows. The swap is two renames
        (live→backup, compacted→live) — the unreadable window is a
        single rename, not a delete+rewrite; a crash between them is
        healed automatically by ``_recover()`` (the backup is renamed
        back on the next read), never leaving an empty ledger that
        would wave through double-processing."""
        import shutil as _shutil

        self._recover()
        state = self.current_state().collect()
        tmp = self.path + ".compact"
        bak = self.path + ".bak"
        self.spark.createDataFrame(state, LEDGER_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        _shutil.rmtree(bak, ignore_errors=True)
        os.rename(self.path, bak)
        os.rename(tmp, self.path)
        _shutil.rmtree(bak)
        return len(state)


def temp_ledger_path(base_dir: str) -> str:
    return os.path.join(base_dir, f"ledger-{uuid.uuid4().hex[:8]}")
