"""Sinks: parquet (plain + partitioned) and JDBC append.

Reference parity (SURVEY §2.1 S5-S7, ``/root/reference/src/load/
write.py`` + ``src/utils/utility.py:63-77``), with its bugs fixed by
construction:

- the ``.save().partitionBy()`` ordering crash (write.py:27-46, dead
  code) cannot be expressed here;
- the JDBC writer that swallowed exceptions and returned an error
  string in a set (utility.py:76-77) is replaced by fail-loud writes.

Timestamped output directories reproduce the reference's
``<dir>/<ts>/`` layout (write.py:8-10) but take the timestamp as an
argument — writers are deterministic; clocks belong to the caller.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    timestamp: str | None = None,
    compact_partitions: bool = True,
) -> str:
    """Write parquet, optionally Hive-partitioned. Returns the final
    path. Partitioning by low-cardinality keys (e.g. sales_month,
    store_id — reference main_1.py:524-529) gives downstream partition
    pruning for free.

    ``compact_partitions`` repartitions on the partition keys before a
    partitioned write: without it every upstream task emits a file into
    every leaf it touches (measured 4x file blowup at 200k rows; at
    cluster scale it's tasks x leaves — the canonical small-files
    failure). One shuffle buys one file per leaf. Disable only when a
    single leaf exceeds a comfortable file size and you want multiple
    writers per leaf.
    """
    if timestamp:
        path = os.path.join(path, timestamp)
    if partition_by and compact_partitions:
        df = df.repartition(*partition_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    mode: str = "append",
) -> None:
    """JDBC append (reference utility.py:63-77). Fails loudly — any
    exception propagates to the orchestrator, which leaves the ledger
    in START so the crash check catches the next run."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})
