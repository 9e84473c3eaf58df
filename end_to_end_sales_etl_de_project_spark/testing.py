"""Oracle-differential comparison harness (SURVEY §5 strategy #1).

Mirrors the driver's check: run the Spark plan and the DuckDB oracle SQL
on the same parquet, then compare row count + schema + order-insensitive
values. Values are canonicalized (columns sorted by name, rows sorted by
canonical repr) so physical ordering never matters; floats are compared
exactly — the engine's decimal-sum discipline makes aggregates
bit-identical across engines, so any inexactness is a bug, not noise.
"""

from __future__ import annotations

import datetime as _dt
import math
import tempfile
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from end_to_end_sales_etl_de_project_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with every catalog table registered as a
    view over the same parquet Spark reads.

    Memory is EXPLICITLY bounded with a disk spill directory: DuckDB's
    default budget assumes it owns the machine, but here it always
    shares it with a Spark JVM — under a full test-suite run the
    allocator intermittently failed outright ("Failed to allocate
    block ... bad allocation") on the recursive-closure oracles, which
    surfaced as the round-8 c-family "parity flake" (2-of-6 suite
    runs; the hash itself never mismatched). A bounded budget makes
    DuckDB spill instead of racing the JVM for malloc."""
    con = duckdb.connect()
    con.execute("SET memory_limit='4GB'")
    con.execute(f"SET temp_directory='{tempfile.gettempdir()}/duckdb_spill'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if isinstance(v, pd.Timestamp) and v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    # DuckDB .df() materializes LIST columns as numpy arrays above a
    # size threshold (python lists below it) — canonicalize both forms
    if type(v).__module__ == "numpy" and hasattr(v, "tolist"):
        inner = v.tolist()
        if isinstance(inner, list):
            return "[" + ",".join(_canon_value(x) for x in inner) + "]"
        return _canon_value(inner)
    return repr(v)


def _canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    match: bool
    mismatches: list[str] = field(default_factory=list)

    def __bool__(self) -> bool:
        return self.match


def compare_spark_to_oracle(
    name: str, spark_df: DataFrame, oracle_df: pd.DataFrame, max_report: int = 5
) -> CompareResult:
    sp = spark_df.toPandas()
    problems: list[str] = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"schema mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
    if len(sp) != len(oracle_df):
        problems.append(f"row count: spark={len(sp)} oracle={len(oracle_df)}")
    if not problems:
        srows, orows = _canon_rows(sp), _canon_rows(oracle_df)
        if srows != orows:
            sset, oset = set(srows), set(orows)
            only_s = list(sset - oset)[:max_report]
            only_o = list(oset - sset)[:max_report]
            problems.append(f"values differ: spark-only={only_s} oracle-only={only_o}")
    return CompareResult(
        name=name,
        spark_rows=len(sp),
        oracle_rows=len(oracle_df),
        match=not problems,
        mismatches=problems,
    )


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    """Execute an oracle, riding out transient allocation failures.

    Under a full test-suite run this python process (DuckDB + pandas +
    Arrow buffers) shares a tight memory cgroup with the Spark JVM and
    DuckDB's ``bad allocation`` OOM is a race, not a real budget
    problem — even a bounded buffer manager can lose a 32 KB malloc at
    the wrong moment (the round-8 "c-family flake"). On OOM: collect
    python garbage, halve DuckDB's budget so it spills harder, and
    retry; the tightest attempt runs the recursive-closure oracles in
    well under 1 GB. Any other error propagates untouched."""
    import gc
    import time

    budgets = (None, "1GB", "512MB")
    for i, budget in enumerate(budgets):
        try:
            if budget is not None:
                gc.collect()
                con.execute(f"SET memory_limit='{budget}'")
                time.sleep(1.0)
            return con.execute(sql).df()
        except duckdb.OutOfMemoryException:
            if i == len(budgets) - 1:
                raise
    raise AssertionError("unreachable")
