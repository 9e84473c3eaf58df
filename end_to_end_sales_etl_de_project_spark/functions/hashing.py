"""Portable 60-bit hash: identical in Spark and DuckDB.

The dedup/fingerprint operators need a hash both engines compute
bit-identically so every stage (minhash, banding, simhash) is
oracle-checkable. ``xxhash64``/``hash`` differ across engines; md5 is
standardized. We take the first 15 hex chars (60 bits — fits a signed
64-bit int without overflow) and parse as an integer:

- Spark:  ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to bigint
- DuckDB: ``CAST(('0x' || substr(md5(x), 1, 15)) AS UBIGINT)::BIGINT``

Verified equal across engines including UTF-8 inputs. At 100 TB this is
still the right shape: md5 is computed JVM-side inside codegen, no
Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column | str) -> Column:
    """Spark-side 60-bit md5 hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h60_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: hash of ``value || '#seed'`` — one independent
    hash family member per seed (minhash permutations)."""
    c = F.col(col) if isinstance(col, str) else col
    return h60(F.concat(c, F.lit(f"#{seed}")))


def h60_sql(expr: str) -> str:
    """DuckDB SQL snippet computing the same hash of ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT)::BIGINT"


def h60_seeded_sql(expr: str, seed: int) -> str:
    return h60_sql(f"({expr} || '#{seed}')")
