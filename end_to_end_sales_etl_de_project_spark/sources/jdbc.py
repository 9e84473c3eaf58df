"""JDBC dimension-table source (reference S2,
``/root/reference/src/utils/utility.py:51-60``).

The reference reads three MySQL dimension tables per run. The engine
keeps the same capability behind a thin wrapper; at scale the options
that matter are ``partitionColumn/lowerBound/upperBound/numPartitions``
(parallel range scans instead of one connection pulling the whole
table) and ``fetchsize``. No MySQL server ships in this environment,
but the code path executes FOR REAL against embedded Derby (on Spark's
own classpath): ``tests/test_jdbc_derby.py`` round-trips dims through
write+read including the range-partitioned path, and
``q91_jdbc_roundtrip`` oracle-checks it every driver round. MySQL is
the same wrapper plus its driver jar. Parquet dims remain the default
path (``sources/tables.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read one table over JDBC; range-partitioned when bounds given."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()
