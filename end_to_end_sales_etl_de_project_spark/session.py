"""SparkSession factory.

Reference parity: ``src/utils/utility.py:27-49`` builds a ``local[*]``
session with s3a + MySQL jars. Here the session is tuned for the engine's
execution model instead:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — the knob that makes one logical plan
  survive a 100x scale-up.
- ``spark.sql.shuffle.partitions`` sized to cores for local runs; on a
  real cluster AQE coalesces from this initial number, so a higher
  initial value is safe.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  (and are deployment-independent).
- Arrow enabled for any Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark_session(
    app_name: str = "end_to_end_sales_etl_de_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` and set ``MASTER`` via
    spark-submit instead — every other conf here is cluster-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = max(os.cpu_count() or 8, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Spark 4 defaults ANSI on: x/0 THROWS where DuckDB yields NULL —
        # both a crash on legitimate data (empty doc → word_count 0) and a
        # cross-engine divergence. Hive-style NULL semantics match the
        # oracle; load_table pins this too for driver-owned sessions.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
