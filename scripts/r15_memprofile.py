"""Reproduce the driver's 50-query verify loop and profile host memory
(VERDICT r14 #1): one Spark session, every DRIVER_WINDOW query run
through the same oracle-parity comparison the driver performs, logging
after each query:

- RSS of the Python driver process and of the Spark JVM (the
  ``SparkSubmit`` child), plus every live pyspark.daemon worker;
- the block manager's storage footprint (memory + disk bytes used)
  via the SparkContext status API;
- the number of live persisted RDDs (``sc._jsc.getPersistentRDDs``).

The r14 cascade failed DuckDB 16 KB allocations from window entry 11
onward — host memory exhaustion accumulating across the verify session.
This script is the measurement for any checkpoint-lifecycle fix: run it
before and after, compare the final/peak rows.

Usage:
  python scripts/r15_memprofile.py [--sf DIR] [names...]
    (default: all DRIVER_WINDOW names at /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _proc_children(match: str) -> list[int]:
    pids = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if match in cmd:
            pids.append(int(d))
    return pids


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        args.pop(0)
        sf_dir = args.pop(0)

    import __spark_entry__ as E
    from end_to_end_sales_etl_de_project_spark.plans.registry import DRIVER_WINDOW
    from end_to_end_sales_etl_de_project_spark.session import get_spark_session
    from end_to_end_sales_etl_de_project_spark.testing import (
        compare_spark_to_oracle,
        duckdb_connection,
        run_oracle,
    )

    names = args or list(DRIVER_WINDOW)
    spark = get_spark_session(
        app_name="r15-memprofile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext
    con = duckdb_connection(sf_dir)
    queries, oracles = E.queries(), E.oracle_sql()

    me = os.getpid()
    jvm_pids = _proc_children("SparkSubmit") or _proc_children("org.apache.spark")

    def storage_bytes() -> tuple[int, int, int]:
        """(n persisted RDDs, storage memory bytes, storage disk bytes)."""
        jmap = sc._jsc.getPersistentRDDs()
        n = jmap.size()
        mem = disk = 0
        status = sc._jvm.org.apache.spark.storage.StorageUtils
        try:
            infos = sc._jsc.sc().getRDDStorageInfo()
            for info in infos:
                mem += info.memSize()
                disk += info.diskSize()
        except Exception:
            pass
        _ = status
        return n, mem, disk

    print(
        "idx,name,match,py_rss_mb,jvm_rss_mb,workers_rss_mb,n_workers,"
        "n_persisted,storage_mem_mb,storage_disk_mb"
    )
    failures = 0
    for i, name in enumerate(names):
        ok = "-"
        if name in oracles:
            r = compare_spark_to_oracle(
                name, queries[name](spark, sf_dir), run_oracle(con, oracles[name])
            )
            ok = "PASS" if r.match else "FAIL"
            failures += 0 if r.match else 1
        else:
            queries[name](spark, sf_dir).collect()
            ok = "ROWS"
        workers = _proc_children("pyspark.daemon")
        w_rss = sum(_rss_kb(p) for p in workers)
        n_rdd, s_mem, s_disk = storage_bytes()
        print(
            f"{i},{name},{ok},{_rss_kb(me) // 1024},"
            f"{sum(_rss_kb(p) for p in jvm_pids) // 1024},"
            f"{w_rss // 1024},{len(workers)},{n_rdd},"
            f"{s_mem // (1 << 20)},{s_disk // (1 << 20)}",
            flush=True,
        )
    print(f"# failures={failures}")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
