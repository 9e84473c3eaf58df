"""Driver-side construction audit: fresh-vs-reused cost per query.

The round-9 lesson (PERF.md): a query's bench time is construction
(Python Column building over py4j + Catalyst analysis + any eager
artifact work) PLUS execution, and the construction half is invisible
to plan inspection and to `count()`-style probes (column pruning can
optimize the expensive expressions away). This script separates the
two for every headline query:

- `construct` = time to CALL the registered query function (fresh
  DataFrame; includes py4j tree building, relation resolution, and any
  deliberate eager work such as iterative component resolution or
  measured writes),
- `exec` = time to re-save the SAME DataFrame to the noop sink
  (pure execution; plan already built).

A large construct/exec ratio is a lead, not a verdict — c01/d06
construct-heavy by design (the resolution loop IS the stage), while
a08-style py4j chatter and per-call footer re-reads were real waste
(fixed r9: expression strings, the load_table memo).

Usage:
    python scripts/construct_audit.py [sf_dir]   # default sf0.1
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench
    from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES
    from end_to_end_sales_etl_de_project_spark.session import get_spark_session

    spark = get_spark_session(
        app_name="construct-audit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    rows: list[tuple[float, float, str]] = []
    for name in bench.HEADLINE:
        if name not in QUERIES:
            continue
        try:
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()  # warm artifacts + py4j
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            te = time.perf_counter() - t0
            rows.append((tc, te, name))
            print(f"{tc:7.2f} {te:7.2f} {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — audit must finish
            print(f"    ERR         {name}: {e}", flush=True)
    rows.sort(reverse=True)
    print("\n== top construction costs ==")
    for tc, te, name in rows[:15]:
        print(f"{tc:7.2f} construct  {te:7.2f} exec  {name}")


if __name__ == "__main__":
    main()
