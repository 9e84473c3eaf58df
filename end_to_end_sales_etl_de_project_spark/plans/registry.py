"""Assembled query/oracle registry — the single source consumed by
``__spark_entry__.py`` and ``bench.py``.

Modules register into their own dicts; this module merges them. Names
are globally unique; every oracle key must have a query key (enforced at
import time).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from end_to_end_sales_etl_de_project_spark.plans.core import CORE_ORACLES, CORE_QUERIES
from end_to_end_sales_etl_de_project_spark.plans.documents import DOC_ORACLES, DOC_QUERIES
from end_to_end_sales_etl_de_project_spark.plans.events import EVENT_ORACLES, EVENT_QUERIES

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _queries, _oracles in (
    (CORE_QUERIES, CORE_ORACLES),
    (EVENT_QUERIES, EVENT_ORACLES),
    (DOC_QUERIES, DOC_ORACLES),
):
    for _name, _fn in _queries.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        QUERIES[_name] = _fn
    ORACLES.update(_oracles)

_orphans = set(ORACLES) - set(QUERIES)
if _orphans:
    raise ValueError(f"oracles without queries: {sorted(_orphans)}")
