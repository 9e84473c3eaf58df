"""Planted-NULL oracle parity for the SALES-STAR family — the third
leg of the sweep (documents r7, events r8, sales r8): TPC-H-shaped
synthetic data is NOT NULL everywhere, so NULL-semantics divergences
in the relational operators (NULLS FIRST/LAST sort order, NULL-skipping
aggregates, string_agg vs array_join NULL handling, NULL equi-join
keys) can hide behind green driver rows indefinitely.

NULLs are PLANTED BY MUTATION (deterministic ``key % prime`` masks via
DuckDB ``SELECT * REPLACE``) so schemas and row counts stay canonical
— only the value distribution gains NULL corners. Scope is
self-checking like the other sweeps: every in-window query whose
oracle references a sales table must be swept or excluded by name.
"""

from __future__ import annotations

import os
import re
import shutil

import duckdb
import pytest

import __spark_entry__ as E
from end_to_end_sales_etl_de_project_spark.plans.registry import (
    DRIVER_WINDOW,
    ORACLES,
)
from end_to_end_sales_etl_de_project_spark.testing import (
    compare_spark_to_oracle,
    duckdb_connection,
    run_oracle,
)

SALES_TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation", "region"]

# In-window sales-readers deliberately OUTSIDE the parity sweep, each
# with a documented reason (and a dedicated pin if behavior-bearing).
# Exclusions must name registered oracles (test_exclusions_are_registered).
SWEEP_EXCLUSIONS: set[str] = set()

_READER_PAT = re.compile(r"\b(" + "|".join(SALES_TABLES) + r")\b")

# Sweep scope is DERIVED (VERDICT r9 #1): window ∩ oracle-references-
# a-sales-table, minus the documented exclusions. Rotations update the
# sweep automatically.
WINDOW_SALES_QUERIES = sorted(
    n
    for n in DRIVER_WINDOW
    if n in ORACLES and _READER_PAT.search(ORACLES[n]) and n not in SWEEP_EXCLUSIONS
)

# per-table NULL masks: (column, modulus) — key % modulus == 0 nulls
# the column for that row; moduli are distinct primes so the NULL
# patterns overlap but never coincide entirely
_MUTATIONS = {
    "lineitem": (
        "l_orderkey",
        [
            ("l_quantity", 97),
            ("l_extendedprice", 89),
            ("l_discount", 83),
            ("l_returnflag", 79),
            ("l_linestatus", 73),
            ("l_shipdate", 71),
            ("l_tax", 67),
        ],
    ),
    "orders": (
        "o_orderkey",
        [
            ("o_totalprice", 97),
            ("o_orderdate", 89),
            ("o_orderpriority", 83),
            ("o_orderstatus", 79),
        ],
    ),
    "supplier": ("s_suppkey", [("s_name", 7), ("s_nationkey", 11), ("s_acctbal", 5)]),
    "nation": ("n_nationkey", [("n_name", 5)]),
    "region": ("r_regionkey", [("r_name", 3)]),
}


@pytest.fixture(scope="module")
def null_sales_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("null-sales")
    mutated = set(_MUTATIONS)
    for name in os.listdir(sf_dir):
        if name.removesuffix(".parquet") not in mutated:
            shutil.copy(os.path.join(sf_dir, name), d / name)
    con = duckdb.connect()
    for table, (key, masks) in _MUTATIONS.items():
        replaces = ", ".join(
            f"CASE WHEN {key} % {mod} = 0 THEN NULL ELSE {col} END AS {col}"
            for col, mod in masks
        )
        con.execute(
            f"COPY (SELECT * REPLACE ({replaces}) "
            f"FROM read_parquet('{sf_dir}/{table}.parquet')) "
            f"TO '{d / (table + '.parquet')}' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.fixture(scope="module")
def null_sales_con(null_sales_dir):
    return duckdb_connection(null_sales_dir)


def test_exclusions_are_registered():
    for name in SWEEP_EXCLUSIONS:
        assert name in ORACLES, f"stale sweep exclusion: {name}"


def test_sweep_is_nonvacuous():
    assert WINDOW_SALES_QUERIES, "no in-window sales-readers — sweep vacuous"


def test_fixture_actually_plants_nulls(null_sales_con):
    n = null_sales_con.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NULL OR l_shipdate IS NULL"
    ).fetchone()[0]
    assert n > 0, "mutation masks produced no NULLs — sweep is vacuous"


@pytest.mark.parametrize("name", WINDOW_SALES_QUERIES)
def test_null_sales_oracle_parity(spark, null_sales_dir, null_sales_con, name):
    r = compare_spark_to_oracle(
        name,
        E.queries()[name](spark, null_sales_dir),
        run_oracle(null_sales_con, E.oracle_sql()[name]),
    )
    assert r.match, f"{name} diverges on NULLs: {r.mismatches[:3]}"
