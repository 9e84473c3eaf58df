"""Planted-NULL oracle parity for the EMBEDDINGS family — the r9
extension of the documents/events/sales sweeps (VERDICT r8 #7): the
canonical embeddings table has no NULL vec_id/embedding/label and every
vector is exactly 64 long, so Spark-vs-DuckDB NULL-semantics
divergences (NULL array elements folding to NULL sims, size(NULL)=-1,
NULLS FIRST/LAST ordering, NULL group keys) can hide behind green
driver rows. The t34/t37 pre-ship catches proved this class only
surfaces on planted data.

Planted corners: NULL vec_id, NULL embedding, empty embedding array, a
SHORT (3-elem) embedding, a full-length embedding with a NULL ELEMENT,
NULL label, and an all-NULL row — vec_ids 9000001+ so the a-family's
fixed query set (vec_id < 8) is unchanged.

Scope is self-checking like the other sweeps: every in-window query
whose oracle references the embeddings table must be in the sweep or on
the documented exclusion list.
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

# In-window embeddings-readers deliberately OUTSIDE the parity sweep,
# each with a documented reason (and a dedicated pin if behavior-
# bearing). Exclusions must name registered oracles
# (test_exclusions_are_registered).
SWEEP_EXCLUSIONS: set[str] = set()

_READER_PAT = re.compile(r"\bembeddings\b")

# Sweep scope is DERIVED (VERDICT r9 #1): window ∩ oracle-references-
# embeddings, minus the documented exclusions. Rotations update the
# sweep automatically.
WINDOW_EMB_QUERIES = sorted(
    n
    for n in DRIVER_WINDOW
    if n in ORACLES and _READER_PAT.search(ORACLES[n]) and n not in SWEEP_EXCLUSIONS
)


@pytest.fixture(scope="module")
def null_emb_dir(sf_dir, tmp_path_factory):
    """A full sf-dir clone whose embeddings.parquet is the REAL corpus
    plus planted rows exercising every NULL/shape corner. Written by
    DuckDB so the parquet keeps the FLOAT[] physical type of the
    canonical file."""
    d = tmp_path_factory.mktemp("null-emb")
    for name in os.listdir(sf_dir):
        if name != "embeddings.parquet":
            shutil.copy(os.path.join(sf_dir, name), d / name)
    full = "[" + ", ".join(f"{(i % 7 - 3) / 8:.3f}" for i in range(64)) + "]"
    # full-LENGTH vector with a NULL element: passes the size gate but
    # must be excluded by the element-nullity predicate (ADVICE r9 —
    # the numpy seams would otherwise crash where DuckDB NULL-propagates)
    holed = (
        "["
        + ", ".join("NULL" if i == 17 else f"{(i % 5 - 2) / 8:.3f}" for i in range(64))
        + "]"
    )
    duckdb.connect().execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, NULL,                                  CAST(3 AS INTEGER)),
    (9000002, CAST([] AS FLOAT[]),                   CAST(1 AS INTEGER)),
    (9000003, CAST([0.25, -0.5, 0.125] AS FLOAT[]),  CAST(2 AS INTEGER)),
    (9000004, CAST({full} AS FLOAT[]),               NULL),
    (NULL,    CAST({full} AS FLOAT[]),               CAST(4 AS INTEGER)),
    (9000006, NULL, NULL),
    (9000007, CAST({holed} AS FLOAT[]),              CAST(5 AS INTEGER))
  ) t(vec_id, embedding, label)
) TO '{d / "embeddings.parquet"}' (FORMAT PARQUET)
"""
    )
    return str(d)


@pytest.fixture(scope="module")
def null_emb_con(null_emb_dir):
    return duckdb_connection(null_emb_dir)


def test_exclusions_are_registered():
    for name in SWEEP_EXCLUSIONS:
        assert name in ORACLES, f"stale sweep exclusion: {name}"


def test_sweep_is_nonvacuous():
    assert WINDOW_EMB_QUERIES, "no in-window embeddings-readers — sweep vacuous"


@pytest.mark.parametrize("name", WINDOW_EMB_QUERIES)
def test_null_embeddings_oracle_parity(spark, null_emb_dir, null_emb_con, name):
    r = compare_spark_to_oracle(
        name,
        E.queries()[name](spark, null_emb_dir),
        run_oracle(null_emb_con, E.oracle_sql()[name]),
    )
    assert r.match, f"{name} diverges on NULLs: {r.mismatches[:3]}"
