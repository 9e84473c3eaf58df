"""Oracle-differential tests: every registered query with an oracle must
hash-match DuckDB on the same parquet (the driver's t2 gate, run here at
sf0.001 for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from end_to_end_sales_etl_de_project_spark.plans.registry import ORACLES, QUERIES
from end_to_end_sales_etl_de_project_spark.testing import (
    compare_spark_to_oracle,
    duckdb_connection,
    run_oracle,
)

ORACLE_CASES = sorted(ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_df = run_oracle(duck, ORACLES[name])
    result = compare_spark_to_oracle(name, spark_df, oracle_df)
    assert result.match, f"{name}: {result.mismatches}"


def test_all_queries_return_rows_at_smoke(spark, sf_dir):
    """Every registered query must run and produce a stable schema; the
    flagship must return >0 rows (driver t1)."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
    flagship = QUERIES["q01_customer_monthly_spend"](spark, sf_dir)
    assert flagship.count() > 0
