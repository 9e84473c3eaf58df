"""Validation-path tests (SURVEY §5 strategy #3): every quarantine
route, the extra-column fold, the multi-file union, single-pass read."""

from __future__ import annotations

import pytest

from end_to_end_sales_etl_de_project_spark.config import MANDATORY_COLUMNS
from end_to_end_sales_etl_de_project_spark.sources.csv_source import (
    read_sales_csv,
    validate_files,
)
from tests.fixtures import write_sales_fixture_files


@pytest.fixture()
def input_dir(tmp_path):
    d = tmp_path / "landing"
    write_sales_fixture_files(str(d))
    return str(d)


def _paths(input_dir):
    import os

    return sorted(os.path.join(input_dir, f) for f in os.listdir(input_dir))


def test_routes(input_dir):
    report = validate_files(_paths(input_dir))
    import os

    names = lambda lst: sorted(os.path.basename(p) for p in lst)  # noqa: E731
    assert names(report.valid) == ["sales_extra.csv", "sales_jan.csv", "sales_mar.csv"]
    assert names(report.bad_schema) == ["sales_missing.csv"]
    assert names(report.empty) == ["sales_empty.csv"]
    assert names(report.wrong_type) == ["notes.txt"]


def test_read_union_and_extra_fold(spark, input_dir):
    report = validate_files(_paths(input_dir))
    df = read_sales_csv(spark, report)
    assert df.columns == [*MANDATORY_COLUMNS, "additional_column"]
    rows = df.collect()
    # 5 + 4 + 2 rows across the three valid files
    assert len(rows) == 11
    folded = {r["additional_column"] for r in rows if r["additional_column"] is not None}
    assert folded == {"SAVE10, web", "NONE, store"}
    # plain files carry a NULL additional_column (typed string, not void)
    assert dict(df.dtypes)["additional_column"] == "string"


def test_empty_valid_set_returns_none(spark, tmp_path):
    (tmp_path / "only.txt").write_text("nope")
    report = validate_files([str(tmp_path / "only.txt")])
    assert read_sales_csv(spark, report) is None


def test_declared_types(spark, input_dir):
    report = validate_files(_paths(input_dir))
    df = read_sales_csv(spark, report)
    types = dict(df.dtypes)
    assert types["customer_id"] == "bigint"
    assert types["total_cost"] == "decimal(12,2)"
    assert types["quantity"] == "int"
    assert types["sales_date"] == "string"  # month = substring semantics
