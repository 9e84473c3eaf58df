"""Golden pipeline tests (SURVEY §5 strategy #2): the full
validate→enrich→marts→metrics path on reference-shaped fixtures,
asserting the README's worked semantics — plus ledger crash/idempotency
behavior and the property checks from SURVEY §5 #4."""

from __future__ import annotations

import os
from decimal import Decimal

import pytest

from end_to_end_sales_etl_de_project_spark.ledger import Ledger
from end_to_end_sales_etl_de_project_spark.pipeline import (
    CrashDetectedError,
    run_pipeline,
)
from tests.fixtures import dim_dataframes, write_sales_fixture_files


@pytest.fixture()
def env(spark, tmp_path):
    input_dir = str(tmp_path / "landing")
    output_dir = str(tmp_path / "out")
    write_sales_fixture_files(input_dir)
    ledger = Ledger(spark, str(tmp_path / "ledger"))
    return {"in": input_dir, "out": output_dir, "ledger": ledger, "dims": dim_dataframes(spark)}


def _run(spark, env, ts="run1"):
    return run_pipeline(
        spark, env["in"], env["out"], env["dims"], env["ledger"], run_ts=ts
    )


def test_end_to_end_golden(spark, env):
    result = _run(spark, env)
    assert sorted(result.processed_files) == [
        "sales_extra.csv",
        "sales_jan.csv",
        "sales_mar.csv",
    ]
    # orphan row (customer 999) vanished via inner join: 11 valid rows - 1
    assert result.row_counts["customer_mart"] == 10

    # golden: customer 1 January spend = 10 + 20 = 30.00
    cmp_df = spark.read.parquet(result.outputs["customer_monthly_purchase"])
    jan_c1 = cmp_df.filter(
        "customer_id = 1 AND sales_date_month = '2024-01'"
    ).collect()
    assert len(jan_c1) == 1
    assert jan_c1[0]["total_sales"] == 30.0
    assert jan_c1[0]["full_name"] == "Ada Lovelace"

    # golden: March tie at store 10 — persons 100 and 101 both 30.00,
    # BOTH get rank 1 and the 1% incentive (rank() semantics,
    # reference transform.py:150-153)
    inc = spark.read.parquet(result.outputs["sales_team_incentive"])
    march10 = {
        r["sales_person_id"]: r
        for r in inc.filter("store_id = 10 AND sales_month = '2024-03'").collect()
    }
    assert march10[100]["incentive"] == 0.3
    assert march10[101]["incentive"] == 0.3

    # non-winner gets 0 (store 10, 2024-01: person 100 sells 30, 101 sells 15)
    jan10 = {
        r["sales_person_id"]: r
        for r in inc.filter("store_id = 10 AND sales_month = '2024-01'").collect()
    }
    assert jan10[100]["incentive"] == 0.3
    assert jan10[101]["incentive"] == 0.0

    # partitioned mart layout on disk (Hive-style, prunable)
    sm_path = result.outputs["sales_team_mart"]
    assert any(p.startswith("sales_month=") for p in os.listdir(sm_path))

    # property: sum of monthly customer totals == sum of joined total_cost
    total_metric = sum(r["total_sales"] for r in cmp_df.collect())
    cm = spark.read.parquet(result.outputs["customer_mart"])
    total_mart = sum(Decimal(str(r["total_cost"])) for r in cm.collect())
    assert total_metric == float(total_mart)

    # property: every (store, month) has >= 1 rank-1 incentive row
    by_group = {}
    for r in inc.collect():
        by_group.setdefault((r["store_id"], r["sales_month"]), []).append(r["incentive"])
    assert all(any(v > 0 for v in vals) for vals in by_group.values())


def test_idempotent_rerun(spark, env):
    r1 = _run(spark, env, "run1")
    assert len(r1.processed_files) == 3
    # same files land again (simulate re-delivery)
    write_sales_fixture_files(env["in"])
    r2 = _run(spark, env, "run2")
    assert r2.processed_files == []
    assert sorted(r2.skipped_files) == sorted(r1.processed_files)


def test_crash_detection(spark, env):
    # simulate a crashed run: files marked START, never COMPLETED
    env["ledger"].mark_start({"sales_jan.csv": env["in"] + "/sales_jan.csv"})
    with pytest.raises(CrashDetectedError, match="sales_jan.csv"):
        _run(spark, env)


def test_quarantine_moves_files(spark, env):
    result = _run(spark, env)
    for route in ("wrong_files", "bad_schema", "empty_files"):
        routed = os.listdir(os.path.join(env["out"], route))
        assert len(routed) == 1, route
    # processed files archived out of the landing dir
    assert os.listdir(env["in"]) == []


def test_faithful_and_grouped_metrics_agree(spark, env):
    """Window+distinct (reference plan) ≡ groupBy (engine plan)."""
    from end_to_end_sales_etl_de_project_spark.marts import (
        customer_monthly_purchase,
        enrich_sales,
        sales_team_incentive,
    )
    from end_to_end_sales_etl_de_project_spark.sources.csv_source import (
        read_sales_csv,
        validate_files,
    )

    files = [os.path.join(env["in"], f) for f in os.listdir(env["in"])]
    sales = read_sales_csv(spark, validate_files(files))
    enriched = enrich_sales(sales, **env["dims"]).cache()

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(customer_monthly_purchase(enriched, faithful=True)) == canon(
        customer_monthly_purchase(enriched, faithful=False)
    )
    assert canon(sales_team_incentive(enriched, faithful=True)) == canon(
        sales_team_incentive(enriched, faithful=False)
    )


def test_crash_detected_even_after_inputs_archived(spark, env):
    """A crashed run may have already archived its inputs — the crash
    check must be ledger-wide, not scoped to the landing dir."""
    env["ledger"].mark_start({"ghost.csv": "/already/archived/ghost.csv"})
    with pytest.raises(CrashDetectedError, match="ghost.csv"):
        _run(spark, env)
