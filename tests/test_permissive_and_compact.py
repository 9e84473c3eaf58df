"""Row-level corrupt-record routing and ledger compaction."""

from __future__ import annotations

from end_to_end_sales_etl_de_project_spark.ledger import Ledger
from end_to_end_sales_etl_de_project_spark.sources.csv_source import (
    read_sales_csv_permissive,
)
from tests.fixtures import SALES_HEADER


def test_permissive_routes_bad_rows_not_files(spark, tmp_path):
    p = tmp_path / "mixed.csv"
    p.write_text(
        SALES_HEADER
        + "\n1,10,widget,2024-01-05,100,5.00,2,10.00\n"
        + "1,10,widget,2024-01-06,100,not_a_price,2,10.00\n"  # bad price
        + "2,11,coil,2024-01-07,101,4.00,1,4.00\n"
    )
    good, bad = read_sales_csv_permissive(spark, [str(p)])
    assert good.count() == 2
    bad_rows = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_rows) == 1 and "not_a_price" in bad_rows[0]


def test_ledger_compaction_preserves_state(spark, tmp_path):
    ledger = Ledger(spark, str(tmp_path / "ledger"))
    # 3 files, 5 events (2 starts + 1 completed + 1 start + 1 completed),
    # 3 live states
    ledger.mark_start({"a.csv": "/x/a.csv", "b.csv": "/x/b.csv"})
    ledger.mark_completed(["a.csv"])
    ledger.mark_start({"c.csv": "/x/c.csv"})
    ledger.mark_completed(["b.csv"])
    before = {
        (r["file_name"], r["status"]) for r in ledger.current_state().collect()
    }
    n_events_before = ledger.events().count()
    assert n_events_before == 5

    kept = ledger.compact()
    assert kept == 3
    after = {(r["file_name"], r["status"]) for r in ledger.current_state().collect()}
    assert after == before == {
        ("a.csv", "COMPLETED"),
        ("b.csv", "COMPLETED"),
        ("c.csv", "START"),
    }
    # and the ledger still works post-compaction
    to_process, done = ledger.split_processed(["a.csv", "c.csv", "d.csv"])
    assert to_process == ["c.csv", "d.csv"] and done == ["a.csv"]
