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


def test_jsonl_permissive_routes_bad_rows(spark, tmp_path):
    """One corrupt line must not quarantine the file: schema-valid rows
    parse, the truncated/wrong-typed/garbage lines surface verbatim in
    the bad stream."""
    from pyspark.sql import types as T

    from end_to_end_sales_etl_de_project_spark.sources.csv_source import (
        read_jsonl_permissive,
    )

    p = tmp_path / "batch.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok-row", "score": 2.5}\n'
        'not json at all\n'
        '{"id": 3, "name": "also-ok", "score": 0.0}\n'
        '{"id": "wrong-type", "name": "bad", "score": 1.0}\n'
        '{"id": 5, "name": "trunca'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, bad = read_jsonl_permissive(spark, [str(p)], schema)
    good_rows = {r["id"]: r for r in good.collect()}
    bad_rows = [r["_corrupt_record"] for r in bad.collect()]
    assert set(good_rows) == {1, 3}
    assert good_rows[1]["name"] == "ok-row" and good_rows[1]["score"] == 2.5
    assert len(bad_rows) == 3
    assert any("not json at all" in b for b in bad_rows)
    assert any("trunca" in b for b in bad_rows)
    assert any("wrong-type" in b for b in bad_rows)
