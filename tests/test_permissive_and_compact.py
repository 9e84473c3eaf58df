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


def test_ledger_1k_file_append_cost_bounded(spark, tmp_path):
    """VERDICT r4 #8: pin the control-plane bound at realistic file
    counts. 1,000 append batches = 1,000 parquet files; ``_append``'s
    max-seq probe is a driver-side footer-metadata walk (O(files), no
    Spark job), and ``compact()`` folds the directory back to one file
    so subsequent appends are O(1) again. Synthesizes the 1k files with
    pyarrow directly (running 1k real Spark writes would test the same
    code 1000x slower)."""
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "ledger")
    os.makedirs(path)
    now = dt.datetime(2026, 1, 1)
    # 1000 single-event appends: 500 files STARTed then COMPLETED
    for i in range(1000):
        fname = f"f{i % 500:03d}.csv"
        status = "START" if i < 500 else "COMPLETED"
        tbl = pa.table(
            {
                "file_name": pa.array([fname], pa.string()),
                "file_location": pa.array([f"/x/{fname}"], pa.string()),
                "created_date": pa.array([now], pa.timestamp("us")),
                "status": pa.array([status], pa.string()),
                "seq": pa.array([1_000_000 + i], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(path, f"part-{i:05d}.parquet"))

    ledger = Ledger(spark, path)
    # footer-stat probe sees the true max without a Spark job
    assert ledger._max_seq() == 1_000_999
    t0 = time.monotonic()
    ledger._max_seq()
    footer_walk_s = time.monotonic() - t0
    # driver-side metadata walk over 1k files: generous ceiling, but
    # orders of magnitude under a 1k-file Spark scan
    assert footer_walk_s < 5.0

    kept = ledger.compact()
    assert kept == 500
    n_files = sum(1 for n in os.listdir(path) if n.endswith(".parquet"))
    assert n_files == 1  # bound restored: next append probes one footer
    state = {r["status"] for r in ledger.current_state().collect()}
    assert state == {"COMPLETED"}
    # appends still work and stay monotonic past the compacted max
    ledger.mark_start({"new.csv": "/x/new.csv"})
    assert ledger._max_seq() > 1_000_999
