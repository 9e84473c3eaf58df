"""MERGE-emulation upsert: insert + replace-by-key + crash-safe swap."""

from __future__ import annotations

from end_to_end_sales_etl_de_project_spark.operators.upsert import upsert_parquet


def test_upsert_insert_then_replace(spark, tmp_path):
    path = str(tmp_path / "mart")
    first = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
    )
    assert upsert_parquet(spark, path, first, ["k"]) == 2

    # update key 2, insert key 3
    second = spark.createDataFrame(
        [(2, "b2", 25.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    assert upsert_parquet(spark, path, second, ["k"]) == 3

    rows = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0)}

    # idempotent re-apply of the same update batch
    assert upsert_parquet(spark, path, second, ["k"]) == 3
    rows2 = {r.k: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert rows2 == rows


def test_upsert_composite_key(spark, tmp_path):
    path = str(tmp_path / "mart2")
    base = spark.createDataFrame(
        [(1, "2024-01", 5.0), (1, "2024-02", 6.0)], "k long, month string, v double"
    )
    upsert_parquet(spark, path, base, ["k", "month"])
    upd = spark.createDataFrame([(1, "2024-02", 9.0)], "k long, month string, v double")
    assert upsert_parquet(spark, path, upd, ["k", "month"]) == 2
    rows = {(r.k, r.month): r.v for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "2024-01"): 5.0, (1, "2024-02"): 9.0}
