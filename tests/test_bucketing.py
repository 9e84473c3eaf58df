"""Bucketed co-located join: writing both join sides bucketed on the
key lets Spark join them with ZERO exchanges — the pre-shuffle pattern
for repeated 100 TB fact-fact joins. Verified by inspecting the
physical plan of the bucketed join."""

from __future__ import annotations

import contextlib
import io

import pytest

from end_to_end_sales_etl_de_project_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse.dir is a static conf — use EXTERNAL bucketed tables with
    # explicit paths instead (metadata in the in-memory catalog, data in
    # the test tmpdir)
    wh = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "b_lineitem"))
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # force the sort-merge path (broadcast would win on tiny test data
    # and is itself an Exchange); at fact-fact scale SMJ is what runs
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan
    # and it actually computes the right thing
    n = joined.count()
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    expected = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).count()
    assert n == expected


def test_unbucketed_same_join_does_shuffle(bucketed):
    """Control: the identical join on plain parquet exchanges both
    sides (or broadcasts) — bucketing is what removed the shuffle."""
    spark = bucketed
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    # disable broadcast so the comparison is shuffle-vs-bucket
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(li.join(orders, "l_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in plan
