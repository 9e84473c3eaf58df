"""JDBC source/sink API wiring, mocked — no MySQL driver jar ships in
this environment, so these pin the two things that matter without a
server: (1) every scale-relevant option reaches the underlying
reader/writer, (2) sink failures PROPAGATE (the reference swallowed
exceptions into a returned error-string set, utility.py:76-77 — the
one behavior deliberately not ported)."""

from __future__ import annotations

from unittest.mock import MagicMock

import pytest

from end_to_end_sales_etl_de_project_spark.sources.jdbc import read_jdbc_table
from end_to_end_sales_etl_de_project_spark.writers import write_jdbc

URL = "jdbc:mysql://db:3306/sales"


def _mock_spark():
    spark = MagicMock()
    reader = MagicMock()
    spark.read.format.return_value = reader
    reader.option.return_value = reader
    reader.load.return_value = "LOADED"
    return spark, reader


def test_read_wires_url_table_and_properties():
    spark, reader = _mock_spark()
    out = read_jdbc_table(
        spark,
        URL,
        "customer",
        properties={"driver": "com.mysql.cj.jdbc.Driver", "fetchsize": "10000"},
    )
    assert out == "LOADED"
    spark.read.format.assert_called_once_with("jdbc")
    opts = {c.args[0]: c.args[1] for c in reader.option.call_args_list}
    assert opts["url"] == URL
    assert opts["dbtable"] == "customer"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"
    assert opts["fetchsize"] == "10000"
    assert "partitionColumn" not in opts  # unpartitioned unless asked


def test_read_wires_parallel_range_scan():
    spark, reader = _mock_spark()
    read_jdbc_table(
        spark,
        URL,
        "orders",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    opts = {c.args[0]: c.args[1] for c in reader.option.call_args_list}
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "16"


def test_write_passes_mode_and_properties():
    df = MagicMock()
    write_jdbc(df, URL, "metrics", properties={"driver": "x"}, mode="append")
    df.write.jdbc.assert_called_once_with(
        url=URL, table="metrics", mode="append", properties={"driver": "x"}
    )


def test_write_failure_propagates():
    df = MagicMock()
    df.write.jdbc.side_effect = RuntimeError("connection refused")
    with pytest.raises(RuntimeError, match="connection refused"):
        write_jdbc(df, URL, "metrics")
