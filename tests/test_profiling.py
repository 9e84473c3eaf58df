"""profile_columns behavior on planted data: the sf corpora contain no
nulls, so the oracle-parity run alone cannot exercise null counting —
this pins it, plus distinct-counts-nulls semantics and the typed
min/max columns."""

from __future__ import annotations

import datetime as dt

from end_to_end_sales_etl_de_project_spark.operators.profiling import profile_columns


def test_profile_counts_nulls_and_distincts(spark):
    rows = [
        (1, 10.0, "a", dt.datetime(2024, 1, 1, 8, 0)),
        (2, None, "b", dt.datetime(2024, 1, 3, 9, 30)),
        (3, 10.0, None, None),
        (None, -2.5, "a", dt.datetime(2024, 1, 2, 0, 0)),
    ]
    df = spark.createDataFrame(
        rows, "k long, v double, s string, ts timestamp_ntz"
    )
    out = {
        r["column_name"]: r
        for r in profile_columns(
            df, [("k", "num"), ("v", "num"), ("s", "str"), ("ts", "ts")]
        ).collect()
    }
    assert set(out) == {"k", "v", "s", "ts"}
    for r in out.values():
        assert r["n_rows"] == 4
    assert out["k"]["n_nulls"] == 1 and out["k"]["n_distinct"] == 3
    assert out["k"]["min_value"] == 1.0 and out["k"]["max_value"] == 3.0
    # COUNT(DISTINCT) ignores nulls in both engines
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_value"] == -2.5 and out["v"]["max_value"] == 10.0
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] is None and out["s"]["max_value"] is None
    assert out["ts"]["n_nulls"] == 1
    assert out["ts"]["min_ts"] == dt.datetime(2024, 1, 1, 8, 0)
    assert out["ts"]["max_ts"] == dt.datetime(2024, 1, 3, 9, 30)
    # non-ts columns carry null typed min/max and vice versa
    assert out["k"]["min_ts"] is None and out["ts"]["min_value"] is None
