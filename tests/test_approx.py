"""Approximate-aggregate bounds: sketches can't hash-match an oracle,
so pin them against exact values instead (q32 is rows-only for the
driver by design)."""

from __future__ import annotations

from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES


def test_approx_within_bounds(spark, sf_dir):
    rows = QUERIES["q32_approx_aggs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_orders"]
        # HLL++ default rsd is 5%; allow 3x margin for tiny groups
        assert abs(r["approx_orders"] - exact) <= max(3, 0.15 * exact), r
        assert r["approx_q25"] <= r["approx_median_price"] <= r["approx_q75"]


def test_quantization_error_bound(spark, sf_dir):
    """a07 law: symmetric int8 quantization error is at most half a
    quantization step (0.5/scale = max_abs/254) per dimension."""
    from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES

    rows = QUERIES["a07_quantization_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["scale"] is None:
            continue
        bound = r["max_abs"] / 254.0
        assert r["max_abs_err"] <= bound * (1 + 1e-9), (r["max_abs_err"], bound)
        assert 0.0 <= r["mse"] <= bound * bound * (1 + 1e-9)


def test_exact_quantiles_match_sorted_pick(spark, sf_dir):
    """e19 law: each reported quantile IS the element at rank
    ceil(p*n) of the sorted per-type values."""
    import math

    from pyspark.sql import functions as F

    from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES
    from end_to_end_sales_etl_de_project_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in QUERIES["e19_exact_quantiles"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for p, col in ((0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.90, "p90")):
            assert got[t][col] == vals[math.ceil(p * n) - 1], (t, col)
