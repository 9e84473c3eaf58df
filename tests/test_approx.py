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
