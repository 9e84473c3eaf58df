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


def test_fk_orphans_planted(spark):
    """The sf corpora are referentially clean, so the oracle-parity run
    can only prove zero-orphan agreement — this plants orphans and NULL
    keys and pins the null-aware counting (NULL keys are never orphans,
    matching NOT EXISTS semantics)."""
    from end_to_end_sales_etl_de_project_spark.operators.profiling import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 20)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,), (20,)], "pk long")
    out = {r["fk_name"]: r for r in fk_orphans(
        [("child->parent", child, "fk", parent, "pk")]
    ).collect()}
    r = out["child->parent"]
    assert r["n_rows"] == 5
    assert r["n_null_keys"] == 1          # the NULL fk
    assert r["n_orphans"] == 1            # fk=99 only; NULL is not an orphan
    # duplicate parent keys must not double-count children (pk dedup'd)
    assert sum(1 for _ in out) == 1


def test_incremental_agg_merge_equals_full(spark):
    """q62's algebra on a planted frame: partial aggregates folded per
    side then merged must equal the one-shot aggregate bit-for-bit —
    true only because money folds in exact decimal."""
    from pyspark.sql import functions as F

    from end_to_end_sales_etl_de_project_spark.functions.scalar import money

    rows = [("A", 0.1), ("A", 0.2), ("B", 0.3)] * 101 + [("A", 123456.78)]
    df = spark.createDataFrame(rows, "k string, v double")

    def partials(d):
        return d.groupBy("k").agg(
            F.sum(money("v")).alias("p_sum"), F.count(F.lit(1)).alias("p_n")
        )

    # split on a stable per-row hash (limit() isn't a deterministic split)
    keyed = df.withColumn("h", F.xxhash64("k", "v"))
    a = partials(keyed.filter(F.col("h") % 2 == 0))
    b = partials(keyed.filter(F.col("h") % 2 != 0))
    merged = (
        a.unionByName(b)
        .groupBy("k")
        .agg(
            F.sum("p_sum").cast("double").alias("total"),
            F.sum("p_n").alias("n"),
        )
    )
    full = df.groupBy("k").agg(
        F.sum(money("v")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_expectations_fire_on_planted_violations(spark):
    """The sf corpora are clean, so the oracle-parity run alone proves
    only the all-pass path — this plants one violation per check kind
    and asserts each detector fires with the right count."""
    from end_to_end_sales_etl_de_project_spark.operators.profiling import (
        expectations_report,
    )

    rows = [
        (1, 1, 5.0, "A"),
        (1, 1, None, "N"),     # dup key (with row 1) + null qty
        (2, 1, 99.0, "R"),     # out of range
        (2, 2, -3.0, "X"),     # range (negative) + bad flag
        (3, 1, 10.0, None),    # NULL flag: NOT a violation (3VL)
    ]
    df = spark.createDataFrame(rows, "k long, ln int, qty double, flag string")
    out = {
        r["check_name"]: r
        for r in expectations_report(
            df,
            row_checks=[
                ("not_null_qty", "qty IS NULL"),
                ("range_qty", "qty IS NOT NULL AND (qty < 0 OR qty > 60)"),
                ("accepted_flag", "flag IS NOT NULL AND flag NOT IN ('A','N','R')"),
            ],
            unique_checks=[("unique_key", ["k", "ln"])],
        ).collect()
    }
    assert all(r["n_rows"] == 5 for r in out.values())
    assert out["not_null_qty"]["n_violations"] == 1
    assert out["range_qty"]["n_violations"] == 2
    assert out["accepted_flag"]["n_violations"] == 1   # NULL flag exempt
    assert out["unique_key"]["n_violations"] == 2      # both rows of the dup group
    assert not any(r["passed"] for r in out.values())


def test_expectations_unique_checks_only(spark):
    """Empty row_checks used to emit an invalid ``stack(0, )`` leg
    (ADVICE r8); uniqueness-only reports are a reasonable call and must
    work, and a fully-empty spec must fail loudly."""
    import pytest

    from end_to_end_sales_etl_de_project_spark.operators.profiling import (
        expectations_report,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1)], "k long, ln int"
    )
    rows = expectations_report(
        df, row_checks=[], unique_checks=[("unique_key", ["k", "ln"])]
    ).collect()
    assert len(rows) == 1
    assert rows[0]["check_name"] == "unique_key"
    assert rows[0]["n_violations"] == 2
    assert not rows[0]["passed"]
    with pytest.raises(ValueError, match="at least one"):
        expectations_report(df, row_checks=[], unique_checks=[])


def test_month_completeness_flags_planted_gap(spark):
    """A fact with March missing must surface 2024-03 as a zero-count,
    present=False spine row — the hole per-partition profiling cannot
    see."""
    import datetime as dt

    from end_to_end_sales_etl_de_project_spark.operators.profiling import (
        month_completeness,
    )

    rows = [
        (1, dt.datetime(2024, 1, 15)),
        (2, dt.datetime(2024, 2, 1)),
        (3, dt.datetime(2024, 2, 20)),
        (4, dt.datetime(2024, 4, 2)),   # March skipped
        (5, None),                      # NULL date: excluded everywhere
    ]
    df = spark.createDataFrame(rows, "k long, d timestamp")
    out = {r["sales_month"]: r for r in month_completeness(df, "d").collect()}
    assert sorted(out) == ["2024-01", "2024-02", "2024-03", "2024-04"]
    assert out["2024-03"]["n_rows"] == 0 and out["2024-03"]["present"] is False
    assert out["2024-02"]["n_rows"] == 2 and out["2024-02"]["present"] is True
