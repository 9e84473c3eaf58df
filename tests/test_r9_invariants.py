"""Behavioral laws for the round-9 operator batch — invariants the
hash oracle cannot express (cross-row monotonicity, conservation
against the raw corpus), the r8 pattern continued."""

from __future__ import annotations

import pytest

from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_a21_recall_curve_monotone_in_probes(spark):
    rows = sorted(
        QUERIES["a21_ivf_recall_curve"](spark, SF).collect(),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 4]
    n_exact = {r["n_exact"] for r in rows}
    assert len(n_exact) == 1  # same ground truth under every leg
    recalls = [r["recall"] for r in rows]
    assert all(0.0 <= x <= 1.0 for x in recalls), recalls
    # widening the probe set can only add candidates
    assert recalls == sorted(recalls), recalls
    for r in rows:
        assert r["n_hit"] <= r["n_exact"], r


def test_a20_distortion_totals_and_bounds(spark):
    rows = QUERIES["a20_pq_distortion"](spark, SF).collect()
    emb_count = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows) == emb_count  # corpus is well-formed
    for r in rows:
        assert r["mean_sq_err"] >= 0.0, r
        assert r["max_sq_err"] >= r["mean_sq_err"], r
    # codebooks must actually fit SOMETHING: the corpus-wide mean
    # distortion must be far below the mean squared norm (~1 for this
    # corpus scale) — an untrained/broken codebook would not be
    assert (
        sum(r["mean_sq_err"] * r["n_vecs"] for r in rows) / emb_count < 10.0
    ), rows


def test_d21_matrix_canonical_and_thresholded(spark):
    rows = QUERIES["d21_cross_source_neardup"](spark, SF).collect()
    assert rows  # the synthetic corpus plants cross-source near-dups
    pairs = [(r["source_a"], r["source_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    for r in rows:
        assert r["source_a"] < r["source_b"], r
        assert r["n_pairs"] >= 1, r
        # every contributing pair passed the 0.5 verify gate, so the
        # quantized mean cannot sit below it (grid error < 1e-5)
        assert r["mean_jaccard"] >= 0.5 - 1e-5, r


def test_d22_bloom_law_and_fp_nonvacuity(spark):
    """The Bloom filter can NEVER miss a member (no false negatives),
    so per source n_bloom_pos == n_exact + n_false_pos exactly — any
    drift means the probe's hash family diverged from the build side.
    And the default sizing must keep the FP leg structurally
    non-vacuous on the test corpus (a 0-FP audit would silently stop
    exercising the verify-workload accounting, the a19 lesson)."""
    rows = QUERIES["d22_bloom_decontaminate"](spark, SF).collect()
    assert rows, "empty report"
    for r in rows:
        assert r["n_bloom_pos"] == r["n_exact"] + r["n_false_pos"], r
        assert 0 <= r["n_bloom_pos"] <= r["n_probe_shingles"], r
    assert sum(r["n_exact"] for r in rows) > 0, "no verbatim contamination"
    assert sum(r["n_false_pos"] for r in rows) > 0, "FP leg vacuous"


def test_d22_m_is_the_curve_choice(spark):
    """VERDICT r9 #6: d22's filter size must be DERIVED from the
    measured d23 curve — smallest grid m whose corpus fp_rate meets
    the 1% target, largest grid size if none qualifies — not a
    hardcoded constant sitting beside the sizing audit."""
    import math

    from end_to_end_sales_etl_de_project_spark.operators import dedup

    rows = QUERIES["d22_bloom_decontaminate"](spark, SF).collect()
    chosen = {r["m_bits"] for r in rows}
    assert len(chosen) == 1, rows  # one filter, every source
    curve = QUERIES["d23_bloom_sizing_curve"](spark, SF).collect()
    ok = [
        r["m_bits"]
        for r in curve
        if not math.isnan(r["fp_rate"]) and r["fp_rate"] <= dedup.BLOOM_TARGET_FP
    ]
    expect = min(ok) if ok else max(dedup.BLOOM_M_GRID)
    assert chosen == {expect}, (chosen, curve)


def test_d23_sizing_curve_laws(spark):
    """Per-row Bloom law; n_exact must be IDENTICAL across filter
    sizes (membership truth does not depend on m); bits-set bounded by
    both the filter size and 2x the test-shingle count; and on this
    corpus the measured FP rate must not increase with m — the whole
    point of the dial."""
    rows = sorted(
        QUERIES["d23_bloom_sizing_curve"](spark, SF).collect(),
        key=lambda r: r["m_bits"],
    )
    assert [r["m_bits"] for r in rows] == [8192, 16384, 65536, 262144]
    exacts = {r["n_exact"] for r in rows}
    assert len(exacts) == 1, rows
    for r in rows:
        assert r["n_bloom_pos"] == r["n_exact"] + r["n_false_pos"], r
        assert 0 < r["n_bits_set"] <= r["m_bits"], r
    fps = [r["fp_rate"] for r in rows]
    assert fps == sorted(fps, reverse=True), fps
    assert fps[-1] > 0.0, "largest filter vacuously FP-free"
