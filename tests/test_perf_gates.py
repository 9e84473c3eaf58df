"""Standing performance gates (VERDICT r5 #7): the PERF.md thresholds
as executable tests, so the next plan-construction regression (the
round-4 class: eager per-plan checkpoints re-paid on every run, d14
re-running the resolution loop) goes red locally BEFORE the driver
bench records it.

Methodology mirrors bench.py: one warm run (plan compile + parquet
footers + session artifacts), then the MIN of two timed runs. Bounds
are GENEROUS absolutes at sf0.01 — each gate sits 4-10x above the
steady-state measurement, so scheduler noise can't flake the suite,
while the regression class being guarded (a re-paid corpus explode or
resolution loop costs whole seconds at sf0.01) still trips it.

Canary normalization (VERDICT r13 #2): raw absolutes still flaked
once — a13 measured 13.6 s against its 4.0 bound mid-suite on a
machine running the full 728-test battery, while the RELATIVE
a13-vs-a12 gate stayed green (uniform contention, not a regression).
So every absolute bound is now scaled by the session's measured load:
the same q10 canary bench.py uses is timed once per session under
this fixture's config (idle steady-state pinned at CANARY_IDLE_SEC),
and each gate allows bound * max(1, canary/idle). On an idle machine
the gates are exactly the absolutes below; under uniform contention
the allowance grows with the contention the canary itself measured,
which is precisely the noise term the old absolutes couldn't absorb.
A genuine single-query regression (one artifact consumer re-running
its producer) does NOT move the canary, so it still trips the gate.

Run with `pytest -m bench`; the default suite includes them too (they
cost ~30 s total at sf0.01).
"""

from __future__ import annotations

import time

import pytest

from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.01"

# (query, bound_sec at sf0.01). Steady-state sf0.01 measurements are
# ~0.2-1.2 s each; the r4-class regressions measured 3-10x the healthy
# time, so these bounds catch them with margin on a busy machine.
GATES = [
    ("c01_curate_corpus", 8.0),  # session shingle index: the r4 regression
    ("d02_ngram_jaccard", 4.0),  # shared shingle-index consumer
    ("d08_jaccard_stopshingle", 3.0),  # capped-index consumer
    ("q58_sorted_layout_readback", 4.0),  # per-session staging dirs (q58/q71 thrash)
    ("d14_cluster_size_histogram", 3.0),  # component-artifact consumer (r5-9 fix)
    ("t24_quality_buckets", 3.0),  # LM-score-artifact consumer
    ("d16_containment_pairs", 4.0),  # capped-index consumer (r6)
    # r11 refresh (VERDICT r10 #7): the current bench-tail shapes, so a
    # construction regression in these paths trips locally before the
    # driver bench records it. Steady-state sf0.01 measurements in
    # PERF.md Round 11; bounds keep the standing 4-10x headroom.
    ("q81_cumulative_distinct", 4.0),  # first-seen decomposition (0.86 s)
    ("d11_chunk_neardup", 6.0),  # chunk-grain LSH + signature artifact (1.50 s)
    ("m07_phash_neardup", 4.0),  # Arrow-batched SimHash + 4-band join (0.70 s)
    ("c08_decontamination_agreement", 6.0),  # split-shingle5 artifacts (1.37 s)
    ("t15_boilerplate_ngrams", 2.5),  # shared shingle-index consumer (0.35 s)
    # r12 (VERDICT r11 #4): a13 rides the session _ann_baselines +
    # _pq_model artifacts; a re-derivation of exact ground truth per
    # call would roughly double it
    ("a13_pq_recall_audit", 4.0),
    # r13 (VERDICT r12 #5): the remaining top-10 tail queries had no
    # gate, so a real regression could hide inside machine noise until
    # a judge round. Steady-state sf0.01 (idle, min-of-2): d04 1.18 s,
    # d24 2.54 s, q70 0.37 s, q34 1.54 s; bounds keep the 3-8x headroom.
    ("d04_simhash", 4.0),  # simhash fingerprints + 4-band self-join
    ("d24_dedup_tier_attribution", 8.0),  # priced tier-0 cascade (adjudicated r11)
    ("q70_fuzzy_name_match", 2.5),  # blocked Levenshtein, designed-out quadratic
    ("q34_partitioned_write_readback", 6.0),  # real partitioned write+readback I/O
    # r13 close: the canonical-run top-10 rotated three more shapes in;
    # steady-state sf0.01 (idle, min-of-2): t39 0.45 s, q73 1.23 s,
    # d19 2.36 s. Usual 3-8x headroom.
    ("t39_pii_density", 2.5),  # triple-regex per-row pass (email/phone/token)
    ("q73_market_basket_lift", 5.0),  # pair-join inside order baskets
    ("d19_lsh_tuning_curve", 8.0),  # multi-(bands,rows) tiling over one sig table
    # r14 (VERDICT r13 #4): d18 is the one recurring bench-top-10
    # visitor that had no gate (2.6x cross-run spread on identical
    # code, adjudicated machine variance); idle steady-state sf0.01
    # min-of-4 under this fixture's config: 1.08 s. Usual headroom.
    ("d18_incremental_neardup", 6.0),  # incremental signature gate (banded joins)
    # r14 close: the canonical-run top-10 rotated three ungated shapes
    # in. Steady-state sf0.01 (min-of-3 after warm, canary 0.55 ≈ 1.2x
    # the idle pin — bounds keep the usual headroom against the TRUE
    # idle figure): q02 0.68 s, d06 1.79 s, q01g 0.24 s.
    ("q02_sales_team_incentive", 3.0),  # reference A2 window + rank-tie incentive
    ("d06_neardup_resolve", 8.0),  # full LSH->components resolution chain
    ("q01g_customer_monthly_spend_grouped", 2.0),  # flagship groupBy form
    # r14 continuation: the three post-close additions, gated from
    # birth (no waiting for a top-10 visit). Idle steady-state sf0.01
    # min-of-3 under this fixture's config (canary 0.37 < idle pin):
    # t42 0.71 s, d28 1.66 s, a24 1.04 s. Usual 3-5x headroom; the
    # regression classes guarded: t42 re-running the MG phase per
    # consumer / losing the candidate prune, d28 re-deriving the md5
    # bucket hashes per grid leg (the 3.9 s first cut), a24 re-banding
    # the corpus instead of reading the session graph artifact.
    ("t42_frequent_tokens", 3.0),
    ("d28_cms_error_audit", 6.0),
    ("a24_knn_triangles", 4.0),
    # d29 rides the session curve/signature/shingle artifacts; idle
    # steady-state sf0.01 min-of-3: 0.86 s (canary 0.34). A re-derived
    # curve or signature table per call would triple it.
    ("d29_tuned_neardup", 4.0),
]

# Idle steady-state of the canary (q10: scan + per-group window rank)
# at sf0.01 under THIS fixture's session config (local[8], 8 shuffle
# partitions) — min-of-4 measured 0.415-0.48 s on an idle machine.
# Re-pin if the fixture config or q10's plan changes.
CANARY_IDLE_SEC = 0.45
_canary_factor: dict[str, float] = {}


def _load_factor(spark) -> float:
    """max(1, measured canary / idle canary), measured once per session."""
    if "factor" not in _canary_factor:
        measured = _steady_state(spark, "q10_rank_top1")
        _canary_factor["factor"] = max(1.0, measured / CANARY_IDLE_SEC)
        _canary_factor["measured"] = measured
    return _canary_factor["factor"]


def _steady_state(spark, name: str) -> float:
    def run():
        QUERIES[name](spark, SF).write.mode("overwrite").format("noop").save()

    run()  # warm: plan compile, footers, session artifacts
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.bench
def test_a13_rides_shared_baselines(spark):
    """VERDICT r11 #4: a13 (PQ recall audit) must ride the session's
    staged exact/LSH ground-truth baselines (_ann_baselines) and the
    cached PQ codebooks, not re-derive them per call. Steady-state a13
    does strictly more work than a12 (PQ-encodes the corpus vs IVF
    cell assignment) but must stay within a small constant of it; a
    re-derived brute-force baseline or retrained codebook costs ~2x.
    The bound is relative (same session, same machine conditions), so
    scheduler noise cancels; the +1.0 s absolute slack keeps a 0.2 s
    a12 measurement from turning the gate into a coin flip."""
    t_a12 = _steady_state(spark, "a12_ivf_recall_audit")
    t_a13 = _steady_state(spark, "a13_pq_recall_audit")
    assert t_a13 <= 2.0 * t_a12 + 1.0, (
        f"a13 took {t_a13:.2f}s vs a12 {t_a12:.2f}s at sf0.01 — check "
        "that _ann_baselines/_pq_model are staged once per (session, "
        "corpus fingerprint) and a13 reads them"
    )


@pytest.mark.bench
@pytest.mark.parametrize("name,bound", GATES, ids=[g[0] for g in GATES])
def test_standing_perf_gate(spark, name, bound):
    factor = _load_factor(spark)
    took = _steady_state(spark, name)
    allowed = bound * factor
    if took > allowed:
        # The session canary can't see a TRANSIENT spike that lands on
        # one gate mid-suite (the d19 flake at suite-load 20: canary
        # 0.17 s measured idle minutes earlier, the gate's own window
        # contended). On breach, re-measure the canary AT FAILURE TIME
        # and re-run once with the fresh factor: a genuine single-query
        # regression reproduces (the re-run is the same measurement,
        # and a real regression doesn't move the canary); a spike has
        # passed or now shows in the fresh canary.
        fresh = max(1.0, _steady_state(spark, "q10_rank_top1") / CANARY_IDLE_SEC)
        retook = _steady_state(spark, name)
        factor, took, allowed = fresh, retook, bound * fresh
    assert took <= allowed, (
        f"{name} took {took:.2f}s at sf0.01 (gate {bound}s x load "
        f"factor {factor:.2f} [session canary "
        f"{_canary_factor['measured']:.2f}s vs idle {CANARY_IDLE_SEC}s] "
        f"= {allowed:.2f}s, breach re-measured) — the r4-class "
        "plan-construction regression is back; check for per-plan eager "
        "checkpoints or artifact consumers re-running their producer stage"
    )
