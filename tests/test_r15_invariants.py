"""Round-15 invariants: the checkpoint lifecycle is BOUNDED (VERDICT
r14 #1) and d19's candidate materialization is scoped (VERDICT r14 #4).

The r14 cascade: ~35 localCheckpoint sites, 3 release points — a long
verify session pinned one block set per invocation until the host ran
out of memory. These tests pin the r15 contract: repeated invocations
hold O(call sites) live checkpoint blocks, never O(invocations).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark import checkpoints as C
from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _storage_bytes(spark) -> int:
    total = 0
    for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
        total += info.memSize() + info.diskSize()
    return total


def test_scoped_checkpoint_keeps_two_generations(spark):
    """The per-site scope frees generations older than 2: four builds
    at one site leave exactly two live checkpoints, and the freed
    generations' blocks are gone from the block manager."""
    site = "test_r15.scope_unit"
    base = _n_persisted(spark)
    gens = [
        C.scoped_checkpoint(site, spark.range(100).withColumn("g", F.lit(i)))
        for i in range(4)
    ]
    live = C._SCOPES[site]
    assert len(live) == C._KEEP == 2
    # the two newest generations still read fine...
    assert gens[-1].count() == 100
    assert gens[-2].count() == 100
    # ...and the block manager holds only them (plus whatever the rest
    # of the suite pinned before this test ran)
    assert _n_persisted(spark) - base <= 2
    for g in live:
        C.free_checkpoint(g)
    C._SCOPES.pop(site, None)


def test_artifact_heavy_session_storage_is_bounded(spark):
    """The driver-loop reproduction, in-suite: run the checkpoint-heavy
    query set (every operator family that materializes per-invocation
    blocks) THREE times each in one session and pin that (a) live
    persisted-RDD count stays bounded and (b) the second and third
    sweeps add NO net persisted RDDs or storage bytes — re-entry frees
    the previous generation, so repeated invocations are storage-flat.
    Pre-r15 every sweep leaked one generation per site (d24 alone: 5)."""
    heavy = [
        "d24_dedup_tier_attribution",  # 5 per-invocation checkpoints
        "d19_lsh_tuning_curve",        # 3 per-leg candidate lists
        "m07_phash_neardup",           # signature seam checkpoint
        "d11_chunk_neardup",           # per-invocation chunk index + sigs
        "d09_minhash_estimate_audit",  # candidate list checkpoint
        "d28_cms_error_audit",         # exact-df checkpoint
        "c02_training_manifest",       # kept-corpus consumer
        "c08_decontamination_agreement",
    ]

    def sweep() -> None:
        for name in heavy:
            QUERIES[name](spark, SF).write.mode("overwrite").format(
                "noop"
            ).save()

    sweep()  # builds session artifacts + first per-invocation generation
    n1, b1 = _n_persisted(spark), _storage_bytes(spark)
    sweep()  # second generation: scopes now hold their _KEEP=2 maximum
    n2, b2 = _n_persisted(spark), _storage_bytes(spark)
    sweep()  # third: every new checkpoint must free one old one
    n3, b3 = _n_persisted(spark), _storage_bytes(spark)

    # flat from sweep 2 to sweep 3: zero net persisted-RDD growth, and
    # storage bytes within 5% (block sizes jitter with partitioning)
    assert n3 <= n2, (n1, n2, n3)
    assert b3 <= b2 * 1.05, (b1, b2, b3)
    # absolute bound: sites x 2 generations + session artifacts, far
    # below the hundreds an O(invocations) leak accumulates
    assert n3 < 60, n3


def test_d19_candidate_lists_are_scoped_not_leaked(spark):
    """d19 (VERDICT r14 #4): each leg's candidate pair list is
    materialized once per invocation under a call-site scope — the
    returned plan reads three ExistingRDD scans for the counts, and a
    second invocation reuses the scope slots instead of pinning three
    more block sets forever."""
    df1 = QUERIES["d19_lsh_tuning_curve"](spark, SF)
    plan = df1._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") >= 3, plan
    sites = [s for s in C._SCOPES if s.startswith("lsh_tuning_curve.cands")]
    assert len(sites) == 3, sorted(C._SCOPES)
    n_before = _n_persisted(spark)
    df2 = QUERIES["d19_lsh_tuning_curve"](spark, SF)
    assert df2.count() == 3
    for s in sites:
        assert len(C._SCOPES[s]) <= C._KEEP
    # the second invocation may top scopes up to 2 generations but
    # never beyond (3 sites x <= 1 net new block set)
    assert _n_persisted(spark) - n_before <= 3
