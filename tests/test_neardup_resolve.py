"""Near-dup resolution: pair lists → keep/drop decisions via connected
components. Transitivity is the point — a chain A~B, B~C with no A~C
pair must still collapse to one canonical doc."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.operators.dedup import neardup_components


def _resolve(spark, doc_ids, pair_list):
    docs = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    pairs = spark.createDataFrame(pair_list, "doc_a long, doc_b long")
    rows = neardup_components(docs, pairs, "doc_id").collect()
    return {r.doc_id: (r.component, r.is_canonical) for r in rows}

def test_chain_and_isolates(spark):
    # chain 1~2, 2~3, 3~4: component 1 keeps only doc 1; 9 isolated
    got = _resolve(spark, [1, 2, 3, 4, 9], [(1, 2), (2, 3), (3, 4)])
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (1, False),
        9: (9, True),
    }


def test_two_components_min_id_wins(spark):
    got = _resolve(spark, [5, 7, 10, 20, 30], [(7, 5), (20, 30), (30, 10)])
    assert got[5] == (5, True) and got[7] == (5, False)
    assert got[10] == (10, True)
    assert got[20] == (10, False) and got[30] == (10, False)


def test_no_pairs_everyone_canonical(spark):
    got = _resolve(spark, [1, 2, 3], [])
    assert all(comp == d and keep for d, (comp, keep) in got.items())


def test_deep_chain_converges_in_log_rounds(spark):
    """The 100x convergence bound (VERDICT r9 #5): with pointer
    doubling the driver-coordinated loop must resolve a planted
    diameter-127 chain in O(log2(diameter)) rounds — ceil(log2(128))
    + 2 (one detection round, one slack) = 9 — not the ~127 rounds
    plain min-label propagation would need. The default
    max_iterations=20 therefore covers diameters ~2^18; this test
    fails if a refactor silently reverts to linear convergence."""
    import math

    n = 128
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = neardup_components(docs, pairs, "doc_id")
    rows = out.collect()
    assert all(r.component == 0 for r in rows), rows[:5]
    assert sum(r.is_canonical for r in rows) == 1
    bound = math.ceil(math.log2(n)) + 2
    assert out._convergence_rounds <= bound, (out._convergence_rounds, bound)


def test_rounds_release_prior_checkpoints(spark):
    """ADVICE r10: each round's localCheckpoint must free the previous
    round's blocks once materialized — a deep chain must NOT pin
    O(rounds x |edge nodes|) storage until ContextCleaner GC. After the
    run exactly the FINAL round's checkpoint (which backs the returned
    plan) may remain persisted."""
    n = 128
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = neardup_components(docs, pairs, "doc_id")
    out.collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    # >= 7 rounds on a 127-deep chain: pre-fix leak would leave ~rounds
    # checkpointed RDDs behind; fixed, only the final one survives
    assert out._convergence_rounds >= 5
    assert after - before <= 1, (before, after, out._convergence_rounds)
