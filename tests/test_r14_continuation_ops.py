"""Behavioral invariants for the r14-continuation operators —
properties the oracle hash cannot express directly: t42's output must
be PARTITION-INDEPENDENT (the Misra-Gries merge guarantee), d28's CMS
estimates must be one-sided, and a24's census must count a
hand-computable graph exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.operators import similarity, text
from end_to_end_sales_etl_de_project_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _ft_rows(df):
    return sorted(
        (r["token"], r["n_token"], r["total_tokens"]) for r in df.collect()
    )


def test_t42_output_is_partition_independent(spark):
    """The whole point of the sketch-then-verify design: the candidate
    SET may vary with partitioning, but the verified output may not.
    Run the operator over adversarial partitionings (one partition =
    the pure-stream MG; many tiny partitions = maximal summary
    merging) and pin identical results."""
    docs = load_table(spark, SF, "documents")
    baseline = _ft_rows(text.frequent_tokens(docs, capacity=128))
    assert baseline, "fixture corpus should yield heavy hitters"
    for parts in (1, 7, 61):
        got = _ft_rows(text.frequent_tokens(docs.repartition(parts), capacity=128))
        assert got == baseline, f"partitioning {parts} changed the output"


def test_t42_matches_plain_group_by(spark):
    """The sketch path equals the exact GROUP BY + HAVING it claims to
    reproduce, computed independently Spark-side (the DuckDB twin is
    the cross-engine check; this is the same-engine one)."""
    docs = load_table(spark, SF, "documents")
    got = _ft_rows(text.frequent_tokens(docs, capacity=128))
    toks = docs.select(F.explode(text.tokens("text")).alias("token"))
    total = toks.count()
    want = sorted(
        (r["token"], r["n"], total)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .filter(F.col("n") * 128 > F.lit(total))
        .collect()
    )
    assert got == want


def test_d28_estimates_are_one_sided_and_width_monotone_in_law(spark):
    """CMS structural laws on the fixture corpus: est >= exact for
    every key (one-sided by construction → n_over <= n_keys, errors
    non-negative), n_keys identical across grid rows (the ground truth
    is width-independent), and the 4-row depth recorded as declared."""
    import __spark_entry__ as E

    rows = E.queries()["d28_cms_error_audit"](spark, SF).collect()
    assert len(rows) == 4
    n_keys = {r["n_keys"] for r in rows}
    assert len(n_keys) == 1 and n_keys.pop() > 0
    for r in rows:
        assert r["depth"] == 4
        assert 0 <= r["n_over"] <= r["n_keys"]
        assert r["sum_err"] >= 0 and r["max_err"] >= 0
        assert r["sum_err"] == 0 or r["max_err"] > 0
        assert abs(r["over_rate"] - r["n_over"] / r["n_keys"]) == 0.0


def test_a24_counts_a_handmade_graph_exactly(spark):
    """Feed a known graph through the census: K4 on {1,2,3,4} (every
    triple a triangle) plus a pendant 5-6 edge and an isolate 7.
    Directed duplicate edges must symmetrize away; expected per-node
    (degree, n_tri, lcc) is hand-computable."""
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (2, 1), (4, 3),                                  # directed dups
        (5, 6),                                          # pendant pair
    ]
    graph = spark.createDataFrame(
        [(a, b, 1, 1.0) for a, b in edges],
        "query_id long, neighbor_id long, rank int, cosine double",
    )
    emb = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "vec_id long"
    )
    got = {
        r["vec_id"]: (r["degree"], r["n_tri"], r["lcc"])
        for r in similarity.knn_triangles(emb, graph=graph).collect()
    }
    assert got == {
        1: (3, 3, 1.0),
        2: (3, 3, 1.0),
        3: (3, 3, 1.0),
        4: (3, 3, 1.0),
        5: (1, 0, 0.0),
        6: (1, 0, 0.0),
        7: (0, 0, 0.0),
    }


def test_t42_mg_guarantee_on_adversarial_spread(spark):
    """Synthetic corpus with a KNOWN answer: token 'a' holds 30 of 100
    occurrences (> total/capacity at capacity 4) but is spread one-ish
    per partition among distinct junk, so no partition sees it
    dominate locally — the Misra-Gries merge guarantee (undercount <=
    N/(cap+1)) must still surface it, and the strict exact-count
    filter must emit EXACTLY {a} for every partitioning."""
    rows = [("a",)] * 30 + [(f"junk{i}",) for i in range(70)]
    docs = spark.createDataFrame(rows, "text string")
    for parts in (1, 10, 37):
        got = _ft_rows(text.frequent_tokens(docs.repartition(parts), capacity=4))
        assert got == [("a", 30, 100)], f"partitioning {parts}: {got}"


def test_d29_chooser_laws(spark):
    """The curve-driven chooser's contract on synthetic curves: the
    qualifying config with most verified pairs wins (ties to fewer
    candidates, then fewer bands); NULL precision never qualifies;
    with no qualifier the most-pairs fallback applies."""
    from end_to_end_sales_etl_de_project_spark.operators.dedup import (
        lsh_choose_config,
    )

    schema = (
        "n_bands long, rows_per_band long, n_candidates long,"
        " n_verified long, precision double"
    )
    mk = lambda rows: spark.createDataFrame(rows, schema)
    # qualifying (>=0.9) subset: (2,8) and (4,4); (4,4) has more pairs
    assert lsh_choose_config(
        mk([(2, 8, 27, 27, 1.0), (4, 4, 28, 28, 1.0), (8, 2, 40, 28, 0.7)])
    ) == (4, 4)
    # tie on pairs AND candidates -> fewer bands
    assert lsh_choose_config(
        mk([(2, 8, 25, 25, 1.0), (4, 4, 25, 25, 1.0), (8, 2, 33, 25, 0.75)])
    ) == (2, 8)
    # nothing qualifies -> most pairs regardless of precision
    assert lsh_choose_config(
        mk([(2, 8, 100, 10, 0.1), (4, 4, 200, 40, 0.2), (8, 2, 300, 30, 0.1)])
    ) == (4, 4)
    # NULL precision (zero candidates) never qualifies
    assert lsh_choose_config(
        mk([(2, 8, 0, 0, None), (4, 4, 10, 9, 0.9)])
    ) == (4, 4)


def test_d29_output_carries_the_curve_choice(spark):
    """d29's stamped config must equal the chooser's pick over the
    live d19 curve, and its pairs must equal d03-at-that-config."""
    import __spark_entry__ as E
    from end_to_end_sales_etl_de_project_spark.operators.dedup import (
        lsh_choose_config,
    )

    curve = E.queries()["d19_lsh_tuning_curve"](spark, SF)
    nb, rpb = lsh_choose_config(curve)
    rows = E.queries()["d29_tuned_neardup"](spark, SF).collect()
    assert rows
    assert {(r["n_bands"], r["rows_per_band"]) for r in rows} == {(nb, rpb)}


def test_a24_matches_bruteforce_on_random_graphs(spark):
    """The degree-orientation logic is the census's only subtle part —
    cross-check the operator against a brute-force Python triangle
    count on seeded random graphs (including duplicate directed edges
    and isolates), so an orientation/tie bug that happens to pass the
    K4 fixture still trips."""
    import itertools
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 24
        edges = {
            (a, b)
            for a in range(1, n + 1)
            for b in range(1, n + 1)
            if a != b and rng.random() < 0.12
        }
        und = {(min(a, b), max(a, b)) for a, b in edges}
        adj = {v: set() for v in range(1, n + 1)}
        for a, b in und:
            adj[a].add(b)
            adj[b].add(a)
        tri = {v: 0 for v in range(1, n + 1)}
        for x, y, z in itertools.combinations(range(1, n + 1), 3):
            if y in adj[x] and z in adj[x] and z in adj[y]:
                tri[x] += 1
                tri[y] += 1
                tri[z] += 1
        want = {}
        for v in range(1, n + 1):
            d = len(adj[v])
            lcc = (2.0 * tri[v]) / (d * (d - 1)) if d >= 2 else 0.0
            want[v] = (d, tri[v], lcc)
        graph = spark.createDataFrame(
            [(a, b, 1, 1.0) for a, b in sorted(edges)],
            "query_id long, neighbor_id long, rank int, cosine double",
        )
        emb = spark.createDataFrame(
            [(v,) for v in range(1, n + 1)], "vec_id long"
        )
        got = {
            r["vec_id"]: (r["degree"], r["n_tri"], r["lcc"])
            for r in similarity.knn_triangles(emb, graph=graph).collect()
        }
        assert got == want, f"seed {seed}"
