"""Mathematical invariants of the round-8 operator batch — properties
the oracle hash cannot express (it proves Spark == DuckDB, not that
both are RIGHT). Each test pins a law the operator's math must obey on
any corpus, so a same-bug-both-engines regression still fails."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_t32_mixture_shares_sum_to_one_and_weights_capped(spark):
    rows = QUERIES["t32_domain_mixture"](spark, SF).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert 0.0 < r["mix_weight"] <= 5.0, r
        # uniform target: weight ~ target/share, truncated at the cap
        expected = min(5.0, (1.0 / len(rows)) / r["token_share"])
        assert abs(r["mix_weight"] - expected) < 1e-12, r


def test_t33_bpe_pair_mass_bounded_by_corpus_chars(spark):
    """Σ pair_count over ALL pairs = Σ (len(word)-1)·wc — each ranked-out
    pair only removes mass, so the top-50 total must stay under the
    corpus-wide bound; and ranks are a 1..50 permutation."""
    rows = QUERIES["t33_bpe_pairs"](spark, SF).collect()
    assert sorted(r["rnk"] for r in rows) == list(range(1, len(rows) + 1))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bound = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w")
    ).filter(F.length("w") >= 2).agg(
        F.sum(F.length("w") - 1).alias("m")
    ).collect()[0]["m"]
    assert sum(r["pair_count"] for r in rows) <= bound
    # counts are ranked: pair_count non-increasing in rnk
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    counts = [r["pair_count"] for r in by_rank]
    assert counts == sorted(counts, reverse=True)


def test_c11_bucket_cap_and_rank_are_honest(spark):
    rows = QUERIES["c11_diversity_sample"](spark, SF).collect()
    from collections import defaultdict

    buckets = defaultdict(list)
    for r in rows:
        buckets[r["bucket"]].append(r)
    for b, members in buckets.items():
        assert len(members) <= 4, (b, len(members))
        # kept ranks are 1..k contiguous and ordered by quality desc
        ranks = sorted(m["bucket_rank"] for m in members)
        assert ranks == list(range(1, len(members) + 1)), b
        members.sort(key=lambda m: m["bucket_rank"])
        qs = [m["quality_score"] for m in members]
        assert all(a >= b2 for a, b2 in zip(qs, qs[1:])), b
        # a bucket smaller than the cap keeps everything
        assert members[0]["bucket_size"] >= len(members), b
        if members[0]["bucket_size"] < 4:
            assert len(members) == members[0]["bucket_size"], b


def test_d18_decisions_are_consistent(spark):
    rows = QUERIES["d18_incremental_neardup"](spark, SF).collect()
    assert rows, "batch split produced no docs"
    for r in rows:
        if r["decision"] == "novel":
            assert r["matched_doc"] is None and r["jaccard"] is None, r
        else:
            assert r["decision"] == "near_dup_of_corpus", r
            assert r["matched_doc"] is not None, r
            assert r["jaccard"] >= 0.5, r


def test_c12_datasheet_shares_and_median_bounds(spark):
    rows = QUERIES["c12_corpus_datasheet"](spark, SF).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert 0 <= r["dup_docs"] < r["n_docs"], r
        assert 0 <= r["null_text_docs"] <= r["n_docs"], r
        assert r["median_tokens"] * r["n_docs"] >= 0
        # the median doc length can never exceed the per-source mean*2+1
        # bound in general, but it MUST be <= max token mass
        assert r["median_tokens"] <= r["n_tokens"], r


def test_t34_entropy_within_information_bounds(spark):
    """0 <= H <= ln(n_bigrams) up to the quantization step (1e-5/side);
    single-repeated-char docs must sit at exactly H=0."""
    rows = QUERIES["t34_char_entropy"](spark, SF).collect()
    eps = 2e-5
    for r in rows:
        if r["entropy_nats"] is None:
            assert r["n_bigrams"] == 0, r
            continue
        assert r["entropy_nats"] >= -eps, r
        assert r["entropy_nats"] <= math.log(max(r["n_bigrams"], 1)) + eps, r


def test_d19_precision_bounds_and_config_tiling(spark):
    rows = QUERIES["d19_lsh_tuning_curve"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_bands"] * r["rows_per_band"] == 16, r
        assert r["n_verified"] <= r["n_candidates"], r
        if r["n_candidates"]:
            assert abs(
                r["precision"] - r["n_verified"] / r["n_candidates"]
            ) < 1e-15, r


def test_t35_margin_is_top_minus_second_and_nonnegative(spark):
    rows = QUERIES["t35_language_confidence"](spark, SF).collect()
    for r in rows:
        if r["predicted_lang"] is None:
            assert r["margin"] is None, r
            continue
        assert r["margin"] == r["top_score"] - r["second_score"], r
        # the elected language's score is maximal, so margin >= 0
        assert r["margin"] >= 0, r


def test_a17_recall_against_direct_recount(spark):
    """Recompute recall@5 for the 32-dim truncation by hand from the
    two brute-force tables — the audit's join/count must agree."""
    from end_to_end_sales_etl_de_project_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q).collect()
    }
    trunc = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, dim=32).collect()
    }
    audit = {
        r["trunc_dim"]: r
        for r in QUERIES["a17_matryoshka_audit"](spark, SF).collect()
    }
    row = audit[32]
    assert row["n_pairs"] == len(exact)
    assert row["n_hit"] == len(exact & trunc)


def test_a18_norm_bounds_and_totals(spark):
    rows = QUERIES["a18_norm_audit"](spark, SF).collect()
    emb_count = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows) == emb_count
    for r in rows:
        # canonical corpora carry no NULL/short vectors; the planted
        # sweep (test_null_parity_embeddings) exercises n_malformed > 0
        assert r["n_malformed"] == 0, r
        assert 0 <= r["zero_vectors"] <= r["n_vecs"] - r["n_malformed"], r
        assert r["min_norm"] <= r["mean_norm"] <= r["max_norm"], r
        assert r["min_norm"] >= 0.0, r


def test_d20_matrix_is_upper_triangular_and_positive(spark):
    rows = QUERIES["d20_cross_source_dups"](spark, SF).collect()
    for r in rows:
        assert r["source_a"] < r["source_b"], r
        assert r["n_shared_contents"] >= 1, r
    # no pair may appear twice
    pairs = [(r["source_a"], r["source_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_t36_ks_within_unit_interval(spark):
    rows = QUERIES["t36_length_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        if r["ks_stat"] is None:
            assert r["n_old"] == 0 or r["n_new"] == 0, r
            continue
        assert 0.0 <= r["ks_stat"] <= 1.0, r
        assert r["n_old"] > 0 and r["n_new"] > 0, r


def test_c14_fragmentation_accounting(spark):
    rows = QUERIES["c14_packing_fragmentation"](spark, SF).collect()
    docs_total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs_total
    for r in rows:
        assert 0 <= r["docs_cut"] <= r["n_docs"], r
        assert r["cut_points"] >= r["docs_cut"], r
        assert abs(r["frag_rate"] - r["docs_cut"] / r["n_docs"]) < 1e-15, r


def test_t37_verdict_is_conjunction_of_rules(spark):
    from end_to_end_sales_etl_de_project_spark.operators.text import (
        GOPHER_RULE_NAMES,
    )

    rows = QUERIES["t37_gopher_rules"](spark, SF).collect()
    assert rows
    for r in rows:
        vals = [r[name] for name in GOPHER_RULE_NAMES]
        if any(v is False for v in vals):
            assert r["passes_all"] is False, r
        elif all(v is True for v in vals):
            assert r["passes_all"] is True, r
        else:
            assert r["passes_all"] is None, r


def test_c15_attribution_reconciles_with_t37(spark):
    from end_to_end_sales_etl_de_project_spark.operators.text import (
        GOPHER_RULE_NAMES,
    )

    docs = QUERIES["t37_gopher_rules"](spark, SF).collect()
    attr = {r["rule"]: r for r in QUERIES["c15_rule_attribution"](spark, SF).collect()}
    assert set(attr) == set(GOPHER_RULE_NAMES)
    for name in GOPHER_RULE_NAMES:
        n_eval = sum(1 for d in docs if d[name] is not None)
        n_fail = sum(1 for d in docs if d[name] is False)
        assert attr[name]["n_eval"] == n_eval, name
        assert attr[name]["n_fail"] == n_fail, name
        if n_eval:
            assert abs(attr[name]["fail_rate"] - n_fail / n_eval) < 1e-15, name


def test_t38_entropy_bounded_by_log_vocab(spark):
    rows = QUERIES["t38_unigram_entropy"](spark, SF).collect()
    eps = 2e-5
    assert rows
    for r in rows:
        assert -eps <= r["unigram_entropy"] <= math.log(r["vocab_size"]) + eps, r
        assert r["vocab_size"] <= r["n_tokens"], r


def test_a19_histogram_is_nonvacuous_and_conserves_pairs(spark):
    """The shift pairing must produce pairs at every test SF (a shift
    larger than the id span silently empties the audit — the bug the
    first cut shipped), buckets stay on the 20-bin grid, and the total
    equals the exact join cardinality."""
    from end_to_end_sales_etl_de_project_spark.operators.similarity import (
        ISOTROPY_SHIFT,
    )

    rows = QUERIES["a19_isotropy_histogram"](spark, SF).collect()
    assert rows, "vacuous pairing — shift exceeds the id span"
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    assert sum(r["n_pairs"] for r in rows) == n - ISOTROPY_SHIFT
    for r in rows:
        assert 0 <= r["bucket"] <= 19, r
        assert abs(r["cos_lo"] - (r["bucket"] / 10.0 - 1.0)) < 1e-15, r
