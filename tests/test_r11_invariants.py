"""Behavioral laws for the round-11 changes — the ADVICE r10 guard
fixes: staged-artifact consumers must refuse inconsistent inputs
loudly instead of silently recomputing or mis-keying."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.operators import dedup


def test_lsh_pairs_refuses_signatures_without_index(spark):
    """ADVICE r10: minhash_lsh_pairs used to silently IGNORE a passed
    `signatures` table when `hashed_shingles` was None (recomputing
    everything from docs) while every sibling consumer honors staged
    signatures unconditionally. A caller staging only the signature
    artifact must get an error, not different signatures."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    sigs = spark.createDataFrame(
        [tuple([1] + [0] * 16)],
        "doc long, " + ", ".join(f"mh{i} long" for i in range(16)),
    )
    with pytest.raises(ValueError, match="requires `hashed_shingles`"):
        dedup.minhash_lsh_pairs(docs, "doc_id", "text", signatures=sigs)


def test_split_shingle_tables_refuses_k_mismatch(spark):
    """ADVICE r10: split_shingle_tables now runs the same _check_index_k
    guard as every other pre-hashed consumer — a k-mismatched session
    index must not silently produce a wrong-k Bloom audit (and a chosen
    m derived from it)."""
    docs = spark.createDataFrame(
        [(1, "a b c d", "s1")], "doc_id long, text string, source string"
    )
    idx = docs.select(
        F.col("doc_id").alias("doc"), F.lit(42).cast("long").alias("shingle")
    )
    idx._shingle_k = 5
    with pytest.raises(ValueError, match="k=5"):
        dedup.split_shingle_tables(docs, hashed_shingles=idx, k=3)
    # matching k passes (and an unstamped index is never refused)
    dedup.split_shingle_tables(docs, hashed_shingles=idx, k=5)
