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


def test_probe_cost_empty_query_set_emits_no_rows(spark):
    """r11 review finding: with an empty QUERY set each probe-width leg
    must emit ZERO rows exactly like the DuckDB twin's GROUP BY over
    zero input — a global agg would manufacture an n_queries=0 row the
    oracle doesn't have (and a NaN scan_frac with it)."""
    from end_to_end_sales_etl_de_project_spark.operators import similarity

    emb = spark.createDataFrame(
        [(100 + i, [float(i % 5 - 2) / 8] * similarity.DIM, 1) for i in range(20)],
        "vec_id long, embedding array<float>, label int",
    )
    cents = similarity.ivf_train(emb, 4)
    out = similarity.ivf_probe_cost(
        emb, emb.filter("vec_id < 8"), centroids=cents
    )
    assert out.count() == 0


def test_pure_bmp_decoder_rejects_out_of_palette_pixels(spark):
    """r11 review finding: a BMP whose raster indexes beyond its
    declared palette must route to the fallback seam (decode -> None),
    never die with a raw IndexError inside the worker."""
    import struct

    from end_to_end_sales_etl_de_project_spark.operators.multimodal import (
        _pure_gray_decoder,
    )

    # 2-entry palette, but a raster byte of 5
    pal = bytes((0, 0, 0, 0)) + bytes((255, 255, 255, 0))
    rows = bytes([5, 0, 0, 0])  # 1px wide, stride-padded
    off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, len(rows), 0, 0, 2, 0)
    assert _pure_gray_decoder()(hdr + info + pal + rows) is None
