"""binaryFile ingestion: raw files → the multimodal asset table."""

from __future__ import annotations

import os

from end_to_end_sales_etl_de_project_spark.operators import multimodal
from end_to_end_sales_etl_de_project_spark.sources.binary_source import (
    read_binary_assets,
)


def _plant(tmp_path):
    files = {
        "a.png": b"\x89PNG\r\n\x1a\nfakeimagebytes",
        "b.WAV": b"RIFF....WAVEfmt fakeaudio",
        "sub/c.txt": b"plain text payload",
        "sub/d": b"\x00\x01\x02raw",
    }
    for rel, content in files.items():
        p = tmp_path / rel
        os.makedirs(p.parent, exist_ok=True)
        p.write_bytes(content)
    return files


def test_assets_shape_formats_and_payloads(spark, tmp_path):
    files = _plant(tmp_path)
    df = read_binary_assets(spark, str(tmp_path), source="unit")
    assert [f.name for f in df.schema.fields] == [
        "asset_id",
        "payload",
        "meta",
        "asset_path",
        "modified_at",
    ]
    rows = {os.path.relpath(r["asset_path"].replace("file:", ""), str(tmp_path)): r
            for r in df.collect()}
    assert set(rows) == set(files)
    for rel, content in files.items():
        r = rows[rel]
        assert bytes(r["payload"]) == content
        assert r["meta"]["n_bytes"] == len(content)
        assert r["meta"]["source"] == "unit"
    assert rows["a.png"]["meta"]["format"] == "image"
    assert rows["b.WAV"]["meta"]["format"] == "audio"  # case-folded ext
    assert rows["sub/c.txt"]["meta"]["format"] == "txt"
    assert rows["sub/d"]["meta"]["format"] == "bin"  # no extension
    # ids: distinct per path, stable across reads
    ids = {rel: r["asset_id"] for rel, r in rows.items()}
    assert len(set(ids.values())) == len(ids)
    again = {os.path.relpath(r["asset_path"].replace("file:", ""), str(tmp_path)):
             r["asset_id"]
             for r in read_binary_assets(spark, str(tmp_path)).collect()}
    assert again == ids


def test_glob_and_recursion_controls(spark, tmp_path):
    _plant(tmp_path)
    only_png = read_binary_assets(spark, str(tmp_path), glob="*.png")
    assert only_png.count() == 1
    flat = read_binary_assets(spark, str(tmp_path), recursive=False)
    assert {os.path.basename(r["asset_path"]) for r in flat.collect()} == {
        "a.png",
        "b.WAV",
    }


def test_assets_feed_the_feature_extractor(spark, tmp_path):
    _plant(tmp_path)
    assets = read_binary_assets(spark, str(tmp_path)).select(
        "asset_id", "payload", "meta"
    )
    feats = multimodal.extract_features(assets, decode_stub=True)
    out = feats.collect()
    assert len(out) == 4
    assert all(r["n_bytes"] > 0 for r in out)


def test_min_partitions_is_a_true_minimum(spark, tmp_path):
    """min_partitions must only INCREASE parallelism (ADVICE r5): when
    the binaryFile scan already yields more partitions than requested,
    no repartition — and no full shuffle of the payloads — happens."""
    from end_to_end_sales_etl_de_project_spark.sources.binary_source import (
        read_binary_assets,
    )

    for i in range(8):
        (tmp_path / f"f{i}.bin").write_bytes(b"x" * 64)
    assets = read_binary_assets(spark, str(tmp_path), min_partitions=2)
    scanned = read_binary_assets(spark, str(tmp_path)).rdd.getNumPartitions()
    if scanned >= 2:  # the scan already satisfied the minimum
        assert assets.rdd.getNumPartitions() == scanned
    grown = read_binary_assets(spark, str(tmp_path), min_partitions=scanned + 4)
    assert grown.rdd.getNumPartitions() == scanned + 4
