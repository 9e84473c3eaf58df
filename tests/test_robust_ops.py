"""Planted-adversarial tests for d15 (prefix duplicates) and e29
(median/MAD hourly anomaly detection) — the corpus-level behavior the
sf-data parity check can't isolate."""

from __future__ import annotations

import datetime as dt

from end_to_end_sales_etl_de_project_spark.plans.registry import QUERIES

# pad to ≥16 chars so every text clears the 16-byte prefix block
_PAD = "zz common padding prefix "


def _write_docs(spark, path, texts):
    rows = [
        (i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_prefix_duplicates_planted(spark, tmp_path):
    base = _PAD + "alpha beta gamma delta epsilon"
    texts = [
        base + " zeta eta theta",          # 0: extension of base (not a prefix of anything)
        base,                              # 1: strict prefix of 0 AND 2 -> flagged
        base + " aardvark",                # 2: sorts BETWEEN 1 and 0; also extends 1
        _PAD + "unrelated words entirely", # 3: not flagged
        base,                              # 4: exact dup of 1 -> flagged too (same text)
        _PAD + "alphabet soup is not a prefix match",  # 5: shares <full prefix, not flagged
    ]
    _write_docs(spark, tmp_path, texts)
    out = QUERIES["d15_prefix_duplicates"](spark, str(tmp_path))
    rows = {r["doc_id"]: r for r in out.collect()}
    # both copies of the prefix text are flagged; nothing else is
    assert set(rows) == {1, 4}
    # the witness extension is the IMMEDIATE successor (doc 2's text,
    # which sorts between the prefix and doc 0's longer extension)
    assert rows[1]["ext_len"] == len(texts[2])
    assert rows[1]["len_chars"] == len(base)


def test_prefix_duplicates_ignores_shared_block_non_prefix(spark, tmp_path):
    # two texts sharing 16+ chars where neither is a prefix of the other
    texts = [
        _PAD + "alpha beta gamma one",
        _PAD + "alpha beta gamma two",
    ]
    _write_docs(spark, tmp_path, texts)
    assert QUERIES["d15_prefix_duplicates"](spark, str(tmp_path)).count() == 0


def _write_events(spark, path, hour_counts):
    """hour_counts: {hour_index: n_events} -> events.parquet."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, n in hour_counts.items():
        for i in range(n):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(hours=h, seconds=i % 3600),
                    eid % 7,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_mad_outliers_flag_spike_not_mean_contaminated(spark, tmp_path):
    # 23 calm hours at 10±1 events, one 500-event spike: a mean/stddev
    # z-score would be dragged by the spike itself; median/MAD flags it
    counts = {h: 10 + (h % 3 - 1) for h in range(23)}
    counts[23] = 500
    _write_events(spark, tmp_path, counts)
    out = QUERIES["e29_hourly_mad_outliers"](spark, str(tmp_path))
    flagged = [r for r in out.collect() if r["is_outlier"]]
    assert len(flagged) == 1
    assert flagged[0]["n_events"] == 500
    assert flagged[0]["median_n"] == 10.0


def test_mad_outliers_constant_series_zero_z(spark, tmp_path):
    # mad == 0 must pin z to 0, never divide by zero
    _write_events(spark, tmp_path, {h: 5 for h in range(12)})
    out = QUERIES["e29_hourly_mad_outliers"](spark, str(tmp_path)).collect()
    assert all(r["robust_z"] == 0.0 and not r["is_outlier"] for r in out)
    assert all(r["mad_n"] == 0.0 for r in out)


def test_containment_flags_embedded_doc_jaccard_misses(spark, tmp_path):
    big_words = " ".join(f"w{i}" for i in range(60))
    small = " ".join(f"w{i}" for i in range(12))   # strict subset of big's shingles
    other = " ".join(f"x{i}" for i in range(12))   # disjoint
    _write_docs(spark, tmp_path, [big_words, small, other])
    out = {(r["doc_a"], r["doc_b"]): r
           for r in QUERIES["d16_containment_pairs"](spark, str(tmp_path)).collect()}
    assert set(out) == {(0, 1)}
    r = out[(0, 1)]
    assert r["containment"] == 1.0          # every small shingle is in big
    assert r["n_a"] == 58 and r["n_b"] == 10  # 3-gram counts (n - 2)
    # the same pair's symmetric jaccard is 10/58 ≈ 0.17 — far below any
    # dedup threshold; containment is what catches it
