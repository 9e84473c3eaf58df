"""Planted-NULL oracle parity: the canonical testdata has no NULL
text/lang/source, so a Spark-vs-DuckDB NULL-semantics divergence can
hide behind green driver rows indefinitely (exactly how the round-7
dsir_importance bug stayed invisible). This suite re-runs the
document-family queries of the CURRENT driver window over a corpus
with NULLs planted in every nullable column — any divergence must be
fixed while the query already holds a window slot (so re-earning
driver evidence is already scheduled), never discovered later.

Scope is deliberately the window ∩ documents-readers: out-of-window
queries are exercised as they rotate in (extending this corpus is the
r8+ follow-up), keeping fixes staleness-safe by construction.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

import __spark_entry__ as E
from end_to_end_sales_etl_de_project_spark.plans.registry import (
    DRIVER_WINDOW,
    ORACLES,
)
from end_to_end_sales_etl_de_project_spark.testing import (
    compare_spark_to_oracle,
    run_oracle,
)

# In-window document-readers deliberately OUTSIDE the parity sweep,
# each with its own dedicated pin below. An exclusion must name a
# registered oracle (test_exclusions_are_registered) so it cannot
# silently outlive a query rename/removal.
SWEEP_EXCLUSIONS = {
    "d15_prefix_duplicates",  # fail-loud precondition, pinned below
}

import re as _re

_READER_PAT = _re.compile(r"\bdocuments\b")

# Sweep scope is DERIVED (VERDICT r9 #1): window ∩ oracle-references-
# documents, minus the documented exclusions. Rotations update the
# sweep automatically — the r9 failure mode (d23 displaced e17 after
# the hand list was written) cannot recur by construction.
WINDOW_DOC_QUERIES = sorted(
    n
    for n in DRIVER_WINDOW
    if n in ORACLES and _READER_PAT.search(ORACLES[n]) and n not in SWEEP_EXCLUSIONS
)

_PAR = " pellentesque habitant morbi tristique senectus et netus et malesuada fames"


def _planted_rows():
    """Docs exercising every NULL/degenerate corner the synthetic
    corpus lacks, plus enough normal/near-dup content that the dedup
    paths stay non-vacuous. d15 requires texts >= 16 chars or < 16
    uniformly — keep every non-NULL text >= 16 chars."""
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy badgers watch from the old stone bridge" + _PAR * 3
    )
    rows = [
        (0, base, "en", "web", len(base)),
        (1, base + " appended tail words here", "en", "web", len(base) + 25),
        (2, base, "en", "books", len(base)),  # exact dup of 0, other source
        (3, "completely different arctic penguins assemble quietly near "
            "the frozen shoreline under pale green auroras tonight" + _PAR * 2,
         "fr", "web", 113),
        (4, None, "en", "web", 0),            # NULL text
        (5, base[:40] + " un texte distinct pour la suite du corpus" + _PAR,
         None, "web", 82),                    # NULL lang
        (6, "another moderately long document about rivers mountains "
            "oceans forests and the deserts beyond them" + _PAR * 2,
         "en", None, 98),                     # NULL source
        (7, None, None, None, None),          # all NULL
    ]
    return rows


@pytest.fixture(scope="module")
def null_sf_dir(spark, sf_dir, tmp_path_factory):
    """A full sf-dir clone whose documents.parquet is the planted
    corpus — queries and oracles both read it through their normal
    loaders, so NULL semantics are compared end-to-end."""
    d = tmp_path_factory.mktemp("null-corpus")
    for name in os.listdir(sf_dir):
        if name != "documents.parquet":
            shutil.copy(os.path.join(sf_dir, name), d / name)
    df = spark.createDataFrame(
        _planted_rows(),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staged = str(d / "_docs_staged")
    df.coalesce(1).write.parquet(staged)
    part = [f for f in os.listdir(staged) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(staged, part), d / "documents.parquet")
    shutil.rmtree(staged)
    return str(d)


@pytest.fixture(scope="module")
def null_con(null_sf_dir):
    from end_to_end_sales_etl_de_project_spark.testing import duckdb_connection

    return duckdb_connection(null_sf_dir)


def test_exclusions_are_registered():
    """A stale exclusion (renamed/removed query) must fail loudly, not
    silently stop matching anything."""
    for name in SWEEP_EXCLUSIONS:
        assert name in ORACLES, f"stale sweep exclusion: {name}"


def test_sweep_is_nonvacuous():
    """A rotation that empties the sweep would silently disable the
    whole NULL-parity class for this family — fail instead."""
    assert WINDOW_DOC_QUERIES, "no in-window documents-readers — sweep vacuous"


def test_d15_guard_fires_on_short_text_not_null(spark, tmp_path, null_sf_dir):
    """d15's documented precondition (every text >= 16 chars for the
    16-byte prefix blocks) must still fail LOUDLY on a SHORT non-NULL
    text — but NULL text is outside prefix-dedup scope (r11: the raise
    on NULL was a sweep crash, not a semantics; the oracle's length
    predicates NULL-propagate those rows away), so the NULL corpus now
    hash-checks in the parity sweep below instead of raising."""
    import shutil

    d = tmp_path / "short"
    d.mkdir()
    for name in os.listdir(null_sf_dir):
        if name != "documents.parquet":
            shutil.copy(os.path.join(null_sf_dir, name), d / name)
    df = spark.createDataFrame(
        [(1, "tiny text", "en", "web", 9),
         (2, "long enough document text for the block key", "en", "web", 44)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staged = str(d / "_st")
    df.coalesce(1).write.parquet(staged)
    part = [f for f in os.listdir(staged) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(staged, part), d / "documents.parquet")
    shutil.rmtree(staged)
    with pytest.raises(Exception, match="prefix blocking requires"):
        E.queries()["d15_prefix_duplicates"](spark, str(d)).collect()


def test_m03_null_payload_emits_no_frames(spark, null_sf_dir):
    """r7 debt pin FLIPPED (r8): sample_frames now skips NULL payloads
    (no frames — nothing to decode), matching the oracle where NULL
    lengths fall out of every frame-window predicate. The full
    oracle-parity check runs in the sweep below; this pin keeps the
    specific regression visible by name."""
    frames = E.queries()["m03_frame_sample"](spark, null_sf_dir)
    null_doc_ids = {4, 7}  # _planted_rows: the NULL-text docs
    got = {r["asset_id"] for r in frames.select("asset_id").distinct().collect()}
    assert not (got & null_doc_ids), "NULL-payload docs emitted frames"
    assert got, "non-NULL docs must still emit frames"


@pytest.mark.parametrize("name", WINDOW_DOC_QUERIES)
def test_null_corpus_oracle_parity(spark, null_sf_dir, null_con, name):
    r = compare_spark_to_oracle(
        name,
        E.queries()[name](spark, null_sf_dir),
        run_oracle(null_con, E.oracle_sql()[name]),
    )
    assert r.match, f"{name} diverges on NULLs: {r.mismatches[:3]}"
