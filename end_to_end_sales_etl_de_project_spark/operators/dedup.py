"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH banding, n-gram Jaccard, SimHash.

Not in the reference (its only dedup is ``distinct()``, SURVEY §2.4);
these are first-class engine operators for corpus curation.

Scale design (the part that matters at 100 TB):

- **Exact dedup** hashes the text once (JVM-side md5) and groups on the
  digest — the shuffle carries 60-bit keys + ids, never the documents.
- **MinHash/LSH** is linear in corpus size: per doc, one pass computes
  the signature (explode shingles → groupBy doc with N min-aggs, all
  map-side combinable); banding turns the quadratic all-pairs problem
  into equi-joins on (band, key) — only docs sharing a band bucket are
  ever paired. Verification computes true Jaccard only for candidates.
- **SimHash** is one explode + one groupBy with 32 conditional sums;
  near-dup lookup is then a cheap equality/prefix join on the
  fingerprint.
- No Python anywhere: every hash is the portable md5-based ``h60``
  (``functions/hashing.py``), so every stage is oracle-checkable AND
  stays inside whole-stage codegen.

Hot-key note: a shingle appearing in a large fraction of docs (boiler-
plate) creates a skewed band bucket; AQE skew handling plus the
``max_bucket_size`` guard (drop pathological buckets, standard practice
— e.g. Spark's MinHashLSH ignores them too) bound the blowup.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from end_to_end_sales_etl_de_project_spark.functions.hashing import (
    h60,
    h60_seeded,
    h60_sql,
    minhash_family,
    minhash_family_sql,
)
from end_to_end_sales_etl_de_project_spark.operators.text import (
    corpus_split,
    corpus_split_sql,
    shingles_from_tokens,
    tokens,
    tokens_sql,
    word_shingles_sql,
)

def _free_local_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a ``localCheckpoint(eager=True)``
    DataFrame that no later plan references.

    PySpark exposes no public unpersist for checkpoints — ``Dataset.
    unpersist`` only uncaches CacheManager entries — so iterative
    operators that checkpoint per round (``neardup_components``) would
    otherwise pin O(rounds × blocks) storage until the ContextCleaner
    happens to GC the orphaned RDDs (ADVICE r10). The checkpointed
    Dataset's analyzed plan is a ``LogicalRDD`` holding the persisted
    RDD; unpersist that directly. Best-effort by design: only fires
    when the plan node really is a LogicalRDD, and any reflection
    failure falls back to the ContextCleaner path (a leak, never a
    correctness issue). NEVER call this while a downstream plan may
    still recompute from the checkpoint — local checkpoints have no
    lineage to rebuild from.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct text: canonical (min) id + copy count.
    Grouping key is the md5-int of the text, not the text itself — the
    shuffle moves 8-byte keys."""
    return (
        docs.select(F.col(id_col), h60(text_col).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_groups_sql(id_col: str, text_col: str, table: str = "documents") -> str:
    return f"""
SELECT {h60_sql(text_col)} AS text_hash,
       MIN({id_col}) AS canonical_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM {table}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Shingles + true Jaccard (used standalone and as LSH verification)
# ---------------------------------------------------------------------------


def shingle_table(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) — one row per distinct k-word shingle per doc.

    Tokenization is materialized in its own projection step so the
    lower+split+filter chain runs once per DOC, not once per shingle
    inside the transform lambda (6.5x on the explode, measured sf0.1 —
    see ``text.shingles_from_tokens``). This matters ×3 downstream:
    self-join sides and the sizes aggregate each re-execute this
    subtree."""
    toked = docs.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("toks")
    )
    return toked.select(
        "doc",
        F.explode(shingles_from_tokens(F.col("toks"), k)).alias("shingle"),
    )


def jaccard_pairs(
    shingles: DataFrame,
    min_jaccard: float,
    candidates: DataFrame | None = None,
    max_df: int | None = None,
    pre_hashed: bool = False,
) -> DataFrame:
    """All-pairs (or candidate-restricted) Jaccard over shingle sets.

    Without ``candidates``, pairs are generated by the shared-shingle
    equi-join — only docs with ≥1 common shingle are compared (never a
    cross join). With ``candidates`` (doc_a, doc_b), the intersection
    join is restricted to those pairs (the LSH verify path).

    ``max_df`` is the stop-shingle guard for the all-pairs path: a
    shingle occurring in more than ``max_df`` docs is removed from the
    universe BEFORE the self-join (both intersection and union — the
    Jaccard stays a true Jaccard over the reduced universe). This is
    the df-capping every production shingle-dedup applies: a
    boilerplate shingle in m docs would contribute O(m²) join rows
    while carrying no near-dup signal precisely because it is
    everywhere. Sizes are computed after the filter so semantics stay
    exactly mirrorable in SQL.

    The join/group key is the 60-bit md5 of the shingle, not the string:
    the self-join shuffle carries 8-byte longs instead of ~20-byte
    shingle text (same discipline as exact dedup's text_hash). The SQL
    twins hash with the identical md5-int, so even the (vanishingly
    rare) collision behavior matches bit-for-bit.

    In the ALL-PAIRS path the hashed (doc, shingle) table feeds three
    consumers (both self-join sides and the sizes aggregate; plus the
    df-cap when ``max_df`` is set) and Spark does NOT reuse the
    exchanges — the alias-renamed subtrees differ by expression ids, so
    each consumer would re-run the corpus explode. It is therefore
    materialized ONCE (localCheckpoint of two-long rows — measured
    3.2 s → 1.3-1.9 s at sf0.1; on a real cluster use a reliable
    checkpoint dir), exactly where a production shingle pipeline
    persists its inverted index. The CANDIDATES path skips the
    checkpoint: it runs inside larger compositions (LSH verify, the
    curation capstone) where the eager blocking job serializes the DAG
    and recompute is cheaper (measured: +2.5 s on the capstone with the
    checkpoint forced).
    """
    if pre_hashed:
        # the caller hands the (doc, shingle-md5-60bit) table already
        # materialized (and already df-capped if it wants a cap) — e.g.
        # the session's memoized shingle index in plans/documents.py.
        # Skipping the re-hash AND the per-plan checkpoints here is what
        # lets many queries share ONE materialization of the inverted
        # index per session, the way a production pipeline persists it.
        if max_df is not None:
            raise ValueError(
                "pre_hashed inputs must be df-capped by the caller — "
                "passing max_df too would re-cap a capped universe"
            )
    elif max_df is not None:
        shingles = shingles.select("doc", h60(F.col("shingle")).alias("shingle"))
        # checkpoints fire only on the all-pairs path: the CANDIDATES
        # path runs inside larger compositions where the eager blocking
        # job serializes the DAG and recompute is cheaper (see
        # docstring) — the df-cap itself still applies either way
        if candidates is None:
            shingles = shingles.localCheckpoint(eager=True)
        kept = (
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        # re-materialize post-cap: the reduced table is what the
        # self-join and sizes read (3 consumers again)
        pre_cap = shingles
        shingles = shingles.join(kept, "shingle")
        if candidates is None:
            shingles = shingles.localCheckpoint(eager=True)
            # the capped checkpoint is materialized; the pre-cap blocks
            # have no remaining consumer (ADVICE r10 hygiene)
            _free_local_checkpoint(pre_cap)
    else:
        shingles = shingles.select("doc", h60(F.col("shingle")).alias("shingle"))
        if candidates is None:
            shingles = shingles.localCheckpoint(eager=True)
    sizes = shingles.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    if candidates is not None:
        # Intersections ONLY for candidate pairs: route each pair to its
        # docs' shingles and count matches. Crucially this never builds
        # the all-pairs-per-shingle blowup — a hot shingle appearing in
        # m docs costs O(m) here, not O(m²). This is what makes LSH
        # verification linear-ish at corpus scale.
        a = shingles.alias("a")
        b = shingles.alias("b")
        counted = (
            candidates.join(a, F.col("doc_a") == F.col("a.doc"))
            .join(
                b,
                (F.col("doc_b") == F.col("b.doc"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        # candidate pairs with ZERO common shingles must surface as
        # jaccard 0.0 (matters when min_jaccard <= 0, e.g. measuring
        # the LSH false-positive rate) — left-join back and fill 0
        inter = candidates.join(counted, ["doc_a", "doc_b"], "left").withColumn(
            "n_common", F.coalesce(F.col("n_common"), F.lit(0))
        )
    else:
        a = shingles.alias("a")
        b = shingles.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def ngram_jaccard_pairs_sql(
    id_col: str,
    text_col: str,
    k: int,
    min_jaccard: float,
    table: str = "documents",
    max_df: int | None = None,
) -> str:
    sh = word_shingles_sql(text_col, k)
    df_cap = (
        f"""
shk AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
kept AS (SELECT shingle FROM shk GROUP BY 1 HAVING COUNT(*) <= {max_df}),
sh AS (SELECT shk.doc, shk.shingle FROM shk JOIN kept USING (shingle)),"""
        if max_df is not None
        else f"""
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),"""
    )
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),{df_cap}
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc
JOIN sizes sb ON doc_b = sb.doc
WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= {min_jaccard}
"""


# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(
    shingles: DataFrame, n_hashes: int, pre_hashed: bool = False
) -> DataFrame:
    """One row per doc with columns mh0..mh{n-1}: min over the doc's
    shingles of each hash-family member. The shingle is md5-hashed ONCE;
    the n family members are integer ops on that value (16x fewer md5s —
    minhash at corpus scale is hash-bound). Single groupBy, map-side
    combinable.

    ``pre_hashed``: the input is already the (doc, shingle-md5-60bit)
    table (e.g. the session's materialized shingle index) — skip the
    md5."""
    from end_to_end_sales_etl_de_project_spark.functions.hashing import PERM_PARAMS

    if n_hashes > len(PERM_PARAMS):
        raise ValueError(
            f"n_hashes={n_hashes} exceeds the {len(PERM_PARAMS)} fixed hash-family "
            "parameters in functions/hashing.py — extend PERM_PARAMS (and the "
            "oracle generator) to go wider"
        )
    if pre_hashed:
        hashed = shingles.select("doc", F.col("shingle").alias("h"))
    else:
        hashed = shingles.select("doc", h60(F.col("shingle")).alias("h"))
    aggs = [F.min(minhash_family(F.col("h"), s)).alias(f"mh{s}") for s in range(n_hashes)]
    return hashed.groupBy("doc").agg(*aggs)


DEFAULT_MAX_BUCKET_SIZE = 32


def _check_index_k(hashed_shingles: DataFrame, k: int) -> None:
    """Refuse a pre-hashed shingle index built at a different k than
    the caller requested: the k argument is otherwise silently ignored
    on the pre-hashed path, and a k=5 oracle against a k=3 index is a
    guaranteed hash mismatch (or, worse, silently wrong dedup
    decisions). The session memo stamps ``_shingle_k`` on the artifact;
    indexes from other sources (no stamp) pass unchecked."""
    hk = getattr(hashed_shingles, "_shingle_k", None)
    if hk is not None and hk != k:
        raise ValueError(
            f"hashed_shingles was built at k={hk} but the caller requested "
            f"k={k} — pass a matching index or drop the override"
        )


def _check_sig_n(signatures: DataFrame, n_hashes: int) -> None:
    """Refuse a pre-built signature table whose hash-family width does
    not match the caller's n_hashes — the column set is the contract
    (doc + mh0..mh{n-1}), so the check needs no stamp."""
    want = {"doc"} | {f"mh{s}" for s in range(n_hashes)}
    if set(signatures.columns) != want:
        raise ValueError(
            f"signatures columns {sorted(signatures.columns)} do not match "
            f"n_hashes={n_hashes} (want doc + mh0..mh{n_hashes - 1})"
        )


def _pruned_buckets(
    buckets: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """Apply the hot-bucket guard shared by the dedup self-join and the
    decontamination cross-join: (band, key) buckets holding more than
    ``max_bucket_size`` docs are dropped BEFORE any candidate join (the
    O(m²) blowup guard — see ``lsh_candidate_pairs``)."""
    if max_bucket_size is None:
        return buckets
    hot = (
        buckets.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket_size)
        .select("band", "key")
    )
    return buckets.join(F.broadcast(hot), ["band", "key"], "left_anti")


def _band_bucket_rows(
    signatures: DataFrame, n_bands: int, rows_per_band: int
) -> DataFrame:
    """(doc, band, key) rows from an mh0..mhN signature table — the LSH
    bucket membership shared by the self-join (dedup) and cross-join
    (decontamination) candidate generators."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select("doc", F.explode(bands).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int,
    rows_per_band: int,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Docs sharing any band (bucket) of the signature. Bands are
    exploded into (band_id, band_key) rows; candidates come from the
    equi-self-join per bucket.

    ``max_bucket_size`` is the hot-bucket guard: a (band, key) bucket
    holding more than this many docs is dropped BEFORE the self-join —
    a boilerplate signature shared by m docs would otherwise create an
    O(m²) pair blowup in one bucket (the same guard Spark's MinHashLSH
    applies). Oversized buckets are overwhelmingly exact/near-exact
    duplicates, which belong to the exact-dedup stage that precedes
    near-dedup in a curation pipeline. Hot buckets are by definition
    few, so the drop-list is broadcast (anti-join); the measured max
    real bucket on this corpus is 4, so the default of 32
    (``DEFAULT_MAX_BUCKET_SIZE``) never fires on healthy data. ``None``
    disables the guard."""
    buckets = _pruned_buckets(
        _band_bucket_rows(signatures, n_bands, rows_per_band), max_bucket_size
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.5,
    persist_shingles: bool = False,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    hashed_shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs: shingle → sign → band →
    candidate (hot buckets dropped, see ``lsh_candidate_pairs``) →
    verify true Jaccard ≥ threshold.

    ``persist_shingles`` trades recompute for cache: since the
    single-md5 hash family made signatures cheap, re-shingling per
    subtree is FASTER than materializing the exploded table through the
    cache (measured 2.1s vs 13.1s at sf0.1) — default False. Turn it on
    only when the corpus scan itself is the bottleneck (expensive
    remote storage / decompression), and note the cached RDD then lives
    until LRU eviction or ``spark.catalog.clearCache()``.

    ``hashed_shingles``: an already-materialized (doc, shingle-md5)
    index for the SAME corpus/k — signatures and verify both read it
    instead of re-shingling (the session-memo path in
    plans/documents.py). ``docs``/``text_col`` are ignored then.

    ``signatures``: an already-materialized (doc, mh0..mh{n-1})
    signature table for the same index (requires ``hashed_shingles``;
    ``_check_sig_n`` refuses an n_hashes mismatch) — the signature
    groupBy is the LSH family's dominant shuffle and is re-paid by
    every consumer (d03/d06-artifact/d19/d21) unless staged once per
    session, the shingle-index pattern one level up.
    """
    assert n_hashes % n_bands == 0
    if signatures is not None and hashed_shingles is None:
        # every sibling consumer (incremental_neardup, lsh_tuning_curve,
        # corpus_lsh_index) honors a passed signature table
        # unconditionally; silently recomputing from docs here would
        # serve different signatures than the caller staged — refuse
        raise ValueError(
            "minhash_lsh_pairs: `signatures` requires `hashed_shingles` "
            "(the verify step reads the shingle index; a signature table "
            "alone cannot confirm Jaccard)"
        )
    if hashed_shingles is not None:
        _check_index_k(hashed_shingles, k)
        if signatures is not None:
            _check_sig_n(signatures, n_hashes)
            sigs = signatures
        else:
            sigs = minhash_signatures(hashed_shingles, n_hashes, pre_hashed=True)
        cands = lsh_candidate_pairs(sigs, n_bands, n_hashes // n_bands, max_bucket_size)
        return jaccard_pairs(
            hashed_shingles, min_jaccard, candidates=cands, pre_hashed=True
        )
    sh = shingle_table(docs, id_col, text_col, k)
    if persist_shingles:
        sh = sh.persist()
    sigs = minhash_signatures(sh, n_hashes)
    cands = lsh_candidate_pairs(sigs, n_bands, n_hashes // n_bands, max_bucket_size)
    return jaccard_pairs(sh, min_jaccard, candidates=cands)


def minhash_lsh_pairs_sql(
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.5,
    table: str = "documents",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> str:
    rows_per_band = n_hashes // n_bands
    sh = word_shingles_sql(text_col, k)
    # `sh` below carries the 60-bit md5 of each shingle (column still
    # named shingle): hashed ONCE, shared by the signature aggregation
    # and the verify self-join — mirroring the Spark side, where both
    # minhash_signatures and jaccard_pairs key on h60(shingle)
    mh_cols = ", ".join(
        f"MIN({minhash_family_sql('shingle', s)}) AS mh{s}" for s in range(n_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc, {b} AS band, "
        + " || '_' || ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + " AS key FROM sigs"
        for b in range(n_bands)
    )
    if max_bucket_size is not None:
        guard = f"""
bucket_sizes AS (
  SELECT band, key, COUNT(*) AS n FROM buckets GROUP BY 1, 2
),
pruned AS (
  SELECT bu.doc, bu.band, bu.key
  FROM buckets bu JOIN bucket_sizes bs ON bu.band = bs.band AND bu.key = bs.key
  WHERE bs.n <= {max_bucket_size}
),"""
        cand_src = "pruned"
    else:
        guard = ""
        cand_src = "buckets"
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
sigs AS (SELECT doc, {mh_cols} FROM sh GROUP BY doc),
buckets AS ({band_rows}),{guard}
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM {cand_src} a JOIN {cand_src} b
    ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
),
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN cands c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON i.doc_a = sa.doc
JOIN sizes sb ON i.doc_b = sb.doc
WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= {min_jaccard}
"""


def fuzzy_decontaminate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    hashed_shingles: DataFrame | None = None,
) -> DataFrame:
    """FUZZY train/test decontamination: (test doc, train doc) pairs
    whose true shingle Jaccard is ≥ ``min_jaccard``, found via
    MinHash-LSH banding — the near-duplicate generalization of the
    verbatim-overlap check (``curation.contamination_report``). A test
    doc that is a light paraphrase or re-wrap of a training doc shares
    no long verbatim run but has high Jaccard; this is the check that
    catches it (the GPT-3/PaLM-style "fuzzy dedup against benchmarks").

    Shape: ONE signature pass over the whole corpus, band buckets with
    the shared hot-bucket guard, then candidates from joining the TEST
    side of each bucket to its TRAIN side (never test×test or
    train×train work), verified at exact Jaccard through the candidate
    path of :func:`jaccard_pairs`. Cost scales with bucket occupancy ×
    split balance, never |test|×|train|.

    ``hashed_shingles``: the session's materialized (doc, shingle-md5)
    index; ``docs`` is still consulted for the split assignment (a
    2-column projection)."""
    assert n_hashes % n_bands == 0
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    else:
        _check_index_k(hashed_shingles, k)
    splits = docs.select(
        F.col(id_col).alias("doc"), corpus_split(text_col).alias("split")
    )
    sigs = minhash_signatures(hashed_shingles, n_hashes, pre_hashed=True)
    buckets = _pruned_buckets(
        _band_bucket_rows(sigs, n_bands, n_hashes // n_bands), max_bucket_size
    )
    tagged = buckets.join(splits, "doc")
    test_b = tagged.filter(F.col("split") == "test").select(
        F.col("doc").alias("doc_a"), "band", "key"
    )
    train_b = tagged.filter(F.col("split") == "train").select(
        F.col("doc").alias("doc_b"), "band", "key"
    )
    cands = (
        test_b.join(train_b, ["band", "key"]).select("doc_a", "doc_b").distinct()
    )
    pairs = jaccard_pairs(
        hashed_shingles, min_jaccard, candidates=cands, pre_hashed=True
    )
    return pairs.select(
        F.col("doc_a").alias("test_doc"),
        F.col("doc_b").alias("train_doc"),
        "jaccard",
    )


def fuzzy_decontaminate_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.5,
    table: str = "documents",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> str:
    rows_per_band = n_hashes // n_bands
    sh = word_shingles_sql(text_col, k)
    split = corpus_split_sql(text_col)
    mh_cols = ", ".join(
        f"MIN({minhash_family_sql('shingle', s)}) AS mh{s}" for s in range(n_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc, {b} AS band, "
        + " || '_' || ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + " AS key FROM sigs"
        for b in range(n_bands)
    )
    if max_bucket_size is not None:
        guard = f"""
bucket_sizes AS (
  SELECT band, key, COUNT(*) AS n FROM buckets GROUP BY 1, 2
),
pruned AS (
  SELECT bu.doc, bu.band, bu.key
  FROM buckets bu JOIN bucket_sizes bs ON bu.band = bs.band AND bu.key = bs.key
  WHERE bs.n <= {max_bucket_size}
),"""
        cand_src = "pruned"
    else:
        guard = ""
        cand_src = "buckets"
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
splits AS (SELECT {id_col} AS doc, {split} AS split FROM {table}),
sigs AS (SELECT doc, {mh_cols} FROM sh GROUP BY doc),
buckets AS ({band_rows}),{guard}
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM {cand_src} a
  JOIN splits sa ON a.doc = sa.doc AND sa.split = 'test'
  JOIN {cand_src} b ON a.band = b.band AND a.key = b.key
  JOIN splits sb ON b.doc = sb.doc AND sb.split = 'train'
),
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cands c
  JOIN sh a ON c.doc_a = a.doc
  JOIN sh b ON c.doc_b = b.doc AND a.shingle = b.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a AS test_doc, i.doc_b AS train_doc,
       n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc
JOIN sizes sb ON i.doc_b = sb.doc
WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= {min_jaccard}
"""


# ---------------------------------------------------------------------------
# Near-dup resolution: connected components over the pair graph
# ---------------------------------------------------------------------------


def neardup_components(
    docs: DataFrame, pairs: DataFrame, id_col: str, max_iterations: int = 20
) -> DataFrame:
    """Resolve near-dup PAIRS into dedup DECISIONS: one row per doc with
    its connected-component representative (the component's min id) and
    whether this doc is the canonical keeper.

    This is the step a curation pipeline actually acts on — pair lists
    alone can't drop documents, because near-duplication is transitive
    (A~B, B~C must collapse to ONE kept doc even if A~C was never a
    candidate pair).

    Algorithm: min-label propagation WITH pointer doubling (path
    halving) — every doc starts as its own label; each round every
    node takes the min of its label, its neighbors' labels, AND its
    label's label (the pointer-doubling hop); stop when no label
    changed. The hop is what bounds the driver-coordinated loop for
    100x corpora: plain propagation needs O(component diameter)
    rounds, while halving the pointer paths each round converges in
    O(log2(diameter)) + O(1) rounds — the same bound class as the
    large-star/small-star MapReduce CC algorithm, with one extra
    equi-join per round instead of a reshaped edge set. The default
    ``max_iterations = 20`` therefore covers diameters ~2^18, not 20
    (``tests/test_neardup_resolve.py`` pins the log bound on a planted
    deep chain). Near-dup components are shallow in practice (pairs
    share content, so diameters of 2-4 dominate) — the hop costs one
    label-table self-join on those, and saves the round count on the
    pathological tail.

    The loop runs over EDGE NODES ONLY: a doc with no pair can never
    change label, so isolated docs (the overwhelming majority of any
    real corpus — near-dup graphs are sparse) skip the iteration
    entirely and are labeled with their own id in one final left join.
    Per-round shuffle cost is O(|paired docs|), not O(|corpus|). Each
    round materializes (persist) and convergence is detected by
    counting changed labels INSIDE the round: the propagation join
    already co-locates each node's old and new label, so the
    changed-count is one map-side-combinable aggregation on the fresh
    cache — no old-vs-new join shuffle and no separate baseline job.
    The loop's driver-side part is ONE scalar per round, never data.
    The round count is stamped on the result as
    ``_convergence_rounds`` so the bound is testable.

    Correctness of the hop: a node's label is always the id of a node
    in the same component and never below the component min (labels
    move only by min over same-component labels; the component-min
    node keeps its own id), so the fixpoint is still exactly
    label == component min for every node — identical to the
    transitive-closure oracle.

    Deterministic (min over a deterministic pair set) ⇒ exact oracle
    via a recursive transitive-closure CTE.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    # symmetrized edges ⇒ src alone covers every node with ≥1 pair.
    # Initial label = min(node, min(neighbors)): the first propagation
    # round IS one groupBy over the edges, so the loop starts one round
    # ahead (and the node inventory needs no separate distinct).
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("lbl"))
        .select(F.col("src").alias("node"), "lbl")
        .localCheckpoint(eager=True)
    )

    converged = False
    rounds = 0
    # the checkpointed DataFrame whose blocks currently back `labels`;
    # each round frees its predecessor once the new round's checkpoint
    # is fully materialized (ADVICE r10: without this, a deep chain
    # pins O(rounds × |edge nodes|) storage until ContextCleaner GC)
    prev_ckpt = labels
    for _ in range(max_iterations):
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # pointer-doubling hop: each node also adopts its LABEL's label
        # (label values are always edge-node ids, so the self-join hits
        # a labels row whenever the label is not already a root)
        hop = labels.select(
            F.col("node").alias("pnode"), F.col("lbl").alias("plbl")
        )
        # localCheckpoint (not persist): the round references `labels`
        # TWICE (propagation + hop), so carrying lineage would double
        # the logical plan per round — O(2^rounds) tree nodes that OOM
        # the driver's plan stringification on deep chains long before
        # any executor works. Checkpointing keeps every round's plan
        # constant-size; the materialization is work the changed-count
        # job below forces anyway.
        stepped = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .join(hop, F.col("lbl") == F.col("pnode"), "left")
            .select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("nlbl"), F.col("lbl")),
                    F.coalesce(F.col("plbl"), F.col("lbl")),
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            stepped.agg(
                F.sum((F.col("lbl") != F.col("old_lbl")).cast("long")).alias("c")
            ).collect()[0]["c"]
            or 0
        )
        # `stepped` is materialized (eager checkpoint + the collect
        # above), so the prior round's blocks are now unreachable by
        # any future plan — free them instead of waiting for GC
        _free_local_checkpoint(prev_ckpt)
        prev_ckpt = stepped
        labels = stepped.select("node", "lbl")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # a component with diameter > max_iterations would return
        # part-merged labels that silently diverge from the exact
        # transitive-closure oracle — fail loudly instead
        edges.unpersist()
        raise RuntimeError(
            f"neardup_components: min-label propagation did not converge "
            f"within {max_iterations} iterations — a pair-graph component "
            f"has diameter > {max_iterations}; raise max_iterations"
        )
    final = labels
    edges.unpersist()
    # isolated docs (no pair) never entered the loop: label = own id
    out = (
        docs.select(F.col(id_col).alias("node"))
        .join(final, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("lbl"), F.col("node")).alias("component"),
            (F.col("node") == F.coalesce(F.col("lbl"), F.col("node"))).alias(
                "is_canonical"
            ),
        )
    )
    out._convergence_rounds = rounds
    return out


def neardup_components_sql(pairs_sql: str, id_col: str, table: str = "documents") -> str:
    """Transitive closure of the (symmetric) pair graph; component =
    min reachable label. ``pairs_sql`` must yield (doc_a, doc_b, ...)
    and is embedded as a subquery (its own WITH is legal there)."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql}) AS p),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, lbl) AS (
  SELECT {id_col}, {id_col} FROM {table}
  UNION
  SELECT e.src, r.lbl FROM reach r JOIN edges e ON e.dst = r.node
)
SELECT node AS doc_id, MIN(lbl) AS component,
       node = MIN(lbl) AS is_canonical
FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc {SIMHASH_BITS}-bit SimHash over whitespace tokens (with
    multiplicity): bit b is the sign of the token-vote sum. One explode
    + one groupBy."""
    tok = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("token")
    ).withColumn("h", h60("token"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy("doc").agg(*votes)
    fingerprint = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0)),
        range(SIMHASH_BITS),
        F.lit(0).cast("bigint"),
    )
    return per_doc.select(F.col("doc").alias("doc_id"), fingerprint.alias("simhash"))


def simhash_sql(id_col: str, text_col: str, table: str = "documents") -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc, {h60_sql('token')} AS h
  FROM (SELECT {id_col}, unnest({tokens_sql(text_col)}) AS token FROM {table})
),
votes AS (SELECT doc, {votes} FROM tok GROUP BY doc)
SELECT doc AS doc_id, {fp} AS simhash FROM votes
"""


# ---------------------------------------------------------------------------
# Sketch-accuracy audit: MinHash estimate vs exact Jaccard per pair
# ---------------------------------------------------------------------------


def minhash_estimate_audit(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    hashed_shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-candidate-pair sketch audit: the MinHash ESTIMATE of Jaccard
    (fraction of the ``n_hashes`` signature components that collide)
    against the EXACT Jaccard, plus the absolute error. This is the
    calibration table behind every threshold choice — before trusting
    "signature agreement ≥ x ⇒ near-dup" at 100 TB you measure the
    estimator's spread on your own corpus (E[est] = J, sd ≈
    sqrt(J(1-J)/n_hashes) ≈ 0.12 at n=16, J=0.5).

    Costs nothing beyond the d03 pipeline it audits: same shingles,
    same signatures, same banding; the only additions are one
    signature-pair join (candidates are few post-banding) and the
    candidate-restricted exact Jaccard d03 already runs. Integer
    component counts and single divisions ⇒ hash-exact oracle.
    """
    assert n_hashes % n_bands == 0
    if hashed_shingles is not None:
        _check_index_k(hashed_shingles, k)
        sigs = minhash_signatures(hashed_shingles, n_hashes, pre_hashed=True)
        cands = lsh_candidate_pairs(sigs, n_bands, n_hashes // n_bands, max_bucket_size)
        true_j = jaccard_pairs(hashed_shingles, 0.0, candidates=cands, pre_hashed=True)
    else:
        sh = shingle_table(docs, id_col, text_col, k)
        sigs = minhash_signatures(sh, n_hashes)
        cands = lsh_candidate_pairs(sigs, n_bands, n_hashes // n_bands, max_bucket_size)
        # min_jaccard=0.0 keeps every candidate pair (zero-common pairs
        # surface as 0.0) — the audit wants the estimator's misses too
        true_j = jaccard_pairs(sh, 0.0, candidates=cands)
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    matches = sum(
        (F.col(f"sa.mh{s}") == F.col(f"sb.mh{s}")).cast("int")
        for s in range(n_hashes)
    )
    est = (
        cands.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            (matches.cast("double") / float(n_hashes)).alias("est_jaccard"),
        )
    )
    return est.join(true_j, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        "jaccard",
        F.abs(F.col("est_jaccard") - F.col("jaccard")).alias("abs_err"),
    )


def minhash_estimate_audit_sql(
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    table: str = "documents",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> str:
    rows_per_band = n_hashes // n_bands
    sh = word_shingles_sql(text_col, k)
    mh_cols = ", ".join(
        f"MIN({minhash_family_sql('shingle', s)}) AS mh{s}" for s in range(n_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc, {b} AS band, "
        + " || '_' || ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
        + " AS key FROM sigs"
        for b in range(n_bands)
    )
    if max_bucket_size is not None:
        guard = f"""
bucket_sizes AS (
  SELECT band, key, COUNT(*) AS n FROM buckets GROUP BY 1, 2
),
pruned AS (
  SELECT bu.doc, bu.band, bu.key
  FROM buckets bu JOIN bucket_sizes bs ON bu.band = bs.band AND bu.key = bs.key
  WHERE bs.n <= {max_bucket_size}
),"""
        cand_src = "pruned"
    else:
        guard = ""
        cand_src = "buckets"
    est_expr = " + ".join(
        f"CASE WHEN ga.mh{s} = gb.mh{s} THEN 1 ELSE 0 END" for s in range(n_hashes)
    )
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
sigs AS (SELECT doc, {mh_cols} FROM sh GROUP BY doc),
buckets AS ({band_rows}),{guard}
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM {cand_src} a JOIN {cand_src} b
    ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
),
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
),
truej AS (
  SELECT c.doc_a, c.doc_b,
         COALESCE(i.n_common, 0)
           / CAST(sa.n + sb.n - COALESCE(i.n_common, 0) AS DOUBLE) AS jaccard
  FROM cands c
  LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN sizes sa ON c.doc_a = sa.doc
  JOIN sizes sb ON c.doc_b = sb.doc
)
SELECT t.doc_a, t.doc_b,
       CAST({est_expr} AS DOUBLE) / {float(n_hashes)} AS est_jaccard,
       t.jaccard,
       ABS(CAST({est_expr} AS DOUBLE) / {float(n_hashes)} - t.jaccard) AS abs_err
FROM truej t
JOIN sigs ga ON t.doc_a = ga.doc
JOIN sigs gb ON t.doc_b = gb.doc
"""


# ---------------------------------------------------------------------------
# Incremental-ingest exact dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------


def incremental_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    corpus_pct: int = 80,
    salt: str = "ingest-v1",
) -> DataFrame:
    """The production ingest shape: a NEW batch of documents arrives
    against an EXISTING corpus, and each batch doc gets a decision —
    ``new`` (first sighting anywhere), ``dup_of_corpus`` (text already
    in the corpus), or ``dup_in_batch`` (first sighting is another
    batch doc). Output: one row per batch doc with its decision and the
    canonical doc it resolves to.

    Corpus/batch membership is a deterministic hash split (stands in
    for the arrival boundary; a real pipeline passes two frames). Scale
    shape: both sides reduce to (text_hash → min id) aggregates BEFORE
    any join — the batch joins corpus CANONICALS (one row per distinct
    corpus text), so a million copies of boilerplate in the corpus
    contribute ONE row; shuffles carry 8-byte hashes, never documents.
    At 100 TB the corpus canonicals are the stored dedup index a real
    ingest keeps warm — this operator IS that index's refresh+probe.
    """
    base = docs.select(
        F.col(id_col).alias("doc"),
        h60(text_col).alias("th"),
        F.pmod(
            h60(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.lit(100)
        ).alias("b"),
    )
    corpus = base.filter(F.col("b") < corpus_pct)
    batch = base.filter(F.col("b") >= corpus_pct)
    corpus_canon = corpus.groupBy("th").agg(F.min("doc").alias("corpus_canon"))
    batch_min = batch.groupBy("th").agg(F.min("doc").alias("batch_min"))
    decision = (
        F.when(F.col("corpus_canon").isNotNull(), "dup_of_corpus")
        .when(F.col("doc") != F.col("batch_min"), "dup_in_batch")
        .otherwise("new")
    )
    return (
        batch.join(corpus_canon, "th", "left")
        .join(batch_min, "th")
        .select(
            F.col("doc").alias(id_col),
            decision.alias("decision"),
            F.coalesce(F.col("corpus_canon"), F.col("batch_min")).alias(
                "canonical_id"
            ),
        )
    )


def incremental_dedup_sql(
    id_col: str,
    text_col: str,
    corpus_pct: int = 80,
    salt: str = "ingest-v1",
    table: str = "documents",
) -> str:
    th = h60_sql(text_col)
    salted = f"'{salt}' || CAST({id_col} AS VARCHAR)"
    b = f"({h60_sql(salted)}) % 100"
    return f"""
WITH base AS (
  SELECT {id_col} AS doc, {th} AS th, {b} AS b FROM {table}
),
corpus_canon AS (
  SELECT th, MIN(doc) AS corpus_canon FROM base WHERE b < {corpus_pct} GROUP BY 1
),
batch AS (SELECT doc, th FROM base WHERE b >= {corpus_pct}),
batch_min AS (SELECT th, MIN(doc) AS batch_min FROM batch GROUP BY 1)
SELECT bt.doc AS {id_col},
       CASE WHEN cc.corpus_canon IS NOT NULL THEN 'dup_of_corpus'
            WHEN bt.doc <> bm.batch_min THEN 'dup_in_batch'
            ELSE 'new' END AS decision,
       COALESCE(cc.corpus_canon, bm.batch_min) AS canonical_id
FROM batch bt
LEFT JOIN corpus_canon cc ON bt.th = cc.th
JOIN batch_min bm ON bt.th = bm.th
"""


def containment_pairs(
    shingles: DataFrame,
    min_containment: float,
    pre_hashed: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """Shingle-CONTAINMENT pairs: C(A,B) = |A∩B| / min(|A|,|B|) — the
    asymmetric cousin of Jaccard that catches a SMALL document embedded
    in a much larger one (quoted article, concatenated crawl, prefix
    truncation). Symmetric Jaccard scores such pairs low (the union is
    dominated by the big doc) precisely when containment scores them
    ~1.0, so production dedup runs both.

    Same scale discipline as :func:`jaccard_pairs`: pairs come from the
    shared-shingle equi-join on 8-byte md5 keys (never a cross join);
    ``pre_hashed`` accepts the session's materialized shingle index so
    no timed run re-pays the corpus explode. ``max_df`` is the same
    stop-shingle guard as Jaccard's (VERDICT r5 #4): a shingle in more
    than ``max_df`` docs leaves the universe BEFORE the self-join — a
    boilerplate shingle in m docs is O(m²) equi-join rows and zero
    containment signal; sizes are computed AFTER the cap so C stays a
    true containment over the reduced universe, mirrorable in SQL.
    Exact integer counts and one IEEE division ⇒ hash-identical to the
    SQL twin.
    """
    if pre_hashed:
        if max_df is not None:
            raise ValueError(
                "pre_hashed inputs must be df-capped by the caller — "
                "passing max_df too would re-cap a capped universe"
            )
        hashed = shingles
    else:
        hashed = shingles.select("doc", h60(F.col("shingle")).alias("shingle"))
        if max_df is not None:
            hashed = hashed.localCheckpoint(eager=True)
            kept = (
                hashed.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= max_df)
                .select("shingle")
            )
            pre_cap = hashed
            hashed = hashed.join(kept, "shingle").localCheckpoint(eager=True)
            # capped checkpoint materialized ⇒ pre-cap blocks are dead
            _free_local_checkpoint(pre_cap)
    sizes = hashed.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    a = hashed.alias("a")
    b = hashed.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            F.col("sa.n").cast("bigint").alias("n_a"),
            F.col("sb.n").cast("bigint").alias("n_b"),
            (
                F.col("n_common")
                / F.least(F.col("sa.n"), F.col("sb.n")).cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )


def containment_pairs_sql(
    id_col: str,
    text_col: str,
    k: int,
    min_containment: float,
    table: str = "documents",
    max_df: int | None = None,
) -> str:
    sh = word_shingles_sql(text_col, k)
    df_cap = (
        f"""
shk AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
kept AS (SELECT shingle FROM shk GROUP BY 1 HAVING COUNT(*) <= {max_df}),
sh AS (SELECT shk.doc, shk.shingle FROM shk JOIN kept USING (shingle)),"""
        if max_df is not None
        else f"""
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),"""
    )
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),{df_cap}
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       n_common / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc
JOIN sizes sb ON doc_b = sb.doc
WHERE n_common / CAST(LEAST(sa.n, sb.n) AS DOUBLE) >= {min_containment}
"""


# ---------------------------------------------------------------------------
# Shingle novelty (per-doc share of corpus-first shingles)
# ---------------------------------------------------------------------------


def shingle_novelty(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    hashed_shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document novelty: the share of a doc's distinct k-word
    shingles whose corpus-wide FIRST appearance (min doc id) is this
    doc — the redundancy/freshness signal curriculum schedulers and
    crawl-dedup dashboards read (a doc of all-first-seen shingles adds
    new n-grams; a doc of zero adds none the corpus hasn't got).

    Output: (doc_id, n_shingles, n_novel, novelty) for EVERY doc —
    docs shorter than k words have 0 shingles and novelty 0.0.

    ``hashed_shingles`` optionally supplies the materialized (doc,
    shingle-md5-60bit) inverted index (the session artifact) so the
    corpus isn't re-exploded per consumer. Scale: one groupBy on the
    shingle hash (min-doc), one shuffle back on doc — the inverted-
    index pattern; no self-join, no pair generation.
    """
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    first = hashed_shingles.groupBy("shingle").agg(F.min("doc").alias("first_doc"))
    per = (
        hashed_shingles.join(first, "shingle")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("doc") == F.col("first_doc"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, F.col("doc_id") == per.doc, "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0).cast("bigint")).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0).cast("bigint")).alias("n_novel"),
            F.coalesce(
                F.col("n_novel").cast("double") / F.col("n_shingles"), F.lit(0.0)
            ).alias("novelty"),
        )
    )


def shingle_novelty_sql(
    id_col: str, text_col: str, k: int = 3, table: str = "documents"
) -> str:
    sh = word_shingles_sql(text_col, k)
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
first AS (SELECT shingle, MIN(doc) AS first_doc FROM sh GROUP BY 1),
per AS (
  SELECT sh.doc,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN sh.doc = f.first_doc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM sh JOIN first f USING (shingle) GROUP BY 1
)
SELECT d.{id_col} AS doc_id,
       COALESCE(per.n_shingles, 0) AS n_shingles,
       COALESCE(per.n_novel, 0) AS n_novel,
       COALESCE(CAST(per.n_novel AS DOUBLE) / per.n_shingles, 0.0) AS novelty
FROM {table} d LEFT JOIN per ON d.{id_col} = per.doc
"""


def substring_dup_groups(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    win: int = 32,
    anchor: int = 8,
    modulus: int = 4,
    fanout_partitions: int | None = None,
) -> DataFrame:
    """Substring-level duplicate detection: exact ``win``-char spans
    repeated across documents (the ExactSubstr signal of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"),
    re-expressed over content-defined anchors instead of a suffix
    array.

    A position is an *anchor* when the 60-bit hash of its leading
    ``anchor``-char gram is ``0 (mod modulus)`` — content-defined, so
    the sampled positions survive insertions/offset shifts that break
    fixed-stride sampling (the CDC idea from LBFS/rsync). Each anchor
    contributes one hashed ``win``-char window; windows whose hash
    lands in >= 2 distinct docs are repeated spans.

    Output: (win_hash, n_docs, n_occ) per duplicated window —
    order-independent integer counts, so fully hash-checkable.

    Scale: the ``win``-char candidate windows are SLICED OUT array-side
    (a cheap substring lambda) and exploded as 32-char strings — never
    raw positions, which would duplicate the full document text into
    every position row (measured 3.5x slower at sf0.1). The anchor
    test and md5 then run ROW-side, inside whole-stage codegen, right
    after the explode (hashing inside the lambda would leave codegen
    and ran ~2x slower when measured) — so all ~len(text) window rows
    do materialize briefly, but each is 32 bytes and ~(modulus-1)/
    modulus of them die in the same codegen stage without ever being
    shuffled. Everything that reaches the exchange is 16-byte
    (hash, doc) rows, and the rollup is map-side combinable. At extreme scale a rolling Rabin-Karp hash
    via ``mapInPandas`` is a drop-in that cuts the per-position md5
    constant, with the identical shuffle shape. Compare d02/d03:
    those are whole-doc Jaccard; this finds verbatim REPEATED SPANS
    inside otherwise-different docs (license headers, boilerplate,
    memorized passages).
    """
    base = docs.select(
        F.col(id_col).alias("doc"), F.col(text_col).alias("t")
    ).filter(F.length("t") >= win)
    # the explode fans out ~len(text) rows per input row, so a
    # file-count-bound scan (one small parquet file = ONE partition)
    # serializes the whole hot stage on a single core — spread the
    # pre-fanout rows across the session's shuffle width first
    # (measured 3.5x at sf0.1; no-op on any real multi-split table)
    from end_to_end_sales_etl_de_project_spark.sources.tables import spread

    base = spread(base, fanout_partitions)
    # per-doc: slice out the win-char candidate windows array-side
    # (plain substring, cheap interpreted lambda), then explode the
    # 32-char windows — NOT raw positions, which would duplicate the
    # full text into every row; md5 stays row-side in codegen (hashing
    # inside the lambda would leave codegen and run ~2x slower)
    windows = base.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - F.lit(win - 1)),
                lambda i: F.substring(F.col("t"), i, win),
            )
        ).alias("w"),
    )
    wins = windows.filter(
        h60(F.substring("w", 1, anchor)) % modulus == 0
    ).select("doc", h60(F.col("w")).alias("win_hash"))
    return (
        wins.groupBy("win_hash")
        .agg(
            F.count_distinct("doc").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def substring_dup_groups_sql(
    id_col: str,
    text_col: str,
    win: int = 32,
    anchor: int = 8,
    modulus: int = 4,
    table: str = "documents",
    max_len: int = 65536,
) -> str:
    """DuckDB twin. generate_series can't take lateral column bounds
    (same constraint as m05's oracle), so positions come from a fixed
    ceiling well above any testdata doc length and an inequality join
    prunes to each doc's real span count. A doc longer than the
    ceiling FAILS LOUDLY via ``error()`` in the guard CTE — without
    it, dropped windows would surface only as an unexplained driver
    hash mismatch attributed to the Spark side (ADVICE r7)."""
    return f"""
WITH d AS (
  SELECT {id_col} AS doc, {text_col} AS t, LENGTH({text_col}) AS n
  FROM {table} WHERE LENGTH({text_col}) >= {win}
),
guard AS (
  SELECT CASE WHEN (SELECT COALESCE(MAX(n), 0) FROM d) > {max_len}
    THEN error('substring oracle position ceiling ({max_len}) exceeded by a doc of '
               || (SELECT MAX(n) FROM d) || ' chars — raise max_len')
    ELSE 1 END AS ok
),
pos AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, {max_len}) s(i)),
anch AS (
  SELECT doc, {h60_sql(f"substr(t, i, {win})")} AS win_hash
  FROM d JOIN pos ON pos.i <= d.n - {win - 1}
  WHERE {h60_sql(f"substr(t, i, {anchor})")} % {modulus} = 0
    AND (SELECT ok FROM guard) = 1
)
SELECT win_hash,
       CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM anch GROUP BY 1 HAVING COUNT(DISTINCT doc) >= 2
"""


# ---------------------------------------------------------------------------
# Incremental near-dup: a new batch probes the existing corpus's LSH index
# ---------------------------------------------------------------------------


def incremental_neardup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.5,
    corpus_pct: int = 80,
    salt: str = "ingest-v1",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    hashed_shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """The near-dup gate at the ingest door: a NEW batch of documents
    arrives against an EXISTING corpus, and each batch doc gets a
    decision — ``near_dup_of_corpus`` (true shingle Jaccard ≥
    threshold with some corpus doc, via MinHash-LSH banding) with its
    best-matching corpus doc, or ``novel``. The near-dup extension of
    :func:`incremental_dedup` (d10 catches verbatim re-posts; this
    catches re-wraps and light edits at the same door).

    Scale shape — the reason this operator exists: the batch side only
    PROBES the corpus's banding table. Candidates come from joining
    batch band-keys to corpus band-keys — batch×corpus per bucket,
    never corpus×corpus (the corpus was already deduped when it was
    ingested; re-pairing it daily would re-pay the whole d03 run on
    100 TB for a 0.1% ingest). The hot-bucket guard prunes boilerplate
    buckets BEFORE the probe join. At steady state the corpus
    signatures/buckets are the stored warm index; here they are
    recomputed because the oracle needs one self-contained query —
    shapes are identical. Batch-internal near-dups are out of scope by
    design (a d03 pass over the batch alone handles them; it is
    batch-sized, not corpus-sized).

    Best-match election: max Jaccard, ties to the smallest corpus doc
    id — a total order (Jaccard is one IEEE division of exact counts,
    bit-identical across engines). Membership is the same
    deterministic hash split as d10 (stands in for the arrival
    boundary; a real pipeline passes two frames).
    """
    assert n_hashes % n_bands == 0
    member = docs.select(
        F.col(id_col).alias("doc"),
        F.pmod(
            h60(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.lit(100)
        ).alias("b"),
    )
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    else:
        _check_index_k(hashed_shingles, k)
    if signatures is not None:
        # per-doc signatures are side-independent (min over the doc's
        # OWN shingles), so the session artifact serves both the
        # corpus index and the batch probe after the membership split
        _check_sig_n(signatures, n_hashes)
        sigs = signatures
    else:
        sigs = minhash_signatures(hashed_shingles, n_hashes, pre_hashed=True)
    buckets = _pruned_buckets(
        _band_bucket_rows(sigs, n_bands, n_hashes // n_bands), max_bucket_size
    )
    tagged = buckets.join(member, "doc")
    batch_b = tagged.filter(F.col("b") >= corpus_pct).select(
        F.col("doc").alias("doc_a"), "band", "key"
    )
    corpus_b = tagged.filter(F.col("b") < corpus_pct).select(
        F.col("doc").alias("doc_b"), "band", "key"
    )
    cands = (
        batch_b.join(corpus_b, ["band", "key"]).select("doc_a", "doc_b").distinct()
    )
    pairs = jaccard_pairs(
        hashed_shingles, min_jaccard, candidates=cands, pre_hashed=True
    )
    best_w = Window.partitionBy("doc_a").orderBy(
        F.col("jaccard").desc(), F.col("doc_b").asc()
    )
    best = (
        pairs.select(
            "doc_a", "doc_b", "jaccard", F.row_number().over(best_w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch_docs = member.filter(F.col("b") >= corpus_pct).select("doc")
    return batch_docs.join(best, batch_docs["doc"] == best["doc_a"], "left").select(
        F.col("doc").alias(id_col),
        F.when(F.col("doc_b").isNull(), "novel")
        .otherwise("near_dup_of_corpus")
        .alias("decision"),
        F.col("doc_b").alias("matched_doc"),
        "jaccard",
    )


def incremental_neardup_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    min_jaccard: float = 0.5,
    corpus_pct: int = 80,
    salt: str = "ingest-v1",
    table: str = "documents",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> str:
    rows_per_band = n_hashes // n_bands
    sh = word_shingles_sql(text_col, k)
    salted = f"'{salt}' || CAST({id_col} AS VARCHAR)"
    b = f"({h60_sql(salted)}) % 100"
    mh_cols = ", ".join(
        f"MIN({minhash_family_sql('shingle', s)}) AS mh{s}" for s in range(n_hashes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc, {bb} AS band, "
        + " || '_' || ".join(f"mh{bb * rows_per_band + r}" for r in range(rows_per_band))
        + " AS key FROM sigs"
        for bb in range(n_bands)
    )
    if max_bucket_size is not None:
        guard = f"""
bucket_sizes AS (
  SELECT band, key, COUNT(*) AS n FROM buckets GROUP BY 1, 2
),
pruned AS (
  SELECT bu.doc, bu.band, bu.key
  FROM buckets bu JOIN bucket_sizes bs ON bu.band = bs.band AND bu.key = bs.key
  WHERE bs.n <= {max_bucket_size}
),"""
        cand_src = "pruned"
    else:
        guard = ""
        cand_src = "buckets"
    return f"""
WITH sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
member AS (SELECT {id_col} AS doc, {b} AS bkt FROM {table}),
sigs AS (SELECT doc, {mh_cols} FROM sh GROUP BY doc),
buckets AS ({band_rows}),{guard}
cands AS (
  SELECT DISTINCT a.doc AS doc_a, bb.doc AS doc_b
  FROM {cand_src} a
  JOIN member ma ON a.doc = ma.doc AND ma.bkt >= {corpus_pct}
  JOIN {cand_src} bb ON a.band = bb.band AND a.key = bb.key
  JOIN member mb ON bb.doc = mb.doc AND mb.bkt < {corpus_pct}
),
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cands c
  JOIN sh a ON c.doc_a = a.doc
  JOIN sh bb ON c.doc_b = bb.doc AND a.shingle = bb.shingle
  GROUP BY 1, 2
),
verified AS (
  SELECT i.doc_a, i.doc_b,
         n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
  FROM inter i
  JOIN sizes sa ON i.doc_a = sa.doc
  JOIN sizes sb ON i.doc_b = sb.doc
  WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= {min_jaccard}
),
best AS (
  SELECT doc_a, doc_b, jaccard,
         ROW_NUMBER() OVER (
           PARTITION BY doc_a ORDER BY jaccard DESC, doc_b ASC
         ) AS rn
  FROM verified
)
SELECT m.doc AS {id_col},
       CASE WHEN b2.doc_b IS NULL THEN 'novel'
            ELSE 'near_dup_of_corpus' END AS decision,
       b2.doc_b AS matched_doc,
       b2.jaccard AS jaccard
FROM member m
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b2 ON m.doc = b2.doc_a
WHERE m.bkt >= {corpus_pct}
"""


# ---------------------------------------------------------------------------
# LSH tuning curve: candidate volume and precision per banding config
# ---------------------------------------------------------------------------


def lsh_tuning_curve(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    configs: tuple[tuple[int, int], ...] = ((2, 8), (4, 4), (8, 2)),
    min_jaccard: float = 0.5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    hashed_shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """The d03 tuning table: for each LSH banding configuration
    (n_bands × rows_per_band over the same 16-hash signature), the
    candidate-pair volume, how many candidates verify at true Jaccard ≥
    threshold, and the resulting precision — the a15 recall/cost curve
    for the TEXT side. More bands with fewer rows each = more
    candidates (recall↑, join cost↑); fewer, wider bands = cheaper but
    misses borderline pairs. Before a 100 TB dedup run this table is
    how the (bands, rows) dial gets set from measurements instead of
    the S-curve formula alone.

    One signature pass (all configs slice the SAME mh0..mh15 columns),
    one banding + hot-bucket guard + verify per config — each a
    bucket-bounded equi-join chain, never all-pairs. Counts are exact
    integers; precision is one IEEE division (NULL when a config
    yields zero candidates, identically on both engines via the
    explicit guard).
    """
    n_bands_ok(configs, n_hashes)
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    else:
        _check_index_k(hashed_shingles, k)
    if signatures is not None:
        # staged once per session: all three banding legs re-slice the
        # same table, but Spark does not reuse the signature groupBy
        # across union legs without materialization
        _check_sig_n(signatures, n_hashes)
        sigs = signatures
    else:
        sigs = minhash_signatures(hashed_shingles, n_hashes, pre_hashed=True)
    legs = []
    for nb, rpb in configs:
        # r14: each leg references its candidate set twice (the volume
        # count and the verify join's probe side) — lazy, the banding
        # self-join chain ran twice per leg. Materialize the pair list
        # (two 8-byte ids per row, bucket-bounded) once per invocation.
        cands = lsh_candidate_pairs(sigs, nb, rpb, max_bucket_size).localCheckpoint(
            eager=True
        )
        verified = jaccard_pairs(
            hashed_shingles, min_jaccard, candidates=cands, pre_hashed=True
        )
        n_cand = cands.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
        n_ver = verified.agg(F.count(F.lit(1)).cast("bigint").alias("n_verified"))
        legs.append(
            n_cand.crossJoin(n_ver).select(
                F.lit(nb).cast("bigint").alias("n_bands"),
                F.lit(rpb).cast("bigint").alias("rows_per_band"),
                "n_candidates",
                "n_verified",
                F.when(
                    F.col("n_candidates") > 0,
                    F.col("n_verified").cast("double")
                    / F.col("n_candidates").cast("double"),
                ).alias("precision"),
            )
        )
    from functools import reduce as _reduce

    return _reduce(lambda a, b: a.unionByName(b), legs)


def n_bands_ok(configs: tuple[tuple[int, int], ...], n_hashes: int) -> bool:
    """Every (n_bands, rows_per_band) must tile the signature exactly."""
    for nb, rpb in configs:
        if nb * rpb != n_hashes:
            raise ValueError(
                f"config ({nb}, {rpb}) does not tile a {n_hashes}-hash "
                "signature — n_bands * rows_per_band must equal n_hashes"
            )
    return True


def lsh_tuning_curve_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    configs: tuple[tuple[int, int], ...] = ((2, 8), (4, 4), (8, 2)),
    min_jaccard: float = 0.5,
    table: str = "documents",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> str:
    sh = word_shingles_sql(text_col, k)
    mh_cols = ", ".join(
        f"MIN({minhash_family_sql('shingle', s)}) AS mh{s}" for s in range(n_hashes)
    )
    ctes = [
        f"""sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
sigs AS (SELECT doc, {mh_cols} FROM sh GROUP BY doc)"""
    ]
    legs = []
    for nb, rpb in configs:
        tag = f"b{nb}r{rpb}"
        band_rows = " UNION ALL ".join(
            f"SELECT doc, {b} AS band, "
            + " || '_' || ".join(f"mh{b * rpb + r}" for r in range(rpb))
            + " AS key FROM sigs"
            for b in range(nb)
        )
        guard = ""
        src = f"buckets_{tag}"
        if max_bucket_size is not None:
            guard = f""",
pruned_{tag} AS (
  SELECT bu.doc, bu.band, bu.key
  FROM buckets_{tag} bu
  JOIN (SELECT band, key, COUNT(*) AS n
        FROM buckets_{tag} GROUP BY 1, 2) bs
    ON bu.band = bs.band AND bu.key = bs.key
  WHERE bs.n <= {max_bucket_size}
)"""
            src = f"pruned_{tag}"
        ctes.append(
            f"""buckets_{tag} AS ({band_rows}){guard},
cands_{tag} AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM {src} a JOIN {src} b
    ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
),
ver_{tag} AS (
  SELECT i.doc_a
  FROM (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
    FROM cands_{tag} c
    JOIN sh a ON c.doc_a = a.doc
    JOIN sh b ON c.doc_b = b.doc AND a.shingle = b.shingle
    GROUP BY 1, 2
  ) i
  JOIN sizes sa ON i.doc_a = sa.doc
  JOIN sizes sb ON i.doc_b = sb.doc
  WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= {min_jaccard}
)"""
        )
        legs.append(
            f"""
SELECT CAST({nb} AS BIGINT) AS n_bands,
       CAST({rpb} AS BIGINT) AS rows_per_band,
       CAST((SELECT COUNT(*) FROM cands_{tag}) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM ver_{tag}) AS BIGINT) AS n_verified,
       CASE WHEN (SELECT COUNT(*) FROM cands_{tag}) > 0
            THEN CAST((SELECT COUNT(*) FROM ver_{tag}) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM cands_{tag}) AS DOUBLE)
       END AS precision"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(legs)


# ---------------------------------------------------------------------------
# Cross-source duplication matrix: exact-content overlap between sources
# ---------------------------------------------------------------------------


def cross_source_dup_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Source-pair matrix of EXACT shared content — how many distinct
    documents each pair of sources both carry verbatim. The mirror-site
    detector: a pair sharing most of its content is one crawl counted
    twice (drop a side before training), while isolated low counts are
    ordinary quote/boilerplate reuse. t29 answers this with vocabulary
    overlap (drift-tolerant, fuzzy); this is the exact-content twin the
    dedup pipeline acts on first.

    Shape: the corpus collapses to DISTINCT (content-hash, source)
    rows before any join — a million copies of one doc in one source
    contribute ONE row — and the self-join on the 8-byte hash fans out
    at most |sources|² rows per distinct content (20 sources → ≤190
    pairs even for boilerplate carried by everyone; never doc-count
    quadratic). NULL text and NULL source rows drop out explicitly on
    both engines (no content / no attributable side).
    """
    th_src = (
        docs.filter(F.col(text_col).isNotNull() & F.col(source_col).isNotNull())
        .select(h60(text_col).alias("th"), F.col(source_col).alias("src"))
        .distinct()
    )
    a = th_src.alias("a")
    b = th_src.alias("b")
    return (
        a.join(
            b,
            (F.col("a.th") == F.col("b.th")) & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_contents"))
    )


def cross_source_dup_matrix_sql(
    text_col: str = "text",
    source_col: str = "source",
    table: str = "documents",
) -> str:
    th = h60_sql(text_col)
    return f"""
WITH th_src AS (
  SELECT DISTINCT {th} AS th, {source_col} AS src
  FROM {table}
  WHERE {text_col} IS NOT NULL AND {source_col} IS NOT NULL
)
SELECT a.src AS source_a, b.src AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_contents
FROM th_src a JOIN th_src b ON a.th = b.th AND a.src < b.src
GROUP BY 1, 2
"""


def cross_source_neardup_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    min_jaccard: float = 0.5,
    scale: int = 100_000,
    hashed_shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Source-pair matrix of NEAR-duplicate content — d20's exact-hash
    mirror detector misses re-crawls that differ by a timestamp or a
    boilerplate line; this counts the d03 near-dup pairs that CROSS a
    source boundary, per (source, source) pair, with the mean verified
    Jaccard of those pairs. A pair of sources with many high-Jaccard
    cross links is one crawl lightly mutated — drop a side before
    training.

    Costs nothing beyond the d03 pipeline it reads (same shingle
    index, same banding; candidates are few post-banding); the only
    additions are two doc→source hash joins and a |sources|²-bounded
    rollup. Exactness: the mean rides the t30/a08 quantized-integer
    grid — each verified Jaccard (an exact ratio of BIGINT counts)
    rounds to ``scale`` BEFORE the order-free integer SUM, so the mean
    is two IEEE divisions on exact integers (the float sum of raw
    ratios would be shuffle-order-dependent). NULL-source docs drop out
    (no attributable side), exactly as in d20.
    """
    pairs = minhash_lsh_pairs(
        docs,
        id_col,
        text_col,
        k=k,
        min_jaccard=min_jaccard,
        hashed_shingles=hashed_shingles,
        signatures=signatures,
    )
    srcs = docs.filter(F.col(source_col).isNotNull()).select(
        F.col(id_col).alias("doc"), F.col(source_col).alias("src")
    )
    sa, sb = srcs.alias("sa"), srcs.alias("sb")
    qj = F.round(F.col("jaccard") * scale).cast("bigint")
    lab = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .filter(F.col("sa.src") != F.col("sb.src"))
        .select(
            F.least(F.col("sa.src"), F.col("sb.src")).alias("source_a"),
            F.greatest(F.col("sa.src"), F.col("sb.src")).alias("source_b"),
            qj.alias("qj"),
        )
    )
    return lab.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (
            (F.sum("qj").cast("double") / F.lit(float(scale)))
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_jaccard"),
    )


def cross_source_neardup_matrix_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    min_jaccard: float = 0.5,
    scale: int = 100_000,
    table: str = "documents",
) -> str:
    lsh = minhash_lsh_pairs_sql(
        id_col, text_col, k=k, min_jaccard=min_jaccard, table=table
    )
    return f"""
WITH pairs AS MATERIALIZED ({lsh}),
srcs AS (
  SELECT {id_col} AS doc, {source_col} AS src FROM {table}
  WHERE {source_col} IS NOT NULL),
lab AS (
  SELECT LEAST(sa.src, sb.src) AS source_a,
         GREATEST(sa.src, sb.src) AS source_b,
         CAST(ROUND(p.jaccard * {scale}) AS BIGINT) AS qj
  FROM pairs p
  JOIN srcs sa ON p.doc_a = sa.doc
  JOIN srcs sb ON p.doc_b = sb.doc
  WHERE sa.src <> sb.src)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       (CAST(SUM(qj) AS DOUBLE) / {float(scale)}) / CAST(COUNT(*) AS DOUBLE)
         AS mean_jaccard
FROM lab GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination prefilter (d22)
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 65_536
BLOOM_N_SEEDS = 2
# The sizing grid spans corpus scales: at sf0.001 the 64 Kbit filter
# already meets the 1% FP target, at sf0.1 it runs ~4.5% FP and the
# chooser moves to the 256 Kbit entry — the dial must be able to
# answer "bigger corpus, bigger filter", not only confirm the default.
BLOOM_M_GRID = (8_192, 16_384, 65_536, 262_144)
BLOOM_TARGET_FP = 0.01


def _bloom_bit(shingle_hash: Column, seed: int, m_bits: int) -> Column:
    """Bit position of one Bloom hash-family member for a 60-bit
    shingle hash: md5 of the hash's decimal string salted with the
    family index, mod ``m_bits``. Distinct salt prefix (``#bloom``)
    decorrelates the family from the minhash seeds, which salt the
    SHINGLE string, not its hash."""
    return F.pmod(
        h60(F.concat(shingle_hash.cast("string"), F.lit(f"#bloom{seed}"))),
        F.lit(m_bits),
    )


def split_shingle_tables(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    hashed_shingles: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three distinct split-labeled shingle-hash tables every
    Bloom-tier consumer probes: ``test_sh`` (distinct test-split
    shingle hashes — the filter's build side), ``train_sh`` (distinct
    train-split hashes — the corpus-level probe side), and
    ``train_src`` (distinct (source, hash) — the per-source probe
    side). NULL policy matches the d22 contract: NULL-text docs
    contribute nothing; NULL-source TRAIN docs are absent from
    ``train_src`` only (membership needs no attribution).

    These DISTINCTs are the only shuffles in the Bloom tier, and every
    consumer probe re-pays them unless materialized — d23's four grid
    legs each recomputed them from the shingle index until r10. The
    plans layer stages the triple as a session artifact (the q101/c11
    pattern) shared by d22's curve + report and all of d23's legs; on
    a real cluster the equivalent is a bucketed parquet of the three
    tables, refreshed with the corpus."""
    splits = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        corpus_split(text_col).alias("split"),
        F.col(source_col).alias("src"),
    )
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    else:
        # same guard as every other pre-hashed consumer: a k-mismatched
        # session index would silently yield a wrong-k Bloom audit (and
        # a chosen m derived from it) instead of failing loudly
        _check_index_k(hashed_shingles, k)
    labeled = hashed_shingles.join(splits, "doc")
    test_sh = labeled.filter(F.col("split") == "test").select("shingle").distinct()
    train_sh = (
        labeled.filter(F.col("split") == "train").select("shingle").distinct()
    )
    train_src = (
        labeled.filter((F.col("split") == "train") & F.col("src").isNotNull())
        .select("src", "shingle")
        .distinct()
    )
    return test_sh, train_sh, train_src


def _bloom_probe(
    probe: DataFrame, test_sh: DataFrame, m_bits: int, n_seeds: int
) -> tuple[DataFrame, Column, DataFrame]:
    """Flag each probe row with Bloom membership against the test-set
    filter: returns (probe joined with markers, the ``is_pos`` AND-fold
    over the hash family, the distinct bit-position table). Map-side
    only — one broadcast hash-lookup join per family member plus the
    broadcast exact-verify marker; the probe side is never shuffled."""
    bits = test_sh.select(
        F.explode(
            F.array(*[_bloom_bit(F.col("shingle"), s, m_bits) for s in range(n_seeds)])
        ).alias("bit")
    ).distinct()
    probed = probe
    for s in range(n_seeds):
        probed = probed.withColumn(f"b{s}", _bloom_bit(F.col("shingle"), s, m_bits))
        marker = bits.select(F.col("bit").alias(f"b{s}"), F.lit(1).alias(f"m{s}"))
        probed = probed.join(F.broadcast(marker), f"b{s}", "left")
    is_pos = reduce(
        lambda a, b: a & b, [F.col(f"m{s}").isNotNull() for s in range(n_seeds)]
    )
    exact_marker = test_sh.select("shingle", F.lit(1).alias("mx"))
    flagged = probed.join(F.broadcast(exact_marker), "shingle", "left")
    return flagged, is_pos, bits


def bloom_choose_m(
    curve: DataFrame,
    m_grid: tuple[int, ...] = BLOOM_M_GRID,
    target_fp: float = BLOOM_TARGET_FP,
) -> int:
    """Smallest grid filter size whose MEASURED corpus false-positive
    rate meets ``target_fp``; the largest grid size if none qualifies.
    The collect is control-plane and |m_grid|-row — the sizing decision
    a deployment makes once per corpus, not a data-path operation. NaN
    fp_rate (zero probes) never qualifies, mirroring SQL NaN-comparison
    semantics (NaN > any value in both engines)."""
    rows = curve.select("m_bits", "fp_rate").collect()
    ok = [
        int(r["m_bits"])
        for r in rows
        if r["fp_rate"] is not None
        and not math.isnan(r["fp_rate"])
        and r["fp_rate"] <= target_fp
    ]
    return min(ok) if ok else int(max(m_grid))


def bloom_decontaminate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    m_bits: int | None = None,
    n_seeds: int = BLOOM_N_SEEDS,
    m_grid: tuple[int, ...] = BLOOM_M_GRID,
    target_fp: float = BLOOM_TARGET_FP,
    hashed_shingles: DataFrame | None = None,
    split_shingles: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Bloom-prefilter audit for train/test decontamination: per
    source, how many distinct train-split shingles the m-bit Bloom
    filter of the TEST shingle set flags, split into true hits
    (verbatim contamination, the d07 signal) and false positives (the
    prefilter's verify workload). Columns: ``source``, ``m_bits``,
    ``n_probe_shingles``, ``n_bloom_pos``, ``n_exact``,
    ``n_false_pos``.

    SIZING is measured, not asserted (VERDICT r9 #6): with
    ``m_bits=None`` (the default) the operator runs the d23 sizing
    curve over ``m_grid`` and picks the smallest filter whose measured
    corpus FP rate meets ``target_fp`` (largest grid size if none
    qualifies — ``bloom_choose_m``), so the audit's own dial drives
    the operator instead of sitting beside it. The chosen size is the
    ``m_bits`` output column; both engines choose identically because
    fp_rate is a single division of exact BIGINTs. Pass an explicit
    ``m_bits`` to pin a deployed filter size.

    WHY a Bloom stage at all: the exact decontamination joins
    (``contamination_report``, d07/d12) broadcast the full test
    shingle-hash set — 8 bytes per distinct shingle. A Bloom bitmap is
    the CONSTANT-size alternative (m bits regardless of probe volume —
    8-32 KB on the grid here; ~10 bits per test shingle for ~1% FP at
    any scale),
    and the probe is pure map-side compute: each of the ``n_seeds``
    bit positions is checked with its own broadcast hash-lookup join,
    so the 100 TB train side is NEVER shuffled to decide membership —
    the only shuffle in this plan is the one distinct() that
    attributes shingles to sources (8-byte hash + source, the report's
    own grain). Every flagged shingle still pays the exact verify
    downstream; this audit prices that workload exactly, which is why
    FP accounting is the output rather than a side effect.

    Determinism: bit positions are ``h60`` of the shingle hash's
    decimal string salted per family member — exact integers in both
    engines, so the filter, the flags, and all four counts hash-match
    DuckDB bit for bit (the invariant suite pins both the Bloom law
    ``n_bloom_pos == n_exact + n_false_pos`` per source — no false
    negatives, ever — and corpus-level FP non-vacuity).

    NULL policy: NULL-text docs contribute nothing (no shingles);
    NULL-``source`` TRAIN docs are dropped from the per-source report
    (no attributable row), but NULL-source TEST docs still feed the
    filter — membership needs no attribution.
    """
    if split_shingles is None:
        split_shingles = split_shingle_tables(
            docs, id_col, text_col, source_col, k, hashed_shingles
        )
    test_sh, train_sh, train_src = split_shingles
    if m_bits is None:
        curve = bloom_sizing_curve(
            docs,
            id_col,
            text_col,
            k,
            m_grid,
            n_seeds,
            split_shingles=(test_sh, train_sh),
        )
        m_bits = bloom_choose_m(curve, m_grid, target_fp)
    # Map-side Bloom probe: one broadcast hash-lookup join per family
    # member, AND-folded — no shuffle of the probe side, no groupBy.
    flagged, is_pos, _ = _bloom_probe(train_src, test_sh, m_bits, n_seeds)
    report = flagged.select(
        "src",
        is_pos.alias("is_pos"),
        F.col("mx").isNotNull().alias("is_exact"),
    )
    return (
        report.groupBy(F.col("src").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probe_shingles"),
            F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_bloom_pos"),
            F.sum(F.when(F.col("is_exact"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(F.when(F.col("is_pos") & ~F.col("is_exact"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .select(
            "source",
            F.lit(m_bits).cast("bigint").alias("m_bits"),
            "n_probe_shingles",
            "n_bloom_pos",
            "n_exact",
            "n_false_pos",
        )
    )


def _bloom_bit_sql(s: int, m: int) -> str:
    salted = f"CAST(shingle AS VARCHAR) || '#bloom{s}'"
    return f"({h60_sql(salted)}) % {m}"


def bloom_decontaminate_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    m_grid: tuple[int, ...] = BLOOM_M_GRID,
    n_seeds: int = BLOOM_N_SEEDS,
    target_fp: float = BLOOM_TARGET_FP,
    table: str = "documents",
) -> str:
    """Oracle twin of the curve-driven ``bloom_decontaminate``: one
    bits table per grid size, corpus-level fp_rate legs feeding the
    same smallest-qualifying-m chooser (MIN over a qualifying CASE,
    COALESCE to the largest size — NaN never qualifies in either
    engine), per-source reports at every grid size, filtered to the
    chosen one. SQL cannot parameterize the hash expressions by a
    data-dependent m, so the unchosen reports exist only in the oracle
    plan; the Spark side picks m with a |grid|-row control-plane
    collect and builds one probe."""
    sh = word_shingles_sql(text_col, k)
    split = corpus_split_sql(text_col)
    legs = []
    for m in m_grid:
        bit_union = " UNION ALL ".join(
            f"SELECT {_bloom_bit_sql(s, m)} AS bit FROM test_sh"
            for s in range(n_seeds)
        )
        probe_bits = ", ".join(
            f"{_bloom_bit_sql(s, m)} AS b{s}" for s in range(n_seeds)
        )
        member_joins = "\n".join(
            f"LEFT JOIN bits_{m} mk{s} ON p.b{s} = mk{s}.bit"
            for s in range(n_seeds)
        )
        pos = " AND ".join(f"mk{s}.bit IS NOT NULL" for s in range(n_seeds))
        legs.append(
            f"""bits_{m} AS MATERIALIZED (SELECT DISTINCT bit FROM ({bit_union})),
cflags_{m} AS (
  SELECT ({pos}) AS is_pos, (t.shingle IS NOT NULL) AS is_exact
  FROM (SELECT shingle, {probe_bits} FROM train_sh) p
{member_joins}
  LEFT JOIN test_sh t ON p.shingle = t.shingle),
curveleg_{m} AS (
  SELECT CAST({m} AS BIGINT) AS m_bits,
         CAST(SUM(CASE WHEN is_pos AND NOT is_exact THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS fp_rate
  FROM cflags_{m}),
sflags_{m} AS (
  SELECT p.src, ({pos}) AS is_pos, (t.shingle IS NOT NULL) AS is_exact
  FROM (SELECT src, shingle, {probe_bits} FROM train_src) p
{member_joins}
  LEFT JOIN test_sh t ON p.shingle = t.shingle),
rep_{m} AS (
  SELECT src AS source,
         CAST({m} AS BIGINT) AS m_bits,
         CAST(COUNT(*) AS BIGINT) AS n_probe_shingles,
         CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pos,
         CAST(SUM(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN is_pos AND NOT is_exact THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos
  FROM sflags_{m} GROUP BY 1)"""
        )
    legs_sql = ",\n".join(legs)
    curve_union = " UNION ALL ".join(f"SELECT * FROM curveleg_{m}" for m in m_grid)
    rep_union = " UNION ALL ".join(f"SELECT * FROM rep_{m}" for m in m_grid)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc, {split} AS split, {source_col} AS src, text
  FROM {table} WHERE {text_col} IS NOT NULL),
shx AS MATERIALIZED (
  SELECT DISTINCT doc, {h60_sql('u.s')} AS shingle
  FROM (SELECT doc, unnest({sh}) AS s FROM d) u),
lab AS (SELECT shx.shingle, d.split, d.src FROM shx JOIN d USING (doc)),
test_sh AS MATERIALIZED (SELECT DISTINCT shingle FROM lab WHERE split = 'test'),
train_sh AS MATERIALIZED (
  SELECT DISTINCT shingle FROM lab WHERE split = 'train'),
train_src AS MATERIALIZED (
  SELECT DISTINCT src, shingle FROM lab
  WHERE split = 'train' AND src IS NOT NULL),
{legs_sql},
curve AS ({curve_union}),
chosen AS (
  SELECT COALESCE(MIN(CASE WHEN fp_rate <= {target_fp} THEN m_bits END),
                  CAST({max(m_grid)} AS BIGINT)) AS m
  FROM curve),
reps AS ({rep_union})
SELECT source, m_bits, n_probe_shingles, n_bloom_pos, n_exact, n_false_pos
FROM reps WHERE m_bits = (SELECT m FROM chosen)
"""


def bloom_bitmap_words(bits: DataFrame, m_bits: int = BLOOM_M_BITS) -> list[int]:
    """Pack a bit-position table (the d22 ``bits`` frame) into
    ``m_bits/64`` signed 64-bit words — the representation a deployed
    Bloom gate ships to executors (a CONSTANT-size literal/broadcast,
    never a join side). The collect is control-plane and bounded by
    ``m_bits`` positions regardless of corpus size; words are folded to
    signed two's complement so they round-trip through Spark's LongType
    exactly."""
    n_words = (m_bits + 63) // 64
    words = [0] * n_words
    for (bit,) in bits.select("bit").collect():
        words[bit // 64] |= 1 << (bit % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_membership(
    shingle_hash: Column,
    words: list[int],
    m_bits: int = BLOOM_M_BITS,
    n_seeds: int = BLOOM_N_SEEDS,
) -> Column:
    """TRUE iff every hash-family bit of ``shingle_hash`` is set in the
    packed bitmap — the pure-projection Bloom probe (the join-free twin
    of d22's broadcast-lookup probe, usable inside higher-order-function
    lambdas and stateless streaming projections). Bit test is
    engine-side long arithmetic: word fetch by ``F.get`` (0-based,
    ``bit // 64``), mask from a 64-entry literal array whose top entry
    wraps to the sign bit exactly as the packed words do."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    # single-bit masks as a 64-long literal array: shiftleft takes only
    # a literal count, and F.get indexes by Column — this keeps the
    # whole probe usable inside HOF lambdas
    masks = F.array(
        *[
            F.lit((1 << i) - (1 << 64) if i == 63 else (1 << i)).cast("long")
            for i in range(64)
        ]
    )
    member = F.lit(True)
    for s in range(n_seeds):
        bit = _bloom_bit(shingle_hash, s, m_bits)
        word = F.get(arr, (bit / F.lit(64)).cast("int"))
        mask = F.get(masks, (bit % F.lit(64)).cast("int"))
        member = member & (word.bitwiseAND(mask) != F.lit(0))
    return member


def bloom_sizing_curve(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    m_grid: tuple[int, ...] = BLOOM_M_GRID,
    n_seeds: int = BLOOM_N_SEEDS,
    hashed_shingles: DataFrame | None = None,
    split_shingles: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The Bloom m-dial as a hash-checked table — d19's tuning-curve
    pattern applied to the d22 prefilter: for each filter size in
    ``m_grid``, the corpus-wide probe outcome (``m_bits``,
    ``n_bits_set``, ``n_probe``, ``n_bloom_pos``, ``n_exact``,
    ``n_false_pos``, ``fill_ratio``, ``fp_rate``). The table that
    answers "how many bits do I actually need per test shingle" with
    measured false-positive counts instead of the asymptotic formula —
    on this corpus the 8 KB filter flags ~9% of probes falsely while
    the 64 KB one flags ~0.13% (sf0.001), which is the difference
    between re-verifying a tenth of the corpus and a rounding error.

    Shape: ONE shingle/split labeling, read from the staged
    ``split_shingle_tables`` artifact when provided (the plans layer
    shares it with d22 — pre-r10 each grid leg re-ran the two DISTINCTs
    from the shingle index, 4x the dominant shuffle), then per grid
    entry the same map-side broadcast-lookup probe as d22 over the
    SHARED distinct train-shingle table; each leg's scalar aggregates
    join back by broadcast. ``n_exact`` is m-independent by
    construction — the invariant suite pins it constant across rows,
    along with the per-row Bloom law.

    Ratios are single divisions of exact BIGINTs in double — bit-equal
    cross-engine."""
    if split_shingles is not None:
        test_sh, train_sh = split_shingles[0], split_shingles[1]
    else:
        splits = docs.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("doc"), corpus_split(text_col).alias("split")
        )
        if hashed_shingles is None:
            sh = shingle_table(docs, id_col, text_col, k)
            hashed_shingles = sh.select(
                "doc", h60(F.col("shingle")).alias("shingle")
            )
        labeled = hashed_shingles.join(splits, "doc")
        test_sh = (
            labeled.filter(F.col("split") == "test").select("shingle").distinct()
        )
        train_sh = (
            labeled.filter(F.col("split") == "train").select("shingle").distinct()
        )
    legs = []
    for m in m_grid:
        probed, is_pos, bits = _bloom_probe(train_sh, test_sh, m, n_seeds)
        flagged = probed.select(
            is_pos.alias("is_pos"), F.col("mx").isNotNull().alias("is_exact")
        )
        counts = flagged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probe"),
            F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_bloom_pos"),
            F.sum(F.when(F.col("is_exact"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
            F.sum(F.when(F.col("is_pos") & ~F.col("is_exact"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_false_pos"),
        )
        nbits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
        legs.append(
            counts.crossJoin(F.broadcast(nbits)).select(
                F.lit(m).cast("bigint").alias("m_bits"),
                "n_bits_set",
                "n_probe",
                "n_bloom_pos",
                "n_exact",
                "n_false_pos",
                (F.col("n_bits_set").cast("double") / F.lit(float(m))).alias(
                    "fill_ratio"
                ),
                (
                    F.col("n_false_pos").cast("double")
                    / F.col("n_probe").cast("double")
                ).alias("fp_rate"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), legs)


def bloom_sizing_curve_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    m_grid: tuple[int, ...] = BLOOM_M_GRID,
    n_seeds: int = BLOOM_N_SEEDS,
    table: str = "documents",
) -> str:
    sh = word_shingles_sql(text_col, k)
    split = corpus_split_sql(text_col)
    legs = []
    for m in m_grid:
        bit_union = " UNION ALL ".join(
            f"SELECT {_bloom_bit_sql(s, m)} AS bit FROM test_sh"
            for s in range(n_seeds)
        )
        probe_bits = ", ".join(
            f"{_bloom_bit_sql(s, m)} AS b{s}" for s in range(n_seeds)
        )
        member_joins = "\n".join(
            f"LEFT JOIN bits_{m} mk{s} ON p.b{s} = mk{s}.bit"
            for s in range(n_seeds)
        )
        pos = " AND ".join(f"mk{s}.bit IS NOT NULL" for s in range(n_seeds))
        legs.append(
            f"""bits_{m} AS MATERIALIZED (SELECT DISTINCT bit FROM ({bit_union})),
flags_{m} AS (
  SELECT ({pos}) AS is_pos, (t.shingle IS NOT NULL) AS is_exact
  FROM (SELECT shingle, {probe_bits} FROM train_sh) p
{member_joins}
  LEFT JOIN test_sh t ON p.shingle = t.shingle),
leg_{m} AS (
  SELECT CAST({m} AS BIGINT) AS m_bits,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bits_{m}) AS n_bits_set,
         CAST(COUNT(*) AS BIGINT) AS n_probe,
         CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pos,
         CAST(SUM(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         CAST(SUM(CASE WHEN is_pos AND NOT is_exact THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos,
         CAST((SELECT COUNT(*) FROM bits_{m}) AS DOUBLE) / {float(m)}
           AS fill_ratio,
         CAST(SUM(CASE WHEN is_pos AND NOT is_exact THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS fp_rate
  FROM flags_{m})"""
        )
    leg_selects = " UNION ALL ".join(f"SELECT * FROM leg_{m}" for m in m_grid)
    legs_sql = ",\n".join(legs)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc, {split} AS split, text
  FROM {table} WHERE {text_col} IS NOT NULL),
shx AS MATERIALIZED (
  SELECT DISTINCT doc, {h60_sql('u.s')} AS shingle
  FROM (SELECT doc, unnest({sh}) AS s FROM d) u),
lab AS (SELECT shx.shingle, d.split FROM shx JOIN d USING (doc)),
test_sh AS MATERIALIZED (SELECT DISTINCT shingle FROM lab WHERE split = 'test'),
train_sh AS MATERIALIZED (
  SELECT DISTINCT shingle FROM lab WHERE split = 'train'),
{legs_sql}
{leg_selects}
"""


# ---------------------------------------------------------------------------
# Dedup-tier attribution (d24): which tier earns its cost
# ---------------------------------------------------------------------------


def dedup_tier_attribution(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    min_jaccard: float = 0.5,
    min_containment: float = 0.9,
    containment_max_df: int = 5,
    m_bits: int | None = None,
    n_seeds: int = BLOOM_N_SEEDS,
    m_grid: tuple[int, ...] = BLOOM_M_GRID,
    target_fp: float = BLOOM_TARGET_FP,
    hashed_shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
    capped_shingles: DataFrame | None = None,
    components: DataFrame | None = None,
    split_shingles: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Tier-by-tier drop attribution for the full curation cascade —
    per tier, how many docs it flags that NO earlier tier already
    flagged, plus the cumulative total: the table that says which tier
    earns its cost before a 100 TB run buys all four.

    Tiers, in pipeline order (each strictly cheaper tiers first, so
    marginal counts attribute a doc to the CHEAPEST tier that catches
    it):

    0. ``0_bloom_decontam`` — the d22 Bloom gate, the cheapest filter
       a real pipeline runs first: TRAIN-split docs with ≥1 shingle
       whose probe against the test-split filter (size ``m_bits``,
       curve-chosen at ``target_fp`` when not pinned) is positive.
       Bloom-positive includes the gate's false positives by design —
       this tier prices what the GATE holds for exact verification,
       which is the deployment cost being attributed.
    1. ``1_exact`` — verbatim copies (d01's grouping): every doc whose
       text-hash group has a lower id.
    2. ``2_neardup`` — MinHash-LSH verified near-dup components (the
       d03 pairs resolved by d06): non-canonical members not already
       flagged.
    3. ``3_containment`` — asymmetric ≥``min_containment`` shingle
       containment (d16, df-capped universe): the CONTAINED side
       (smaller shingle set; ties drop the larger id, keeping the min
       id like every other tier), minus docs already flagged.

    NULL policy: NULL-text docs are outside dedup scope entirely (no
    content to compare) — excluded from every tier in both engines.

    Scale shape: tier 0 probes the distinct train-shingle table with
    broadcast bit-lookups (never shuffling the corpus) and attributes
    positive shingles to docs with one equi-join on the session
    shingle index; tier 1 is one 8-byte-key groupBy; tiers 2-3 read
    the session artifacts (components, df-capped shingle index)
    instead of re-running resolution; the four flag sets are doc-id
    anti-joins and the output is four rows built from scalar counts
    (broadcast 1-row join-backs). Counts are exact integers —
    hash-exact oracle.
    """
    scoped = docs.filter(F.col(text_col).isNotNull())
    # tier 0: Bloom decontamination gate (d22's filter at doc grain)
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    else:
        _check_index_k(hashed_shingles, k)
    if split_shingles is None:
        split_shingles = split_shingle_tables(
            docs, id_col, text_col, source_col, k, hashed_shingles
        )
    test_sh, train_sh, _ = split_shingles
    if m_bits is None:
        curve = bloom_sizing_curve(
            docs,
            id_col,
            text_col,
            k,
            m_grid,
            n_seeds,
            split_shingles=(test_sh, train_sh),
        )
        m_bits = bloom_choose_m(curve, m_grid, target_fp)
    probed, is_pos, _ = _bloom_probe(train_sh, test_sh, m_bits, n_seeds)
    pos_sh = probed.filter(is_pos).select("shingle")
    train_docs = scoped.filter(corpus_split(text_col) == "train").select(
        F.col(id_col).alias("doc")
    )
    # r14: each tier's flag set is referenced by every LATER tier's
    # anti-joins AND by all four count legs — left as lazy plans the
    # bloom set alone is instantiated ~16x in the final union (an
    # ~800-node plan costing ~1 min of Catalyst time on first build and
    # re-paying every tier per reference at runtime). Materialize each
    # flag set ONCE per invocation (doc-id lists, bounded by |corpus|);
    # nothing is memoized across calls.
    bloom_f = (
        hashed_shingles.join(train_docs, "doc")
        .join(pos_sh, "shingle")
        .select("doc")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # tier 1: exact (marginal: minus the gate's holds)
    th = scoped.select(F.col(id_col).alias("doc"), h60(text_col).alias("h"))
    canon = th.groupBy("h").agg(F.min("doc").alias("c"))
    exact_f = (
        th.join(canon, "h")
        .filter(F.col("doc") > F.col("c"))
        .select("doc")
        .join(bloom_f, "doc", "left_anti")
        .localCheckpoint(eager=True)
    )
    # tier 2: near-dup components (artifact or derived)
    if components is None:
        pairs = minhash_lsh_pairs(
            docs,
            id_col,
            text_col,
            k,
            min_jaccard=min_jaccard,
            hashed_shingles=hashed_shingles,
            signatures=signatures,
        )
        components = neardup_components(docs, pairs, id_col)
    near_all = components.filter(~F.col("is_canonical")).select(
        F.col("doc_id").alias("doc")
    )
    near_f = (
        near_all.join(bloom_f, "doc", "left_anti")
        .join(exact_f, "doc", "left_anti")
        .localCheckpoint(eager=True)
    )
    # tier 3: containment (df-capped universe, d16's exact semantics)
    if capped_shingles is None:
        kept = (
            hashed_shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= containment_max_df)
            .select("shingle")
        )
        capped_shingles = hashed_shingles.join(kept, "shingle")
    cpairs = containment_pairs(capped_shingles, min_containment, pre_hashed=True)
    contained = cpairs.select(
        F.when(F.col("n_a") < F.col("n_b"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("doc")
    ).distinct()
    cont_f = (
        contained.join(bloom_f, "doc", "left_anti")
        .join(exact_f, "doc", "left_anti")
        .join(near_f, "doc", "left_anti")
        .localCheckpoint(eager=True)
    )

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    row = (
        cnt(bloom_f, "n0")
        .crossJoin(F.broadcast(cnt(exact_f, "n1")))
        .crossJoin(F.broadcast(cnt(near_f, "n2")))
        .crossJoin(F.broadcast(cnt(cont_f, "n3")))
        # all four legs project off this 1-row frame; materialized, the
        # counts run once instead of once per leg
        .localCheckpoint(eager=True)
    )
    legs = [
        row.select(
            F.lit("0_bloom_decontam").alias("tier"),
            F.col("n0").alias("n_flagged_new"),
            F.col("n0").alias("n_flagged_cum"),
        ),
        row.select(
            F.lit("1_exact").alias("tier"),
            F.col("n1").alias("n_flagged_new"),
            (F.col("n0") + F.col("n1")).alias("n_flagged_cum"),
        ),
        row.select(
            F.lit("2_neardup").alias("tier"),
            F.col("n2").alias("n_flagged_new"),
            (F.col("n0") + F.col("n1") + F.col("n2")).alias("n_flagged_cum"),
        ),
        row.select(
            F.lit("3_containment").alias("tier"),
            F.col("n3").alias("n_flagged_new"),
            (F.col("n0") + F.col("n1") + F.col("n2") + F.col("n3")).alias(
                "n_flagged_cum"
            ),
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), legs)


def dedup_tier_attribution_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_jaccard: float = 0.5,
    min_containment: float = 0.9,
    containment_max_df: int = 5,
    m_grid: tuple[int, ...] = BLOOM_M_GRID,
    n_seeds: int = BLOOM_N_SEEDS,
    target_fp: float = BLOOM_TARGET_FP,
    table: str = "documents",
) -> str:
    """Oracle twin of the four-tier cascade. Tier 0 reproduces the d22
    pattern: SQL cannot parameterize the hash expressions by a
    data-dependent filter size, so the positive-shingle set exists per
    grid m and the doc flags are filtered to the curve-chosen one —
    the unchosen legs live only in the oracle plan (the Spark side
    chooses m with a |grid|-row control-plane collect and builds ONE
    probe)."""
    pairs = minhash_lsh_pairs_sql(
        id_col, text_col, k, min_jaccard=min_jaccard, table=table
    )
    comp = neardup_components_sql(pairs, id_col, table)
    cont = containment_pairs_sql(
        id_col, text_col, k, min_containment, table=table, max_df=containment_max_df
    )
    sh = word_shingles_sql(text_col, k)
    split = corpus_split_sql(text_col)
    legs = []
    for m in m_grid:
        bit_union = " UNION ALL ".join(
            f"SELECT {_bloom_bit_sql(s, m)} AS bit FROM test_sh"
            for s in range(n_seeds)
        )
        probe_bits = ", ".join(
            f"{_bloom_bit_sql(s, m)} AS b{s}" for s in range(n_seeds)
        )
        member_joins = "\n".join(
            f"LEFT JOIN bits_{m} mk{s} ON p.b{s} = mk{s}.bit"
            for s in range(n_seeds)
        )
        pos = " AND ".join(f"mk{s}.bit IS NOT NULL" for s in range(n_seeds))
        legs.append(
            f"""bits_{m} AS MATERIALIZED (SELECT DISTINCT bit FROM ({bit_union})),
bflags_{m} AS MATERIALIZED (
  SELECT p.shingle, ({pos}) AS is_pos,
         (t.shingle IS NOT NULL) AS is_exact
  FROM (SELECT shingle, {probe_bits} FROM train_sh) p
{member_joins}
  LEFT JOIN test_sh t ON p.shingle = t.shingle),
curveleg_{m} AS (
  SELECT CAST({m} AS BIGINT) AS m_bits,
         CAST(SUM(CASE WHEN is_pos AND NOT is_exact THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS fp_rate
  FROM bflags_{m}),
posleg_{m} AS (
  SELECT CAST({m} AS BIGINT) AS m_bits, shingle FROM bflags_{m} WHERE is_pos)"""
        )
    legs_sql = ",\n".join(legs)
    curve_union = " UNION ALL ".join(f"SELECT * FROM curveleg_{m}" for m in m_grid)
    pos_union = " UNION ALL ".join(f"SELECT * FROM posleg_{m}" for m in m_grid)
    return f"""
WITH d AS (
  SELECT {id_col} AS doc, {text_col} AS txt, {split} AS split, {text_col}
  FROM {table}
  WHERE {text_col} IS NOT NULL),
shx AS MATERIALIZED (
  SELECT DISTINCT doc, {h60_sql('u.s')} AS shingle
  FROM (SELECT doc, unnest({sh}) AS s FROM d) u),
lab AS (SELECT shx.doc, shx.shingle, d.split FROM shx JOIN d USING (doc)),
test_sh AS MATERIALIZED (SELECT DISTINCT shingle FROM lab WHERE split = 'test'),
train_sh AS MATERIALIZED (
  SELECT DISTINCT shingle FROM lab WHERE split = 'train'),
{legs_sql},
curve AS ({curve_union}),
chosen AS (
  SELECT COALESCE(MIN(CASE WHEN fp_rate <= {target_fp} THEN m_bits END),
                  CAST({max(m_grid)} AS BIGINT)) AS m
  FROM curve),
pos_sh AS (
  SELECT shingle FROM ({pos_union})
  WHERE m_bits = (SELECT m FROM chosen)),
bloom_f AS MATERIALIZED (
  SELECT DISTINCT doc FROM lab
  WHERE split = 'train'
    AND shingle IN (SELECT shingle FROM pos_sh)),
th AS (SELECT doc, {h60_sql('txt')} AS h FROM d),
canon AS (SELECT h, MIN(doc) AS c FROM th GROUP BY 1),
exact_f AS (
  SELECT doc FROM th JOIN canon USING (h)
  WHERE doc > c AND doc NOT IN (SELECT doc FROM bloom_f)),
comp AS (SELECT doc_id, component FROM ({comp})),
near_f AS (
  SELECT doc_id AS doc FROM comp
  WHERE doc_id > component
    AND doc_id NOT IN (SELECT doc FROM bloom_f)
    AND doc_id NOT IN (SELECT doc FROM exact_f)),
cpairs AS (SELECT * FROM ({cont})),
contained AS (
  SELECT DISTINCT CASE WHEN n_a < n_b THEN doc_a ELSE doc_b END AS doc
  FROM cpairs),
cont_f AS (
  SELECT doc FROM contained
  WHERE doc NOT IN (SELECT doc FROM bloom_f)
    AND doc NOT IN (SELECT doc FROM exact_f)
    AND doc NOT IN (SELECT doc FROM near_f)),
ns AS (
  SELECT (SELECT COUNT(*) FROM bloom_f) AS n0,
         (SELECT COUNT(*) FROM exact_f) AS n1,
         (SELECT COUNT(*) FROM near_f) AS n2,
         (SELECT COUNT(*) FROM cont_f) AS n3)
SELECT '0_bloom_decontam' AS tier, CAST(n0 AS BIGINT) AS n_flagged_new,
       CAST(n0 AS BIGINT) AS n_flagged_cum FROM ns
UNION ALL
SELECT '1_exact', CAST(n1 AS BIGINT), CAST(n0 + n1 AS BIGINT) FROM ns
UNION ALL
SELECT '2_neardup', CAST(n2 AS BIGINT), CAST(n0 + n1 + n2 AS BIGINT) FROM ns
UNION ALL
SELECT '3_containment', CAST(n3 AS BIGINT),
       CAST(n0 + n1 + n2 + n3 AS BIGINT) FROM ns
"""


def corpus_lsh_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    hashed_shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """The STATIC build side of the streaming near-dup gate
    (``streaming/documents.neardup_probe``): one row per (band, key,
    corpus doc) carrying the doc's distinct shingle-hash set and its
    size for the exact-Jaccard verify. A deployment materializes this
    once per corpus refresh (bucketed parquet on (band, key)); every
    arriving document probes it with a stream-static equi-join.

    The hot-bucket guard here is CORPUS-scoped (a boilerplate corpus
    bucket is what makes the probe fan out) — d18's batch form counts
    batch+corpus docs per bucket because it sees both sides at once;
    the streaming gate cannot know future arrivals, so the guard
    honestly covers only what the index can see.
    """
    assert n_hashes % n_bands == 0
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    else:
        _check_index_k(hashed_shingles, k)
    if signatures is not None:
        _check_sig_n(signatures, n_hashes)
        sigs = signatures
    else:
        sigs = minhash_signatures(hashed_shingles, n_hashes, pre_hashed=True)
    buckets = _pruned_buckets(
        _band_bucket_rows(sigs, n_bands, n_hashes // n_bands), max_bucket_size
    )
    sets = hashed_shingles.groupBy("doc").agg(
        F.collect_set("shingle").alias("sh_b")
    )
    return buckets.join(sets, "doc").select(
        "band",
        "key",
        F.col("doc").alias("corpus_doc"),
        "sh_b",
        F.size("sh_b").cast("bigint").alias("n_b"),
    )


# ---------------------------------------------------------------------------
# Count-min-sketch error audit: the counting twin of the Bloom m-dial
# ---------------------------------------------------------------------------

CMS_W_GRID: tuple[int, ...] = (512, 2048, 8192, 32768)
CMS_DEPTH = 4


def cms_exact_df(hashed_shingles: DataFrame, depth: int = CMS_DEPTH) -> DataFrame:
    """The d28 ground-truth table, materialized: per distinct shingle
    its exact document frequency plus the ``depth`` width-independent
    seed hashes (bucket for any width = ``h_s % w``). localCheckpoint'd
    — every grid leg reads it ~5x and Spark re-derives unshared
    subtrees per read; a production audit stages it to parquet."""
    key_str = F.col("shingle").cast("string")
    return (
        hashed_shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "c", *[h60_seeded(key_str, s).alias(f"h{s}") for s in range(depth)]
        )
        .localCheckpoint(eager=True)
    )


def cms_error_audit(
    hashed_shingles: DataFrame,
    w_grid: tuple[int, ...] = CMS_W_GRID,
    depth: int = CMS_DEPTH,
    ex: DataFrame | None = None,
) -> DataFrame:
    """The count-min-sketch width-dial as a hash-checked table — d23's
    sizing-curve pattern applied to COUNT estimation instead of
    membership: for each sketch width in ``w_grid``, the measured
    estimation error over every distinct shingle's document frequency
    (``w_buckets``, ``depth``, ``n_keys``, ``n_over``, ``over_rate``,
    ``sum_err``, ``max_err``). The table that answers "how wide a CMS
    do I need to track shingle DF online" (the d-family's ``max_df``
    caps and d19's band tuning both key off DF) with measured
    overcounts instead of the eps=e/w asymptotic bound.

    CMS semantics (Cormode & Muthukrishnan 2005): ``depth`` hash rows
    of ``w`` counters; est(key) = min over rows of the counter at
    ``h_s(key) mod w``. One-sided by construction (est >= exact — the
    bucket sum contains the key's own count), so error = est - exact
    is a non-negative integer and every statistic here is exact
    integer arithmetic plus one guarded division: hash-exact
    cross-engine.

    Shape: the exact DF table (the audit's ground truth — computed
    once, shared by every grid leg) is the only aggregation at the
    key grain; per (width, row) the bucket-sum table is a <= w-row
    aggregate whose join back to the keys BROADCASTS (w*depth counters
    is exactly the control-plane footprint that makes CMS attractive
    at 100 TB — the sketch itself would be the same broadcast). Keys
    are the 60-bit portable shingle hashes cast to string and
    re-hashed per row seed, so Spark and DuckDB bucket identically.
    """
    # The row hashes are WIDTH-INDEPENDENT (bucket = h_s mod w), so the
    # exact-DF ground truth is materialized ONCE with its `depth` seed
    # hashes precomputed; every grid leg then costs only a mod, a
    # bounded bucket aggregate, and a broadcast join back. Without the
    # hoist each leg re-derived the md5s on both the probe and
    # bucket-sum sides (~50M md5 calls at sf0.1 — measured 3.9 s;
    # hoisted ~1.6M calls once). Pass ``ex`` (built by
    # :func:`cms_exact_df`, staged per session in the plans layer —
    # the split_shingles/d23 pattern) to skip even the one build.
    if ex is None:
        ex = cms_exact_df(hashed_shingles, depth)
    legs = []
    for w in w_grid:
        withb = ex.select(
            "c",
            *[
                (F.col(f"h{s}") % F.lit(w)).alias(f"b{s}")
                for s in range(depth)
            ],
        )
        joined = withb
        for s in range(depth):
            bs = withb.groupBy(f"b{s}").agg(
                F.sum("c").cast("bigint").alias(f"s{s}")
            )
            joined = joined.join(F.broadcast(bs), f"b{s}")
        err = F.least(*[F.col(f"s{s}") for s in range(depth)]) - F.col("c")
        legs.append(
            joined.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum((err > F.lit(0)).cast("long")).cast("bigint").alias("n_over"),
                F.sum(err).cast("bigint").alias("sum_err"),
                F.max(err).cast("bigint").alias("max_err"),
            ).select(
                F.lit(w).cast("bigint").alias("w_buckets"),
                F.lit(depth).cast("bigint").alias("depth"),
                "n_keys",
                "n_over",
                F.when(
                    F.col("n_keys") > 0,
                    F.col("n_over").cast("double") / F.col("n_keys").cast("double"),
                ).alias("over_rate"),
                "sum_err",
                "max_err",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), legs)


def cms_error_audit_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w_grid: tuple[int, ...] = CMS_W_GRID,
    depth: int = CMS_DEPTH,
    table: str = "documents",
) -> str:
    from end_to_end_sales_etl_de_project_spark.functions.hashing import (
        h60_seeded_sql,
    )

    sh = word_shingles_sql(text_col, k)
    hash_cols = ", ".join(
        f"({h60_seeded_sql('CAST(shingle AS VARCHAR)', s)}) AS h{s}"
        for s in range(depth)
    )
    legs = []
    leg_names = []
    for w in w_grid:
        bucket_cols = ", ".join(f"h{s} % {w} AS b{s}" for s in range(depth))
        sum_ctes = ",\n".join(
            f"s_{w}_{s} AS (SELECT b{s}, CAST(SUM(c) AS BIGINT) AS s{s} "
            f"FROM b_{w} GROUP BY b{s})"
            for s in range(depth)
        )
        sum_joins = " ".join(f"JOIN s_{w}_{s} USING (b{s})" for s in range(depth))
        est = "least(" + ", ".join(f"s{s}" for s in range(depth)) + ")"
        legs.append(
            f"""b_{w} AS (SELECT c, {bucket_cols} FROM ex),
{sum_ctes},
j_{w} AS (SELECT c, ({est}) - c AS err FROM b_{w} {sum_joins}),
leg_{w} AS (
  SELECT CAST({w} AS BIGINT) AS w_buckets,
         CAST({depth} AS BIGINT) AS depth,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN err > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
         CASE WHEN COUNT(*) > 0
              THEN CAST(SUM(CASE WHEN err > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) END AS over_rate,
         CAST(SUM(err) AS BIGINT) AS sum_err,
         CAST(MAX(err) AS BIGINT) AS max_err
  FROM j_{w})"""
        )
        leg_names.append(f"leg_{w}")
    legs_sql = ",\n".join(legs)
    leg_selects = " UNION ALL ".join(f"SELECT * FROM {n}" for n in leg_names)
    return f"""
WITH d AS (SELECT {id_col} AS doc, text FROM {table} WHERE {text_col} IS NOT NULL),
shx AS MATERIALIZED (
  SELECT DISTINCT doc, {h60_sql('u.s')} AS shingle
  FROM (SELECT doc, unnest({sh}) AS s FROM d) u),
ex AS MATERIALIZED (
  SELECT c, {hash_cols}
  FROM (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS c
        FROM shx GROUP BY shingle) g),
{legs_sql}
{leg_selects}
"""


# ---------------------------------------------------------------------------
# Curve-driven near-dup: close the d19 tuning loop (the d22/d23 pattern)
# ---------------------------------------------------------------------------

LSH_TARGET_PRECISION = 0.9


def lsh_choose_config(
    curve: DataFrame,
    min_precision: float = LSH_TARGET_PRECISION,
) -> tuple[int, int]:
    """Pick the banding config from the MEASURED d19 curve: among
    configs whose candidate precision meets ``min_precision``, the one
    finding the most verified pairs (recall proxy), ties to fewer
    candidates (cheaper join) then fewer bands; if none qualifies, the
    same order ignoring the precision gate (most pairs wins). The
    |configs|-row collect is control-plane — the dial a deployment
    sets once per corpus, exactly like ``bloom_choose_m``. NULL
    precision (zero candidates) never qualifies."""
    rows = curve.select(
        "n_bands", "rows_per_band", "n_candidates", "n_verified", "precision"
    ).collect()
    if not rows:
        raise ValueError("lsh_choose_config: empty tuning curve")

    def order(r):
        q = (
            1
            if r["precision"] is not None and r["precision"] >= min_precision
            else 0
        )
        return (-q, -r["n_verified"], r["n_candidates"], r["n_bands"])

    best = min(rows, key=order)
    return int(best["n_bands"]), int(best["rows_per_band"])


def tuned_neardup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    configs: tuple[tuple[int, int], ...] = ((2, 8), (4, 4), (8, 2)),
    min_jaccard: float = 0.5,
    min_precision: float = LSH_TARGET_PRECISION,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    hashed_shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
    curve: DataFrame | None = None,
) -> DataFrame:
    """d03 with its dial set FROM the measured d19 curve instead of by
    hand — the closed tuning loop, mirroring how d22 sizes its Bloom
    filter from the d23 curve: measure each (bands, rows) tiling's
    candidate volume and precision, choose by ``lsh_choose_config``,
    run the near-dup join at the winning config, and stamp the choice
    on every output row so the decision itself is hash-checked:
    (doc_a, doc_b, jaccard, n_bands, rows_per_band).

    Shape: the curve and the final join share ONE signature table and
    ONE shingle index (session artifacts in the plans layer); the
    chooser is a |configs|-row collect. At 100 TB the curve runs on a
    sample slice and the chosen config runs on the corpus — here both
    run on the same corpus so the choice is exactly reproducible by
    the oracle's in-SQL chooser."""
    if hashed_shingles is None:
        sh = shingle_table(docs, id_col, text_col, k)
        hashed_shingles = sh.select("doc", h60(F.col("shingle")).alias("shingle"))
    else:
        _check_index_k(hashed_shingles, k)
    if signatures is None:
        signatures = minhash_signatures(hashed_shingles, n_hashes, pre_hashed=True)
    else:
        _check_sig_n(signatures, n_hashes)
    if curve is None:
        curve = lsh_tuning_curve(
            docs,
            id_col,
            text_col,
            k,
            n_hashes,
            configs,
            min_jaccard,
            max_bucket_size,
            hashed_shingles=hashed_shingles,
            signatures=signatures,
        )
    nb, rpb = lsh_choose_config(curve, min_precision)
    cands = lsh_candidate_pairs(signatures, nb, rpb, max_bucket_size)
    pairs = jaccard_pairs(
        hashed_shingles, min_jaccard, candidates=cands, pre_hashed=True
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "jaccard",
        F.lit(nb).cast("bigint").alias("n_bands"),
        F.lit(rpb).cast("bigint").alias("rows_per_band"),
    )


def tuned_neardup_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_hashes: int = 16,
    configs: tuple[tuple[int, int], ...] = ((2, 8), (4, 4), (8, 2)),
    min_jaccard: float = 0.5,
    min_precision: float = LSH_TARGET_PRECISION,
    table: str = "documents",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> str:
    """Oracle twin: every config's candidate/verified tables, the curve,
    the SAME qualifying-then-(n_verified DESC, n_candidates, n_bands)
    chooser as ORDER BY ... LIMIT 1, and the chosen config's pairs
    selected by join — the d22 oracle pattern (unchosen legs exist
    only in the oracle plan; Spark picks via the control-plane
    collect and builds one join)."""
    sh = word_shingles_sql(text_col, k)
    mh_cols = ", ".join(
        f"MIN({minhash_family_sql('shingle', s)}) AS mh{s}" for s in range(n_hashes)
    )
    ctes = [
        f"""sh0 AS (
  SELECT {id_col} AS doc, unnest({sh}) AS shingle FROM {table}
),
sh AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM sh0),
sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY 1),
sigs AS (SELECT doc, {mh_cols} FROM sh GROUP BY doc)"""
    ]
    curve_legs = []
    pair_legs = []
    for nb, rpb in configs:
        tag = f"b{nb}r{rpb}"
        band_rows = " UNION ALL ".join(
            f"SELECT doc, {b} AS band, "
            + " || '_' || ".join(f"mh{b * rpb + r}" for r in range(rpb))
            + " AS key FROM sigs"
            for b in range(nb)
        )
        guard = ""
        src = f"buckets_{tag}"
        if max_bucket_size is not None:
            guard = f""",
pruned_{tag} AS (
  SELECT bu.doc, bu.band, bu.key
  FROM buckets_{tag} bu
  JOIN (SELECT band, key, COUNT(*) AS n
        FROM buckets_{tag} GROUP BY 1, 2) bs
    ON bu.band = bs.band AND bu.key = bs.key
  WHERE bs.n <= {max_bucket_size}
)"""
            src = f"pruned_{tag}"
        ctes.append(
            f"""buckets_{tag} AS ({band_rows}){guard},
cands_{tag} AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM {src} a JOIN {src} b
    ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
),
ver_{tag} AS (
  SELECT i.doc_a, i.doc_b,
         n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
  FROM (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
    FROM cands_{tag} c
    JOIN sh a ON c.doc_a = a.doc
    JOIN sh b ON c.doc_b = b.doc AND a.shingle = b.shingle
    GROUP BY 1, 2
  ) i
  JOIN sizes sa ON i.doc_a = sa.doc
  JOIN sizes sb ON i.doc_b = sb.doc
  WHERE n_common / CAST(sa.n + sb.n - n_common AS DOUBLE) >= {min_jaccard}
)"""
        )
        curve_legs.append(
            f"""
SELECT CAST({nb} AS BIGINT) AS n_bands,
       CAST({rpb} AS BIGINT) AS rows_per_band,
       CAST((SELECT COUNT(*) FROM cands_{tag}) AS BIGINT) AS n_candidates,
       CAST((SELECT COUNT(*) FROM ver_{tag}) AS BIGINT) AS n_verified,
       CASE WHEN (SELECT COUNT(*) FROM cands_{tag}) > 0
            THEN CAST((SELECT COUNT(*) FROM ver_{tag}) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM cands_{tag}) AS DOUBLE)
       END AS precision"""
        )
        pair_legs.append(
            f"""SELECT doc_a, doc_b, jaccard,
       CAST({nb} AS BIGINT) AS n_bands,
       CAST({rpb} AS BIGINT) AS rows_per_band
FROM ver_{tag}"""
        )
    curve_sql = "\nUNION ALL\n".join(curve_legs)
    pairs_sql = "\nUNION ALL\n".join(pair_legs)
    ctes.append(f"curve AS ({curve_sql})")
    ctes.append(
        f"""choice AS (
  SELECT n_bands, rows_per_band FROM curve
  ORDER BY (CASE WHEN precision IS NOT NULL
                  AND precision >= {min_precision} THEN 1 ELSE 0 END) DESC,
           n_verified DESC, n_candidates ASC, n_bands ASC
  LIMIT 1
)"""
    )
    ctes.append(f"allpairs AS ({pairs_sql})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT p.doc_a, p.doc_b, p.jaccard, p.n_bands, p.rows_per_band"
        + "\nFROM allpairs p JOIN choice c"
        + "\n  ON p.n_bands = c.n_bands AND p.rows_per_band = c.rows_per_band"
    )
