"""localCheckpoint lifecycle (optimization guide §5).

Every eager ``localCheckpoint`` pins storage blocks in the driver-side
block manager until its RDD is explicitly unpersisted — PySpark exposes
no public unpersist for checkpoints, and the ContextCleaner only frees
them when the Python wrapper happens to be GC'd. Before r15 the engine
held ~35 checkpoint sites (session artifacts + per-invocation
materializations) with only 3 release points: a long verify session
(the driver runs 50 query builds + collects in ONE session) grew
block-manager storage monotonically, and the r14 driver run exhausted
host memory — 40/50 oracle subprocesses failed 16 KB DuckDB allocations
(VERDICT r14, "What's wrong #1").

Two rules, both enforced here so call sites cannot drift:

1. **One storage level for every checkpoint, set here.** The default
   stays ``MEMORY_AND_DISK_DESER`` (what ``localCheckpoint`` uses when
   no level is passed) because the artifacts are re-read hot — A/B at
   sf0.1 measured ``DISK_ONLY`` 20-100% slower on checkpoint-heavy
   queries (d28 1.31→2.23 s, d24 +0.2 s) from the serialize+read-back
   round trip. ``SPARK_GRAFT_CKPT_LEVEL=DISK_ONLY`` (or
   ``MEMORY_AND_DISK``, serialized) trades that CPU for a small JVM
   heap on memory-constrained hosts: blocks then live in the OS page
   cache, which the kernel can reclaim under pressure, unlike JVM
   heap. With rule 2 below, the LIVE block set is bounded either way.

2. **Per-invocation checkpoints are freed, not leaked.** A checkpoint
   that only serves the plan being built (a flag set consumed by a
   count, a candidate list consumed by per-leg scalars) is freed as
   soon as its last consumer has materialized (``free_checkpoint``).
   A checkpoint the RETURNED DataFrame still reads cannot be freed at
   build time — those register under a per-call-site scope
   (``scoped_checkpoint``) that keeps the last ``_KEEP`` generations
   and frees older ones on re-entry, so repeated invocations (bench
   warm + min-of-N loops, the driver's verify sweep) hold O(1) live
   generations per site instead of O(invocations).

Session-scoped artifacts (the ``plans/documents.py`` memo family) are
NOT scoped here — they are one checkpoint per (session, corpus) by
construction and carry a documented production rationale — but they go
through :func:`eager_checkpoint`, so rule 1 applies to them too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LEVELS: dict[str, StorageLevel] = {
    "DISK_ONLY": StorageLevel.DISK_ONLY,
    "MEMORY_AND_DISK": StorageLevel.MEMORY_AND_DISK,
    "MEMORY_AND_DISK_DESER": StorageLevel.MEMORY_AND_DISK_DESER,
    "MEMORY_ONLY": StorageLevel.MEMORY_ONLY,
}


def checkpoint_level() -> StorageLevel:
    name = os.environ.get("SPARK_GRAFT_CKPT_LEVEL", "MEMORY_AND_DISK_DESER")
    try:
        return _LEVELS[name]
    except KeyError:
        raise ValueError(
            f"SPARK_GRAFT_CKPT_LEVEL={name!r} — choose one of {sorted(_LEVELS)}"
        ) from None


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` at the engine's storage level."""
    return df.localCheckpoint(eager=True, storageLevel=checkpoint_level())


def free_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a ``localCheckpoint(eager=True)``
    DataFrame that no later plan references.

    The checkpointed Dataset's analyzed plan is a ``LogicalRDD`` holding
    the persisted RDD; unpersist that directly. Best-effort by design:
    only fires when the plan node really is a LogicalRDD, and any
    reflection failure (or an already-stopped SparkContext) falls back
    to the ContextCleaner path — a leak, never a correctness issue.
    NEVER call this while a downstream plan may still read the
    checkpoint: local checkpoints have no lineage to rebuild from.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


# site key -> live checkpoint generations, oldest first. Two generations
# (not one) so a caller that builds invocation N+1 while still holding
# invocation N's un-collected result never loses blocks mid-flight; the
# bench's warm + min-of-2 loop fully consumes each run before the next
# build, so generation N-2 is always dead by the time it is freed.
_SCOPES: dict[str, list[DataFrame]] = {}
_KEEP = 2


def scoped_checkpoint(site: str, df: DataFrame) -> DataFrame:
    """Eager-checkpoint ``df`` under a per-call-site lifetime scope:
    the returned DataFrame stays valid for this invocation (and the
    previous one), while generations older than ``_KEEP`` are freed —
    bounding a session's live checkpoint blocks at O(sites), not
    O(invocations)."""
    ckpt = eager_checkpoint(df)
    live = _SCOPES.setdefault(site, [])
    live.append(ckpt)
    while len(live) > _KEEP:
        free_checkpoint(live.pop(0))
    return ckpt
