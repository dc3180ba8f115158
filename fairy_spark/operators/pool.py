"""Bounded named pools for materialized intermediate frames.

The optimization rounds' recompute-amplification fix (guide §1.2 step 1,
§2.4, §5): several operators build an expensive frame that feeds
MULTIPLE join branches of one query — the cleaned corpus in the
pretraining pipeline, the co-purchase pair set in the triangle queries,
the winnow fingerprint explode. Catalyst evaluates each branch
independently (exchange reuse only fires when two byte-identical
exchanges survive planning), so without a materialization boundary the
subtree re-executes once per branch — measured 10,780 parquet scans in
ONE declarative-pipeline plan and 66 lineitem scans per triangle query
before r14.

Two materialization modes (see park_persisted's docstring for the
measured trade-off): ``persist`` + eager count for small-plan frames —
the InMemoryRelation keeps accurate size statistics so broadcast joins
survive planning — and ``localCheckpoint(eager=True)`` for
lineage-heavy frames, where a persisted entry's multi-thousand-node
plan would tax EVERY later action in the session with CacheManager
plan comparisons (guide §5: "localCheckpoint() is a cheaper way to cut
lineage").

The bounded FIFO pool keeps the most recent frames referenced so a
still-lazy caller's frame is not reclaimed, and evicts beyond the cap
(persisted frames are unpersisted — correctness-safe, Spark recomputes
from lineage; checkpointed frames drop the reference and the
ContextCleaner reclaims their blocks after GC). Trade-off at 100 TB:
localCheckpoint forfeits lineage-based recovery of the materialized
stage (an executor loss invalidates the frame) — the production shape
for a multi-TB boundary is the durable parquet stage
(`pipeline_pretrain_corpus_staged`), which the declarative form's
in-memory boundary deliberately mirrors.

This is NOT cross-run result caching: every query invocation
materializes its OWN freshly-built frame (nothing is keyed on the
input path or reused between invocations), and the eager
materialization runs inside the bench's timed window.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCK = threading.Lock()
# pool name -> list of (frame, was_persisted)
_POOLS: dict[str, list[tuple[DataFrame, bool]]] = {}
_DEFAULT_CAP = 4


def park_persisted(
    pool: str, df: DataFrame, cap: int = _DEFAULT_CAP, checkpoint: bool = False
) -> DataFrame:
    """Materialize ``df`` eagerly and park the result in the named
    bounded pool; returns the materialized frame.

    Two modes, chosen by the frame's LINEAGE SIZE (measured trade-off,
    r14):

    - ``checkpoint=False`` (default) — ``persist`` + eager count. The
      InMemoryRelation carries accurate post-materialization size
      statistics, so Catalyst still plans broadcast joins over the
      frame (winnow's pair self-join measured 1.3 s persisted vs 28 s
      checkpointed, purely from BHJ → SMJ demotion against a
      statistics-less leaf). Right for frames whose logical plan is
      small. Evicted frames are unpersisted.
    - ``checkpoint=True`` — ``localCheckpoint``: the plan is CUT to a
      LogicalRDD leaf and the CacheManager is never touched. Right for
      lineage-heavy frames (the pipeline's cleaned corpus nests the
      whole connected-components loop): persisting those registers a
      multi-thousand-node plan that every later action in the SESSION
      pays canonicalization/comparison against (measured 51 s → 144 s
      on an unrelated query that merely ran after one). Evicted frames
      just drop the reference; the ContextCleaner reclaims blocks.
    """
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    else:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
    with _LOCK:
        frames = _POOLS.setdefault(pool, [])
        frames.append((df, not checkpoint))
        while len(frames) > cap:
            old, was_persisted = frames.pop(0)
            if was_persisted:
                old.unpersist(blocking=False)
    return df


def clear_pool(pool: str | None = None) -> None:
    """Unpersist/drop every parked frame in ``pool`` (all pools when
    None) — test/bench hygiene; checkpoint block reclaim follows via
    the ContextCleaner."""
    with _LOCK:
        names = [pool] if pool is not None else list(_POOLS)
        for name in names:
            for df, was_persisted in _POOLS.pop(name, []):
                if was_persisted:
                    df.unpersist(blocking=False)
