"""Session-scoped result memo (r10 cluster memo generalized in r14,
VERDICT_r13 #3).

Several registry rows COMPOSE an expensive deterministic artifact that a
real pipeline computes once per corpus snapshot and fans out: the
connected-components cluster frame (5 consumers), the exact cosine
top-k baseline (the 6 `knn_*_recall_eval` rows + knn_probe_curve), and
the two classifier weight tables (their scoring rows re-derive the fit
in-process). Each registry row stays a from-scratch proof for the
driver's correctness gate — the memo only engages under the session
opt-in (``GRAPEFRUIT_CLUSTER_MEMO=1``, set by bench.py), and is
bit-identical by construction because it only skips recomputation of a
deterministic value.

Two stores, both keyed by (applicationId, abs sf_dir, kind) so a
restarted session can never read a stale entry:

- FRAMES: DataFrames re-pinned into self-contained localCheckpoint
  blocks (lineage-truncated, so bench's per-query block sweep must
  spare ``memo_rdd_ids``).
- ROWS: plain collected python values (weight tables) — immune to any
  block sweep.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_FRAMES: dict[tuple[str, str, str], DataFrame] = {}
_ROWS: dict[tuple[str, str, str], list] = {}


def memo_enabled() -> bool:
    return os.environ.get("GRAPEFRUIT_CLUSTER_MEMO") == "1"


def _skip_kinds() -> set[str]:
    """Memo kinds the current caller must build FROM SCRATCH even with
    the memo on — ``GRAPEFRUIT_MEMO_SKIP`` (comma-separated kinds), set
    by bench.py around each BUILDER row's timed runs (r14 optimization
    round). The old all-or-nothing bypass (popping the memo var) made a
    builder of one artifact also rebuild every UPSTREAM shared artifact
    it merely consumes (e.g. jaccard_clusters, builder of the cluster
    frame, re-paid the whole ngram pair-graph build its family already
    charges to ngram_jaccard_pairs); per-kind skip keeps exactly one
    bench row paying each artifact's from-scratch cost."""
    raw = os.environ.get("GRAPEFRUIT_MEMO_SKIP", "")
    return {k for k in raw.split(",") if k}


def memo_active(kind: str) -> bool:
    """True iff the session memo would serve/store this kind for the
    current caller (enabled, and not skip-listed for this bench row)."""
    return memo_enabled() and kind not in _skip_kinds()


def _key(spark: SparkSession, sf_dir: str, kind: str) -> tuple[str, str, str]:
    return (spark.sparkContext.applicationId, os.path.abspath(sf_dir), kind)


def _evict_stale(spark: SparkSession) -> None:
    """Drop entries from earlier sessions in this process: their pinned
    frames reference stopped SparkContexts and would otherwise
    accumulate for the process lifetime (ADVICE r10)."""
    from ..reliability import unpin

    app = spark.sparkContext.applicationId
    for stale in [k for k in _FRAMES if k[0] != app]:
        try:
            unpin(_FRAMES[stale])
        except Exception:  # noqa: BLE001 — context may already be stopped
            pass
        del _FRAMES[stale]
    for stale in [k for k in _ROWS if k[0] != app]:
        del _ROWS[stale]


def memoized_frame(spark: SparkSession, sf_dir: str, kind: str, build):
    """build() → DataFrame, re-pinned so the memo's blocks are
    independent of any intermediate pins a cleanup may drop."""
    from ..reliability import pin

    if not memo_active(kind):
        return build()
    _evict_stale(spark)
    key = _key(spark, sf_dir, kind)
    if key not in _FRAMES:
        _FRAMES[key] = pin(build())
    return _FRAMES[key]


def memoized_rows(spark: SparkSession, sf_dir: str, kind: str, build):
    """build() → list of plain python values (collected, bounded)."""
    if not memo_active(kind):
        return build()
    _evict_stale(spark)
    key = _key(spark, sf_dir, kind)
    if key not in _ROWS:
        _ROWS[key] = build()
    return _ROWS[key]


def memo_rdd_ids(spark: SparkSession) -> set[int]:
    """RDD ids backing live memoized frames for THIS session — a
    block-storage sweep (bench.py's per-query cleanup) must spare
    these: a localCheckpointed frame whose blocks are dropped cannot
    recompute (its lineage is truncated by design)."""
    app = spark.sparkContext.applicationId
    return {
        rid
        for (a, _, _), df in _FRAMES.items()
        if a == app and (rid := getattr(df, "_pin_rdd_id", None)) is not None
    }


def clear_memo() -> None:
    """Release every memoized frame's storage and empty both stores."""
    from ..reliability import unpin

    for df in _FRAMES.values():
        try:
            unpin(df)
        except Exception:  # noqa: BLE001 — context may already be stopped
            pass
    _FRAMES.clear()
    _ROWS.clear()
