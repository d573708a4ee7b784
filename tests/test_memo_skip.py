"""r14 optimization round: per-kind memo skip + the new shared-artifact
kinds (pair graphs, minhash signatures, duplicate-run tables, backoff
scores, covariance rows, PQ/OPQ codebooks, condorcet pair matrix).

Contracts:
- GRAPEFRUIT_MEMO_SKIP makes exactly the listed kinds build from
  scratch (the bench builder-row shape) while everything else still
  rides the memo — and the values are identical either way.
- Every new kind is OFF without the session opt-in (driver gate stays a
  from-scratch proof) and bit-identical to scratch when on.
- Frame kinds survive bench.py's block sweep (spared by memo_rdd_ids).
"""

from __future__ import annotations

import os

from .conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _sweep_blocks_except(spark, keep: set[int]) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rid in list(jsc.getPersistentRDDs().keySet().toArray()):
        if rid not in keep:
            jsc.sc().unpersistRDD(rid, False)


def _clean_env():
    os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    os.environ.pop("GRAPEFRUIT_MEMO_SKIP", None)


def test_skip_kind_builds_from_scratch_others_memoized(spark):
    from grapefruit_spark.operators import _memo
    from grapefruit_spark.operators.mapreduce_apps import condorcet_pairs

    _clean_env()
    _memo.clear_memo()
    scratch = _rows(condorcet_pairs(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        memoized = condorcet_pairs(spark, SF_DIR)
        assert condorcet_pairs(spark, SF_DIR) is memoized
        os.environ["GRAPEFRUIT_MEMO_SKIP"] = "condorcet_pairs"
        skipped = condorcet_pairs(spark, SF_DIR)
        assert skipped is not memoized, "skip-listed kind must rebuild"
        assert _rows(skipped) == scratch
        os.environ.pop("GRAPEFRUIT_MEMO_SKIP", None)
        assert condorcet_pairs(spark, SF_DIR) is memoized, (
            "clearing the skip list must restore the memoized frame"
        )
    finally:
        _clean_env()
        _memo.clear_memo()


def test_skip_is_per_kind_not_global(spark):
    """A builder row skipping its OWN kind must still read kinds it
    merely consumes: dup_run_stats with dup_runs skipped reuses the
    shared dup_fps frame (one fingerprint pass, charged to
    dup_span_docs)."""
    from grapefruit_spark.operators import _memo, dedup

    _clean_env()
    _memo.clear_memo()
    scratch = _rows(dedup.dup_run_stats(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        dedup.dup_span_docs(spark, SF_DIR).count()  # populates dup_fps
        assert dedup._shared_fps(spark, SF_DIR) is not None
        os.environ["GRAPEFRUIT_MEMO_SKIP"] = "dup_runs"
        assert dedup._shared_runs(spark, SF_DIR) is None, (
            "skipped kind must not serve"
        )
        assert dedup._shared_fps(spark, SF_DIR) is not None, (
            "non-skipped kind must still serve"
        )
        assert _rows(dedup.dup_run_stats(spark, SF_DIR)) == scratch
    finally:
        _clean_env()
        _memo.clear_memo()


def test_new_kinds_off_by_default_and_match_scratch(spark):
    from grapefruit_spark.operators import _memo, dedup
    from grapefruit_spark.operators.search import (
        doc_backoff_surprisal,
        doc_perplexity_buckets,
    )

    _clean_env()
    _memo.clear_memo()
    # off: distinct objects per call, nothing pinned in the memo
    a = dedup.dedup_minhash(spark, SF_DIR)
    b = dedup.dedup_minhash(spark, SF_DIR)
    assert a is not b
    assert not _memo.memo_rdd_ids(spark)
    scratch_pairs = _rows(a)
    scratch_backoff = _rows(doc_backoff_surprisal(spark, SF_DIR))
    scratch_pplx = _rows(doc_perplexity_buckets(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        m = dedup.dedup_minhash(spark, SF_DIR)
        assert dedup.dedup_minhash(spark, SF_DIR) is m
        assert _rows(m) == scratch_pairs
        assert _rows(doc_backoff_surprisal(spark, SF_DIR)) == scratch_backoff
        assert _rows(doc_perplexity_buckets(spark, SF_DIR)) == scratch_pplx
    finally:
        _clean_env()
        _memo.clear_memo()


def test_runs_family_memo_matches_scratch_after_sweep(spark):
    from grapefruit_spark.operators import _memo, dedup

    _clean_env()
    _memo.clear_memo()
    scratch_curve = _rows(dedup.dup_run_threshold_curve(spark, SF_DIR))
    scratch_apply = _rows(dedup.dedup_runs_apply(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        dedup.dup_run_stats(spark, SF_DIR).count()  # populate fps + runs
        _sweep_blocks_except(spark, _memo.memo_rdd_ids(spark))
        assert _rows(dedup.dup_run_threshold_curve(spark, SF_DIR)) == scratch_curve
        assert _rows(dedup.dedup_runs_apply(spark, SF_DIR)) == scratch_apply
    finally:
        _clean_env()
        _memo.clear_memo()


def test_gram_index_kind_matches_scratch(spark):
    from grapefruit_spark.operators import _memo, dedup

    _clean_env()
    _memo.clear_memo()
    scratch = _rows(dedup.ngram_containment_pairs(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        dedup.ngram_jaccard_pairs(spark, SF_DIR).count()  # populates gram_index
        assert _rows(dedup.ngram_containment_pairs(spark, SF_DIR)) == scratch
    finally:
        _clean_env()
        _memo.clear_memo()


def test_pq_and_cov_fit_kinds_match_scratch(spark):
    from grapefruit_spark.operators import _memo, similarity

    _clean_env()
    _memo.clear_memo()
    scratch_pq = _rows(similarity.knn_ivf_pq(spark, SF_DIR))
    scratch_opq_eval = _rows(similarity.knn_opq_recall_eval(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        assert _rows(similarity.knn_ivf_pq(spark, SF_DIR)) == scratch_pq
        # second call consumes the memoized codebooks + covariance rows
        assert (
            _rows(similarity.knn_opq_recall_eval(spark, SF_DIR))
            == scratch_opq_eval
        )
        assert _rows(similarity.knn_opq_recall_eval(spark, SF_DIR)) == (
            scratch_opq_eval
        )
    finally:
        _clean_env()
        _memo.clear_memo()
