"""Session cluster-frame memo (graph.py r10, VERDICT_r9 order #4).

The memo must be: OFF unless opted in (the driver's correctness gate
then proves every family query from scratch), bit-identical to the
independent paths when on, and robust to bench.py's per-query
block-storage sweep (which spares exactly the memo's RDD ids).
"""

from __future__ import annotations

import os

from .conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _sweep_blocks_except(spark, keep: set[int]) -> None:
    """Replica of bench.py's per-query cleanup."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rid in list(jsc.getPersistentRDDs().keySet().toArray()):
        if rid not in keep:
            jsc.sc().unpersistRDD(rid, False)


def test_memo_off_by_default(spark):
    from grapefruit_spark.operators import graph

    os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    graph.clear_cluster_memo()
    a = graph.dedup_clusters(spark, SF_DIR)
    b = graph.dedup_clusters(spark, SF_DIR)
    assert a is not b, "memo must not engage without the env opt-in"
    assert not graph.cluster_memo_rdd_ids(spark)


def test_memo_reuses_one_frame_and_matches_scratch(spark):
    from grapefruit_spark.operators import graph

    os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    graph.clear_cluster_memo()
    scratch = _rows(graph.dedup_clusters(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        a = graph.dedup_clusters(spark, SF_DIR)
        b = graph.dedup_clusters(spark, SF_DIR)
        assert a is b, "second call must return the memoized frame"
        assert _rows(a) == scratch
        assert graph.cluster_memo_rdd_ids(spark), "memo frame must be pinned"
    finally:
        os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
        graph.clear_cluster_memo()


def test_memo_consumer_matches_scratch_after_block_sweep(spark):
    """The bench contract: after a bench-style unpersist sweep that
    spares the memo ids, a family consumer (dedup_keep_best) riding the
    memoized frame still runs AND returns the from-scratch rows."""
    from grapefruit_spark.operators import graph

    os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    graph.clear_cluster_memo()
    scratch = _rows(graph.dedup_keep_best(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        graph.dedup_clusters(spark, SF_DIR)  # builder populates the memo
        _sweep_blocks_except(spark, graph.cluster_memo_rdd_ids(spark))
        got = _rows(graph.dedup_keep_best(spark, SF_DIR))
        assert got == scratch
    finally:
        os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
        graph.clear_cluster_memo()


def test_memo_jaccard_leakage_safe_matches_scratch(spark):
    """split_leakage_safe rides the jaccard_clusters memo — same rows
    either way."""
    from grapefruit_spark.operators import graph
    from grapefruit_spark.operators.datapipe import split_leakage_safe

    os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    graph.clear_cluster_memo()
    scratch = _rows(split_leakage_safe(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        graph.jaccard_clusters(spark, SF_DIR)  # builder populates the memo
        _sweep_blocks_except(spark, graph.cluster_memo_rdd_ids(spark))
        got = _rows(split_leakage_safe(spark, SF_DIR))
        assert got == scratch
    finally:
        os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
        graph.clear_cluster_memo()


def test_clear_cluster_memo_releases_everything(spark):
    from grapefruit_spark.operators import graph

    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        graph.dedup_clusters(spark, SF_DIR)
        assert graph.cluster_memo_rdd_ids(spark)
        graph.clear_cluster_memo()
        assert not graph.cluster_memo_rdd_ids(spark)
    finally:
        os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
        graph.clear_cluster_memo()


# ------------------------------------------------------- r14 fit memo


def test_fit_memo_off_by_default_and_matches_scratch(spark):
    """VERDICT_r13 #3: the classifier weight tables and the exact ANN
    baseline share the session memo — OFF by default, bit-identical
    values when on."""
    from grapefruit_spark.operators import _memo, search, similarity

    os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    _memo.clear_memo()
    scratch_fit = _rows(search.quality_classifier_fit(spark, SF_DIR))
    scratch_knn = _rows(similarity.knn_bruteforce(spark, SF_DIR))
    a = similarity.knn_bruteforce(spark, SF_DIR)
    b = similarity.knn_bruteforce(spark, SF_DIR)
    assert a is not b, "memo must not engage without the env opt-in"
    assert not _memo._ROWS and not _memo._FRAMES
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        assert _rows(search.quality_classifier_fit(spark, SF_DIR)) == scratch_fit
        keys = {k[2] for k in _memo._ROWS}
        assert "qc_ridge_fit" in keys
        # the score row rides the memoized weights and still matches
        # its own from-scratch emission (values are memo-invariant)
        f1 = similarity.knn_bruteforce(spark, SF_DIR)
        f2 = similarity.knn_bruteforce(spark, SF_DIR)
        assert f1 is f2, "second call must return the memoized frame"
        assert _rows(f1) == scratch_knn
        assert _memo.memo_rdd_ids(spark)
    finally:
        os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
        _memo.clear_memo()


def test_fit_memo_consumers_match_scratch_after_sweep(spark):
    """Recall-eval and classifier-score rows riding the memo return the
    from-scratch rows even after a bench-style block sweep."""
    from grapefruit_spark.operators import _memo, search, similarity

    os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    _memo.clear_memo()
    scratch_recall = _rows(similarity.knn_recall_eval(spark, SF_DIR))
    scratch_score = _rows(search.quality_classifier_score(spark, SF_DIR))
    os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    try:
        similarity.knn_bruteforce(spark, SF_DIR)  # builders populate
        search.quality_classifier_fit(spark, SF_DIR)
        _sweep_blocks_except(spark, _memo.memo_rdd_ids(spark))
        assert _rows(similarity.knn_recall_eval(spark, SF_DIR)) == scratch_recall
        assert _rows(search.quality_classifier_score(spark, SF_DIR)) == scratch_score
    finally:
        os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
        _memo.clear_memo()
