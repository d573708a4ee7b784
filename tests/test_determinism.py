"""Partitioning-independence of rounded double aggregates.

Round 1's only driver hash mismatch (events_sessionize) came from IEEE
double summation order varying with shuffle layout: when a session's
float sum lands on a 2 dp rounding boundary, round(sum(double), 2) can
flip between partitionings. The fix (functions.dec_sum / dec_avg) makes
the partial sums exact decimals, so the rounded value is identical under
ANY partitioning. These tests run the affected operators under 2 and 32
shuffle partitions (and a hostile input repartition) and assert the
canonicalized results are bit-identical.
"""

from __future__ import annotations

import pytest

from grapefruit_spark.operators import event_analytics, relational, windows

from .conftest import SF_DIR
from .util import canon_rows


def _rows_under_partitions(spark, fn, n_shuffle: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_shuffle))
        # AQE coalesces small shuffles adaptively; disable so the
        # partition count we set is the one actually used.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = fn(spark, SF_DIR)
        return canon_rows([tuple(r) for r in df.collect()], df.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


@pytest.mark.parametrize(
    "fn",
    [
        windows.events_sessionize,
        windows.events_tumbling,
        windows.events_session_window,
        event_analytics.events_user_lifetime,
        event_analytics.events_histogram,
        relational.q1_pricing_summary,
        relational.q14_promo_effect,
    ],
    ids=lambda f: f.__name__,
)
def test_rounded_aggs_partition_independent(spark, fn):
    a = _rows_under_partitions(spark, fn, 2)
    b = _rows_under_partitions(spark, fn, 32)
    assert a == b


def test_sessionize_stable_under_input_repartition(spark):
    """Same check with the INPUT shuffled into a different layout, which
    changes per-partition partial-sum order even at a fixed shuffle
    partition count."""
    from grapefruit_spark.catalog import table

    ev = table(spark, SF_DIR, "events")
    base = windows.sessionize(ev)
    shuffled = windows.sessionize(ev.repartition(7, "event_id"))
    a = canon_rows([tuple(r) for r in base.collect()], base.columns)
    b = canon_rows([tuple(r) for r in shuffled.collect()], shuffled.columns)
    assert a == b


@pytest.mark.parametrize(
    "modname,qname",
    [
        ("dedup", "ngram_jaccard_pairs"),
        ("dedup", "dedup_spans_apply"),
        ("text", "doc_entropy"),
        ("search", "doc_unigram_logprob"),
        ("search", "vocab_coverage"),
        ("analytics", "events_zscore_outliers"),
        ("event_analytics", "events_bot_score"),
        ("graph", "jaccard_clusters"),
    ],
    ids=lambda x: x if isinstance(x, str) else "",
)
def test_round5_ops_partition_independent(spark, modname, qname):
    """The round-5 exact-emission program (integer ppm, decimal-exact
    sums, prefix-filtered pairs, pinned shingle arrays) must hold under
    a hostile shuffle layout, not just the default one."""
    import importlib

    mod = importlib.import_module(f"grapefruit_spark.operators.{modname}")
    fn = mod.QUERIES[qname]
    a = _rows_under_partitions(spark, fn, 3)
    b = _rows_under_partitions(spark, fn, 32)
    assert a == b and a
