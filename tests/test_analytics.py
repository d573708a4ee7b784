from __future__ import annotations

import pytest

from grapefruit_spark.operators import analytics

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics.ORACLE))
def test_matches_duckdb_oracle(spark, duck, name):
    assert_matches_oracle(analytics.QUERIES[name](spark, SF_DIR), duck, analytics.ORACLE[name])


def test_running_total_monotone_per_customer(spark):
    rows = analytics.running_total(spark, SF_DIR).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append((r["order_seq"], r["running_spend"]))
    for seqs in by_cust.values():
        seqs.sort()
        spends = [s for _, s in seqs]
        assert all(b >= a - 1e-9 for a, b in zip(spends, spends[1:]))


def test_sliding_window_double_counts(spark, duck):
    """Every event lands in exactly 2 sliding windows (1h window, 30m slide)."""
    total = sum(
        r["n_events"] for r in analytics.events_sliding(spark, SF_DIR).collect()
    )
    n_events = duck.sql("SELECT count(*) FROM events").fetchone()[0]
    assert total == 2 * n_events
