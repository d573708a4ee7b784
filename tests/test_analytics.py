from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_quantile_sketch_bounds_error_vs_exact(spark):
    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.analytics import events_quantile_sketch

    approx = {r["event_type"]: r for r in events_quantile_sketch(spark, SF_DIR).collect()}
    ev = table(spark, SF_DIR, "events")
    # the sketch guarantees RANK error (<= 1/accuracy), not value error —
    # check where each approx value lands in the empirical CDF
    rows = ev.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert set(approx) == set(by_type)
    for et, row in approx.items():
        vals = sorted(by_type[et])
        n = len(vals)
        for q, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = sum(v <= row[q] for v in vals) / n
            assert abs(rank - target) <= 0.01 + 1.0 / n, (et, q, rank)
