from __future__ import annotations

import pytest

from grapefruit_spark.operators import event_analytics

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_QUERIES = sorted(event_analytics.ORACLE)


def test_every_query_has_oracle():
    assert sorted(event_analytics.QUERIES) == ORACLE_QUERIES


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, duck, name):
    sdf = event_analytics.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, event_analytics.ORACLE[name])


def test_funnel_is_monotone(spark):
    row = event_analytics.events_funnel(spark, SF_DIR).first()
    assert row["n_users"] >= row["step_view"] >= row["step_click"] >= row["step_purchase"]
    assert row["step_view"] > 0


def test_funnel_strict_ordering(spark):
    """A click before the first view must not count as funnel step 2."""
    df = spark.createDataFrame(
        [
            (1, "click", 100), (1, "view", 200), (1, "click", 300), (1, "purchase", 400),
            (2, "click", 100), (2, "view", 200),  # click only before view
            (3, "view", 100), (3, "purchase", 200),  # skipped step
        ],
        "user_id long, event_type string, us long",
    ).select("user_id", "event_type",
             __import__("pyspark.sql.functions", fromlist=["timestamp_micros"]).timestamp_micros("us").alias("ts"))
    orig = event_analytics.table
    try:
        event_analytics.table = (
            lambda spark, sf_dir, name: df if name == "events" else orig(spark, sf_dir, name)
        )
        row = event_analytics.events_funnel(spark, SF_DIR).first()
    finally:
        event_analytics.table = orig
    assert row["n_users"] == 3
    assert row["step_view"] == 3
    assert row["step_click"] == 1  # only user 1 clicked after viewing
    assert row["step_purchase"] == 1  # user 3's purchase skips the click step


def test_retention_week_zero_covers_all_cohorts(spark):
    rows = event_analytics.events_retention(spark, SF_DIR).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], set()).add(r["weeks_since"])
    assert all(0 in wks for wks in by_cohort.values())


def test_state_intervals_contiguous_per_user(spark):
    """Each user's SCD2 history: contiguous intervals, exactly one open
    (valid_to NULL) current state, no adjacent duplicate states."""
    rows = event_analytics.events_state_intervals(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for hist in by_user.values():
        hist.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in hist if r["valid_to"] is None) == 1
        assert hist[-1]["valid_to"] is None
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"]


def test_ewma_matches_python_reference(spark):
    rows = event_analytics.events_ewma_hourly(spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    a = 1.0 - event_analytics.EWMA_ALPHA
    span = event_analytics.EWMA_SPAN
    for series in by_type.values():
        series.sort(key=lambda r: r["hour"])
        ns = [r["n"] for r in series]
        for t, r in enumerate(series):
            vals = ns[max(0, t - span + 1): t + 1]
            ws = [a ** (len(vals) - 1 - i) for i in range(len(vals))]
            want = sum(v * w for v, w in zip(vals, ws)) / sum(ws)
            assert abs(r["ewma"] - want) < 1e-5, (r, want)


def test_events_markov_surprisal_python_reference(spark):
    """Per-user summed -ln P(next|prev) against a direct python
    recomputation from the same events (matrix + scoring), including the
    floor(avg*1e6) emission grid."""
    import math
    from collections import Counter, defaultdict

    from grapefruit_spark.catalog import table

    rows = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    seqs: dict[int, list] = defaultdict(list)
    for r in rows:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    steps = []
    for u, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            steps.append((u, a, b))
    trans = Counter((a, b) for _, a, b in steps)
    n_from = Counter(a for _, a, _ in steps)
    want = {}
    per_user: dict[int, list] = defaultdict(list)
    for u, a, b in steps:
        per_user[u].append(-math.log(trans[(a, b)] / n_from[a]))
    for u, surps in per_user.items():
        # mirror the DECIMAL(28,12) quantization of each addend
        total = sum(round(s, 12) for s in surps)
        want[u] = (len(surps), math.floor(total / len(surps) * 1_000_000))
    got = {
        r["user_id"]: (r["n_steps"], r["avg_surprisal_e6"])
        for r in event_analytics.events_markov_surprisal(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], (u, got[u], want[u])
        # the python float sum and the exact decimal sum may straddle a
        # floor boundary in the 12th decimal; allow 1 grid step
        assert abs(got[u][1] - want[u][1]) <= 1, (u, got[u], want[u])
