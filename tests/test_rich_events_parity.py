"""Spark↔DuckDB parity on an ADVERSARIAL synthetic events table.

The C-block operators have only ever been parity-checked against the
driver-generated events stream, whose timestamps are well-spread and
whose values are benign. This file replays the driver's exact
row/schema/hash gate over an events table engineered to hit the edges a
different generator could produce:

- duplicate (user, ts) pairs — exercises every tie-break-by-event_id,
- inter-event gaps landing EXACTLY on the 1800 s session boundary,
- events exactly on hour / 30-min window starts (tumbling/sliding edges),
- metronome users (constant gaps → CV 0) and single-event users,
- negative / zero / heavy-tailed values (MAD + z-score filters),
- malformed and missing-key JSON props,
- a multi-week span with empty days (rolling DAU, retention).

Seeded — byte-identical across runs.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from .util import assert_matches_oracle

RICH_EVENT_QUERIES = [
    ("windows", "events_tumbling"),
    ("windows", "events_sessionize"),
    ("windows", "events_session_window"),
    ("windows", "events_session_conversion"),
    ("windows", "events_props_agg"),
    ("windows", "events_purchase_attribution"),
    ("analytics", "events_sliding"),
    ("analytics", "events_zscore_outliers"),
    ("event_analytics", "events_funnel"),
    ("event_analytics", "events_retention"),
    ("event_analytics", "events_heavy_hitters"),
    ("event_analytics", "events_histogram"),
    ("event_analytics", "events_user_lifetime"),
    ("event_analytics", "events_rate_anomaly"),
    ("event_analytics", "events_state_intervals"),
    ("event_analytics", "events_markov_transitions"),
    ("event_analytics", "events_top_paths"),
    ("event_analytics", "events_pattern_search"),
    ("event_analytics", "events_rolling_dau"),
    ("event_analytics", "events_bot_score"),
    ("event_analytics", "events_ewma_hourly"),
    ("event_analytics", "events_value_mad"),
    # r10: dwell-time stats per transition — the adversarial streams'
    # equal-timestamp ties exercise the (ts, event_id) ordering contract
    ("event_analytics", "events_transition_dwell"),
    # r10 second wave: hostile streams carry real per-user skew, so the
    # ntile tie contract (n_events DESC, user_id ASC) gets exercised
    ("event_analytics", "events_pareto_share"),
    # r12: the CMS pair — the Zipf user distribution gives real
    # collision mass at every width
    ("event_analytics", "events_cms_error"),
    ("event_analytics", "events_cms_width_curve"),
    ("event_analytics", "stream_cms_sim"),
]

_TYPES = ["view", "click", "purchase", "signup", "error"]
_BASE_US = 1_709_251_200_000_000  # 2024-03-01 00:00:00 UTC in micros


def _build_events(path: str, base_us: int = _BASE_US) -> None:
    rng = random.Random(20260814)
    rows = []  # (event_id, ts_us, user_id, event_type, value, props)
    eid = 0

    def emit(ts_us, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts_us, user, etype, value, props))
        eid += 1

    def props_for(i):
        r = i % 7
        if r == 0:
            return None
        if r == 1:
            return "not json {"
        if r == 2:
            return '{"other": 1}'
        return f'{{"k": {rng.randint(-50, 150)}}}'

    def value_for():
        r = rng.random()
        if r < 0.05:
            return 0.0
        if r < 0.10:
            return round(-rng.uniform(0.001, 50), 3)
        if r < 0.15:
            return round(rng.uniform(500, 5000), 3)  # heavy tail
        return round(rng.uniform(0.001, 100), 3)

    hour = 3_600_000_000
    for user in range(1, 41):
        t = base_us + rng.randint(0, 10) * 86_400_000_000 + rng.randint(0, hour)
        for _ in range(rng.randint(2, 60)):
            emit(t, user, rng.choice(_TYPES), value_for(), props_for(eid))
            gap_kind = rng.random()
            if gap_kind < 0.1:
                gap = 1_800_000_000  # EXACT session boundary (1800 s)
            elif gap_kind < 0.2:
                gap = 0  # duplicate timestamp, distinct event_id
            elif gap_kind < 0.3:
                gap = hour - (t % hour)  # land exactly on the next hour
            else:
                gap = rng.randint(1, 2 * hour)
            t += gap
    # metronome bot: constant 60 s gaps (CV exactly 0)
    t = base_us
    for _ in range(30):
        emit(t, 777, "view", 1.0, '{"k": 1}')
        t += 60_000_000
    # single-event users (no gaps, no lag rows)
    for user in range(900, 905):
        emit(base_us + user * 1_000_000, user, "signup", value_for(), None)
    # funnel chain user: view -> click -> purchase strictly ordered
    t = base_us + 20 * 86_400_000_000
    for etype in ("view", "click", "purchase"):
        emit(t, 555, etype, 10.0, '{"k": 5}')
        t += 1_000_000

    import pandas as pd

    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df.to_parquet(path, index=False)


@pytest.fixture(scope="module")
def rich_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("richev")
    (d / "events.parquet").mkdir()
    _build_events(str(d / "events.parquet" / "part-0.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def rich_events_duck(rich_events_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{rich_events_dir}/events.parquet/*.parquet'"
    )
    return con


@pytest.mark.parametrize(
    "mod_name,qname", RICH_EVENT_QUERIES, ids=[q for _, q in RICH_EVENT_QUERIES]
)
def test_rich_events_match_oracle(spark, rich_events_dir, rich_events_duck, mod_name, qname):
    import importlib

    mod = importlib.import_module(f"grapefruit_spark.operators.{mod_name}")
    assert_matches_oracle(
        mod.QUERIES[qname](spark, rich_events_dir),
        rich_events_duck,
        mod.ORACLE[qname],
    )


def test_rich_events_hit_the_edges(spark, rich_events_dir):
    """Guard the guard: the generator must actually produce the regimes
    this file exists to test."""
    import duckdb

    con = duckdb.connect()
    rel = f"'{rich_events_dir}/events.parquet/*.parquet'"
    dup_ts = con.sql(
        f"SELECT count(*) FROM (SELECT user_id, ts FROM {rel} "
        f"GROUP BY 1, 2 HAVING count(*) > 1)"
    ).fetchone()[0]
    assert dup_ts > 0, "need duplicate (user, ts) pairs"
    on_hour = con.sql(
        f"SELECT count(*) FROM {rel} WHERE date_trunc('hour', ts) = ts"
    ).fetchone()[0]
    assert on_hour > 0, "need events exactly on hour boundaries"
    neg = con.sql(f"SELECT count(*) FROM {rel} WHERE value < 0").fetchone()[0]
    assert neg > 0, "need negative values"
    bad_json = con.sql(
        f"SELECT count(*) FROM {rel} WHERE props = 'not json {{'"
    ).fetchone()[0]
    assert bad_json > 0, "need malformed props"


# ---------------------------------------------------------------- embeddings
def _build_embeddings(path: str) -> None:
    """Small-integer coordinates make every dot product / norm exact in
    float64, so planted structures produce EXACT cosine ties: duplicate
    vectors (cos 1 with each other), negated vectors (cos −1), and
    axis-aligned one-hots (cos 0) — the regimes where top-k tie-breaking
    either works on both engines or silently diverges."""
    rng = random.Random(7)
    import pandas as pd

    rows = []
    for vid in range(60):
        if vid % 10 == 3 and vid > 10:
            vec = list(rows[vid - 1][1])  # exact duplicate of previous
        elif vid % 10 == 4 and vid > 10:
            vec = [-x for x in rows[vid - 2][1]]  # exact negation
        elif vid % 10 == 5:
            vec = [0.0] * 64
            vec[vid % 64] = 1.0  # one-hot
        else:
            vec = [float(rng.randint(-3, 3)) for _ in range(64)]
            if not any(vec):
                vec[0] = 1.0
        rows.append((vid, vec, vid % 4))
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    df["vec_id"] = df["vec_id"].astype("int64")
    df["label"] = df["label"].astype("int32")
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), path)


@pytest.fixture(scope="module")
def rich_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("richemb")
    (d / "embeddings.parquet").mkdir()
    _build_embeddings(str(d / "embeddings.parquet" / "part-0.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "qname",
    [
        "knn_bruteforce",
        "knn_topk_partitioned",
        "embedding_neardup",
        # r6: LSH bucketing and IVF cell ranking on planted ties. Exact
        # integer coordinates make mathematically-tied cosines (one-hot
        # centroids, duplicate vectors) EXACTLY equal in float on both
        # engines, so the cell/rank tie-breaks are what's under test;
        # LSH sign bits use irrational hyperplanes, so no dot lands on 0.
        "knn_lsh",
        "knn_ivf",
    ],
)
def test_rich_embeddings_match_oracle(spark, rich_emb_dir, qname):
    from grapefruit_spark.operators import similarity

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{rich_emb_dir}/embeddings.parquet/*.parquet'"
    )
    assert_matches_oracle(
        similarity.QUERIES[qname](spark, rich_emb_dir),
        con,
        similarity.ORACLE[qname],
    )


def test_topn_tie_at_the_cut(spark, tmp_path):
    """Top-N-with-ties: plant exact count ties STRADDLING the top-10 cut
    for both ranked reports — an 8-way user tie spanning ranks 7-14 in
    events_heavy_hitters and a 4-way triple tie spanning ranks 10-13 in
    events_top_paths — and assert the driver's full hash gate. If either
    engine's tie-break (user_id asc / lexicographic triple asc) drifted,
    different rows would survive the LIMIT and the hash would diverge."""
    import pandas as pd

    from grapefruit_spark.operators import event_analytics

    rows = []
    eid = 0

    def emit(user, etype, ts_us):
        nonlocal eid
        rows.append((eid, ts_us, user, etype, 1.0, None))
        eid += 1

    t = _BASE_US
    # heavy hitters: 6 distinct counts (20..15) then an 8-way tie at 10
    for user, n in enumerate([20, 19, 18, 17, 16, 15] + [10] * 8, start=1):
        for _ in range(n):
            emit(user, "hh", t)
            t += 1_000_000
    # top paths: distinct triples with counts 12..5, then a 4-way tie at
    # 4 (ranks 10-13 after the giant hh,hh,hh triple takes rank 1) —
    # each occurrence is its own 3-event user so it yields exactly one
    # (a_i, b_i, c_i) triple
    user = 1000
    for i, cnt in enumerate([12, 11, 10, 9, 8, 7, 6, 4, 4, 4, 4]):
        for _ in range(cnt):
            for step in ("a", "b", "c"):
                emit(user, f"{step}{i}", t)
                t += 1_000_000
            user += 1

    d = tmp_path / "ties"
    (d / "events.parquet").mkdir(parents=True)
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = pd.to_datetime(df["ts"], unit="us").astype("datetime64[us]")
    df.to_parquet(str(d / "events.parquet" / "p.parquet"), index=False)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    for qname in ("events_heavy_hitters", "events_top_paths"):
        assert_matches_oracle(
            event_analytics.QUERIES[qname](spark, str(d)),
            con,
            event_analytics.ORACLE[qname],
        )
    # guard the guard: the cut must actually slice through each tie group
    hh = event_analytics.QUERIES["events_heavy_hitters"](spark, str(d)).collect()
    assert [r["user_id"] for r in hh] == list(range(1, 11))  # ids 7-10 from the tie
    tp = event_analytics.QUERIES["events_top_paths"](spark, str(d)).collect()
    assert tp[0]["t1"] == "hh" and len(tp) == 10
    assert sorted(r["n"] for r in tp)[:2] == [4, 4]  # tie partially kept


def test_props_agg_negative_sum_division(spark, tmp_path):
    """Both Spark `div` and DuckDB integer `//` truncate toward zero —
    pin that empirically on negative sums, with and without a remainder
    (a floor-division engine would emit -23334 for -70000/3, truncation
    emits -23333; the engines must agree, whichever convention)."""
    import pandas as pd

    from grapefruit_spark.operators import windows

    d = tmp_path / "negk"
    (d / "events.parquet").mkdir(parents=True)
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7],
            "ts": pd.to_datetime(
                [_BASE_US + i for i in range(7)], unit="us"
            ).astype("datetime64[us]"),
            "user_id": [1, 1, 2, 2, 3, 3, 3],
            "event_type": ["a", "a", "b", "b", "c", "c", "c"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
            "props": [
                '{"k": -7}', '{"k": -8}', '{"k": 3}', None,
                '{"k": -3}', '{"k": -2}', '{"k": -2}',
            ],
        }
    )
    df.to_parquet(str(d / "events.parquet" / "p.parquet"), index=False)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    assert_matches_oracle(
        windows.QUERIES["events_props_agg"](spark, str(d)),
        con,
        windows.ORACLE["events_props_agg"],
    )
    got = {
        r["event_type"]: r["avg_k_e4"]
        for r in windows.QUERIES["events_props_agg"](spark, str(d)).collect()
    }
    assert got["a"] == -75000  # exact: (-15 * 1e4) / 2
    assert got["c"] == -23333  # trunc(-70000 / 3) on BOTH engines
