from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grapefruit_spark.operators import windows

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(windows.ORACLE))
def test_matches_duckdb_oracle(spark, duck, name):
    assert_matches_oracle(windows.QUERIES[name](spark, SF_DIR), duck, windows.ORACLE[name])


def test_sessionize_gap_semantics(spark):
    """Hand-built stream: 3 events 10 min apart, then a 2 h gap."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "view", 1.0, "{}"),
        (3, "2024-01-01 00:20:00", 7, "click", 1.0, "{}"),
        (4, "2024-01-01 02:20:00", 7, "view", 1.0, "{}"),
        (5, "2024-01-01 00:05:00", 8, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["user_id"], r["session_id"]): r["n_events"] for r in windows.sessionize(df).collect()}
    assert out == {(7, 1): 3, (7, 2): 1, (8, 1): 1}


def test_asof_join_picks_latest_at_or_before(spark):
    ev = spark.createDataFrame(
        [(1, 10, "2024-06-01 12:00:00"), (2, 10, "2024-06-03 00:00:00"), (3, 11, "2024-06-01 00:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orders = spark.createDataFrame(
        [
            (10, "2024-06-01 00:00:00", 100, 10.0),
            (10, "2024-06-02 00:00:00", 200, 20.0),
            (10, "2024-06-09 00:00:00", 300, 30.0),
        ],
        "o_custkey long, o_orderdate string, o_orderkey long, o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    out = windows.asof_join(
        ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
        payload=["o_orderdate", "o_orderkey", "o_totalprice"],
    )
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None}  # user 11 has no order → null


@pytest.mark.parametrize("encoding", ["timestamp", "timestamp_ntz", "bigint_ns"])
def test_sessionize_hardened_across_ts_encodings(spark, encoding):
    """The testdata generator has shipped events.ts as TIMESTAMP(NANOS)
    (bigint under nanosAsLong), timestamp[us] (TIMESTAMP_NTZ), and zoned
    TIMESTAMP across rounds. normalize_ts must make sessionize produce
    identical results for all three encodings of the same instants."""
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC
    rows = [(i, base_us + i * 60_000_000, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, us long, user_id long")
    if encoding == "timestamp":
        ev = df.select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    elif encoding == "timestamp_ntz":
        ev = df.select(
            "event_id", "user_id",
            F.timestamp_micros("us").cast("timestamp_ntz").alias("ts"),
        )
    else:
        ev = df.select("event_id", "user_id", (F.col("us") * 1000).alias("ts"))
    ev = ev.withColumn("value", F.lit(1.0))
    got = sorted(tuple(r) for r in windows.sessionize(ev).collect())
    assert len(got) == 3  # one dense session per user
    want = [
        (u, 1, 10, f"2024-01-01 00:0{u}:00", f"2024-01-01 00:2{7 + u}:00", 10.0)
        for u in (0, 1, 2)
    ]
    got_simplified = sorted((r[0], r[1], r[2], r[3], r[4], r[5]) for r in got)
    assert got_simplified == want


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200)), min_size=1, max_size=15
    ),
    ivs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200), st.integers(0, 3600)),
        min_size=1,
        max_size=8,
    ),
    bin_s=st.sampled_from([60, 600, 3600]),
)
def test_interval_join_binned_matches_bruteforce(spark, pts, ivs, bin_s):
    """Property: the binned interval join equals the naive O(P*I) range
    join on arbitrary points/intervals — including zero-length intervals,
    points exactly on bin edges, and intervals spanning many bins."""
    base = 1_704_067_200
    points = spark.createDataFrame(
        [(u, i, base + off) for i, (u, off) in enumerate(pts)],
        "user_id long, pid long, sec long",
    ).select("user_id", "pid", F.timestamp_seconds("sec").alias("ts"))
    intervals = spark.createDataFrame(
        [(u, j, base + s0, base + s0 + ln) for j, (u, s0, ln) in enumerate(ivs)],
        "user_id long, iid long, s0 long, e0 long",
    ).select(
        "user_id", "iid",
        F.timestamp_seconds("s0").alias("s"),
        F.timestamp_seconds("e0").alias("e"),
    )
    got = {
        (r["pid"], r["iid"])
        for r in windows.interval_join_binned(
            points, intervals, keys=["user_id"], point_ts="ts",
            start="s", end="e", bin_seconds=bin_s,
        ).collect()
    }
    want = {
        (i, j)
        for i, (pu, poff) in enumerate(pts)
        for j, (iu, s0, ln) in enumerate(ivs)
        if pu == iu and s0 <= poff < s0 + ln
    }
    assert got == want


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000), st.integers(0, 99)),
        min_size=1,
        max_size=12,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, lefts, rights):
    """Property: our union+window as-of join equals pandas.merge_asof
    (backward direction) when right-side (key, time) pairs are unique —
    most recent right row at or before each left time, per key."""
    import pandas as pd

    # dedup right (key, time) to the max payload — our tie rule
    rd = {}
    for k, t, p in rights:
        rd[(k, t)] = max(rd.get((k, t), -1), p)
    rights_u = [(k, t, p) for (k, t), p in rd.items()]

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(rights_u, "k long, t long, payload long")
    got = {
        (r["lid"], r["payload"])
        for r in windows.asof_join(
            left, right, left_on="k", right_on="k",
            left_time="t", right_time="t", payload=["payload"],
        ).collect()
    }
    lpd = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(lefts)], columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(rights_u, columns=["k", "t", "payload"]).sort_values("t", kind="stable")
    m = pd.merge_asof(lpd, rpd, on="t", by="k", direction="backward")
    want = {
        (int(r.lid), None if pd.isna(r.payload) else int(r.payload))
        for r in m.itertuples()
    }
    assert got == want
