"""Driver-gate streaming sims (r6 order #2): the formerly tests-only
streaming operators drained through batch oracles. These tests pin the
sim/oracle contracts locally; the driver re-checks them against DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_attribution_window_constant():
    """ORACLE['stream_attribution_sim'] hardcodes INTERVAL 30 MINUTE; it
    must track the streaming operator's actual window."""
    from grapefruit_spark.streaming.events import ATTRIBUTION_WINDOW

    assert ATTRIBUTION_WINDOW == "30 minutes"


def test_ttl_gap_constant():
    """ORACLE['stream_ttl_sim'] hardcodes the 30-min gap in µs; it must
    track the stateful operator's actual gap."""
    from grapefruit_spark.operators.windows import _TTL_GAP_US
    from grapefruit_spark.streaming.events import SESSION_TTL_GAP_MIN

    assert _TTL_GAP_US == SESSION_TTL_GAP_MIN * 60 * 1_000_000


def test_stream_markov_sim_matches_batch(spark):
    """Summed cross-batch deltas == the one-shot batch transition matrix."""
    from grapefruit_spark.operators.event_analytics import (
        events_markov_transitions,
        stream_markov_sim,
    )

    got = {tuple(r) for r in stream_markov_sim(spark, SF_DIR).collect()}
    want = {tuple(r) for r in events_markov_transitions(spark, SF_DIR).collect()}
    assert len(want) > 0
    assert got == want


def test_stream_ttl_sim_emits_every_real_session(spark):
    """The sentinel batch gap-closes every open tail: one emitted row per
    real session, all closed_by='gap', boundaries matching the batch
    gaps-and-islands sessionization."""
    from pyspark.sql.window import Window

    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.windows import stream_ttl_sim

    rows = stream_ttl_sim(spark, SF_DIR).collect()
    assert rows and all(r["closed_by"] == "gap" for r in rows)
    got = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"]) for r in rows}

    ev = table(spark, SF_DIR, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gap = F.col("us") - F.lag("us").over(w)
    sess = (
        ev.withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("is_new").over(
                Window.partitionBy("user_id").orderBy("us").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in sess.collect()
    }
    assert got == want


def test_stream_attribution_sim_matches_batch(spark):
    from grapefruit_spark.operators.windows import _TS_FMT, stream_attribution_sim
    from grapefruit_spark.streaming.events import batch_attribution

    got = {tuple(r) for r in stream_attribution_sim(spark, SF_DIR).collect()}
    want = {
        tuple(r)
        for r in batch_attribution(spark, SF_DIR)
        .select(
            "c_user",
            "click_id",
            "view_id",
            F.date_format("view_ts", _TS_FMT).alias("view_ts"),
            F.date_format("click_ts", _TS_FMT).alias("click_ts"),
        )
        .collect()
    }
    assert len(want) > 0
    assert got == want


def test_stream_dedup_sim_admits_each_event_once(spark):
    """The whole-file redelivery (two forced microbatches) must come out
    exactly the size of the deduped source, one row per event_id."""
    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.windows import stream_dedup_sim

    rows = stream_dedup_sim(spark, SF_DIR).collect()
    n = table(spark, SF_DIR, "events").count()
    assert len(rows) == n
    assert len({r["event_id"] for r in rows}) == n


def test_stream_rollup_sim_equals_one_shot_batch(spark):
    """Two delta merges == the one-shot rollup, exactly (decimal carry)."""
    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.windows import stream_rollup_sim

    got = {
        (r["event_type"], r["hour"]): (r["n_events"], r["sum_value"])
        for r in stream_rollup_sim(spark, SF_DIR).collect()
    }
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "hour"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 2
            )
            .cast("double")
            .alias("sum_value"),
        )
    )
    want = {
        (r["event_type"], r["hour"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert len(want) > 0
    assert got == want


def test_stream_attribution_outer_sim_matches_batch(spark):
    """The streaming LEFT OUTER interval join must equal the batch LEFT
    JOIN exactly: every matched (click, view) pair, plus EXACTLY ONE
    null-padded row per unmatched click — proof the watermark-driven
    outer flush emitted the tail (the sentinel batch advances both side
    watermarks past every real click)."""
    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.windows import stream_attribution_outer_sim

    got = [tuple(r) for r in stream_attribution_outer_sim(spark, SF_DIR).collect()]
    ev = table(spark, SF_DIR, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    want = [
        tuple(r)
        for r in clicks.join(
            views,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("view_ts") <= F.col("click_ts"))
            & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 30 minutes")),
            "leftOuter",
        )
        .select(
            "c_user",
            "click_id",
            "view_id",
            F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        )
        .collect()
    ]
    assert sorted(got, key=str) == sorted(want, key=str)
    # the outer semantics must actually be exercised: this dataset has
    # unmatched clicks, and each appears exactly once with a null view
    nulls = [r for r in got if r[2] is None]
    assert nulls, "no unmatched clicks - outer path untested"
    assert len({r[1] for r in nulls}) == len(nulls)


def test_stream_dedup_state_bounded_by_watermark(spark, tmp_path):
    """THE streaming scale claim, measured instead of asserted: after a
    whole-table redelivery drains, dropDuplicatesWithinWatermark's state
    holds only rows younger than the 1-hour horizon — not the stream's
    lifetime. On the sf0.01 events table (spanning days), that's a few
    dozen rows of 10k, with the rest recorded as removed by the state
    store itself (query.lastProgress stateOperators metrics)."""
    import time as _time

    from grapefruit_spark.catalog import table
    from grapefruit_spark.streaming.events import (
        land_file,
        stream_dedup_within_watermark,
    )

    src = str(tmp_path / "src")
    ev = table(spark, SF_DIR, "events")
    n = ev.count()
    now = _time.time()
    land_file(ev, src, "events_b1.parquet", now - 100)
    land_file(ev, src, "events_b2.parquet", now - 50)
    q = (
        stream_dedup_within_watermark(spark, src, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("t_state_bound")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ops = q.lastProgress["stateOperators"]
    assert ops and ops[0]["operatorName"] == "dedupeWithinWatermark"
    total, removed = ops[0]["numRowsTotal"], ops[0]["numRowsRemoved"]
    # the horizon is 1 hour of a multi-day stream: state must be a tiny
    # fraction of the corpus, and the expired rows must actually have
    # been REMOVED from the store (not retained invisibly)
    assert 0 < total < n * 0.05, (total, n)
    assert removed > n * 0.9, (removed, n)
    assert spark.table("t_state_bound").count() == n  # output still exact
