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
