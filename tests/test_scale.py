from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grapefruit_spark.operators.scale import bucketed_join, salted_agg, write_bucketed
from grapefruit_spark.plans import executed_plan

from .conftest import SF_DIR


def test_salted_agg_matches_plain(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    salted = salted_agg(
        li,
        "l_returnflag",
        {"n": F.count(F.lit(1)), "qty": F.sum("l_quantity")},
        salt_buckets=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
    )
    got = {r["l_returnflag"]: (r["n"], round(r["qty"], 6)) for r in salted.collect()}
    want = {r["l_returnflag"]: (r["n"], round(r["qty"], 6)) for r in plain.collect()}
    assert got == want


def test_salted_agg_two_phase_plan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = executed_plan(
        salted_agg(li, "l_returnflag", {"n": F.count(F.lit(1))}, salt_buckets=8)
    )
    assert plan.count("Exchange hashpartitioning") == 2  # (key,salt) then key


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"), "t_orders_b", "okey", 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"), "t_lineitem_b", "okey", 8)
    yield "t_orders_b", "t_lineitem_b"
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    """With broadcast disabled (the 100 TB fact-fact case), same-bucketed
    tables sort-merge join with no shuffle exchange at all."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = executed_plan(bucketed_join(spark, lt, rt, "okey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, f"bucketed join shuffled:\n{plan[:600]}"


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    n = bucketed_join(spark, lt, rt, "okey").count()
    want = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n == want
