from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grapefruit_spark.operators import relational

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_QUERIES = sorted(relational.ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, duck, name):
    sdf = relational.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, relational.ORACLE[name])


def test_distinct_approx_within_hll_error_bound(spark):
    """approx_count_distinct at rsd 2% must land within a generous
    ±10% band of the exact per-priority distinct customer counts."""
    approx = {
        r["o_orderpriority"]: r["approx_custs"]
        for r in relational.distinct_approx(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for k, a in approx.items():
        e = exact[k]
        assert e > 0 and abs(a - e) <= max(2, 0.10 * e), (k, a, e)


def test_q6_pushdown_and_pruning(spark):
    """Predicates reach the parquet scan; only needed columns are read."""
    plan = relational.q6_forecast_revenue(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    readschema = plan.split("ReadSchema")[1][:300]
    assert "l_extendedprice" in readschema and "l_returnflag" not in readschema


def test_q5_broadcasts_dims(spark):
    plan = relational.q5_local_supplier(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
