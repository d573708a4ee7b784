from __future__ import annotations

import pytest

from grapefruit_spark.operators import relational_ext

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_QUERIES = sorted(relational_ext.ORACLE)


def test_every_query_has_oracle():
    assert sorted(relational_ext.QUERIES) == ORACLE_QUERIES


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, duck, name):
    sdf = relational_ext.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, relational_ext.ORACLE[name])


def test_q2_broadcasts_dim_chain(spark):
    plan = (
        relational_ext.q2_min_cost_supplier(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_q11_threshold_stays_in_plan(spark):
    """The scalar-subquery threshold is a single-row broadcast join inside
    the plan — not a driver-side collect stitched into a literal."""
    plan = (
        relational_ext.q11_important_parts(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_q21_single_shuffle_for_group_and_window(spark):
    """groupBy(orderkey, suppkey) then window-over-orderkey should reuse
    one exchange on the orderkey side, not add a second full shuffle of
    the aggregated data beyond the window's partitioning."""
    plan = (
        relational_ext.q21_late_suppliers(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
