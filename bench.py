"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes its full plan through the noop sink (no driver
collect, no result materialization cost) — the number is engine time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grapefruit_spark.operators import all_queries  # noqa: E402
from grapefruit_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q18_large_volume",
    "top_n_per_group",
    "webgraph_inlinks",
    "condorcet_pairs",
    "mj_wordcount",
    "events_tumbling",
    "events_sessionize",
    "events_asof_join",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "lang_id",
    "token_count",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "running_total",
    "price_percentiles",
    "events_sliding",
    # extended TPC-H block
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q9_product_profit",
    "q21_late_suppliers",
    # event analytics
    "events_funnel",
    "events_retention",
    # training-data pipeline
    "split_train_val",
    "quality_repetition",
    "pii_redact",
    "seq_packing",
    "decontaminate_ngrams",
    # search / term weighting
    "tfidf_top_terms",
    "bm25_search",
    # native session windows + iterative ML
    "events_session_window",
    "kmeans_embeddings",
    # profiling / data quality / window depth
    "profile_orders",
    "validate_constraints",
    "events_user_lifetime",
    "customer_order_windows",
    # graph depth / association mining / entity resolution
    "copurchase_triangles",
    "copurchase_lift",
    "fuzzy_name_pairs",
    # corpus LM scoring / balancing / SCD2
    "doc_unigram_logprob",
    "sample_k_per_group",
    "events_state_intervals",
    # round-4 additions: semantic dedup, mixture balancing, markov,
    # binned interval join, path/pattern mining, weighted sampling
    "semantic_dedup",
    "domain_mix_sample",
    "events_markov_transitions",
    "events_purchase_attribution",
    "events_top_paths",
    "events_pattern_search",
    "quality_weighted_sample",
    "events_rolling_dau",
    # round-4 second wave: cohort LTV, market concentration, robust
    # outliers, token entropy, oracle-backed CC
    "order_cohort_ltv",
    "supplier_hhi",
    "events_value_mad",
    "doc_entropy",
    "dup_span_docs",
    "vocab_coverage",
    # round-5 addition: exact-substring dedup APPLY step
    "dedup_spans_apply",
    # round-6 additions: exe-pipe MR path, trained-IVF ANN, partitioned
    # top-k merge, multimodal decode round-trip
    "mj_exe_wordcount",
    "knn_ivf_trained",
    "knn_topk_partitioned",
    "multimodal_features",
    # round-6 second wave: previously non-benched heavies, added after a
    # full-registry sweep caught embedding_neardup running 34.5 s (the
    # interpreted-cosine join) with zero bench visibility
    "embedding_neardup",
    "supplier_pagerank",
    "copurchase_kcore",
    # oracle-checkable sketch paths (KMV distinct, sampled quantiles)
    "distinct_kmv",
    "events_quantile_sample",
    # round-7 addition: seeded random-walk-with-restart ranking
    "supplier_ppr",
    # round-8 additions: per-user sequence scoring under the corpus
    # transition matrix; quality-aware dedup keeper selection (sims stay
    # out of HEADLINE deliberately — they are correctness instruments
    # whose wall is temp-file staging)
    "events_markov_surprisal",
    # round-9 additions: the DISTRIBUTED pagerank/PPR tier forced onto
    # the driver graph (fused_max_edges=0) — standing per-round evidence
    # and wall tracking for the loop that actually runs at 100 TB
    # (VERDICT_r8 order #4)
    "supplier_pagerank_dist",
    "supplier_ppr_dist",
    # round-9 new operators: CUSUM drift detection, MinHash estimator
    # QA, held-out stupid-backoff LM scoring
    "events_cusum_drift",
    "doc_backoff_surprisal",
    "embedding_drift_aa",
    "events_seasonal_ratio",
    # round-10 new operators: CCNet-style perplexity bucketing (rides
    # the backoff LM) — the cluster family itself now lives in the
    # r13 PINNED block at the end of this list
    "doc_perplexity_buckets",
    "phrase_search",
    "events_transition_dwell",
    "contamination_report",
    # pre-ANN embedding-table QC gate (three single-scan aggregates)
    "embedding_qc",
    # Gopher rule filter + tokenizer fertility (single-scan text QC)
    "quality_gopher_rules",
    "tokenizer_fertility",
    # packing-cost report (shares seq_packing's one shard shuffle) and
    # document-level PMI over the capped top-V vocabulary
    "packing_efficiency",
    "term_pmi",
    # temperature-scaled language sampling (narrow filter, no shuffle)
    "sample_temperature",
    # SQ8 scalar-quantized ANN (the 1-byte/dim memory tier) + its row
    # in the ANN recall QA matrix
    "knn_sq8",
    "knn_sq_recall_eval",
    # Heaps-law vocabulary growth over md5-decile prefixes
    "vocab_growth",
    # activity-concentration deciles + cross-source vocab overlap
    "events_pareto_share",
    "source_overlap_jaccard",
    # IVF × SQ8 composed (the genuine 100 TB ANN tier: cells prune,
    # codes compress) + its row in the ANN recall QA matrix
    "knn_ivf_sq8",
    "knn_ivfsq_recall_eval",
    # Gopher repetition section (in-row, zero-shuffle), lang-ID QA
    # confusion matrix, per-user Fano burstiness
    "doc_repetition_stats",
    "langid_confusion",
    "events_burstiness",
    # skew-bounded per-source frequency cap (histogram-threshold top-k)
    "source_cap_sample",
    # round-11 second wave: DSIR importance weights (hashed-bigram
    # likelihood ratio), single-pass fixed-point Gram/covariance,
    # distributed BPE pair counting, per-user type entropy, label-aware
    # hard-negative mining (partition-local top-k)
    "dsir_importance",
    "embedding_covariance",
    "bpe_pair_stats",
    "events_type_entropy",
    "hard_negative_mining",
    # round-11 third wave: token-budget mixture planning (O(sources)),
    # variance-ranked dimension pruning, partitioned-write integrity
    # manifest round trip
    "data_mix_plan",
    "embedding_dim_prune",
    "write_manifest_sim",
    # round-11 fourth wave: Adamic-Adar link prediction over the
    # co-purchase graph, log2-binned join-key skew diagnosis
    "copurchase_adamic_adar",
    "join_skew_report",
    # IVF recall-vs-probes tuning curve (one k-means train, four probe
    # points, exact baseline computed once — contains a knn_bruteforce
    # plus four probe-sliced rescans by design)
    "knn_probe_curve",
    # charset-class QC profile (one narrow scan, regexp-length counts)
    "doc_charset_stats",
    # LSH band-shape tuning curve (three band joins over one signature
    # build — the MinHash twin of knn_probe_curve)
    # deterministic A/B experiment readout (one user-keyed agg)
    "events_ab_lift",
    # per-doc marginal trigram novelty (tfidf-shaped shuffles)
    "doc_ngram_novelty",
    # round-12 wave: the IVF-PQ tier + its recall row, distributed PCA
    # (fit from the exact Gram + the all-integer projection), iterated
    # BPE training + the encode/compression report, the learned quality
    # classifier (exact-integer normal equations + GD) + its scoring
    # row, the full range-partitioned training permutation, and the CMS
    # heavy-hitter QA pair (one sketch build feeds the width sweep)
    "knn_ivf_pq",
    "knn_pq_recall_eval",
    "embedding_pca",
    "embedding_pca_project",
    "bpe_merge_sequence",
    "bpe_encode_stats",
    "quality_classifier_fit",
    "quality_classifier_score",
    "shuffle_order_full",
    "events_cms_error",
    "events_cms_width_curve",
    # round-13 (VERDICT_r12 order #4a): the PINNED cluster-family block.
    # r12's apparent dedup_clusters regression was exactly mirrored by a
    # dedup_clusters_star improvement — run-order/host effects aliasing
    # between rows that share a cost shape (the same LSH pair-graph
    # build, each timed from scratch). Keeping the three builds and the
    # memo consumers ADJACENT in one fixed order makes every row's run
    # context identical round-over-round, so a delta on one row is that
    # row's delta. Builders first (their timed runs bypass the memo and
    # track the full from-scratch build), the star alternative beside
    # its twin, then the marginal-cost memo consumers.
    "dedup_clusters",
    "dedup_clusters_star",
    "jaccard_clusters",
    "dedup_keep_best",
    "dedup_cluster_stats",
    "doc_dup_ratio_by_source",
    "dedup_token_savings",
    "split_leakage_safe",
    # the MinHash-QA pair shares the same aliasing shape (both pay a
    # signature build) — pinned adjacent for the same reason
    "minhash_est_error",
    "minhash_band_curve",
    # round-13 (VERDICT_r12 order #4b): non-trivial rows that were never
    # benched — exact n-gram similarity joins, the first two ANN recall
    # rows, and the full-corpus bigram LM
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "knn_recall_eval",
    "knn_ivf_recall_eval",
    "doc_bigram_surprisal",
    # round-13 new operators: maximal duplicate-run report + the
    # >=50-token-policy apply step, PCA-rotated PQ + its (sixth) ANN
    # recall row, and the versioned snapshot/time-travel round trip
    "dup_run_stats",
    "dedup_runs_apply",
    "knn_ivf_opq",
    "knn_opq_recall_eval",
    "snapshot_read_sim",
    # the logistic classifier (16 distributed GD passes — the honest
    # cost of the fastText objective; its wall is the row to watch) and
    # its exp-free integer scoring/confusion row
    "quality_classifier_logit",
    "quality_classifier_logit_score",
    # the strip-threshold tuning curve (one runs build, four policies)
    "dup_run_threshold_curve",
    # round-14 new operators: cross-document line-level boilerplate
    # dedup (RefinedWeb/CCNet tier) stats + apply, and the C4 rule
    # filter (one staged scan, Gopher-rules shape)
    "line_dedup_stats",
    "line_dedup_hist",
    "line_dedup_apply",
    "quality_c4_rules",
    # round-14 (VERDICT_r13 #7): bench coverage extended to the FULL
    # registry minus the pinned EXCLUDED sims below — 'the untracked 62
    # are mostly sub-second' was an assumption; now every non-sim row
    # is measured so no future hotspot hides untracked. Grouped by
    # family, mostly sub-second rows.
    # -- TPC-H remainder
    "q4_order_priority",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_parts",
    "q12_ship_lateness",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_types",
    "q17_small_qty_revenue",
    "q19_discounted_revenue",
    "q20_promotion_suppliers",
    "q22_inactive_customers",
    # -- relational/analytics remainder
    "rollup_sales",
    "pivot_status",
    "distinct_agg",
    "distinct_approx",
    "customers_without_orders",
    "order_gap_days",
    "order_value_quartiles",
    "customer_rfm",
    "segment_set_ops",
    "sql_revenue_by_nation",
    # -- events remainder
    "events_bot_score",
    "events_ewma_hourly",
    "events_rate_anomaly",
    "events_session_conversion",
    "events_props_agg",
    "events_heavy_hitters",
    "events_zscore_outliers",
    "events_histogram",
    "events_quantile_sketch",
    # -- MapReduce-parity remainder
    "mj_range_topkeys",
    "condorcet_winner",
    "grep_filter",
    # -- documents/datapipe remainder
    "doc_quality",
    "doc_fingerprint",
    "doc_rolling_fingerprint",
    "doc_chunking",
    "clean_corpus",
    "corpus_stats",
    "shuffle_order",
    "reshard_by_hash",
    "sample_stratified",
    "multimodal_transform",
]

#: PINNED exclusion list (VERDICT_r13 #7): registry rows deliberately
#: NOT benched, with the reason on record. All are correctness
#: instruments whose wall is dominated by harness staging (temp-dir
#: writes, streaming micro-batch spin-up, saveAsTable round trips),
#: not engine time — timing them would measure the test fixture.
EXCLUDED = {
    "stream_tumbling_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_sessions_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_state_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_ttl_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_markov_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_attribution_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_attribution_outer_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_dedup_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_rollup_sim": "streaming harness: micro-batch spin-up + temp sink",
    "stream_cms_sim": "streaming harness: two-batch temp staging",
    "ingest_pipeline_sim": "incremental-ingest harness: durable-state temp dirs",
    "ingest_spans_sim": "incremental-ingest harness: durable-state temp dirs",
    "scale_skew_sim": "instrument: plants skew to exercise AQE, wall is the plant",
    "write_partition_overwrite_sim": "writer round trip: wall is temp-dir parquet IO",
    "schema_evolution_sim": "writer round trip: wall is temp-dir parquet IO",
    "write_layout_sim": "writer round trip: wall is temp-dir parquet IO",
    "sdfs_sim": "catalog-ops simulation: wall is saveAsTable staging",
    "cli_sim": "CLI introspection simulation: driver-side, no engine work",
}

#: the memoized-cluster builders and their consumers (see graph.py r10
#: memo block) — used only for the disclosure field in the JSON record
CLUSTER_FAMILY = [
    "dedup_clusters",
    "dedup_keep_best",
    "dedup_cluster_stats",
    "doc_dup_ratio_by_source",
    "dedup_token_savings",
    "jaccard_clusters",
    "split_leakage_safe",
]

#: r14 fit/baseline memo families (operators/_memo.py): builders first,
#: then the rows that consume the shared artifact under the memo —
#: disclosure field in the JSON record, mirroring CLUSTER_FAMILY
FIT_FAMILY = [
    "knn_bruteforce",
    "knn_recall_eval",
    "knn_ivf_recall_eval",
    "knn_sq_recall_eval",
    "knn_ivfsq_recall_eval",
    "knn_pq_recall_eval",
    "knn_opq_recall_eval",
    "knn_probe_curve",
    "quality_classifier_fit",
    "quality_classifier_score",
    "quality_classifier_logit",
    "quality_classifier_logit_score",
    # r14 optimization round: the two Lloyd k-means fits are shared
    # artifacts too — builders knn_ivf_trained (k=IVF_CELLS fit; probe
    # curve + ivf recall eval consume) and kmeans_embeddings
    # (k=KMEANS_K fit; semantic_dedup consumes)
    "knn_ivf_trained",
    "kmeans_embeddings",
    "semantic_dedup",
]

#: r14 (optimization round): the four supplier ranking rows share one
#: memoized (src, dst, out_deg) links frame — supplier_pagerank is the
#: builder (its timed runs bypass the memo and track the full edge
#: build), the other three measure their ranking loops over the shared
#: edge table (the _dist rows' distributed loops still run per row —
#: only the edge build is shared). Disclosure field, mirroring
#: CLUSTER_FAMILY / FIT_FAMILY.
GRAPH_FAMILY = [
    "supplier_pagerank",
    "supplier_pagerank_dist",
    "supplier_ppr",
    "supplier_ppr_dist",
    # the copurchase rows share the raw pair-count frame
    # (_copurchase_pairs; builder: copurchase_triangles).
    # copurchase_lift is NOT in the family — its counts are over the
    # distinct (order, part) basket, a different multiset.
    "copurchase_triangles",
    "copurchase_kcore",
    "copurchase_adamic_adar",
]


#: refuse to start timed runs while 1-min loadavg exceeds ncpu/QUIET_DIV —
#: r6's "1.13× regression" and r7's two gate-missing records were all
#: ambient load misread as plan changes. The guard WAITS (load decays)
#: rather than refusing, so an unattended driver round still gets a
#: record; if the machine never quiets, the run proceeds flagged
#: ("loadavg_hot": true) so the number is never trusted silently.
QUIET_DIV = 4
QUIET_MAX_WAIT_S = 300

# ---------------------------------------------------------------- calib
# Host-speed calibration (VERDICT_r8 order #2): the loadavg gate catches
# local contention, but PLANS.md:373-401 documents ±10% run bands with
# +60% per-query excursions at IDLE loadavg — hypervisor/steal pressure
# no /proc/loadavg reading can see. So time a fixed CPU-bound kernel at
# three points (start / mid / end of the query loop) and report the
# MEDIAN's ratio against a reference committed from quiet runs.
# calib_ratio ≈ 1.0 → the record is comparable to history; ratio 1.2 →
# every wall number carries ~20% host tax, and the *_norm totals divide
# it back out for round-over-round comparison.
#
# The ratio uses the NUMPY kernel only: a single-core, BLAS-free
# elementwise loop whose speed is independent of process state. A JVM
# codegen kernel is also timed and DISCLOSED, but excluded from the
# ratio — measured r9: the same kernel reads 0.21 s right after session
# start and 0.097 s at end-of-run in one quiet session, because by then
# the JVM is hot from 80 queries (JIT tiers, grown memory pools), so
# its quiet-session reference is not comparable to its in-run readings.

#: numpy kernel reference: the MEDIAN of seven min-of-3 quiet-window
#: runs on this host (r9; observed span 0.095-0.15 — the host band the
#: ratio exists to expose). If the image or host changes, re-run
#: `python bench.py --calibrate` several times and commit a new median.
CALIB_REF_NUMPY_SEC = 0.103
CALIB_REF_JVM_SEC = 0.139  # diagnostic only (see above)


def _calib_numpy() -> float:
    """Fixed single-core numpy kernel: 4M-double elementwise sqrt/mul/add
    ×10 — BLAS-free so no thread-pool variance, long enough (~100 ms) to
    swamp timer noise."""
    import numpy as np

    a = np.arange(4_000_000, dtype=np.float64)
    np.sqrt(a * 1.0000001 + 1.0)  # untimed: page in the working set
    best = float("inf")
    for _ in range(3):
        b = a
        t0 = time.perf_counter()
        for _ in range(10):
            b = np.sqrt(b * 1.0000001 + 1.0)
        float(b[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _calib_jvm(spark) -> float:
    """Fixed JVM kernel: 50M-row whole-stage-codegen sum over 32
    partitions — measures the parallel-compute capacity bench queries
    actually contend for (hypervisor steal shows up here first). One
    untimed invocation first: the reference constants were measured
    post-warmup, and without it the start-of-run probe reads C2-JIT
    compile time as host slowness (run 1, r9: jvm_start 0.241 vs
    jvm_end 0.141 in the same quiet session)."""
    spark.range(0, 50_000_000, 1, 32).selectExpr("sum(id * 2 + 1) AS s").collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "sum(id * 2 + 1) AS s"
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def _wait_for_quiet() -> tuple[float, float]:
    """Block until 1-min loadavg ≤ ncpu/QUIET_DIV or the wait budget is
    spent. Returns (loadavg at start of timed work, seconds waited)."""
    thr = (os.cpu_count() or 8) / QUIET_DIV
    waited = 0.0
    load = os.getloadavg()[0]
    while load > thr and waited < QUIET_MAX_WAIT_S:
        print(
            f"# loadavg {load:.2f} > {thr:.1f}: waiting for quiet machine",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
        load = os.getloadavg()[0]
    return load, waited


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # gate BEFORE the session spins up — Spark's own executor threads
    # inflate loadavg, so only the pre-session reading reflects ambient
    # pressure from other processes
    load_start, quiet_wait = _wait_for_quiet()
    # Session cluster memo (graph.py r10): ON by default for bench —
    # the family consumers then measure the marginal cost of each
    # report over one shared CC frame, the shape a real pipeline runs.
    # Disclosed as "cluster_memo" in the record; disable with
    # GRAPEFRUIT_CLUSTER_MEMO=0 to bench every query from scratch (the
    # driver's correctness gate never sets the var, so its checks stay
    # independent from-scratch proofs either way).
    memo_on = os.environ.get("GRAPEFRUIT_CLUSTER_MEMO", "1") == "1"
    if memo_on:
        os.environ["GRAPEFRUIT_CLUSTER_MEMO"] = "1"
    else:
        os.environ.pop("GRAPEFRUIT_CLUSTER_MEMO", None)
    # r14 (VERDICT_r13 #3): the memo now also covers the exact ANN
    # baseline (knn_bruteforce feeds the six recall rows + probe curve)
    # and the two classifier weight tables (their score rows re-derive
    # the fit). BUILDER rows keep timing the full from-scratch build
    # (their timed runs bypass the memo, exactly like the CC builders);
    # consumer rows then measure marginal cost over the shared artifact
    # — the one-artifact-many-consumers shape a production pipeline runs.
    # Builder row → the memo KINDS whose from-scratch build that row's
    # timed runs must pay (GRAPEFRUIT_MEMO_SKIP, per-kind — r14 opt
    # round; see operators/_memo.py:_skip_kinds). A builder still READS
    # memo kinds it merely consumes (charged to THEIR builder rows), so
    # each shared artifact's construction is timed by exactly one row.
    memo_builders = (
        {
            "dedup_clusters": "minhash_cc",
            "jaccard_clusters": "jaccard_cc",
            "knn_bruteforce": "knn_exact",
            "quality_classifier_fit": "qc_ridge_fit",
            "quality_classifier_logit": "qc_logit_fit",
            "supplier_pagerank": "supplier_links",
            "copurchase_triangles": "copurchase_pairs",
            # r14 optimization round: the two k-means fits (see
            # FIT_FAMILY note) — these rows keep timing the full
            # from-scratch Lloyd training
            "knn_ivf_trained": "ivf_kmeans_fit",
            "kmeans_embeddings": "kmeans_k8_fit",
            # r14 opt: the BPE merge-table fit was memoized in the r14
            # build work with NO builder row (both bpe rows read it
            # after their warmup populated it — nobody timed the fit);
            # bpe_merge_sequence now pays it
            "bpe_merge_sequence": "bpe_merges",
            # r14 opt: pair graphs, minhash signatures, duplicate-run
            # tables, backoff score table, covariance rows and PQ/OPQ
            # codebooks are shared artifacts too — each with one
            # builder row
            "condorcet_pairs": "condorcet_pairs",
            "dedup_minhash": "minhash_grams,minhash_sigs,minhash_pairs",
            "ngram_jaccard_pairs": "ngram_pairs,gram_index",
            "dup_span_docs": "dup_fps",
            "dup_run_stats": "dup_runs",
            "doc_backoff_surprisal": "backoff_scores",
            # emb_cov (the collected Gram rows) has no skip entry: the
            # embedding_covariance row's own plan IS the scan, so it
            # times the artifact's build without ever reading the memo
            "knn_sq8": "sq8_stats",
            "knn_ivf_pq": "pq_fit_raw",
            "knn_ivf_opq": "pq_fit_opq",
        }
        if memo_on
        else {}
    )
    spark = get_spark("grapefruit-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # untimed warmup: JVM/codegen/Arrow spin-up + parquet footer reads,
    # so the first timed query isn't charged for session initialization
    from grapefruit_spark.catalog import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    calib_numpy = [_calib_numpy()]
    calib_jvm_start = _calib_jvm(spark)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for qi, name in enumerate(HEADLINE):
        if qi == len(HEADLINE) // 2:
            calib_numpy.append(_calib_numpy())  # mid-run host sample
        # Per-query isolation: one broken query must never zero the whole
        # round's bench signal (round-3 postmortem — a single
        # AnalysisException produced rc:1 and no timings at all).
        try:
            fn = queries[name]
            # run 1 (untimed) pays one-time costs: janino codegen compile,
            # file-footer listing, sink init; run 2 is engine steady state.
            # For the two memo BUILDERS this run also populates the shared
            # cluster memo for later family consumers — their own timed
            # runs below then bypass the memo so the builder rows keep
            # tracking the full from-scratch CC build round-over-round.
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            if name in memo_builders:
                os.environ["GRAPEFRUIT_MEMO_SKIP"] = memo_builders[name]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            # min-of-3 (r6 postmortem): min-of-2 left a ~10-30% ambient
            # drift band across the whole suite; with three timed runs a
            # GC pause / noisy neighbor has to land on all three to fake
            # a plan regression round-over-round
            timings[name] = round(best, 3)
            print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
        finally:
            if name in memo_builders:
                os.environ.pop("GRAPEFRUIT_MEMO_SKIP", None)
            # drop persisted frames (dedup signature caches etc.) so queries
            # don't evict each other's storage memory as the session grows —
            # each query is measured cold-cache / warm-codegen
            spark.catalog.clearCache()
            # also release localCheckpoint blocks (reliability.pin) —
            # clearCache only covers the DF cache, and pinned RDDs from
            # the dedup/graph operators would otherwise accumulate across
            # the 60-query session. The memoized cluster frames are the
            # one exception: their lineage is truncated, so dropping
            # their blocks would KILL later family consumers, not slow
            # them — spare exactly those ids.
            keep: set[int] = set()
            if memo_on:
                from grapefruit_spark.operators.graph import cluster_memo_rdd_ids

                keep = cluster_memo_rdd_ids(spark)
            jsc = spark.sparkContext._jsc
            for rid in list(jsc.getPersistentRDDs().keySet().toArray()):
                if rid not in keep:
                    jsc.sc().unpersistRDD(rid, False)

    calib_numpy.append(_calib_numpy())
    calib_jvm_end = _calib_jvm(spark)
    # ratio = median of the three numpy samples vs the quiet reference;
    # the samples are kept separately so a transient spike is visible as
    # one outlying sample rather than laundered into a mean
    calib_ratio = round(sorted(calib_numpy)[1] / CALIB_REF_NUMPY_SEC, 4)
    # Bench-trust protocol (VERDICT_r10 order #6): the ±10% hypervisor
    # band dominates round-over-round deltas on identical code (r10:
    # runs 6-8 spread 0.90×-0.99×). A record is COMMIT-GRADE only when
    # the calibration probe sat inside ±5% of the quiet reference —
    # otherwise rerun until one lands in band (disclosing every run in
    # PLANS.md) rather than normalizing a hot/fast-window record after
    # the fact. The driver's own record keeps whatever run it saw; the
    # flag makes an out-of-band record self-describing instead of
    # silently comparable.
    CALIB_BAND = (0.95, 1.05)
    calib_in_band = CALIB_BAND[0] <= calib_ratio <= CALIB_BAND[1]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "grapefruit_spark_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # ambient-load indicators: loadavg_start is the 1-min loadavg
        # when timed work began (after the quiet-wait gate, before the
        # Spark session — the number that decides whether the record is
        # trustworthy); "loadavg" is the end-of-run 1/5/15-min triple,
        # inflated by bench's own executor threads (r6 order #1 / r7
        # order #1 postmortems)
        "loadavg_start": round(load_start, 2),
        "loadavg_hot": load_start > (os.cpu_count() or 8) / QUIET_DIV,
        "quiet_wait_sec": quiet_wait,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "ncpu": os.cpu_count(),
        # host-speed calibration (see the calib block above): ratio 1.0
        # = this host ran the fixed kernels exactly at the committed
        # reference speed; *_norm totals below divide the ratio out
        "calib_sec": {
            "numpy": [round(x, 4) for x in calib_numpy],  # start/mid/end
            "numpy_ref": CALIB_REF_NUMPY_SEC,
            # JVM kernel disclosed as a diagnostic, excluded from the
            # ratio (hot-JVM bias; see the calib block comment)
            "jvm_start": round(calib_jvm_start, 4),
            "jvm_end": round(calib_jvm_end, 4),
        },
        "calib_ratio": calib_ratio,
        # commit-grade gate: loadavg quiet AND calib within ±5% of the
        # reference — out-of-band records are disclosed, never committed
        # as bench_full.json's round record (protocol above)
        "calib_in_band": calib_in_band,
        "value_norm": round(total / calib_ratio, 3),
        # r10: the dedup family (CLUSTER_FAMILY) shares one memoized CC
        # frame per builder when true — consumer rows are the marginal
        # report cost; the two builder rows still time the from-scratch
        # build (their timed runs bypass the memo)
        "cluster_memo": memo_on,
        "cluster_family_total": round(
            sum(timings[n] for n in CLUSTER_FAMILY if n in timings), 3
        ),
        # r14: the fit/baseline memo families (consumer rows are
        # marginal-cost when true — like the cluster consumers, their
        # round-over-round deltas vs pre-r14 records include the memo
        # win; builder rows still track the from-scratch build)
        "fit_memo": memo_on,
        "fit_family_total": round(
            sum(timings[n] for n in FIT_FAMILY if n in timings), 3
        ),
        # r14 opt round: the supplier ranking rows share one memoized
        # links frame (builder: supplier_pagerank; see GRAPH_FAMILY)
        "graph_family_total": round(
            sum(timings[n] for n in GRAPH_FAMILY if n in timings), 3
        ),
        # r14: registry rows deliberately unbenched, with reasons (the
        # pinned EXCLUDED list) — coverage = registry minus exactly these
        "excluded_n": len(EXCLUDED),
        "excluded": sorted(EXCLUDED),
    }
    prev = _common_prev_summary(timings, sf, memo_on)
    if prev:
        out.update(prev)
        for k in ("common_now_total", "selfnow_total"):
            if k in out:
                out[k + "_norm"] = round(out[k] / calib_ratio, 3)
    # PRIMARY round gate (r11 protocol amendment, made explicit in r12):
    # the calib-NORMALIZED total over the query set shared with the r5
    # anchor, divided by the anchor's total, must stay ≤ 1.05. Raw is
    # disclosed beside it but is NOT the gate — an out-of-band host
    # window (calib 1.27-1.45 for the whole r11 session) makes raw
    # drift read as engine drift. The anchor is pinned to BENCH_r05.json
    # (the oldest stable-registry record) so the gate doesn't ratchet.
    anchor = _anchor_summary(timings, sf, memo_on, calib_ratio)
    if anchor:
        out.update(anchor)
    if errors:
        out["errors"] = errors
    # the driver records only the LAST 2000 chars of stdout; once the
    # suite outgrew that (round 6), its per-query record silently became
    # "parsed": null. Persist the full result beside the repo too, so
    # the history survives any stdout truncation (the driver commits
    # uncommitted files at round end).
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_full.json"), "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout line remains the record
    print(json.dumps(out))


#: CLUSTER_FAMILY rows whose timed cost depends on the memo mode — the
#: two builders (dedup_clusters, jaccard_clusters) always time the
#: from-scratch build (their timed runs bypass the memo), so only the
#: consumer rows become marginal-cost under memo_on
_CLUSTER_CONSUMERS = frozenset(CLUSTER_FAMILY) - {
    "dedup_clusters",
    "jaccard_clusters",
}


def _common_prev_summary(
    timings: dict[str, float], sf: float, memo_on: bool = True
) -> dict:
    """Headline totals stop being comparable as the suite grows, so also
    report the total over the query set SHARED with the latest recorded
    round (BENCH_r*.json beside the repo) — the like-for-like number.
    When the newest driver records are truncated ("parsed": null once
    the JSON line outgrew the driver's 2000-char tail), fall back to the
    repo's own bench_full.json from the previous run. Records taken at a
    DIFFERENT scale factor are skipped — comparing timings across SFs
    reads as a spurious huge regression/improvement. Likewise (ADVICE
    r10) CLUSTER_FAMILY consumer rows are excluded from the shared set
    when the two runs' cluster-memo modes differ — a consumer measured
    from-scratch in the old record vs marginal-cost now would read a
    memo win as an engine win; the exclusion count is disclosed."""
    import glob

    root = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    out: dict = {}

    def _shared(rec: dict) -> tuple[list[str], int]:
        names = set(rec["queries"]) & set(timings)
        if bool(rec.get("cluster_memo")) != memo_on:
            dropped = len(names & _CLUSTER_CONSUMERS)
            names -= _CLUSTER_CONSUMERS
        else:
            dropped = 0
        return sorted(names), dropped

    # round-over-round: the newest PARSEABLE driver record at this sf
    # (records can truncate once the JSON line outgrows the driver's
    # 2000-char tail)
    for path in reversed(paths):
        rec = _bench_record(path)
        if not rec or rec.get("sf") != sf:
            continue
        pq = rec["queries"]
        shared, dropped = _shared(rec)
        if not shared:
            continue
        out.update(
            {
                "common_prev_round": os.path.basename(path),
                "common_prev_n": len(shared),
                "common_prev_total": round(sum(pq[n] for n in shared), 3),
                "common_now_total": round(sum(timings[n] for n in shared), 3),
            }
        )
        if dropped:
            out["common_prev_memo_excluded"] = dropped
        break
    # run-over-run: the repo's own full record of the previous bench
    # invocation (survives driver-side truncation)
    rec = _bench_record(os.path.join(root, "bench_full.json"))
    if rec and rec.get("sf") == sf:
        pq = rec["queries"]
        shared, dropped = _shared(rec)
        if shared:
            out.update(
                {
                    "selfprev_n": len(shared),
                    "selfprev_total": round(sum(pq[n] for n in shared), 3),
                    "selfnow_total": round(sum(timings[n] for n in shared), 3),
                }
            )
            if dropped:
                out["selfprev_memo_excluded"] = dropped
    return out


#: the pinned anchor record for the primary (normalized) round gate
ANCHOR_RECORD = "BENCH_r05.json"
#: gate threshold: normalized shared-set total / anchor total ≤ this
ANCHOR_GATE_MAX = 1.05


def _anchor_summary(
    timings: dict[str, float], sf: float, memo_on: bool, calib_ratio: float
) -> dict:
    """The primary round-over-round gate (r12 protocol): compare the
    CALIBRATION-NORMALIZED total over the query set shared with the
    pinned r5 anchor against the anchor's own total. Raw ratio is
    disclosed beside it. Memo-mode consumer exclusion mirrors
    _common_prev_summary so the shared set is like-for-like."""
    root = os.path.dirname(os.path.abspath(__file__))
    rec = _bench_record(os.path.join(root, ANCHOR_RECORD))
    if not rec or rec.get("sf") != sf:
        return {}
    names = set(rec["queries"]) & set(timings)
    if bool(rec.get("cluster_memo")) != memo_on:
        names -= _CLUSTER_CONSUMERS
    names = sorted(names)
    if not names:
        return {}
    anchor_total = round(sum(rec["queries"][n] for n in names), 3)
    now_total = round(sum(timings[n] for n in names), 3)
    now_norm = round(now_total / calib_ratio, 3)
    return {
        "anchor_record": ANCHOR_RECORD,
        "anchor_n": len(names),
        "anchor_total": anchor_total,
        "anchor_now_total": now_total,
        "anchor_now_total_norm": now_norm,
        "anchor_ratio_raw": round(now_total / anchor_total, 4),
        "anchor_ratio_norm": round(now_norm / anchor_total, 4),
        "anchor_gate_max": ANCHOR_GATE_MAX,
        "anchor_gate_pass": (now_norm / anchor_total) <= ANCHOR_GATE_MAX,
    }


def _bench_record(path: str) -> dict | None:
    """Parse a bench record — either the driver wrapper
    ({"parsed": {...}} / {"tail": "..."}) or a raw bench JSON object —
    into the inner dict carrying "queries" and "sf"."""
    try:
        with open(path) as f:
            d = json.load(f)
        if isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        d["queries"]  # must exist
        return d
    except Exception:  # noqa: BLE001 — truncated/crashed record
        return None


def calibrate() -> None:
    """Measure the reference kernels min-of-5 on a quiet host and print
    the constants to commit (run via `python bench.py --calibrate`)."""
    from grapefruit_spark.session import get_spark

    load, waited = _wait_for_quiet()
    spark = get_spark("grapefruit-calib")
    spark.sparkContext.setLogLevel("ERROR")
    _calib_jvm(spark)  # untimed warmup: codegen compile for the kernel
    np_best = min(_calib_numpy() for _ in range(5))
    jvm_best = min(_calib_jvm(spark) for _ in range(5))
    print(
        json.dumps(
            {
                "CALIB_REF_NUMPY_SEC": round(np_best, 4),
                "CALIB_REF_JVM_SEC": round(jvm_best, 4),
                "loadavg_start": round(load, 2),
            }
        )
    )


if __name__ == "__main__":
    if "--calibrate" in sys.argv:
        calibrate()
    else:
        main()
