"""Iterative graph operators (SURVEY §2 D12): connected components over
the near-duplicate pair graph → dedup clusters.

The loop is driver-coordinated but all data movement is joins — no
collect of edges or labels. localCheckpoint() truncates lineage each
round so plan size stays O(1) across iterations (the classic Spark
iterative-algorithm pitfall). Dedup graphs have tiny diameters, so
convergence is a handful of rounds; the cap bounds the worst case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORACLE: dict[str, str] = {}

MAX_ITERS = 10


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Min-label propagation: returns (node, component) with component =
    min node id reachable. Non-SQL-expressible (iterative) → rows-only.
    """
    spark = edges.sparkSession
    # one job materializes the symmetrized edge set; the expensive edge
    # pipeline under both union branches is identical, so ReuseExchange
    # computes it once inside that job
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Size iteration parallelism to the edge set, not the corpus: after
    # LSH pruning the graph is orders of magnitude smaller than the input,
    # and per-iteration shuffle/task overhead at corpus-width partitioning
    # dominates. ~100k edges per partition keeps tasks ms-scale; the
    # explicit hash partitioning on the join key is reused by every
    # iteration's join (no per-round exchange of sym).
    n_edges = sym.count()
    parts = max(1, min(spark.sparkContext.defaultParallelism, n_edges // 100_000))
    sym = sym.repartition(parts, "b").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(parts, "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(MAX_ITERS):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        nxt = F.least(
            F.col("component"), F.coalesce("nbr_component", F.col("component"))
        )
        # carry the convergence flag in-row: the changed check is then a
        # cheap agg over the checkpointed result, not another join job
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                nxt.alias("component"),
                (nxt < F.col("component")).cast("int").alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.agg(F.sum("changed")).first()[0] or 0
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from MinHash-LSH pairs: every doc in a cluster
    maps to its keeper (min doc_id in the connected component). The final
    step of a 100 TB dedup pipeline — 'drop all but one per cluster'."""
    from .dedup import dedup_minhash

    pairs = dedup_minhash(spark, sf_dir)
    comps = connected_components(pairs, "doc_a", "doc_b")
    return comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("keep_doc_id")
    )


PR_DAMPING = 0.85
PR_ITERS = 10


def pagerank(edges: DataFrame, damping: float = PR_DAMPING, iters: int = PR_ITERS) -> DataFrame:
    """Power-iteration PageRank over a directed (src, dst) edge frame.

    The deepened WebGraph app (the reference's
    `app/WebGraph.java` + wg_maple/wg_juice stop at in-link counting;
    PageRank is the same shuffle shape iterated). Spark-first layout:
    the EDGE set — the big side — is hash-partitioned once on src and
    localCheckpoint-pinned; each iteration broadcasts the (small) rank
    vector into an edge-colocated join, so per-iteration cost is one
    scan of edges + one agg shuffle on dst, never an edge re-shuffle.
    Dangling mass (nodes without out-links) is folded back uniformly, so
    ranks sum to 1 every iteration (a one-row agg, broadcast back).
    """
    # pin the deduped edge set FIRST — nodes/degrees/links all derive
    # from it, and without this each eager checkpoint below would
    # recompute the (possibly expensive) upstream edge pipeline
    e = edges.select(F.col("src"), F.col("dst")).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    links = (
        e.join(out_deg, "src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    # dangling node SET is iteration-invariant — pin it once; only its
    # current mass (a scalar) is recomputed per round
    dangling_nodes = (
        nodes.join(out_deg, nodes.node == out_deg.src, "left_anti")
        .localCheckpoint(eager=True)
    )
    # rank vector: broadcast while it plausibly fits on executors; past
    # that, co-partition on the join key so only the SMALL side shuffles
    # each iteration (links stays pinned on src either way)
    bcast_ok = n <= 5_000_000

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        # dangling mass stays a lazy 1-row aggregate crossJoin'd in, so
        # each iteration is ONE job (the eager checkpoint) — a .first()
        # here would double the per-iteration job count
        dm = ranks.join(dangling_nodes.select("node"), "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        rside = F.broadcast(ranks) if bcast_ok else ranks.repartition("node")
        contribs = (
            links.join(rside, links.src == rside.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping / n) * F.col("dm")
            + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .join(F.broadcast(dm))
            .select("node", new_rank.alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks


def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier co-purchase graph: edge s1→s2 when s1's
    line precedes s2's in the same order. Per-order fan-out is bounded
    (≤7 lines), so edge construction is a bounded self-join on o_orderkey.
    Top-20 by rank (rows-only: iterative; pytest checks vs a pure-python
    reference and that ranks sum to 1)."""
    from ..catalog import table

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_linenumber")
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("src"),
        F.col("l_linenumber").alias("ln_a"),
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("dst"),
        F.col("l_linenumber").alias("ln_b"),
    )
    edges = (
        a.join(b, "k")
        .where((F.col("ln_a") < F.col("ln_b")) & (F.col("src") != F.col("dst")))
        .select("src", "dst")
    )
    ranks = pagerank(edges)
    return (
        ranks.select("node", F.round("rank", 6).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(20)
    )


QUERIES = {"dedup_clusters": dedup_clusters, "supplier_pagerank": supplier_pagerank}
