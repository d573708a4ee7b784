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


QUERIES = {"dedup_clusters": dedup_clusters}
