from __future__ import annotations

import pyspark.sql.functions as F

from grapefruit_spark.catalog import table
from grapefruit_spark.operators import ml

from .conftest import SF_DIR


def test_kmeans_inertia_monotone_nonincreasing(spark):
    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    _, history = ml.kmeans_fit(spark, emb, k=ml.KMEANS_K, iters=4)
    assert len(history) == 4
    for prev, cur in zip(history, history[1:]):
        assert cur <= prev + 1e-6


def test_kmeans_partition_covers_corpus(spark):
    emb = table(spark, SF_DIR, "embeddings")
    n = emb.count()
    out = ml.kmeans_embeddings(spark, SF_DIR).collect()
    assert len(out) <= ml.KMEANS_K
    assert sum(r["n_vecs"] for r in out) == n
    assert all(r["inertia_e2"] >= 0 for r in out)


def test_kmeans_deterministic_across_runs(spark):
    import numpy as np

    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    c1, h1 = ml.kmeans_fit(spark, emb, iters=2)
    c2, h2 = ml.kmeans_fit(spark, emb, iters=2)
    # same layout → bit-identical (partials folded in sorted order)
    assert h1 == h2 and (c1 == c2).all()
    # different layout → equal up to float associativity of partial sums
    c3, h3 = ml.kmeans_fit(spark, emb.repartition(7, F.col("vec_id")), iters=2)
    assert np.allclose(h1, h3, rtol=1e-9)
    assert np.allclose(c1, c3, rtol=1e-9)


def test_semantic_dedup_drops_planted_duplicate(spark, tmp_path):
    """A near-identical copy of an existing vector must be marked
    dup_of its original; distinct vectors stay kept."""
    import numpy as np

    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding", "label")
    base = emb.where(F.col("vec_id") == 5).first()
    copy = [float(x) + 1e-4 for x in base["embedding"]]
    extra = spark.createDataFrame([(90_001, copy, 0)], emb.schema)
    d = tmp_path / "semdup"
    emb.unionByName(extra).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    rows = {r["vec_id"]: r for r in ml.semantic_dedup(spark, str(d)).collect()}
    assert len(rows) == emb.count() + 1  # every vector classified exactly once
    planted = rows[90_001]
    assert not planted["is_kept"]
    assert planted["dup_of"] == 5
    assert rows[5]["is_kept"]  # the lower-id original is the keeper
    kept_frac = np.mean([r["is_kept"] for r in rows.values()])
    assert kept_frac > 0.5  # synthetic corpus is mostly non-duplicate


def test_semantic_dedup_chains_terminate_at_keeper(spark):
    """dup_of always points at a LOWER id in the SAME cell, and following
    the chain reaches a kept vector (no cycles, no cross-cell refs)."""
    rows = {r["vec_id"]: r for r in ml.semantic_dedup(spark, SF_DIR).collect()}
    for r in rows.values():
        if r["is_kept"]:
            continue
        assert r["dup_of"] < r["vec_id"]
        assert rows[r["dup_of"]]["cluster"] == r["cluster"]
        cur = r
        while not cur["is_kept"]:
            cur = rows[cur["dup_of"]]  # strictly decreasing ids → terminates
        assert cur["is_kept"]
