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
    assert all(r["inertia"] >= 0 for r in out)


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
