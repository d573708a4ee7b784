"""Alternating large-star/small-star connected components (graph.py
r10): same (node, component=min id) contract as the min-label loop,
O(log n) rounds instead of O(diameter) — the tier for high-diameter
graphs at 100 TB."""

from __future__ import annotations

from .conftest import SF_DIR


def _cc(df):
    return sorted((r["node"], r["component"]) for r in df.collect())


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_star_matches_minlabel_on_dedup_graph(spark):
    """Both distributed CC implementations agree on the real MinHash
    pair graph."""
    from grapefruit_spark.operators.dedup import dedup_minhash
    from grapefruit_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    pairs = dedup_minhash(spark, SF_DIR)
    a = _cc(connected_components(pairs, "doc_a", "doc_b"))
    b = _cc(connected_components_star(pairs, "doc_a", "doc_b"))
    assert a == b
    assert a, "driver data must produce a non-empty pair graph"


def test_star_structures(spark):
    from grapefruit_spark.operators.graph import connected_components_star

    # two components: a triangle {1,2,3} and a pair {10,11}; edge order
    # and direction deliberately scrambled
    e = _edges(spark, [(3, 2), (1, 3), (2, 1), (11, 10)])
    got = _cc(connected_components_star(e))
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]


def test_star_long_chain_exceeds_minlabel_cap(spark):
    """A 64-node chain has diameter 63 — past min-label's MAX_ITERS cap
    of 10 rounds — but the star algorithm's O(log n) convergence labels
    it exactly within its 20-round backstop. This is the case the
    second implementation exists for."""
    from grapefruit_spark.operators.graph import connected_components_star

    n = 64
    e = _edges(spark, [(i, i + 1) for i in range(1, n)])
    got = _cc(connected_components_star(e))
    assert got == [(i, 1) for i in range(1, n + 1)]


def test_star_min_in_middle(spark):
    """The component min reached only through small-star hops (the min
    sits between two larger neighbors)."""
    from grapefruit_spark.operators.graph import connected_components_star

    e = _edges(spark, [(3, 1), (3, 2), (5, 4), (2, 5)])
    got = _cc(connected_components_star(e))
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)]


# -------------------------------------------------------- property check
def _uf_components(edges):
    """Python union-find reference: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_star_random_graphs_match_union_find(spark):
    """Randomized structural check: the alternating-star output equals a
    python union-find on dozens of random edge sets (dense blobs, sparse
    chains, multi-component mixes). Deterministic seed; one Spark run
    per case is slow, so the cases are batched into one frame keyed by
    a graph id offset — each graph's ids live in a disjoint range, so a
    single CC call checks all of them at once."""
    import random

    from grapefruit_spark.operators.graph import connected_components_star

    rng = random.Random(0xC0FFEE)
    all_edges = []
    expected = {}
    for g in range(25):
        base = g * 10_000
        n = rng.randint(2, 40)
        m = rng.randint(1, 80)
        edges = []
        for _ in range(m):
            a, b = rng.randint(1, n), rng.randint(1, n)
            if a != b:
                edges.append((base + a, base + b))
        if not edges:
            edges = [(base + 1, base + 2)]
        all_edges.extend(edges)
        expected.update(_uf_components(edges))
    df = _edges(spark, all_edges)
    got = dict(_cc(connected_components_star(df)))
    assert got == expected
