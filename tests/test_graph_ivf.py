from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grapefruit_spark.operators import similarity
from grapefruit_spark.operators.graph import connected_components, dedup_clusters

from .conftest import SF_DIR


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        ["src", "dst"],
    )
    comps = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_chain_beyond_one_hop(spark):
    """A 6-node path needs multiple propagation rounds."""
    edges = spark.createDataFrame([(i, i + 1) for i in range(5)], ["src", "dst"])
    comps = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comps.values()) == {0}


def test_dedup_clusters_on_real_pairs(spark):
    """Cluster keeper must be the component-min and consistent with pairs."""
    from grapefruit_spark.operators.dedup import dedup_minhash

    pairs = [(r["doc_a"], r["doc_b"]) for r in dedup_minhash(spark, SF_DIR).collect()]
    clusters = {r["doc_id"]: r["keep_doc_id"] for r in dedup_clusters(spark, SF_DIR).collect()}
    for a, b in pairs:
        assert clusters[a] == clusters[b]  # both ends share a component
        assert clusters[a] <= min(a, b)


def test_jaccard_clusters_matches_recursive_oracle(spark, duck):
    """The iterative min-label loop must equal DuckDB's exact recursive
    transitive closure over the same (SQL-expressible) pair graph."""
    from grapefruit_spark.operators.graph import ORACLE, jaccard_clusters

    from .util import assert_matches_oracle

    assert_matches_oracle(
        jaccard_clusters(spark, SF_DIR), duck, ORACLE["jaccard_clusters"]
    )


def test_ivf_recall_vs_bruteforce(spark):
    bf = {}
    for r in similarity.knn_bruteforce(spark, SF_DIR).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf = {}
    for r in similarity.knn_ivf(spark, SF_DIR).collect():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(bf[q] & ivf.get(q, set())) / len(bf[q]) for q in bf
    ]
    # coarse quantization over random data: probing 3/16 cells must beat
    # the 3/16 random-baseline comfortably on average
    assert sum(recalls) / len(recalls) > 0.3


def test_ivf_ranks_are_dense(spark):
    rows = similarity.knn_ivf(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def _py_pagerank(edges, d=0.85, iters=10):
    from collections import defaultdict

    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = defaultdict(set)
    for s, t in edges:
        out[s].add(t)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(r for v, r in ranks.items() if not out[v])
        contrib = defaultdict(float)
        for s, ts in out.items():
            for t in ts:
                contrib[t] += ranks[s] / len(ts)
        base = (1 - d) / n + d * dm / n
        ranks = {v: base + d * contrib[v] for v in nodes}
    return ranks


@pytest.mark.parametrize("fused_max", [2_000_000, 0])
def test_pagerank_matches_python_reference(spark, fused_max):
    """Both tiers — the fused numpy kernel (default for ≤2M edges) and
    the distributed loop (forced via fused_max_edges=0) — against the
    python reference, including the dangling-mass branch."""
    from grapefruit_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]  # 5 edges, 3 has a dangler feeding it
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=10, fused_max_edges=fused_max).collect()
    }
    want = _py_pagerank(edges, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def _py_ppr(edges, n_seeds=5, d=0.85, iters=10):
    nodes = sorted({v for e in edges for v in e})
    seeds = nodes[:n_seeds]
    p = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    out = {}
    for s, t in set(edges):
        out.setdefault(s, []).append(t)
    ranks = dict(p)
    for _ in range(iters):
        dm = sum(r for v, r in ranks.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, ts in out.items():
            for t in ts:
                contrib[t] += ranks[s] / len(ts)
        ranks = {
            v: (1 - d) * p[v] + d * dm * p[v] + d * contrib[v] for v in nodes
        }
    return ranks


@pytest.mark.parametrize("fused_max", [2_000_000, 0])
def test_personalized_pagerank_matches_python_reference(spark, fused_max):
    """Seeded restart + dangling mass folded onto the seeds; total mass
    conserved at 1. Both tiers (fused kernel / distributed loop)."""
    from grapefruit_spark.operators.graph import personalized_pagerank

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (3, 9)]  # 9 dangles
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            df, n_seeds=2, iters=10, fused_max_edges=fused_max
        ).collect()
    }
    want = _py_ppr(edges, n_seeds=2, iters=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # non-seed nodes with no inbound path from seeds get rank 0; seeds
    # always retain restart mass
    assert got[1] > 0 and got[2] > 0


def test_pagerank_copartition_fallback_matches_broadcast(spark):
    """The >PR_BCAST_MAX_NODES co-partition path (rank vector shuffled on
    the join key instead of broadcast) must produce the same ranks as the
    broadcast path — forced here by dropping the threshold to 0."""
    from grapefruit_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    bcast = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=8, fused_max_edges=0).collect()
    }
    copart = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, iters=8, bcast_max_nodes=0, fused_max_edges=0
        ).collect()
    }
    assert set(bcast) == set(copart)
    for v in bcast:
        assert abs(bcast[v] - copart[v]) < 1e-12, (v, bcast[v], copart[v])
    assert abs(sum(copart.values()) - 1.0) < 1e-9


@pytest.mark.parametrize("fused_max", [2_000_000, 0])
def test_pagerank_all_dangling_except_sources(spark, fused_max):
    from grapefruit_spark.operators.graph import pagerank

    # star: everything points at 0; 0 itself dangles
    edges = [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=10, fused_max_edges=fused_max).collect()
    }
    want = _py_pagerank(edges, iters=10)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert got[0] == max(got.values())


def test_supplier_pagerank_invariants(spark):
    from grapefruit_spark.operators.graph import supplier_pagerank

    rows = supplier_pagerank(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    ranks = [r["pagerank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)


def test_ivf_trained_recall(spark):
    """Trained-centroid IVF matches or beats the random-baseline bound
    and keeps the exact-rank output contract."""
    bf = {}
    for r in similarity.knn_bruteforce(spark, SF_DIR).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    tr = {}
    for r in similarity.knn_ivf_trained(spark, SF_DIR).collect():
        tr.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(bf[q] & tr.get(q, set())) / len(bf[q]) for q in bf]
    assert sum(recalls) / len(recalls) > 0.3


def test_copurchase_triangles_matches_oracle(spark, duck):
    from grapefruit_spark.operators import graph

    from .util import assert_matches_oracle

    sdf = graph.copurchase_triangles(spark, SF_DIR)
    assert_matches_oracle(sdf, duck, graph.ORACLE["copurchase_triangles"])


def test_copurchase_triangles_matches_bruteforce(spark):
    """Recount triangles with a plain python set over the same edge set."""
    from grapefruit_spark.operators import graph

    li = [
        (r["l_orderkey"], r["l_partkey"])
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    ]
    by_order: dict[int, set[int]] = {}
    for k, p in li:
        by_order.setdefault(k, set()).add(p)
    edges: set[tuple[int, int]] = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n_tri = sum(
        1 for u, v in edges for w in (adj[u] & adj[v]) if v < w
    )
    row = graph.copurchase_triangles(spark, SF_DIR).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(adj)
    assert row["n_triangles"] == n_tri
    assert 0 <= row["clustering_ppm"] <= 1_000_000


def test_reliable_checkpoint_path(spark, tmp_path):
    """With a reliable checkpoint dir configured, iterative ops route
    lineage truncation through fault-tolerant checkpoint() (files land in
    the dir — the durability the reference gets from SDFS re-replication)
    and still produce correct results."""
    import os

    from grapefruit_spark.operators.graph import connected_components

    sc = spark.sparkContext
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["src", "dst"]
        )
        comps = {
            r["node"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        walked = [
            os.path.join(r, f) for r, _, fs_ in os.walk(ckdir) for f in fs_
        ]
        assert walked, "reliable checkpoint dir should contain rdd blocks"
    finally:
        # restore local-mode default (scala setter checkpointDir_= → None)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )


def _py_kcore(edges, k):
    """Reference peel in plain python."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_small_graph(spark):
    """Triangle {1,2,3} with pendant 4 and a chain 5-6: 2-core keeps only
    the triangle."""
    from grapefruit_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)], ["src", "dst"]
    )
    got = {r["node"]: r["core_degree"] for r in kcore(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_copurchase_kcore_matches_python_reference(spark):
    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.graph import KCORE_K, copurchase_kcore
    from pyspark.sql import functions as SF

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(SF.col("l_orderkey").alias("k"), SF.col("l_partkey").alias("u"))
    b = li.select(SF.col("l_orderkey").alias("k"), SF.col("l_partkey").alias("v"))
    edges = [
        (r["u"], r["v"])
        for r in a.join(b, "k").where(SF.col("u") < SF.col("v")).select("u", "v").distinct().collect()
    ]
    want = _py_kcore(edges, KCORE_K)
    got = {r["node"]: r["core_degree"] for r in copurchase_kcore(spark, SF_DIR).collect()}
    assert got == want


def test_kcore_peels_everything_when_k_too_high(spark):
    """A sparse graph with k above every degree converges to empty."""
    from grapefruit_spark.operators.graph import kcore

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert kcore(edges, k=5).count() == 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_pagerank_mass_conserved_cross_sf(spark, sf_dir):
    """Output-invariant bound for the rows-only driver gate: the FULL
    rank vector sums to 1 (probability mass conserved through dangling
    redistribution) at every SF, and every rank is positive."""
    from pyspark.sql import functions as F

    from grapefruit_spark.operators.graph import pagerank, supplier_edges

    ranks = pagerank(supplier_edges(spark, sf_dir))
    row = ranks.agg(
        F.sum("rank").alias("s"),
        F.min("rank").alias("mn"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["n"] > 0
    assert abs(row["s"] - 1.0) < 1e-9, row["s"]
    assert row["mn"] > 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_kcore_min_degree_invariant_cross_sf(spark, sf_dir):
    """Output-invariant bound for the rows-only driver gate: within the
    returned core, every node's degree over the surviving induced
    subgraph is >= k — checked independently against the edge set, not
    the operator's own core_degree column."""
    from pyspark.sql import functions as F

    from grapefruit_spark.operators.graph import KCORE_K, copurchase_edges, kcore

    edges = copurchase_edges(spark, sf_dir)
    core = kcore(edges, KCORE_K).select("node")
    surv = (
        edges.join(core.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(core.withColumnRenamed("node", "dst"), "dst", "left_semi")
    )
    deg = (
        surv.select(F.col("src").alias("n"))
        .union(surv.select(F.col("dst").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # every core node appears in the induced degree table with d >= k
    n_core = core.count()
    if n_core == 0:
        return  # empty core is a legal fixed point at tiny SF
    ok = deg.where(F.col("d") >= KCORE_K).count()
    assert ok == deg.count() == n_core


def test_dedup_keep_best_invariants(spark):
    """Quality-aware keeper selection: exactly one keeper per cluster,
    the keeper holds its cluster's max quality, every doc appears once,
    and the policy genuinely differs from min-id keeping on this data
    (some keepers are not the cluster's smallest doc_id)."""
    from pyspark.sql.window import Window

    from grapefruit_spark.operators.graph import dedup_keep_best

    df = dedup_keep_best(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == len({r["doc_id"] for r in rows})  # one row per doc
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        keepers = [r for r in members if r["is_keeper"]]
        assert len(keepers) == 1, (cid, keepers)
        best = keepers[0]
        mx = max(m["quality_e6"] for m in members)
        assert best["quality_e6"] == mx
        # deterministic tie-break: min doc_id among max-quality members
        assert best["doc_id"] == min(
            m["doc_id"] for m in members if m["quality_e6"] == mx
        )
        assert all(m["best_doc_id"] == best["doc_id"] for m in members)
    assert any(
        r["is_keeper"] and r["best_doc_id"] != r["cluster_id"] for r in rows
    ), "policy never differed from min-id keeping - vacuous on this data"


def test_knn_recall_eval_consistent_with_sets(spark):
    """recall_ppm must equal the directly-computed overlap of the two
    operators' neighbor sets, with k rows per query and integer-exact
    ppm."""
    from grapefruit_spark.operators.similarity import (
        TOP_K,
        knn_bruteforce,
        knn_lsh,
        knn_recall_eval,
    )

    bf: dict = {}
    for r in knn_bruteforce(spark, SF_DIR).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ls: dict = {}
    for r in knn_lsh(spark, SF_DIR).collect():
        ls.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {r["query_id"]: r for r in knn_recall_eval(spark, SF_DIR).collect()}
    assert set(got) == set(bf)
    for q, exact in bf.items():
        hits = len(exact & ls.get(q, set()))
        assert got[q]["k"] == TOP_K == len(exact)
        assert got[q]["n_hit"] == hits
        assert got[q]["recall_ppm"] == hits * 1_000_000 // TOP_K


def test_pagerank_tiers_agree_on_supplier_graph(spark):
    """Fused kernel vs distributed loop on the PRODUCTION-shaped graph
    (sf0.001 supplier co-purchase edges), not just the toy fixtures:
    every node's rank must agree within the documented summation-order
    band, far inside the 6-dp emission grid."""
    from grapefruit_spark.operators.graph import pagerank, supplier_edges

    edges = supplier_edges(spark, SF_DIR)
    fused = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(edges, fused_max_edges=0).collect()
    }
    assert set(fused) == set(dist) and len(fused) >= 10
    for v in fused:
        assert abs(fused[v] - dist[v]) < 1e-12, (v, fused[v], dist[v])
    assert abs(sum(fused.values()) - 1.0) < 1e-9


def test_connected_components_fused_matches_distributed(spark):
    """r14 small-graph tier: the fused numpy kernel and the distributed
    min-label loop compute the IDENTICAL integer fixpoint (component =
    min reachable id) — tier choice can never flip a value. Covers a
    long path (multi-round pointer halving), a cycle, an out-of-order
    hook (big id bridging two low-id chains), and singleton pairs."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)]              # 10-node path
        + [(100, 101), (101, 102), (102, 100)]      # cycle
        + [(50, 7), (200, 60), (60, 50)]            # late bridge into the path
        + [(300, 301)],
        ["src", "dst"],
    )
    fused = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    dist = {
        r["node"]: r["component"]
        for r in connected_components(edges, fused_max_edges=0).collect()
    }
    assert fused == dist
    assert fused[300] == 300 and fused[102] == 100
    # the bridge merges the path component with 50/60/200
    assert fused[200] == 0 and fused[50] == 0


def test_triangles_fused_matches_distributed(spark):
    """r14 small-graph tier for the triangle census: the fused numpy
    kernel and the compact-forward DataFrame pipeline emit the
    IDENTICAL integer (n_nodes, n_edges, n_triangles, n_wedges) row —
    tier choice can never flip a value. Graph mixes K4 (4 triangles),
    a diagonal-split square sharing node 0 (2 triangles, degree-tie
    orientation), a hub wedge fan (0 triangles, many wedges), and an
    isolated edge; the expected census is verified against an
    itertools brute force, not just cross-tier."""
    from itertools import combinations

    from grapefruit_spark.operators.graph import (
        _triangles_distributed,
        _triangles_fused,
    )

    pairs = sorted(
        {(min(a, b), max(a, b)) for a, b in (
            # K4 on 0..3
            [(a, b) for a, b in combinations(range(4), 2)]
            # square 0-10-11-12 with diagonal 10-12
            + [(0, 10), (10, 11), (11, 12), (12, 0), (10, 12)]
            # hub 20 fanning to 21..26 (wedges, no closures)
            + [(20, k) for k in range(21, 27)]
            + [(100, 101)]
        )}
    )
    edges = spark.createDataFrame(pairs, ["u", "v"])
    fused = _triangles_fused(edges).collect()[0].asDict()
    dist = _triangles_distributed(edges).collect()[0].asDict()
    assert fused == dist
    # brute-force reference
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for x, y, z in combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    assert fused == {
        "n_nodes": len(adj),
        "n_edges": len(pairs),
        "n_triangles": tri,
        "n_wedges": wedges,
    }
    assert tri == 6
