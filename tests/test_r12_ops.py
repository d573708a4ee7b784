"""Round-12 operators: IVF-PQ, distributed PCA, iterated BPE, the
learned quality classifier, and the full training permutation.

The replay tests re-derive each operator's math in plain python/numpy
from the parquet inputs — independent of both Spark and DuckDB — so a
bug mirrored identically into the oracle can't hide behind a hash-green
driver row (the pagerank/kcore python-reference precedent).
"""

from __future__ import annotations

import collections
import re

import duckdb
import numpy as np
import pytest

from .conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")


def _docs_words() -> collections.Counter:
    """lower → trim → \\s+ split → alphabetic words, counted — exactly
    bpe_merge_sequence's vocabulary contract."""
    rows = duckdb.sql(
        f"SELECT lower(trim(text)) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    wc: collections.Counter = collections.Counter()
    for (t,) in rows:
        for w in re.split(r"\s+", t or ""):
            if w and re.fullmatch(r"[a-z]+", w):
                wc[w] += 1
    return wc


def _bpe_replay(k: int = 8) -> list[tuple[int, str, int]]:
    wc = _docs_words()
    vocab = {w: list(w) for w in wc}
    merges = []
    for t in range(k):
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            n = wc[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (s1, s2), n_pair = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((t + 1, f"{s1} {s2}", n_pair))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_merge_sequence_matches_python_replay(spark):
    from grapefruit_spark.operators.text import bpe_merge_sequence

    got = sorted(
        (r["merge_idx"], r["pair"], r["n_pair"])
        for r in bpe_merge_sequence(spark, SF_DIR).collect()
    )
    assert got == _bpe_replay(), got


def test_bpe_merges_are_distinct_and_shrinking_or_stable(spark):
    """Sanity on the learned table: 8 merges, all pairs distinct; a
    merged pair's symbols can only come from earlier merges or chars."""
    from grapefruit_spark.operators.text import bpe_merge_sequence

    rows = bpe_merge_sequence(spark, SF_DIR).collect()
    assert len(rows) == 8
    pairs = [r["pair"] for r in rows]
    assert len(set(pairs)) == 8
    known = set()
    for p in pairs:
        s1, s2 = p.split(" ")
        for s in (s1, s2):
            assert len(s) == 1 or s in known, (p, known)
        known.add(s1 + s2)


def test_pq_fit_matches_numpy_replay(spark):
    """_pq_fit's jointly-trained codebooks == a single-process Lloyd's
    replay on the same init (float fold order differs → allclose)."""
    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.similarity import PQ_ITERS, PQ_K, PQ_M, _pq_fit

    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    books, n = _pq_fit(spark, emb)

    rows = sorted(
        duckdb.sql(
            f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    )
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    assert n == len(ids)
    step = max(1, n // PQ_K)
    init_sel = (ids % step == 0) & (ids / step < PQ_K)
    sub = mat.shape[1] // PQ_M
    ref = [mat[init_sel][:, m * sub : (m + 1) * sub].copy() for m in range(PQ_M)]
    for _ in range(PQ_ITERS):
        new = []
        for m, cb in enumerate(ref):
            sm = mat[:, m * sub : (m + 1) * sub]
            d = -2.0 * (sm @ cb.T) + (cb * cb).sum(axis=1)
            cl = d.argmin(axis=1)
            b = cb.copy()
            for j in range(PQ_K):
                sel = cl == j
                if sel.any():
                    b[j] = sm[sel].mean(axis=0)
            new.append(b)
        ref = new
    for m in range(PQ_M):
        assert np.allclose(books[m], ref[m], atol=1e-9), f"subspace {m}"


def test_ivf_pq_recall_positive_and_bounded(spark):
    from grapefruit_spark.operators.similarity import knn_pq_recall_eval

    rows = knn_pq_recall_eval(spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert r["k"] == 10
    # PQ prunes AND quantizes, but on 500 vectors with 3 probes the
    # index must still find a nontrivial share of true neighbors
    assert sum(r["n_hit"] for r in rows) > 0


def test_embedding_pca_matches_numpy_eig(spark):
    """Component 0 must align with the true dominant eigenvector of the
    same integer covariance (numpy eigh as the independent reference),
    and explained-variance shares must be sane and non-increasing."""
    from grapefruit_spark.operators.similarity import (
        COV_CODE_SCALE,
        PCA_COMPONENTS,
        embedding_pca,
    )

    rows = embedding_pca(spark, SF_DIR).collect()
    assert len(rows) == PCA_COMPONENTS * 64
    comps: dict[int, np.ndarray] = {}
    evr: dict[int, int] = {}
    for c in range(PCA_COMPONENTS):
        sub = sorted(
            (r["dim"], r["loading_e6"]) for r in rows if r["component"] == c
        )
        comps[c] = np.array([v for _, v in sub], dtype=np.float64) / 1e6
        evr[c] = next(r["evr_ppm"] for r in rows if r["component"] == c)

    mat = np.array(
        [
            r[0]
            for r in duckdb.sql(
                f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet'"
                " WHERE embedding IS NOT NULL"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    codes = np.floor(mat * COV_CODE_SCALE + 0.5)
    n = len(codes)
    s = codes.sum(axis=0)
    cov = n * (codes.T @ codes) - np.outer(s, s)
    a = cov / cov.trace()
    vals, vecs = np.linalg.eigh(a)
    top = vecs[:, -1]
    cos = abs(float(comps[0] @ top) / np.linalg.norm(comps[0]))
    assert cos > 0.99, cos
    # evr: trace-normalized eigenvalue shares, descending, ≤ 1e6 total
    assert evr[0] == int(np.floor(vals[-1] * 1e6)) or abs(
        evr[0] - vals[-1] * 1e6
    ) <= 1
    for c in range(PCA_COMPONENTS - 1):
        assert evr[c] >= evr[c + 1]
    assert sum(evr.values()) <= 1_000_000


def test_quality_classifier_beats_base_rate(spark):
    """The learned filter must do better than always predicting the
    majority class — otherwise the fit is decorative."""
    from grapefruit_spark.operators.search import quality_classifier_score

    rows = quality_classifier_score(spark, SF_DIR).collect()
    n = len(rows)
    pos = sum(r["label"] for r in rows)
    base = max(pos, n - pos) / n
    acc = sum(1 for r in rows if r["predicted"] == r["label"]) / n
    assert acc > base, (acc, base)
    # both classes must actually be predicted (an all-one predictor can
    # sneak past base-rate on a near-balanced corpus)
    preds = {r["predicted"] for r in rows}
    assert preds == {0, 1}, preds


def test_quality_classifier_fit_shape(spark):
    from grapefruit_spark.operators.search import (
        QC_BUCKETS,
        quality_classifier_fit,
    )

    rows = quality_classifier_fit(spark, SF_DIR).collect()
    assert len(rows) == QC_BUCKETS + 1
    assert {r["feat"] for r in rows} == set(range(QC_BUCKETS + 1))


def test_shuffle_order_full_is_permutation(spark):
    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.datapipe import shuffle_order_full

    rows = shuffle_order_full(spark, SF_DIR).collect()
    n = table(spark, SF_DIR, "documents").count()
    assert len(rows) == n
    assert sorted(r["position"] for r in rows) == list(range(1, n + 1))
    # positions follow the key order
    by_pos = sorted(rows, key=lambda r: r["position"])
    keys = [r["shuffle_key"] for r in by_pos]
    assert keys == sorted(keys)


def test_shuffle_order_full_plan_has_no_global_sort_window(spark):
    """The permutation must come from the range-partition + offset
    device: the ONLY unpartitioned window runs over the O(P) offsets
    frame, never the corpus (canary: every windowspecdefinition in the
    executed plan is either partitioned by _pid or fed by the
    partition-count aggregate)."""
    from grapefruit_spark.operators.datapipe import shuffle_order_full
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(shuffle_order_full(spark, SF_DIR))
    assert "RangePartitioning" in plan or "rangepartitioning" in plan.lower()
    assert "_pid" in plan


def test_ivf_pq_plan_stays_corpus_join_free(spark):
    """knn_ivf_pq's search pass is one mapInPandas over the corpus; a
    regression to a corpus-side join (codes × queries or codes × cells)
    would show up as a join on the scan side of the final ranking."""
    from grapefruit_spark.operators.similarity import knn_ivf_pq
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(knn_ivf_pq(spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_embedding_pca_project_matches_python_integers(spark):
    """The projection is pure integer arithmetic from the emitted
    loadings — replay it exactly (==, not allclose) in python."""
    from grapefruit_spark.operators.similarity import (
        COV_CODE_SCALE,
        embedding_pca,
        embedding_pca_project,
    )

    loads: dict[int, dict[int, int]] = {}
    for r in embedding_pca(spark, SF_DIR).collect():
        loads.setdefault(r["component"], {})[r["dim"]] = r["loading_e6"]

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
        " WHERE embedding IS NOT NULL"
    ).fetchall()
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    codes = np.floor(mat * COV_CODE_SCALE + 0.5).astype(object)  # exact ints
    n = len(rows)
    s = codes.sum(axis=0)
    def trunc_div(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    expect = {}
    for (vid, _), c in zip(rows, codes):
        expect[vid] = {}
        for comp, ws in loads.items():
            num = int(sum((c[d - 1] * n - s[d - 1]) * w for d, w in ws.items()))
            q = trunc_div(num, n)
            expect[vid][comp] = (q, num - q * n)
    got = embedding_pca_project(spark, SF_DIR).collect()
    assert len(got) == n
    for r in got:
        for comp in loads:
            assert (
                r[f"proj_q_{comp}"], r[f"proj_r_{comp}"]
            ) == expect[r["vec_id"]][comp]


def test_bpe_encode_stats_consistent_with_merge_table(spark):
    """Encoding with the learned merges must save exactly
    Σ n_pair-at-merge-time symbols? No — later merges change pair
    counts; but n_chars − n_symbols must be POSITIVE and at most the
    total of all merge counts (each applied merge removes one symbol
    per occurrence at application time, and occurrences only shrink
    after training order). Also replay the python encode exactly."""
    from grapefruit_spark.operators.text import (
        bpe_encode_stats,
        bpe_merge_sequence,
    )

    stats = bpe_encode_stats(spark, SF_DIR).collect()[0]
    merges = bpe_merge_sequence(spark, SF_DIR).collect()
    saved = stats["n_chars"] - stats["n_symbols"]
    # ≤, not ==, by design (ADVICE_r12): pair counts include OVERLAPPING
    # adjacencies (s1 == s2 in a run of 3+ counts twice) while the
    # non-overlapping replace removes one symbol per applied occurrence,
    # so a self-overlapping winning merge makes the identity strict. The
    # exact python replay below remains the strong check.
    assert 0 < saved <= sum(r["n_pair"] for r in merges), (
        saved,
        [r["n_pair"] for r in merges],
    )
    # python replay of the full encode
    wc = _docs_words()
    vocab = {w: list(w) for w in wc}
    for r in sorted(merges, key=lambda r: r["merge_idx"]):
        s1, s2 = r["pair"].split(" ")
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    assert stats["n_distinct_words"] == len(wc)
    assert stats["n_word_instances"] == sum(wc.values())
    assert stats["n_chars"] == sum(len(w) * c for w, c in wc.items())
    assert stats["n_symbols"] == sum(
        len(vocab[w]) * c for w, c in wc.items()
    )


def test_cms_overestimates_and_width_monotonicity(spark):
    """CMS guarantees est >= exact (over_ppm >= 0); widening the sketch
    can only shrink every estimate (cells at coarser widths are sums of
    finer cells), so the mean/max curves are non-increasing in width."""
    from grapefruit_spark.operators.event_analytics import (
        events_cms_error,
        events_cms_width_curve,
    )

    for r in events_cms_error(spark, SF_DIR).collect():
        assert r["cms_est"] >= r["n_exact"]
        assert r["over_ppm"] >= 0
    curve = sorted(
        events_cms_width_curve(spark, SF_DIR).collect(),
        key=lambda r: r["width"],
    )
    assert [r["width"] for r in curve] == [64, 256, 1024]
    for a, b in zip(curve, curve[1:]):
        assert a["mean_over_ppm"] >= b["mean_over_ppm"]
        assert a["max_over_ppm"] >= b["max_over_ppm"]


def test_cms_estimate_matches_python_sketch(spark):
    """Full python CMS replay from the parquet — exact integers."""
    import hashlib

    from grapefruit_spark.operators.event_analytics import (
        CMS_D,
        CMS_TOP,
        CMS_W,
        events_cms_error,
    )

    rows = duckdb.sql(
        f"SELECT user_id, count(*) FROM '{SF_DIR}/events.parquet' GROUP BY 1"
    ).fetchall()
    counts = dict(rows)

    def bucket(uid: int, r: int) -> int:
        h = hashlib.md5(f"{uid}|cms{r}".encode()).hexdigest()[:15]
        return int(h, 16) % CMS_W

    cells: dict[tuple[int, int], int] = {}
    for uid, n in counts.items():
        for r in range(CMS_D):
            k = (r, bucket(uid, r))
            cells[k] = cells.get(k, 0) + n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP]
    expect = {
        uid: min(cells[(r, bucket(uid, r))] for r in range(CMS_D))
        for uid, _ in top
    }
    got = events_cms_error(spark, SF_DIR).collect()
    assert len(got) == min(CMS_TOP, len(counts))
    for r in got:
        assert r["cms_est"] == expect[r["user_id"]], r


def test_classifier_score_broadcasts_weights(spark):
    """The per-doc scoring scan may join ONLY broadcast frames (the
    65-row weight table and the 1-row mean) — a shuffle join on the
    corpus side would be the 100 TB regression this canary guards."""
    from grapefruit_spark.operators.search import quality_classifier_score
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(quality_classifier_score(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_cms_estimate_join_is_broadcast(spark):
    """The K·d estimate probe joins the (d×w)-bounded cell grid — both
    sides are config-bounded, so the join must broadcast, never
    shuffle-sort the sketch."""
    from grapefruit_spark.operators.event_analytics import events_cms_error
    from grapefruit_spark.plans import assert_broadcast_join

    assert_broadcast_join(events_cms_error(spark, SF_DIR))


def test_stream_cms_sim_merge_equals_batch(spark):
    """The incremental sim's merged sketch must answer EXACTLY like the
    one-shot sketch — same rows, same estimates (CMS merge identity)."""
    from grapefruit_spark.operators.event_analytics import (
        events_cms_error,
        stream_cms_sim,
    )

    one_shot = {
        r["user_id"]: tuple(r)
        for r in events_cms_error(spark, SF_DIR).collect()
    }
    merged = {
        r["user_id"]: tuple(r) for r in stream_cms_sim(spark, SF_DIR).collect()
    }
    assert merged == one_shot
