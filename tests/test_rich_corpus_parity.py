"""Spark↔DuckDB parity on a RICH synthetic corpus.

The driver-generated documents table is degenerate for text analysis —
a ~31-type vocabulary means coverage/entropy/tf-idf style operators sit
on constant or saturated values (vocab_coverage's coverage was exactly
1.0 at every K locally, which hid a real cross-engine hash divergence
for four rounds until richer driver-side data exposed it). This file
replays the driver's exact row/schema/hash gate for every documents-only
oracle-backed operator over a corpus with:

- a ~2,500-type Zipfian vocabulary (long tail of rare tokens),
- doc lengths from 5 to 300 tokens,
- planted exact duplicates, near-duplicates, and a shared boilerplate
  span across 30 docs (so dedup/span operators emit non-trivial rows),
- mixed languages/sources for the grouping operators.

Everything is seeded — the corpus is byte-identical across runs.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from .util import assert_matches_oracle

#: documents-only, oracle-backed registry entries (explicit list: a query
#: that silently started needing another table should FAIL here, loudly)
RICH_QUERIES = [
    ("text", "lang_id"),
    ("text", "doc_entropy"),
    ("text", "doc_quality"),
    ("text", "token_count"),
    ("text", "doc_fingerprint"),
    ("text", "doc_rolling_fingerprint"),
    ("search", "tfidf_top_terms"),
    ("search", "bm25_search"),
    ("search", "doc_unigram_logprob"),
    ("search", "vocab_coverage"),
    ("dedup", "dedup_exact"),
    ("dedup", "dup_span_docs"),
    ("dedup", "dedup_spans_apply"),
    ("dedup", "ngram_jaccard_pairs"),
    ("dedup", "ngram_containment_pairs"),
    ("datapipe", "quality_repetition"),
    ("datapipe", "doc_chunking"),
    ("datapipe", "seq_packing"),
    ("graph", "jaccard_clusters"),
    # r6: the multimodal oracles recompute BMP/WAV stats analytically
    # from the generators — replay the whole encode→decode round-trip on
    # a different doc_id distribution (sparse ids up to 2009, so widths,
    # sample counts, and LCG seeds cover different residues than sf0.01)
    ("multimodal", "multimodal_features"),
    ("multimodal", "multimodal_transform"),
    # r9 audit: the r6-r8 documents-only additions were never appended
    # here — the portable-md5 LSH family and the corpus-LM scorers now
    # also re-prove on the hostile corpus (planted dups + Zipf vocab are
    # exactly their branch-heavy inputs)
    ("dedup", "dedup_minhash"),
    ("dedup", "dedup_simhash"),
    ("dedup", "minhash_est_error"),
    ("graph", "dedup_clusters"),
    ("graph", "dedup_keep_best"),
    ("graph", "dedup_cluster_stats"),
    ("search", "doc_bigram_surprisal"),
    ("search", "doc_backoff_surprisal"),
    ("datapipe", "split_leakage_safe"),
    # r10 additions: the Zipf vocab + planted dups are the branch-heavy
    # regime for the tertile cut (many distinct surprisal bins), the
    # positional phrase join (boilerplate makes the top bigram hot),
    # the star CC (real dup clusters), and the per-eval contamination
    # view (boilerplate grams carry high train_df)
    ("search", "doc_perplexity_buckets"),
    ("search", "phrase_search"),
    ("graph", "dedup_clusters_star"),
    ("graph", "dedup_token_savings"),
    ("datapipe", "contamination_report"),
    # r10 second wave: the Gopher rule gate (Zipf lengths span the
    # word-count/mean-word-length branches) and fertility (mixed
    # langs/sources give non-trivial group structure)
    ("text", "quality_gopher_rules"),
    ("text", "tokenizer_fertility"),
    # Zipf lengths exercise the overflow/underfill packing branches;
    # the long-tail vocab makes the PMI top-V cut non-trivial
    ("datapipe", "packing_efficiency"),
    ("search", "term_pmi"),
    # mixed-language corpus gives a real skew for the α=0.5 flattening
    ("datapipe", "sample_temperature"),
    # the Zipf tail is exactly what a Heaps curve measures
    ("text", "vocab_growth"),
    # mixed sources sharing a Zipf head give a dense overlap matrix
    ("text", "source_overlap_jaccard"),
    # r12 additions: the changed/new documents-only operators re-prove
    # on the hostile corpus. Note bpe_merge_sequence's alphabetic-word
    # contract makes THIS vocab (w0..w2499, digit-bearing) empty — the
    # rich run deliberately pins the degenerate no-merge path that both
    # engines must agree on (0 rows); the real-path proof is the sf
    # gates + the python replay test.
    ("text", "doc_charset_stats"),
    ("text", "bpe_merge_sequence"),
    ("text", "bpe_encode_stats"),
    ("search", "quality_classifier_fit"),
    ("search", "quality_classifier_score"),
    # r13: the logistic upgrade — the Zipf corpus is its exp-ulp stress
    # test (wide logit range incl. saturation on both tails)
    ("search", "quality_classifier_logit"),
    ("datapipe", "shuffle_order_full"),
    ("dedup", "minhash_band_curve"),
    # r13 additions: the planted whole-doc dups give full-doc-length
    # maximal runs (> MIN_RUN_TOKENS) while the 12-token boilerplate span
    # stays below the threshold — both branches of the ≥50-token policy
    ("dedup", "dup_run_stats"),
    ("dedup", "dedup_runs_apply"),
    ("dedup", "dup_run_threshold_curve"),
    ("search", "quality_classifier_logit_score"),
    # r14 additions: cross-document line dedup (planted whole-doc dups
    # make every line of a duplicated doc df ≥ 2, so the apply path
    # strips real mass here) and the C4 rule filter (this corpus has no
    # terminal punctuation — the all-false branch both engines must
    # agree on; the per-rule branches are pinned by test_r14_ops.py)
    ("dedup", "line_dedup_stats"),
    ("dedup", "line_dedup_hist"),
    ("dedup", "line_dedup_apply"),
    ("text", "quality_c4_rules"),
    # r14: the extended PII scrub (email/phone/ssn/ip/Luhn-CC) — was
    # never in the rich/NULL gates; the NULL-text contract (all-NULL
    # emission on both engines) is now pinned here
    ("datapipe", "pii_redact"),
]


def _build_corpus(path: str) -> None:
    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(2500)]
    weights = [1.0 / (i + 10) ** 1.1 for i in range(2500)]
    boiler = " ".join(rng.choices(vocab, weights, k=12))
    rows = []
    for i in range(400):
        n = rng.randint(5, 300)
        toks = rng.choices(vocab, weights, k=n)
        text = " ".join(toks)
        if i % 13 == 0:
            text = boiler + " " + text  # shared span across ~30 docs
        lang = rng.choice(["en", "de", "fr"])
        src = rng.choice(["web", "wiki", "code"])
        rows.append((i, text, lang, src, len(text)))
    # exact duplicates
    for j, src_id in enumerate((0, 7, 42)):
        rows.append((1000 + j, rows[src_id][1], rows[src_id][2], "dupe", rows[src_id][4]))
    # near-duplicates: copy + mutate a few tokens
    for j, src_id in enumerate(range(10)):
        toks = rows[src_id][1].split(" ")
        for _ in range(max(1, len(toks) // 30)):
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        text = " ".join(toks)
        rows.append((2000 + j, text, rows[src_id][2], "neardupe", len(text)))
    import pandas as pd

    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["n_chars"].astype("int64")
    df.to_parquet(path, index=False)


@pytest.fixture(scope="module")
def rich_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rich")
    (d / "documents.parquet").mkdir()
    _build_corpus(str(d / "documents.parquet" / "part-0.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def rich_duck(rich_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{rich_dir}/documents.parquet/*.parquet'"
    )
    return con


@pytest.mark.parametrize("mod_name,qname", RICH_QUERIES, ids=[q for _, q in RICH_QUERIES])
def test_rich_corpus_matches_oracle(spark, rich_dir, rich_duck, mod_name, qname):
    import importlib

    mod = importlib.import_module(f"grapefruit_spark.operators.{mod_name}")
    assert_matches_oracle(
        mod.QUERIES[qname](spark, rich_dir), rich_duck, mod.ORACLE[qname]
    )


def test_rich_corpus_is_actually_rich(spark, rich_dir, rich_duck):
    """Guard the guard: the corpus must exercise the regimes the driver
    data exposed — unsaturated coverage, non-trivial dup pairs/spans."""
    from grapefruit_spark.operators.dedup import dup_span_docs, ngram_jaccard_pairs
    from grapefruit_spark.operators.search import vocab_coverage

    cov = {r["k"]: r["coverage_ppm"] for r in vocab_coverage(spark, rich_dir).collect()}
    assert cov[100] < 1_000_000, "top-100 coverage must be UNsaturated"
    assert cov[10_000] == 1_000_000
    assert ngram_jaccard_pairs(spark, rich_dir).count() >= 10
    assert dup_span_docs(spark, rich_dir).count() >= 1
