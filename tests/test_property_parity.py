"""Hypothesis property parity: randomized inputs vs the DuckDB oracles.

The adversarial gates plant KNOWN edge cases; these properties let
hypothesis search for UNKNOWN ones — random gap structures around the
session boundary, and random overlapping tiny-vocab corpora for the
prefix-filtered pair join (whose equivalence proof — any global order
yields the same verified pairs — is exactly the kind of claim a
property test should hammer).

Examples are capped so the whole module stays ~a minute; failures
shrink to minimal reproducers.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .util import assert_matches_oracle

GAP_US = 30 * 60 * 1_000_000  # windows.GAP_MINUTES
_BASE = 1_709_251_200_000_000

# gaps biased toward the exact session boundary and its neighbors
_gap = st.one_of(
    st.just(GAP_US),
    st.just(GAP_US - 1),
    st.just(GAP_US + 1),
    st.just(0),
    st.integers(min_value=1, max_value=3 * GAP_US),
)


@st.composite
def _event_streams(draw):
    n_users = draw(st.integers(min_value=1, max_value=4))
    rows = []
    eid = 0
    for u in range(n_users):
        t = _BASE + draw(st.integers(min_value=0, max_value=GAP_US))
        for _ in range(draw(st.integers(min_value=1, max_value=12))):
            rows.append((eid, t, u, "view", 1.0, None))
            eid += 1
            t += draw(_gap)
    return rows


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=_event_streams())
def test_native_session_window_matches_oracle_on_random_streams(
    spark, tmp_path_factory, rows
):
    from grapefruit_spark.operators import windows

    d = tmp_path_factory.mktemp("prop_ev")
    (d / "events.parquet").mkdir()
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us").astype("datetime64[us]")
    df.to_parquet(str(d / "events.parquet" / "p.parquet"), index=False)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    assert_matches_oracle(
        windows.QUERIES["events_session_window"](spark, str(d)),
        con,
        windows.ORACLE["events_session_window"],
    )
    assert_matches_oracle(
        windows.QUERIES["events_sessionize"](spark, str(d)),
        con,
        windows.ORACLE["events_sessionize"],
    )


@st.composite
def _tiny_corpora(draw):
    # vocab of 6 words forces heavy shingle overlap → dense pair space,
    # the regime where a prefix-filter bug would drop or invent pairs
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    n_docs = draw(st.integers(min_value=2, max_value=8))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=0, max_value=14))
        toks = [draw(st.sampled_from(vocab)) for _ in range(n_tok)]
        docs.append((i, " ".join(toks), "en", "prop", len(toks)))
    return docs


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(docs=_tiny_corpora())
def test_prefix_filtered_pairs_match_semantic_oracle(spark, tmp_path_factory, docs):
    from grapefruit_spark.operators import dedup

    d = tmp_path_factory.mktemp("prop_doc")
    (d / "documents.parquet").mkdir()
    df = pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.to_parquet(str(d / "documents.parquet" / "p.parquet"), index=False)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    for q in ("ngram_jaccard_pairs", "ngram_containment_pairs"):
        assert_matches_oracle(
            dedup.QUERIES[q](spark, str(d)), con, dedup.ORACLE[q]
        )
