"""Property tests for the column-function library (hypothesis-driven
where it pays off): determinism, agreement with python reference
implementations, edge cases."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from grapefruit_spark import functions as gf

TEXTS = st.text(
    alphabet=st.characters(codec="ascii", exclude_categories=("Cs", "Cc")),
    max_size=80,
)


@pytest.fixture(scope="module")
def run_expr(spark):
    def _run(col, **cols):
        names = list(cols)
        df = spark.createDataFrame([tuple(cols[n] for n in names)], names)
        return df.select(col.alias("out")).first()["out"]

    return _run


@settings(max_examples=25, deadline=None, derandomize=True)
@given(TEXTS)
def test_normalize_matches_python(run_expr, s):
    got = run_expr(gf.normalize_text(F.col("t")), t=s)
    import re

    want = re.sub(r"\s+", " ", s.strip().lower())
    assert got == want


@settings(max_examples=25, deadline=None, derandomize=True)
@given(TEXTS)
def test_md5_fingerprint_matches_hashlib(run_expr, s):
    import re

    got = run_expr(gf.md5_fingerprint(F.col("t")), t=s)
    norm = re.sub(r"\s+", " ", s.strip().lower())
    assert got == hashlib.md5(norm.encode("utf-8")).hexdigest()


def test_ws_tokens_edges(run_expr):
    assert run_expr(gf.ws_tokens(F.col("t")), t="") == []
    assert run_expr(gf.ws_tokens(F.col("t")), t="   ") == []
    assert run_expr(gf.ws_tokens(F.col("t")), t=" a  b\tc ") == ["a", "b", "c"]


def test_word_ngrams_count_and_content(run_expr):
    toks = gf.ws_tokens(F.col("t"))
    out = run_expr(gf.word_ngrams(toks, 3), t="a b c d")
    assert out == ["a b c", "b c d"]
    assert run_expr(gf.word_ngrams(toks, 3), t="a b") == []


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=16),
       st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=16))
def test_cosine_matches_numpy(run_expr, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    av = np.array(a, dtype=np.float32).astype(np.float64)
    bv = np.array(b, dtype=np.float32).astype(np.float64)
    got = run_expr(
        gf.cosine_similarity(F.col("a").cast("array<float>"), F.col("b").cast("array<float>")),
        a=a, b=b,
    )
    if np.linalg.norm(av) == 0 or np.linalg.norm(bv) == 0:
        assert got is None  # zero vector after float32 cast → NULL, not abort
        return
    want = float(av @ bv / (np.linalg.norm(av) * np.linalg.norm(bv)))
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-12)


def test_rolling_hash_matches_python(run_expr):
    def py_roll(s, window=16, base=257, mod=(1 << 31) - 1):
        acc = 0
        for ch in s[:window]:
            acc = (acc * base + ord(ch)) % mod
        return acc

    for s in ["", "a", "hello world", "x" * 40]:
        assert run_expr(gf.rolling_hash(F.col("t")), t=s) == py_roll(s)


def test_hash_param_deterministic_and_31bit():
    vals = [gf.hash_param(42, i) for i in range(200)]
    assert vals == [gf.hash_param(42, i) for i in range(200)]
    assert all(0 <= v < (1 << 31) for v in vals)
    assert len(set(vals)) == 200  # no collisions in the family we use


def test_band_keys_prefix_salting(run_expr):
    sig = [float(i) for i in range(8)]
    out = run_expr(
        gf.band_keys(F.col("s").cast("array<bigint>"), bands=4, rows=2),
        s=sig,
    )
    assert len(out) == 4
    assert all(out[i].startswith(f"{i}:") for i in range(4))


def test_materialize_ctes_anchored_to_cte_heads():
    """ADVICE_r12: the rewrite must hit CTE heads only — never a WINDOW
    clause, a recursive CTE's column-list form, or an 'AS (' inside a
    string literal of an embedded oracle."""
    sql = (
        "WITH a AS (SELECT 1),\n"
        "-- comment between CTEs\n"
        "b AS (SELECT * FROM a),\n"
        "c(x) AS (SELECT 2)\n"
        "SELECT *, '... AS (' AS lit FROM b\n"
        "WINDOW w AS (PARTITION BY x)"
    )
    out = gf.materialize_ctes(sql)
    assert "WITH a AS MATERIALIZED (" in out
    assert "b AS MATERIALIZED (" in out  # comment-gap head still rewritten
    assert "'... AS ('" in out  # string literal untouched
    assert "WINDOW w AS (PARTITION" in out  # window clause untouched
    # column-list heads are not used by our generators; they must at
    # least pass through unmangled
    assert "c(x) AS (SELECT 2)" in out
