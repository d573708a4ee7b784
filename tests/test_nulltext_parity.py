"""Spark↔DuckDB parity on a corpus CONTAINING A NULL-TEXT DOCUMENT.

The r13 NULL-text audit found four latent divergences that no gate
corpus could fire (driver data and the rich corpus are NULL-free):
clean_text NULL-vs-'' in both span-apply ops, lang_id 'und'-vs-NULL,
doc_rolling_fingerprint NULL-vs-0, and minhash_est_error's exact_ppm
NULL-vs-sentinel — plus ADVICE_r12's classifier-label NaN. This module
replays the driver's row/schema/hash gate for EVERY documents-only
oracle-backed operator (the rich-corpus list) over a corpus whose rows
include a NULL text, a sub-shingle-width text, and a planted duplicate,
so the NULL contract of each emission is pinned forever: a new operator
added to RICH_QUERIES is automatically NULL-gated here too.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .test_rich_corpus_parity import RICH_QUERIES
from .util import assert_matches_oracle


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulltext")
    rows = [
        (1, "a b c d e f g h i j " * 6, "en", "web"),
        (2, "a b c d e f g h i j " * 6, "de", "wiki"),  # exact dup of 1
        (3, None, "en", "web"),  # THE row this gate exists for
        (4, "x y", "fr", "code"),  # below shingle width
        (5, "the quick brown fox jumps over the lazy dog " * 4, "en", "web"),
        (6, "", "de", "code"),  # empty-but-not-NULL text
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array(
                    [len(r[1]) if r[1] is not None else 0 for r in rows],
                    pa.int64(),
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def null_duck(null_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{null_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize(
    "mod_name,qname", RICH_QUERIES, ids=[q for _, q in RICH_QUERIES]
)
def test_nulltext_matches_oracle(spark, null_dir, null_duck, mod_name, qname):
    import importlib

    mod = importlib.import_module(f"grapefruit_spark.operators.{mod_name}")
    assert_matches_oracle(
        mod.QUERIES[qname](spark, null_dir), null_duck, mod.ORACLE[qname]
    )
