"""Round-13 operators: maximal duplicate-run dedup (Lee et al. ≥50-token
policy), PCA-rotated PQ (OPQ-lite), the trigram stupid-backoff upgrade's
consumers, the snapshot/time-travel sim, and the ADVICE_r12 NULL-text
classifier contract.

Planted-corpus tests pin the branch points (a run ABOVE the strip
threshold and one BELOW it; a NULL-text document through both classifier
rows); python replays re-derive the math independently of both engines.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .conftest import SF_DIR
from .util import assert_matches_oracle

pytestmark = pytest.mark.usefixtures("spark")


def _duck_for(d: str, tables: list[str]):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return con


def _write_docs(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["web"] * len(rows)),
                "n_chars": pa.array(
                    [len(r[1]) if r[1] is not None else 0 for r in rows], pa.int64()
                ),
            }
        ),
        path,
    )


# ------------------------------------------------- duplicate-run dedup
@pytest.fixture(scope="module")
def runs_dir(tmp_path_factory):
    """Planted duplicate runs on BOTH sides of MIN_RUN_TOKENS (50):
    a 60-token block shared by two docs (one maximal run ≥ 50 → must be
    stripped) and a 12-token boilerplate shared by two others (one run
    < 50 → must be kept), plus unique filler so the docs aren't exact
    duplicates and a short doc below the span width."""
    d = tmp_path_factory.mktemp("runsadv")
    long_block = " ".join(f"L{i}" for i in range(60))
    short_block = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, long_block + " u1a u1b u1c"),
        (2, "u2a u2b " + long_block + " u2c"),
        (3, short_block + " v3a v3b v3c v3d v3e"),
        (4, "v4a v4b v4c " + short_block + " v4d v4e"),
        (5, "tiny doc"),
        (6, None),  # NULL text: clean_text '' on both engines, counts NULL
    ]
    _write_docs(str(d / "documents.parquet"), rows)
    return str(d)


def test_dup_run_stats_islands(spark, runs_dir):
    from grapefruit_spark.operators.dedup import SPAN_W, dup_run_stats

    con = _duck_for(runs_dir, ["documents"])
    from grapefruit_spark.operators.dedup import ORACLE

    assert_matches_oracle(dup_run_stats(spark, runs_dir), con, ORACLE["dup_run_stats"])
    got = {r["run_len"]: r for r in dup_run_stats(spark, runs_dir).collect()}
    # the 60-token shared block is ONE maximal run of exactly 60 tokens
    # in each of the two docs — 53 overlapping 8-token spans merged
    assert got[60]["n_runs"] == 2 and got[60]["n_docs"] == 2
    assert got[60]["tokens_covered"] == 120
    # the 12-token boilerplate is one 12-token run per doc (5 spans merged)
    assert got[12]["n_runs"] == 2 and got[12]["n_docs"] == 2
    # nothing else is duplicated: exactly the two planted run lengths
    assert set(got) == {60, 12}
    assert SPAN_W == 8  # the island arithmetic above assumes the 8-token grid


def test_dedup_runs_apply_threshold(spark, runs_dir):
    from grapefruit_spark.operators.dedup import (
        MIN_RUN_TOKENS,
        ORACLE,
        dedup_runs_apply,
        dedup_spans_apply,
    )

    assert MIN_RUN_TOKENS == 50
    con = _duck_for(runs_dir, ["documents"])
    assert_matches_oracle(
        dedup_runs_apply(spark, runs_dir), con, ORACLE["dedup_runs_apply"]
    )
    got = {r["doc_id"]: r for r in dedup_runs_apply(spark, runs_dir).collect()}
    # docs 1/2: the 60-token run is >= 50 -> stripped, fillers survive
    assert got[1]["n_removed"] == 60 and got[1]["clean_text"] == "u1a u1b u1c"
    assert got[2]["n_removed"] == 60 and got[2]["clean_text"] == "u2a u2b u2c"
    # docs 3/4: the 12-token run is < 50 -> kept ENTIRELY (the published
    # policy; the any-covered-token variant would strip it)
    assert got[3]["n_removed"] == 0 and got[4]["n_removed"] == 0
    assert got[5]["n_removed"] == 0
    assert got[6]["clean_text"] == "" and got[6]["n_tokens"] is None
    aggressive = {
        r["doc_id"]: r["n_removed"]
        for r in dedup_spans_apply(spark, runs_dir).collect()
    }
    assert aggressive[3] == 12 and aggressive[4] == 12  # the contrast


# ------------------------------------------------- NULL-text classifier
@pytest.fixture(scope="module")
def nulltext_dir(tmp_path_factory):
    """A corpus with a NULL-text doc (plus normal docs spanning the rule
    branches) — the ADVICE_r12 gate: NULL rule conjunctions must label
    as 0 on BOTH engines, never reach numpy as NaN."""
    d = tmp_path_factory.mktemp("nulladv")
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, "short"),
        (3, None),
        (4, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4),
        (5, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
    ]
    _write_docs(str(d / "documents.parquet"), rows)
    return str(d)


def test_quality_classifier_null_text(spark, nulltext_dir):
    from grapefruit_spark.operators.search import (
        ORACLE,
        quality_classifier_fit,
        quality_classifier_score,
    )

    con = _duck_for(nulltext_dir, ["documents"])
    assert_matches_oracle(
        quality_classifier_fit(spark, nulltext_dir),
        con,
        ORACLE["quality_classifier_fit"],
    )
    assert_matches_oracle(
        quality_classifier_score(spark, nulltext_dir),
        con,
        ORACLE["quality_classifier_score"],
    )
    rows = {r["doc_id"]: r for r in quality_classifier_score(spark, nulltext_dir).collect()}
    assert rows[3]["label"] == 0  # NULL text -> label 0, not NULL


def test_quality_classifier_logit_null_text_and_separation(spark, nulltext_dir):
    """The logistic row through the same NULL-text gate, plus a
    separation sanity: trained weights must not be all zero (the σ(0)=½
    start guarantees a nonzero first gradient on any mixed-label corpus)."""
    from grapefruit_spark.operators.search import ORACLE, quality_classifier_logit

    con = _duck_for(nulltext_dir, ["documents"])
    assert_matches_oracle(
        quality_classifier_logit(spark, nulltext_dir),
        con,
        ORACLE["quality_classifier_logit"],
    )
    w = {r["feat"]: r["weight_e12"] for r in quality_classifier_logit(spark, SF_DIR).collect()}
    assert any(v != 0 for v in w.values())


# --------------------------------------------------------- OPQ vs PQ
def test_opq_recall_delta_measured(spark):
    """The sixth ANN QA row exists to MEASURE the rotation's effect: both
    recall frames must be valid ppm over the same query set; the delta is
    recorded here (sign is corpus-dependent by design — near-isotropic
    synthetic embeddings punish a 4-component rotation)."""
    from grapefruit_spark.operators.similarity import (
        knn_opq_recall_eval,
        knn_pq_recall_eval,
    )

    pq_r = {r["query_id"]: r["recall_ppm"] for r in knn_pq_recall_eval(spark, SF_DIR).collect()}
    opq_r = {r["query_id"]: r["recall_ppm"] for r in knn_opq_recall_eval(spark, SF_DIR).collect()}
    assert set(pq_r) == set(opq_r) and len(pq_r) > 0
    assert all(0 <= v <= 1_000_000 for v in list(pq_r.values()) + list(opq_r.values()))
    mean_pq = sum(pq_r.values()) / len(pq_r)
    mean_opq = sum(opq_r.values()) / len(opq_r)
    print(f"# OPQ rotation recall delta: pq={mean_pq:.0f} opq={mean_opq:.0f} ppm")


def test_opq_rotated_frame_is_exact_integer_projection(spark):
    """The rotated coordinates must be embedding_pca_project's integer
    numerators divided by the shared normalizer — bit-equal, no float
    drift between the two operators' devices."""
    from grapefruit_spark.operators.similarity import (
        _opq_rotated_frame,
        _opq_rotation,
        embedding_pca_project,
    )

    loads, n_vecs, s, denom = _opq_rotation(spark, SF_DIR)
    rot = {
        r["vec_id"]: r["embedding"]
        for r in _opq_rotated_frame(spark, SF_DIR, loads, n_vecs, s, denom).collect()
    }
    proj = {r["vec_id"]: r for r in embedding_pca_project(spark, SF_DIR).collect()}
    assert set(rot) == set(proj)
    for vid, ys in rot.items():
        for c, y in enumerate(ys):
            # num reconstructs bit-exactly from the r14 (q, r) emission
            num = proj[vid][f"proj_q_{c}"] * n_vecs + proj[vid][f"proj_r_{c}"]
            assert y == num / denom


# ------------------------------------------------------- snapshot sim
def test_snapshot_read_sim_versions(spark):
    """Time-travel invariants on driver data: v1 ⊂ v2 row-wise, v3 keeps
    v2's row count (a restatement, not an append), v3's total departs
    from v2's by exactly the doubled 1-URGENT mass, and the v4 CoW
    delete shrinks rows/keys while leaving non-deleted values intact."""
    from grapefruit_spark.operators.io_sims import snapshot_read_sim

    rows = {r["version"]: r for r in snapshot_read_sim(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["n_rows"] < rows[2]["n_rows"]
    assert rows[2]["n_rows"] == rows[3]["n_rows"]
    assert rows[2]["key_sum"] == rows[3]["key_sum"]  # same membership
    assert rows[3]["total"] > rows[2]["total"]  # doubled urgent partition
    assert rows[4]["n_rows"] < rows[3]["n_rows"]  # CoW delete removed rows
    assert rows[4]["key_sum"] < rows[3]["key_sum"]
    assert rows[4]["total"] < rows[3]["total"]


def test_ivf_opq_plan_stays_corpus_join_free(spark):
    """knn_ivf_opq's search pass must keep knn_ivf_pq's cost shape: one
    mapInPandas over the corpus (rotation happens in numpy inside it),
    never a corpus-side join on codes, queries, or cells."""
    from grapefruit_spark.operators.similarity import knn_ivf_opq
    from grapefruit_spark.plans import executed_plan

    plan = executed_plan(knn_ivf_opq(spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_dup_run_threshold_curve_consistency(spark, runs_dir):
    """The curve must agree with the planted runs: at T=50 exactly the
    two 60-token runs qualify (120 tokens — what dedup_runs_apply
    strips); at T=16 the 12-token boilerplate still does NOT qualify;
    T=100 strips nothing; and the curve is monotone in T."""
    from grapefruit_spark.operators.dedup import (
        ORACLE,
        dup_run_threshold_curve,
    )

    con = _duck_for(runs_dir, ["documents"])
    assert_matches_oracle(
        dup_run_threshold_curve(spark, runs_dir),
        con,
        ORACLE["dup_run_threshold_curve"],
    )
    got = {
        r["min_run_tokens"]: r
        for r in dup_run_threshold_curve(spark, runs_dir).collect()
    }
    assert set(got) == {16, 25, 50, 100}
    assert got[50]["n_runs"] == 2 and got[50]["tokens_stripped"] == 120
    assert got[16]["tokens_stripped"] == 120  # 12-token run < 16 either way
    assert got[100]["n_runs"] == 0 and got[100]["tokens_stripped"] == 0
    ts = [got[t]["tokens_stripped"] for t in (16, 25, 50, 100)]
    assert ts == sorted(ts, reverse=True)  # monotone non-increasing


def test_logit_score_is_sign_of_integer_logit(spark, nulltext_dir):
    """Scoring at the natural logistic operating point needs no exp:
    predicted must be exactly the sign test z_num >= 0, and the row must
    hash against its oracle on the NULL-text corpus."""
    from grapefruit_spark.operators.search import (
        ORACLE,
        quality_classifier_logit_score,
    )

    con = _duck_for(nulltext_dir, ["documents"])
    assert_matches_oracle(
        quality_classifier_logit_score(spark, nulltext_dir),
        con,
        ORACLE["quality_classifier_logit_score"],
    )
    for r in quality_classifier_logit_score(spark, SF_DIR).collect():
        assert r["predicted"] == int(r["z_num"] >= 0)
