from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grapefruit_spark.operators import pipeline

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(pipeline.ORACLE))
def test_matches_duckdb_oracle(spark, duck, name):
    assert_matches_oracle(pipeline.QUERIES[name](spark, SF_DIR), duck, pipeline.ORACLE[name])


def test_clean_corpus_filters_compose(spark):
    out = pipeline.clean_corpus(spark, SF_DIR)
    rows = out.collect()
    assert rows
    assert all(r["quality_e6"] >= pipeline.QUALITY_TAU * 1_000_000 for r in rows)
    assert all(r["pred_lang"] != "und" for r in rows)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) < n_docs  # it actually filtered something


def test_corpus_stats_consistency(spark):
    r = pipeline.corpus_stats(spark, SF_DIR).first()
    assert r["vocab_size"] <= r["total_tokens"]
    assert abs(r["avg_tokens_e4"] / 1e4 - r["total_tokens"] / r["n_docs"]) < 0.01


def test_clean_corpus_single_plan_no_python(spark):
    from grapefruit_spark.plans import assert_no_python_row_udf

    assert_no_python_row_udf(pipeline.clean_corpus(spark, SF_DIR))


def test_ingest_dedup_incremental_batches(spark, tmp_path):
    """Batch 1 with an internal duplicate admits one copy; batch 2
    containing batch-1 dups plus new docs admits only the new ones; the
    fingerprint table accumulates exactly the distinct set."""
    from pyspark.sql import functions as F

    from grapefruit_spark.operators.pipeline import ingest_dedup
    from grapefruit_spark.sdfs import Sdfs

    fs = Sdfs(spark, str(tmp_path / "wh"))
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")], schema
    )
    a1 = ingest_dedup(fs, "corpus_fps", b1)
    assert {r["doc_id"] for r in a1.collect()} == {1, 2}  # min-id wins in-batch

    b2 = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta"), (12, "epsilon zeta")], schema
    )
    a2 = ingest_dedup(fs, "corpus_fps", b2)
    assert {r["doc_id"] for r in a2.collect()} == {11}  # 10 seen, 12 in-batch dup

    fps = fs.get("corpus_fps")
    assert fps.count() == 3  # alpha-beta, gamma-delta, epsilon-zeta
    assert fps.select("fp").distinct().count() == 3


def test_ingest_neardup_incremental_batches(spark, tmp_path):
    """Near-dup incremental ingest: batch 1 admits one of a planted
    near-dup pair; batch 2's near-copy of a STORED doc is rejected while
    a genuinely new doc is admitted; state tables track admissions."""
    from grapefruit_spark.operators.pipeline import ingest_neardup
    from grapefruit_spark.sdfs import Sdfs

    fs = Sdfs(spark, str(tmp_path / "wh"))
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d0 = base.where("doc_id = 0").first()
    words = d0["text"].split()
    words[len(words) // 2] = "zzedited"
    near0 = " ".join(words)

    schema = "doc_id long, text string"
    b1 = spark.createDataFrame([(0, d0["text"]), (5000, near0)], schema)
    a1 = {r["doc_id"] for r in ingest_neardup(fs, "corp", b1).collect()}
    assert a1 == {0}, f"near-dup of in-batch lower id must be rejected: {a1}"

    words2 = d0["text"].split()
    words2[0] = "yyedited"
    near0_again = " ".join(words2)
    fresh = " ".join(f"fresh{i} token{i} unique{i}" for i in range(30))
    b2 = spark.createDataFrame([(6000, near0_again), (6001, fresh)], schema)
    a2 = {r["doc_id"] for r in ingest_neardup(fs, "corp", b2).collect()}
    assert a2 == {6001}, f"near-copy of STORED doc must be rejected: {a2}"

    assert {r["doc_id"] for r in fs.get("corp_sigs").collect()} == {0, 6001}


def test_ingest_corpus_full_gauntlet(spark, tmp_path):
    """Quality gate, PII redaction, exact dedup, and near-dup rejection
    compose: a short doc is gated, an email is masked in the admitted
    text, an exact dup and a near-dup of an earlier admission are both
    rejected; a second batch respects the durable state."""
    from grapefruit_spark.operators.pipeline import ingest_corpus
    from grapefruit_spark.sdfs import Sdfs

    fs = Sdfs(spark, str(tmp_path / "wh"))
    long_a = " ".join(f"alpha{i} beta{i}" for i in range(20))
    words = long_a.split(); words[3] = "zzedit"
    near_a = " ".join(words)
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [
            (1, long_a),
            (2, "too short"),                          # quality-gated
            (3, long_a),                               # exact dup of 1
            (4, near_a),                               # near dup of 1
            (5, "contact a@b.io now " + " ".join(f"w{i}" for i in range(20))),
        ],
        schema,
    )
    a1 = {r["doc_id"]: r["text"] for r in ingest_corpus(fs, "corp", b1).collect()}
    assert set(a1) == {1, 5}
    assert "<EMAIL>" in a1[5] and "a@b.io" not in a1[5]

    b2 = spark.createDataFrame([(10, long_a), (11, " ".join(f"q{i} r{i}" for i in range(25)))], schema)
    a2 = {r["doc_id"] for r in ingest_corpus(fs, "corp", b2).collect()}
    assert a2 == {11}  # 10 is an exact dup of stored doc 1


def test_ingest_corpus_from_stream(spark, tmp_path):
    """The same gauntlet driven by a document stream: each microbatch
    flows through ingest_corpus with shared durable state — the
    streaming front door of the curation pipeline."""
    import time

    from grapefruit_spark.operators.pipeline import ingest_corpus
    from grapefruit_spark.sdfs import Sdfs

    fs = Sdfs(spark, str(tmp_path / "wh"))
    src = tmp_path / "landing"
    src.mkdir()
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    long_a = " ".join(f"alpha{i} beta{i}" for i in range(20))

    def land(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    land([(1, long_a, "en", "s", 0)], "f1")
    time.sleep(1.1)
    land([(2, long_a, "en", "s", 0), (3, "fresh " + " ".join(f"x{i}" for i in range(20)), "en", "s", 0)], "f2")

    admitted: list = []

    def sink(batch_df, _epoch):
        out = ingest_corpus(fs, "scorp", batch_df.select("doc_id", "text"))
        admitted.extend(r["doc_id"] for r in out.collect())

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(admitted) == [1, 3]  # 2 is a cross-microbatch exact dup


def test_ingest_span_dedup_incremental_batches(spark, tmp_path):
    """Batch 1: a span shared by two docs is stripped from both; unique
    text survives. Batch 2: a doc repeating batch-1's boilerplate gets
    it stripped against the DURABLE state even though nothing in batch 2
    duplicates it; the span state accumulates batch 2's spans too."""
    from grapefruit_spark.operators.pipeline import ingest_span_dedup
    from grapefruit_spark.sdfs import Sdfs

    fs = Sdfs(spark, str(tmp_path / "wh"))
    boiler = " ".join(f"b{i}" for i in range(10))
    uniq1 = " ".join(f"u{i}" for i in range(6))
    uniq2 = " ".join(f"v{i}" for i in range(6))
    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, f"{boiler} {uniq1}"), (2, f"{uniq2} {boiler}")], schema
    )
    a1 = {r["doc_id"]: r for r in ingest_span_dedup(fs, "span_fps", b1).collect()}
    assert a1[1]["clean_text"] == uniq1 and a1[1]["n_removed"] == 10
    assert a1[2]["clean_text"] == uniq2 and a1[2]["n_removed"] == 10

    fresh = " ".join(f"w{i}" for i in range(9))
    b2 = spark.createDataFrame([(10, f"{fresh} {boiler}")], schema)
    a2 = {r["doc_id"]: r for r in ingest_span_dedup(fs, "span_fps", b2).collect()}
    assert a2[10]["clean_text"] == fresh, "stored boilerplate must be stripped"
    assert a2[10]["n_removed"] == 10

    # batch 2's fresh spans entered the state: a batch-3 repeat is stripped
    b3 = spark.createDataFrame([(20, f"{fresh} solo extra")], schema)
    a3 = {r["doc_id"]: r for r in ingest_span_dedup(fs, "span_fps", b3).collect()}
    assert a3[20]["n_removed"] == 9 and "w0" not in a3[20]["clean_text"]
