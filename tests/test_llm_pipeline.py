"""Tests for the LLM-data-pipeline blocks: text analysis, dedup,
similarity, multimodal. Sketch operators (minhash/simhash/LSH) are
validated with planted near-duplicates; oracle-backed ones against DuckDB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grapefruit_spark.operators import dedup, multimodal, similarity, text

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize(
    "mod,name",
    [(text, n) for n in sorted(text.ORACLE)]
    + [(dedup, n) for n in sorted(dedup.ORACLE)]
    + [(similarity, n) for n in sorted(similarity.ORACLE)],
)
def test_matches_duckdb_oracle(spark, duck, mod, name):
    assert_matches_oracle(mod.QUERIES[name](spark, SF_DIR), duck, mod.ORACLE[name])


# ---------------------------------------------------------------- planted dups
def _docs_with_dups(spark):
    """documents plus planted near-duplicates of docs 0-2 (one word edited)
    and an exact duplicate of doc 3."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.where(F.col("doc_id") < 4).collect()
    edited = []
    for i, r in enumerate(base[:3]):
        words = r["text"].split()
        words[len(words) // 2] = "zzedited"
        edited.append((10_000 + r["doc_id"], " ".join(words), r["lang"], r["source"], r["n_chars"]))
    exact = base[3]
    edited.append((10_003, exact["text"], exact["lang"], exact["source"], exact["n_chars"]))
    extra = spark.createDataFrame(edited, docs.schema)
    return docs.unionByName(extra)


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dupdata")
    _docs_with_dups(spark).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_dedup_exact_finds_planted(spark, dup_dir):
    groups = dedup.dedup_exact(spark, dup_dir).where(F.col("n_docs") > 1).collect()
    assert any(r["keep_doc_id"] == 3 and r["n_docs"] == 2 for r in groups)


def test_minhash_finds_planted_neardups(spark, dup_dir):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.dedup_minhash(spark, dup_dir).collect()}
    for orig in (0, 1, 2):
        assert (orig, 10_000 + orig) in pairs, f"missed near-dup of doc {orig}"
    assert (3, 10_003) in pairs  # exact dup → identical signatures


def test_simhash_finds_planted_neardups(spark, dup_dir):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup.dedup_simhash(spark, dup_dir).collect()}
    assert (3, 10_003) in pairs  # hamming 0
    hits = sum((o, 10_000 + o) in pairs for o in (0, 1, 2))
    assert hits >= 2  # one-word edit should rarely flip >3 of 56 bits


def test_minhash_est_tracks_true_jaccard(spark, dup_dir):
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.dedup_minhash(spark, dup_dir).collect()
    }
    true = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"] / 1e6
        for r in dedup.ngram_jaccard_pairs(spark, dup_dir).collect()
    }
    both = set(est) & set(true)
    assert both
    for k in both:
        assert abs(est[k] - true[k]) < 0.35  # 64 perms → sd ≈ 0.06, generous bound


# ---------------------------------------------------------------- similarity
def test_partitioned_topk_equals_bruteforce(spark):
    bf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.knn_bruteforce(spark, SF_DIR).collect()
    }
    part = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.knn_topk_partitioned(spark, SF_DIR).collect()
    }
    assert bf == part


def test_lsh_retrieves_planted_neighbor(spark, tmp_path):
    """A planted almost-identical vector must land in the same bucket and
    rank first for its query."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    first = emb.orderBy("vec_id").first()
    near = [float(x) + 0.001 for x in first["embedding"]]
    extra = spark.createDataFrame([(90_000, near, first["label"])], emb.schema)
    d = tmp_path / "emb"
    emb.unionByName(extra).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    out = similarity.knn_lsh(spark, str(d)).where(F.col("query_id") == first["vec_id"]).collect()
    top = min(out, key=lambda r: r["rank"])
    assert top["neighbor_id"] == 90_000 and top["cos_sim"] > 0.999


# ---------------------------------------------------------------- multimodal
def test_multimodal_pipeline_shape(spark):
    feats = multimodal.extract_features(multimodal.synthesize_media(spark, SF_DIR))
    rows = feats.limit(5).collect()
    assert rows
    for r in rows:
        assert r["kind"] in ("image", "audio", "video")
        assert len(r["feat"]) == 8 and all(0.0 <= x <= 1.0 for x in r["feat"])
        if r["kind"] == "audio":
            # real WAV decode: width=sample rate, height=channel count
            assert r["width"] == 8000 and r["height"] == 1
        else:
            assert r["width"] >= 16 and r["height"] >= 16
        assert r["checksum"] >= 0


def test_multimodal_decode_is_deterministic():
    a = multimodal.decode_stub(b"payload", "image")
    b = multimodal.decode_stub(b"payload", "image")
    assert a == b


def test_multimodal_real_decode_formats():
    """BMP and WAV decode are REAL (round-trip through our encoders);
    video remains an honest NotImplementedError."""
    d = multimodal.decode_real(multimodal.encode_bmp(20, 18, 7), "image")
    assert (d["width"], d["height"]) == (20, 18)
    assert len(d["feat"]) == 8 and all(0.0 <= x <= 1.0 for x in d["feat"])
    a = multimodal.decode_real(multimodal.encode_wav(500, 7), "audio")
    assert a["width"] == 8000 and a["height"] == 1
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"x", "video")
    with pytest.raises(ValueError):
        multimodal.decode_real(b"not a bmp", "image")


def test_multimodal_summary(spark):
    rows = multimodal.multimodal_features(spark, SF_DIR).collect()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}
    assert all(r["total_bytes"] > 0 for r in rows)


def test_multimodal_transform_dispatch(spark):
    """Per-kind dispatch inside one Arrow pass: images resize to the
    target box, videos sample N evenly spaced offsets, audio windows."""
    t = multimodal.transform_media(multimodal.synthesize_media(spark, SF_DIR))
    rows = t.collect()
    assert len(rows) == 500
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert set(by_kind) == {"image", "audio", "video"}
    for r in by_kind["image"]:
        assert r["op"] == "resize" and (r["out_w"], r["out_h"]) == (64, 64)
        assert r["out_bytes"] == 64 * 64 * 3
    for r in by_kind["video"]:
        assert r["op"] == "frame_sample" and r["n_frames"] == 4
        assert len(r["frame_offsets"]) == 4
        assert r["frame_offsets"] == sorted(r["frame_offsets"])
    for r in by_kind["audio"]:
        assert r["op"] == "audio_window" and r["n_frames"] >= 1


def test_multimodal_transform_summary(spark):
    out = {(r["kind"], r["op"]) for r in multimodal.multimodal_transform(spark, SF_DIR).collect()}
    assert out == {("image", "resize"), ("video", "frame_sample"), ("audio", "audio_window")}


def test_multimodal_arrow_path_equals_pandas_path(spark):
    """mapInArrow and mapInPandas extractors produce identical features."""
    media = multimodal.synthesize_media(spark, SF_DIR)

    def canon(df):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.collect()
        }

    a = canon(multimodal.extract_features_arrow(media))
    b = canon(multimodal.extract_features(media))
    assert a == b and len(a) == 500


def test_hot_shingle_df_cap_bounds_candidates(spark, tmp_path, monkeypatch):
    """A boilerplate shingle shared by every doc must NOT create O(n²)
    candidate pairs: with the df cap active, docs whose only overlap is
    the hot shingle produce zero pairs, while a genuine near-dup pair
    (sharing rare shingles) still surfaces."""
    import grapefruit_spark.operators.dedup as ddp

    n = 20
    rows = []
    for i in range(n):
        # every doc opens with the same boilerplate; remainder is unique
        uniq = " ".join(f"u{i}w{j}" for j in range(6))
        rows.append((i, f"common boiler plate header {uniq}", "en", "synth", 0))
    # one true near-dup pair sharing six rare words (ids 100/101)
    rows.append((100, "alpha beta gamma delta epsilon zeta", "en", "synth", 0))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta", "en", "synth", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = tmp_path / "hotshingle"
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))

    monkeypatch.setattr(ddp, "SHINGLE_DF_CAP", 5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in ddp.ngram_jaccard_pairs(spark, str(d)).collect()}
    assert (100, 101) in pairs, "rare-shingle near-dup must survive the cap"
    boiler_pairs = [p for p in pairs if p[0] < n and p[1] < n]
    assert not boiler_pairs, f"hot shingle leaked {len(boiler_pairs)} candidate pairs"


def test_hot_shingle_cap_parity_with_oracle_when_active(spark, tmp_path, monkeypatch):
    """The synthetic corpus never crosses SHINGLE_DF_CAP (max df 25 at
    sf0.1), so the driver gate exercises only the cap-inactive path.
    This pins Spark == DuckDB agreement when the cap IS active: planted
    hot shingle, cap patched to 5 on both sides."""
    import duckdb

    import grapefruit_spark.operators.dedup as ddp

    n = 12
    rows = []
    for i in range(n):
        uniq = " ".join(f"u{i}w{j}" for j in range(6))
        rows.append((i, f"common boiler plate header {uniq}", "en", "synth", 0))
    rows.append((100, "alpha beta gamma delta epsilon zeta", "en", "synth", 0))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta", "en", "synth", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "capparity"
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))

    monkeypatch.setattr(ddp, "SHINGLE_DF_CAP", 5)
    got = {
        (r["doc_a"], r["doc_b"], r["n_inter"], r["jaccard_ppm"])
        for r in ddp.ngram_jaccard_pairs(spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    sql = ddp.ORACLE["ngram_jaccard_pairs"].replace(
        f"gram_df <= {1000}", "gram_df <= 5"
    )
    assert "gram_df <= 5" in sql  # the patched clause actually landed
    want = {tuple(r) for r in con.sql(sql).fetchall()}
    assert got == want and got  # non-empty: the rare-shingle pair survives


def test_binaryfile_ingest_feeds_feature_extraction(spark, tmp_path):
    """The documented at-scale ingest path: spark.read.format('binaryFile')
    over an object-store-like directory feeds the same Arrow feature
    extractor as the synthesized media table."""
    import grapefruit_spark.operators.multimodal as mm

    media_dir = tmp_path / "blobs"
    media_dir.mkdir()
    payloads = {f"img_{i}.bin": bytes([i] * (100 + i)) for i in range(5)}
    for name, data in payloads.items():
        (media_dir / name).write_bytes(data)

    raw = spark.read.format("binaryFile").load(str(media_dir))
    media = raw.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("media"),
        F.lit("image").alias("kind"),
        F.length("content").cast("int").alias("n_bytes"),
    )
    feats = mm.extract_features(media).collect()
    assert len(feats) == 5
    import zlib

    want_crcs = {zlib.crc32(d) for d in payloads.values()}
    assert {r["checksum"] for r in feats} == want_crcs
    assert all(len(r["feat"]) == 8 for r in feats)


def test_dedup_spans_apply_removes_planted_span(spark, tmp_path):
    """A 10-token boilerplate block shared by two docs must vanish from
    both; unique text survives untouched; a doc with no duplicated span
    is the identity."""
    boiler = " ".join(f"b{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(6))
    uniq_b = " ".join(f"c{i}" for i in range(6))
    uniq_c = " ".join(f"d{i}" for i in range(12))
    rows = [
        (1, f"{boiler} {uniq_a}", "en", "t", 0),
        (2, f"{uniq_b} {boiler}", "en", "t", 0),
        (3, uniq_c, "en", "t", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "spansapply"
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))

    got = {r["doc_id"]: r for r in dedup.dedup_spans_apply(spark, str(d)).collect()}
    assert got[1]["clean_text"] == uniq_a
    assert got[1]["n_removed"] == 10
    assert got[2]["clean_text"] == uniq_b
    assert got[2]["n_removed"] == 10
    assert got[3]["clean_text"] == uniq_c
    assert got[3]["n_removed"] == 0
