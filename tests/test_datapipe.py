from __future__ import annotations

import pytest

from grapefruit_spark.operators import datapipe

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_QUERIES = sorted(datapipe.ORACLE)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_oracle(spark, duck, name):
    sdf = datapipe.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, datapipe.ORACLE[name])


def test_redaction_masks_planted_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk or 555-123-4567 today"),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.org and 111.222.3333"),
            # r14 classes (VERDICT_r13 #5)
            (4, "ssn 123-45-6789 ip 192.168.0.1 rest stays"),
            (5, "v6 2001:0db8:85a3:0000:0000:8a2e:0370:7334 here"),
            (6, "card 4539 1488 0343 6467 is valid"),  # Luhn-valid
            (7, "card 4539 1488 0343 6468 is fake"),  # fails Luhn → kept
            (8, "plain 4111111111111111 run"),  # 16-digit Luhn-valid
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in datapipe.redact_text(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert rows[1]["clean_text"] == "contact <EMAIL> or <PHONE> today"
    assert rows[2]["clean_text"] == "no pii here"
    assert rows[3]["n_email"] == 2 and rows[3]["n_phone"] == 1
    assert "<EMAIL> <EMAIL>" in rows[3]["clean_text"]
    assert rows[4]["n_ssn"] == 1 and rows[4]["n_ipv4"] == 1
    assert rows[4]["clean_text"] == "ssn <SSN> ip <IPV4> rest stays"
    assert rows[5]["n_ipv6"] == 1
    assert rows[5]["clean_text"] == "v6 <IPV6> here"
    assert rows[6]["n_cc_like"] == 1 and rows[6]["n_cc"] == 1
    assert rows[6]["clean_text"] == "card <CC> is valid"
    # the Luhn gate: a card-SHAPED but checksum-invalid number must
    # flow through unmasked (and count only as a candidate)
    assert rows[7]["n_cc_like"] == 1 and rows[7]["n_cc"] == 0
    assert rows[7]["clean_text"] == "card 4539 1488 0343 6468 is fake"
    assert rows[8]["n_cc"] == 1
    assert rows[8]["clean_text"] == "plain <CC> run"


def test_split_deterministic_and_disjoint(spark):
    a = {r["split"]: r["n_docs"] for r in datapipe.split_train_val(spark, SF_DIR).collect()}
    b = {r["split"]: r["n_docs"] for r in datapipe.split_train_val(spark, SF_DIR).collect()}
    assert a == b
    assert sum(a.values()) == 500  # sf0.001 documents
    assert a["train"] > a["val"] and a["train"] > a["test"]


def test_split_leakage_safe_invariant(spark):
    """The whole point of the operator: no near-dup pair may straddle a
    split boundary. Recompute per-doc splits and check every
    ngram_jaccard_pairs edge lands with both ends on the same side."""
    from pyspark.sql import functions as F

    from grapefruit_spark.operators.dedup import ngram_jaccard_pairs
    from grapefruit_spark.operators.graph import jaccard_clusters

    docs = datapipe.table(spark, SF_DIR, "documents")
    clusters = jaccard_clusters(spark, SF_DIR)
    keyed = docs.join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce("keep_doc_id", F.col("doc_id")).alias("k")
    )
    b = datapipe._bucket(F.col("k"))
    side = (
        F.when(b < int(0.90 * datapipe._U32), "train")
        .when(b < int(0.95 * datapipe._U32), "val")
        .otherwise("test")
    )
    split_of = {r["doc_id"]: r["s"] for r in keyed.select("doc_id", side.alias("s")).collect()}
    pairs = ngram_jaccard_pairs(spark, SF_DIR).select("doc_a", "doc_b").collect()
    assert len(pairs) > 0, "need non-trivial pairs for the invariant to bite"
    leaks = [
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if split_of[r["doc_a"]] != split_of[r["doc_b"]]
    ]
    assert not leaks, f"near-dup pairs straddle the split: {leaks[:5]}"
    # and the aggregate the driver sees is consistent with the raw split
    agg = {r["split"]: r["n_docs"] for r in datapipe.split_leakage_safe(spark, SF_DIR).collect()}
    from collections import Counter

    assert agg == dict(Counter(split_of.values()))


def test_write_shards_roundtrip(spark, tmp_path):
    out = str(tmp_path / "shards")
    datapipe.write_shards(spark, SF_DIR, out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == 500
    shards = sorted(r["shard"] for r in back.select("shard").distinct().collect())
    assert shards == [0, 1, 2, 3]
    # partition pruning: reading one shard touches one directory
    one = spark.read.parquet(out).where("shard = 2")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_split_no_shuffle_before_agg(spark):
    """The split assignment itself is a narrow map: the only exchange in
    the plan is the final 3-row aggregate's."""
    plan = (
        datapipe.split_train_val(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # partial agg -> single exchange (+AQE read)


def test_sample_k_per_group_budget_and_determinism(spark):
    df = datapipe.sample_k_per_group(spark, SF_DIR)
    rows = df.collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert all(n <= 50 for n in per_lang.values())
    # rerun returns the identical membership (no rand() anywhere)
    again = {(r["doc_id"], r["lang"], r["rk"]) for r in df.collect()}
    assert again == {(r["doc_id"], r["lang"], r["rk"]) for r in rows}
