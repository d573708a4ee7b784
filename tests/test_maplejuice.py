from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from grapefruit_spark.maplejuice import (
    MapleJuicePipeline,
    juice,
    juice_agg,
    maple,
    maple_expr,
)
from grapefruit_spark.operators import mapreduce_apps
from grapefruit_spark.sdfs import Sdfs

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(mapreduce_apps.ORACLE))
def test_app_matches_oracle(spark, duck, name):
    sdf = mapreduce_apps.QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, mapreduce_apps.ORACLE[name])


@pytest.mark.parametrize("shuffle", ["hash", "range"])
def test_maple_juice_generic(spark, shuffle):
    df = spark.createDataFrame(
        [("a b a",), ("b c",), ("a",)], ["text"]
    )

    def m(pdf: pd.DataFrame) -> pd.DataFrame:
        words = pdf["text"].str.split().explode()
        return pd.DataFrame({"key": words, "value": 1})

    def j(key, grp):
        return pd.DataFrame({"word": [key], "cnt": [int(grp["value"].sum())]})

    kv = maple(df, m, "key string, value int", num_maples=3)
    out = juice(kv, j, "word string, cnt bigint", shuffle=shuffle, num_juices=2)
    got = {r["word"]: r["cnt"] for r in out.collect()}
    assert got == {"a": 3, "b": 2, "c": 1}


def test_declarative_fast_path(spark):
    df = spark.range(100)
    kv = maple_expr(df, key=(F.col("id") % 3), value=F.col("id"))
    out = juice_agg(kv, F.sum("value").alias("total"))
    got = {r["key"]: r["total"] for r in out.collect()}
    assert got[0] == sum(i for i in range(100) if i % 3 == 0)
    # declarative path stays in codegen — no Python evaluation in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_pipeline_chaining(spark):
    df = spark.createDataFrame([("x y",), ("y",)], ["text"])

    def m(pdf):
        w = pdf["text"].str.split().explode()
        return pd.DataFrame({"key": w, "value": 1})

    def j(key, grp):
        return pd.DataFrame({"key": [key], "value": [int(grp["value"].sum())]})

    out = (
        MapleJuicePipeline(df)
        .maple(m, "key string, value int")
        .juice(j, "key string, value int")
        # second stage: filter keys seen ≥ 1 time, re-reduce (chaining)
        .juice(j, "key string, value int", shuffle="range")
        .done()
    )
    got = {r["key"]: r["value"] for r in out.collect()}
    assert got == {"x": 1, "y": 2}


def test_juice_rejects_bad_shuffle(spark):
    df = spark.createDataFrame([("a", 1)], ["key", "value"])
    with pytest.raises(ValueError, match="shuffle"):
        juice(df, lambda k, g: None, "key string", shuffle="zigzag")


def test_sdfs_roundtrip(spark, tmp_path):
    fs = Sdfs(spark, str(tmp_path / "wh"))
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    fs.put(df, "numbers")
    assert fs.exists("numbers")
    assert fs.store() == ["numbers"]
    assert len(fs.ls("numbers")) >= 1
    got = fs.get("numbers")
    assert got.count() == 10
    assert fs.global_()["numbers"] == len(fs.ls("numbers"))
    assert fs.delete("numbers") is True
    assert fs.store() == []
    with pytest.raises(FileNotFoundError):
        fs.get("numbers")
    with pytest.raises(ValueError):
        fs.put(df, "../escape")


def test_sdfs_partitioned_put(spark, tmp_path):
    fs = Sdfs(spark, str(tmp_path / "wh2"))
    df = spark.range(20).withColumn("bucket", (F.col("id") % 2).cast("int"))
    fs.put(df, "bucketed", partition_by=["bucket"])
    got = fs.get("bucketed").where(F.col("bucket") == 1)
    assert got.count() == 10


def test_pipe_wordcount_matches_declarative(spark, tmp_path):
    """The reference's arbitrary-executable contract end-to-end: a real
    mapper/reducer pair of external python programs, hadoop-streaming
    line protocol, hash-shuffled sorted reduce."""
    import sys

    from grapefruit_spark.catalog import table
    from grapefruit_spark.functions import ws_tokens
    from grapefruit_spark.maplejuice import juice_pipe, maple_pipe

    mapper = tmp_path / "wc_maple.py"
    mapper.write_text(
        "import sys\n"
        "for line in sys.stdin:\n"
        "    for w in line.split():\n"
        "        print(f'{w}\\t1')\n"
    )
    reducer = tmp_path / "wc_juice.py"
    reducer.write_text(
        "import sys\n"
        "cur, acc = None, 0\n"
        "def flush():\n"
        "    if cur is not None:\n"
        "        print(f'{cur}\\t{acc}')\n"
        "for line in sys.stdin:\n"
        "    k, v = line.rstrip('\\n').split('\\t', 1)\n"
        "    if k != cur:\n"
        "        flush(); cur, acc = k, 0\n"
        "    acc += int(v)\n"
        "flush()\n"
    )

    docs = table(spark, SF_DIR, "documents").select("text")
    kv = maple_pipe(docs, f"{sys.executable} {mapper}")
    out = juice_pipe(kv, f"{sys.executable} {reducer}", num_juices=4)
    got = {r["key"]: int(r["value"]) for r in out.collect()}

    want = {
        r["w"]: r["n"]
        for r in docs.select(F.explode(ws_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_sdfs_compact_small_files(spark, tmp_path):
    """Compaction heals a fragmented dataset: same rows, target file count."""
    from grapefruit_spark.catalog import table

    fs = Sdfs(spark, str(tmp_path / "wh"))
    docs = table(spark, SF_DIR, "documents")
    fs.put(docs.repartition(16), "frag")
    assert len(fs.ls("frag")) == 16
    n_files = fs.compact("frag", 2)
    assert n_files == 2
    got = fs.get("frag")
    assert got.count() == docs.count()
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_pipeline_delete_input_reclaims_intermediate(spark, tmp_path):
    """Materialized maple→juice chaining with delete_input=1: the juice
    output lands in the SDFS namespace BEFORE the consumed intermediate
    is deleted, and afterwards the intermediate is gone — the reference's
    `juice ... delete_input={0,1}` contract (JuiceJob.java:12)."""
    fs = Sdfs(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([("x y",), ("y",)], ["text"])

    def m(pdf):
        w = pdf["text"].str.split().explode()
        return pd.DataFrame({"key": w, "value": 1})

    def j(key, grp):
        return pd.DataFrame({"key": [key], "value": [int(grp["value"].sum())]})

    out = (
        MapleJuicePipeline(df, fs=fs)
        .maple(m, "key string, value int", dest_name="wc_inter")
        .juice(j, "key string, value int", dest_name="wc_out", delete_input=True)
        .done()
    )
    assert {r["key"]: r["value"] for r in out.collect()} == {"x": 1, "y": 2}
    assert not fs.exists("wc_inter"), "delete_input must reclaim the intermediate"
    assert fs.exists("wc_out")
    # lazy mode refuses the flag instead of silently ignoring it
    with pytest.raises(ValueError, match="delete_input"):
        MapleJuicePipeline(df).maple(m, "key string, value int").juice(
            j, "key string, value int", delete_input=True
        )


def test_juice_fn_delete_input(spark, tmp_path):
    """Same contract on the bare juice() entry point."""
    from grapefruit_spark.maplejuice import juice

    fs = Sdfs(spark, str(tmp_path / "wh2"))
    kv = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], ["key", "value"])
    fs.put(kv, "inter")

    def j(key, grp):
        return pd.DataFrame({"key": [key], "value": [int(grp["value"].sum())]})

    out = juice(
        fs.get("inter"), j, "key string, value bigint",
        fs=fs, src_name="inter", dest_name="dest", delete_input=True,
    )
    assert {r["key"]: r["value"] for r in out.collect()} == {"a": 3, "b": 3}
    assert not fs.exists("inter")


def test_sdfs_merge_upsert(spark, tmp_path):
    """MERGE semantics: updated keys replaced, new keys inserted,
    untouched keys preserved; merge into a missing dataset creates it."""
    fs = Sdfs(spark, str(tmp_path / "wh3"))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, tag string, v double"
    )
    fs.merge("t", base, ["k"])  # create-on-missing
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k long, tag string, v double"
    )
    fs.merge("t", updates, ["k"])
    got = {r["k"]: (r["tag"], r["v"]) for r in fs.get("t").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_sdfs_auto_compact_policy(spark, tmp_path):
    """Only fragmented datasets get rewritten; healthy ones untouched."""
    fs = Sdfs(spark, str(tmp_path / "wh4"))
    frag = spark.range(100).repartition(24)
    fs.put(frag, "fragmented")
    fs.put(spark.range(100).repartition(2), "healthy")
    before_healthy = fs.ls("healthy")
    done = fs.auto_compact(max_files=16, target_files=4)
    assert set(done) == {"fragmented"}
    assert done["fragmented"] <= 4
    assert fs.ls("healthy") == before_healthy
    assert fs.get("fragmented").count() == 100


def test_sdfs_merge_empty_updates_is_noop(spark, tmp_path):
    fs = Sdfs(spark, str(tmp_path / "wh5"))
    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    fs.put(base, "t")
    fs.merge("t", base.where("k < 0"), ["k"])  # empty update set
    assert {(r["k"], r["v"]) for r in fs.get("t").collect()} == {(1, 10.0)}
