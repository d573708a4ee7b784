"""Reference-workload baseline: the MapleJuice report's own benchmark
shape, measured on this engine.

The reference's published evaluation (report/CS425-MP3-report.pdf §2)
runs its two applications — WebGraph in-link counting and the chained
Condorcet winner — plus WordCount on ~100 MB inputs across 10 VMs,
reporting runtimes only as plot images (no machine-readable numbers;
the prose records the setup and that Hadoop was comparable on WebGraph
and slower on Condorcet). This script reproduces the WORKLOAD SCALE —
about 100 MB of raw text-equivalent input per application — on a single
local[*] node and prints one JSON line with the measured seconds, so
BASELINE.md can carry a concrete like-for-like anchor.

Usage: python tools/baseline_bench.py [work_dir]
The synthesized 100 MB-scale tables are cached under work_dir
(default /tmp/grapefruit_baseline_100mb) and reused across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from grapefruit_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
TEXT_TARGET_MB = 100


def _synthesize(spark, work_dir: str) -> dict:
    """Replicate the sf0.1 tables until their raw TEXT-equivalent volume
    matches the reference's ~100 MB inputs (documents.text bytes for
    WordCount; edge-line bytes for WebGraph/Condorcet)."""
    os.makedirs(work_dir, exist_ok=True)
    meta_path = os.path.join(work_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    text_bytes = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    doc_reps = max(1, (TEXT_TARGET_MB * 1024 * 1024) // int(text_bytes))
    (
        spark.range(doc_reps)
        .crossJoin(docs)
        .select(
            (F.col("doc_id") + F.col("id") * 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(f"{work_dir}/documents.parquet")
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    # a SNAP-style edge line is ~15 bytes; each lineitem row is one edge
    n_rows = li.count()
    li_reps = max(1, (TEXT_TARGET_MB * 1024 * 1024) // (15 * n_rows))
    (
        spark.range(li_reps)
        .crossJoin(li)
        .select(
            (F.col("l_orderkey") + F.col("id") * 10_000_000).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        )
        .write.mode("overwrite").parquet(f"{work_dir}/lineitem.parquet")
    )
    meta = {
        "doc_reps": int(doc_reps),
        "li_reps": int(li_reps),
        "text_mb": round(text_bytes * doc_reps / 1e6, 1),
        "edges": int(n_rows * li_reps),
        "edge_text_mb": round(15 * n_rows * li_reps / 1e6, 1),
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def main() -> None:
    work_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/grapefruit_baseline_100mb"
    spark = get_spark("grapefruit-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    meta = _synthesize(spark, work_dir)

    from grapefruit_spark.operators.mapreduce_apps import (
        condorcet_pairs,
        condorcet_winner,
        mj_wordcount,
        webgraph_inlinks,
    )

    def declarative_wordcount(s, d):
        # the Spark-native formulation, for contrast with mj_wordcount's
        # deliberately-generic maple (Arrow batch) contract
        return (
            s.read.parquet(f"{d}/documents.parquet")
            .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w")
            .count()
        )

    apps = {
        "wordcount_100mb_text_maple_contract": mj_wordcount,
        "wordcount_100mb_text_declarative": declarative_wordcount,
        "webgraph_inlinks_100mb_edges": webgraph_inlinks,
        "condorcet_chained_100mb_edges": lambda s, d: condorcet_winner(s, d),
        "condorcet_stage1_100mb_edges": condorcet_pairs,
    }
    timings = {}
    for name, fn in apps.items():
        fn(spark, work_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, work_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    print(json.dumps({"workload": meta, "seconds": timings, "node": "local[*] single node"}))


if __name__ == "__main__":
    main()
