"""Table catalog over the driver-generated parquet testdata.

Plays the role of the reference's SDFS namespace (``ls``/``global`` in
/root/reference/src/main/java/edu/cs425/mp3/SdfsServer.java): a flat
name → file mapping. Here each name resolves to a parquet scan so Catalyst
gets pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table lazily. Never caches — each query plans its own scan
    so column pruning reflects that query's projection."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk. Set the read conf HERE, not just
        # in our session factory — the driver hands queries() its own
        # SparkSession, which must not need pre-arranged confs to work.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # immutable on this build; the dtype check below adapts
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            # truncate ns→us exactly like DuckDB's TIMESTAMP_NS→TIMESTAMP cast
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
