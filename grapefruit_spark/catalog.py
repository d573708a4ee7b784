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


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to session-zoned TIMESTAMP regardless
    of how the parquet writer encoded it. The testdata generator has shipped
    the same logical instants as TIMESTAMP(NANOS) (read as bigint under
    nanosAsLong), plain timestamp[us] (read as TIMESTAMP_NTZ), and zoned
    TIMESTAMP across rounds — every downstream epoch computation goes
    through this one choke point so a disk-format change degrades to a
    value-level test failure, never an AnalysisException.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # nanosAsLong read: truncate ns→us exactly like DuckDB's
        # TIMESTAMP_NS→TIMESTAMP cast
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        # session tz is pinned UTC, so this cast is a wall-clock identity
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table lazily. Never caches — each query plans its own scan
    so column pruning reflects that query's projection."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    if name == "events":
        # ts encoding has changed across testdata generations. Set the
        # legacy-nanos read conf HERE, not just in our session factory —
        # the driver hands queries() its own SparkSession, which must not
        # need pre-arranged confs to work.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # immutable on this build; normalize_ts adapts by dtype
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return normalize_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame) -> DataFrame:
    """Fan a scan out to every core WITHOUT ever shuffling a corpus that
    is already well-partitioned (r14 optimization; generalized from
    dedup._spread, r9). The testdata tables are single-row-group parquet
    files, so their scan — and every per-row map fused into it (decimal
    aggregation partials, regex masking, tokenization, pipe mappers) —
    runs in ONE task locally no matter what maxPartitionBytes says (a
    row group is indivisible). At cluster scale the input arrives in
    thousands of scan partitions and this is a no-op; an unconditional
    repartition here would shuffle raw rows — the most expensive
    possible shuffle at 100 TB. Only order-free queries may use it:
    every consumer's emissions are exact-integer / DECIMAL folds or
    per-row maps, so partitioning cannot change a value (most consumers
    additionally carry the r10 NO_BCAST re-proof, which already
    hash-proved them under a different physical layout)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
