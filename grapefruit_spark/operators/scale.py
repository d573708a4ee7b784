"""Scale-out primitives (SURVEY §6): skew salting and bucketed co-located
joins. These are engine utilities rather than queries — a 100 TB job
reaches for them when AQE alone isn't enough (extreme single-key skew,
repeated fact-fact joins on the same key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation under key skew.

    Phase 1 groups on (key, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers instead of one; phase 2 merges the partials
    on the real key (tiny input: buckets × distinct keys). Every agg in
    ``aggs`` must be re-aggregable by SUM after phase 1 (sum/count);
    compose avg as sum/count at the call site.

    The reference's range shuffle (JuiceJob.java:3) has the same failure
    mode — one hot key pins one juice task — and no counterpart to this.
    """
    salt = (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt_buckets).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[c.alias(f"_p_{name}") for name, c in aggs.items()])
    )
    return phase1.groupBy(key).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in aggs]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist a dataset bucketed (and optionally sorted) on its join key.

    Two tables bucketed the same way join with ZERO exchange — the
    pre-shuffle is paid once at write time and amortized over every later
    join. This is the Spark-native version of the reference's
    hash-partitioned intermediate files (MapleJuice.java:677), made
    durable and reusable.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables; plan tests assert no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
