"""Relational / analytics operators (SURVEY §2 block B).

TPC-H-shaped queries adapted to the driver testdata schema. Each function
takes (spark, sf_dir) and returns a lazy DataFrame; ORACLE holds the
DuckDB-equivalent SQL keyed by the same name. Conventions for hash-stable
comparison with the oracle:

- every computed column aliased identically on both sides
- double aggregates rounded (2 dp money, 4+ dp ratios) on both sides
- timestamps emitted as 'yyyy-MM-dd' strings
- LIMIT queries ordered by a key-unique tiebreak

Scale notes: only the FIXED-SIZE dimensions (region = 5 rows, nation =
25 rows) carry explicit broadcast() hints. customer/part/supplier SCALE
WITH SF (~150k/200k/10k rows per SF unit → 10⁹–10¹⁰ rows at the 100 TB
design point), so their join strategy is left to AQE: it still picks a
broadcast from runtime size stats at small scale, and degrades to a
shuffle join when the side outgrows the threshold — a forced hint would
be an executor OOM instead (r10; both directions pinned by plan tests,
tests/test_plans.py). Fact-fact joins (orders⋈lineitem) shuffle on the
join key and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import spread, table
from ..functions import dec_avg, dec_sum

ORACLE: dict[str, str] = {}


def _fmt_date(col):
    return F.date_format(col, "yyyy-MM-dd")


# ------------------------------------------------------------------ B1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    Pure map-side-partial agg over the biggest fact table — at 100 TB this
    is a single scan + 6-group shuffle; Catalyst emits a partial
    HashAggregate before the exchange so the shuffle carries 6 rows/task.
    """
    # r14: fan the single-row-group local scan out (catalog.spread) —
    # the decimal aggregation partials otherwise run in ONE task; all
    # emissions are DECIMAL/int folds, so partitioning can't move a value
    li = spread(table(spark, sf_dir, "lineitem"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc).alias("sum_disc_price"),
            dec_sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            dec_avg("l_quantity", 4).alias("avg_qty"),
            dec_avg("l_extendedprice", 4).alias("avg_price"),
            dec_avg("l_discount", 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum((l_quantity)::DECIMAL(38,6)), 2)::DOUBLE               AS sum_qty,
       round(sum((l_extendedprice)::DECIMAL(38,6)), 2)::DOUBLE          AS sum_base_price,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS sum_disc_price,
       round(sum((l_extendedprice * (1 - l_discount) * (1 + l_tax))::DECIMAL(38,6)), 2)::DOUBLE AS sum_charge,
       round(sum((l_quantity)::DECIMAL(38,6))::DOUBLE / count(l_quantity), 4)     AS avg_qty,
       round(sum((l_extendedprice)::DECIMAL(38,6))::DOUBLE / count(l_extendedprice), 4) AS avg_price,
       round(sum((l_discount)::DECIMAL(38,6))::DOUBLE / count(l_discount), 6)     AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ B2
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (adapted: o_orderpriority in place of shippriority).

    customer scales with SF, so its join is UNHINTED — AQE broadcasts it
    at small scale from size stats and shuffle-joins at 100 TB (r10).
    orders⋈lineitem shuffles on orderkey. Top-10 via orderBy+limit (Spark
    runs TakeOrdered, no global sort materialization).
    """
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1997-01-01")
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            _fmt_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE["q3_shipping_priority"] = """
SELECT o_orderkey,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ------------------------------------------------------------------ B3
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local supplier volume (6-way join, region filter).

    region/nation (fixed-size) broadcast by hint; customer and supplier
    scale with SF so their joins are UNHINTED (r10) — AQE broadcasts them
    at small scale, shuffle-joins at 100 TB. Catalyst pushes r_name='ASIA'
    through the join chain to the region scan.
    """
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


ORACLE["q5_local_supplier"] = """
SELECT n_name,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ------------------------------------------------------------------ B4
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective scan + single agg — pushdown showcase.

    All three predicates reach the parquet reader (PushedFilters), and
    only 4 of 11 columns are read (ReadSchema) — verified in plan tests.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


ORACLE["q6_forecast_revenue"] = """
SELECT round(sum((l_extendedprice * l_discount)::DECIMAL(38,6)), 2)::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ------------------------------------------------------------------ B5
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking, top 20.

    customer is unhinted (scales with SF, r10); nation keeps its hint.
    """
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE["q10_returned_items"] = """
SELECT c_custkey, c_name,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS revenue,
       round(c_acctbal, 2)                               AS c_acctbal,
       n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ------------------------------------------------------------------ B6
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: orders-per-customer distribution (left outer + 2 groupBys)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        ~F.col("o_orderpriority").startswith("4")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE["q13_customer_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


# ------------------------------------------------------------------ B7
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (adapted: promo class = p_type 'ECONOMY'). Conditional agg
    over an UNHINTED join with part (part scales with SF, r10) — AQE
    broadcasts it at small scale, shuffle-joins at 100 TB."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "ECONOMY", rev)
                .otherwise(0.0)
                .cast("decimal(18,6)")
            ).alias("pdec"),
            F.sum(rev.cast("decimal(18,6)")).alias("tdec"),
        )
        # 100·a/b to 4 dp ≡ the ratio in ppm — computed as exact integer
        # micro-unit division (the decimal sums are exact, so scaling by
        # 10⁶ yields integers and bigint div is engine-independent)
        .select(
            F.expr(
                "(CAST(pdec * 1000000 AS DECIMAL(38,0)) * 1000000L)"
                " div CAST(tdec * 1000000 AS DECIMAL(38,0))"
            ).alias("promo_pct_e4")
        )
    )


ORACLE["q14_promo_effect"] = """
SELECT CAST((CAST(sum((CASE WHEN p_type = 'ECONOMY'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)::DECIMAL(18,6))
             * 1000000 AS HUGEINT) * 1000000)
       // CAST(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)) * 1000000 AS HUGEINT)
       AS BIGINT) AS promo_pct_e4
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# ------------------------------------------------------------------ B8
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers (HAVING groupBy feeding a join).

    The qty-per-order agg runs first (one shuffle on orderkey), its tiny
    result joins back — AQE converts that join to broadcast at runtime.
    customer is unhinted too (scales with SF, r10).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _fmt_date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE["q18_large_volume"] = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2)            AS o_totalprice,
       sum_qty
FROM (
    SELECT l_orderkey, round(sum((l_quantity)::DECIMAL(38,6)), 2)::DOUBLE AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING round(sum((l_quantity)::DECIMAL(38,6)), 2)::DOUBLE > 150
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ------------------------------------------------------------------ B9
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: EXISTS lineitem shipped after order date).

    left_semi join — only the orderkey column of lineitem crosses the
    shuffle, no row multiplication.
    """
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = table(spark, sf_dir, "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).where(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey").distinct()
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE["q4_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# ------------------------------------------------------------------ B10
def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per customer (window rank).

    Single shuffle on the partition key; rank prunes before any join.
    """
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
    )


ORACLE["top_n_per_group"] = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
)
WHERE rn <= 3
"""


# ------------------------------------------------------------------ B11
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate over order priority × status (grouping-sets family).

    Null grouping levels coalesced to 'ALL' so the oracle hash agrees.
    """
    orders = table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            dec_sum("o_totalprice").alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            "total_sales",
            "n_orders",
        )
    )


ORACLE["rollup_sales"] = """
SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
       round(sum((o_totalprice)::DECIMAL(38,6)), 2)::DOUBLE AS total_sales,
       count(*)                         AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# ------------------------------------------------------------------ B12
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per market segment (expand-based distinct agg)."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


ORACLE["distinct_agg"] = """
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*)                    AS n_customers
FROM customer
GROUP BY c_mktsegment
"""


def distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx distinct (rows-only check — sketch values are engine-specific).

    The scale path for B12: no expand, mergeable sketches, 2% rsd.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


KMV_K = 256  # rsd ≈ 1/√(K−2) ≈ 6%


def distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch per order priority — the
    ORACLE-CHECKABLE approximate-distinct path (Bar-Yossef et al. 2002):
    keep the K smallest 52-bit portable hashes of the distinct keys;
    estimate = (K−1)·2⁵² div h_K, exact count when the group holds fewer
    than K distinct keys. Unlike HLL (distinct_approx — engine-internal
    sketch bytes), every intermediate here is deterministic integer math
    on md5-derived hashes, so DuckDB replays it value-for-value. The
    exact distinct count rides along, putting the sketch error on
    display in the result itself. 52-bit hashes keep (K−1)·2⁵² inside
    int64. Mergeable at scale: min-k sets union/truncate associatively
    (the window top-k here would become a partial-aggregate top-k)."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    per = orders.select("o_orderpriority", h.alias("h")).distinct()
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    kmin = per.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= KMV_K)
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    est = F.when(
        F.col("m") < KMV_K, F.col("m")
    ).otherwise(F.expr(f"({KMV_K - 1} * {1 << 52}L) div hk"))
    return (
        kmin.groupBy("o_orderpriority")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("m"))
        .select("o_orderpriority", est.alias("kmv_distinct"))
        .join(exact, "o_orderpriority")
    )


ORACLE["distinct_kmv"] = f"""
WITH per AS (
    SELECT DISTINCT o_orderpriority,
           ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 13))::BIGINT AS h
    FROM orders
),
kmin AS (
    SELECT o_orderpriority, h FROM (
        SELECT o_orderpriority, h,
               row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
        FROM per
    ) WHERE rn <= {KMV_K}
),
agg AS (
    SELECT o_orderpriority, max(h) AS hk, count(*) AS m
    FROM kmin GROUP BY o_orderpriority
)
SELECT a.o_orderpriority,
       CAST(CASE WHEN a.m < {KMV_K} THEN a.m
                 ELSE ({KMV_K - 1} * {1 << 52}) // a.hk END AS BIGINT) AS kmv_distinct,
       e.exact_distinct
FROM agg a JOIN (
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_distinct
    FROM orders GROUP BY 1
) e USING (o_orderpriority)
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_volume": q18_large_volume,
    "q4_order_priority": q4_order_priority,
    "top_n_per_group": top_n_per_group,
    "rollup_sales": rollup_sales,
    "distinct_agg": distinct_agg,
    "distinct_approx": distinct_approx,
    "distinct_kmv": distinct_kmv,
}
