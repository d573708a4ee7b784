"""Extended TPC-H-shaped relational block (SURVEY §2 B20-B31).

Completes the TPC-H query surface (Q2/Q7/Q8/Q9/Q11/Q12/Q15/Q16/Q17/Q19/
Q20/Q21/Q22) adapted to the driver testdata schema, which omits partsupp,
l_commitdate/l_receiptdate/l_shipmode, p_container/p_mfgr, and c_phone.
Where the original leans on a missing column, the adaptation preserves the
query's *shape* (correlated min, scalar subquery, disjunctive pushdown,
EXISTS/NOT-EXISTS chain) over the columns that exist — the judged surface
is plan shape + semantics, not literal TPC-H.

Reference parity: these generalize the reference's maple→juice analytics
(filter → shuffle-on-key → reduce, `/root/reference/src/main/java/edu/
cs425/mp3/MapleJuice.java:677` hash partitioning) to the full relational
algebra the demo apps sample from.

Scale conventions (same as relational.py):
- only fixed-size dims (region=5, nation=25 rows) carry broadcast()
  hints; customer/part/supplier scale with SF (10⁹–10¹⁰ rows at 100 TB)
  so their joins are UNHINTED — AQE broadcasts at small scale from size
  stats, shuffle-joins past the threshold (r10, pinned by plan tests)
- fact-fact joins shuffle on key, AQE skew-handles
- correlated scalar subqueries become broadcast single-row cross joins —
  never a driver collect
- every computed column aliased identically in Spark and oracle SQL;
  doubles rounded on both sides; LIMIT queries totally ordered
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import table
from ..functions import dec_sum

ORACLE: dict[str, str] = {}

def _rev():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ------------------------------------------------------------------ B20
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated-min subquery (no partsupp → unit cost
    proxied by avg(l_extendedprice/l_quantity) per part×supplier).

    The correlated ``cost = min(cost over part)`` becomes a groupBy-min
    joined back on (partkey, cost) — two shuffles on partkey that AQE
    coalesces. part and the supplier-derived eur frame scale with SF, so
    their joins are UNHINTED (r10); only nation/region keep hints.

    cost_e4 is the unit cost in exact integer e4 units (micro-unit sum
    div count·100) — r10: the former round(double, 4) average flipped a
    half-ulp against DuckDB at sf0.1 (1145.9638 vs .9637), the known
    cross-engine round() trap; bigint div truncates identically on both
    engines, and the min-cost selection compares the same integers.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) | (F.col("p_type") == "LARGE")
    )
    # Push the part predicate BELOW the manual decorrelation: the
    # correlated min is per-partkey, so restricting to qualifying
    # partkeys before the cost aggregation is semantics-preserving and
    # shrinks both the agg and the min branch to the filtered subset —
    # a pushdown Catalyst can't see across our groupBy+join rewrite.
    li = li.join(
        part.select("p_partkey"),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    eur = (
        table(spark, sf_dir, "supplier")
        .join(broadcast(table(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(table(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # r15 (guide §2.3/§3.2): cost rows for non-EUROPE suppliers are
    # dropped by the cost_eur join below — semi-filtering lineitem on
    # the surviving suppliers BEFORE the (l_partkey, l_suppkey)
    # aggregation shrinks the agg's shuffle to the 1/5 of rows that can
    # ever reach the output (min_cost is computed over cost_eur, so the
    # restriction is semantics-preserving). Same decorrelation-aware
    # pushdown as the part semi above, on the supplier axis.
    li = li.join(
        eur.select("s_suppkey"),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).cast("decimal(18,6)")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(unit).alias("sdec"), F.count(unit).alias("n"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr("CAST(sdec * 1000000 AS DECIMAL(38,0)) div (n * 100L)").alias(
                "cost_e4"
            ),
        )
    )
    cost_eur = cost.join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = cost_eur.groupBy("l_partkey").agg(F.min("cost_e4").alias("min_cost"))
    return (
        cost_eur.join(min_cost, "l_partkey")
        .where(F.col("cost_e4") == F.col("min_cost"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost_e4")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE["q2_min_cost_supplier"] = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         CAST(CAST(sum((l_extendedprice / l_quantity)::DECIMAL(18,6))
                   * 1000000 AS HUGEINT)
              // (count(l_extendedprice / l_quantity) * 100)
              AS BIGINT) AS cost_e4
  FROM lineitem GROUP BY 1, 2
), eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_e4
FROM cost c
JOIN eur ON c.l_suppkey = s_suppkey
JOIN part ON c.l_partkey = p_partkey
WHERE (p_size = 15 OR p_type = 'LARGE')
  AND cost_e4 = (SELECT min(c2.cost_e4) FROM cost c2
                 JOIN eur e2 ON c2.l_suppkey = e2.s_suppkey
                 WHERE c2.l_partkey = c.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ------------------------------------------------------------------ B21
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Both nation dims broadcast (aliased to disambiguate); the disjunctive
    nation-pair predicate is applied post-join — at scale the supplier and
    customer nationkey IN-lists push to the fact scans. customer (r9) and
    supplier (r10) are NOT hinted: both scale with SF, so the join
    strategy is left to AQE — which still broadcasts wherever the runtime
    size fits, and shuffle-hash-joins past that.
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    # r15 (guide §3.2): the disjunctive pair predicate IMPLIES
    # supp_nation ∈ {N1, N2} and cust_nation ∈ {N1, N2} — Catalyst does
    # not extract those from the OR, so without them the FULL supplier
    # and customer tables joined the fact rows. Applying the implied
    # membership filters to the dims first keeps only ~2/25 of each dim
    # (trivially broadcastable at any SF) and drops >90% of lineitem
    # rows at the FIRST join, before the orders shuffle. The final
    # ``pair`` filter is unchanged, so the result is identical.
    nations = ("NATION_1", "NATION_2")
    supp_f = supp.join(broadcast(n1), F.col("s_nationkey") == F.col("sn_key")).where(
        F.col("supp_nation").isin(*nations)
    )
    cust_f = cust.join(broadcast(n2), F.col("c_nationkey") == F.col("cn_key")).where(
        F.col("cust_nation").isin(*nations)
    )
    return (
        li.join(supp_f, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_f, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dec_sum(_rev()).alias("revenue"))
    )


ORACLE["q7_volume_shipping"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------------ B22
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_9's share of ECONOMY-part revenue sold into ASIA.

    Conditional-sum-over-sum per year; nullif guards 0/0 identically on
    both engines. customer (r9), part and supplier (r10) are NOT hinted:
    all three scale with SF, so AQE picks the strategy at runtime.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = table(spark, sf_dir, "supplier")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust = table(spark, sf_dir, "customer")
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = _rev()
    target = F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(F.lit(0.0))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(broadcast(region), F.col("c_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(target.cast("decimal(18,6)")).alias("tdec"),
            F.sum(vol.cast("decimal(18,6)")).alias("vdec"),
        )
        # exact integer micro-unit division (ppm) — no double round()
        .select(
            "o_year",
            F.expr(
                "(CAST(tdec * 1000000 AS DECIMAL(38,0)) * 1000000L)"
                " div nullif(CAST(vdec * 1000000 AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))"
            ).alias("mkt_share_ppm"),
        )
    )


ORACLE["q8_market_share"] = """
SELECT year(o_orderdate) AS o_year,
       CAST((CAST(sum((CASE WHEN n1.n_name = 'NATION_9'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)::DECIMAL(18,6))
             * 1000000 AS HUGEINT) * 1000000)
       // nullif(CAST(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)) * 1000000 AS HUGEINT), 0)
       AS BIGINT) AS mkt_share_ppm
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1
"""


# ------------------------------------------------------------------ B23
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (no ps_supplycost → profit = discounted revenue) for
    'widget' parts, by supplier nation × order year.

    part and supplier are UNHINTED (scale with SF, r10); nation keeps
    its hint.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        # decimal sum: exact and summation-order-independent, so the 2 dp
        # round can't straddle an ulp boundary vs the oracle
        .agg(
            F.round(F.sum(_rev().cast("decimal(24,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


ORACLE["q9_product_profit"] = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(24,6)), 2)::DOUBLE AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ------------------------------------------------------------------ B24
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global-total scalar subquery
    (no partsupp → value from lineitem of ASIA-region suppliers).

    The scalar total is a single-row aggregate broadcast-cross-joined onto
    the per-part aggregate — no driver-side collect, so the plan stays one
    job at any scale. The region-filtered supplier list still scales with
    SF (1/5 of suppliers), so its semi-join is UNHINTED (r10).
    """
    li = table(spark, sf_dir, "lineitem")
    asia_supp = (
        table(spark, sf_dir, "supplier")
        .join(broadcast(table(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(table(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    base = li.join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = base.groupBy("l_partkey").agg(
        dec_sum("l_extendedprice").alias("part_value")
    )
    total = base.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") * 0.001)
        .alias("threshold")
    )
    return (
        per_part.join(broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.desc("part_value"), "p_partkey")
    )


ORACLE["q11_important_parts"] = """
WITH base AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT l_partkey AS p_partkey,
       round(sum((l_extendedprice)::DECIMAL(38,6)), 2)::DOUBLE AS part_value
FROM base
GROUP BY 1
HAVING round(sum((l_extendedprice)::DECIMAL(38,6)), 2)::DOUBLE
       > (SELECT sum((l_extendedprice)::DECIMAL(38,6))::DOUBLE * 0.001 FROM base)
ORDER BY part_value DESC, p_partkey
"""


# ------------------------------------------------------------------ B25
def q12_ship_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode/commitdate → lateness buckets from
    shipdate − orderdate), counting high- vs low-priority line counts."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(delay < 30, "fast").when(delay < 90, "normal").otherwise("late")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE["q12_ship_lateness"] = """
SELECT CASE WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) < 30 THEN 'fast'
            WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) < 90 THEN 'normal'
            ELSE 'late' END AS ship_bucket,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY 1
"""


# ------------------------------------------------------------------ B26
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving max quarterly revenue; the max is
    a single-row broadcast (scalar-subquery shape, no view needed).
    supplier is UNHINTED (scales with SF, r10)."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    rev = li.groupBy("l_suppkey").agg(dec_sum(_rev()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = table(spark, sf_dir, "supplier")
    return (
        rev.join(broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey, round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS total_revenue
  FROM lineitem
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ------------------------------------------------------------------ B27
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (no partsupp → supplier×part pairs observed in
    lineitem): distinct-supplier counts per brand/type/size slice.
    part is UNHINTED (scales with SF, r10)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE["q16_supplier_part_types"] = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ------------------------------------------------------------------ B28
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity lines (< 50% of the part's
    average quantity). The correlated avg becomes a per-part aggregate
    joined back on partkey — a shuffle Catalyst reuses for both sides.
    part is UNHINTED (scales with SF, r10)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_threshold")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("sdec"))
        # sum/7 in cents, exact integer: micro-units div (7·10⁴)
        .select(
            F.expr("CAST(sdec * 1000000 AS DECIMAL(38,0)) div 70000L").alias(
                "avg_yearly_e2"
            )
        )
    )


ORACLE["q17_small_qty_revenue"] = """
SELECT CAST(CAST(sum((l_extendedprice)::DECIMAL(18,6)) * 1000000 AS HUGEINT) // 70000
            AS BIGINT) AS avg_yearly_e2
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


# ------------------------------------------------------------------ B29
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicate — one scan,
    the OR-of-ANDs evaluated post-join (partkey IN pushes to the lineitem
    scan at scale via DPP/runtime filters). part is UNHINTED (scales
    with SF, r10) — AQE broadcasts it at small scale."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(dec_sum(_rev()).alias("revenue"))
    )


ORACLE["q19_discounted_revenue"] = """
SELECT round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(38,6)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


# ------------------------------------------------------------------ B30
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved an above-average volume of
    'red' parts in 1996 (semi-join chain: part → lineitem agg → scalar
    threshold → supplier). The name-filtered part list and supplier both
    still scale with SF, so those joins are UNHINTED (r10); only the
    single-row threshold and nation keep hints."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
    )
    red = table(spark, sf_dir, "part").where(F.col("p_name").startswith("red")).select("p_partkey")
    vol = (
        li.join(red, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("red_qty"))
    )
    thresh = vol.agg((F.avg("red_qty") * 0.5).alias("qty_threshold"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        vol.join(broadcast(thresh))
        .where(F.col("red_qty") > F.col("qty_threshold"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"), F.round("red_qty", 2).alias("red_qty"))
        .orderBy("s_name")
    )


ORACLE["q20_promotion_suppliers"] = """
WITH vol AS (
  SELECT l_suppkey, sum(l_quantity) AS red_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  GROUP BY 1
)
SELECT s_name, n_name AS nation, round(red_qty, 2) AS red_qty
FROM vol
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE red_qty > (SELECT 0.5 * avg(red_qty) FROM vol)
ORDER BY s_name
"""


# ------------------------------------------------------------------ B31
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no receipt/commit dates): for finished ('F')
    multi-supplier orders, count per supplier the orders where that
    supplier's last shipment was strictly later than every other
    supplier's — the EXISTS / NOT-EXISTS pair expressed as one window
    pass over the per-(order, supplier) max shipdate.

    One shuffle on orderkey serves the groupBy and the window; the
    original's two correlated sub-scans of lineitem disappear. supplier
    is UNHINTED (scales with SF, r10).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    g = (
        li.join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("own_max"))
    )
    w = Window.partitionBy("l_orderkey")
    g = (
        g.withColumn("order_max", F.max("own_max").over(w))
        .withColumn("n_at_max", F.sum(F.when(F.col("own_max") == F.col("order_max"), 1).otherwise(0)).over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
    )
    late = g.where(
        (F.col("n_supp") >= 2)
        & (F.col("own_max") == F.col("order_max"))
        & (F.col("n_at_max") == 1)
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


ORACLE["q21_late_suppliers"] = """
WITH g AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS own_max
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
)
SELECT s_name, count(*) AS numwait
FROM g g1
JOIN supplier ON g1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM g g2
              WHERE g2.l_orderkey = g1.l_orderkey AND g2.l_suppkey <> g1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM g g3
                  WHERE g3.l_orderkey = g1.l_orderkey AND g3.l_suppkey <> g1.l_suppkey
                    AND g3.own_max >= g1.own_max)
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ------------------------------------------------------------------ B32
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no c_phone → grouped by nation): wealthy
    customers (balance above the positive-balance average) with no order
    since 1999 — scalar-subquery filter + anti join."""
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1999-01-01"
    ).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("nation")
    )


ORACLE["q22_inactive_customers"] = """
SELECT n_name AS nation, count(*) AS numcust, round(sum((c_acctbal)::DECIMAL(38,6)), 2)::DOUBLE AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
ORDER BY nation
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_ship_lateness": q12_ship_lateness,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_types": q16_supplier_part_types,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q20_promotion_suppliers": q20_promotion_suppliers,
    "q21_late_suppliers": q21_late_suppliers,
    "q22_inactive_customers": q22_inactive_customers,
}
