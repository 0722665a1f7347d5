"""Extended TPC-H-style suite over the testdata star schema (SURVEY §2b).

The reference has no relational surface at all, so these queries exist to
prove the engine's coverage of the classical shapes the TPC-H spec
exercises — multi-way joins, correlated EXISTS, disjunctive predicates,
having-filters over grouped fact scans, scalar subqueries, market-share
ratios. Columns the testdata lacks (partsupp, commit/receipt dates, phone,
shipmode) are adapted to equivalents and the adaptation is documented per
query.

Scale notes: nation/region are the only genuinely fixed-size dims and
the only ones broadcast-HINTED; customer/supplier/part scale linearly with
SF (~10^10 rows at TPC-H 100 TB), so their joins carry no hint — AQE
broadcasts them at any SF where they actually fit and reverts to a shuffle
join when they don't (r10 verdict #2). Scalar one-row aggregates stay
hinted. Fact-fact joins shuffle on the orderkey and are AQE-managed;
aggregations are partial+final; top-k sorts are TakeOrdered, never a global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from batch_public_spark.plans.registry import query
from batch_public_spark.plans.relational import (
    CHARGE,  # noqa: F401 — re-exported convenience
    D6,
    D15,
    REV,
    _rev_col,
    _sql_dec,
    dec,
    money_sum,
    ratio,
)
from batch_public_spark.sources.tables import load_table as t

# Narrower money width for products whose operands multiply (keeps the
# widened product + sum precision inside decimal(38) in both engines with
# NO intermediate rounding — see registry docstring).
D12 = "decimal(12,4)"


@query(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: orders per priority with a slow lineitem.

    Adaptation: the testdata lacks commit/receipt dates, so "late" is a
    shipment >60 days after the order date. The EXISTS compiles to a LEFT
    SEMI join on l_orderkey with the non-equi ship-lag predicate attached —
    one shuffle on orderkey, no row explosion (semi stops at first match).
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = t(spark, sf_dir, "lineitem")
    slow = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_sql_dec('l_extendedprice')} * {_sql_dec('l_discount', 'DECIMAL(6,4)')}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan→filter→global agg — the pushdown showcase.

    All three predicates reach the parquet reader (`PushedFilters`); the
    single global sum is a partial+final agg with a 1-row shuffle.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(dec("l_extendedprice") * dec("l_discount", D6), "revenue"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           CAST(ROUND(SUM({REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}), 2) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND n1.n_name IN ('NATION_3', 'NATION_7')
      AND n2.n_name IN ('NATION_3', 'NATION_7')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year.

    Five dim joins all broadcast (nation/customer/supplier are tiny beside
    lineitem); the only shuffle is lineitem↔orders on orderkey, and the
    final 2×2×2-group agg is map-side combined.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_7"))
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_7"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(money_sum(_rev_col(), "volume"))


@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_7' THEN {REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
                 / CAST(SUM({REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of a region's revenue by year.

    Conditional aggregation (sum of CASE) over a 6-way join; the share is
    exact-decimal numerator/denominator divided as doubles at the end.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = n.select("n_nationkey", "n_regionkey")
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
    )
    rev = _rev_col()
    zero = F.lit(0).cast(D15)
    grouped = joined.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(zero)).alias("_num"),
        F.sum(rev).alias("_den"),
    )
    return grouped.select("order_year", ratio(F.col("_num"), F.col("_den").cast("double"), "mkt_share"))


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS supp_nation, CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           CAST(ROUND(SUM({REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                          - CAST(p.p_retailprice AS DECIMAL(12,4)) * CAST(l.l_quantity AS DECIMAL(12,4)) * CAST(0.1 AS DECIMAL(2,1))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%' AND n.n_nationkey < 5
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue: profit on a part family by supplier nation/year.

    Adaptation: no partsupp table, so supply cost is modeled as 10% of
    p_retailprice×quantity — all-decimal arithmetic with widths chosen so
    no intermediate rounds (see D12 note). Part/supplier/nation broadcast;
    lineitem↔orders is the one real shuffle.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    o = t(spark, sf_dir, "orders")
    profit = _rev_col() - dec("p_retailprice", D12) * dec("l_quantity", D12) * F.lit(
        0.1
    ).cast("decimal(2,1)")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("supp_nation"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(money_sum(profit, "profit"))


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM({REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a quarter.

    TakeOrdered top-k (no global sort); revenue is an exact decimal sum so
    the DESC order + custkey tie-break is deterministic across engines.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(_rev_col(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_late_priority",
    oracle="""
    SELECT CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: priority mix of late shipments by year.

    Adaptation: no shipmode/receiptdate — "late" is >90 days after the
    order date. Pivot-style conditional counts in one agg pass.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
                 / CAST(SUM({REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo-part revenue share for one month (part join
    AQE-decided — part is SF-scaled; conditional agg, single-row
    result)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = t(spark, sf_dir, "part")
    rev = _rev_col()
    zero = F.lit(0).cast(D15)
    agg = li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("_promo"),
        F.sum(rev).alias("_all"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("_promo").cast("double") / F.col("_all").cast("double"), 6
        ).alias("promo_revenue_pct")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM({REV}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, srev.total_revenue
    FROM srev JOIN supplier s ON s.s_suppkey = srev.l_suppkey
    WHERE srev.total_revenue = (SELECT MAX(total_revenue) FROM srev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the max quarterly revenue.

    The scalar-subquery MAX becomes a one-row MAX aggregate broadcast
    back over the per-supplier aggregate — NOT an empty-partition window
    (plans.lint flags those: at 100 TB "per-supplier" is millions of rows
    and a global window funnels them through one task; the broadcast max
    costs one tiny agg and keeps every stage partitioned). Revenue is
    decimal-exact so the equality predicate is engine-stable.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    srev = li.groupBy("l_suppkey").agg(money_sum(_rev_col(), "total_revenue"))
    mx = srev.agg(F.max("total_revenue").alias("_mx"))
    best = srev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("_mx")
    )
    s = t(spark, sf_dir, "supplier")
    return best.join(s, best.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY 1, 2, 3
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: distinct suppliers per (brand, type, size).

    Adaptation: lineitem stands in for partsupp as the part↔supplier link.
    COUNT DISTINCT expands then two-phase aggregates; the negative and IN
    predicates push to the part scan, which then broadcasts.
    """
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(15,4))), 2) AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(15,4))) > 250
    )
    GROUP BY 1, 2, 3, 4
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind very large orders. The grouped-HAVING
    IN subquery is a per-orderkey WINDOW sum over lineitem (r14): the
    subquery form scanned and shuffled lineitem twice (once aggregated
    for the semi-join set, once in full for the join); the window filter
    pays one full-row exchange, which the orders join then reuses —
    identical surviving rows, half the lineitem shuffle."""
    li = t(spark, sf_dir, "lineitem")
    liw = (
        li.select("l_orderkey", dec("l_quantity").alias("_qty"))
        .withColumn("_q", F.sum("_qty").over(W.partitionBy("l_orderkey")))
        .filter(F.col("_q") > 250)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(liw, o.o_orderkey == liw.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(money_sum(F.col("_qty"), "sum_qty"))
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM({REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides — exercises
    CNF conversion: the per-side residuals (brand/size on part, quantity on
    lineitem) still push below the part join (AQE-decided: part is
    SF-scaled, so no forced hint)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return joined.filter(cond).agg(
        money_sum(_rev_col(), "revenue"), F.count("*").alias("n_rows")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH pair AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ), per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late FROM pair GROUP BY 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM pair p
    JOIN per_order po ON p.l_orderkey = po.l_orderkey
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    WHERE p.late = 1 AND po.n_supp >= 2 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue: the sole late supplier on multi-supplier orders.

    The spec's EXISTS/NOT-EXISTS pair is re-expressed as one aggregation
    level (per order-supplier pair) plus a per-order WINDOW over the pair
    frame — same answer, but the window reuses the pair aggregation's
    orderkey exchange (guide §2.4), where a per-order rollup + join-back
    paid a second aggregation branch and a merge join. Per-order pair
    groups are bounded by suppliers-per-order, so the window frame is
    tiny at any scale.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("_late"))
        # One orderkey exchange serves BOTH the (orderkey, suppkey)
        # aggregation (clustering on a key subset satisfies it) and the
        # per-order window below — without it the agg exchanges on the
        # pair key and the window re-exchanges on orderkey.
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("late"))
    )
    wo = W.partitionBy("l_orderkey")
    s = t(spark, sf_dir, "supplier")
    return (
        pair.withColumn("n_supp", F.count("*").over(wo))
        .withColumn("n_late", F.sum("late").over(wo))
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, pair.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q22_low_activity_customers",
    oracle="""
    WITH threshold AS (
      SELECT CAST(AVG(c_acctbal) AS DOUBLE) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name, COUNT(*) AS n_cust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(15,4))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg_bal FROM threshold)
      AND (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) < 5
    GROUP BY n.n_name
    """,
)
def q22_low_activity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue: wealthy, near-inactive customers per nation.

    Adaptation: no phone column — the country-code grouping becomes the
    nation dim, and "no orders" (empty at this SF) becomes "<5 orders".
    The scalar AVG broadcasts as a literal-ish 1-row cross join; the
    correlated COUNT becomes a left join against per-customer order counts
    (missing ⇒ 0 via coalesce).
    """
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").cast("double").alias("avg_bal")
    )
    counts = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("_n_orders")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(counts, "c_custkey", "left")
        .filter(F.coalesce(F.col("_n_orders"), F.lit(0)) < 5)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"), money_sum(dec("c_acctbal"), "total_bal"))
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(15,4))) AS supply_cost
      FROM lineitem GROUP BY 1, 2
    ), regional AS (
      SELECT sp.l_partkey, sp.supply_cost, s.s_name, s.s_acctbal, n.n_name
      FROM supply sp
      JOIN supplier s ON sp.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p.p_partkey, p.p_name,
           CAST(supply_cost AS DOUBLE) AS supply_cost
    FROM (
      SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM regional
    ) rg
    JOIN part p ON rg.l_partkey = p.p_partkey
    WHERE p.p_type = 'LARGE' AND rg.supply_cost = rg.min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue: cheapest EUROPE supplier per LARGE part.

    Adaptation (no partsupp table): the supply relation is derived from
    lineitem — supply_cost(part, supp) = MIN(extendedprice) over their
    shipped lines (reference ships no relational surface at all; SURVEY
    §2b joins row). The correlated "= (SELECT MIN(...))" of the spec
    becomes a per-part window MIN over the region-filtered supply rows —
    one shuffle by partkey instead of a self-join (the window and the
    final grouping share nothing, but the self-join form would rescan
    and re-shuffle the whole supply subtree; see memory of measured
    subtree-recompute costs). Dims broadcast; LIMIT is TakeOrdered.
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    # Region-filter the supplier dim BEFORE the supply aggregation: the
    # The regional-supplier join prunes ~4/5 of the fact rows ahead of
    # the (partkey, suppkey) shuffle, so the heaviest exchange carries
    # only the region's lines (the post-agg-join order would shuffle them
    # all). regional_sup is supplier-derived — SF-scaled — so the join is
    # un-hinted; AQE broadcasts it whenever it actually fits.
    regional_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = (
        li.join(regional_sup, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(dec("l_extendedprice")).alias("supply_cost"))
        .select("l_partkey", "supply_cost", "s_name", "s_acctbal", "n_name")
    )
    w = W.partitionBy("l_partkey")
    return (
        regional.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH filtered AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(15,4)) AS val
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
    )
    SELECT l_partkey, CAST(ROUND(SUM(val), 2) AS DOUBLE) AS part_value
    FROM filtered
    GROUP BY l_partkey
    HAVING SUM(val) * (SELECT CAST(count(*) AS BIGINT) * 10 FROM supplier)
           > (SELECT SUM(val) FROM filtered)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue: parts holding an outsized share of one
    nation's supplied value.

    Adaptation (no partsupp): value(part) = SUM(extendedprice) of lines
    supplied by NATION_3 suppliers; the spec's scalar-subquery HAVING
    (share of the nation total) is kept. The nation-filtered fact scan is
    aggregated ONCE per grouping (Spark evaluates the two aggs as two
    jobs over the same scan; at cluster scale the scan is the cost and
    both sides prune to two columns). SF-proportional threshold (r9
    stress sweep → r10 fix): TPC-H's spec scales the share fraction as
    0.0001/SF precisely because a fixed fraction goes vacuous as the
    value distribution flattens; with |supplier| = 10000·SF the
    SF-proportional fraction 0.1/|supplier| is derived FROM THE DATA in
    both engines — algebraically cleared of division (sum·|supplier|·10
    > total, every operand decimal/int, exact in both engines, no float
    boundary flakes), identical to the previously-attested 0.001 at
    sf0.01, and non-vacuous at every fixture SF (16/363/3232 qualifying
    parts). The 1-row total and supplier count broadcast.
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    filtered = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", dec("l_extendedprice").alias("val"))
    )
    per_part = filtered.groupBy("l_partkey").agg(F.sum("val").alias("_sum_val"))
    # decimal(12,0): sum(decimal(15,4)) → decimal(25,4); 25+12+1 = 38
    # keeps the product inside DecimalType's exact range.
    ns10 = t(spark, sf_dir, "supplier").agg(
        (F.count("*") * 10).cast("decimal(12,0)").alias("_ns10")
    )
    total = filtered.agg(F.sum("val").alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .join(F.broadcast(ns10))
        .filter(F.col("_sum_val") * F.col("_ns10") > F.col("_total"))
        .select(
            "l_partkey",
            F.round(F.col("_sum_val"), 2).cast("double").alias("part_value"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts (left join
    keeps zero-order customers; the comment-pattern exclusion becomes a
    priority exclusion inside the JOIN condition, not a WHERE — the
    difference is exactly the Q13 trap this query exists to pin).

    Two-level aggregation: the first groups by the join key the left
    join already shuffled on, the second is a near-trivial rollup of
    |customers| rows.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH brand_lines AS (
      SELECT l.l_partkey, CAST(l.l_quantity AS DECIMAL(15,4)) AS qty,
             CAST(l.l_extendedprice AS DECIMAL(15,4)) AS price
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#12'
    ), stats AS (
      SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS cnt
      FROM brand_lines GROUP BY 1
    )
    SELECT CAST(ROUND(CAST(SUM(b.price) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM brand_lines b
    JOIN stats st ON b.l_partkey = st.l_partkey
    WHERE b.qty * 5 * st.cnt < st.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue: yearly revenue locked in small-quantity
    orders of one brand.

    The spec's correlated "< 0.2 * AVG(l_quantity)" is algebraically
    cleared of division: qty < sum/(5·cnt) ⇔ 5·qty·cnt < sum — every
    operand stays decimal/int so both engines compare exactly (AVG would
    go double in DuckDB and float-flake the boundary). Per-part stats
    (≤|part| rows — population-scale, so no broadcast hint; AQE decides)
    join back onto the brand-filtered lines; the single-row result
    divides the exact decimal sum by 7 in double only at the very end.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    lines = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", dec("l_quantity").alias("qty"), dec("l_extendedprice").alias("price")
    )
    stats = lines.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        # per-part stats scale with |part| — no broadcast hint (AQE
        # broadcasts when the brand-filtered frame is actually small;
        # the r10 unbounded-broadcast lint enforces this shape)
        lines.join(stats, "l_partkey")
        .filter(F.col("qty") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.round(F.sum("price").cast("double") / F.lit(7.0), 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q20_part_volume_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'small %'
          AND YEAR(l.l_shipdate) = 1997
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(15,4))) > 40
      )
    """,
)
def q20_part_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: NATION_5 suppliers who moved real volume of
    'small *' parts in 1997.

    Adaptation (no partsupp/availqty): "availqty > half the shipped
    quantity" becomes an absolute shipped-volume threshold per
    (supplier, part). Shape preserved: a grouped HAVING feeding a
    semi-join chain up to the supplier dim. The year filter and the
    broadcast part filter prune the fact scan before the group-by; the
    qualifying-supplier set is tiny and drives a left_semi join (no row
    duplication, no distinct needed on the supplier side).
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small %"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    movers = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 40)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(movers, "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
    )
