"""Extended TPC-H-shaped analytic suite over the testdata tables,
adapted to the reduced schemas (no partsupp, no commit/receipt dates,
no comment columns — see TESTDATA.md). Widens the engine's demonstrated
operator surface beyond analytics.py (q1/q3/q5) with the join/subquery
shapes the classic queries exercise:

    q4   EXISTS           -> left-semi join with an extra-key predicate
    q6   filter+agg       -> full predicate pushdown to the parquet scan
    q7   nation pairs     -> role-playing dim joined twice + inequality
    q9   profit rollup    -> LIKE filter + multi-join + year extraction
    q10  returned items   -> big-big join, wide group-by, top-k
    q13  cust distribution-> LEFT OUTER join + count(col) + re-aggregation
    q14  promo revenue    -> conditional-aggregate ratio
    q16  supplier counts  -> anti-join exclusion + COUNT(DISTINCT)
    q18  large orders     -> HAVING on a grouped sum, join back (semi)
    q19  disjunctive rev  -> OR-of-conjunctions predicate join
    q22  idle customers   -> scalar-subquery threshold + anti-join
    q8   market share     -> conditional-aggregate ratio, one join tree
    q15  top supplier     -> rank-over-aggregate (= MAX subquery, ties kept)
    q17  small-qty rev    -> correlated per-part average, broadcast back
    q21  waiting supplier -> EXISTS + NOT EXISTS as one grouped pass

Numeric determinism follows analytics.py: money sums in DECIMAL(18,2)
(order-independent) cast to double at the end; ratios computed in
double and rounded to 6dp identically in Spark and the DuckDB oracle.

Scale notes (100 TB): every small side (nation, filtered part splits,
the q18 key set) is explicitly broadcast; the lineitem⋈orders backbones
shuffle once on the order key and AQE handles skew. q6 is the pushdown
showcase — the three predicates and two projected columns reach the
parquet reader, so the scan cost is O(selected row-groups), not O(table).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _rev():
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


# --- q4: order-priority count with EXISTS ----------------------------------

Q4_START, Q4_END = "1997-01-01", "1997-07-01"


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Orders in a window having ≥1 lineitem shipped after the order
    date (the commit<receipt EXISTS of classic Q4, adapted to the
    columns present). The EXISTS becomes a left-semi join whose
    condition carries the non-equi predicate."""
    o = orders.filter(
        (F.col("o_orderdate") >= _ts(Q4_START)) & (F.col("o_orderdate") < _ts(Q4_END))
    )
    sl = lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            sl,
            (o.o_orderkey == sl.l_orderkey) & (sl.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_START} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q4_END} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""".strip()


# --- q6: forecast revenue change (pure filter + scalar agg) ----------------

Q6_START, Q6_END = "1997-01-01", "1998-01-01"


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """Scalar revenue from discounted small-quantity lines: all three
    predicates and both columns push down to the parquet scan."""
    f = lineitem.filter(
        (F.col("l_shipdate") >= _ts(Q6_START))
        & (F.col("l_shipdate") < _ts(Q6_END))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast("decimal(18,4)")
    return f.agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q6_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q6_END} 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""".strip()


# --- q7: volume shipping between nation pairs ------------------------------

Q7_START, Q7_END = "1996-01-01", "1998-01-01"


def q7_nation_volume(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Yearly shipped volume between distinct (supplier, customer)
    nation pairs. The nation dim plays two roles — joined once to the
    supplier side, once to the customer side — both broadcast; the
    inequality predicate filters the pairs after both resolutions."""
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    l = lineitem.filter(
        (F.col("l_shipdate") >= _ts(Q7_START)) & (F.col("l_shipdate") < _ts(Q7_END))
    )
    return (
        l.join(orders.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{Q7_START} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q7_END} 00:00:00'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""".strip()


# --- q9: product-type profit rollup ----------------------------------------


def q9_product_profit(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Profit by supplier nation × ship year for parts whose name
    contains 'widget' (classic Q9's '%green%' LIKE, minus the missing
    ps_supplycost term). The part filter broadcasts; extraction of the
    year happens post-join so the grouping key set stays small."""
    p = F.broadcast(
        part.filter(F.col("p_name").contains("widget")).select("p_partkey")
    )
    return (
        lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
""".strip()


# --- q10: returned-item reporting ------------------------------------------

Q10_START, Q10_END = "1997-10-01", "1998-01-01"


def q10_returned_items(
    nation: DataFrame, customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Top-20 customers by revenue lost to returns in a quarter."""
    o = orders.filter(
        (F.col("o_orderdate") >= _ts(Q10_START)) & (F.col("o_orderdate") < _ts(Q10_END))
    )
    l = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{Q10_START} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q10_END} 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3, 4, 5
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""".strip()


# --- q13: customer order-count distribution --------------------------------


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Distribution of orders-per-customer including zero-order
    customers: LEFT OUTER join, count of the nullable side's key, then
    re-aggregate the counts."""
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""".strip()


# --- q14: promotion revenue share ------------------------------------------

Q14_START, Q14_END = "1997-09-01", "1997-10-01"


def q14_promo_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Share of one month's revenue from PROMO-type parts: a
    conditional aggregate over a broadcast lineitem⋈part join; numerator
    and denominator summed exactly (decimal), divided once in double."""
    l = lineitem.filter(
        (F.col("l_shipdate") >= _ts(Q14_START)) & (F.col("l_shipdate") < _ts(Q14_END))
    )
    joined = l.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast(DEC))
    agged = joined.agg(
        F.sum(promo).cast("double").alias("promo"),
        F.sum(_rev()).cast("double").alias("total"),
    )
    return agged.select(
        F.round(F.lit(100.0) * F.col("promo") / F.col("total"), 6).alias("promo_revenue_pct"),
        F.col("total").alias("total_revenue"),
    )


Q14_SQL = f"""
SELECT ROUND(100.0 * promo / total, 6) AS promo_revenue_pct,
       total AS total_revenue
FROM (
  SELECT
    CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_START} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q14_END} 00:00:00'
)
""".strip()


# --- q16: supplier counts per part spec with exclusion ---------------------


def q16_supplier_counts(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Distinct suppliers per (brand, type, size) bucket, excluding one
    brand and suppliers in deficit (the NOT IN 'complaints' exclusion of
    classic Q16, keyed on s_acctbal < 0 since comments don't exist).
    The exclusion is a broadcast anti-join; supply relationships come
    from lineitem (no partsupp table)."""
    bad = F.broadcast(
        supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    p = F.broadcast(
        part.filter(
            (F.col("p_brand") != "Brand#11") & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
""".strip()


# --- q18: large-volume customers -------------------------------------------

Q18_MIN_QTY = 150


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (HAVING on a
    grouped sum), joined back to orders/customer for reporting. The
    qualifying key set is tiny → broadcast semi-join into the fact."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > Q18_MIN_QTY)
        .select("l_orderkey", F.col("sum_qty_dec").cast("double").alias("sum_qty"))
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer.select("c_custkey", "c_name"), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_MIN_QTY}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""".strip()


# --- q19: disjunctive-predicate revenue ------------------------------------


def q19_disjunctive_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Revenue under an OR-of-conjunctions across both join sides —
    the planner keeps the equi-join on partkey and evaluates the
    disjunction as a post-join filter (brand/size from part, quantity
    from lineitem)."""
    j = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size").between(1, 5)) & (qty >= 1) & (qty <= 11))
        | ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 10)) & (qty >= 10) & (qty <= 20))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(1, 15)) & (qty >= 20) & (qty <= 30))
    )
    return j.filter(cond).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""".strip()


# --- q22: idle high-balance customers --------------------------------------


Q22_IDLE_SINCE = "2000-01-01"


def q22_idle_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customers with above-average positive balance and no RECENT
    orders (none since Q22_IDLE_SINCE — the testdata has essentially no
    fully order-less customers, so classic Q22's 'no orders' would be
    empty): the scalar threshold is an exact decimal-sum / count
    division (bit-identical across engines, unlike a float AVG), the
    no-recent-orders test a left anti-join, grouped by market segment."""
    pos = customer.filter(F.col("c_acctbal") > 0.0)
    srow = pos.agg(
        F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("s"),
        F.count("*").alias("n"),
    ).head()
    threshold = srow["s"] / srow["n"]
    recent = orders.filter(F.col("o_orderdate") >= _ts(Q22_IDLE_SINCE))
    return (
        customer.filter(F.col("c_acctbal") > threshold)
        .join(recent.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{Q22_IDLE_SINCE} 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""".strip()


# --- q8: market share of one nation within a region -------------------------

Q8_NATION, Q8_REGION = "NATION_3", "REGION_0"
Q8_START, Q8_END = "1996-01-01", "1998-01-01"


def q8_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Share of a region's yearly revenue supplied by one nation — a
    ratio of two conditional aggregates over the same join tree (one
    pass, no self-join). Customer nation scopes the region; supplier
    nation decides the numerator."""
    n_cust = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == Q8_REGION)
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    n_supp = F.broadcast(
        nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    o = orders.filter(
        (F.col("o_orderdate") >= _ts(Q8_START)) & (F.col("o_orderdate") < _ts(Q8_END))
    )
    joined = (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
    )
    vol = _rev()
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(F.lit(0).cast(DEC)))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n2.n_name = '{Q8_NATION}'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS mkt_share,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = '{Q8_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q8_START} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q8_END} 00:00:00'
GROUP BY 1
ORDER BY 1
""".strip()


# --- q15: top supplier(s) by quarterly revenue ------------------------------

Q15_START, Q15_END = "1997-01-01", "1997-04-01"


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Suppliers achieving the maximum quarterly revenue (classic Q15's
    view + MAX subquery): the max is a 1-row scalar aggregate broadcast
    into an equality join — ties all surface, matching the SQL's = MAX
    semantics. (The round-1 rank() over a GLOBAL window funneled every
    supplier row through one task; the scalar-max join keeps the
    per-supplier aggregate fully partitioned at any scale.)"""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(Q15_START)) & (F.col("l_shipdate") < _ts(Q15_END))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev_dec"))
    )
    mx = rev.agg(F.max("total_rev_dec").alias("_max_rev"))
    top = rev.join(
        F.broadcast(mx), F.col("total_rev_dec") == F.col("_max_rev")
    ).drop("_max_rev")
    return (
        top.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q15_END} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM revenue)
ORDER BY s_suppkey
""".strip()


# --- q17: small-quantity revenue vs per-part average ------------------------


def q17_small_quantity_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Revenue locked in orders below 50% of each part's average
    quantity (correlated scalar aggregate → per-part avg computed once
    and broadcast back; the classic 'lost revenue in small orders').
    Restricted to one brand like the original."""
    p = F.broadcast(
        part.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    )
    li = lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast(DEC)) / F.count("*")).alias("avg_qty_dec")
    )
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity").cast(DEC) < F.lit(0.5).cast("decimal(6,2)") * F.col("avg_qty_dec"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)) / F.lit(7.0)).cast("double").alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND CAST(l_quantity AS DECIMAL(18,2)) < (
        SELECT CAST(0.5 AS DECIMAL(6,2)) * (SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""".strip()


# --- q21: suppliers who alone shipped late on multi-supplier orders ---------

Q21_LATE_DAYS = 60


def q21_waiting_suppliers(
    nation: DataFrame, supplier: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Suppliers whose line shipped late (> 60 days after the order)
    on a multi-supplier order where NO other supplier was late —
    classic Q21's EXISTS + NOT EXISTS pair, expressed as one grouped
    pass over the order's lines (late/total counts per supplier vs
    order) instead of two correlated self-joins."""
    l = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        # epoch-seconds compare on BOTH engines (matches Q21_SQL's epoch
        # arithmetic): date_add would truncate the timestamp to DATE and
        # silently diverge if the generator ever emits a time-of-day.
        "is_late",
        (
            F.col("l_shipdate").cast("double")
            > F.col("o_orderdate").cast("double") + Q21_LATE_DAYS * 86400
        ).cast("int"),
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "n_late_suppliers"
        ),
    )
    culprit = (
        l.filter(F.col("is_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1)
            ),
            "l_orderkey",
        )
    )
    return (
        culprit.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


Q21_SQL = f"""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN epoch(l_shipdate) > epoch(o_orderdate) + {Q21_LATE_DAYS} * 86400 THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_suppliers,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_suppliers
  FROM l GROUP BY 1
)
SELECT s_name, n_name, COUNT(*) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE is_late = 1) c
JOIN per_order USING (l_orderkey)
JOIN supplier ON c.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_suppliers > 1 AND n_late_suppliers = 1
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name ASC
""".strip()


# --- q2: minimum-cost supplier per part (correlated MIN subquery) -----------
#
# The reference schema has no partsupp, so the part-supplier relation is
# derived from shipment history: supplier s "supplies" part p if any
# lineitem pairs them, and the supply cost is the realized unit price
# SUM(extendedprice)/SUM(quantity) over those lines (exact decimal sums,
# divided in double and rounded to 6dp identically in both engines).
# The classic correlated `cost = (SELECT MIN ...)` becomes a per-part
# MIN aggregate joined back on equality — ties all surface, like Q2.

Q2_REGION = "EUROPE"
Q2_TYPE = "ECONOMY"
Q2_SIZE_MIN = 20


def q2_min_cost_supplier(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Cheapest realized supplier for each qualifying part within one
    region. Scale: the (part, supplier) cost table is one hash
    aggregation over the pruned lineitem scan; region/nation/part sides
    are broadcast; the correlated MIN is a per-part re-aggregation of
    that same (bounded: |parts|x|suppliers|) cost table, so nothing
    quadratic or driver-side appears at any corpus size."""
    p = F.broadcast(
        part.filter(
            (F.col("p_type") == Q2_TYPE) & (F.col("p_size") >= Q2_SIZE_MIN)
        ).select("p_partkey", "p_name")
    )
    s_region = F.broadcast(
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == Q2_REGION)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        lineitem.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s_region, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / F.sum(F.col("l_quantity").cast(DEC)).cast("double"),
                6,
            ).alias("supply_cost")
        )
    )
    min_cost = cost.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("supply_cost").alias("_min_cost")
    )
    return (
        cost.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("supply_cost") == F.col("_min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost"
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH cost AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS supply_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = '{Q2_TYPE}' AND p_size >= {Q2_SIZE_MIN} AND r_name = '{Q2_REGION}'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
FROM cost c
WHERE supply_cost = (SELECT MIN(supply_cost) FROM cost c2
                     WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""".strip()


# --- q11: important parts by shipped value (scalar-subquery HAVING) ---------

Q11_NATION = "NATION_3"
Q11_FRACTION = 0.002


def q11_important_parts(
    nation: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Parts whose shipped value from one nation's suppliers exceeds a
    fraction of that nation's total shipped value (classic Q11 with
    lineitem revenue standing in for partsupp stock value). The scalar
    total is a 1-row aggregate broadcast into the HAVING filter — the
    same two-level aggregation, no second scan of the fact. Decimal
    sums keep both levels order-independent; the threshold compare
    stays in decimal so no double rounding can flip a boundary part."""
    li = lineitem.join(
        F.broadcast(
            supplier.join(
                F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
            )
            .filter(F.col("n_name") == Q11_NATION)
            .select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("value_dec"))
    total = per_part.agg(F.sum("value_dec").alias("_total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("value_dec")
            > F.lit(Q11_FRACTION).cast("decimal(8,6)") * F.col("_total_dec")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS value
FROM per_part
WHERE value_dec > CAST({Q11_FRACTION} AS DECIMAL(8,6)) * (SELECT SUM(value_dec) FROM per_part)
ORDER BY value DESC, p_partkey
""".strip()


# --- q12: late shipments by return flag × order priority --------------------
#
# No l_shipmode / commit / receipt dates in the reduced schema: the
# grouping dimension becomes l_returnflag and "late" means shipped
# after the order date — preserving Q12's shape (fact-fact join, window
# filter, CASE-bucketed counts by priority class).

Q12_START, Q12_END = "1997-01-01", "1998-01-01"


def q12_priority_shipping(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """High- vs low-priority order counts among late-shipped lines, per
    return flag. Scale: one shuffle on the order key joins the two
    facts (AQE handles skew); the CASE buckets aggregate map-side into
    3 groups."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts(Q12_START)) & (F.col("l_shipdate") < _ts(Q12_END))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_START} 00:00:00'
  AND l_shipdate < TIMESTAMP '{Q12_END} 00:00:00'
  AND l_shipdate > o_orderdate
GROUP BY l_returnflag
ORDER BY l_returnflag
""".strip()


# --- q20: dominant suppliers of a part family (nested-aggregate semi-join) --

Q20_PREFIX = "small"
Q20_REGION = "ASIA"
Q20_START, Q20_END = "1997-01-01", "1998-01-01"
Q20_SHARE = 0.2


def q20_part_promotion(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Suppliers in one region who shipped more than 20% of some
    '{prefix}%' part's yearly volume (classic Q20's availqty > half of
    shipped quantity, inverted onto shipment shares since there is no
    partsupp). The nested aggregate — per-(part,supplier) quantity vs
    per-part total — reuses ONE aggregation's output for both sides,
    and the qualifying supplier set semi-joins back to the supplier
    dim. Decimal quantity sums; the share compare stays in decimal."""
    p = F.broadcast(
        part.filter(F.col("p_name").startswith(Q20_PREFIX)).select("p_partkey")
    )
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts(Q20_START)) & (F.col("l_shipdate") < _ts(Q20_END))
    ).join(p, F.col("l_partkey") == F.col("p_partkey"))
    pair_qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("supp_qty_dec")
    )
    part_qty = pair_qty.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("supp_qty_dec").alias("part_qty_dec")
    )
    dominant = (
        pair_qty.join(F.broadcast(part_qty), F.col("l_partkey") == F.col("_pk"))
        .filter(
            F.col("supp_qty_dec")
            > F.lit(Q20_SHARE).cast("decimal(3,2)") * F.col("part_qty_dec")
        )
        .select("l_suppkey")
        .distinct()
    )
    s_region = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == Q20_REGION)
    )
    return (
        s_region.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.col("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH pair_qty AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{Q20_PREFIX}%'
    AND l_shipdate >= TIMESTAMP '{Q20_START} 00:00:00'
    AND l_shipdate < TIMESTAMP '{Q20_END} 00:00:00'
  GROUP BY 1, 2
),
part_qty AS (
  SELECT l_partkey, SUM(supp_qty_dec) AS part_qty_dec FROM pair_qty GROUP BY 1
),
dominant AS (
  SELECT DISTINCT l_suppkey
  FROM pair_qty JOIN part_qty USING (l_partkey)
  WHERE supp_qty_dec > CAST({Q20_SHARE} AS DECIMAL(3,2)) * part_qty_dec
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
""".strip()


# --- supplier reliability: late-rate with Wilson lower bound ----------------

WILSON_Z = 1.959964  # ~97.5th normal quantile: 95% two-sided interval
WILSON_LATE_DAYS = 30


def supplier_reliability(
    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Per-supplier late-shipment rate with a Wilson score interval,
    ranked worst-first by the interval's LOWER bound — the principled
    small-sample ranking (a supplier with 2/2 late is not worse than
    one with 90/100 late; raw rates say it is, the Wilson lower bound
    says otherwise). The panel a logistics operator actually sorts by.

    Determinism: the interval is pure arithmetic + sqrt over exact
    integer (n, late) counts, identical expression in both engines,
    rounded to 6 dp. Scale: one fact-fact join shuffled on the order
    key, one supplier-keyed aggregation, broadcast dim join."""
    l = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        # epoch-seconds compare on BOTH engines: date_add would truncate the
        # timestamp to DATE, silently diverging from the oracle's INTERVAL
        # arithmetic the moment the generated o_orderdate grows a time-of-day.
        (
            F.col("l_shipdate").cast("double")
            > F.col("o_orderdate").cast("double") + WILSON_LATE_DAYS * 86400
        )
        .cast("int")
        .alias("is_late"),
    )
    agg = l.groupBy("l_suppkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum("is_late").cast("bigint").alias("n_late"),
    )
    n = F.col("n_lines").cast("double")
    p = F.col("n_late").cast("double") / n
    z2 = F.lit(WILSON_Z**2)
    lo = (
        p
        + z2 / (2 * n)
        - F.lit(WILSON_Z) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    ) / (1 + z2 / n)
    return (
        agg.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_lines",
            "n_late",
            F.round(p, 6).alias("late_rate"),
            F.round(lo, 6).alias("wilson_lo"),
        )
        .orderBy(F.desc("wilson_lo"), "s_suppkey")
    )


SUPPLIER_RELIABILITY_SQL = f"""
WITH l AS (
  SELECT l_suppkey,
         CASE WHEN epoch(l_shipdate) > epoch(o_orderdate) + {WILSON_LATE_DAYS} * 86400
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
agg AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(is_late) AS BIGINT) AS n_late
  FROM l GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, n_lines, n_late,
       ROUND(CAST(n_late AS DOUBLE) / n_lines, 6) AS late_rate,
       ROUND((CAST(n_late AS DOUBLE) / n_lines
              + {WILSON_Z**2} / (2 * n_lines)
              - {WILSON_Z} * SQRT((CAST(n_late AS DOUBLE) / n_lines)
                                  * (1 - CAST(n_late AS DOUBLE) / n_lines) / n_lines
                                  + {WILSON_Z**2} / (4.0 * n_lines * n_lines)))
             / (1 + {WILSON_Z**2} / n_lines), 6) AS wilson_lo
FROM agg JOIN supplier ON l_suppkey = s_suppkey
ORDER BY wilson_lo DESC, s_suppkey
""".strip()


# --- ABC (Pareto) part classification ---------------------------------------

ABC_A, ABC_B = 0.8, 0.95


def abc_analysis(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Pareto/ABC inventory classification: parts ranked by revenue,
    classed A while cumulative share ≤ 80%, B to 95%, else C — the
    standard "which 20% of SKUs carry 80% of the business" cut.

    Determinism: revenue sums in DECIMAL (order-independent); the
    cumulative share divides two exact decimals in double and rounds
    to 6 dp; ties order by (revenue DESC, partkey ASC).

    Scale: one fact aggregation to per-part revenue; the running total
    then runs over the PART DIMENSION (catalog-sized, not fact-sized —
    2k rows at sf0.01, maybe 10⁶ on a real catalog), where a single-
    task window is the right plan below ~10⁸ SKUs; past that the
    exact_ntile bucket decomposition applies verbatim."""
    from pyspark.sql import Window

    rev = (
        lineitem.groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("rev_dec"))
    )
    total = rev.agg(F.sum("rev_dec").alias("_total"))
    w = Window.orderBy(F.desc("rev_dec"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = (
        rev.join(F.broadcast(total))
        .withColumn("cum_dec", F.sum("rev_dec").over(w))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("rev_dec").cast("double").alias("revenue"),
            F.round(
                F.col("cum_dec").cast("double") / F.col("_total").cast("double"), 6
            ).alias("cum_share"),
        )
    )
    cls = (
        F.when(F.col("cum_share") <= ABC_A, "A")
        .when(F.col("cum_share") <= ABC_B, "B")
        .otherwise("C")
    )
    return (
        ranked.join(
            F.broadcast(part.select("p_partkey", "p_name")), "p_partkey"
        )
        .select("p_partkey", "p_name", "revenue", "cum_share", cls.alias("abc_class"))
        .orderBy(F.desc("revenue"), "p_partkey")
    )


ABC_ANALYSIS_SQL = f"""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey AS p_partkey,
         CAST(rev_dec AS DOUBLE) AS revenue,
         ROUND(CAST(SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST((SELECT SUM(rev_dec) FROM rev) AS DOUBLE), 6) AS cum_share
  FROM rev
)
SELECT r.p_partkey, p.p_name, r.revenue, r.cum_share,
       CASE WHEN r.cum_share <= {ABC_A} THEN 'A'
            WHEN r.cum_share <= {ABC_B} THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked r JOIN part p ON p.p_partkey = r.p_partkey
ORDER BY r.revenue DESC, r.p_partkey
""".strip()


# --- supplier lead-time percentiles -----------------------------------------

LEAD_QS = [0.5, 0.9, 0.95, 0.99]


def supplier_lead_times(
    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Per-supplier order→ship lead time percentiles (p50/p90/p95/p99
    days), long rows — the SLA panel next to the Wilson late-rate
    ranking: the rate says HOW OFTEN a supplier is late, the tail
    quantiles say HOW BAD late gets. Exact interpolated percentiles so
    the oracle hash-matches (same caveat as the other exact-percentile
    panels: the approximate mergeable path is approx_percentile).

    Scale: one order-key fact join, one supplier-keyed percentile
    aggregation (each group's values concentrate on its reducer —
    inherent to exactness), broadcast dim join back."""
    lead_days = (
        F.col("l_shipdate").cast("double") - F.col("o_orderdate").cast("double")
    ) / F.lit(86400.0)
    joined = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_suppkey", lead_days.alias("lead_d"))
    qs = F.array(*[F.lit(q) for q in LEAD_QS])
    agg = joined.groupBy("l_suppkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.percentile(F.col("lead_d"), qs).alias("vals"),
    )
    return (
        agg.select(
            "l_suppkey",
            "n_lines",
            F.posexplode("vals").alias("q_idx", "lead_days"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_lines",
            F.col("q_idx").cast("bigint").alias("q_idx"),
            F.round(F.col("lead_days"), 4).alias("lead_days"),
        )
        .orderBy("s_suppkey", "q_idx")
    )


SUPPLIER_LEAD_TIMES_SQL = f"""
WITH j AS (
  SELECT l_suppkey,
         (epoch(l_shipdate) - epoch(o_orderdate)) / 86400.0 AS lead_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
g AS (
  SELECT l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         quantile_cont(lead_d, {LEAD_QS!r}) AS vals
  FROM j GROUP BY l_suppkey
),
x AS (
  SELECT l_suppkey, n_lines,
         generate_subscripts(vals, 1) - 1 AS q_idx,
         unnest(vals) AS lead_days
  FROM g
)
SELECT s_suppkey, s_name, n_lines,
       CAST(q_idx AS BIGINT) AS q_idx,
       ROUND(lead_days, 4) AS lead_days
FROM x JOIN supplier ON l_suppkey = s_suppkey
ORDER BY s_suppkey, q_idx
""".strip()

# --- per-nation revenue trend: EXACT decimal OLS slope ----------------------


def revenue_trend(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation monthly revenue trend: the OLS slope of (monthly
    revenue ~ month index) computed in EXACT decimal arithmetic — the
    closed form slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x an
    integer month index and y a DECIMAL(28,2) revenue sum never leaves
    exact types until the final division, so both engines produce the
    identical 6 dp number in any accumulation order (the same
    determinism discipline as the effect-size and drift panels; a
    float regr_slope would be order-sensitive). The panel a planner
    reads for "which markets are growing" with the trend unit being
    revenue-per-month.

    Scale: one broadcast dim chain orders→customer→nation, one
    (nation, month) aggregation, one |nations|-keyed moment rollup —
    the regression never materializes anything month-count-sized per
    group beyond the monthly table itself."""
    mo = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
            F.col("o_totalprice").cast("decimal(28,2)").alias("rev"),
        )
    )
    monthly = mo.groupBy("n_name", "m").agg(F.sum("rev").alias("y"))
    base = F.broadcast(monthly.agg(F.min("m").alias("m0")))
    mm = monthly.join(base).select(
        "n_name", (F.col("m") - F.col("m0")).cast("long").alias("x"), "y"
    )
    agg = mm.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("x").cast("decimal(28,2)")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        agg.select(
            "n_name",
            F.col("n").alias("n_months"),
            F.col("sy").cast("double").alias("total_revenue"),
            F.round(
                num.cast("double") / F.nullif(den, F.lit(0.0)), 6
            ).alias("slope_per_month"),
        )
        .orderBy("n_name")
    )


REVENUE_TREND_SQL = """
WITH mo AS (
  SELECT n.n_name,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
         CAST(o.o_totalprice AS DECIMAL(28,2)) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
monthly AS (
  SELECT n_name, m, SUM(rev) AS y FROM mo GROUP BY n_name, m
),
mm AS (
  SELECT n_name, CAST(m - (SELECT MIN(m) FROM monthly) AS BIGINT) AS x, y
  FROM monthly
),
agg AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(x * x) AS sxx,
         SUM(y) AS sy, SUM(y * CAST(x AS DECIMAL(28,2))) AS sxy
  FROM mm GROUP BY n_name
)
SELECT n_name, n AS n_months,
       CAST(sy AS DOUBLE) AS total_revenue,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0), 6)
         AS slope_per_month
FROM agg
ORDER BY n_name
""".strip()

# --- cohort LTV curve -------------------------------------------------------


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Customer-cohort LTV curve: customers grouped by FIRST-order
    month, tracked for cumulative average spend at each
    months-since-first offset — the growth-accounting matrix ("do
    newer cohorts monetize faster?") that the events-side retention
    cohorts panel answers for activity; this one answers it for
    revenue. All money stays DECIMAL(28,2) until the final per-customer
    division, so the cumulative sums are accumulation-order-proof.

    Scale: one window-min per customer (keyed by customer), one
    (cohort, offset) aggregation, and a cumulative window keyed by
    cohort — fan-in per window partition is the cohort's month count,
    never the order table."""
    w = Window.partitionBy("o_custkey")
    o = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        F.col("o_totalprice").cast("decimal(28,2)").alias("rev"),
    ).withColumn("m0", F.min("m").over(w))
    cell = o.groupBy(
        F.col("m0").alias("cohort_month"),
        (F.col("m") - F.col("m0")).cast("int").alias("months_since_first"),
    ).agg(F.sum("rev").alias("rev"), F.count("*").cast("bigint").alias("n_orders"))
    cohort_sizes = (
        o.select("o_custkey", "m0")
        .distinct()
        .groupBy(F.col("m0").alias("cohort_month"))
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )
    wc = (
        Window.partitionBy("cohort_month")
        .orderBy("months_since_first")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(F.broadcast(cohort_sizes), "cohort_month")
        .withColumn("cum_rev", F.sum("rev").over(wc))
        .select(
            F.col("cohort_month").cast("int").alias("cohort_month"),
            "months_since_first",
            "n_customers",
            "n_orders",
            # exact integer cents, floor-divided: no double rounding mode
            # can diverge between engines (a ROUND(double, 2) here hit
            # HALF_UP-vs-nearest-even on exact half-cent quotients)
            F.expr("CAST(cum_rev * 100 AS BIGINT) div n_customers")
            .cast("bigint")
            .alias("cum_ltv_cents_per_customer"),
        )
        .orderBy("cohort_month", "months_since_first")
    )


COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS m,
         CAST(o_totalprice AS DECIMAL(28,2)) AS rev,
         MIN(year(o_orderdate) * 12 + month(o_orderdate))
           OVER (PARTITION BY o_custkey) AS m0
  FROM orders
),
cell AS (
  SELECT m0 AS cohort_month, CAST(m - m0 AS INT) AS months_since_first,
         SUM(rev) AS rev, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM o GROUP BY m0, m - m0
),
sizes AS (
  SELECT m0 AS cohort_month, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM (SELECT DISTINCT o_custkey, m0 FROM o) GROUP BY m0
)
SELECT CAST(c.cohort_month AS INT) AS cohort_month, c.months_since_first,
       s.n_customers, c.n_orders,
       CAST(CAST(SUM(c.rev) OVER (PARTITION BY c.cohort_month
                    ORDER BY c.months_since_first
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT)
            // s.n_customers AS BIGINT) AS cum_ltv_cents_per_customer
FROM cell c JOIN sizes s ON c.cohort_month = s.cohort_month
ORDER BY cohort_month, months_since_first
""".strip()

# --- open-order backlog aging -----------------------------------------------

BACKLOG_BUCKETS_DAYS = [7, 30, 90]


def backlog_aging(orders: DataFrame) -> DataFrame:
    """Open-order backlog aging: orders not yet finalized (status !=
    'F'), bucketed by age at the as-of instant (the corpus's max order
    date — deterministic), with order counts and money at risk per
    (status, bucket) cell. The operational panel a logistics desk
    works from ("what's stuck, how long, how much") — the fact-side
    companion to the dashboard KPIs.

    Scale: one scan, epoch arithmetic against a 1-row broadcast
    scalar, one (status, bucket)-keyed aggregation."""
    mx = orders.agg(F.max(F.col("o_orderdate").cast("double")).alias("mx")).withColumn(
        "_k", F.lit(1)
    )
    b1, b2, b3 = BACKLOG_BUCKETS_DAYS
    age = (F.col("mx") - F.col("o_orderdate").cast("double")) / 86400.0
    bucket = (
        F.when(age <= b1, f"0-{b1}d")
        .when(age <= b2, f"{b1 + 1}-{b2}d")
        .when(age <= b3, f"{b2 + 1}-{b3}d")
        .otherwise(f">{b3}d")
    )
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(mx), "_k")
        .groupBy(
            F.col("o_orderstatus").alias("status"), bucket.alias("age_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("value_at_risk"),
        )
        .orderBy("status", "age_bucket")
    )


BACKLOG_AGING_SQL = f"""
WITH mx AS (SELECT MAX(epoch(o_orderdate)) AS mx FROM orders),
aged AS (
  SELECT o_orderstatus AS status, o_totalprice,
         (mx.mx - epoch(o_orderdate)) / 86400.0 AS age
  FROM orders, mx
  WHERE o_orderstatus != 'F'
)
SELECT status,
       CASE WHEN age <= {BACKLOG_BUCKETS_DAYS[0]} THEN '0-{BACKLOG_BUCKETS_DAYS[0]}d'
            WHEN age <= {BACKLOG_BUCKETS_DAYS[1]}
              THEN '{BACKLOG_BUCKETS_DAYS[0] + 1}-{BACKLOG_BUCKETS_DAYS[1]}d'
            WHEN age <= {BACKLOG_BUCKETS_DAYS[2]}
              THEN '{BACKLOG_BUCKETS_DAYS[1] + 1}-{BACKLOG_BUCKETS_DAYS[2]}d'
            ELSE '>{BACKLOG_BUCKETS_DAYS[2]}d' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS value_at_risk
FROM aged
GROUP BY 1, 2
ORDER BY status, age_bucket
""".strip()

# --- supplier concentration (HHI) -------------------------------------------


def supplier_concentration(lineitem: DataFrame) -> DataFrame:
    """Single-sourcing risk panel: per part, the Herfindahl–Hirschman
    index of supplier quantity shares (HHI = Σ share², 1.0 = fully
    single-sourced), with supplier count and total volume — sorted
    most-concentrated-first over the high-volume tail. The procurement
    counterpart of the ABC classification: ABC says which parts matter,
    this says which of those have no fallback supplier.

    Determinism: shares come from exact DECIMAL quantity sums; the
    share² sum runs over ≤ |suppliers-per-part| doubles from identical
    inputs, rounded 6 dp. Scale: two keyed aggregations (part×supplier,
    then part) — no joins, no windows."""
    dec = "decimal(28,2)"
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(dec)).alias("q")
    )
    part = ps.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.sum("q").alias("qt"),
        F.sum(
            (
                (F.col("q").cast("double"))
                * (F.col("q").cast("double"))
            ).cast("decimal(38,6)")
        ).alias("sq"),
    )
    hhi = F.round(
        F.col("sq").cast("double")
        / (F.col("qt").cast("double") * F.col("qt").cast("double")),
        6,
    )
    return (
        part.select(
            F.col("l_partkey").alias("p_partkey"),
            "n_suppliers",
            F.col("qt").cast("double").alias("total_qty"),
            hhi.alias("hhi"),
        )
        .orderBy(F.desc("hhi"), F.desc("total_qty"), "p_partkey")
        .limit(100)
    )


SUPPLIER_CONCENTRATION_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(28,2))) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
part AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(q) AS qt,
         SUM(CAST(CAST(q AS DOUBLE) * CAST(q AS DOUBLE) AS DECIMAL(38,6))) AS sq
  FROM ps GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, n_suppliers,
       CAST(qt AS DOUBLE) AS total_qty,
       ROUND(CAST(sq AS DOUBLE) / (CAST(qt AS DOUBLE) * CAST(qt AS DOUBLE)), 6)
         AS hhi
FROM part
ORDER BY hhi DESC, total_qty DESC, p_partkey
LIMIT 100
""".strip()

# --- Theil–Sen robust monthly trend -----------------------------------------


def theilsen_trend(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation Theil–Sen slope of monthly revenue — the robust twin
    of ``revenue_trend``'s OLS: the MEDIAN of all pairwise month-pair
    slopes (y2−y1)/(x2−x1), which a single promotional-spike month
    cannot drag the way it drags a least-squares fit (breakdown point
    ~29% vs 0%). Reading both panels side by side separates a real
    trend from one outlier month.

    Determinism: monthly y is an exact DECIMAL sum and x an integer
    month index, so every pairwise slope is the same double in both
    engines; the median is picked positionally (row_number over the
    sorted slopes, average of the two middles for even counts), not via
    an engine-specific percentile implementation.

    Scale: the pair join is per-nation over the MONTHLY aggregate —
    O(months²) pairs per nation (~3k for a 7-year corpus), never over
    raw orders; the heavy lifting stays in the one (nation, month)
    aggregation that ``revenue_trend`` already needs."""
    mo = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
            F.col("o_totalprice").cast("decimal(28,2)").alias("rev"),
        )
    )
    monthly = mo.groupBy("n_name", "m").agg(F.sum("rev").alias("y"))
    a = monthly.select("n_name", F.col("m").alias("x1"), F.col("y").alias("y1"))
    b = monthly.select(
        F.col("n_name").alias("n2"), F.col("m").alias("x2"), F.col("y").alias("y2")
    )
    slopes = (
        a.join(b, (F.col("n_name") == F.col("n2")) & (F.col("x1") < F.col("x2")))
        .select(
            "n_name",
            "x1",
            "x2",
            (
                (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("x2") - F.col("x1")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("n_name").orderBy("slope", "x1", "x2")
    ranked = slopes.select(
        "n_name",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("n_name")).alias("m_pairs"),
    )
    lo = F.floor((F.col("m_pairs") + 1) / 2)
    hi = F.floor(F.col("m_pairs") / 2) + 1
    return (
        ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy("n_name")
        .agg(
            F.max("m_pairs").cast("bigint").alias("n_pairs"),
            F.round(F.avg("slope"), 6).alias("theilsen_slope_per_month"),
        )
        .orderBy("n_name")
    )


THEILSEN_TREND_SQL = """
WITH mo AS (
  SELECT n.n_name,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
         CAST(o.o_totalprice AS DECIMAL(28,2)) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
monthly AS (
  SELECT n_name, m, SUM(rev) AS y FROM mo GROUP BY n_name, m
),
slopes AS (
  SELECT a.n_name, a.m AS x1, b.m AS x2,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.m - a.m AS DOUBLE) AS slope
  FROM monthly a JOIN monthly b
    ON a.n_name = b.n_name AND a.m < b.m
),
ranked AS (
  SELECT n_name, slope,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY slope, x1, x2) AS rn,
         COUNT(*) OVER (PARTITION BY n_name) AS m_pairs
  FROM slopes
)
SELECT n_name,
       CAST(MAX(m_pairs) AS BIGINT) AS n_pairs,
       ROUND(AVG(slope), 6) AS theilsen_slope_per_month
FROM ranked
WHERE rn = FLOOR((m_pairs + 1) / 2) OR rn = FLOOR(m_pairs / 2) + 1
GROUP BY n_name
ORDER BY n_name
""".strip()

# --- Benford first-digit audit ----------------------------------------------

# log10(1 + 1/d) injected as LITERALS in both engines so the check never
# depends on two libm log10 implementations agreeing to the last bit.
BENFORD_SHARES = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def benford_digits(orders: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit of order totals: the observed
    share of each leading digit 1–9 against the Benford expectation
    log10(1+1/d) — the classic forensic-accounting screen for invented
    or systematically rounded amounts (fabricated numbers over-sample
    digits 5–9). A fraud/DQ panel, not a distribution test: the panel
    reports the per-digit excess and leaves the alarm threshold to the
    reader.

    The leading digit is extracted through integer/string arithmetic
    (floor → bigint → first character), NOT floor(p/10^floor(log10 p)),
    whose double log10 can land on 2.9999…96 at exact powers of ten and
    misclassify a digit differently per engine. Prices are >= 1 in this
    schema, so the integer part always has a first digit.

    Scale: one scan, one 9-group aggregation, a broadcast join against
    a 9-row literal spine so absent digits still report 0."""
    spark = orders.sparkSession
    spine = spark.createDataFrame(
        [(d, BENFORD_SHARES[d]) for d in range(1, 10)],
        "digit int, benford_share double",
    )
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    tot = F.broadcast(obs.agg(F.sum("n_orders").alias("n_total")))
    return (
        F.broadcast(spine)
        .join(obs, "digit", "left")
        .join(tot)
        .select(
            "digit",
            F.coalesce(F.col("n_orders"), F.lit(0).cast("bigint")).alias("n_orders"),
            F.round(
                F.coalesce(F.col("n_orders"), F.lit(0)) / F.col("n_total").cast("double"), 6
            ).alias("obs_share"),
            "benford_share",
            F.round(
                F.coalesce(F.col("n_orders"), F.lit(0)) / F.col("n_total").cast("double")
                - F.col("benford_share"),
                6,
            ).alias("excess"),
        )
        .orderBy("digit")
    )


BENFORD_DIGITS_SQL = f"""
WITH spine AS (
  SELECT d AS digit, s AS benford_share FROM (VALUES
    {", ".join(f"({d}, {BENFORD_SHARES[d]})" for d in range(1, 10))}
  ) AS t(d, s)
),
obs AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_totalprice >= 1
  GROUP BY 1
),
tot AS (SELECT SUM(n_orders) AS n_total FROM obs)
SELECT spine.digit,
       COALESCE(obs.n_orders, 0) AS n_orders,
       ROUND(COALESCE(obs.n_orders, 0) / CAST(tot.n_total AS DOUBLE), 6) AS obs_share,
       spine.benford_share,
       ROUND(COALESCE(obs.n_orders, 0) / CAST(tot.n_total AS DOUBLE)
             - spine.benford_share, 6) AS excess
FROM spine LEFT JOIN obs ON spine.digit = obs.digit, tot
ORDER BY spine.digit
""".strip()

# --- revenue concentration: Gini / Lorenz -----------------------------------


def revenue_gini(orders: DataFrame) -> DataFrame:
    """Customer revenue concentration in one row: the Gini coefficient
    of per-customer lifetime spend (0 = perfectly equal, → 1 = one
    whale) plus the top-10% revenue share — the headline numbers over
    the Lorenz curve that ``customer_ltv_deciles`` tabulates. The
    account-concentration risk metric beside ``supplier_concentration``'s
    per-part HHI.

    Gini from the rank identity G = 2·Σ(i·yᵢ)/(n·Σy) − (n+1)/n with y
    ascending: Σ(i·yᵢ) accumulates in DECIMAL (rank × exact decimal
    spend), so the statistic is order-independent; rank permutations
    inside tied y values leave Σ(i·yᵢ) unchanged (equal y ⇒ y·Σi), so
    the custkey tie-break is cosmetic, not load-bearing.

    Scale: the ranking runs over the per-customer AGGREGATE (card.
    |customers| ≪ |orders|) through ``exact_row_number``'s two-phase
    range-partitioned rank — no single-partition window anywhere; the
    final reduce is one 1-row aggregation."""
    from .analytics import exact_row_number

    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("y")
    )
    ranked, total = exact_row_number(spend, ["y", "o_custkey"], "rnk")
    k_top = (total + 9) // 10  # ceil(n/10) customers form the top decile
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("y").alias("t"),
        F.sum(F.col("y") * F.col("rnk").cast("decimal(12,0)")).alias("s_iy"),
        F.sum(F.when(F.col("rnk") > total - k_top, F.col("y"))).alias("top_y"),
    )
    n = F.col("n_customers").cast("double")
    return agg.select(
        "n_customers",
        F.col("t").cast("double").alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.col("s_iy").cast("double")
            / (n * F.col("t").cast("double"))
            - (n + 1) / n,
            6,
        ).alias("gini"),
        F.round(F.col("top_y").cast("double") / F.col("t").cast("double"), 6).alias(
            "top10pct_share"
        ),
    )


REVENUE_GINI_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS y
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY y, o_custkey) AS rnk,
         COUNT(*) OVER () AS n
  FROM spend
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(y) AS t,
         SUM(y * CAST(rnk AS DECIMAL(12,0))) AS s_iy,
         SUM(CASE WHEN rnk > n - CAST(FLOOR((n + 9) / 10) AS BIGINT)
                  THEN y END) AS top_y
  FROM ranked
)
SELECT n_customers,
       CAST(t AS DOUBLE) AS total_revenue,
       ROUND(2.0 * CAST(s_iy AS DOUBLE)
               / (CAST(n_customers AS DOUBLE) * CAST(t AS DOUBLE))
             - (CAST(n_customers AS DOUBLE) + 1) / CAST(n_customers AS DOUBLE),
             6) AS gini,
       ROUND(CAST(top_y AS DOUBLE) / CAST(t AS DOUBLE), 6) AS top10pct_share
FROM agg
""".strip()

# --- Pareto skyline: price vs size ------------------------------------------


def part_pareto_front(part: DataFrame) -> DataFrame:
    """2-D skyline (Pareto frontier) of the part catalog: every part
    for which no other part is simultaneously no-more-expensive and
    no-smaller (with at least one strict) — the "efficient frontier"
    query shape (Börzsönyi et al., ICDE 2001) a buyer reads as "the
    only rational price points". Minimize p_retailprice, maximize
    p_size.

    Sort-based skyline: collapse to one (price → max size, count) row
    per distinct price, order by price, and a part is dominated iff a
    STRICTLY cheaper price has already shown a ≥ size (running max via
    lag) or its own price point has a > size. Two window passes over
    the per-price aggregate — never a pairwise NOT-EXISTS join.

    Scale: the windows run on the distinct-price aggregate (≪ |part|);
    at extreme scale the running max distributes the same way
    ``exact_row_number`` does (range-partition by price, per-partition
    running max, broadcast per-partition maxima as offsets) — the
    documented swap-in, same two-phase discipline."""
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("mx_size")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_prices = per_price.withColumn(
        "mx_cheaper", F.max("mx_size").over(w)
    )
    parts = part.join(
        F.broadcast(frontier_prices), "p_retailprice"
    ).filter(
        (F.col("mx_cheaper").isNull() | (F.col("mx_cheaper") < F.col("p_size")))
        & (F.col("p_size") == F.col("mx_size"))
    )
    return parts.select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    ).orderBy("p_retailprice", "p_partkey")


PART_PARETO_FRONT_SQL = """
WITH per_price AS (
  SELECT p_retailprice, MAX(p_size) AS mx_size
  FROM part GROUP BY p_retailprice
),
fp AS (
  SELECT p_retailprice, mx_size,
         MAX(mx_size) OVER (ORDER BY p_retailprice
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS mx_cheaper
  FROM per_price
)
SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
FROM part p JOIN fp ON p.p_retailprice = fp.p_retailprice
WHERE (fp.mx_cheaper IS NULL OR fp.mx_cheaper < p.p_size)
  AND p.p_size = fp.mx_size
ORDER BY p.p_retailprice, p.p_partkey
""".strip()


DUPINV_PRICE_TOL = 0.01  # relative total-price tolerance (1%)
DUPINV_DAYS = 7


def duplicate_invoices(orders: DataFrame) -> DataFrame:
    """Duplicate-submission detection over STRUCTURED records — the
    entity-resolution twin of the text near-dup family: two orders by
    the SAME customer whose totals agree within 1% and whose order
    dates fall within 7 days are flagged as probable double entries
    (retry storms, double-clicks, replayed batches — the classic
    duplicate-invoice audit). Output: one row per flagged pair with
    the relative price gap and day gap, plus an exact_amount flag for
    the to-the-cent repeats that auto-void safely.

    Scale: candidates are BLOCKED on o_custkey (one shuffle; per-block
    pair volume is C(orders-per-customer, 2), bounded by customer
    activity, never |orders|²); the tolerance checks are map-side on
    the joined pairs. The same blocking discipline as the
    sorted-neighborhood text pass, applied to a dimension key."""
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast(DEC).alias("price"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
        F.col("a.price").alias("price_a"),
        F.col("b.price").alias("price_b"),
        F.datediff(F.col("b.d"), F.col("a.d")).alias("day_gap_signed"),
    )
    rel_gap = F.abs(
        F.col("price_a").cast("double") - F.col("price_b").cast("double")
    ) / F.greatest(F.col("price_a"), F.col("price_b")).cast("double")
    day_gap = F.abs(F.col("day_gap_signed"))
    return (
        pairs.filter(
            (rel_gap <= DUPINV_PRICE_TOL) & (day_gap <= DUPINV_DAYS)
        )
        .select(
            "custkey",
            "order_a",
            "order_b",
            # decimals leave the engine as ROUNDED DOUBLES: the harness
            # canonicalizer hashes pandas dtypes, and Spark DECIMAL
            # arrives as object vs DuckDB's float64
            F.round(F.col("price_a").cast("double"), 2).alias("price_a"),
            F.round(F.col("price_b").cast("double"), 2).alias("price_b"),
            F.round(rel_gap, 6).alias("rel_price_gap"),
            day_gap.cast("bigint").alias("day_gap"),
            (F.col("price_a") == F.col("price_b")).alias("exact_amount"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


DUPLICATE_INVOICES_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
),
pairs AS (
  SELECT a.o_custkey AS custkey,
         a.o_orderkey AS order_a, b.o_orderkey AS order_b,
         a.price AS price_a, b.price AS price_b,
         ABS(date_diff('day', a.d, b.d)) AS day_gap,
         ABS(CAST(a.price AS DOUBLE) - CAST(b.price AS DOUBLE))
           / CAST(GREATEST(a.price, b.price) AS DOUBLE) AS rel_gap
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
)
SELECT custkey, order_a, order_b,
       ROUND(CAST(price_a AS DOUBLE), 2) AS price_a,
       ROUND(CAST(price_b AS DOUBLE), 2) AS price_b,
       ROUND(rel_gap, 6) AS rel_price_gap,
       CAST(day_gap AS BIGINT) AS day_gap,
       price_a = price_b AS exact_amount
FROM pairs
WHERE rel_gap <= {DUPINV_PRICE_TOL} AND day_gap <= {DUPINV_DAYS}
ORDER BY custkey, order_a, order_b
""".strip()


def kaplan_meier(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """KAPLAN–MEIER estimator of order-fulfilment time WITH censoring
    — the survival-analysis member of the statistics family (beside
    Theil–Sen, Wilson, Cohen's d): fulfilled orders (status 'F')
    contribute an EVENT at T = days from order to last line shipment;
    open/partial orders (and orders with no lines yet) are CENSORED at
    the corpus's last observed ship date, exactly how a naive
    "average fulfilment time over completed orders" silently
    survivorship-biases low. One row per distinct event day: number at
    risk, events, censored, and the product-limit survival
    S(t) = Π(1 − dᵢ/nᵢ) computed as EXP(ΣLN(factor)) — the windowed
    running product both engines express identically (a zero factor,
    everyone-fulfils-at-the-last-day, short-circuits to 0 by flag, not
    LN(0)).

    Scale: one per-order MAX(shipdate) aggregation + a broadcast 1-row
    corpus max; the KM table itself is |distinct days| rows, and both
    running windows are over that bounded frame (allowlisted
    unpartitioned windows, same reasoning as the Zipf fit)."""
    ship = lineitem.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship")
    )
    corpus_max = F.broadcast(
        lineitem.agg(F.max(F.col("l_shipdate").cast("date")).alias("cmax"))
    )
    subj = (
        orders.select(
            "o_orderkey",
            F.col("o_orderstatus").alias("st"),
            F.col("o_orderdate").cast("date").alias("od"),
        )
        .join(ship, orders.o_orderkey == ship.l_orderkey, "left")
        .crossJoin(corpus_max)
        .select(
            F.when(
                (F.col("st") == "F") & F.col("last_ship").isNotNull(),
                F.datediff(F.col("last_ship"), F.col("od")),
            )
            .otherwise(F.datediff(F.col("cmax"), F.col("od")))
            .cast("bigint")
            .alias("t_days"),
            ((F.col("st") == "F") & F.col("last_ship").isNotNull())
            .alias("is_event"),
        )
    )
    per_t = subj.groupBy("t_days").agg(
        F.sum(F.col("is_event").cast("long")).cast("bigint").alias("d"),
        F.sum((~F.col("is_event")).cast("long")).cast("bigint").alias("c"),
    )
    w_rev = Window.orderBy("t_days").rowsBetween(0, Window.unboundedFollowing)
    w_cum = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, 0)
    factor = 1.0 - F.col("d") / F.col("n_risk").cast("double")
    return (
        per_t.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_rev))
        .withColumn("factor", factor)
        .withColumn("hit_zero", F.max((F.col("factor") == 0).cast("int")).over(w_cum))
        .withColumn(
            "survival",
            F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(F.log(F.col("factor"))).over(w_cum))
            ),
        )
        .filter(F.col("d") > 0)
        .select(
            "t_days",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored_same_day"),
            F.round("survival", 6).alias("survival"),
        )
        .orderBy("t_days")
    )


KAPLAN_MEIER_SQL = """
WITH ship AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
cm AS (SELECT MAX(CAST(l_shipdate AS DATE)) AS cmax FROM lineitem),
subj AS (
  SELECT CASE WHEN o.o_orderstatus = 'F' AND s.last_ship IS NOT NULL
              THEN date_diff('day', CAST(o.o_orderdate AS DATE), s.last_ship)
              ELSE date_diff('day', CAST(o.o_orderdate AS DATE), cm.cmax)
         END AS t_days,
         o.o_orderstatus = 'F' AND s.last_ship IS NOT NULL AS is_event
  FROM orders o
  LEFT JOIN ship s ON s.l_orderkey = o.o_orderkey
  CROSS JOIN cm
),
per_t AS (
  SELECT t_days,
         CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM subj GROUP BY t_days
),
km AS (
  SELECT t_days, d, c,
         SUM(d + c) OVER (ORDER BY t_days
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS n_risk
  FROM per_t
),
km2 AS (
  SELECT *, 1.0 - d / CAST(n_risk AS DOUBLE) AS factor FROM km
),
km3 AS (
  SELECT *,
         MAX(CASE WHEN factor = 0 THEN 1 ELSE 0 END)
           OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS hit_zero,
         SUM(LN(CASE WHEN factor = 0 THEN 1.0 ELSE factor END))
           OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS lnsum
  FROM km2
)
SELECT t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS n_events,
       c AS n_censored_same_day,
       ROUND(CASE WHEN hit_zero = 1 THEN 0.0 ELSE EXP(lnsum) END, 6) AS survival
FROM km3
WHERE d > 0
ORDER BY t_days
""".strip()


def leadtime_anova(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """One-way ANOVA of order→ship lead time across ORDER PRIORITIES —
    does stated priority actually explain delivery-speed variance, the
    F-statistic companion to the pairwise Cohen's d panel
    (``type_effect_sizes``). Sums of squares come from per-group exact
    moments (Σt, Σt², n over integer day counts — order-independent),
    so SSB/SSW and F = (SSB/(k−1)) / (SSW/(N−k)) hash-match without
    distributional tables (df are reported; the p-value lookup is a
    client-side concern, as with every test statistic here). One row:
    F, df, the η² effect size SSB/SST, and the grand mean.

    Scale: one broadcast of the orders (priority, date) projection
    onto lineitem, a k ≤ 5-group moment aggregation; everything after
    is arithmetic on a 5-row frame."""
    t = (
        F.col("l_shipdate").cast("date").cast("timestamp").cast("long")
        - F.col("o_orderdate").cast("date").cast("timestamp").cast("long")
    ) / F.lit(86400.0)
    per = (
        lineitem.join(
            orders.select(
                F.col("o_orderkey").alias("l_orderkey"),
                "o_orderdate",
                F.col("o_orderpriority").alias("mode"),
            ),
            "l_orderkey",
        )
        .select("mode", t.alias("t"))
        .groupBy("mode")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("t").alias("s1"),
            F.sum(F.col("t") * F.col("t")).alias("s2"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("nn"),
        F.sum("s1").alias("t1"),
        F.sum("s2").alias("t2"),
        F.count("*").cast("double").alias("k"),
    )
    joined = per.crossJoin(F.broadcast(tot))
    ssb = joined.agg(
        F.sum(
            (F.col("s1") / F.col("n") - F.col("t1") / F.col("nn"))
            * (F.col("s1") / F.col("n") - F.col("t1") / F.col("nn"))
            * F.col("n")
        ).alias("ssb")
    )
    return (
        tot.crossJoin(F.broadcast(ssb))
        .select(
            (F.col("t2") - F.col("t1") * F.col("t1") / F.col("nn")).alias("sst"),
            "ssb",
            "nn",
            "k",
            "t1",
        )
        .select(
            F.round(
                (F.col("ssb") / (F.col("k") - 1))
                / F.nullif(
                    (F.col("sst") - F.col("ssb")) / (F.col("nn") - F.col("k")),
                    F.lit(0.0),
                ),
                6,
            ).alias("f_stat"),
            (F.col("k") - 1).cast("bigint").alias("df_between"),
            (F.col("nn") - F.col("k")).cast("bigint").alias("df_within"),
            F.round(F.col("ssb") / F.nullif(F.col("sst"), F.lit(0.0)), 6).alias(
                "eta_squared"
            ),
            F.round(F.col("t1") / F.col("nn"), 6).alias("grand_mean_days"),
        )
    )


LEADTIME_ANOVA_SQL = """
WITH pg AS (
  SELECT o.o_orderpriority AS mode,
         CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) * 1.0) AS s1,
         SUM(POWER(date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) * 1.0, 2)) AS s2
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1
),
tot AS (
  SELECT SUM(n) AS nn, SUM(s1) AS t1, SUM(s2) AS t2,
         CAST(COUNT(*) AS DOUBLE) AS k
  FROM pg
),
ssb AS (
  SELECT SUM((pg.s1 / pg.n - tot.t1 / tot.nn)
             * (pg.s1 / pg.n - tot.t1 / tot.nn) * pg.n) AS ssb
  FROM pg, tot
)
SELECT ROUND((ssb.ssb / (tot.k - 1))
             / NULLIF(((tot.t2 - tot.t1 * tot.t1 / tot.nn) - ssb.ssb)
                      / (tot.nn - tot.k), 0), 6) AS f_stat,
       CAST(tot.k - 1 AS BIGINT) AS df_between,
       CAST(tot.nn - tot.k AS BIGINT) AS df_within,
       ROUND(ssb.ssb / NULLIF(tot.t2 - tot.t1 * tot.t1 / tot.nn, 0), 6)
         AS eta_squared,
       ROUND(tot.t1 / tot.nn, 6) AS grand_mean_days
FROM tot, ssb
""".strip()


def promo_did(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES panel for the PROMO part family — the
    causal-inference-shaped counterpart of q14's promo revenue share:
    split the corpus at its temporal midpoint (a deterministic
    data-derived cutoff, integer-day arithmetic in both engines) and
    compare how the average discounted line revenue of PROMO parts
    moved against non-PROMO parts across the two halves. DiD = (treated
    after − before) − (control after − before): the control difference
    absorbs market-wide drift that a naive before/after on PROMO alone
    would misattribute. Cell means come from DECIMAL-exact sums, so
    the 2×2 table and the estimate hash-match.

    Scale: one broadcast part-class join onto lineitem, one 4-cell
    aggregation — the panel is O(1) output regardless of corpus."""
    cls = F.broadcast(
        part.select(
            F.col("p_partkey").alias("l_partkey"),
            F.col("p_type").startswith("PROMO").alias("is_promo"),
        )
    )
    d = F.col("l_shipdate").cast("date")
    days = F.datediff(d, F.lit("1970-01-01").cast("date"))
    rng = lineitem.agg(
        F.min(days).alias("lo"), F.max(days).alias("hi")
    ).select(
        "lo", "hi", F.floor((F.col("lo") + F.col("hi")) / 2).alias("cut")
    )
    rev = (F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))).cast(
        "decimal(24,6)"
    )
    tagged = (
        lineitem.join(cls, "l_partkey")
        .crossJoin(F.broadcast(rng))
        .select(
            "is_promo",
            (days > F.col("cut")).alias("is_after"),
            rev.alias("rev"),
        )
    )

    def _cell(promo: bool, after: bool, what: str):
        cond = (F.col("is_promo") == promo) & (F.col("is_after") == after)
        if what == "n":
            return F.sum(cond.cast("long")).cast("bigint")
        return F.sum(F.when(cond, F.col("rev"))).cast("double") / F.sum(
            cond.cast("long")
        )

    agg = tagged.agg(
        _cell(True, False, "m").alias("promo_before_raw"),
        _cell(True, True, "m").alias("promo_after_raw"),
        _cell(False, False, "m").alias("other_before_raw"),
        _cell(False, True, "m").alias("other_after_raw"),
        (_cell(True, False, "n") + _cell(True, True, "n")).alias("n_promo"),
        (_cell(False, False, "n") + _cell(False, True, "n")).alias("n_other"),
    )
    return agg.select(
        F.round("promo_before_raw", 6).alias("promo_before"),
        F.round("promo_after_raw", 6).alias("promo_after"),
        F.round("other_before_raw", 6).alias("other_before"),
        F.round("other_after_raw", 6).alias("other_after"),
        "n_promo",
        "n_other",
        F.round(
            (F.col("promo_after_raw") - F.col("promo_before_raw"))
            - (F.col("other_after_raw") - F.col("other_before_raw")),
            6,
        ).alias("did_estimate"),
    )


PROMO_DID_SQL = """
WITH days AS (
  SELECT l.l_partkey,
         date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)) AS dd,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(24,6)) AS rev,
         p.p_type LIKE 'PROMO%' AS is_promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
rng AS (
  SELECT CAST(FLOOR((MIN(dd) + MAX(dd)) / 2.0) AS BIGINT) AS cut
  FROM (SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS dd
        FROM lineitem)
),
cells AS (
  SELECT is_promo, d.dd > r.cut AS is_after,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mean_rev
  FROM days d, rng r
  GROUP BY 1, 2
)
SELECT ROUND(pb.mean_rev, 6) AS promo_before,
       ROUND(pa.mean_rev, 6) AS promo_after,
       ROUND(ob.mean_rev, 6) AS other_before,
       ROUND(oa.mean_rev, 6) AS other_after,
       pa.n + pb.n AS n_promo,
       oa.n + ob.n AS n_other,
       ROUND((pa.mean_rev - pb.mean_rev) - (oa.mean_rev - ob.mean_rev), 6)
         AS did_estimate
FROM cells pa, cells pb, cells oa, cells ob
WHERE pa.is_promo AND pa.is_after AND pb.is_promo AND NOT pb.is_after
  AND NOT oa.is_promo AND oa.is_after AND NOT ob.is_promo AND NOT ob.is_after
""".strip()


# --- ABC x XYZ: revenue concentration x demand variability ------------------

XYZ_X, XYZ_Y = 0.5, 1.0  # weekly-demand CV cuts: X stable, Y variable, Z erratic


def abc_xyz(lineitem: DataFrame) -> DataFrame:
    """The ABC×XYZ inventory matrix: revenue concentration class (the
    ``abc_analysis`` Pareto cut) crossed with demand VARIABILITY class
    from the coefficient of variation of weekly shipped quantity —
    AX items (high value, stable demand) get tight reorder automation,
    CZ items (low value, erratic) get make-to-order. Weeks with zero
    demand count in the variance through the total-week denominator
    (zero weeks contribute 0 to Σq and Σq², so no per-part calendar
    gap-fill join is needed). All moments accumulate as DECIMAL and the
    CV is one fixed-association double expression, so the oracle
    hash-matches.

    Scale: two fact aggregations (per-part revenue; per-part-week
    quantity then per-part moments) + the catalog-sized ABC running
    window (same single-task bound as ``abc_analysis``); the week-count
    scalar broadcasts."""
    from pyspark.sql import Window

    rev = lineitem.groupBy("l_partkey").agg(F.sum(_rev()).alias("rev_dec"))
    total = rev.agg(F.sum("rev_dec").alias("_total"))
    w = Window.orderBy(F.desc("rev_dec"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    abc = (
        rev.join(F.broadcast(total))
        .withColumn("cum_dec", F.sum("rev_dec").over(w))
        .select(
            "l_partkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.round(
                F.col("cum_dec").cast("double") / F.col("_total").cast("double"), 6
            ).alias("cum_share"),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= ABC_A, "A")
            .when(F.col("cum_share") <= ABC_B, "B")
            .otherwise("C"),
        )
    )
    wk = (
        lineitem.select(
            "l_partkey",
            F.date_trunc("week", F.col("l_shipdate")).alias("wk"),
            F.col("l_quantity").cast("decimal(18,2)").alias("q"),
        )
        .groupBy("l_partkey", "wk")
        .agg(F.sum("q").cast("decimal(18,2)").alias("qd"))
    )
    nweeks = F.broadcast(
        wk.select("wk").distinct().agg(F.count("*").alias("n_weeks"))
    )
    mom = wk.groupBy("l_partkey").agg(
        F.sum("qd").alias("s_dec"),
        F.sum((F.col("qd") * F.col("qd")).cast("decimal(38,4)")).alias("ss_dec"),
        F.count("*").cast("bigint").alias("n_active_weeks"),
    )
    nn = F.col("n_weeks").cast("double")
    s = F.col("s_dec").cast("double")
    ss = F.col("ss_dec").cast("double")
    mean = s / nn
    var = (ss - s * s / nn) / (nn - F.lit(1.0))
    cv = F.sqrt(F.greatest(var, F.lit(0.0))) / F.nullif(mean, F.lit(0.0))
    xyz = (
        F.when(F.col("demand_cv") < XYZ_X, "X")
        .when(F.col("demand_cv") < XYZ_Y, "Y")
        .otherwise("Z")
    )
    return (
        mom.join(nweeks)
        .select(
            "l_partkey",
            "n_active_weeks",
            F.round(cv, 6).alias("demand_cv"),
        )
        .join(abc, "l_partkey")
        .withColumn("xyz_class", xyz)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "revenue",
            "abc_class",
            "n_active_weeks",
            "demand_cv",
            "xyz_class",
            F.concat(F.col("abc_class"), F.col("xyz_class")).alias("cell"),
        )
        .orderBy("p_partkey")
    )


ABC_XYZ_SQL = f"""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
  FROM lineitem GROUP BY l_partkey
),
abc AS (
  SELECT l_partkey,
         CAST(rev_dec AS DOUBLE) AS revenue,
         CASE WHEN ROUND(CAST(SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                         / CAST((SELECT SUM(rev_dec) FROM rev) AS DOUBLE), 6) <= {ABC_A} THEN 'A'
              WHEN ROUND(CAST(SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                         / CAST((SELECT SUM(rev_dec) FROM rev) AS DOUBLE), 6) <= {ABC_B} THEN 'B'
              ELSE 'C' END AS abc_class
  FROM rev
),
wk AS (
  SELECT l_partkey, date_trunc('week', l_shipdate) AS wk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS qd
  FROM lineitem GROUP BY 1, 2
),
nweeks AS (SELECT CAST(COUNT(DISTINCT wk) AS BIGINT) AS n_weeks FROM wk),
mom AS (
  SELECT l_partkey,
         SUM(qd) AS s_dec,
         SUM(CAST(qd * qd AS DECIMAL(38,4))) AS ss_dec,
         CAST(COUNT(*) AS BIGINT) AS n_active_weeks
  FROM wk GROUP BY 1
),
cvt AS (
  SELECT m.l_partkey, m.n_active_weeks,
         ROUND(SQRT(GREATEST((CAST(m.ss_dec AS DOUBLE)
                              - CAST(m.s_dec AS DOUBLE) * CAST(m.s_dec AS DOUBLE)
                                / CAST(n.n_weeks AS DOUBLE))
                             / (CAST(n.n_weeks AS DOUBLE) - 1.0), 0.0))
               / NULLIF(CAST(m.s_dec AS DOUBLE) / CAST(n.n_weeks AS DOUBLE), 0.0), 6)
           AS demand_cv
  FROM mom m CROSS JOIN nweeks n
)
SELECT c.l_partkey AS p_partkey, a.revenue, a.abc_class,
       c.n_active_weeks, c.demand_cv,
       CASE WHEN c.demand_cv < {XYZ_X} THEN 'X'
            WHEN c.demand_cv < {XYZ_Y} THEN 'Y'
            ELSE 'Z' END AS xyz_class,
       a.abc_class || CASE WHEN c.demand_cv < {XYZ_X} THEN 'X'
                           WHEN c.demand_cv < {XYZ_Y} THEN 'Y'
                           ELSE 'Z' END AS cell
FROM cvt c JOIN abc a ON a.l_partkey = c.l_partkey
ORDER BY p_partkey
""".strip()


# --- safety stock / reorder point (classic inventory control) ---------------

SAFETY_Z = 1.645  # one-sided 95% cycle-service-level z
SAFETY_MIN_DAYS = 5  # parts need >=5 demand days and >=5 order lines
SAFETY_MIN_LINES = 5
SAFETY_TOP = 100


def part_safety_stock(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Per-part safety stock and reorder point under stochastic demand
    AND stochastic lead time — the inventory-control readout a
    logistics warehouse sets its replenishment triggers from:
    SS = z·sqrt(μ_L·σ_D² + μ_D²·σ_L²), ROP = μ_D·μ_L + SS, with daily
    demand moments from the per-(part, ship-day) quantity series and
    lead-time moments from the order→ship gap per line. Quantities
    accumulate as DECIMAL and lead gaps as INTEGER epoch seconds, so
    every moment is order-independent and the engines agree
    bit-for-bit; only the final sqrt/round runs in doubles (identical
    expression shape both sides).

    Scale: one order-key fact join (the orders side projected to two
    columns before the shuffle), ONE combined (part, day) pre-aggregate
    that carries demand and lead moments together (map-side partials),
    then a part-keyed rollup — the big table is read once."""
    q = F.col("l_quantity").cast("decimal(18,2)")
    lead_s = (
        F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")
    ).cast("bigint")
    day = F.to_date("l_shipdate")
    per_day = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_partkey", day.alias("d"), q.alias("q"), lead_s.alias("ls"))
        .groupBy("l_partkey", "d")
        .agg(
            F.sum("q").cast("decimal(18,2)").alias("dq"),
            F.sum("ls").alias("l1"),
            F.sum(F.col("ls") * F.col("ls")).alias("l2"),
            F.count("*").cast("bigint").alias("nl"),
        )
    )
    per_part = per_day.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("dq").alias("sd1"),
        F.sum((F.col("dq") * F.col("dq")).cast("decimal(38,4)")).alias("sd2"),
        F.sum("l1").alias("sl1"),
        F.sum("l2").alias("sl2"),
        F.sum("nl").alias("n_li"),
    )
    nd = F.col("n_days").cast("double")
    nli = F.col("n_li").cast("double")
    sd1, sd2 = F.col("sd1").cast("double"), F.col("sd2").cast("double")
    sl1, sl2 = F.col("sl1").cast("double"), F.col("sl2").cast("double")
    mu_d = sd1 / nd
    var_d = (sd2 - sd1 * sd1 / nd) / (nd - F.lit(1.0))
    mu_l = sl1 / nli / F.lit(86400.0)
    var_l = (sl2 - sl1 * sl1 / nli) / (nli - F.lit(1.0)) / F.lit(86400.0) / F.lit(
        86400.0
    )
    ss = F.lit(SAFETY_Z) * F.sqrt(
        F.greatest(mu_l * var_d + mu_d * mu_d * var_l, F.lit(0.0))
    )
    rop = mu_d * mu_l + ss
    return (
        per_part.filter(
            (F.col("n_days") >= SAFETY_MIN_DAYS) & (F.col("n_li") >= SAFETY_MIN_LINES)
        )
        .select(
            "l_partkey",
            "n_days",
            "n_li",
            F.round(mu_d, 6).alias("mu_demand"),
            F.round(F.sqrt(F.greatest(var_d, F.lit(0.0))), 6).alias("sd_demand"),
            F.round(mu_l, 6).alias("mu_lead_days"),
            F.round(F.sqrt(F.greatest(var_l, F.lit(0.0))), 6).alias("sd_lead_days"),
            F.round(ss, 6).alias("safety_stock"),
            F.round(rop, 6).alias("reorder_point"),
        )
        .orderBy(F.col("reorder_point").desc(), "l_partkey")
        .limit(SAFETY_TOP)
    )


PART_SAFETY_STOCK_SQL = f"""
WITH per_day AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS dq,
         SUM(CAST(floor(epoch(l_shipdate)) AS BIGINT)
             - CAST(floor(epoch(o_orderdate)) AS BIGINT)) AS l1,
         SUM((CAST(floor(epoch(l_shipdate)) AS BIGINT)
              - CAST(floor(epoch(o_orderdate)) AS BIGINT))
             * (CAST(floor(epoch(l_shipdate)) AS BIGINT)
                - CAST(floor(epoch(o_orderdate)) AS BIGINT))) AS l2,
         CAST(COUNT(*) AS BIGINT) AS nl
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(dq) AS sd1,
         SUM(CAST(dq * dq AS DECIMAL(38,4))) AS sd2,
         SUM(l1) AS sl1, SUM(l2) AS sl2,
         CAST(SUM(nl) AS BIGINT) AS n_li
  FROM per_day GROUP BY 1
),
d AS (
  SELECT l_partkey, n_days, n_li,
         CAST(sd1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS mu_d,
         (CAST(sd2 AS DOUBLE) - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE)
                                / CAST(n_days AS DOUBLE))
           / (CAST(n_days AS DOUBLE) - 1.0) AS var_d,
         CAST(sl1 AS DOUBLE) / CAST(n_li AS DOUBLE) / 86400.0 AS mu_l,
         (CAST(sl2 AS DOUBLE) - CAST(sl1 AS DOUBLE) * CAST(sl1 AS DOUBLE)
                                / CAST(n_li AS DOUBLE))
           / (CAST(n_li AS DOUBLE) - 1.0) / 86400.0 / 86400.0 AS var_l
  FROM per_part
  WHERE n_days >= {SAFETY_MIN_DAYS} AND n_li >= {SAFETY_MIN_LINES}
),
t AS (
  SELECT l_partkey, n_days, n_li, mu_d, var_d, mu_l, var_l,
         {SAFETY_Z} * SQRT(GREATEST(mu_l * var_d + mu_d * mu_d * var_l, 0.0)) AS ss
  FROM d
)
SELECT l_partkey, n_days, n_li,
       ROUND(mu_d, 6) AS mu_demand,
       ROUND(SQRT(GREATEST(var_d, 0.0)), 6) AS sd_demand,
       ROUND(mu_l, 6) AS mu_lead_days,
       ROUND(SQRT(GREATEST(var_l, 0.0)), 6) AS sd_lead_days,
       ROUND(ss, 6) AS safety_stock,
       ROUND(mu_d * mu_l + ss, 6) AS reorder_point
FROM t
ORDER BY reorder_point DESC, l_partkey
LIMIT {SAFETY_TOP}
""".strip()


# --- Croston intermittent-demand forecast ------------------------------------

CROSTON_K = 16  # exponential-smoothing memory: last K demand events
CROSTON_MIN_DAYS = 4
# alpha = 1/2 makes every smoothing weight 2^-j an EXACT decimal
# (scale 16 covers 2^-16), so both engines accumulate identical
# decimals — the same trick that keeps the other iterative oracles
# bit-exact. The weight table is generated once here and interpolated
# into BOTH the broadcast join frame and the SQL twin.
_CROSTON_W = [(j, f"{2**-j:.16f}") for j in range(1, CROSTON_K + 1)]


def croston_forecast(lineitem: DataFrame) -> DataFrame:
    """Croston's method for INTERMITTENT demand (the spare-parts
    forecasting standard: SES over the nonzero demand SIZES and,
    separately, over the INTER-demand GAPS; forecast per day =
    smoothed size / smoothed gap). Classic SES is a sequential
    recursion; with alpha = 1/2 it telescopes into a 2^-j-weighted sum
    over the last K demand events, which is a bounded window + one
    broadcast weight join — fully parallel, no per-part sequential
    state, and exact DECIMAL arithmetic end-to-end (the finite-window
    variant normalizes by the realized weight mass, so truncation is
    principled, not silent).

    Scale: one (part, day) pre-aggregate, one part-keyed window for
    recency ranks and gaps, a 16-row broadcast weight join, one final
    rollup — shuffle count independent of history length."""
    from pyspark.sql import Window

    q = F.col("l_quantity").cast("decimal(12,2)")
    per_day = (
        lineitem.select("l_partkey", F.to_date("l_shipdate").alias("d"), q.alias("q"))
        .groupBy("l_partkey", "d")
        .agg(F.sum("q").cast("decimal(12,2)").alias("dq"))
    )
    w_part = Window.partitionBy("l_partkey").orderBy(F.col("d").desc())
    w_gap = Window.partitionBy("l_partkey").orderBy("d")
    ranked = per_day.select(
        "l_partkey",
        "dq",
        F.row_number().over(w_part).alias("rn"),
        F.datediff(F.col("d"), F.lag("d").over(w_gap))
        .cast("decimal(6,0)")
        .alias("gap_d"),
    ).filter(F.col("rn") <= CROSTON_K)
    spark = lineitem.sparkSession
    weights = F.broadcast(
        spark.createDataFrame(
            [(j, w) for j, w in _CROSTON_W], "rn int, w_str string"
        ).select("rn", F.col("w_str").cast("decimal(18,16)").alias("w"))
    )
    joined = ranked.join(weights, "rn")
    agg = joined.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum((F.col("dq") * F.col("w"))).alias("zw"),
        F.sum("w").alias("sw_z"),
        F.sum(F.when(F.col("gap_d").isNotNull(), F.col("gap_d") * F.col("w"))).alias(
            "pw"
        ),
        F.sum(F.when(F.col("gap_d").isNotNull(), F.col("w"))).alias("sw_p"),
    )
    z = F.col("zw").cast("double") / F.col("sw_z").cast("double")
    p = F.col("pw").cast("double") / F.col("sw_p").cast("double")
    return (
        agg.filter(F.col("n_days") >= CROSTON_MIN_DAYS)
        .select(
            "l_partkey",
            "n_days",
            F.round(z, 6).alias("z_demand"),
            F.round(p, 6).alias("p_interval_days"),
            F.round(z / p, 6).alias("croston_per_day"),
        )
        .orderBy("l_partkey")
    )


CROSTON_SQL = f"""
WITH per_day AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS dq
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, dq,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY d DESC) AS rn,
         -- width 19 forces DuckDB's int128 multiply path (a width-18
         -- operand times the scale-16 weight overflows the int64 path)
         CAST(date_diff('day', LAG(d) OVER (PARTITION BY l_partkey ORDER BY d), d)
              AS DECIMAL(19,0)) AS gap_d
  FROM per_day
),
weights(rn, w) AS (
  VALUES {", ".join(f"({j}, CAST('{w}' AS DECIMAL(18,16)))" for j, w in _CROSTON_W)}
),
agg AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(dq * w) AS zw,
         SUM(w) AS sw_z,
         SUM(CASE WHEN gap_d IS NOT NULL THEN gap_d * w END) AS pw,
         SUM(CASE WHEN gap_d IS NOT NULL THEN w END) AS sw_p
  FROM ranked JOIN weights USING (rn)
  WHERE rn <= {CROSTON_K}
  GROUP BY 1
)
SELECT l_partkey, n_days,
       ROUND(CAST(zw AS DOUBLE) / CAST(sw_z AS DOUBLE), 6) AS z_demand,
       ROUND(CAST(pw AS DOUBLE) / CAST(sw_p AS DOUBLE), 6) AS p_interval_days,
       ROUND((CAST(zw AS DOUBLE) / CAST(sw_z AS DOUBLE))
             / (CAST(pw AS DOUBLE) / CAST(sw_p AS DOUBLE)), 6) AS croston_per_day
FROM agg
WHERE n_days >= {CROSTON_MIN_DAYS}
ORDER BY l_partkey
""".strip()


# --- Little's law WIP sweep ---------------------------------------------------


def wip_sweep(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Queueing panel over the order lifecycle: each order is OPEN from
    its order day to its last ship day; the classic ±1 interval sweep
    (+1 on open, −1 the day after close) integrates the work-in-process
    curve, giving avg WIP (L), peak WIP, arrival rate (λ = orders/span)
    and mean time-in-system (W). Little's law L = λ·W is an algebraic
    identity of this construction — the panel computes L from the SWEEP
    and λ·W from per-order DURATIONS independently and reports the gap,
    so a single misplaced delta breaks the hash AND the identity.

    Scale: deltas pre-aggregate to |distinct days| rows (two map-side
    counts), so the only window runs over a calendar-sized frame — the
    raw fact table never meets a global sort; durations are one
    order-keyed aggregation.

    All accumulation is integer (day counts); doubles only in the final
    three divisions, identical shapes both engines."""
    from pyspark.sql import Window

    close = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("close_d")
    )
    spans = orders.select(
        "o_orderkey", F.to_date("o_orderdate").alias("open_d")
    ).join(close, F.col("o_orderkey") == F.col("l_orderkey"))
    deltas = (
        spans.select(F.col("open_d").alias("d"), F.lit(1).alias("delta"))
        .unionByName(
            spans.select(
                F.date_add("close_d", 1).alias("d"), F.lit(-1).alias("delta")
            )
        )
        .groupBy("d")
        .agg(F.sum("delta").cast("bigint").alias("net"))
    )
    w_t = Window.orderBy("d")
    curve = deltas.select(
        "d",
        F.sum("net").over(w_t).alias("wip"),
        F.datediff(F.lead("d", 1).over(w_t), F.col("d")).alias("hold_days"),
    )
    sweep = curve.agg(
        F.sum(F.col("wip") * F.coalesce(F.col("hold_days"), F.lit(0)))
        .cast("bigint")
        .alias("wip_day_sum"),
        F.max("wip").cast("bigint").alias("max_wip"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span_days"),
    )
    dur = spans.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.datediff("close_d", "open_d") + F.lit(1))
        .cast("bigint")
        .alias("dur_day_sum"),
    )
    j = dur.crossJoin(F.broadcast(sweep))
    span = F.nullif(F.col("span_days").cast("double"), F.lit(0.0))
    lam = F.col("n_orders").cast("double") / span
    w_mean = F.col("dur_day_sum").cast("double") / F.col("n_orders").cast("double")
    l_avg = F.col("wip_day_sum").cast("double") / span
    return j.select(
        "n_orders",
        "span_days",
        "max_wip",
        F.round(lam, 6).alias("lambda_per_day"),
        F.round(w_mean, 6).alias("w_days"),
        F.round(l_avg, 6).alias("l_avg_wip"),
        F.round(l_avg - lam * w_mean, 9).alias("littles_gap"),
    )


WIP_SWEEP_SQL = """
WITH close AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_d
  FROM lineitem GROUP BY 1
),
spans AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS open_d, close_d
  FROM orders JOIN close ON o_orderkey = l_orderkey
),
deltas AS (
  SELECT d, CAST(SUM(delta) AS BIGINT) AS net
  FROM (
    SELECT open_d AS d, 1 AS delta FROM spans
    UNION ALL
    SELECT close_d + 1 AS d, -1 AS delta FROM spans
  ) GROUP BY 1
),
curve AS (
  SELECT d,
         SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS wip,
         date_diff('day', d, LEAD(d, 1) OVER (ORDER BY d)) AS hold_days
  FROM deltas
),
sweep AS (
  SELECT CAST(SUM(wip * COALESCE(hold_days, 0)) AS BIGINT) AS wip_day_sum,
         CAST(MAX(wip) AS BIGINT) AS max_wip,
         CAST(date_diff('day', MIN(d), MAX(d)) AS BIGINT) AS span_days
  FROM curve
),
dur AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(date_diff('day', open_d, close_d) + 1) AS BIGINT) AS dur_day_sum
  FROM spans
)
SELECT n_orders, span_days, max_wip,
       ROUND(CAST(n_orders AS DOUBLE) / NULLIF(CAST(span_days AS DOUBLE), 0.0), 6)
         AS lambda_per_day,
       ROUND(CAST(dur_day_sum AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS w_days,
       ROUND(CAST(wip_day_sum AS DOUBLE) / NULLIF(CAST(span_days AS DOUBLE), 0.0), 6)
         AS l_avg_wip,
       ROUND(CAST(wip_day_sum AS DOUBLE) / NULLIF(CAST(span_days AS DOUBLE), 0.0)
             - (CAST(n_orders AS DOUBLE) / NULLIF(CAST(span_days AS DOUBLE), 0.0))
               * (CAST(dur_day_sum AS DOUBLE) / CAST(n_orders AS DOUBLE)), 9)
         AS littles_gap
FROM dur CROSS JOIN sweep
""".strip()


# --- newsvendor critical-fractile stocking ------------------------------------

NV_UNDERAGE = 2.0  # lost margin per unit short
NV_OVERAGE = 1.0  # holding/markdown cost per unit over
NV_FRACTILE = NV_UNDERAGE / (NV_UNDERAGE + NV_OVERAGE)  # 2/3 service level
NV_MIN_DAYS = 5
NV_TOP = 100


def newsvendor_stock(lineitem: DataFrame) -> DataFrame:
    """Newsvendor critical-fractile stocking per part: the optimal
    single-period stock is the demand distribution's quantile at
    cu/(cu+co) — the NONPARAMETRIC twin of ``part_safety_stock``
    (that key assumes normal demand and buys a z-margin; this one
    reads the empirical daily-demand distribution directly, which is
    what you do when demand is lumpy enough that Croston flagged it).
    Reports the fractile stock beside the mean and the empirical
    P(demand > stock) realized on the observed days.

    Scale: one (part, day) pre-aggregate, one part-keyed exact
    percentile (approx_percentile at 100 TB), one conditional count —
    the fact table is read once."""
    q = F.col("l_quantity").cast("decimal(12,2)")
    per_day = (
        lineitem.select("l_partkey", F.to_date("l_shipdate").alias("d"), q.alias("q"))
        .groupBy("l_partkey", "d")
        .agg(F.sum("q").cast("decimal(12,2)").alias("dq"))
    )
    agg = per_day.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("dq").alias("s"),
        F.expr(f"percentile(CAST(dq AS DOUBLE), {NV_FRACTILE!r})").alias("stock"),
    )
    # realized stockout frequency at the chosen stock level
    so = (
        per_day.join(
            agg.select("l_partkey", "stock"), "l_partkey"
        )
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("dq").cast("double") > F.col("stock")).cast("int"))
            .cast("bigint")
            .alias("n_stockout_days")
        )
    )
    return (
        agg.join(so, "l_partkey")
        .filter(F.col("n_days") >= NV_MIN_DAYS)
        .select(
            "l_partkey",
            "n_days",
            F.round(
                F.col("s").cast("double") / F.col("n_days").cast("double"), 6
            ).alias("mean_demand"),
            F.round(F.col("stock"), 6).alias("fractile_stock"),
            "n_stockout_days",
            F.round(
                F.col("n_stockout_days").cast("double")
                / F.col("n_days").cast("double"),
                6,
            ).alias("stockout_rate"),
        )
        .orderBy(F.col("fractile_stock").desc(), "l_partkey")
        .limit(NV_TOP)
    )


NEWSVENDOR_SQL = f"""
WITH per_day AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(12,2)) AS dq
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(dq) AS s,
         quantile_cont(CAST(dq AS DOUBLE), {NV_FRACTILE!r}) AS stock
  FROM per_day GROUP BY 1
),
so AS (
  SELECT p.l_partkey,
         CAST(SUM(CASE WHEN CAST(p.dq AS DOUBLE) > a.stock THEN 1 ELSE 0 END)
              AS BIGINT) AS n_stockout_days
  FROM per_day p JOIN agg a ON p.l_partkey = a.l_partkey
  GROUP BY 1
)
SELECT a.l_partkey, a.n_days,
       ROUND(CAST(a.s AS DOUBLE) / CAST(a.n_days AS DOUBLE), 6) AS mean_demand,
       ROUND(a.stock, 6) AS fractile_stock,
       so.n_stockout_days,
       ROUND(CAST(so.n_stockout_days AS DOUBLE) / CAST(a.n_days AS DOUBLE), 6)
         AS stockout_rate
FROM agg a JOIN so ON a.l_partkey = so.l_partkey
WHERE a.n_days >= {NV_MIN_DAYS}
ORDER BY fractile_stock DESC, a.l_partkey
LIMIT {NV_TOP}
""".strip()


# --- price elasticity from discount variation -----------------------------------


def price_elasticity(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Per-brand price elasticity of demand, identified from DISCOUNT
    variation: OLS of ln(quantity) on ln(1 − discount) over order
    lines — the discount moves the effective price while the list
    price stays put, which is the cleanest natural experiment a
    transactional dataset carries (elasticity reads directly as the
    slope; ~0 on synthetic data is itself the correct finding and the
    panel's null report). Log terms are rounded to 9 dp and summed as
    DECIMAL (the zipf/retention ln-OLS discipline), so both engines
    regress on identical moments.

    Scale: one broadcast dim join (brand), one conditional-moment
    aggregation — the fact table is read once; the regression algebra
    runs on |brands| rows."""
    pl = lineitem.filter(F.col("l_discount") < 1.0).join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    x = F.log(F.lit(1.0) - F.col("l_discount").cast("double"))
    y = F.log(F.col("l_quantity").cast("double"))
    pts = pl.select(
        "p_brand",
        F.round(x, 9).cast("decimal(28,9)").alias("x"),
        F.round(y, 9).cast("decimal(28,9)").alias("y"),
        F.round(x * x, 9).cast("decimal(38,9)").alias("xx"),
        F.round(x * y, 9).cast("decimal(38,9)").alias("xy"),
    )
    m = pts.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xx").alias("sxx"),
        F.sum("xy").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (sxy - sx * sy / n) / F.nullif(sxx - sx * sx / n, F.lit(0.0))
    return m.select(
        "p_brand",
        "n",
        F.round(slope, 6).alias("elasticity"),
        F.round((sy - slope * sx) / n, 6).alias("log_intercept"),
    ).orderBy("p_brand")


PRICE_ELASTICITY_SQL = """
WITH pts AS (
  SELECT p.p_brand,
         CAST(ROUND(ln(1.0 - CAST(l.l_discount AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS x,
         CAST(ROUND(ln(CAST(l.l_quantity AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS y,
         CAST(ROUND(ln(1.0 - CAST(l.l_discount AS DOUBLE))
                    * ln(1.0 - CAST(l.l_discount AS DOUBLE)), 9)
              AS DECIMAL(38,9)) AS xx,
         CAST(ROUND(ln(1.0 - CAST(l.l_discount AS DOUBLE))
                    * ln(CAST(l.l_quantity AS DOUBLE)), 9)
              AS DECIMAL(38,9)) AS xy
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_discount < 1.0
),
m AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(xx) AS sxx, SUM(xy) AS sxy
  FROM pts GROUP BY 1
)
SELECT p_brand, n,
       ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                    / CAST(n AS DOUBLE))
             / NULLIF(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                            / CAST(n AS DOUBLE), 0.0), 6)
         AS elasticity,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                        / CAST(n AS DOUBLE))
                 / NULLIF(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                                                * CAST(sx AS DOUBLE)
                                                / CAST(n AS DOUBLE), 0.0))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS log_intercept
FROM m
ORDER BY p_brand
""".strip()


# --- EOQ / reorder-point policy ----------------------------------------------

EOQ_ORDER_COST = 100.0  # fixed cost per replenishment order (S)
EOQ_HOLD_RATE = 0.2  # annual holding cost as a fraction of unit cost (h)
EOQ_LEAD_DAYS = 7  # replenishment lead time for the reorder point
EOQ_MIN_DAYS = 5
EOQ_TOP = 100


def eoq_policy(lineitem: DataFrame) -> DataFrame:
    """Economic-order-quantity policy per part — the COST-TRADEOFF leg
    of the inventory family: ``part_safety_stock`` buys a z-margin
    against demand noise, ``part_newsvendor_stock`` reads the empirical
    fractile, and this key answers the remaining question (HOW MUCH to
    order at a time): EOQ = sqrt(2·D·S / (h·c)) balances fixed order
    cost S against holding cost h·c, with the reorder point
    (daily demand × lead time) saying WHEN. Also reports implied
    orders/year = D/EOQ.

    Determinism: demand and revenue are exact DECIMAL sums; the corpus
    day-span is integer date arithmetic off a 1-row broadcast; unit
    cost, EOQ, ROP are ONE fixed double expression over those exact
    inputs (identical trees both engines), 6-dp rounded.

    Scale: one part-keyed aggregation (map-side combine) + a 1-row
    broadcast span join + TakeOrdered top-100 — fact table read once,
    no distinct, no window over the corpus."""
    q = F.col("l_quantity").cast("decimal(12,2)")
    ep = F.col("l_extendedprice").cast("decimal(14,2)")
    per_part = (
        lineitem.select(
            "l_partkey", F.to_date("l_shipdate").alias("d"), q.alias("q"), ep.alias("ep")
        )
        .groupBy("l_partkey")
        .agg(
            F.sum("q").cast("decimal(18,2)").alias("tot_qty"),
            F.sum("ep").cast("decimal(20,2)").alias("tot_rev"),
            F.countDistinct("d").cast("bigint").alias("n_days"),
        )
    )
    span = F.broadcast(
        lineitem.agg(
            (
                F.datediff(F.max(F.to_date("l_shipdate")), F.min(F.to_date("l_shipdate")))
                + F.lit(1)
            )
            .cast("bigint")
            .alias("span_days")
        )
    )
    tq = F.col("tot_qty").cast("double")
    sd = F.col("span_days").cast("double")
    annual_d = tq * F.lit(365.0) / sd
    unit_cost = F.col("tot_rev").cast("double") / tq
    eoq = F.sqrt(
        F.lit(2.0) * annual_d * F.lit(EOQ_ORDER_COST) / (F.lit(EOQ_HOLD_RATE) * unit_cost)
    )
    rop = tq / sd * F.lit(float(EOQ_LEAD_DAYS))
    return (
        per_part.join(span)
        .filter(F.col("n_days") >= EOQ_MIN_DAYS)
        .select(
            "l_partkey",
            "n_days",
            F.round(F.col("tot_qty").cast("double"), 2).alias("total_qty"),
            F.round(annual_d, 6).alias("annual_demand"),
            F.round(unit_cost, 6).alias("unit_cost"),
            F.round(eoq, 6).alias("eoq_units"),
            F.round(rop, 6).alias("reorder_point"),
            F.round(annual_d / eoq, 6).alias("orders_per_year"),
        )
        .orderBy(F.col("annual_demand").desc(), "l_partkey")
        .limit(EOQ_TOP)
    )


EOQ_POLICY_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS tot_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(20,2)) AS tot_rev,
         CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT) AS n_days
  FROM lineitem GROUP BY l_partkey
),
span AS (
  SELECT CAST(date_diff('day', MIN(CAST(l_shipdate AS DATE)),
                        MAX(CAST(l_shipdate AS DATE))) + 1 AS BIGINT) AS span_days
  FROM lineitem
)
SELECT l_partkey, n_days, ROUND(CAST(tot_qty AS DOUBLE), 2) AS total_qty,
       ROUND(CAST(tot_qty AS DOUBLE) * 365.0 / CAST(span_days AS DOUBLE), 6)
         AS annual_demand,
       ROUND(CAST(tot_rev AS DOUBLE) / CAST(tot_qty AS DOUBLE), 6) AS unit_cost,
       ROUND(SQRT(2.0 * (CAST(tot_qty AS DOUBLE) * 365.0 / CAST(span_days AS DOUBLE))
                  * {EOQ_ORDER_COST} / ({EOQ_HOLD_RATE}
                  * (CAST(tot_rev AS DOUBLE) / CAST(tot_qty AS DOUBLE)))), 6)
         AS eoq_units,
       ROUND(CAST(tot_qty AS DOUBLE) / CAST(span_days AS DOUBLE)
             * {float(EOQ_LEAD_DAYS)}, 6) AS reorder_point,
       ROUND((CAST(tot_qty AS DOUBLE) * 365.0 / CAST(span_days AS DOUBLE))
             / SQRT(2.0 * (CAST(tot_qty AS DOUBLE) * 365.0 / CAST(span_days AS DOUBLE))
                    * {EOQ_ORDER_COST} / ({EOQ_HOLD_RATE}
                    * (CAST(tot_rev AS DOUBLE) / CAST(tot_qty AS DOUBLE)))), 6)
         AS orders_per_year
FROM per_part, span
WHERE n_days >= {EOQ_MIN_DAYS}
ORDER BY annual_demand DESC, l_partkey
LIMIT {EOQ_TOP}
""".strip()
