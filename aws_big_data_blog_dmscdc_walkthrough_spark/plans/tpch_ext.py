"""Extended TPC-H-style analytics: the join/subquery shapes the core
surface (plans/analytics.py) does not yet cover.

Q4  — EXISTS semi-join with a non-equi correlated predicate
Q7  — two-sided dimension join (supplier nation x customer nation)
Q8  — conditional market-share ratio (sum(case)/sum)
Q10 — returned-item top-N join pipeline
Q14 — promo revenue share over a ship-month
Q16 — distinct-agg over a filtered relation with a NOT-IN anti-join
Q19 — disjunctive multi-predicate scan (OR-of-ANDs pushdown)
Q22 — scalar-subquery threshold + anti-join rollup

The synthetic schema has no partsupp/ps_supplycost, no l_commitdate /
l_receiptdate, no c_phone; where classic TPC-H touches those, the query
keeps the *shape* (the plan-relevant structure: correlation, disjunction,
scalar subquery) over the columns that exist.  All aggregates use the
exact-decimal discipline from plans/analytics.py so Spark and the DuckDB
oracle reduce identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .analytics import DEC, _dsum

_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))"


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: priority distribution of orders with at least one
    late-shipping lineitem (shipped >60 days after order date).

    The correlated EXISTS becomes a left-semi join whose condition mixes
    the equi key (orderkey) with a non-equi correlated predicate — Spark
    plans the equi part as the shuffle key and evaluates the interval
    comparison as a join residual, so no cartesian blow-up.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: bilateral shipping volume between two nations by
    ship year.

    lineitem resolves its supplier nation and (via orders→customer) its
    customer nation; only the two (supp, cust) nation pairs survive.
    Both nation lookups broadcast (25 rows); supplier broadcasts too
    (0.01% of lineitem).  One shuffle each for the orders and customer
    equi-joins, then a tiny grouped agg.
    """
    n1, n2 = "NATION_1", "NATION_2"
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_n = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    cust_n = nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("_snk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("_cnk"))
        .where(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year, {_REV} AS rev
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_1 suppliers' share of ECONOMY-part revenue
    sold into ASIA, per order year.

    The share is a conditional-sum ratio: both numerator and denominator
    reduce as exact decimals in one pass (no second scan, no join back),
    and divide in double only at the end.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("_cnk"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    joined = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("_cnk"), "left_semi")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("_snk"))
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_rev).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN rev
                     ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE)
       / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM (
  SELECT o_orderdate, n1.n_name AS supp_nation, {_REV} AS rev
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey AND p_type = 'ECONOMY'
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND c_nationkey IN (
      SELECT n_nationkey FROM nation
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA')
) t
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top 20 customers by revenue lost to returns
    ('R' lineitems) for orders placed in one quarter.

    Selective order-date and returnflag predicates push to both scans;
    the grouped agg keys on the customer row, so the plan is
    filter→join→join→agg→top-N with a single ordered limit at the end.
    """
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(_dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey AND l_returnflag = 'R'
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: percentage of one ship-month's revenue that came
    from PROMO parts.  Single scan over the month's lineitems with a
    broadcast part join; numerator and denominator reduce together.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return l.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                             ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: how many distinct suppliers ship each surviving
    (brand, type, size) part class.

    The schema has no partsupp, so lineitem's (l_partkey, l_suppkey)
    pairs stand in as the part-supplier relation.  Suppliers whose name
    ends in '7' are excluded via a broadcast NOT-IN (left_anti) — the
    classic Q16 exclusion subquery.  distinct-count reduces per class
    after the part filter prunes the probe side.
    """
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size").isin(1, 4, 7, 10, 13))
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    return (
        l.join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 4, 7, 10, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue from three OR'd (brand, size-range,
    quantity-range) predicate groups.

    The disjunction lives entirely in the join filter; Catalyst extracts
    the common l_partkey = p_partkey conjunct as the equi key and pushes
    the brand/size disjunction down to the part scan, so the broadcast
    side ships pre-filtered.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (F.col("l_partkey") == F.col("p_partkey")) & (
        ((br == "Brand#1") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#7") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#13") & sz.between(1, 15) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(p, cond).agg(_dsum(rev).alias("revenue"))


Q19_SQL = f"""
SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: well-funded customers with no recent orders,
    rolled up per market segment.

    Two-phase: (1) a scalar subquery computes the global average of
    positive account balances — one tiny aggregate broadcast as a cross
    join; (2) customers above it anti-join recent orders' custkeys.
    The anti-join's right side prunes to a distinct key set at scan time.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)) / F.count(F.lit(1)))
            .cast("double")
            .alias("_avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10)))
                / COUNT(*) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_customer_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth: decile, percent_rank and cume_dist of
    each customer's balance within its market segment.

    One shuffle on c_mktsegment; the total order (balance, then key)
    makes every ranking function deterministic, so the oracle can
    hash-match bit-for-bit — ntile output is data-independent of
    partitioning because the window is totally ordered.
    """
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


Q_CUSTOMER_VALUE_RANKS_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(NTILE(10) OVER w AS INT) AS decile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""
