"""The remaining TPC-H query shapes (Q2, Q6, Q9, Q11, Q12, Q13, Q15,
Q20, Q21) — with plans/analytics.py and plans/tpch_ext.py this completes
all 22 classic plan shapes.

The synthetic schema has no partsupp, l_shipmode, l_commitdate or
l_receiptdate; where classic TPC-H touches those, each query keeps the
*shape* (correlated min, nested IN over a grouped HAVING, EXISTS /
NOT-EXISTS self-joins, two-level aggregation) over columns that exist:

- part-supplier relation  -> DISTINCT (l_partkey, l_suppkey) pairs
- ps_supplycost           -> s_acctbal (Q2) / p_retailprice (Q9, Q11)
- l_shipmode              -> l_linestatus (Q12's categorical axis)
- "late" (receipt>commit) -> l_shipdate > o_orderdate + 90 days (Q21)

All money aggregates follow the exact-decimal discipline from
plans/analytics.py (DECIMAL(30,10) reduction, one final double cast) so
Spark and the DuckDB oracle reduce bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table
from .analytics import DEC, _dsum

_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))"

# Distinct part-supplier pairs: the schema's stand-in for partsupp.
_PS_SQL = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


def _part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each SMALL-type part, the EUROPE supplier(s)
    with the minimum account balance among those who ship it.

    The classic correlated-MIN subquery becomes a window min over
    p_partkey: one shuffle keyed on the part, no join back, ties kept —
    identical semantics to `cost = (SELECT MIN(cost) ...)`.  Supplier,
    nation and region are all broadcast; the distinct part-supplier
    derivation is the only wide stage over lineitem.
    """
    ps = _part_supplier(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eur_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("_min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("_min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH ps AS ({_PS_SQL})
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM ps
JOIN part     ON p_partkey = l_partkey AND p_type = 'SMALL'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
WHERE s_acctbal = (
  SELECT MIN(s2.s_acctbal)
  FROM ps ps2
  JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
  JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
  JOIN region r2   ON r2.r_regionkey = n2.n_regionkey AND r2.r_name = 'EUROPE'
  WHERE ps2.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure selective scan-aggregate — every predicate pushes
    to the parquet scan (shipdate range, discount band, quantity cap),
    then one exact-decimal reduction with no join and no shuffle beyond
    the final single-row combine.  The canonical 100-TB smoke test for
    predicate pushdown: bytes read should track the date range, not the
    table."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,10)))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit on widget parts per supplier nation per
    order year, with p_retailprice * l_quantity standing in for the
    missing ps_supplycost leg.

    part (name-filtered), supplier and nation broadcast; orders is the
    one shuffled join.  Profit reduces as a single exact decimal so the
    subtraction order can't drift between engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity AS DECIMAL(30,10)))
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%widget%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style: parts whose inventory value at NATION_3
    suppliers exceeds a fraction of the nation's total, where value is
    p_retailprice per distinct part-supplier pair (the partsupp
    stand-in).

    Two-phase shape preserved: a grouped aggregate, plus the same
    aggregate reduced globally (a 1-row broadcast) as the HAVING
    threshold.  The per-part aggregation reuses the pair derivation;
    both totals reduce as exact decimals and only the final comparison
    drops to double.
    """
    ps = _part_supplier(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    p = load_table(spark, sf_dir, "part")
    nat_pairs = (
        ps.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(p.select("p_partkey", "p_retailprice"),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    per_part = nat_pairs.groupBy("p_partkey").agg(
        F.sum(F.col("p_retailprice").cast(DEC)).alias("_val")
    )
    total = nat_pairs.agg(
        F.sum(F.col("p_retailprice").cast(DEC)).alias("_total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("_val").cast("double")
            > F.col("_total").cast("double") * F.lit(0.001)
        )
        .select("p_partkey", F.col("_val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


Q11_SQL = f"""
WITH nat_pairs AS (
  SELECT l_partkey, p_retailprice
  FROM ({_PS_SQL}) ps
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
  JOIN part     ON p_partkey = l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) AS part_value
FROM nat_pairs
GROUP BY l_partkey
HAVING CAST(SUM(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) > (
  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) * 0.001
  FROM nat_pairs)
ORDER BY part_value DESC, p_partkey
"""


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: per l_linestatus (the schema's l_shipmode
    stand-in), how many 1996-shipped lineitems belong to urgent/high
    vs lower-priority orders.

    The CASE counts reduce map-side after one shuffled join with
    orders; the date predicate pushes to the lineitem scan.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by how many non-urgent
    orders they placed — the canonical two-level aggregation over a
    left outer join (customers with zero orders must appear in the
    c_count = 0 bucket).

    First aggregate keys on c_custkey (one shuffle); the second input
    is already tiny (distinct order counts), so its shuffle is
    negligible.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose Q1-1996 revenue equals the
    global maximum.

    The revenue view aggregates once on l_suppkey; the MAX is a 1-row
    broadcast joined back on exact-decimal equality (no double
    round-trip, so ties resolve identically in both engines).
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = l.groupBy("l_suppkey").agg(_dsum(rev).alias("total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("_max_rev"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: NATION_2 suppliers who shipped more than 100
    units of widget parts during 1996 — the nested-IN chain (supplier
    IN ⟨grouped HAVING over lineitem⟩ restricted to parts IN ⟨name
    filter⟩) that classic Q20 runs over partsupp.

    Both inner relations collapse before touching supplier: the part
    filter broadcasts into the lineitem scan, the grouped HAVING
    reduces to qualifying suppkeys, and supplier left-semi joins that
    small set.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    qualifying = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_qty"))
        .where(F.col("_qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name", "s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(30,10))) > 100)
ORDER BY s_name, s_suppkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: NATION_1 suppliers who were the sole late
    shipper on a finished multi-supplier order, with "late" meaning
    shipped more than 90 days after the order date (the schema's
    receipt-vs-commit stand-in).

    The EXISTS (another supplier on the order) and NOT EXISTS (another
    LATE supplier on the order) become a left-semi and a left-anti
    self-join, both keyed on l_orderkey with the supplier-inequality as
    a join residual — three shuffles on the same key, which AQE plans
    back-to-back without re-partitioning.
    """
    o_f = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    items = l.join(o_f, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = items.where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey", "l_suppkey")
    s1 = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    l1 = late.join(
        s1.join(
            F.broadcast(n1),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        ).select("s_suppkey", "s_name"),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    other = items.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    exists_cond = (F.col("l_orderkey") == F.col("_ok")) & (
        F.col("l_suppkey") != F.col("_sk")
    )
    return (
        l1.join(other, exists_cond, "left_semi")
        .join(other_late, exists_cond, "left_anti")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey AND n_name = 'NATION_1'
WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""
