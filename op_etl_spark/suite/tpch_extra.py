"""TPC-H-shaped relational queries, batch 2: the operator shapes the first
relational batch didn't exercise.

 - EXISTS with a non-equi residual (q4 shape)
 - scan-filter-aggregate with full predicate pushdown (q6 shape)
 - nation-pair disjunctive join filter (q7 shape)
 - conditional-ratio "market share" aggregation (q8 shape)
 - two-way CASE aggregation (q12 shape)
 - conditional-ratio over a dimension attribute (q14 shape)
 - HAVING-subquery fact self-aggregation (q18 shape)
 - disjunctive multi-attribute join predicate (q19 shape)
 - double-correlated EXISTS / NOT EXISTS (q21 shape)
 - scalar-subquery threshold + anti join (q22 shape)
 - outer-join count distribution (q13 shape)
 - scalar-max over an aggregated view (q15 shape)
 - correlated per-group average threshold (q17 shape)

The driver's tables are trimmed TPC-H (no partsupp, no l_shipmode /
l_commitdate / l_receiptdate / c_phone), so predicates are adapted to the
columns that exist while keeping each query's *plan shape* intact — that
shape (what shuffles, what broadcasts, what gets pushed down) is the thing
being claimed, and the thing that has to survive a 100 TB scale-up.

Scale notes are on each query. Reference parity: these correspond to the
generic SELECT/WHERE/JOIN/GROUP surface the reference exposes through its
query layer (SURVEY.md §2.4-2.6); the reference executes them row-at-a-time
per partition, we declare them and let Catalyst pick the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import cents, fround, money_sum, read_table, sql_cents, sql_money_avg, sql_money_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --- q4 shape: EXISTS with a non-equi residual condition ---

def q4_late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having at least one lineitem shipped after the order date,
    counted per priority. LEFT SEMI with an equi key plus a non-equi
    residual — Spark keeps the hash join on l_orderkey and applies the
    date comparison as a residual filter, so the plan stays a single
    shuffle (or broadcast of the filtered build side at small SF)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q6 shape: pure scan-filter-aggregate (every predicate pushes to parquet) ---

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue delta from discount changes: all three predicates are
    min/max-prunable parquet filters (PushedFilters in the scan node), the
    aggregate is a single map-side-combinable global sum — the cheapest
    possible plan per input byte, which is the point of the q6 shape."""
    li = _t(spark, sf_dir, "lineitem")
    hit = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return hit.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q6 = f"""
SELECT {sql_money_sum('l_extendedprice * l_discount', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


# --- q7 shape: bidirectional nation-pair trade volume ---

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flowing between two nations in either direction, per ship
    year. The two nation lookups broadcast (25 rows); the pair filter is
    applied right after the broadcast joins so the expensive fact-fact
    joins only carry surviving rows forward. Fact joins shuffle on their
    keys once each — no re-shuffle, since each join introduces a new key."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_money_sum('volume', 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- q8 shape: market-share ratio (conditional sum / total sum) ---

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5's share of PROMO-part revenue sold into EUROPE customers,
    per order year. Both sides of the ratio are exact integer-cent sums, so
    the single fp division is bit-identical across engines. The part filter
    is applied *before* the join (column-pruned, predicate-pushed scan);
    nation/region dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    eu_nations = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(eu_nations), cust.c_nationkey == F.col("c_nk"), "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            fround(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


ORACLE_Q8 = f"""
SELECT o_year,
       floor((sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
              / sum(volume)) * 1000000 + 0.5) / 1000000.0 AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         n2.n_name AS supp_nation,
         {sql_cents('l_extendedprice * (1 - l_discount)', 4)} AS volume
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
GROUP BY o_year
ORDER BY o_year
"""


# --- q12 shape: two-way CASE aggregation over a fact-fact join ---

def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag, how many lineitems belong to urgent-ish vs other
    orders, for one ship year. The CASE runs inside the aggregate (one
    pass, map-side combinable); the join shuffles each side once on the
    order key."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- q14 shape: promo revenue ratio against a dimension attribute ---

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from PROMO-type parts in one ship window. The part
    side carries only (p_partkey, is_promo) into the join — column pruning
    keeps the build side two columns wide no matter how wide `part` is.
    Exact-cents numerator/denominator, one fp division, fround(6)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-08-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    vol = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        fround(
            F.lit(100.0)
            * F.sum(F.when(F.col("is_promo"), vol).otherwise(F.lit(0)))
            / F.sum(vol),
            6,
        ).alias("promo_ratio"),
        (F.sum(F.when(F.col("is_promo"), vol).otherwise(F.lit(0))) / F.lit(10000.0)).alias("promo_rev"),
        (F.sum(vol) / F.lit(10000.0)).alias("total_rev"),
    )


ORACLE_Q14 = f"""
SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO' THEN volume ELSE 0 END)
              / sum(volume)) * 1000000 + 0.5) / 1000000.0 AS promo_ratio,
       sum(CASE WHEN p_type = 'PROMO' THEN volume ELSE 0 END) / 10000.0 AS promo_rev,
       sum(volume) / 10000.0 AS total_rev
FROM (
  SELECT p_type, {sql_cents('l_extendedprice * (1 - l_discount)', 4)} AS volume
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-08-01 00:00:00')
"""


# --- q18 shape: HAVING-subquery (large-volume orders) ---

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who placed orders totalling > 300 units. The inner
    aggregation reduces lineitem to one row per qualifying order BEFORE
    any join — at 100 TB the filtered aggregate is tiny relative to the
    fact, so both following joins broadcast it. Top-100 via
    TakeOrderedAndProject (no global sort)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            fround("o_totalprice", 2).alias("totalprice"),
            fround("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


ORACLE_Q18 = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       floor(o_totalprice * 100 + 0.5) / 100.0 AS totalprice,
       floor(sum_qty * 100 + 0.5) / 100.0 AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


# --- q19 shape: disjunctive multi-attribute join predicate ---

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three OR'd (brand, size-range, quantity-range)
    clauses. Expressed as an equi join on p_partkey with the disjunction
    as a post-join filter — Catalyst keeps the hash join (an OR inside
    the join condition would force a nested-loop), and pushes the
    per-side conjuncts it can derive down to each scan."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(clause)
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q19 = f"""
SELECT {sql_money_sum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30)
"""


# --- q21 shape: double-correlated EXISTS / NOT EXISTS ---

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the SOLE supplier with returned ('R') lines in a
    multi-supplier finished order — the q21 correlation pattern (EXISTS
    another supplier's line, NOT EXISTS another supplier's 'R' line).

    Spark-first plan: instead of two correlated self-joins against
    lineitem (three shuffles of the largest table), aggregate lineitem
    ONCE per order — distinct suppliers, distinct 'R' suppliers, 'R' row
    count — and filter. The sole-'R'-supplier id falls out of the same
    aggregate (max over a single-element set). One shuffle of the fact,
    then a broadcast-sized rollup."""
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    is_r = F.col("l_returnflag") == "R"
    per_order = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey, "left_semi")
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(is_r, F.col("l_suppkey"))).alias("n_r_supp"),
            F.max(F.when(is_r, F.col("l_suppkey"))).alias("r_suppkey"),
            F.sum(F.when(is_r, 1).otherwise(0)).alias("n_r_rows"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.groupBy("r_suppkey")
        .agg(F.sum("n_r_rows").alias("numwait"))
        .join(F.broadcast(supp), F.col("r_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


ORACLE_Q21 = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- q22 shape: scalar-subquery threshold + anti join ---

Q22_DIGITS = ("1", "3", "5", "7", "9")


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in odd name-digit cohorts with above-average balance and
    no orders (q22 with the last name digit standing in for the phone
    country code). The scalar average is a 1-row aggregate cross-joined
    back (broadcast, free); the no-orders check is a LEFT ANTI against the
    pruned single-column orders projection. Exact-cents average makes the
    threshold comparison bit-identical across engines."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "cohort", F.right("c_name", F.lit(1))
    ).filter(F.col("cohort").isin(*Q22_DIGITS))
    pos = cust.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        (F.sum(cents("c_acctbal")) / F.lit(100.0) / F.count(F.lit(1))).alias("avg_bal")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cohort")
    )


ORACLE_Q22 = f"""
SELECT cohort, count(*) AS numcust,
       {sql_money_sum('c_acctbal', 2)} AS totacctbal
FROM (SELECT right(c_name, 1) AS cohort, c_custkey, c_acctbal FROM customer) c
WHERE cohort IN ('1', '3', '5', '7', '9')
  AND c_acctbal > (SELECT (sum({sql_cents('c_acctbal', 2)}) / 100.0) / count(*)
                   FROM customer
                   WHERE c_acctbal > 0.0 AND right(c_name, 1) IN ('1', '3', '5', '7', '9'))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
GROUP BY cohort
ORDER BY cohort
"""


# --- q13 shape: outer-join count distribution ---

def q13_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of orders-per-customer INCLUDING zero-order customers
    — the left-outer-join + double-aggregation shape. First aggregate
    shuffles on c_custkey (orders side pre-projected to one column);
    second is a tiny histogram. Counting o_orderkey (not *) keeps the
    null rows from the outer join at count 0."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- q15 shape: top-supplier via scalar-max over an aggregated view ---

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose revenue equals the global max of per-supplier
    revenue in one ship quarter. The per-supplier aggregate is
    localCheckpoint()ed so the revenue subtree materializes exactly once
    (Catalyst doesn't dedupe self-referenced subplans here; a naive
    max-subquery join would re-scan the fact), then the scalar max is a
    one-row collect compared as a literal — no global window, no
    single-partition funnel, no double scan. rev_cents is exact integer
    ten-thousandths, so the literal equality is deterministic."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)).alias(
            "rev_cents"
        )
    ).localCheckpoint()
    max_cents = revenue.agg(F.max("rev_cents")).collect()[0][0]
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.filter(F.col("rev_cents") == F.lit(max_cents))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents") / F.lit(10000.0)).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum({sql_cents('l_extendedprice * (1 - l_discount)', 4)}) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, rev_cents / 10000.0 AS total_revenue
FROM revenue
JOIN supplier ON supplier_no = s_suppkey
WHERE rev_cents = (SELECT max(rev_cents) FROM revenue)
ORDER BY s_suppkey
"""


# --- q17 shape: correlated per-group average threshold ---

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems below 50% of their part's average quantity,
    for one brand. The correlated scalar subquery becomes a per-part
    WINDOW average over the single brand-filtered fact stream — one scan,
    one shuffle on l_partkey, no self-join (a groupBy-then-join-back
    would scan and semi-join the fact twice; same lesson as q15). The
    brand filter prunes via broadcast semi join before the shuffle.
    Exact-cents threshold comparison: avg = exact sum / count, halved."""
    from pyspark.sql import Window as W

    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
    w = W.partitionBy("l_partkey")
    avg_qty = (
        F.sum(cents("l_quantity")).over(w) / F.lit(100.0) / F.count(F.lit(1)).over(w)
    )
    return (
        li_brand.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            money_sum("l_extendedprice").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q17 = f"""
WITH li_brand AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2')),
avg_q AS (
  SELECT l_partkey AS ak, {sql_money_avg('l_quantity', 2)} AS avg_qty
  FROM li_brand GROUP BY 1)
SELECT {sql_money_sum('l_extendedprice', 2)} AS small_qty_revenue,
       count(*) AS n_items
FROM li_brand JOIN avg_q ON l_partkey = ak
WHERE l_quantity < 0.5 * avg_qty
"""


QUERIES = {
    "q4_late_ship_orders": q4_late_ship_orders,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q12_priority_lines": q12_priority_lines,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_idle_rich_customers": q22_idle_rich_customers,
    "q13_customer_order_histogram": q13_customer_order_histogram,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
}

ORACLE = {
    "q4_late_ship_orders": ORACLE_Q4,
    "q6_forecast_revenue": ORACLE_Q6,
    "q7_volume_shipping": ORACLE_Q7,
    "q8_market_share": ORACLE_Q8,
    "q12_priority_lines": ORACLE_Q12,
    "q14_promo_revenue": ORACLE_Q14,
    "q18_large_volume_customers": ORACLE_Q18,
    "q19_disjunctive_revenue": ORACLE_Q19,
    "q21_waiting_suppliers": ORACLE_Q21,
    "q22_idle_rich_customers": ORACLE_Q22,
    "q13_customer_order_histogram": ORACLE_Q13,
    "q15_top_supplier": ORACLE_Q15,
    "q17_small_quantity_revenue": ORACLE_Q17,
}
