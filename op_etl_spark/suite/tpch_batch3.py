"""TPC-H-shaped relational queries, batch 3: the five shapes the first two
batches left out because the classic formulations need `partsupp`, which the
driver's trimmed schema doesn't have. Each query keeps the original plan
shape — the thing being claimed — using `lineitem` as the part-supplier
offer/link table:

 - q2:  correlated per-group MIN (min-cost supplier in a region)
 - q9:  multi-dimension star join + derived profit measure per nation/year
 - q11: grouped value share against a global-total scalar subquery
 - q16: distinct-count rollup with a NOT-IN supplier exclusion
 - q20: per-(supplier,part) conditional-sum threshold feeding a semi join

Reference parity: the generic SELECT/JOIN/GROUP surface of the reference's
query layer (SURVEY.md §2.4-2.6), executed there row-at-a-time per
partition; here each is a declarative plan Catalyst compiles to
broadcast-joined, partially-aggregated, pushed-down physical plans.

Cross-engine determinism: every money/quantity aggregate goes through
integer cents (`cents`/`money_sum`, exact and order-independent); the only
raw-double comparisons are single IEEE ops (one divide, one multiply)
applied identically in both engines, which are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._util import cents, fround, money_sum, read_table, sql_cents, sql_money_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --- q2 shape: correlated per-group MIN (min-cost supplier) ---

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each size-15 part, the EUROPE supplier(s) offering the minimum
    unit price. The classic q2 correlated scalar subquery is expressed as
    a window MIN over the offers partitioned by part — ONE shuffle on
    p_partkey instead of the aggregate-then-self-join plan's two scans and
    extra join. All three dimensions (supplier 100 rows, nation 25,
    region 5, part filtered) broadcast; the fact table shuffles once.

    unit_price is a single IEEE divide on identical doubles — bit-exact in
    both engines — so the `price == min(price)` equality is safe."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")

    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "p_partkey", "s_name", "n_name", "s_acctbal",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_price", F.min("price").over(w))
        .filter(F.col("price") == F.col("min_price"))
        .select(
            "p_partkey", "s_name", "n_name", "s_acctbal",
            fround("price", 4).alias("unit_price"),
        )
        # spec-conformant top-100 (classic q2 carries LIMIT 100): compiles
        # to TakeOrderedAndProject — per-partition top-k, no global sort.
        # (p_partkey, s_name) is a total order, so the cut is deterministic.
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


ORACLE_Q2 = """
WITH offers AS (
  SELECT p_partkey, s_name, n_name, s_acctbal,
         l_extendedprice / l_quantity AS price
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey AND p_size = 15
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
)
SELECT p_partkey, s_name, n_name, s_acctbal,
       floor(price * 10000 + 0.5) / 10000.0 AS unit_price
FROM (SELECT *, min(price) OVER (PARTITION BY p_partkey) AS mp FROM offers)
WHERE price = mp
ORDER BY p_partkey, s_name
LIMIT 100
"""


# --- q9 shape: star join + derived profit measure per nation/year ---

def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts per supplier nation per ship year. The trimmed
    schema has no partsupp.ps_supplycost, so cost is proxied as
    0.6 * p_retailprice * l_quantity — the MEASURE changes, the q9 plan
    shape (fact scan, three broadcast dims, LIKE-filtered part dim pruning
    the fact early, single shuffle for the final rollup) does not.

    The per-row amount is four IEEE ops in the identical order in both
    engines (bit-exact); the sum is exact integer ten-thousandths."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("l_year"))
        .agg(money_sum(amount, 4).alias("profit"))
        .orderBy("nation", "l_year")
    )


ORACLE_Q9 = f"""
SELECT n_name AS nation, year(l_shipdate) AS l_year,
       {sql_money_sum('l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity', 4)} AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%red%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, l_year
"""


# --- q11 shape: grouped value share vs a global-total scalar subquery ---

def q11_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose total extended-price value exceeds 0.1% of the corpus
    total. Classic q11 compares a grouped sum against a scalar subquery;
    here both sides stay EXACT INTEGER CENTS and the threshold test is the
    integer inequality `part_cents * 1000 > total_cents` — no float
    epsilon at any scale. The global total is a one-row aggregate
    broadcast into the HAVING filter (Spark: crossJoin(broadcast(total)));
    the fact table is scanned once per side, shuffled once on l_partkey."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(cents("l_extendedprice")).alias("val_cents")
    )
    total = li.agg(F.sum(cents("l_extendedprice")).alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val_cents") * 1000 > F.col("total_cents"))
        .select(
            "l_partkey",
            (F.col("val_cents") / F.lit(100.0)).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


ORACLE_Q11 = f"""
SELECT l_partkey,
       sum({sql_cents('l_extendedprice')}) / 100.0 AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING sum({sql_cents('l_extendedprice')}) * 1000 >
       (SELECT sum({sql_cents('l_extendedprice')}) FROM lineitem)
ORDER BY part_value DESC, l_partkey
"""


# --- q16 shape: distinct-count rollup with NOT-IN supplier exclusion ---

def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers ship each (brand, size) combination,
    excluding negative-balance suppliers (the q16 'complaints' NOT IN).
    The exclusion list is tiny → broadcast LEFT ANTI join (never a
    shuffle); part is a broadcast dim; the only shuffle is the
    count-distinct aggregation, which Spark expands to a two-phase
    partial/final plan on (p_brand, p_size, l_suppkey)."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


ORACLE_Q16 = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# --- q20 shape: conditional-sum threshold per (supplier, part) → semi join ---

def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than half of their all-time quantity of
    some gear part during 1996 — the q20 'excess availability' correlated
    threshold, with the conditional/total sums both in exact integer
    quantity-hundredths so `2 * q96 > qtot` is an integer comparison.
    One shuffle groups the (l_suppkey, l_partkey) pairs (part dim
    broadcast-pruned first so only gear lineitems aggregate); the
    surviving supplier keys semi-join the 100-row supplier dim, which
    Catalyst broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    qty = cents("l_quantity")
    pairs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(F.year("l_shipdate") == 1996, qty).otherwise(F.lit(0))).alias("q96"),
            F.sum(qty).alias("qtot"),
        )
        .filter(F.col("q96") * 2 > F.col("qtot"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(pairs, supp.s_suppkey == pairs.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


ORACLE_Q20 = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CASE WHEN year(l_shipdate) = 1996 THEN {sql_cents('l_quantity')} ELSE 0 END) * 2
         > sum({sql_cents('l_quantity')})
)
ORDER BY s_suppkey
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_nation_profit": q9_nation_profit,
    "q11_part_value_share": q11_part_value_share,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_concentrated_suppliers": q20_concentrated_suppliers,
}

ORACLE = {
    "q2_min_cost_supplier": ORACLE_Q2,
    "q9_nation_profit": ORACLE_Q9,
    "q11_part_value_share": ORACLE_Q11,
    "q16_supplier_part_counts": ORACLE_Q16,
    "q20_concentrated_suppliers": ORACLE_Q20,
}
