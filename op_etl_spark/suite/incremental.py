"""Incremental aggregate maintenance + approximate-quantile gate.

At 100 TB you never recompute a rollup from scratch when a new load
arrives: you aggregate the delta alone and MERGE it into the standing
rollup. That only works when the aggregate state is algebraic (count,
sum, min, max merge losslessly; avg = merged sum / merged count). These
queries prove the merge path is bit-identical to a full recompute —
the delta here is a deterministic slice of the table, standing in for
"yesterday's table + today's load".

`approx_quantile_gate` applies the HLL-gate trick to percentile_approx:
the sketch value is engine-specific, so the query exports the exact
percentile plus a bounded-error verdict an exact-SQL oracle can agree
with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import read_table, sql_money_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _partial_rollup(orders: DataFrame) -> DataFrame:
    """Algebraic aggregate state per status: mergeable components only."""
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("sum_cents"),
        F.min("o_custkey").alias("min_cust"),
        F.max("o_custkey").alias("max_cust"),
    )


def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup(base) ⊕ Rollup(delta) == Rollup(base ∪ delta).

    base = even order keys ("the standing table"), delta = odd keys
    ("today's load"). Each side aggregates independently — the delta-side
    shuffle is sized by the DELTA, not the table — then the two partial
    states merge with a second tiny aggregate. The oracle computes the
    direct full rollup; hash equality IS the lossless-merge proof."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    delta = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = (
        _partial_rollup(base)
        .unionByName(_partial_rollup(delta))
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cust").alias("min_cust"),
            F.max("max_cust").alias("max_cust"),
        )
    )
    return merged.select(
        "o_orderstatus",
        "n",
        (F.col("sum_cents") / 100.0).alias("total_price"),
        # avg from merged algebraic state — never an avg of avgs
        F.floor(F.col("sum_cents") / F.col("n")).cast("long").alias("avg_cents_floor"),
        "min_cust",
        "max_cust",
    )


ORACLE_INCREMENTAL = f"""
SELECT o_orderstatus,
       count(*) AS n,
       {sql_money_sum('o_totalprice')} AS total_price,
       CAST(floor(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / count(*)) AS BIGINT)
         AS avg_cents_floor,
       min(o_custkey) AS min_cust,
       max(o_custkey) AS max_cust
FROM orders
GROUP BY o_orderstatus
"""


def approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx(o_totalprice, 0.5) asserted within 2% relative
    error of the exact (interpolated) median per status. Exports the
    exact median (cents-exact on both engines) + the verdict."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    per = orders.select("o_orderstatus", cents.alias("c")).groupBy("o_orderstatus").agg(
        F.expr("percentile(c, 0.5)").alias("exact_med"),
        F.expr("percentile_approx(c, 0.5, 10000)").alias("approx_med"),
    )
    return per.select(
        "o_orderstatus",
        (F.col("exact_med") / 100.0).alias("median_price"),
        (
            F.abs(F.col("approx_med") - F.col("exact_med"))
            <= 0.02 * F.col("exact_med")
        ).alias("within_2pct"),
    )


ORACLE_QUANTILE_GATE = """
SELECT o_orderstatus,
       quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.5) / 100.0
         AS median_price,
       true AS within_2pct
FROM orders
GROUP BY o_orderstatus
"""


QUERIES = {
    "incremental_rollup_merge": incremental_rollup_merge,
    "approx_quantile_gate": approx_quantile_gate,
}

ORACLE = {
    "incremental_rollup_merge": ORACLE_INCREMENTAL,
    "approx_quantile_gate": ORACLE_QUANTILE_GATE,
}
