"""Oracle-checked queries for the physical-layout operators
(operators/layout.py): the Z-order key math that `zorder_write` clusters
by, verified value-for-value against DuckDB.

The curve itself is what matters for correctness at scale — if the key is
right, clustering quality follows from repartitionByRange (tested
file-level in tests/test_layout.py); if it's wrong, scan pruning silently
degrades to full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import (
    normalize_to_bits,
    normalize_to_bits_sql,
    zorder_key,
    zorder_key_sql,
)
from ._util import cents, read_table, sql_cents

BITS = 8


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders")


def zorder_curve_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bit-interleave on modular coordinates for a deterministic
    order sample — pins every bit position of the curve."""
    o = _orders(spark, sf_dir).filter(F.col("o_orderkey") % 20 == 0)
    x = (F.col("o_orderkey") % 256).cast("long")
    y = (F.col("o_custkey") % 256).cast("long")
    return o.select(
        "o_orderkey",
        x.alias("x"),
        y.alias("y"),
        zorder_key([x, y], BITS).alias("zkey"),
    )


ORACLE_ZORDER_CURVE = f"""
SELECT o_orderkey,
       o_orderkey % 256 AS x,
       o_custkey % 256 AS y,
       {zorder_key_sql(['o_orderkey % 256', 'o_custkey % 256'], BITS)} AS zkey
FROM orders
WHERE o_orderkey % 20 = 0
"""


def zorder_cell_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per Z-cell after range normalization — the exact pipeline
    `zorder_write` runs (stats pass -> normalize -> interleave), surfaced
    as a histogram so the oracle checks the normalization arithmetic too.
    The stats pass is a 1-row aggregate (same two-pass shape at 100 TB)."""
    o = _orders(spark, sf_dir).select(
        F.col("o_custkey").cast("long").alias("ck"),
        cents("o_totalprice").alias("tp"),
    )
    s = o.agg(
        F.min("ck").alias("lo1"), F.max("ck").alias("hi1"),
        F.min("tp").alias("lo2"), F.max("tp").alias("hi2"),
    ).collect()[0]
    key = zorder_key(
        [
            normalize_to_bits(F.col("ck"), s["lo1"], s["hi1"], BITS),
            normalize_to_bits(F.col("tp"), s["lo2"], s["hi2"], BITS),
        ],
        BITS,
    )
    return (
        o.select(key.alias("zkey"))
        .groupBy("zkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_N1 = normalize_to_bits_sql(
    "o_custkey", "(SELECT min(o_custkey) FROM orders)",
    "(SELECT max(o_custkey) FROM orders)", BITS,
)
_TP = sql_cents("o_totalprice")
_N2 = normalize_to_bits_sql(
    _TP,
    f"(SELECT min({_TP}) FROM orders)",
    f"(SELECT max({_TP}) FROM orders)", BITS,
)

ORACLE_ZORDER_HIST = f"""
SELECT {zorder_key_sql([_N1, _N2], BITS)} AS zkey,
       count(*) AS n_orders
FROM orders
GROUP BY 1
"""

QUERIES = {
    "zorder_curve_sample": zorder_curve_sample,
    "zorder_cell_histogram": zorder_cell_histogram,
}

ORACLE = {
    "zorder_curve_sample": ORACLE_ZORDER_CURVE,
    "zorder_cell_histogram": ORACLE_ZORDER_HIST,
}
