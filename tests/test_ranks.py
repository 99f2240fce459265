"""Distributed order statistics (operators/ranks.py): exact equivalence
to the single-partition window they replace, and the plan contract (no
unpartitioned Window node)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from op_etl_spark.operators.ranks import global_row_index, rows_at_ranks


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_global_row_index_matches_row_number(spark):
    vals = [(v,) for v in [42, 7, 19, 3, 88, 55, 21, 64, 1, 30, 99, 11]]
    df = spark.createDataFrame(vals, "k long").repartition(4)
    got = {
        r["k"]: r["__idx"] for r in global_row_index(df, "k").collect()
    }
    want = {
        r["k"]: r["i"]
        for r in df.select(
            "k", (F.row_number().over(Window.orderBy("k")) - 1).alias("i")
        ).collect()
    }
    assert got == want


def test_global_row_index_composite_order(spark):
    rows = [(2, "b"), (1, "z"), (2, "a"), (1, "a"), (3, "m")]
    df = spark.createDataFrame(rows, "x int, y string")
    got = sorted(
        (r["x"], r["y"], r["__idx"])
        for r in global_row_index(df, ["x", "y"], out="__idx").collect()
    )
    assert got == [
        (1, "a", 0), (1, "z", 1), (2, "a", 2), (2, "b", 3), (3, "m", 4),
    ]


def test_global_row_index_plan_has_no_unpartitioned_window(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    plan = _plan(global_row_index(df, "k"))
    # every Window node must declare a partition spec
    for line in plan.splitlines():
        if "Partition Specification" in line:
            assert "__pid" in line


def test_rows_at_ranks_exact(spark):
    vals = list(range(1, 101))
    df = spark.createDataFrame([(v,) for v in vals], "k int").repartition(5)
    rows, n = rows_at_ranks(df, ["k"], [1, 25, 50, 75, 100])
    assert n == 100
    assert [r["k"] for r in rows] == [1, 25, 50, 75, 100]


def test_rows_at_ranks_rejects_out_of_range(spark):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    with pytest.raises(ValueError):
        rows_at_ranks(df, ["k"], [3])
