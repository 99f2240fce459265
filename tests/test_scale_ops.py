"""Bucketed co-located joins + skew-salted aggregation: correctness AND
the plan properties that make them scale machinery."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from pyspark.sql import functions as F

from op_etl_spark.operators.scale import salted_agg, write_bucketed
from op_etl_spark.session import read_events

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_shuffles(p: str) -> int:
    return len(re.findall(r"^\(\d+\) Exchange\s*$", p, re.M))


class TestBucketedJoin:
    @pytest.fixture(scope="class", autouse=True)
    def tables(self, spark):
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8
        )
        yield
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

    def test_join_on_bucket_key_has_no_exchange(self, spark):
        # disable auto-broadcast so the join would otherwise shuffle both
        # sides; bucketing must eliminate the exchanges entirely
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
            p = _plan(j)
            assert "SortMergeJoin" in p
            assert _n_shuffles(p) == 0  # co-located: zero shuffle
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_bucketed_join_result_matches_plain_join(self, spark):
        j = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        assert j.count() == orders.join(li, "o_orderkey").count()

    def test_agg_on_bucket_key_has_no_exchange(self, spark):
        agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        assert _n_shuffles(_plan(agg)) == 0


class TestSaltedAgg:
    def test_matches_plain_aggregation_on_skewed_key(self, spark):
        ev = read_events(spark, SF_DIR)
        # manufacture skew: collapse most keys into one hot key
        skewed = ev.select(
            F.when(F.col("user_id") < 12, F.lit(0)).otherwise(F.col("user_id")).alias("k"),
            "event_id",
            "value",
        )
        got = salted_agg(
            skewed,
            "k",
            {
                "n": F.count(F.lit(1)),
                "total_cents": F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")),
                "min_event": F.min("event_id"),
                "max_event": F.max("event_id"),
            },
            salt_col="event_id",
        )
        want = skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("total_cents"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_phase1_spreads_hot_key_over_salts(self, spark):
        ev = read_events(spark, SF_DIR)
        skewed = ev.select(F.lit(0).alias("k"), "event_id", "value")
        salt = F.pmod(F.xxhash64(F.col("event_id")), F.lit(16))
        n_groups = skewed.select("k", salt.alias("s")).distinct().count()
        assert n_groups == 16  # one hot key fans into 16 partial groups

def test_profile_approx_mode_one_pass(spark):
    """HLL profile: same shape as exact, cardinalities within sketch error,
    and no EXPAND in the plan (the thing exact multi-distinct pays for)."""
    from op_etl_spark.operators.profile import profile_columns

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cols = ["doc_id", "lang"]
    exact = {r.column: r for r in profile_columns(df, cols, exact=True).collect()}
    approx_df = profile_columns(df, cols, exact=False)
    approx = {r.column: r for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for c in cols:
        assert approx[c].n_rows == exact[c].n_rows
        assert approx[c].min_value == exact[c].min_value
        assert abs(approx[c].n_distinct - exact[c].n_distinct) <= max(
            2, 0.1 * exact[c].n_distinct
        )
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
