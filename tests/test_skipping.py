"""File-stats skipping index: manifest correctness, conservative pruning,
exact result parity, and the Z-order composition that makes it selective."""

import os

from pyspark.sql import functions as F

from op_etl_spark.operators.layout import zorder_write
from op_etl_spark.operators.skipping import (
    build_stats_index,
    prune_files,
    pruned_read,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _setup(spark, tmp_path, num_files=8):
    path = str(tmp_path / "orders_z")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    zorder_write(orders, path, ["o_custkey", "o_orderkey"], bits=8, num_files=num_files)
    idx = build_stats_index(spark, path, ["o_custkey", "o_orderkey"])
    return path, idx, orders


def test_manifest_covers_all_files_and_rows(spark, tmp_path):
    path, idx, orders = _setup(spark, tmp_path)
    m = spark.read.parquet(idx)
    assert m.agg(F.sum("n_rows")).collect()[0][0] == orders.count()
    assert m.count() == len(set(r.file for r in m.collect()))
    for r in m.collect():
        assert r.min_o_custkey <= r.max_o_custkey


def test_pruned_read_equals_full_filter(spark, tmp_path):
    path, idx, orders = _setup(spark, tmp_path)
    lo, hi = 50, 200
    got = pruned_read(spark, path, {"o_custkey": (lo, hi)})
    want = orders.filter((F.col("o_custkey") >= lo) & (F.col("o_custkey") <= hi))
    assert got.count() == want.count()
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in want.collect()
    )


def test_zorder_makes_pruning_selective(spark, tmp_path):
    path, idx, orders = _setup(spark, tmp_path)
    n_all = spark.read.parquet(idx).count()
    span = orders.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
    width = (span[1] - span[0]) // 8
    kept = prune_files(spark, idx, {"o_custkey": (span[0], span[0] + width)})
    assert 0 < len(kept) < n_all  # a narrow slice skips most clustered files


def test_empty_match_returns_empty_with_schema(spark, tmp_path):
    path, idx, orders = _setup(spark, tmp_path)
    got = pruned_read(spark, path, {"o_custkey": (10**12, 10**12 + 1)})
    assert got.count() == 0
    assert got.columns == orders.columns


def test_open_ended_ranges(spark, tmp_path):
    path, idx, orders = _setup(spark, tmp_path)
    hi_only = pruned_read(spark, path, {"o_custkey": (None, 100)})
    assert hi_only.count() == orders.filter(F.col("o_custkey") <= 100).count()
    lo_only = pruned_read(spark, path, {"o_custkey": (100, None)})
    assert lo_only.count() == orders.filter(F.col("o_custkey") >= 100).count()


def test_partitioned_table_keeps_partition_columns(spark, tmp_path):
    path = str(tmp_path / "orders_part")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        orders.withColumn("status", F.col("o_orderstatus"))
        .write.partitionBy("status")
        .parquet(path)
    )
    idx = build_stats_index(spark, path, ["o_custkey"])
    got = pruned_read(spark, path, {"o_custkey": (50, 200)})
    assert "status" in got.columns  # partition column survives leaf-file read
    want = spark.read.parquet(path).filter(
        (F.col("o_custkey") >= 50) & (F.col("o_custkey") <= 200)
    )
    assert got.count() == want.count()
    assert sorted(got.columns) == sorted(want.columns)


def test_unindexed_range_column_is_conservative(spark, tmp_path):
    path, idx, orders = _setup(spark, tmp_path)
    kept = prune_files(spark, idx, {"o_totalprice": (0, 1)})  # not indexed
    assert len(kept) == spark.read.parquet(idx).count()  # keeps everything
