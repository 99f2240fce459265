"""Physical-layout operators: compaction plan/execute and z-order writes."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from op_etl_spark.operators.layout import (
    CompactionPlan,
    compact_files,
    normalize_to_bits,
    plan_compaction,
    zorder_key,
    zorder_write,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _data_files(path):
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith((".", "_"))
    ]


class TestCompaction:
    @pytest.fixture(scope="class")
    def fragmented(self, spark, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("frag") / "lineitem")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        li.repartition(40).write.parquet(path)
        return path

    def test_plan_counts_real_files(self, spark, fragmented):
        plan = plan_compaction(spark, fragmented)
        assert plan.n_files == 40
        assert plan.total_bytes == sum(os.path.getsize(f) for f in _data_files(fragmented))
        assert plan.target_files == 1  # tiny table, default 128 MB target
        assert not plan.skipped

    def test_compact_rewrites_and_preserves_data(self, spark, fragmented):
        before = spark.read.parquet(fragmented)
        n_before = before.count()
        qty_before = before.agg(F.sum("l_quantity")).collect()[0][0]
        schema_before = before.schema

        plan = compact_files(spark, fragmented)
        assert isinstance(plan, CompactionPlan) and not plan.skipped
        assert len(_data_files(fragmented)) == plan.target_files
        # no leftover swap directories
        parent = os.path.dirname(fragmented)
        assert not [d for d in os.listdir(parent) if "__compact" in d]

        after = spark.read.parquet(fragmented)
        assert after.count() == n_before
        assert after.agg(F.sum("l_quantity")).collect()[0][0] == qty_before
        assert after.schema == schema_before

    def test_recompaction_is_noop(self, spark, fragmented):
        plan = compact_files(spark, fragmented)
        assert plan.skipped
        assert plan.n_files == plan.target_files == 1

    def test_small_target_yields_multiple_files(self, spark, tmp_path):
        path = str(tmp_path / "li")
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(10).write.parquet(path)
        total = plan_compaction(spark, path).total_bytes
        target_bytes = total // 3
        plan = compact_files(spark, path, target_file_bytes=target_bytes)
        assert plan.target_files in (3, 4)
        assert len(_data_files(path)) == plan.target_files


class TestZorder:
    def test_key_matches_python_interleave(self, spark):
        rows = [(3, 5), (255, 0), (0, 255), (170, 85), (0, 0)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r.x, r.y): r.z
            for r in df.select(
                "x", "y", zorder_key([F.col("x"), F.col("y")], 8).alias("z")
            ).collect()
        }

        def ref(x, y):
            z = 0
            for i in range(8):
                z |= ((x >> i) & 1) << (2 * i)
                z |= ((y >> i) & 1) << (2 * i + 1)
            return z

        for x, y in rows:
            assert got[(x, y)] == ref(x, y)

    def test_key_space_guard(self):
        with pytest.raises(ValueError):
            zorder_key([F.col("a"), F.col("b"), F.col("c"), F.col("d")], 16)

    def test_normalize_exact_edges(self, spark):
        df = spark.range(0, 1000).select(F.col("id"))
        cells = df.select(
            normalize_to_bits(F.col("id"), 0, 999, 4).alias("c")
        ).distinct()
        vals = sorted(r.c for r in cells.collect())
        assert vals == list(range(16))  # full range covered, nothing clipped

    def test_zorder_write_clusters_files(self, spark, tmp_path):
        path = str(tmp_path / "orders_z")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        zorder_write(orders, path, ["o_custkey", "o_orderkey"], bits=8, num_files=8)

        files = _data_files(path)
        assert len(files) > 1
        whole = spark.read.parquet(path)
        assert whole.count() == orders.count()

        glob_span = orders.agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("s")
        ).collect()[0].s
        spans = []
        for f in files:
            row = (
                spark.read.parquet(f)
                .agg((F.max("o_custkey") - F.min("o_custkey")).alias("s"))
                .collect()[0]
            )
            spans.append(row.s)
        # clustered files each cover a fraction of the custkey range
        assert sum(spans) / len(spans) < 0.6 * glob_span


class TestReviewRegressions:
    def test_compact_preserves_hive_partitioning(self, spark, tmp_path):
        path = str(tmp_path / "part_tbl")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        (
            orders.withColumn("status", F.col("o_orderstatus"))
            .repartition(12)
            .write.partitionBy("status")
            .parquet(path)
        )
        n_before = spark.read.parquet(path).count()
        files_before = len(_data_files(path))

        plan = compact_files(spark, path, target_file_bytes=1 << 30)
        assert not plan.skipped

        import glob as g

        part_dirs = g.glob(os.path.join(path, "status=*"))
        assert len(part_dirs) >= 2  # layout survived
        after = spark.read.parquet(path)
        assert after.count() == n_before
        assert "status" in after.columns
        assert len(_data_files(path)) < files_before
        # pruning still works on the compacted table
        plan_txt = (
            after.filter(F.col("status") == "F")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters" in plan_txt

    def test_zorder_empty_input_writes_through(self, spark, tmp_path):
        path = str(tmp_path / "empty_z")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter("o_orderkey < 0")
        zorder_write(orders, path, ["o_custkey", "o_orderkey"], bits=8)
        assert spark.read.parquet(path).count() == 0

    def test_normalize_rejects_wide_ranges(self, spark):
        import pytest as pt

        with pt.raises(ValueError):
            normalize_to_bits(F.col("x"), 0, 1 << 45, 16)
