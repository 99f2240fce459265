"""Catalog-backed DDL surface (D1-D6 on the metastore)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from op_etl_spark.sinks import catalog as cat


@pytest.fixture(scope="module")
def db(spark):
    name = cat.ensure_database(spark, "TESTCAT")
    yield name
    for t in spark.catalog.listTables(name):
        spark.sql(f"DROP TABLE IF EXISTS {name}.{t.name}")
    spark.sql(f"DROP DATABASE IF EXISTS {name}")


def _df(spark, n=5):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("x").alias("tag")
    )


class TestDatabaseRouting:
    def test_authority_namespace(self, spark, db):
        assert db == "underlag_testcat"
        assert spark.catalog.databaseExists(db)

    def test_special_case_mapping(self, spark):
        name = cat.ensure_database(spark, "LSTD")
        try:
            assert name == "gng_underlag_lstd"
        finally:
            spark.sql(f"DROP DATABASE IF EXISTS {name}")

    def test_illegal_identifier_rejected(self):
        with pytest.raises(ValueError, match="illegal"):
            cat._check_ident("evil; DROP TABLE x")


class TestTruncateAndLoad:
    def test_full_refresh_is_idempotent(self, spark, db):
        fq = cat.truncate_and_load_table(_df(spark, 5), db, "roads")
        assert spark.table(fq).count() == 5
        cat.truncate_and_load_table(_df(spark, 3), db, "roads")
        assert spark.table(fq).count() == 3  # truncate-then-load, not append

    def test_template_alignment_no_test_semantics(self, spark, db):
        template = _df(spark, 1)
        incoming = spark.range(4).select(
            F.col("id"), F.lit("extra").alias("junk")  # missing v/tag, extra col
        )
        fq = cat.truncate_and_load_table(incoming, db, "aligned", template=template)
        got = spark.table(fq)
        assert [f.name for f in got.schema.fields] == ["id", "v", "tag"]
        assert got.filter("v IS NULL").count() == 4

    def test_create_like_zero_rows(self, spark, db):
        fq = cat.create_table_like(spark, _df(spark), db, "empty_t")
        assert spark.table(fq).count() == 0
        assert [f.name for f in spark.table(fq).schema.fields] == ["id", "v", "tag"]


class TestDropRenameClear:
    def test_rename_and_drop(self, spark, db):
        cat.truncate_and_load_table(_df(spark, 2), db, "tmp_swap")
        cat.rename_table(spark, db, "tmp_swap", "final_name")
        assert spark.catalog.tableExists(f"{db}.final_name")
        assert not spark.catalog.tableExists(f"{db}.tmp_swap")
        cat.drop_table(spark, db, "final_name")
        assert not spark.catalog.tableExists(f"{db}.final_name")

    def test_clear_database(self, spark, db):
        cat.truncate_and_load_table(_df(spark, 1), db, "a_t")
        cat.truncate_and_load_table(_df(spark, 1), db, "b_t")
        n = cat.clear_database(spark, db)
        assert n >= 2
        assert spark.catalog.listTables(db) == []
