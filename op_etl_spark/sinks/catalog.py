"""Catalog-backed DDL surface (reference §2.11 D1-D6 on the metastore).

The path-based sinks (sinks/load.py) are the file-layout form; this
module is the same surface expressed through Spark's catalog, which is
what a shared-cluster deployment uses (databases visible to every
engine, `spark_catalog` governed by the metastore):

 - D1 create database   -> CREATE DATABASE IF NOT EXISTS (one per
   authority dataset, reference run.py:154-180 / load_sde.py:145-169)
 - D3 create table      -> saveAsTable / CREATE TABLE LIKE-template
 - D4 truncate          -> INSERT OVERWRITE via saveAsTable(overwrite)
 - D5 drop/rename       -> DROP TABLE / ALTER ... RENAME
 - D6 clear staging     -> loop DROP over the database's table listing
   (reference stage_files.py:704-725)

Identifiers are validated (alnum + underscore) before interpolation —
table names derive from slugged source names, never raw user input.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .load import align_to_template, dataset_for_authority

_IDENT = re.compile(r"^[a-z_][a-z0-9_]*$")


def _check_ident(name: str) -> str:
    if not all(_IDENT.match(part) for part in name.split(".")):
        raise ValueError(f"illegal catalog identifier: {name!r}")
    return name


def ensure_database(spark: SparkSession, authority: str) -> str:
    """D1/K4: the authority's dataset namespace as a real database."""
    db = _check_ident(dataset_for_authority(authority).replace(".", "_"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    return db


def truncate_and_load_table(
    df: DataFrame, db: str, table: str, template: DataFrame | None = None
) -> str:
    """K2/D4: idempotent full refresh of a catalog table."""
    fq = f"{_check_ident(db)}.{_check_ident(table)}"
    out = align_to_template(df, template) if template is not None else df
    out.write.mode("overwrite").format("parquet").saveAsTable(fq)
    return fq


def create_table_like(
    spark: SparkSession, template: DataFrame, db: str, table: str
) -> str:
    """K3/D3: zero-row table with the template's schema."""
    fq = f"{_check_ident(db)}.{_check_ident(table)}"
    template.limit(0).write.mode("overwrite").format("parquet").saveAsTable(fq)
    return fq


def rename_table(spark: SparkSession, db: str, old: str, new: str) -> None:
    """D5 rename (the reference's delete+rename swap collapses to this)."""
    spark.sql(
        f"ALTER TABLE {_check_ident(db)}.{_check_ident(old)} "
        f"RENAME TO {_check_ident(db)}.{_check_ident(new)}"
    )


def drop_table(spark: SparkSession, db: str, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {_check_ident(db)}.{_check_ident(table)}")


def clear_database(spark: SparkSession, db: str) -> int:
    """D6: drop every table in the staging database; returns count."""
    _check_ident(db)
    tables = [t.name for t in spark.catalog.listTables(db)]
    for t in tables:
        drop_table(spark, db, t)
    return len(tables)
