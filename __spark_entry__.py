"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The query surface lives in ``op_etl_spark.suite`` (relational, text
analysis, dedup, similarity search, geospatial-ETL operators); this
module just exposes it in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from op_etl_spark import suite  # noqa: E402
from op_etl_spark.suite.relational import q1_pricing_summary  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary: full-scan multi-aggregate) on
    /root/testdata/sf0.001; driver checks rows>0 and a stable schema."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline extensions)."""
    return suite.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (same column names,
    same rounding) — the correctness gate."""
    return suite.all_oracles()
