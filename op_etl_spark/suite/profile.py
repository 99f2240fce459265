"""Oracle-checked queries for the column profiler (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import profile_columns, profile_sql
from ._util import read_table

PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column profile of the documents table — null counts,
    cardinalities, lexicographic/numeric ranges, one aggregate pass."""
    return profile_columns(
        read_table(spark, sf_dir, "documents"), PROFILE_COLS, exact=True
    )


ORACLE_DOCUMENTS_PROFILE = profile_sql("documents", PROFILE_COLS)

QUERIES = {"documents_profile": documents_profile}
ORACLE = {"documents_profile": ORACLE_DOCUMENTS_PROFILE}
