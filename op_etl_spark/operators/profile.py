"""Column profiling: the per-column statistics sweep (nulls, cardinality,
range) an ingest pipeline runs before trusting a new batch — the
engine-side generalization of the reference's per-source count checks and
schema validation (etl/monitoring.py:200-230, etl/stage_files.py schema
guards).

One aggregate pass produces every column's metrics; the per-column rows
come from exploding an array-of-structs built over the single result row
(driver-free, no per-column jobs). Exact n_distinct uses Spark's
multi-count-distinct EXPAND (data duplicated per distinct-aggregate) —
fine for routine widths; at 100 TB-with-many-columns set exact=False for
one-pass HyperLogLog sketches instead.

Values are surfaced as strings so one DataFrame profiles heterogeneous
columns; numeric formatting of doubles differs across engines, so the
oracle-checked suite entry sticks to integer/string columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """(column, n_rows, n_nonnull, n_distinct, min_value, max_value) per
    profiled column, in one aggregate pass."""
    cols = cols or df.columns
    ndv = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.struct(
                F.count(c).alias("n_nonnull"),
                ndv(F.col(c)).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            ).alias(f"__p_{c}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__p_{c}.n_nonnull").alias("n_nonnull"),
                F.col(f"__p_{c}.n_distinct").alias("n_distinct"),
                F.col(f"__p_{c}.min_value").alias("min_value"),
                F.col(f"__p_{c}.max_value").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def profile_sql(table: str, cols: list[str]) -> str:
    """Oracle twin of `profile_columns(exact=True)` for integer/string
    columns (double formatting diverges across engines)."""
    parts = [
        f"""SELECT '{c}' AS column, count(*) AS n_rows, count({c}) AS n_nonnull,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value, CAST(max({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)
