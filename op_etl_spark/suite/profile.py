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


def quartile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of integer-valued measures, bit-identical across
    engines: at q in {.25,.5,.75} the interpolation fraction is an exact
    quarter, so a + (b-a)*f is exact double arithmetic on integer inputs
    — Spark `percentile` == DuckDB `quantile_cont` with no rounding
    helper needed. (Arbitrary q or non-integer inputs lose this; see
    bench notes.) One pass per table, two tables unioned."""
    from pyspark.sql import functions as F

    def quarts(df: DataFrame, table: str, col: str) -> DataFrame:
        return df.agg(
            F.lit(table).alias("table_name"),
            F.lit(col).alias("column"),
            F.expr(f"percentile({col}, 0.25)").alias("q25"),
            F.expr(f"percentile({col}, 0.5)").alias("q50"),
            F.expr(f"percentile({col}, 0.75)").alias("q75"),
        )

    docs = quarts(read_table(spark, sf_dir, "documents"), "documents", "n_chars")
    li = quarts(read_table(spark, sf_dir, "lineitem"), "lineitem", "l_quantity")
    return docs.unionByName(li)


ORACLE_QUARTILES = """
SELECT 'documents' AS table_name, 'n_chars' AS column,
       quantile_cont(n_chars, 0.25) AS q25,
       quantile_cont(n_chars, 0.5) AS q50,
       quantile_cont(n_chars, 0.75) AS q75
FROM documents
UNION ALL
SELECT 'lineitem', 'l_quantity',
       quantile_cont(l_quantity, 0.25),
       quantile_cont(l_quantity, 0.5),
       quantile_cont(l_quantity, 0.75)
FROM lineitem
"""

def lang_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPWISE exact quartiles: document-length quartiles per language
    (the per-slice length profile a corpus-balance report needs). Same
    bit-exactness argument as `quartile_profile` (quarter-fraction
    interpolation on integer inputs), now under a groupBy: Spark runs
    `percentile` as a typed imperative aggregate with partial merge, so
    the plan is a single two-phase aggregation — per-group state is the
    value multiset, bounded by group size; at 100 TB you'd cap state with
    `approx_percentile` at the cost of the oracle's exactness."""
    from pyspark.sql import functions as F

    return (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("percentile(n_chars, 0.25)").alias("q25"),
            F.expr("percentile(n_chars, 0.5)").alias("q50"),
            F.expr("percentile(n_chars, 0.75)").alias("q75"),
        )
        .orderBy("lang")
    )


ORACLE_LANG_QUARTILES = """
SELECT lang, count(*) AS n_docs,
       quantile_cont(n_chars, 0.25) AS q25,
       quantile_cont(n_chars, 0.5) AS q50,
       quantile_cont(n_chars, 0.75) AS q75
FROM documents GROUP BY lang ORDER BY lang
"""


TOPK_DOCS = 25


def global_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by a measure — `orderBy(...).limit(k)`, which Spark
    physically plans as TakeOrderedAndProject: each task keeps a local
    k-row heap and the driver merges k*n_tasks candidates. The full
    corpus is NEVER globally sorted (contrast an unbounded `orderBy`,
    which range-partitions every row). Tie-broken on doc_id so the row
    SET is deterministic. Plan shape pinned in test_plan_properties."""
    from pyspark.sql import functions as F

    return (
        read_table(spark, sf_dir, "documents")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(TOPK_DOCS)
        .select("doc_id", "lang", "source", "n_chars")
    )


ORACLE_TOPK_DOCS = f"""
SELECT doc_id, lang, source, n_chars
FROM documents ORDER BY n_chars DESC, doc_id LIMIT {TOPK_DOCS}
"""


QUERIES = {
    "documents_profile": documents_profile,
    "quartile_profile": quartile_profile,
    "lang_quartiles": lang_quartiles,
    "global_topk_docs": global_topk_docs,
}
ORACLE = {
    "documents_profile": ORACLE_DOCUMENTS_PROFILE,
    "quartile_profile": ORACLE_QUARTILES,
    "lang_quartiles": ORACLE_LANG_QUARTILES,
    "global_topk_docs": ORACLE_TOPK_DOCS,
}
