"""File-statistics data skipping: a min/max manifest over a parquet
directory, and reads that open only the files a predicate can match.

Parquet footers already hold row-group min/max, but the scan still has to
LIST and OPEN every file to read them — at 100 TB with millions of files
the footer round-trips dominate selective queries. Table formats solve
this by keeping per-file stats in the commit log; this operator is that
idea for plain parquet directories: one aggregation job builds a tiny
(file, col_min, col_max, rows) manifest, and `pruned_read` consults it to
turn a range predicate into an explicit file list BEFORE any footer IO.

Composes with `zorder_write`: after clustering, per-file ranges are
narrow on every clustered column, so the manifest prunes aggressively on
any of them. The manifest is ordinary parquet — rebuildable at any time,
and itself broadcastable (one row per file).

Pruning is conservative (keeps any file whose [min, max] intersects the
requested range; null-only columns keep the file), so results equal the
unpruned read exactly — guaranteed by construction, pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR_SUFFIX = ".__stats__"


def build_stats_index(
    spark: SparkSession, path: str, cols: list[str], index_path: str | None = None
) -> str:
    """Aggregate per-file min/max/rows for `cols` and persist the manifest
    next to the table (or at `index_path`). One scan of the listed
    columns, grouped by input_file_name — a shuffle of one row per file."""
    index_path = index_path or path.rstrip("/") + MANIFEST_DIR_SUFFIX
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(index_path)
    )
    return index_path


def prune_files(
    spark: SparkSession,
    index_path: str,
    ranges: dict[str, tuple],
) -> list[str]:
    """Files whose stats intersect every requested [lo, hi] range.
    `ranges` maps column -> (lo, hi); either bound may be None for
    open-ended. Files with null or missing stats for a column are kept
    (conservative — an all-null or unindexed column can't disqualify a
    file)."""
    manifest = spark.read.parquet(index_path)
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if f"min_{c}" not in manifest.columns:
            continue  # column not indexed: cannot disqualify anything
        keep = F.lit(True)
        if hi is not None:
            keep = keep & (F.col(f"min_{c}") <= F.lit(hi))
        if lo is not None:
            keep = keep & (F.col(f"max_{c}") >= F.lit(lo))
        cond = cond & (keep | F.col(f"min_{c}").isNull())
    return [r.file for r in manifest.filter(cond).select("file").collect()]


def pruned_read(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple],
    index_path: str | None = None,
) -> DataFrame:
    """Read only the files the manifest says can match, then apply the
    exact range filter. Equal to the unpruned filtered read by
    construction; at scale the win is skipping the listing/footer IO for
    excluded files entirely."""
    index_path = index_path or path.rstrip("/") + MANIFEST_DIR_SUFFIX
    files = prune_files(spark, index_path, ranges)
    # basePath keeps Hive partition columns resolvable when reading leaf
    # files directly, so the pruned schema always equals the unpruned one
    df = (
        spark.read.option("basePath", path).parquet(*files)
        if files
        else spark.read.parquet(path).limit(0)
    )
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df
