"""Keyed streaming upsert (CDC latest-wins merge) into a parquet target.

The reference's load stage only knows full refresh (truncate-and-load,
etl/load_sde.py:92-121); a change stream needs MERGE: new keys insert,
existing keys take the highest-sequence version, late/replayed updates
lose. Without a table format, the naive foreachBatch merge rewrites the
WHOLE target every batch — a non-starter at 100 TB.

Bounded-rewrite design: the target is Hive-partitioned by a stable hash
bucket of the key (`__bucket = pmod(xxhash64(key), n_buckets)`). Each
micro-batch then
  1. reduces the batch to its latest row per key (one small shuffle),
  2. reads back ONLY the buckets the batch touches — a partition filter,
     so untouched buckets are never listed or read,
  3. re-merges latest-wins inside those buckets, and
  4. rewrites exactly those bucket directories via dynamic partition
     overwrite (`spark.sql.sources.partitionOverwriteMode=dynamic`).
Work per batch scales with |touched buckets| ~ |batch keys|, not with
target size. Retries are idempotent: merging the same batch twice is a
no-op (max-by-sequence is associative/commutative/idempotent), which is
exactly the foreachBatch redelivery contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException
from pyspark.sql.window import Window

BUCKET_COL = "__bucket"
DEFAULT_BUCKETS = 64


def _bucket(key_cols: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


def latest_per_key(df: DataFrame, key_cols: list[str], seq_col: str) -> DataFrame:
    """One row per key: the highest-sequence version. Ties broken by the
    remaining columns' struct order so the reduction is deterministic even
    on replayed duplicates."""
    others = [c for c in df.columns if c not in key_cols]
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), *[F.desc(c) for c in others if c != seq_col]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert_batch(
    batch_df: DataFrame,
    target_dir: str,
    key_cols: list[str],
    seq_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Merge one batch of updates into the bucketed parquet target."""
    spark = batch_df.sparkSession
    cols = batch_df.columns
    latest = latest_per_key(batch_df, key_cols, seq_col).withColumn(
        BUCKET_COL, _bucket(key_cols, n_buckets)
    )
    try:
        current = spark.read.parquet(target_dir)
        touched = [r[0] for r in latest.select(BUCKET_COL).distinct().collect()]
        current = current.filter(F.col(BUCKET_COL).isin(touched))
        merged = latest_per_key(
            current.select(*cols, BUCKET_COL).unionByName(
                latest.select(*cols, BUCKET_COL)
            ),
            key_cols,
            seq_col,
        )
    except AnalysisException:  # first batch: target doesn't exist yet
        merged = latest

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(target_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_upsert_target(spark: SparkSession, target_dir: str) -> DataFrame:
    """The merged state, without the internal bucket column."""
    return spark.read.parquet(target_dir).drop(BUCKET_COL)


def start_upsert_stream(
    updates: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    seq_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    available_now: bool = False,
):
    """foreachBatch MERGE of a change stream into `target_dir`."""

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        merge_upsert_batch(batch_df, target_dir, key_cols, seq_col, n_buckets)

    writer = (
        updates.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
