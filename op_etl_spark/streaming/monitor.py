"""Streaming distribution monitor: per-(feature, bucket) counts over an
unbounded stream with BOUNDED state.

The streaming twin of suite/monitoring.drift_bucket_report: a feed's
bucket histogram is maintained as a streaming aggregation whose state is
|features| x |buckets| rows — a few hundred groups regardless of stream
volume, so `complete` output mode is cheap and the monitor runs forever.
Drift against a reference histogram is then a batch-side join of two
tiny count tables; the heavy corpus never re-enters the computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_feature_buckets(chars_bucket_size: int) -> Column:
    """The shared feature/bucket definition: lang (categorical) and
    n_chars in fixed-width bins. One array of (feature, bucket) structs
    per document — batch and stream paths explode the same expression,
    so their histograms are comparable by construction."""
    return F.array(
        F.struct(F.lit("lang").alias("feature"), F.col("lang").alias("bucket")),
        F.struct(
            F.lit("chars_bucket").alias("feature"),
            F.floor(F.col("n_chars") / chars_bucket_size).cast("string").alias("bucket"),
        ),
    )


def bucket_counts_stream(docs: DataFrame, chars_bucket_size: int) -> DataFrame:
    """(feature, bucket, n) counts over a document stream (or batch — the
    same code runs on both, the suite's stream==batch==oracle chain).
    State is bounded by the bucket domain, not the stream."""
    return (
        docs.select(F.explode(doc_feature_buckets(chars_bucket_size)).alias("f"))
        .groupBy("f.feature", "f.bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
