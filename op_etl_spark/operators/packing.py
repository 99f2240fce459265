"""Sequence packing: assign documents to fixed-token-budget training
sequences ("concatenate in order, cut every N tokens").

The standard LLM pre-training data op: documents are concatenated in a
deterministic order and sliced into constant-length sequences; a
document's sequence id is the slice its first token lands in. Assignment
is a running sum — no UDF, no collect: one window cumsum per shard.

Scale contract: a single global ordering would serialize the cumsum into
one partition, so packing is sharded (`shard_col` — a date, a language, a
hash bucket). Each shard packs independently in its own window partition;
sequences never span shards, which is also what you want operationally
(shards are the unit of reshuffling/curriculum mixing). Within a shard
the window is one shuffle on the shard key.

All arithmetic is exact: integer token costs, integer cumsum, and the
bin division uses the (n - n % d) / d form so the one double division is
exact — bit-identical to SQL `//` in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SEQ_COL = "seq_id"
OFFSET_COL = "seq_offset"


def _exact_div(n: Column, d: int) -> Column:
    return ((n - n % F.lit(d)) / F.lit(d)).cast("long")


def pack_sequences(
    df: DataFrame,
    cost_col: str,
    order_cols: list[str],
    target_tokens: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Add `seq_id` (which fixed-budget sequence this row starts in, per
    shard) and `seq_offset` (the row's first-token offset within the
    shard's concatenation). `cost_col` must be a non-negative integer
    token count."""
    parts = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(cost_col)).over(w) - F.col(cost_col)).cast("long")
    return df.withColumn(OFFSET_COL, start).withColumn(
        SEQ_COL, _exact_div(F.col(OFFSET_COL), target_tokens)
    )
