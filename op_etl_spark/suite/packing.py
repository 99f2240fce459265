"""Oracle-checked queries for sequence packing (operators/packing.py).

Token cost = whitespace token count (exact on the ASCII corpus in both
engines); shard = language; order = doc_id. The per-sequence rollup pins
every document's (shard, seq_id, offset) assignment — one misplaced
document shifts a checksum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import SEQ_COL, pack_sequences
from ._util import read_table

TARGET_TOKENS = 2048


def packed_sequence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("toks")
    )
    packed = pack_sequences(d, "toks", ["doc_id"], TARGET_TOKENS, shard_col="lang")
    return packed.groupBy("lang", SEQ_COL).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("sum_toks"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_PACKED = f"""
WITH t AS (
  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
c AS (
  SELECT lang, doc_id, toks,
         sum(toks) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - toks AS seq_offset
  FROM t)
SELECT lang, CAST(seq_offset // {TARGET_TOKENS} AS BIGINT) AS seq_id,
       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS sum_toks,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c
GROUP BY 1, 2
"""

QUERIES = {"packed_sequence_stats": packed_sequence_stats}
ORACLE = {"packed_sequence_stats": ORACLE_PACKED}
