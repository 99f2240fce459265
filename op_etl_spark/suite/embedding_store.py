"""Embedding feature-store operators: int8 quantization and per-dimension
normalization statistics.

At 100 TB an embedding column is the storage and bandwidth budget:
float32 x 64 dims x billions of rows. The two standard levers:

- **affine int8 quantization** (4x smaller, what vector stores ship):
  per-vector (min, max) -> 8-bit codes. Entirely narrow array
  expressions (`transform`/`aggregate`), zero shuffle, and the
  round-trip error bound is part of the output so a pipeline can gate
  on quantization loss.
- **per-dimension corpus statistics** (the normalize-before-index
  step): mean via exact integer tick sums (the same order-independent
  trick as the label centroids — float sums would differ between
  engines and partitionings), min/max exact. posexplode + groupBy(pos):
  the 64x fanout buys full map-side combine, so the shuffle carries
  (dims x partitions) partial rows, not vectors.

Determinism: every float expression is written with the identical
operation order on both engines (quantize: ((x - vmin) * 255.0) /
(vmax - vmin) + 0.5), sums are integers, min/max are exact — so the
oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import fround, read_table

QTICK = 1_000_000  # fixed-point unit for exact mean sums


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings", fan=True)


def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector affine int8 quantization report: the (vmin, vmax)
    codebook, the code checksum (exact integer — pins every code), and
    the max absolute round-trip error. Flat vectors (vmax == vmin)
    quantize to all-zero codes with zero error. Narrow: one projection,
    no shuffle, no UDF — `transform`/`aggregate` stay in codegen."""
    x = F.col("embedding")
    vmin = F.array_min(x).cast("double")
    vmax = F.array_max(x).cast("double")
    rng = vmax - vmin

    def q(v):
        return F.when(rng == 0, F.lit(0).cast("long")).otherwise(
            F.floor((v.cast("double") - vmin) * 255.0 / rng + 0.5).cast("long")
        )

    codes = F.transform(x, q)
    recon_err = F.transform(
        F.arrays_zip(x.alias("v"), codes.alias("c")),
        lambda p: F.abs(
            p["v"].cast("double") - (vmin + p["c"] * rng / 255.0)
        ),
    )
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        fround(vmin, 6).alias("vmin"),
        fround(vmax, 6).alias("vmax"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda acc, c: acc + c
        ).alias("code_sum"),
        fround(F.array_max(recon_err), 6).alias("max_abs_err"),
    )


ORACLE_QUANTIZE = """
WITH base AS (
  SELECT vec_id, embedding,
         CAST(list_min(embedding) AS DOUBLE) AS vmin,
         CAST(list_max(embedding) AS DOUBLE) AS vmax
  FROM embeddings),
coded AS (
  SELECT vec_id, vmin, vmax,
         CASE WHEN vmax = vmin
              THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
              ELSE list_transform(embedding,
                v -> CAST(floor((CAST(v AS DOUBLE) - vmin) * 255.0 / (vmax - vmin) + 0.5) AS BIGINT))
         END AS codes,
         embedding
  FROM base)
SELECT vec_id,
       floor(vmin * 1000000 + 0.5) / 1000000.0 AS vmin,
       floor(vmax * 1000000 + 0.5) / 1000000.0 AS vmax,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       floor(list_max(
         list_transform(list_zip(embedding, codes),
           p -> abs(CAST(p[1] AS DOUBLE) - (vmin + p[2] * (vmax - vmin) / 255.0)))
       ) * 1000000 + 0.5) / 1000000.0 AS max_abs_err
FROM coded
"""


def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics for embedding normalization:
    count, exact-integer-sum mean, and exact min/max per position.
    posexplode to (pos, value) then ONE aggregate over 64 groups with
    full map-side combine — the shuffle moves (dims x partitions)
    partial rows regardless of corpus size."""
    emb = _emb(spark, sf_dir)
    ex = emb.select(F.posexplode("embedding").alias("pos", "x")).select(
        "pos",
        F.col("x").cast("double").alias("x"),
        F.floor(F.col("x").cast("double") * QTICK + 0.5).cast("long").alias("t"),
    )
    return ex.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        fround(F.sum("t") / F.lit(float(QTICK)) / F.count(F.lit(1)), 6).alias("mean"),
        fround(F.min("x"), 6).alias("dim_min"),
        fround(F.max("x"), 6).alias("dim_max"),
    )


ORACLE_DIM_STATS = f"""
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings)
SELECT CAST(pos AS INT) AS pos,
       count(*) AS n,
       floor((sum(CAST(floor(x * {QTICK} + 0.5) AS BIGINT)) / {QTICK}.0 / count(*))
             * 1000000 + 0.5) / 1000000.0 AS mean,
       floor(min(x) * 1000000 + 0.5) / 1000000.0 AS dim_min,
       floor(max(x) * 1000000 + 0.5) / 1000000.0 AS dim_max
FROM ex
GROUP BY pos
"""


QUERIES = {
    "embedding_int8_quantize": embedding_int8_quantize,
    "embedding_dim_stats": embedding_dim_stats,
}

ORACLE = {
    "embedding_int8_quantize": ORACLE_QUANTIZE,
    "embedding_dim_stats": ORACLE_DIM_STATS,
}
