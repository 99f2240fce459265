"""Oracle-checked surface for the multimodal operators.

The media table derives content = UTF-8 bytes of `documents.text`
(guaranteed single-byte ASCII by the synthetic corpus), so DuckDB can
replay every byte-level kernel with ascii()/substr()/md5 — giving the
mapInPandas plumbing a real cross-engine correctness gate, which a stubbed
codec path otherwise wouldn't have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from op_etl_spark.operators.multimodal import (
    byte_entropy_features,
    decode_media,
    frame_delta_features,
    media_table,
    pcm_frame_features,
    raw_image_table,
    raw_pcm_table,
    resize_raw_nearest,
    sample_frames,
)

from ._util import fround

_KIND_SQL = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"


def media_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(media_table(spark, sf_dir))


# fake_decode replayed in SQL: b_k = ascii(substr(text, k+1, 1))
ORACLE_DECODE = f"""
SELECT doc_id AS media_id,
       {_KIND_SQL} AS kind,
       CAST(len(text) AS INT) AS n_bytes,
       CASE WHEN doc_id % 3 = 0 THEN CAST(64 + ascii(substr(text,1,1)) % 64 AS INT) END AS width,
       CASE WHEN doc_id % 3 = 0 THEN CAST(64 + ascii(substr(text,2,1)) % 64 AS INT) END AS height,
       CASE WHEN doc_id % 3 = 0 THEN CAST(1 + ascii(substr(text,3,1)) % 4 AS INT) END AS channels,
       CASE WHEN doc_id % 3 = 1 THEN CAST(8000 * (1 + ascii(substr(text,1,1)) % 6) AS INT) END AS sample_rate,
       CASE WHEN doc_id % 3 = 1 THEN CAST(len(text) * 32 AS INT) END AS n_samples,
       CASE WHEN doc_id % 3 = 2 THEN CAST(12 + ascii(substr(text,1,1)) % 18 AS INT) END AS fps,
       CASE WHEN doc_id % 3 = 2 THEN CAST(greatest(1, len(text) // 256) AS INT) END AS n_frames
FROM documents
"""


def media_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = byte_entropy_features(media_table(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        fround("byte_entropy", 4).alias("byte_entropy"),
        fround("byte_mean", 4).alias("byte_mean"),
        "content_md5",
    )


ORACLE_ENTROPY = f"""
WITH cnt AS (
  SELECT doc_id, c, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents)
  WHERE c != '' GROUP BY 1, 2),
agg AS (
  SELECT doc_id, sum(n) AS total,
         sum(n * log2(n)) AS nlogn,
         sum(n * ascii(c)) AS bytesum
  FROM cnt GROUP BY 1)
SELECT d.doc_id AS media_id,
       {_KIND_SQL.replace("doc_id", "d.doc_id")} AS kind,
       CAST(len(d.text) AS INT) AS n_bytes,
       floor((CASE WHEN total > 1 THEN log2(total) - nlogn / total ELSE 0.0 END) * 10000 + 0.5) / 10000.0 AS byte_entropy,
       floor((bytesum / total) * 10000 + 0.5) / 10000.0 AS byte_mean,
       md5(d.text) AS content_md5
FROM documents d JOIN agg ON agg.doc_id = d.doc_id
"""


def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_table(spark, sf_dir), every_n=2, frame_bytes=64)


ORACLE_FRAMES = """
SELECT doc_id AS media_id,
       CAST(idx AS INT) AS frame_idx,
       md5(substr(text, idx * 64 + 1, 64)) AS frame_md5
FROM (
  SELECT doc_id, text, unnest(range(0, greatest(1, len(text) // 64), 2)) AS idx
  FROM documents WHERE doc_id % 3 = 2)
"""

RESIZE_OUT = 16  # resize every raster to 16x16x3


def raw_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL nearest-neighbor raster resize, cross-engine gated: every
    document-derived raw RGB raster (8..15 square, bytes = cycled text)
    is resized to 16x16 and reduced to integrity projections the DuckDB
    twin recomputes from pure index arithmetic — source index =
    (i * src) // out, byte = text[(linear index) mod len]. A wrong
    stride, transposed axis, or off-by-one in the kernel flips byte_sum
    or a corner byte and the hash mismatches."""
    out = resize_raw_nearest(
        raw_image_table(spark, sf_dir), RESIZE_OUT, RESIZE_OUT
    )
    return out.select("media_id", "src_h", "src_w", "n_bytes", "byte_sum", "tl", "br")


ORACLE_RAW_RESIZE = f"""
WITH dims AS (
  SELECT doc_id, text, len(text) AS n,
         8 + ascii(substr(text, 1, 1)) % 8 AS h,
         8 + ascii(substr(text, 2, 1)) % 8 AS w
  FROM documents
  -- empty-doc + ASCII contract, mirroring raw_image_table's filter
  WHERE len(text) > 0 AND len(text) = octet_length(CAST(text AS BLOB))),
px AS (
  SELECT doc_id, h, w, y, x, ch,
         ascii(substr(text,
           CAST((((y * h) // {RESIZE_OUT}) * w + ((x * w) // {RESIZE_OUT})) * 3 + ch AS BIGINT) % n + 1,
           1)) AS b
  FROM dims,
       (SELECT unnest(range(0, {RESIZE_OUT})) AS y),
       (SELECT unnest(range(0, {RESIZE_OUT})) AS x),
       (SELECT unnest(range(0, 3)) AS ch))
SELECT doc_id AS media_id,
       CAST(h AS INT) AS src_h, CAST(w AS INT) AS src_w,
       CAST({RESIZE_OUT * RESIZE_OUT * 3} AS INT) AS n_bytes,
       CAST(sum(b) AS BIGINT) AS byte_sum,
       CAST(max(CASE WHEN y = 0 AND x = 0 AND ch = 0 THEN b END) AS INT) AS tl,
       CAST(max(CASE WHEN y = {RESIZE_OUT - 1} AND x = {RESIZE_OUT - 1} AND ch = 2 THEN b END) AS INT) AS br
FROM px GROUP BY 1, 2, 3
"""


def pcm_frame_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL PCM DSP kernels, cross-engine gated: per full 64-sample
    frame of every document-derived int16 buffer — exact integer energy
    sum, RMS, and strict zero-crossing count, with DuckDB replaying the
    byte-pair sample decode and the within-frame lag product."""
    feats = pcm_frame_features(raw_pcm_table(spark, sf_dir))
    return feats.select(
        "media_id",
        "frame_idx",
        "n_samples",
        "energy_sum",
        fround("rms", 4).alias("rms"),
        "n_zero_cross",
    )


ORACLE_PCM_FRAMES = """
WITH s AS (
  SELECT doc_id, text, unnest(range(0, len(text) // 2)) AS i
  FROM documents),
v AS (
  SELECT doc_id, i, CAST(i // 64 AS INT) AS frame_idx,
         (ascii(substr(text, CAST(2 * i + 1 AS BIGINT), 1))
          + 256 * ascii(substr(text, CAST(2 * i + 2 AS BIGINT), 1))) - 16384 AS val
  FROM s),
f AS (SELECT doc_id, frame_idx FROM v GROUP BY 1, 2 HAVING count(*) = 64),
z AS (
  SELECT doc_id, frame_idx, i, val,
         lag(val) OVER (PARTITION BY doc_id, frame_idx ORDER BY i) AS pv
  FROM v),
agg AS (
  SELECT doc_id, frame_idx,
         sum(val * val) AS energy,
         sum(CASE WHEN pv IS NOT NULL AND pv * val < 0 THEN 1 ELSE 0 END) AS zc
  FROM z GROUP BY 1, 2)
SELECT a.doc_id AS media_id, CAST(a.frame_idx AS INT) AS frame_idx,
       CAST(64 AS INT) AS n_samples,
       CAST(energy AS BIGINT) AS energy_sum,
       floor(sqrt(energy / 64.0) * 10000 + 0.5) / 10000.0 AS rms,
       CAST(zc AS INT) AS n_zero_cross
FROM agg a JOIN f USING (doc_id, frame_idx)
"""


def frame_delta_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL frame-delta motion kernel, cross-engine gated: per
    consecutive full 64-byte frame pair of every video blob, the exact
    integer sum and the mean of absolute byte differences — DuckDB
    replays the per-position substr arithmetic."""
    deltas = frame_delta_features(media_table(spark, sf_dir), frame_bytes=64)
    return deltas.select(
        "media_id",
        "frame_idx",
        "sum_abs_diff",
        fround("mean_abs_diff", 4).alias("mean_abs_diff"),
    )


ORACLE_FRAME_DELTA = """
WITH v AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
pairs AS (
  SELECT doc_id, text, unnest(range(0, len(text) // 64 - 1)) AS f
  FROM v WHERE len(text) // 64 >= 2),
d AS (
  SELECT doc_id, f,
         abs(ascii(substr(text, CAST(f * 64 + j + 1 AS BIGINT), 1))
             - ascii(substr(text, CAST((f + 1) * 64 + j + 1 AS BIGINT), 1))) AS ad
  FROM pairs, (SELECT unnest(range(0, 64)) AS j))
SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
       CAST(sum(ad) AS BIGINT) AS sum_abs_diff,
       floor((sum(ad) / 64.0) * 10000 + 0.5) / 10000.0 AS mean_abs_diff
FROM d GROUP BY 1, 2
"""


ENTROPY_MIN = 3.0  # degenerate / constant-ish blobs drop here


def media_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal twin of `training_corpus_funnel`: the whole media
    hygiene pipeline as one DAG, reported per kind —

      raw -> entropy gate (degenerate blobs out) -> per-kind decode gate
      (images: <= 3 channels; audio: sample_rate >= 16 kHz; video: >= 2
      frames) -> kept counts + id checksum.

    Plan shape: the entropy kernel and the decode kernel each make one
    pass over the media table; their outputs join key-partitioned on
    media_id; the report is one aggregate over |kinds| groups. Every
    gate value is deterministic (fake decode + exact entropy), so the
    funnel is fully oracle-checked."""
    media = media_table(spark, sf_dir)
    ent = byte_entropy_features(media).select(
        "media_id", F.col("byte_entropy").alias("ent"), F.col("n_bytes").alias("nb")
    )
    meta = decode_media(media).select(
        "media_id", "kind", "channels", "sample_rate", "n_frames"
    )
    flags = (
        meta.join(ent, "media_id")
        .withColumn("f_entropy", (F.col("ent") >= ENTROPY_MIN) & (F.col("nb") >= 64))
        .withColumn(
            "f_kept",
            F.col("f_entropy")
            & (
                ((F.col("kind") == "image") & (F.col("channels") <= 3))
                | ((F.col("kind") == "audio") & (F.col("sample_rate") >= 16000))
                | ((F.col("kind") == "video") & (F.col("n_frames") >= 2))
            ),
        )
    )
    return flags.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.col("f_entropy").cast("long")).alias("n_entropy_ok"),
        F.sum(F.col("f_kept").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("f_kept"), F.col("media_id")).otherwise(0)).alias(
            "id_sum_kept"
        ),
    )


ORACLE_MEDIA_FUNNEL = f"""
WITH cnt AS (
  SELECT doc_id, c, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents)
  WHERE c != '' GROUP BY 1, 2),
ent AS (
  SELECT doc_id,
         CASE WHEN sum(n) > 1 THEN log2(sum(n)) - sum(n * log2(n)) / sum(n)
              ELSE 0.0 END AS ent,
         sum(n) AS nb
  FROM cnt GROUP BY 1),
flags AS (
  SELECT d.doc_id, {_KIND_SQL.replace("doc_id", "d.doc_id")} AS kind,
         (ent.ent >= {ENTROPY_MIN} AND ent.nb >= 64) AS f_entropy,
         (ent.ent >= {ENTROPY_MIN} AND ent.nb >= 64) AND (
           (d.doc_id % 3 = 0 AND 1 + ascii(substr(d.text, 3, 1)) % 4 <= 3)
           OR (d.doc_id % 3 = 1 AND 8000 * (1 + ascii(substr(d.text, 1, 1)) % 6) >= 16000)
           OR (d.doc_id % 3 = 2 AND greatest(1, len(d.text) // 256) >= 2)
         ) AS f_kept
  FROM documents d JOIN ent ON ent.doc_id = d.doc_id)
SELECT kind,
       count(*) AS n_raw,
       CAST(sum(CASE WHEN f_entropy THEN 1 ELSE 0 END) AS BIGINT) AS n_entropy_ok,
       CAST(sum(CASE WHEN f_kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN f_kept THEN doc_id ELSE 0 END) AS BIGINT) AS id_sum_kept
FROM flags GROUP BY 1
"""


QUERIES = {
    "media_decode_meta": media_decode_meta,
    "media_byte_entropy": media_byte_entropy,
    "media_frame_samples": media_frame_samples,
    "raw_resize_checksum": raw_resize_checksum,
    "pcm_frame_report": pcm_frame_report,
    "frame_delta_report": frame_delta_report,
    "media_curation_funnel": media_curation_funnel,
}

ORACLE = {
    "media_decode_meta": ORACLE_DECODE,
    "media_byte_entropy": ORACLE_ENTROPY,
    "media_frame_samples": ORACLE_FRAMES,
    "raw_resize_checksum": ORACLE_RAW_RESIZE,
    "pcm_frame_report": ORACLE_PCM_FRAMES,
    "frame_delta_report": ORACLE_FRAME_DELTA,
    "media_curation_funnel": ORACLE_MEDIA_FUNNEL,
}
