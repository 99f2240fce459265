"""Multimodal (image / audio / video) column operators.

Media are opaque `binary` columns plus typed metadata — the layout a
training-data pipeline uses at 100 TB scale: content bytes never pass
through the driver, decode/feature kernels run as Arrow-batched
`mapInPandas` over partition-local blobs, and every transformation keeps
(media_id, kind) so downstream joins stay co-partitioned.

The container has no image/audio codecs (PIL, soundfile, av are absent),
so the DECODE step is stubbed exactly as the build brief prescribes:

 - `decode_media`   — tries real decoders behind an import-guard; when the
                      libs are missing it applies a DETERMINISTIC FAKE
                      decoder (metadata derived from the leading content
                      bytes) so the Spark-side plumbing — schema,
                      partitioning, UDF signature, Arrow batch shape — is
                      real and testable end to end.
 - `resize_images`  — real PIL path or a clearly-marked
                      NotImplementedError; `fake_resize` provides the
                      deterministic stand-in used by tests.

`byte_entropy_features` and `sample_frames` are NOT stubs — byte-level
statistics and fixed-stride frame slicing are real kernels that run the
same on fake or genuine media bytes.

The suite exposes oracle-checked queries over a media table derived
deterministically from `documents` (content = UTF-8 text bytes, which the
synthetic corpus guarantees are single-byte ASCII — so DuckDB can replay
byte arithmetic with ascii()/substr()).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRAME_BYTES = 256  # fixed-stride fake "frame" size for video sampling

MEDIA_DDL = (
    "media_id bigint, kind string, content binary, "
    "meta struct<n_bytes:int, tag:string>"
)

DECODED_DDL = (
    "media_id bigint, kind string, n_bytes int, "
    "width int, height int, channels int, "
    "sample_rate int, n_samples int, "
    "fps int, n_frames int"
)

FEATURES_DDL = (
    "media_id bigint, kind string, n_bytes int, byte_entropy double, "
    "byte_mean double, content_md5 string"
)

FRAMES_DDL = "media_id bigint, frame_idx int, frame_md5 string"

_KINDS = ("image", "audio", "video")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table over `documents`: content = text bytes,
    kind round-robins by doc_id. Stands in for a real (path, bytes) scan
    of `spark.read.format("binaryFile")` at production scale."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.length("text").cast("int").alias("n_bytes"),
            F.col("source").alias("tag"),
        ).alias("meta"),
    )


# --- decode (stubbed behind import-guard, deterministic fake fallback) ---

def _try_real_image_decode(buf: bytes):
    try:
        import io

        from PIL import Image  # noqa: F401  (absent in this container)
    except ImportError:
        return None
    try:
        img = Image.open(io.BytesIO(buf))
        return img.width, img.height, len(img.getbands())
    except Exception:
        return None


def fake_decode(kind: str, buf: bytes) -> dict:
    """DETERMINISTIC FAKE decode — used when codec libs are absent.
    Metadata is a pure function of the leading content bytes, so tests
    (and the DuckDB oracle) can replay it exactly."""
    b0 = buf[0] if len(buf) > 0 else 0
    b1 = buf[1] if len(buf) > 1 else 0
    b2 = buf[2] if len(buf) > 2 else 0
    out = {
        "width": None, "height": None, "channels": None,
        "sample_rate": None, "n_samples": None, "fps": None, "n_frames": None,
    }
    if kind == "image":
        out.update(width=64 + b0 % 64, height=64 + b1 % 64, channels=1 + b2 % 4)
    elif kind == "audio":
        out.update(sample_rate=8000 * (1 + b0 % 6), n_samples=len(buf) * 32)
    elif kind == "video":
        out.update(fps=12 + b0 % 18, n_frames=max(1, len(buf) // FRAME_BYTES))
    return out


def decode_media(media: DataFrame) -> DataFrame:
    """(media_id, kind, content, ...) -> typed decode metadata.

    Real decoders when available (PIL for images); the deterministic fake
    otherwise. Arrow-batched mapInPandas — one Python roundtrip per batch,
    never per row; blobs stay partition-local."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, buf in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                buf = bytes(buf)
                meta = None
                if kind == "image":
                    real = _try_real_image_decode(buf)
                    if real is not None:
                        meta = dict(fake_decode("", b""), width=real[0],
                                    height=real[1], channels=real[2])
                if meta is None:
                    meta = fake_decode(kind, buf)
                rows.append({"media_id": mid, "kind": kind, "n_bytes": len(buf), **meta})
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "width", "height",
                         "channels", "sample_rate", "n_samples", "fps", "n_frames"],
            )

    return media.mapInPandas(run, DECODED_DDL)


# --- byte-level feature extraction (real kernel, vectorized numpy) ---

def byte_entropy_features(media: DataFrame) -> DataFrame:
    """Shannon entropy (bits) of the byte distribution + mean byte value +
    content md5 per blob. Real computation — numpy over Arrow batches."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, buf in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = arr.size
                if n == 0:
                    ent, mean = 0.0, 0.0
                else:
                    counts = np.bincount(arr, minlength=256).astype(np.float64)
                    nz = counts[counts > 0]
                    # log2(n) - sum(c*log2(c))/n: one pass, no per-bin p
                    ent = float(math.log2(n) - np.dot(nz, np.log2(nz)) / n) if n > 1 else 0.0
                    mean = float(arr.mean())
                rows.append(
                    {
                        "media_id": mid, "kind": kind, "n_bytes": n,
                        "byte_entropy": ent, "byte_mean": mean,
                        "content_md5": hashlib.md5(bytes(buf)).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "byte_entropy",
                         "byte_mean", "content_md5"],
            )

    return media.mapInPandas(run, FEATURES_DDL)


# --- raw-raster kernels (REAL image math, no codec needed) ---
#
# Decoding a compressed format needs a codec library; OPERATING on a
# decoded raster does not. Production pipelines run decode once and then
# chains of raster kernels (resize, crop, normalize) on raw uint8 arrays
# — that second stage is implemented here for real: numpy over Arrow
# batches, deterministic, oracle-checkable (the suite replays
# nearest-neighbor indexing arithmetic in DuckDB byte-for-byte).

RAW_DDL = "media_id bigint, height int, width int, channels int, content binary"

RESIZED_CHECK_DDL = (
    "media_id bigint, src_h int, src_w int, n_bytes int, "
    "byte_sum bigint, tl int, br int"
)


def raw_image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic raw uint8 RGB rasters derived from `documents`:
    dims (8..15 x 8..15 x 3) from the two leading text bytes, buffer =
    text bytes cycled to h*w*3. Construction is pure column expressions
    (repeat + substring + encode) — the raster bytes never touch Python
    until a kernel consumes them.

    Contract: empty-text documents produce NO raster (filtered here and in
    the DuckDB oracle alike — repeat over an empty string cannot fill a
    buffer, and target/length(text) would divide by zero). The repeat/
    substring construction counts CHARS while the kernel consumes BYTES,
    so the cycled-buffer equivalence assumes single-byte (ASCII) text —
    true of the synthetic corpus and asserted cheaply via the
    char-length==byte-length filter below."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        (F.length("text") > 0)
        & (F.length("text") == F.octet_length("text"))  # ASCII-only contract
    )
    h = (F.lit(8) + F.ascii(F.substring("text", 1, 1)) % 8).cast("int")
    w = (F.lit(8) + F.ascii(F.substring("text", 2, 1)) % 8).cast("int")
    return (
        d.select(
            F.col("doc_id").alias("media_id"),
            h.alias("height"),
            w.alias("width"),
            F.lit(3).alias("channels"),
            "text",
        )
        .withColumn("target", (F.col("height") * F.col("width") * 3).cast("int"))
        .withColumn(
            "content",
            F.encode(
                F.expr(
                    "substring(repeat(text, CAST(target / length(text) AS INT) + 1),"
                    " 1, target)"
                ),
                "UTF-8",
            ),
        )
        .drop("text", "target")
    )


def resize_raw_nearest(raw: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor resize of raw (h, w, c) uint8 rasters.
    Source index = (i * src_dim) // out_dim (pure integer arithmetic, so
    the suite's DuckDB oracle replays it exactly). Returns the resized
    raster plus integrity projections (byte_sum, corner bytes) computed
    in the same kernel."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(raw.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, hh, ww, cc, buf in zip(
                pdf["media_id"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["content"],
            ):
                img = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(hh, ww, cc)
                ry = (np.arange(out_h) * hh) // out_h
                rx = (np.arange(out_w) * ww) // out_w
                out = img[ry][:, rx]
                rows.append(
                    {
                        "media_id": mid, "src_h": int(hh), "src_w": int(ww),
                        "n_bytes": int(out.size),
                        "byte_sum": int(out.sum(dtype=np.int64)),
                        "tl": int(out[0, 0, 0]), "br": int(out[-1, -1, -1]),
                        "content": out.tobytes(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "src_h", "src_w", "n_bytes",
                         "byte_sum", "tl", "br", "content"],
            )

    return raw.mapInPandas(run, RESIZED_CHECK_DDL + ", content binary")


def resize_raw_bilinear(raw: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL bilinear resize (pixel-center convention: src = (i + 0.5) *
    src/out - 0.5, clamped; round-half-up back to uint8). Identity sizes
    reproduce the input exactly; constant rasters stay constant — both
    unit-pinned. Not oracle-checked (float interpolation has no clean
    SQL twin); the nearest kernel carries the cross-engine gate."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(raw.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, hh, ww, cc, buf in zip(
                pdf["media_id"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["content"],
            ):
                img = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(
                    hh, ww, cc
                ).astype(np.float64)
                sy = np.clip((np.arange(out_h) + 0.5) * hh / out_h - 0.5, 0, hh - 1)
                sx = np.clip((np.arange(out_w) + 0.5) * ww / out_w - 0.5, 0, ww - 1)
                y0 = np.floor(sy).astype(np.int64)
                x0 = np.floor(sx).astype(np.int64)
                y1 = np.minimum(y0 + 1, hh - 1)
                x1 = np.minimum(x0 + 1, ww - 1)
                fy = (sy - y0)[:, None, None]
                fx = (sx - x0)[None, :, None]
                out = (
                    img[y0][:, x0] * (1 - fy) * (1 - fx)
                    + img[y0][:, x1] * (1 - fy) * fx
                    + img[y1][:, x0] * fy * (1 - fx)
                    + img[y1][:, x1] * fy * fx
                )
                out8 = np.floor(out + 0.5).clip(0, 255).astype(np.uint8)
                rows.append(
                    {
                        "media_id": mid, "height": out_h, "width": out_w,
                        "channels": int(cc), "content": out8.tobytes(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "channels", "content"]
            )

    return raw.mapInPandas(run, RAW_DDL)


# --- resize of CODEC formats (real-or-raise stub + deterministic fake) ---

def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize for codec-compressed formats (jpeg/png/...). The container
    ships no codec libraries, so this raises NotImplementedError at
    plan-build time when PIL is absent — the clearly-marked stub
    boundary. The raster-level resize itself is NOT stubbed: see
    `resize_raw_nearest` / `resize_raw_bilinear`, real numpy kernels
    over raw uint8 buffers (what runs after decode in production)."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - PIL absent by design
        raise NotImplementedError(
            "resize_images requires an image codec (PIL); not available in "
            "this environment. The Spark-side plumbing is exercised via "
            "fake_resize / decode_media instead."
        ) from exc
    raise NotImplementedError("real resize path reserved for codec-enabled builds")


def fake_resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """Deterministic stand-in for resize: content re-strided to
    width*height bytes (truncate or cycle), meta updated. Exercises the
    real plumbing — binary in, binary out, same partitioning."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, buf in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                buf = bytes(buf)
                if not buf:
                    resized = b"\x00" * target
                else:
                    reps = -(-target // len(buf))
                    resized = (buf * reps)[:target]
                out.append(
                    {
                        "media_id": mid, "kind": kind, "content": resized,
                        "meta": {"n_bytes": target, "tag": f"resized_{width}x{height}"},
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "kind", "content", "meta"])

    return media.mapInPandas(run, MEDIA_DDL)


# --- frame sampling (real kernel over fixed-stride frames) ---

def sample_frames(
    media: DataFrame, every_n: int = 4, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """Fixed-stride frame slicing: content split into `frame_bytes`-byte
    frames, every `every_n`-th kept (with its md5). On genuine video this
    is where a demuxer slots in; the slicing/batching/fan-out shape is
    identical."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, buf in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if kind != "video":
                    continue
                buf = bytes(buf)
                n_frames = max(1, len(buf) // frame_bytes)
                for idx in range(0, n_frames, every_n):
                    frame = buf[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows.append(
                        {
                            "media_id": mid, "frame_idx": idx,
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return media.mapInPandas(run, FRAMES_DDL)


# --- raw-PCM kernels (REAL audio DSP, no codec needed) ---
#
# Same contract as the raster kernels: decoding mp3/flac needs a codec,
# but the DSP a pipeline runs on DECODED PCM (frame energy, RMS,
# zero-crossing rate — the standard cheap audio-quality / speech-activity
# signals) is plain integer/float math, implemented here for real.

PCM_FEATURES_DDL = (
    "media_id bigint, frame_idx int, n_samples int, "
    "energy_sum bigint, rms double, n_zero_cross int"
)

PCM_FRAME_LEN = 64  # samples per analysis frame


def raw_pcm_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic int16-LE PCM buffers from `documents`: each sample is
    two consecutive text bytes (b0 + 256*b1) centered by -16384 at
    interpretation time, content truncated to an even byte count. Pure
    column expressions; bytes reach Python only inside a kernel."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    even_len = (F.length("text") - F.length("text") % 2).cast("int")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit(16000).alias("sample_rate"),
        F.encode(F.expr("substring(text, 1, length(text) - length(text) % 2)"), "UTF-8").alias("content"),
        even_len.alias("n_bytes"),
    )


def pcm_frame_features(pcm: DataFrame, frame_len: int = PCM_FRAME_LEN) -> DataFrame:
    """REAL per-frame DSP over int16-LE PCM: for each full
    non-overlapping `frame_len`-sample frame — exact integer energy sum,
    RMS (sqrt of identical integer ratios, so cross-engine stable), and
    the strict zero-crossing count (s[i-1] * s[i] < 0, within-frame
    pairs only). Partial trailing frames are dropped (defined contract).
    Arrow-batched numpy; at production scale this is the map stage of a
    voice-activity / loudness corpus filter."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(pcm.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                raw = np.frombuffer(bytes(buf), dtype=np.uint8)
                n_samp = raw.size // 2
                if n_samp < frame_len:
                    continue
                pairs = raw[: n_samp * 2].reshape(n_samp, 2).astype(np.int64)
                v = pairs[:, 0] + 256 * pairs[:, 1] - 16384
                n_frames = n_samp // frame_len
                fr = v[: n_frames * frame_len].reshape(n_frames, frame_len)
                energy = (fr * fr).sum(axis=1)
                zc = ((fr[:, :-1] * fr[:, 1:]) < 0).sum(axis=1)
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": mid, "frame_idx": i,
                            "n_samples": frame_len,
                            "energy_sum": int(energy[i]),
                            "rms": float(np.sqrt(energy[i] / frame_len)),
                            "n_zero_cross": int(zc[i]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "n_samples", "energy_sum",
                         "rms", "n_zero_cross"],
            )

    return pcm.mapInPandas(run, PCM_FEATURES_DDL)


# --- frame-delta kernel (REAL video motion signal, no demuxer needed) ---

FRAME_DELTA_DDL = (
    "media_id bigint, frame_idx int, sum_abs_diff bigint, mean_abs_diff double"
)


def frame_delta_features(
    media: DataFrame, frame_bytes: int = 64
) -> DataFrame:
    """Mean absolute byte difference between CONSECUTIVE full frames —
    the standard cheap motion / shot-boundary signal (a spike = a cut,
    near-zero = a still). Runs on fixed-stride frames of the raw buffer;
    with a genuine demuxer the framing changes, the delta math doesn't.
    Only `video` rows are processed; docs with fewer than two full
    frames yield nothing. frame_idx is the EARLIER frame of the pair."""
    from op_etl_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, buf in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if kind != "video":
                    continue
                raw = np.frombuffer(bytes(buf), dtype=np.uint8)
                n_full = raw.size // frame_bytes
                if n_full < 2:
                    continue
                fr = raw[: n_full * frame_bytes].reshape(n_full, frame_bytes).astype(np.int64)
                diffs = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                for i, sad in enumerate(diffs):
                    rows.append(
                        {
                            "media_id": mid, "frame_idx": i,
                            "sum_abs_diff": int(sad),
                            "mean_abs_diff": float(sad / frame_bytes),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "sum_abs_diff", "mean_abs_diff"],
            )

    return media.mapInPandas(run, FRAME_DELTA_DDL)
