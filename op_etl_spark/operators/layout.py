"""Physical-layout operators: small-file compaction and Z-order clustering.

Long-running ingest (the reference's per-source staging loop,
etl/stage_files.py:170-233, one output per source per run) accretes many
small files per dataset; at 100 TB the scan-task explosion and per-file
open cost dominate query latency long before CPU does. `plan_compaction` /
`compact_files` are the OPTIMIZE story: a deterministic target file count
derived from actual on-disk bytes, ONE round-robin shuffle sized to the
target, and a directory swap.

`zorder_write` is the multi-dimensional clustering story: interleave the
bits of N range-normalized columns into one Z-order key, then
repartitionByRange + sortWithinPartitions on that key before writing.
Every output file then covers a small hyper-rectangle of the key space,
so parquet min/max row-group stats prune scans for range filters on ANY
prefix-free subset of the clustered columns — the thing a single-column
sort cannot give you.

All integer arithmetic (bit interleave, range normalization) is exact and
engine-portable; the z-key math is oracle-checked in suite/layout.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 << 20  # the usual parquet sweet spot


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _partition_columns(files: list[tuple[str, int]], base: str) -> list[str]:
    """Hive partition columns inferred from the data-file paths (in
    directory order), e.g. .../list_id=3/part-0.parquet -> ["list_id"]."""
    if not files:
        return []
    rel = files[0][0].split(base.rstrip("/") + "/", 1)[-1]
    return [seg.split("=", 1)[0] for seg in rel.split("/")[:-1] if "=" in seg]


def _list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet data file under `path` (recursive).

    Uses the Hadoop FileSystem API so the same code lists local dirs,
    HDFS, or an object store — whatever the session's hadoopConfiguration
    resolves for the path's scheme.
    """
    fs, jpath = _hadoop_fs(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            out.append((st.getPath().toString(), st.getLen()))
    return out


@dataclass(frozen=True)
class CompactionPlan:
    n_files: int
    total_bytes: int
    target_files: int
    skipped: bool

    @property
    def avg_file_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> CompactionPlan:
    """Decide whether `path` is worth rewriting, from real on-disk sizes.

    target = ceil(total_bytes / target_file_bytes); compaction is skipped
    when the table already has that few files (re-running is a no-op, so
    a scheduled compactor can fire unconditionally).
    """
    return _plan_from(_list_data_files(spark, path), target_file_bytes)


def _plan_from(files: list[tuple[str, int]], target_file_bytes: int) -> CompactionPlan:
    n = len(files)
    total = sum(b for _, b in files)
    target = max(1, math.ceil(total / target_file_bytes))
    return CompactionPlan(n, total, target, skipped=n <= target)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> CompactionPlan:
    """Rewrite `path` into its planned file count (Delta OPTIMIZE analogue).

    Writes to a sibling temp directory, then swaps via two FS renames —
    atomic on HDFS/local posix rename semantics. (On S3-like stores rename
    is copy+delete; production there uses a table format's commit log —
    this operator is the Hadoop-FS tier of that story.) The bounded
    non-atomic window is rename-swap only; readers never see partial data
    files because the temp write is complete before the first rename.

    READER CONTRACT (single-writer, compact between query waves): a
    query whose DataFrame was created BEFORE the swap holds the old file
    listing and fails loudly mid-scan once the swap deletes those files
    (Spark's "underlying files have been updated" FileNotFound — never
    partial or wrong rows; pinned by
    tests/test_round9_fixes.test_compaction_reader_contract). Schedule
    compaction between query waves — the reference's rebuild-discipline
    analogue — or use a commit-log table format where readers must
    overlap writers. DataFrames created after the swap see the compacted
    table atomically.
    """
    files = _list_data_files(spark, path)
    plan = _plan_from(files, target_file_bytes)
    if plan.skipped:
        return plan
    base = path.rstrip("/")
    parts = _partition_columns(files, base)
    df = spark.read.parquet(path)
    tmp = base + ".__compact_tmp__"
    if parts:
        # Hive-partitioned layout: preserve it. Hashing the shuffle on the
        # partition columns lands each partition value in one task, so the
        # rewrite yields one file per value (per-value sub-splitting is the
        # table format's job at finer granularity).
        w = df.repartition(plan.target_files, *[F.col(c) for c in parts]).write
        w.mode("overwrite").partitionBy(*parts).parquet(tmp)
    else:
        df.repartition(plan.target_files).write.mode("overwrite").parquet(tmp)
    swap_directory(spark, base, tmp)
    return plan


def swap_directory(spark: SparkSession, base: str, tmp: str) -> None:
    """Replace directory `base` with `tmp` via two FS renames (+ rollback
    if the second fails). Atomic on HDFS/posix rename semantics."""
    fs, jpath = _hadoop_fs(spark, base)
    mk = spark._jvm.org.apache.hadoop.fs.Path
    bak = base + ".__swap_bak__"
    fs.delete(mk(bak), True)
    if fs.exists(jpath) and not fs.rename(jpath, mk(bak)):
        raise IOError(f"swap failed: could not move {base} aside")
    if not fs.rename(mk(tmp), jpath):
        fs.rename(mk(bak), jpath)  # roll back
        raise IOError(f"swap failed: could not move {tmp} into place")
    fs.delete(mk(bak), True)


# --- index-table lifecycle: compaction under append ---

# data directories a persisted index may carry, in the layouts written by
# operators/dedup_index.py (bands, shingles) and operators/ann_index.py
# (vectors [+ hive partitions], centroids*). Every append-mode delta adds
# one file set per touched directory, so at a delta-per-day cadence the
# file count grows without bound — the first real operational cliff of
# the append design (reference analogue: the staging-GDB rebuild
# discipline, stage_files.py:688-725).
INDEX_DATA_DIRS = (
    "bands",
    "shingles",
    "vectors",
    "centroids",
    "centroids_coarse",
    "centroids_fine",
)


def compact_index(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict[str, CompactionPlan]:
    """Compact every data directory of a persisted index in place.

    Works on both index layouts: the LSH dedup index ({path}/bands +
    {path}/shingles) and the IVF/IVF2 ANN index ({path}/vectors
    partitioned by list_id or coarse_id/fine_id, plus centroid tables).
    Each directory is rewritten to its byte-derived target file count via
    `compact_files` — hive partition columns (the IVF list dirs) are
    preserved, so partition pruning on a probe is untouched. Results are
    invariant by construction: compaction only rewrites the SAME rows
    into fewer files (tests/test_index_compaction.py proves dedup_delta
    and ivf_search outputs row-for-row identical across a compaction of
    an index that has absorbed multiple appends). Directories already at
    their target are skipped, so a scheduled compactor can fire
    unconditionally after every append batch.

    Returns {subdir: CompactionPlan} for the directories present.
    """
    fs, _ = _hadoop_fs(spark, path)
    mk = spark._jvm.org.apache.hadoop.fs.Path
    plans: dict[str, CompactionPlan] = {}
    for sub in INDEX_DATA_DIRS:
        p = f"{path.rstrip('/')}/{sub}"
        if fs.exists(mk(p)):
            plans[sub] = compact_files(spark, p, target_file_bytes)
    if not plans:
        raise ValueError(f"{path} has no recognized index data directories")
    return plans


# --- Z-order clustering ---

def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low `bits` bits of each column: result bit
    (i * n_cols + j) = bit i of cols[j]. Inputs must already be
    non-negative ints < 2**bits (use `normalize_to_bits`). Pure
    shift/mask/add int64 arithmetic — codegen'd, and expressible
    identically in ANSI SQL for the oracle."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds the int64 key space")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            key = key + F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (i * n + j)
            )
    return key


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The oracle twin of `zorder_key` — same bit math as a SQL string."""
    n = len(cols)
    terms = [
        f"((({c}) >> {i}) & 1) * {1 << (i * n + j)}"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def normalize_to_bits(c: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Map integer range [lo, hi] onto [0, 2**bits) with exact integer
    arithmetic: ((x - lo) * 2**bits) div (hi - lo + 1), clamped.

    Integer division is done as (n - n % d) / d: the numerator becomes an
    exact multiple of d, so the one double division is exact — matching
    SQL `//` bit-for-bit (plain floor(a/b) on doubles can be off by one
    at cell boundaries). Exact while (hi-lo+1) * 2**bits < 2**53; wider
    ranges are rejected rather than silently degrading (int64 wrap would
    clamp most rows into cell 0 and clustering would quietly vanish) —
    pre-bucket such columns (e.g. epoch-nanos -> epoch-seconds) first."""
    span = hi - lo + 1
    if span * (1 << bits) >= 1 << 53:
        raise ValueError(
            f"column range {span} x 2^{bits} cells exceeds exact-arithmetic bounds; "
            "coarsen the column (pre-bucket) before z-ordering"
        )
    num = (c.cast("long") - F.lit(lo)) * F.lit(1 << bits)
    cell = ((num - num % F.lit(span)) / F.lit(span)).cast("long")
    return F.least(F.lit((1 << bits) - 1), F.greatest(F.lit(0), cell)).cast("long")


def normalize_to_bits_sql(expr: str, lo_expr: str, hi_expr: str, bits: int = 16) -> str:
    """Oracle twin of `normalize_to_bits` (SQL `//` is exact on ints)."""
    return (
        f"least({(1 << bits) - 1}, greatest(0, "
        f"((({expr}) - ({lo_expr})) * {1 << bits}) // (({hi_expr}) - ({lo_expr}) + 1)))"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Cluster `df` on zorder(cols) and write parquet.

    One stats pass (min/max per clustered column — a broadcastable 1-row
    aggregate), then repartitionByRange on the z-key so files hold
    contiguous, non-overlapping key ranges, and sortWithinPartitions so
    row groups inside each file are clustered too. The helper column is
    dropped before the write; clustering survives only as physical order
    plus parquet min/max stats — exactly what the scan pruner reads."""
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    if any(stats[f"lo_{c}"] is None for c in cols):
        # empty input or an all-null clustered column: nothing to cluster
        # by — write through unchanged rather than dying mid-schedule
        df.write.mode("overwrite").parquet(path)
        return
    key = zorder_key(
        [
            normalize_to_bits(F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
            for c in cols
        ],
        bits,
    )
    out = df.withColumn("__zkey", key)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        out.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
