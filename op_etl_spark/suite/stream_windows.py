"""Batch-mode correctness surface for the streaming window operators.

`op_etl_spark.streaming.windows` builders run identical DataFrame code on
batch and streaming inputs; here they run batch so the driver's DuckDB
oracle can hash-check them. The streaming tests (tests/test_streaming.py)
separately prove stream == batch on the same data — together the chain
stream == batch == oracle gates the streaming operators end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from op_etl_spark.session import read_events
from op_etl_spark.streaming.joins import (
    ATTRIBUTION_WINDOW_SECONDS,
    attribute_purchases_to_clicks,
)
from op_etl_spark.streaming.windows import session_window_rollup


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_rollup(read_events(spark, sf_dir), gap="30 minutes")


# Spark session_window: start = first event ts, end = last event ts + gap.
# Reconstructed relationally with the same lag/cumsum sessionization the
# batch suite uses.
ORACLE_SESSION_WINDOWS = """
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*) AS n_events
FROM (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 THEN 1
                ELSE 0 END AS new_sess
    FROM events))
GROUP BY user_id, session_id
"""


def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-distinct variant: the streaming path uses
    approx_count_distinct (HLL state at scale); the oracle-checked batch
    surface swaps in the exact count so both engines agree bit-for-bit."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
            "n_events",
            "n_users",
        )
    )


# A 30min/10min sliding window assigns each event to exactly 3 windows,
# whose starts are the epoch-aligned 10-min grid points
# floor(epoch/600)*600 - k*600 for k in {0,1,2} — Spark's window grid.
ORACLE_SLIDING_WINDOWS = """
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       strftime(win_start + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS win_end,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM (
  SELECT user_id,
         make_timestamp(((CAST(floor(epoch(ts) / 600) AS BIGINT) - k) * 600) * 1000000) AS win_start
  FROM events, (SELECT unnest([0, 1, 2]) AS k))
GROUP BY 1, 2
"""

# The stream FIXTURE (json micro-batch files on local disk) is built from a
# deterministic user-id subsample. The modulus is DERIVED from the events
# row count (`fixture_mod`, power of two sized for ~TARGET rows), so the
# driver-side collect is O(STREAM_FIXTURE_TARGET_ROWS) at ANY sf — not a
# fixed fraction of the corpus. The operators under test
# (streaming/stateful.py, streaming/dedup.py) are themselves
# unbounded-safe; only this gate's fixture writer needs rows on the
# driver. The DuckDB oracles embed the same count-derived modulus via
# `fixture_mod_sql`, so both sides always pick the identical slice.
# (Assumes user ids roughly uniform modulo powers of two, true of the
# synthetic corpus; the bound is in expectation, not worst-case.)
STREAM_FIXTURE_TARGET_ROWS = 1024

from ._util import fixture_mod, fixture_mod_sql  # noqa: E402

_EVENTS_MOD_SQL = fixture_mod_sql("events", STREAM_FIXTURE_TARGET_ROWS)


def _events_fixture_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    mod = fixture_mod(ev.count(), STREAM_FIXTURE_TARGET_ROWS)
    return ev.filter(F.col("user_id") % mod == 0).orderBy("ts", "event_id")


def stateful_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState sessionizer run AS A STREAM (file source,
    availableNow trigger, update-mode memory sink) and reduced to final
    session rows — hash-checked against the same DuckDB sessionization SQL
    as the batch window-function twin (both sides restricted to the same
    deterministic count-derived user-id subsample; see note above). This
    is the strongest correctness statement for the custom stateful
    operator: stream == oracle directly, not just stream == batch."""
    import json
    import os
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from op_etl_spark.streaming.stateful import sessionize_stream

    ev = _events_fixture_slice(spark, sf_dir)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
    ).collect()
    tmp = tempfile.mkdtemp(prefix="sessionize_stream_")
    half = len(rows) // 2 or 1
    base = _time.time() - 40
    for i, chunk in enumerate((rows[:half], rows[half:])):
        path = f"{tmp}/events_{i}.json"
        with open(path, "w") as f:
            for r in chunk:
                f.write(json.dumps(r.asDict()) + "\n")
        # strictly increasing mtimes: two files written back-to-back can
        # TIE at fs timestamp granularity, and FileStreamSource breaks
        # mtime ties in OS-dependent listing order — a flipped order
        # renumbers cross-batch sessions (the cb8f16a flake class)
        os.utime(path, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.schema("event_id bigint, ts string, user_id bigint")
        .option("maxFilesPerTrigger", "1")
        .json(tmp)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    name = "stateful_sessionize_gate"
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update mode re-emits growing sessions; keep the final (largest) emit
    emitted = spark.table(name)
    w = W.partitionBy("user_id", "session_id").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "session_id", "n_events", "session_start")
    )


# identical session semantics to the batch suite's sessionize_events,
# restricted to the same deterministic user subsample as the fixture
ORACLE_STATEFUL_SESSIONIZE = f"""
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start
FROM (
  SELECT user_id, ts, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 THEN 1
                ELSE 0 END AS new_sess
    FROM events
    WHERE user_id % {_EVENTS_MOD_SQL} = 0))
GROUP BY user_id, session_id
"""


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once delivery over an at-least-once transport, run AS A
    STREAM: the fixture replays the deterministic user subsample once in
    full and then re-delivers the first half as a second micro-batch
    (`maxFilesPerTrigger=1`, so the duplicates genuinely arrive in a
    LATER trigger and must be caught by cross-batch dedup state, not
    within-batch distinct). `dropDuplicatesWithinWatermark` keys state
    by event_id and ages it at the watermark horizon — state is bounded
    by horizon x arrival rate at any corpus size. Emitted rows are
    reduced to per-type counts + id checksums; the oracle is the plain
    DISTINCT of the subsample, so any duplicate leaking through (or any
    legitimate event wrongly dropped) flips the hash."""
    import json
    import os
    import tempfile
    import time as _time

    from op_etl_spark.streaming.dedup import dedup_events_stream

    ev = _events_fixture_slice(spark, sf_dir)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
    ).collect()
    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    half = len(rows) // 2 or 1
    base = _time.time() - 40
    for i, chunk in enumerate((rows, rows[:half])):  # full, then replayed half
        path = f"{tmp}/events_{i}.json"
        with open(path, "w") as f:
            for r in chunk:
                f.write(json.dumps(r.asDict()) + "\n")
        # strictly increasing mtimes so the replayed half genuinely
        # arrives in the LATER trigger (see sessionize fixture note)
        os.utime(path, (base + i * 10, base + i * 10))

    # The dedup horizon must cover the fixture's whole time span: rows are
    # sorted strings of equal format, so min/max give the span directly.
    # A fixed horizon would silently turn this gate into a late-row-discard
    # test the day the fixture outgrows it; deriving it keeps the pass/fail
    # about dedup STATE at any sf.
    span_days = 1
    if rows:
        from datetime import datetime as _dt

        fmt = "%Y-%m-%d %H:%M:%S.%f"
        lo = _dt.strptime(min(r.ts for r in rows), fmt)
        hi = _dt.strptime(max(r.ts for r in rows), fmt)
        span_days = (hi - lo).days + 2
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts string, user_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", "1")
        .json(tmp)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    name = "stream_dedup_gate"
    q = (
        dedup_events_stream(stream, keys=["event_id"], watermark=f"{span_days} days")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").alias("id_sum"),
        )
    )


ORACLE_STREAM_DEDUP = f"""
SELECT event_type, count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS id_sum
FROM events
WHERE user_id % {_EVENTS_MOD_SQL} = 0
GROUP BY event_type
"""


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming CDC upsert's latest-wins reduction
    (streaming/upsert.py `latest_per_key`): the merged target state after
    replaying the whole events table as one update batch keyed on
    user_id with event_id as the CDC sequence. The merge is associative
    (max_by), so replay-in-one-batch equals the eight-micro-batch
    foreachBatch stream — that equality is pinned separately by
    tests/test_streaming_upsert.py; this entry puts the reduction itself
    under the DuckDB hash gate. event_id is globally unique in the
    corpus, so the winning row per user is fully determined."""
    ev = read_events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    from op_etl_spark.streaming.upsert import latest_per_key

    return latest_per_key(ev, ["user_id"], "event_id").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.col("value").alias("last_value"),
    )


ORACLE_CDC_LATEST_STATE = """
SELECT user_id,
       event_id AS last_event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
       value AS last_value
FROM (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


def watermark_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode windowed aggregation under a watermark, run AS A
    STREAM, with late fixture rows PROVABLY dropped — the late-data
    semantics gate the streaming surface lacked (sessionize/dedup/drift/
    upsert all test on-time arrival).

    Fixture arrival order — files are written PROGRESSIVELY, each one
    only after `processAllAvailable()` committed the previous batch.
    (Found the hard way: `Trigger.AvailableNow` pre-plans every pending
    file against the query's INITIAL watermark, so late rows in a
    later pre-planned batch are never filtered —
    numRowsDroppedByWatermark stays 0 and the evicted window is
    re-created and re-emitted. A live trigger with progressive arrival
    exercises the real semantics: the late batch runs with the watermark
    committed by the on-time batch.)

    1. on-time rows: the deterministic user subsample MINUS the late set;
       after this batch the watermark stands at max(ts) - 2h, far past
       the late rows' windows (the corpus spans ~30 days).
    2. the LATE set — every subsample row in the first quarter of the
       time span with an even event_id, withheld from batch 1 and
       re-delivered here. Their windows were already finalized and
       emitted, so correct watermark semantics must DROP every one; if
       the engine aggregated them anyway, append mode would emit a
       duplicate window row (row-count mismatch) or an inflated count
       (hash mismatch vs the oracle, which excludes the late set).
    3. + 4. two sentinel rows at max(ts) + 4h / + 8h: the first advances
       the watermark past every real window's end, the second guarantees
       a DATA batch runs with that advanced watermark so append mode
       emits the remaining real windows without relying on a trailing
       no-data micro-batch. Sentinel windows start after the last real
       window and are excluded by a driver-side bound on the SINK table
       (not part of the streamed plan), so their emission timing can't
       affect the result.

    The oracle embeds the same cutoff: hourly counts + exact money sum
    over the subsample excluding the late set. State at scale: the 2h
    watermark keeps <= 3 open windows per event_type regardless of
    corpus size (streaming/windows.py)."""
    import json
    import tempfile
    from datetime import datetime, timedelta

    from op_etl_spark.streaming.windows import hourly_event_rollup

    ev = _events_fixture_slice(spark, sf_dir)
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).collect()

    fmt = "%Y-%m-%d %H:%M:%S.%f"
    epoch = datetime(1970, 1, 1)

    def _us(ts: str) -> int:
        return (datetime.strptime(ts, fmt) - epoch) // timedelta(microseconds=1)

    lo = min(_us(r.ts) for r in rows)
    hi = max(_us(r.ts) for r in rows)
    # integer micros both sides: DuckDB epoch_us(min)+(epoch_us(max)-..)//4
    cutoff = lo + (hi - lo) // 4
    if hi - lo < 6 * 3600 * 1_000_000:
        raise RuntimeError(
            "watermark gate needs a fixture spanning > 6h so late windows "
            f"finalize before re-delivery (span {(hi - lo) / 3.6e9:.1f}h)"
        )
    late = [r for r in rows if _us(r.ts) < cutoff and r.event_id % 2 == 0]
    ontime = [r for r in rows if not (_us(r.ts) < cutoff and r.event_id % 2 == 0)]

    hi_dt = epoch + timedelta(microseconds=hi)
    sent_a = {"event_id": -1, "ts": (hi_dt + timedelta(hours=4)).strftime(fmt),
              "user_id": -1, "event_type": "sentinel", "value": 0.0}
    sent_b = {"event_id": -2, "ts": (hi_dt + timedelta(hours=8)).strftime(fmt),
              "user_id": -1, "event_type": "sentinel", "value": 0.0}

    tmp = tempfile.mkdtemp(prefix="watermark_gate_")
    batches = (
        [r.asDict() for r in ontime],
        [r.asDict() for r in late],
        [sent_a],
        [sent_b],
    )

    def _write(i: int, chunk) -> None:
        path = f"{tmp}/events_{i}.json"
        with open(path, "w") as f:
            for d in chunk:
                f.write(json.dumps(d) + "\n")

    _write(0, batches[0])
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts string, user_id bigint,"
            " event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .json(tmp)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    name = "watermark_hourly_gate"
    q = (
        hourly_event_rollup(stream)  # 2h watermark
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for i, chunk in enumerate(batches[1:], start=1):
            _write(i, chunk)
            q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(60)
    last_real_hour = (
        hi_dt.replace(minute=0, second=0, microsecond=0)
    ).strftime("%Y-%m-%d %H:%M:%S")
    return spark.table(name).filter(F.col("hour_start") <= F.lit(last_real_hour))


# the same subsample minus the late set, on the same hourly grid; the
# money sum is the shared exact-tick pattern (ORACLE_TUMBLING)
ORACLE_WATERMARK_HOURLY = f"""
WITH fx AS (SELECT * FROM events WHERE user_id % {_EVENTS_MOD_SQL} = 0),
b AS (SELECT epoch_us(min(ts))
             + (epoch_us(max(ts)) - epoch_us(min(ts))) // 4 AS cutoff
      FROM fx),
kept AS (SELECT fx.* FROM fx, b
         WHERE epoch_us(fx.ts) >= b.cutoff OR fx.event_id % 2 = 1)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM kept GROUP BY 1, 2
"""


def click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream interval join (streaming/joins.py) in batch mode:
    every (click, purchase) pair for the same user within the 1-hour
    attribution window. Streaming bounds its state with the same interval
    condition the oracle checks here."""
    ev = read_events(spark, sf_dir)
    return attribute_purchases_to_clicks(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        observe_as="click_attribution",
    )


ORACLE_CLICK_ATTRIBUTION = f"""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_SECONDS} SECONDS
"""


def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution over the interval join: each
    purchase's value is split across ALL its qualifying clicks with
    weights proportional to recency rank (the later the click, the larger
    the share — weight_i = i / (n(n+1)/2) for the i-th click by time).
    Last-touch (click_attribution's pair listing collapsed to the max
    rank) and first-touch are degenerate cases; linear is the standard
    multi-touch baseline.

    Exact arithmetic: value -> micro ticks, per-pair share =
    floor(ticks * i * 2 / (n * (n + 1))) — integer division both engines;
    floor remainders are deliberately dropped rather than redistributed
    (deterministic, and the report sums shares, so the invariant
    sum(shares) <= value holds per purchase). The rank window partitions
    by purchase_id — state bounded by clicks-per-attribution-window, the
    same bound that makes the streaming join viable."""
    from pyspark.sql import Window as W

    ev = read_events(spark, sf_dir)
    pairs = attribute_purchases_to_clicks(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        observe_as="multitouch_attribution",
    )
    w = W.partitionBy("purchase_id")
    pos = F.row_number().over(w.orderBy("click_ts", "click_id"))
    n = F.count(F.lit(1)).over(w)
    ticks = F.floor(F.col("purchase_value") * 1000000 + F.lit(0.5)).cast("long")
    share = F.expr(
        "CAST(ticks * pos * 2 DIV (n * (n + 1)) AS BIGINT)"
    )
    scored = pairs.withColumn("pos", pos).withColumn("n", n).withColumn(
        "ticks", ticks
    ).withColumn("share_micro", share)
    return scored.groupBy("click_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_purchases_touched"),
        F.sum("share_micro").alias("attributed_micro"),
    )


ORACLE_MULTITOUCH = f"""
WITH pairs AS (
  SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
         p.event_id AS purchase_id, p.value AS purchase_value
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id
   AND p.ts >= c.ts
   AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_SECONDS} SECONDS),
ranked AS (
  SELECT user_id, click_id, purchase_id,
         CAST(floor(purchase_value * 1000000 + 0.5) AS BIGINT) AS ticks,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY click_ts, click_id) AS pos,
         count(*) OVER (PARTITION BY purchase_id) AS n
  FROM pairs)
SELECT click_id, user_id,
       count(*) AS n_purchases_touched,
       CAST(sum(ticks * pos * 2 // (n * (n + 1))) AS BIGINT) AS attributed_micro
FROM ranked
GROUP BY 1, 2
"""


QUERIES = {
    "session_windows": session_windows,
    "multitouch_attribution": multitouch_attribution,
    "sliding_windows": sliding_windows,
    "stateful_sessionize_stream": stateful_sessionize_stream,
    "stream_dedup_events": stream_dedup_events,
    "watermark_hourly_counts": watermark_hourly_counts,
    "click_attribution": click_attribution,
    "cdc_latest_state": cdc_latest_state,
}

ORACLE = {
    "cdc_latest_state": ORACLE_CDC_LATEST_STATE,
    "session_windows": ORACLE_SESSION_WINDOWS,
    "sliding_windows": ORACLE_SLIDING_WINDOWS,
    "stateful_sessionize_stream": ORACLE_STATEFUL_SESSIONIZE,
    "stream_dedup_events": ORACLE_STREAM_DEDUP,
    "watermark_hourly_counts": ORACLE_WATERMARK_HOURLY,
    "click_attribution": ORACLE_CLICK_ATTRIBUTION,
    "multitouch_attribution": ORACLE_MULTITOUCH,
}
