"""Robust statistics over corpus-scale groups: exact per-group median /
MAD (median absolute deviation) outlier detection and winsorized means.

Why this exists in a 100 TB engine: z-score outlier gates (mean ± k·stddev)
are themselves corrupted by the outliers they're meant to find; the robust
estimator pair (median, MAD) has a 50% breakdown point and is the standard
anomaly gate for telemetry value columns (Hampel 1974; Leys et al. 2013).
The hard part at scale is EXACT medians per group when a single group
(event_type here — 5 values over the whole corpus) is itself corpus-sized:
`percentile_approx` is approximate, `collect_list` is a driver bomb, and
`row_number() OVER (PARTITION BY type ORDER BY value)` funnels each group
through ONE reducer. `operators/ranks.grouped_rows_at_rank` solves it with
range partitioning + per-(partition, group) offsets — and sorts ONLY the
partitions that contain a requested median rank, so per-reducer work is
|partition| for the few hit partitions and zero for the rest.

Two targeted rank probes (values, then absolute deviations); the 5-value
med/MAD results ride literal maps into one final scan-and-aggregate.
Determinism: the median IS an input double (no arithmetic); dev = |x - med|
is one correctly-rounded IEEE754 subtraction; 3·MAD one multiplication —
bit-identical on Spark and DuckDB, so the outlier predicate and all
aggregates hash-match exactly.

Reference parity note: the reference (ArcPy geospatial ETL) has no robust
stats; this module is part of the training-data-pipeline extension surface
(anomalous telemetry / label-noise gating) the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranks import grouped_rows_at_rank
from ._util import fround, read_table, sql_cents

OUTLIER_K = 3  # the classic Hampel identifier: |x - med| > 3 * MAD


def _robust_pair(spark: SparkSession, sf_dir: str) -> dict[str, tuple]:
    """{event_type: (exact lower median, exact MAD)} — the robust pair
    both declared queries gate on. Lower median = element at 0-based rank
    (n-1)//2 in (value, event_id) order — a real data point, defined for
    odd and even n alike, and exactly reproducible in SQL.

    Two TARGETED rank probes (`operators/ranks.grouped_rows_at_rank`):
    each pass range-partitions once and then window-sorts ONLY the
    partitions holding a requested median rank — the retired
    formulation (`grouped_row_index` + filter rn == mid) ranked and
    materialized every row of every partition, plus a separate count
    job and a checkpoint of the full scored table, to keep 5 rows. The
    selected elements are identical (same range partition, same offset
    prefix sums, same (value/dev, event_id) total order), so med/MAD and
    every downstream aggregate are bit-equal. Groups are metadata-scale
    (5 event types); their values ride literal maps, not joins."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir).select("event_type", "value", "event_id")
    mid = lambda n: (n - 1) // 2  # noqa: E731 — 0-based lower median
    med_rows, _counts = grouped_rows_at_rank(
        ev, "event_type", ["value", "event_id"], mid
    )
    med = {r["event_type"]: r["value"] for r in med_rows}
    if not med:
        return {}
    med_c = _lit_map(med)
    dev = ev.select(
        "event_type",
        F.abs(F.col("value") - med_c).alias("dev"),
        "event_id",
    )
    mad_rows, _ = grouped_rows_at_rank(dev, "event_type", ["dev", "event_id"], mid)
    return {r["event_type"]: (med[r["event_type"]], r["dev"]) for r in mad_rows}


def _lit_map(d: dict):
    """Literal map[event_type -> double] column — 5 entries of metadata
    riding the plan instead of a broadcast join."""
    return F.create_map(
        *[F.lit(x) for k in sorted(d) for x in (k, float(d[k]))]
    )[F.col("event_type")]


def mad_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: population, exact lower median, exact MAD, and the
    Hampel outlier count/fraction (|value - median| > 3·MAD).

    Plan: two targeted rank probes (operators/ranks.py) + one final
    scan-and-aggregate over literal (med, mad) maps — no unpartitioned
    window, no collect of data rows, group size unbounded."""
    from op_etl_spark.session import read_events

    pair = _robust_pair(spark, sf_dir)
    ev = read_events(spark, sf_dir).select("event_type", "value")
    if pair:
        med_c = _lit_map({k: v[0] for k, v in pair.items()})
        mad_c = _lit_map({k: v[1] for k, v in pair.items()})
    else:
        med_c = mad_c = F.lit(None).cast("double")
    dev = F.abs(F.col("value") - med_c)
    out = F.when(dev > OUTLIER_K * mad_c, 1).otherwise(0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(med_c).alias("med_value"),
            F.min(mad_c).alias("mad_value"),
            F.sum(out).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "med_value",
            "mad_value",
            "n_outliers",
            fround(F.col("n_outliers") / F.col("n_events"), 6).alias("outlier_frac"),
        )
    )


ORACLE_MAD = f"""
WITH r AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (SELECT event_type, value AS med, n FROM r WHERE rn - 1 = (n - 1) // 2),
d AS (
  SELECT e.event_type, e.value, e.event_id,
         abs(e.value - m.med) AS dev, m.med, m.n
  FROM events e JOIN med m USING (event_type)),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY dev, event_id) AS rn2
  FROM d),
mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn2 - 1 = (n - 1) // 2)
SELECT d.event_type,
       count(*) AS n_events,
       min(d.med) AS med_value,
       min(m2.mad) AS mad_value,
       CAST(sum(CASE WHEN d.dev > {OUTLIER_K} * m2.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       floor(CAST(sum(CASE WHEN d.dev > {OUTLIER_K} * m2.mad THEN 1 ELSE 0 END)
                  AS BIGINT)::DOUBLE / count(*) * 1000000 + 0.5)
         / 1000000.0 AS outlier_frac
FROM d JOIN mad m2 USING (event_type)
GROUP BY 1
"""


def winsorized_event_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type mean of values CLAMPED to median ± 3·MAD — the
    winsorized estimator that reports a stable central tendency next to
    the raw mean so the gap itself is the outlier-pressure signal.

    The clamp bounds are derived from the same robust pair; clamped
    values are re-quantized to exact integer cents before summing
    (_util.money_sum discipline) so the mean is order-independent and
    engine-exact."""
    from op_etl_spark.session import read_events

    pair = _robust_pair(spark, sf_dir)
    ev = read_events(spark, sf_dir).select("event_type", "value")
    if pair:
        med_c = _lit_map({k: v[0] for k, v in pair.items()})
        mad_c = _lit_map({k: v[1] for k, v in pair.items()})
    else:
        med_c = mad_c = F.lit(None).cast("double")
    lo = med_c - OUTLIER_K * mad_c
    hi = med_c + OUTLIER_K * mad_c
    w = F.greatest(lo, F.least(hi, F.col("value")))
    wc = F.floor(w * 100 + F.lit(0.5)).cast("long")
    rc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    clamped = F.when((F.col("value") < lo) | (F.col("value") > hi), 1).otherwise(0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(clamped).alias("n_clamped"),
            F.sum(wc).alias("wsum"),
            F.sum(rc).alias("rsum"),
        )
        .select(
            "event_type",
            "n_events",
            "n_clamped",
            fround(F.col("wsum") / F.lit(100.0) / F.col("n_events"), 6).alias(
                "win_mean"
            ),
            fround(F.col("rsum") / F.lit(100.0) / F.col("n_events"), 6).alias(
                "raw_mean"
            ),
        )
    )


ORACLE_WINSOR = f"""
WITH r AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (SELECT event_type, value AS med, n FROM r WHERE rn - 1 = (n - 1) // 2),
d AS (
  SELECT e.event_type, e.value, e.event_id,
         abs(e.value - m.med) AS dev, m.med, m.n
  FROM events e JOIN med m USING (event_type)),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY dev, event_id) AS rn2
  FROM d),
mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn2 - 1 = (n - 1) // 2),
s AS (
  SELECT d.event_type, d.value,
         d.med - {OUTLIER_K} * m2.mad AS lo,
         d.med + {OUTLIER_K} * m2.mad AS hi
  FROM d JOIN mad m2 USING (event_type))
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped,
       floor(sum({sql_cents("greatest(lo, least(hi, value))")}) / 100.0
             / count(*) * 1000000 + 0.5) / 1000000.0 AS win_mean,
       floor(sum({sql_cents("value")}) / 100.0
             / count(*) * 1000000 + 0.5) / 1000000.0 AS raw_mean
FROM s
GROUP BY 1
"""


def event_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly ingest-volume spike/drop detection: the per-hour event
    count series robustly gated by its own (median, MAD) — the pipeline
    health check that catches a stuck upstream (hours at ~0) or a replay
    storm (hours at many multiples of typical volume) without the mean
    being dragged by the very anomaly it should flag.

    Scale shape: the series is CALENDAR-bounded (one row per hour —
    720 for this corpus's 30 days, ~9k/year at 100 TB), so after the
    one corpus-scan aggregate the median/MAD come from a single
    collect_list row of bounded width — integer counts end to end, no
    window over unbounded data anywhere."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir)
    hours = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n_events"))

    ns = F.array_sort(F.collect_list("n_events"))
    mid = lambda arr: F.element_at(  # noqa: E731 — lower median, 1-based
        arr, F.floor((F.size(arr) + 1) / 2).cast("int")
    )
    stats = hours.agg(ns.alias("ns")).select(
        F.col("ns"), mid(F.col("ns")).alias("med_n")
    )
    ds = F.array_sort(
        F.transform(F.col("ns"), lambda v: F.abs(v - F.col("med_n")))
    )
    stats = stats.select("med_n", mid(ds).alias("mad_n"))
    dev = F.abs(F.col("n_events") - F.col("med_n"))
    return (
        hours.join(F.broadcast(stats))
        .select(
            "hr",
            "n_events",
            "med_n",
            "mad_n",
            F.when(dev > OUTLIER_K * F.col("mad_n"), 1).otherwise(0).alias("is_anomaly"),
        )
    )


ORACLE_VOLUME = f"""
WITH h AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
         count(*) AS n_events
  FROM events GROUP BY 1),
s AS (SELECT list_sort(list(n_events)) AS ns FROM h),
m AS (SELECT ns, ns[(len(ns) + 1) // 2] AS med_n FROM s),
m2 AS (
  SELECT med_n,
         (list_sort([abs(x - med_n) for x in ns]))[(len(ns) + 1) // 2] AS mad_n
  FROM m)
SELECT hr, n_events, med_n, mad_n,
       CASE WHEN abs(n_events - med_n) > {OUTLIER_K} * mad_n
            THEN 1 ELSE 0 END AS is_anomaly
FROM h CROSS JOIN m2
"""


def quantile_normalized_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language QUANTILE NORMALIZATION of document length: each doc's
    length mapped to its within-stratum percentile (0..1) — the
    rank-based feature transform that makes a threshold mean the same
    thing in every language regardless of each language's length
    distribution (the cross-lingual quality-filter calibration step).

    Rank within a stratum is `operators/ranks.grouped_row_index` again —
    exact percentiles for corpus-sized strata, every window partitioned.
    (doc_id breaks length ties, so the rank is total and percent_rank's
    RANK == ROW_NUMBER on both engines.)"""
    from ..operators.ranks import grouped_row_index

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    idx = grouped_row_index(d, "lang", ["n_chars", "doc_id"], out="rn")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # A 1-doc stratum makes n-1 = 0; SQL percent_rank is DEFINED as 0.0
    # for a single-row partition, and Spark 4 runs ANSI mode by default
    # (DIVIDE_BY_ZERO would kill the whole query for one long-tail lang).
    pct = F.when(
        F.col("n") > 1, F.col("rn") / (F.col("n") - 1)
    ).otherwise(F.lit(0.0))
    return (
        idx.join(F.broadcast(cnt), "lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            fround(pct, 6).alias("pct"),
        )
    )


ORACLE_QNORM = """
SELECT doc_id, lang, n_chars,
       floor(percent_rank() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id)
             * 1000000 + 0.5) / 1000000.0 AS pct
FROM documents
"""


QUERIES = {
    "mad_outlier_report": mad_outlier_report,
    "quantile_normalized_lengths": quantile_normalized_lengths,
    "winsorized_event_means": winsorized_event_means,
    "event_volume_anomalies": event_volume_anomalies,
}
ORACLE = {
    "mad_outlier_report": ORACLE_MAD,
    "quantile_normalized_lengths": ORACLE_QNORM,
    "winsorized_event_means": ORACLE_WINSOR,
    "event_volume_anomalies": ORACLE_VOLUME,
}
