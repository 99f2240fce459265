"""Advanced relational surface, round 2: grouping sets, range-frame
windows, ordered string aggregation, calendar gap-fill, skew-salted
aggregation, and an HLL accuracy gate.

Scale notes per query:
 - grouping sets: one shuffle; Spark expands grouping sets map-side, the
   partial aggregate still combines before exchange.
 - 7-day trailing window: pre-aggregate to one row per day FIRST (big
   shuffle shrinks to |days| rows), then the window runs over the tiny
   daily relation — never a per-row range scan over the fact table.
 - salted aggregation: the two-phase groupBy((key, salt)) -> groupBy(key)
   pattern that bounds any one reducer's input when a key is hot. The
   final result is identical to the direct groupBy (oracle-checked).
 - calendar fill: `sequence()` generates the date dimension engine-side —
   no driver loop, no collected min/max.
 - HLL gate: approx_count_distinct's estimate is asserted within 5% of
   the exact count inside the query; the oracle only has to agree on the
   exact count and the (true) flag, making the probabilistic sketch
   testable under an exact-hash harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ._util import fround, money_sum, read_table, sql_money_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --- GROUPING SETS with grouping_id (finer control than cube/rollup) ---

def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: (status), (priority), (status, priority) —
    cube minus the grand total. SURVEY §2.5 notes cube/rollup are Spark
    built-ins; grouping sets is the general form both engines share."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("adv_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST({sql_money_sum('o_totalprice')} AS DOUBLE) AS total_price,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT)
                 AS grp_id
        FROM adv_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


ORACLE_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       {sql_money_sum('o_totalprice')} AS total_price,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INT) AS grp_id
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


# --- 7-day trailing revenue: RANGE frame over a pre-aggregated daily series ---

def moving_avg_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day order revenue. The fact table collapses to one row
    per day before the window (shuffle output = |days| rows); the RANGE
    frame then runs on epoch-day integers so sparse calendars still get
    true 7-day windows, not 7-row windows."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(money_sum("o_totalprice").alias("day_rev"))
        .withColumn("epoch_day", F.datediff("day", F.lit("1970-01-01")))
        .withColumn("day_rev_c", F.floor(F.col("day_rev") * 100 + 0.5).cast("long"))
    )
    w = W.orderBy("epoch_day").rangeBetween(-6, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("day_rev"),
        fround(F.sum("day_rev_c").over(w) / F.lit(100.0) / F.count(F.lit(1)).over(w), 4)
            .alias("avg_7d"),
        F.sum("day_rev_c").over(w).alias("sum_7d_cents"),
    )


ORACLE_MOVING_AVG = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS day_rev_c,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
  FROM orders GROUP BY 1, 3
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       day_rev_c / 100.0 AS day_rev,
       floor((sum(day_rev_c) OVER w / 100.0 / count(*) OVER w) * 10000 + 0.5) / 10000.0
         AS avg_7d,
       CAST(sum(day_rev_c) OVER w AS BIGINT) AS sum_7d_cents
FROM daily
WINDOW w AS (ORDER BY epoch_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# --- ordered string aggregation (deterministic collect_list) ---

def string_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order status: 'priority:count' pairs joined in sorted order.
    collect_list is unordered in a distributed engine — sort_array after
    collection is what makes the result plan-independent."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per.groupBy("o_orderstatus").agg(
        F.array_join(
            F.sort_array(
                F.collect_list(F.concat_ws(":", "o_orderpriority", "n"))
            ),
            ",",
        ).alias("priority_counts"),
        F.sum("n").alias("n_orders"),
    )


ORACLE_STRING_AGG = """
SELECT o_orderstatus,
       string_agg(pair, ',' ORDER BY pair) AS priority_counts,
       CAST(sum(n) AS BIGINT) AS n_orders
FROM (
  SELECT o_orderstatus, o_orderpriority || ':' || n AS pair, n
  FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2))
GROUP BY o_orderstatus
"""


# --- calendar gap-fill: generated date dimension, zero-filled counts ---

def calendar_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order counts with missing days zero-filled. The calendar is
    generated with `sequence()` from the min/max day — a one-row scalar
    aggregate exploded engine-side, so no driver round-trip and the date
    dimension broadcast-joins against the daily aggregate."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cal = (
        daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return (
        cal.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
    )


ORACLE_CALENDAR_FILL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
  FROM orders GROUP BY 1),
cal AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
  FROM daily)
SELECT strftime(cal.day, '%Y-%m-%d') AS day,
       CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders
FROM cal LEFT JOIN daily ON cal.day = daily.day
"""


# --- exponentially time-decayed scores, exact to the last bit ---

DECAY_MAX_DAYS = 30  # contributions older than this round to zero


def decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event value with a ONE-DAY HALF-LIFE: sum of
    value * 2^(-age_days), age measured from the corpus max timestamp —
    the standard recency-weighted engagement/freshness score.

    The usual implementation (pow(0.5, age) floats) is neither
    order-independent nor cross-engine stable. This one is EXACT: the
    half-life is a power of two, so each contribution is
    cents << (MAX - min(age, MAX)) — a LONG. Ages come from integer
    epoch-microsecond division (no calendar-boundary semantics to
    disagree on), the per-user sum is exact long addition in any order
    (bounded: cents < 2^16, shift <= 30, rows per user < 2^15 => sum
    < 2^61), and a single final divide by 2^MAX * 100 converts back to
    value units. At 100 TB this is one map-side-combinable groupBy; the
    reference time is one scalar max."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir).select("user_id", "ts", "value")
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    ref_us = ev.agg(F.max(epoch_us)).collect()[0][0]
    age_days = F.floor(
        (F.lit(int(ref_us)) - epoch_us) / F.lit(86_400_000_000)
    ).cast("long")
    shift = F.lit(DECAY_MAX_DAYS) - F.least(age_days, F.lit(DECAY_MAX_DAYS))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    scored = ev.select(
        "user_id", cents.alias("cents"), shift.cast("int").alias("shift")
    )
    units = F.expr("shiftleft(cents, shift)")
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(units).alias("u"),
        )
        .select(
            "user_id",
            "n_events",
            fround(
                F.col("u") / F.lit(float(2**DECAY_MAX_DAYS)) / F.lit(100.0), 6
            ).alias("decayed_value"),
        )
    )


ORACLE_DECAYED = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
ref AS (SELECT max(us) AS ref_us FROM ev),
scored AS (
  SELECT user_id, cents,
         {DECAY_MAX_DAYS} - least(
           CAST(floor((ref_us - us) / 86400000000.0) AS BIGINT),
           {DECAY_MAX_DAYS}) AS shift
  FROM ev CROSS JOIN ref)
SELECT user_id,
       count(*) AS n_events,
       floor(CAST(sum(cents << shift) AS BIGINT)
             / {float(2**DECAY_MAX_DAYS)!r} / 100.0 * 1000000 + 0.5)
         / 1000000.0 AS decayed_value
FROM scored
GROUP BY 1
"""


# --- skew-salted aggregation: two-phase groupBy, identical result ---

N_SALTS = 16


def salted_event_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a LOW-cardinality hot key (event_type: a handful
    of values over the whole corpus). Direct groupBy sends each key's
    entire volume to one reducer; salting by hash(event_id) % 16 splits
    every key across 16 reducers, then a second (tiny) aggregate merges
    the partials. Counts and exact-integer sums re-merge losslessly, so
    the result is bit-identical to the unsalted plan."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir)
    salted = ev.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(N_SALTS)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        (F.sum("pv") / F.lit(100.0)).alias("total_value"),
    )


ORACLE_SALTED = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM events
GROUP BY event_type
"""


# --- HLL accuracy gate: approximate distinct vs exact, bounded error ---

def hll_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=0.02) asserted within 5% of the
    exact distinct count per order priority. The sketch value itself is
    engine-specific, so the query EXPORTS the exact count plus the bounded
    -error verdict — which an exact-SQL oracle can reproduce iff the
    sketch really is inside the bound."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", 0.02).alias("n_approx"),
    )
    return per.select(
        "o_orderpriority",
        "n_exact",
        (F.abs(F.col("n_approx") - F.col("n_exact")) <= 0.05 * F.col("n_exact"))
            .alias("within_5pct"),
    )


ORACLE_HLL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_exact,
       true AS within_5pct
FROM orders
GROUP BY o_orderpriority
"""


# --- unpivot/melt: wide measures -> (measure, value) rows ---

def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the four lineitem measures into (measure, value) rows and
    profile each: the wide->long reshape every metrics store needs.
    `unpivot` is a Generate (no shuffle, no UDF); the aggregate after it
    is an ordinary map-side-combinable groupBy. Exact-cents sums."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long")) / F.lit(10000.0))
            .alias("total"),
        fround(F.min("value"), 4).alias("min_v"),
        fround(F.max("value"), 4).alias("max_v"),
    )


ORACLE_UNPIVOT = """
SELECT measure, count(*) AS n,
       CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS total,
       floor(min(value) * 10000 + 0.5) / 10000.0 AS min_v,
       floor(max(value) * 10000 + 0.5) / 10000.0 AS max_v
FROM (
  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
GROUP BY measure
"""


# --- width_bucket histogram: equal-width binning of a measure ---

N_BUCKETS = 20
HIST_LO, HIST_HI = 0.0, 600_000.0


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of order totals: width_bucket assigns bins
    in the scan projection (codegen'd arithmetic), one groupBy shuffles
    only (bucket, partial_count) pairs. The fixed [lo, hi) domain makes
    bucket ids stable across loads — histograms from different days
    merge by addition (same algebraic-merge property as
    incremental_rollup_merge)."""
    o = _t(spark, sf_dir, "orders")
    b = F.width_bucket(
        F.col("o_totalprice"), F.lit(HIST_LO), F.lit(HIST_HI), F.lit(N_BUCKETS)
    )
    return (
        o.select(b.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_HISTOGRAM = f"""
SELECT CAST(CASE WHEN o_totalprice < {HIST_LO} THEN 0
            WHEN o_totalprice >= {HIST_HI} THEN {N_BUCKETS} + 1
            ELSE floor((o_totalprice - {HIST_LO}) / ({HIST_HI} - {HIST_LO}) * {N_BUCKETS}) + 1
       END AS INT) AS bucket,
       count(*) AS n_orders
FROM orders
GROUP BY bucket
"""


EQD_K = 8  # equi-depth bucket count


def equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram of order totals: bucket boundaries are the
    exact order statistics at ranks ceil(i*n/k), fetched with
    `operators.ranks.rows_at_ranks` — range partition + per-partition
    counts + sorting ONLY the partitions containing a requested rank.
    No `row_number() OVER (ORDER BY ...)` single-reducer sort anywhere
    (the plan-audit axis that killed that shape), and no approximation:
    these are the true quantiles, not percentile_approx sketches (the
    accuracy of which `approx_quantile_gate` measures separately).

    Assignment compares each row against the k-1 boundary literals
    (price-only comparison, so ties share a bucket deterministically on
    both engines); counts deviate from n/k exactly where ties straddle a
    boundary — the honest equi-depth semantics. The k-1 boundary fetch is
    a bounded driver-side collect (same class as centroid lists)."""
    from ..operators.ranks import rows_at_ranks

    o = _t(spark, sf_dir, "orders")
    n = o.count()
    ranks = [(i * n + EQD_K - 1) // EQD_K for i in range(1, EQD_K)]
    ranks_rows, _n2 = rows_at_ranks(
        o.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        ranks,
    )
    bounds = [r["o_totalprice"] for r in ranks_rows]
    bucket = sum(
        ((F.col("o_totalprice") > F.lit(b)).cast("int") for b in bounds),
        F.lit(0),
    )
    return (
        o.select(bucket.cast("int").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


ORACLE_EQUIDEPTH = f"""
WITH n AS (SELECT count(*) AS n FROM orders),
r AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
  FROM orders),
b AS (
  SELECT r.o_totalprice AS bp
  FROM r, n, (SELECT unnest(range(1, {EQD_K})) AS i)
  WHERE r.rn = (i * n.n + {EQD_K - 1}) // {EQD_K}),
assigned AS (
  SELECT o.o_totalprice,
         (SELECT count(*) FROM b WHERE o.o_totalprice > b.bp) AS bucket
  FROM orders o)
SELECT CAST(bucket AS INT) AS bucket,
       count(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total_price
FROM assigned
GROUP BY bucket
"""


# --- SCD Type-2 history build: change events -> validity intervals ---

def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from a change stream:
    each user's events become validity intervals [valid_from, valid_to)
    with the next change's timestamp closing the previous interval and
    the latest row left open (is_current). One window over (user_id, ts)
    — a single shuffle on the natural partition key; this is the standard
    warehouse pattern for reconstructing point-in-time state from CDC
    feeds, and composes with the as-of join for time-travel lookups."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("value_cents"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


ORACLE_SCD2 = """
SELECT user_id, event_id,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- conversion funnel: ordered-step user progression in one aggregate ---

def funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click -> purchase conversion funnel with latency buckets: per user,
    the first click and the first purchase AFTER that click, rolled up by
    how fast the conversion happened (<=1h, <=1d, later, none). One
    groupBy(user) computes both step timestamps with conditional
    aggregates — no join, no window over the fact stream; the sequenced
    condition (purchase strictly after the user's first click) is what
    distinguishes a funnel from two independent counts."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.struct("ts")).otherwise(None)
        ).alias("purchases"),
    )
    first_conv = F.array_min(
        F.filter(
            F.col("purchases"),
            lambda x: x["ts"] >= F.col("first_click"),
        )
    )["ts"]
    gap_s = (
        first_conv.cast("timestamp").cast("double")
        - F.col("first_click").cast("timestamp").cast("double")
    )
    latency = (
        F.when(F.col("first_click").isNull(), "no_click")
        .when(first_conv.isNull(), "none")
        .when(gap_s <= 3600, "within_1h")
        .when(gap_s <= 86400, "within_1d")
        .otherwise("later")
    )
    return (
        per_user.select(latency.alias("latency"))
        .groupBy("latency")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE_FUNNEL = """
WITH fc AS (
  SELECT user_id, min(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY 1),
conv AS (
  SELECT e.user_id, min(e.ts) AS first_conv
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
  GROUP BY 1),
users AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('click', 'purchase'))
SELECT latency, count(*) AS n_users
FROM (
  SELECT u.user_id,
         CASE WHEN fc.first_click IS NULL THEN 'no_click'
              WHEN conv.first_conv IS NULL THEN 'none'
              WHEN epoch(conv.first_conv) - epoch(fc.first_click) <= 3600 THEN 'within_1h'
              WHEN epoch(conv.first_conv) - epoch(fc.first_click) <= 86400 THEN 'within_1d'
              ELSE 'later' END AS latency
  FROM users u
  LEFT JOIN fc ON u.user_id = fc.user_id
  LEFT JOIN conv ON u.user_id = conv.user_id)
GROUP BY latency
"""


# --- cohort retention: first-seen week x weeks-since activity matrix ---

def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: users cohorted by first-active ISO week,
    counted in each later week they were active. Pipeline: distinct
    (user, week) pairs (one shuffle, heavy fan-in), per-user cohort week
    via a window min over those SMALL distinct pairs (not the raw
    stream), then a (cohort, weeks_since) count. Weeks are epoch-floored
    integers — no calendar edge cases in the cross-engine hash."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir)
    week = F.floor(F.col("ts").cast("timestamp").cast("double") / F.lit(604800)).cast("long")
    uw = ev.select("user_id", week.alias("week")).distinct()
    w = W.partitionBy("user_id")
    cohorted = uw.withColumn("cohort_week", F.min("week").over(w))
    return (
        cohorted.groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("weeks_since")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE_COHORT = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events),
c AS (
  SELECT user_id, week,
         min(week) OVER (PARTITION BY user_id) AS cohort_week
  FROM uw)
SELECT cohort_week, week - cohort_week AS weeks_since, count(*) AS n_users
FROM c
GROUP BY 1, 2
"""


# --- grouped linear regression: slope/intercept from algebraic sums ---

def price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag, the least-squares fit of extendedprice on
    quantity, computed from the five algebraic sums (n, Sx, Sy, Sxy,
    Sxx) over cent-scaled integers — one map-side-combinable aggregate,
    exact up to the final two fp divisions, deterministic under any
    partitioning (the same reason regr_slope/regr_* built-ins aren't
    used: their double accumulation is order-dependent cross-engine)."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    d = lambda c: c.cast("double")  # noqa: E731 — identical IEEE754 ops on both engines
    n, sx, sy = d(F.col("n")), d(F.col("sx")), d(F.col("sy"))
    sxy, sxx = d(F.col("sxy")), d(F.col("sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / F.lit(100.0)
    return agg.select(
        "l_returnflag",
        "n",
        fround(slope, 6).alias("slope"),
        fround(intercept, 4).alias("intercept"),
    )


ORACLE_REGRESSION = """
SELECT l_returnflag, n,
       floor(((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * 1000000 + 0.5) / 1000000.0
         AS slope,
       floor(((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                             / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
              / n::DOUBLE / 100.0) * 10000 + 0.5) / 10000.0 AS intercept
FROM (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM (SELECT l_returnflag,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem)
  GROUP BY l_returnflag)
"""


# --- the full ranking-function family in one deterministic window ---

def ranking_functions_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist over each status's
    price ordering, restricted to the top-20 ranks per status. Price ties
    are REAL here (ties are the whole point of rank vs dense_rank), so
    the window orders by price alone and the output is restricted to
    rank-level granularity: one row per (status, price) with its four
    rank values and the tie count — total-ordered, plan-independent."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("price_c"))
    ranked = orders.select("o_orderstatus", cents.alias("price_c")).select(
        "o_orderstatus",
        "price_c",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        fround(F.percent_rank().over(w), 6).alias("prnk"),
        fround(F.cume_dist().over(w), 6).alias("cdist"),
    )
    return (
        ranked.filter(F.col("rnk") <= 20)
        .groupBy("o_orderstatus", "price_c", "rnk", "drnk", "prnk", "cdist")
        .agg(F.count(F.lit(1)).alias("n_tied"))
    )


ORACLE_RANKING = """
SELECT o_orderstatus, price_c, rnk, drnk, prnk, cdist, count(*) AS n_tied
FROM (
  SELECT o_orderstatus, price_c,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000.0 AS prnk,
         floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000.0 AS cdist
  FROM (SELECT o_orderstatus,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders)
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY price_c DESC))
WHERE rnk <= 20
GROUP BY o_orderstatus, price_c, rnk, drnk, prnk, cdist
"""


# --- first-order Markov transition matrix over user event sequences ---

def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, n_transitions, prob): the empirical first-order
    Markov chain over each user's time-ordered event stream — the
    behavioral-sequence statistic behind session modeling, next-action
    prediction features, and bot detection (a user whose transition rows
    diverge sharply from this table is an anomaly candidate).

    Plan: one window partitioned BY USER (per-partition work is a user's
    own event count — bounded, never corpus-scale) computes lead(); one
    5x5-bounded aggregate; row-normalization is a window over the 25-row
    aggregate. Ties inside a timestamp are totally ordered by event_id so
    the chain is deterministic on both engines."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("to_type", F.lead("event_type").over(w)).filter(
        F.col("to_type").isNotNull()
    )
    t = seq.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    tot = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        fround(
            F.col("n_transitions") / F.sum("n_transitions").over(tot), 6
        ).alias("prob"),
    )


ORACLE_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events),
t AS (
  SELECT event_type AS from_type, to_type, count(*) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY 1, 2)
SELECT from_type, to_type, n_transitions,
       floor(n_transitions::DOUBLE
             / sum(n_transitions) OVER (PARTITION BY from_type)
             * 1000000 + 0.5) / 1000000.0 AS prob
FROM t
"""


QUERIES = {
    "decayed_user_value": decayed_user_value,
    "event_transition_matrix": event_transition_matrix,
    "ranking_functions_sample": ranking_functions_sample,
    "price_qty_regression": price_qty_regression,
    "cohort_weekly_retention": cohort_weekly_retention,
    "funnel_click_purchase": funnel_click_purchase,
    "scd2_user_value_history": scd2_user_value_history,
    "unpivot_lineitem_measures": unpivot_lineitem_measures,
    "order_price_histogram": order_price_histogram,
    "equidepth_price_histogram": equidepth_price_histogram,
    "grouping_sets_status_priority": grouping_sets_status_priority,
    "moving_avg_7d_revenue": moving_avg_7d_revenue,
    "string_agg_priorities": string_agg_priorities,
    "calendar_fill_gaps": calendar_fill_gaps,
    "salted_event_type_totals": salted_event_type_totals,
    "hll_distinct_custkeys": hll_distinct_custkeys,
}

ORACLE = {
    "decayed_user_value": ORACLE_DECAYED,
    "event_transition_matrix": ORACLE_TRANSITIONS,
    "ranking_functions_sample": ORACLE_RANKING,
    "price_qty_regression": ORACLE_REGRESSION,
    "cohort_weekly_retention": ORACLE_COHORT,
    "funnel_click_purchase": ORACLE_FUNNEL,
    "scd2_user_value_history": ORACLE_SCD2,
    "unpivot_lineitem_measures": ORACLE_UNPIVOT,
    "order_price_histogram": ORACLE_HISTOGRAM,
    "equidepth_price_histogram": ORACLE_EQUIDEPTH,
    "grouping_sets_status_priority": ORACLE_GROUPING_SETS,
    "moving_avg_7d_revenue": ORACLE_MOVING_AVG,
    "string_agg_priorities": ORACLE_STRING_AGG,
    "calendar_fill_gaps": ORACLE_CALENDAR_FILL,
    "salted_event_type_totals": ORACLE_SALTED,
    "hll_distinct_custkeys": ORACLE_HLL,
}
