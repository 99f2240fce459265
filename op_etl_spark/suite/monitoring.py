"""Pipeline monitoring: data-quality constraint checks and distribution
drift — the "is this corpus safe to train on / did the feed change under
us" queries a production pipeline runs on every ingest.

Scale contract: every metric is computed in ONE aggregate pass per
table (constraints over a table ride the same scan, then fan out to
per-constraint rows via an exploded struct array — never one scan per
constraint), referential integrity is the single required join, and
drift bucket counts come from one scan + one shuffle on (feature,
bucket). All measured values are exact integer counts or exact-count
ratios — no sketches — so the report is oracle-checkable and
bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import fixture_mod, fixture_mod_sql, fround, read_table
from ..operators.sampling import hash_unit, hash_unit_sql

DISCOUNT_CAP = 0.05  # deliberately tighter than the data: exercises a FAIL row


def _constraint_rows(agg: DataFrame, rows: list[tuple[str, str, object, float]]):
    """Fan a 1-row aggregate out to per-constraint rows: (constraint,
    table_name, value, threshold, passed). One struct per constraint,
    explode — the table is scanned once no matter how many constraints
    ride it."""
    structs = [
        F.struct(
            F.lit(name).alias("constraint"),
            F.lit(table).alias("table_name"),
            fround(value, 6).alias("value"),
            F.lit(float(thr)).alias("threshold"),
            (fround(value, 6) <= F.lit(float(thr))).alias("passed"),
        )
        for name, table, value, thr in rows
    ]
    return agg.select(F.explode(F.array(*structs)).alias("c")).select("c.*")


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint report over orders / lineitem / events:
    uniqueness, domain membership, value ranges, null fractions, and
    orders->customer referential integrity — each row a constraint with
    its exact measured violation fraction and pass verdict. Violation
    fractions (not booleans) so a failing feed shows HOW bad.

    One scan per table: all of a table's constraint metrics are computed
    in a single aggregate; referential integrity rides the orders scan
    as a left join against customer keys (at 100 TB: a shuffle join on
    the key — no per-constraint re-scans). The discount cap is set
    tighter than the generator's range on purpose, pinning that failing
    constraints actually surface as passed=false."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("__ck"), F.lit(1).alias("__c")
    )
    o = orders.join(cust, orders.o_custkey == F.col("__ck"), "left")
    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("n_key"),
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")).alias(
            "bad_status"
        ),
        F.sum(F.col("__c").isNull().cast("long")).alias("orphans"),
    )
    o_rows = _constraint_rows(
        o_agg,
        [
            ("duplicate_orderkey_frac", "orders", 1.0 - F.col("n_key") / F.col("n"), 0.0),
            ("status_domain_violation_frac", "orders", F.col("bad_status") / F.col("n"), 0.0),
            ("orphan_custkey_frac", "orders", F.col("orphans") / F.col("n"), 0.0),
        ],
    )

    li = read_table(spark, sf_dir, "lineitem")
    l_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")
        ).alias("bad_qty"),
        F.sum((F.col("l_discount") > DISCOUNT_CAP).cast("long")).alias("bad_disc"),
    )
    l_rows = _constraint_rows(
        l_agg,
        [
            ("quantity_range_violation_frac", "lineitem", F.col("bad_qty") / F.col("n"), 0.0),
            ("discount_cap_violation_frac", "lineitem", F.col("bad_disc") / F.col("n"), 0.0),
        ],
    )

    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir)
    e_agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
    )
    e_rows = _constraint_rows(
        e_agg,
        [("null_value_frac", "events", F.col("null_value") / F.col("n"), 0.0)],
    )

    docs = read_table(spark, sf_dir, "documents")
    d_agg = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (~F.col("lang").isin("de", "en", "es", "fr", "zh")).cast("long")
        ).alias("bad_lang"),
        F.sum((F.col("n_chars") != F.length("text")).cast("long")).alias(
            "bad_chars"
        ),
        F.sum((F.length("text") == 0).cast("long")).alias("empty_docs"),
    )
    d_rows = _constraint_rows(
        d_agg,
        [
            ("lang_domain_violation_frac", "documents", F.col("bad_lang") / F.col("n"), 0.0),
            ("n_chars_mismatch_frac", "documents", F.col("bad_chars") / F.col("n"), 0.0),
            ("empty_doc_frac", "documents", F.col("empty_docs") / F.col("n"), 0.0),
        ],
    )
    return o_rows.union(l_rows).union(e_rows).union(d_rows)


ORACLE_DQ = f"""
WITH o AS (
  SELECT count(*) AS n,
         count(DISTINCT o_orderkey) AS n_key,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status,
         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS orphans
  FROM orders LEFT JOIN customer c ON c.c_custkey = o_custkey),
l AS (
  SELECT count(*) AS n,
         sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS bad_qty,
         sum(CASE WHEN l_discount > {DISCOUNT_CAP} THEN 1 ELSE 0 END) AS bad_disc
  FROM lineitem),
e AS (
  SELECT count(*) AS n,
         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS null_value
  FROM events),
dd AS (
  SELECT count(*) AS n,
         sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh') THEN 1 ELSE 0 END) AS bad_lang,
         sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS bad_chars,
         sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS empty_docs
  FROM documents),
raw AS (
  SELECT 'duplicate_orderkey_frac' AS "constraint", 'orders' AS table_name,
         1.0 - n_key / n AS v, 0.0 AS threshold FROM o
  UNION ALL SELECT 'status_domain_violation_frac', 'orders', bad_status / n, 0.0 FROM o
  UNION ALL SELECT 'orphan_custkey_frac', 'orders', orphans / n, 0.0 FROM o
  UNION ALL SELECT 'quantity_range_violation_frac', 'lineitem', bad_qty / n, 0.0 FROM l
  UNION ALL SELECT 'discount_cap_violation_frac', 'lineitem', bad_disc / n, 0.0 FROM l
  UNION ALL SELECT 'null_value_frac', 'events', null_value / n, 0.0 FROM e
  UNION ALL SELECT 'lang_domain_violation_frac', 'documents', bad_lang / n, 0.0 FROM dd
  UNION ALL SELECT 'n_chars_mismatch_frac', 'documents', bad_chars / n, 0.0 FROM dd
  UNION ALL SELECT 'empty_doc_frac', 'documents', empty_docs / n, 0.0 FROM dd)
SELECT "constraint", table_name,
       floor(v * 1000000 + 0.5) / 1000000.0 AS value,
       CAST(threshold AS DOUBLE) AS threshold,
       floor(v * 1000000 + 0.5) / 1000000.0 <= threshold AS passed
FROM raw
"""


# --- distribution drift between a reference and a current corpus slice ---

DRIFT_CHARS_BUCKET = 100


def drift_bucket_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(feature, bucket) distribution drift between a reference and a
    current corpus slice (here: a deterministic hash half-split standing
    in for yesterday-vs-today). For each bucket of each monitored
    feature (lang categorical; n_chars in fixed 100-char bins) the
    report carries exact counts on both sides plus a symmetric
    chi-square-style contribution 2*(p_cur-p_ref)^2/(p_ref+p_cur) —
    algebraic in exact count ratios, so cross-engine deterministic
    (no logs, unlike textbook PSI whose ln(p/q) is libm-dependent).
    Per-bucket rows, not a summed scalar: the sum is one trivial
    reduction away for a consumer, while the rows say WHERE the drift
    is — and leaving the sum out keeps the result independent of
    floating-point summation order.

    One corpus scan — total: both features explode from a single
    struct array; one shuffle on (feature, bucket); the split totals
    are recovered from the bucket counts themselves (every document
    lands in exactly one bucket per feature, so a SUM window
    partitioned by feature equals the global split total — no second
    corpus scan, no 1-row broadcast, and the window input is
    |buckets of one feature|, bounded)."""
    d = read_table(spark, sf_dir, "documents")
    cur = (hash_unit(F.col("doc_id"), "drift") < 0.5).cast("int")
    feats = F.array(
        F.struct(F.lit("lang").alias("feature"), F.col("lang").alias("bucket")),
        F.struct(
            F.lit("chars_bucket").alias("feature"),
            (F.floor(F.col("n_chars") / DRIFT_CHARS_BUCKET)).cast("string").alias(
                "bucket"
            ),
        ),
    )
    rows = d.select(cur.alias("cur"), F.explode(feats).alias("f")).select(
        "cur", "f.feature", "f.bucket"
    )
    from pyspark.sql.window import Window

    counts = rows.groupBy("feature", "bucket").agg(
        F.sum(F.col("cur")).alias("n_cur"),
        F.sum(1 - F.col("cur")).alias("n_ref"),
    )
    wf = Window.partitionBy("feature")
    counts = counts.withColumn("tot_cur", F.sum("n_cur").over(wf)).withColumn(
        "tot_ref", F.sum("n_ref").over(wf)
    )
    p_cur = F.col("n_cur") / F.col("tot_cur")
    p_ref = F.col("n_ref") / F.col("tot_ref")
    contrib = 2 * (p_cur - p_ref) * (p_cur - p_ref) / (p_cur + p_ref)
    return counts.select(
        "feature",
        "bucket",
        "n_ref",
        "n_cur",
        fround(contrib, 6).alias("drift_contrib"),
    )


_U_DRIFT = hash_unit_sql("doc_id", "drift")

ORACLE_DRIFT = f"""
WITH d AS (
  SELECT *, CASE WHEN {_U_DRIFT} < 0.5 THEN 1 ELSE 0 END AS cur
  FROM documents),
rows_ AS (
  SELECT cur, 'lang' AS feature, lang AS bucket FROM d
  UNION ALL
  SELECT cur, 'chars_bucket',
         CAST(CAST(floor(n_chars / {DRIFT_CHARS_BUCKET}) AS BIGINT) AS VARCHAR)
  FROM d),
counts AS (
  SELECT feature, bucket,
         CAST(sum(cur) AS BIGINT) AS n_cur,
         CAST(sum(1 - cur) AS BIGINT) AS n_ref
  FROM rows_ GROUP BY 1, 2),
wtot AS (
  SELECT *,
         CAST(sum(n_cur) OVER (PARTITION BY feature) AS BIGINT) AS tot_cur,
         CAST(sum(n_ref) OVER (PARTITION BY feature) AS BIGINT) AS tot_ref
  FROM counts)
SELECT feature, bucket, n_ref, n_cur,
       floor((2 * (n_cur / tot_cur - n_ref / tot_ref) * (n_cur / tot_cur - n_ref / tot_ref)
              / (n_cur / tot_cur + n_ref / tot_ref)) * 1000000 + 0.5) / 1000000.0
         AS drift_contrib
FROM wtot
"""


# --- the drift monitor AS A STREAM ---

# Fixture target: the stream gate's driver collect is O(this) at any sf —
# the subsample modulus is derived from the documents row count
# (`fixture_mod`), with `fixture_mod_sql` as the oracle's identical twin.
STREAM_DRIFT_TARGET_ROWS = 128

_DOCS_MOD_SQL = fixture_mod_sql("documents", STREAM_DRIFT_TARGET_ROWS)


def stream_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor run AS A STREAM: the 'current' slice arrives as
    two micro-batches (maxFilesPerTrigger=1) and its bucket histogram is
    maintained by `streaming.monitor.bucket_counts_stream` — a streaming
    aggregation whose state is the bucket domain (a few hundred rows),
    NOT the stream, in complete output mode. The reference histogram
    comes from the batch side of the SAME bucketing expression, and the
    final report is a full-outer join of the two tiny count tables with
    the identical chi-square-style contribution as the batch twin.

    Both sides are restricted to a deterministic doc_id subsample whose
    modulus is DERIVED from the documents row count (`fixture_mod`), so
    the fixture writer collects O(STREAM_DRIFT_TARGET_ROWS) rows at any
    sf, never a fixed fraction of the corpus (the monitor under test is
    unbounded-safe; only this gate's driver-local file writer needs rows
    on the driver — same contract as the sessionize and dedup stream
    gates, and the oracle embeds the identical count-derived modulus)."""
    import json
    import tempfile

    from pyspark.sql.window import Window

    from op_etl_spark.streaming.monitor import bucket_counts_stream

    docs = read_table(spark, sf_dir, "documents")
    mod = fixture_mod(docs.count(), STREAM_DRIFT_TARGET_ROWS)
    d = docs.filter(F.col("doc_id") % mod == 0)
    cur_mask = hash_unit(F.col("doc_id"), "drift") < 0.5
    cur_rows = d.filter(cur_mask).select("doc_id", "lang", "n_chars").collect()
    tmp = tempfile.mkdtemp(prefix="stream_drift_")
    half = len(cur_rows) // 2 or 1
    for i, chunk in enumerate((cur_rows[:half], cur_rows[half:])):
        with open(f"{tmp}/docs_{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r.asDict()) + "\n")

    stream = (
        spark.readStream.schema("doc_id bigint, lang string, n_chars bigint")
        .option("maxFilesPerTrigger", "1")
        .json(tmp)
    )
    name = "stream_drift_gate"
    q = (
        bucket_counts_stream(stream, DRIFT_CHARS_BUCKET)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    cur = spark.table(name).select(
        "feature", "bucket", F.col("n").alias("n_cur")
    )
    ref = bucket_counts_stream(d.filter(~cur_mask), DRIFT_CHARS_BUCKET).select(
        "feature", "bucket", F.col("n").alias("n_ref")
    )
    j = (
        ref.join(cur, ["feature", "bucket"], "full_outer")
        .withColumn("n_ref", F.coalesce("n_ref", F.lit(0)))
        .withColumn("n_cur", F.coalesce("n_cur", F.lit(0)))
    )
    wf = Window.partitionBy("feature")
    j = j.withColumn("tot_cur", F.sum("n_cur").over(wf)).withColumn(
        "tot_ref", F.sum("n_ref").over(wf)
    )
    p_cur = F.col("n_cur") / F.col("tot_cur")
    p_ref = F.col("n_ref") / F.col("tot_ref")
    contrib = 2 * (p_cur - p_ref) * (p_cur - p_ref) / (p_cur + p_ref)
    return j.select(
        "feature",
        "bucket",
        "n_ref",
        "n_cur",
        fround(contrib, 6).alias("drift_contrib"),
    )


ORACLE_STREAM_DRIFT = f"""
WITH d AS (
  SELECT *, CASE WHEN {_U_DRIFT} < 0.5 THEN 1 ELSE 0 END AS cur
  FROM documents
  WHERE doc_id % {_DOCS_MOD_SQL} = 0),
rows_ AS (
  SELECT cur, 'lang' AS feature, lang AS bucket FROM d
  UNION ALL
  SELECT cur, 'chars_bucket',
         CAST(CAST(floor(n_chars / {DRIFT_CHARS_BUCKET}) AS BIGINT) AS VARCHAR)
  FROM d),
counts AS (
  SELECT feature, bucket,
         CAST(sum(cur) AS BIGINT) AS n_cur,
         CAST(sum(1 - cur) AS BIGINT) AS n_ref
  FROM rows_ GROUP BY 1, 2),
wtot AS (
  SELECT *,
         CAST(sum(n_cur) OVER (PARTITION BY feature) AS BIGINT) AS tot_cur,
         CAST(sum(n_ref) OVER (PARTITION BY feature) AS BIGINT) AS tot_ref
  FROM counts)
SELECT feature, bucket, n_ref, n_cur,
       floor((2 * (n_cur / tot_cur - n_ref / tot_ref) * (n_cur / tot_cur - n_ref / tot_ref)
              / (n_cur / tot_cur + n_ref / tot_ref)) * 1000000 + 0.5) / 1000000.0
         AS drift_contrib
FROM wtot
"""


QUERIES = {
    "dq_constraint_report": dq_constraint_report,
    "drift_bucket_report": drift_bucket_report,
    "stream_drift_report": stream_drift_report,
}

ORACLE = {
    "dq_constraint_report": ORACLE_DQ,
    "drift_bucket_report": ORACLE_DRIFT,
    "stream_drift_report": ORACLE_STREAM_DRIFT,
}
