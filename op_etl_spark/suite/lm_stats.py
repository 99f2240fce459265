"""Language-model corpus statistics: exact heavy hitters and n-gram
continuation probabilities.

Two ops a training-data pipeline runs constantly:

- hot-key detection (`operators/heavy_hitters.py`): which keys exceed
  frequency N/K — bot users, spam hosts, boilerplate n-grams — answered
  EXACTLY with a narrow Misra-Gries candidate pass plus a
  candidate-bounded count, never a full-cardinality shuffle.
- bigram continuation tables (the count backbone of KenLM-style n-gram
  models and of tokenizer-merge statistics): built entirely with array
  ops (`slice` + `arrays_zip`) — adjacency comes from the token array
  itself, NO per-doc window function and no position join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import fround, read_table
from ..operators.heavy_hitters import heavy_hitters

HH_K = 150          # report keys with count > N/150
HH_COUNTERS = 256   # Misra-Gries counters per partition (>= HH_K)
TOP_CONTINUATIONS = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents", fan=True)


def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hot-key report over the events fact table: every user_id
    whose event count exceeds N/150, with its exact count — the
    "who needs salting / who is a bot" query. Two passes: narrow
    Misra-Gries summaries (256 counters/partition, mapInPandas), then an
    exact count over the broadcast candidate set. The full-cardinality
    `groupBy(user_id)` shuffle never happens; pass-2 state is bounded by
    |candidates| <= 256 * n_partitions regardless of data volume.

    (On this synthetic testdata user counts are near-uniform so most
    partitions never prune — the guarantee, not the pruning, is what the
    oracle checks; pruning engages whenever a partition sees more than
    256 distinct keys, i.e. on any realistic corpus.)"""
    ev = read_table(spark, sf_dir, "events", fan=True)
    hh = heavy_hitters(ev, "user_id", HH_K, HH_COUNTERS)
    return hh.select(F.col("user_id").cast("bigint").alias("user_id"), "cnt")


ORACLE_HEAVY_HITTERS = f"""
SELECT user_id, count(*) AS cnt
FROM events
GROUP BY user_id
HAVING count(*) * {HH_K} > (SELECT count(*) FROM events)
"""


def bigram_next_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP} next-token continuations per token with conditional
    probabilities — the bigram LM count table, reduced to its head for a
    bounded result. Adjacent pairs come from zipping the token array
    with itself shifted by one (`slice`), a NARROW op: the only
    shuffles are the (w1, w2) count aggregate (map-side combined) and
    the per-w1 windows, whose partitions are bounded by the number of
    distinct continuations of one token — never a global sort. The w1
    marginal is a SUM window over the same per-w1 partitioning the
    top-k rank uses, so the bigram aggregate is scanned once (one
    corpus scan total; plan-pinned) and both windows share one
    exchange."""
    toks = F.split(F.col("text"), " ")
    bg = (
        _docs(spark, sf_dir)
        .select(toks.alias("t"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    w = Window.partitionBy("w1").orderBy(F.col("c2").desc(), F.col("w2"))
    wsum = Window.partitionBy("w1")
    return (
        bg.withColumn("rnk", F.row_number().over(w))
        .withColumn("c1", F.sum("c2").over(wsum))
        .filter(F.col("rnk") <= TOP_CONTINUATIONS)
        .select(
            "w1",
            "w2",
            "c2",
            "rnk",
            fround(F.col("c2") / F.col("c1"), 4).alias("p_next"),
        )
    )


bigram_next_token.__doc__ = bigram_next_token.__doc__.replace(
    "{TOP}", str(TOP_CONTINUATIONS)
)

ORACLE_BIGRAM = f"""
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS c2
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
  GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM bg GROUP BY 1),
r AS (
  SELECT w1, w2, c2,
         row_number() OVER (PARTITION BY w1 ORDER BY c2 DESC, w2) AS rnk
  FROM bg)
SELECT r.w1, r.w2, r.c2, r.rnk,
       floor((r.c2 / c1.c1) * 10000 + 0.5) / 10000.0 AS p_next
FROM r JOIN c1 ON c1.w1 = r.w1
WHERE r.rnk <= {TOP_CONTINUATIONS}
"""


def bigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram surprisal under the corpus's OWN add-one-
    smoothed bigram LM — the no-dependency analog of the CCNet/KenLM
    perplexity filter: documents whose token transitions are improbable
    under the corpus distribution (gibberish, boilerplate soup, wrong
    language) score high and get filtered.

    score(doc) = mean over its bigram occurrences of
    -log2((c2(w1,w2) + 1) / (c1(w1) + V)), V = observed bigram vocab.

    Plan shape: ONE corpus scan explodes (doc_id, w1, w2) multiplicities
    (persisted — it feeds both the corpus count table and the per-doc
    join); the LM tables c2/c1 are aggregates OF that table (the corpus
    is never re-read); the scoring join is key-partitioned on (w1, w2)
    then w1; V is a scalar. Per-bigram surprisal is quantized to 1e-6
    and summed as exact integers (the money_sum pattern), so the per-doc
    mean is partitioning-independent.

    Cross-engine exactness caveat (weaker than ann_recall.py's
    sqrt/divide-only discipline): (c2+1) and (c1+V) are exact integers,
    and IEEE-754 division is correctly rounded, so BOTH engines feed
    log2 the bit-identical double quotient. log2 itself, however, is not
    guaranteed correctly rounded (JVM StrictMath vs libm), so the two
    engines may disagree by ~1 ulp (2^-46 relative); the 1e-6
    quantization flips only when the true surprisal sits within that ulp
    of a x.xxxxxx5 boundary — ~1e-10 probability per distinct bigram,
    and deterministic per (corpus, platform): the gate cannot flap
    between runs, only between platforms, and has held on every sf
    tested. The fully exact alternative (binary-searching the micro unit
    via integer cross-multiplication against 2^(n/1e6)) needs exact
    bignum pow — out of proportion for a quality-score filter whose
    downstream consumer thresholds at whole-bit granularity."""
    from pyspark import StorageLevel

    toks = F.split(F.col("text"), " ")
    bgd = (
        _docs(spark, sf_dir)
        .select(F.col("doc_id"), toks.alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c2 = bgd.groupBy("w1", "w2").agg(F.sum("m").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        c2.select("w1").union(c2.select(F.col("w2").alias("w1"))).distinct().count()
    )
    micro = F.floor(
        -F.log2((F.col("c2") + 1) / (F.col("c1") + F.lit(vocab))) * 1000000
        + F.lit(0.5)
    ).cast("long")
    # Per-bigram surprisal is a function of (c2, c1, V) alone, so the LM
    # tables join each other FIRST (bigram-vocab-sized shuffle) and the
    # corpus-sized bgd is reshuffled ONCE, on (w1, w2) — the retired
    # bgd⋈c2⋈c1 order reshuffled the joined corpus table a second time
    # on w1 (guide §2.4). Same rows, same operands: c2 is unique per
    # (w1, w2) and c1 per w1, so both join orders attach the identical
    # (c2, c1) pair to every bgd row, and the exact-integer micro sums
    # are order-independent.
    lm = c2.join(c1, "w1").select("w1", "w2", micro.alias("micro"))
    return (
        bgd.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("micro")).alias("tot_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            fround(F.col("tot_micro") / F.lit(1000000.0) / F.col("n_bigrams"), 4).alias(
                "mean_surprisal"
            ),
        )
    )


ORACLE_SURPRISAL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bgd AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, count(*) AS m
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
  GROUP BY 1, 2, 3),
c2 AS (SELECT w1, w2, sum(m) AS c2 FROM bgd GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
v AS (SELECT count(*) AS v FROM (SELECT w1 FROM c2 UNION SELECT w2 FROM c2)),
j AS (
  SELECT b.doc_id, b.m,
         CAST(floor(-log2((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS micro
  FROM bgd b
  JOIN c2 USING (w1, w2)
  JOIN c1 USING (w1)
  CROSS JOIN v)
SELECT doc_id,
       CAST(sum(m) AS BIGINT) AS n_bigrams,
       floor((sum(m * micro) / 1000000.0 / sum(m)) * 10000 + 0.5) / 10000.0 AS mean_surprisal
FROM j GROUP BY 1
"""


QUERIES = {
    "heavy_hitter_users": heavy_hitter_users,
    "bigram_next_token": bigram_next_token,
    "bigram_surprisal_scores": bigram_surprisal_scores,
}

ORACLE = {
    "heavy_hitter_users": ORACLE_HEAVY_HITTERS,
    "bigram_next_token": ORACLE_BIGRAM,
    "bigram_surprisal_scores": ORACLE_SURPRISAL,
}
