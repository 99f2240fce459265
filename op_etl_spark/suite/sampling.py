"""Oracle-checked queries for deterministic sampling (operators/sampling.py).

Aggregated outputs (counts + id checksums per cohort) keep result sets
small while still pinning every row's sampling decision: a single row
flipping cohort changes a checksum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import read_table
from ..operators.sampling import (
    deterministic_sample,
    group_topk_sample,
    hash_unit,
    hash_unit_sql,
    negative_pairs,
    shuffle_shards,
    stratified_sample,
    train_test_split,
)

TEST_FRACTION = 0.2
HOLDOUT_FRACTION = 0.1
LANG_FRACTIONS = {"en": 0.25, "fr": 0.5, "zh": 1.0}
DEFAULT_FRACTION = 0.05
GROUP_K = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


def split_cohort_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train/test/holdout sizes and id checksums per language."""
    d = train_test_split(
        _docs(spark, sf_dir), "doc_id", TEST_FRACTION, "split", HOLDOUT_FRACTION
    )
    return d.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


_U_SPLIT = hash_unit_sql("doc_id", "split")

ORACLE_SPLIT = f"""
SELECT CASE WHEN {_U_SPLIT} < {TEST_FRACTION} THEN 'test'
            WHEN {_U_SPLIT} < {TEST_FRACTION + HOLDOUT_FRACTION} THEN 'holdout'
            ELSE 'train' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents
GROUP BY 1, 2
"""


def stratified_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalanced corpus sample: per-lang keep fractions, default
    for unlisted strata."""
    s = stratified_sample(
        _docs(spark, sf_dir), "doc_id", "lang", LANG_FRACTIONS, DEFAULT_FRACTION
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
        F.sum("n_chars").alias("chars_kept"),
    )


_U = hash_unit_sql("doc_id")
_THR = (
    "CASE lang "
    + " ".join(f"WHEN '{v}' THEN {f}" for v, f in sorted(LANG_FRACTIONS.items()))
    + f" ELSE {DEFAULT_FRACTION} END"
)

ORACLE_STRATIFIED = f"""
SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum, CAST(sum(n_chars) AS BIGINT) AS chars_kept
FROM documents
WHERE {_U} < {_THR}
GROUP BY lang
"""


def source_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly K uniformly-chosen docs per (source, lang) group — skew-capped
    sampling; emits the chosen doc ids so the oracle pins each pick."""
    s = group_topk_sample(
        _docs(spark, sf_dir), ["source", "lang"], "doc_id", GROUP_K, "cap"
    )
    return s.select("source", "lang", "doc_id")


_U_CAP = hash_unit_sql("doc_id", "cap")

ORACLE_TOPK = f"""
SELECT source, lang, doc_id
FROM (
  SELECT source, lang, doc_id,
         row_number() OVER (PARTITION BY source, lang
                            ORDER BY {_U_CAP}, doc_id) AS rn
  FROM documents)
WHERE rn <= {GROUP_K}
"""

NEG_K = 3


def negative_pair_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negatives for a deterministic anchor subset: 3 hash-
    chosen partners per anchor drawn from the FULL corpus, self-pairs
    dropped. Anchors are pre-filtered (partners don't depend on which
    rows are anchors, so the subset's pairs equal the full run's)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    anchors = docs.filter(F.col("doc_id") % 25 == 0)
    return negative_pairs(docs, "doc_id", NEG_K, anchors=anchors)


_U_NEG = hash_unit_sql("doc_id || '#' || j", "neg")
_J_LIST = list(range(1, NEG_K + 1))

ORACLE_NEG_PAIRS = f"""
WITH idx AS (
  SELECT doc_id AS neg_key,
         row_number() OVER (ORDER BY doc_id) - 1 AS i
  FROM documents),
n AS (SELECT count(*) AS n FROM documents),
cand AS (
  SELECT d.doc_id, j.j,
         CAST(floor({_U_NEG} * n.n) AS BIGINT) AS i
  FROM documents d
  CROSS JOIN (SELECT unnest({_J_LIST}) AS j) j
  CROSS JOIN n
  WHERE d.doc_id % 25 = 0)
SELECT c.doc_id, c.j, idx.neg_key AS neg_doc_id
FROM cand c
JOIN idx ON c.i = idx.i
WHERE idx.neg_key != c.doc_id
"""

N_SHARDS = 8


def shuffle_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full (doc_id, shard, pos) address book of a deterministic
    corpus shuffle (`operators.sampling.shuffle_shards`): reading shards
    in pos order is a reproducible global permutation, built with one
    shuffle + per-shard sorts — no global range sort, no `rand()`.
    Every row's address is pinned by the oracle, so a single misplaced
    document flips the hash."""
    return shuffle_shards(_docs(spark, sf_dir), "doc_id", N_SHARDS).select(
        "doc_id", "shard", "pos"
    )


_U_SHARD = hash_unit_sql("doc_id", "shuffle|shard")
_U_ORDER = hash_unit_sql("doc_id", "shuffle|order")

ORACLE_SHUFFLE = f"""
SELECT doc_id,
       CAST(floor({_U_SHARD} * {N_SHARDS}) AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY CAST(floor({_U_SHARD} * {N_SHARDS}) AS INT)
         ORDER BY {_U_ORDER}, doc_id) AS BIGINT) AS pos
FROM documents
"""

QW_FRAC = 0.5  # base keep rate; per-doc rate = ttr * QW_FRAC


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling by document quality: each doc's keep
    probability is proportional to its type-token ratio (keep iff
    u(doc_id) < ttr * {frac}), so cleaner documents are overrepresented
    without any hard cutoff — the soft quality curriculum a training mix
    uses. Still a narrow filter (the weight is a column expression, the
    decision a pure (salt, key) hash), so the sample is reproducible,
    repartition-stable, and append-consistent like every sampler here.
    Output pins per-lang kept counts, id checksums, and the exact
    fixed-point mean ttr of the kept set."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    ttr = F.floor(F.size(F.array_distinct(toks)) / F.size(toks) * 10000 + F.lit(0.5)) / 10000.0
    kept = d.withColumn("ttr", ttr).filter(
        hash_unit(F.col("doc_id"), "qweight") < F.col("ttr") * QW_FRAC
    )
    t4 = F.floor(F.col("ttr") * 10000 + F.lit(0.5)).cast("long")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
        (F.floor(F.sum(t4) / F.count(F.lit(1)) + F.lit(0.5)) / 10000.0).alias(
            "mean_ttr"
        ),
    )


quality_weighted_sample.__doc__ = quality_weighted_sample.__doc__.replace(
    "{frac}", str(QW_FRAC)
)

_U_QW = hash_unit_sql("doc_id", "qweight")

ORACLE_QW_SAMPLE = f"""
WITH q AS (
  SELECT doc_id, lang,
         floor((len(list_distinct(string_split(text, ' ')))
               / len(string_split(text, ' '))::DOUBLE) * 10000 + 0.5) / 10000.0 AS ttr
  FROM documents),
kept AS (SELECT * FROM q WHERE {_U_QW} < ttr * {QW_FRAC})
SELECT lang,
       count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       floor(sum(CAST(floor(ttr * 10000 + 0.5) AS BIGINT)) / count(*) + 0.5) / 10000.0 AS mean_ttr
FROM kept GROUP BY lang
"""


AES_K = 20  # sample size per language
AES_SALTS = 8  # per-salt pre-aggregation fan (bounds collect state)
_U52 = float(2**52)


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k per language, by
    the Efraimidis-Spirakis A-ES scheme: each doc draws key = ln(u)/w
    (u = md5-uniform in (0,1], w = its type-token-ratio quality weight)
    and the k LARGEST keys win — inclusion probability proportional to
    weight, no replacement, single pass, and (unlike sequential reservoir
    algorithms) embarrassingly parallel because the keys are independent.

    Contrast with quality_weighted_sample (Bernoulli keep, random sample
    SIZE): this one guarantees an exact-k quota per group — the shape a
    curriculum builder needs.

    Plan shape: the key is a pure column expression (no shuffle to draw
    it); selection is the same bounded-state two-level top-k as
    operators/sketches.bottom_k_hashes — per (lang, salt) sort+slice to
    k, then a <= salts*k merge per lang. No per-lang global sort, no
    corpus window.

    Determinism: u is an exact 52-bit-integer ratio and both engines
    divide/ln/divide the identical doubles; ln's last-ulp freedom (the
    documented suite-wide caveat, see lm_stats) could in principle flip
    an order only when two keys collide within ~1 ulp. Oracle: DuckDB
    replays the keys and takes row_number() per lang."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    ttr = (
        F.floor(F.size(F.array_distinct(toks)) / F.size(toks) * 10000 + F.lit(0.5))
        / 10000.0
    )
    hx = F.md5(F.concat(F.lit("aes|"), F.col("doc_id").cast("string")).cast("binary"))
    h52 = F.conv(F.substring(hx, 1, 13), 16, 10).cast("long")
    u = (h52 + 1) / F.lit(_U52)  # (0, 1] — ln is always finite
    base = d.select(
        "lang",
        (h52 % AES_SALTS).alias("salt"),
        F.struct(
            (-(F.log(u) / ttr)).alias("nk"),  # ascending nk == key DESC
            F.col("doc_id").alias("doc_id"),
            F.floor(ttr * 10000 + F.lit(0.5)).cast("long").alias("t4"),
        ).alias("st"),
    )
    per_salt = base.groupBy("lang", "salt").agg(
        F.slice(F.array_sort(F.collect_list("st")), 1, AES_K).alias("hs")
    )
    merged = per_salt.groupBy("lang").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("hs"))), 1, AES_K).alias("hs")
    )
    return merged.select(
        "lang", F.posexplode("hs").alias("pos", "st")
    ).select(
        "lang",
        (F.col("pos") + 1).cast("int").alias("rk"),
        F.col("st.doc_id").alias("doc_id"),
        (F.col("st.t4") / 10000.0).alias("ttr"),
    )


ORACLE_AES = f"""
WITH q AS (
  SELECT doc_id, lang,
         floor((len(list_distinct(string_split(text, ' ')))
               / len(string_split(text, ' '))::DOUBLE) * 10000 + 0.5) / 10000.0 AS ttr,
         ('0x' || substr(md5('aes|' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS h
  FROM documents),
k AS (
  SELECT lang, doc_id, ttr, ln((h + 1) / {_U52!r}) / ttr AS key FROM q),
r AS (
  SELECT lang, doc_id, ttr,
         row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rk
  FROM k)
SELECT lang, CAST(rk AS INT) AS rk, doc_id, ttr FROM r WHERE rk <= {AES_K}
"""


# --- exact-count stratified split (grouped order statistics) ---

EXACT_SPLIT_DEN = 10  # test = n//10, holdout = n//10, train = the rest


def exact_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified split with EXACT per-stratum counts: within each
    language, exactly n//10 docs to test, the next n//10 to holdout,
    the rest to train — membership chosen by salted-hash order (stable
    under reruns, uncorrelated with doc_id order).

    The hash-threshold splits above guarantee proportions only in
    expectation (binomial jitter ~sqrt(n) per stratum); eval protocols
    that require exact counts need rank-based assignment, and rank
    within a corpus-sized stratum is exactly what
    operators/ranks.grouped_row_index does without a single-reducer
    window. Output: per (split, lang) count + id checksum, so one doc
    switching cohorts flips a checksum."""
    from ..operators.ranks import grouped_row_index

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", hash_unit(F.col("doc_id"), "xsplit").alias("u")
    )
    idx = grouped_row_index(d, "lang", ["u", "doc_id"], out="rn")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    q = F.expr(f"CAST(n DIV {EXACT_SPLIT_DEN} AS LONG)")
    split = (
        F.when(F.col("rn") < q, "test")
        .when(F.col("rn") < 2 * q, "holdout")
        .otherwise("train")
    )
    return (
        idx.join(F.broadcast(cnt), "lang")
        .select("lang", "doc_id", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
    )


_U_XSPLIT = hash_unit_sql("doc_id", "xsplit")

ORACLE_EXACT_SPLIT = f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {_U_XSPLIT}, doc_id) - 1 AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT CASE WHEN rn < n // {EXACT_SPLIT_DEN} THEN 'test'
            WHEN rn < 2 * (n // {EXACT_SPLIT_DEN}) THEN 'holdout'
            ELSE 'train' END AS split,
       lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM r
GROUP BY 1, 2
"""


QUERIES = {
    "exact_stratified_split": exact_stratified_split,
    "split_cohort_counts": split_cohort_counts,
    "stratified_lang_sample": stratified_lang_sample,
    "source_topk_sample": source_topk_sample,
    "negative_pair_sample": negative_pair_sample,
    "shuffle_shard_manifest": shuffle_shard_manifest,
    "quality_weighted_sample": quality_weighted_sample,
    "weighted_reservoir_sample": weighted_reservoir_sample,
}

ORACLE = {
    "exact_stratified_split": ORACLE_EXACT_SPLIT,
    "split_cohort_counts": ORACLE_SPLIT,
    "stratified_lang_sample": ORACLE_STRATIFIED,
    "source_topk_sample": ORACLE_TOPK,
    "negative_pair_sample": ORACLE_NEG_PAIRS,
    "shuffle_shard_manifest": ORACLE_SHUFFLE,
    "quality_weighted_sample": ORACLE_QW_SAMPLE,
    "weighted_reservoir_sample": ORACLE_AES,
}
