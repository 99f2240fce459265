"""Persisted IVF index for approximate nearest-neighbor search.

The scale path for ANN over an embedding column: cluster once, store the
corpus partitioned by cluster id, and answer each query by reading ONLY
the `nprobe` most promising partitions — at 100 TB a probe touches
nprobe/n_lists of the data and the partition filter never even lists the
other directories (Spark's FileIndex prunes on the `list_id` partition
column before any file IO).

Everything is DataFrame-native:
 - k-means (Lloyd) iterations broadcast the tiny centroid set as a
   literal array-of-arrays column; assignment is argmin over a
   `transform`-computed distance array (no UDF, no cross join);
 - the update step is the posexplode/groupBy(list, pos) mean — one
   shuffle per iteration, map-side combined;
 - the index layout is plain partitioned parquet + a centroids table, so
   every other operator (compaction, sampling, dedup) composes with it.

Seeding is deterministic (first n_lists vectors in id-hash order), so
builds are reproducible — the same property the sampling module
guarantees, for the same operational reasons.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import hash_unit

VECTORS_DIR = "vectors"
CENTROIDS_DIR = "centroids"


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _centroid_literal(centroids: list[list[float]]):
    return F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in centroids])


def _assign(df: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """argmin_l ||v - c_l||² as a narrow projection: a distance array via
    transform over the broadcast centroid literal, then array_position of
    its min. Ties resolve to the lowest list id (array_position finds the
    first occurrence)."""
    cents = _centroid_literal(centroids)
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, v: s + v,
        ),
    )
    return df.withColumn(
        "list_id", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def _lloyd(vecs: DataFrame, centroids: list[list[float]], iters: int) -> list[list[float]]:
    """Lloyd iterations over `vecs` (must carry `__v`): assign (narrow) ->
    quantized per-(list, pos) mean (one shuffle) -> collect n_lists tiny
    rows to the driver. Mean via exact scaled-integer sums (1e-6 quantized
    values), not F.avg: double summation order varies with partitioning,
    and ulp-level centroid drift flips boundary vectors between lists —
    breaking the promised build reproducibility."""
    q = F.floor(F.col("val") * 1000000 + F.lit(0.5)).cast("long")
    n_lists = len(centroids)
    for _ in range(iters):
        assigned = _assign(vecs, centroids, "__v")
        rows = (
            assigned.select("list_id", F.posexplode("__v").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg((F.sum(q) / F.lit(1000000.0) / F.count(F.lit(1))).alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pairs"))
            .select("list_id", F.transform("pairs", lambda s: s["m"]).alias("c"))
            .collect()
        )
        updated = {r.list_id: list(r.c) for r in rows}
        centroids = [updated.get(i, centroids[i]) for i in range(n_lists)]
    return centroids


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_lists: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Cluster `df` and persist the index at `path`.

    Layout: {path}/vectors/list_id=K/*.parquet (the corpus, partitioned by
    assigned list) and {path}/centroids/*.parquet (list_id, centroid).
    Returns the final centroids."""
    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v")).persist()
    try:
        seeds = (
            vecs.orderBy(hash_unit(F.col(id_col), "ivf-seed"), F.col(id_col))
            .limit(n_lists)
            .collect()
        )
        centroids = [list(r["__v"]) for r in seeds]
        if not centroids:
            raise ValueError("cannot build an IVF index over an empty corpus")
        centroids = _lloyd(vecs, centroids, iters)

        final = _assign(
            df.withColumn("__v", F.col(vec_col).cast("array<double>")), centroids, "__v"
        )
        (
            final.drop("__v")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(f"{path}/{VECTORS_DIR}")
        )
    finally:
        vecs.unpersist()
    spark = df.sparkSession
    cent_structs = [
        F.struct(
            F.lit(i).alias("list_id"),
            F.array(*[F.lit(float(v)) for v in c]).alias("centroid"),
        )
        for i, c in enumerate(centroids)
    ]
    (
        spark.range(1)
        .select(F.explode(F.array(*cent_structs)).alias("s"))
        .select("s.list_id", "s.centroid")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{CENTROIDS_DIR}")
    )
    return centroids


def _cosine_to_query(query: list[float], qn: float, vec_col: str):
    """Cosine to a literal query vector, zero-norm-safe: a zero corpus
    vector (padding/defective row) or zero query scores -1.0 instead of
    raising DIVIDE_BY_ZERO under ANSI mode."""
    qcol = F.array(*[F.lit(float(v)) for v in query])
    emb = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(_dot(emb, emb))
    if qn <= 0:
        return F.lit(-1.0)
    return F.when(nrm > 0, _dot(emb, qcol) / (nrm * F.lit(qn))).otherwise(F.lit(-1.0))


def load_centroids(spark: SparkSession, path: str) -> list[list[float]]:
    rows = spark.read.parquet(f"{path}/{CENTROIDS_DIR}").orderBy("list_id").collect()
    return [list(r.centroid) for r in rows]


def ivf_search(
    spark: SparkSession,
    path: str,
    query: list[float],
    nprobe: int = 4,
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine among the `nprobe` lists whose centroids are
    closest to the query. Centroid ranking is driver-side (n_lists is
    tiny); the corpus scan carries `list_id IN (...)` — a partition
    filter, so unprobed lists are never listed or read. The final top-k
    is an ordered limit (TakeOrderedAndProject, no global sort)."""
    centroids = load_centroids(spark, path)
    qn = math.sqrt(sum(v * v for v in query))

    def cos_to_query(c: list[float]) -> float:
        cn = math.sqrt(sum(v * v for v in c))
        d = sum(x * y for x, y in zip(query, c))
        return d / (qn * cn) if qn and cn else -1.0

    probe_ids = sorted(
        range(len(centroids)), key=lambda i: (-cos_to_query(centroids[i]), i)
    )[:nprobe]

    vecs = spark.read.parquet(f"{path}/{VECTORS_DIR}").filter(
        F.col("list_id").isin(probe_ids)
    )
    return (
        vecs.withColumn("cosine", _cosine_to_query(query, qn, vec_col))
        .select(id_col, "list_id", "cosine")
        .orderBy(F.desc("cosine"), id_col)
        .limit(topk)
    )


def ivf_append_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    vec_col: str = "embedding",
) -> list[int]:
    """Incrementally add a batch of vectors to a persisted index WITHOUT
    rebuilding: assign each vector to its nearest existing centroid (the
    codebook is frozen — standard IVF maintenance; re-train only when
    drift warrants a rebuild) and append parquet files into exactly the
    touched list partitions. Work is proportional to the batch, never
    the index: assignment is a narrow projection against the broadcast
    centroid literal, and `partitionBy(list_id)` append writes only
    directories the batch touches — untouched lists keep their files
    byte-identical, so searches probing them see no churn. Returns the
    touched list ids (a bounded |n_lists| collect, for cache
    invalidation / compaction scheduling downstream)."""
    centroids = load_centroids(spark, path)
    # persist: the assignment plan feeds BOTH the touched-list collect and
    # the write; without it a non-deterministic batch source could be
    # re-executed differently for each, making the returned touched list
    # disagree with the partitions actually written
    assigned = _assign(
        batch.withColumn("__v", F.col(vec_col).cast("array<double>")),
        centroids,
        "__v",
    ).persist()
    try:
        touched = [
            r.list_id
            for r in assigned.select("list_id").distinct().orderBy("list_id").collect()
        ]
        (
            assigned.drop("__v")
            .write.mode("append")
            .partitionBy("list_id")
            .parquet(f"{path}/{VECTORS_DIR}")
        )
    finally:
        assigned.unpersist()
    return touched


# --- two-level IVF (coarse -> fine), the very-large-codebook scale path ---
#
# The flat index's assignment cost is O(n x n_lists) distance evaluations.
# That is fine while the codebook is small, but at 100 TB the list count
# must scale with the corpus (to keep list sizes bounded, n_lists ~ n /
# target_list_size), which turns flat assignment quadratic in corpus
# size. The standard fix (FAISS's IVF with a two-level / multi-index
# quantizer) is a hierarchical codebook: n_coarse cells, each with its own
# n_fine sub-codebook. Assignment is O(n x (n_coarse + n_fine)) — for the
# same total list count L = n_coarse * n_fine, that is O(n * 2 * sqrt(L))
# instead of O(n * L). Search prunes on BOTH partition columns
# (coarse_id, fine_id), so a probe reads p_coarse*p_fine/L of the data.

CENTROIDS_COARSE_DIR = "centroids_coarse"
CENTROIDS_FINE_DIR = "centroids_fine"


def _assign_fine(df: DataFrame, fine: dict[int, list[list[float]]], vec_col: str) -> DataFrame:
    """argmin over the row's OWN cell's sub-codebook: a coarse_id-dispatched
    when-chain of centroid-literal argmins — narrow, no shuffle, and each
    row evaluates only its matching branch (n_fine distances, not
    n_coarse*n_fine). With very large n_coarse you would switch this
    literal dispatch to a broadcast join on coarse_id; the cost contract
    (n_fine distances per row) is the same."""
    expr = None
    for c, cl in sorted(fine.items()):
        cents = _centroid_literal(cl)
        dists = F.transform(
            cents,
            lambda cc: F.aggregate(
                F.zip_with(F.col(vec_col), cc, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda s, v: s + v,
            ),
        )
        am = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        cond = F.col("coarse_id") == c
        expr = F.when(cond, am) if expr is None else expr.when(cond, am)
    return df.withColumn("fine_id", expr)


def build_ivf2_index(
    df: DataFrame,
    path: str,
    n_coarse: int = 8,
    n_fine: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict[int, list[list[float]]]:
    """Two-level IVF build. Layout:
    {path}/vectors/coarse_id=C/fine_id=F/*.parquet plus two centroid
    tables. Coarse codebook = the same deterministic Lloyd as the flat
    build; fine codebooks are trained for ALL cells at once (seeds via a
    per-cell row_number window, update via one quantized
    (coarse, fine, pos) mean shuffle per iteration — never one job per
    cell). Returns {coarse_id: fine_centroids}."""
    from pyspark.sql import Window as W

    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v")).persist()
    try:
        seeds = (
            vecs.orderBy(hash_unit(F.col(id_col), "ivf-seed"), F.col(id_col))
            .limit(n_coarse)
            .collect()
        )
        coarse = [list(r["__v"]) for r in seeds]
        if not coarse:
            raise ValueError("cannot build an IVF index over an empty corpus")
        coarse = _lloyd(vecs, coarse, iters)

        cvecs = _assign(vecs, coarse, "__v").withColumnRenamed("list_id", "coarse_id")
        w = W.partitionBy("coarse_id").orderBy(
            hash_unit(F.col(id_col), "ivf2-fine-seed"), F.col(id_col)
        )
        seed_rows = (
            cvecs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n_fine)
            .select("coarse_id", (F.col("rn") - 1).alias("fine_id"), "__v")
            .collect()
        )
        fine: dict[int, list[list[float]]] = {}
        for r in sorted(seed_rows, key=lambda r: (r.coarse_id, r.fine_id)):
            fine.setdefault(r.coarse_id, []).append(list(r["__v"]))
        # a coarse cell empty at build time still needs a sub-codebook:
        # a later frozen-codebook APPEND can assign vectors to it (its
        # centroid survives Lloyd unchanged), and without a fine branch
        # those rows would get a NULL fine_id and land in a default
        # partition. Seed empty cells with their coarse centroid.
        for c in range(len(coarse)):
            fine.setdefault(c, [list(coarse[c])])

        q = F.floor(F.col("val") * 1000000 + F.lit(0.5)).cast("long")
        for _ in range(iters):
            assigned = _assign_fine(cvecs, fine, "__v")
            rows = (
                assigned.select(
                    "coarse_id", "fine_id", F.posexplode("__v").alias("pos", "val")
                )
                .groupBy("coarse_id", "fine_id", "pos")
                .agg((F.sum(q) / F.lit(1000000.0) / F.count(F.lit(1))).alias("m"))
                .groupBy("coarse_id", "fine_id")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pairs"))
                .select(
                    "coarse_id",
                    "fine_id",
                    F.transform("pairs", lambda s: s["m"]).alias("c"),
                )
                .collect()
            )
            updated = {(r.coarse_id, r.fine_id): list(r.c) for r in rows}
            fine = {
                c: [updated.get((c, f), cl[f]) for f in range(len(cl))]
                for c, cl in fine.items()
            }

        final = _assign_fine(
            _assign(
                df.withColumn("__v", F.col(vec_col).cast("array<double>")),
                coarse,
                "__v",
            ).withColumnRenamed("list_id", "coarse_id"),
            fine,
            "__v",
        )
        (
            final.drop("__v")
            .write.mode("overwrite")
            .partitionBy("coarse_id", "fine_id")
            .parquet(f"{path}/{VECTORS_DIR}")
        )
    finally:
        vecs.unpersist()
    spark = df.sparkSession
    c_structs = [
        F.struct(F.lit(i).alias("coarse_id"),
                 F.array(*[F.lit(float(v)) for v in c]).alias("centroid"))
        for i, c in enumerate(coarse)
    ]
    (
        spark.range(1)
        .select(F.explode(F.array(*c_structs)).alias("s"))
        .select("s.coarse_id", "s.centroid")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{CENTROIDS_COARSE_DIR}")
    )
    f_structs = [
        F.struct(F.lit(c).alias("coarse_id"), F.lit(f).alias("fine_id"),
                 F.array(*[F.lit(float(v)) for v in cl[f]]).alias("centroid"))
        for c, cl in sorted(fine.items())
        for f in range(len(cl))
    ]
    (
        spark.range(1)
        .select(F.explode(F.array(*f_structs)).alias("s"))
        .select("s.coarse_id", "s.fine_id", "s.centroid")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{CENTROIDS_FINE_DIR}")
    )
    return fine


def _load_ivf2_codebooks(spark: SparkSession, path: str):
    coarse = [
        list(r.centroid)
        for r in spark.read.parquet(f"{path}/{CENTROIDS_COARSE_DIR}")
        .orderBy("coarse_id")
        .collect()
    ]
    fine: dict[int, list[list[float]]] = {}
    for r in (
        spark.read.parquet(f"{path}/{CENTROIDS_FINE_DIR}")
        .orderBy("coarse_id", "fine_id")
        .collect()
    ):
        fine.setdefault(r.coarse_id, []).append(list(r.centroid))
    return coarse, fine


def ivf2_search(
    spark: SparkSession,
    path: str,
    query: list[float],
    p_coarse: int = 2,
    p_fine: int = 4,
    topk: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine among the p_coarse nearest coarse cells' p_fine
    nearest sub-lists. Both codebook rankings are driver-side (bounded);
    the corpus scan carries literal coarse_id/fine_id predicates — both
    partition columns, so unprobed directories are never listed."""
    coarse, fine = _load_ivf2_codebooks(spark, path)
    qn = math.sqrt(sum(v * v for v in query))

    def cos_to(c: list[float]) -> float:
        cn = math.sqrt(sum(v * v for v in c))
        d = sum(x * y for x, y in zip(query, c))
        return d / (qn * cn) if qn and cn else -1.0

    cids = sorted(range(len(coarse)), key=lambda i: (-cos_to(coarse[i]), i))[:p_coarse]
    pred = None
    for c in cids:
        fl = fine.get(c, [])
        fids = sorted(range(len(fl)), key=lambda f: (-cos_to(fl[f]), f))[:p_fine]
        leg = (F.col("coarse_id") == c) & F.col("fine_id").isin(fids)
        pred = leg if pred is None else pred | leg

    vecs = spark.read.parquet(f"{path}/{VECTORS_DIR}").filter(pred)
    return (
        vecs.withColumn("cosine", _cosine_to_query(query, qn, vec_col))
        .select(id_col, "coarse_id", "fine_id", "cosine")
        .orderBy(F.desc("cosine"), id_col)
        .limit(topk)
    )


def ivf2_append_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    vec_col: str = "embedding",
) -> list[tuple[int, int]]:
    """Frozen-codebook append for the two-level index: assign coarse then
    fine, append parquet into exactly the touched (coarse, fine)
    partitions. Same contract as ivf_append_batch."""
    coarse, fine = _load_ivf2_codebooks(spark, path)
    assigned = _assign_fine(
        _assign(
            batch.withColumn("__v", F.col(vec_col).cast("array<double>")),
            coarse,
            "__v",
        ).withColumnRenamed("list_id", "coarse_id"),
        fine,
        "__v",
    ).persist()
    try:
        touched = [
            (r.coarse_id, r.fine_id)
            for r in assigned.select("coarse_id", "fine_id")
            .distinct()
            .orderBy("coarse_id", "fine_id")
            .collect()
        ]
        (
            assigned.drop("__v")
            .write.mode("append")
            .partitionBy("coarse_id", "fine_id")
            .parquet(f"{path}/{VECTORS_DIR}")
        )
    finally:
        assigned.unpersist()
    return touched
