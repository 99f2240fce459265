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
    Returns the final centroids. Each Lloyd iteration is one job: assign
    (narrow) -> groupBy(list, pos) mean (one shuffle) -> collect n_lists
    tiny rows to the driver."""
    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v")).persist()
    try:
        seeds = (
            vecs.orderBy(hash_unit(F.col(id_col), "ivf-seed"), F.col(id_col))
            .limit(n_lists)
            .collect()
        )
        centroids = [list(r["__v"]) for r in seeds]
        n_lists = len(centroids)  # corpus smaller than requested lists
        if not centroids:
            raise ValueError("cannot build an IVF index over an empty corpus")
        # Mean via exact scaled-integer sums (1e-6 quantized values), not
        # F.avg: double summation order varies with partitioning, and
        # ulp-level centroid drift flips boundary vectors between lists —
        # breaking the promised build reproducibility.
        q = F.floor(F.col("val") * 1000000 + F.lit(0.5)).cast("long")
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
    qcol = F.array(*[F.lit(float(v)) for v in query])
    emb = F.col(vec_col).cast("array<double>")
    cos = _dot(emb, qcol) / (F.sqrt(_dot(emb, emb)) * F.lit(qn))
    return (
        vecs.withColumn("cosine", cos)
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
