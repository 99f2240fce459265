"""SemDeDup keep/remove decisions vs an independent pure-Python mirror.

The oracle gate proves Spark == DuckDB on the driver testdata; this test
proves the SEMANTICS on a synthetic corpus by reimplementing the whole
operator (tick-mean centroids, nearest-centroid argmax with lowest-label
tie-break, pairwise keep-priority rule) in plain Python loops — no Spark,
no SQL, no shared code path. Vector components are multiples of 1/256 so
the float32 parquet round-trip is exact and the mirror's doubles match
Spark's bit-for-bit.
"""

from __future__ import annotations

import random

import pytest

from op_etl_spark.suite.similarity import SEMDEDUP_TAU, semantic_dedup

DIM = 8
N_VECS = 60
N_LABELS = 3


def _mk_vectors():
    rng = random.Random(20260816)
    rows = []
    for vid in range(N_VECS):
        vec = [rng.randint(-256, 256) / 256.0 for _ in range(DIM)]
        if all(v == 0.0 for v in vec):
            vec[0] = 1 / 256.0
        rows.append((vid, vec, vid % N_LABELS))
    # planted near-identical pair in the same label: one must be removed
    base = [x / 256.0 for x in (200, -40, 8, 96, -128, 16, 240, -56)]
    near = list(base)
    near[1] = -41 / 256.0
    rows.append((1000, base, 0))
    rows.append((1001, near, 0))
    return rows


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y  # sequential left fold = F.aggregate's order
    return acc


def _cos(a, b):
    return _dot(a, b) / (_dot(a, a) ** 0.5 * _dot(b, b) ** 0.5)


def _mirror(rows):
    """The operator, re-derived from the paper in plain Python."""
    from collections import defaultdict
    import math

    by_label = defaultdict(list)
    for _, vec, label in rows:
        by_label[label].append(vec)
    centroids = {}
    for label, vecs in by_label.items():
        n = len(vecs)
        centroids[label] = [
            sum(int(math.floor(v[d] * 1000000 + 0.5)) for v in vecs) / 1000000.0 / n
            for d in range(DIM)
        ]
    labels_sorted = sorted(centroids)
    assigned = {}
    for vid, vec, _ in rows:
        best = None
        for label in labels_sorted:  # first max wins = lowest label on ties
            c = _cos(vec, centroids[label])
            if best is None or c > best[1]:
                best = (label, c)
        assigned[vid] = (best[0], best[1], vec)
    removed = set()
    vids = sorted(assigned)
    for i, a in enumerate(vids):
        ca, sa, va = assigned[a]
        for b in vids[i + 1 :]:
            cb, sb, vb = assigned[b]
            if ca != cb or _cos(va, vb) < SEMDEDUP_TAU:
                continue
            # lower (cosc, vec_id) survives; the other is removed
            loser = b if (sa, a) < (sb, b) else a
            removed.add(loser)
    return assigned, removed


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    rows = _mk_vectors()
    df = spark.createDataFrame(
        [(vid, [float(x) for x in vec], label) for vid, vec, label in rows],
        "vec_id bigint, embedding array<float>, label bigint",
    )
    out = str(tmp_path_factory.mktemp("semdedup"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out, rows


def test_matches_python_mirror(spark, corpus):
    out, rows = corpus
    got = {r.vec_id: r for r in semantic_dedup(spark, out).collect()}
    assigned, removed = _mirror(rows)
    assert set(got) == set(assigned)
    for vid, (cluster, cosc, _) in assigned.items():
        assert got[vid].cluster == cluster, f"vec {vid} cluster"
        assert abs(got[vid].cosc - cosc) < 1e-4, f"vec {vid} cosc"
        assert got[vid].removed == (1 if vid in removed else 0), f"vec {vid} removed"


def test_planted_duplicate_pruned_keeps_edge_point(spark, corpus):
    out, rows = corpus
    got = {r.vec_id: r for r in semantic_dedup(spark, out).collect()}
    a, b = got[1000], got[1001]
    assert a.cluster == b.cluster  # near-identical vectors co-cluster
    assert a.removed + b.removed >= 1  # at least one of the twins pruned
    # priority from the UNROUNDED mirror (output cosc is 4-dp rounded and
    # could collide). The guaranteed pair property is one-sided: the twin
    # CLOSER to the centroid is removed by its lower-priority partner;
    # the partner itself may legitimately fall to a third neighbor, so
    # its survival is covered by the full-mirror test, not asserted here.
    assigned, _ = _mirror(rows)
    higher = max((1000, 1001), key=lambda v: (assigned[v][1], v))
    assert got[higher].removed == 1


def test_semantic_decontaminate_matches_mirror(spark, corpus):
    from op_etl_spark.suite.contamination import (
        SEM_DECON_EVAL_CAP,
        SEM_DECON_MOD,
        SEM_DECON_TAU,
        semantic_decontaminate,
    )

    def _is_eval(vid):
        return vid % SEM_DECON_MOD == 0 and vid < SEM_DECON_EVAL_CAP

    out, rows = corpus
    got = {r.vec_id: r for r in semantic_decontaminate(spark, out).collect()}
    evals = sorted((vid, vec) for vid, vec, _ in rows if _is_eval(vid))
    assert evals, "fixture must contain eval probes"
    expected_ids = {vid for vid, _, _ in rows if not _is_eval(vid)}
    assert set(got) == expected_ids  # eval probes excluded from the output
    for vid, vec, _ in rows:
        if _is_eval(vid):
            continue
        best = None
        for eid, ev in evals:  # ascending eid + strict > = first max
            c = _cos(vec, ev)
            if best is None or c > best[1]:
                best = (eid, c)
        assert got[vid].eval_id == best[0], f"vec {vid} nearest eval"
        assert abs(got[vid].eval_cos - best[1]) < 1e-4, f"vec {vid} cos"
        assert got[vid].contaminated == (1 if best[1] >= SEM_DECON_TAU else 0)


def test_semantic_decontaminate_empty_eval_set_yields_zero_rows(spark, tmp_path_factory):
    """With no eval probes the oracle's cross join returns zero rows; the
    Spark side must match (not one sentinel row per corpus vector)."""
    from op_etl_spark.suite.contamination import semantic_decontaminate

    rng = random.Random(7)
    rows = [
        (vid, [rng.randint(-256, 256) / 256.0 for _ in range(DIM)], 0)
        for vid in range(1, 31)  # no vec_id % 50 == 0 -> empty eval set
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label bigint"
    )
    out = str(tmp_path_factory.mktemp("semdecon_empty"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    assert semantic_decontaminate(spark, out).collect() == []


def test_every_cluster_keeps_its_lowest_priority_vector(spark, corpus):
    out, rows = corpus
    got = {r.vec_id: r for r in semantic_dedup(spark, out).collect()}
    # anchors from the UNROUNDED mirror priorities, not the rounded output
    assigned, _ = _mirror(rows)
    by_cluster = {}
    for vid, (cluster, cosc, _) in assigned.items():
        by_cluster.setdefault(cluster, []).append((cosc, vid))
    for cluster, members in by_cluster.items():
        anchor = min(members)[1]
        assert got[anchor].removed == 0, f"cluster {cluster} pruned its anchor"
