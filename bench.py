"""Benchmark harness: runs the headline query surface at sf0.1 (or
$SPARK_GRAFT_SF_DIR) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Execution is forced through the `noop` sink — full pipeline runs (scan,
shuffle, agg) with zero driver-side collection, so timings measure the
engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from op_etl_spark.session import get_spark  # noqa: E402
from op_etl_spark import suite  # noqa: E402
from op_etl_spark.operators import phases  # noqa: E402

# Headline set: spans full-scan agg, multi-joins, windows, sessionization,
# text analysis, dedup (exact + MinHash-LSH + SimHash), similarity search,
# sampling/splits, sequence packing, profiling, and the z-order curve.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "split_cohort_counts",
    "packed_sequence_stats",
    "documents_profile",
    "zorder_cell_histogram",
    "w_top3_orders_per_customer",
    "dedup_keep_newest_event",
    "metrics_rollup",
    "sessionize_events",
    "tumbling_hourly_events",
    "token_counts",
    "quality_filter",
    "doc_fingerprints",
    "exact_dedup_groups",
    # flagship dedup path: LSH/capped candidates + exact verify — the
    # corpus-quadratic exact ngram_jaccard_pairs stays OUT of the
    # headline (it's the small-sf oracle baseline only)
    "jaccard_verified_pairs",
    "incremental_lsh_dedup",
    "ngram_jaccard_pairs_capped",
    "exact_substring_pairs",
    "minhash_lsh_candidates",
    "simhash64_near_pairs",
    "ann_bruteforce_topk",
    "embedding_neardup_pairs",
    "geometry_type_election",
    "magnitude_validation",
    "asof_join_events",
    "range_join_price_bands",
    "q10_returned_customers",
    "media_byte_entropy",
    "grouping_sets_status_priority",
    "moving_avg_7d_revenue",
    "salted_event_type_totals",
    "calendar_fill_gaps",
    "incremental_rollup_merge",
    "doc_chunks",
    "label_centroids",
    "unpivot_lineitem_measures",
    "order_price_histogram",
    "equidepth_price_histogram",
    "scd2_user_value_history",
    "funnel_click_purchase",
    "click_attribution",
    "multitouch_attribution",
    # training-data hygiene: broadcast eval-ngram decontamination,
    # temperature-flattened source mixing, and the full hygiene funnel
    # (split -> quality -> exact dedup -> near-dup -> decontam -> mix)
    "decontaminate_overlap",
    "temperature_mix_sample",
    "training_corpus_funnel",
    # scale-pattern ops: MG-candidate exact heavy hitters (no
    # full-cardinality shuffle), array-zip bigram LM table, heap-merge
    # global top-k, terasort-style deterministic corpus shuffle
    "heavy_hitter_users",
    "bigram_next_token",
    "global_topk_docs",
    "shuffle_shard_manifest",
    # monitoring: one-scan-per-table constraint report, single-scan
    # two-feature drift buckets
    "dq_constraint_report",
    "drift_bucket_report",
    # spatial near-join: grid-bucketed distance pairs, no cross product
    "grid_distance_pairs",
    # embedding feature store: narrow int8 quantization, tick-sum dim stats
    "embedding_int8_quantize",
    "embedding_dim_stats",
    # staleness-bounded as-of; quality-proportional importance sampling
    "asof_tolerance_join",
    "quality_weighted_sample",
    # ANN recall gate (seed -> Lloyd -> prune -> top-k -> recall, measured
    # end to end) and pointer-doubling connected components
    "ivf_recall_at_k",
    "dedup_cc_assign",
    # real multimodal kernels (raster resize, PCM DSP, frame delta) and
    # the corpus-trained bigram-surprisal quality filter
    "raw_resize_checksum",
    "pcm_frame_report",
    "frame_delta_report",
    "bigram_surprisal_scores",
    # mergeable sketches: bottom-k/HLL distinct, count-min point
    # estimates, Bloom join pruning — constant-size summaries in place of
    # corpus-scale shuffles
    "kmv_distinct_users",
    "hll_distinct_users",
    "cms_user_event_counts",
    "bloom_prune_orders",
    "hll_merge_days",
    # exact-k weighted sampling (A-ES) and the near-dup graph's triangle
    # census (degree-oriented O(m^1.5) count + clustering coefficient)
    "weighted_reservoir_sample",
    "neardup_triangle_stats",
    # exact Jaccard join with guaranteed recall via rare-first prefix
    # filtering (PPJoin-style) — the lossless counterpart to LSH/caps
    "prefix_filter_jaccard_pairs",
    # directed set-containment (quoted/subsumed docs) and JL sign projection
    # with measured distortion
    "containment_pairs",
    "weighted_jaccard_pairs",
    "jl_projection_distortion",
    # round 6: robust per-group stats via grouped order statistics, k-core
    # density peeling, PQ / IVF-PQ compressed-domain search (each call
    # rebuilds its index — the timed number owns the full train+encode+
    # search pipeline), the mergeable quantile gate, event Markov chain,
    # exact splits, PMI collocations, volume anomalies, exact decayed
    # scores, quantile normalization
    "mad_outlier_report",
    "winsorized_event_means",
    "kcore_members",
    "pq_recall_at_k",
    "event_transition_matrix",
    "exact_stratified_split",
    "sample_quantile_gate",
    "pmi_collocations",
    "event_volume_anomalies",
    "ivfpq_recall_at_k",
    "decayed_user_value",
    "quantile_normalized_lengths",
    "source_diversity_report",
    "kcore_profile",
    # production-path index numbers: the pq/ivf/ivfpq gates above
    # deliberately pay a full rebuild per call (the policy that keeps
    # build scaling measured); these two time ONLY the search / delta
    # path against an index built ONCE per bench process outside every
    # timed window — the steady-state cost a deployed caller pays.
    "ivf_search_persisted",
    "dedup_delta_persisted",
    # round 9: SemDeDup cluster-then-prune keep/remove decisions (narrow
    # literal-centroid assignment + cluster-keyed pair join) and
    # embedding-space eval decontamination (1-row broadcast eval array,
    # row-local argmax fold — zero corpus shuffles)
    "semantic_dedup",
    "semantic_decontaminate",
    # round 11: the two-level (k > SEMDEDUP_FLAT_K_MAX) assignment gate —
    # the k~N scale path's cost is now a first-class recorded number, not
    # probe-only (VERDICT r10 'What's missing' #1)
    "semantic_assign_two_level",
    # round 10: the capstone's fused plan gets its own number (its twin
    # training_corpus_funnel was already a headline entry; the r9 gap
    # was that the composition whose cost motivated the persisted
    # assignment table had no recorded performance number), plus the
    # incrementally-maintained k-truss peel so the r10 rewrite's win is
    # visible round-over-round the way kcore_profile's r9 win was
    "embedding_curation_funnel",
    "ktruss_edges",
    # batch twin of the CDC upsert's latest-wins reduction (oracle-gated
    # as a declared query; the streamed version is stream_cdc_upsert)
    "cdc_latest_state",
    # streaming throughput entries (AvailableNow over the 8-file event
    # stream; see STREAMING_BENCH below) — wall seconds gated like any
    # other query, rows/sec + batch latency in the `streaming` section
    "stream_sessionize",
    "stream_dedup_exact",
    "stream_cdc_upsert",
]

# --- bench-only persisted-index entries (not driver-declared queries:
# they require a prebuilt on-disk index, which the oracle-gate variants
# of the same operators already prove correct — operators/ann_index.py
# via test_ann_index*.py, operators/dedup_index.py via
# test_dedup_index.py row-for-row against the oracle-checked
# incremental_lsh_dedup) ---

_persisted: dict[str, tuple] = {}
PERSISTED_BUILD_SEC: dict[str, float] = {}


def _ensure_persisted(spark, sf_dir: str) -> tuple:
    """Build both indexes once per (bench process, sf_dir). First call
    happens during the UNTIMED warm pass, so timed passes measure pure
    search/delta cost; the one-time build seconds are published
    separately as persisted_build_sec."""
    if sf_dir in _persisted:
        return _persisted[sf_dir]
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from op_etl_spark.operators.ann_index import build_ivf_index
    from op_etl_spark.operators.dedup_index import build_dedup_index
    from op_etl_spark.suite.dedup import INC_MOD, INC_REMAINDER, _docs

    base = tempfile.mkdtemp(prefix="bench_persisted_idx_")
    # full IVF + LSH index copies live here — without the atexit hook one
    # leaked index tree accumulates in /tmp per bench invocation
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    query = list(emb.orderBy("vec_id").limit(1).collect()[0]["embedding"])
    t0 = time.perf_counter()
    build_ivf_index(emb, f"{base}/ivf", n_lists=16, iters=3)
    PERSISTED_BUILD_SEC["ivf_search_persisted"] = round(time.perf_counter() - t0, 3)

    d = _docs(spark, sf_dir)
    is_new = F.col("doc_id") % INC_MOD == INC_REMAINDER
    t0 = time.perf_counter()
    build_dedup_index(d.filter(~is_new), f"{base}/lsh")
    PERSISTED_BUILD_SEC["dedup_delta_persisted"] = round(time.perf_counter() - t0, 3)

    _persisted[sf_dir] = (base, query, d.filter(is_new))
    return _persisted[sf_dir]


def _ivf_search_persisted(spark, sf_dir: str):
    from op_etl_spark.operators.ann_index import ivf_search

    base, query, _ = _ensure_persisted(spark, sf_dir)
    return ivf_search(spark, f"{base}/ivf", query, nprobe=4, topk=10)


def _dedup_delta_persisted(spark, sf_dir: str):
    from op_etl_spark.operators.dedup_index import dedup_delta

    base, _, delta = _ensure_persisted(spark, sf_dir)
    return dedup_delta(spark, f"{base}/lsh", delta)


EXTRA_QUERIES = {
    "ivf_search_persisted": _ivf_search_persisted,
    "dedup_delta_persisted": _dedup_delta_persisted,
}

# --- streaming micro-bench (round 9): every streaming operator was
# correctness-gated but none had a performance number. These three run
# the REAL streaming entry points (applyInPandasWithState sessionizer,
# dropDuplicatesWithinWatermark, foreachBatch CDC merge) over the sf
# events as an 8-file AvailableNow stream (maxFilesPerTrigger=1 -> 8
# micro-batches), timing end-to-end wall seconds into `queries` (so the
# bench_diff gate covers them) and publishing rows/sec + per-batch
# latency in the `streaming` section. Batch-mode twins of all three are
# oracle-checked by the driver; these entries exist for throughput
# evidence, not correctness. ---

_stream_src: dict[str, str] = {}


def _ensure_stream_source(spark, sf_dir: str) -> str:
    """Once per (process, sf_dir): rewrite events as 8 parquet files with
    micros timestamps (the NANOS logical type needs read_events' session
    handling, which a fresh readStream schema does not inherit)."""
    if sf_dir in _stream_src:
        return _stream_src[sf_dir]
    import atexit
    import shutil
    import tempfile

    from op_etl_spark.session import read_events

    from pyspark.sql import functions as F

    base = tempfile.mkdtemp(prefix="bench_stream_src_")
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src = f"{base}/events8"
    # ts comes back TIMESTAMP_NTZ; watermarks require TIMESTAMP
    read_events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).repartition(8).write.mode("overwrite").parquet(src)
    _stream_src[sf_dir] = src
    return src


def _read_event_stream(spark, sf_dir: str):
    src = _ensure_stream_source(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _drain(query) -> dict:
    """Run an AvailableNow query to completion; return throughput stats
    from its progress log (no extra work — the numbers piggyback on the
    StreamingQueryProgress the engine emits anyway)."""
    t0 = time.perf_counter()
    query.awaitTermination()
    wall = time.perf_counter() - t0
    prog = [p for p in query.recentProgress if p["numInputRows"] > 0]
    rows = sum(p["numInputRows"] for p in prog)
    lats = [p["durationMs"]["triggerExecution"] for p in prog]
    # addBatch is the batch's actual plan execution inside the trigger;
    # the rest of triggerExecution is streaming machinery (offset
    # resolution, WAL + offset-log commits, planning) — publishing both
    # shows how much of a bench-scale batch is fixed per-trigger cost
    # that a cluster amortizes vs real per-row work
    works = [p["durationMs"].get("addBatch", 0) for p in prog]
    query.stop()
    return {
        "sec": round(wall, 3),
        "rows": rows,
        "rows_per_sec": round(rows / wall) if wall else None,
        "n_batches": len(prog),
        "mean_batch_ms": round(sum(lats) / len(lats)) if lats else None,
        "max_batch_ms": max(lats) if lats else None,
        "mean_addbatch_ms": round(sum(works) / len(works)) if works else None,
    }


def _stream_sessionize(spark, sf_dir: str) -> dict:
    from op_etl_spark.streaming.stateful import sessionize_stream

    q = (
        sessionize_stream(_read_event_stream(spark, sf_dir))
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return _drain(q)


def _stream_dedup(spark, sf_dir: str) -> dict:
    from op_etl_spark.streaming.dedup import dedup_events_stream

    q = (
        dedup_events_stream(_read_event_stream(spark, sf_dir))
        .writeStream.format("noop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return _drain(q)


def _stream_cdc_upsert(spark, sf_dir: str) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from op_etl_spark.streaming.upsert import start_upsert_stream

    # fresh target + checkpoint per run: a CDC merge is stateful on disk,
    # and reusing them would time an incremental no-op, not the merge
    base = tempfile.mkdtemp(prefix="bench_stream_upsert_")
    try:
        updates = _read_event_stream(spark, sf_dir).select(
            "user_id", "event_id", "ts", "value"
        )
        q = start_upsert_stream(
            updates,
            f"{base}/target",
            f"{base}/ckpt",
            key_cols=["user_id"],
            seq_col="event_id",
            available_now=True,
        )
        return _drain(q)
    finally:
        shutil.rmtree(base, ignore_errors=True)


STREAMING_BENCH = {
    "stream_sessionize": _stream_sessionize,
    "stream_dedup_exact": _stream_dedup,
    "stream_cdc_upsert": _stream_cdc_upsert,
}


def headline_fingerprint() -> str:
    """Stable fingerprint of the headline list (names + order) — emitted
    next to the compact `qv` times array so a reconstruction can verify it
    is zipping against the HEADLINE that produced the artifact."""
    import hashlib

    return hashlib.sha256(",".join(HEADLINE).encode()).hexdigest()[:8]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("op_etl_spark-bench")
    queries = {**suite.all_queries(), **EXTRA_QUERIES}

    # A single broken query must never zero out the whole bench run:
    # record the error per-query, keep going, and still print the JSON line.
    errors: dict[str, str] = {}

    def run_one(name: str) -> float | None:
        try:
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return None
        except Exception as e:  # noqa: BLE001 — report, don't die
            return f"{type(e).__name__}: {str(e)[:300]}"

    # Warm-up pass (untimed): JIT/codegen compilation, parquet footers,
    # Python worker pools. The timed pass then measures steady-state
    # engine throughput — first-run JVM compilation noise swamps the
    # actual plan execution time at this data scale and varies ±40%
    # run-to-run, which would make round-over-round comparison meaningless.
    for name in HEADLINE:
        if name in STREAMING_BENCH:
            continue
        err = run_one(name)
        if err:
            errors[name] = err

    # min of two timed passes per query: the host is bursty and a single
    # pass can absorb an unrelated CPU spike; the min is the engine time.
    # Gate pipelines that rebuild an index per call (pq/ivf/ivfpq recall)
    # record their driver-blocking build seconds in operators/phases.py;
    # the build/search split from the SAME pass as each query's min total
    # is published alongside, so a search-path regression can't hide
    # under Lloyd-round build noise (and the decomposition never comes
    # from a cross-call cache — the timed number still owns the full
    # pipeline).
    # clearCache between timed runs — two mechanisms, both measured:
    # (1) CacheManager matches persisted plans by ANALYZED-PLAN EQUALITY,
    # so a repeat call of a self-persisting query (the funnel's flags
    # table, surprisal's bigram table, the dedup family's shingle
    # arrays) silently substitutes the PREVIOUS call's materialized
    # blocks — min-of-two was then timing a cache-hot re-read, not the
    # operator (training_corpus_funnel: 1.8-2.5 s hot vs ~5 s cold).
    # (2) Blocks a fresh call can't match become orphans freed only on
    # ContextCleaner's driver-GC schedule, so readings also depended on
    # HEADLINE order and GC timing (bigram_surprisal_scores drifted
    # 1.3-1.8x across rounds with zero code changes). Clearing before
    # every timed run makes each number the per-call COLD cost,
    # order-independent — the cost a cluster pays to run the query once.
    timings: dict[str, float] = {}
    build_sec: dict[str, float] = {}
    build_phases: dict[str, dict[str, dict[str, float]]] = {}
    for _ in range(2):
        for name in HEADLINE:
            if name in errors or name in STREAMING_BENCH:
                continue
            spark.catalog.clearCache()
            phases.reset()
            t0 = time.perf_counter()
            err = run_one(name)
            dt = round(time.perf_counter() - t0, 3)
            if err:
                errors[name] = err
                continue
            if name not in timings or dt < timings[name]:
                timings[name] = dt
                b = phases.total()
                if b >= 0.001:
                    build_sec[name] = round(b, 3)
                    build_phases[name] = {
                        p: {ph: round(s, 3) for ph, s in d.items()}
                        for p, d in phases.snapshot().items()
                    }
                else:
                    # the min pass recorded no build: drop any stale
                    # decomposition from a slower pass, or search_sec
                    # (total - build) would pair mismatched passes
                    build_sec.pop(name, None)
                    build_phases.pop(name, None)

    # streaming entries: min of two full drains, the FIRST doubling as
    # the warm pass (these are multi-second runs — a dedicated untimed
    # warm would add ~40 s of wall for noise the min already absorbs).
    # The CDC upsert builds fresh target/checkpoint dirs per run so every
    # timed number is a full merge, never an incremental no-op.
    streaming_stats: dict[str, dict] = {}
    for name, fn in STREAMING_BENCH.items():
        # try/except INSIDE the pass loop: a pass-2 hiccup must not
        # discard a valid pass-1 drain. Mirrors the batch loop exactly —
        # the failing pass is recorded in errors, any successful pass's
        # timing is kept
        best = None
        for _ in range(2):
            try:
                stats = fn(spark, sf_dir)
            except Exception as e:  # noqa: BLE001 — report, don't die
                errors[name] = f"{type(e).__name__}: {str(e)[:300]}"
                continue
            if best is None or stats["sec"] < best["sec"]:
                best = stats
        if best is not None:
            timings[name] = best["sec"]
            streaming_stats[name] = {k: v for k, v in best.items() if k != "sec"}

    total = round(sum(timings.values()), 3)
    # Key order is deliberate: the round driver keeps only the LAST 2000
    # characters of this line, so the bulky human-readable sections
    # (build_phases, per-name queries dict) go FIRST and a compact,
    # self-describing encoding of every per-query time goes LAST — `qv`
    # is the times in HEADLINE order (null = errored), `qh` fingerprints
    # the headline list so tools/bench_diff.py can refuse to zip an old
    # artifact against a reordered HEADLINE. ~700 chars of qv + totals
    # always survive the tail, so no round artifact loses query numbers.
    out = {
        "streaming": streaming_stats,
        "build_phases": build_phases,
        "build_sec": build_sec,
        "search_sec": {n: round(timings[n] - b, 3) for n, b in build_sec.items()},
        "queries": timings,
        "errors": errors,
        "qh": headline_fingerprint(),
        "qv": [timings.get(n) for n in HEADLINE],
        "metric": "headline_suite_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
    }
    if PERSISTED_BUILD_SEC:
        # one-time (per-process, warm-pass) index build cost behind the
        # *_persisted search-only entries — reported, never in the timings
        out = {"persisted_build_sec": dict(PERSISTED_BUILD_SEC), **out}
    if not build_sec:
        del out["build_sec"], out["search_sec"], out["build_phases"]
    if not streaming_stats:
        del out["streaming"]
    if not errors:
        del out["errors"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
