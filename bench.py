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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("op_etl_spark-bench")
    queries = suite.all_queries()

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
    timings: dict[str, float] = {}
    build_sec: dict[str, float] = {}
    build_phases: dict[str, dict[str, dict[str, float]]] = {}
    for _ in range(2):
        for name in HEADLINE:
            if name in errors:
                continue
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

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if build_sec:
        out["build_sec"] = build_sec
        out["search_sec"] = {
            n: round(timings[n] - b, 3) for n, b in build_sec.items()
        }
        out["build_phases"] = build_phases
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
