"""Physical-plan assertions — the scale contract, enforced by tests.

Correctness at sf0.01 says nothing about 100 TB behavior; these tests pin
the *plan shapes* that do: filters reaching the parquet scan, column
pruning, dimension broadcasts, as-of-join-without-a-join, and the dedup
suite's single-scan property. If a refactor regresses one of these, the
suite fails even though results stay correct.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def tree(p: str) -> str:
    """Just the operator tree (formatted explain repeats every node in a
    detail section below, which would double node counts)."""
    return p.split("\n\n", 1)[0]


def n_nodes(p: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}\s*(\(|$)", p, re.M))


@pytest.fixture(scope="module")
def plans(spark):
    return {}


class TestScanPushdown:
    def test_q1_filter_and_columns_reach_scan(self, spark):
        from op_etl_spark.suite.relational import q1_pricing_summary

        p = plan(q1_pricing_summary(spark, SF_DIR))
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
        # column pruning: projection needs 7 of 11 lineitem columns
        read = [l for l in p.splitlines() if "ReadSchema" in l][0]
        assert "l_partkey" not in read and "l_suppkey" not in read

    def test_asof_event_type_filter_pushed(self, spark):
        from op_etl_spark.suite.relational import asof_join_events

        p = plan(asof_join_events(spark, SF_DIR))
        assert "In(event_type, [click,purchase])" in p

    def test_range_join_scan_reads_one_column(self, spark):
        from op_etl_spark.suite.relational import range_join_price_bands

        p = plan(range_join_price_bands(spark, SF_DIR))
        read = [l for l in p.splitlines() if "ReadSchema" in l and "orders" not in l]
        assert any("struct<o_totalprice:double>" in l for l in read)


class TestJoinStrategies:
    def test_q5_dimensions_broadcast(self, spark):
        from op_etl_spark.suite.relational import q5_nation_revenue

        p = plan(q5_nation_revenue(spark, SF_DIR))
        assert "BroadcastHashJoin" in p

    def test_range_join_is_broadcast_nested_loop(self, spark):
        from op_etl_spark.suite.relational import range_join_price_bands

        p = plan(range_join_price_bands(spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" in p
        # the fact table must not shuffle before the join: the only
        # shuffle Exchange is the post-join aggregation's
        t = tree(p)
        shuffles = [m.start() for m in re.finditer(r"\bExchange\b", t)
                    if not t[max(0, m.start() - 9):m.start()].startswith("Broadcast")]
        assert len(shuffles) == 1
        assert t.index("BroadcastNestedLoopJoin") > shuffles[0]  # deeper in tree = later line

    def test_semi_join_manifest_is_semi_not_inner(self, spark):
        from op_etl_spark.suite.relational import semi_join_manifest

        p = plan(semi_join_manifest(spark, SF_DIR))
        assert "LeftSemi" in p

    def test_anti_join_is_anti(self, spark):
        from op_etl_spark.suite.relational import anti_join_no_orders

        p = plan(anti_join_no_orders(spark, SF_DIR))
        assert "LeftAnti" in p


class TestShuffleDiscipline:
    def test_asof_join_has_no_join_and_one_exchange(self, spark):
        from op_etl_spark.suite.relational import asof_join_events

        p = plan(asof_join_events(spark, SF_DIR))
        assert "Join" not in p  # window formulation, not a range join
        assert n_nodes(p, "Exchange") == 1

    def test_ngram_jaccard_scans_documents_once(self, spark):
        from op_etl_spark.suite.dedup import ngram_jaccard_pairs

        p = plan(ngram_jaccard_pairs(spark, SF_DIR))
        assert n_nodes(p, "Scan parquet") == 1
        assert "Join" not in p  # posting-list pair generation, no self-join

    def test_minhash_lsh_scans_documents_once(self, spark):
        from op_etl_spark.suite.dedup import minhash_lsh_candidates

        p = plan(minhash_lsh_candidates(spark, SF_DIR))
        assert n_nodes(p, "Scan parquet") == 1
        assert "Join" not in p

    def test_token_counts_is_single_narrow_scan(self, spark):
        from op_etl_spark.suite.text import token_counts

        p = plan(token_counts(spark, SF_DIR))
        assert n_nodes(p, "Scan parquet") == 1
        # fan_out's round-robin is the only permissible exchange; no
        # aggregation shuffle may appear in a per-row projection
        assert n_nodes(p, "Exchange") <= 1 and "hashpartitioning" not in p


class TestCodegen:
    def test_q1_aggregation_is_wholestage_codegen(self, spark):
        from op_etl_spark.suite.relational import q1_pricing_summary

        df = q1_pricing_summary(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        assert "WholeStageCodegen" in buf.getvalue()


class TestTpchExtraPlans:
    """Plan shapes for the second TPC-H batch (suite/tpch_extra.py)."""

    def test_q6_all_predicates_pushed_to_scan(self, spark):
        from op_etl_spark.suite.tpch_extra import q6_forecast_revenue

        p = plan(q6_forecast_revenue(spark, SF_DIR))
        for pushed in (
            "GreaterThanOrEqual(l_shipdate",
            "LessThan(l_shipdate",
            "GreaterThanOrEqual(l_discount,0.04)",
            "LessThanOrEqual(l_discount,0.06)",
            "LessThan(l_quantity,24",
        ):
            assert pushed in p, pushed
        # 4-column projection out of 11
        read = [l for l in p.splitlines() if "ReadSchema" in l][0]
        assert "l_orderkey" not in read and "l_partkey" not in read

    def test_q4_semi_join_not_inner_plus_distinct(self, spark):
        from op_etl_spark.suite.tpch_extra import q4_late_ship_orders

        p = plan(q4_late_ship_orders(spark, SF_DIR))
        assert "LeftSemi" in tree(p)
        assert n_nodes(p, "HashAggregate") <= 4  # no dedup aggregate sneaked in

    def test_q7_nation_dims_broadcast(self, spark):
        from op_etl_spark.suite.tpch_extra import q7_volume_shipping

        p = plan(q7_volume_shipping(spark, SF_DIR))
        assert n_nodes(p, "BroadcastHashJoin") >= 2
        # the disjunctive pair filter must not force a nested loop
        assert "BroadcastNestedLoopJoin" not in p

    def test_q18_inner_aggregate_broadcast_to_orders(self, spark):
        from op_etl_spark.suite.tpch_extra import q18_large_volume_customers

        p = plan(q18_large_volume_customers(spark, SF_DIR))
        assert n_nodes(p, "BroadcastHashJoin") >= 1
        assert "TakeOrderedAndProject" in tree(p)  # top-100, no global sort

    def test_q19_stays_hash_join_despite_disjunction(self, spark):
        from op_etl_spark.suite.tpch_extra import q19_disjunctive_revenue

        p = plan(q19_disjunctive_revenue(spark, SF_DIR))
        t = tree(p)
        assert "BroadcastNestedLoopJoin" not in t and "CartesianProduct" not in t

    def test_q21_single_pass_over_lineitem(self, spark):
        from op_etl_spark.suite.tpch_extra import q21_waiting_suppliers

        p = plan(q21_waiting_suppliers(spark, SF_DIR))
        # the EXISTS/NOT-EXISTS rewrite must not re-scan lineitem 3x
        assert tree(p).count("lineitem.parquet") <= 1
        assert p.count("lineitem.parquet") <= 2  # one scan node in detail

    def test_q22_anti_join_on_pruned_orders(self, spark):
        from op_etl_spark.suite.tpch_extra import q22_idle_rich_customers

        p = plan(q22_idle_rich_customers(spark, SF_DIR))
        assert "LeftAnti" in tree(p)
        read = [l for l in p.splitlines() if "ReadSchema" in l and "o_custkey" in l]
        assert any(l.count(",") == 0 for l in read)  # orders scan: one column


class TestNoBroadcastFallback:
    """At 100 TB the build sides stop fitting in broadcast; the same query
    graphs must degrade to shuffle joins, never to nested loops. Simulated
    by disabling the broadcast threshold in a scoped session conf."""

    @pytest.fixture()
    def no_broadcast(self, spark):
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        yield spark
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    def test_q12_degrades_to_sort_merge(self, no_broadcast):
        from op_etl_spark.suite.tpch_extra import q12_priority_lines

        p = plan(q12_priority_lines(no_broadcast, SF_DIR))
        assert n_nodes(p, "SortMergeJoin") >= 1
        assert "BroadcastNestedLoopJoin" not in tree(p)
        # results identical either way
        assert q12_priority_lines(no_broadcast, SF_DIR).count() > 0

    def test_q13_outer_join_degrades_cleanly(self, no_broadcast):
        from op_etl_spark.suite.tpch_extra import q13_customer_order_histogram

        p = plan(q13_customer_order_histogram(no_broadcast, SF_DIR))
        assert n_nodes(p, "SortMergeJoin") >= 1
        assert "CartesianProduct" not in tree(p)

    def test_explicit_broadcast_hints_survive(self, no_broadcast):
        # dimension lookups we explicitly hint stay broadcast even with
        # the threshold off — intent is encoded in the plan, not the conf
        from op_etl_spark.suite.tpch_extra import q18_large_volume_customers

        p = plan(q18_large_volume_customers(no_broadcast, SF_DIR))
        assert n_nodes(p, "BroadcastHashJoin") >= 1


class TestQ15SingleScan:
    def test_revenue_view_computed_once(self, spark):
        from op_etl_spark.suite.tpch_extra import q15_top_supplier

        p = plan(q15_top_supplier(spark, SF_DIR))
        # localCheckpoint formulation: the revenue subtree materializes
        # ONCE before the query plan; the returned plan reads the
        # checkpointed aggregate (ExistingRDD), never re-scans the fact,
        # and carries no global-max window (the scalar max is a literal)
        assert p.count("lineitem.parquet") == 0
        assert "ExistingRDD" in p
        assert "Window" not in p

    def test_q17_single_fact_scan(self, spark):
        from op_etl_spark.suite.tpch_extra import q17_small_quantity_revenue

        p = plan(q17_small_quantity_revenue(spark, SF_DIR))
        assert p.count("lineitem.parquet") == 1  # window avg, no join-back


class TestAdvancedBatchPlans:
    """Plan shapes for the round-2 advanced relational batch."""

    def test_moving_avg_preaggregates_before_window(self, spark):
        # the fact table must collapse to one row per day BEFORE the
        # window runs — a Window directly over the fact scan would sort
        # the whole table inside one partition
        from op_etl_spark.suite.advanced import moving_avg_7d_revenue

        p = plan(moving_avg_7d_revenue(spark, SF_DIR))
        t = tree(p)
        agg_pos = t.find("HashAggregate")
        win_pos = t.find("Window")
        assert agg_pos != -1 and win_pos != -1
        # formatted explain prints downstream operators first: the Window
        # node must appear ABOVE (before) the aggregate feeding it
        assert win_pos < agg_pos
        assert p.count("orders.parquet") == 1

    def test_grouping_sets_uses_expand_single_scan(self, spark):
        from op_etl_spark.suite.advanced import grouping_sets_status_priority

        p = plan(grouping_sets_status_priority(spark, SF_DIR))
        assert n_nodes(p, "Expand") == 1
        assert p.count("orders.parquet") == 1

    def test_salted_agg_two_exchanges_no_join(self, spark):
        from op_etl_spark.suite.advanced import salted_event_type_totals

        p = plan(salted_event_type_totals(spark, SF_DIR))
        t = tree(p)
        assert n_nodes(p, "Exchange") == 2  # (key, salt) then key
        assert "Join" not in t

    def test_calendar_fill_generates_dates_engine_side(self, spark):
        from op_etl_spark.suite.advanced import calendar_fill_gaps

        p = plan(calendar_fill_gaps(spark, SF_DIR))
        assert n_nodes(p, "Generate") == 1
        assert "explode(sequence(" in p  # date dimension generated engine-side
        # the daily aggregate broadcasts; the calendar is never shuffled
        assert n_nodes(p, "BroadcastHashJoin") == 1

    def test_incremental_merge_no_join_two_scans(self, spark):
        # partial rollups union + re-aggregate: no join anywhere, and the
        # delta side is an independent scan (its shuffle sized by the delta)
        from op_etl_spark.suite.incremental import incremental_rollup_merge

        p = plan(incremental_rollup_merge(spark, SF_DIR))
        t = tree(p)
        assert "Join" not in t
        assert p.count("orders.parquet") == 2
        assert "Union" in t


class TestRuntimeBloomFilter:
    """When a selective dimension filter joins a huge fact and broadcast
    is off (the 100 TB shuffle-join regime), Catalyst injects a runtime
    Bloom filter from the dimension side into the fact scan — rows that
    can't match are dropped BEFORE the shuffle. Thresholds are lowered to
    make the optimization fire on test-sized inputs; the assertion is
    that the engine's plans carry it, so a production conf gets it free."""

    @pytest.fixture()
    def bloom_session(self, spark):
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        yield spark
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )

    def test_selective_dim_injects_bloom_into_fact_scan(self, bloom_session):
        import pyspark.sql.functions as F

        spark = bloom_session
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        p = plan(j)
        assert "might_contain" in p  # bloom probe on the fact side
        assert "BloomFilterAggregate" in p or "bloomfilter" in p.lower()


class TestAnalyticsBatchPlans:
    """Plan shapes for the round-2 analytics batch: each query's scale
    story is a structural property of its plan, pinned here."""

    def test_funnel_has_no_join(self, spark):
        # both funnel steps come out of ONE conditional aggregate over
        # the event stream — a join-based funnel would shuffle twice
        from op_etl_spark.suite.advanced import funnel_click_purchase

        p = plan(funnel_click_purchase(spark, SF_DIR))
        assert "Join" not in tree(p)
        assert p.count("events.parquet") == 1

    def test_cohort_windows_over_distinct_pairs(self, spark):
        # the window min must run over the distinct (user, week) relation,
        # not the raw stream: HashAggregate (distinct) sits below Window
        from op_etl_spark.suite.advanced import cohort_weekly_retention

        p = plan(cohort_weekly_retention(spark, SF_DIR))
        t = tree(p)
        assert t.find("Window") < t.rfind("HashAggregate")  # agg deeper than window
        assert "Join" not in t

    def test_regression_single_aggregate_no_join(self, spark):
        from op_etl_spark.suite.advanced import price_qty_regression

        p = plan(price_qty_regression(spark, SF_DIR))
        t = tree(p)
        assert "Join" not in t
        assert n_nodes(p, "Exchange") == 1  # one shuffle of 5-sum partials
        assert p.count("lineitem.parquet") == 1

    def test_scd2_one_exchange_one_scan(self, spark):
        from op_etl_spark.suite.advanced import scd2_user_value_history

        p = plan(scd2_user_value_history(spark, SF_DIR))
        assert n_nodes(p, "Exchange") == 1  # shuffle on user_id only
        assert p.count("events.parquet") == 1
        assert "In(event_type, [purchase])" in p or "EqualTo(event_type,purchase)" in p


class TestHygienePlans:
    def test_decontaminate_eval_ngrams_broadcast(self, spark):
        # the eval split is benchmark-sized by construction: its n-gram
        # table must arrive as a broadcast build side so the train side
        # streams map-side (at 100 TB: bloom/broadcast, never a corpus
        # shuffle join)
        from op_etl_spark.suite.contamination import decontaminate_overlap

        p = plan(decontaminate_overlap(spark, SF_DIR))
        t = tree(p)
        assert "BroadcastHashJoin" in t
        assert "SortMergeJoin" not in t

    def test_temperature_mix_rates_broadcast_onto_scan(self, spark):
        # per-source rates (|sources| rows) join the corpus via broadcast;
        # the only other join is the 1-row normalizer BNLJ
        from op_etl_spark.suite.contamination import temperature_mix_sample

        p = plan(temperature_mix_sample(spark, SF_DIR))
        t = tree(p)
        assert "BroadcastHashJoin" in t
        assert "SortMergeJoin" not in t

    def test_scrub_single_scan_no_join(self, spark):
        from op_etl_spark.suite.contamination import scrub_events_props

        p = plan(scrub_events_props(spark, SF_DIR))
        t = tree(p)
        assert "Join" not in t
        assert p.count("events.parquet") == 1
        assert "BatchEvalPython" not in p  # regexp ops stay codegen'd

    def test_funnel_exact_dedup_window_is_partitioned(self, spark):
        # the exact-dedup min-id window must be hash-partitioned on the
        # content hash — never an unpartitioned global window
        from op_etl_spark.suite.contamination import training_corpus_funnel

        p = plan(training_corpus_funnel(spark, SF_DIR))
        t = tree(p)
        assert "Window" in t
        # every Window's partition spec is non-empty (unpartitioned global
        # windows are additionally a CI-failing plan_audit smell)
        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", t):
            assert m.group(1).strip() != ""
        assert "BatchEvalPython" not in p


class TestScalePatternPlans:
    def test_global_topk_is_heap_merge_not_global_sort(self, spark):
        # orderBy().limit(k) must plan as TakeOrderedAndProject (per-task
        # k-row heaps, driver merge) — never a full range sort
        from op_etl_spark.suite.profile import global_topk_docs

        p = plan(global_topk_docs(spark, SF_DIR))
        t = tree(p)
        assert "TakeOrderedAndProject" in t
        assert "Exchange rangepartitioning" not in p

    def test_heavy_hitters_no_full_cardinality_shuffle(self, spark):
        # pass 2's groupBy runs on the candidate semi-join output; the
        # candidate set arrives broadcast, and the only BNLJ is the 1-row
        # corpus total
        from op_etl_spark.suite.lm_stats import heavy_hitter_users

        p = plan(heavy_hitter_users(spark, SF_DIR))
        t = tree(p)
        assert "BroadcastHashJoin" in t  # candidates joined broadcast
        assert "SortMergeJoin" not in t
        assert "BatchEvalPython" not in p  # MG pass is Arrow mapInPandas

    def test_bigram_windows_partitioned_and_no_position_join(self, spark):
        # adjacency comes from array slicing (narrow); the only window is
        # per-w1 top-k, always partitioned
        from op_etl_spark.suite.lm_stats import bigram_next_token

        p = plan(bigram_next_token(spark, SF_DIR))
        t = tree(p)
        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", t):
            assert m.group(1).strip() != ""
        assert p.count("documents.parquet") == 1

    def test_shuffle_shards_single_exchange(self, spark):
        # one hash shuffle on shard + per-shard sort; no global sort
        from op_etl_spark.suite.sampling import shuffle_shard_manifest

        p = plan(shuffle_shard_manifest(spark, SF_DIR))
        t = tree(p)
        assert "Exchange rangepartitioning" not in p
        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", t):
            assert m.group(1).strip() != ""


class TestMonitoringPlans:
    def test_dq_report_one_scan_per_table(self, spark):
        # every table's constraints ride ONE scan (struct-array fan-out),
        # referential integrity is the single join
        from op_etl_spark.suite.monitoring import dq_constraint_report

        p = plan(dq_constraint_report(spark, SF_DIR))
        assert p.count("orders.parquet") == 1
        assert p.count("lineitem.parquet") == 1
        assert p.count("events.parquet") == 1
        assert p.count("documents.parquet") == 1

    def test_drift_report_single_corpus_scan(self, spark):
        # both monitored features explode from one struct array: ONE scan,
        # one shuffle on (feature, bucket); split totals come from a
        # feature-partitioned window over the bucket counts, not a second
        # corpus aggregate — so no join of any kind
        from op_etl_spark.suite.monitoring import drift_bucket_report

        p = plan(drift_bucket_report(spark, SF_DIR))
        assert p.count("documents.parquet") == 1
        t = tree(p)
        assert "Join" not in t
        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", t):
            assert m.group(1).strip() != ""


class TestSpatialJoinPlans:
    def test_grid_distance_pairs_equi_join_no_cross(self, spark):
        # the near-join must be a hash join on the cell key — never a
        # cartesian/BNLJ pair explosion
        from op_etl_spark.suite.geo import grid_distance_pairs

        p = plan(grid_distance_pairs(spark, SF_DIR))
        t = tree(p)
        assert "CartesianProduct" not in t
        assert "BroadcastNestedLoopJoin" not in t
        assert ("SortMergeJoin" in t) or ("ShuffledHashJoin" in t) or (
            "BroadcastHashJoin" in t
        )


class TestEmbeddingStorePlans:
    def test_quantize_is_narrow_no_shuffle_no_udf(self, spark):
        # per-vector quantization must be pure array expressions: no
        # Exchange, no Python
        from op_etl_spark.suite.embedding_store import embedding_int8_quantize

        p = plan(embedding_int8_quantize(spark, SF_DIR))
        t = tree(p)
        assert "Exchange" not in t
        assert "BatchEvalPython" not in p and "MapInPandas" not in p

    def test_dim_stats_single_aggregate(self, spark):
        from op_etl_spark.suite.embedding_store import embedding_dim_stats

        p = plan(embedding_dim_stats(spark, SF_DIR))
        assert p.count("embeddings.parquet") == 1
        t = tree(p)
        assert "Join" not in t
