"""Plan-shape and property tests for the batch-3 TPC-H shapes, the
connected-components dedup clustering, and the new text signals.

Same philosophy as test_plan_properties.py: sf0.001 correctness is checked
by the oracle gate; these tests pin what has to stay true at 100 TB —
which joins broadcast, how many shuffles run, and the graph-closure
invariants of the CC fixpoint.
"""

from __future__ import annotations

import contextlib
import io
import re

SF_DIR = "/root/testdata/sf0.001"


def plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(p: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {name}\s*(\(|$)", p, re.M))


class TestBatch3Plans:
    def test_q2_window_min_not_self_join(self, spark):
        """The correlated-MIN is a window over one shuffle — four broadcast
        dims, exactly one hash-partitioning exchange, no fact self-join."""
        from op_etl_spark.suite.tpch_batch3 import q2_min_cost_supplier

        p = plan(q2_min_cost_supplier(spark, SF_DIR))
        assert n_nodes(p, "BroadcastHashJoin") == 4
        assert p.count("hashpartitioning") == 1
        assert "SortMergeJoin" not in p

    def test_q9_all_dims_broadcast_single_agg_shuffle(self, spark):
        from op_etl_spark.suite.tpch_batch3 import q9_nation_profit

        p = plan(q9_nation_profit(spark, SF_DIR))
        assert n_nodes(p, "BroadcastHashJoin") == 3
        assert "SortMergeJoin" not in p
        # one partial+final agg pair over one shuffle
        assert p.count("hashpartitioning") == 1

    def test_q9_part_filter_pushed_to_scan(self, spark):
        from op_etl_spark.suite.tpch_batch3 import q9_nation_profit

        p = plan(q9_nation_profit(spark, SF_DIR))
        assert "StringContains(p_name,red)" in p

    def test_q11_total_is_broadcast_scalar(self, spark):
        """The HAVING threshold compares against a broadcast one-row
        aggregate, never a shuffled join."""
        from op_etl_spark.suite.tpch_batch3 import q11_part_value_share

        p = plan(q11_part_value_share(spark, SF_DIR))
        assert n_nodes(p, "BroadcastNestedLoopJoin") == 1
        assert "SortMergeJoin" not in p

    def test_q16_exclusion_is_broadcast_anti(self, spark):
        from op_etl_spark.suite.tpch_batch3 import q16_supplier_part_counts

        p = plan(q16_supplier_part_counts(spark, SF_DIR))
        assert "LeftAnti BuildRight" in p
        assert "SortMergeJoin" not in p

    def test_q20_semi_join_and_single_fact_scan(self, spark):
        from op_etl_spark.suite.tpch_batch3 import q20_concentrated_suppliers

        p = plan(q20_concentrated_suppliers(spark, SF_DIR))
        assert "LeftSemi" in p
        assert n_nodes(p, "Scan parquet") == 3  # lineitem + part + supplier, once each


class TestConnectedComponents:
    def test_edges_no_self_join(self, spark):
        from op_etl_spark.suite.clustering import _edges

        p = plan(_edges(spark, SF_DIR))
        assert "Join" not in p  # posting-list pair generation

    def test_assignment_is_a_closure(self, spark):
        """Graph invariants the oracle hash can't localize if they break:
        every edge endpoint pair shares a cluster; every cluster id is the
        min of its members; labels are a fixpoint (no doc maps to a
        cluster id that itself maps elsewhere)."""
        from op_etl_spark.suite.clustering import _edges, dedup_cc_assign

        assign = {r.doc_id: r.cluster_id for r in dedup_cc_assign(spark, SF_DIR).collect()}
        edges = [(r.src, r.dst) for r in _edges(spark, SF_DIR).collect()]
        assert edges, "calibration broke: no near-dup edges at sf0.001"
        for a, b in edges:
            assert assign[a] == assign[b], f"edge ({a},{b}) split across clusters"
        members = {}
        for d, c in assign.items():
            members.setdefault(c, []).append(d)
        for c, ms in members.items():
            assert c == min(ms)
            assert assign[c] == c  # fixpoint: representative maps to itself

    def test_survivors_match_assignment(self, spark):
        from op_etl_spark.suite.clustering import dedup_cc_assign, dedup_cc_survivors

        assign = dedup_cc_assign(spark, SF_DIR)
        sizes = {
            r.cluster_id: r.n
            for r in assign.groupBy("cluster_id").agg(
                __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
            ).collect()
        }
        surv = {r.survivor_doc_id: r.cluster_size for r in dedup_cc_survivors(spark, SF_DIR).collect()}
        assert surv == {c: n for c, n in sizes.items() if n >= 2}


class TestTextSignals:
    def test_rep_signals_ranges(self, spark):
        from pyspark.sql import functions as F

        from op_etl_spark.suite.text import rep_signals

        bad = (
            rep_signals(spark, SF_DIR)
            .filter(
                (F.col("dup_word_frac") < 0) | (F.col("dup_word_frac") > 1)
                | (F.col("top_word_frac") <= 0) | (F.col("top_word_frac") > 1)
                | (F.col("top_bigram_frac") < 0) | (F.col("top_bigram_frac") > 1)
            )
            .count()
        )
        assert bad == 0

    def test_dup_ngram_frac_counts_positions_not_distinct(self, spark):
        """n_grams must equal n_words - 2 (multiplicity kept), not the
        distinct-shingle count boilerplate/jaccard use."""
        from pyspark.sql import functions as F

        from op_etl_spark.suite.text import dup_ngram_frac, token_counts

        toks = token_counts(spark, SF_DIR).select("doc_id", "n_tokens")
        joined = dup_ngram_frac(spark, SF_DIR).join(toks, "doc_id")
        bad = joined.filter(F.col("n_grams") != F.col("n_tokens") - 2).count()
        assert bad == 0
