"""Pointer-doubling convergence for the connected-components fixpoint.

The plain Pregel min-label loop needs O(diameter) rounds — a 256-node
chain would need 255. With the label(label) shortcut each round roughly
doubles propagation distance, so the chain must converge in O(log n)
rounds. These tests pin BOTH the answer (exact component minima) and the
round count on adversarial long-chain graphs — the exact shape the 32x
scale probe flagged as the steepest passing curve in round 3.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from op_etl_spark.suite.clustering import cc_fixpoint


def _chain(spark, n, offset=0):
    nodes = spark.range(n).select((F.col("id") + offset).alias("doc_id"))
    e = spark.range(n - 1).select(
        (F.col("id") + offset).alias("src"), (F.col("id") + offset + 1).alias("dst")
    )
    edges = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return nodes, edges


class TestPointerDoubling:
    def test_chain_256_converges_logarithmically(self, spark):
        nodes, edges = _chain(spark, 256)
        labels, rounds = cc_fixpoint(nodes, edges, max_rounds=50)
        assert rounds <= 12  # naive propagation would need 255
        got = {r.doc_id: r.label for r in labels.collect()}
        assert got == {i: 0 for i in range(256)}

    def test_two_components_stay_separate(self, spark):
        n1, e1 = _chain(spark, 40)
        n2, e2 = _chain(spark, 40, offset=1000)
        labels, _ = cc_fixpoint(n1.unionAll(n2), e1.unionAll(e2), max_rounds=50)
        got = {r.doc_id: r.label for r in labels.collect()}
        assert all(got[i] == 0 for i in range(40))
        assert all(got[1000 + i] == 1000 for i in range(40))

    def test_singletons_label_themselves(self, spark):
        nodes = spark.range(5).select(F.col("id").alias("doc_id"))
        edges = spark.createDataFrame([], "src bigint, dst bigint")
        labels, rounds = cc_fixpoint(nodes, edges, max_rounds=50)
        assert rounds == 1  # first round already a fixpoint
        got = {r.doc_id: r.label for r in labels.collect()}
        assert got == {i: i for i in range(5)}


class TestIncrementalConvergence:
    def test_star_plus_delta_converges_in_constant_rounds(self, spark):
        """The incremental path's payoff: once the old graph is a star
        forest (diameter 2), adding a small delta converges in a handful
        of rounds regardless of how long the ORIGINAL chains were."""
        n = 512
        nodes, edges = _chain(spark, n)
        labels, full_rounds = cc_fixpoint(nodes, edges, max_rounds=50)
        # rebuild the second phase's inputs with clean lineage (the
        # production query gets this from its own table reads +
        # checkpoints; reusing the first fixpoint's DataFrames here trips
        # a Spark attribute-map quirk inside localCheckpoint)
        star_rows = [
            (r.doc_id, r.label) for r in labels.collect() if r.doc_id != r.label
        ]
        star_sym = spark.createDataFrame(
            star_rows + [(b, a) for a, b in star_rows], "src bigint, dst bigint"
        )
        new_nodes = spark.createDataFrame(
            [(i,) for i in range(n)] + [(9999,)], "doc_id bigint"
        )
        # delta: a new node 9999 bridging into the chain's middle
        delta = spark.createDataFrame(
            [(9999, 256), (256, 9999)], "src bigint, dst bigint"
        )
        labels2, inc_rounds = cc_fixpoint(
            new_nodes, star_sym.unionAll(delta), max_rounds=50
        )
        got = {r.doc_id: r.label for r in labels2.collect()}
        assert got[9999] == 0 and all(got[i] == 0 for i in range(n))
        assert inc_rounds <= 3  # star diameter 2 + the bridge
        assert inc_rounds < full_rounds  # strictly cheaper than from-scratch
