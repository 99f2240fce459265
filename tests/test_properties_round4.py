"""Property-based tests (hypothesis) for the round-4 pure kernels:

 - fixture_mod: its DuckDB SQL twin evaluates to the SAME modulus for any
   row count (the stream gates' correctness depends on both engines
   picking the identical subsample), the modulus is a power of two, and
   the implied sample size is O(target);
 - hierarchical block assignment: the closed-form "shortest prefix level
   whose population fits the cap" used by embedding_neardup_pairs equals
   the literal recursive split-until-it-fits on random populations —
   the prefix-monotonicity argument, machine-checked;
 - pointer-doubling CC reference: union-find ground truth on random
   graphs (the Spark fixpoint is separately pinned in
   test_cc_pointer_doubling.py; here we pin the PROPERTY that min-label
   with doubling converges to component minima on an in-Python model of
   the same update rule, for hundreds of random graphs).

Pure Python/DuckDB — no SparkSession, so hypothesis can push volume.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from op_etl_spark.suite._util import fixture_mod, fixture_mod_sql


class TestFixtureMod:
    @given(st.integers(min_value=0, max_value=10**12),
           st.sampled_from([64, 128, 1024, 4096]))
    @settings(max_examples=300, deadline=None)
    def test_sql_twin_matches_python(self, n, target):
        con = duckdb.connect()
        # evaluate the twin's arithmetic on a literal count so hypothesis
        # can range far beyond materializable row counts
        expr = fixture_mod_sql("t", target).replace("count(*)", str(n)).replace(
            "FROM t", ""
        )
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == fixture_mod(n, target)

    @given(st.integers(min_value=1, max_value=10**12),
           st.sampled_from([64, 128, 1024, 4096]))
    @settings(max_examples=300, deadline=None)
    def test_power_of_two_and_bounded_sample(self, n, target):
        m = fixture_mod(n, target)
        assert m >= 1 and (m & (m - 1)) == 0  # power of two
        # expected kept rows n/m lands in (target/2, target] for n > target
        if n > target:
            assert n / m <= target
            assert n / m > target / 2


# --- hierarchical block split: closed form == recursion ---

LEVELS = (4, 8, 12, 16, 20, 24)


def _closed_form(pfulls: list[int], cap: int) -> dict[int, int | None]:
    """vector index -> terminal level (None = terminal backstop drop),
    exactly the rule embedding_neardup_pairs implements."""
    out = {}
    for i, p in enumerate(pfulls):
        lvl = None
        for m in LEVELS:
            cnt = sum(1 for q in pfulls if q % (1 << m) == p % (1 << m))
            if cnt <= cap:
                lvl = m
                break
        out[i] = lvl
    return out


def _recursive(pfulls: list[int], cap: int) -> dict[int, int | None]:
    """Literal split-until-it-fits: start with level-4 blocks; any block
    over cap is split on the next level; still over cap at the deepest
    level -> dropped."""
    out: dict[int, int | None] = {}

    def split(members: list[int], li: int):
        m = LEVELS[li]
        groups: dict[int, list[int]] = {}
        for i in members:
            groups.setdefault(pfulls[i] % (1 << m), []).append(i)
        for g in groups.values():
            if len(g) <= cap:
                for i in g:
                    out[i] = m
            elif li + 1 < len(LEVELS):
                split(g, li + 1)
            else:
                for i in g:
                    out[i] = None
        return out

    return split(list(range(len(pfulls))), 0)


class TestHierarchicalSplitEquivalence:
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 24) - 1),
                    min_size=1, max_size=120),
           st.sampled_from([1, 2, 4, 8]))
    @settings(max_examples=300, deadline=None)
    def test_closed_form_equals_recursion(self, pfulls, cap):
        assert _closed_form(pfulls, cap) == _recursive(pfulls, cap)

    @given(st.lists(st.integers(min_value=0, max_value=(1 << 24) - 1),
                    min_size=1, max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_terminal_blocks_fit_cap(self, pfulls):
        cap = 4
        lv = _closed_form(pfulls, cap)
        # every kept vector's terminal block population is within the cap
        for i, m in lv.items():
            if m is None:
                continue
            cnt = sum(
                1
                for j, mj in lv.items()
                if mj == m and pfulls[j] % (1 << m) == pfulls[i] % (1 << m)
            )
            assert cnt <= cap


# --- pointer-doubling min-label model vs union-find ground truth ---


def _union_find_minima(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


def _doubling_model(n: int, edges: list[tuple[int, int]]) -> tuple[dict[int, int], int]:
    """The exact update rule of cc_fixpoint, modeled in Python:
    one-hop min over neighbors' labels, then label <- label[label]."""
    label = {i: i for i in range(n)}
    sym = edges + [(b, a) for a, b in edges]
    rounds = 0
    while True:
        rounds += 1
        hop = dict(label)
        for a, b in sym:
            if label[a] < hop[b]:
                hop[b] = label[a]
        new = {i: min(hop[i], hop[hop[i]]) for i in range(n)}
        if new == label:
            return label, rounds
        label = new
        if rounds > n + 2:  # safety: must converge long before this
            raise AssertionError("did not converge")


class TestDoublingModel:
    @given(st.integers(min_value=1, max_value=40), st.data())
    @settings(max_examples=200, deadline=None)
    def test_matches_union_find(self, n, data):
        n_edges = data.draw(st.integers(min_value=0, max_value=2 * n))
        edges = [
            (data.draw(st.integers(0, n - 1)), data.draw(st.integers(0, n - 1)))
            for _ in range(n_edges)
        ]
        truth = _union_find_minima(n, edges)
        got, _ = _doubling_model(n, edges)
        assert got == truth

    @given(st.integers(min_value=2, max_value=400))
    @settings(max_examples=50, deadline=None)
    def test_chain_rounds_logarithmic(self, n):
        edges = [(i, i + 1) for i in range(n - 1)]
        got, rounds = _doubling_model(n, edges)
        assert got == {i: 0 for i in range(n)}
        assert rounds <= math.ceil(math.log2(n)) + 3


class TestIncrementalStarForest:
    """The property incremental_cc_assign rests on: replacing an already-
    converged subgraph's edges with its star forest (node -> component
    min) changes NOTHING about the components of the combined graph."""

    @given(st.integers(min_value=2, max_value=30), st.data())
    @settings(max_examples=200, deadline=None)
    def test_star_plus_delta_equals_full(self, n, data):
        n_old = data.draw(st.integers(0, 2 * n))
        n_delta = data.draw(st.integers(0, n))
        old = [
            (data.draw(st.integers(0, n - 1)), data.draw(st.integers(0, n - 1)))
            for _ in range(n_old)
        ]
        delta = [
            (data.draw(st.integers(0, n - 1)), data.draw(st.integers(0, n - 1)))
            for _ in range(n_delta)
        ]
        labels_old = _union_find_minima(n, old)
        star = [(i, m) for i, m in labels_old.items() if m != i]
        assert _union_find_minima(n, star + delta) == _union_find_minima(
            n, old + delta
        )
