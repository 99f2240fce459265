"""Property-based (hypothesis) tests for the MATHEMATICAL invariants the
round-5 operators rest on — fuzzed in pure Python so hundreds of random
cases run in milliseconds (the Spark plumbing is pinned separately by
tests/test_sketches.py and the DuckDB oracle gate).

 - prefix-filter lemma (suite/dedup.prefix_filter_jaccard_pairs): under
   ANY common total order, two sets with Jaccard >= t share an element in
   both (n - ceil(t*n) + 1)-prefixes;
 - two-level bottom-k (operators/sketches.bottom_k_hashes): k smallest of
   a union == k smallest of the per-salt k-smallest;
 - containment prune bound (suite/dedup.containment_pairs): true common
   <= capped common + min(per-side over-cap counts), for every cap;
 - CMS one-sidedness: min over rows of bucket sums >= the true count;
 - integer ceil identity: (3n + 9) // 10 == ceil(3n/10) exactly.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

T_NUM, T_DEN = 3, 10  # the Jaccard threshold 0.3 as an exact rational

sets_strategy = st.lists(
    st.sets(st.integers(0, 40), min_size=1, max_size=25), min_size=2, max_size=8
)


def _prefix(s: set[int], order: dict[int, int]) -> list[int]:
    n = len(s)
    p = n - (T_NUM * n + T_DEN - 1) // T_DEN + 1
    return sorted(s, key=lambda x: order[x])[:p]


class TestPrefixFilterLemma:
    @given(sets_strategy, st.integers(0, 2**31))
    @settings(max_examples=300, deadline=None)
    def test_qualifying_pairs_share_a_prefix_token(self, sets, seed):
        # any deterministic global order must work — derive one from the seed
        universe = sorted(set().union(*sets))
        order = {
            tok: int(hashlib.md5(f"{seed}|{tok}".encode()).hexdigest(), 16)
            for tok in universe
        }
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                a, b = sets[i], sets[j]
                jac = len(a & b) / len(a | b)
                if jac >= T_NUM / T_DEN:
                    assert set(_prefix(a, order)) & set(_prefix(b, order)), (
                        f"lemma violated: J={jac} but prefixes disjoint"
                    )

    @given(st.integers(1, 100_000))
    @settings(max_examples=300, deadline=None)
    def test_integer_ceil_identity(self, n):
        assert (T_NUM * n + T_DEN - 1) // T_DEN == math.ceil(T_NUM * n / T_DEN)
        # prefix length is always >= 1 and <= n
        p = n - (T_NUM * n + T_DEN - 1) // T_DEN + 1
        assert 1 <= p <= n


class TestTwoLevelBottomK:
    @given(
        st.lists(st.integers(0, 10**9), min_size=0, max_size=200),
        st.integers(1, 16),
        st.integers(1, 8),
    )
    @settings(max_examples=300, deadline=None)
    def test_per_salt_slice_merge_is_exact(self, values, k, n_salts):
        distinct = sorted(set(values))
        per_salt: dict[int, list[int]] = {}
        for v in distinct:
            per_salt.setdefault(v % n_salts, []).append(v)
        merged = sorted(
            x for vs in per_salt.values() for x in sorted(vs)[:k]
        )[:k]
        assert merged == distinct[:k]


class TestContainmentBound:
    @given(
        st.sets(st.integers(0, 30), min_size=1, max_size=20),
        st.sets(st.integers(0, 30), min_size=1, max_size=20),
        st.dictionaries(st.integers(0, 30), st.integers(1, 100), max_size=31),
        st.integers(1, 50),
    )
    @settings(max_examples=300, deadline=None)
    def test_true_common_le_capped_plus_min_hot(self, a, b, df, cap):
        dfv = lambda t: df.get(t, 2)  # unknown tokens: any df >= 2 works
        capped_common = sum(1 for t in a & b if 2 <= dfv(t) <= cap)
        hot_a = sum(1 for t in a if dfv(t) > cap)
        hot_b = sum(1 for t in b if dfv(t) > cap)
        # every common token has df >= 2 in a real corpus (it appears in
        # both docs), so it is either capped-counted or hot on BOTH sides
        true_common = sum(1 for t in a & b if dfv(t) >= 2)
        assert true_common <= capped_common + min(hot_a, hot_b)


class TestCmsOneSided:
    @given(
        st.lists(st.integers(0, 50), min_size=1, max_size=300),
        st.integers(1, 4),
        st.integers(2, 32),
    )
    @settings(max_examples=300, deadline=None)
    def test_min_over_rows_never_underestimates(self, stream, d, w):
        def bucket(row, key):
            return int(hashlib.md5(f"{row}:{key}".encode()).hexdigest(), 16) % w

        cells: dict[tuple[int, int], int] = {}
        for key in stream:
            for row in range(d):
                cell = (row, bucket(row, key))
                cells[cell] = cells.get(cell, 0) + 1
        from collections import Counter

        exact = Counter(stream)
        for key, cnt in exact.items():
            est = min(cells[(row, bucket(row, key))] for row in range(d))
            assert est >= cnt
