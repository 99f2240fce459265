"""Prune-vs-accept consistency for prefix_filter_jaccard_pairs.

The query's final accept condition is the 4-decimal ROUNDED jaccard
(fround(J,4) >= 0.3 on both engines), which is exactly the integer
condition 20000*I >= 5999*U with U = n1 + n2 - I. Every pruning stage
must therefore be NECESSARY for that rounded condition — a prune derived
from the nominal 3/10 threshold is strictly tighter and can drop a
boundary pair with exact J in [0.29995, 0.3) that the oracle emits
(found in round-7 review; the round-6 prunes had this defect latently
and the PPJoin positional filter added a second, tighter instance).

Pure integer math replicated from suite/dedup.prefix_filter_jaccard_pairs;
exhaustive over the small-n grid plus the adversarial boundary family
(n1, n2) where 5999*(n1+n2) sits on a multiple of 25999.
"""

from __future__ import annotations


def accept(i: int, n1: int, n2: int) -> bool:
    """fround(I/U, 4) >= 0.3 as exact integers."""
    u = n1 + n2 - i
    return 20000 * i >= 5999 * u


def alpha(n1: int, n2: int) -> int:
    """engine: ceil(5999*(n1+n2)/25999) via the floor form."""
    return (5999 * (n1 + n2) + 25998) // 25999


def prefix_len(n: int) -> int:
    """engine: p = n - ceil(5999n/20000) + 1 via the floor form."""
    return n - (5999 * n + 19999) // 20000 + 1


def size_prune_passes(n1: int, n2: int) -> bool:
    return 20000 * min(n1, n2) >= 5999 * max(n1, n2)


def test_prunes_necessary_for_rounded_accept_small_grid():
    """For every (n1, n2, I) the final filter accepts, every prune must
    pass: alpha lower-bounds I, the size-ratio prune holds, and each
    side's overlap bound implied by the prefix length holds."""
    for n1 in range(1, 260):
        for n2 in range(n1, 260):
            a = alpha(n1, n2)
            # the minimal accepted overlap is exactly alpha — check the
            # boundary and its neighbors rather than every I
            for i in (a - 1, a, a + 1, min(n1, n2)):
                if not (1 <= i <= min(n1, n2)):
                    continue
                if not accept(i, n1, n2):
                    continue
                assert i >= a, (n1, n2, i)
                assert size_prune_passes(n1, n2), (n1, n2, i)
                # prefix lemma per side: accepted => I >= ceil(t_eff*n)
                # for each n, so common elements cannot all hide in the
                # (n - p) suffix of either side
                for n in (n1, n2):
                    suffix = n - prefix_len(n)
                    assert i > suffix, (n1, n2, i, n)


def test_alpha_is_tight():
    """alpha is a CEILING, not just a bound: I = alpha - 1 is never
    accepted (the prune loses nothing)."""
    for n1 in range(1, 260):
        for n2 in range(n1, 260):
            a = alpha(n1, n2)
            if 1 <= a - 1 <= min(n1, n2):
                assert not accept(a - 1, n1, n2), (n1, n2, a)


def test_rounding_boundary_family():
    """The adversarial family the old 3/10-derived prunes dropped:
    exact J just below 0.3 that ROUNDS UP to 0.3000. Example class:
    U = 20000k, I = 5999k (J = 0.29995 exactly, rounds to 0.3000)."""
    hit = 0
    for k in range(1, 40):
        i, u = 5999 * k, 20000 * k
        # realize (I, U) as n1 = I + d, n2 = U - n1 + I for a spread of d
        for d in range(0, u - i, max(1, (u - i) // 7)):
            n1, n2 = i + d, u - d
            if n1 < 1 or n2 < n1 or i > min(n1, n2):
                continue
            assert accept(i, n1, n2)
            # the OLD prunes (t = 3/10) reject some of these...
            old_alpha = (3 * (n1 + n2) + 12) // 13
            # ...while the fixed prunes must keep every one
            assert i >= alpha(n1, n2), (n1, n2, i)
            assert size_prune_passes(n1, n2), (n1, n2, i)
            if i < old_alpha:
                hit += 1  # concrete pair the old alpha would have pruned
    assert hit > 0, "boundary family produced no old-prune victims"
