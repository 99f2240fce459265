"""CI wiring for the bench regression gate (tools/bench_diff.py --gate).

Pins the gate's contract: green on the real round-over-round bench files
(modulo the documented GATE_ALLOW list), red on an injected slowdown, and
indifferent to added/removed queries (only SHARED queries can fail it).
"""

from __future__ import annotations

import json
import os

import pytest

from tools.bench_diff import main as bench_diff_main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R02 = os.path.join(REPO, "BENCH_r02.json")
R03 = os.path.join(REPO, "BENCH_r03.json")


def _write(tmp_path, name, queries, search=None):
    p = tmp_path / name
    d = {"queries": queries}
    if search is not None:
        d["search_sec"] = search
    p.write_text(json.dumps(d))
    return str(p)


class TestBenchDiffGate:
    def test_real_rounds_pass_gate(self, capsys):
        if not (os.path.exists(R02) and os.path.exists(R03)):
            pytest.skip("round bench files not present")
        assert bench_diff_main([R02, R03, "--gate"]) == 0
        out = capsys.readouterr().out
        assert "shared-only totals" in out

    def test_injected_slowdown_fails_gate(self, tmp_path, capsys):
        old = _write(tmp_path, "old.json", {"q_a": 1.0, "q_b": 0.5})
        new = _write(tmp_path, "new.json", {"q_a": 2.5, "q_b": 0.5})
        assert bench_diff_main([old, new, "--gate"]) == 1
        assert "GATE FAIL" in capsys.readouterr().out

    def test_noise_floor_suppresses_tiny_regressions(self, tmp_path):
        # 3x ratio but only +0.2s absolute: local noise, not a regression
        old = _write(tmp_path, "old.json", {"q_a": 0.1})
        new = _write(tmp_path, "new.json", {"q_a": 0.3})
        assert bench_diff_main([old, new, "--gate"]) == 0

    def test_added_and_removed_queries_cannot_fail_gate(self, tmp_path, capsys):
        old = _write(tmp_path, "old.json", {"q_gone": 5.0, "q_keep": 1.0})
        new = _write(tmp_path, "new.json", {"q_new": 9.0, "q_keep": 1.0})
        assert bench_diff_main([old, new, "--gate"]) == 0
        out = capsys.readouterr().out
        assert "added q_new" in out and "removed q_gone" in out
        assert "shared-only totals (1 queries): 1.0s -> 1.0s" in out

    def test_allowlisted_regression_passes_with_note(self, tmp_path, capsys):
        old = _write(tmp_path, "old.json", {"embedding_neardup_pairs": 0.43})
        new = _write(tmp_path, "new.json", {"embedding_neardup_pairs": 1.5})
        assert bench_diff_main([old, new, "--gate"]) == 0
        assert "allowed regression embedding_neardup_pairs" in capsys.readouterr().out

    def test_search_phase_regression_fails_under_stable_total(
        self, tmp_path, capsys
    ):
        # the failure mode the phase gate exists for: total stays flat
        # (build got faster, search got slower), so the total gate is
        # blind but the search component regressed 3x and +0.9s
        old = _write(
            tmp_path, "old.json", {"pq_recall_at_k": 9.5},
            search={"pq_recall_at_k": 0.5},
        )
        new = _write(
            tmp_path, "new.json", {"pq_recall_at_k": 9.6},
            search={"pq_recall_at_k": 1.5},
        )
        assert bench_diff_main([old, new, "--gate"]) == 1
        out = capsys.readouterr().out
        assert "SEARCH SLOWER pq_recall_at_k" in out
        assert "pq_recall_at_k(search)" in out

    def test_missing_search_decomposition_skips_phase_gate(self, tmp_path):
        # an old baseline without search_sec (e.g. a truncated driver
        # tail) must not crash or fail the phase gate
        old = _write(tmp_path, "old.json", {"pq_recall_at_k": 9.5})
        new = _write(
            tmp_path, "new.json", {"pq_recall_at_k": 9.6},
            search={"pq_recall_at_k": 1.5},
        )
        assert bench_diff_main([old, new, "--gate"]) == 0
