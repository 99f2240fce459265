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


class TestTailReconstruction:
    """The driver keeps only the LAST 2000 chars of bench.py's stdout;
    the compact qv/qh tail must carry every headline query through it."""

    def _synthetic_bench_line(self):
        import bench

        timings = {n: round(0.1 + i * 0.037, 3) for i, n in enumerate(bench.HEADLINE)}
        build = {"pq_recall_at_k": 4.2, "ivfpq_recall_at_k": 6.9}
        return timings, json.dumps(
            {
                "build_phases": {
                    q: {"pq": {"lloyd": 3.0, "seed": 1.2}} for q in build
                },
                "build_sec": build,
                "search_sec": {q: round(timings[q] - b, 3) for q, b in build.items()},
                "queries": timings,
                "qh": bench.headline_fingerprint(),
                "qv": [timings.get(n) for n in bench.HEADLINE],
                "metric": "headline_suite_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": 0.1,
            }
        )

    def test_2000_char_tail_yields_all_headline_queries(self, tmp_path):
        import bench
        from tools.bench_diff import _queries

        timings, line = self._synthetic_bench_line()
        assert len(line) > 2000, "fixture must actually exercise truncation"
        p = tmp_path / "BENCH_trunc.json"
        p.write_text(json.dumps({"parsed": None, "tail": line[-2000:]}))
        got = _queries(str(p))
        assert got == timings
        assert len(got) == len(bench.HEADLINE)

    def test_errored_query_is_null_in_qv_and_dropped(self, tmp_path):
        import bench
        from tools.bench_diff import _queries

        timings, _ = self._synthetic_bench_line()
        dead = bench.HEADLINE[3]
        del timings[dead]
        line = json.dumps(
            {
                "queries": timings,
                "errors": {dead: "AnalysisException: boom"},
                "qh": bench.headline_fingerprint(),
                "qv": [timings.get(n) for n in bench.HEADLINE],
                "metric": "headline_suite_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": 0.1,
            }
        )
        p = tmp_path / "BENCH_trunc2.json"
        p.write_text(json.dumps({"parsed": None, "tail": line[-2000:]}))
        got = _queries(str(p))
        assert dead not in got and len(got) == len(bench.HEADLINE) - 1

    def test_stale_fingerprint_new_layout_salvages_visible_pairs(self, tmp_path):
        # the r9 ADVICE case: a round-8+ artifact (qh/qv AFTER the
        # queries dict, "sf" at the very end with no '}, "sf"' anchor)
        # whose fingerprint went stale because HEADLINE grew. The tail is
        # cut INSIDE the queries dict; every legacy salvage path targeted
        # the pre-r8 key order, so this used to raise ValueError and
        # crash the CI gate instead of degrading to the visible pairs.
        from tools.bench_diff import _queries

        timings, line = self._synthetic_bench_line()
        # forge a stale fingerprint so the qv zip path must refuse
        import bench

        line = line.replace(bench.headline_fingerprint(), "00000000")
        assert '"qh": "00000000"' in line
        p = tmp_path / "BENCH_stale_new.json"
        p.write_text(json.dumps({"parsed": None, "tail": line[-2000:]}))
        got = _queries(str(p))
        # everything visible in the 2000-char window, nothing hallucinated
        assert got and all(got[k] == timings[k] for k in got)
        assert "metric" not in got and "value" not in got and "sf" not in got

    def test_stale_fingerprint_falls_back_not_wrong_names(self, tmp_path):
        # a qh that doesn't match the current HEADLINE must NOT be zipped;
        # the legacy pair-salvage path recovers what it can instead
        from tools.bench_diff import _queries

        line = (
            '{"qh": "00000000", "qv": [1.0, 2.0], '
            '"queries": {"q_a": 1.0, "q_b": 2.0}, '
            '"metric": "headline_suite_total_runtime", "value": 3.0, '
            '"unit": "sec", "sf": 0.1}'
        )
        p = tmp_path / "BENCH_stale.json"
        p.write_text(json.dumps({"parsed": None, "tail": line}))
        got = _queries(str(p))
        assert got == {"q_a": 1.0, "q_b": 2.0}


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

    def test_search_allowlisted_regression_passes_with_note(
        self, tmp_path, capsys
    ):
        old = _write(
            tmp_path, "old.json", {"embedding_neardup_pairs": 2.0},
            search={"embedding_neardup_pairs": 0.4},
        )
        new = _write(
            tmp_path, "new.json", {"embedding_neardup_pairs": 2.1},
            search={"embedding_neardup_pairs": 1.4},
        )
        assert bench_diff_main([old, new, "--gate"]) == 0
        assert (
            "allowed regression embedding_neardup_pairs(search)"
            in capsys.readouterr().out
        )

    def test_missing_search_decomposition_skips_phase_gate(self, tmp_path):
        # an old baseline without search_sec (e.g. a truncated driver
        # tail) must not crash or fail the phase gate
        old = _write(tmp_path, "old.json", {"pq_recall_at_k": 9.5})
        new = _write(
            tmp_path, "new.json", {"pq_recall_at_k": 9.6},
            search={"pq_recall_at_k": 1.5},
        )
        assert bench_diff_main([old, new, "--gate"]) == 0
