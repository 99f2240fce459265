"""One-command gate battery: everything the round driver and judge check,
in dependency order, with a one-line PASS/FAIL summary per gate.

Usage: python tools/verify_all.py [--fast]

  full (default): oracle sweep at sf0.001 + sf0.01 + sf0.1, plan audit,
                  pytest (incl. slow CI gates), bench gate vs the last
                  BENCH_r*.json
  --fast:         oracle sweep at sf0.01 only, plan audit, pytest minus
                  the slow gates — the inner-loop check

Exit code = number of failed gates.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env: dict | None = None, ok=None) -> bool:
    t0 = time.time()
    e = dict(os.environ)
    e.update(env or {})
    proc = subprocess.run(cmd, capture_output=True, text=True, env=e, cwd=REPO)
    good = proc.returncode == 0 and (ok is None or ok(proc.stdout))
    status = "PASS" if good else "FAIL"
    print(f"{status} {name} ({time.time() - t0:.0f}s)")
    if not good:
        print("\n".join(proc.stdout.splitlines()[-15:]))
        print(proc.stderr[-1500:])
    return good


def main() -> int:
    fast = "--fast" in sys.argv
    py = sys.executable
    gates: list[bool] = []

    sfs = ["/root/testdata/sf0.01"] if fast else [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
    ]
    for sf in sfs:
        cmd = [py, "tools/check_correctness.py", sf]
        if sf.endswith("sf0.01"):
            # regenerate the committed full-sweep artifact: the driver's
            # CORRECTNESS_r*.json samples ~50 queries, this records every
            # declared query (git SHA inside) as a diffable file
            cmd += ["--artifact", os.path.join(REPO, "CORRECTNESS_full.json")]
        gates.append(
            run(
                f"oracle sweep {sf.rsplit('/', 1)[-1]}",
                cmd,
                ok=lambda out: " 0 failed," in out,
            )
        )

    gates.append(run("plan audit", [py, "tools/plan_audit.py", "/root/testdata/sf0.001"]))

    env = {"SKIP_FULL_ORACLE": "1", "SKIP_PLAN_SWEEP": "1"} if fast else {}
    gates.append(run("pytest", [py, "-m", "pytest", "tests/", "-q"], env=env))

    def _round_no(p: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")), key=_round_no)
    if benches and not fast:
        out = subprocess.run(
            [py, "bench.py"], capture_output=True, text=True, cwd=REPO
        ).stdout.strip().splitlines()
        line = next((l for l in reversed(out) if l.startswith("{")), None)
        if line:
            tmp = "/tmp/verify_all_bench.json"
            with open(tmp, "w") as f:
                f.write(line)
            n_q = len(json.loads(line).get("queries", {}))
            print(f".... bench produced {n_q} query timings")
            # Baseline = newest driver-recorded BENCH_r*.json, widened by
            # the newest committed full local measure (BENCH_local_r*.json)
            # for queries the driver file lost to tail truncation (the
            # recorded wrapper keeps only the last 2000 chars of stdout —
            # BENCH_r06.json salvages 64 of 88 queries). Driver-recorded
            # values win where both exist.
            sys.path.insert(0, REPO)
            from tools.bench_diff import _queries, _search_secs

            base_q = _queries(benches[-1])
            base_s = _search_secs(benches[-1])
            # Widen with the newest local full measure whose round is <=
            # the driver bench's round — NOT the current round's own
            # numbers: a local file measured with the code under test
            # would gate the tail-truncated queries against themselves
            # and hide any regression in them.
            locals_ = [
                p
                for p in sorted(
                    glob.glob(os.path.join(REPO, "BENCH_local_r*.json")),
                    key=_round_no,
                )
                if _round_no(p) <= _round_no(benches[-1])
            ]
            base_name = os.path.basename(benches[-1])
            if locals_:
                widened = _queries(locals_[-1])
                widened.update(base_q)
                base_q = widened
                # search-phase baseline: the local full measure carries it
                # even when the driver file's tail lost it
                widened_s = _search_secs(locals_[-1])
                widened_s.update(base_s)
                base_s = widened_s
                base_name += f"+{os.path.basename(locals_[-1])}"
            base_tmp = "/tmp/verify_all_bench_base.json"
            with open(base_tmp, "w") as f:
                json.dump({"queries": base_q, "search_sec": base_s}, f)
            gates.append(
                run(
                    f"bench gate vs {base_name}",
                    [py, "tools/bench_diff.py", base_tmp, tmp, "--gate"],
                )
            )
        else:
            print("FAIL bench (no JSON line)")
            gates.append(False)

    failed = sum(1 for g in gates if not g)
    print(f"\n{len(gates) - failed}/{len(gates)} gates passed")
    return failed


if __name__ == "__main__":
    sys.exit(main())
