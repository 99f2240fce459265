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
        gates.append(
            run(
                f"oracle sweep {sf.rsplit('/', 1)[-1]}",
                [py, "tools/check_correctness.py", sf],
                ok=lambda out: " 0 failed," in out,
            )
        )

    gates.append(run("plan audit", [py, "tools/plan_audit.py", "/root/testdata/sf0.001"]))

    env = {"SKIP_FULL_ORACLE": "1", "SKIP_PLAN_SWEEP": "1"} if fast else {}
    gates.append(run("pytest", [py, "-m", "pytest", "tests/", "-q"], env=env))

    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
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
            gates.append(
                run(
                    f"bench gate vs {os.path.basename(benches[-1])}",
                    [py, "tools/bench_diff.py", benches[-1], tmp, "--gate"],
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
