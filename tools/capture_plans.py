"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: every
declared query when none are named). For iterative driver-loop queries the
captured plan is the final result DataFrame's plan — the loop's per-round
structure is documented separately in OPTIMIZATION notes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from op_etl_spark.session import get_spark  # noqa: E402
from op_etl_spark import suite  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    qs = suite.all_queries()
    if not names:
        names = list(qs)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("op_etl_spark-capture-plans")
    for name in names:
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — physical plan ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
