"""Plan audit: sweep every suite query's physical plan for scale smells.

For each of the ~100 declared queries this prints the operators that
would hurt at 100 TB:

  - CartesianProduct / BroadcastNestedLoopJoin where not intentional
    (the range-band join is BNLJ by design: 4 literal bands);
  - BatchEvalPython (row-at-a-time Python UDF on the hot path — the
    engine's contract is Arrow-vectorized or JVM-only);
  - a global Sort that is not part of TakeOrderedAndProject (unbounded
    total order = single-reducer bottleneck; windows declare their own
    sorts and are audited by the plan-property tests instead);
  - scan count per query (re-scans of the same table flag a missed
    reuse).

Exit code 1 if any NEW smell appears outside the allowlist, so it can
run in CI alongside the plan-property tests.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import sys

sys.path.insert(0, "/root/repo")

# Queries where the flagged operator is the intended design, with why.
ALLOW = {
    "range_join_price_bands": {"BroadcastNestedLoopJoin"},  # 4 literal bands, build side is tiny by construction
    "q11_part_value_share": {"BroadcastNestedLoopJoin"},    # scalar threshold broadcast into HAVING
    "q15_top_supplier": {"BroadcastNestedLoopJoin"},        # scalar max broadcast
    "q17_small_quantity_revenue": {"BroadcastNestedLoopJoin"},
    "q22_idle_rich_customers": {"BroadcastNestedLoopJoin"},  # scalar avg-balance broadcast
    "above_nation_avg_suppliers": {"BroadcastNestedLoopJoin"},
    "ann_bruteforce_topk": {"BroadcastNestedLoopJoin"},  # probe vectors (k rows) broadcast over the corpus: brute-force ANN IS an all-pairs scan
    "ivf_centroid_rank": {"BroadcastNestedLoopJoin"},    # centroid table (n_lists rows) broadcast; corpus never shuffles
    "negative_pair_sample": {"BroadcastNestedLoopJoin"}, # 1-row corpus-size aggregate broadcast into the index math
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, p: str) -> dict:
    tree = p.split("\n\n", 1)[0]
    smells = set()
    if "CartesianProduct" in tree:
        smells.add("CartesianProduct")
    if "BroadcastNestedLoopJoin" in tree:
        smells.add("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in tree:
        smells.add("BatchEvalPython")
    # a global sort not feeding a top-k operator
    if re.search(r"^\(\d+\) Sort", tree, re.M) and "TakeOrderedAndProject" not in tree \
            and "Window" not in tree and "SortMergeJoin" not in tree \
            and "SortAggregate" not in tree:
        smells.add("GlobalSortNoLimit")
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", tree, re.M))
    return {
        "smells": sorted(smells - ALLOW.get(name, set())),
        "allowed": sorted(smells & ALLOW.get(name, set())),
        "n_scans": n_scans,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from op_etl_spark.session import get_spark
    from op_etl_spark import suite

    spark = get_spark("plan-audit")
    bad = {}
    report = {}
    for name, fn in suite.all_queries().items():
        try:
            res = audit(name, plan_of(fn(spark, sf_dir)))
        except Exception as e:  # noqa: BLE001
            res = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        report[name] = res
        if res.get("smells") or res.get("error"):
            bad[name] = res
    print(json.dumps({"n_queries": len(report), "flagged": bad}, indent=2))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
