"""A/B the streaming state-store provider for the two stateful bench
entries (stream_sessionize / stream_dedup_exact), guide §5 / VERDICT r11
ask 1.

Each measurement is ONE fresh process (cold JVM, same shape as a bench
invocation) that drains the query twice with bench.py's own functions —
identical AvailableNow / 8-micro-batch methodology — and reports the min
drain (bench's min-of-two rule). Configs:

  hdfs      default HDFSBackedStateStoreProvider
  rocksdb   RocksDBStateStoreProvider
  rocksdb+changelog
            RocksDB + changelog checkpointing (per-batch changelog write
            instead of full snapshot upload; snapshots move to the
            background maintenance task)

Usage:
  python tools/ab_stream_state.py [sf_dir] [reps]          # parent
  python tools/ab_stream_state.py --child CONF QUERY SF    # one point
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFS: dict[str, dict[str, str]] = {
    "hdfs": {},
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
    },
    "rocksdb+changelog": {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    },
}


def child(conf_name: str, query: str, sf_dir: str) -> None:
    from op_etl_spark.session import get_spark

    import bench

    spark = get_spark("ab-stream-state", extra_conf=CONFS[conf_name])
    fn = bench.STREAMING_BENCH[query]
    best = None
    for _ in range(2):
        stats = fn(spark, sf_dir)
        if best is None or stats["sec"] < best["sec"]:
            best = stats
    print(json.dumps(best))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out: dict[str, dict[str, list]] = {}
    for query in ("stream_sessionize", "stream_dedup_exact"):
        out[query] = {}
        for conf in CONFS:
            runs = []
            for _ in range(reps):
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     conf, query, sf_dir],
                    capture_output=True, text=True, timeout=900,
                )
                line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
                try:
                    runs.append(json.loads(line))
                except json.JSONDecodeError:
                    runs.append({"error": p.stderr[-300:]})
            out[query][conf] = runs
            secs = [r.get("sec") for r in runs if "sec" in r]
            batch = [r.get("mean_batch_ms") for r in runs if "mean_batch_ms" in r]
            print(
                f"{query:22s} {conf:18s} sec={secs} mean_batch_ms={batch}",
                file=sys.stderr,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
