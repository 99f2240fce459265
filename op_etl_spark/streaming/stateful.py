"""Custom stateful streaming operator: gap-based sessionizer via
applyInPandasWithState.

Implements the SAME session semantics as the batch suite's
`sessionize_events` (op_etl_spark/suite/relational.py: 30-minute
inactivity gap, session_id = per-user cumulative counter in event-time
order) but over an unbounded stream, carrying per-user state across
micro-batches — the operator shape Spark's built-in windows can't express
(session ids must be stable ordinal numbers, not window bounds).

Output mode is `update`: a session row is (re-)emitted every time it
grows; the latest row per (user_id, session_id) is the current session
state. State per user is O(1) — last event time + open-session
aggregates — so total state is bounded by the active-user count, not the
event count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800.0

OUTPUT_DDL = (
    "user_id bigint, session_id bigint, n_events bigint, session_start string"
)
STATE_DDL = "last_ts double, session_id bigint, n_events bigint, session_start string"


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_ts, session_id, n_events, session_start = state.get
    else:
        last_ts, session_id, n_events, session_start = None, 0, 0, None

    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            # gap math on float epoch (30-min granularity, safe); the
            # formatted start keeps the timestamp's full µs precision —
            # a float round-trip would be off by 1 µs at 1e9-second epochs
            epoch = ts.timestamp()
            if last_ts is None or epoch - last_ts > SESSION_GAP_S:
                if session_id > 0:
                    out.append((user_id, session_id, n_events, session_start))
                session_id += 1
                n_events = 1
                session_start = ts.strftime("%Y-%m-%d %H:%M:%S.%f")
            else:
                n_events += 1
            last_ts = epoch

    if session_id > 0:
        out.append((user_id, session_id, n_events, session_start))
    state.update((last_ts, session_id, n_events, session_start))
    yield pd.DataFrame(
        out, columns=["user_id", "session_id", "n_events", "session_start"]
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(ts timestamp, user_id, event_id, ...) -> per-session rows,
    re-emitted as sessions grow. Works on streaming DataFrames; for a
    batch DataFrame use the window-function twin in the suite."""
    from op_etl_spark.session import ensure_shipped

    # _sessionize_group is a module-level function, so workers deserialize
    # it BY REFERENCE and must be able to import op_etl_spark — under an
    # externally-created session from a foreign cwd that needs the package
    # zip shipped (same contract as the source connectors / geometry UDFs)
    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
