"""Custom stateful streaming operator: gap sessionization with explicit
per-key state via ``applyInPandasWithState``.

``session_window`` (pipeline.py) covers the built-in path; this is the
pattern for semantics Spark has no operator for — per-key state carried
across micro-batches in an Arrow-batched Python function.  State here is
one open session per user ``(start_us, last_us, n_events)``; each
invocation merges the batch's events with carried state, walks gaps, and
emits every session it observed (closed ones final, the still-open one as
its latest version, which stays in state for the next batch).

Because an open session re-emits when later batches extend it, exact
downstream consumption dedups by ``(user_id, session_start)`` keeping the
max ``n_events`` — under any micro-batching this reconstructs the final
sessions (session_start is stable once a session exists; only its extent
grows).  The gap rule is strict ``> gap`` — identical to the batch
``events_sessionize`` query, which is the oracle for the equivalence test.

At scale: state is O(active users), keyed-shuffled once; use
``GroupStateTimeout.EventTimeTimeout`` + ``state.setTimeoutTimestamp`` in
production to close idle sessions and bound state instead of keeping them
forever (bounded fixtures never need the timeout to fire).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

SESSION_GAP_MIN = 30

_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_last timestamp, "
    "n_events bigint, is_open boolean"
)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n_events bigint"


def sessionize_with_state(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """events(user_id, ts, ...) -> one row per observed session."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in pdfs:
            # pin the unit BEFORE the integer view: pandas 2 preserves
            # non-ns datetime units, so a bare astype("int64") would
            # yield microseconds (1000x off) if the Arrow path ever
            # stops coercing to nanoseconds
            ts_ns = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
            ts_us.extend((ts_ns.astype("int64") // 1000).tolist())
        ts_us.sort()
        if state.exists:
            start_us, last_us, n_events = state.get
        else:
            start_us = last_us = -1
            n_events = 0
        out: list[tuple[int, int, int, int, bool]] = []
        for t in ts_us:
            if start_us < 0:
                start_us, last_us, n_events = t, t, 1
            elif t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n_events, False))
                start_us, last_us, n_events = t, t, 1
            else:
                last_us, n_events = t, n_events + 1
        if start_us >= 0:
            out.append((user_id, start_us, last_us, n_events, True))
            state.update((start_us, last_us, n_events))
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": pd.to_datetime([r[1] * 1000 for r in out], unit="ns"),
                "session_last": pd.to_datetime([r[2] * 1000 for r in out], unit="ns"),
                "n_events": [r[3] for r in out],
                "is_open": [r[4] for r in out],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
