"""Custom stateful streaming operator: gap-based sessionization.

The reference has no stateful operators (its windows are stateless
processing-time re-reads); this is the capability extension a CDR /
training-data pipeline actually needs: per-key sessions that close after
an idle gap, emitted incrementally as the stream runs.

Built on ``applyInPandasWithState`` (Arrow-batched, per-group state in
the state store, idle-gap handled with ProcessingTimeTimeout): the
Spark-idiomatic shape for custom streaming state. Batch twin:
``q_sessionize`` (plans/relational_queries.py) — same session
definition via lag + running sum, oracle-certified.

Scale posture: state is per-user_id (hash-partitioned by the groupBy),
one state-store entry per open session, bounded by the timeout; no
driver state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_STATE_SCHEMA = "start_us LONG, end_us LONG, n LONG"


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    emit_open: bool = False,
) -> DataFrame:
    """Incremental gap-sessionizer over a (possibly streaming) frame.

    Emits one row per CLOSED session (plus open-session snapshots when
    ``emit_open``). A session closes when a new event arrives more than
    ``gap_s`` after the last one, or when the group idles past the
    processing-time timeout.
    """
    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple[Any, ...],
        batches: Iterator,
        state: GroupState,
    ) -> Iterator:
        import pandas as pd

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n],
                    "closed": [True],
                }
            )
            return

        ts_us: list[int] = []
        for pdf in batches:
            ts_us.extend(int(v.value // 1000) for v in pd.to_datetime(pdf[ts_col]))
        ts_us.sort()

        cur = state.get if state.exists else None  # (start, end, n)
        out = []
        for t in ts_us:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap_us:
                out.append(cur + (True,))
                cur = (t, t, 1)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(gap_s * 1000)
            if emit_open:
                out.append(cur + (False,))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "session_start_us": [o[0] for o in out],
                    "session_end_us": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                    "closed": [o[3] for o in out],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
