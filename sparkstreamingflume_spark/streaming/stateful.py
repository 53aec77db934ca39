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


def _sorted_typed_recs(batches, ts_col, type_col, id_col):
    """One (ts_us, type) record list per group micro-batch, ordered by
    (ts, id) — the shared ingest contract of the stateful twins below.
    NULL-timestamp rows are dropped (an unknown-time event cannot be
    ordered; the batch twins filter `ts IS NOT NULL` identically).
    The explicit datetime64[ns] normalization pins the `// 1000`
    nanos→micros conversion even if a future pandas/Arrow hands the
    column back at [us] resolution.
    """
    import pandas as pd

    pdfs = list(batches)
    if not pdfs:
        return []
    allpdf = pd.concat(pdfs, ignore_index=True)
    allpdf = allpdf[allpdf[ts_col].notna()]
    order = [ts_col] + ([id_col] if id_col else [])
    allpdf = allpdf.sort_values(order, kind="mergesort")
    ts_us = (
        pd.to_datetime(allpdf[ts_col])
        .astype("datetime64[ns]")
        .astype("int64")
        // 1000
    ).tolist()
    types = [None if pd.isna(v) else str(v) for v in allpdf[type_col]]
    return list(zip(ts_us, types))


# ---------------------------------------------------------------------------
# Streaming SCD2: incremental dimension-history (regime) tracking
# ---------------------------------------------------------------------------

REGIME_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("regime_no", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("valid_from_us", T.LongType()),
        T.StructField("valid_to_us", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

# type_null distinguishes "regime of NULL-typed events" from an absent
# type: the batch twin's IS DISTINCT FROM merges consecutive NULLs into
# one regime, so the streaming state must encode NULL-ness explicitly
# instead of overloading the string field.
_REGIME_STATE = (
    "type_null BOOLEAN, cur_type STRING, from_us LONG, n LONG, regime_no LONG"
)


def regime_history(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str | None = None,
    emit_open: bool = False,
    timeout_s: int | None = None,
) -> DataFrame:
    """Streaming twin of ``q_scd2_history`` (plans/relational_queries.py).

    Per key, consecutive events whose ``type_col`` is null-safe-equal
    extend the current validity regime; a change CLOSES the regime
    (``valid_to_us`` = the new regime's start — the batch twin's lead()
    semantics) and opens the next. Regime numbering reproduces the batch
    cumulative-change-flag exactly: the first regime is 1, except a
    leading NULL-type regime which is 0 (the batch flag for a first row
    whose type null-safe-equals the NULL lag is 0). Open regimes are
    emitted per batch as snapshots when ``emit_open`` (valid_to_us
    NULL, closed False).

    By default state is NEVER evicted (``timeout_s=None`` →
    NoTimeout): exact regime numbering requires remembering each key's
    regime count, so eviction and exactness are mutually exclusive.
    State is one fixed-width row per key — bounded by key cardinality,
    not stream length. Passing ``timeout_s`` opts into TTL eviction for
    unbounded key spaces: the evicted regime is emitted as a final open
    snapshot, and if the key later returns its numbering RESTARTS at
    1/0 — a documented divergence from the batch twin, which is why it
    is not the default.

    Ordering contract (same as the batch twin's window ORDER BY ts,
    event_id): events are sorted by (``ts_col``, ``id_col``) WITHIN each
    micro-batch, NULL-ts rows dropped on both twins; a late event
    arriving after its regime's successor has already opened is appended
    to the CURRENT regime, not retrofitted — the streaming-vs-batch
    divergence inherent to any incremental SCD2.

    Scale posture: state is one fixed-width row per key (the open
    regime), hash-partitioned by the groupBy; closed regimes leave the
    state store immediately; no driver state.
    """

    def fn(key, batches, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            type_null, cur_type, from_us, n, regime_no = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "regime_no": [regime_no],
                    "event_type": [None if type_null else cur_type],
                    "n_events": [n],
                    "valid_from_us": [from_us],
                    "valid_to_us": [None],
                    "closed": [False],
                }
            )
            return

        recs = _sorted_typed_recs(batches, ts_col, type_col, id_col)
        cur = tuple(state.get) if state.exists else None
        out = []
        for t_us, ty in recs:
            if cur is None:
                cur = (ty is None, ty, t_us, 1, 0 if ty is None else 1)
            elif (ty is None and cur[0]) or (
                ty is not None and not cur[0] and ty == cur[1]
            ):
                cur = (cur[0], cur[1], cur[2], cur[3] + 1, cur[4])
            else:
                out.append(
                    (cur[4], None if cur[0] else cur[1], cur[3], cur[2], t_us, True)
                )
                cur = (ty is None, ty, t_us, 1, cur[4] + 1)
        if cur is not None:
            state.update(cur)
            if timeout_s is not None:
                state.setTimeoutDuration(timeout_s * 1000)
            if emit_open:
                out.append(
                    (cur[4], None if cur[0] else cur[1], cur[3], cur[2], None, False)
                )
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "regime_no": [o[0] for o in out],
                    "event_type": [o[1] for o in out],
                    "n_events": [o[2] for o in out],
                    "valid_from_us": [o[3] for o in out],
                    "valid_to_us": [o[4] for o in out],
                    "closed": [o[5] for o in out],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=REGIME_SCHEMA,
        stateStructType=_REGIME_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_s is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------------
# Streaming funnel: incremental conversion tracking
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("s1_us", T.LongType()),
        T.StructField("s2_us", T.LongType()),
        T.StructField("s3_us", T.LongType()),
        T.StructField("stage_reached", T.LongType()),
        T.StructField("convert_us", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_FUNNEL_STATE = "s1 LONG, s2 LONG, s3 LONG"


def funnel_progress(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    stage_window_us: int = 7 * 24 * 3600 * 1_000_000,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str | None = None,
    emit_open: bool = False,
) -> DataFrame:
    """Streaming twin of ``q_funnel`` (plans/relational_queries.py).

    The batch query is a left fold of a 3-stage state machine over each
    user's time-ordered events, so the incremental form is exact: the
    (s1, s2, s3) accumulator lives in the state store and each
    micro-batch folds its (ts, id)-sorted, NULL-ts-filtered events into
    it. A COMPLETION (stage 3 reached) emits one closed row; the state
    is kept (s3 set) so later events can neither re-open nor re-emit —
    matching the batch first-completion-only semantics under replay.
    Open-funnel snapshots are emitted per batch when ``emit_open``
    (closed False). In-order arrival across batches gives exact batch
    parity (tests/test_stream_funnel.py); a late cross-batch event is
    folded when it arrives, the divergence inherent to any incremental
    funnel.

    Eviction is derived from the stage window, never shorter: state is
    only dropped after ``stage_window_us`` of processing-time idleness,
    by which point (for a stream whose event time tracks wall clock) no
    future event can satisfy the ``<= stage_window_us`` gate — an
    in-progress funnel is never evicted while it could still advance,
    and an evicted incomplete funnel is emitted as its final open
    snapshot. Completed keys are evicted silently at the same horizon,
    which bounds the replay no-op guarantee to one stage window of
    idleness; accelerated-replay streams (event time ≠ wall clock)
    should treat eviction as approximate.

    Scale posture: three longs of state per key, hash-partitioned;
    completed and timed-out keys cost one fixed-width row until the
    stage-window horizon; no driver state.
    """
    st1, st2, st3 = stages
    eviction_ms = max(stage_window_us // 1000, 1000)

    def emit_row(key, s, closed):
        import pandas as pd

        stage = 3 if s[2] is not None else (2 if s[1] is not None else 1)
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "s1_us": [s[0]],
                "s2_us": [s[1]],
                "s3_us": [s[2]],
                "stage_reached": [stage],
                "convert_us": [
                    s[2] - s[0] if s[2] is not None else None
                ],
                "closed": [closed],
            }
        )

    def fn(key, batches, state: GroupState):
        if state.hasTimedOut:
            s = tuple(state.get)
            state.remove()
            if s[0] is not None and s[2] is None:
                yield emit_row(key, s, False)
            return

        recs = _sorted_typed_recs(batches, ts_col, type_col, id_col)
        s = tuple(state.get) if state.exists else (None, None, None)
        was_complete = s[2] is not None
        for t_us, ty in recs:
            if s[0] is None:
                if ty == st1:
                    s = (t_us, None, None)
            elif s[1] is None:
                if ty == st2 and t_us > s[0] and t_us - s[0] <= stage_window_us:
                    s = (s[0], t_us, None)
            elif s[2] is None:
                if ty == st3 and t_us > s[1] and t_us - s[1] <= stage_window_us:
                    s = (s[0], s[1], t_us)

        if s[0] is not None:
            state.update(s)
            state.setTimeoutDuration(eviction_ms)
            if s[2] is not None and not was_complete:
                yield emit_row(key, s, True)
            elif s[2] is None and emit_open:
                yield emit_row(key, s, False)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
