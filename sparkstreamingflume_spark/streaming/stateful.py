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


def _sorted_ts_us(batches, ts_col):
    """All non-NULL timestamps of a group micro-batch as sorted int64
    micros — the day-granular twins need only the time axis. Same
    NULL-drop and nanos→micros pinning as ``_sorted_typed_recs``."""
    import pandas as pd

    out: list[int] = []
    for pdf in batches:
        col = pdf[ts_col]
        col = col[col.notna()]
        out.extend(
            (
                pd.to_datetime(col)
                .astype("datetime64[ns]")
                .astype("int64")
                // 1000
            ).tolist()
        )
    out.sort()
    return out


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
# Streaming retention: incremental cohort-activity deltas
# ---------------------------------------------------------------------------

RETENTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cohort_day", T.LongType()),
        T.StructField("offset_days", T.LongType()),
        T.StructField("delta", T.LongType()),
    ]
)

_RETENTION_STATE = "cohort_day LONG, seen_days ARRAY<LONG>"

_DAY_US = 24 * 3600 * 1_000_000


def retention_progress(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    timeout_s: int | None = None,
) -> DataFrame:
    """Streaming twin of ``q_retention`` (plans/relational_queries.py).

    Emits ADDITIVE deltas: one ``(user_id, cohort_day, offset_days,
    delta)`` row per newly observed active day of a user, where
    ``cohort_day`` is the user's first-activity day and ``offset_days``
    the active day's distance from it. Downstream,
    ``SUM(delta) GROUP BY cohort_day, offset_days`` IS the batch
    query's retention triangle (``n_active`` = distinct users), because
    each user nets exactly one +1 per active day at their final cohort
    assignment — the memory-sink fold in tests/test_stream_retention.py
    certifies stream ≡ batch on the sf0.001 fixture.

    Unlike the funnel/SCD2 twins this one is EXACT under out-of-order
    arrival: a late event that predates the stored cohort day RETRACTS
    every previously emitted row (-1 at the old cohort coordinates) and
    re-emits it against the new cohort — possible here because the
    state already carries every seen day, so the rewrite is local to
    the key and stays additive for any downstream sum.

    State is ``(cohort_day, seen_days[])`` per user — bounded by the
    user's distinct active DAYS (calendar-bounded, not event-bounded).
    Default ``timeout_s=None`` (NoTimeout) keeps exactness; passing a
    TTL opts into eviction for unbounded key spaces, after which a
    returning user re-cohorts at their next day WITHOUT retracting
    pre-eviction rows — the documented divergence, mirroring
    ``regime_history``.

    Scale posture: state hash-partitioned by the groupBy, one array row
    per user; emissions are increments (append mode), so the retention
    triangle itself lives in the downstream agg, never in this
    operator's state; no driver state.
    """

    def _emit(key, rows):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(rows),
                "cohort_day": [r[0] for r in rows],
                "offset_days": [r[1] for r in rows],
                "delta": [r[2] for r in rows],
            }
        )

    def fn(key, batches, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return

        days = sorted(
            {t // _DAY_US for t in _sorted_ts_us(batches, ts_col)}
        )
        if state.exists:
            cohort, seen_arr = state.get
            seen = set(seen_arr)
        else:
            cohort, seen = None, set()
        out = []
        for d in days:
            if cohort is None:
                cohort = d
                seen.add(d)
                out.append((cohort, 0, 1))
            elif d < cohort:
                # retroactive cohort shift: retract + re-emit every day
                out.extend((cohort, s - cohort, -1) for s in sorted(seen))
                cohort = d
                seen.add(d)
                out.extend((cohort, s - cohort, 1) for s in sorted(seen))
            elif d not in seen:
                seen.add(d)
                out.append((cohort, d - cohort, 1))
        if cohort is not None:
            state.update((cohort, sorted(seen)))
            if timeout_s is not None:
                state.setTimeoutDuration(timeout_s * 1000)
        if out:
            yield _emit(key, out)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=RETENTION_SCHEMA,
        stateStructType=_RETENTION_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_s is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------------
# Streaming event-transition counts: incremental Markov matrix deltas
# ---------------------------------------------------------------------------

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("type_from", T.StringType()),
        T.StructField("type_to", T.StringType()),
        T.StructField("delta", T.LongType()),
    ]
)

# last_null distinguishes "last event had NULL type" from "no last
# event" — same encoding rationale as _REGIME_STATE.
_TRANSITION_STATE = "last_null BOOLEAN, last_type STRING"


def transition_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str | None = "event_id",
    timeout_s: int | None = None,
) -> DataFrame:
    """Streaming twin of ``q_event_transitions``
    (plans/relational_queries.py).

    ``id_col`` defaults to ``event_id`` — the batch query's (ts,
    event_id) total order — so equal-ts events within a batch pair
    deterministically by default (round-8 ADVICE); pass ``None`` for
    frames without an id column, accepting undefined equal-ts order.
    For high-rate streams prefer the zero-Python foreachBatch twin
    (``streaming/transitions.py``), which computes the same deltas
    JVM-side; this in-flight form remains for topologies that need the
    deltas as a streaming frame.

    Per key, each consecutive-event pair under the (``ts_col``,
    ``id_col``) order contributes one ``(type_from, type_to, +1)``
    delta; the last event's type persists in the state store so the
    first event of the NEXT micro-batch pairs with it. Downstream,
    ``SUM(delta) GROUP BY type_from, type_to`` IS the batch query's
    transition matrix (``n_transitions``) — the predecessor-existence
    rule matches the batch ``rn > 1`` exactly: a user's first-ever
    event emits nothing, while a genuine NULL-typed predecessor DOES
    emit (type_from NULL), carried by the explicit ``last_null`` state
    flag. Deltas are pre-summed per (pair, micro-batch) so a hot key
    emits at most |types|² rows per batch, not one per event.

    In-order arrival across batches gives exact batch parity
    (tests/test_stream_transitions.py); a late cross-batch event pairs
    with the stored last event rather than its true predecessor — the
    same inherent incremental divergence ``regime_history`` documents.

    Default ``timeout_s=None`` (NoTimeout): state is ONE fixed-width
    row per key, bounded by key cardinality, so eviction buys little;
    a TTL opts in for unbounded key spaces, after which a returning
    user's first event emits no transition (predecessor forgotten) —
    the documented divergence.

    Scale posture: one fixed-width state row per key, hash-partitioned;
    emissions are increments (append mode); the |types|²-bounded
    matrix lives in the downstream agg; no driver state.
    """

    def fn(key, batches, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return

        recs = _sorted_typed_recs(batches, ts_col, type_col, id_col)
        if state.exists:
            last_null, last_type = state.get
            last = None if last_null else last_type
            have_last = True
        else:
            last, have_last = None, False
        counts: dict[tuple[str | None, str | None], int] = {}
        for _, ty in recs:
            if have_last:
                pair = (last, ty)
                counts[pair] = counts.get(pair, 0) + 1
            last, have_last = ty, True
        if have_last:
            state.update((last is None, last))
            if timeout_s is not None:
                state.setTimeoutDuration(timeout_s * 1000)
        if counts:
            pairs = sorted(
                counts,
                key=lambda p: (p[0] is None, p[0] or "", p[1] is None, p[1] or ""),
            )
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(pairs),
                    "type_from": [p[0] for p in pairs],
                    "type_to": [p[1] for p in pairs],
                    "delta": [counts[p] for p in pairs],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_TRANSITION_STATE,
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
