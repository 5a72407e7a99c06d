"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState`` (SURVEY.md north star — "custom stateful
operators" beyond what ``F.session_window`` offers, e.g. when the session
record must carry arbitrary accumulated state).

State model (r15 rework): ALL open sessions per key, as three parallel
arrays. Each micro-batch merges the key's new events into the open
interval set by the gap rule — interval merge over (start, end) sorted
by start, so an on-time but OUT-OF-ORDER event extends the session it
belongs to (lowering its start if needed) or bridges two open sessions
into one, exactly like ``F.session_window``. Sessions are emitted ONLY
once the watermark passes ``session_end + gap`` (never mid-batch: an
in-batch gap does not prove a session closed — an on-time event between
the two could still arrive; the pre-r15 fold emitted there and absorbed
out-of-order events into the wrong session). An event-time timeout
re-fires at the earliest open horizon, clamped above the current
eviction watermark — since SPARK-40925 the late filter uses the
PREVIOUS batch's watermark, so an admitted old event's horizon can sit
below the eviction watermark ``setTimeoutTimestamp`` validates against,
and the unclamped call kills the query (r15 review).

Scale: state is shuffled by the grouping key (user_id — high cardinality,
even distribution), held in the state store, and evicted by the timeout;
the watermark bounds both state size and the open-session count per key.
"""

# No `from __future__ import annotations`: pandas-typed signatures must be
# real objects for PySpark's state API.
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: parallel arrays over the key's OPEN sessions
# (session_start_epoch_us[], session_end_epoch_us[], n_events[])
STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
    ]
)


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        sessions: list[tuple[int, int, int]] = []
        if state.exists:
            starts, ends, ns = state.get
            sessions = list(zip(starts, ends, ns))

        if not state.hasTimedOut:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(v.value // 1000) for v in pd.to_datetime(pdf["ts"]))
            # interval merge by the gap rule: open sessions + new events
            # sorted by start fold left, so an out-of-order event lowers
            # the start of the session it belongs to, and an event
            # between two open sessions BRIDGES them (session_window
            # semantics)
            items = sorted(sessions + [(t, t, 1) for t in ts_us])
            merged: list[tuple[int, int, int]] = []
            for s, e, n in items:
                if merged and s - merged[-1][1] <= gap_us:
                    ps, pe, pn = merged[-1]
                    merged[-1] = (ps, max(pe, e), pn + n)
                else:
                    merged.append((s, e, n))
            sessions = merged

        # a session is closed only when the watermark has passed its gap
        # horizon — never mid-batch on an in-batch gap
        closed = [x for x in sessions if x[1] + gap_us <= wm_us]
        open_ = [x for x in sessions if x[1] + gap_us > wm_us]

        if open_:
            state.update(
                (
                    [s for s, _, _ in open_],
                    [e for _, e, _ in open_],
                    [n for _, _, n in open_],
                )
            )
            # re-arm at the earliest open horizon, clamped above the
            # eviction watermark (SPARK-40925; see module docstring)
            horizon_ms = min(e + gap_us for _, e, _ in open_) // 1000
            state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1))
        elif state.exists:
            state.remove()

        if closed:
            closed.sort()
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize(events: DataFrame, gap_seconds: int = 600, watermark: str = "1 hour") -> DataFrame:
    """events(user_id, ts) stream → closed-session stream.

    Emits one row per closed session (append semantics); sessions close
    via the per-key event-time timeout once the watermark passes their
    gap horizon.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- per-key quota enforcement (transformWithStateInPandas) -----------------

QUOTA_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("seq", LongType()),
        StructField("admitted", BooleanType()),
    ]
)


# state: (n,) — lifetime events seen for the key
QUOTA_STATE_SCHEMA = StructType([StructField("n", LongType())])


def _quota_fn(budget: int):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        n = int(state.get[0]) if state.exists else 0
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(v) for v in pdf["event_id"])
        ids.sort()  # deterministic sequencing within a micro-batch
        seqs = list(range(n + 1, n + 1 + len(ids)))
        state.update((n + len(ids),))
        if ids:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(ids),
                    "event_id": ids,
                    "seq": seqs,
                    "admitted": [s <= budget for s in seqs],
                }
            )

    return fn


def enforce_quota(events: DataFrame, budget: int = 3) -> DataFrame:
    """Per-key admission control: events(user_id, event_id) stream →
    (user_id, event_id, seq, admitted) with each key's lifetime budget
    enforced ACROSS micro-batches — the ingest-pipeline guard against a
    runaway producer flooding one key. State is one long per key,
    shuffled by the grouping key and held in the state store; events are
    sequenced by event_id within each batch so replays are
    deterministic.

    Implemented on ``applyInPandasWithState``; the processor maps 1:1
    onto Spark 4's ``transformWithStateInPandas`` ``ValueState``
    (``handle.getValueState('count', 'n long')`` + the same fold), but
    this sandbox's TWS python driver worker cannot start. Re-probed
    2026-08-14, 2026-08-15 (rounds 8, 9, and 11 — r10 stalled; r11:
    ``import google`` still ModuleNotFoundError, no delta jars on the
    pyspark classpath, no ``delta`` python package either)
    on Spark 4.1.2: a minimal StatefulProcessor over a rate
    source dies with ``TransformWithStateInPySpark driver worker exited
    unexpectedly (crashed)``; root cause is that ``google.protobuf`` is
    not installed at all in this environment (``import google`` →
    ModuleNotFoundError), and TWS's arrow-state protocol requires it
    (pip installs are prohibited here). The portable API carries the
    qid; on a cluster with protobuf the TWS twin is a mechanical swap."""
    return events.groupBy("user_id").applyInPandasWithState(
        _quota_fn(budget),
        outputStructType=QUOTA_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
