"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState`` (SURVEY.md north star — "custom stateful
operators" beyond what ``F.session_window`` offers, e.g. when the session
record must carry arbitrary accumulated state).

State model: one open session per key (user). Each micro-batch folds the
key's new events into the open session; events gapped more than
``gap_seconds`` from the session's end close it (emitted) and open a new
one. An event-time timeout closes idle sessions once the watermark passes
``session_end + gap`` — identical semantics to ``F.session_window`` but
with a user-extensible state record.

Scale: state is shuffled by the grouping key (user_id — high cardinality,
even distribution), held in the state store, and evicted by the timeout;
the watermark bounds state size.
"""

# No `from __future__ import annotations`: pandas-typed signatures must be
# real objects for PySpark's state API.
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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

# state: (session_start_epoch_us, session_end_epoch_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(v.value // 1000) for v in pd.to_datetime(pdf["ts"]))
            ts_us.sort()
            cur = tuple(state.get) if state.exists else None
            for t in ts_us:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # close the session once the watermark passes end + gap
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
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
